package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

/** Property-style invariants for the generic Curation API over RANDOM
  * corpora and parameters (seeded) — the fixture-bound invariants live in
  * PipelineOpsSpec; these prove the operators hold for arbitrary inputs.
  */
class CurationPropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private val words = Array("aa", "bb", "cc", "dd", "ee", "ff")
  private def randDoc(): String =
    Seq.fill(1 + rnd.nextInt(60))(words(rnd.nextInt(words.length))).mkString(" ")
  private def randCorpus(n: Int) =
    Seq.tabulate(n)(i => (i.toLong, randDoc())).toDF("id", "text")

  test("chunk: random window/stride always covers up to the last token") {
    (1 to 4).foreach { _ =>
      val stride = 2 + rnd.nextInt(9)
      val window = stride + 1 + rnd.nextInt(5)
      val docs = randCorpus(12)
      val bad = Curation
        .chunk(docs, "id", "text", window, stride)
        .groupBy("id")
        .agg(max(col("chunk_id") * stride + col("chunk_toks")).as("last_end"))
        .join(docs.select(col("id"), size(split(col("text"), " ")).as("n")), "id")
        .filter(col("last_end") =!= col("n"))
        .count()
      assert(bad == 0, s"coverage hole at window=$window stride=$stride")
    }
  }

  test("packSequences: random budgets — multi-doc bins within budget, every doc packed once") {
    (1 to 4).foreach { _ =>
      val budget = 8 + rnd.nextInt(190)
      val docs = randCorpus(20)
      val packed = Curation.packSequences(docs, "id", "text", groups = 4, budget = budget)
      assert(packed.count() == 20L)
      val over = packed
        .groupBy("pgrp", "bin")
        .agg(sum("n_toks").as("fill"), count(lit(1)).as("k"))
        .filter(col("fill") > budget && col("k") > 1)
        .count()
      assert(over == 0, s"multi-doc bin over budget $budget")
    }
  }

  test("dedupByContent: idempotent, one row per distinct content, min id canonical") {
    (1 to 4).foreach { _ =>
      // small vocab + short docs → genuine duplicate texts occur
      val texts = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(3))).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = Curation.dedupByContent(docs, "id", "text")
      assert(once.count() == texts.distinct.length.toLong)
      val twice = Curation.dedupByContent(once.select("id", "text"), "id", "text")
      assert(twice.count() == once.count())
      // canonical representative is the minimum id of its content group
      val expect = texts.zipWithIndex.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).min.toLong }
      val got = once.select("text", "id").as[(String, Long)].collect().toMap
      assert(got == expect, "canonical ids are not the per-content minima")
    }
  }
}
