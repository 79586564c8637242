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

  test("packSequences: one adversarial 1e5-doc shard completes with invariants intact") {
    // The per-group fold holds one shard's sorted (id, n) structs in task
    // memory. packSequencesAuto keeps shards constant-sized, but id SKEW
    // can still concentrate a corpus slice into one residue class — this
    // plants exactly that: 100k docs whose ids are ALL ≡ 0 (mod 4), so one
    // group carries the entire corpus while three sit empty. The fold must
    // complete (state is (id, n) pairs — ~3 MB, not the documents) and
    // every packing invariant must survive the degenerate shard.
    val n = 100000
    val docs = spark
      .range(n)
      .select(
        (col("id") * 4).as("id"), // every id ≡ 0 (mod 4)
        // deterministic token count 1..40 without touching real text width:
        // n tokens of "w " — the fold only sees size(split(text))
        expr("array_join(array_repeat('w', CAST(pmod(id, 40) AS INT) + 1), ' ')").as("text"))
    val budget = 256
    val packed = Curation.packSequences(docs, "id", "text", groups = 4, budget = budget)
    // completion + exactly-once packing
    assert(packed.count() == n.toLong, "adversarial shard lost or duplicated docs")
    assert(packed.select(countDistinct("id")).head().getLong(0) == n.toLong)
    // the skew landed where designed: a single populated group
    assert(packed.select(countDistinct("pgrp")).head().getLong(0) == 1L)
    // no multi-doc bin exceeds the budget
    val over = packed
      .groupBy("pgrp", "bin")
      .agg(sum("n_toks").as("fill"), count(lit(1)).as("k"))
      .filter(col("fill") > budget && col("k") > 1)
      .count()
    assert(over == 0, "multi-doc bin over budget on the adversarial shard")
    // bins are dense and non-decreasing in id order (the greedy first-fit
    // order invariant): max bin + 1 == distinct bins, and no id maps to a
    // smaller bin than any earlier id
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pgrp").orderBy("id")
    val regress = packed
      .withColumn("prev_bin", lag("bin", 1).over(w))
      .filter(col("prev_bin") > col("bin"))
      .count()
    assert(regress == 0, "bin ids regress within the shard")
  }

  test("packSequencesAuto: shard count is derived from the corpus and grows with it") {
    val small = randCorpus(40)
    val big = small.unionByName(randCorpus(80).select(col("id") + 1000, col("text")).toDF("id", "text"))
    def nGroups(df: org.apache.spark.sql.DataFrame) =
      Curation
        .packSequencesAuto(df, "id", "text", targetPerGroup = 10, budget = 64)
        .select(countDistinct("pgrp"))
        .head()
        .getLong(0)
    val gSmall = nGroups(small)
    val gBig = nGroups(big)
    assert(gSmall == 4L, s"40 docs / target 10 should shard 4 ways, got $gSmall")
    assert(gBig == 12L, s"120 docs / target 10 should shard 12 ways, got $gBig")
    assert(gBig > gSmall, "shard count failed to grow with a larger corpus")
  }

  test("sampleByHash: negative keys get buckets in [0,1000) and sane rates") {
    val df = (-500L until 500L).toDF("id")
    val out = Curation.sampleByHash(df, "id", lit(300)).select("id", "bucket").as[(Long, Long)].collect()
    assert(out.forall { case (_, b) => b >= 0 && b < 1000 }, "bucket escaped [0,1000)")
    // a hash this coarse must keep roughly rate/1000 of BOTH sign ranges
    val negKept = out.count(_._1 < 0)
    val posKept = out.count(_._1 >= 0)
    assert(negKept > 50 && negKept < 450, s"negative-key kept-count $negKept implausible for 30%")
    assert(posKept > 50 && posKept < 450, s"positive-key kept-count $posKept implausible for 30%")
    // pure function of the key: same rows on a different partitioning
    val again = Curation.sampleByHash(df.repartition(7), "id", lit(300))
      .select("id", "bucket").as[(Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("packSequences: int-typed and negative ids pack without casts or group loss") {
    val docs = Seq.tabulate(20)(i => (i - 10, randDoc())).toDF("id", "text") // int ids, some negative
    val packed = Curation.packSequences(docs, "id", "text", groups = 4, budget = 64)
    assert(packed.count() == 20L)
    val grps = packed.select("pgrp").distinct().as[Int].collect()
    assert(grps.forall(g => g >= 0 && g < 4), s"pgrp out of range: ${grps.toSeq}")
    assert(packed.select("id").as[Long].collect().sorted.toSeq == (-10L until 10L).toSeq)
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
