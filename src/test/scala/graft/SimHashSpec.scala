package graft

import graft.functions.SimHash
import org.apache.spark.sql.functions._

/** SimHash near-dup detection: planted 10%-perturbation copies must sit at
  * small Hamming distance and be recovered by the banded candidate join,
  * while unrelated documents sit far apart.
  */
class SimHashSpec extends SparkSuite {
  import spark.implicits._

  test("planted near-duplicates separate from random pairs by Hamming distance") {
    val rnd = new scala.util.Random(11)
    val base = Fixtures
      .table(spark, sf001, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), lower(col("text")).as("text"))
      .as[(Long, String)]
      .collect()
    val corpus = base.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      val mutated = toks.map(t => if (rnd.nextDouble() < 0.1) "zz" + rnd.nextInt(100) else t)
      Seq((id, toks), (id + 1000, mutated))
    }
    val sigs = corpus.map { case (id, toks) => id -> SimHash.simhash64(toks) }.toMap
    val plantedDist = base.map { case (id, _) => SimHash.hamming(sigs(id), sigs(id + 1000)) }
    val randomDist = for ((a, _) <- base.take(20); (b, _) <- base.take(20) if a < b)
      yield SimHash.hamming(sigs(a), sigs(b))
    val plantedMean = plantedDist.sum.toDouble / plantedDist.length
    val randomMean = randomDist.sum.toDouble / randomDist.length
    assert(plantedMean < randomMean / 2,
      s"no separation: planted mean $plantedMean vs random mean $randomMean")

    // banded candidate join recovers the close planted pairs (Hamming <= 3
    // is complete by pigeonhole over 4 bands)
    val df = corpus.toSeq.toDF("id", "tokens")
    val pairs = SimHash
      .nearDuplicatePairs(df, "id", "tokens", maxHamming = 3)
      .as[(Long, Long, Int)]
      .collect()
    val expected = base
      .map(_._1)
      .filter(id => SimHash.hamming(sigs(id), sigs(id + 1000)) <= 3)
      .map(id => (id, id + 1000))
      .toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(got),
      s"banded join missed planted pairs: ${(expected -- got).take(5)}")
    assert(pairs.forall(p => SimHash.hamming(sigs(p._1), sigs(p._2)) <= 3))
  }

  test("native SimHashExpr is bit-identical to the UDF and the local kernel") {
    val docs = Fixtures
      .table(spark, sf001, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    val both = docs
      .select(
        col("doc_id"),
        SimHash.simhashCol(col("toks")).as("expr_sig"),
        SimHash.simhashUdf(col("toks")).as("udf_sig"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"expr/udf mismatch for doc ${r.getLong(0)}")
    }
    // local kernel parity on one row
    val one = docs.limit(1).collect().head
    val toks = one.getSeq[String](1)
    val local = SimHash.simhash64(toks)
    val viaExpr = docs
      .filter(col("doc_id") === one.getLong(0))
      .select(SimHash.simhashCol(col("toks")))
      .head()
      .getLong(0)
    assert(local == viaExpr)
  }
}
