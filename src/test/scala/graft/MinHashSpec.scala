package graft

import graft.functions.MinHash
import org.apache.spark.sql.functions._

/** Banded MinHash (graft.functions.MinHash): output soundness is structural
  * (every candidate is re-checked with the exact Jaccard), so the tests
  * quantify the two things banding actually decides — recall and candidate
  * volume — against the exact all-pairs Jaccard join on sf0.001.
  */
class MinHashSpec extends SparkSuite {
  import spark.implicits._

  private def shingled() = {
    val toks = split(lower(col("text")), " ")
    Fixtures
      .table(spark, sf001, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        expr(
          "filter(transform(sequence(0, greatest(size(toks) - 2, 0)), i -> concat(toks[i], ' ', toks[i+1])), x -> x IS NOT NULL)")
          .as("toks"))
  }

  test("banded minhash finds every planted near-dup pair (recall = 1.0 at J >= 0.9)") {
    // Plant: each doc minus its last two tokens → J typically >= 0.95.
    val orig = shingled()
    val variant = orig.select((col("doc_id") + Fixtures.PlantShift).as("doc_id"), expr("slice(toks, 1, greatest(size(toks) - 2, 1))").as("toks"))
    val corpus = orig.unionByName(variant)

    val exact = corpus
      .select(col("doc_id").as("a_id"), array_distinct(col("toks")).as("a_toks"))
      .crossJoin(corpus.select(col("doc_id").as("b_id"), array_distinct(col("toks")).as("b_toks")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))))
      .withColumn("jacc", col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")))
      .filter(col("jacc") >= 0.9)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(exact.size >= 40, s"planted-dup construction broken: ${exact.size}")

    val banded = MinHash
      .nearDuplicatePairs(corpus, "doc_id", "toks", minJaccard = 0.9)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = exact.count(banded.contains).toDouble / exact.size
    assert(recall == 1.0, s"recall $recall < 1.0 (|exact|=${exact.size}, |banded|=${banded.size})")
    // soundness: banded output at the same threshold is a subset of exact
    assert(banded.subsetOf(exact), s"banded produced pairs the exact join rejects: ${banded.diff(exact).take(3)}")
  }

  test("banding bounds the candidate join: far fewer candidates than all-pairs") {
    val corpus = shingled()
    val n = corpus.count()
    // Reconstruct the candidate count the same way nearDuplicatePairs does,
    // stopping before verification.
    val sig = corpus
      .select(col("doc_id").as("id"), array_distinct(col("toks")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), MinHash.signature(col("toks"), 18).as("mh"))
    val banded = sig.select(
      col("id"),
      explode(array((0 until 6).map { j =>
        struct(lit(j).as("b"), xxhash64((0 until 3).map(r => col("mh").getItem(j * 3 + r)): _*).as("v"))
      }: _*)).as("band"))
    val cand = banded
      .as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .distinct()
      .count()
    val allPairs = n * (n - 1) / 2
    assert(cand < allPairs / 20, s"banding is not pruning: $cand candidates vs $allPairs pairs")
  }
}
