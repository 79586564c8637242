package graft

import graft.ops.SimKernel
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** cap_sim_lsh (SURVEY.md §2.H): the 100-TB-scale approximate-similarity
  * path. Recall is measured against the exact joins (the q_sim_threshold /
  * q_dedup_jaccard oracle baselines): LSH must find ≥80% of true pairs.
  * Seeds fixed; thresholds data-driven (quantile of exact distances) so the
  * test is stable across scale factors.
  */
class LshSpec extends SparkSuite {

  test("cap_sim_lsh: BucketedRandomProjectionLSH recall >= 0.8 vs exact L2 pairs") {
    import spark.implicits._
    val vecs = Fixtures
      .table(spark, sf001, "embeddings")
      .filter(col("vec_id") < 200)
      .as[(Long, Seq[Float], Int)]
      .map { case (id, emb, _) => (id, Vectors.dense(emb.map(_.toDouble).toArray)) }
      .toDF("id", "features")
      .cache()

    val pairsExact = vecs
      .as("a")
      .crossJoin(vecs.as("b"))
      .filter(col("a.id") < col("b.id"))
      .map { r =>
        val a = r.getAs[org.apache.spark.ml.linalg.Vector](1)
        val b = r.getAs[org.apache.spark.ml.linalg.Vector](3)
        (r.getLong(0), r.getLong(2), math.sqrt(Vectors.sqdist(a, b)))
      }
      .toDF("a", "b", "dist")
      .cache()
    // data-driven radius: 2nd percentile of pair distances → a real near set
    val radius = pairsExact.stat.approxQuantile("dist", Array(0.02), 0.001).head
    val exact = pairsExact.filter(col("dist") <= radius).select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "exact near-pair set is empty — radius choice broken")

    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(radius * 2)
      .setNumHashTables(6)
      .setSeed(42)
      .setInputCol("features")
      .setOutputCol("hashes")
    val model = lsh.fit(vecs)
    val approx = model
      .approxSimilarityJoin(vecs, vecs, radius, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"))
      .filter(col("a") < col("b"))
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"BRP-LSH recall $recall < 0.8 (|exact|=${exact.size}, |approx|=${approx.size})")
  }

  test("cap_sim_lsh: MinHashLSH finds >= 0.8 of planted near-duplicate pairs") {
    import spark.implicits._
    // Plant true near-dups: for each of 50 docs, a copy with ~10% of tokens
    // replaced → bigram-Jaccard ≈ 0.7-0.9, the regime MinHash-LSH targets.
    val rnd = new scala.util.Random(7)
    val base = Fixtures
      .table(spark, sf001, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), lower(col("text")).as("text"))
      .as[(Long, String)]
      .collect()
    val corpus = base.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val mutated = toks.map(t => if (rnd.nextDouble() < 0.1) "zz" + rnd.nextInt(100) else t)
      Seq((id, toks.toSeq), (id + 1000, mutated.toSeq))
    }
    def shingles(toks: Seq[String]): Seq[String] =
      toks.sliding(2).map(_.mkString(" ")).toSeq.distinct
    val shingled = corpus.map { case (id, toks) => (id, shingles(toks)) }.toSeq.toDF("doc_id", "shingles")

    // exact near-dup pairs (Jaccard >= 0.5) — the planted copies
    val local = corpus.map { case (id, toks) => (id, shingles(toks).toSet) }
    val exact = (for {
      (a, sa) <- local
      (b, sb) <- local
      if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(exact.size >= 40, s"planted-dup construction broken: ${exact.size}")

    val tf = new HashingTF()
      .setInputCol("shingles")
      .setOutputCol("features")
      .setNumFeatures(4096)
      .setBinary(true)
    val feats = tf.transform(shingled)
    val mh = new MinHashLSH()
      .setNumHashTables(8)
      .setSeed(42)
      .setInputCol("features")
      .setOutputCol("hashes")
    val model = mh.fit(feats)
    val approx = model
      .approxSimilarityJoin(feats, feats, 0.5, "jdist") // distance = 1 - jaccard
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"MinHash recall $recall < 0.8 (|exact|=${exact.size}, |approx|=${approx.size})")
  }

  test("q_sim_ann_ivf bucketing recall vs exact top-k (documentation of tradeoff)") {
    import spark.implicits._
    // exact top-3 neighbours per query (first 20 vectors), full scan
    val embs = Fixtures
      .table(spark, sf001, "embeddings")
      .as[(Long, Seq[Float], Int)]
      .map { case (id, e, _) => (id, e) }
      .collect()
    val queries = embs.filter(_._1 < 20)
    def top3(q: (Long, Seq[Float]), pool: Array[(Long, Seq[Float])]) =
      pool
        .filter(_._1 != q._1)
        .map { case (id, e) => (id, SimKernel.cos(q._2, e)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3)
        .map(_._1)
        .toSet
    def bucket(e: Seq[Float]) =
      (if (e(0) > 0) 8 else 0) + (if (e(1) > 0) 4 else 0) + (if (e(2) > 0) 2 else 0) +
        (if (e(3) > 0) 1 else 0)
    val byBucket = embs.groupBy { case (_, e) => bucket(e) }
    val recalls = queries.map { q =>
      val exact = top3(q, embs)
      val ivf = top3(q, byBucket(bucket(q._2)))
      exact.count(ivf.contains).toDouble / exact.size
    }
    val meanRecall = recalls.sum / recalls.length
    // Documented tradeoff: 16 sign buckets scan ~1/16 of candidates. On this
    // weakly-clustered synthetic data recall lands ~0.15-0.25 (vs ~0.06
    // random); real embedding spaces with cluster structure fare far better.
    assert(meanRecall >= 0.05, s"IVF recall $meanRecall below random baseline")
    assert(meanRecall <= 1.0)
  }
}
