package graft

import graft.functions.KMeansIvf
import graft.ops.SimKernel
import org.apache.spark.sql.functions._

class KMeansIvfSpec extends SparkSuite {
  private lazy val embs = Fixtures.table(spark, sf001, "embeddings")

  test("fit is deterministic: two fits on different partitionings are identical") {
    val a = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)
    val b = KMeansIvf.fit(embs.repartition(7, col("vec_id")), "vec_id", "embedding", k = 8, iters = 3)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
  }

  test("buckets are used and roughly balanced (no single-bucket collapse)") {
    val cents = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)
    val sizes = embs
      .select(KMeansIvf.assign(cents, col("embedding")).as("c"))
      .groupBy("c").count().collect().map(_.getLong(1))
    assert(sizes.length >= 4, s"only ${sizes.length} of 8 buckets populated")
    assert(sizes.max < embs.count(), "all vectors collapsed into one bucket")
  }

  test("ANN recall vs exact brute-force top-3 is >= 0.6 at nprobe=2") {
    val cents = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)
    val queries = embs.filter(col("vec_id") < 20)
    val approx = KMeansIvf
      .annTopK(queries, embs, cents, "vec_id", "embedding", topK = 3, nprobe = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val exact = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(embs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", SimKernel.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.6, f"k-means IVF recall $recall%.2f below 0.6")
  }

  test("SAMPLE fit is deterministic across partitionings and holds the recall bound at fraction 0.5") {
    // content-addressed sampling: the sampled set is a function of ids,
    // so the fit is bit-identical however the corpus is partitioned
    val a = KMeansIvf.fitSample(embs, "vec_id", "embedding", k = 8, iters = 3, fraction = 0.5)
    val b = KMeansIvf.fitSample(
      embs.repartition(7, col("vec_id")), "vec_id", "embedding", k = 8, iters = 3, fraction = 0.5)
    a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    // half-corpus Lloyd's still estimates the cluster means well enough
    // for the same recall floor the full fit proves
    val queries = embs.filter(col("vec_id") < 20)
    val approx = KMeansIvf
      .annTopK(queries, embs, a, "vec_id", "embedding", topK = 3, nprobe = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val exact = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(embs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", SimKernel.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.6, f"sample-fit IVF recall $recall%.2f below 0.6")
    // fraction 1 degenerates to the full fit exactly
    val full = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)
    val one = KMeansIvf.fitSample(embs, "vec_id", "embedding", k = 8, iters = 3, fraction = 1.0)
    full.zip(one).foreach { case (cf, co) => assert(cf.sameElements(co)) }
  }

  test("filtered ANN: pre-filtering candidates >= recall of post-filtering the ranked list, same probes") {
    // Predicate + ANN done right: restrict the CANDIDATE side before the
    // bucket join (pre) vs rank unfiltered then drop non-matching results
    // (post — the recall trap: filtered-out neighbors consume top-k slots,
    // so matching neighbors ranked just below k are lost for good). Ground
    // truth is the exact filtered top-3; both approximations use the SAME
    // centroids and nprobe, so any recall gap is purely filter placement.
    val cents = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)
    val queries = embs.filter(col("vec_id") < 20)
    val evenCands = embs.filter(col("label") % 2 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = pairs(KMeansIvf.annTopK(queries, evenCands, cents, "vec_id", "embedding", topK = 3, nprobe = 2))
    val post = pairs(
      KMeansIvf
        .annTopK(queries, embs, cents, "vec_id", "embedding", topK = 3, nprobe = 2)
        .join(embs.select(col("vec_id").as("c_id"), col("label")), "c_id")
        .filter(col("label") % 2 === 0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val exact = pairs(
      queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .crossJoin(evenCands.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cos", SimKernel.cosine(col("q_emb"), col("c_emb")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("q_id", "c_id"))
    val recallPre = (pre & exact).size.toDouble / exact.size
    val recallPost = (post & exact).size.toDouble / exact.size
    assert(recallPre >= recallPost, f"pre-filter recall $recallPre%.2f < post-filter $recallPost%.2f")
    assert(recallPre >= 0.5, f"pre-filter recall $recallPre%.2f unreasonably low")
  }
}
