package graft

import graft.functions.{KMeansIvf, ProductQuantizer}
import graft.ops.SimKernel
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSuite {
  private lazy val embs = Fixtures.table(spark, sf001, "embeddings")
  private lazy val coarse = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)

  test("asNondeterministic barrier: encode-shaped UDF evaluates once per vector, not per generated row") {
    // Pins the optimizer behavior the PQ/KMeansIvf fit loops rest on
    // (ProductQuantizer.scala fit: encode → posexplode → element_at):
    // CollapseProject must NOT fold a non-deterministic projection into
    // the post-Generate select, or the encoder re-runs dim× per vector.
    // An accumulator inside the UDF counts actual evaluations — if a
    // Spark upgrade weakens the barrier, this count jumps from nVec to
    // nVec×dim and the assert fails loudly.
    val nVec = 100L
    val dim = 8
    val calls = spark.sparkContext.longAccumulator("encodeCalls")
    val enc = udf { (v: Seq[Double]) =>
      calls.add(1)
      v.indices.map(_ / 2)
    }.asNondeterministic()
    val vecs = spark
      .range(nVec)
      .select(array((0 until dim).map(i => (col("id") + i).cast("double")): _*).as("v"))
    vecs
      .select(enc(col("v")).as("codes"), col("v"))
      .select(col("codes"), posexplode(col("v")).as(Seq("p", "x")))
      .select(col("p"), element_at(col("codes"), (col("p") / 2).cast("int") + 1).as("c"), col("x"))
      .groupBy("p", "c")
      .agg(count(lit(1)))
      .collect()
    assert(calls.value == nVec, s"encode UDF ran ${calls.value} times for $nVec vectors — barrier collapsed")
  }

  test("codebook fit is deterministic across partitionings") {
    val a = ProductQuantizer.fit(embs, "vec_id", "embedding", m = 16, ksub = 64, iters = 3)
    val b = ProductQuantizer.fit(embs.repartition(7, col("vec_id")), "vec_id", "embedding", m = 16, ksub = 64, iters = 3)
    assert(a.m == b.m && a.ksub == b.ksub && a.dsub == b.dsub)
    for (mi <- 0 until a.m; j <- 0 until a.ksub)
      assert(a.codebooks(mi)(j).sameElements(b.codebooks(mi)(j)), s"codebook ($mi,$j) differs")
  }

  test("codes are m small ints; search output is identical across partitionings") {
    val model = ProductQuantizer.fit(embs, "vec_id", "embedding", m = 16, ksub = 64, iters = 3)
    val codes = embs
      .select(ProductQuantizer.encode(model, col("embedding")).as("codes"))
      .collect()
      .map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 16 && c.forall(j => j >= 0 && j < 64)))
    def search(df: org.apache.spark.sql.DataFrame) = ProductQuantizer
      .annTopK(df.filter(col("vec_id") < 20), df, coarse, model, "vec_id", "embedding", topK = 3, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
      .toSeq
    assert(search(embs) == search(embs.repartition(5, col("vec_id"))))
  }

  test("IVF-PQ recall vs exact cosine top-3 matches the plain-IVF row at nprobe=2") {
    val model = ProductQuantizer.fit(embs, "vec_id", "embedding", m = 16, ksub = 64, iters = 3)
    val queries = embs.filter(col("vec_id") < 20)
    def pairSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = pairSet(
      ProductQuantizer
        .annTopK(queries, embs, coarse, model, "vec_id", "embedding", topK = 3, nprobe = 2, rerank = 48)
        .select(col("q_id"), col("rn"), col("c_id")).collect())
    val adcOnly = pairSet(
      ProductQuantizer
        .annTopK(queries, embs, coarse, model, "vec_id", "embedding", topK = 3, nprobe = 2)
        .select(col("q_id"), col("rn"), col("c_id")).collect())
    val ivf = pairSet(
      KMeansIvf
        .annTopK(queries, embs, coarse, "vec_id", "embedding", topK = 3, nprobe = 2)
        .select(col("q_id"), col("rn"), col("c_id")).collect())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val exact = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(embs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", SimKernel.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), lit(0).as("rn"), col("c_id"))
    val exactSet = pairSet(exact.collect())
    val pqRecall = (pq & exactSet).size.toDouble / exactSet.size
    val ivfRecall = (ivf & exactSet).size.toDouble / exactSet.size
    val adcRecall = (adcOnly & exactSet).size.toDouble / exactSet.size
    // Same coarse buckets + same probing → identical candidate sets; with a
    // 48-deep ADC shortlist re-ranked by exact cosine, PQ must not lose
    // ground to the plain-IVF exact ranking. Pure ADC ranking is noisier
    // than this corpus's tiny neighbor gaps (that is WHY production PQ
    // re-ranks) but must stay informative.
    assert(pqRecall >= ivfRecall, f"PQ recall $pqRecall%.2f below plain IVF $ivfRecall%.2f")
    assert(pqRecall >= 0.6, f"PQ recall $pqRecall%.2f below 0.6")
    assert(adcRecall >= 0.3, f"ADC-only recall $adcRecall%.2f below 0.3")
  }
}
