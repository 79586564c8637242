package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest-neighbor search with a k-means coarse
  * quantizer — the upgrade path from the fixed sign-bit bucketing of
  * q_sim_ann_ivf: centroids adapt to the data distribution, so buckets are
  * balanced and recall per probe is higher.
  *
  * Determinism engineering: Lloyd's is made partition-order-independent by
  * (1) fixed init — the k lowest-id vectors, (2) a FIXED iteration count
  * (no data-dependent stopping), and (3) centroid updates that sum
  * e6-scaled longs (integer addition commutes; double summation order
  * varies with shuffle layout). Assignment ties break toward the lowest
  * centroid index. Two fits on any partitioning are bit-identical.
  *
  * At 100 TB: the model (k × dim doubles) is driver-side state exactly like
  * Spark ML's — tiny, broadcast into the assignment closure; each Lloyd
  * iteration is one map-side-combinable (cluster, dim) aggregation, and the
  * production recipe fits on a sample then assigns the full corpus in one
  * scan ([[fitSample]] — first-class, deterministic, measured in
  * SCALING.md's ann-sample study). The search itself shuffles candidates
  * once on the centroid id —
  * queries probe `nprobe` centroids, so the candidate join fans out
  * nprobe× on the query side only (tiny), never all-pairs.
  */
object KMeansIvf {
  private def sqDist(v: Seq[Float], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      val t = v(i).toDouble - c(i)
      d += t * t
      i += 1
    }
    d
  }

  /** Index of the nearest centroid (ties → lowest index). */
  private def nearest(cents: Array[Array[Double]])(v: Seq[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val d = sqDist(v, cents(j))
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Indices of the `nprobe` nearest centroids, nearest first. */
  private def nearestN(cents: Array[Array[Double]], nprobe: Int)(v: Seq[Float]): Seq[Int] =
    cents.indices
      .map(j => (sqDist(v, cents(j)), j))
      .sorted // (dist, idx): ties break toward the lowest index
      .take(nprobe)
      .map(_._2)

  /** Deterministic Lloyd's fit; returns the k × dim centroid matrix. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Array[Array[Double]] = {
    // Materialize (id, vector) ONCE before the loop. Without this every
    // Lloyd iteration re-plans from the source relation — at 100 TB that is
    // `iters` full corpus scans for a model-sized result. The persisted frame
    // is the narrowest projection the loop needs, lives in executor memory
    // (spilling to disk if it must), and is released before returning; each
    // iteration then scans cache, not parquet.
    // ...and fanned out to the cores first: an unsplittable one-file corpus
    // would otherwise pin every iteration's argmin scan to a single task
    // (guide §2.5); no-op on a multi-split corpus. The SEED collects from
    // this same fanned frame (r22): the old pre-fanOut orderBy(id).limit(k)
    // paid a 1-task full scan of the vector column — identical seed rows,
    // now a parallel per-partition top-k over the frame the loop caches
    // anyway.
    val base = graft.ops.Checkpoints
      .fanOut(vecs.select(col(idCol).as("__id"), col(vecCol).as("v")))
      .persist()
    var cents: Array[Array[Double]] = base
      .orderBy(col("__id"))
      .limit(k)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == k, s"need at least $k vectors to seed $k centroids")
    try {
      var it = 0
      while (it < iters) {
        // A UDF column projected alongside a generator is re-evaluated once
        // per GENERATED row (64× per vector here) — measured 3.4 s vs 0.3 s
        // per iteration at sf0.1 — because CollapseProject folds the argmin
        // into the post-explode projection. asNondeterministic is a pure
        // optimizer barrier against exactly that fold (the argmin itself is
        // deterministic): CollapseProject refuses nondeterministic
        // expressions, so the assignment is computed exactly once per vector
        // with NO per-iteration materialization (this used to be a
        // localCheckpoint copying the whole (cluster, vector) frame).
        val assignUdf = udf(nearest(cents) _).asNondeterministic()
        val assigned = base
          .select(assignUdf(col("v")).as("c"), col("v"))
        // (cluster, dim) partial sums as e6 longs: order-independent, exact.
        val stats = assigned
          .select(col("c"), posexplode(col("v")).as(Seq("p", "x")))
          .groupBy("c", "p")
          .agg(
            sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        stats.foreach { r =>
          val c = r.getInt(0)
          val p = r.getInt(1)
          val n = r.getLong(3)
          next(c)(p) = r.getLong(2).toDouble / 1e6 / n
        } // clusters with no assigned vectors keep their previous centroid
        cents = next
        it += 1
      }
      cents
    } finally base.unpersist(blocking = false)
  }

  /** Deterministic SAMPLE fit — the production recipe for corpus-scale
    * quantizers, first-class: Lloyd's iterations run on the ~`fraction`
    * subset whose `xxhash64(id, seed)` falls under the threshold, and the
    * full corpus is touched only by the one-scan assignment the caller
    * runs afterwards ([[assign]] / [[AnnIndex]]'s coding pass). The
    * sample is CONTENT-ADDRESSED (a pure function of ids), so unlike
    * `DataFrame.sample` it is identical on any partitioning — the fit
    * keeps [[fit]]'s bit-determinism contract. Cost drops from
    * O(corpus·k·iters) to O(corpus·fraction·k·iters) + one hash scan;
    * recall holds because Lloyd's estimates cluster MEANS, statistics a
    * uniform sample preserves (measured in SCALING.md's ann-sample study:
    * 10M corpus, k=3162, fraction 0.02 — fit 18 s vs ~586 s full Lloyd's,
    * recall@10 0.984/0.998/1.000 at nprobe 32/64/128, within noise of the
    * full fit's 0.982/0.998/1.000; the residual index-build cost is the
    * one-scan bucket-coding pass every IVF build pays). */
  def fitSample(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      fraction: Double,
      seed: Long = 42L): Array[Array[Double]] = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction must be in (0, 1], got $fraction")
    val denom = 1000000L
    val sampled =
      if (fraction >= 1.0) vecs
      else
        vecs.filter(
          pmod(xxhash64(col(idCol), lit(seed)), lit(denom)) < lit(math.ceil(fraction * denom).toLong))
    fit(sampled, idCol, vecCol, k, iters)
  }

  /** Cluster assignment column for a fitted model. */
  def assign(cents: Array[Array[Double]], vec: Column): Column =
    udf(nearest(cents) _).apply(vec)

  /** Column of the `nprobe` nearest centroid indices, nearest first —
    * the query-side bucket fan-out shared with IVF-PQ search. */
  def probe(cents: Array[Array[Double]], nprobe: Int, vec: Column): Column =
    udf(nearestN(cents, nprobe) _).apply(vec)

  /** Approximate top-k cosine neighbors: candidates live in their nearest
    * centroid's bucket; each query probes its `nprobe` nearest buckets. */
  def annTopK(
      queries: DataFrame,
      candidates: DataFrame,
      cents: Array[Array[Double]],
      idCol: String,
      vecCol: String,
      topK: Int,
      nprobe: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("q_id"),
      col(vecCol).as("q_emb"),
      explode(probe(cents, nprobe, col(vecCol))).as("bkt"))
    val c = candidates.select(
      col(idCol).as("c_id"),
      col(vecCol).as("c_emb"),
      assign(cents, col(vecCol)).as("bkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("cos").desc, col("c_id"))
    q.join(c, Seq("bkt"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", graft.ops.SimKernel.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(
        col("q_id"),
        col("rn").cast("int").as("rn"),
        col("c_id"),
        col("bkt"),
        floor(col("cos") * 1e6 + lit(0.5)).cast("long").as("score_e6"))
  }
}
