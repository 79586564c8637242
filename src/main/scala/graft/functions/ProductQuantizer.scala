package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search") — the third ANN tier beside sign-bit IVF and k-means
  * IVF, and the one with the realistic 100-TB MEMORY shape: each candidate
  * vector is stored as `m` small codes (one byte each at ksub<=256) plus a
  * coarse bucket id instead of `dim` floats — a 32× compression at
  * dim=64/m=16 — so a 100-TB raw corpus indexes in ~3 TB.
  *
  * Search is IVF-PQ with asymmetric distance computation (ADC):
  *   - candidates live in their nearest coarse-centroid bucket (reuses the
  *     deterministic [[KMeansIvf]] coarse quantizer) carrying only codes;
  *   - each query probes its `nprobe` nearest buckets and precomputes ONE
  *     m×ksub table of exact subspace distances to every sub-centroid;
  *   - the approximate distance to a candidate is m table lookups (sum of
  *     dt[i][code_i]) — no per-pair float-vector arithmetic at all.
  *
  * Vectors are L2-normalized inside fit/encode/search, making squared L2
  * order identical to cosine order (||a-b||² = 2-2·cos for unit vectors),
  * so results rank compatibly with the exact-cosine baselines.
  *
  * Determinism: same engineering as [[KMeansIvf]] — fixed init (subvectors
  * of the k lowest-id vectors), fixed iteration count, e6-integer centroid
  * sums (order-independent exact addition), ties toward the lowest index.
  * Codebook fits on any partitioning are bit-identical. The per-iteration
  * `.collect()` is model-sized (m × ksub × dsub doubles), the same
  * driver-side model state Spark ML keeps.
  */
object ProductQuantizer {
  /** m codebooks of ksub sub-centroids, each of dim/m doubles. */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def dsub: Int = codebooks(0)(0).length
  }

  private def normalize(v: Seq[Float]): Array[Double] = {
    val out = new Array[Double](v.length)
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    i = 0
    while (i < v.length) { out(i) = if (n == 0.0) 0.0 else v(i).toDouble / n; i += 1 }
    out
  }

  private def subSqDist(v: Array[Double], off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      val t = v(off + i) - c(i)
      d += t * t
      i += 1
    }
    d
  }

  /** Per-subspace nearest sub-centroid codes over an ALREADY-normalized
    * vector (ties → lowest index). */
  private def encodeNorm(cbs: Array[Array[Array[Double]]])(nvs: Seq[Double]): Seq[Int] = {
    val nv = nvs.toArray
    val dsub = cbs(0)(0).length
    cbs.indices.map { mi =>
      val off = mi * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cbs(mi).length) {
        val d = subSqDist(nv, off, cbs(mi)(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      best
    }
  }

  /** Per-subspace nearest sub-centroid codes (ties → lowest index). */
  private def encodeVec(cbs: Array[Array[Array[Double]]])(v: Seq[Float]): Seq[Int] =
    encodeNorm(cbs)(normalize(v).toSeq)

  /** Deterministic per-subspace Lloyd's fit — ONE distributed aggregation
    * per iteration covers all m subspaces: each vector is encoded once
    * (m argmins), then (dim-position, code) partial sums accumulate as
    * e6 longs; dim position p belongs to subspace p/dsub, so the group key
    * (p, code of p/dsub) already identifies (subspace, sub-centroid, dim). */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int, iters: Int): Model = {
    // Normalize and materialize ONCE before the loop: re-planning from the
    // source would re-scan the corpus AND re-run the normalize UDF every
    // Lloyd iteration (at 100 TB: `iters` full reads for a model-sized
    // result). Iterations scan this cached frame; only the encode UDF —
    // whose closure captures the evolving codebooks — changes per round.
    val nrm = udf((v: Seq[Float]) => normalize(v))
    // fan-out before materializing: every Lloyd iteration's encode (m
    // argmins per vector) scans this frame, and an unsplittable one-file
    // corpus would pin all of it to a single task (guide §2.5); no-op on a
    // multi-split corpus. The SEED (and the dim probe it implies) collects
    // from this same fanned frame (r22): the old pre-fanOut
    // head() + orderBy(id).limit(ksub) paid two 1-task scans of the raw
    // vector column — identical seed values (normalize is applied either
    // way), now one parallel per-partition top-k over the frame the loop
    // caches anyway.
    val base = graft.ops.Checkpoints
      .fanOut(vecs.select(col(idCol).as("__id"), nrm(col(vecCol)).as("v")))
      .persist()
    val seed = base
      .orderBy(col("__id"))
      .limit(ksub)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.length == ksub, s"need at least $ksub vectors to seed $ksub sub-centroids")
    val dim = seed(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    var cbs: Array[Array[Array[Double]]] =
      Array.tabulate(m, ksub)((mi, j) => seed(j).slice(mi * dsub, (mi + 1) * dsub))
    try {
      var it = 0
      while (it < iters) {
        // asNondeterministic is a pure OPTIMIZER BARRIER here (the encoder is
        // deterministic): CollapseProject only merges deterministic
        // expressions, so the codes projection cannot be folded into the
        // post-posexplode select — which would re-evaluate the m-argmin
        // encode once per GENERATED row (dim× per vector; the hazard
        // KMeansIvf.fit documents). The barrier replaces a per-iteration
        // localCheckpoint that used to copy the whole (codes, v) frame.
        val enc = udf(encodeNorm(cbs) _).asNondeterministic()
        val assigned = base
          .select(enc(col("v")).as("codes"), col("v"))
        val stats = assigned
          .select(col("codes"), posexplode(col("v")).as(Seq("p", "x")))
          .select(col("p"), element_at(col("codes"), (col("p") / dsub).cast("int") + 1).as("c"), col("x"))
          .groupBy("p", "c")
          .agg(
            sum(floor(col("x") * 1e6 + 0.5).cast("long")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val next = cbs.map(_.map(_.clone()))
        stats.foreach { r =>
          val p = r.getInt(0)
          val c = r.getInt(1)
          val n = r.getLong(3)
          next(p / dsub)(c)(p % dsub) = r.getLong(2).toDouble / 1e6 / n
        } // empty sub-clusters keep their previous sub-centroid
        cbs = next
        it += 1
      }
      Model(cbs)
    } finally base.unpersist(blocking = false)
  }

  /** PQ code column (array<int>, m entries) for a fitted model. */
  def encode(model: Model, vec: Column): Column =
    udf(encodeVec(model.codebooks) _).apply(vec)

  /** Approximate top-k neighbors via IVF-PQ with ADC, optionally with exact
    * re-ranking (IVFADC-R, Jégou et al. 2011).
    *
    * `coarse` is a [[KMeansIvf]] centroid matrix for bucketing (fit on the
    * same corpus). The candidate side carries ONLY (id, bucket, codes) — the
    * at-scale index layout; raw vectors never cross the bucket-join shuffle.
    * The query side fans out nprobe× (tiny) carrying its m×ksub distance
    * table, and ranking is m lookups per pair inside the bucket-join —
    * never all-pairs.
    *
    * `rerank` = 0: rank purely by ADC → (q_id, rn, c_id, bkt, dist_e6).
    * `rerank` = R > 0: ADC keeps the R best per query, then ONLY those R×|Q|
    * rows join back to raw vectors by id for an exact cosine re-rank →
    * (q_id, rn, c_id, bkt, score_e6). Quantization noise is typically larger
    * than the cosine gap between close neighbors, so production PQ always
    * re-ranks a shortlist; the raw-vector fetch is R rows per query — a tiny
    * id-keyed join, not a corpus scan. */
  def annTopK(
      queries: DataFrame,
      candidates: DataFrame,
      coarse: Array[Array[Double]],
      model: Model,
      idCol: String,
      vecCol: String,
      topK: Int,
      nprobe: Int,
      rerank: Int = 0): DataFrame = {
    require(rerank == 0 || rerank >= topK,
      s"rerank=$rerank would silently cap output below topK=$topK; use rerank >= topK (or 0 for ADC-only)")
    val m = model.m
    val ksub = model.ksub
    val dsub = model.dsub
    val cbs = model.codebooks
    // dt(mi*ksub + j) = || q_sub(mi) - codebook(mi)(j) ||² over the
    // normalized query — exact subspace distances, computed once per query.
    val dtabUdf = udf { (v: Seq[Float]) =>
      val nv = normalize(v)
      val dt = new Array[Double](m * ksub)
      var mi = 0
      while (mi < m) {
        var j = 0
        while (j < ksub) {
          dt(mi * ksub + j) = subSqDist(nv, mi * dsub, cbs(mi)(j))
          j += 1
        }
        mi += 1
      }
      dt
    }
    val adcUdf = udf { (dt: Seq[Double], codes: Seq[Int]) =>
      var d = 0.0
      var mi = 0
      while (mi < m) { d += dt(mi * ksub + codes(mi)); mi += 1 }
      d
    }
    val q = queries.select(
      col(idCol).as("q_id"),
      dtabUdf(col(vecCol)).as("dtab"),
      explode(KMeansIvf.probe(coarse, nprobe, col(vecCol))).as("bkt"))
    val c = candidates.select(
      col(idCol).as("c_id"),
      KMeansIvf.assign(coarse, col(vecCol)).as("bkt"),
      encode(model, col(vecCol)).as("codes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("dist"), col("c_id"))
    val shortK = if (rerank > 0) rerank else topK
    val shortlist = q.join(c, Seq("bkt"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("dist", adcUdf(col("dtab"), col("codes")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortK)
    if (rerank <= 0)
      shortlist.select(
        col("q_id"),
        col("rn").cast("int").as("rn"),
        col("c_id"),
        col("bkt"),
        floor(col("dist") * 1e6 + lit(0.5)).cast("long").as("dist_e6"))
    else {
      val raw = candidates.select(col(idCol).as("c_id"), col(vecCol).as("c_emb"))
      val qraw = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_emb"))
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id")
        .orderBy(col("cos").desc, col("c_id"))
      shortlist
        .select("q_id", "c_id", "bkt")
        .join(raw, Seq("c_id"))
        .join(qraw, Seq("q_id"))
        .withColumn("cos", graft.ops.SimKernel.cosine(col("q_emb"), col("c_emb")))
        .withColumn("rn", row_number().over(wx))
        .filter(col("rn") <= topK)
        .select(
          col("q_id"),
          col("rn").cast("int").as("rn"),
          col("c_id"),
          col("bkt"),
          floor(col("cos") * 1e6 + lit(0.5)).cast("long").as("score_e6"))
    }
  }
}
