package graft.functions

import graft.ops.SimKernel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign-random-projection) LSH for cosine similarity —
  * the scale path for embedding-cosine near-duplicate detection, completing
  * the dedup-family triad (MinHash→Jaccard, SimHash→Hamming, SRP→cosine).
  *
  * Charikar's SRP: for a fixed random hyperplane h, P[sign(h·a) = sign(h·b)]
  * = 1 − θ(a,b)/π. Packing `rowsPerBand` sign bits into a band value gives
  * AND-amplification (unrelated pairs at cos≈0 collide per band with
  * p = 0.5^rowsPerBand), and `bands` bands give OR-amplification for recall.
  * Parameters auto-scale with corpus size by default (rowsPerBand ≈
  * log2(N), bands sized for ≈0.9 recall at the threshold) so candidate
  * volume stays linear in N — see nearDuplicatePairs.
  *
  * Hyperplanes are pseudo-random but fully deterministic: derived from
  * (seed, dim) with a fixed PRNG, memoized per executor — no broadcast
  * needed, every task regenerates the identical planes. The signature is a
  * compiled UDF (per-element column lambdas would be CodegenFallback —
  * interpreted — and 64-d dot products per plane are exactly the hot loop
  * that wants JIT'd primitive arrays). Candidates from the banded self-join
  * are re-checked with the exact cosine (graft's codegen Expression), so
  * output pairs are never false positives.
  *
  * At 100 TB: signatures are one map-only pass; the self-join shuffles on
  * band values (uniform — sign bits of random projections); verification
  * joins candidates back to vectors by id. No all-pairs stage.
  */
object CosineLsh {
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Float]]]()

  private def planes(seed: Long, dim: Int, k: Int): Array[Array[Float]] =
    planeCache.computeIfAbsent((seed, dim, k), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(k)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    })

  /** AUTO band parameters (bands, rowsPerBand) for corpus size `n` at
    * threshold `minCosine`: rowsPerBand ≈ log2(n) holds expected random
    * bucket occupancy constant (random pairs collide per band at
    * ~0.5^r = 1/n, so candidates stay linear in n); bands then grows to
    * hold ≈0.9 recall for pairs exactly AT the threshold (ln 10 / p^r
    * bands gives 1-(1-p^r)^b ≥ 1-e^-ln10 = 0.9 before the cap). The
    * survival probability is floored at cos = 0.5 so exploratory
    * thresholds (where SRP-LSH degenerates) don't drive bands to
    * infinity — the cap + exact verification keep output sound
    * regardless. Design envelope: the linear-candidate bound holds up to
    * n ≈ 2^25 (~33M vectors), where rowsPerBand hits its recall-
    * protecting cap of 24; beyond that, shard the corpus (the IVF/PQ ANN
    * family) instead of widening bands. Package-visible for the
    * parameter-derivation spec. */
  private[graft] def autoParams(n: Long, minCosine: Double): (Int, Int) = {
    val r = math.max(8, math.min(24, math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt))
    val pAtTau = 1.0 - math.acos(math.min(0.999, math.max(minCosine, 0.5))) / math.Pi
    val b = math.max(8, math.min(64, math.ceil(math.log(10.0) / math.pow(pAtTau, r)).toInt))
    (b, r)
  }

  /** Near-duplicate pairs (exact cosine >= minCosine) among (id, vec) rows.
    *
    * `bands` / `rowsPerBand` default to -1 = AUTO: the sf0.1→sf1 scaling
    * study (SCALING.md) measured that FIXED band parameters make
    * intra-bucket candidate pairs grow quadratically in corpus size
    * (occupancy ∝ N ⇒ pairs ∝ N²), the classic LSH failure at scale. Auto
    * sizes the band width with the corpus: rowsPerBand ≈ log2(N) keeps the
    * EXPECTED random-collision count per band ≈ N·(N/2^r) ≈ N — linear —
    * and bands grows to hold recall ≈ 0.9 for pairs AT the requested
    * threshold (pairs above it retain more). The one `vecs.count()` this
    * costs is model-sized fit state, the same class as the IVF centroid
    * fit. Explicit values bypass auto for reproduction/tuning. */
  def nearDuplicatePairs(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      bands: Int = -1,
      rowsPerBand: Int = -1,
      seed: Long = 42L): DataFrame = {
    val n: Long =
      if (bands == -1 || rowsPerBand == -1) math.max(2L, vecs.count()) else 2L
    val (autoB, autoR) = autoParams(n, minCosine)
    val r = if (rowsPerBand == -1) autoR else rowsPerBand
    val b = if (bands == -1) autoB else bands
    // The band packing below puts the band index in the high 32 bits and the
    // packed sign bits in the low 32; rowsPerBand > 32 would overflow into
    // the index bits and make distinct bands collide.
    require(r >= 1 && r <= 32,
      s"rowsPerBand must be in [1, 32], got $r")
    require(b >= 1, s"bands must be >= 1, got $b")
    require(b.toLong * r <= Int.MaxValue,
      s"bands * rowsPerBand must be <= Int.MaxValue, got $b * $r")
    val s = seed
    // One band value per row: high 32 bits = band index, low bits = packed
    // sign bits, so distinct bands never collide with each other.
    val bandsUdf = udf { v: Seq[Float] =>
      if (v == null || v.isEmpty) Seq.empty[Long]
      else {
        val dim = v.length
        val arr = v.toArray
        val ps = planes(s, dim, b * r)
        (0 until b).map { j =>
          var acc = 0L
          var i = 0
          while (i < r) {
            val p = ps(j * r + i)
            var dot = 0.0f
            var d = 0
            while (d < dim) { dot += p(d) * arr(d); d += 1 }
            acc = (acc << 1) | (if (dot > 0) 1L else 0L)
            i += 1
          }
          (j.toLong << 32) | acc
        }
      }
    }
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val banded = base.select(col("id"), explode(bandsUdf(col("vec"))).as("band"))
    val cand = banded
      .as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    cand
      .join(base.select(col("id").as("a_id"), col("vec").as("a_vec")), "a_id")
      .join(base.select(col("id").as("b_id"), col("vec").as("b_vec")), "b_id")
      .withColumn("cos", SimKernel.cosine(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= minCosine)
      .select(col("a_id"), col("b_id"), floor(col("cos") * 1e6 + lit(0.5)).cast("long").as("cos_e6"))
  }
}
