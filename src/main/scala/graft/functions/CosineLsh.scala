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
  * With the defaults (8×8), a cos=0.9 pair survives with ≈0.93 probability
  * while random pairs collide at 1/256 per band.
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

  /** Near-duplicate pairs (exact cosine >= minCosine) among (id, vec) rows. */
  def nearDuplicatePairs(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      bands: Int = 8,
      rowsPerBand: Int = 8,
      seed: Long = 42L): DataFrame = {
    // The band packing below puts the band index in the high 32 bits and the
    // packed sign bits in the low 32; rowsPerBand > 32 would overflow into
    // the index bits and make distinct bands collide.
    require(rowsPerBand >= 1 && rowsPerBand <= 32,
      s"rowsPerBand must be in [1, 32], got $rowsPerBand")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(bands.toLong * rowsPerBand <= Int.MaxValue,
      s"bands * rowsPerBand must be <= Int.MaxValue, got $bands * $rowsPerBand")
    val b = bands
    val r = rowsPerBand
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
