package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.HammingPairs

case class ImageHashes(id: Long, dhash: Long, phash: Long)
case class FrameHash(id: Long, frame_idx: Int, phash: Long)

/** Perceptual image fingerprints — the image twin of SimHash text dedup:
  * one 64-bit signature per image, near-duplicates = small Hamming
  * distance, pairs found by the shared banded [[HammingPairs]] join.
  * Closes the multimodal near-dup gap using only the JDK's `javax.imageio`
  * decode (PNG/JPEG/GIF/BMP — no external codec).
  *
  * Two classic hashes, both over integer Rec.601 luma:
  *
  *   - dHash (difference hash): sample a 9×8 luma grid, emit one bit per
  *     horizontally adjacent comparison (left < right). Robust to uniform
  *     brightness/contrast shifts (monotone luma maps preserve inequalities)
  *     and to resampling; cheap.
  *   - pHash (DCT hash): sample a 32×32 luma grid, 2-D DCT-II, keep the
  *     8×8 lowest-frequency block, emit one bit per coefficient vs the mean
  *     of the 63 AC coefficients. Robust to high-frequency noise (blur,
  *     compression artifacts) that dHash's local differences pick up.
  *
  * Determinism: nearest-neighbour integer grid sampling, integer luma, and
  * a fixed-order double DCT — identical bits on every JVM/partitioning.
  *
  * At 100 TB: hashing is a map-only `mapPartitions` scan (decode cost, one
  * codec init per partition); the pair join is the banded HammingPairs
  * kernel — 4 rows/image explosion, shuffle on 16-bit band keys, no
  * all-pairs stage. Undecodable payloads are dropped from the hash relation
  * (callers wanting them use an anti-join on id).
  */
object PerceptualHash {
  /** Integer Rec.601 luma of a pixel, 0..255. */
  @inline private def luma(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000

  /** Nearest-neighbour luma grid sample: gw×gh ints from anywhere in the
    * image — the same fixed sampling grid as MediaPipeline.resize. */
  private def lumaGrid(img: BufferedImage, gw: Int, gh: Int): Array[Int] = {
    val out = new Array[Int](gw * gh)
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        out(y * gw + x) = luma(img.getRGB(x * img.getWidth / gw, y * img.getHeight / gh))
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit difference hash: bit (y*8+x) set iff grid(x+1,y) > grid(x,y)
    * on a 9×8 luma grid. */
  def dhash64(img: BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var out = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) out |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    out
  }

  /** cos((2x+1)·u·π/64) for the 32-point DCT-II, precomputed once per JVM —
    * the naive form calls math.cos ~65k times per image. */
  private lazy val cosTable: Array[Array[Double]] =
    Array.tabulate(32, 32)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 64))

  /** 64-bit DCT hash: 32×32 luma grid → 2-D DCT-II → 8×8 low-frequency
    * block; bit i set iff coefficient i exceeds the mean of the 63 AC
    * coefficients (the DC bit is constant-by-construction, as in every
    * standard pHash — 63 effective bits). */
  def phash64(img: BufferedImage): Long = {
    val n = 32
    val g = lumaGrid(img, n, n)
    // Separable DCT-II: rows then columns, fixed iteration order.
    val rows = Array.ofDim[Double](n, n)
    var u = 0
    while (u < n) {
      var y = 0
      while (y < n) {
        var s = 0.0
        var x = 0
        while (x < n) {
          s += g(y * n + x) * cosTable(x)(u)
          x += 1
        }
        rows(y)(u) = s
        y += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0
        var y = 0
        while (y < n) {
          s += rows(y)(u2) * cosTable(y)(v)
          y += 1
        }
        coef(v * 8 + u2) = s
        u2 += 1
      }
      v += 1
    }
    var acSum = 0.0
    var i = 1
    while (i < 64) { acSum += coef(i); i += 1 }
    val mean = acSum / 63.0
    var out = 0L
    i = 0
    while (i < 64) {
      if (coef(i) > mean) out |= (1L << i)
      i += 1
    }
    out
  }

  /** (id, dhash, phash) for every decodable image payload; non-image kinds
    * and undecodable/corrupt payloads are dropped (MediaPipeline.readImage
    * gates on kind and swallows NonFatal decoder errors). One decode per
    * record, per-partition batching. */
  def hashes(ds: Dataset[MediaRecord]): Dataset[ImageHashes] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      MediaPipeline.readImage(r).map(i => ImageHashes(r.id, dhash64(i), phash64(i)))
    })
  }

  /** Near-duplicate image pairs (a_id, b_id, dist) by the chosen hash
    * ("dhash" | "phash") within `maxHamming`, via the banded
    * [[HammingPairs]] join (complete for maxHamming <= 3). */
  def nearDuplicateImages(
      ds: Dataset[MediaRecord],
      hash: String,
      maxHamming: Int,
      maxBucket: Int = 0): DataFrame = {
    require(hash == "dhash" || hash == "phash", s"unknown hash '$hash'")
    // Truncate lineage before the banded SELF-join: both join sides would
    // otherwise re-execute the whole upstream (decode + both hashes — for
    // a synthetic corpus, the render/encode too) — measured ~2× on
    // q_img_phash at sf0.1. After truncation the join reads 3 longs/row.
    HammingPairs.pairs(
      graft.ops.Checkpoints.truncate(hashes(ds).toDF()),
      "id", hash, maxHamming, maxBucket)
  }

  /** Per-sampled-frame pHash for multi-frame payloads (animated GIF — the
    * zero-dependency video stand-in, same reader loop as
    * MediaPipeline.sampleFrames): every `everyN`-th decoded frame hashed.
    * Single-frame kinds and undecodable payloads yield no rows. */
  def frameHashes(ds: Dataset[MediaRecord], everyN: Int): Dataset[FrameHash] = {
    // Validate OUTSIDE the per-record try: `by 0` throws from Range, and the
    // decode catch-all would silently swallow it as "undecodable payload"
    // (zero frames for every record) instead of failing the bad argument.
    require(everyN > 0, s"everyN must be positive, got $everyN")
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      if (!(r.kind.contains("gif") || r.kind.startsWith("video"))) Seq.empty[FrameHash]
      else
        try {
          val reader = ImageIO.getImageReadersBySuffix("gif").next()
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
          try {
            reader.setInput(iis)
            (0 until reader.getNumImages(true) by everyN)
              .map(i => FrameHash(r.id, i, phash64(reader.read(i))))
          } finally { reader.dispose(); iis.close() }
        } catch { case scala.util.control.NonFatal(_) => Seq.empty[FrameHash] }
    }
  }

  /** Video near-duplicate pairs (a_vid, b_vid, n_matched): two payloads are
    * near-dups when at least `minMatches` of the lower-id video's sampled
    * frames have a pHash within `maxHamming` of SOME frame of the other —
    * the frame-signature-overlap decision real video dedup pipelines make,
    * built entirely from the image kernel: frames flow through the SAME
    * banded [[HammingPairs]] join as stills (frame key = id·2^16+idx, so
    * sampled frame indices must stay under 65536), then frame pairs roll up
    * to video pairs with one countDistinct agg. No all-pairs stage at any
    * level: candidate generation stays banded per frame, and the rollup key
    * is the video pair. */
  def nearDuplicateVideos(
      ds: Dataset[MediaRecord],
      everyN: Int,
      maxHamming: Int,
      minMatches: Long): DataFrame = {
    // The composite key packs frame_idx into 16 bits; an index >= 65536
    // would alias into the NEXT video's key space and silently corrupt
    // pairs. FAIL LOUDLY on overflow instead of dropping the frame — a
    // silently thinned frame set would just lose pairs with no signal,
    // while the error tells the caller the remedy (raise everyN: a
    // 65k-sampled-frame payload is ~36 min of 30fps video sampled every
    // frame — raise the stride long before widening the key).
    val fh = graft.ops.Checkpoints.truncate(
      frameHashes(ds, everyN)
        .select(
          expr(
            "CASE WHEN frame_idx < 65536 THEN id * 65536 + frame_idx " +
              "ELSE CAST(raise_error(concat('sampled frame_idx ', frame_idx, " +
              "' overflows the 16-bit frame key; raise everyN')) AS BIGINT) END").as("fid"),
          col("phash")))
    HammingPairs
      .pairs(fh, "fid", "phash", maxHamming)
      .select(
        expr("a_id div 65536").as("va"),
        pmod(col("a_id"), lit(65536L)).as("fa"),
        expr("b_id div 65536").as("vb"),
        pmod(col("b_id"), lit(65536L)).as("fb"))
      .filter(col("va") =!= col("vb"))
      .select(
        least(col("va"), col("vb")).as("a_vid"),
        greatest(col("va"), col("vb")).as("b_vid"),
        when(col("va") < col("vb"), col("fa")).otherwise(col("fb")).as("f_lo"))
      .groupBy("a_vid", "b_vid")
      .agg(countDistinct(col("f_lo")).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
  }
}
