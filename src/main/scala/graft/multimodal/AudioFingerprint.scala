package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

case class AudioHash(id: Long, t: Int, hash: Int)

/** Constellation (landmark) audio fingerprinting over the REAL WAV/AU/AIFF
  * decode path — the Shazam-style near-duplicate detector completing the
  * multimodal dedup triad (image pHash, video frame pHash, audio
  * landmarks).
  *
  * Per track: 16-bit PCM → mono → Hann-windowed 512-sample STFT frames
  * (hop 256, iterative radix-2 FFT — no external DSP lib) → per frame one
  * spectral peak in each of four log-spaced bands → the four peak bins
  * packed into one int hash per frame. A cover/re-encode of the same audio
  * keeps its spectral peaks (amplitude scaling and mild noise move
  * magnitudes, not argmax bins), so its frames re-hash identically.
  *
  * Matching is the inverted-index + OFFSET-ALIGNMENT join, all relational:
  * self-join frame hashes on equality (shuffle key = hash — the posting
  * list), then count matches per (a, b, Δt) and keep pairs whose BEST
  * aligned run reaches `minMatches`. Alignment is what kills false
  * positives: two tracks sharing ambient hashes at random offsets never
  * accumulate one consistent Δt. A hot-hash guard drops degenerate hashes
  * seen in more than `maxTracksPerHash` tracks (silence, test tones) —
  * the same posting-cap every production inverted index applies.
  *
  * At 100 TB: fingerprinting is map-only per track (mapPartitions);
  * matching shuffles on uniform 32-bit hashes; nothing is ever all-pairs.
  * Undecodable payloads (mp3/ogg — no JDK codec) yield zero hashes rather
  * than fake features: fingerprints exist only for REAL decodes.
  */
object AudioFingerprint {
  private val FrameSize = 512
  private val Hop = 256
  // log-spaced peak bands over the 256 positive-frequency bins
  private val Bands: Array[(Int, Int)] = Array((1, 8), (8, 32), (32, 96), (96, 256))
  // absolute in-band-energy floor below which a frame counts as silent
  // (normalized samples are in [-1, 1]; real signal energy over 255 bins
  // sits many orders of magnitude above this)
  private val SilenceEps = 1e-9

  /** In-place iterative radix-2 FFT (re, im of length 512). */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) { // bit-reversal permutation
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** 16-bit PCM payload → mono samples in [-1, 1]; None if undecodable. */
  private def monoSamples(r: MediaRecord): Option[Array[Double]] =
    if (!r.kind.startsWith("audio")) None
    else
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = ais.readAllBytes()
            val ch = fmt.getChannels
            val nFrames = bytes.length / (2 * ch)
            val out = new Array[Double](nFrames)
            var f = 0
            while (f < nFrames) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val i = 2 * (f * ch + c)
                val s =
                  if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                  else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                acc += s / 32768.0
                c += 1
              }
              out(f) = acc / ch
              f += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch { case _: Exception => None }

  /** One landmark hash per STFT frame: the four band-peak bins packed
    * 8 bits each. Deterministic — fixed window, fixed bands, argmax with
    * lowest-bin tiebreak. */
  private def hashTrack(samples: Array[Double]): Iterator[(Int, Int)] = {
    val hann = Array.tabulate(FrameSize)(i =>
      0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FrameSize - 1))))
    val nFrames = math.max((samples.length - FrameSize) / Hop + 1, 0)
    (0 until nFrames).iterator.flatMap { t =>
      val re = new Array[Double](FrameSize)
      val im = new Array[Double](FrameSize)
      var i = 0
      while (i < FrameSize) { re(i) = samples(t * Hop + i) * hann(i); i += 1 }
      fft(re, im)
      // total in-band energy for the RELATIVE peak floor: a band whose
      // "peak" is just quantization noise (< -30 dB of the frame) hashes
      // as 0 — otherwise re-quantization at a different volume flips the
      // argmax of a signal-free band and breaks the whole hash. Relative,
      // not absolute, so the floor is invariant to amplitude scaling —
      // EXCEPT for all-silent frames, which an all-relative rule would
      // let through (0 >= 0·total): every silent intro/outro would then
      // share one constant landmark at consecutive offsets and
      // accumulate false offset-aligned matches between unrelated
      // tracks. Silent frames (total below an absolute epsilon) emit NO
      // landmark at all, and the per-band floor is strict.
      var total = 0.0
      var bb = Bands.head._1
      while (bb < Bands.last._2) { total += re(bb) * re(bb) + im(bb) * im(bb); bb += 1 }
      if (total <= SilenceEps) None
      else {
        var hash = 0
        Bands.foreach { case (lo, hi) =>
          var best = lo
          var bestMag = -1.0
          var b = lo
          while (b < hi) {
            val m = re(b) * re(b) + im(b) * im(b)
            if (m > bestMag) { bestMag = m; best = b }
            b += 1
          }
          val bin = if (bestMag > 0.001 * total) best else 0
          hash = (hash << 8) | (bin & 0xff)
        }
        Some((t, hash))
      }
    }
  }

  /** Per-track landmark hashes — map-only (mapPartitions), zero rows for
    * undecodable payloads. */
  def fingerprints(ds: Dataset[MediaRecord]): Dataset[AudioHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      monoSamples(r) match {
        case Some(s) => hashTrack(s).map { case (t, h) => AudioHash(r.id, t, h) }
        case None    => Iterator.empty
      }
    })
  }

  /** Near-duplicate track pairs: tracks whose best OFFSET-ALIGNED run of
    * matching landmarks reaches `minMatches`. Returns (a_id, b_id, dt,
    * n_matches) for the best alignment per pair. */
  def nearDuplicatePairs(
      ds: Dataset[MediaRecord],
      minMatches: Long,
      maxTracksPerHash: Long = 1000L): DataFrame = {
    val fp = fingerprints(ds).toDF().distinct()
    // hot-hash guard: a hash present in nearly every track (silence, test
    // tones) would quadratically explode the posting join and carries no
    // discriminating signal
    val hot = fp
      .groupBy("hash")
      .agg(countDistinct("id").as("n_tracks"))
      .filter(col("n_tracks") > maxTracksPerHash)
      .select("hash")
    val clean = fp.join(broadcast(hot), Seq("hash"), "left_anti")
    val a = clean.select(col("hash"), col("id").as("a_id"), col("t").as("t_a"))
    val b = clean.select(col("hash"), col("id").as("b_id"), col("t").as("t_b"))
    a.join(b, Seq("hash"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), (col("t_a") - col("t_b")).as("dt"))
      .agg(count(lit(1)).as("n_matches"))
      .filter(col("n_matches") >= minMatches)
      .groupBy("a_id", "b_id")
      .agg(max(struct(col("n_matches"), col("dt"))).as("best"))
      .select(col("a_id"), col("b_id"), col("best.dt").as("dt"), col("best.n_matches").as("n_matches"))
  }
}
