package graft

import graft.multimodal.{AudioFingerprint, MediaRecord}

/** cap_audio_neardup: constellation landmark fingerprints over the REAL
  * JDK WAV decode — planted same-audio variants (amplitude-scaled,
  * time-shifted) must pair with a consistent offset; different tone
  * content must not pair; undecodable payloads yield zero fingerprints.
  */
class AudioFingerprintSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic 16-bit mono WAV playing a NON-STATIONARY "melody": the
    * note changes every 1024 samples (cycling through `notes`, plus a 2.5×
    * overtone), so every STFT frame hashes differently and offset
    * alignment is unambiguous — a stationary tone would match at many Δt
    * with equal counts. */
  private def toneWav(
      notes: Seq[Double],
      rate: Float = 8000f,
      n: Int = 8192,
      amp: Double = 8000.0,
      leadSilence: Int = 0): Array[Byte] = {
    val total = leadSilence + n
    val pcm = new Array[Byte](total * 2)
    var i = 0
    while (i < n) {
      val f = notes((i / 1024) % notes.size)
      val x = (math.sin(2.0 * math.Pi * f * i / rate) +
        0.5 * math.sin(2.0 * math.Pi * f * 2.5 * i / rate)) / 1.5
      val s = math.max(math.min(x * amp, 32767.0), -32768.0).toShort
      val j = leadSilence + i
      pcm(2 * j) = (s & 0xff).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, total.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("planted near-dups pair with consistent offset; distinct content does not") {
    val songA = Seq(440.0, 659.0, 880.0, 1175.0, 523.0, 988.0, 784.0, 1319.0)
    val songB = Seq(610.0, 737.0, 1030.0, 1480.0, 566.0, 1245.0, 905.0, 679.0)
    val ds = Seq(
      MediaRecord(1L, "audio/wav", toneWav(songA)),
      // same audio, 60% volume → same spectral peaks
      MediaRecord(2L, "audio/wav", toneWav(songA, amp = 4800.0)),
      // same audio shifted by exactly 4 hops of lead silence
      MediaRecord(3L, "audio/wav", toneWav(songA, leadSilence = 1024)),
      MediaRecord(4L, "audio/wav", toneWav(songB)),
      MediaRecord(5L, "audio/mp3", Array.tabulate(512)(_.toByte)) // undecodable
    ).toDS()
    val pairs = AudioFingerprint
      .nearDuplicatePairs(ds, minMatches = 10L, maxTracksPerHash = 1000L)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Int]("dt"))
      .toMap
    assert(pairs.contains((1L, 2L)), s"volume-scaled dup not found: $pairs")
    assert(pairs((1L, 2L)) == 0, s"scaled dup should align at dt=0: $pairs")
    assert(pairs.contains((1L, 3L)), s"time-shifted dup not found: $pairs")
    assert(pairs((1L, 3L)) == -4, s"1024-sample lead = 4 hops, expected dt=-4: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(4L) },
      s"distinct content paired: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(5L) },
      s"undecodable payload fingerprinted: $pairs")
  }

  test("fingerprints are deterministic and absent for undecodable kinds") {
    val ds = Seq(
      MediaRecord(1L, "audio/wav", toneWav(Seq(440.0, 1100.0, 880.0))),
      MediaRecord(2L, "audio/ogg", Array.tabulate(256)(_.toByte))
    ).toDS()
    val f1 = AudioFingerprint.fingerprints(ds).collect().sortBy(h => (h.id, h.t)).toSeq
    val f2 = AudioFingerprint.fingerprints(ds).collect().sortBy(h => (h.id, h.t)).toSeq
    assert(f1 == f2, "fingerprints not deterministic")
    assert(f1.nonEmpty && f1.forall(_.id == 1L), "ogg payload should yield zero hashes")
  }

  test("silent frames emit no landmarks: shared silent intros cannot fake a duplicate") {
    // Two DIFFERENT songs, each with a long all-silent intro. Only two
    // tracks carry the silence, so the hot-hash guard (cap 1000) never
    // fires — if silent frames hashed to a constant landmark, the intros
    // would accumulate a consistent-offset run past minMatches and the
    // pair would be a false duplicate. Silence must instead produce zero
    // landmarks.
    val songA = Seq(440.0, 659.0, 880.0, 1175.0, 523.0, 988.0, 784.0, 1319.0)
    val songB = Seq(610.0, 737.0, 1030.0, 1480.0, 566.0, 1245.0, 905.0, 679.0)
    val ds = Seq(
      MediaRecord(1L, "audio/wav", toneWav(songA, n = 4096, leadSilence = 8192)),
      MediaRecord(2L, "audio/wav", toneWav(songB, n = 4096, leadSilence = 8192))
    ).toDS()
    val silentTrack = Seq(MediaRecord(9L, "audio/wav", toneWav(Seq(1.0), amp = 0.0))).toDS()
    assert(
      AudioFingerprint.fingerprints(silentTrack).count() == 0L,
      "all-silent track produced landmarks")
    val pairs = AudioFingerprint
      .nearDuplicatePairs(ds, minMatches = 10L, maxTracksPerHash = 1000L)
      .count()
    assert(pairs == 0L, s"silent intros manufactured $pairs false duplicate pair(s)")
  }

  test("hot-hash guard drops degenerate hashes instead of exploding the join") {
    // 30 copies of pure silence share every hash; with the cap at 5 the
    // posting join must drop them all and return no pairs
    val silent = (1L to 30L).map(i => MediaRecord(i, "audio/wav", toneWav(Seq(1.0), amp = 0.0)))
    val pairs = AudioFingerprint
      .nearDuplicatePairs(silent.toDS(), minMatches = 1L, maxTracksPerHash = 5L)
      .count()
    assert(pairs == 0L, s"hot hashes not dropped: $pairs pairs")
  }
}
