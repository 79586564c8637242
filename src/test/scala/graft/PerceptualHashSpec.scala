package graft

import graft.multimodal.{MediaRecord, PerceptualHash}

/** Recall + soundness for perceptual image dedup on planted variants.
  *
  * Base images get hash-mixed per-pixel luma (cross-image hashes are
  * effectively random 64-bit values → expected Hamming distance ~32, far
  * outside any small radius). The planted variant is a uniform +10
  * brightness shift — a monotone luma map, the transformation dHash is
  * exactly invariant to (all pairwise comparisons preserved; base luma
  * capped at 200 so the shift never clamps) and pHash nearly so (AC DCT
  * coefficients are shift-invariant in exact math).
  */
class PerceptualHashSpec extends SparkSuite {
  import spark.implicits._

  /** splitmix-style mixer — decorrelates pixels across (seed, x, y). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def png(seed: Long, shift: Int): Array[Byte] = {
    val (w, h) = (40, 30)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // coarse 0..200 luma in steps of 25 (comparisons have margin >= 25,
      // so a +10 shift can never reorder them), then the variant shift
      val base = (math.floorMod(mix(seed * 1000003 + y * 101 + x), 9) * 25).toInt
      val v = base + shift
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private val nBase = 20
  private lazy val corpus = spark.createDataset(
    (0 until nBase).flatMap { i =>
      Seq(
        MediaRecord(i.toLong, "image", png(i, 0)),
        MediaRecord(100L + i, "image", png(i, 10))) // planted brightness variant
    })

  test("dhash: brightness variants found, nothing else (recall + soundness)") {
    val pairs = PerceptualHash
      .nearDuplicateImages(corpus, "dhash", maxHamming = 3)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val planted = (0 until nBase).map(i => (i.toLong, 100L + i)).toSet
    assert(pairs == planted, s"missing=${planted -- pairs} extra=${pairs -- planted}")
  }

  test("phash: brightness variants found, nothing else") {
    val pairs = PerceptualHash
      .nearDuplicateImages(corpus, "phash", maxHamming = 3)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val planted = (0 until nBase).map(i => (i.toLong, 100L + i)).toSet
    assert(pairs == planted, s"missing=${planted -- pairs} extra=${pairs -- planted}")
  }

  test("phash shrugs off high-frequency checkerboard noise (its edge over dhash)") {
    // +12-luma checkerboard = energy at the highest spatial frequency; the
    // 8×8 low-frequency DCT block pHash thresholds barely moves, while
    // local-difference hashes have no such frequency separation.
    def noisy(seed: Long): Array[Byte] = {
      val base = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png(seed, 0)))
      for (y <- 0 until base.getHeight; x <- 0 until base.getWidth) {
        val v = math.min((base.getRGB(x, y) & 0xff) + 12 * ((x + y) % 2), 255)
        base.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(base, "png", buf)
      buf.toByteArray
    }
    val both = spark.createDataset(
      (0 until nBase).flatMap { i =>
        Seq(MediaRecord(i.toLong, "image", png(i, 0)), MediaRecord(100L + i, "image", noisy(i)))
      })
    val hs = PerceptualHash.hashes(both).collect().map(h => h.id -> h).toMap
    (0 until nBase).foreach { i =>
      val d = java.lang.Long.bitCount(hs(i.toLong).phash ^ hs(100L + i).phash)
      assert(d <= 3, s"phash distance $d under high-frequency noise for base $i")
    }
  }

  test("dhash is exactly invariant to the monotone brightness shift") {
    val hs = PerceptualHash.hashes(corpus).collect().map(h => h.id -> h).toMap
    (0 until nBase).foreach { i =>
      assert(hs(i.toLong).dhash == hs(100L + i).dhash, s"dhash differs for base $i")
    }
  }

  test("hashes are deterministic across runs and undecodable payloads are dropped") {
    val withJunk = corpus.union(spark.createDataset(Seq(
      MediaRecord(999L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRecord(998L, "audio", "not an image".getBytes("UTF-8")))))
    val a = PerceptualHash.hashes(withJunk).collect().map(h => (h.id, h.dhash, h.phash)).sorted.toSeq
    val b = PerceptualHash.hashes(withJunk).collect().map(h => (h.id, h.dhash, h.phash)).sorted.toSeq
    assert(a == b)
    assert(!a.exists(h => h._1 == 999L || h._1 == 998L))
    assert(a.size == 2 * nBase)
  }

  test("q_img_phash: pair list is exactly the same-motif cliques, deterministic") {
    val q = SparkEntry.queries("q_img_phash")
    val r1 = q(spark, sf001).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val r2 = q(spark, sf001).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(r1 == r2)
    val ids = Fixtures.table(spark, sf001, "documents").select("doc_id").as[Long].collect()
    val expected = (for {
      a <- ids; b <- ids
      if a < b && a % 40 == b % 40
    } yield (a, b)).toSet
    assert(r1 == expected, s"missing=${(expected -- r1).take(5)} extra=${(r1 -- expected).take(5)}")
  }

  /** Animated GIF of textured frames: frame i draws pattern(seed·31+i)
    * shifted by `shift` luma — per-frame variants of the still-image
    * corpus, quantized to the web-safe-ish palette GIF encoding keeps. */
  private def texturedGif(seed: Long, nFrames: Int, shift: Int): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png(seed * 31 + i, shift)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    buf.toByteArray
  }

  test("cap_video_neardup: frame-hash overlap finds the shifted variant videos, nothing else") {
    // 6 base videos of 5 textured frames; each gets a +10-brightness
    // variant (every frame shifted — the whole video is a near-dup) at
    // id+100. Distinct bases share no frames → no cross pairs.
    val vids = spark.createDataset(
      (0 until 6).flatMap { v =>
        Seq(
          graft.multimodal.MediaRecord(v.toLong, "video/gif", texturedGif(v, 5, 0)),
          graft.multimodal.MediaRecord(100L + v, "video/gif", texturedGif(v, 5, 10)))
      })
    val pairs = PerceptualHash
      .nearDuplicateVideos(vids, everyN = 1, maxHamming = 3, minMatches = 3)
      .select("a_vid", "b_vid")
      .as[(Long, Long)]
      .collect()
      .toSet
    val planted = (0 until 6).map(v => (v.toLong, 100L + v)).toSet
    assert(pairs == planted, s"missing=${planted -- pairs} extra=${pairs -- planted}")
    // determinism + frame accounting: the matched-frame count for a planted
    // pair can never exceed the sampled frame count
    val n = PerceptualHash
      .nearDuplicateVideos(vids, everyN = 1, maxHamming = 3, minMatches = 3)
      .select("n_matched")
      .as[Long]
      .collect()
    assert(n.forall(x => x >= 3 && x <= 5), s"bad match counts: ${n.toSeq}")
  }
}
