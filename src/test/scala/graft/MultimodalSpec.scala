package graft

import graft.multimodal.{MediaPipeline, MediaRecord}
import org.apache.spark.sql.functions._

/** Multimodal binary plumbing. Image payloads decode for real via the JDK's
  * javax.imageio; codec-less kinds (the text-as-bytes records here) exercise
  * the deterministic fallback path and the Spark-side
  * schema/partitioning/batching contract.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic in-memory PNG: a w×h gradient. */
  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + seed) % 256 << 16) | ((y * 11) % 256 << 8) | ((x + y) % 256))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private lazy val records = Fixtures
    .table(spark, sf001, "documents")
    .select(col("doc_id"), col("text"))
    .as[(Long, String)]
    .map { case (id, text) => MediaRecord(id, "text", text.getBytes("UTF-8")) }

  test("decodeFeatures: typed features, deterministic, byte-length faithful") {
    val feats = MediaPipeline.decodeFeatures(records).cache()
    val n = feats.count()
    assert(n == 500)
    // n_bytes equals n_chars for the ASCII fixture text
    val joined = feats
      .toDF()
      .join(Fixtures.table(spark, sf001, "documents"), col("id") === col("doc_id"))
      .filter(col("n_bytes") =!= col("n_chars"))
    assert(joined.count() == 0, "byte length disagrees with n_chars on ASCII text")
    // histogram is a probability distribution
    val badHist = feats.filter { f =>
      math.abs(f.histogram.sum - 1.0) > 1e-9 || f.histogram.exists(_ < 0)
    }
    assert(badHist.count() == 0)
    // deterministic across runs
    val again = MediaPipeline.decodeFeatures(records).collect().map(f => f.id -> f.checksum).toMap
    val first = feats.collect().map(f => f.id -> f.checksum).toMap
    assert(again == first)
  }

  test("decodeFeatures: real PNG decode reports true dimensions + luma histogram") {
    val imgs = spark.createDataset(
      (0L until 20L).map(i => MediaRecord(i, "image", pngBytes(40 + i.toInt, 25, i.toInt))))
    val feats = MediaPipeline.decodeFeatures(imgs).collect().map(f => f.id -> f).toMap
    assert(feats.size == 20)
    (0L until 20L).foreach { i =>
      val f = feats(i)
      assert(f.width == 40 + i.toInt, s"true decoded width for $i")
      assert(f.height == 25, s"true decoded height for $i")
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9 && f.histogram.forall(_ >= 0))
    }
  }

  test("resize: real image resample re-encodes to the target dimensions") {
    val imgs = spark.createDataset(Seq(MediaRecord(1L, "image", pngBytes(64, 48, 3))))
    val out = MediaPipeline.resize(imgs, 32, 32).collect().head
    assert(out.kind == "image:32x32")
    val decoded =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(decoded.getWidth == 32 && decoded.getHeight == 32)
    // nearest-neighbour: corner pixel survives the resample exactly
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pngBytes(64, 48, 3)))
    assert((decoded.getRGB(0, 0) & 0xffffff) == (src.getRGB(0, 0) & 0xffffff))
  }

  test("resize: payload resampled to exact target size, deterministic") {
    val resized = MediaPipeline.resize(records, 32, 32).cache()
    assert(resized.count() == 500)
    val bad = resized.filter(r => r.payload.length != 32 * 32 || !r.kind.endsWith(":32x32"))
    assert(bad.count() == 0)
    val a = resized.collect().map(r => r.id -> r.payload.toSeq).toMap
    val b = MediaPipeline.resize(records, 32, 32).collect().map(r => r.id -> r.payload.toSeq).toMap
    assert(a == b)
  }

  test("sampleFrames: every Nth 256-byte block, stable count") {
    val frames = MediaPipeline.sampleFrames(records, everyN = 2).cache()
    val perDoc = frames.groupByKey(_.id).count().collect().toMap
    val expected = records
      .collect()
      .map(r => r.id -> ((r.payload.length + 255) / 256 + 1) / 2)
      .toMap
    assert(perDoc.view.mapValues(_.toInt).toMap == expected.view.mapValues(_.toInt).toMap)
  }

  /** Deterministic animated GIF: `n` solid-color 16×16 frames. */
  private def animatedGif(n: Int): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { i =>
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color((i * 40) % 256, (i * 80) % 256, (i * 120) % 256))
      g.fillRect(0, 0, 16, 16)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    buf.toByteArray
  }

  test("cap_scan_binary: binaryFile source ingests real image files into the decode pipeline") {
    // The ingestion path a real multimodal corpus uses: a directory of
    // media files → (path, content) rows → MediaPipeline decode.
    val dir = java.nio.file.Files.createTempDirectory("graft-imgs").toString
    (0 until 5).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/img_$i.png"),
        pngBytes(30 + i, 20, i))
    }
    val files = spark.read.format("binaryFile").load(dir)
    assert(files.count() == 5)
    val records = files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        MediaRecord("img_(\\d+)".r.findFirstMatchIn(path).get.group(1).toLong, "image", bytes)
      }
    val feats = MediaPipeline.decodeFeatures(records).collect().map(f => f.id -> f).toMap
    assert(feats.size == 5)
    (0L until 5L).foreach { i =>
      assert(feats(i).width == 30 + i.toInt && feats(i).height == 20, s"decode wrong for $i: ${feats(i)}")
    }
  }

  test("sampleFrames: real multi-frame GIF decode — every Nth decoded frame, distinct pixel checksums") {
    val vids = spark.createDataset(Seq(
      MediaRecord(1L, "video/gif", animatedGif(6)),
      MediaRecord(2L, "video/gif", animatedGif(3))))
    val frames = MediaPipeline.sampleFrames(vids, everyN = 2).collect()
    val byId = frames.groupBy(_.id)
    assert(byId(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4), s"got ${byId(1L).toSeq}")
    assert(byId(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 2), s"got ${byId(2L).toSeq}")
    // distinct solid colors → distinct pixel checksums; re-run is identical
    assert(byId(1L).map(_.frame_checksum).distinct.length == 3)
    val again = MediaPipeline.sampleFrames(vids, everyN = 2).collect().sortBy(f => (f.id, f.frame_idx))
    assert(again.toSeq == frames.sortBy(f => (f.id, f.frame_idx)).toSeq)
  }

  /** Deterministic in-memory WAV: `n` frames of a 16-bit mono square-ish
    * wave at the given rate, written by the JDK's own WAVE encoder. */
  private def wavBytes(rate: Float, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s: Short = if ((i / 50) % 2 == 0) 12000 else -12000
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("decodeAudio: real WAV decode — exact rate/channels/frames, amplitude histogram") {
    val ds = Seq(
      MediaRecord(1L, "audio/wav", wavBytes(16000f, 800)),
      MediaRecord(2L, "audio/wav", wavBytes(8000f, 400)),
      MediaRecord(3L, "audio/mp3", Array.tabulate(256)(_.toByte)) // undecodable → fallback
    ).toDS()
    val out = MediaPipeline.decodeAudio(ds).collect().sortBy(_.id)
    assert(out(0).sample_rate == 16000 && out(0).channels == 1 && out(0).n_frames == 800L)
    assert(out(1).sample_rate == 8000 && out(1).n_frames == 400L)
    // all samples have |amp| 12000 → exactly one occupied histogram bin
    assert(out(0).amp_hist.count(_ > 0) == 1 && math.abs(out(0).amp_hist.sum - 1.0) < 1e-9)
    // decode is deterministic across runs
    val again = MediaPipeline.decodeAudio(ds).collect().sortBy(_.id)
    assert(again.map(_.amp_hist.toSeq).toSeq == out.map(_.amp_hist.toSeq).toSeq)
  }
}
