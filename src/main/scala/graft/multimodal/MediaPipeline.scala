package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset

case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
case class MediaFeatures(
    id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    width: Int,
    height: Int,
    histogram: Array[Double])
case class MediaFrame(id: Long, frame_idx: Int, frame_checksum: Long)
case class AudioFeatures(
    id: Long,
    kind: String,
    n_bytes: Int,
    sample_rate: Int,
    channels: Int,
    n_frames: Long,
    amp_hist: Array[Double])

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed per partition.
  *
  * `image` payloads are decoded for real via the JDK's `javax.imageio`
  * (PNG/JPEG/GIF/BMP ship with Java 17 — no external codec): true
  * width/height and an 8-bin luminance histogram. Kinds the JDK cannot
  * decode (audio, video) fall back to deterministic checksum-derived
  * features — that fallback is the remaining STUB; a real deployment swaps
  * it for a codec call. The Spark-side contract (typed Dataset in, typed
  * Dataset out, mapPartitions batching so codec init happens once per
  * partition, not per row) is real either way.
  */
object MediaPipeline {
  private def checksum(bytes: Array[Byte]): Long = {
    var h = 7L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** Kind-gated JDK image decode, shared with PerceptualHash. NonFatal, not
    * just IOException: imageio readers throw RuntimeExceptions
    * (ArrayIndexOutOfBounds, NegativeArraySize, IllegalArgument) on
    * malformed-but-recognized payloads, and one corrupt record must drop,
    * not kill the job. */
  private[multimodal] def readImage(r: MediaRecord): Option[BufferedImage] =
    if (r.kind.startsWith("image"))
      try Option(ImageIO.read(new ByteArrayInputStream(r.payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    else None

  /** Real decode for images; checksum-derived fallback (STUB) otherwise. */
  private def decode(r: MediaRecord): MediaFeatures = {
    val cs = checksum(r.payload)
    readImage(r) match {
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Double](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // integer Rec.601 luma — deterministic, no float rounding
            val lum =
              (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum / 32) += 1.0
            x += 1
          }
          y += 1
        }
        val n = math.max(w * h, 1)
        MediaFeatures(r.id, r.kind, r.payload.length, cs, w, h, hist.map(_ / n))
      case None =>
        val hist = new Array[Double](8)
        r.payload.foreach(b => hist((b & 0xff) / 32) += 1.0)
        val n = math.max(r.payload.length, 1)
        MediaFeatures(
          id = r.id,
          kind = r.kind,
          n_bytes = r.payload.length,
          checksum = cs,
          width = 16 + (cs % 64).toInt,
          height = 16 + ((cs / 64) % 64).toInt,
          histogram = hist.map(_ / n))
    }
  }

  /** Decode/feature-extract: one codec context per partition (the expensive
    * init a real codec needs happens in the mapPartitions prologue). */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() here, closed at exhaustion
      it.map(decode)
    }
  }

  /** Real audio decode for WAV/AU/AIFF payloads via the JDK's
    * `javax.sound.sampled` (no external codec): true sample rate, channel
    * count, frame length, and an 8-bin |amplitude| histogram over 16-bit
    * PCM samples. Audio kinds the JDK cannot parse (mp3/ogg/…) fall back
    * to deterministic checksum-derived features — that fallback is the
    * remaining audio STUB; raw-video decode stays stubbed in sampleFrames
    * (no container codec ships with the JDK). */
  def decodeAudio(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val cs = checksum(r.payload)
      val real: Option[AudioFeatures] =
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
                val hist = new Array[Double](8)
                var i = 0
                while (i + 1 < bytes.length) {
                  val s =
                    if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                    else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                  hist(math.min(math.abs(s.toInt) / 4096, 7)) += 1.0
                  i += 2
                }
                val n = math.max(bytes.length / 2, 1)
                Some(AudioFeatures(
                  r.id, r.kind, r.payload.length,
                  fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
                  hist.map(_ / n)))
              }
            } finally ais.close()
          } catch { case _: Exception => None }
      real.getOrElse {
        val hist = new Array[Double](8)
        r.payload.foreach(b => hist((b & 0xff) / 32) += 1.0)
        val n = math.max(r.payload.length, 1)
        AudioFeatures(
          id = r.id,
          kind = r.kind,
          n_bytes = r.payload.length,
          sample_rate = 8000 + (cs % 40000).toInt,
          channels = 1 + (cs % 2).toInt,
          n_frames = r.payload.length.toLong / 2,
          amp_hist = hist.map(_ / n))
      }
    })
  }

  /** Resize. Images: real nearest-neighbour resample via decode → setRGB →
    * PNG re-encode (deterministic — fixed sampling grid, JDK PNG writer).
    * Non-image payloads: deterministic byte resampling to `w*h` bytes (the
    * STUB path for codec-less kinds). */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    val target = w * h
    ds.mapPartitions(_.map { r =>
      val payload = readImage(r) match {
        case Some(img) =>
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
              x += 1
            }
            y += 1
          }
          val buf = new ByteArrayOutputStream()
          ImageIO.write(out, "png", buf)
          buf.toByteArray
        case None =>
          val out = new Array[Byte](target)
          val n = math.max(r.payload.length, 1)
          var i = 0
          while (i < target) {
            out(i) = r.payload((i.toLong * n / target).toInt % n)
            i += 1
          }
          out
      }
      r.copy(kind = s"${r.kind}:${w}x$h", payload = payload)
    })
  }

  /** Pixel checksum of a decoded frame — deterministic across JVMs. */
  private def frameChecksum(img: BufferedImage): Long = {
    var h = 7L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = (h * 131 + (img.getRGB(x, y) & 0xffffff)) % 1000000007L
        x += 1
      }
      y += 1
    }
    h
  }

  /** Frame sampling. Multi-frame payloads the JDK can decode (animated GIF —
    * the zero-dependency stand-in for a video container) are sampled for
    * real: every `everyN`-th decoded frame, checksummed over pixels. Other
    * kinds fall back to the 256-byte-block STUB. One reader per payload,
    * inside mapPartitions/flatMap, mirroring per-partition codec init. */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val real: Option[Seq[MediaFrame]] =
        if (r.kind.contains("gif") || r.kind.startsWith("video"))
          try {
            val reader = ImageIO.getImageReadersBySuffix("gif").next()
            val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              if (n <= 0) None
              else Some((0 until n by everyN).map(i => MediaFrame(r.id, i, frameChecksum(reader.read(i)))))
            } finally { reader.dispose(); iis.close() }
          } catch { case _: Exception => None }
        else None
      real.getOrElse {
        r.payload
          .grouped(256)
          .zipWithIndex
          .collect { case (block, idx) if idx % everyN == 0 =>
            MediaFrame(r.id, idx, checksum(block))
          }
          .toSeq
      }
    }
  }
}
