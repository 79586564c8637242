package graft.multimodal

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

/** Multimodal column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed per partition.
  *
  * STUB NOTICE: this container ships no media codecs, so `decode` derives
  * features deterministically from the raw bytes (rolling checksum, fake
  * dimensions, byte histogram). A real deployment swaps only the body of
  * `decode` for a codec call — the Spark-side contract (typed Dataset in,
  * typed Dataset out, mapPartitions batching so codec init happens once per
  * partition, not per row) is the real, tested part.
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

  /** Stubbed decode: deterministic features from bytes (see STUB NOTICE). */
  private def decode(r: MediaRecord): MediaFeatures = {
    val cs = checksum(r.payload)
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

  /** Decode/feature-extract: one codec context per partition (the expensive
    * init a real codec needs happens in the mapPartitions prologue). */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() here, closed at exhaustion
      it.map(decode)
    }
  }

  /** Resize stub: deterministically resample the payload to `w*h` bytes
    * (a real pipeline swaps in codec scaling; the per-partition typed
    * Dataset→Dataset contract is the tested part). */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    val target = w * h
    ds.mapPartitions(_.map { r =>
      val out = new Array[Byte](target)
      val n = math.max(r.payload.length, 1)
      var i = 0
      while (i < target) {
        out(i) = r.payload((i.toLong * n / target).toInt % n)
        i += 1
      }
      r.copy(kind = s"${r.kind}:${w}x$h", payload = out)
    })
  }

  /** Frame-sampling stub: every `everyN`-th 256-byte block is one "frame". */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload
        .grouped(256)
        .zipWithIndex
        .collect { case (block, idx) if idx % everyN == 0 =>
          MediaFrame(r.id, idx, checksum(block))
        }
    }
  }
}
