package graft

import graft.multimodal.{MediaPipeline, MediaRecord}
import org.apache.spark.sql.functions._

/** Multimodal binary plumbing (stubbed decode — no codecs in this image;
  * the Spark-side schema/partitioning/batching contract is the real part).
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

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
}
