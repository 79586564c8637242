package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionEvent, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** cap_stream_* (SURVEY.md §2.I): batch↔stream equivalence through
  * MemoryStream — the strongest available check for watermark/state
  * semantics DuckDB cannot oracle.
  */
class StreamingSpec extends SparkSuite {
  import StreamingSpec._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Fixture events as in-memory rows (sf0.001 = 1000 events). */
  private lazy val fixtureEvents: Seq[Ev] = {
    import spark.implicits._
    Fixtures
      .events(spark, sf001)
      .select(
        col("event_id"),
        col("ts").cast("timestamp").as("ts"),
        col("user_id"),
        col("event_type"),
        col("value"))
      .as[Ev]
      .collect()
      .toSeq
      .sortBy(_.ts.getTime)
  }

  /** far-future sentinel that pushes the watermark past all real events */
  private val sentinel = Ev(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "zzz", 0.0)

  test("cap_stream tumbling agg: stream output equals batch on ordered feed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps
      .tumblingCounts(ms.toDF())
      .writeStream
      .format("memory")
      .queryName("t_tumbling")
      .outputMode(OutputMode.Append)
      .start()
    try {
      fixtureEvents.grouped(400).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      ms.addData(Seq(sentinel)) // advance watermark → flush all real windows
      q.processAllAvailable()
      val streamed = spark
        .table("t_tumbling")
        .filter(col("event_type") =!= "zzz")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = StreamOps
        .tumblingCounts(fixtureEvents.toDF())
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("cap_stream_static_join: micro-batches enrich against a static dimension, equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // static user→tier dimension (derived deterministically so batch can rebuild)
    val dim = spark.range(0, 200).select(col("id").as("user_id"), concat(lit("tier-"), pmod(col("id"), lit(3))).as("tier"))
    val ms = MemoryStream[Ev]
    val q = StreamOps
      .enrichWithDim(ms.toDF(), dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream
      .format("memory")
      .queryName("t_static_join")
      .outputMode(OutputMode.Append)
      .start()
    try {
      fixtureEvents.grouped(300).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      val streamed = spark
        .table("t_static_join")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      val batch = StreamOps
        .enrichWithDim(fixtureEvents.toDF(), dim, "user_id")
        .select("event_id", "user_id", "tier")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("cap_stream_watermark: events later than the watermark are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps
      .tumblingCounts(ms.toDF())
      .writeStream
      .format("memory")
      .queryName("t_wm")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1 establishes watermark = 03:00 - 10min = 02:50
      ms.addData(Seq(
        Ev(1, ts("2026-01-01 01:10:00"), 1, "click", 1.0),
        Ev(2, ts("2026-01-01 03:00:00"), 1, "click", 1.0)))
      q.processAllAvailable()
      // batch 2: one event far below the watermark (01:00 window already
      // finalized), one acceptable
      ms.addData(Seq(
        Ev(3, ts("2026-01-01 01:20:00"), 1, "click", 1.0), // late → dropped
        Ev(4, ts("2026-01-01 03:05:00"), 1, "click", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(sentinel))
      q.processAllAvailable()
      val rows = spark
        .table("t_wm")
        .filter(col("event_type") === "click")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2)))
        .toMap
      assert(rows("2026-01-01 01:00:00.0") == 1L, s"late event not dropped: $rows")
      assert(rows("2026-01-01 03:00:00.0") == 2L, s"on-time event missing: $rows")
    } finally q.stop()
  }

  test("cap_stream_dedup: duplicate event_ids within watermark collapse to one") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamOps
      .dedupWithinWatermark(ms.toDF())
      .writeStream
      .format("memory")
      .queryName("t_dedup")
      .outputMode(OutputMode.Append)
      .start()
    try {
      ms.addData(Seq(
        Ev(10, ts("2026-01-01 01:00:00"), 1, "view", 1.0),
        Ev(10, ts("2026-01-01 01:00:30"), 1, "view", 1.0), // dup in same batch
        Ev(11, ts("2026-01-01 01:01:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(
        Ev(10, ts("2026-01-01 01:02:00"), 1, "view", 1.0), // dup across batches
        Ev(12, ts("2026-01-01 01:03:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      val ids = spark.table("t_dedup").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(10L, 11L, 12L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("cap_stream_tws: transformWithState sessionization equals session_window batch (RocksDB state)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sessionEvents = fixtureEvents.map(e => SessionEvent(e.user_id, e.ts))
    val ms = MemoryStream[SessionEvent]
    val q = StreamOps
      .sessionizeTws(ms.toDS())
      .writeStream
      .format("memory")
      .queryName("t_tws")
      .outputMode(OutputMode.Append)
      .start()
    try {
      sessionEvents.grouped(300).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      ms.addData(Seq(SessionEvent(-1L, sentinel.ts)))
      q.processAllAvailable()
      // compare at ms granularity: Session state carries epoch millis (same
      // convention as the fMGWS test); session_window batch keeps micros
      val streamed = spark
        .table("t_tws")
        .filter(col("user_id") >= 0)
        .as[SessionOut]
        .collect()
        .map(s => (s.user_id, s.s_start.getTime, s.s_end.getTime, s.n))
        .toSet
      val batch = StreamOps
        .sessionizeBatch(sessionEvents.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
        .toSet
      assert(batch.nonEmpty)
      if (streamed != batch)
        fail(s"tws-vs-batch sizes ${streamed.size}/${batch.size}; " +
          s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("cap_stream_join: stream-stream interval join equals batch join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamOps
      .viewsBeforePurchase(views.toDF(), purchases.toDF())
      .writeStream
      .format("memory")
      .queryName("t_ssjoin")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val vEvents = fixtureEvents.filter(_.event_type == "view")
      val pEvents = fixtureEvents.filter(_.event_type == "purchase")
      // Feed in two uneven chunks to exercise cross-batch matching.
      views.addData(vEvents.take(vEvents.size / 2)); purchases.addData(pEvents.take(5))
      q.processAllAvailable()
      views.addData(vEvents.drop(vEvents.size / 2)); purchases.addData(pEvents.drop(5))
      q.processAllAvailable()
      views.addData(Seq(sentinel)); purchases.addData(Seq(sentinel.copy(event_id = -2)))
      q.processAllAvailable()
      val streamed = spark
        .table("t_ssjoin")
        .filter(col("user_id") >= 0)
        .select("purchase_id", "view_id")
        .as[(Long, Long)]
        .collect()
        .toSet
      val batch = StreamOps
        .viewsBeforePurchase(vEvents.toDF(), pEvents.toDF())
        .select("purchase_id", "view_id")
        .as[(Long, Long)]
        .collect()
        .toSet
      assert(batch.nonEmpty, "batch join empty — fixture has no view→purchase pairs in 30min")
      assert(streamed == batch, s"stream≠batch: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("cap_stream_join_outer: LEFT outer interval join emits watermark-driven null rows, equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamOps
      .viewsBeforePurchaseLeft(views.toDF(), purchases.toDF())
      .writeStream
      .format("memory")
      .queryName("t_ssjoin_left")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val vEvents = fixtureEvents.filter(_.event_type == "view")
      val pEvents = fixtureEvents.filter(_.event_type == "purchase")
      views.addData(vEvents.take(vEvents.size / 2)); purchases.addData(pEvents.take(5))
      q.processAllAvailable()
      views.addData(vEvents.drop(vEvents.size / 2)); purchases.addData(pEvents.drop(5))
      q.processAllAvailable()
      // the sentinel pushes BOTH watermarks far past every match interval,
      // forcing the deferred null rows for unmatched purchases to flush
      views.addData(Seq(sentinel)); purchases.addData(Seq(sentinel.copy(event_id = -2)))
      q.processAllAvailable()
      val streamed = spark
        .table("t_ssjoin_left")
        .filter(col("user_id") >= 0)
        .select(col("purchase_id"), col("view_id"))
        .as[(Long, Option[Long])]
        .collect()
        .toSet
      val batch = StreamOps
        .viewsBeforePurchaseLeft(vEvents.toDF(), pEvents.toDF())
        .select(col("purchase_id"), col("view_id"))
        .as[(Long, Option[Long])]
        .collect()
        .toSet
      val nullRows = batch.filter(_._2.isEmpty)
      assert(nullRows.nonEmpty, "fixture has no unmatched purchases — null-emission path untested")
      assert(streamed == batch,
        s"stream≠batch: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      // every purchase appears exactly once as null OR >=1 times matched, never both
      val nullIds = streamed.filter(_._2.isEmpty).map(_._1)
      val matchedIds = streamed.filter(_._2.nonEmpty).map(_._1)
      assert((nullIds & matchedIds).isEmpty, "a purchase emitted both null and matched rows")
    } finally q.stop()
  }

  test("cap_stream_join_outer: RIGHT outer interval join null-emits unmatched views, equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamOps
      .viewsBeforePurchaseRight(views.toDF(), purchases.toDF())
      .writeStream
      .format("memory")
      .queryName("t_ssjoin_right")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val vEvents = fixtureEvents.filter(_.event_type == "view")
      val pEvents = fixtureEvents.filter(_.event_type == "purchase")
      views.addData(vEvents.take(vEvents.size / 2)); purchases.addData(pEvents.take(5))
      q.processAllAvailable()
      views.addData(vEvents.drop(vEvents.size / 2)); purchases.addData(pEvents.drop(5))
      q.processAllAvailable()
      views.addData(Seq(sentinel)); purchases.addData(Seq(sentinel.copy(event_id = -2)))
      q.processAllAvailable()
      val streamed = spark
        .table("t_ssjoin_right")
        .filter(col("user_id") >= 0)
        .select(col("view_id"), col("purchase_id"))
        .as[(Long, Option[Long])]
        .collect()
        .toSet
      val batch = StreamOps
        .viewsBeforePurchaseRight(vEvents.toDF(), pEvents.toDF())
        .select(col("view_id"), col("purchase_id"))
        .as[(Long, Option[Long])]
        .collect()
        .toSet
      assert(batch.exists(_._2.isEmpty), "fixture has no unmatched views — null-emission path untested")
      assert(batch.exists(_._2.nonEmpty), "fixture has no matched views")
      assert(streamed == batch,
        s"stream≠batch: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      // a view emits null XOR matched rows, never both (no double emission)
      val nullIds = streamed.filter(_._2.isEmpty).map(_._1)
      val matchedIds = streamed.filter(_._2.nonEmpty).map(_._1)
      assert((nullIds & matchedIds).isEmpty, "a view emitted both null and matched rows")
    } finally q.stop()
  }

  test("cap_stream_join_outer: FULL outer interval join null-emits both sides exactly once, equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamOps
      .viewsBeforePurchaseFull(views.toDF(), purchases.toDF())
      .writeStream
      .format("memory")
      .queryName("t_ssjoin_full")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val vEvents = fixtureEvents.filter(_.event_type == "view")
      val pEvents = fixtureEvents.filter(_.event_type == "purchase")
      views.addData(vEvents.take(vEvents.size / 2)); purchases.addData(pEvents.take(5))
      q.processAllAvailable()
      views.addData(vEvents.drop(vEvents.size / 2)); purchases.addData(pEvents.drop(5))
      q.processAllAvailable()
      views.addData(Seq(sentinel)); purchases.addData(Seq(sentinel.copy(event_id = -2)))
      q.processAllAvailable()
      val streamed = spark
        .table("t_ssjoin_full")
        .filter(col("user_id") >= 0)
        .select(col("purchase_id"), col("view_id"))
        .as[(Option[Long], Option[Long])]
        .collect()
        .toSet
      val batch = StreamOps
        .viewsBeforePurchaseFull(vEvents.toDF(), pEvents.toDF())
        .select(col("purchase_id"), col("view_id"))
        .as[(Option[Long], Option[Long])]
        .collect()
        .toSet
      assert(batch.exists(r => r._1.isEmpty && r._2.nonEmpty), "no view-only null rows in fixture")
      assert(batch.exists(r => r._1.nonEmpty && r._2.isEmpty), "no purchase-only null rows in fixture")
      assert(batch.exists(r => r._1.nonEmpty && r._2.nonEmpty), "no matched rows in fixture")
      assert(!streamed.contains((None, None)), "a row with both sides null is impossible")
      assert(streamed == batch,
        s"stream≠batch: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      // no double emission on either side
      val nullViewIds = streamed.collect { case (Some(p), None) => p }
      val matchedPIds = streamed.collect { case (Some(p), Some(_)) => p }
      assert((nullViewIds & matchedPIds).isEmpty, "a purchase emitted both null and matched rows")
      val nullPIds = streamed.collect { case (None, Some(v)) => v }
      val matchedVIds = streamed.collect { case (Some(_), Some(v)) => v }
      assert((nullPIds & matchedVIds).isEmpty, "a view emitted both null and matched rows")
    } finally q.stop()
  }

  test("cap_stream_stateful: flatMapGroupsWithState sessionization equals session_window batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sessionEvents = fixtureEvents.map(e => SessionEvent(e.user_id, e.ts))
    val ms = MemoryStream[SessionEvent]
    val q = StreamOps
      .sessionize(ms.toDS())
      .writeStream
      .format("memory")
      .queryName("t_sess")
      .outputMode(OutputMode.Append)
      .start()
    try {
      sessionEvents.grouped(300).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      ms.addData(Seq(SessionEvent(-1L, sentinel.ts)))
      q.processAllAvailable()
      val streamed = spark
        .table("t_sess")
        .filter(col("user_id") =!= -1L)
        .as[SessionOut]
        .collect()
        .map(s => (s.user_id, s.s_start.getTime, s.s_end.getTime, s.n))
        .toSet
      val batch = StreamOps
        .sessionizeBatch(sessionEvents.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"stream≠batch: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("cap_stream_available_now: file-source stream drains existing data and stops, equals batch") {
    import spark.implicits._
    // The batch-incremental pattern: a periodic job starts the stream with
    // Trigger.AvailableNow, processes everything present (checkpointed, so
    // a rerun resumes where it left off), and terminates on its own.
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    val src = Fixtures
      .events(spark, sf001)
      .select("event_id", "user_id", "event_type")
      .limit(2000)
    src.write.parquet(dir + "/in")
    val stream = spark.readStream
      .schema(src.schema)
      .parquet(dir + "/in")
      .groupBy("event_type")
      .count()
    val q = stream.writeStream
      .format("memory")
      .queryName("avnow_out")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", dir + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow stream did not self-terminate")
    val streamed = spark.table("avnow_out").as[(String, Long)].collect().toMap
    val batch = src.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("cap_stream_sink_files: checkpointed file-to-file incremental runs are exactly-once across restarts") {
    import spark.implicits._
    // The lakehouse micro-batch pattern: each periodic run drains NEW input
    // files into a parquet sink; the checkpoint (source offsets + sink
    // commit log) makes a rerun pick up exactly where the last stopped —
    // no reprocessing, no duplicates, even though both runs share a sink
    // directory.
    val dir = java.nio.file.Files.createTempDirectory("graft-filesink").toString
    val all = Fixtures
      .events(spark, sf001)
      .select("event_id", "user_id", "event_type")
      .limit(3000)
      .cache()
    val firstHalf = all.filter(col("event_id") % 2 === 0)
    val secondHalf = all.filter(col("event_id") % 2 =!= 0)
    firstHalf.write.parquet(dir + "/in/batch1")
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(all.schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(dir + "/in/*")
        .withColumn("etype_key", upper(col("event_type")))
        .writeStream
        .format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "file-sink stream did not self-terminate")
    }
    runOnce()
    val afterFirst = spark.read.parquet(dir + "/out").count()
    assert(afterFirst == firstHalf.count(), s"first run wrote $afterFirst")
    // new input arrives between runs; the rerun must process ONLY it
    secondHalf.write.parquet(dir + "/in/batch2")
    runOnce()
    val out = spark.read.parquet(dir + "/out")
    assert(out.count() == all.count(), s"expected ${all.count()} rows, got ${out.count()}")
    // exactly-once: no event id appears twice, and the transform applied
    assert(out.select("event_id").distinct().count() == all.count())
    assert(out.filter(col("etype_key") =!= upper(col("event_type"))).count() == 0)
    // a third run with NO new input is a no-op
    runOnce()
    assert(spark.read.parquet(dir + "/out").count() == all.count(), "no-op rerun duplicated rows")
  }

  test("cap_stream_attribution: flatMapGroupsWithState last-touch credit equals the batch window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val attrEvents = fixtureEvents.map(e =>
      StreamOps.AttrEvent(e.user_id, e.event_id, e.ts, e.event_type, math.floor(e.value * 100 + 0.5).toLong))
    val ms = MemoryStream[StreamOps.AttrEvent]
    val q = StreamOps
      .attribute(ms.toDS())
      .writeStream
      .format("memory")
      .queryName("t_attr")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // deterministic intra-chunk shuffle: the handler must re-sort each
      // micro-batch by (ts, event_id) itself, so feeding each chunk
      // disordered is semantics-preserving and exercises that path
      attrEvents.grouped(300).foreach { chunk =>
        ms.addData(chunk.sortBy(e => e.event_id % 7)); q.processAllAvailable()
      }
      ms.addData(Seq(StreamOps.AttrEvent(-1L, -1L, sentinel.ts, "zzz", 0L)))
      q.processAllAvailable()
      val streamed = spark
        .table("t_attr")
        .filter(col("user_id") =!= -1L)
        .as[StreamOps.AttrOut]
        .collect()
        .map(a => (a.user_id, a.event_id, a.touch_type, a.value_c))
        .toSet
      val batch = StreamOps
        .attributeBatch(attrEvents.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"stream!=batch: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("cap_stream_attribution: cross-batch disorder — no state regression, no negative-lag credit") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ev(id: Long, t: String, typ: String, v: Long = 100L) =
      StreamOps.AttrEvent(7L, id, ts(t), typ, v)
    val ms = MemoryStream[StreamOps.AttrEvent]
    val q = StreamOps
      .attribute(ms.toDS())
      .writeStream
      .format("memory")
      .queryName("t_attr_ooo")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1: the NEWEST touch arrives first
      ms.addData(Seq(ev(1, "1996-01-01 10:00:00", "click")))
      q.processAllAvailable()
      // batch 2 (all within the 10-min watermark of batch 1):
      //  - view@09:55 is OLDER than the stored click@10:00 → must NOT
      //    regress state
      //  - purchase@09:58 precedes the stored click in event time → NO
      //    credit (conservative), and crucially not a negative-lag credit
      ms.addData(Seq(
        ev(2, "1996-01-01 09:55:00", "view"),
        ev(3, "1996-01-01 09:58:00", "purchase", 500L)))
      q.processAllAvailable()
      // batch 3: a purchase after the stored touch credits the CLICK (the
      // newest touch), not the view that arrived last
      ms.addData(Seq(ev(4, "1996-01-01 10:05:00", "purchase", 900L)))
      q.processAllAvailable()
      val out = spark
        .table("t_attr_ooo")
        .as[StreamOps.AttrOut]
        .collect()
        .map(a => (a.event_id, a.touch_type, a.value_c))
        .toSet
      assert(out == Set((4L, "click", 900L)),
        s"expected only the click-credited purchase 4, got $out")
    } finally q.stop()
  }

  test("cap_stream_attribution: touch older than watermark-lookback does not kill the query") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ev(u: Long, id: Long, t: String, typ: String) =
      StreamOps.AttrEvent(u, id, ts(t), typ, 100L)
    val ms = MemoryStream[StreamOps.AttrEvent]
    val q = StreamOps
      .attribute(ms.toDS())
      .writeStream
      .format("memory")
      .queryName("t_attr_late")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // advance the watermark far ahead on one user...
      ms.addData(Seq(ev(1L, 1, "1996-03-01 00:00:00", "click")))
      q.processAllAvailable()
      // ...then deliver another user's touch >7 days older than the
      // watermark: the raw timeout ts (touch + 7d) would be BELOW the
      // watermark — without the clamp setTimeoutTimestamp throws and the
      // whole query dies on this one record
      ms.addData(Seq(ev(2L, 2, "1996-01-01 00:00:00", "click")))
      q.processAllAvailable()
      ms.addData(Seq(ev(1L, 3, "1996-03-01 00:30:00", "purchase")))
      q.processAllAvailable()
      val out = spark
        .table("t_attr_late")
        .as[StreamOps.AttrOut]
        .collect()
        .map(a => (a.user_id, a.event_id, a.touch_type))
        .toSet
      assert(out == Set((1L, 3L, "click")), s"got $out")
    } finally q.stop()
  }
}


object StreamingSpec {
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
}
