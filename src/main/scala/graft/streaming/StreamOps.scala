package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState
}

/** SURVEY.md §2.I — Structured Streaming implementations (cap_stream_*).
  *
  * Every transform takes a DataFrame/Dataset (batch OR streaming) and
  * returns the transformed frame, so the ScalaTest suites can drive the same
  * logical plan twice — once through MemoryStream micro-batches, once as a
  * batch — and assert equality: the strongest check available for semantics
  * DuckDB cannot oracle (watermarks, state eviction).
  *
  * At scale: state is per-key (user_id) in the state store; watermark bounds
  * state size; session merge is O(open sessions per user) — the same design
  * that holds on a 1000-executor cluster with RocksDB state backend.
  */
object StreamOps {
  /** Tumbling 1-hour event-time window with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("sum_value_c"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value_c"))

  /** Stream-static enrichment: each micro-batch inner-joins the static
    * dimension — stateless (no watermark needed; only the stream side
    * grows), and the broadcast makes every micro-batch a map-side lookup,
    * the shape a 1000-executor enrichment wants. The static side is read
    * fresh per micro-batch planner cycle, so slowly-refreshed dimension
    * files pick up automatically with file-based sources. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Streaming dedup by event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class AttrEvent(
      user_id: Long,
      event_id: Long,
      ts: java.sql.Timestamp,
      event_type: String,
      value_c: Long)
  case class AttrOut(user_id: Long, event_id: Long, touch_type: String, value_c: Long)
  // public: the state Encoder's codegen must reach the ctor. eventId rides
  // along so cross-batch ordering compares the full (tsMs, eventId) pair —
  // the same total order the batch window sorts by.
  case class Touch(tsMs: Long, eventId: Long, typ: String)

  private val attrWindowMs = 7L * 24 * 3600 * 1000

  /** Streaming last-touch attribution — the q_attribution window op as
    * arbitrary keyed state: the carried state per user is ONE (ts, type)
    * pair (the latest click/view), purchases emit immediately with the
    * credit, and the state expires via an event-time timer once the
    * 7-day lookback has passed with no fresher touch — so state size is
    * exactly one record per RECENTLY-ACTIVE user, watermark-bounded, the
    * shape a 1000-executor RocksDB state store wants. Within a
    * micro-batch, events replay in (ts, event_id) order, reproducing the
    * batch window's STRICTLY-preceding frame semantics (a same-timestamp
    * touch with a lower event_id counts; a later one doesn't). Across
    * micro-batches the single-touch state keeps only the MAX-(ts,
    * event_id) touch, so when the source disorders a user's events within
    * the watermark the op stays CONSERVATIVE: an older touch never
    * overwrites a newer one, and a purchase whose stored touch has a
    * later (ts, event_id) gets NO credit rather than a negative-lag
    * credit — it equals the batch window exactly whenever each purchase
    * arrives no earlier (in micro-batch order) than every touch that
    * precedes it in event time. */
  def attribute(events: Dataset[AttrEvent]): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(attributeGroup)
  }

  private def attributeGroup(
      user: Long,
      evs: Iterator[AttrEvent],
      state: GroupState[Touch]): Iterator[AttrOut] = {
    if (state.hasTimedOut) { // lookback expired with no fresher touch
      state.remove()
      return Iterator.empty
    }
    var last = state.getOption.orNull
    val out = List.newBuilder[AttrOut]
    evs.toList.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      if (e.event_type == "purchase") {
        // credit only a touch that STRICTLY PRECEDES the purchase in the
        // batch window's (ts, event_id) total order — a stored touch with
        // a LATER event time (possible when micro-batches disorder a
        // user's events within the watermark) must not produce a
        // negative-lag credit
        if (last != null && e.ts.getTime - last.tsMs <= attrWindowMs &&
            (last.tsMs < e.ts.getTime || (last.tsMs == e.ts.getTime && last.eventId < e.event_id)))
          out += AttrOut(user, e.event_id, last.typ, e.value_c)
      } else if (e.event_type == "click" || e.event_type == "view") {
        // never regress state: a touch arriving in a later micro-batch
        // with an OLDER (ts, event_id) is already superseded
        if (last == null || last.tsMs < e.ts.getTime ||
            (last.tsMs == e.ts.getTime && last.eventId < e.event_id))
          last = Touch(e.ts.getTime, e.event_id, e.event_type)
      }
    }
    if (last == null) state.remove()
    else {
      state.update(last)
      // clamp above the current watermark: a pathological touch already
      // older than watermark - lookback would otherwise make
      // setTimeoutTimestamp throw (timeout must exceed the watermark) and
      // fail the whole query on one late record. getCurrentWatermarkMs is
      // 0 in batch/test execution, where the clamp is a no-op.
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(wm + 1, last.tsMs + attrWindowMs))
    }
    out.result().iterator
  }

  /** Batch twin of [[attribute]] (same ms arithmetic) for the equivalence
    * assertion. */
  def attributeBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = col("event_type").isin("click", "view")
    events
      .withColumn("touch_type", last(when(touch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_ms", last(when(touch, unix_millis(col("ts"))), ignoreNulls = true).over(w))
      .filter(
        col("event_type") === "purchase" && col("touch_type").isNotNull &&
          unix_millis(col("ts")) - col("touch_ms") <= attrWindowMs)
      .select(col("user_id"), col("event_id"), col("touch_type"), col("value_c"))
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class Session(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, s_start: java.sql.Timestamp, s_end: java.sql.Timestamp, n: Long)

  private val gapMs = 30L * 60 * 1000

  /** Arbitrary stateful sessionization via flatMapGroupsWithState, mirroring
    * session_window(ts, 30 minutes): sessions span [start, last+gap), an
    * event merges into a session iff ts < last + gap (a gap of exactly 30:00
    * starts a new session). Sessions close when the watermark passes
    * last + gap; closed sessions are emitted (Append mode). */
  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(mergeGroup)
  }

  private def mergeGroup(
      user: Long,
      evs: Iterator[SessionEvent],
      state: GroupState[List[Session]]): Iterator[SessionOut] = {
    val incoming = evs.map(e => Session(e.ts.getTime, e.ts.getTime, 1L)).toList
    val all = (state.getOption.getOrElse(Nil) ++ incoming).sortBy(s => (s.start, s.last))
    // Fold-merge sorted singletons/sessions: next merges iff it starts
    // before the current session's close (strict <).
    val merged = all.foldLeft(List.empty[Session]) {
      case (acc @ (cur :: rest), s) if s.start < cur.last + gapMs =>
        Session(cur.start, math.max(cur.last, s.last), cur.n + s.n) :: rest
      case (acc, s) => s :: acc
    }.reverse
    val wm = state.getCurrentWatermarkMs()
    val (closed, open) = merged.partition(_.last + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      state.setTimeoutTimestamp(open.map(_.last + gapMs).min)
    }
    closed
      .map(s =>
        SessionOut(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last + gapMs), s.n))
      .iterator
  }

  /** Batch twin of sessionize for the equivalence assertion. */
  def sessionizeBatch(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"), col("n"))

  /** Spark 4 `transformWithState` twin of `sessionize` — the successor API
    * to flatMapGroupsWithState: explicit named state (`ValueState`) plus
    * event-time timers instead of a single timeout slot. Requires the
    * RocksDB state store provider. Semantics are identical to
    * `sessionize`/`session_window`: sessions span [start, last+gap), close
    * once the watermark passes last+gap (closed sessions emitted on input
    * OR on timer expiry, so a key with no further input still flushes). */
  def sessionizeTws(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  private class SessionProcessor extends StatefulProcessor[Long, SessionEvent, SessionOut] {
    @transient private var state: ValueState[List[Session]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[List[Session]]("sessions", Encoders.kryo[List[Session]], TTLConfig.NONE)

    private def mergeAll(existing: List[Session], incoming: List[Session]): List[Session] = {
      val all = (existing ++ incoming).sortBy(s => (s.start, s.last))
      all.foldLeft(List.empty[Session]) {
        case (cur :: rest, s) if s.start < cur.last + gapMs =>
          Session(cur.start, math.max(cur.last, s.last), cur.n + s.n) :: rest
        case (acc, s) => s :: acc
      }.reverse
    }

    private def flush(user: Long, wm: Long, expiring: Long = Long.MinValue): Iterator[SessionOut] = {
      val merged = if (state.exists()) state.get() else Nil
      val (closed, open) = merged.partition(_.last + gapMs <= wm)
      if (open.isEmpty) state.clear()
      else {
        state.update(open)
        // one live timer per key: replace whatever is registered with the
        // earliest open-session close time (the currently-expiring timer is
        // removed by the framework — don't delete it again)
        val want = open.map(_.last + gapMs).min
        val existing = getHandle.listTimers().toSet - expiring
        existing.filterNot(_ == want).foreach(getHandle.deleteTimer)
        if (!existing.contains(want) && want != expiring) getHandle.registerTimer(want)
      }
      closed
        .map(s => SessionOut(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last + gapMs), s.n))
        .iterator
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val incoming = rows.map(e => Session(e.ts.getTime, e.ts.getTime, 1L)).toList
      state.update(mergeAll(if (state.exists()) state.get() else Nil, incoming))
      flush(user, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      flush(user, timerValues.getCurrentWatermarkInMs(), expiredTimerInfo.getExpiryTimeInMs())
  }

  /** Stream-stream interval join: each purchase matched to same-user views
    * in the preceding 30 minutes. Both sides carry watermarks and the join
    * condition bounds event-time distance, so state on each side is evicted
    * once the other side's watermark passes — the canonical bounded-state
    * stream-stream join. Works identically on batch frames for the
    * equivalence test. */
  def viewsBeforePurchase(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    p.join(
      v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"), col("p_ts"), col("v_ts"))
  }

  /** LEFT OUTER stream-stream interval join — the watermark-driven
    * null-emission mode: every purchase emits, and a purchase with NO
    * same-user view in its preceding 30 minutes emits exactly once with a
    * null view_id — but only after BOTH watermarks pass the end of its
    * match interval, because until then a matching view could still
    * arrive. That deferred null is the semantic difference from a batch
    * left join (where absence is known immediately); on the same closed
    * input the results are equal, which is what StreamingSpec asserts.
    * State stays bounded exactly as in the inner variant. */
  def viewsBeforePurchaseLeft(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    p.join(
      v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"),
      "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"), col("p_ts"), col("v_ts"))
  }

  /** RIGHT OUTER stream-stream interval join — the deferred-absence rule
    * applied to the VIEW side: every view emits, and a view followed by NO
    * same-user purchase within 30 minutes emits exactly once with null
    * purchase columns, only after both watermarks pass the end of its
    * match interval `[v_ts, v_ts + 30min]` (until then a matching
    * purchase could still arrive, so absence is not yet knowable). The
    * user_id is coalesced from whichever side is present so the output
    * schema is total. On the same closed input this equals the batch
    * right join — StreamingSpec asserts it. */
  def viewsBeforePurchaseRight(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    p.join(
      v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"),
      "rightOuter")
      .select(
        coalesce(col("p_user"), col("v_user")).as("user_id"),
        col("purchase_id"),
        col("view_id"),
        col("p_ts"),
        col("v_ts"))
  }

  /** FULL OUTER stream-stream interval join: matched pairs emit on match;
    * an unmatched PURCHASE emits once with null view columns and an
    * unmatched VIEW once with null purchase columns — each deferred until
    * the watermarks prove no partner can still arrive (the left and right
    * deferred-absence rules simultaneously). State is bounded exactly as
    * in the inner variant: each side's rows are evicted once the other
    * side's watermark passes their match interval. */
  def viewsBeforePurchaseFull(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    p.join(
      v,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"),
      "fullOuter")
      .select(
        coalesce(col("p_user"), col("v_user")).as("user_id"),
        col("purchase_id"),
        col("view_id"),
        col("p_ts"),
        col("v_ts"))
  }
}
