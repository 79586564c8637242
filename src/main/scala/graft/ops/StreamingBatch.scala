package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.I — the oracle-checkable batch formulations of the streaming
  * windows. The same logical plans run under Structured Streaming in
  * graft.streaming (cap_stream_* rows, proven by MemoryStream equivalence
  * tests) — batch/stream parity is Structured Streaming's core design point.
  *
  * Window alignment: Spark's window() origin is the epoch; DuckDB's
  * time_bucket origin (2000-01-01) is a whole multiple of 15min/1h away, so
  * bucket edges coincide. Session semantics: Spark merges while
  * ts < last + gap, i.e. a gap of exactly 30:00 starts a NEW session — the
  * gaps-and-islands oracle uses `>=` on the gap to match.
  */
object StreamingBatch {
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  private val evCte =
    "WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour event-time window per event_type.
    "q_stream_tumbling" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value_c"))
        .orderBy("w_start", "event_type")
    },
    // Sliding 1-hour window every 15 minutes (each event lands in 4 windows).
    "q_stream_sliding" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value_c"))
        .orderBy("w_start", "event_type")
    },
    // Session windows, 30-minute gap, per user.
    "q_stream_session" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"), col("n"))
        .orderBy("user_id", "s_start")
    },
    // Time-series gap-fill / resample: daily spend per active customer over
    // March 1995, missing days zero-filled. The scalable grid shape: the
    // (key × day) grid comes from a per-key explode of the literal day
    // sequence (map-side, no cross-join shuffle), then one equi-join on
    // (key, day) against the daily partial aggregate.
    "q_gap_fill" -> { (s, dir) =>
      val lo = lit("1995-03-01").cast("timestamp_ntz")
      val hi = lit("1995-04-01").cast("timestamp_ntz")
      val month = Fixtures
        .table(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      val daily = month
        .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("spend_c"))
      val grid = month
        .select(col("o_custkey"))
        .distinct()
        .select(
          col("o_custkey"),
          explode(sequence(lit("1995-03-01").cast("date"), lit("1995-03-31").cast("date"))).as("day"))
      grid
        .join(daily, Seq("o_custkey", "day"), "left")
        .select(col("o_custkey"), col("day"), coalesce(col("spend_c"), lit(0L)).as("spend_c"))
        .orderBy("o_custkey", "day")
    },
    // Batch form of the stream-stream interval join (cap_stream_join proves
    // the MemoryStream run emits the identical set) — purchases matched to
    // same-user views in the trailing 30 minutes.
    "q_stream_join" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      graft.streaming.StreamOps
        .viewsBeforePurchase(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"))
        .select(col("user_id"), col("purchase_id"), col("view_id"))
        .orderBy("purchase_id", "view_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      (evCte + " SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS w_start, event_type, count(*) AS n, CAST(sum(value_c) AS BIGINT) AS sum_value_c FROM e GROUP BY w_start, event_type ORDER BY w_start, event_type"),
    "q_stream_sliding" ->
      (evCte + " SELECT w_start, event_type, count(*) AS n, CAST(sum(value_c) AS BIGINT) AS sum_value_c FROM (SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS TIMESTAMP) AS w_start, event_type, value_c FROM e CROSS JOIN unnest([0,1,2,3]) AS t(k)) GROUP BY w_start, event_type ORDER BY w_start, event_type"),
    "q_stream_session" ->
      (evCte + ", g AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM e), i AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g) SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end, count(*) AS n FROM i GROUP BY user_id, sid ORDER BY user_id, s_start"),
    "q_stream_join" ->
      "WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events), v AS (SELECT event_id AS view_id, user_id, ts FROM e WHERE event_type = 'view'), p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase') SELECT p.user_id, p.purchase_id, v.view_id FROM p JOIN v ON p.user_id = v.user_id AND v.ts >= p.p_ts - INTERVAL 30 MINUTE AND v.ts <= p.p_ts ORDER BY purchase_id, view_id",
    "q_gap_fill" ->
      ("WITH m AS (SELECT o_custkey, o_orderdate, o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '1995-03-01' AND o_orderdate < TIMESTAMP '1995-04-01'), " +
        "daily AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_c FROM m GROUP BY 1, 2), " +
        "grid AS (SELECT o_custkey, CAST(unnest(generate_series(DATE '1995-03-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day FROM (SELECT DISTINCT o_custkey FROM m)) " +
        "SELECT g.o_custkey, g.day, COALESCE(d.spend_c, 0) AS spend_c FROM grid g LEFT JOIN daily d ON g.o_custkey = d.o_custkey AND g.day = d.day ORDER BY g.o_custkey, g.day")
  )
}
