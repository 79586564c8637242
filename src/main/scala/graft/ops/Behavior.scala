package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / event-sequence analytics over the `events` stream table:
  * interval consolidation, marketing attribution, Markov transition
  * matrices, and top event paths. All four share one physical shape — a
  * single hash-partition on `user_id` feeding ordered window functions —
  * so at 100 TB each is ONE shuffle of the event log, no self-joins, no
  * per-key collect: the window operators stream each user's timeline in
  * sort order with O(1) or O(frame) state. Ties inside a user timeline are
  * broken by `event_id` everywhere (same convention as q_sessionize) so
  * frame contents are engine-exact.
  */
object Behavior {
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** epoch seconds as a long, floored — mirrors the oracle's
    * CAST(floor(epoch(ts)) AS BIGINT) exactly (q_sessionize convention). */
  private def epochS(c: Column): Column = c.cast("timestamp").cast("long")

  /** Pad (seconds) an event extends an activity interval by, and the
    * conversion lookback for attribution. Both appear verbatim in the
    * oracle SQL below. */
  private val IntervalPadS = 172800L // 2 days
  private val AttributionWindowS = 604800L // 7 days

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interval consolidation (gaps-and-islands): each event opens a
    // [ts, ts+pad) activity interval; overlapping intervals per user merge
    // into one row. The classic running-max idiom: an interval starts a new
    // island iff its start exceeds the max end of ALL preceding intervals
    // (not just the previous row's — earlier intervals can out-reach the
    // immediate predecessor), then a cumulative sum of island flags keys the
    // rollup. Both windows and the final groupBy reuse the same
    // hash(user_id) exchange — ONE shuffle end to end, and per-task state
    // is a single running max / running sum, so an adversarial
    // 10^8-event user costs time, not heap.
    "q_interval_merge" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("s", "event_id")
      Fixtures
        .events(s, dir)
        .select(
          col("user_id"),
          col("event_id"),
          epochS(col("ts")).as("s"),
          (epochS(col("ts")) + IntervalPadS).as("f"))
        .withColumn("pmax", max("f").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_iv", (col("pmax").isNull || col("s") > col("pmax")).cast("int"))
        .withColumn("iv", sum("new_iv").over(w))
        .groupBy(col("user_id"), col("iv").as("iv_seq"))
        .agg(
          min("s").as("iv_start_s"),
          max("f").as("iv_end_s"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "iv_seq")
    },
    // Last-touch attribution: credit each purchase to the most recent
    // click/view STRICTLY before it (frame ends at -1 — a purchase cannot
    // attribute to itself even if a touch shares its timestamp) and within
    // a 7-day lookback. `last(_, ignoreNulls)` carries the touch forward as
    // O(1) window state — the standard scale-safe alternative to a
    // range-join of purchases against touches, which would re-scan each
    // user's touch history per purchase. Both carried columns (ts + type)
    // ride the SAME frame so they always describe the same touch row.
    "q_attribution" -> { (s, dir) =>
      val w = Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = col("event_type").isin("click", "view")
      Fixtures
        .events(s, dir)
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          col("ts"),
          cents(col("value")).as("value_c"))
        .withColumn("touch_type", last(when(touch, col("event_type")), ignoreNulls = true).over(w))
        .withColumn("touch_ts", last(when(touch, col("ts")), ignoreNulls = true).over(w))
        .filter(
          col("event_type") === "purchase" && col("touch_type").isNotNull &&
            epochS(col("ts")) - epochS(col("touch_ts")) <= AttributionWindowS)
        .groupBy("touch_type")
        .agg(count(lit(1)).as("n_conversions"), sum("value_c").as("attributed_c"))
        .orderBy("touch_type")
    },
    // First-order Markov transition matrix over event types: P(next | prev)
    // from consecutive pairs in each user's timeline. lead() needs no frame
    // state beyond one row; the 25-cell transition matrix is model-sized,
    // so the probability normalization window runs on the AGGREGATED frame
    // (25 rows), never the event log. Probabilities are e6 fixed-point over
    // exact long counts — engine-identical.
    "q_markov_transitions" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn(
          "p_e6",
          floor(col("n").cast("double") / sum("n").over(Window.partitionBy("prev_type")) * 1e6 + lit(0.5))
            .cast("long"))
        .orderBy("prev_type", "next_type")
    },
    // Top 3-event paths: the two leads materialize each sliding triple
    // without a self-join (an event log self-joined twice on user_id would
    // shuffle the fact three times; the window form shuffles it once).
    // Top-20 with the path string as tiebreak — deterministic because the
    // groupBy key is unique per row.
    "q_path_3grams" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("t1", lead("event_type", 1).over(w))
        .withColumn("t2", lead("event_type", 2).over(w))
        .filter(col("t2").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("path"))
        .limit(20)
    }
  )

  private val evCte =
    "WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c FROM events)"

  val oracle: Map[String, String] = Map(
    "q_interval_merge" ->
      (evCte +
        s", b AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, CAST(floor(epoch(ts)) AS BIGINT) + $IntervalPadS AS f FROM e)" +
        ", m AS (SELECT user_id, event_id, s, f, max(f) OVER (PARTITION BY user_id ORDER BY s, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM b)" +
        ", fl AS (SELECT user_id, event_id, s, f, CAST(pmax IS NULL OR s > pmax AS INT) AS new_iv FROM m)" +
        ", g AS (SELECT user_id, s, f, sum(new_iv) OVER (PARTITION BY user_id ORDER BY s, event_id) AS iv FROM fl) " +
        "SELECT user_id, CAST(iv AS BIGINT) AS iv_seq, min(s) AS iv_start_s, max(f) AS iv_end_s, " +
        "CAST(count(*) AS BIGINT) AS n_events FROM g GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_attribution" ->
      (evCte +
        ", w AS (SELECT user_id, event_id, event_type, ts, value_c, " +
        "last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type, " +
        "last_value(CASE WHEN event_type IN ('click','view') THEN ts END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts FROM e) " +
        "SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conversions, CAST(sum(value_c) AS BIGINT) AS attributed_c " +
        "FROM w WHERE event_type = 'purchase' AND touch_type IS NOT NULL " +
        s"AND CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(touch_ts)) AS BIGINT) <= $AttributionWindowS " +
        "GROUP BY 1 ORDER BY 1"),
    "q_markov_transitions" ->
      (evCte +
        ", l AS (SELECT user_id, event_type, lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM e)" +
        ", c AS (SELECT event_type AS prev_type, next_type, CAST(count(*) AS BIGINT) AS n FROM l WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, next_type, n, " +
        "CAST(floor(n * 1.0 / sum(n) OVER (PARTITION BY prev_type) * 1000000 + 0.5) AS BIGINT) AS p_e6 " +
        "FROM c ORDER BY 1, 2"),
    "q_path_3grams" ->
      (evCte +
        ", l AS (SELECT event_type AS t0, lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1, " +
        "lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2 FROM e) " +
        "SELECT t0 || '>' || t1 || '>' || t2 AS path, CAST(count(*) AS BIGINT) AS n FROM l " +
        "WHERE t2 IS NOT NULL GROUP BY 1 ORDER BY n DESC, path LIMIT 20")
  )
}
