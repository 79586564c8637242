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
    // Pipeline freshness/health report: per event source, total volume,
    // staleness behind the globally freshest event, and trailing 24h/7d
    // volumes — the dashboard a loader's on-call reads first. "now" is the
    // global max event time (deterministic, oracle-checkable — a wall
    // clock would not be), broadcast as one row; everything else is ONE
    // conditional aggregation pass in integer epoch seconds.
    "q_freshness" -> { (s, dir) =>
      val ev = Fixtures
        .events(s, dir)
        .select(col("event_type"), epochS(col("ts")).as("es"))
      val now = ev.agg(max("es").as("now_es"))
      ev.crossJoin(broadcast(now))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          (max("now_es") - max("es")).as("lag_s"),
          sum(when(col("es") >= col("now_es") - 86400L, 1L).otherwise(0L)).as("n_24h"),
          sum(when(col("es") >= col("now_es") - 604800L, 1L).otherwise(0L)).as("n_7d"))
        .orderBy("event_type")
    },
    // Jensen-Shannon divergence between the event-type distributions of
    // the two halves of the time range — the bounded, symmetric companion
    // to q_drift_psi's PSI (JS never blows up on a vanishing bin because
    // the reference is the mixture M = (P+Q)/2). The split point is pure
    // integer epoch arithmetic, both periods aggregate in ONE conditional
    // pass, and each category's JS term is a single fixed double
    // expression over exact long counts, e9-scaled per row — no cross-row
    // float summation order exists. Expression text shared verbatim with
    // the oracle.
    "q_drift_js" -> { (s, dir) =>
      val jsSql =
        "CAST(floor((0.5 * (CAST(n_a AS DOUBLE)/ta) * ln((CAST(n_a AS DOUBLE)/ta) / (0.5*(CAST(n_a AS DOUBLE)/ta) + 0.5*(CAST(n_b AS DOUBLE)/tb))) " +
          "+ 0.5 * (CAST(n_b AS DOUBLE)/tb) * ln((CAST(n_b AS DOUBLE)/tb) / (0.5*(CAST(n_a AS DOUBLE)/ta) + 0.5*(CAST(n_b AS DOUBLE)/tb)))) * 1000000000 + 0.5) AS BIGINT)"
      val ev = Fixtures
        .events(s, dir)
        .select(col("event_type"), epochS(col("ts")).as("es"))
      val mid = ev.agg(expr("(min(es) + max(es)) div 2").as("m"))
      ev.crossJoin(broadcast(mid))
        .groupBy("event_type")
        .agg(
          sum(when(col("es") < col("m"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("es") >= col("m"), 1L).otherwise(0L)).as("n_b"))
        .withColumn("ta", sum("n_a").over(Window.partitionBy()))
        .withColumn("tb", sum("n_b").over(Window.partitionBy()))
        .filter(col("n_a") > 0 && col("n_b") > 0)
        .select(col("event_type"), col("n_a"), col("n_b"), expr(jsSql).as("js_e9"))
        .orderBy("event_type")
    },
    // CUSUM changepoint scores: the textbook recursion s_i = max(0,
    // s_{i-1} + d_i) looks inherently sequential, but it equals
    // P_i - min_{j<=i} P_j over the deviation prefix sums — so it becomes
    // TWO ordered window functions over one shuffle, parallel at any
    // scale. Deviations are kept integral by scaling by the key's count
    // (d' = n*x - sum, all longs), so prefix sums are order-exact; the
    // per-user peak row (largest upward drift and when it happened) comes
    // from a rank over the same partitioning. Four window specs, ONE
    // hash(user_id) exchange.
    "q_ts_cusum" -> { (s, dir) =>
      val wAll = Window.partitionBy("user_id")
      val wOrd = Window
        .partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), cents(col("value")).as("value_c"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum("value_c").over(wAll))
        .withColumn("pp", sum(col("n") * col("value_c") - col("tot")).over(wOrd))
        // the prefix-min must include the EMPTY prefix (P_0 = 0) — the
        // recursion starts at s_0 = 0, so an all-positive early run drifts
        // from zero, not from its own first prefix sum
        .withColumn("cusum", col("pp") - least(min("pp").over(wOrd), lit(0L)))
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy("user_id").orderBy(desc("cusum"), asc("ts"), asc("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("peak_event_id"), col("cusum").as("max_cusum_xn_c"))
        .orderBy("user_id")
    },
    // Robust per-key outlier counts via MAD (median absolute deviation) —
    // the robust-statistics alternative to q_anomaly_zscore: medians are
    // insensitive to the very outliers being counted. Exact interpolated
    // percentile on integer cents matches DuckDB's median bit-for-bit;
    // two grouped aggregations + joins all share the user_id hash
    // partitioning. State note: exact percentile's per-key buffer grows
    // with the number of DISTINCT values — bounded here by the cents
    // domain of a bounded price, not the row count; for an unbounded
    // value domain swap in approx_percentile (fixed sketch state) and
    // lose the oracle hash-match, keeping a tolerance spec instead.
    "q_anomaly_mad" -> { (s, dir) =>
      val ev = Fixtures
        .events(s, dir)
        .select(col("user_id"), cents(col("value")).as("value_c"))
      val med = ev.groupBy("user_id").agg(expr("percentile(value_c, 0.5)").as("med"))
      val dev = ev
        .join(med, Seq("user_id"))
        .withColumn("dev", abs(col("value_c") - col("med")))
      val mad = dev
        .groupBy("user_id")
        .agg(first("med").as("med"), expr("percentile(dev, 0.5)").as("mad"))
      dev
        .drop("med")
        .join(mad, Seq("user_id"))
        .groupBy("user_id")
        .agg(
          floor(first("med") * 10 + lit(0.5)).cast("long").as("med_d1"),
          floor(first("mad") * 10 + lit(0.5)).cast("long").as("mad_d1"),
          sum(when(col("dev") > lit(3) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("user_id")
    },
    // Rapid-fire duplicate detection: events of the same (user, type)
    // arriving within 5 seconds of their predecessor — the double-click /
    // retry artifact an event pipeline quarantines before metrics. The
    // lag-diff window replaces the self-join a naive "events within Δt of
    // another event" formulation would shuffle twice; millisecond
    // arithmetic on unix_millis longs, one (user, type) shuffle, rolled
    // up to a per-type summary.
    "q_event_dupes" -> { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
        .withColumn("prev_ms", lag(col("ms"), 1).over(w))
        .select(
          col("event_type"),
          when(col("prev_ms").isNotNull && col("ms") - col("prev_ms") <= 5000, 1L)
            .otherwise(0L)
            .as("is_dup"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("is_dup").as("n_dups"))
        .orderBy("event_type")
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
    "q_freshness" ->
      ("WITH e AS (SELECT event_type, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es FROM events), " +
        "m AS (SELECT max(es) AS now_es FROM e) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "(SELECT now_es FROM m) - max(es) AS lag_s, " +
        "CAST(sum(CASE WHEN es >= (SELECT now_es FROM m) - 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_24h, " +
        "CAST(sum(CASE WHEN es >= (SELECT now_es FROM m) - 604800 THEN 1 ELSE 0 END) AS BIGINT) AS n_7d " +
        "FROM e GROUP BY 1 ORDER BY 1"),
    "q_drift_js" ->
      ("WITH e AS (SELECT event_type, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es FROM events), " +
        "mid AS (SELECT (min(es) + max(es)) // 2 AS m FROM e), " +
        "g AS (SELECT event_type, CAST(sum(CASE WHEN es < (SELECT m FROM mid) THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(sum(CASE WHEN es >= (SELECT m FROM mid) THEN 1 ELSE 0 END) AS BIGINT) AS n_b FROM e GROUP BY 1), " +
        "t AS (SELECT event_type, n_a, n_b, sum(n_a) OVER () AS ta, sum(n_b) OVER () AS tb FROM g) " +
        "SELECT event_type, n_a, n_b, " +
        "CAST(floor((0.5 * (CAST(n_a AS DOUBLE)/ta) * ln((CAST(n_a AS DOUBLE)/ta) / (0.5*(CAST(n_a AS DOUBLE)/ta) + 0.5*(CAST(n_b AS DOUBLE)/tb))) " +
        "+ 0.5 * (CAST(n_b AS DOUBLE)/tb) * ln((CAST(n_b AS DOUBLE)/tb) / (0.5*(CAST(n_a AS DOUBLE)/ta) + 0.5*(CAST(n_b AS DOUBLE)/tb)))) * 1000000000 + 0.5) AS BIGINT) AS js_e9 " +
        "FROM t WHERE n_a > 0 AND n_b > 0 ORDER BY event_type"),
    "q_ts_cusum" ->
      (evCte +
        ", s AS (SELECT user_id, event_id, ts, value_c, " +
        "CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n, " +
        "CAST(sum(value_c) OVER (PARTITION BY user_id) AS BIGINT) AS tot FROM e)" +
        ", p AS (SELECT user_id, event_id, ts, " +
        "sum(n*value_c - tot) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp FROM s)" +
        ", c AS (SELECT user_id, event_id, ts, pp - least(min(pp) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum FROM p)" +
        ", r AS (SELECT user_id, event_id, cusum, row_number() OVER (PARTITION BY user_id ORDER BY cusum DESC, ts, event_id) AS rn FROM c) " +
        "SELECT user_id, event_id AS peak_event_id, CAST(cusum AS BIGINT) AS max_cusum_xn_c " +
        "FROM r WHERE rn = 1 ORDER BY user_id"),
    "q_anomaly_mad" ->
      (evCte +
        ", m AS (SELECT user_id, median(value_c) AS med FROM e GROUP BY 1)" +
        ", d AS (SELECT e.user_id, value_c, med, abs(value_c - med) AS dev FROM e JOIN m USING (user_id))" +
        ", m2 AS (SELECT user_id, any_value(med) AS med, median(dev) AS mad FROM d GROUP BY 1) " +
        "SELECT d.user_id, CAST(floor(m2.med*10 + 0.5) AS BIGINT) AS med_d1, " +
        "CAST(floor(m2.mad*10 + 0.5) AS BIGINT) AS mad_d1, " +
        "CAST(count(*) FILTER (WHERE d.dev > 3 * 1.4826 * m2.mad) AS BIGINT) AS n_outliers " +
        "FROM d JOIN m2 ON d.user_id = m2.user_id GROUP BY 1, 2, 3 ORDER BY 1"),
    "q_event_dupes" ->
      (evCte +
        ", l AS (SELECT event_type, CAST(floor(epoch_ms(ts)) AS BIGINT) AS ms, " +
        "lag(CAST(floor(epoch_ms(ts)) AS BIGINT)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ms FROM e) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(CASE WHEN prev_ms IS NOT NULL AND ms - prev_ms <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dups " +
        "FROM l GROUP BY 1 ORDER BY 1"),
    "q_path_3grams" ->
      (evCte +
        ", l AS (SELECT event_type AS t0, lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1, " +
        "lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2 FROM e) " +
        "SELECT t0 || '>' || t1 || '>' || t2 AS path, CAST(count(*) AS BIGINT) AS n FROM l " +
        "WHERE t2 IS NOT NULL GROUP BY 1 ORDER BY n DESC, path LIMIT 20")
  )
}
