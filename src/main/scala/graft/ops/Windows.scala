package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E — window functions.
  *
  * Determinism: every window ORDER BY ends in a unique key so rank/lag frames
  * are total. Running and range-frame sums go through integer cents
  * (floor(x*100+0.5), IEEE-stable per row) because DuckDB evaluates windowed
  * sum() with a segment tree whose summation order differs from Spark's
  * sequential frame accumulation — integer arithmetic is order-free.
  */
object Windows {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking family over customers per market segment.
    "q_win_rank" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Fixtures
        .table(s, dir, "customer")
        .select(
          col("c_custkey"),
          col("c_mktsegment"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_custkey")
    },
    // Inter-event gap per user in integer microseconds (lag).
    "q_win_lag" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Fixtures
        .events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
        .select(
          col("event_id"),
          col("user_id"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("delta_us"))
        .orderBy("event_id")
    },
    // Running spend per customer in integer cents (exact, order-free).
    "q_win_running" -> { (s, dir) =>
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Fixtures
        .table(s, dir, "orders")
        .withColumn("cents", floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          sum(col("cents")).over(w).as("run_spend_c"))
        .orderBy("o_orderkey")
    },
    // Trailing-7-day average order value per customer (time-range frame over
    // epoch seconds — integer ranges agree across engines).
    "q_win_range" -> { (s, dir) =>
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("epoch_s"))
        .rangeBetween(-7L * 86400, 0)
      Fixtures
        .table(s, dir, "orders")
        .withColumn("epoch_s", expr("unix_micros(cast(o_orderdate AS timestamp)) div 1000000"))
        .withColumn("cents", floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          // Raw double: avg of exact ints is one correctly-rounded division —
          // bit-identical across engines, no round() needed (or wanted:
          // round() implementations differ at representation boundaries).
          avg(col("cents")).over(w).as("avg_7d_c"))
        .orderBy("o_orderkey")
    },
    // Top-3 per group via rank filter — Catalyst's InferWindowGroupLimit
    // prunes to a per-partition top-k instead of a full sort.
    "q_win_topk" -> { (s, dir) =>
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Fixtures
        .table(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rn")
    },
    // Value functions: first/last/nth over an explicit full-partition frame
    // (last_value under the default frame is the CURRENT row — the classic
    // trap; the unbounded frame makes it the true partition max), plus lead.
    "q_win_value" -> { (s, dir) =>
      val full = Window
        .partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val fwd = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Fixtures
        .table(s, dir, "customer")
        .select(
          col("c_custkey"),
          col("c_mktsegment"),
          first(col("c_custkey")).over(full).as("poorest_id"),
          last(col("c_custkey")).over(full).as("richest_id"),
          nth_value(col("c_custkey"), 2).over(full).as("second_id"),
          lead(col("c_custkey"), 1).over(fwd).as("next_id"))
        .orderBy("c_custkey")
    },
    // Distribution functions: percent_rank = (rank-1)/(n-1) and cume_dist =
    // rank_with_ties/n are exact rationals of integers, so one double
    // division is bit-identical across engines; e6-scaled for the hash.
    "q_win_dist" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Fixtures
        .table(s, dir, "customer")
        .select(
          col("c_custkey"),
          col("c_mktsegment"),
          floor(percent_rank().over(w) * 1e6 + lit(0.5)).cast("long").as("pr_e6"),
          floor(cume_dist().over(w) * 1e6 + lit(0.5)).cast("long").as("cd_e6"))
        .orderBy("c_custkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank" ->
      "SELECT c_custkey, c_mktsegment, CAST(row_number() OVER w AS INT) AS rn, CAST(rank() OVER w AS INT) AS rk, CAST(dense_rank() OVER w AS INT) AS drk, CAST(ntile(4) OVER w AS INT) AS quartile FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) ORDER BY c_custkey",
    "q_win_lag" ->
      "WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events) SELECT event_id, user_id, ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS delta_us FROM e ORDER BY event_id",
    "q_win_running" ->
      "WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate, CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders) SELECT o_orderkey, o_custkey, CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_spend_c FROM o ORDER BY o_orderkey",
    "q_win_range" ->
      "WITH o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate)//1000000 AS epoch_s, CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents FROM orders) SELECT o_orderkey, o_custkey, avg(cents) OVER (PARTITION BY o_custkey ORDER BY epoch_s RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS avg_7d_c FROM o ORDER BY o_orderkey",
    "q_win_topk" ->
      "WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) SELECT c_nationkey, CAST(rn AS INT) AS rn, c_custkey, c_acctbal FROM r WHERE rn <= 3 ORDER BY c_nationkey, rn",
    "q_win_dist" ->
      "SELECT c_custkey, c_mktsegment, CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_e6, CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_e6 FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey",
    "q_win_value" ->
      ("SELECT c_custkey, c_mktsegment, first_value(c_custkey) OVER wfull AS poorest_id, last_value(c_custkey) OVER wfull AS richest_id, " +
        "nth_value(c_custkey, 2) OVER wfull AS second_id, lead(c_custkey, 1) OVER fwd AS next_id FROM customer " +
        "WINDOW wfull AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), " +
        "fwd AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey")
  )
}
