package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF (SURVEY.md §2.D q_agg_udaf): discount-weighted average
  * of extended price. Buffer is (Σ w·x, Σ w) — associative and commutative,
  * so partial aggregation (map-side combine) applies and the merge tree is
  * shuffle-shape-independent up to fp rounding (output rounded at boundary).
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  def zero: (Double, Double) = (0.0, 0.0)
  def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Double, Double)): Double = if (b._2 == 0.0) 0.0 else b._1 / b._2
  def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SURVEY.md §2.D — aggregation operators.
  *
  * Re-expresses the reference's load-summary/reporting counts as Catalyst
  * partial+final HashAggregate plans; rollup/cube/grouping-sets and the
  * typed UDAF extend the surface per the north-star mandate.
  *
  * Determinism: every double that crossed an aggregate is round(_,4); output
  * is totally ordered; grouping flags are cast to int on both engines
  * (Spark emits tinyint, DuckDB bigint).
  */
object Aggregates {
  private implicit val inEnc: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  private val wavg = udaf(WeightedAvg)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: TPC-H Q1 pricing summary.
    "q_agg_q1" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))),
            4).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // Ungrouped aggregates over the full table.
    "q_agg_global" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(min("l_extendedprice"), 4).as("min_price"),
          round(max("l_extendedprice"), 4).as("max_price"))
    },
    // DISTINCT aggregates (Expand + two-phase agg under the hood).
    "q_agg_distinct" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          round(sum_distinct(col("l_quantity")), 4).as("sum_dq"))
        .orderBy("l_returnflag")
    },
    // Rollup hierarchy region → nation with subtotal rows + grouping flags.
    // Expressed via the SQL entry point: rollup over a join result trips the
    // DataFrame API's ambiguous-self-join detector (the Expand node clones
    // the grouping attrs), while the SQL path resolves cleanly.
    "q_agg_rollup" -> { (s, dir) =>
      Fixtures.table(s, dir, "customer").createOrReplaceTempView("customer")
      Fixtures.table(s, dir, "nation").createOrReplaceTempView("nation")
      Fixtures.table(s, dir, "region").createOrReplaceTempView("region")
      s.sql(
        """SELECT r_name, n_name,
          |       CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n,
          |       count(*) AS n_cust, round(sum(c_acctbal),4) AS sum_bal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |              JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
    },
    // Cube over two independent dimensions.
    "q_agg_cube" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"),
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 4).as("sum_price"))
        .orderBy(
          col("g_s"),
          col("g_p"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    // Explicit grouping sets through the SQL entry point (E2).
    "q_agg_grouping_sets" -> { (s, dir) =>
      Fixtures.table(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(grouping(o_orderstatus) AS INT)*2 + CAST(grouping(o_orderpriority) AS INT) AS gid,
          |       count(*) AS n_orders
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },
    // Statistical aggregates.
    "q_agg_stats" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"))
        .orderBy("l_returnflag")
    },
    // Per-group list/set assembly, sorted for hash stability.
    "q_agg_collect" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(
          sort_array(collect_list(col("c_name"))).as("names"),
          array_sort(collect_set(col("c_mktsegment"))).as("segments"))
        .orderBy("c_nationkey")
    },
    // Pivot event_type → one summed-value column per type. Explicit value
    // list keeps the output schema static (no collect-distinct job).
    "q_agg_pivot" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 4))
        .orderBy("user_id")
    },
    // Custom typed UDAF: discount-weighted average price per return flag.
    "q_agg_udaf" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_extendedprice"), col("l_discount")), 4).as("wavg_price"))
        .orderBy("l_returnflag")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_agg_q1" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) AS sum_qty, round(sum(l_extendedprice),4) AS sum_base_price, round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price, round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge, round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price, round(avg(l_discount),4) AS avg_disc, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q_agg_global" ->
      "SELECT count(*) AS n, round(sum(l_quantity),4) AS sum_qty, round(avg(l_extendedprice),4) AS avg_price, round(min(l_extendedprice),4) AS min_price, round(max(l_extendedprice),4) AS max_price FROM lineitem",
    "q_agg_distinct" ->
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, round(sum(DISTINCT l_quantity),4) AS sum_dq FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_agg_rollup" ->
      "SELECT r_name, n_name, CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n, count(*) AS n_cust, round(sum(c_acctbal),4) AS sum_bal FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST",
    "q_agg_cube" ->
      "SELECT o_orderstatus, o_orderpriority, CAST(grouping(o_orderstatus) AS INT) AS g_s, CAST(grouping(o_orderpriority) AS INT) AS g_p, count(*) AS n_orders, round(sum(o_totalprice),4) AS sum_price FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q_agg_grouping_sets" ->
      "SELECT o_orderstatus, o_orderpriority, CAST(grouping(o_orderstatus) AS INT)*2 + CAST(grouping(o_orderpriority) AS INT) AS gid, count(*) AS n_orders FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q_agg_stats" ->
      "SELECT l_returnflag, round(stddev_samp(l_quantity),4) AS sd_qty, round(var_samp(l_quantity),4) AS var_qty, round(corr(l_quantity, l_extendedprice),4) AS corr_qp, round(covar_samp(l_quantity, l_extendedprice),4) AS cov_qp FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_agg_collect" ->
      "SELECT c_nationkey, list_sort(list(c_name)) AS names, list_sort(list(DISTINCT c_mktsegment)) AS segments FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "q_agg_pivot" ->
      "SELECT user_id, round(sum(value) FILTER (WHERE event_type='click'),4) AS click, round(sum(value) FILTER (WHERE event_type='error'),4) AS error, round(sum(value) FILTER (WHERE event_type='purchase'),4) AS purchase, round(sum(value) FILTER (WHERE event_type='signup'),4) AS signup, round(sum(value) FILTER (WHERE event_type='view'),4) AS view FROM events GROUP BY user_id ORDER BY user_id",
    "q_agg_udaf" ->
      "SELECT l_returnflag, round(sum(l_extendedprice*l_discount)/sum(l_discount),4) AS wavg_price FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
  )
}
