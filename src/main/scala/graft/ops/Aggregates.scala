package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF (SURVEY.md §2.D q_agg_udaf): discount-weighted average
  * of extended price. The buffer holds exact integer sums (Σ price_c·disc_c,
  * Σ disc_c in cents) so the merge tree is associative AND exact — the result
  * is bit-identical under any partitioning, unlike a double accumulator.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {
  private def c(x: Double): Long = math.floor(x * 100 + 0.5).toLong
  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) =
    (b._1 + c(in._1) * c(in._2), b._2 + c(in._2))
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = (a._1 + b._1, a._2 + b._2)
  def finish(b: (Long, Long)): Double = if (b._2 == 0L) 0.0 else b._1.toDouble / b._2 / 100.0
  def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SURVEY.md §2.D — aggregation operators.
  *
  * Determinism strategy: every money column in the fixtures is an exact
  * 2-decimal double (verified), so sums go through integer cents
  * (floor(x*100+0.5), IEEE-identical per row) — exact integer addition is
  * order-free, which makes results stable across shuffle layouts / core
  * counts, where double summation is not. Averages are exact-int-sum / count
  * (a single correctly-rounded division → bit-identical across engines).
  * The statistical aggregates (q_agg_stats) are the one intrinsically
  * order-sensitive family; they round at 4dp over small group counts.
  */
object Aggregates {
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")
  private val wavg = udaf(WeightedAvg)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: TPC-H Q1 pricing summary over exact cents.
    "q_agg_q1" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_c"),
          cents(col("l_tax")).as("tax_c"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty_c").as("sum_qty_c"),
          sum("price_c").as("sum_base_price_c"),
          sum(col("price_c") * (lit(100) - col("disc_c"))).as("sum_disc_price_e4"),
          sum(col("price_c") * (lit(100) - col("disc_c")) * (lit(100) + col("tax_c")))
            .as("sum_charge_e6"),
          (sum("qty_c") / count(lit(1)) / lit(100.0)).as("avg_qty"),
          (sum("price_c") / count(lit(1)) / lit(100.0)).as("avg_price"),
          (sum("disc_c") / count(lit(1)) / lit(100.0)).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // Ungrouped aggregates over the full table.
    "q_agg_global" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          (sum(cents(col("l_extendedprice"))) / count(lit(1)) / lit(100.0)).as("avg_price"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"))
    },
    // DISTINCT aggregates (Expand + two-phase agg under the hood).
    "q_agg_distinct" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey"), cents(col("l_quantity")).as("qty_c"))
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          sum_distinct(col("qty_c")).as("sum_dq_c"))
        .orderBy("l_returnflag")
    },
    // Per-group mode with a deterministic tie-break: built-in mode() leaves
    // tie order unspecified on BOTH engines, so the modal value is computed
    // as argmax over (count, value) — count desc, value asc — via one
    // aggregation and a WindowGroupLimit-prunable rank filter. The portable
    // way to get a mode that hash-matches anywhere.
    "q_agg_mode" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey")
        .orderBy(col("cnt").desc, col("c_mktsegment"))
      Fixtures
        .table(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_mktsegment").as("modal_segment"), col("cnt").as("n"))
        .orderBy("c_nationkey")
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
          |       count(*) AS n_cust,
          |       CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_bal_c
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |              JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
    },
    // Cube over two independent dimensions.
    "q_agg_cube" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"), cents(col("o_totalprice")).as("price_c"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"),
          count(lit(1)).as("n_orders"),
          sum("price_c").as("sum_price_c"))
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
    // Statistical aggregates in closed form over exact integer sums (units:
    // cents): Spark's and DuckDB's builtin stddev/corr use order-sensitive
    // streaming-moment updates that differ in ulps, so instead both engines
    // compute n·Σx²−(Σx)² etc. from identical exact integers with the
    // identical double operation sequence — bit-exact output, no rounding.
    // (The builtin aggregates themselves are exercised in CapabilitiesSpec.)
    "q_agg_stats" -> { (s, dir) =>
      def d(name: String) = col(name).cast("double")
      Fixtures
        .table(s, dir, "lineitem")
        .select(
          col("l_returnflag"),
          cents(col("l_quantity")).as("x"),
          cents(col("l_extendedprice")).as("y"))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"),
          sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(
          col("l_returnflag"),
          sqrt((d("n") * d("sxx") - d("sx") * d("sx")) / (d("n") * (d("n") - 1))).as("sd_qty_c"),
          ((d("n") * d("sxx") - d("sx") * d("sx")) / (d("n") * (d("n") - 1))).as("var_qty_c2"),
          ((d("n") * d("sxy") - d("sx") * d("sy")) /
            (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * sqrt(d("n") * d("syy") - d("sy") * d("sy"))))
            .as("corr_qp"),
          ((d("n") * d("sxy") - d("sx") * d("sy")) / (d("n") * (d("n") - 1))).as("cov_qp_c2"))
        .orderBy("l_returnflag")
    },
    // Per-group list/set assembly, sorted for hash stability. The arrays are
    // serialized '|'-joined at the output boundary: the driver's comparator
    // sorts pandas columns and dies on raw array cells (unhashable ndarray),
    // so collection results must leave as scalars.
    "q_agg_collect" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(
          concat_ws("|", sort_array(collect_list(col("c_name")))).as("names"),
          concat_ws("|", array_sort(collect_set(col("c_mktsegment")))).as("segments"))
        .orderBy("c_nationkey")
    },
    // Pivot event_type → one summed-value column per type (exact cents).
    // Explicit value list keeps the output schema static.
    "q_agg_pivot" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_type"), cents(col("value")).as("value_c"))
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum("value_c"))
        .orderBy("user_id")
    },
    // Two-phase salted aggregation: the skew pattern for hot keys at scale.
    // Phase 1 pre-aggregates on (key, salt) — 16× more groups, so one hot
    // key's rows spread over 16 reducers — phase 2 merges the partials.
    // Exact integer sums make the result identical to the unsalted plan,
    // which is exactly what the oracle runs.
    "q_agg_salted" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(
          col("o_orderpriority"),
          pmod(col("o_orderkey"), lit(16)).as("salt"),
          cents(col("o_totalprice")).as("price_c"))
        .groupBy("o_orderpriority", "salt")
        .agg(count(lit(1)).as("pn"), sum("price_c").as("psum"))
        .groupBy("o_orderpriority")
        .agg(sum("pn").as("n_orders"), sum("psum").as("sum_price_c"))
        .orderBy("o_orderpriority")
    },
    // Custom typed UDAF: discount-weighted average price per return flag.
    "q_agg_udaf" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_discount")).as("wavg_price"))
        .orderBy("l_returnflag")
    },
    // Exact interpolated percentiles over integer cents: both engines use
    // the same lo + frac·(hi−lo) continuous-quantile definition, and integer
    // inputs make the single interpolation step bit-identical.
    "q_agg_percentile" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .select(col("l_returnflag"), cents(col("l_extendedprice")).as("price_c"))
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(price_c, 0.5)"), 4).as("p50_c"),
          round(expr("percentile(price_c, 0.9)"), 4).as("p90_c"))
        .orderBy("l_returnflag")
    }
  )

  private val centsSql = "CAST(floor(%s*100 + 0.5) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "q_agg_q1" ->
      "WITH l AS (SELECT l_returnflag, l_linestatus, CAST(floor(l_quantity*100+0.5) AS BIGINT) AS qty_c, CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS price_c, CAST(floor(l_discount*100+0.5) AS BIGINT) AS disc_c, CAST(floor(l_tax*100+0.5) AS BIGINT) AS tax_c FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02') SELECT l_returnflag, l_linestatus, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c, CAST(sum(price_c) AS BIGINT) AS sum_base_price_c, CAST(sum(price_c*(100-disc_c)) AS BIGINT) AS sum_disc_price_e4, CAST(sum(price_c*(100-disc_c)*(100+tax_c)) AS BIGINT) AS sum_charge_e6, sum(qty_c)/count(*)/100.0 AS avg_qty, sum(price_c)/count(*)/100.0 AS avg_price, sum(disc_c)/count(*)/100.0 AS avg_disc, count(*) AS count_order FROM l GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q_agg_global" ->
      "SELECT count(*) AS n, CAST(sum(CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c, sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT))/count(*)/100.0 AS avg_price, min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price FROM lineitem",
    "q_agg_distinct" ->
      "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, CAST(sum(DISTINCT CAST(floor(l_quantity*100+0.5) AS BIGINT)) AS BIGINT) AS sum_dq_c FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_agg_mode" ->
      ("WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1, 2), " +
        "r AS (SELECT c_nationkey, c_mktsegment, cnt, row_number() OVER (PARTITION BY c_nationkey ORDER BY cnt DESC, c_mktsegment) AS rn FROM c) " +
        "SELECT c_nationkey, c_mktsegment AS modal_segment, CAST(cnt AS BIGINT) AS n FROM r WHERE rn = 1 ORDER BY c_nationkey"),
    "q_agg_rollup" ->
      "SELECT r_name, n_name, CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n, count(*) AS n_cust, CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_bal_c FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP(r_name, n_name) ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST",
    "q_agg_cube" ->
      "SELECT o_orderstatus, o_orderpriority, CAST(grouping(o_orderstatus) AS INT) AS g_s, CAST(grouping(o_orderpriority) AS INT) AS g_p, count(*) AS n_orders, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q_agg_grouping_sets" ->
      "SELECT o_orderstatus, o_orderpriority, CAST(grouping(o_orderstatus) AS INT)*2 + CAST(grouping(o_orderpriority) AS INT) AS gid, count(*) AS n_orders FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q_agg_stats" ->
      "WITH l AS (SELECT l_returnflag, CAST(floor(l_quantity*100+0.5) AS BIGINT) AS x, CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS y FROM lineitem), a AS (SELECT l_returnflag, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy, CAST(sum(x*y) AS BIGINT) AS sxy FROM l GROUP BY l_returnflag) SELECT l_returnflag, sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1))) AS sd_qty_c, (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1)) AS var_qty_c2, (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr_qp, (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1)) AS cov_qp_c2 FROM a ORDER BY l_returnflag",
    "q_agg_collect" ->
      "SELECT c_nationkey, list_aggr(list_sort(list(c_name)), 'string_agg', '|') AS names, list_aggr(list_sort(list(DISTINCT c_mktsegment)), 'string_agg', '|') AS segments FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "q_agg_pivot" ->
      ("SELECT user_id, " + Seq("click", "error", "purchase", "signup", "view")
        .map(t => s"CAST(sum(${centsSql.format("value")}) FILTER (WHERE event_type='$t') AS BIGINT) AS $t")
        .mkString(", ") + " FROM events GROUP BY user_id ORDER BY user_id"),
    "q_agg_salted" ->
      "SELECT o_orderpriority, count(*) AS n_orders, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "q_agg_udaf" ->
      "SELECT l_returnflag, sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)*CAST(floor(l_discount*100+0.5) AS BIGINT))/sum(CAST(floor(l_discount*100+0.5) AS BIGINT))/100.0 AS wavg_price FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_agg_percentile" ->
      "WITH l AS (SELECT l_returnflag, CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS price_c FROM lineitem) SELECT l_returnflag, round(quantile_cont(price_c, 0.5), 4) AS p50_c, round(quantile_cont(price_c, 0.9), 4) AS p90_c FROM l GROUP BY l_returnflag ORDER BY l_returnflag"
  )
}
