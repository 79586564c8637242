package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse reporting and audit operators: period-over-period growth,
  * ratio-to-parent rollups, Pareto (skyline) frontiers, Benford first-digit
  * audits, UPC-E normalization, and co-occurrence graph triangle counting.
  *
  * The common scale discipline: every fact-sized frame is touched once and
  * aggregated down to a model-sized frame BEFORE any window/self-join runs —
  * the windows here iterate over dozens-to-thousands of aggregate rows, never
  * the 100-TB fact. The one genuinely super-linear operator (triangles) uses
  * the degree-ordered orientation that bounds wedge generation, the standard
  * trick that makes distributed triangle counting feasible (cf. Suri &
  * Vassilvitskii, WWW 2011).
  */
object Reports {
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** UPC-E body: 6 deterministic digits derived from the part key. The SAME
    * SQL text runs on Spark (via expr) and DuckDB (via the oracle CTE) —
    * textual identity is the cross-engine equality proof, exactly the
    * SimKernel.cosSql pattern. */
  private val upcBodySql =
    "lpad(CAST((p_partkey * 37 + 11) % 1000000 AS STRING), 6, '0')"

  /** UPC-E -> UPC-A body expansion (number system 0). Standard GS1 rule
    * keyed on the last body digit: 0-2 embed it as the 3rd manufacturer
    * digit, 3/4 split manufacturer/product at 3/4 digits, 5-9 append as the
    * product digit. Input column `b` (6 digits), output 11 digits (leading
    * number system 0, no check digit yet). */
  private val upcExpandSql =
    "CASE WHEN substring(b, 6, 1) IN ('0','1','2') THEN '0' || substring(b,1,2) || substring(b,6,1) || '0000' || substring(b,3,3) " +
      "WHEN substring(b, 6, 1) = '3' THEN '0' || substring(b,1,3) || '00000' || substring(b,4,2) " +
      "WHEN substring(b, 6, 1) = '4' THEN '0' || substring(b,1,4) || '00000' || substring(b,5,1) " +
      "ELSE '0' || substring(b,1,5) || '0000' || substring(b,6,1) END"

  /** Mod-10 check digit over the 11-digit column `a11`: 3x odd positions +
    * even positions (UPC-A weighting). Generated from the position lists so
    * the weighting exists in exactly one place. */
  private val upcCheckSql = {
    val odd = (1 to 11 by 2).map(i => s"CAST(substring(a11,$i,1) AS INT)").mkString(" + ")
    val even = (2 to 10 by 2).map(i => s"CAST(substring(a11,$i,1) AS INT)").mkString(" + ")
    s"(10 - (3*($odd) + ($even)) % 10) % 10"
  }

  /** Benford first-digit probabilities log10(1 + 1/d), d = 1..9, as e12
    * integers (floor(p * 1e12 + 0.5), precomputed at 60-digit precision).
    * Shared verbatim by the Spark query and the DuckDB oracle so NEITHER
    * engine calls libm: the old ln()-based expectation differed by one
    * ulp between DuckDB's and the JVM's ln on some inputs, flipping a
    * floored e6 row on unlucky totals. Constants close that for good. */
  private val benfordE12Sql =
    "CASE digit WHEN 1 THEN 301029995664 WHEN 2 THEN 176091259056 WHEN 3 THEN 124938736608 " +
      "WHEN 4 THEN 96910013008 WHEN 5 THEN 79181246048 WHEN 6 THEN 66946789631 " +
      "WHEN 7 THEN 57991946978 WHEN 8 THEN 51152522447 ELSE 45757490561 END"

  /** Exact ntile(k) over (value, tiebreaks) WITHOUT a single-task global
    * sort — the two-level rank decomposition shared by
    * q_histogram_equidepth and all three q_rfm_segmentation quintiles:
    * rows shuffle ONCE on a value-derived coarse bucket (monotone in the
    * sort order, so bucket-local ranks + bucket cumulative counts
    * reassemble the global rank), intra-bucket ranks come from a PARALLEL
    * partitioned window, and only the model-sized bucket-count frame takes
    * an unpartitioned running sum. The closed-form ntile formula (first
    * n mod k buckets get one extra row) maps ranks to buckets per row.
    * For descending metrics pass the negated column (truncating `div`
    * stays monotone over negatives, which is all bucketing needs). */
  private[graft] def ntileTwoLevel(
      df: DataFrame,
      k: Int,
      value: Column,
      coarse: Column,
      tiebreaks: Seq[Column],
      out: String): DataFrame = {
    val tmp = df.withColumn("__v", value).withColumn("__coarse", coarse)
    val intra = tmp.withColumn(
      "__ir",
      row_number().over(
        Window.partitionBy("__coarse").orderBy(col("__v") +: tiebreaks: _*)))
    val cum = tmp
      .groupBy("__coarse")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(
        "__cum_before",
        coalesce(
          sum("__cnt").over(Window.orderBy("__coarse").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy()))
    intra
      .join(broadcast(cum.select("__coarse", "__cum_before", "__n")), Seq("__coarse"))
      .withColumn("__rank", col("__cum_before") + col("__ir"))
      .withColumn(
        out,
        expr(
          s"CAST(CASE WHEN __rank <= (__n div $k + 1) * (__n % $k) " +
            s"THEN (__rank - 1) div (__n div $k + 1) + 1 " +
            s"ELSE __n % $k + (__rank - (__n div $k + 1) * (__n % $k) - 1) div (__n div $k) + 1 END AS INT)"))
      .drop("__v", "__coarse", "__ir", "__cum_before", "__n", "__rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Month-over-month revenue growth: the fact is aggregated to ~80 month
    // rows FIRST; the unpartitioned lag window then runs on that model-sized
    // frame (a global window over a pre-aggregated frame is fine — over the
    // raw fact it would be the classic single-task trap). Growth is an e6
    // ratio of exact cent longs.
    "q_mom_growth" -> { (s, dir) =>
      val monthly = Fixtures
        .table(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_c", lag("rev_c", 1).over(w))
        .select(
          col("month"),
          col("rev_c"),
          col("prev_c"),
          when(
            col("prev_c").isNotNull,
            floor((col("rev_c") - col("prev_c")).cast("double") / col("prev_c") * 1e6 + lit(0.5))
              .cast("long")).as("growth_e6"))
        .orderBy("month")
    },
    // Ratio-to-parent rollup: each nation's share of its region's revenue.
    // Dims chain off the fact via broadcast (all three are bounded
    // dimensions); the share window partitions the 25-row aggregate by
    // region, never the fact. Share is e6 over exact cent longs.
    "q_ratio_to_parent" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(col("o_custkey"), cents(col("o_totalprice")).as("t_c"))
        .join(
          broadcast(Fixtures.table(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(
          broadcast(Fixtures.table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(
          broadcast(Fixtures.table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum("t_c").as("rev_c"))
        .withColumn(
          "share_e6",
          floor(col("rev_c").cast("double") / sum("rev_c").over(Window.partitionBy("r_name")) * 1e6 + lit(0.5))
            .cast("long"))
        .orderBy("r_name", "n_name")
    },
    // Pareto frontier (skyline): parts not dominated on (price low, size
    // high) — a row is dominated iff the max size over STRICTLY cheaper
    // rows reaches its size, or a same-price row strictly exceeds it. The
    // oracle's NOT EXISTS is O(n^2); this plan is O(n log n) with NO
    // single-task stage via the same two-level decomposition as
    // q_histogram_equidepth: "max size over strictly cheaper" splits into
    // (a) the running max over strictly-LOWER coarse price buckets — an
    // unpartitioned window over the ~100-row bucket-max frame only — and
    // (b) the intra-bucket strictly-cheaper max from a PARALLEL
    // bucket-partitioned range window. greatest(a, b) reassembles the
    // global prefix max; the price-tie max is a parallel window too. No
    // self-join, no global sort task, at any scale.
    "q_pareto_front" -> { (s, dir) =>
      val p = Fixtures
        .table(s, dir, "part")
        .select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"), col("p_size"))
        .withColumn("coarse", expr("price_c div 10000"))
      val bucketMax = p
        .groupBy("coarse")
        .agg(max("p_size").as("bmax"))
        .withColumn(
          "below_max",
          max("bmax").over(Window.orderBy("coarse").rowsBetween(Window.unboundedPreceding, -1)))
      val wLt = Window
        .partitionBy("coarse")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
      val wEq = Window.partitionBy("price_c")
      p.join(broadcast(bucketMax.select("coarse", "below_max")), Seq("coarse"))
        .withColumn("intra_lt", max("p_size").over(wLt))
        .withColumn("max_lt", greatest(coalesce(col("intra_lt"), lit(Int.MinValue)), coalesce(col("below_max"), lit(Int.MinValue))))
        .withColumn("max_eq", max("p_size").over(wEq))
        .filter(!(col("max_lt") >= col("p_size") || col("max_eq") > col("p_size")))
        .select("p_partkey", "price_c", "p_size")
        .orderBy("p_partkey")
    },
    // Benford first-digit audit over order totals: observed counts vs the
    // log10(1 + 1/d) expectation, with per-digit chi-square contributions —
    // the classic synthetic-data / fraud tell. One aggregation pass to 9
    // rows; the expectation math runs per digit row.
    //
    // Determinism (round 12, closes the last gen-data oracle gap): the
    // expectation was tot * ln(1+1/d)/ln(10) — and libm's ln (DuckDB) vs
    // the JVM's (Spark) differ by one ulp on some inputs, which can flip
    // a floor(x*1e6+0.5) row on unlucky totals (SURVEY §5.4.12). The nine
    // Benford probabilities are CONSTANTS, so both engines now share the
    // same e12 integer table ([[benfordE12Sql]]) and every remaining op
    // is integer arithmetic or an exactly-specified IEEE-754 multiply/
    // divide — bit-identical on any input, no libm anywhere.
    "q_benford" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n_obs"))
        .withColumn("tot", sum("n_obs").over(Window.partitionBy()))
        .withColumn("ben_e12", expr(benfordE12Sql))
        // DECIMAL(38,0) product (HUGEINT in the oracle): a plain BIGINT
        // tot * ben_e12 wraps once tot exceeds ~3.06e7 rows (~sf20) and
        // ANSI mode turns that into a hard failure. The decimal widening
        // is exact for any conceivable tot; the remaining domain bound is
        // n_obs * 1e6 in delta_e6 (exact to n_obs ≤ 9.2e12 — four orders
        // past a 100-TB orders table).
        .withColumn("exp_e6", expr("(CAST(tot AS DECIMAL(38,0)) * ben_e12 + 500000) div 1000000"))
        .withColumn("delta_e6", expr("n_obs * 1000000 - exp_e6"))
        .select(
          col("digit"),
          col("n_obs"),
          expr("(CAST(tot AS DECIMAL(38,0)) * ben_e12 + 500000000000) div 1000000000000").as("n_exp"),
          expr("CAST(floor(CAST(delta_e6 AS DOUBLE) * CAST(delta_e6 AS DOUBLE) / CAST(exp_e6 AS DOUBLE) + 0.5) AS BIGINT)")
            .as("chi2_e6"))
        .orderBy("digit")
    },
    // Thematic: UPC-E (zero-suppressed 8-digit) synthesis and normalization
    // to full UPC-A — what a UPC/SKU loader does to reconcile retail feeds
    // that mix compressed and full codes. Pure string/arithmetic SQL shared
    // verbatim with the oracle; map-only, whole-stage codegen, zero shuffle
    // at any scale.
    "q_upc_normalize" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "part")
        .select(col("p_partkey"))
        .withColumn("b", expr(upcBodySql))
        .withColumn("a11", expr(upcExpandSql))
        .withColumn("cd", expr(upcCheckSql))
        .select(
          col("p_partkey"),
          concat(lit("0"), col("b"), col("cd").cast("string")).as("upc_e"),
          concat(col("a11"), col("cd").cast("string")).as("upc_a"))
        .orderBy("p_partkey")
    },
    // Triangle count on the co-purchase graph — the [[Graph.triangles]]
    // degree-ordered-orientation kernel bound to the MEMOIZED co-purchase
    // edge frame (Graph.coPurchaseEdges: one build + truncation shared
    // with q_graph_pagerank per session/SF). Kernel + scale story live in
    // ops/Graph.scala.
    "q_graph_triangles" -> { (s, dir) =>
      Graph.triangles(Graph.coPurchaseEdges(s, dir))
    },
    // PageRank (5 supersteps, damping 0.85) in pure integer e12
    // fixed-point — the [[Graph.pagerank]] kernel on the same memoized
    // edge frame; bit-identical across partitionings so the oracle can
    // hash-match an iterative score.
    "q_graph_pagerank" -> { (s, dir) =>
      Graph.pagerank(Graph.coPurchaseEdges(s, dir), 5).orderBy("v")
    },
    // Degree distribution of the co-purchase graph — [[Graph.degreeDistribution]]
    // on the memoized edge frame; the graph's shape in a model-sized table.
    "q_graph_degree_dist" -> { (s, dir) =>
      Graph.degreeDistribution(Graph.coPurchaseEdges(s, dir)).orderBy("deg")
    },
    // Common-neighbor link prediction — "bought together with both of
    // these, never together with each other" — on the SIGNAL co-purchase
    // graph: edges kept only when the pair co-occurred in ≥ 2 orders.
    // The threshold is the scale design, not a convenience: single
    // co-occurrence edges grow linearly with the fact table (pure noise —
    // 1.2M at sf0.1) while ≥2 edges stay near-constant (~3.9k, the real
    // affinities), and link prediction's wedge volume is Σ C(deg, 2) of
    // whatever graph it runs on. [[Graph.commonNeighbors]] then
    // enumerates full wedges + anti-joins existing edges; global top 20
    // with (cn desc, a, b) tiebreaks rides TakeOrderedAndProject.
    "q_graph_linkpred" -> { (s, dir) =>
      Graph
        .commonNeighbors(
          Graph.coPurchaseEdgesWeighted(s, dir).filter(col("w") >= 2).select("a", "b"))
        .orderBy(col("cn").desc, col("a"), col("b"))
        .limit(20)
    },
    // Cohort lifetime value: customers grouped by FIRST-order month, each
    // cohort's revenue accumulated over its age in months — the LTV curve
    // next to q_retention_cohort's retention table. Month arithmetic uses
    // the integer index y*12+m (no months_between float semantics to
    // disagree on); the fact aggregates to (cohort, age) grain BEFORE the
    // cumulative window, which then runs on the model-sized cohort×age
    // frame partitioned by cohort.
    "q_cohort_ltv" -> { (s, dir) =>
      val o = Fixtures
        .table(s, dir, "orders")
        .select(
          col("o_custkey").as("ck"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("midx"),
          cents(col("o_totalprice")).as("rev_c"))
      val first = o.groupBy("ck").agg(min("midx").as("cohort_idx"))
      val w = Window
        .partitionBy("cohort_idx")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
      o.join(first, Seq("ck"))
        .groupBy(col("cohort_idx"), (col("midx") - col("cohort_idx")).as("age_m"))
        .agg(sum("rev_c").as("rev_c"), countDistinct("ck").as("n_active"))
        .withColumn("cum_rev_c", sum("rev_c").over(w))
        .orderBy("cohort_idx", "age_m")
    },
    // Supplier scorecard: the per-vendor KPI row a sourcing review reads —
    // revenue, order/part breadth, and return rate (e6 fraction of lines
    // returned, from exact long counts in one fixed double expression
    // shared with the oracle). ONE pass over the fact table; the supplier
    // dimension broadcasts; two distinct-counts ride the same grouping.
    "q_vendor_scorecard" -> { (s, dir) =>
      val rateSql = "CAST(floor(CAST(n_returned AS DOUBLE) / n_lines * 1000000 + 0.5) AS BIGINT)"
      Fixtures
        .table(s, dir, "lineitem")
        .join(
          broadcast(Fixtures.table(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + lit(0.5))
            .cast("long")).as("rev_e4"),
          countDistinct("l_orderkey").as("n_orders"),
          countDistinct("l_partkey").as("n_parts"),
          count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
        .select(
          col("s_suppkey"),
          col("s_name"),
          col("rev_e4"),
          col("n_orders"),
          col("n_parts"),
          col("n_lines"),
          expr(rateSql).as("return_rate_e6"))
        .orderBy("s_suppkey")
    },
    // Pricing waterfall per order year: gross list revenue → discount
    // given → net → tax collected, each an exact e4 integer sum from ONE
    // conditional-free aggregation pass over the fact — the revenue-bridge
    // decomposition finance reconciles against the ledger. Every component
    // is floored per row before summing, so the bridge's arithmetic
    // (gross − disc = net) holds in the rounded domain both engines share.
    "q_discount_waterfall" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .join(
          Fixtures.table(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          year(col("o_orderdate")).cast("long").as("o_year"),
          floor(col("l_extendedprice") * 10000 + lit(0.5)).cast("long").as("gross_e4"),
          floor(col("l_extendedprice") * col("l_discount") * 10000 + lit(0.5)).cast("long").as("disc_e4"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * col("l_tax") * 10000 + lit(0.5))
            .cast("long").as("tax_e4"))
        .groupBy("o_year")
        .agg(
          sum("gross_e4").as("gross_e4"),
          sum("disc_e4").as("disc_e4"),
          (sum("gross_e4") - sum("disc_e4")).as("net_e4"),
          sum("tax_e4").as("tax_e4"))
        .orderBy("o_year")
    },
    // Order cycle time by priority: days from order placement to FIRST
    // shipment, summarized per priority class — the fulfillment SLA cut.
    // One fact aggregation to order grain (min shipdate), one broadcast-
    // joined date diff, one grouped summary; the median uses the same
    // interpolated-percentile bit-parity as q_anomaly_mad/q_outlier_iqr.
    "q_order_cycle_time" -> { (s, dir) =>
      val firstShip = Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min("l_shipdate").as("first_ship"))
      Fixtures
        .table(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(firstShip, col("o_orderkey") === col("l_orderkey"))
        .select(
          col("o_orderpriority"),
          datediff(col("first_ship"), col("o_orderdate")).cast("long").as("days"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum("days").as("days_sum"),
          floor(expr("percentile(days, 0.5)") * 10 + lit(0.5)).cast("long").as("p50_d1"),
          max("days").as("max_days"))
        .orderBy("o_orderpriority")
    },
    // Running order backlog: how many orders are OPEN (placed, not yet
    // fully shipped) in each month — the fulfillment series an operations
    // dashboard tracks. Per order: placed month and last-ship month as
    // integer indexes (y·12+m), then each order explodes into one row per
    // open month via sequence() — interval-to-months explosion, the same
    // move as q_hierarchy_rollup's arithmetic closure: a generator plus
    // ONE groupBy instead of a months-dimension range join. Backlog size
    // stays bounded because the explode factor is the order's open
    // duration, not the table size.
    "q_running_backlog" -> { (s, dir) =>
      val spans = Fixtures
        .table(s, dir, "lineitem")
        .join(
          Fixtures.table(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(
          min((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long")).as("m0"),
          max((year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long")).as("m1"))
      spans
        .filter(col("m1") >= col("m0"))
        .select(explode(sequence(col("m0"), col("m1"))).as("midx"))
        .groupBy("midx")
        .agg(count(lit(1)).as("n_open"))
        .orderBy("midx")
    },
    // IQR (Tukey-fence) outlier audit per brand: unit prices outside
    // [q1 − 1.5·IQR, q3 + 1.5·IQR] — the robust sibling of
    // q_anomaly_zscore/q_anomaly_mad that completes the outlier-family
    // trio. Spark's interpolated percentile() is bit-identical to
    // DuckDB's quantile_cont on integer-cent inputs (the q_anomaly_mad
    // precedent); the fences compare in doubles derived from those two
    // exact values, one expression shared between engines. Two grouped
    // passes + a broadcast join — the 25-row quantile frame never
    // shuffles the fact a second time.
    "q_outlier_iqr" -> { (s, dir) =>
      val v = Fixtures
        .table(s, dir, "lineitem")
        .join(
          broadcast(Fixtures.table(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(
          col("p_brand"),
          floor(col("l_extendedprice") / col("l_quantity") * 100 + lit(0.5)).cast("long").as("u"))
      val q = v
        .groupBy("p_brand")
        .agg(expr("percentile(u, 0.25)").as("q1"), expr("percentile(u, 0.75)").as("q3"))
      v.join(broadcast(q), Seq("p_brand"))
        .groupBy("p_brand")
        .agg(
          floor(first("q1") * 10 + lit(0.5)).cast("long").as("q1_d1"),
          floor(first("q3") * 10 + lit(0.5)).cast("long").as("q3_d1"),
          count(lit(1)).as("n"),
          sum(
            when(
              col("u") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
                col("u") > col("q3") + lit(1.5) * (col("q3") - col("q1")),
              1L).otherwise(0L)).as("n_outliers"))
        .orderBy("p_brand")
    },
    // Hierarchy (category-tree) revenue rollup: parts live in a synthetic
    // decimal tree (parent = node div 10, ~5 levels at 20k parts), and
    // every part's revenue rolls up to ALL its ancestors. The closure is
    // computed ARITHMETICALLY — ancestor at level k is pk div 10^k, a
    // pure map-side expression exploded per level — instead of the
    // iterated self-join a general parent-pointer table would need: when
    // the hierarchy encoding admits it, the O(depth) explode + ONE
    // groupBy replaces O(depth) joins, the difference between one
    // shuffle and five at 100 TB. Levels 1-3 reported (level-0 leaves
    // are q_sku_abc's grain).
    "q_hierarchy_rollup" -> { (s, dir) =>
      val rev = Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + lit(0.5))
            .cast("long")).as("rev_e4"))
      rev
        .select(
          col("pk"),
          col("rev_e4"),
          posexplode(array(
            expr("pk div 10"),
            expr("pk div 100"),
            expr("pk div 1000"))))
        .toDF("pk", "rev_e4", "lvl0", "node")
        .select((col("lvl0") + 1).as("level"), col("node"), col("rev_e4"))
        .groupBy("level", "node")
        .agg(count(lit(1)).as("n_parts"), sum("rev_e4").as("rev_e4"))
        .orderBy("level", "node")
    },
    // Exact discount proration by LARGEST REMAINDER: a 10% order-level
    // discount pool (in cents) allocated to the order's lines
    // proportionally to line revenue, with the rounding remainder
    // distributed to the largest fractional parts — so per-order
    // allocations sum to the pool EXACTLY, the invariant finance data
    // requires and naive floor/round proration silently breaks. All
    // integer: base = pool·w div W, fractional part compared as
    // pool·w mod W (longs), remainder ranks break ties by line number.
    // One order-partitioned shuffle carries the window trio.
    "q_proration" -> { (s, dir) =>
      // line grain first: the fixture repeats (orderkey, linenumber), and
      // both the remainder rank and the output sort need a UNIQUE key
      val li = Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        .agg(sum(cents(col("l_extendedprice"))).as("w"))
      val wOrd = Window.partitionBy("ok")
      val wRank = Window.partitionBy("ok").orderBy(col("frac").desc, col("ln"))
      li.withColumn("bigw", sum("w").over(wOrd))
        .withColumn("pool", expr("(bigw div 10)"))
        .withColumn("base", expr("(pool * w) div bigw"))
        .withColumn("frac", expr("(pool * w) % bigw"))
        .withColumn("rem", col("pool") - sum("base").over(wOrd))
        .withColumn("rk", row_number().over(wRank))
        .select(
          col("ok"),
          col("ln"),
          col("w"),
          (col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L)).as("alloc_c"))
        .orderBy("ok", "ln")
    },
    // RFM segmentation: per-customer Recency/Frequency/Monetary quintiles,
    // rolled up to segment counts — the classic CRM cut. Each quintile is
    // an EXACT ntile(5) with full (metric, custkey) tiebreaks, computed by
    // the two-level [[ntileTwoLevel]] decomposition so even a 10^9-row
    // entity dimension never funnels through one task (the oracle's plain
    // unpartitioned ntile is the semantics being reproduced). Descending
    // metrics pass negated.
    "q_rfm_segmentation" -> { (s, dir) =>
      val orders = Fixtures.table(s, dir, "orders")
      val mx = orders.agg(max("o_orderdate").as("mxd"))
      val c = orders
        .groupBy(col("o_custkey").as("ck"))
        .agg(
          max("o_orderdate").as("last_d"),
          count(lit(1)).as("freq"),
          sum(cents(col("o_totalprice"))).as("mon_c"))
        .crossJoin(broadcast(mx))
        .select(
          col("ck"),
          datediff(col("mxd"), col("last_d")).cast("long").as("rec_days"),
          col("freq"),
          col("mon_c"))
      val q1 = ntileTwoLevel(c, 5, col("rec_days"), expr("rec_days div 100"), Seq(col("ck")), "r_q")
      val q2 = ntileTwoLevel(q1, 5, -col("freq"), -col("freq"), Seq(col("ck")), "f_q")
      val q3 =
        ntileTwoLevel(q2, 5, -col("mon_c"), expr("(-mon_c) div 10000000"), Seq(col("ck")), "m_q")
      q3.groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_customers"), sum("mon_c").as("seg_mon_c"))
        .orderBy("r_q", "f_q", "m_q")
    },
    // Seasonal index: month-of-year average revenue relative to the overall
    // monthly average — the deseasonalization factor demand planning uses.
    // Fact aggregates to ~80 month rows, then to 12 month-of-year rows;
    // every window runs on the 12-row frame. The index expression text is
    // shared verbatim with the oracle (identical IEEE tree).
    "q_seasonal_index" -> { (s, dir) =>
      val idxSql =
        "CAST(floor((CAST(tot_c AS DOUBLE)/n_months) / (CAST(all_c AS DOUBLE)/all_n) * 1000000 + 0.5) AS BIGINT)"
      Fixtures
        .table(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
        .groupBy(month(col("mo")).as("moy"))
        .agg(count(lit(1)).as("n_months"), sum("rev_c").as("tot_c"))
        .withColumn("all_c", sum("tot_c").over(Window.partitionBy()))
        .withColumn("all_n", sum("n_months").over(Window.partitionBy()))
        .select(col("moy"), col("n_months"), col("tot_c"), expr(idxSql).as("idx_e6"))
        .orderBy("moy")
    },
    // ABC inventory classification (cumulative Pareto classes): parts
    // sorted by revenue desc, class A = the head covering 70% of
    // cumulative revenue, B to 90%, C the tail — the classic stock-policy
    // cut. The global cumulative sum uses the SAME two-level
    // decomposition as ntileTwoLevel, but for SUMS: intra-bucket running
    // revenue from a PARALLEL coarse-bucket window plus the running total
    // of strictly-prior buckets from the ~bucket-count frame — no
    // single-task cumsum over the part dimension. Class thresholds
    // compare cum*100 <= k*total in exact longs (headroom note: at
    // 100-TB revenue magnitudes drop the e4 scale to e2 so 100x total
    // stays inside a long). Ties (equal revenue) break by part key and
    // land in the same coarse bucket by construction.
    "q_sku_abc" -> { (s, dir) =>
      val rev = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + lit(0.5))
        .cast("long")
      val p = Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(rev).as("rev"))
        .withColumn("coarse", expr("(-rev) div 100000000"))
      val intra = p.withColumn(
        "ic",
        sum("rev").over(
          Window
            .partitionBy("coarse")
            .orderBy(desc("rev"), asc("pk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bkt = p
        .groupBy("coarse")
        .agg(sum("rev").as("brev"))
        .withColumn(
          "before",
          coalesce(
            sum("brev").over(Window.orderBy("coarse").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .withColumn("tot", sum("brev").over(Window.partitionBy()))
      intra
        .join(broadcast(bkt.select("coarse", "before", "tot")), Seq("coarse"))
        .withColumn("cum", col("before") + col("ic"))
        .withColumn(
          "cls",
          when(col("cum") * 100 <= lit(70) * col("tot"), "A")
            .when(col("cum") * 100 <= lit(90) * col("tot"), "B")
            .otherwise("C"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_e4"), first("tot").as("tot"))
        .select(
          col("cls"),
          col("n_parts"),
          col("rev_e4"),
          floor(col("rev_e4").cast("double") / col("tot") * 1e6 + lit(0.5)).cast("long").as("share_e6"))
        .orderBy("cls")
    },
    // Revenue decile (Lorenz) report: customers in revenue-desc deciles
    // with per-decile and cumulative revenue shares — the concentration
    // curve behind "top 10% of customers drive X%". Deciles come from the
    // shared [[ntileTwoLevel]] decomposition (no single-task sort over the
    // customer dimension); the cumulative share window runs on the 10-row
    // decile frame only.
    "q_revenue_deciles" -> { (s, dir) =>
      val c = Fixtures
        .table(s, dir, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(cents(col("o_totalprice"))).as("rev"))
      ntileTwoLevel(c, 10, -col("rev"), expr("(-rev) div 10000000"), Seq(col("ck")), "dec")
        .groupBy("dec")
        .agg(count(lit(1)).as("n_customers"), sum("rev").as("rev_c"))
        .withColumn("tot", sum("rev_c").over(Window.partitionBy()))
        .withColumn(
          "cum",
          sum("rev_c").over(
            Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(
          col("dec"),
          col("n_customers"),
          col("rev_c"),
          floor(col("rev_c").cast("double") / col("tot") * 1e6 + lit(0.5)).cast("long").as("share_e6"),
          floor(col("cum").cast("double") / col("tot") * 1e6 + lit(0.5)).cast("long").as("cum_share_e6"))
        .orderBy("dec")
    },
    // Basket-affinity association rules (market-basket lift) — THE retail
    // SKU analysis: for co-purchased part pairs, lift = P(ab)/(P(a)P(b))
    // from exact distinct-order counts. The pair frame is the same
    // order-key self-join as the co-purchase graph (bounded per-order
    // explosion); supports join back via the item-count frame; a minimum
    // pair support prunes the long tail BEFORE the support joins; the
    // top-20 lands on TakeOrderedAndProject. Lift is one double expression
    // over exact longs.
    "q_basket_lift" -> { (s, dir) =>
      val li = Fixtures
        .table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val n = li.select(countDistinct("ok").as("n_orders"))
      val it = li.groupBy("pk").agg(count(lit(1)).as("n_i"))
      // apriori min-support prefilter: n_ab >= 3 ⇒ n_a >= 3 ∧ n_b >= 3, so
      // items below support 3 can never reach a qualifying pair — pruning
      // them BEFORE the per-order self-join bounds the O(k²) pair
      // explosion against skewed baskets with zero result change
      // (monotonicity); the lift denominators keep the TRUE item counts
      // fanOutBy on the order key (guide §2.5): the pair self-join is the
      // same CPU-dense-explosion shape as the co-purchase graph build and
      // was likewise AQE byte-coalesced to ~3 tasks; the explicit hash(ok)
      // repartition IS the join's exchange, pinned to core width.
      val liF = Checkpoints.fanOutBy(
        li.join(it.filter(col("n_i") >= 3).select("pk"), Seq("pk"), "left_semi"),
        col("ok"))
      liF.join(liF.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .groupBy(col("pk").as("pa"), col("pk2").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 3)
        .join(it.select(col("pk").as("pa"), col("n_i").as("n_a")), Seq("pa"))
        .join(it.select(col("pk").as("pb"), col("n_i").as("n_b")), Seq("pb"))
        .crossJoin(broadcast(n))
        .select(
          col("pa"),
          col("pb"),
          col("n_ab"),
          col("n_a"),
          col("n_b"),
          floor(col("n_ab").cast("double") * col("n_orders") / (col("n_a") * col("n_b")) * 1e6 + lit(0.5))
            .cast("long")
            .as("lift_e6"))
        .orderBy(desc("lift_e6"), asc("pa"), asc("pb"))
        .limit(20)
    },
    // Top revenue movers: per-part year-over-year revenue delta in ONE
    // conditional-aggregate pass over the fact (no self-join of two period
    // scans), exact e4 ints, top-20 gainers on TakeOrderedAndProject.
    "q_top_movers" -> { (s, dir) =>
      val rev = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + lit(0.5))
        .cast("long")
      val y97lo = lit("1997-01-01").cast("timestamp_ntz")
      val y97hi = lit("1998-01-01").cast("timestamp_ntz")
      val y96lo = lit("1996-01-01").cast("timestamp_ntz")
      Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(
          sum(when(col("l_shipdate") >= y97lo && col("l_shipdate") < y97hi, rev).otherwise(0L))
            .as("cur_e4"),
          sum(when(col("l_shipdate") >= y96lo && col("l_shipdate") < y97lo, rev).otherwise(0L))
            .as("prev_e4"))
        .filter(col("cur_e4") > 0 || col("prev_e4") > 0)
        .select(
          col("pk"),
          col("cur_e4"),
          col("prev_e4"),
          (col("cur_e4") - col("prev_e4")).as("delta_e4"))
        .orderBy(desc("delta_e4"), asc("pk"))
        .limit(20)
    },
    // Equi-depth histogram (exact ntile semantics) WITHOUT a single-task
    // global sort — the two-level rank decomposition: rows shuffle ONCE on
    // a coarse value bucket (c div 100000 — value-derived, so no
    // partitioner nondeterminism; ~100 buckets at ANY scale because the
    // price domain is fixed), intra-bucket ranks come from a parallel
    // partitioned window, and only the ~100-row bucket-count frame takes
    // an unpartitioned running sum. global_rank = bucket's cumulative
    // count + intra rank reproduces ntile's (c, orderkey, linenumber)
    // total order exactly; the closed-form ntile bucket formula (first
    // n mod k buckets get one extra row) is applied per row. Complements
    // the equi-width q_histogram.
    "q_histogram_equidepth" -> { (s, dir) =>
      val v = Fixtures
        .table(s, dir, "lineitem")
        .select(
          cents(col("l_extendedprice")).as("c"),
          col("l_orderkey"),
          col("l_linenumber"))
      ntileTwoLevel(
        v,
        8,
        col("c"),
        expr("c div 100000"),
        Seq(col("l_orderkey"), col("l_linenumber")),
        "bkt")
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_rows"), min("c").as("lo_c"), max("c").as("hi_c"))
        .orderBy("bkt")
    },
    // Per-nation Gini coefficient of customer revenue — the inequality
    // summary next to q_revenue_deciles' Lorenz table, via the closed
    // form G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending
    // (rev, custkey) ranks. The rank window partitions by NATION, so the
    // sort parallelizes across the 25 nation partitions (the one-nation
    // row_number can fall back to the ntileTwoLevel decomposition if a
    // single nation's customer count ever outgrows one task). Everything
    // up to the final ratio is exact longs; headroom: i·xᵢ at 10^9
    // customers × 10^7 cents brushes the long limit — at that scale drop
    // revenue to whole currency units first. The ratio expression is one
    // fixed double tree shared verbatim with the oracle.
    // Inventory aging / slow movers: per part, days since its LAST
    // shipment (against the corpus max date — a broadcast 1-row aggregate,
    // the q_freshness pattern), bucketed into the 0-90/91-180/181-365/365+
    // aging classes a stock controller reviews. ONE aggregation pass over
    // the fact to part grain, then map-only bucketing — no window, no
    // second fact scan, linear at any scale.
    "q_slow_movers" -> { (s, dir) =>
      val mx = Fixtures.table(s, dir, "lineitem").agg(max("l_shipdate").as("mxd"))
      Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"))
        .agg(max("l_shipdate").as("last_ship"), sum(col("l_quantity").cast("long")).as("qty"))
        .crossJoin(broadcast(mx))
        .select(
          col("pk"),
          datediff(col("mxd"), col("last_ship")).cast("long").as("age_days"),
          col("qty"))
        .select(
          when(col("age_days") <= 90, "A_0_90")
            .when(col("age_days") <= 180, "B_91_180")
            .when(col("age_days") <= 365, "C_181_365")
            .otherwise("D_365_plus")
            .as("age_bucket"),
          col("qty"))
        .groupBy("age_bucket")
        .agg(count(lit(1)).as("n_parts"), sum("qty").as("qty_sum"))
        .orderBy("age_bucket")
    },
    // Price elasticity proxy: per-part OLS slope of quantity on unit price
    // over its order lines, slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) — the
    // classic closed form computed from FOUR exact long sums in one
    // aggregation pass (x = unit cents via the engine-shared double
    // division, y = quantity; headroom: Σx² at 1e5-cent prices and 10^6
    // lines/part is ~1e16 — inside long; at bigger per-part line counts
    // drop x to whole currency units). Parts with a degenerate variance
    // (single price point) are excluded exactly (den = 0). The final
    // slope is ONE double expression shared verbatim with the oracle.
    "q_price_elasticity" -> { (s, dir) =>
      val slopeSql =
        "CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * 1000000 + 0.5) AS BIGINT)"
      Fixtures
        .table(s, dir, "lineitem")
        .select(
          col("l_partkey").as("pk"),
          floor(col("l_extendedprice") / col("l_quantity") * 100 + lit(0.5)).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
        .groupBy("pk")
        .agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"),
          sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .filter(col("n") >= 20 && (col("n") * col("sxx") - col("sx") * col("sx")) =!= 0)
        .select(col("pk"), col("n"), expr(slopeSql).as("slope_e6"))
        .orderBy("pk")
    },
    // XYZ demand-variability classes (the companion cut to q_sku_abc's
    // ABC): per part, the coefficient of variation of MONTHLY demand,
    // classed X (CV ≤ 0.5, steady), Y (CV ≤ 1), Z (erratic). The entire
    // comparison happens in integers: CV² = (n·Σq² − (Σq)²)/(Σq)², so
    // X ⇔ 4·num ≤ den and Y ⇔ num ≤ den — no float CV ever exists, no
    // rounding boundary to disagree on. Two-level aggregation (fact →
    // part-month → part), both keyed on the part, then a 3-row rollup.
    "q_sku_xyz" -> { (s, dir) =>
      val monthly = Fixtures
        .table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"), date_trunc("month", col("l_shipdate")).as("mo"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      monthly
        .groupBy("pk")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"), sum(col("q") * col("q")).as("sqq"))
        .select(
          col("pk"),
          (col("n") * col("sqq") - col("sq") * col("sq")).as("num"),
          (col("sq") * col("sq")).as("den"))
        .select(
          when(col("num") * 4 <= col("den"), "X")
            .when(col("num") <= col("den"), "Y")
            .otherwise("Z")
            .as("xyz"))
        .groupBy("xyz")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("xyz")
    },
    // Weighted median unit price per brand (weight = shipped quantity):
    // the smallest price whose cumulative weight reaches half the total —
    // exact integer semantics end to end (2·cumw ≥ totw compares longs).
    // The cumulative window partitions by BRAND, so the sort parallelizes
    // across brands; the per-brand total rides the same partitioning as a
    // window aggregate (one shuffle total). min() over the qualifying
    // rows collapses to the answer without a second sort.
    "q_weighted_median" -> { (s, dir) =>
      val priced = Fixtures
        .table(s, dir, "lineitem")
        .join(
          broadcast(Fixtures.table(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(
          col("p_brand"),
          floor(col("l_extendedprice") / col("l_quantity") * 100 + lit(0.5)).cast("long").as("price_c"),
          col("l_quantity").cast("long").as("w"))
      val wCum = Window
        .partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("p_brand")
      priced
        .withColumn("cumw", sum("w").over(wCum))
        .withColumn("totw", sum("w").over(wTot))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy("p_brand")
        .agg(min("price_c").as("wmedian_c"), max("totw").as("tot_qty"))
        .orderBy("p_brand")
    },
    "q_gini_nation" -> { (s, dir) =>
      val giniSql =
        "CAST(floor((2.0 * iwx - (n_customers + 1.0) * tot_c) / (CAST(n_customers AS DOUBLE) * tot_c) * 1000000 + 0.5) AS BIGINT)"
      val rev = Fixtures
        .table(s, dir, "orders")
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      val w = Window.partitionBy("n_name").orderBy("rev_c", "ck")
      rev
        .join(
          Fixtures.table(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("ck") === col("c_custkey"))
        .join(
          broadcast(Fixtures.table(s, dir, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_customers"),
          sum("rev_c").as("tot_c"),
          sum(col("i") * col("rev_c")).as("iwx"))
        .select(col("n_name"), col("n_customers"), col("tot_c"), expr(giniSql).as("gini_e6"))
        .orderBy("n_name")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_mom_growth" ->
      ("WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c FROM orders GROUP BY 1), " +
        "l AS (SELECT month, rev_c, lag(rev_c) OVER (ORDER BY month) AS prev_c FROM m) " +
        "SELECT month, rev_c, prev_c, CASE WHEN prev_c IS NOT NULL THEN " +
        "CAST(floor(CAST(rev_c - prev_c AS DOUBLE) / prev_c * 1000000 + 0.5) AS BIGINT) END AS growth_e6 " +
        "FROM l ORDER BY month"),
    "q_ratio_to_parent" ->
      ("WITH g AS (SELECT r_name, n_name, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c " +
        "FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2) " +
        "SELECT r_name, n_name, rev_c, " +
        "CAST(floor(CAST(rev_c AS DOUBLE) / sum(rev_c) OVER (PARTITION BY r_name) * 1000000 + 0.5) AS BIGINT) AS share_e6 " +
        "FROM g ORDER BY 1, 2"),
    "q_pareto_front" ->
      ("WITH p AS (SELECT p_partkey, CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) AS price_c, p_size FROM part) " +
        "SELECT p_partkey, price_c, p_size FROM p a WHERE NOT EXISTS (" +
        "SELECT 1 FROM p b WHERE (b.price_c < a.price_c AND b.p_size >= a.p_size) " +
        "OR (b.price_c = a.price_c AND b.p_size > a.p_size)) ORDER BY p_partkey"),
    // Same e12 constant table + integer/IEEE-only arithmetic as the Spark
    // side (see benfordE12Sql) — DuckDB's // is Spark's div; the casts pin
    // the sum() OVER () (HUGEINT in DuckDB) back to BIGINT.
    "q_benford" ->
      ("WITH o AS (SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c FROM orders), " +
        "g AS (SELECT CAST(substring(CAST(c AS STRING), 1, 1) AS INT) AS digit, CAST(count(*) AS BIGINT) AS n_obs FROM o GROUP BY 1), " +
        "t AS (SELECT digit, n_obs, CAST(sum(n_obs) OVER () AS BIGINT) AS tot FROM g), " +
        s"b AS (SELECT digit, n_obs, tot, $benfordE12Sql AS ben_e12 FROM t), " +
        "e AS (SELECT digit, n_obs, tot, ben_e12, CAST((CAST(tot AS HUGEINT) * ben_e12 + 500000) // 1000000 AS BIGINT) AS exp_e6 FROM b), " +
        "d AS (SELECT digit, n_obs, tot, ben_e12, exp_e6, n_obs * 1000000 - exp_e6 AS delta_e6 FROM e) " +
        "SELECT digit, n_obs, CAST((CAST(tot AS HUGEINT) * ben_e12 + 500000000000) // 1000000000000 AS BIGINT) AS n_exp, " +
        "CAST(floor(CAST(delta_e6 AS DOUBLE) * CAST(delta_e6 AS DOUBLE) / CAST(exp_e6 AS DOUBLE) + 0.5) AS BIGINT) AS chi2_e6 " +
        "FROM d ORDER BY digit"),
    "q_upc_normalize" ->
      (s"WITH p AS (SELECT p_partkey, $upcBodySql AS b FROM part), " +
        s"a AS (SELECT p_partkey, b, $upcExpandSql AS a11 FROM p), " +
        s"c AS (SELECT p_partkey, b, a11, $upcCheckSql AS cd FROM a) " +
        "SELECT p_partkey, '0' || b || CAST(cd AS STRING) AS upc_e, a11 || CAST(cd AS STRING) AS upc_a " +
        "FROM c ORDER BY p_partkey"),
    "q_graph_triangles" ->
      ("WITH e AS (SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a, greatest(l1.l_partkey, l2.l_partkey) AS b " +
        "FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b " +
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles"),
    // 5 unrolled supersteps of the SAME integer e12 arithmetic (// is
    // DuckDB integer division, div on the Spark side) — no recursive CTE
    // so each step's aggregation is unrestricted
    "q_graph_pagerank" -> {
      // CAST back to BIGINT every superstep: DuckDB's sum() over BIGINT
      // yields HUGEINT, and without the cast the final rank column arrives
      // as a non-BIGINT dtype and fails the driver's dtype-sensitive hash
      // even though the values are identical.
      val step = (k: Int, j: Int) =>
        s", pr$k AS (SELECT dg.v, CAST((15 * (1000000000000 // (SELECT c FROM n))) // 100 " +
          "+ (85 * COALESCE(s.sc, 0)) // 100 AS BIGINT) AS r FROM dg LEFT JOIN (" +
          s"SELECT ed.dst AS v, CAST(sum(p.r // dgs.deg) AS BIGINT) AS sc FROM ed JOIN pr$j p ON ed.src = p.v " +
          "JOIN dg dgs ON dgs.v = ed.src GROUP BY ed.dst) s ON s.v = dg.v)"
      "WITH e AS (SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a, greatest(l1.l_partkey, l2.l_partkey) AS b " +
        "FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey), " +
        "ed AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e), " +
        "dg AS (SELECT src AS v, count(*) AS deg FROM ed GROUP BY 1), " +
        "n AS (SELECT count(*) AS c FROM dg), " +
        "pr0 AS (SELECT v, CAST(1000000000000 // (SELECT c FROM n) AS BIGINT) AS r FROM dg)" +
        (1 to 5).map(k => step(k, k - 1)).mkString +
        " SELECT v, r AS rank_e12 FROM pr5 ORDER BY v"
    },
    "q_rfm_segmentation" ->
      ("WITH mx AS (SELECT max(o_orderdate) AS d FROM orders), " +
        "c AS (SELECT o_custkey AS ck, CAST(date_diff('day', max(o_orderdate), (SELECT d FROM mx)) AS BIGINT) AS rec_days, " +
        "CAST(count(*) AS BIGINT) AS freq, CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS mon_c FROM orders GROUP BY 1), " +
        "q AS (SELECT ck, mon_c, CAST(ntile(5) OVER (ORDER BY rec_days, ck) AS INT) AS r_q, " +
        "CAST(ntile(5) OVER (ORDER BY freq DESC, ck) AS INT) AS f_q, " +
        "CAST(ntile(5) OVER (ORDER BY mon_c DESC, ck) AS INT) AS m_q FROM c) " +
        "SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers, CAST(sum(mon_c) AS BIGINT) AS seg_mon_c " +
        "FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "q_seasonal_index" ->
      ("WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo, CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS rev_c FROM orders GROUP BY 1), " +
        "a AS (SELECT CAST(month(mo) AS INT) AS moy, CAST(count(*) AS BIGINT) AS n_months, CAST(sum(rev_c) AS BIGINT) AS tot_c FROM m GROUP BY 1), " +
        "g AS (SELECT moy, n_months, tot_c, sum(tot_c) OVER () AS all_c, sum(n_months) OVER () AS all_n FROM a) " +
        "SELECT moy, n_months, tot_c, " +
        "CAST(floor((CAST(tot_c AS DOUBLE)/n_months) / (CAST(all_c AS DOUBLE)/all_n) * 1000000 + 0.5) AS BIGINT) AS idx_e6 " +
        "FROM g ORDER BY moy"),
    // plain single-window cumulative sum — the decomposition must
    // reproduce it exactly
    "q_sku_abc" ->
      ("WITH p AS (SELECT l_partkey AS pk, CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev FROM lineitem GROUP BY 1), " +
        "t AS (SELECT sum(rev) AS tot FROM p), " +
        "c AS (SELECT pk, rev, sum(rev) OVER (ORDER BY rev DESC, pk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM p), " +
        "k AS (SELECT pk, rev, CASE WHEN cum * 100 <= 70 * (SELECT tot FROM t) THEN 'A' WHEN cum * 100 <= 90 * (SELECT tot FROM t) THEN 'B' ELSE 'C' END AS cls FROM c) " +
        "SELECT cls, CAST(count(*) AS BIGINT) AS n_parts, CAST(sum(rev) AS BIGINT) AS rev_e4, " +
        "CAST(floor(CAST(sum(rev) AS DOUBLE) / (SELECT tot FROM t) * 1000000 + 0.5) AS BIGINT) AS share_e6 " +
        "FROM k GROUP BY 1 ORDER BY 1"),
    "q_revenue_deciles" ->
      ("WITH c AS (SELECT o_custkey AS ck, CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), " +
        "t AS (SELECT sum(rev) AS tot FROM c), " +
        "d AS (SELECT ck, rev, CAST(ntile(10) OVER (ORDER BY rev DESC, ck) AS INT) AS dec FROM c), " +
        "g AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_customers, CAST(sum(rev) AS BIGINT) AS rev_c FROM d GROUP BY 1) " +
        "SELECT dec, n_customers, rev_c, " +
        "CAST(floor(CAST(rev_c AS DOUBLE) / (SELECT tot FROM t) * 1000000 + 0.5) AS BIGINT) AS share_e6, " +
        "CAST(floor(CAST(sum(rev_c) OVER (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / (SELECT tot FROM t) * 1000000 + 0.5) AS BIGINT) AS cum_share_e6 " +
        "FROM g ORDER BY dec"),
    "q_basket_lift" ->
      ("WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem), " +
        "n AS (SELECT count(DISTINCT ok) AS n_orders FROM li), " +
        "it AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_i FROM li GROUP BY 1), " +
        "pr AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_ab " +
        "FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2), " +
        "j AS (SELECT pa, pb, n_ab, ia.n_i AS n_a, ib.n_i AS n_b, " +
        "CAST(floor(CAST(n_ab AS DOUBLE) * (SELECT n_orders FROM n) / (ia.n_i * ib.n_i) * 1000000 + 0.5) AS BIGINT) AS lift_e6 " +
        "FROM pr JOIN it ia ON ia.pk = pa JOIN it ib ON ib.pk = pb WHERE n_ab >= 3) " +
        "SELECT pa, pb, n_ab, n_a, n_b, lift_e6 FROM j ORDER BY lift_e6 DESC, pa, pb LIMIT 20"),
    "q_top_movers" ->
      ("WITH p AS (SELECT l_partkey AS pk, " +
        "CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' THEN CAST(floor(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS cur_e4, " +
        "CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' THEN CAST(floor(l_extendedprice*(1-l_discount)*10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS prev_e4 " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT pk, cur_e4, prev_e4, cur_e4 - prev_e4 AS delta_e4 FROM p " +
        "WHERE cur_e4 > 0 OR prev_e4 > 0 ORDER BY delta_e4 DESC, pk LIMIT 20"),
    // plain single-window ntile — the decomposition must reproduce it bit
    // for bit
    "q_histogram_equidepth" ->
      ("WITH v AS (SELECT CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS c, l_orderkey, l_linenumber FROM lineitem), " +
        "b AS (SELECT c, CAST(ntile(8) OVER (ORDER BY c, l_orderkey, l_linenumber) AS INT) AS bkt FROM v) " +
        "SELECT bkt, CAST(count(*) AS BIGINT) AS n_rows, min(c) AS lo_c, max(c) AS hi_c FROM b GROUP BY 1 ORDER BY 1"),
    "q_vendor_scorecard" ->
      ("SELECT s_suppkey, s_name, " +
        "CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_e4, " +
        "CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts, " +
        "CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(floor(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1000000 + 0.5) AS BIGINT) AS return_rate_e6 " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY 1, 2 ORDER BY 1"),
    "q_discount_waterfall" ->
      ("WITH v AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(floor(l_extendedprice*10000 + 0.5) AS BIGINT) AS gross_e4, " +
        "CAST(floor(l_extendedprice*l_discount*10000 + 0.5) AS BIGINT) AS disc_e4, " +
        "CAST(floor(l_extendedprice*(1.0 - l_discount)*l_tax*10000 + 0.5) AS BIGINT) AS tax_e4 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) " +
        "SELECT o_year, CAST(sum(gross_e4) AS BIGINT) AS gross_e4, CAST(sum(disc_e4) AS BIGINT) AS disc_e4, " +
        "CAST(sum(gross_e4) - sum(disc_e4) AS BIGINT) AS net_e4, CAST(sum(tax_e4) AS BIGINT) AS tax_e4 " +
        "FROM v GROUP BY 1 ORDER BY 1"),
    "q_order_cycle_time" ->
      ("WITH f AS (SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1), " +
        "d AS (SELECT o_orderpriority, CAST(date_diff('day', o_orderdate, first_ship) AS BIGINT) AS days " +
        "FROM orders JOIN f ON o_orderkey = l_orderkey) " +
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, CAST(sum(days) AS BIGINT) AS days_sum, " +
        "CAST(floor(quantile_cont(days, 0.5)*10 + 0.5) AS BIGINT) AS p50_d1, CAST(max(days) AS BIGINT) AS max_days " +
        "FROM d GROUP BY 1 ORDER BY 1"),
    "q_running_backlog" ->
      ("WITH s AS (SELECT o_orderkey, CAST(min(year(o_orderdate)*12 + month(o_orderdate)) AS BIGINT) AS m0, " +
        "CAST(max(year(l_shipdate)*12 + month(l_shipdate)) AS BIGINT) AS m1 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1), " +
        "x AS (SELECT unnest(range(m0, m1 + 1)) AS midx FROM s WHERE m1 >= m0) " +
        "SELECT midx, CAST(count(*) AS BIGINT) AS n_open FROM x GROUP BY 1 ORDER BY 1"),
    "q_outlier_iqr" ->
      ("WITH v AS (SELECT p_brand, CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT) AS u " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey), " +
        "q AS (SELECT p_brand, quantile_cont(u, 0.25) AS q1, quantile_cont(u, 0.75) AS q3 FROM v GROUP BY 1) " +
        "SELECT v.p_brand, CAST(floor(any_value(q1)*10 + 0.5) AS BIGINT) AS q1_d1, " +
        "CAST(floor(any_value(q3)*10 + 0.5) AS BIGINT) AS q3_d1, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN u < q1 - 1.5*(q3 - q1) OR u > q3 + 1.5*(q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM v JOIN q ON v.p_brand = q.p_brand GROUP BY 1 ORDER BY 1"),
    "q_hierarchy_rollup" ->
      ("WITH r AS (SELECT l_partkey AS pk, CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_e4 FROM lineitem GROUP BY 1), " +
        "x AS (SELECT pk, rev_e4, 1 AS level, pk // 10 AS node FROM r " +
        "UNION ALL SELECT pk, rev_e4, 2, pk // 100 FROM r " +
        "UNION ALL SELECT pk, rev_e4, 3, pk // 1000 FROM r) " +
        "SELECT CAST(level AS INT) AS level, node, CAST(count(*) AS BIGINT) AS n_parts, CAST(sum(rev_e4) AS BIGINT) AS rev_e4 " +
        "FROM x GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_proration" ->
      ("WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln, CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS w FROM lineitem GROUP BY 1, 2), " +
        "t AS (SELECT ok, ln, w, sum(w) OVER (PARTITION BY ok) AS bigw FROM li), " +
        "b AS (SELECT ok, ln, w, bigw, bigw // 10 AS pool, (bigw // 10 * w) // bigw AS base, (bigw // 10 * w) % bigw AS frac FROM t), " +
        "c AS (SELECT ok, ln, w, pool, base, frac, pool - sum(base) OVER (PARTITION BY ok) AS rem, " +
        "row_number() OVER (PARTITION BY ok ORDER BY frac DESC, ln) AS rk FROM b) " +
        "SELECT ok, ln, w, CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT) AS alloc_c " +
        "FROM c ORDER BY ok, ln"),
    "q_graph_degree_dist" ->
      ("WITH e AS (SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a, greatest(l1.l_partkey, l2.l_partkey) AS b " +
        "FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey), " +
        "d AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1) " +
        "SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices FROM d GROUP BY 1 ORDER BY 1"),
    "q_graph_linkpred" ->
      ("WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b " +
        "FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "ed AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e), " +
        "cn AS (SELECT w1.d AS a, w2.d AS b, CAST(count(*) AS BIGINT) AS cn " +
        "FROM ed w1 JOIN ed w2 ON w1.s = w2.s AND w1.d < w2.d GROUP BY 1, 2) " +
        "SELECT a, b, cn FROM cn WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b) " +
        "ORDER BY cn DESC, a, b LIMIT 20"),
    "q_cohort_ltv" ->
      ("WITH o AS (SELECT o_custkey AS ck, CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT) AS midx, " +
        "CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS rev_c FROM orders), " +
        "f AS (SELECT ck, min(midx) AS cohort_idx FROM o GROUP BY 1), " +
        "g AS (SELECT cohort_idx, midx - cohort_idx AS age_m, CAST(sum(rev_c) AS BIGINT) AS rev_c, " +
        "CAST(count(DISTINCT o.ck) AS BIGINT) AS n_active FROM o JOIN f ON o.ck = f.ck GROUP BY 1, 2) " +
        "SELECT cohort_idx, age_m, rev_c, n_active, " +
        "CAST(sum(rev_c) OVER (PARTITION BY cohort_idx ORDER BY age_m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_c " +
        "FROM g ORDER BY cohort_idx, age_m"),
    "q_slow_movers" ->
      ("WITH mx AS (SELECT max(l_shipdate) AS mxd FROM lineitem), " +
        "p AS (SELECT l_partkey AS pk, max(l_shipdate) AS last_ship, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty FROM lineitem GROUP BY 1), " +
        "a AS (SELECT pk, CAST(date_diff('day', last_ship, (SELECT mxd FROM mx)) AS BIGINT) AS age_days, qty FROM p), " +
        "b AS (SELECT CASE WHEN age_days <= 90 THEN 'A_0_90' WHEN age_days <= 180 THEN 'B_91_180' " +
        "WHEN age_days <= 365 THEN 'C_181_365' ELSE 'D_365_plus' END AS age_bucket, qty FROM a) " +
        "SELECT age_bucket, CAST(count(*) AS BIGINT) AS n_parts, CAST(sum(qty) AS BIGINT) AS qty_sum " +
        "FROM b GROUP BY 1 ORDER BY 1"),
    "q_price_elasticity" ->
      ("WITH v AS (SELECT l_partkey AS pk, CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT) AS x, CAST(l_quantity AS BIGINT) AS y FROM lineitem), " +
        "g AS (SELECT pk, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx FROM v GROUP BY 1) " +
        "SELECT pk, n, CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * 1000000 + 0.5) AS BIGINT) AS slope_e6 " +
        "FROM g WHERE n >= 20 AND n * sxx - sx * sx <> 0 ORDER BY pk"),
    "q_sku_xyz" ->
      ("WITH m AS (SELECT l_partkey AS pk, date_trunc('month', l_shipdate) AS mo, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM lineitem GROUP BY 1, 2), " +
        "g AS (SELECT pk, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq, CAST(sum(q*q) AS BIGINT) AS sqq FROM m GROUP BY 1), " +
        "c AS (SELECT pk, n * sqq - sq * sq AS num, sq * sq AS den FROM g), " +
        "k AS (SELECT CASE WHEN num * 4 <= den THEN 'X' WHEN num <= den THEN 'Y' ELSE 'Z' END AS xyz FROM c) " +
        "SELECT xyz, CAST(count(*) AS BIGINT) AS n_parts FROM k GROUP BY 1 ORDER BY 1"),
    "q_weighted_median" ->
      ("WITH v AS (SELECT p_brand, CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT) AS price_c, CAST(l_quantity AS BIGINT) AS w " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey), " +
        "c AS (SELECT p_brand, price_c, " +
        "sum(w) OVER (PARTITION BY p_brand ORDER BY price_c RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw, " +
        "sum(w) OVER (PARTITION BY p_brand) AS totw FROM v) " +
        "SELECT p_brand, CAST(min(price_c) AS BIGINT) AS wmedian_c, CAST(max(totw) AS BIGINT) AS tot_qty " +
        "FROM c WHERE cumw * 2 >= totw GROUP BY 1 ORDER BY 1"),
    "q_gini_nation" ->
      ("WITH r AS (SELECT o_custkey AS ck, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c FROM orders GROUP BY 1), " +
        "j AS (SELECT n_name, ck, rev_c, CAST(row_number() OVER (PARTITION BY n_name ORDER BY rev_c, ck) AS BIGINT) AS i " +
        "FROM r JOIN customer ON ck = c_custkey JOIN nation ON c_nationkey = n_nationkey), " +
        "g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers, CAST(sum(rev_c) AS BIGINT) AS tot_c, CAST(sum(i * rev_c) AS BIGINT) AS iwx FROM j GROUP BY 1) " +
        "SELECT n_name, n_customers, tot_c, " +
        "CAST(floor((2.0 * iwx - (n_customers + 1.0) * tot_c) / (CAST(n_customers AS DOUBLE) * tot_c) * 1000000 + 0.5) AS BIGINT) AS gini_e6 " +
        "FROM g ORDER BY n_name")
  )
}
