package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.F — sort, limit, and set operations.
  *
  * Catalyst rewrites intersect/except to semi/anti joins and fuses the
  * sort+limit of q_limit_topk into TakeOrderedAndProject (no global sort) —
  * the shape that matters at scale: top-k is per-partition heap + driver
  * merge, not a full shuffle sort.
  */
object SortSetOps {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-key sort, mixed asc/desc, with a synthesized null (fixtures are
    // null-free) to exercise NULLS FIRST ordering. bal_bucket uses floor()
    // (IEEE-stable) rather than round().
    "q_sort_multi" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "customer")
        .select(
          col("c_custkey"),
          col("c_mktsegment"),
          expr("nullif(cast(floor(c_acctbal / 1000) AS BIGINT), 0)").as("bal_bucket"))
        .orderBy(col("c_mktsegment").desc, col("bal_bucket").asc_nulls_first, col("c_custkey"))
    },
    // Global top-k without a total sort (TakeOrderedAndProjectExec).
    "q_limit_topk" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    // Bag union of two disjoint year slices.
    "q_union_all" -> { (s, dir) =>
      val o = Fixtures.table(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select("o_orderkey", "o_orderstatus")
      val b = o.filter(year(col("o_orderdate")) === 1997).select("o_orderkey", "o_orderstatus")
      a.union(b).orderBy("o_orderkey")
    },
    // Set union of two overlapping slices.
    "q_union_distinct" -> { (s, dir) =>
      val o = Fixtures.table(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select("o_orderkey")
      val b = o.filter(col("o_totalprice") > 100000).select("o_orderkey")
      a.union(b).distinct().orderBy("o_orderkey")
    },
    // Key sets present in both years (rewritten to semi join by Catalyst).
    "q_intersect" -> { (s, dir) =>
      val o = Fixtures.table(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val b = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      a.intersect(b).orderBy("o_custkey")
    },
    // Key set difference (rewritten to anti join).
    "q_except" -> { (s, dir) =>
      val o = Fixtures.table(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val b = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      a.except(b).orderBy("o_custkey")
    },
    // Unpivot/melt: wide numeric columns → long (metric, value) rows — the
    // inverse of q_agg_pivot. Values scaled to e4 ints so the hash-compare
    // is exact. Map-only Expand at scale: no shuffle.
    "q_unpivot" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          floor(col("l_quantity") * 1e4 + lit(0.5)).cast("long").as("l_quantity"),
          floor(col("l_extendedprice") * 1e4 + lit(0.5)).cast("long").as("l_extendedprice"),
          floor(col("l_discount") * 1e4 + lit(0.5)).cast("long").as("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric",
          "value_e4")
        // (l_orderkey, l_linenumber) repeats, so two lines emit the same
        // metric names — value_e4 completes the total order (SURVEY §5.4.7)
        .orderBy("l_orderkey", "l_linenumber", "metric", "value_e4")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multi" ->
      "SELECT c_custkey, c_mktsegment, nullif(CAST(floor(c_acctbal / 1000) AS BIGINT), 0) AS bal_bucket FROM customer ORDER BY c_mktsegment DESC, bal_bucket ASC NULLS FIRST, c_custkey",
    "q_limit_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "q_union_all" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE year(o_orderdate) = 1995 UNION ALL SELECT o_orderkey, o_orderstatus FROM orders WHERE year(o_orderdate) = 1997 ORDER BY o_orderkey",
    "q_union_distinct" ->
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' UNION SELECT o_orderkey FROM orders WHERE o_totalprice > 100000 ORDER BY o_orderkey",
    "q_intersect" ->
      "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 INTERSECT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 ORDER BY o_custkey",
    "q_except" ->
      "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 EXCEPT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 ORDER BY o_custkey",
    // UNION ALL formulation rather than DuckDB's UNPIVOT syntax: identical
    // semantics, no dialect risk on metric-name ordering.
    "q_unpivot" ->
      ("WITH t AS (SELECT l_orderkey, l_linenumber, CAST(floor(l_quantity*10000+0.5) AS BIGINT) AS q, CAST(floor(l_extendedprice*10000+0.5) AS BIGINT) AS ep, CAST(floor(l_discount*10000+0.5) AS BIGINT) AS d FROM lineitem WHERE l_orderkey < 100) " +
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, q AS value_e4 FROM t UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', ep FROM t UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', d FROM t ORDER BY l_orderkey, l_linenumber, metric, value_e4")
  )
}
