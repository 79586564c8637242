package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B — projection / filter / expression operators.
  *
  * These are the per-record transform+validate stage of the reference's
  * pipeline (field mapping, record filtering, derived status fields, JSON
  * string → typed column casts), declared as Catalyst expressions so filter
  * pushdown and whole-stage codegen apply.
  */
object Relational {
  private def ntz(d: String) = lit(d).cast("timestamp_ntz")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Derive net price from the TPC-H pricing columns. Output is the value
    // scaled to integer 1e-4 units via floor(x*1e4+0.5): per-row double math
    // is IEEE-identical across engines, so the integer is hash-exact, whereas
    // round() implementations (Spark: decimal-string HALF_UP; DuckDB: binary)
    // disagree on representation-boundary values.
    "q_project_arith" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          floor(
            col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) *
              lit(10000) + lit(0.5)).cast("long").as("net_price_e4"))
        // (l_orderkey, l_linenumber) repeats in the fixture — the third key
        // makes the order a total one (SURVEY §5.4 rule 7; exposed by the
        // generated-data oracle sweep, where file order differs per engine)
        .orderBy("l_orderkey", "l_linenumber", "net_price_e4")
    },
    // Compound predicate: BETWEEN on NTZ dates, IN list, NOT, LIKE, null check.
    "q_filter_pred" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .filter(
          col("l_shipdate").between(ntz("1996-01-01"), ntz("1996-12-31 23:59:59")) &&
            col("l_returnflag").isin("A", "R") &&
            !(col("l_discount") < 0.02) &&
            col("l_extendedprice").isNotNull &&
            col("l_linestatus").like("F%"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },
    // Conditional bucketing: price bands + order-age classes.
    "q_case_when" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high")
            .as("price_band"),
          when(year(col("o_orderdate")) <= 1996, "old").otherwise("recent").as("age_class"))
        .orderBy("o_orderkey")
    },
    // Lossless casts across int/long/string/date. double→int is deliberately
    // absent: Spark truncates, DuckDB rounds — floor() first to stay portable.
    "q_cast_types" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("okey_str"),
          col("o_custkey").cast("int").as("ckey_int"),
          col("o_orderdate").cast("date").cast("string").as("odate_str"),
          floor(col("o_totalprice")).cast("long").as("price_floor"))
        .orderBy("o_orderkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_project_arith" ->
      "SELECT l_orderkey, l_linenumber, CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*10000 + 0.5) AS BIGINT) AS net_price_e4 FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price_e4",
    "q_filter_pred" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59' AND l_returnflag IN ('A','R') AND NOT (l_discount < 0.02) AND l_extendedprice IS NOT NULL AND l_linestatus LIKE 'F%' ORDER BY l_orderkey, l_linenumber",
    "q_case_when" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice < 50000 THEN 'low' WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS price_band, CASE WHEN year(o_orderdate) <= 1996 THEN 'old' ELSE 'recent' END AS age_class FROM orders ORDER BY o_orderkey",
    "q_cast_types" ->
      "SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS okey_str, CAST(o_custkey AS INT) AS ckey_int, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate_str, CAST(floor(o_totalprice) AS BIGINT) AS price_floor FROM orders ORDER BY o_orderkey"
  )
}
