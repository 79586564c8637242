package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.A — source-side operators.
  *
  * The reference's capability surface here is "fetch the full dataset",
  * "parse semi-structured API payloads", and "load only records not already
  * loaded" — re-expressed as columnar parquet scan, from_json/get_json_object
  * over the events.props payload column, and a left-anti incremental join.
  */
object Sources {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Columnar scan + projection + summary. Projection list is 2 columns so
    // the vectorized parquet reader prunes the other 9 (check ReadSchema).
    "q_scan_parquet" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          // Exact integer cents: double sums are summation-order-dependent
          // (shuffle layout varies with core count), integer sums are not.
          sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")).as("sum_price_c"))
        .orderBy("l_returnflag")
    },
    // Semi-structured payload parsing: events.props is a JSON string
    // '{"k": <int>}' — extract the typed field and summarize.
    "q_scan_schema_json" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    },
    // Incremental load: records whose synthetic UPC is not in the already-
    // loaded key set (here: every third part) survive the left-anti join.
    "q_etl_incremental" -> { (s, dir) =>
      val part = Fixtures
        .table(s, dir, "part")
        .withColumn("upc", lpad(col("p_partkey").cast("string"), 12, "0"))
      val loaded = part.filter(col("p_partkey") % 3 === 0).select("upc")
      part
        .join(loaded, Seq("upc"), "left_anti")
        .select("upc", "p_name")
        .orderBy("upc")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      "SELECT l_returnflag, count(*) AS n_rows, CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_scan_schema_json" ->
      "SELECT CAST(json_extract_string(props,'$.k') AS INT) AS k, count(*) AS n FROM events GROUP BY 1 ORDER BY k",
    "q_etl_incremental" ->
      "SELECT lpad(CAST(p_partkey AS VARCHAR),12,'0') AS upc, p_name FROM part WHERE (p_partkey % 3) <> 0 ORDER BY upc"
  )
}
