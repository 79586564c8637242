package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** cap_scan_csv + cap_agg_approx (SURVEY.md §2.A / §2.D). */
class CapabilitiesSpec extends SparkSuite {

  test("cap_scan_csv: declared-schema CSV round-trip preserves rows and types") {
    val src = Fixtures
      .table(spark, sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
      .limit(200)
    val dir = Files.createTempDirectory("graft-csv").toString + "/li"
    src.write.option("header", "true").csv(dir)
    val back = spark.read
      .schema(src.schema)
      .option("header", "true")
      .csv(dir)
    assert(back.schema == src.schema)
    val a = src.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val b = back.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(a == b)
  }

  test("cap_agg_approx: HLL++ distinct and approx percentile within bounds") {
    val li = Fixtures.table(spark, sf001, "lineitem")
    val exactDistinct =
      li.select(countDistinct("l_partkey")).head().getLong(0).toDouble
    val approxDistinct =
      li.select(approx_count_distinct("l_partkey")).head().getLong(0).toDouble
    assert(math.abs(approxDistinct - exactDistinct) / exactDistinct < 0.05,
      s"HLL off by >5%: exact=$exactDistinct approx=$approxDistinct")

    val exactMedian = li
      .select(expr("percentile(l_extendedprice, 0.5)"))
      .head()
      .getDouble(0)
    val approxMedian = li
      .select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head()
      .getDouble(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.01,
      s"approx median off by >1%: exact=$exactMedian approx=$approxMedian")
  }
}
