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

  test("cap_scan_orc: ORC round-trip preserves rows, types, and predicate pushdown") {
    val src = Fixtures
      .table(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .limit(300)
    val dir = Files.createTempDirectory("graft-orc").toString + "/ord"
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    val a = src.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
    // predicate reaches the ORC scan (pushed filters visible in the plan)
    val plan = back.filter(col("o_totalprice") > 1000.0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"),
      s"no pushed filter in ORC scan plan:\n$plan")
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

  test("builtin statistical aggregates agree with the closed-form oracle query") {
    // q_agg_stats computes stats from exact integer sums; the builtin
    // streaming-moment aggregates must agree to high relative precision.
    val li = Fixtures.table(spark, sf001, "lineitem")
    val builtin = li
      .agg(
        stddev_samp(col("l_quantity")),
        var_samp(col("l_quantity")),
        corr(col("l_quantity"), col("l_extendedprice")))
      .head()
    val n = li.count().toDouble
    val (sx, sxx, sy, sxy) = {
      val r = li
        .agg(
          sum(col("l_quantity")),
          sum(col("l_quantity") * col("l_quantity")),
          sum(col("l_extendedprice")),
          sum(col("l_quantity") * col("l_extendedprice")))
        .head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val varClosed = (n * sxx - sx * sx) / (n * (n - 1))
    assert(math.abs(builtin.getDouble(1) - varClosed) / varClosed < 1e-9)
    assert(math.abs(builtin.getDouble(0) - math.sqrt(varClosed)) / math.sqrt(varClosed) < 1e-9)
    val syy = li.agg(sum(col("l_extendedprice") * col("l_extendedprice"))).head().getDouble(0)
    val corrClosed =
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(builtin.getDouble(2) - corrClosed) < 1e-6)
  }
}
