package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition pruning — the fixture files are single parquet files, so
  * SURVEY.md §4 documents pruning without exercising it; this suite writes a
  * year-partitioned copy of orders (the layout the engine's tables would use
  * at 100 TB) and proves static pruning (direct partition-column filter) and
  * dynamic pruning (the filter arrives through a join) each scan only the
  * matching partition.
  */
class PartitionPruningSpec extends SparkSuite {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  /** Fresh o_year-partitioned copy of sf0.001 orders at `dir`; returns the
    * source frame (with o_year) for expected-count checks. */
  private def writeYearPartitionedOrders(dir: String): DataFrame = {
    val d = new java.io.File(dir)
    if (d.exists()) rm(d)
    val o = Fixtures
      .table(spark, sf001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    o.write.partitionBy("o_year").parquet(dir)
    o
  }

  test("year-partitioned layout prunes non-matching partitions at scan time") {
    val dir = "/tmp/graft-warehouse/orders_by_year"
    val o = writeYearPartitionedOrders(dir)

    val filtered = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val plan = filtered.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"no partition filter in plan:\n$plan")
    // pruned scan reads exactly the 1995 rows; the scan's runtime metrics
    // must show a single file read (one partition directory). inputFiles is
    // NOT usable here — it lists the relation's files before pruning.
    val expected = o.filter(col("o_year") === 1995).count()
    // collect() executes filtered's own QueryExecution (count() would build
    // a separate plan whose metrics we couldn't see)
    assert(filtered.collect().length == expected)
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, "no FileSourceScanExec in plan")
    assert(scan.get.metrics("numFiles").value == 1,
      s"pruned scan read ${scan.get.metrics("numFiles").value} files, expected 1")
  }

  test("cap_dpp: a filtered dim join dynamically prunes fact partitions at runtime") {
    // Dynamic partition pruning: the year predicate reaches the fact scan
    // only THROUGH the join (the filter is on a dim attribute, not on the
    // partition column), so static pruning cannot fire; the optimizer must
    // inject a dynamicpruningexpression that reuses the dim broadcast to
    // prune partitions at runtime — the plan shape that makes dim-filtered
    // fact queries read 1/N of a 100-TB date-partitioned table.
    val dir = "/tmp/graft-warehouse/orders_dpp"
    val o = writeYearPartitionedOrders(dir)

    // The dim must be a REAL source (parquet), not a local Seq: Catalyst
    // folds a Filter over a LocalRelation into the relation itself, and with
    // the Filter node gone the pruning rule sees no selective predicate on
    // the dim side and never injects the DPP subquery.
    val dimDir = "/tmp/graft-warehouse/years_dim"
    val dd = new java.io.File(dimDir)
    if (dd.exists()) rm(dd)
    import spark.implicits._
    (1995 to 2001)
      .map(y => (y, if (y == 1997) "pick" else "skip"))
      .toDF("d_year", "d_label")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val joined = fact.join(dim.filter(col("d_label") === "pick"), col("o_year") === col("d_year"))

    val expected = o.filter(col("o_year") === 1997).count()
    assert(joined.collect().length == expected)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic pruning subquery in the fact scan:\n$plan")

    // the runtime metric seals it: only the 1997 partition directory's file
    // was read (the layout writes one file per partition at this volume).
    // AQE wraps the executed plan in leaf QueryStageExec nodes whose inner
    // plan a plain collectFirst never reaches — unwrap them recursively.
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case other => other.children.flatMap(scans)
      }
    val scan = scans(joined.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("orders_dpp")))
    assert(scan.isDefined, s"no fact FileSourceScanExec in final plan:\n${joined.queryExecution.executedPlan}")
    assert(scan.get.metrics("numFiles").value == 1,
      s"DPP scan read ${scan.get.metrics("numFiles").value} files, expected 1")
  }

  test("t1 smoke: SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
