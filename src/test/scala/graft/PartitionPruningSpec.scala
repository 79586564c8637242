package graft

import org.apache.spark.sql.functions._

/** Partition pruning — the fixture files are single parquet files, so
  * SURVEY.md §4 documents pruning without exercising it; this suite writes a
  * year-partitioned copy of orders (the layout the engine's tables would use
  * at 100 TB) and proves a year filter scans only the matching partition.
  */
class PartitionPruningSpec extends SparkSuite {

  test("year-partitioned layout prunes non-matching partitions at scan time") {
    val dir = "/tmp/graft-warehouse/orders_by_year"
    val d = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (d.exists()) rm(d)

    val o = Fixtures
      .table(spark, sf001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    o.write.partitionBy("o_year").parquet(dir)

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

  test("t1 smoke: SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
