package graft

import java.nio.file.Files

import graft.sinks.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Catalyst-integrated snapshot reads ([[graft.sinks.SnapshotFileIndex]]):
  * plain `.filter(...)` / SQL predicates over `SnapshotTable.relation`
  * must (a) return exactly what a full read + filter returns, and (b)
  * actually skip files through the manifest stats at PLANNING time — the
  * scan's own `numFiles` metric is the witness, so these cases prove
  * Spark really handed our FileIndex the pushed-down filters rather than
  * listing everything. */
class SnapshotCatalystSpec extends SparkSuite {

  private def freshRoot(): String = Files.createTempDirectory("graft-cata").toString

  /** Execute and report how many files the parquet scan(s) actually read. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans =
      plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }.flatMap(_.collect {
        case f: FileSourceScanExec => f
      }) ++ plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** 0..999 k-clustered in 8 files; tag is 71+ chars (bloom-only territory);
    * x is null on the upper half. */
  private def builtRoot(): String = {
    val root = freshRoot()
    SnapshotTable.create(
      spark,
      root,
      spark
        .range(1000)
        .selectExpr(
          "id AS k",
          "concat(repeat('x', 70), CAST(id DIV 125 AS STRING)) AS tag",
          "CASE WHEN id < 500 THEN CAST(id AS DOUBLE) END AS x",
          "concat('p', lpad(CAST(id AS STRING), 4, '0')) AS s"))
    SnapshotTable.compact(spark, root, "k", nFiles = 8)
    root
  }

  test("range filter over relation(): exact result, files pruned at plan time") {
    val root = builtRoot()
    val df = SnapshotTable.relation(spark, root)
    assert(scannedFiles(df) == 8, "unfiltered scan reads everything")
    val q = df.filter("k >= 100 AND k <= 220")
    assert(q.count() == 121)
    assert(scannedFiles(q) <= 2, "the two straddled files only")
    // strict comparisons translate too
    assert(scannedFiles(df.filter("k > 874")) == 1)
    assert(df.filter("k > 874").count() == 125)
    // result identity with the full read
    val full = SnapshotTable.read(spark, root).filter("k >= 100 AND k <= 220")
    assert(
      q.orderBy("k").collect().toSeq == full.orderBy("k").collect().toSeq,
      "relation filter diverges from read+filter")
  }

  test("SQL over a registered view: bloom equality prunes a 71-char string probe") {
    val root = builtRoot()
    SnapshotTable.relation(spark, root).createOrReplaceTempView("snap_cata")
    val probe = "x" * 70 + "3"
    val q = spark.sql(s"SELECT count(*) AS n FROM snap_cata WHERE tag = '$probe'")
    assert(q.collect()(0).getLong(0) == 125)
    val scan = spark.sql(s"SELECT * FROM snap_cata WHERE tag = '$probe'")
    assert(scannedFiles(scan) <= 2, "bloom should keep ~1 file for the point lookup")
    // absent value: zero files at planning time
    val none = spark.sql(s"SELECT * FROM snap_cata WHERE tag = '${"x" * 70}zz'")
    assert(none.count() == 0)
  }

  test("IS NULL / IS NOT NULL prune via non-null counts; OR and IN stay conservative-exact") {
    val root = builtRoot()
    val df = SnapshotTable.relation(spark, root)
    // x null on k >= 500: the 4 upper files have nn=0, the 4 lower nn=rows
    assert(df.filter("x IS NULL").count() == 500)
    assert(scannedFiles(df.filter("x IS NULL")) <= 4)
    assert(df.filter("x IS NOT NULL").count() == 500)
    assert(scannedFiles(df.filter("x IS NOT NULL")) <= 4)
    // OR: dead only when BOTH sides dead
    val or = df.filter("k < 100 OR k > 900")
    assert(or.count() == 199)
    assert(scannedFiles(or) <= 2)
    // IN: every value dead -> file dead
    val in = df.filter("k IN (3, 7, 430)")
    assert(in.count() == 3)
    assert(scannedFiles(in) <= 2)
  }

  test("startsWith prunes on range-clustered strings") {
    val root = builtRoot()
    val df = SnapshotTable.relation(spark, root)
    // s = 'p0000'..'p0999' clusters with k; prefix 'p03' lives in ~1 file
    val q = df.filter("s LIKE 'p03%'")
    assert(q.count() == 100)
    assert(scannedFiles(q) <= 2, "prefix range should prune the other files")
  }

  test("schema evolution: relation reads evolved columns and filters on them correctly") {
    val root = builtRoot()
    SnapshotTable.append(
      spark,
      root,
      spark.range(2000, 2010).selectExpr(
        "id AS k",
        "'t' AS tag",
        "CAST(1.0 AS DOUBLE) AS x",
        "'pz' AS s",
        "id * 2 AS extra"))
    val df = SnapshotTable.relation(spark, root)
    assert(df.columns.contains("extra"))
    // old files read extra as null; the filter stays exact AND the old
    // files are prunable via nn=0 once their stats say the column is absent
    assert(df.filter("extra >= 4000").count() == 10)
    assert(df.filter("extra IS NULL").count() == 1000)
  }

  test("DML-carried manifests serve the relation: file-granular entries resolve") {
    val root = builtRoot()
    SnapshotTable.deleteWhere(spark, root, Seq(SnapshotTable.Bound("k", Some(100L), Some(220L))))
    val df = SnapshotTable.relation(spark, root)
    assert(df.count() == 879)
    val q = df.filter("k <= 300")
    assert(q.count() == 180)
    assert(scannedFiles(q) <= 3)
  }
}
