package graft

import java.nio.file.Files

import graft.sinks.SnapshotTable
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The BATCH `format("snapshot-table")` surface (`cap_batch_format`):
  * `spark.read.format(...)` must resolve to the Catalyst-integrated
  * relation — identical rows to [[SnapshotTable.readVersion]], manifest
  * pruning engaged (the scan's own numFiles metric is the witness) —
  * with `versionAsOf`/`timestampAsOf` time travel, working reads over
  * merge-on-read masks and renamed columns via the PrunedFilteredScan
  * fallback, and `df.write.format(...)` SaveModes routing onto the
  * transactional create/append/overwrite operators. */
class SnapshotFormatSpec extends SparkSuite {

  private def freshRoot(): String = Files.createTempDirectory("graft-fmt").toString

  private def readFmt(root: String, opts: (String, String)*): DataFrame =
    opts
      .foldLeft(spark.read.format("snapshot-table"))((r, kv) => r.option(kv._1, kv._2))
      .load(root)

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

  /** 0..999 k-clustered in 8 files. */
  private def builtRoot(): String = {
    val root = freshRoot()
    SnapshotTable.create(
      spark,
      root,
      spark.range(1000).selectExpr("id AS k", "CAST(id * 3 AS DOUBLE) AS x"))
    SnapshotTable.compact(spark, root, "k", nFiles = 8)
    root
  }

  test("format read == readVersion; manifest pruning engages through the format") {
    val root = builtRoot()
    val df = readFmt(root)
    val expect = SnapshotTable.relation(spark, root)
    assert(df.orderBy("k").collect().toSeq == expect.orderBy("k").collect().toSeq)
    assert(scannedFiles(df) == 8, "unfiltered format scan reads everything")
    val q = df.filter("k >= 100 AND k <= 220")
    assert(q.count() == 121)
    assert(scannedFiles(q) <= 2, "pushed range must prune through the manifest FileIndex")
  }

  test("versionAsOf / timestampAsOf options time-travel; bad combinations refused") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, spark.range(10).selectExpr("id AS k"))
    // publish times are wall-clock millis: keep v2 strictly later than v1
    Thread.sleep(5)
    SnapshotTable.append(spark, root, spark.range(10, 30).selectExpr("id AS k"))
    assert(readFmt(root).count() == 30)
    assert(readFmt(root, "versionAsOf" -> "1").count() == 10)
    val t1 = SnapshotTable.readManifest(spark, root, 1).ts
    assert(readFmt(root, "timestampAsOf" -> t1.toString).count() == 10)
    val lit = new java.sql.Timestamp(t1).toString // "yyyy-MM-dd HH:mm:ss.f"
    assert(readFmt(root, "timestampAsOf" -> lit).count() == 10)
    intercept[RuntimeException](
      readFmt(root, "versionAsOf" -> "1", "timestampAsOf" -> t1.toString).count())
    intercept[RuntimeException](readFmt(root, "versionAsOf" -> "9").count())
    intercept[RuntimeException](readFmt(freshRoot()).count())
  }

  test("merge-on-read masks and renamed columns read through the format fallback") {
    val root = builtRoot()
    SnapshotTable.deleteWhereMor(
      spark,
      root,
      Seq(SnapshotTable.Bound("k", Some(300L), Some(499L))))
    // masks pending → the provider serves the PrunedFilteredScan fallback
    val df = readFmt(root)
    assert(df.count() == 800)
    assert(df.filter("k >= 250 AND k < 350").count() == 50, "pushed filter over masked scan")
    assert(
      df.orderBy("k").collect().toSeq ==
        SnapshotTable.relation(spark, root).orderBy("k").collect().toSeq)
    // column mapping: rename k -> kk, then the format serves logical names
    SnapshotTable.compact(spark, root, "k", nFiles = 4) // reconcile masks first
    SnapshotTable.renameColumn(spark, root, "k", "kk")
    val renamed = readFmt(root)
    assert(renamed.columns.toSeq == Seq("kk", "x"))
    assert(renamed.filter("kk < 100").count() == 100)
  }

  test("write SaveModes route onto the transactional operators") {
    val root = freshRoot()
    val d1 = spark.range(10).selectExpr("id AS k")
    d1.write.format("snapshot-table").mode(SaveMode.ErrorIfExists).save(root)
    assert(SnapshotTable.latestVersion(spark, root).contains(1))
    intercept[RuntimeException](
      d1.write.format("snapshot-table").mode(SaveMode.ErrorIfExists).save(root))
    // Ignore: existing table untouched
    spark.range(99).selectExpr("id AS k").write
      .format("snapshot-table").mode(SaveMode.Ignore).save(root)
    assert(SnapshotTable.latestVersion(spark, root).contains(1))
    assert(readFmt(root).count() == 10)
    // Append: a real commit
    spark.range(10, 25).selectExpr("id AS k").write
      .format("snapshot-table").mode(SaveMode.Append).save(root)
    assert(SnapshotTable.latestVersion(spark, root).contains(2))
    assert(readFmt(root).count() == 25)
    // Overwrite: replaces, history retained (v1 still time-travels)
    spark.range(7).selectExpr("id AS k").write
      .format("snapshot-table").mode(SaveMode.Overwrite).save(root)
    assert(readFmt(root).count() == 7)
    assert(readFmt(root, "versionAsOf" -> "1").count() == 10)
    // time-travel options are read-only
    intercept[IllegalArgumentException](
      d1.write.format("snapshot-table").mode(SaveMode.Append)
        .option("versionAsOf", "1").save(root))
  }
}
