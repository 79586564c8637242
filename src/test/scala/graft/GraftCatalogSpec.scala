package graft

import java.nio.file.Files

import graft.sinks.SnapshotTable
import graft.sinks.SnapshotTable.Bound
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The SQL catalog (SURVEY §2.J `cap_catalog`): snapshot tables reachable
  * from PLAIN SQL — `graft.ns.t` identifiers map to warehouse paths, the
  * manifest log is the metadata (stateless catalog, no metastore), reads
  * plan the pruned DSv2 batches, writes and DDL route onto the
  * transactional / metadata-only operators. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private val wh = Files.createTempDirectory("graft-wh").toString
  spark.conf.set("spark.sql.catalog.gtest", classOf[graft.sinks.GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)

  private def clustered(n: Int, files: Int) =
    spark
      .range(n.toLong)
      .selectExpr("id AS k", "concat('v', id) AS s")
      .repartitionByRange(files, org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k")

  test("plain-SQL reads resolve through the catalog with pruned DSv2 scans; refs and time travel work") {
    SnapshotTable.create(spark, wh + "/sales/orders", clustered(1000, 8)) // v1
    SnapshotTable.deleteWhere(spark, wh + "/sales/orders", Seq(Bound("k", Some(0L), Some(99L)))) // v2
    SnapshotTable.createTag(spark, wh + "/sales/orders", "golden", Some(1))
    val dev = SnapshotTable.createBranch(spark, wh + "/sales/orders", "dev")
    SnapshotTable.append(spark, dev, clustered(100, 1).selectExpr("k + 5000 AS k", "s"))

    assert(spark.sql("SELECT count(*) AS n FROM gtest.sales.orders").head.getLong(0) == 900)
    // the plan is the native DSv2 batch, and pushdown prunes partitions
    val df = spark.sql("SELECT * FROM gtest.sales.orders WHERE k > 874")
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.size == 1, s"catalog read must prune to 1 file, got ${scan.inputPartitions.size}")
    assert(df.count() == 125)
    // VERSION AS OF: number, tag, branch tip
    assert(spark.sql("SELECT count(*) AS n FROM gtest.sales.orders VERSION AS OF 1").head.getLong(0) == 1000)
    assert(spark.sql("SELECT count(*) AS n FROM gtest.sales.orders VERSION AS OF 'golden'").head.getLong(0) == 1000)
    assert(spark.sql("SELECT count(*) AS n FROM gtest.sales.orders VERSION AS OF 'dev'").head.getLong(0) == 1000)
    // TIMESTAMP AS OF after every commit resolves the latest version
    val after = new java.sql.Timestamp(System.currentTimeMillis() + 3600000L)
    assert(spark.sql(s"SELECT count(*) AS n FROM gtest.sales.orders TIMESTAMP AS OF '$after'").head.getLong(0) == 900)
    // SHOW TABLES sees exactly the snapshot tables in the namespace
    val listed = spark.sql("SHOW TABLES IN gtest.sales").select("tableName").as[String].collect().toSet
    assert(listed == Set("orders"), listed.toString)
  }

  test("namespaces are warehouse directories: SHOW/CREATE/DROP NAMESPACE, stateless metadata") {
    spark.sql("CREATE NAMESPACE gtest.staging")
    val nss = spark.sql("SHOW NAMESPACES IN gtest").select("namespace").collect().map(_.getString(0)).toSet
    assert(nss.contains("staging"), nss.toString)
    // a table root is a TABLE, never listed as a namespace
    SnapshotTable.create(spark, wh + "/staging/t", clustered(5, 1))
    assert(!spark.sql("SHOW NAMESPACES IN gtest.staging").collect().map(_.getString(0)).contains("t"))
    assert(spark.sql("SHOW TABLES IN gtest.staging").select("tableName").as[String].collect().toSeq == Seq("t"))
    // a table root is never a namespace CONTEXT either: listing inside it
    // refuses (no phantom data/_manifests "namespaces"), and creating a
    // namespace under it refuses
    assert(intercept[Exception](spark.sql("SHOW NAMESPACES IN gtest.staging.t").collect())
      .getMessage.nonEmpty)
    assert(intercept[Exception](spark.sql("CREATE NAMESPACE gtest.staging.t.x"))
      .getMessage.contains("TABLE"))
    // a non-empty namespace refuses a plain drop; CASCADE takes the tree
    assert(intercept[Exception](spark.sql("DROP NAMESPACE gtest.staging")).getMessage.nonEmpty)
    spark.sql("DROP NAMESPACE gtest.staging CASCADE")
    assert(!new java.io.File(wh + "/staging").exists())
  }

  test("INSERT INTO / OVERWRITE are transactional commits; CTAS, ALTER and DROP route onto the operators") {
    val root = wh + "/etl/t1"
    SnapshotTable.create(spark, root, clustered(10, 1))
    // INSERT INTO = ONE append commit
    spark.sql("INSERT INTO gtest.etl.t1 SELECT id + 100 AS k, concat('w', id) AS s FROM range(5)")
    assert(SnapshotTable.history(spark, root).last.action == "append")
    assert(spark.sql("SELECT count(*) AS n FROM gtest.etl.t1").head.getLong(0) == 15)
    // INSERT OVERWRITE = ONE overwrite commit; history survives
    spark.sql("INSERT OVERWRITE gtest.etl.t1 SELECT id AS k, concat('o', id) AS s FROM range(3)")
    assert(SnapshotTable.history(spark, root).last.action == "overwrite")
    assert(spark.sql("SELECT count(*) AS n FROM gtest.etl.t1").head.getLong(0) == 3)
    assert(spark.sql("SELECT count(*) AS n FROM gtest.etl.t1 VERSION AS OF 2").head.getLong(0) == 15)

    // CTAS: empty v1 with the declared schema, then the query appends
    spark.sql("CREATE TABLE gtest.etl.t2 AS SELECT k, s FROM gtest.etl.t1 WHERE k < 2")
    assert(spark.sql("SELECT count(*) AS n FROM gtest.etl.t2").head.getLong(0) == 2)
    assert(SnapshotTable.read(spark, wh + "/etl/t2").columns.toSeq == Seq("k", "s"))
    // duplicate create refuses
    assert(intercept[Exception](
      spark.sql("CREATE TABLE gtest.etl.t2 (k BIGINT) USING graft")).getMessage.nonEmpty)

    // ALTER TABLE column DDL = metadata-only commits
    spark.sql("ALTER TABLE gtest.etl.t2 ADD COLUMN note STRING")
    spark.sql("ALTER TABLE gtest.etl.t2 RENAME COLUMN s TO label")
    assert(spark.sql("SELECT * FROM gtest.etl.t2").columns.toSeq == Seq("k", "label", "note"))
    spark.sql("ALTER TABLE gtest.etl.t2 DROP COLUMN note")
    assert(spark.sql("SELECT * FROM gtest.etl.t2").columns.toSeq == Seq("k", "label"))
    assert(spark.sql("SELECT label FROM gtest.etl.t2 WHERE k = 1").head.getString(0) == "o1")

    // the DataFrame API reaches the same tables: read.table + writeTo
    assert(spark.read.table("gtest.etl.t1").count() == 3)
    spark.range(3).selectExpr("id + 500 AS k", "concat('a', id) AS label")
      .writeTo("gtest.etl.t2").append()
    assert(SnapshotTable.history(spark, wh + "/etl/t2").last.action == "append")
    assert(spark.table("gtest.etl.t2").count() == 5)

    // DROP TABLE removes the tree; reads then refuse
    spark.sql("DROP TABLE gtest.etl.t2")
    assert(intercept[Exception](spark.sql("SELECT * FROM gtest.etl.t2").collect()).getMessage.nonEmpty)
    assert(!new java.io.File(wh + "/etl/t2").exists())
  }
}
