package graft

import java.nio.file.Files

import graft.sinks.{SnapshotSql, SnapshotTable}
import org.apache.spark.sql.DataFrame

/** The SQL-text DML router: statement → the same transactional operators
  * the programmatic API runs, with identical results and identical
  * copy-on-write economics for exactly-translatable conditions. */
class SnapshotSqlSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String = Files.createTempDirectory("graft-snapsql").toString

  private def fixture(n: Int): DataFrame =
    spark.range(n.toLong).selectExpr(
      "id AS k",
      "date_add(DATE'1995-01-01', CAST(id % 1000 AS INT)) AS d",
      "(id * 7) % 1000 AS price_c")

  private def sorted(df: DataFrame): Seq[Row] = df.orderBy("k").collect().toSeq
  private type Row = org.apache.spark.sql.Row

  test("SQL DELETE/UPDATE/MERGE cycle equals the programmatic cycle row-for-row") {
    val sqlRoot = freshRoot()
    val apiRoot = freshRoot()
    val src = fixture(2000)
    SnapshotTable.create(spark, sqlRoot, src)
    SnapshotTable.create(spark, apiRoot, src)

    // programmatic cycle
    SnapshotTable.deleteWhere(
      spark, apiRoot,
      Seq(SnapshotTable.Bound("d", Some("1995-06-01"), Some("1995-12-31"))))
    SnapshotTable.updateWhere(
      spark, apiRoot,
      Seq(SnapshotTable.Bound("k", Some(100L), Some(400L))),
      Map("price_c" -> (org.apache.spark.sql.functions.col("price_c") + 500)))
    val upsert = src.filter("k % 7 = 0").withColumn(
      "price_c", org.apache.spark.sql.functions.col("price_c") * 2)
    SnapshotTable.mergeUpsert(spark, apiRoot, upsert, Seq("k"))

    // SQL cycle — same algebra through text
    SnapshotSql.register(spark, "snap", sqlRoot)
    upsert.createOrReplaceTempView("upsert_src")
    SnapshotSql.execute(spark,
      "DELETE FROM snap WHERE d BETWEEN DATE'1995-06-01' AND DATE'1995-12-31'")
    SnapshotSql.execute(spark,
      "UPDATE snap SET price_c = price_c + 500 WHERE k >= 100 AND k <= 400")
    SnapshotSql.execute(spark,
      "MERGE INTO snap AS t USING upsert_src AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")

    assert(sorted(SnapshotTable.read(spark, sqlRoot)) == sorted(SnapshotTable.read(spark, apiRoot)))
    // the exact translation rides the SAME fast paths: both logs carry the
    // same action sequence and the same per-commit net row deltas
    def log(r: String) = SnapshotTable.history(spark, r).map(c => (c.action, c.addedRows))
    assert(log(sqlRoot) == log(apiRoot), s"${log(sqlRoot)} vs ${log(apiRoot)}")
  }

  test("strict comparisons and non-range conditions execute exactly (widened pruning, true row filter)") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(1000))
    SnapshotSql.register(spark, "snap2", root)
    // strict > : not expressible as an inclusive Bound — the k=500 row must SURVIVE
    SnapshotSql.execute(spark, "DELETE FROM snap2 WHERE k > 500")
    assert(SnapshotTable.read(spark, root).count() == 501)
    assert(SnapshotTable.read(spark, root).filter("k = 500").count() == 1)
    // non-range condition (modulus): no pruning possible, still exact
    SnapshotSql.execute(spark, "DELETE FROM snap2 WHERE k % 10 = 3")
    assert(SnapshotTable.read(spark, root).filter("k % 10 = 3").count() == 0)
    assert(SnapshotTable.read(spark, root).count() == 501 - 50)
    // UPDATE through a strict range: only rows with k < 10 change
    SnapshotSql.execute(spark, "UPDATE snap2 SET price_c = 0 WHERE k < 10")
    assert(SnapshotTable.read(spark, root).filter("price_c = 0 AND k < 10").count() == 9)
    assert(SnapshotTable.read(spark, root).filter("k >= 10 AND price_c = 0").count() ==
      SnapshotTable.readVersion(spark, root, 3).filter("k >= 10 AND price_c = 0").count())
  }

  test("pruning still engages for SQL DML on a clustered table") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(4000))
    SnapshotTable.compact(spark, root, "d", nFiles = 8)
    SnapshotSql.register(spark, "snap3", root)
    val before = SnapshotTable.history(spark, root).last.files.map(_.path).toSet
    SnapshotSql.execute(spark,
      "DELETE FROM snap3 WHERE d BETWEEN DATE'1995-02-01' AND DATE'1995-03-31'")
    val after = SnapshotTable.history(spark, root).last
    // most clustered files carry forward untouched (same paths)
    val carried = after.files.map(_.path).toSet.intersect(before)
    assert(carried.size >= 5, s"only boundary files should rewrite: carried=${carried.size} of 8")
  }

  test("morWrites registration routes SQL DML onto merge-on-read with identical results") {
    val morRoot = freshRoot()
    val cowRoot = freshRoot()
    val src = fixture(2000)
    SnapshotTable.create(spark, morRoot,
      src.repartitionByRange(8, org.apache.spark.sql.functions.col("k")).sortWithinPartitions("k"))
    SnapshotTable.create(spark, cowRoot,
      src.repartitionByRange(8, org.apache.spark.sql.functions.col("k")).sortWithinPartitions("k"))
    SnapshotSql.register(spark, "snap_mor", morRoot, morWrites = true)
    SnapshotSql.register(spark, "snap_cow2", cowRoot)
    fixture(2000).filter("k % 97 = 0").selectExpr("k", "d", "price_c + 9 AS price_c")
      .createOrReplaceTempView("mor_src")
    val filesBefore = SnapshotTable.history(spark, morRoot).last.files.map(_.path).toSet
    for (t <- Seq("snap_mor", "snap_cow2")) {
      SnapshotSql.execute(spark,
        s"MERGE INTO $t AS x USING mor_src AS s ON x.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      SnapshotSql.execute(spark, s"DELETE FROM $t WHERE k BETWEEN 500 AND 700")
    }
    assert(sorted(SnapshotTable.read(spark, morRoot)) == sorted(SnapshotTable.read(spark, cowRoot)))
    // the mor table's merge rewrote NOTHING and its commits are mor-typed
    val h = SnapshotTable.history(spark, morRoot)
    assert(h.map(_.action).takeRight(2) == Seq("mor-merge", "mor-delete"), h.map(_.action))
    val afterMerge = h.find(_.action == "mor-merge").get
    assert(filesBefore.subsetOf(afterMerge.files.map(_.path).toSet),
      "morWrites MERGE must not rewrite target files")
    // non-range delete on a morWrites table falls back to COW, still exact
    SnapshotSql.execute(spark, "DELETE FROM snap_mor WHERE k % 10 = 1")
    SnapshotSql.execute(spark, "DELETE FROM snap_cow2 WHERE k % 10 = 1")
    assert(sorted(SnapshotTable.read(spark, morRoot)) == sorted(SnapshotTable.read(spark, cowRoot)))
  }

  test("refusals: unregistered targets, non-DML text, unsupported merge shapes") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(10))
    val e1 = intercept[RuntimeException] {
      SnapshotSql.execute(spark, "DELETE FROM not_registered WHERE k = 1")
    }
    assert(e1.getMessage.contains("not a registered snapshot table"), e1.getMessage)
    SnapshotSql.register(spark, "snap4", root)
    val e2 = intercept[RuntimeException] {
      SnapshotSql.execute(spark, "SELECT * FROM snap4")
    }
    assert(e2.getMessage.contains("not a DML statement"), e2.getMessage)
    fixture(5).createOrReplaceTempView("msrc")
    val e3 = intercept[IllegalArgumentException] {
      SnapshotSql.execute(spark,
        "MERGE INTO snap4 AS t USING msrc AS s ON t.k = s.k " +
          "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e3.getMessage.contains("canonical form"), e3.getMessage)
    val e4 = intercept[RuntimeException] {
      SnapshotSql.execute(spark, "UPDATE snap4 SET price_c = 0")
    }
    assert(e4.getMessage.contains("whole table"), e4.getMessage)
    // nothing committed by any refusal
    assert(SnapshotTable.latestVersion(spark, root).contains(1))
  }
}
