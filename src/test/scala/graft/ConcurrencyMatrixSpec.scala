package graft

import java.nio.file.Files

import graft.sinks.{CommitStore, HadoopCommitStore, SnapshotTable}
import graft.sinks.SnapshotTable.Bound
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** The ISOLATION CONTRACT as a full conflict matrix (SURVEY §2.J
  * `cap_conflict_matrix`) — which of two interleaved writers commits,
  * which retries, and which surfaces [[SnapshotTable.ConcurrentCommitException]]
  * for the caller to re-derive:
  *
  *   - append vs append: NEVER a real conflict (Delta's rule) — the loser
  *     auto-retries against the new latest and both land;
  *   - append losing to a DML publish: still auto-retries (its immutable
  *     dir carries no dependence on the base it read);
  *   - DML losing to ANY interleaved commit — append, or another DML even
  *     on provably DISJOINT keys: surfaces loudly. The OCC token is the
  *     VERSION, not a key range: a replacing commit's output was derived
  *     from the base it read, and a blind retry could silently drop the
  *     racer's rows. Disjoint-key DML/DML is therefore a spurious-but-SAFE
  *     conflict by design — the caller re-runs and succeeds;
  *   - overwrite behaves like DML (its output replaces the base it read).
  *
  * Interleavings are DETERMINISTIC: a [[CommitStore]] wrapper runs the
  * competing operation immediately before the victim's manifest
  * put-if-absent, so the victim always publishes second — the exact
  * window the optimistic protocol arbitrates. */
class ConcurrencyMatrixSpec extends SparkSuite {

  private def freshRoot(): String = Files.createTempDirectory("graft-ccm").toString

  private def fixture(from: Int, n: Int): DataFrame =
    spark.range(from.toLong, (from + n).toLong).selectExpr("id AS k", "concat('v', id) AS s")

  /** Runs `compete` once, right before the next MANIFEST publish (ref/tag
    * metadata and later publishes pass through untouched). */
  private final class RaceOnce(compete: () => Unit) extends CommitStore {
    private val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    override def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit = {
      if (path.getName.matches("v\\d{8}\\.json") && armed.getAndSet(false)) compete()
      HadoopCommitStore.putIfAbsent(fs, path, bytes)
    }
  }

  private def withRace[T](compete: () => Unit)(body: => T): T = {
    SnapshotTable.setCommitStore(new RaceOnce(compete))
    try body
    finally SnapshotTable.resetCommitStore()
  }

  test("append vs append: the loser auto-retries — both land, no exception") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(0, 10)) // v1
    withRace(() => SnapshotTable.append(spark, root, fixture(100, 5))) {
      SnapshotTable.append(spark, root, fixture(200, 5)) // loses v2, retries as v3
    }
    assert(SnapshotTable.latestVersion(spark, root).contains(3))
    assert(SnapshotTable.history(spark, root).map(_.action) == Seq("create", "append", "append"))
    assert(SnapshotTable.read(spark, root).count() == 20, "both appends' rows present")
  }

  test("append losing to a DML publish: still auto-retries and lands on the rewritten base") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(0, 10)) // v1
    withRace(() => SnapshotTable.deleteWhere(spark, root, Seq(Bound("k", Some(0L), Some(4L))))) {
      SnapshotTable.append(spark, root, fixture(100, 5)) // loses v2 to the delete, retries as v3
    }
    assert(SnapshotTable.history(spark, root).map(_.action) == Seq("create", "delete", "append"))
    val ks = SnapshotTable.read(spark, root).select("k").collect().map(_.getLong(0)).toSet
    assert(ks == ((5L until 10L) ++ (100L until 105L)).toSet, "delete applied AND append landed")
  }

  test("DML losing to an interleaved append: surfaces loudly; the re-run sees the racer's rows") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(0, 10)) // v1
    val e = intercept[SnapshotTable.ConcurrentCommitException] {
      withRace(() => SnapshotTable.append(spark, root, fixture(0, 3).selectExpr("k + 100 AS k", "s"))) {
        SnapshotTable.deleteWhere(spark, root, Seq(Bound("k", Some(0L), Some(104L))))
      }
    }
    assert(e.getMessage.contains("concurrently"), e.getMessage)
    // the lost DML left NOTHING: the racer's append is the only new commit
    assert(SnapshotTable.history(spark, root).map(_.action) == Seq("create", "append"))
    assert(SnapshotTable.read(spark, root).count() == 13)
    // the caller re-derives against the new base — now it sees the racer's
    // rows too (exactly why the blind retry is forbidden for DML)
    SnapshotTable.deleteWhere(spark, root, Seq(Bound("k", Some(0L), Some(104L))))
    assert(SnapshotTable.read(spark, root).count() == 0)
  }

  test("DML vs DML on provably DISJOINT keys: a spurious-but-safe conflict (version is the OCC token)") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(0, 100)) // v1
    val e = intercept[SnapshotTable.ConcurrentCommitException] {
      withRace(() => SnapshotTable.updateWhere(
        spark, root, Seq(Bound("k", Some(50L), Some(54L))), Map("s" -> lit("racer")))) {
        SnapshotTable.updateWhere(
          spark, root, Seq(Bound("k", Some(0L), Some(4L))), Map("s" -> lit("victim")))
      }
    }
    assert(e.getMessage.contains("concurrently"), e.getMessage)
    // racer committed, victim left nothing; the re-run lands cleanly
    assert(SnapshotTable.read(spark, root).filter(col("s") === "racer").count() == 5)
    assert(SnapshotTable.read(spark, root).filter(col("s") === "victim").count() == 0)
    SnapshotTable.updateWhere(spark, root, Seq(Bound("k", Some(0L), Some(4L))), Map("s" -> lit("victim")))
    assert(SnapshotTable.read(spark, root).filter(col("s") === "victim").count() == 5)
    assert(SnapshotTable.history(spark, root).map(_.action) ==
      Seq("create", "update", "update"))
  }

  test("DML vs DML on OVERLAPPING keys: same loud surface, and the re-run applies over the racer's result") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(0, 20)) // v1
    intercept[SnapshotTable.ConcurrentCommitException] {
      withRace(() => SnapshotTable.deleteWhere(spark, root, Seq(Bound("k", Some(0L), Some(9L))))) {
        SnapshotTable.updateWhere(
          spark, root, Seq(Bound("k", Some(5L), Some(14L))), Map("s" -> lit("upd")))
      }
    }
    // racer's delete won; victim re-runs and updates only the SURVIVORS of
    // its overlap — nothing resurrects
    SnapshotTable.updateWhere(spark, root, Seq(Bound("k", Some(5L), Some(14L))), Map("s" -> lit("upd")))
    val rows = SnapshotTable.read(spark, root).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.size == 10 && (10L to 14L).forall(rows(_) == "upd") && (15L to 19L).forall(k => rows(k) != "upd"))
  }

  test("overwrite losing to an append: loud surface (its output replaced the base it read)") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, fixture(0, 10)) // v1
    intercept[SnapshotTable.ConcurrentCommitException] {
      withRace(() => SnapshotTable.append(spark, root, fixture(100, 1))) {
        SnapshotTable.overwrite(spark, root, fixture(500, 2))
      }
    }
    assert(SnapshotTable.read(spark, root).count() == 11, "the lost overwrite left nothing")
    SnapshotTable.overwrite(spark, root, fixture(500, 2))
    assert(SnapshotTable.read(spark, root).count() == 2)
  }

  // ── the same matrix through the SQL entry points: the staging catalog
  // and the procedures inherit the isolation contract BY construction
  // (they publish through the same CommitStore), proven here end-to-end ──

  private def firstConcurrent(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .exists(_.isInstanceOf[SnapshotTable.ConcurrentCommitException])

  test("SQL surface: catalog UPDATE, REPLACE TABLE, and CALL rebase each lose loudly to an interleaved writer") {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.gccm", classOf[graft.sinks.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gccm.warehouse", wh)
    org.apache.spark.sql.GraftSqlBridge.addStrategy(spark, graft.sinks.GraftDmlStrategy)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gccm.ns")
    val root = wh + "/ns/t"
    SnapshotTable.create(spark, root, fixture(0, 20)) // v1

    // 1. catalog-identifier DML loses to an interleaved append: the
    // ConcurrentCommitException surfaces THROUGH spark.sql, nothing
    // half-commits, and the re-run applies over the racer's rows
    val e1 = intercept[Throwable] {
      withRace(() => SnapshotTable.append(spark, root, fixture(100, 3))) {
        spark.sql("UPDATE gccm.ns.t SET s = 'victim' WHERE k BETWEEN 0 AND 104")
      }
    }
    assert(firstConcurrent(e1), s"expected ConcurrentCommitException through spark.sql: $e1")
    assert(SnapshotTable.history(spark, root).map(_.action) == Seq("create", "append"))
    spark.sql("UPDATE gccm.ns.t SET s = 'victim' WHERE k BETWEEN 0 AND 104")
    assert(spark.sql("SELECT count(*) AS n FROM gccm.ns.t WHERE s = 'victim'").head.getLong(0) == 23,
      "the re-run must see the racer's rows too")

    // 2. REPLACE TABLE AS SELECT (the atomic staging-catalog path) loses
    // to an interleaved append: loud, nothing half-committed, re-run lands
    val e2 = intercept[Throwable] {
      withRace(() => SnapshotTable.append(spark, root, fixture(200, 2))) {
        spark.sql("REPLACE TABLE gccm.ns.t AS SELECT id AS k, concat('r', id) AS s FROM range(7)")
      }
    }
    assert(firstConcurrent(e2), s"expected ConcurrentCommitException through REPLACE TABLE: $e2")
    assert(SnapshotTable.read(spark, root).count() == 25, "the lost REPLACE left nothing")
    spark.sql("REPLACE TABLE gccm.ns.t AS SELECT id AS k, concat('r', id) AS s FROM range(7)")
    assert(spark.sql("SELECT count(*) AS n FROM gccm.ns.t").head.getLong(0) == 7)

    // 3. CALL rebase vs a mid-rebase main append: the staged replay is
    // private (no conflict), but the later fast_forward REFUSES the
    // divergence loudly — never a silent publish over the racer
    val dev = SnapshotTable.createBranch(spark, root, "dev")
    SnapshotTable.append(spark, dev, fixture(300, 2))
    SnapshotTable.append(spark, root, fixture(400, 1)) // diverge pre-rebase
    withRace(() => SnapshotTable.append(spark, root, fixture(500, 1))) {
      spark.sql("CALL gccm.system.rebase('ns.t', 'dev')") // races mid-replay
    }
    val e3 = intercept[Throwable](spark.sql("CALL gccm.system.fast_forward('ns.t', 'dev')"))
    assert(e3.getMessage != null && e3.getMessage.contains("diverges"), e3.toString)
    // the contract's resolution: rebase again onto the advanced tip, land
    spark.sql("CALL gccm.system.rebase('ns.t', 'dev')")
    spark.sql("CALL gccm.system.fast_forward('ns.t', 'dev')")
    assert(spark.sql("SELECT count(*) AS n FROM gccm.ns.t").head.getLong(0) == 11,
      "7 replaced + 1 pre-rebase + 1 racer + 2 branch rows")
  }
}
