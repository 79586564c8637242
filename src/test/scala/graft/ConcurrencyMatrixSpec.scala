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

  // ── streaming epochs join the matrix: an epoch commit racing batch
  // DML must land exactly once OVER the racer (append rule) or lose
  // loudly — never adopt the racer's commit, never double-land ──

  /** Drains `rows` through a real catalog-sink streaming query into
    * `table` — epoch 0 on a fresh checkpoint (assert on the landed
    * epochs via [[epochCommits]]). */
  private def drainEpoch(table: String, rows: Seq[(Long, String)]): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("k", "s")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ccm-ck").toString)
      .trigger(Trigger.ProcessingTime(0))
      .toTable(table)
    try { ms.addData(rows: _*); q.processAllAvailable() } finally q.stop()
  }

  private def epochCommits(root: String): Seq[SnapshotTable.Commit] =
    SnapshotTable.history(spark, root).filter(c => c.action == "append" && c.batchId.contains(0L))

  test("streaming epoch losing its slot to batch UPDATE / REPLACE TABLE / fast-forward: retries and lands exactly once OVER each racer") {
    val wh = freshRoot()
    spark.conf.set("spark.sql.catalog.gsem", classOf[graft.sinks.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsem.warehouse", wh)
    org.apache.spark.sql.GraftSqlBridge.addStrategy(spark, graft.sinks.GraftDmlStrategy)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsem.ns")

    // 1. epoch vs batch UPDATE: the update takes the slot mid-publish;
    // the epoch's retry loop lands on the REWRITTEN base, exactly once
    val r1 = wh + "/ns/t1"
    spark.sql("CREATE TABLE gsem.ns.t1 (k BIGINT, s STRING)")
    SnapshotTable.append(spark, r1, fixture(0, 10))
    withRace(() => { spark.sql("UPDATE gsem.ns.t1 SET s = 'racer' WHERE k < 5"); () }) {
      drainEpoch("gsem.ns.t1", Seq(100L -> "e0", 101L -> "e1"))
    }
    assert(epochCommits(r1).size == 1, SnapshotTable.history(spark, r1).map(_.action).toString)
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t1 WHERE s = 'racer'").head.getLong(0) == 5,
      "the racing UPDATE's rewrite survives under the epoch")
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t1 WHERE k >= 100").head.getLong(0) == 2,
      "the epoch's rows land exactly once over the racer")
    val acts1 = SnapshotTable.history(spark, r1).map(_.action)
    assert(acts1.indexOf("update") < acts1.lastIndexOf("append"),
      s"the epoch must have REPLAYED after the racer's slot: $acts1")

    // 2. epoch vs REPLACE TABLE: the full-rewrite racer wins the slot;
    // the epoch retries onto the replaced base — never adopts, never drops
    val r2 = wh + "/ns/t2"
    spark.sql("CREATE TABLE gsem.ns.t2 (k BIGINT, s STRING)")
    SnapshotTable.append(spark, r2, fixture(0, 10))
    withRace(() => {
      spark.sql("REPLACE TABLE gsem.ns.t2 AS SELECT id AS k, concat('r', id) AS s FROM range(3)")
      ()
    }) {
      drainEpoch("gsem.ns.t2", Seq(200L -> "e0"))
    }
    assert(epochCommits(r2).size == 1)
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t2").head.getLong(0) == 4,
      "3 replaced rows + the epoch's row, exactly once")
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t2 WHERE k = 200").head.getLong(0) == 1)

    // 3. epoch vs fast-forward (the rebase publish): branch commits land
    // mid-epoch; the epoch retries on top of the fast-forwarded tip
    val r3 = wh + "/ns/t3"
    spark.sql("CREATE TABLE gsem.ns.t3 (k BIGINT, s STRING)")
    SnapshotTable.append(spark, r3, fixture(0, 5))
    val dev = SnapshotTable.createBranch(spark, r3, "dev")
    SnapshotTable.append(spark, dev, fixture(50, 2))
    withRace(() => { SnapshotTable.fastForward(spark, r3, "dev"); () }) {
      drainEpoch("gsem.ns.t3", Seq(300L -> "e0"))
    }
    assert(epochCommits(r3).size == 1)
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t3").head.getLong(0) == 8,
      "5 seed + 2 fast-forwarded branch rows + 1 epoch row")

    // 4. the mirror: batch DML losing its slot to an interleaved EPOCH
    // surfaces loudly (DML rule) — and the re-run sees the epoch's rows
    val r4 = wh + "/ns/t4"
    spark.sql("CREATE TABLE gsem.ns.t4 (k BIGINT, s STRING)")
    SnapshotTable.append(spark, r4, fixture(0, 10))
    val e4 = intercept[Throwable] {
      withRace(() => drainEpoch("gsem.ns.t4", Seq(400L -> "e0"))) {
        spark.sql("UPDATE gsem.ns.t4 SET s = 'victim' WHERE k >= 0")
      }
    }
    assert(firstConcurrent(e4), s"expected ConcurrentCommitException through spark.sql: $e4")
    assert(epochCommits(r4).size == 1, "the epoch (racer) landed exactly once")
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t4 WHERE s = 'victim'").head.getLong(0) == 0,
      "the lost UPDATE left nothing")
    spark.sql("UPDATE gsem.ns.t4 SET s = 'victim' WHERE k >= 0")
    assert(spark.sql("SELECT count(*) AS n FROM gsem.ns.t4 WHERE s = 'victim'").head.getLong(0) == 11,
      "the re-run applies over the epoch's rows too")
  }
}
