package graft

import java.nio.file.Files

import graft.sinks.SnapshotTable
import org.apache.spark.sql.DataFrame

/** The transactional-table contract: atomic visibility, time travel,
  * optimistic concurrency, safe compaction, vacuum reclamation. */
class SnapshotTableSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-snap").toString

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  private def batch(xs: (Long, String)*): DataFrame = xs.toDF("id", "v")

  test("create + append + overwrite: each commit is a readable snapshot") {
    val root = freshRoot()
    val v1 = SnapshotTable.create(spark, root, batch(1L -> "a", 2L -> "b"))
    val v2 = SnapshotTable.append(spark, root, batch(3L -> "c"))
    val v3 = SnapshotTable.overwrite(spark, root, batch(9L -> "z"))
    assert((v1, v2, v3) == (1, 2, 3))
    assert(rows(SnapshotTable.readVersion(spark, root, 1)) == Set(1L -> "a", 2L -> "b"))
    assert(rows(SnapshotTable.readVersion(spark, root, 2)) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(rows(SnapshotTable.read(spark, root)) == Set(9L -> "z"))
    assert(SnapshotTable.history(spark, root).map(c => (c.version, c.action, c.addedRows)) ==
      Seq((1, "create", 2L), (2, "append", 1L), (3, "overwrite", 1L)))
  }

  test("concurrent commit: exactly one of two racing writers wins") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, batch(1L -> "a"))
    // simulate the loser: another writer published version 2 between our
    // read of latest and our publish — the manifest already exists
    SnapshotTable.append(spark, root, batch(2L -> "b"))
    val ex = intercept[SnapshotTable.ConcurrentCommitException] {
      // race: a writer that read latest=1 tries to publish version 2,
      // which the append above already claimed
      val m = SnapshotTable.history(spark, root).head
      SnapshotTable.publish(spark, root, SnapshotTable.Commit(2, "append", m.dirs, 0L))
    }
    assert(ex.getMessage.contains("version 2"))
    // table state is the winner's, untouched
    assert(rows(SnapshotTable.read(spark, root)) == Set(1L -> "a", 2L -> "b"))
  }

  test("a failed (unpublished) write is invisible and vacuum reclaims it") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, batch(1L -> "a"))
    // simulate a writer that crashed after writing data, before publishing
    batch(99L -> "orphan").write.parquet(s"$root/data/dead-beef")
    assert(rows(SnapshotTable.read(spark, root)) == Set(1L -> "a"), "orphan must be invisible")
    val deleted = SnapshotTable.vacuum(spark, root, keepLast = 1)
    assert(deleted.contains("data/dead-beef"))
    assert(rows(SnapshotTable.read(spark, root)) == Set(1L -> "a"))
  }

  test("compact: fewer files, same rows, old versions still readable until vacuumed") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, batch((1L to 10L).map(i => i -> s"v$i"): _*).repartition(8))
    SnapshotTable.append(spark, root, batch((11L to 20L).map(i => i -> s"v$i"): _*).repartition(8))
    val expect = (1L to 20L).map(i => i -> s"v$i").toSet
    val v3 = SnapshotTable.compact(spark, root, "id", nFiles = 2)
    assert(v3 == 3)
    assert(rows(SnapshotTable.read(spark, root)) == expect, "compaction must be data-identical")
    assert(SnapshotTable.read(spark, root).inputFiles.length == 2)
    // time travel across the compaction boundary still works
    assert(rows(SnapshotTable.readVersion(spark, root, 2)) == expect)
    // vacuum to latest-only: pre-compaction dirs are reclaimed, latest reads fine
    val deleted = SnapshotTable.vacuum(spark, root, keepLast = 1)
    assert(deleted.count(_.startsWith("data/")) == 2, s"both original dirs reclaimed: $deleted")
    assert(rows(SnapshotTable.read(spark, root)) == expect)
    assert(SnapshotTable.versions(spark, root) == Seq(3))
  }

  test("exactly-once streaming append: replayed epochs are no-ops") {
    val root = freshRoot()
    val sink = SnapshotTable.streamAppend(root)
    sink(batch(1L -> "a"), 0L)
    sink(batch(2L -> "b"), 1L)
    sink(batch(1L -> "a"), 0L) // restart replays epoch 0
    sink(batch(2L -> "b"), 1L) // and epoch 1
    assert(rows(SnapshotTable.read(spark, root)) == Set(1L -> "a", 2L -> "b"))
    assert(SnapshotTable.history(spark, root).map(c => (c.version, c.batchId)) ==
      Seq((1, Some(0L)), (2, Some(1L))), "each epoch committed exactly once")
    // a lost publish race on an already-committed epoch is also a no-op
    assert(SnapshotTable.appendBatchExactlyOnce(spark, root, batch(1L -> "a"), 0L) == 1)
  }

  test("vacuum retains every dir a kept version references") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, batch(1L -> "a"))
    SnapshotTable.append(spark, root, batch(2L -> "b"))
    SnapshotTable.overwrite(spark, root, batch(3L -> "c"))
    // keep last 2 (versions 2 and 3): v1's dir is shared with v2 -> retained
    val deleted = SnapshotTable.vacuum(spark, root, keepLast = 2)
    assert(deleted == Seq("_manifests/v00000001.json"), s"nothing else deletable: $deleted")
    assert(rows(SnapshotTable.readVersion(spark, root, 2)) == Set(1L -> "a", 2L -> "b"))
    assert(rows(SnapshotTable.readVersion(spark, root, 3)) == Set(3L -> "c"))
  }
}
