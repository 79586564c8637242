package graft

import java.nio.file.Files

import graft.functions.{DedupIndex, MinHash}
import graft.sinks.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** cap_dedup_index — the persisted incremental near-dup index: checking
  * a batch against the index finds exactly the cross pairs the one-shot
  * banded pass finds over the union (same bands, same verification),
  * ingest gates new/dup_index/dup_batch deterministically and grows the
  * index so a replayed batch is fully rejected, and the candidate probe
  * BROADCASTS the batch side (the index is never shuffled). */
class DedupIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String = Files.createTempDirectory("graft-dedupidx").toString

  /** Deterministic token docs: id → 30 tokens "w<base+j>"; near-dups
    * share the base with a 2-token perturbation (J = 28/32 ≈ 0.875). */
  private def doc(id: Long, base: Long, perturb: Int = 0): (Long, Seq[String]) =
    id -> ((0 until 30).map(j => s"w${base + j}") ++ (0 until perturb).map(j => s"p${id}_$j"))
      .drop(perturb)

  private def frame(docs: Seq[(Long, Seq[String])]): DataFrame =
    docs.toDF("doc_id", "tokens")

  test("checkBatch finds exactly the one-shot banded pass's cross pairs; probe broadcasts the batch") {
    val root = freshRoot()
    val corpus = frame((0L until 40L).map(i => doc(i, i * 1000)))
    DedupIndex.build(spark, root, corpus, "doc_id", "tokens", bands = 6, rows = 3)
    // batch: 5 near-dups of indexed docs (ids 100..104 ~ bases 0..4), 5 novel
    val batch = frame(
      (0 until 5).map(i => doc(100L + i, i * 1000L, perturb = 2)) ++
        (0 until 5).map(i => doc(200L + i, 900000L + i * 1000L)))
    val got = DedupIndex
      .checkBatch(spark, root, batch, "doc_id", "tokens", minJaccard = 0.8)
    val gotPairs = got.select("new_id", "dup_of").as[(Long, Long)].collect().toSet
    // oracle: the one-shot pass over corpus ∪ batch, restricted to cross pairs
    val union = corpus.unionByName(batch)
    val oracle = MinHash
      .nearDuplicatePairs(union, "doc_id", "tokens", 0.8, bands = 6, rows = 3)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .filter { case (a, b) => a < 100 ^ b < 100 } // cross pairs only
      .map { case (a, b) => if (a >= 100) (a, b) else (b, a) }
      .toSet
    assert(gotPairs == oracle, s"got $gotPairs vs oracle $oracle")
    assert(gotPairs.size == 5, "each perturbed doc matches its base")
    // plan shape: the candidate join must broadcast the BATCH side — the
    // index streams map-side, never shuffles
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast candidate probe in:\n$plan")
  }

  test("ingest gates new/dup_index/dup_batch, grows the index, and fully rejects a replay") {
    val root = freshRoot()
    DedupIndex.build(
      spark, root, frame((0L until 20L).map(i => doc(i, i * 1000))), "doc_id", "tokens")
    // batch: one index-dup (of base 3), one internal pair (301 ~ 302),
    // two novel docs
    val batch = frame(Seq(
      doc(300L, 3000L, perturb = 2), // ~ indexed id 3
      doc(301L, 500000L),
      doc(302L, 500000L, perturb = 2), // ~ 301 within the batch
      doc(400L, 700000L)))
    val report = DedupIndex
      .ingest(spark, root, batch, "doc_id", "tokens", minJaccard = 0.8)
      .select("id", "status", "dup_of")
      .as[(Long, String, Option[Long])]
      .collect()
      .toSet
    assert(report == Set(
      (300L, "dup_index", Some(3L)),
      (301L, "new", None),
      (302L, "dup_batch", Some(301L)),
      (400L, "new", None)), s"unexpected report: $report")
    // accepted docs are now indexed: tokens + postings both grew
    assert(SnapshotTable.read(spark, root + "/tokens").count() == 22)
    assert(SnapshotTable.read(spark, root + "/bands").filter("id IN (301, 400)").count() > 0)
    // a replayed batch is fully rejected (301/400 now duplicate the index)
    val replay = DedupIndex
      .ingest(spark, root, batch, "doc_id", "tokens", minJaccard = 0.8)
      .select("id", "status")
      .as[(Long, String)]
      .collect()
      .toSet
    assert(replay == Set(
      (300L, "dup_index"), (301L, "dup_index"), (302L, "dup_index"), (400L, "dup_index")),
      s"replay must reject everything: $replay")
    assert(SnapshotTable.read(spark, root + "/tokens").count() == 22, "replay must not grow the index")
    // rebuildBands is result-preserving maintenance
    DedupIndex.rebuildBands(spark, root)
    val after = DedupIndex
      .checkBatch(spark, root, frame(Seq(doc(500L, 700000L, perturb = 2))), "doc_id", "tokens", 0.8)
      .select("dup_of").as[Long].collect().toSet
    assert(after == Set(400L), s"post-rebuild check must still match the ingested doc: $after")
  }

  test("remove: a departed doc stops blocking near-duplicates, via metadata-only deletes") {
    val root = freshRoot()
    val corpus = frame((0L until 20L).map(i => doc(i, i * 1000)))
    DedupIndex.build(spark, root, corpus, "doc_id", "tokens", bands = 6, rows = 3)
    // a near-dup of indexed doc 3 is blocked...
    val nd = frame(Seq(doc(300L, 3000L, perturb = 2)))
    assert(DedupIndex.checkBatch(spark, root, nd, "doc_id", "tokens", 0.8).count() == 1)
    // ...doc 3 leaves the corpus (takedown) → the block lifts and ingest admits
    val filesBefore = (SnapshotTable.history(spark, root + "/tokens").last.files.map(_.path) ++
      SnapshotTable.history(spark, root + "/bands").last.files.map(_.path)).toSet
    assert(DedupIndex.remove(spark, root, Seq(3L).toDF("doc_id"), "doc_id") == 1)
    assert(DedupIndex.checkBatch(spark, root, nd, "doc_id", "tokens", 0.8).count() == 0)
    val report = DedupIndex.ingest(spark, root, nd, "doc_id", "tokens", 0.8).collect()
    assert(report.length == 1 && report.head.getString(1) == "new", report.toSeq.toString)
    // the removal was metadata-only: no pre-existing index file rewritten
    val filesAfter = (SnapshotTable.history(spark, root + "/tokens").last.files.map(_.path) ++
      SnapshotTable.history(spark, root + "/bands").last.files.map(_.path)).toSet
    assert(filesBefore.subsetOf(filesAfter), "remove must not rewrite index files")
    // other docs still block their near-dups (mask surgical, not a wipe)
    val nd4 = frame(Seq(doc(400L, 4000L, perturb = 2)))
    assert(DedupIndex.checkBatch(spark, root, nd4, "doc_id", "tokens", 0.8).count() == 1)
    // plan shape AFTER a removal: the takedown sidecar's anti-join
    // broadcasts (mask keys are takedown-sized) and the candidate probe
    // still broadcasts the batch — the postings table never shuffles on
    // the masked read path either
    val masked = DedupIndex.checkBatch(spark, root, nd4, "doc_id", "tokens", 0.8)
    masked.collect()
    val mplan = masked.queryExecution.executedPlan.toString
    assert(mplan.contains("BroadcastHashJoin"), s"no broadcast in post-remove probe:\n$mplan")
    assert(
      !mplan.contains("SortMergeJoin"),
      s"post-remove masked read must not shuffle the postings:\n$mplan")
    // rebuildBands reconciles the masks into a clean postings table
    DedupIndex.rebuildBands(spark, root)
    assert(SnapshotTable.readManifest(
      spark, root + "/bands",
      SnapshotTable.latestVersion(spark, root + "/bands").get).masks.isEmpty)
    assert(DedupIndex.checkBatch(spark, root, nd4, "doc_id", "tokens", 0.8).count() == 1)
  }

  test("streamIngest: a micro-batched stream gates through the index exactly like batch ingest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    DedupIndex.build(
      spark, root, frame((0L until 10L).map(i => doc(i, i * 1000))), "doc_id", "tokens")
    val ms = MemoryStream[(Long, Seq[String])]
    val q = ms.toDF().toDF("doc_id", "tokens")
      .writeStream
      .foreachBatch(DedupIndex.streamIngest(root, "doc_id", "tokens", minJaccard = 0.8))
      .option("checkpointLocation", Files.createTempDirectory("graft-didx-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(doc(600L, 5000L, perturb = 2), doc(601L, 800000L)) // dup of id 5, novel
      q.processAllAvailable()
      ms.addData(doc(602L, 800000L, perturb = 2)) // dup of 601 ACROSS epochs (via the index)
      q.processAllAvailable()
      val ids = graft.sinks.SnapshotTable
        .read(spark, root + "/tokens").select("id").as[Long].collect().toSet
      assert(ids == (0L until 10L).toSet + 601L,
        s"only the novel doc lands; cross-epoch dup gated through the index: $ids")
    } finally q.stop()
  }
}
