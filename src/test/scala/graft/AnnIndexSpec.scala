package graft

import java.nio.file.Files

import graft.functions.{AnnIndex, KMeansIvf}
import graft.sinks.SnapshotTable
import org.apache.spark.sql.functions._

/** cap_ann_persisted — the fit-once / search-many index contract: a
  * search that loads the persisted model returns EXACTLY the in-memory
  * IVF rows (same k/iters/nprobe/topK — both sides are deterministic by
  * construction), survives a "restart" (nothing cached: model and
  * buckets come off disk), and scans only the probed buckets' files
  * (manifest-stat pruning over the bucket-clustered corpus table). */
class AnnIndexSpec extends SparkSuite {
  private lazy val embs = Fixtures.table(spark, sf001, "embeddings")

  private def freshRoot(): String = Files.createTempDirectory("graft-annidx").toString

  test("persisted search ≡ in-memory IVF search, model loaded from the index") {
    val root = freshRoot()
    AnnIndex.fit(spark, root, embs, "vec_id", "embedding", k = 8, iters = 3, nFiles = 8)
    // "restart": every artifact below comes from the tables, not this JVM's fit
    val queries = embs.filter(col("vec_id") < 20)
    val persisted = AnnIndex
      .search(spark, root, queries, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn")
      .collect()
      .toSeq
    val cents = KMeansIvf.fit(embs, "vec_id", "embedding", k = 8, iters = 3)
    val inMemory = KMeansIvf
      .annTopK(queries, embs, cents, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn")
      .collect()
      .toSeq
    assert(persisted == inMemory, s"persisted (${persisted.size}) diverged from in-memory (${inMemory.size})")
    assert(persisted.nonEmpty)
    // the loaded model IS the deterministic fit, pinned to its corpus version
    val (loaded, corpusV) = AnnIndex.loadModel(spark, root)
    assert(loaded.length == cents.length)
    loaded.zip(cents).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(corpusV == SnapshotTable.latestVersion(spark, root + "/corpus").get)
  }

  test("sample-fit index (cap_ann_refresh companion): ≡ in-memory fitSample search, refresh still works off it") {
    val root = freshRoot()
    val srcRoot = freshRoot() + "/src"
    SnapshotTable.create(spark, srcRoot, embs.select("vec_id", "embedding"))
    AnnIndex.fitFromTable(
      spark, root, srcRoot, "vec_id", "embedding", k = 8, iters = 3, nFiles = 8,
      sampleFraction = 0.5)
    val queries = embs.filter(col("vec_id") < 20)
    val persisted = AnnIndex
      .search(spark, root, queries, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().toSeq
    // the persisted model is exactly the deterministic sample fit; the
    // coding pass still covered the FULL corpus (sampling is fit-only)
    val cents = KMeansIvf.fitSample(embs, "vec_id", "embedding", k = 8, iters = 3, fraction = 0.5)
    val inMemory = KMeansIvf
      .annTopK(queries, embs, cents, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().toSeq
    assert(persisted == inMemory, s"sample-fit persisted (${persisted.size}) diverged (${inMemory.size})")
    assert(
      SnapshotTable.read(spark, root + "/corpus").count() == embs.count(),
      "sampleFraction must only thin the FIT, never the coded corpus")
    // incremental refresh keeps working against the sample-fit centroids
    SnapshotTable.append(
      spark, srcRoot,
      embs.select("vec_id", "embedding")
        .limit(5).select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    AnnIndex.refresh(spark, root, srcRoot, "vec_id", "embedding")
    assert(SnapshotTable.read(spark, root + "/corpus").count() == embs.count() + 5)
  }

  test("incremental refresh follows the source change feed with delta-sized work") {
    val root = freshRoot()
    val srcRoot = freshRoot()
    val all = embs.select("vec_id", "embedding")
    SnapshotTable.create(spark, srcRoot, all.filter(col("vec_id") < 400))
    AnnIndex.fitFromTable(spark, root, srcRoot, "vec_id", "embedding", k = 8, iters = 3, nFiles = 8)
    val (cents, _) = AnnIndex.loadModel(spark, root)
    // the source evolves past the fit: new vectors land, a range is deleted
    SnapshotTable.append(spark, srcRoot, all.filter(col("vec_id") >= 400))
    SnapshotTable.deleteWhere(spark, srcRoot, Seq(SnapshotTable.Bound("vec_id", Some(0L), Some(49L))))
    val corpusBefore =
      SnapshotTable.history(spark, root + "/corpus").last.files.map(_.path).toSet
    val v = AnnIndex.refresh(spark, root, srcRoot, "vec_id", "embedding")
    assert(v == SnapshotTable.latestVersion(spark, srcRoot).get, "index current to the source")
    // delta economics: the refresh must never rewrite already-coded files —
    // affected ids leave via a merge-on-read keyed mask (metadata commit)
    // and the delta appends beside them
    val hist = SnapshotTable.history(spark, root + "/corpus")
    val corpusAfter = hist.last.files.map(_.path).toSet
    assert(corpusBefore.subsetOf(corpusAfter), "refresh rewrote pre-existing corpus files")
    assert(hist.map(_.action).contains("mor-delete"), s"expected a MOR keyed delete: ${hist.map(_.action)}")
    // correctness: the refreshed index answers EXACTLY like the same
    // (unmoved) centroids over the source's CURRENT rows — inserts
    // searchable, deleted ids gone
    val cur = SnapshotTable.read(spark, srcRoot)
    val queries = all.filter(col("vec_id") < 20) // their corpus twins are deleted
    val got = AnnIndex
      .search(spark, root, queries, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().toSeq
    val want = KMeansIvf
      .annTopK(queries, cur, cents, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().toSeq
    assert(got == want, s"refreshed search (${got.size}) diverged from expected (${want.size})")
    assert(got.nonEmpty)
    assert(!got.exists(_.getAs[Long]("c_id") < 50), "deleted ids must not be served")
    // already-current refresh is a no-op: no new corpus commits
    val commits = SnapshotTable.history(spark, root + "/corpus").size
    assert(AnnIndex.refresh(spark, root, srcRoot, "vec_id", "embedding") == v)
    assert(SnapshotTable.history(spark, root + "/corpus").size == commits)
    // an index fit from a plain DataFrame has no source to follow: loud
    val plain = freshRoot()
    AnnIndex.fit(spark, plain, embs, "vec_id", "embedding", k = 4, iters = 2)
    intercept[IllegalArgumentException](
      AnnIndex.refresh(spark, plain, srcRoot, "vec_id", "embedding"))
  }

  test("search scans only probed buckets' files; refit overwrites atomically") {
    val root = freshRoot()
    AnnIndex.fit(spark, root, embs, "vec_id", "embedding", k = 8, iters = 3, nFiles = 8)
    val corpusFiles = SnapshotTable.history(spark, root + "/corpus").last.files.size
    // one query, nprobe=1 → at most a couple of bucket files may survive
    // the plan-time bucket filter (bucket-clustered corpus, tight stats)
    val oneQ = embs.filter(col("vec_id") === 0)
    val df = AnnIndex.search(spark, root, oneQ, "vec_id", "embedding", topK = 3, nprobe = 1)
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      }.flatten
    // the corpus scan is the one over files under <root>/corpus/data
    val corpusScans = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.inputFiles.exists(_.contains("/corpus/")))
    assert(corpusScans.nonEmpty, s"no corpus scan in:\n${df.queryExecution.executedPlan}")
    val scanned = corpusScans.map(_.metrics("numFiles").value).sum
    assert(
      scanned < corpusFiles,
      s"bucket pruning failed: scanned $scanned of $corpusFiles corpus files for 1 probe")
    // refit: the index stays consistent and searches still match in-memory
    AnnIndex.fit(spark, root, embs, "vec_id", "embedding", k = 4, iters = 2, nFiles = 4)
    val cents4 = KMeansIvf.fit(embs, "vec_id", "embedding", k = 4, iters = 2)
    val a = AnnIndex.search(spark, root, oneQ, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().toSeq
    val b = KMeansIvf.annTopK(oneQ, embs, cents4, "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("q_id", "rn").collect().toSeq
    assert(a == b)
  }
}
