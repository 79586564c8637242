package graft.functions

import graft.sinks.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN index — fit once, search many. The in-memory IVF path
  * ([[KMeansIvf.annTopK]]) refits the coarse quantizer and re-buckets the
  * whole corpus on every invocation; a 100-TB vector corpus cannot pay a
  * full k-means fit and corpus scan per query batch. This object stores
  * the fitted model AND the bucket-coded corpus as two snapshot tables
  * under one index root:
  *
  * {{{
  *   <root>/model    (cid INT, centroid ARRAY<DOUBLE>)   — k rows, model-sized
  *   <root>/corpus   (id, bkt INT, emb ARRAY<FLOAT>)     — bucket-CLUSTERED
  * }}}
  *
  * so a later session (or another job) searches by LOADING the model (k
  * rows — one model-sized collect) instead of refitting, and probes the
  * corpus through the snapshot table's manifest stats: the corpus is
  * range-clustered on `bkt` at write time, every file's [min,max] bucket
  * span is tight, and the search's bucket membership filter prunes
  * non-probed buckets' files at PLAN time ([[graft.sinks.SnapshotFileIndex]]).
  * Search I/O is therefore ∝ probed buckets, not corpus size — the IVF
  * contract an index on disk exists to keep.
  *
  * Determinism: [[KMeansIvf.fit]] is bit-deterministic, bucket assignment
  * ties break low, and the stored `bkt` is the same function a fresh
  * assignment would compute — so a persisted-index search returns EXACTLY
  * the in-memory [[KMeansIvf.annTopK]] rows for the same (k, iters,
  * nprobe, topK). The spec pins that equality.
  *
  * Refresh: [[fit]] on an existing index overwrites both tables, and the
  * model row records the CORPUS SNAPSHOT VERSION its centroids coded —
  * [[search]] reads that exact version (time travel as the cross-table
  * consistency mechanism), so a search racing a refit sees either the
  * old model with the old coding or the new with the new, never a torn
  * pair whose bucket ids are meaningless. Keep vacuum retention on the
  * corpus table ≥ the oldest model any searcher may still hold. */
object AnnIndex {

  private def modelRoot(root: String) = root + "/model"
  private def corpusRoot(root: String) = root + "/corpus"

  /** Fit the IVF model on `corpus` and persist model + coded corpus.
    * `nFiles` controls the bucket clustering granularity (≥ a few files
    * per probe-able bucket group at scale). Idempotent: re-fitting an
    * existing index overwrites it. `sampleFraction < 1` runs Lloyd's on a
    * deterministic content-addressed sample ([[KMeansIvf.fitSample]]) and
    * still codes the FULL corpus in one scan — the production shape for
    * corpus-scale refits (fit cost ∝ fraction, recall within noise). */
  def fit(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      nFiles: Int = 8,
      sampleFraction: Double = 1.0): Unit =
    fitInternal(spark, root, corpus, idCol, vecCol, k, iters, nFiles, sourceV = -1, sampleFraction)

  /** [[fit]] over a SNAPSHOT-TABLE corpus, recording which SOURCE version
    * the index has ingested — the handle [[refresh]] needs to maintain
    * the index incrementally off the source's change feed. */
  def fitFromTable(
      spark: SparkSession,
      root: String,
      sourceRoot: String,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      nFiles: Int = 8,
      sampleFraction: Double = 1.0): Unit = {
    val srcV = SnapshotTable
      .latestVersion(spark, sourceRoot)
      .getOrElse(sys.error(s"no snapshot table at $sourceRoot"))
    // pin the exact version: a commit racing the fit lands AFTER srcV and
    // is picked up by the next refresh instead of being half-ingested
    val corpus = SnapshotTable.relationVersion(spark, sourceRoot, srcV)
    fitInternal(spark, root, corpus, idCol, vecCol, k, iters, nFiles, sourceV = srcV, sampleFraction)
  }

  private def fitInternal(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      nFiles: Int,
      sourceV: Int,
      sampleFraction: Double = 1.0): Unit = {
    val cents = KMeansIvf.fitSample(corpus, idCol, vecCol, k, iters, sampleFraction)
    val coded = code(cents, corpus, idCol, vecCol, nFiles)
    def put(r: String, df: DataFrame): Int =
      if (SnapshotTable.latestVersion(spark, r).isEmpty) SnapshotTable.create(spark, r, df)
      else SnapshotTable.overwrite(spark, r, df)
    // the model records WHICH corpus snapshot its centroids coded: a
    // search then reads that exact corpus VERSION, so a concurrent refit
    // can never pair old centroids with a re-coded corpus (bucket ids
    // would be meaningless and results silently wrong, not merely stale).
    // Old corpus versions stay readable until vacuum — time travel is the
    // consistency mechanism.
    val corpusV = put(corpusRoot(root), coded)
    put(modelRoot(root), modelFrame(spark, cents, corpusV, sourceV)) // model last
    ()
  }

  /** Bucket-code `corpus` with the given centroids, clustered for the
    * plan-time bucket pruning [[search]] relies on. */
  private def code(
      cents: Array[Array[Double]],
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nFiles: Int): DataFrame =
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("emb"))
      .withColumn("bkt", KMeansIvf.assign(cents, col("emb")))
      .select("id", "bkt", "emb")
      .repartitionByRange(nFiles, col("bkt"))
      .sortWithinPartitions("bkt")

  private def modelFrame(
      spark: SparkSession,
      cents: Array[Array[Double]],
      corpusV: Int,
      sourceV: Int): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, corpusV, sourceV) }
      .toSeq
      .toDF("cid", "centroid", "corpus_version", "source_version")
  }

  /** INCREMENTAL index maintenance — the auto-refresh path a live corpus
    * needs (a one-shot index over a table that keeps committing silently
    * serves ever-staler results; a full [[fitFromTable]] per batch pays a
    * k-means fit plus a WHOLE-corpus recode for a delta-sized change).
    * Consumes the source's change feed for `(ingested, latest]` via the
    * cached CDC range ([[SnapshotTable.changesBetweenCached]] — cost ∝
    * data the commits touched, never a source scan), resolves each
    * changed id's FINAL state (an update's delete+insert pair at one
    * version nets to the insert; a trailing delete nets to gone), then:
    * affected ids leave the coded corpus by an O(change) merge-on-read
    * keyed delete ([[SnapshotTable.deleteMatchedMor]] — metadata-sized
    * commit, zero rewrites), surviving rows re-code against the EXISTING
    * centroids (one broadcast-model map pass over the delta) and append
    * bucket-clustered. The model row advances last, so a racing searcher
    * sees either the old (model, corpus-version) pair or the new one,
    * never a torn mix. Centroids deliberately do NOT move — IVF
    * maintenance standard: assignment stays consistent for every
    * already-coded row; periodic [[fitFromTable]] re-fits absorb drift
    * (and the corpus table's OPTIMIZE reclusters the accumulated delta
    * files). Returns the source version the index is now current to. */
  def refresh(
      spark: SparkSession,
      root: String,
      sourceRoot: String,
      idCol: String,
      vecCol: String,
      nFiles: Int = 2): Int = {
    val rows = SnapshotTable.read(spark, modelRoot(root)).orderBy("cid").collect()
    val cents = rows.map(_.getSeq[Double](1).toArray)
    val corpusV0 = rows.head.getAs[Int]("corpus_version")
    val srcV = rows.head.getAs[Int]("source_version")
    require(srcV >= 0, "index was not fit from a snapshot table — use fitFromTable, then refresh")
    val latest = SnapshotTable
      .latestVersion(spark, sourceRoot)
      .getOrElse(sys.error(s"no snapshot table at $sourceRoot"))
    if (latest == srcV) return srcV // current: nothing to ingest
    val changes = SnapshotTable
      .changesBetweenCached(spark, sourceRoot, srcV, latest)
      .select(col(idCol).as("id"), col(vecCol).as("emb"), col("_change_type"), col("_commit_version"))
    // final state per id: last version wins; within an update's version
    // the insert is the new state ("insert" > "delete" lexicographically,
    // so desc puts it first); ids are unique in an ANN corpus (contract)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id")
      .orderBy(col("_commit_version").desc, col("_change_type").desc)
    val finalState = changes
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .cache()
    try {
      val affected = finalState.select("id")
      SnapshotTable.deleteMatchedMor(spark, corpusRoot(root), affected, Seq("id"))
      val toInsert = finalState.filter(col("_change_type") === "insert")
      val corpusV =
        if (toInsert.isEmpty) SnapshotTable.latestVersion(spark, corpusRoot(root)).getOrElse(corpusV0)
        else SnapshotTable.append(spark, corpusRoot(root), code(cents, toInsert, "id", "emb", nFiles))
      SnapshotTable.overwrite(spark, modelRoot(root), modelFrame(spark, cents, corpusV, latest))
      latest
    } finally finalState.unpersist()
  }

  /** The fitted centroid matrix + the corpus snapshot version it coded,
    * loaded from the index (k rows — one model-sized collect, no refit). */
  def loadModel(spark: SparkSession, root: String): (Array[Array[Double]], Int) = {
    val rows = SnapshotTable
      .read(spark, modelRoot(root))
      .orderBy("cid")
      .collect()
    (rows.map(_.getSeq[Double](1).toArray), rows.head.getAs[Int]("corpus_version"))
  }

  /** Approximate top-k cosine neighbors of `queries` against the PERSISTED
    * corpus: the model loads from the index, each query probes its
    * `nprobe` nearest buckets, and the corpus scan is planned over ONLY
    * the files whose bucket range intersects the probed set (the distinct
    * probed-bucket list is ≤ k — model-sized by construction — so the
    * pruning filter is always plan-time cheap). Output schema matches
    * [[KMeansIvf.annTopK]]: (q_id, rn, c_id, bkt, score_e6). */
  def search(
      spark: SparkSession,
      root: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      topK: Int,
      nprobe: Int): DataFrame = {
    val (cents, corpusV) = loadModel(spark, root)
    val q = queries.select(
      col(idCol).as("q_id"),
      col(vecCol).as("q_emb"),
      explode(KMeansIvf.probe(cents, nprobe, col(vecCol))).as("bkt"))
    // distinct probed buckets ≤ k: a model-sized driver list, never a scan
    val probed = q.select("bkt").distinct().collect().map(_.getInt(0)).sorted
    val cand = SnapshotTable
      .relationVersion(spark, corpusRoot(root), corpusV) // pinned to the model's coding
      .filter(col("bkt").isin(probed.map(b => b: Any): _*)) // plan-time file pruning
      .select(col("id").as("c_id"), col("emb").as("c_emb"), col("bkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id")
      .orderBy(col("cos").desc, col("c_id"))
    q.join(cand, Seq("bkt"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", graft.ops.SimKernel.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(
        col("q_id"),
        col("rn").cast("int").as("rn"),
        col("c_id"),
        col("bkt"),
        floor(col("cos") * 1e6 + lit(0.5)).cast("long").as("score_e6"))
  }
}
