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
    * existing index overwrites it. */
  def fit(
      spark: SparkSession,
      root: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      nFiles: Int = 8): Unit = {
    import spark.implicits._
    val cents = KMeansIvf.fit(corpus, idCol, vecCol, k, iters)
    val coded = corpus
      .select(col(idCol).as("id"), col(vecCol).as("emb"))
      .withColumn("bkt", KMeansIvf.assign(cents, col("emb")))
      .select("id", "bkt", "emb")
      .repartitionByRange(nFiles, col("bkt"))
      .sortWithinPartitions("bkt")
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
    val model = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, corpusV) }
      .toSeq
      .toDF("cid", "centroid", "corpus_version")
    put(modelRoot(root), model) // model last: a reader seeing it sees its coded corpus too
    ()
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
