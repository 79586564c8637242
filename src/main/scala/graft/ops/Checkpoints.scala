package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a deployment switch.
  *
  * Iterative operators (connected components, Lloyd's iterations) and
  * multi-action plans (decontaminate) must cut lineage each round or the
  * plan re-executes its whole upstream per action. Two ways to cut it:
  *
  *   - `localCheckpoint()` — executor-memory resident. Fastest, and the
  *     right default in `local[*]` where "executor loss" cannot happen. NOT
  *     fault-tolerant on a real cluster: lose an executor and the cached
  *     blocks (and, because lineage was truncated, any way to recompute
  *     them) are gone.
  *   - `checkpoint()` — written to the reliable checkpoint directory
  *     (HDFS/object store on a cluster). Survives executor loss; costs a
  *     write+read round trip per truncation.
  *
  * Set `spark.graft.checkpoint.reliable=true` (plus
  * `sparkContext.setCheckpointDir(...)`) to switch every Graft iterative
  * operator to reliable checkpoints — the production setting for long
  * 100-TB jobs where retrying the whole job costs more than the checkpoint
  * writes. The default (unset/false) keeps localCheckpoint.
  *
  * Storage note: Spark deletes out-of-scope reliable checkpoint files only
  * when `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a STATIC
  * conf — set it at context start). Without it an iterative loop leaks one
  * dataset copy per truncation into the checkpoint dir; with it, each
  * round's checkpoint is GC'd once the next round's replaces it.
  */
object Checkpoints {
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Fan a narrow scan out to the session's cores before a CPU-DENSE map
    * stage (render/decode, per-row hashing, tokenization): one unsplittable
    * input file — a single-row-group parquet fixture, a gzip — serializes
    * everything until the first exchange (optimization guide §2.5, input
    * skew). Scale-adaptive no-op: a frame that already has at least
    * core-count partitions (any real multi-file table) passes through
    * untouched, so this NEVER adds a shuffle at scale; callers project to
    * the needed columns first so the one-time shuffle moves narrow rows. */
  def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Truncate `df`'s lineage eagerly, honoring [[ReliableKey]].
    * IDEMPOTENT: a frame that is already a bare truncation product — its
    * analyzed plan is the LogicalRDD a checkpoint leaves behind, or a
    * pure column-projection over one (the memoized weighted edge frame's
    * `.select("a", "b")` view) — passes through untouched, so a memoized
    * pre-truncated frame (Graph.coPurchaseEdges*) fed to a kernel that
    * defensively truncates its input doesn't get materialized again. */
  def truncate(df: DataFrame): DataFrame = {
    def truncated(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.execution.LogicalRDD => true
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
          pr.projectList.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) &&
            pr.child.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
        case _ => false
      }
    if (truncated(df.queryExecution.analyzed))
      return df
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      require(
        spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires sparkContext.setCheckpointDir(...)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
