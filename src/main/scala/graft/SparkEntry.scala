package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category operator maps from graft.ops.*; each key is a
  * SURVEY.md §2 inventory row. `oracleSql` carries the DuckDB-runnable ANSI
  * SQL twin of every oracle-checked query (bare table names — the driver
  * registers the fixture parquet files as DuckDB views).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Sources.queries ++
      ops.Relational.queries ++
      ops.Aggregates.queries ++
      ops.Joins.queries ++
      ops.SortSetOps.queries ++
      ops.Windows.queries ++
      ops.Scalars.queries ++
      ops.LlmOps.queries ++
      ops.ExtraText.queries ++
      ops.BpeTokenizer.queries ++
      ops.PipelineOps.queries ++
      ops.StreamingBatch.queries ++
      ops.Analytics.queries ++
      ops.Behavior.queries ++
      ops.Reports.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Sources.oracle ++
      ops.Relational.oracle ++
      ops.Aggregates.oracle ++
      ops.Joins.oracle ++
      ops.SortSetOps.oracle ++
      ops.Windows.oracle ++
      ops.Scalars.oracle ++
      ops.LlmOps.oracle ++
      ops.ExtraText.oracle ++
      ops.BpeTokenizer.oracle ++
      ops.PipelineOps.oracle ++
      ops.StreamingBatch.oracle ++
      ops.Analytics.oracle ++
      ops.Behavior.oracle ++
      ops.Reports.oracle
}
