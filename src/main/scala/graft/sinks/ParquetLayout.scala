package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout maintenance for parquet at scale: compact a many-small-files
  * table into `nFiles` range-clustered files.
  *
  * The small-files problem is the chronic failure mode of incremental
  * pipelines at 100 TB (every micro-batch appends a few MB; a year later the
  * scan spends longer opening footers than reading data). Compaction here is
  * `repartitionByRange(key)` + `sortWithinPartitions(key)`, which yields
  * files with DISJOINT key ranges — so a key-predicate scan can skip whole
  * files from the parquet min/max footer statistics, the poor man's
  * Z-order for a single key. One shuffle, no driver-side work.
  */
object ParquetLayout {
  def compactRangeClustered(df: DataFrame, keyCol: String, nFiles: Int, outDir: String): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write
      .mode("overwrite")
      .parquet(outDir)
}
