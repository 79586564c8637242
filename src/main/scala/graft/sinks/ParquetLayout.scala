package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  private val ZBits = 6 // 64 quantile buckets per column

  /** Z-order (Morton) clustering over MULTIPLE key columns — the real
    * Z-order the single-key comment above alludes to. Range clustering on
    * one key leaves every OTHER predicate column spanning its full range in
    * every file (no skipping); interleaving the bits of rank-normalized
    * keys gives every clustered column locality in every file, so footer
    * min/max skipping works for predicates on ANY of them.
    *
    * Rank normalization uses sample-based `approxQuantile` boundaries (one
    * cheap pass per column, same machinery as Spark's RangePartitioner) —
    * data-adaptive, so skewed or arbitrary-ranged values still spread over
    * all 2^[[ZBits]] buckets. The z-value is ONE compiled UDF call per row
    * (binary search per column over the broadcast boundary arrays + bit
    * interleave) — an expression-tree spelling would re-evaluate the bucket
    * fold per interleaved bit outside codegen (HOFs are CodegenFallback,
    * no common-subexpression elimination there). Everything else is one
    * range shuffle on the z-value, exactly like the single-key path: no
    * driver-side data movement at any scale.
    */
  def compactZOrdered(df: DataFrame, keyCols: Seq[String], nFiles: Int, outDir: String): Unit = {
    require(keyCols.nonEmpty && keyCols.size <= 4, "z-order supports 1..4 key columns")
    val nb = (1 << ZBits) - 1 // boundaries per column
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val bounds: Array[Array[Double]] =
      keyCols.map(k => df.stat.approxQuantile(k, probs, 0.001)).toArray
    val ncols = keyCols.size
    // bit i of column j lands at position i*ncols + j — higher bits of
    // every column dominate equally, the Morton curve property
    // java.lang.Double (not Double) so a null key survives the array: a
    // Seq[Double] parameter makes Spark null-check each element and fail at
    // runtime on the first null key value. Nulls sort to bucket 0, matching
    // repartitionByRange's nulls-first ordering in the single-key path.
    val zUdf = udf { vals: Seq[java.lang.Double] =>
      var z = 0L
      var j = 0
      while (j < vals.length) {
        val b = bounds(j)
        var lo = 0
        var hi = if (vals(j) == null) 0 else b.length // bucket = #boundaries < value
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (b(mid) < vals(j)) lo = mid + 1 else hi = mid
        }
        var i = 0
        while (i < ZBits) {
          z |= ((lo >> i) & 1L) << (i * ncols + j)
          i += 1
        }
        j += 1
      }
      z
    }
    df.withColumn("__z", zUdf(array(keyCols.map(k => col(k).cast("double")): _*)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(outDir)
  }
}
