package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet fixtures (FIXTURES.md).
  *
  * All tables are plain parquet scans except `events`, whose `ts` column is
  * parquet TIMESTAMP(NANOS): stock Spark 4.1.2 rejects it with
  * PARQUET_TYPE_ILLEGAL, so we read ns-as-long and rebuild the timestamp at
  * microsecond precision (SURVEY.md §7.5 H1). Integer division is mandatory —
  * float division of ~1.7e18 ns loses microsecond precision.
  *
  * Date-ish columns (`o_orderdate`, `l_shipdate`, rebuilt `ts`) are kept
  * TimestampNTZ end-to-end so parquet output carries naive-timestamp
  * semantics, matching what DuckDB produces for the oracle (SURVEY.md §7.5 H2).
  */
object Fixtures {
  /** Shift added to fixture ids wherever a query PLANTS synthetic variant
    * rows (near-dup corpora, entity-resolution variants). A high fixed bit,
    * far above any fixture key at any SF, so planted ids can NEVER collide
    * with real ids — a +100k-style shift silently merges planted rows with
    * real ones once a table passes 100k keys, and an oracle applying the
    * same shift hides the breakage. Mirrored as the literal 1099511627776
    * in oracle SQL. */
  val PlantShift: Long = 1L << 40

  val tpchTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] =
    tpchTables ++ Seq("events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other    => spark.read.parquet(s"$sfDir/$other.parquet")
    }

  /** events with `ts` rebuilt as TimestampNTZ at µs precision (ns truncated,
    * same truncation DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP).
    *
    * `nanosAsLong` is session config, set once at session build by
    * Verify/Bench/SparkSuite; the guarded set below is only a fallback for
    * ad-hoc sessions that skipped it. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // Two testdata generations exist: TIMESTAMP(NANOS) (surfaces as LONG
    // under nanosAsLong — rebuild at µs) and TIMESTAMP(MICROS) (reads as a
    // timestamp directly — just normalize to NTZ). Both end at the same
    // µs-precision TimestampNTZ the oracle's DuckDB cast produces.
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
      case _                                   => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", tsCol)
  }

  /** Register every fixture as a temp view so the spark.sql entry point (E2)
    * works alongside the DataFrame DSL. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    allTables.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
}
