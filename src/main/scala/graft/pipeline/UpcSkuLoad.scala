package graft.pipeline

import java.util.Properties

import graft.Fixtures
import graft.sinks.JdbcSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's end-to-end behavior as one composed pipeline:
  * extract product records → synthesize/validate UPC-12 identity → dedup →
  * idempotent keyed load into an RDBMS. Everything is the same operators
  * the query surface exposes (check-digit arithmetic, dedup-by-key,
  * anti-join incremental semantics live inside the upsert), assembled the
  * way the reference's batch loop uses them. Proven by EtlPipelineSpec:
  * re-running is a no-op, changed rows update in place.
  */
object UpcSkuLoad {
  /** Extract: parts → UPC product records. Check digit via pure column
    * arithmetic (codegen-friendly; the UDF variant lives in ops.Scalars). */
  def extract(spark: SparkSession, sfDir: String): DataFrame = {
    val body = lpad(col("p_partkey").cast("string"), 11, "0")
    val weighted = (1 to 11)
      .map(i => substring(body, i, 1).cast("int") * lit(if (i % 2 == 1) 3 else 1))
      .reduce(_ + _)
    val cd = (lit(10) - weighted % 10) % 10
    Fixtures
      .table(spark, sfDir, "part")
      .select(
        concat(body, cd.cast("string")).as("upc"),
        col("p_name").as("name"),
        col("p_brand").as("brand"),
        col("p_retailprice").as("price"),
        current_timestamp().as("loaded_at"))
  }

  /** Validate: full-12-digit check-digit test + basic record hygiene. */
  def validate(records: DataFrame): DataFrame = {
    val weighted = (1 to 12)
      .map(i => substring(col("upc"), i, 1).cast("int") * lit(if (i % 2 == 1) 3 else 1))
      .reduce(_ + _)
    records.filter(
      weighted % 10 === 0 &&
        length(col("upc")) === 12 &&
        col("price") > 0 &&
        length(trim(col("name"))) > 0)
  }

  /** One representative per UPC (deterministic: lowest name sorts first). */
  def dedup(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("upc").orderBy("name")
    records
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Load: idempotent keyed upsert (insert-new / update-changed). */
  def load(records: DataFrame, url: String, table: String): Unit =
    JdbcSink.upsert(records, url, table, keyCols = Seq("upc"))

  /** The whole reference-shaped run. */
  def run(spark: SparkSession, sfDir: String, url: String, table: String): Long = {
    val ready = dedup(validate(extract(spark, sfDir)))
    load(ready, url, table)
    ready.count()
  }
}
