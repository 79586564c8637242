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
  /** Raw (partkey, name, brand, price) rows → UPC product records. Check
    * digit via pure column arithmetic (codegen-friendly; the UDF variant
    * lives in ops.Scalars). Shared by the batch extract and the paginated
    * path, so both synthesize identity identically. */
  def toProducts(raw: DataFrame): DataFrame = {
    val body = lpad(col("partkey").cast("string"), 11, "0")
    val weighted = (1 to 11)
      .map(i => substring(body, i, 1).cast("int") * lit(if (i % 2 == 1) 3 else 1))
      .reduce(_ + _)
    val cd = (lit(10) - weighted % 10) % 10
    raw.select(
      concat(body, cd.cast("string")).as("upc"),
      col("name"),
      col("brand"),
      col("price"),
      current_timestamp().as("loaded_at"))
  }

  /** Extract: parts → UPC product records. */
  def extract(spark: SparkSession, sfDir: String): DataFrame =
    toProducts(
      Fixtures
        .table(spark, sfDir, "part")
        .select(
          col("p_partkey").as("partkey"),
          col("p_name").as("name"),
          col("p_brand").as("brand"),
          col("p_retailprice").as("price")))

  /** Validate: full-12-digit check-digit test + basic record hygiene.
    * Invalid rows are silently dropped; loaders that must account for every
    * input row use [[validateWithQuarantine]]. */
  def validate(records: DataFrame): DataFrame =
    validateWithQuarantine(records)._1

  /** Split records into (valid, quarantined): every rejected row lands in
    * the second frame carrying its FIRST failing check as `reject_reason`
    * (fixed evaluation order, so reasons are deterministic). The null
    * traps matter: a non-digit character makes the weighted sum NULL and a
    * bare `sum % 10 =!= 0` predicate would be NULL too — neither valid nor
    * flagged — so every reason clause is written null-catching. Single
    * pass, pure column expressions; the split is two filters over the same
    * tagged plan (Spark shares the scan). */
  def validateWithQuarantine(records: DataFrame): (DataFrame, DataFrame) = {
    // try_cast, not cast: under ANSI mode (Spark 4 default) a non-digit
    // character would THROW out of the whole job — the quarantine path
    // exists precisely to absorb malformed input as data, not exceptions
    val weighted = (1 to 12)
      .map(i => expr(s"try_cast(substring(upc, $i, 1) AS int)") * lit(if (i % 2 == 1) 3 else 1))
      .reduce(_ + _)
    // The 12-term sum is projected ONCE as a named column, not inlined into
    // the `when` clauses: inlined twice it doubled the expression tree and
    // pushed the downstream validate→dedup→agg stage past the JVM's 64 KB
    // method limit, silently dropping the whole stage out of codegen
    // (CollapseProject keeps this split — the alias is non-cheap and
    // referenced twice, so Catalyst won't re-inline it).
    val withW = records.withColumn("__cd_weighted", weighted)
    val w = col("__cd_weighted")
    val reason = when(col("upc").isNull || length(col("upc")) =!= 12, "bad_length")
      .when(w.isNull || w % 10 =!= 0, "bad_check_digit")
      .when(col("price").isNull || col("price") <= 0, "bad_price")
      .when(length(trim(coalesce(col("name"), lit("")))) === 0, "empty_name")
    val tagged = withW.withColumn("reject_reason", reason).drop("__cd_weighted")
    (
      tagged.filter(col("reject_reason").isNull).drop("reject_reason"),
      tagged.filter(col("reject_reason").isNotNull))
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

  /** The reference's incremental consumption loop: walk a [[PagedSource]]
    * page by page, running the SAME validate→dedup→upsert per page. The
    * driver only advances the cursor; each page's work is distributed, and
    * the keyed upsert makes page replay (crash recovery, overlapping
    * fetches) idempotent — EtlPipelineSpec proves page-wise consumption
    * lands the exact table the batch run does.
    *
    * Dedup is PER PAGE: a consistent keyset-paginated snapshot yields each
    * key on exactly one page, so paged ≡ batch. If the upstream snapshot
    * drifts mid-walk and the SAME key arrives on two pages with DIFFERENT
    * payloads, the upsert resolves last-write-wins (standard incremental-
    * load semantics — the later fetch is the fresher record), whereas a
    * batch over the drifted union would pick the lowest-name
    * representative. Returns rows UPSERTED (a drifted key counts once per
    * page it appeared on), not distinct keys. */
  def runPaged(spark: SparkSession, source: PagedSource, url: String, table: String): Long = {
    import spark.implicits._
    var page = 0
    var total = 0L
    var batch = source.fetchPage(page)
    while (batch.isDefined) {
      // cache: both the upsert and the count action consume `ready`; a
      // page is small by construction, and without the cache the
      // validate/dedup window shuffle runs twice per page
      val ready = dedup(validate(toProducts(spark.createDataset(batch.get).toDF()))).cache()
      try {
        load(ready, url, table)
        total += ready.count()
      } finally ready.unpersist()
      page += 1
      batch = source.fetchPage(page)
    }
    total
  }
}
