package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures

/** One raw product record as a paginated upstream API returns it —
  * pre-identity (the UPC is synthesized downstream in the pipeline). */
case class RawProduct(partkey: Long, name: String, brand: String, price: Double)

/** A paginated record source — the shape of the reference's literal core
  * act (page through an HTTP product API, load each page). An API client is
  * inherently a sequential driver-side stream: page N+1's request depends
  * on page N's cursor, so the DRIVER walks pages while every page's
  * processing (validate/dedup/upsert) parallelizes on the cluster
  * immediately. The keyed upsert downstream makes page REPLAY idempotent,
  * which is the whole crash-recovery contract of incremental consumption:
  * re-fetching an already-loaded page converges to the same table.
  *
  * Zero-egress note: a real HTTP implementation is untestable in this
  * image; [[FixturePagedSource]] is the deterministic in-image stand-in
  * that preserves the protocol exactly (stable page boundaries, partial
  * final page, None past the end).
  */
trait PagedSource {
  /** Records of 0-based `page`, or None when past the last page. A partial
    * page is valid data (the last one usually is). */
  def fetchPage(page: Int): Option[Seq[RawProduct]]
}

/** Deterministic paging over the `part` fixture, ordered by partkey —
  * simulates a keyset-paginated API snapshot. The one-time collect is the
  * "server's" dataset, not a Spark anti-pattern: a real implementation
  * holds no data at all, just an HTTP cursor. */
class FixturePagedSource(spark: SparkSession, sfDir: String, pageSize: Int) extends PagedSource {
  require(pageSize > 0, "pageSize must be positive")

  private lazy val all: Array[RawProduct] = Fixtures
    .table(spark, sfDir, "part")
    .orderBy("p_partkey")
    .select(
      col("p_partkey").cast("long"),
      col("p_name").cast("string"),
      col("p_brand").cast("string"),
      col("p_retailprice").cast("double"))
    .collect()
    .map(r => RawProduct(r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))

  override def fetchPage(page: Int): Option[Seq[RawProduct]] = {
    val from = page.toLong * pageSize
    if (page < 0 || from >= all.length) None
    else Some(all.slice(from.toInt, math.min(from.toInt + pageSize, all.length)).toSeq)
  }
}
