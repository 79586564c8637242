package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equi key — the operator that
  * naively plans as a cross join (BroadcastNestedLoopJoin at best) because
  * no hash key exists. q_join_theta's trick (evaluate the band inside
  * user_id buckets) needs an equi key; this is the general case: IP-range
  * lookups, time-windows against a global interval set, geo tiles.
  *
  * The classic cure: quantize the domain into buckets of `bucketWidth`.
  * A point lands in exactly one bucket; an interval is replicated to every
  * bucket it overlaps (one `sequence` + `explode`, bounded by
  * interval_len/width + 1 rows). The join becomes a hash equi-join on the
  * bucket id, and the exact containment predicate filters inside each
  * bucket. Because the point's single bucket is always among the
  * interval's buckets, every true pair appears exactly once — no distinct
  * pass. Pick width ≈ typical interval length: replication factor stays
  * ~2× while bucket population drops by the domain/width ratio.
  *
  * At 100 TB: shuffle key is the bucket id (uniform when points are),
  * interval replication is bounded and map-side, no all-pairs stage.
  */
object RangeJoin {
  /** Inner join of `points` (long column `pointCol`) with `intervals`
    * (long columns `startCol`, `endCol`, inclusive bounds): one output row
    * per (point row, containing interval row). */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bkt", floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals
      .withColumn(
        "_bkt",
        explode(
          sequence(
            floor(col(startCol) / bucketWidth).cast("long"),
            floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(i, Seq("_bkt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bkt")
  }
}
