package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed keyless range join (graft.ops.RangeJoin): row-identical to the
  * naive BETWEEN join, exactly-once per pair (no distinct pass needed), and
  * planned as a hash equi-join on the bucket id — never a nested loop.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + lit(0.5)).cast("long")

  private def points() = Fixtures
    .table(spark, sf001, "lineitem")
    .select(col("l_orderkey"), col("l_linenumber"), cents(col("l_extendedprice")).as("p"))

  private def bands() = Fixtures
    .table(spark, sf001, "part")
    .select(col("p_partkey"), (cents(col("p_retailprice")) - 5000).as("lo"), (cents(col("p_retailprice")) + 5000).as("hi"))

  test("bucketed range join equals the naive BETWEEN join, each pair exactly once") {
    val naive = points()
      .join(bands(), col("p").between(col("lo"), col("hi")))
      .select("p_partkey", "l_orderkey", "l_linenumber")
      .as[(Long, Long, Long)]
      .collect()
      .sorted
      .toSeq
    val bucketed = RangeJoin
      .pointInInterval(points(), bands(), "p", "lo", "hi", bucketWidth = 10000L)
      .select("p_partkey", "l_orderkey", "l_linenumber")
      .as[(Long, Long, Long)]
      .collect()
      .sorted
      .toSeq
    assert(naive.nonEmpty, "no point-in-band pairs — fixture ranges drifted")
    assert(bucketed == naive, s"sizes ${bucketed.size} vs ${naive.size}")
    // exactly-once: no duplicates even though intervals span 2 buckets
    assert(bucketed.distinct.size == bucketed.size)
  }

  test("bucketed plan is a hash join on the bucket id, not a nested loop") {
    val df = RangeJoin.pointInInterval(points(), bands(), "p", "lo", "hi", bucketWidth = 10000L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("_bkt"), s"bucket key missing from plan:\n$plan")
  }
}
