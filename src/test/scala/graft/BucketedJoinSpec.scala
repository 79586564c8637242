package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing — the 100-TB pattern for repeated fact-fact
  * joins: both tables pre-bucketed on the join key means the SortMergeJoin
  * reads matching buckets directly and the plan carries NO shuffle exchange.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed tables join without a shuffle and match the plain join") {
    val o = Fixtures.table(spark, sf001, "orders")
    val l = Fixtures.table(spark, sf001, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark
      .table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    val plainCount = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == plainCount)
  }
}
