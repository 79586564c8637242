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
    // the in-memory catalog of a fresh JVM doesn't know about tables left by
    // a previous run, so DROP TABLE can't clean their directories — do it
    // directly or saveAsTable fails with LOCATION_ALREADY_EXISTS
    Seq("orders_b", "lineitem_b").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
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
