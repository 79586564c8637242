package graft

import org.apache.spark.sql.functions._
import graft.ops.Analytics

/** Semantic invariants for the warehouse/analytics operators (their value
  * correctness is oracle-hash-checked by the driver; these pin the
  * properties a hash can't express) plus the two config-driven scale
  * capabilities: Spark's injected runtime bloom filter and AQE skew-join
  * splitting.
  */
class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  test("q_scd2: intervals chain per user, exactly one open row, no self-transition") {
    // valid_from/valid_to are TimestampNTZ → collect as LocalDateTime
    val rows = Analytics
      .queries("q_scd2")(spark, sf001)
      .select("user_id", "state", "valid_from", "valid_to")
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2),
          Option(r.getAs[java.time.LocalDateTime](3))))
      .toSeq
    rows.groupBy(_._1).foreach { case (u, hist) =>
      val sorted = hist.sortBy(_._3)(Ordering.fromLessThan(_ isBefore _))
      // exactly one current row per user, and it is the last one
      assert(sorted.count(_._4.isEmpty) == 1, s"user $u open rows")
      assert(sorted.last._4.isEmpty, s"user $u current row not last")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          // closed interval ends exactly where the next begins — no gaps,
          // no overlap — and consecutive states always differ (collapsed)
          assert(a._4.contains(b._3), s"user $u interval gap: $a -> $b")
          assert(a._2 != b._2, s"user $u uncollapsed state: $a -> $b")
        case _ =>
      }
    }
  }

  test("q_merge_upsert: deletes gone, updates applied, inserts present, rest untouched") {
    val base = Fixtures
      .table(spark, sf001, "customer")
      .select(col("c_custkey"), floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal_c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val out = Analytics
      .queries("q_merge_upsert")(spark, sf001)
      .select("c_custkey", "bal_c")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    base.foreach { case (k, bal) =>
      (k % 10: @unchecked) match {
        case 1 => assert(!out.contains(k), s"deleted key $k survived")
        case 0 => assert(out(k) == bal + 10000L, s"update not applied to $k")
        case 2 =>
          assert(out(k) == bal, s"non-change key $k mutated")
          assert(out(k + 1000000L) == 0L, s"insert for $k missing")
        case _ => assert(out(k) == bal, s"non-change key $k mutated")
      }
    }
    assert(out.size == base.size - base.count(_._1 % 10 == 1) + base.count(_._1 % 10 == 2))
  }

  test("q_funnel: stage counts are monotone and positive") {
    val r = Analytics.queries("q_funnel")(spark, sf001).head()
    val (users, viewed, converted) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(users >= viewed && viewed >= converted, s"funnel not monotone: $users/$viewed/$converted")
    assert(viewed > 0, "no viewers in fixture")
  }

  test("q_join_bloom: prefilter drops most non-matching fact rows; result equals plain join") {
    val dim = Fixtures.table(spark, sf001, "part").filter(col("p_type") === "ECONOMY")
    val bf = dim.stat.bloomFilter("p_partkey", 100000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    val fact = Fixtures.table(spark, sf001, "lineitem")
    val total = fact.count()
    val kept = fact.filter(mightContain(col("l_partkey"))).count()
    val matching = fact
      .join(dim.select("p_partkey"), col("l_partkey") === col("p_partkey"), "left_semi")
      .count()
    // ECONOMY is ~1/6 of parts: the bloom must pass every true match and,
    // at fpp=0.01, not much more
    assert(kept >= matching, "bloom dropped a true match")
    assert(kept <= matching + (total * 0.05).toLong, s"bloom barely filters: $kept of $total (true $matching)")
    val viaBloom = Analytics.queries("q_join_bloom")(spark, sf001).collect().toSeq
    val plain = fact
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")).as("rev_c"))
      .orderBy("p_brand")
      .collect()
      .toSeq
    assert(viaBloom == plain, "bloom-prefiltered join diverges from plain join")
  }

  test("cap_runtime_filter: Spark injects a bloom filter on the fact side of a selective dim join") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // the application-side scan gate defaults to 10GB — zero it so the
    // sf0.001 fixture qualifies; force a shuffle join (broadcast joins
    // bypass runtime-filter injection for the shuffle-pruning benefit)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = s2.read.parquet(s"$sf001/lineitem.parquet")
    val dim = s2.read.parquet(s"$sf001/part.parquet").filter(col("p_type") === "ECONOMY")
    val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(
      optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$optimized")
    // and it must not change the answer
    val expected = spark.read
      .parquet(s"$sf001/lineitem.parquet")
      .join(
        spark.read.parquet(s"$sf001/part.parquet").filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .count()
    assert(joined.count() == expected)
  }

  test("cap_aqe_skew: AQE splits a skewed sort-merge join partition at runtime") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // shrink the thresholds so a ~MB-scale hot key counts as skewed
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import s2.implicits._
    // 90% of the left rows share key 0 — one hot shuffle partition
    val left = s2
      .range(0, 200000)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"), col("id").as("v"))
    val right = s2.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k")
    // execute THIS dataframe (count() would plan a different query) so its
    // AdaptiveSparkPlanExec reaches the final re-optimized plan
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE did not mark the join skewed:\n${plan.take(4000)}")
  }
}
