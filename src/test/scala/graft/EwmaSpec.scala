package graft

import graft.ops.Analytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bounded-state EWMA (Analytics.ewmaAffine) must agree with the plain
  * sequential recursion e_i = 0.3·v_i + 0.7·e_(i-1) for every chunking and
  * partitioning — the affine (scale, offset) composition is mathematically
  * exact; only IEEE reassociation at chunk boundaries separates the paths,
  * so e6-scaled outputs must match and raw doubles must agree to ~1e-12.
  */
class EwmaSpec extends SparkSuite {
  import spark.implicits._

  private def events(nKeys: Int, perKey: Int): DataFrame = {
    val rnd = new scala.util.Random(99)
    val rows = for {
      k <- 0 until nKeys
      i <- 0 until perKey
    } yield (k.toLong, f"2024-01-01 ${i / 3600}%02d:${(i / 60) % 60}%02d:${i % 60}%02d", i.toLong, rnd.nextInt(20000).toLong)
    rows.toDF("user_id", "ts", "event_id", "v_c").withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  private def collectE6(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("user_id", "n_events", "ewma_e6")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("identical output across repartitionings (1, 3, 17 partitions)") {
    val ev = events(12, 70)
    val base = collectE6(Analytics.ewmaAffine(ev, chunkSize = 16))
    Seq(1, 3, 17).foreach { p =>
      val re = collectE6(Analytics.ewmaAffine(ev.repartition(p, col("user_id")), chunkSize = 16))
      assert(re == base, s"repartition($p) changed the EWMA output")
    }
  }

  test("chunked two-level fold equals the driver-side sequential recursion") {
    val ev = events(8, 90)
    // synthetic ts increases with event_id, so event_id alone is the order
    val expected = ev
      .select("user_id", "event_id", "v_c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (k, rows) =>
        val vs = rows.sortBy(_._2).map(_._3.toDouble)
        k -> vs.tail.foldLeft(vs.head)((acc, v) => 0.3 * v + 0.7 * acc)
      }
    // chunk sizes spanning single-chunk (>=90) down to per-pair (2)
    Seq(2, 7, 16, 4096).foreach { cs =>
      val got = Analytics
        .ewmaAffine(ev, chunkSize = cs)
        .select(col("user_id"), col("ewma_e6"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      expected.foreach { case (k, e) =>
        val want = math.floor(e * 10000 + 0.5).toLong
        assert(
          math.abs(got(k) - want) <= 1,
          s"chunkSize=$cs key=$k: got ${got(k)}, sequential $want")
      }
    }
  }

  test("chunk-size invariance on the fixture events (e6-exact)") {
    val ev = Fixtures
      .events(spark, sf001)
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v_c"))
    val single = collectE6(Analytics.ewmaAffine(ev, chunkSize = 1 << 20)) // one chunk per key
    val multi = collectE6(Analytics.ewmaAffine(ev, chunkSize = 8))
    assert(single.keySet == multi.keySet)
    single.foreach { case (k, (n, e6)) =>
      assert(multi(k)._1 == n)
      assert(math.abs(multi(k)._2 - e6) <= 1, s"key $k: single-chunk $e6 vs 8-chunk ${multi(k)._2}")
    }
  }
}
