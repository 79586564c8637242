package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

/** cap_join_salted: the salted equi-join must be row-identical to the plain
  * join on a synthetically skewed input, and the salt must actually spread
  * the hot key across sub-keys.
  */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on a 90%-hot-key input; salt spreads the hot key") {
    // Skew: 90% of lineitem rows mapped to key 1, the rest keep their part key.
    val left = Fixtures
      .table(spark, sf001, "lineitem")
      .select(
        when(pmod(col("l_orderkey"), lit(10)) < 9, 1L).otherwise(col("l_partkey")).as("k"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity"))
    val right = Fixtures
      .table(spark, sf001, "part")
      .select(col("p_partkey").as("rk"), col("p_name"))

    val plain = left
      .join(right, col("k") === col("rk"))
      .select("l_orderkey", "l_linenumber", "rk")
      .as[(Long, Long, Long)]
      .collect()
      .sorted
      .toSeq
    val salted = SkewJoin
      .saltedEquiJoin(left, right, "k", "rk", leftTieBreak = "l_orderkey", nSalts = 8)
      .select("l_orderkey", "l_linenumber", "rk")
      .as[(Long, Long, Long)]
      .collect()
      .sorted
      .toSeq
    assert(plain.nonEmpty)
    assert(salted == plain, s"salted != plain: ${salted.size} vs ${plain.size}")

    // the hot key's rows spread over >1 salt bucket
    val spread = left
      .filter(col("k") === 1L)
      .select(pmod(xxhash64(col("l_orderkey")), lit(8)).as("s"))
      .distinct()
      .count()
    assert(spread > 4, s"salt did not spread the hot key: $spread buckets")
  }
}
