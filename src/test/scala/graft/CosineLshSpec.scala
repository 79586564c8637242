package graft

import graft.functions.CosineLsh
import graft.ops.SimKernel
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH (graft.functions.CosineLsh): soundness is
  * structural (exact-cosine verification of every candidate); these tests
  * quantify recall and candidate pruning against the exact all-pairs join
  * on sf0.001 embeddings plus planted near-dups.
  */
class CosineLshSpec extends SparkSuite {
  import spark.implicits._

  private def corpus() = {
    val e = Fixtures.table(spark, sf001, "embeddings")
    val cut = size(col("embedding")) - 2
    val variantVec = concat(
      slice(col("embedding"), lit(1), cut),
      transform(slice(col("embedding"), cut + 1, lit(2)), x => negate(x)))
    e.select(col("vec_id"), col("embedding"))
      .unionByName(e.select((col("vec_id") + 100000).as("vec_id"), variantVec.as("embedding")))
  }

  test("SRP-LSH recall >= 0.8 vs exact cosine pairs at tau = 0.9; output is sound") {
    val c = corpus()
    val exact = c
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
      .crossJoin(c.select(col("vec_id").as("b_id"), col("embedding").as("b_vec")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", SimKernel.cosine(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= 0.9)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(exact.size >= 100, s"planted construction broken: only ${exact.size} exact pairs")

    val approx = CosineLsh
      .nearDuplicatePairs(c, "vec_id", "embedding", minCosine = 0.9)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"SRP recall $recall < 0.8 (|exact|=${exact.size}, |approx|=${approx.size})")
    assert(approx.subsetOf(exact), s"unsound pairs: ${approx.diff(exact).take(3)}")
  }

  test("rowsPerBand outside [1, 32] is rejected (band packing would overflow)") {
    val c = corpus()
    intercept[IllegalArgumentException] {
      CosineLsh.nearDuplicatePairs(c, "vec_id", "embedding", minCosine = 0.9, rowsPerBand = 33)
    }
    intercept[IllegalArgumentException] {
      CosineLsh.nearDuplicatePairs(c, "vec_id", "embedding", minCosine = 0.9, rowsPerBand = 0)
    }
  }

  test("banding prunes: candidate pairs well below all-pairs") {
    val c = corpus()
    val n = c.count()
    // Count band-bucket collisions the same way nearDuplicatePairs does.
    val banded = CosineLsh
      .nearDuplicatePairs(c, "vec_id", "embedding", minCosine = -1.0) // keep all candidates
      .count()
    assert(banded < n * (n - 1) / 2 / 10, s"banding not pruning: $banded candidates vs ${n * (n - 1) / 2}")
  }
}
