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
      .unionByName(e.select((col("vec_id") + Fixtures.PlantShift).as("vec_id"), variantVec.as("embedding")))
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

  test("q_dedup_semantic_lsh: >= 0.8 of planted dup pairs share a cluster; canonicals unique per cluster") {
    val out = SparkEntry
      .queries("q_dedup_semantic_lsh")(spark, sf001)
      .select(col("vec_id"), col("comp"), col("is_canonical"))
      .as[(Long, Long, Int)]
      .collect()
    val comp = out.map(r => r._1 -> r._2).toMap
    // ground truth: planted variants whose EXACT cosine to their original
    // clears the τ=0.9 gate (tail-mass varies per vector, so a tail of the
    // planted pairs lands below τ — those are excluded by the exact
    // verification by DESIGN, not LSH misses, and don't count against
    // recall). Each qualifying pair should share a component.
    val c = corpus()
    val truePairs = c
      .select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
      .filter(col("b_id") >= Fixtures.PlantShift)
      .join(
        c.select((col("vec_id") + Fixtures.PlantShift).as("b_id"), col("embedding").as("a_vec")),
        "b_id")
      .withColumn("cos", SimKernel.cosine(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= 0.9)
      .select(col("b_id"))
      .as[Long]
      .collect()
      .map(b => (b - Fixtures.PlantShift, b))
      .toSeq
    assert(truePairs.size >= 300, s"planted construction broken: only ${truePairs.size} true pairs")
    val recovered = truePairs.count { case (a, b) => comp(a) == comp(b) }
    val recall = recovered.toDouble / truePairs.size
    assert(recall >= 0.8, s"cluster recall $recall < 0.8 (${recovered}/${truePairs.size})")
    // exactly one canonical per cluster, and it is the min id
    val byComp = out.groupBy(_._2)
    byComp.foreach { case (c, rows) =>
      val canon = rows.filter(_._3 == 1).map(_._1)
      assert(canon.length == 1, s"cluster $c has ${canon.length} canonicals")
      assert(canon.head == rows.map(_._1).min, s"cluster $c canonical ${canon.head} != min id")
    }
  }

  test("auto band parameters: linear candidate bound and recall floor across the design envelope") {
    // envelope: up to n ≈ 2^25 one SRP table holds the linear bound; past
    // it rowsPerBand is capped at 24 to protect recall, so occupancy grows
    // again — the at-scale answer there is sharding (the IVF/PQ family),
    // not wider bands. Asserted explicitly below the loop.
    for (n <- Seq(1000L, 10000L, 100000L, 1000000L, 10000000L, 30000000L)) {
      val (b, r) = CosineLsh.autoParams(n, minCosine = 0.9)
      // bucket-occupancy invariant: expected random collisions per band
      // ≈ n²/2^(r+1) must stay O(n) — this is the anti-quadratic contract
      val expectedCollisions = n.toDouble * n / math.pow(2.0, r + 1)
      assert(expectedCollisions <= 2.0 * n,
        s"n=$n r=$r: ${expectedCollisions.toLong} expected collisions per band breaks the linear bound")
      // recall floor: a pair exactly at τ=0.9 must survive ≥ 0.75 overall
      val p = 1.0 - math.acos(0.9) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, r), b)
      assert(recall >= 0.75, s"n=$n (b=$b, r=$r): recall at threshold $recall < 0.75")
      // monotone: more data never means a NARROWER band
      val (_, rPrev) = CosineLsh.autoParams(n / 10, minCosine = 0.9)
      assert(r >= rPrev, s"rowsPerBand shrank with corpus growth: n=$n r=$r vs ${rPrev}")
    }
    // packing constraint holds at the caps
    val (bMax, rMax) = CosineLsh.autoParams(Long.MaxValue, minCosine = 0.9)
    assert(rMax <= 32 && bMax.toLong * rMax <= Int.MaxValue)
    // past the envelope the width stops growing (recall protection) —
    // document the ceiling rather than silently promise linearity forever
    assert(rMax == 24, s"r cap moved ($rMax) — revisit the envelope assertion and scaladoc")
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
