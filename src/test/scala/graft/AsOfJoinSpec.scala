package graft

import graft.plans.AsOfJoinOps
import org.apache.spark.sql.functions._

/** Custom as-of join operator (graft.plans.AsOfJoin): result equivalence
  * with the composed theta-join + window formulation, plan-shape assertions
  * (the custom exec is actually planned; no Window/expanded pair join), and
  * null/edge semantics.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def purchases() = Fixtures
    .events(spark, sf001)
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))

  private def views() = Fixtures
    .events(spark, sf001)
    .filter(col("event_type") === "view")
    .select(col("event_id").as("v_event_id"), col("user_id").as("v_user_id"), col("ts").as("v_ts"))

  test("native as-of join equals the composed window formulation on sf0.001") {
    val p = purchases()
    val v = views()
    val native = AsOfJoinOps
      .latestPrior(p, v, "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id")
      .select("p_event_id", "v_event_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_event_id")
      .orderBy(col("v_ts").desc_nulls_last, col("v_event_id").desc_nulls_last)
    val composed = p
      .join(v, col("user_id") === col("v_user_id") && col("v_ts") <= col("p_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("p_event_id", "v_event_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(native.size == composed.size)
    val diff = composed.collect { case (k, m) if native.get(k) != Some(m) => (k, m, native.get(k)) }
    assert(diff.isEmpty, s"first mismatches: ${diff.take(5)}")
    // left-outer: purchases with no prior view survive with a null match
    assert(native.values.exists(_.isEmpty) == composed.values.exists(_.isEmpty))
  }

  test("plan uses AsOfJoinExec: no window exchange, no candidate-pair join") {
    val df = AsOfJoinOps.latestPrior(purchases(), views(), "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id")
    df.count() // force planning through AQE
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s"custom exec missing from plan:\n$s")
    assert(!s.contains("Window"), s"window leaked into native plan:\n$s")
    // EnsureRequirements inserted the SMJ-style shape: hash exchange on the
    // key plus per-side sort (the custom exec is inside the AQE wrapper, so
    // assert on the plan string).
    assert(s.contains("Exchange hashpartitioning(user_id"), s"no key exchange:\n$s")
    assert(s.contains("Sort [user_id"), s"no key/time sort:\n$s")
  }

  test("self-join (shared ExprIds on both sides) resolves via fresh right aliases") {
    // Both sides derive from the same analyzed plan — without re-aliasing,
    // duplicate ExprIds in the node output misresolve. Latest prior event of
    // the same user at or before each event = itself (ties broken by the
    // largest event_id, and event_id is unique per ts sample here).
    val e = Fixtures
      .events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .limit(200)
    val out = AsOfJoinOps
      .latestPrior(e, e, "user_id", "user_id", "ts", "ts", "event_id")
      .toDF("l_event_id", "l_user_id", "l_ts", "r_event_id", "r_user_id", "r_ts")
    assert(out.count() == 200, "self as-of join must emit one row per left row")
    // Value binding, not just cardinality: each event's latest prior at its
    // own ts is itself (ts unique per user in this sample), so a misbound
    // right side (e.g. stripped aliases) would fail the equality below even
    // though the left-outer row count stays 200.
    val misbound = out
      .filter(col("r_event_id").isNull || col("r_event_id") =!= col("l_event_id"))
      .count()
    assert(misbound == 0, s"$misbound rows bound a right side other than themselves")
  }

  test("as-of semantics: boundary tie (v_ts == p_ts) matches; later views don't") {
    val p = Seq((1L, 10L, 100L), (2L, 10L, 50L)).toDF("p_event_id", "user_id", "p_ts")
      .select(col("p_event_id"), col("user_id"), timestamp_micros(col("p_ts")).as("p_ts"))
    val v = Seq(
      (11L, 10L, 100L), // ties p1 exactly → matches p1
      (12L, 10L, 100L), // same ts, larger id → wins the tie
      (13L, 10L, 60L),  // after p2 → no match for p2
      (14L, 10L, 40L)   // before p2 → p2's match
    ).toDF("v_event_id", "v_user_id", "v_ts")
      .select(col("v_event_id"), col("v_user_id"), timestamp_micros(col("v_ts")).as("v_ts"))
    val out = AsOfJoinOps
      .latestPrior(p, v, "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id")
      .select("p_event_id", "v_event_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(out(1L).contains(12L), s"tie-break wrong: $out")
    assert(out(2L).contains(14L), s"as-of wrong: $out")
  }

  test("tolerance: a prior older than the bound yields the null row, fresher matches survive") {
    val p = Seq((1L, 10L, 1000L), (2L, 10L, 5000L)).toDF("p_event_id", "user_id", "p_ts")
      .select(col("p_event_id"), col("user_id"), timestamp_micros(col("p_ts")).as("p_ts"))
    val v = Seq(
      (11L, 10L, 900L), // 100 µs before p1 → inside tol=200 → matches p1
      (12L, 10L, 1500L) // 3500 µs before p2 → outside tol=200 → p2 unmatched
    ).toDF("v_event_id", "v_user_id", "v_ts")
      .select(col("v_event_id"), col("v_user_id"), timestamp_micros(col("v_ts")).as("v_ts"))
    val out = AsOfJoinOps
      .latestPrior(p, v, "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id", toleranceMicros = 200L)
      .select("p_event_id", "v_event_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(out(1L).contains(11L), s"in-tolerance match lost: $out")
    assert(out(2L).isEmpty, s"stale prior leaked past the tolerance: $out")
    // Unbounded (default) still matches the stale prior — the bound is the
    // only semantic difference.
    val unbounded = AsOfJoinOps
      .latestPrior(p, v, "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id")
      .select("p_event_id", "v_event_id")
      .as[(Long, Option[Long])]
      .collect()
      .toMap
    assert(unbounded(2L).contains(12L))
  }
}
