package graft

import org.apache.spark.sql.functions._

/** Invariant + brute-force-equality tests for the behavioral analytics and
  * report operators. The oracle hash-match is the primary gate; these specs
  * prove the algorithmic claims the oracles can't express (frontier ==
  * brute force, triangle count == unoriented triple join, prefix filter
  * candidate set shrinks) and the structural invariants of the outputs.
  */
class BehaviorSpec extends SparkSuite {
  import spark.implicits._

  test("q_interval_merge: per-user intervals are disjoint, ordered, and cover every event") {
    val iv = SparkEntry.queries("q_interval_merge")(spark, sf001).cache()
    val rows = iv.orderBy("user_id", "iv_seq").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sliding(2).foreach {
        case Array(a, b) =>
          // next interval starts strictly after the previous one ends
          assert(b.getLong(2) > a.getLong(3), s"overlap: $a then $b")
        case _ => ()
      }
    }
    val nEvents = iv.agg(sum("n_events")).as[Long].head()
    val total = Fixtures.events(spark, sf001).count()
    assert(nEvents == total, s"interval rollup lost events: $nEvents != $total")
    iv.unpersist()
  }

  test("q_markov_transitions: rows account for every consecutive pair; probabilities normalize") {
    val mk = SparkEntry.queries("q_markov_transitions")(spark, sf001).cache()
    val totalPairs = mk.agg(sum("n")).as[Long].head()
    val ev = Fixtures.events(spark, sf001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(totalPairs == expected, s"pair count $totalPairs != events - users $expected")
    // per prev_type the e6 probabilities sum to 1e6 up to per-row rounding
    mk.groupBy("prev_type")
      .agg(sum("p_e6").as("s"), count(lit(1)).as("k"))
      .collect()
      .foreach(r => assert(math.abs(r.getLong(1) - 1000000L) <= r.getLong(2), r.toString))
    mk.unpersist()
  }

  test("q_attribution: conversions bounded by purchases, touch types are touches") {
    val at = SparkEntry.queries("q_attribution")(spark, sf001).collect()
    val purchases =
      Fixtures.events(spark, sf001).filter(col("event_type") === "purchase").count()
    assert(at.map(_.getLong(1)).sum <= purchases)
    assert(at.map(_.getString(0)).toSet.subsetOf(Set("click", "view")))
    assert(at.nonEmpty)
  }

  test("q_pareto_front equals the brute-force NOT EXISTS skyline") {
    val fast = SparkEntry
      .queries("q_pareto_front")(spark, sf001)
      .select("p_partkey")
      .as[Long]
      .collect()
      .toSet
    val p = Fixtures
      .table(spark, sf001, "part")
      .select(
        col("p_partkey"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("price_c"),
        col("p_size"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val slow = p.filter { case (_, pc, sz) =>
      !p.exists { case (_, qc, qz) => (qc < pc && qz >= sz) || (qc == pc && qz > sz) }
    }.map(_._1).toSet
    assert(fast == slow, s"skyline mismatch: fast ${fast.size} vs brute ${slow.size}")
  }

  test("q_graph_triangles: oriented count equals the unoriented triple-join count") {
    val res = SparkEntry.queries("q_graph_triangles")(spark, sf001).head()
    val li = Fixtures
      .table(spark, sf001, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li
      .join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
      .filter(col("pk") < col("pk2"))
      .select(col("pk").as("a"), col("pk2").as("b"))
      .distinct()
      .cache()
    val nEdges = e.count()
    val brute = e
      .select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x"))
      .filter(col("y") < col("z"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y", "z"), "left_semi")
      .count()
    assert(res.getLong(0) == nEdges, s"edge count ${res.getLong(0)} != $nEdges")
    assert(res.getLong(1) == brute, s"triangles ${res.getLong(1)} != brute $brute")
    e.unpersist()
  }

  test("q_simjoin_prefix: prefix filter finds every exact-Jaccard pair (completeness)") {
    // exact all-pairs via the complete shared-bigram index (any pair with
    // jacc >= t > 0 shares a bigram)
    val sh = Fixtures
      .table(spark, sf001, "documents")
      .filter(size(split(lower(col("text")), " ")) >= 4) // sequence(1,0) would run DESCENDING
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(split(lower(text), ' ')) - 3), " +
          "i -> concat(split(lower(text), ' ')[i-1], ' ', split(lower(text), ' ')[i], ' ', " +
          "split(lower(text), ' ')[i+1], ' ', split(lower(text), ' ')[i+2]))")).as("bg"))
      .distinct()
      .cache()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh
      .select(col("doc_id").as("a_id"), col("bg"))
      .join(sh.select(col("doc_id").as("b_id"), col("bg")), Seq("bg"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .filter(col("i") / (col("na") + col("nb") - col("i")) >= 0.6)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val fast = SparkEntry
      .queries("q_simjoin_prefix")(spark, sf001)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(fast == exact, s"prefix join missed/invented pairs: ${fast.size} vs ${exact.size}")
    assert(exact.nonEmpty, "fixture has no high-similarity pairs; threshold too high")
    sh.unpersist()
  }

  test("q_graph_pagerank: integer fixed-point — mass conserved, bit-identical across runs") {
    val r1 = SparkEntry.queries("q_graph_pagerank")(spark, sf001).collect()
    val mass = r1.map(_.getLong(1)).sum
    // integer truncation loses < 1 e12-unit per division; with ~2 divisions
    // per vertex per iteration x 5 iterations the loss is << 0.1% of 1e12
    assert(mass > 999L * 1000000000L && mass <= 1000000000000L, s"rank mass $mass")
    assert(r1.forall(_.getLong(1) > 0))
    // rebuild the whole plan; pure integer arithmetic must reproduce exactly
    val r2 = SparkEntry.queries("q_graph_pagerank")(spark, sf001).collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      r2.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("q_ts_cusum: window formulation equals the sequential max(0, s+d) recursion") {
    val fast = SparkEntry
      .queries("q_ts_cusum")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap
    val rows = Fixtures
      .events(spark, sf001)
      .select(
        col("user_id"),
        col("event_id"),
        col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString, r.getLong(3)))
    val slow = rows
      .groupBy(_._1)
      .map { case (uid, es) =>
        val ordered = es.sortBy(e => (e._3, e._2)).map(_._4)
        val n = ordered.length.toLong
        val tot = ordered.sum
        var s = 0L
        var mx = 0L
        ordered.foreach { x =>
          s = math.max(0L, s + (n * x - tot))
          mx = math.max(mx, s)
        }
        uid -> mx
      }
    slow.foreach { case (uid, mx) =>
      assert(fast(uid) == mx, s"user $uid: window ${fast(uid)} != sequential $mx")
    }
  }

  test("q_histogram_equidepth: two-level rank decomposition equals the single-window ntile") {
    val fast = SparkEntry
      .queries("q_histogram_equidepth")(spark, sf001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val w = org.apache.spark.sql.expressions.Window.orderBy("c", "l_orderkey", "l_linenumber")
    val slow = Fixtures
      .table(spark, sf001, "lineitem")
      .select(
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("c"),
        col("l_orderkey"),
        col("l_linenumber"))
      .withColumn("bkt", ntile(8).over(w))
      .groupBy("bkt")
      .agg(count(lit(1)).as("n_rows"), min("c").as("lo_c"), max("c").as("hi_c"))
      .orderBy("bkt")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(fast == slow)
  }

  test("ntileTwoLevel: adversarial ties and skew reproduce plain ntile for several k") {
    import spark.implicits._
    // heavy ties (7 distinct values over 1000 rows), skewed coarse buckets
    // (value 0 holds half the rows), deterministic tiebreak id
    val df = (0 until 1000)
      .map(i => (if (i % 2 == 0) 0L else (i % 7).toLong, i.toLong))
      .toDF("v", "id")
    for (k <- Seq(2, 5, 8, 13)) {
      val fast = graft.ops.Reports
        .ntileTwoLevel(df, k, col("v"), col("v"), Seq(col("id")), "bkt")
        .select("v", "id", "bkt")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val slow = df
        .withColumn("bkt", ntile(k).over(org.apache.spark.sql.expressions.Window.orderBy("v", "id")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(fast == slow, s"k=$k mismatch")
    }
  }

  test("q_upc_normalize: every emitted code carries a valid mod-10 check digit") {
    val rows = SparkEntry.queries("q_upc_normalize")(spark, sf001).collect()
    assert(rows.nonEmpty)
    def checkOk(code: String): Boolean = {
      val ds = code.map(_ - '0')
      val cd = (10 - (ds.init.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 0) 3 * d else d
      }.sum % 10)) % 10
      cd == ds.last
    }
    rows.foreach { r =>
      val (e8, a12) = (r.getString(1), r.getString(2))
      assert(e8.length == 8 && a12.length == 12, s"bad lengths: $e8 / $a12")
      assert(checkOk(a12), s"UPC-A check digit fails: $a12")
      // UPC-E shares the UPC-A check digit by definition
      assert(e8.last == a12.last, s"E/A check digits differ: $e8 / $a12")
    }
  }
}
