package graft

/** Plan-shape regression guards for the scale-critical queries: the banded
  * near-dup joins must never plan as cartesian products or nested-loop
  * joins, and the broadcast/pushdown shapes the Scaladoc promises must
  * actually appear. Catching a plan regression here is much cheaper than
  * noticing a bench blow-up a round later.
  */
class PlanShapeSpec extends SparkSuite {

  private def planOf(name: String): String = {
    // default 100-char metadata truncation clips long PushedFilters lists
    // mid-token, which would make the pushdown assertions below flaky
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val df = SparkEntry.queries(name)(spark, sf001)
    df.count() // settle AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("banded near-dup joins: no cartesian/nested-loop stage anywhere") {
    for (q <- Seq("q_simhash_pairs", "q_minhash_pairs", "q_cosine_lsh_pairs", "q_dedup_jaccard", "q_join_range")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join:\n$p")
    }
  }

  test("q_join_broadcast actually broadcasts; q_join_shuffle stays sort-merge") {
    assert(planOf("q_join_broadcast").contains("BroadcastHashJoin"))
    assert(planOf("q_join_shuffle").contains("SortMergeJoin"))
  }

  test("scan pushdown: q_filter_pred pushes predicates into the parquet scan") {
    val p = planOf("q_filter_pred")
    assert(p.contains("PushedFilters: ["), s"no pushed filters:\n$p")
    assert(p.contains("IsNotNull"), s"expected pushed IsNotNull:\n$p")
  }

  test("curation shapes: decontaminate broadcasts the eval side; ANN search is never all-pairs") {
    val dec = planOf("q_decontaminate")
    assert(dec.contains("BroadcastHashJoin"), s"eval-side broadcast missing:\n$dec")
    for (q <- Seq("q_sim_ann_kmeans", "q_gap_fill")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join:\n$p")
    }
  }

  test("round-5 shapes: image-pair banded join and IVF-PQ search are never all-pairs") {
    for (q <- Seq("q_img_phash", "q_sim_ann_pq")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join:\n$p")
    }
  }

  test("round-8b shapes: prefix sim-join never all-pairs; behavior ops are join-free windows") {
    val p = planOf("q_simjoin_prefix")
    assert(!p.contains("CartesianProduct"), s"q_simjoin_prefix plans a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q_simjoin_prefix plans a nested-loop join:\n$p")
    // the window-based event ops must not smuggle in a self-join — their
    // whole scale story is "one shuffle, zero joins"
    for (q <- Seq("q_interval_merge", "q_attribution", "q_markov_transitions", "q_path_3grams")) {
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q plans a join where a window suffices:\n$plan")
    }
    // the skyline's only join is the broadcast of the ~100-row bucket-max
    // frame (the two-level decomposition); never a shuffle or cartesian
    val sky = planOf("q_pareto_front")
    assert(sky.contains("BroadcastHashJoin"), s"bucket-max broadcast missing:\n$sky")
    assert(!sky.contains("SortMergeJoin") && !sky.contains("CartesianProduct"),
      s"skyline shuffles a join it should broadcast:\n$sky")
  }

  test("hot scalar paths run inside whole-stage codegen") {
    // the brief's codegen contract: projection/filter/agg pipelines must
    // show WholeStageCodegen spans, and the custom cosine Expression must
    // not break the span it sits in (it implements doGenCode).
    // collect() the dataframe ITSELF (not count()) — codegen wrappers only
    // appear in the FINAL adaptive plan, which materializes on execution
    for (q <- Seq("q_project_arith", "q_filter_pred", "q_agg_q1", "q_sim_threshold")) {
      val df = SparkEntry.queries(q)(spark, sf001)
      df.collect()
      // codegen markers by explain flavor in 4.1.2: formatted AQE output
      // annotates member nodes with "[codegen id : N]"; non-AQE formatted
      // uses a "WholeStageCodegen (N)" header — accept either
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(
        p.contains("[codegen id :") || p.contains("WholeStageCodegen"),
        s"$q fell out of whole-stage codegen:\n$p")
    }
  }

  test("round-6 shapes: merge/SCD2/retention stay equi-join + single-sort shapes") {
    // the SCD2 windows must share ONE shuffle: same partitioning + ordering
    // for both lag and lead passes
    val scd2 = planOf("q_scd2")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(scd2).size
    assert(exchanges == 1, s"q_scd2 should shuffle once for both windows, saw $exchanges:\n$scd2")
    for (q <- Seq("q_merge_upsert", "q_retention_cohort", "q_funnel", "q_join_bloom")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
    }
    // the bloom prefilter must land BEFORE the join: a Filter with the UDF
    // sits on the fact scan side, and the dim side broadcasts
    val bloom = planOf("q_join_bloom")
    assert(bloom.contains("BroadcastHashJoin"), s"q_join_bloom dim not broadcast:\n$bloom")
  }

  test("round-8 shapes: Q21 semi/anti stay equi-join, Q22 broadcasts its scalar, filtered ANN is bucketed") {
    // Q21's EXISTS/NOT-EXISTS decorrelates to left-semi/left-anti joins
    // that must all key on l_orderkey (never a cartesian/nested loop), and
    // the nation-filtered supplier side must broadcast before the fact.
    val q21 = planOf("q_join_tpch_q21")
    assert(!q21.contains("CartesianProduct"), s"q_join_tpch_q21 plans a cartesian product:\n$q21")
    assert(!q21.contains("BroadcastNestedLoopJoin"), s"q_join_tpch_q21 plans a nested-loop join:\n$q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"q_join_tpch_q21 lost its semi/anti decorrelation:\n$q21")
    assert(q21.contains("BroadcastHashJoin"), s"q_join_tpch_q21 should broadcast the supplier dim:\n$q21")
    // Q22: 1-row scalar avg arrives via broadcast, dormancy via anti-join;
    // the BroadcastNestedLoopJoin is EXPECTED here (cross join with one
    // row) — what must not appear is a cartesian over two real relations.
    val q22 = planOf("q_join_tpch_q22")
    assert(!q22.contains("CartesianProduct"), s"q_join_tpch_q22 plans a cartesian product:\n$q22")
    assert(q22.contains("LeftAnti"), s"q_join_tpch_q22 lost its anti-join:\n$q22")
    // Q4's EXISTS decorrelates to a semi-join; Q8's seven-relation tree
    // must broadcast every dim (the fact table is the only big side).
    val q4 = planOf("q_join_tpch_q4")
    assert(q4.contains("LeftSemi") && !q4.contains("CartesianProduct"),
      s"q_join_tpch_q4 lost its semi-join decorrelation:\n$q4")
    val q8 = planOf("q_join_tpch_q8")
    assert(q8.contains("BroadcastHashJoin") && !q8.contains("CartesianProduct"),
      s"q_join_tpch_q8 should broadcast its dims:\n$q8")
    // Filtered ANN: the label predicate must sit UNDER the bucket join
    // (candidate side pre-filtered), and the join stays a bucket equi-join.
    for (q <- Seq("q_sim_ann_filtered", "q_dedup_cc_incremental", "q_decontam_runs")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
    }
  }

  test("round-7 shapes: Q18 broadcasts via AQE without a hint; Q10/Q7 stay equi-join") {
    // q_join_tpch_q18 dropped its forced broadcast(big) hint (the qualifying
    // key set scales with the fact table — an OOM at 100×); this pins that
    // AQE still CHOOSES a broadcast at this SF from the post-HAVING runtime
    // size, so removing the hint cost nothing locally and saved the cluster.
    val q18 = planOf("q_join_tpch_q18")
    assert(q18.contains("BroadcastHashJoin"),
      s"q_join_tpch_q18: AQE did not pick a broadcast for the qualified key set:\n$q18")
    for (q <- Seq("q_join_tpch_q10", "q_join_tpch_q7")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast its dims:\n$p")
    }
    // q_join_tpch_q19's OR-of-ANDs spans both join sides; the optimizer must
    // factor it into per-side conjuncts that reach BOTH parquet scans as
    // pushed filters (quantity bounds on lineitem, type equalities on part) —
    // without CNF extraction the whole disjunction evaluates post-join.
    val q19 = planOf("q_join_tpch_q19")
    assert(q19.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      s"q19 quantity disjunction not pushed to the lineitem scan:\n$q19")
    assert(q19.contains("EqualTo(p_type,PROMO)"),
      s"q19 type disjunction not pushed to the part scan:\n$q19")
  }

  test("round-9 shapes: derived-partsupp TPC-H and new ops stay broadcast/equi-join") {
    // Q2/Q11/Q16/Q20/Q9: every dimension arrives broadcast, the derived
    // catalog joins stay equi-joins — no cartesian or real nested loop
    // anywhere (Q2/Q11's 1-row scalar cross joins are the allowed
    // BroadcastNestedLoopJoin-with-one-row shape, so only CartesianProduct
    // is banned there).
    for (q <- Seq("q_join_tpch_q2", "q_join_tpch_q9", "q_join_tpch_q11",
        "q_join_tpch_q12", "q_join_tpch_q16", "q_join_tpch_q20")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast its dims:\n$p")
    }
    for (q <- Seq("q_join_tpch_q9", "q_join_tpch_q12", "q_join_tpch_q16", "q_join_tpch_q20")) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join:\n$p")
    }
    // Q12's date window must prune the lineitem scan (pushed filter), and
    // the lateness predicate (both sides) must NOT block the equi-join.
    val q12 = planOf("q_join_tpch_q12")
    assert(q12.contains("l_shipdate"), s"q12 lost its date pushdown:\n$q12")
    // BM25: tf/df run as aggregates, never a token-partitioned window; the
    // corpus stats arrive as a 1-row broadcast.
    val bm25 = planOf("q_text_bm25")
    assert(!bm25.contains("CartesianProduct"), s"bm25 plans a cartesian:\n$bm25")
    // split: map-only expression + one aggregate — no join at all.
    val split = planOf("q_split_train")
    assert(!split.contains("Join"), s"q_split_train should be join-free:\n$split")
  }

  test("round-10 shapes: remaining TPC-H (Q1/Q3/Q5/Q6/Q13/Q14/Q15/Q17) — all 22 now guarded") {
    // Q1: pure scan→agg, no join anywhere
    val q1 = planOf("q_agg_q1")
    assert(!q1.contains("Join"), s"q_agg_q1 should be join-free:\n$q1")
    // Q3: segment-filtered customer broadcasts; all three selective
    // predicates reach their parquet scans
    val q3 = planOf("q_join_tpch_q3")
    assert(!q3.contains("CartesianProduct"), s"q3 plans a cartesian:\n$q3")
    assert(q3.contains("BroadcastHashJoin"), s"q3 customer dim not broadcast:\n$q3")
    assert(q3.contains("EqualTo(c_mktsegment,BUILDING)"), s"q3 segment filter not pushed:\n$q3")
    assert(q3.contains("LessThan(o_orderdate") && q3.contains("GreaterThan(l_shipdate"),
      s"q3 date filters not pushed to both fact scans:\n$q3")
    // Q5: six-relation tree — dims broadcast, date window pushed to orders
    val q5 = planOf("q_join_tpch_q5")
    assert(!q5.contains("CartesianProduct") && !q5.contains("BroadcastNestedLoopJoin"),
      s"q5 plans a cartesian/nested-loop:\n$q5")
    assert(q5.contains("BroadcastHashJoin"), s"q5 should broadcast its dims:\n$q5")
    assert(q5.contains("GreaterThanOrEqual(o_orderdate"), s"q5 date window not pushed:\n$q5")
    // Q6: the pushdown showcase — join-free, every predicate at the scan
    val q6 = planOf("q_join_tpch_q6")
    assert(!q6.contains("Join"), s"q_join_tpch_q6 should be join-free:\n$q6")
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "GreaterThanOrEqual(l_discount,0.04)",
        "LessThanOrEqual(l_discount,0.06)", "LessThan(l_quantity,24.0)"))
      assert(q6.contains(f), s"q6 filter $f not pushed:\n$q6")
    // Q13: customers-with-zero-orders needs an OUTER equi-join — never a
    // cartesian, never a nested loop
    val q13 = planOf("q_join_tpch_q13")
    assert(q13.contains("LeftOuter"), s"q13 lost its outer join:\n$q13")
    assert(!q13.contains("CartesianProduct") && !q13.contains("BroadcastNestedLoopJoin"),
      s"q13 plans a cartesian/nested-loop:\n$q13")
    // Q14: month-filtered fact joins a broadcast part projection
    val q14 = planOf("q_join_tpch_q14")
    assert(q14.contains("BroadcastHashJoin"), s"q14 part dim not broadcast:\n$q14")
    assert(q14.contains("GreaterThanOrEqual(l_shipdate"), s"q14 month window not pushed:\n$q14")
    assert(!q14.contains("CartesianProduct"), s"q14 plans a cartesian:\n$q14")
    // Q15: the max arrives as a 1-row broadcast (the allowed BNLJ-with-one-
    // row shape); supplier names broadcast. The quarter-window pushdown on
    // lineitem happens inside the checkpointed revenue materialization, so
    // it is invisible in the final plan and asserted implicitly by the
    // scan shape of the truncated frame.
    val q15 = planOf("q_join_tpch_q15")
    assert(!q15.contains("CartesianProduct"), s"q15 plans a cartesian:\n$q15")
    assert(q15.contains("BroadcastHashJoin"), s"q15 supplier dim not broadcast:\n$q15")
    // Q17: brand filter pushed AND broadcast; the decorrelated per-part avg
    // joins the fact on the uniform part key (equi-join only)
    val q17 = planOf("q_join_tpch_q17")
    assert(q17.contains("BroadcastHashJoin"), s"q17 brand-filtered part not broadcast:\n$q17")
    assert(q17.contains("EqualTo(p_brand,Brand#1)"), s"q17 brand filter not pushed:\n$q17")
    assert(!q17.contains("CartesianProduct") && !q17.contains("BroadcastNestedLoopJoin"),
      s"q17 plans a cartesian/nested-loop:\n$q17")
  }

  test("rank-filter top-k rewrites: group-limit sits BELOW the window (no vocab-sized single-task sort)") {
    // q_text_zipf ranks the whole VOCABULARY with an unpartitioned
    // row_number and keeps 20 rows; q_agg_mode keeps rn=1 per nation.
    // Catalyst's InferWindowGroupLimit / LimitPushDown must keep the
    // single-task stage k-sized — verified manually in round 17, pinned
    // here because one conf/version change away from silently feeding the
    // full vocabulary into one task.
    for (q <- Seq("q_text_zipf", "q_agg_mode")) {
      val p = planOf(q)
      assert(
        p.contains("WindowGroupLimit") || p.contains("TakeOrderedAndProject"),
        s"$q lost its group-limit-below-window rewrite (full frame into one window task):\n$p")
    }
    // q_top_movers is orderBy+limit — must plan as TakeOrderedAndProject
    // (per-partition top-k, driver k-merge), never a global range sort.
    val movers = planOf("q_top_movers")
    assert(movers.contains("TakeOrderedAndProject"),
      s"q_top_movers lost its TakeOrderedAndProject top-k:\n$movers")
    assert(!movers.contains("rangepartitioning"),
      s"q_top_movers plans a global sort where a top-k suffices:\n$movers")
  }

  test("round-9b shapes: entity resolution is blocked, weighted median shares one shuffle") {
    // entity resolution: candidates come from the BLOCK-key equi-join —
    // a cartesian over the record corpus would be the all-pairs failure
    val er = planOf("q_entity_resolution")
    assert(!er.contains("CartesianProduct"), s"q_entity_resolution plans a cartesian:\n$er")
    // weighted median: both windows (cumulative + total) must ride ONE
    // brand exchange — a second hash exchange on p_brand would mean the
    // window partitioning failed to reuse the shuffle
    val wm = planOf("q_weighted_median")
    val brandExchanges = "hashpartitioning\\(p_brand".r.findAllIn(wm).length
    assert(brandExchanges <= 1, s"q_weighted_median re-shuffles on brand ($brandExchanges):\n$wm")
    for (q <- Seq("q_slow_movers", "q_price_elasticity", "q_sku_xyz")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"$q should be pure aggregation (+broadcast):\n$p")
    }
  }
}
