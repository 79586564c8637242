package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.J — warehouse-maintenance and product-analytics operators:
  * SCD type-2 dimension build (full + incremental), changeset MERGE, funnel
  * conversion, cohort retention, equi-width histogram, per-group z-score
  * anomaly flagging, trailing-time-window rolling aggregates, a
  * bloom-prefiltered join, a one-pass data-quality profile, incremental
  * aggregate maintenance, TPC-H Q18, deterministic per-group reservoir
  * sampling, and the end-to-end semantic dedup decision. These are the
  * batch shapes a data-loader-style pipeline (the reference's domain) grows
  * into once history tracking and analytics land on the warehouse it feeds.
  *
  * Determinism contract (README): money/value columns go through exact
  * integer cents; float statistics (mean/stddev) are derived from exact
  * integer sums with the SAME arithmetic expression shape on both engines,
  * so each row's z-score is bit-identical; window orderings always carry a
  * unique tiebreaker column.
  */
object Analytics {
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Per-row discounted revenue as exact e4 integers (the README
    * integer-scaling rule) — the one rounding expression every TPC-H-shaped
    * revenue aggregate in this file must share, so a change to the rule
    * cannot silently diverge between queries. */
  private def revE4: Column =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + lit(0.5)).cast("long")

  /** Derived part-supplier catalog — the fixture schema has no partsupp
    * table, so the Q2/Q11/Q16 shapes derive it from the fact: per
    * (l_partkey, l_suppkey), the minimum observed unit price in exact
    * cents (the supply-cost proxy — IEEE double division spelled
    * identically in every oracle) and the total shipped quantity (the
    * availability proxy). ONE hash aggregate over the fact table, keyed on
    * the composite — partial aggregation absorbs most rows map-side, and
    * each consumer joins it on a subset of its own grouping key. */
  private def partSupp(s: SparkSession, dir: String): DataFrame =
    Fixtures
      .table(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        min(floor(col("l_extendedprice") / col("l_quantity") * 100 + lit(0.5)).cast("long"))
          .as("ps_cost_c"),
        sum(col("l_quantity").cast("long")).as("ps_qty"))

  /** SCD2 core shared by the full build and the incremental rebuild:
    * collapse consecutive duplicate states per user, derive
    * [valid_from, valid_to) via lead(). Expects (user_id, event_id,
    * event_type, ts) rows. */
  private def scd2(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changelog
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(
        col("user_id"),
        col("event_type").as("state"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Bounded-state per-key EWMA (alpha = 0.3) over (user_id, ts, event_id,
    * v_c) rows → (user_id, n_events, ewma_e6).
    *
    * The recursion e_i = 0.3·v_i + 0.7·e_(i-1) looks inherently sequential,
    * but each step is an AFFINE map e ↦ s·e + o, and affine maps compose
    * associatively: (s_f, o_f) ∘ (s_g, o_g) = (s_f·s_g, s_f·o_g + o_f). So
    * the fold distributes as a two-level reduction: (1) chunk each key's
    * sorted history into `chunkSize`-row segments (row_number — streamed by
    * the window sort, O(1) state) and fold every segment to ONE (s, o)
    * pair; (2) compose the model-sized pair list in segment order. Per-task
    * state is now bounded by `chunkSize` regardless of key skew — an
    * adversarial key with 10^8 events costs 10^8/chunkSize tiny pairs, not
    * one task's heap. Both groupBys reuse the window's hash(user_id)
    * partitioning (user_id ⊆ the grouping keys), so the whole thing is
    * still ONE shuffle.
    *
    * Determinism: segment 0 seeds with its first element (the map (0, v_1),
    * constant in e), so its local fold replays the oracle's seeded
    * list_reduce op-for-op; for keys within one chunk the result is
    * bit-identical to the sequential fold, and across chunks the only
    * reassociation is the final pair composition (~1e-15 relative, proven
    * hash-stable on the fixtures and tolerance-bounded in EwmaSpec). */
  private[graft] def ewmaAffine(events: DataFrame, chunkSize: Int): DataFrame = {
    require(chunkSize >= 2, s"chunkSize must be >= 2, got $chunkSize")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    def fld(c: Column, f: String) = c.getField(f)
    events
      .withColumn("seg", ((row_number().over(w) - lit(1)) / lit(chunkSize)).cast("int"))
      .groupBy("user_id", "seg")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("v_c")))).as("xs"))
      .select(
        col("user_id"),
        col("seg"),
        size(col("xs")).cast("long").as("cnt"),
        aggregate(
          when(col("seg") === 0, expr("slice(xs, 2, size(xs) - 1)")).otherwise(col("xs")),
          when(col("seg") === 0, struct(lit(0.0).as("s"), expr("CAST(element_at(xs, 1).v_c AS DOUBLE)").as("o")))
            .otherwise(struct(lit(1.0).as("s"), lit(0.0).as("o"))),
          (acc, x) =>
            struct(
              (lit(0.7) * fld(acc, "s")).as("s"),
              (lit(0.3) * x.getField("v_c").cast("double") + lit(0.7) * fld(acc, "o")).as("o"))).as("f"))
      .groupBy("user_id")
      .agg(sum("cnt").as("n_events"), sort_array(collect_list(struct(col("seg"), col("f")))).as("ps"))
      .select(
        col("user_id"),
        col("n_events"),
        floor(
          fld(
            aggregate(
              col("ps"),
              struct(lit(1.0).as("s"), lit(0.0).as("o")),
              (acc, x) =>
                struct(
                  (fld(fld(x, "f"), "s") * fld(acc, "s")).as("s"),
                  (fld(fld(x, "f"), "s") * fld(acc, "o") + fld(fld(x, "f"), "o")).as("o"))),
            "o") * 10000 + lit(0.5)).cast("long").as("ewma_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD type-2 dimension build from a changelog: collapse consecutive
    // duplicate states per user, then derive [valid_from, valid_to) validity
    // intervals via lead(); the open interval is the current row. Two
    // narrow window passes over the same (user, ts, event_id) sort — one
    // shuffle, reused by both windows (same partitioning + ordering). At
    // 100 TB the changelog is hash-partitioned by user_id and each user's
    // history sorts locally; no skew risk beyond a single entity's history.
    "q_scd2" -> { (s, dir) =>
      // Ordering carries (state, valid_to) past the (user_id, valid_from)
      // prefix: two state changes CAN share a timestamp (events tie on ts),
      // so the prefix alone is not unique and the ordered hash would depend
      // on each engine's tie order. valid_to needs an explicit NULLS FIRST —
      // Spark's ASC default — because DuckDB defaults to NULLS LAST.
      scd2(
        Fixtures
          .events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts")))
        .orderBy(col("user_id"), col("valid_from"), col("state"), col("valid_to").asc_nulls_first)
    },
    // Incremental SCD2 maintenance: when a delta batch arrives, ONLY the
    // keys it touches are rebuilt (their full per-key history re-derives —
    // per-key history is small; it's the key COUNT that is 100-TB-scale);
    // every untouched key's history rows pass through by anti-join,
    // unrecomputed. The oracle is the FULL rebuild, so the hash-match
    // proves incremental ≡ scratch — the q_agg_incremental argument applied
    // to versioned dimensions.
    "q_scd2_incremental" -> { (s, dir) =>
      val cutoff = lit("2024-01-30").cast("timestamp_ntz")
      val ev = Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val state = scd2(ev.filter(col("ts") < cutoff)) // "persisted" dim
      val touched = ev.filter(col("ts") >= cutoff).select("user_id").distinct()
      val untouched = state.join(touched, Seq("user_id"), "left_anti")
      val rebuilt = scd2(ev.join(touched, Seq("user_id"), "left_semi"))
      untouched
        .unionByName(rebuilt)
        .orderBy(col("user_id"), col("valid_from"), col("state"), col("valid_to").asc_nulls_first)
    },
    // Batch MERGE: apply a changeset (update / delete / insert ops) to a
    // snapshot, producing the next snapshot — the core upsert-maintenance
    // op of any incremental loader, spelled as one left join on the key
    // plus a union of the inserts. The changeset here is derived
    // deterministically from the snapshot itself (key mod 10) so the oracle
    // can rebuild it. Scale shape: equi-join on the snapshot key (broadcast
    // when the changeset is small, shuffle otherwise); never a driver loop.
    "q_merge_upsert" -> { (s, dir) =>
      val cust = Fixtures.table(s, dir, "customer")
      val base = cust.select(
        col("c_custkey"),
        col("c_name"),
        col("c_nationkey"),
        cents(col("c_acctbal")).as("bal_c"),
        col("c_mktsegment"))
      val upd = base
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("key"), lit("U").as("op"), (col("bal_c") + 10000L).as("new_bal_c"))
      val del = base
        .filter(col("c_custkey") % 10 === 1)
        .select(col("c_custkey").as("key"), lit("D").as("op"), lit(null).cast("long").as("new_bal_c"))
      val ins = base
        .filter(col("c_custkey") % 10 === 2)
        // Synthetic insert keys live at +1_000_000 — disjoint from real
        // customer keys only while max(c_custkey) < 1M, i.e. SF < ~7 (TPC-H
        // customer = 150k rows/SF). The fixtures top out at sf0.1 so the
        // constant is safe here; a production changeset carries its own keys
        // and never synthesizes them, so the bound is a fixture artifact.
        .select(
          (col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("Customer#new-"), col("c_custkey").cast("string")).as("c_name"),
          col("c_nationkey"),
          lit(0L).as("bal_c"),
          col("c_mktsegment"))
      val merged = base
        .join(upd.unionByName(del), base("c_custkey") === col("key"), "left")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(
          col("c_custkey"),
          col("c_name"),
          col("c_nationkey"),
          when(col("op") === "U", col("new_bal_c")).otherwise(col("bal_c")).as("bal_c"),
          col("c_mktsegment"))
      merged.unionByName(ins).orderBy("c_custkey")
    },
    // Funnel conversion: of all users, how many ever viewed, and how many
    // purchased within one hour of their FIRST view. Three one-row
    // aggregates cross-joined (each a broadcast of a single row) — the
    // per-user firstView aggregate is the only real shuffle; the purchase
    // probe joins on user_id and the time predicate filters inline.
    "q_funnel" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val firstView = ev
        .filter(col("event_type") === "view")
        .groupBy("user_id")
        .agg(min(col("ts")).as("t_view"))
      val converted = ev
        .filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("ts") >= col("t_view") && col("ts") <= col("t_view") + expr("INTERVAL 1 HOUR"))
        .select("user_id")
        .distinct()
      ev.agg(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(firstView.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
    },
    // Cohort retention: users grouped by first-active day; for day offsets
    // 0..7, how many of each cohort were active again. distinct (user, day)
    // first — it collapses the event volume BEFORE the self-join, the move
    // that keeps this linear at 100 TB (events >> users × days).
    "q_retention_cohort" -> { (s, dir) =>
      val act = Fixtures
        .events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val first = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      act
        .join(first, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
        .filter(col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    // Equi-width histogram (20 bins) over a measure: bounds come from a
    // one-row global agg broadcast back over the scan (no driver collect),
    // binning is pure BIGINT arithmetic — (x-min)*20 integer-div span —
    // so bin edges are engine-exact. Two passes over the column, both
    // column-pruned scans; the groupBy key space is 20 values.
    "q_histogram" -> { (s, dir) =>
      val x = Fixtures
        .table(s, dir, "lineitem")
        .select(cents(col("l_extendedprice")).as("x_c"))
      val mm = x.agg(min(col("x_c")).as("mn"), max(col("x_c")).as("mx"))
      x.crossJoin(broadcast(mm))
        .select(expr("(x_c - mn) * 20 div (mx - mn + 1)").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("bin")
    },
    // Per-group z-score anomaly flags. Mean and stddev are computed from
    // EXACT integer-cents sums (sum, sum-of-squares — both fit long
    // comfortably at these magnitudes) and only then combined in one fixed
    // double expression, so m/sd/z are bit-identical across engines and
    // partitionings — the shuffle-order float-sum hazard never arises.
    // z is reported as floor(z*1e4+0.5) (README integer-scaling rule).
    // Degenerate groups are excluded BEFORE the z division, and the guard
    // sits on the double RADICAND, not on sd after the sqrt: both engines
    // evaluate the identical IEEE expression for the radicand, so `rad > 0`
    // filters the same groups on both — n == 1 (no variance defined), zero
    // variance (rad = 0), AND the cancellation edge where huge same-valued
    // sums round the exact-integer variance to a tiny NEGATIVE double
    // (Spark's sqrt would yield NaN — which passes a `sd > 0` filter, NaN
    // sorts above all doubles — while DuckDB ERRORS on sqrt of a negative
    // before any later filter could apply).
    "q_anomaly_zscore" -> { (s, dir) =>
      val ev = Fixtures
        .events(s, dir)
        .select(col("event_id"), col("event_type"), cents(col("value")).as("value_c"))
      val stats = ev
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value_c")).as("s1"),
          sum(col("value_c") * col("value_c")).as("s2"))
        .filter(col("n") > 1)
        .withColumn(
          "rad",
          (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("n"))
            / (col("n") - 1))
        .filter(col("rad") > 0)
        .select(
          col("event_type"),
          (col("s1").cast("double") / col("n") / 100.0).as("m"),
          (sqrt(col("rad")) / 100.0).as("sd"))
      ev.join(broadcast(stats), "event_type")
        .withColumn(
          "z4",
          floor((col("value_c").cast("double") / 100.0 - col("m")) / col("sd") * 10000 + 0.5).cast("long"))
        .filter(abs(col("z4")) > 15000)
        .select(col("event_type"), col("event_id"), col("value_c"), col("z4"))
        .orderBy("event_type", "event_id")
    },
    // Trailing-TIME-window aggregates (the rolling-1h metric shape):
    // RANGE frame over integer epoch seconds — Spark's rangeBetween needs a
    // numeric ordering key, and flooring to whole seconds on BOTH engines
    // makes same-second events exact frame peers, so the aggregates are
    // order-independent. One window = one shuffle on the partition key.
    "q_win_time_range" -> { (s, dir) =>
      // NTZ has no direct long cast; NTZ→TIMESTAMP is exact under the UTC
      // session, and TIMESTAMP→long truncates to whole epoch seconds —
      // the same floor(epoch(ts)) the oracle orders by
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
      Fixtures
        .events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), cents(col("value")).as("v_c"))
        .select(
          col("user_id"),
          col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("v_c")).over(w).as("sum_1h_c"))
        .orderBy("user_id", "event_id")
    },
    // Semantic (embedding-space) dedup DECISION, end-to-end: exact-cosine
    // near-dup pairs over a bounded verification slice → connected
    // components → canonical = min vec_id per cluster. The hash-match vs a
    // recursive-CTE oracle proves pair generation (bit-matched cosine
    // expression), the CC loop, AND the canonical selection together. At
    // 100 TB the pair stage swaps to the banded cosine-LSH kernel
    // (q_cosine_lsh_pairs) feeding the SAME Components + selection — only
    // the candidate generator changes; the crossJoin here exists because
    // exactness is what makes the oracle possible.
    "q_dedup_semantic" -> { (s, dir) =>
      val e = Fixtures.table(s, dir, "embeddings").filter(col("vec_id") < 100)
      val pairs = e
        .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
        .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb")))
        .filter(col("a_id") < col("b_id"))
        .filter(SimKernel.cosine(col("a_emb"), col("b_emb")) >= 0.3)
        .select("a_id", "b_id")
      Components
        .connectedComponents(pairs, e.select("vec_id"), "vec_id")
        .select(
          col("id").as("vec_id"),
          col("comp"),
          (col("id") === col("comp")).cast("int").as("is_canonical"))
        .orderBy("vec_id")
    },
    // Deterministic fixed-size per-group sample ("reservoir" semantics,
    // reproducibly): rank rows inside each group by the md5 of their key
    // (a uniform pseudo-random order BOTH engines compute identically —
    // lowercase hex, same byte order) and keep the first k. Unlike the
    // rate-based q_sample_strat this guarantees EXACTLY min(k, |group|)
    // rows per group. One window over the group partitioning; the
    // WindowGroupLimit rewrite prunes each partition to k before the sort
    // completes.
    "q_sample_reservoir" -> { (s, dir) =>
      val w = Window
        .partitionBy("c_mktsegment")
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      Fixtures
        .table(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("c_mktsegment"), col("c_custkey"))
        .orderBy("c_mktsegment", "c_custkey")
    },
    // Incremental aggregate maintenance: merge yesterday's persisted agg
    // state with today's delta partial agg instead of recomputing history —
    // THE pattern that turns an O(history) daily batch into O(delta).
    // Correctness hinges on the merge being the aggregate's monoid combine
    // (count/sum add pointwise); the oracle recomputes from scratch, so the
    // hash-match proves state+delta ≡ full recompute. Both partials are
    // map-side-combinable groupBys; the merge is a full outer equi-join on
    // the group key (a group may exist in only one side).
    "q_agg_incremental" -> { (s, dir) =>
      val cutoff = lit("1997-01-01").cast("timestamp_ntz")
      val orders = Fixtures.table(s, dir, "orders")
      def part(df: DataFrame, n: String, sc: String) =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as(n), sum(cents(col("o_totalprice"))).as(sc))
      val state = part(orders.filter(col("o_orderdate") < cutoff), "n_old", "spend_old")
      val delta = part(orders.filter(col("o_orderdate") >= cutoff), "n_new", "spend_new")
      state
        .join(delta, Seq("o_orderstatus"), "full_outer")
        .select(
          col("o_orderstatus"),
          (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))).as("n"),
          (coalesce(col("spend_old"), lit(0L)) + coalesce(col("spend_new"), lit(0L))).as("spend_c"))
        .orderBy("o_orderstatus")
    },
    // TPC-H Q18 shape (large-volume customers): a HAVING-filtered aggregate
    // over the biggest fact table feeding a semi join back onto itself plus
    // two dimension joins. The having-agg is the only big shuffle. The
    // qualifying key set is deliberately NOT broadcast-hinted: its
    // cardinality scales with the fact table (a forced broadcast is an OOM
    // at 100×); AQE sees the post-HAVING size at runtime and picks a
    // broadcast join itself whenever the set is actually small — at this SF
    // the executed plan still shows BroadcastHashJoin (PlanShapeSpec).
    "q_join_tpch_q18" -> { (s, dir) =>
      val li = Fixtures.table(s, dir, "lineitem")
      val big = li
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      Fixtures
        .table(s, dir, "orders")
        .join(big, col("o_orderkey") === big("l_orderkey"))
        .join(Fixtures.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_name"),
          col("c_custkey"),
          col("o_orderkey"),
          col("o_orderdate"),
          cents(col("o_totalprice")).as("price_c"),
          col("sum_qty"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
    },
    // TPC-H Q3 shape (shipping priority): two selective date filters, a
    // three-table join chain, revenue agg, global top-10. Revenue is the
    // per-row double product scaled to e4 integers BEFORE summing (exact,
    // order-free); the limit rides on TakeOrderedAndProject, so only 10
    // rows per partition survive the final exchange.
    "q_join_tpch_q3" -> { (s, dir) =>
      val cut = lit("1995-03-15").cast("timestamp_ntz")
      val cust = Fixtures.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Fixtures.table(s, dir, "orders").filter(col("o_orderdate") < cut)
      val li = Fixtures.table(s, dir, "lineitem").filter(col("l_shipdate") > cut)
      ord
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
          sum(revE4).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(10)
    },
    // TPC-H Q10 shape (returned-items report): customers who returned the
    // most revenue in one quarter. Order of operations is the scale story:
    // both fact-side filters (quarter on orders, returnflag on lineitem) cut
    // BEFORE any join, the orders↔lineitem join is the only fact-fact
    // shuffle, customer arrives pre-projected (4 columns), and nation is an
    // explicit broadcast (25 rows at any SF). Top-20 rides
    // TakeOrderedAndProject with the unique c_custkey tiebreaker.
    "q_join_tpch_q10" -> { (s, dir) =>
      val lo = lit("1996-10-01").cast("timestamp_ntz")
      val hi = lit("1997-01-01").cast("timestamp_ntz")
      val ord = Fixtures
        .table(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val li = Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(
          col("l_orderkey"),
          revE4.as("rev_e4"))
      val cust = Fixtures
        .table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("bal_c"), col("c_nationkey"))
      val nat = Fixtures.table(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "bal_c", "n_name")
        .agg(sum(col("rev_e4")).as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    },
    // TPC-H Q7 shape (volume shipping between two nations): the classic
    // double-dimension-alias join — nation joined TWICE under different
    // roles (supplier side / customer side) with a symmetric pair predicate.
    // Each nation alias is pre-filtered to the two qualifying nations BEFORE
    // joining, so supplier and customer shrink ~2/25 before they ever touch
    // the fact table; the pair filter afterwards only removes same-nation
    // combos. Ship-year comes from the fact row (cast to BIGINT on both
    // engines — Spark's year() is INT, DuckDB's is BIGINT).
    "q_join_tpch_q7" -> { (s, dir) =>
      val lo = lit("1996-01-01").cast("timestamp_ntz")
      val hi = lit("1998-01-01").cast("timestamp_ntz")
      val nat = Fixtures
        .table(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = Fixtures
        .table(s, dir, "supplier")
        .join(
          broadcast(nat.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .select("s_suppkey", "supp_nation")
      val cus = Fixtures
        .table(s, dir, "customer")
        .join(
          broadcast(nat.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("c_nk"))
        .select("c_custkey", "cust_nation")
      val li = Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(
          col("l_orderkey"),
          col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          revE4.as("rev_e4"))
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Fixtures.table(s, dir, "orders").select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
        .join(cus, col("o_custkey") === col("c_custkey"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("rev_e4")).as("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    // TPC-H Q14 shape (promotion effect): share of one month's revenue
    // coming from promo parts — the conditional-aggregate-ratio report.
    // The month filter lands on the fact scan, part joins pre-projected to
    // two columns as an explicit broadcast (a genuine bounded dim), and
    // both sums come out of ONE aggregate over the joined rows (sum +
    // conditional sum share the pass). The ratio divides two exact e4
    // longs in a single double expression — bit-identical on both engines.
    "q_join_tpch_q14" -> { (s, dir) =>
      val lo = lit("1996-09-01").cast("timestamp_ntz")
      val hi = lit("1996-10-01").cast("timestamp_ntz")
      val li = Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(
          col("l_partkey"),
          revE4.as("rev_e4"))
      li.join(
          broadcast(Fixtures.table(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_e4")).otherwise(0L)).as("promo_e4"),
          sum(col("rev_e4")).as("total_e4"))
        .select(
          col("promo_e4"),
          col("total_e4"),
          floor(col("promo_e4").cast("double") / col("total_e4") * 1000000 + lit(0.5))
            .cast("long")
            .as("promo_share_e6"))
    },
    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    // OR-of-ANDs predicate spanning BOTH join sides — the optimizer must
    // factor the disjunction into single-side conjuncts (CNF extraction)
    // so each scan still gets a pushed filter (p_type IN (...) on part,
    // quantity bounds on lineitem) instead of evaluating the whole OR
    // post-join on the full cartesian of survivors. One aggregate row out.
    "q_join_tpch_q19" -> { (s, dir) =>
      val li = Fixtures
        .table(s, dir, "lineitem")
        .select(
          col("l_partkey"),
          col("l_quantity"),
          revE4.as("rev_e4"))
      li.join(
          broadcast(Fixtures.table(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_type") === "PROMO" && col("l_quantity").between(1, 15)) ||
            (col("p_type") === "ECONOMY" && col("l_quantity").between(20, 35)) ||
            (col("p_type") === "STANDARD" && col("l_quantity").between(40, 50)))
        .agg(count(lit(1)).as("n"), sum(col("rev_e4")).as("revenue_e4"))
    },
    // Gap-rule sessionization with EXPLICIT session ids — the cumulative-sum
    // idiom: flag rows whose gap from the previous event exceeds 30 min,
    // then a running sum of flags numbers the sessions. Unlike the
    // session_window aggregate rows (q_stream_session), the assigned
    // (user_id, sess_seq) key is JOINABLE — downstream attribution can
    // reference the session. Both windows share one (user_id) shuffle and
    // one (ts, event_id) sort; gaps compare whole epoch seconds so
    // same-second events are engine-exact frame peers.
    "q_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Fixtures
        .events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn(
          "new_sess",
          (col("prev_ts").isNull ||
            col("ts").cast("timestamp").cast("long") - col("prev_ts").cast("timestamp").cast("long") > 1800)
            .cast("int"))
        .withColumn("sess_seq", sum("new_sess").over(w))
        .groupBy("user_id", "sess_seq")
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        .orderBy("user_id", "sess_seq")
    },
    // Per-key exponential smoothing (EWMA, alpha = 0.3) — the classic
    // time-series baseline metric, via the bounded-state two-level affine
    // fold in [[ewmaAffine]]: no task ever holds a full key history, only
    // fixed-size chunks plus one model-sized (scale, offset) pair per
    // chunk. Chunk size 32 deliberately puts the FIXTURE keys (max 86
    // events) on the multi-chunk path, so the oracle hash-match exercises
    // the composition, not just the single-chunk fast path.
    "q_ts_ewma" -> { (s, dir) =>
      ewmaAffine(
        Fixtures
          .events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), cents(col("value")).as("v_c")),
        chunkSize = 32)
        .orderBy("user_id")
    },
    // Replica reconciliation by bucket digest — how a loader verifies a
    // 100-TB copy without moving the data: each side aggregates a content
    // digest (sum of 48-bit md5-prefix row hashes — order-independent by
    // integer addition) per key bucket, then ONLY the 64-row digest frames
    // cross the network and join. A mismatched bucket pinpoints where to
    // re-sync; matched buckets prove equality with overwhelming
    // probability. The "target" here is a deterministic perturbation of
    // the source (drift on keys %97, loss on keys %101) so the oracle can
    // rebuild both sides.
    "q_table_diff" -> { (s, dir) =>
      val base = Fixtures
        .table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("bal_c"))
      val target = base
        .filter(col("c_custkey") % 101 =!= 0)
        .withColumn(
          "bal_c",
          when(col("c_custkey") % 97 === 0, col("bal_c") + 5000L).otherwise(col("bal_c")))
      def digest(df: DataFrame, nCol: String, dCol: String): DataFrame = df
        .withColumn("bucket", pmod(col("c_custkey"), lit(64L)))
        .withColumn(
          "h",
          conv(substring(md5(concat_ws("|", col("c_custkey"), col("c_name"), col("bal_c"))), 1, 12), 16, 10)
            .cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(nCol), sum(col("h")).as(dCol))
      digest(base, "src_n", "src_digest")
        .join(digest(target, "tgt_n", "tgt_digest"), Seq("bucket"), "full_outer")
        .select(
          col("bucket"),
          coalesce(col("src_n"), lit(0L)).as("src_n"),
          coalesce(col("tgt_n"), lit(0L)).as("tgt_n"),
          col("src_digest"),
          col("tgt_digest"),
          (col("src_digest") <=> col("tgt_digest")).cast("int").as("is_match"))
        .orderBy("bucket")
    },
    // TPC-H Q13 shape (customer order-count distribution): LEFT join so
    // zero-order customers keep their bucket, then aggregate-of-an-
    // aggregate — group customers by their order count, then count
    // customers per bucket. Two shuffles by construction (per-customer,
    // then per-count); the second input is already one row per customer,
    // so the re-shuffle is the small side. count(o_orderkey) (not
    // count(*)) makes the no-order customer count 0, not 1 — the classic
    // outer-join-count trap, identical in the oracle.
    "q_join_tpch_q13" -> { (s, dir) =>
      val cust = Fixtures.table(s, dir, "customer").select("c_custkey")
      val ord = Fixtures.table(s, dir, "orders").select("o_custkey", "o_orderkey")
      cust
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    // TPC-H Q21 shape (suppliers who kept orders waiting) — the hardest
    // classic correlated shape: a double-correlated self-join on the fact
    // table. l1 = this supplier's problem lines ("late" here is
    // l_returnflag = 'R'; the fixture has no receipt/commit dates) on
    // finalized orders; EXISTS another supplier on the same order
    // (left-semi); NOT EXISTS another supplier ALSO late on it (left-anti)
    // — i.e. this supplier is the sole cause. Spark-first: semi/anti joins
    // ARE Catalyst's decorrelation of EXISTS/NOT EXISTS, and all three
    // lineitem branches shuffle on the same l_orderkey key, so they
    // co-partition (no cartesian anywhere — PlanShapeSpec asserts it). The
    // nation→supplier side collapses to a broadcast before touching the
    // fact table, so the fact rows are filtered map-side first.
    "q_join_tpch_q21" -> { (s, dir) =>
      val li = Fixtures.table(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
      val late = li.filter(col("l_returnflag") === "R").select("l_orderkey", "l_suppkey")
      val fOrd = Fixtures.table(s, dir, "orders").filter(col("o_orderstatus") === "F").select("o_orderkey")
      val supp = Fixtures
        .table(s, dir, "supplier")
        .join(
          broadcast(Fixtures.table(s, dir, "nation").filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      late
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(fOrd, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(
          li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2")),
          col("l_orderkey") === col("k2") && col("s2") =!= col("l_suppkey"),
          "left_semi")
        .join(
          late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3")),
          col("l_orderkey") === col("k3") && col("s3") =!= col("l_suppkey"),
          "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },
    // TPC-H Q22 shape (global-market opportunity): customers from a country
    // subset with above-average positive balances and no RECENT order —
    // every fixture customer has ordered at some point, so the classic
    // "never ordered" predicate is adapted to "dormant since 2000-07-01"
    // (same anti-join decorrelation, non-empty result). The scalar-avg
    // subquery is a 1-row broadcast (exact integer cents sum ÷ count,
    // double division spelled identically in the oracle), the dormancy
    // predicate is a left-anti join on o_custkey — NOT EXISTS, not NOT IN,
    // so a NULL custkey could never vacuum the result. The country code is
    // c_nationkey (the fixture has no c_phone). The date filter lands
    // BEFORE the anti-join shuffle (pushed to the orders scan).
    "q_join_tpch_q22" -> { (s, dir) =>
      val cust = Fixtures
        .table(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7))
        .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"))
      val avgBal = cust
        .filter(col("bal_c") > 0)
        .agg((sum("bal_c").cast("double") / count(lit(1))).as("avg_bal"))
      cust
        .crossJoin(broadcast(avgBal))
        .filter(col("bal_c").cast("double") > col("avg_bal"))
        .join(
          Fixtures
            .table(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp_ntz"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"),
          "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
        .orderBy("c_nationkey")
    },
    // TPC-H Q4 shape (order priority checking): orders in one quarter with
    // at least one problem line ("late" = l_returnflag='R'; no
    // commit/receipt dates in the fixture), counted by priority. EXISTS ≡
    // left-semi join on l_orderkey; the date filter prunes the orders scan
    // BEFORE the semi-join shuffle, and the lineitem side carries only the
    // key column after its own pushed filter.
    "q_join_tpch_q4" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1996-07-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1996-10-01").cast("timestamp_ntz"))
        .join(
          Fixtures.table(s, dir, "lineitem").filter(col("l_returnflag") === "R").select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    // TPC-H Q6 shape (forecasting revenue change): pure scan-side
    // predicates + one global sum — the canonical pushdown/codegen
    // microbenchmark. Every predicate reaches the parquet scan; revenue is
    // the exact e4 integer rule shared with the other revenue aggregates.
    "q_join_tpch_q6" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
        .agg(
          sum(floor(col("l_extendedprice") * col("l_discount") * 10000 + lit(0.5)).cast("long"))
            .as("revenue_e4"),
          count(lit(1)).as("n_rows"))
    },
    // TPC-H Q8 shape (national market share): the widest classic join tree
    // expressible on this schema — fact × part × supplier × orders ×
    // customer × nation×2 × region, then share-of-total per year. All
    // dims broadcast (each is model-sized next to lineitem); the two
    // nation roles use separate aliases. The share divides two exact e4
    // sums from ONE aggregate pass (conditional + total), like Q14.
    "q_join_tpch_q8" -> { (s, dir) =>
      val li = Fixtures.table(s, dir, "lineitem")
      val part = Fixtures.table(s, dir, "part").filter(col("p_type") === "PROMO").select("p_partkey")
      val supp = Fixtures.table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = Fixtures
        .table(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val cust = Fixtures.table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n1 = Fixtures.table(s, dir, "nation").select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val n2 = Fixtures
        .table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val reg = Fixtures.table(s, dir, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"), revE4.as("vol_e4"), col("supp_nation"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_2", col("vol_e4")).otherwise(0L)).as("nation_e4"),
          sum(col("vol_e4")).as("total_e4"))
        .select(
          col("o_year"),
          col("nation_e4"),
          col("total_e4"),
          floor(col("nation_e4").cast("double") / col("total_e4") * 1e6 + lit(0.5))
            .cast("long")
            .as("mkt_share_e6"))
        .orderBy("o_year")
    },
    // TPC-H Q15 shape (top supplier): quarterly revenue per supplier, keep
    // the max — the scalar-max-over-derived-view pattern. The revenue view
    // is checkpointed: both its consumers (the 1-row max and the equality
    // filter) read the materialization instead of re-scanning lineitem,
    // and the max arrives as a broadcast 1-row frame.
    "q_join_tpch_q15" -> { (s, dir) =>
      val rev = Checkpoints.truncate(
        Fixtures
          .table(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revE4).as("total_rev_e4")))
      val mx = rev.agg(max("total_rev_e4").as("max_rev_e4"))
      rev
        .crossJoin(broadcast(mx))
        .filter(col("total_rev_e4") === col("max_rev_e4"))
        .join(broadcast(Fixtures.table(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
        .orderBy("s_suppkey")
    },
    // TPC-H Q17 shape (small-quantity-order revenue): lines of one brand
    // below 20% of their part's average quantity — the per-group-average
    // correlated subquery, decorrelated into a per-part aggregate joined
    // back to the fact. The avg join is keyed on l_partkey (uniform); the
    // threshold compares via one double expression spelled identically in
    // the oracle (exact integer sum / count).
    "q_join_tpch_q17" -> { (s, dir) =>
      val li = Fixtures.table(s, dir, "lineitem")
      val pq = li
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("qsum"), count(lit(1)).as("qn"))
      li.join(broadcast(Fixtures.table(s, dir, "part").filter(col("p_brand") === "Brand#1").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(pq, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * (col("qsum").cast("double") / col("qn")))
        .agg(
          sum(cents(col("l_extendedprice"))).as("price_c_sum"),
          count(lit(1)).as("n_rows"))
    },
    // TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    // the EUROPE supplier(s) achieving the region-minimum supply cost —
    // the classic correlated-min subquery, decorrelated into a per-part
    // min aggregate joined back on (part, cost). The supplier→nation→
    // region chain collapses to one broadcast before touching the derived
    // catalog ([[partSupp]] — no partsupp table in the fixture), the part
    // filter broadcasts too, and the filtered catalog is CHECKPOINTED so
    // its two consumers (min calc + equality probe) read one
    // materialization instead of re-aggregating the fact twice. The sort
    // key (bal desc, name, part) is a unique total order, so the LIMIT
    // cannot tie-break nondeterministically.
    "q_join_tpch_q2" -> { (s, dir) =>
      val eun = Fixtures
        .table(s, dir, "nation")
        .join(
          broadcast(Fixtures.table(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = Fixtures
        .table(s, dir, "supplier")
        .join(broadcast(eun), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), cents(col("s_acctbal")).as("bal_c"), col("n_name"))
      val pt = Fixtures
        .table(s, dir, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select("p_partkey")
      val ps = Checkpoints.truncate(
        partSupp(s, dir)
          .join(broadcast(pt), col("ps_partkey") === col("p_partkey"), "left_semi")
          .join(broadcast(sup.select("s_suppkey")), col("ps_suppkey") === col("s_suppkey"), "left_semi")
          .select("ps_partkey", "ps_suppkey", "ps_cost_c"))
      val minc = ps.groupBy(col("ps_partkey").as("mk")).agg(min("ps_cost_c").as("min_c"))
      ps.join(minc, col("ps_partkey") === col("mk") && col("ps_cost_c") === col("min_c"))
        .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
        .select(
          col("bal_c"),
          col("s_name"),
          col("n_name"),
          col("ps_partkey").as("p_partkey"),
          col("ps_cost_c").as("cost_c"))
        .orderBy(col("bal_c").desc, col("s_name"), col("p_partkey"))
        .limit(100)
    },
    // TPC-H Q9 shape (product-type profit by nation/year): profit =
    // discounted revenue minus a supply cost of HALF the part's list price
    // per unit (retail cents × 50 = e4-scale half-retail — the fixture has
    // no ps_supplycost), summed by supplier nation and order year in exact
    // longs. part is name-filtered BEFORE its broadcast; supplier/nation
    // broadcast; orders is the only fact-fact shuffle (l_orderkey), the
    // same co-partitioning story as Q8.
    "q_join_tpch_q9" -> { (s, dir) =>
      val pt = Fixtures
        .table(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
      val sup = Fixtures.table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = Fixtures.table(s, dir, "nation").select("n_nationkey", "n_name")
      val ord = Fixtures.table(s, dir, "orders").select("o_orderkey", "o_orderdate")
      Fixtures
        .table(s, dir, "lineitem")
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          (revE4 - col("l_quantity").cast("long") * col("retail_c") * lit(50L)).as("amount_e4"))
        .groupBy("nation", "o_year")
        .agg(sum("amount_e4").as("profit_e4"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    // TPC-H Q11 shape (important stock): each part's inventory value held
    // by ONE nation's suppliers as a share of that nation's total, keeping
    // parts above TWICE THE MEAN part value. The official query's fixed
    // fraction is divided by SF precisely because a constant share empties
    // as the part count grows — anchoring to the mean makes the threshold
    // scale-free (~10% of parts qualify at every fixture SF). Value =
    // shipped quantity × min unit cost from [[partSupp]], in exact e2
    // longs; the scalar (total, count) pair arrives as a broadcast 1-row
    // aggregate and the threshold compares value·n > 2·total in pure
    // integers — no float fraction at any scale.
    "q_join_tpch_q11" -> { (s, dir) =>
      val sup = Fixtures
        .table(s, dir, "supplier")
        .join(
          broadcast(Fixtures.table(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val byPart = partSupp(s, dir)
        .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("ps_partkey"), (col("ps_qty") * col("ps_cost_c")).as("val_e2"))
        .groupBy(col("ps_partkey").as("p_partkey"))
        .agg(sum("val_e2").as("value_e2"))
      val tot = byPart.agg(sum("value_e2").as("tot_e2"), count(lit(1)).as("n_parts"))
      byPart
        .crossJoin(broadcast(tot))
        .filter(col("value_e2") * col("n_parts") > col("tot_e2") * lit(2L))
        .select("p_partkey", "value_e2")
        .orderBy(col("value_e2").desc, col("p_partkey"))
    },
    // TPC-H Q12 shape (shipping-mode priority audit): per line status (the
    // fixture's mode stand-in — no l_shipmode/commit/receipt dates), count
    // high- vs low-priority orders among 1997's LATE shipments (shipped
    // more than 60 days after ordering). The date window prunes the
    // lineitem scan BEFORE the one orders⋈lineitem shuffle; the lateness
    // predicate references both sides so it runs as the join's residual;
    // the CASE-sum pair aggregates in a single pass like the official
    // query.
    "q_join_tpch_q12" -> { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Fixtures
        .table(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(
          Fixtures.table(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    // TPC-H Q16 shape (supplier count by part descriptor): distinct
    // suppliers offering parts of each (brand, type, size) combo, minus
    // one brand, one type family, a size whitelist, and "complaint"
    // suppliers (negative balance — the fixture's stand-in for the
    // comment-LIKE exclusion). Both exclusions prune map-side off
    // broadcasts (the supplier one as an ANTI join — NOT IN with a NULL
    // key could never vacuum the result); the distinct-count shuffles once
    // on the descriptor triple.
    "q_join_tpch_q16" -> { (s, dir) =>
      val bad = Fixtures.table(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
      val pt = Fixtures
        .table(s, dir, "part")
        .filter(
          col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      partSupp(s, dir)
        .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(pt), col("ps_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    // TPC-H Q20 shape (excess-inventory suppliers): suppliers in one
    // nation holding an "excess" position — for some red-named part they
    // supply, MORE than half the all-time shipped quantity moved in 1997
    // alone (the availqty > 0.5·shipped analog, derived entirely from the
    // fact; nation/pattern chosen non-empty at every fixture SF). The per-(part,supp) aggregate computes both legs in one pass
    // and compares 2·q97 > q_all in longs; the qualifying pair set reaches
    // supplier as a LEFT-SEMI join (IN ≡ semi), name-ordered output.
    "q_join_tpch_q20" -> { (s, dir) =>
      val redParts =
        Fixtures.table(s, dir, "part").filter(col("p_name").like("%red%")).select("p_partkey")
      val excess = Fixtures
        .table(s, dir, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(col("l_quantity").cast("long")).as("q_all"),
          sum(
            when(
              col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"),
              col("l_quantity").cast("long")).otherwise(0L)).as("q_97"))
        .filter(col("q_97") * 2 > col("q_all"))
        .select(col("l_suppkey"))
      Fixtures
        .table(s, dir, "supplier")
        .join(
          broadcast(Fixtures.table(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), cents(col("s_acctbal")).as("bal_c"))
        .orderBy("s_name")
    },
    // Referential-integrity audit — the post-batch FK check a loader runs
    // before publishing: per relation, how many child rows reference a
    // missing parent. Each relation is ONE anti-join (broadcast when the
    // parent is a dim, shuffle for fact→fact) collapsing to a single
    // count; the five one-row frames union driver-free. Anti-join
    // semantics (a NULL fk counts as an orphan) are mirrored in the oracle
    // with NOT EXISTS — NOT IN would silently drop NULL-keyed rows.
    // lineitem feeds TWO audits (orders + part), so its two FK columns are
    // projected once and checkpointed — ONE pass over the 100-TB fact
    // table instead of two, and the checkpointed frame is 2 longs/row.
    "q_fk_orphans" -> { (s, dir) =>
      def audit(rel: String, child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
        child
          .join(parent, child(fk) === parent(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_orphans"))
      val li = Checkpoints.truncate(Fixtures.table(s, dir, "lineitem").select("l_orderkey", "l_partkey"))
      val ord = Fixtures.table(s, dir, "orders")
      val cust = Fixtures.table(s, dir, "customer")
      val nat = Fixtures.table(s, dir, "nation")
      Seq(
        audit("customer->nation", cust, "c_nationkey", nat, "n_nationkey"),
        audit("lineitem->orders", li, "l_orderkey", ord, "o_orderkey"),
        audit("lineitem->part", li, "l_partkey", Fixtures.table(s, dir, "part"), "p_partkey"),
        audit("orders->customer", ord, "o_custkey", cust, "c_custkey"),
        audit("supplier->nation", Fixtures.table(s, dir, "supplier"), "s_nationkey", nat, "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy("relation")
    },
    // Distribution-drift report (Population Stability Index) between two
    // time periods — the shift detector an ML data pipeline runs before
    // trusting a new batch. Bins are the q_histogram pure-BIGINT equi-width
    // rule (engine-exact edges from a broadcast 1-row min/max agg); each
    // bin's PSI contribution (pA-pB)·ln(pA/pB) is computed in ONE fixed
    // double expression from exact integer counts and e9-scaled to an
    // integer PER BIN, so no cross-bin float summation order exists at
    // all — the report IS the per-bin table. Bins empty on either side are
    // excluded by the identical predicate on both engines (ln would be
    // ±inf).
    "q_drift_psi" -> { (s, dir) =>
      val cut = lit("1998-01-01").cast("timestamp_ntz")
      val o = Fixtures
        .table(s, dir, "orders")
        .select((col("o_orderdate") < cut).cast("int").as("is_a"), cents(col("o_totalprice")).as("p_c"))
      val mm = o.agg(min(col("p_c")).as("mn"), max(col("p_c")).as("mx"))
      val g = o
        .crossJoin(broadcast(mm))
        .select(col("is_a"), expr("(p_c - mn) * 10 div (mx - mn + 1)").as("bin"))
        .groupBy("bin")
        .agg(sum(col("is_a")).as("n_a"), sum(lit(1) - col("is_a")).as("n_b"))
      val tot = g.agg(sum(col("n_a")).as("na_tot"), sum(col("n_b")).as("nb_tot"))
      g.crossJoin(broadcast(tot))
        .filter(col("n_a") > 0 && col("n_b") > 0)
        .select(
          col("bin"),
          col("n_a"),
          col("n_b"),
          floor(
            (col("n_a").cast("double") / col("na_tot") - col("n_b").cast("double") / col("nb_tot")) *
              log((col("n_a").cast("double") / col("na_tot")) / (col("n_b").cast("double") / col("nb_tot"))) *
              1e9 + lit(0.5)).cast("long").as("psi_e9"))
        .orderBy("bin")
    },
    // Data-quality profile: per-column row/null/distinct counts — the QA
    // report a loader emits after every batch. ONE pass: a single agg row
    // of count + per-column count/countDistinct (Catalyst plans the
    // multi-distinct via Expand — rows × #columns, one shuffle), then a
    // stack() unpivot to one row per column. Exact distincts are the
    // costly-but-demanded shape here; the approximate twin is
    // approx_count_distinct (cap_agg_approx).
    "q_profile" -> { (s, dir) =>
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c =>
          Seq(count(col(c)).as(s"cnt_$c"), countDistinct(col(c)).as(s"dst_$c")))
      val one = Fixtures.table(s, dir, "customer").agg(aggs.head, aggs.tail: _*)
      val stackExpr = cols
        .map(c => s"'$c', cnt_$c, dst_$c")
        .mkString(s"stack(${cols.size}, ", ", ", ") as (col_name, n_present, n_distinct)")
      one
        .select(col("n_rows"), expr(stackExpr))
        .select(
          col("col_name"),
          col("n_rows"),
          (col("n_rows") - col("n_present")).as("n_null"),
          col("n_distinct"))
        .orderBy("col_name")
    },
    // Bloom-prefiltered dimension join: build a bloom filter over the
    // (filtered) dimension keys — a model-sized driver sketch, like
    // Spark's own runtime row-level filtering — broadcast it, and drop
    // non-matching fact rows BEFORE the join shuffle. False positives are
    // harmless: the exact equi-join re-verifies every survivor, so the
    // result equals the plain join (that is the oracle). At 100 TB this is
    // the difference between shuffling the whole fact table and shuffling
    // the ~10% that can match.
    "q_join_bloom" -> { (s, dir) =>
      val dim = Fixtures.table(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val bf = dim.stat.bloomFilter("p_partkey", 100000L, 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      // The probe must be a UDF: Spark's BloomFilterMightContain expression
      // is internal-only (no public Column/SQL surface binds a pre-built
      // sketch to it), so `bf.mightContainLong` via udf() is the ONLY
      // user-level probe. The broadcast keeps it one sketch per executor,
      // and the config-level twin (cap_runtime_filter) proves the built-in
      // codegen'd path where the optimizer injects the filter itself.
      val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
      Fixtures
        .table(s, dir, "lineitem")
        .filter(mightContain(col("l_partkey")))
        .join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(cents(col("l_extendedprice"))).as("rev_c"))
        .orderBy("p_brand")
    }
  )

  private val evCte =
    "WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c FROM events)"

  private val scd2Sql: String =
    evCte +
      ", c AS (SELECT user_id, event_id, event_type, ts, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e)" +
      ", f AS (SELECT user_id, event_id, event_type, ts FROM c WHERE prev IS NULL OR prev <> event_type)" +
      ", v AS (SELECT user_id, event_type AS state, ts AS valid_from, lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to FROM f) " +
      "SELECT user_id, state, valid_from, valid_to, CAST(valid_to IS NULL AS INTEGER) AS is_current FROM v ORDER BY user_id, valid_from, state, valid_to NULLS FIRST"

  val oracle: Map[String, String] = Map(
    "q_scd2" -> scd2Sql,
    // incremental maintenance must land EXACTLY the full rebuild — the
    // same oracle SQL is the whole point of the check
    "q_scd2_incremental" -> scd2Sql,
    "q_merge_upsert" ->
      ("WITH base AS (SELECT c_custkey, c_name, c_nationkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c, c_mktsegment FROM customer), " +
        "upd AS (SELECT c_custkey AS key, 'U' AS op, bal_c + 10000 AS new_bal_c FROM base WHERE c_custkey % 10 = 0), " +
        "del AS (SELECT c_custkey AS key, 'D' AS op, CAST(NULL AS BIGINT) AS new_bal_c FROM base WHERE c_custkey % 10 = 1), " +
        "ch AS (SELECT * FROM upd UNION ALL SELECT * FROM del), " +
        "ins AS (SELECT c_custkey + 1000000 AS c_custkey, 'Customer#new-' || CAST(c_custkey AS VARCHAR) AS c_name, c_nationkey, CAST(0 AS BIGINT) AS bal_c, c_mktsegment FROM base WHERE c_custkey % 10 = 2), " +
        "merged AS (SELECT b.c_custkey, b.c_name, b.c_nationkey, CASE WHEN ch.op = 'U' THEN ch.new_bal_c ELSE b.bal_c END AS bal_c, b.c_mktsegment " +
        "FROM base b LEFT JOIN ch ON b.c_custkey = ch.key WHERE ch.op IS NULL OR ch.op <> 'D') " +
        "SELECT * FROM merged UNION ALL SELECT * FROM ins ORDER BY c_custkey"),
    "q_funnel" ->
      (evCte +
        ", fv AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id)" +
        ", conv AS (SELECT DISTINCT p.user_id FROM e p JOIN fv ON p.user_id = fv.user_id " +
        "WHERE p.event_type = 'purchase' AND p.ts >= fv.t_view AND p.ts <= fv.t_view + INTERVAL 1 HOUR) " +
        "SELECT CAST((SELECT count(DISTINCT user_id) FROM e) AS BIGINT) AS n_users, " +
        "CAST((SELECT count(*) FROM fv) AS BIGINT) AS n_viewed, " +
        "CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted"),
    "q_retention_cohort" ->
      (evCte +
        ", act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM e)" +
        ", f AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id) " +
        "SELECT f.cohort_day, CAST(act.day - f.cohort_day AS BIGINT) AS day_offset, CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users " +
        "FROM act JOIN f ON act.user_id = f.user_id WHERE act.day - f.cohort_day BETWEEN 0 AND 7 " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_histogram" ->
      ("WITH x AS (SELECT CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS x_c FROM lineitem), " +
        "mm AS (SELECT min(x_c) AS mn, max(x_c) AS mx FROM x) " +
        "SELECT (x_c - mn) * 20 // (mx - mn + 1) AS bin, CAST(count(*) AS BIGINT) AS n " +
        "FROM x CROSS JOIN mm GROUP BY bin ORDER BY bin"),
    "q_anomaly_zscore" ->
      (evCte +
        ", st AS (SELECT event_type, count(*) AS n, sum(value_c) AS s1, sum(value_c*value_c) AS s2 FROM e GROUP BY event_type)" +
        ", rd AS (SELECT event_type, n, s1, (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n)/(n-1) AS rad FROM st WHERE n > 1)" +
        ", sd AS (SELECT event_type, CAST(s1 AS DOUBLE)/n/100.0 AS m, sqrt(rad)/100.0 AS sd FROM rd WHERE rad > 0)" +
        ", z AS (SELECT e.event_type, e.event_id, e.value_c, CAST(floor((CAST(e.value_c AS DOUBLE)/100.0 - sd.m)/sd.sd*10000 + 0.5) AS BIGINT) AS z4 FROM e JOIN sd ON e.event_type = sd.event_type) " +
        "SELECT event_type, event_id, value_c, z4 FROM z WHERE abs(z4) > 15000 ORDER BY event_type, event_id"),
    "q_join_bloom" ->
      ("SELECT p_brand, CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_type = 'ECONOMY' " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "q_win_time_range" ->
      (evCte +
        " SELECT user_id, event_id, CAST(count(*) OVER w AS BIGINT) AS n_1h, CAST(sum(value_c) OVER w AS BIGINT) AS sum_1h_c " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),
    "q_dedup_semantic" ->
      ("WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100), " +
        "pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM e a, e b WHERE a.vec_id < b.vec_id AND " +
        SimKernel.cosSql("a.embedding", "b.embedding") + " >= 0.3), " +
        "ed AS (SELECT a_id AS s2, b_id AS d FROM pr UNION ALL SELECT b_id, a_id FROM pr), " +
        "reach(node, m) AS (SELECT vec_id, vec_id FROM e UNION SELECT ed.s2, r.m FROM ed JOIN reach r ON ed.d = r.node) " +
        "SELECT node AS vec_id, CAST(min(m) AS BIGINT) AS comp, CAST(node = min(m) AS INT) AS is_canonical " +
        "FROM reach GROUP BY node ORDER BY vec_id"),
    "q_sample_reservoir" ->
      ("WITH r AS (SELECT c_mktsegment, c_custkey, " +
        "row_number() OVER (PARTITION BY c_mktsegment ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn " +
        "FROM customer) " +
        "SELECT c_mktsegment, c_custkey FROM r WHERE rn <= 20 ORDER BY c_mktsegment, c_custkey"),
    "q_agg_incremental" ->
      ("SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_c " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "q_join_tpch_q18" ->
      ("WITH big AS (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
        "FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250) " +
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, " +
        "CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_c, sum_qty " +
        "FROM orders JOIN big ON o_orderkey = big.l_orderkey JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY price_c DESC, o_orderkey"),
    "q_join_tpch_q3" ->
      ("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
        "CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4 " +
        "FROM orders JOIN customer ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10"),
    "q_join_tpch_q10" ->
      ("SELECT c_custkey, c_name, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c, n_name, " +
        "CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4 " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
        "ORDER BY revenue_e4 DESC, c_custkey LIMIT 20"),
    "q_join_tpch_q13" ->
      ("SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM " +
        "(SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "q_join_tpch_q21" ->
      ("SELECT s_name, CAST(count(*) AS BIGINT) AS numwait " +
        "FROM supplier, lineitem l1, orders, nation " +
        "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey " +
        "AND o_orderstatus = 'F' AND l1.l_returnflag = 'R' " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') " +
        "AND s_nationkey = n_nationkey AND n_name = 'NATION_1' " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name"),
    "q_join_tpch_q4" ->
      ("SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_join_tpch_q6" ->
      ("SELECT CAST(sum(CAST(floor(l_extendedprice*l_discount*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4, " +
        "CAST(count(*) AS BIGINT) AS n_rows FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24"),
    "q_join_tpch_q8" ->
      ("WITH v AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT) AS vol_e4, n2.n_name AS supp_nation " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey JOIN region ON n1.n_regionkey = r_regionkey " +
        "JOIN supplier ON l_suppkey = s_suppkey JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE p_type = 'PROMO' AND r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01') " +
        "SELECT o_year, CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol_e4 ELSE 0 END) AS BIGINT) AS nation_e4, " +
        "CAST(sum(vol_e4) AS BIGINT) AS total_e4, " +
        "CAST(floor(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol_e4 ELSE 0 END) AS DOUBLE)/sum(vol_e4)*1000000 + 0.5) AS BIGINT) AS mkt_share_e6 " +
        "FROM v GROUP BY o_year ORDER BY o_year"),
    "q_join_tpch_q15" ->
      ("WITH rev AS (SELECT l_suppkey, CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev_e4 " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, total_rev_e4 FROM supplier JOIN rev ON s_suppkey = l_suppkey " +
        "WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev) ORDER BY s_suppkey"),
    "q_join_tpch_q17" ->
      ("WITH pq AS (SELECT l_partkey AS pk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum, CAST(count(*) AS BIGINT) AS qn FROM lineitem GROUP BY 1) " +
        "SELECT CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS price_c_sum, CAST(count(*) AS BIGINT) AS n_rows " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey JOIN pq ON l_partkey = pk " +
        "WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * (CAST(qsum AS DOUBLE)/qn)"),
    "q_join_tpch_q2" ->
      ("WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, " +
        "CAST(min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ps_cost_c " +
        "FROM lineitem GROUP BY 1, 2), " +
        "eu AS (SELECT s_suppkey, s_name, CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS bal_c, n_name " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'EUROPE'), " +
        "pp AS (SELECT ps_partkey, ps_suppkey, ps_cost_c FROM ps " +
        "WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = ps.ps_partkey AND p_size <= 15 AND p_type = 'LARGE') " +
        "AND EXISTS (SELECT 1 FROM eu WHERE eu.s_suppkey = ps.ps_suppkey)) " +
        "SELECT bal_c, s_name, n_name, ps_partkey AS p_partkey, ps_cost_c AS cost_c " +
        "FROM pp JOIN eu ON pp.ps_suppkey = eu.s_suppkey " +
        "WHERE ps_cost_c = (SELECT min(p2.ps_cost_c) FROM pp p2 WHERE p2.ps_partkey = pp.ps_partkey) " +
        "ORDER BY bal_c DESC, s_name, p_partkey LIMIT 100"),
    "q_join_tpch_q9" ->
      ("SELECT nation, o_year, CAST(sum(amount_e4) AS BIGINT) AS profit_e4 FROM (" +
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        "CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT) " +
        "- CAST(l_quantity AS BIGINT) * CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) * 50 AS amount_e4 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE p_name LIKE '%red%') " +
        "GROUP BY 1, 2 ORDER BY nation, o_year DESC"),
    "q_join_tpch_q11" ->
      ("WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk, " +
        "CAST(min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cost_c, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty FROM lineitem GROUP BY 1, 2), " +
        "v AS (SELECT pk, CAST(sum(qty * cost_c) AS BIGINT) AS value_e2 FROM ps " +
        "WHERE EXISTS (SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE s_suppkey = ps.sk AND n_name = 'NATION_3') GROUP BY 1), " +
        "t AS (SELECT CAST(sum(value_e2) AS BIGINT) AS tot_e2, CAST(count(*) AS BIGINT) AS n_parts FROM v) " +
        "SELECT pk AS p_partkey, value_e2 FROM v CROSS JOIN t WHERE value_e2 * n_parts > tot_e2 * 2 " +
        "ORDER BY value_e2 DESC, p_partkey"),
    "q_join_tpch_q12" ->
      ("SELECT l_linestatus, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "GROUP BY 1 ORDER BY 1"),
    "q_join_tpch_q16" ->
      ("WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) " +
        "SELECT p_brand, p_type, p_size, CAST(count(DISTINCT sk) AS BIGINT) AS supplier_cnt " +
        "FROM ps JOIN part ON pk = p_partkey " +
        "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) " +
        "AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = sk AND s_acctbal < 0) " +
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q_join_tpch_q20" ->
      ("SELECT s_suppkey, s_name, CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS bal_c " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_3' AND s_suppkey IN (" +
        "SELECT l_suppkey FROM lineitem " +
        "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') " +
        "GROUP BY l_partkey, l_suppkey " +
        "HAVING 2 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > sum(CAST(l_quantity AS BIGINT))) " +
        "ORDER BY s_name"),
    "q_join_tpch_q22" ->
      ("WITH c AS (SELECT c_custkey, c_nationkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c " +
        "FROM customer WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)), " +
        "a AS (SELECT CAST(sum(bal_c) AS DOUBLE)/count(*) AS avg_bal FROM c WHERE bal_c > 0) " +
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust, CAST(sum(bal_c) AS BIGINT) AS totacctbal_c " +
        "FROM c CROSS JOIN a WHERE CAST(bal_c AS DOUBLE) > avg_bal " +
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-07-01') " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),
    "q_join_tpch_q7" ->
      ("SELECT supp_nation, cust_nation, l_year, CAST(sum(rev_e4) AS BIGINT) AS revenue_e4 FROM (" +
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
        "CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT) AS rev_e4 " +
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01') " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
    "q_join_tpch_q14" ->
      ("WITH j AS (SELECT CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT) AS rev_e4, p_type " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'), " +
        "m AS (SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT) AS promo_e4, " +
        "CAST(sum(rev_e4) AS BIGINT) AS total_e4 FROM j) " +
        "SELECT promo_e4, total_e4, " +
        "CAST(floor(CAST(promo_e4 AS DOUBLE)/total_e4*1000000 + 0.5) AS BIGINT) AS promo_share_e6 FROM m"),
    "q_join_tpch_q19" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(floor(l_extendedprice*(1.0 - l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4 " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_type = 'PROMO' AND l_quantity BETWEEN 1 AND 15) " +
        "OR (p_type = 'ECONOMY' AND l_quantity BETWEEN 20 AND 35) " +
        "OR (p_type = 'STANDARD' AND l_quantity BETWEEN 40 AND 50)"),
    "q_fk_orphans" ->
      (Seq(
        ("customer->nation", "customer c", "NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)"),
        ("lineitem->orders", "lineitem l", "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)"),
        ("lineitem->part", "lineitem l", "NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)"),
        ("orders->customer", "orders o", "NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)"),
        ("supplier->nation", "supplier s", "NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)"))
        .map { case (rel, from, cond) =>
          s"SELECT '$rel' AS relation, CAST(count(*) AS BIGINT) AS n_orphans FROM $from WHERE $cond"
        }
        .mkString("", " UNION ALL ", " ORDER BY relation")),
    "q_drift_psi" ->
      ("WITH o AS (SELECT CAST(o_orderdate < TIMESTAMP '1998-01-01' AS INT) AS is_a, CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS p_c FROM orders), " +
        "mm AS (SELECT min(p_c) AS mn, max(p_c) AS mx FROM o), " +
        "b AS (SELECT is_a, (p_c - mn) * 10 // (mx - mn + 1) AS bin FROM o CROSS JOIN mm), " +
        "g AS (SELECT bin, CAST(sum(is_a) AS BIGINT) AS n_a, CAST(sum(1 - is_a) AS BIGINT) AS n_b FROM b GROUP BY bin), " +
        "t AS (SELECT sum(n_a) AS na_tot, sum(n_b) AS nb_tot FROM g) " +
        "SELECT bin, n_a, n_b, " +
        "CAST(floor((CAST(n_a AS DOUBLE)/na_tot - CAST(n_b AS DOUBLE)/nb_tot) * ln((CAST(n_a AS DOUBLE)/na_tot)/(CAST(n_b AS DOUBLE)/nb_tot)) * 1000000000 + 0.5) AS BIGINT) AS psi_e9 " +
        "FROM g CROSS JOIN t WHERE n_a > 0 AND n_b > 0 ORDER BY bin"),
    "q_sessionize" ->
      (evCte +
        ", l AS (SELECT user_id, event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e)" +
        ", f AS (SELECT user_id, event_id, ts, CAST(prev_ts IS NULL OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800 AS INT) AS new_sess FROM l)" +
        ", g AS (SELECT user_id, ts, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_seq FROM f) " +
        "SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq, CAST(count(*) AS BIGINT) AS n_events, " +
        "min(ts) AS sess_start, max(ts) AS sess_end FROM g GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_ts_ewma" ->
      (evCte +
        ", g AS (SELECT user_id, list(value_c ORDER BY ts, event_id) AS vs FROM e GROUP BY user_id) " +
        "SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events, " +
        "CAST(floor(list_reduce(CAST(vs AS DOUBLE[]), (a, b) -> 0.3*b + 0.7*a)*10000 + 0.5) AS BIGINT) AS ewma_e6 " +
        "FROM g ORDER BY user_id"),
    "q_table_diff" ->
      ("WITH base AS (SELECT c_custkey, c_name, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c FROM customer), " +
        "tgt AS (SELECT c_custkey, c_name, CASE WHEN c_custkey % 97 = 0 THEN bal_c + 5000 ELSE bal_c END AS bal_c FROM base WHERE c_custkey % 101 <> 0), " +
        "sd AS (SELECT c_custkey % 64 AS bucket, CAST(count(*) AS BIGINT) AS src_n, CAST(sum(CAST('0x' || substr(md5(c_custkey || '|' || c_name || '|' || bal_c), 1, 12) AS BIGINT)) AS BIGINT) AS src_digest FROM base GROUP BY 1), " +
        "td AS (SELECT c_custkey % 64 AS bucket, CAST(count(*) AS BIGINT) AS tgt_n, CAST(sum(CAST('0x' || substr(md5(c_custkey || '|' || c_name || '|' || bal_c), 1, 12) AS BIGINT)) AS BIGINT) AS tgt_digest FROM tgt GROUP BY 1) " +
        "SELECT bucket, coalesce(src_n, 0) AS src_n, coalesce(tgt_n, 0) AS tgt_n, src_digest, tgt_digest, " +
        "CAST(src_digest IS NOT DISTINCT FROM tgt_digest AS INT) AS is_match " +
        "FROM sd FULL OUTER JOIN td USING (bucket) ORDER BY bucket"),
    "q_profile" ->
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .map(c =>
          s"SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, " +
            s"CAST(count(*) - count($c) AS BIGINT) AS n_null, " +
            s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM customer")
        .mkString("", " UNION ALL ", " ORDER BY col_name")
  )
}
