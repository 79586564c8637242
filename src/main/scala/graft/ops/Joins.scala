package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C — join operators.
  *
  * Strategy notes for 100-TB shape: dimension joins broadcast explicitly
  * (`broadcast()`), the large fact-fact join pins SHUFFLE_MERGE so the plan
  * stays a SortMergeJoin at any scale factor (at sf0.01 the 10 MB
  * auto-broadcast threshold would otherwise hide the shuffle path), and the
  * as-of/theta joins bucket by the equi key (user_id) so the range predicate
  * only runs within equi-matched groups.
  *
  * Oracle SQL referencing events always casts ts to µs TIMESTAMP first: the
  * driver's DuckDB reads the raw parquet column as TIMESTAMP_NS while the
  * Spark side truncates ns→µs on read (Fixtures.events).
  */
object Joins {
  /** CTE prefix giving DuckDB the same µs-truncated events the engine sees. */
  private val evCte =
    "WITH e AS (SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Small-dimension equi join → BroadcastHashJoin.
    "q_join_broadcast" -> { (s, dir) =>
      val n = Fixtures.table(s, dir, "nation")
      val r = Fixtures.table(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    },
    // Fact-fact equi join, pinned to SortMergeJoin (the at-scale plan).
    "q_join_shuffle" -> { (s, dir) =>
      val o = Fixtures.table(s, dir, "orders")
      val l = Fixtures.table(s, dir, "lineitem")
      l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .select("o_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")
        // full-row order: (o_orderkey, l_linenumber) repeats (SURVEY §5.4.7)
        .orderBy("o_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")
    },
    // 3-way star join + agg (TPC-H Q3 shape), revenue per qualifying order.
    "q_join_multiway" -> { (s, dir) =>
      val c = Fixtures.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Fixtures
        .table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      val l = Fixtures
        .table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp_ntz"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        // revenue in exact e4 units: price_c * (100 - disc_c) is an integer,
        // so the sum is order-free (stable across shuffle layouts).
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
          sum(
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
              (lit(100) - floor(col("l_discount") * 100 + lit(0.5)).cast("long")))
            .as("revenue_e4"))
        .orderBy("l_orderkey")
    },
    // TPC-H Q5 shape: 6-table join with the non-star condition
    // s_nationkey = c_nationkey (supplier and customer constrained to the
    // same nation) — the classic plan where join ORDER matters: dims
    // broadcast, facts meet on their keys, and the extra equi condition
    // rides along on the supplier join instead of forcing a cross check.
    "q_join_tpch_q5" -> { (s, dir) =>
      val r = Fixtures.table(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Fixtures.table(s, dir, "nation")
      val c = Fixtures.table(s, dir, "customer")
      val o = Fixtures
        .table(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      val l = Fixtures.table(s, dir, "lineitem")
      val sup = Fixtures.table(s, dir, "supplier")
      r.join(n, col("n_regionkey") === col("r_regionkey"))
        .join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
              (lit(100) - floor(col("l_discount") * 100 + lit(0.5)).cast("long")))
            .as("revenue_e4"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue_e4").desc, col("n_name"))
    },
    // Correlated subquery surface: a scalar subquery and a correlated
    // EXISTS, decorrelated by Catalyst into aggregate + semi joins — the
    // analyzer feature a SQL user hits first. Routed through spark.sql
    // (subqueries are SQL-surface constructs); cents scaling keeps the
    // scalar subquery's sum exact.
    "q_subquery_corr" -> { (s, dir) =>
      Fixtures.table(s, dir, "customer").createOrReplaceTempView("customer")
      Fixtures.table(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey,
          |       (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |       (SELECT CAST(coalesce(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)), 0) AS BIGINT)
          |          FROM orders o WHERE o.o_custkey = c.c_custkey) AS spend_c
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o2
          |              WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 100000)
          |ORDER BY c_custkey""".stripMargin)
    },
    // Left outer + null-side handling: order stats per customer incl. zeroes.
    "q_join_left" -> { (s, dir) =>
      val c = Fixtures.table(s, dir, "customer")
      val o = Fixtures.table(s, dir, "orders")
      c.join(o, col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")), lit(0L))
            .as("total_spend_c"))
        .orderBy("c_custkey")
    },
    // Right outer: reference counts per part, keeping unreferenced parts.
    "q_join_right" -> { (s, dir) =>
      val l = Fixtures.table(s, dir, "lineitem")
      val p = Fixtures.table(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"), "right")
        .groupBy("p_partkey")
        .agg(count(col("l_orderkey")).as("n_refs"))
        .orderBy("p_partkey")
    },
    // Full outer: customers active in 1995 vs 1996, either side may miss.
    "q_join_full" -> { (s, dir) =>
      val o = Fixtures.table(s, dir, "orders")
      def slice(y: Int, out: String) =
        o.filter(year(col("o_orderdate")) === y)
          .groupBy(col("o_custkey").as(s"ck_$out"))
          .agg(count(lit(1)).as(s"n_$out"))
      val a = slice(1995, "a")
      val b = slice(1996, "b")
      a.join(b, col("ck_a") === col("ck_b"), "full")
        .select(
          coalesce(col("ck_a"), col("ck_b")).as("custkey"),
          coalesce(col("n_a"), lit(0L)).as("n_1995"),
          coalesce(col("n_b"), lit(0L)).as("n_1996"))
        .orderBy("custkey")
    },
    // Semi join: customers having at least one order (EXISTS).
    "q_join_semi" -> { (s, dir) =>
      val c = Fixtures.table(s, dir, "customer")
      val o = Fixtures.table(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // Anti join: customers with no 1995 orders (NOT EXISTS) — the "new
    // records" detection that pairs with q_etl_incremental. Scoped to one
    // year so the result is non-empty at every scale factor.
    "q_join_anti" -> { (s, dir) =>
      val c = Fixtures.table(s, dir, "customer")
      val o = Fixtures.table(s, dir, "orders").filter(year(col("o_orderdate")) === 1995)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // Cross join of the two smallest dims (BroadcastNestedLoopJoin).
    "q_join_cross" -> { (s, dir) =>
      val r = Fixtures.table(s, dir, "region")
      val n = Fixtures.table(s, dir, "nation")
      r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")
    },
    // Equi+band (theta) join: pairs of same-user events ≤5 minutes apart.
    // The equi key keeps the range predicate inside hash buckets — the shape
    // that scales (pure theta would be a cross join).
    "q_join_theta" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val e1 = ev.select(col("user_id"), col("ts").as("ts1"))
      val e2 = ev.select(col("user_id").as("user_id2"), col("ts").as("ts2"))
      e1.join(
          e2,
          col("user_id") === col("user_id2") &&
            col("ts2") > col("ts1") &&
            col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    // Keyless range join: lineitem prices matched to part price bands
    // (retail ± 50.00) — no equi key exists, so the naive plan is a
    // nested-loop cross join; RangeJoin buckets the price domain and turns
    // it into a hash join. Oracle is the plain BETWEEN join SQL.
    "q_join_range" -> { (s, dir) =>
      val cents = (c: org.apache.spark.sql.Column) => floor(c * 100 + lit(0.5)).cast("long")
      val p = Fixtures
        .table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), cents(col("l_extendedprice")).as("price_c"))
      val bands = Fixtures
        .table(s, dir, "part")
        .filter(col("p_partkey") <= 100)
        .select(
          col("p_partkey"),
          (cents(col("p_retailprice")) - 5000).as("lo"),
          (cents(col("p_retailprice")) + 5000).as("hi"))
      RangeJoin
        .pointInInterval(p, bands, "price_c", "lo", "hi", bucketWidth = 10000L)
        .select("p_partkey", "l_orderkey", "l_linenumber", "price_c")
        .orderBy("p_partkey", "l_orderkey", "l_linenumber")
    },
    // Salted skew join: 90% of lineitem rows mapped to one hot part key,
    // joined to part through SkewJoin.saltedEquiJoin (8 salts). The oracle
    // is the PLAIN join SQL — salting must be output-invisible, so the
    // DuckDB hash-match proves both correctness and salt-neutrality.
    "q_join_salted" -> { (s, dir) =>
      val left = Fixtures
        .table(s, dir, "lineitem")
        .select(
          when(pmod(col("l_orderkey"), lit(10)) < 9, 1L).otherwise(col("l_partkey")).as("k"),
          col("l_orderkey"),
          col("l_linenumber"))
      val right = Fixtures.table(s, dir, "part").select(col("p_partkey").as("rk"), col("p_brand"))
      SkewJoin
        .saltedEquiJoin(left, right, "k", "rk", leftTieBreak = "l_orderkey", nSalts = 8)
        .select("l_orderkey", "l_linenumber", "rk", "p_brand")
        // full-row order: (l_orderkey, l_linenumber) repeats (SURVEY §5.4.7)
        .orderBy("l_orderkey", "l_linenumber", "rk", "p_brand")
    },
    // As-of join: latest prior 'view' for each 'purchase' by the same user.
    // Spark has no batch as-of join — canonical theta join + row_number()=1,
    // keeping unmatched purchases via left join (null view columns).
    "q_join_asof" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val p = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))
      val v = ev
        .filter(col("event_type") === "view")
        .select(
          col("event_id").as("v_event_id"),
          col("user_id").as("v_user_id"),
          col("ts").as("v_ts"))
      val w = Window
        .partitionBy("p_event_id")
        .orderBy(col("v_ts").desc_nulls_last, col("v_event_id").desc_nulls_last)
      p.join(v, col("user_id") === col("v_user_id") && col("v_ts") <= col("p_ts"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("p_event_id", "user_id", "p_ts", "v_event_id", "v_ts")
        .orderBy("p_event_id")
    },
    // Same as-of semantics through the custom Catalyst operator
    // (graft.plans.AsOfJoin: logical node + strategy + merge-join exec)
    // instead of theta-join + window — one forward pass, no candidate-pair
    // blowup. Shares q_join_asof's oracle SQL: the DuckDB hash-match is the
    // correctness proof for the custom operator.
    "q_join_asof_native" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val p = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))
      val v = ev
        .filter(col("event_type") === "view")
        .select(
          col("event_id").as("v_event_id"),
          col("user_id").as("v_user_id"),
          col("ts").as("v_ts"))
      graft.plans.AsOfJoinOps
        .latestPrior(p, v, "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id")
        .select("p_event_id", "user_id", "p_ts", "v_event_id", "v_ts")
        .orderBy("p_event_id")
    },
    // Native as-of join with a 30-minute tolerance (pandas merge_asof
    // semantics): a prior view older than the bound yields the null row.
    // Same single-merge-pass operator — the bound is one comparison at
    // emit, no extra shuffle or candidate blowup.
    "q_join_asof_tol" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val p = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts").as("p_ts"))
      val v = ev
        .filter(col("event_type") === "view")
        .select(
          col("event_id").as("v_event_id"),
          col("user_id").as("v_user_id"),
          col("ts").as("v_ts"))
      graft.plans.AsOfJoinOps
        .latestPrior(p, v, "user_id", "v_user_id", "p_ts", "v_ts", "v_event_id",
          toleranceMicros = 30L * 60 * 1000000)
        .select("p_event_id", "user_id", "p_ts", "v_event_id", "v_ts")
        .orderBy("p_event_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_join_broadcast" ->
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    "q_join_shuffle" ->
      "SELECT o_orderkey, l_linenumber, o_orderstatus, l_quantity FROM lineitem JOIN orders ON l_orderkey = o_orderkey ORDER BY o_orderkey, l_linenumber, o_orderstatus, l_quantity",
    "q_join_multiway" ->
      "SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT) AS revenue_e4 FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1996-06-30' GROUP BY l_orderkey, o_orderdate, o_orderpriority ORDER BY l_orderkey",
    "q_join_left" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders, CAST(coalesce(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)), 0) AS BIGINT) AS total_spend_c FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey",
    "q_join_right" ->
      "SELECT p_partkey, count(l_orderkey) AS n_refs FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey GROUP BY p_partkey ORDER BY p_partkey",
    "q_join_full" ->
      "WITH a AS (SELECT o_custkey AS ck_a, count(*) AS n_a FROM orders WHERE year(o_orderdate)=1995 GROUP BY 1), b AS (SELECT o_custkey AS ck_b, count(*) AS n_b FROM orders WHERE year(o_orderdate)=1996 GROUP BY 1) SELECT coalesce(ck_a, ck_b) AS custkey, coalesce(n_a, 0) AS n_1995, coalesce(n_b, 0) AS n_1996 FROM a FULL JOIN b ON ck_a = ck_b ORDER BY custkey",
    "q_join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    "q_join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995) ORDER BY c_custkey",
    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "q_join_theta" ->
      (evCte + " SELECT e1.user_id, count(*) AS n_pairs FROM e e1 JOIN e e2 ON e1.user_id = e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE GROUP BY e1.user_id ORDER BY e1.user_id"),
    "q_join_salted" ->
      "WITH l AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE l_partkey END AS k, l_orderkey, l_linenumber FROM lineitem) SELECT l_orderkey, l_linenumber, p_partkey AS rk, p_brand FROM l JOIN part ON k = p_partkey ORDER BY l_orderkey, l_linenumber, rk, p_brand",
    "q_subquery_corr" ->
      "SELECT c_custkey, (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders, (SELECT CAST(coalesce(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)), 0) AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey) AS spend_c FROM customer c WHERE EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 100000) ORDER BY c_custkey",
    "q_join_tpch_q5" ->
      "SELECT n_name, CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS BIGINT) AS revenue_e4, count(*) AS n_items FROM region JOIN nation ON n_regionkey = r_regionkey JOIN customer ON c_nationkey = n_nationkey JOIN orders ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY n_name ORDER BY revenue_e4 DESC, n_name",
    "q_join_range" ->
      "WITH p AS (SELECT l_orderkey, l_linenumber, CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS price_c FROM lineitem), i AS (SELECT p_partkey, CAST(floor(p_retailprice*100+0.5) AS BIGINT) - 5000 AS lo, CAST(floor(p_retailprice*100+0.5) AS BIGINT) + 5000 AS hi FROM part WHERE p_partkey <= 100) SELECT i.p_partkey, p.l_orderkey, p.l_linenumber, p.price_c FROM p JOIN i ON p.price_c BETWEEN i.lo AND i.hi ORDER BY p_partkey, l_orderkey, l_linenumber",
    "q_join_asof" ->
      (evCte + ", p AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'), v AS (SELECT event_id AS v_event_id, user_id AS v_user_id, ts AS v_ts FROM e WHERE event_type = 'view'), j AS (SELECT p.p_event_id, p.user_id, p.p_ts, v.v_event_id, v.v_ts, row_number() OVER (PARTITION BY p.p_event_id ORDER BY v.v_ts DESC NULLS LAST, v.v_event_id DESC NULLS LAST) AS rn FROM p LEFT JOIN v ON p.user_id = v.v_user_id AND v.v_ts <= p.p_ts) SELECT p_event_id, user_id, p_ts, v_event_id, v_ts FROM j WHERE rn = 1 ORDER BY p_event_id"),
    "q_join_asof_native" ->
      (evCte + ", p AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'), v AS (SELECT event_id AS v_event_id, user_id AS v_user_id, ts AS v_ts FROM e WHERE event_type = 'view'), j AS (SELECT p.p_event_id, p.user_id, p.p_ts, v.v_event_id, v.v_ts, row_number() OVER (PARTITION BY p.p_event_id ORDER BY v.v_ts DESC NULLS LAST, v.v_event_id DESC NULLS LAST) AS rn FROM p LEFT JOIN v ON p.user_id = v.v_user_id AND v.v_ts <= p.p_ts) SELECT p_event_id, user_id, p_ts, v_event_id, v_ts FROM j WHERE rn = 1 ORDER BY p_event_id"),
    "q_join_asof_tol" ->
      (evCte + ", p AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'), v AS (SELECT event_id AS v_event_id, user_id AS v_user_id, ts AS v_ts FROM e WHERE event_type = 'view'), j AS (SELECT p.p_event_id, p.user_id, p.p_ts, v.v_event_id, v.v_ts, row_number() OVER (PARTITION BY p.p_event_id ORDER BY v.v_ts DESC NULLS LAST, v.v_event_id DESC NULLS LAST) AS rn FROM p LEFT JOIN v ON p.user_id = v.v_user_id AND v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 30 MINUTE) SELECT p_event_id, user_id, p_ts, v_event_id, v_ts FROM j WHERE rn = 1 ORDER BY p_event_id")
  )
}
