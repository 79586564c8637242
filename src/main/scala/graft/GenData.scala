package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bench-only synthetic data generator reproducing the driver fixtures'
  * statistical shape (TESTDATA.md tables) at scale factors the read-only
  * `/root/testdata` doesn't carry — the empirical scaling study
  * (SCALING.md) runs the full query suite at sf1 = 10× the bench SF.
  *
  * Shape rules were measured from sf{0.001,0.01,0.1} (row counts scale
  * linearly; distributions are SF-invariant):
  *   customer 150k·sf, supplier 10k·sf, part 200k·sf, orders 1.5M·sf,
  *   lineitem ≈ 4·orders (Poisson(4) lines per order, l_linenumber uniform
  *   1..7, NOT unique per order), events 1M·sf over a fixed 30-day window
  *   (sorted by ts, nanosecond BIGINT like the driver's TIMESTAMP_NANOS
  *   read path), documents max(500, 50k·sf) of 10..100 tokens from the
  *   31-word vocab, embeddings max(500, 20k·sf) unit-norm 64-dim floats.
  *
  * Determinism: every random draw is `xxhash64(key…, salt)`-derived, so the
  * dataset is bit-identical across partitionings, re-runs, and cluster
  * sizes — no `rand()` (partition-seeded) anywhere. This is bench
  * infrastructure, not part of the query library; correctness oracles keep
  * running against the driver's own parquet.
  *
  * Usage: `runMain graft.GenData <sf> <outDir>` (default 1.0 target/sf1).
  */
object GenData {
  private val Mod = 1000000000L

  /** Deterministic uniform in [0, 1) keyed by (cols…, salt). */
  private def u(salt: Int, cols: Column*): Column =
    pmod(xxhash64((cols :+ lit(salt)): _*), lit(Mod)).cast("double") / lit(Mod.toDouble)

  private def pick(salt: Int, choices: Seq[String], cols: Column*): Column =
    element_at(array(choices.map(lit): _*), (u(salt, cols: _*) * choices.size).cast("int") + 1)

  private def uniformLong(salt: Int, n: Long, cols: Column*): Column =
    (u(salt, cols: _*) * n).cast("long")

  private def money(salt: Int, lo: Double, hi: Double, cols: Column*): Column =
    round(lit(lo) + u(salt, cols: _*) * (hi - lo), 2)

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val outDir = if (args.length > 1) args(1) else "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, sf, outDir)
    spark.stop()
  }

  def generate(spark: SparkSession, sf: Double, outDir: String): Unit = {
    val nCust = math.max(1, (150000 * sf).toLong)
    val nSupp = math.max(1, (10000 * sf).toLong)
    val nPart = math.max(1, (200000 * sf).toLong)
    val nOrders = math.max(1, (1500000 * sf).toLong)
    val nEvents = math.max(1, (1000000 * sf).toLong)
    val nDocs = math.max(500L, (50000 * sf).toLong)
    val nVecs = math.max(500L, (20000 * sf).toLong)

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    // ---- dimensions ----
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    write(
      spark
        .createDataFrame(regions.zipWithIndex.map { case (n, i) => (i, n) })
        .toDF("r_regionkey", "r_name"),
      "region",
      1)
    write(
      spark
        .createDataFrame((0 until 25).map(i => (i, s"NATION_$i", i % 5)))
        .toDF("n_nationkey", "n_name", "n_regionkey"),
      "nation",
      1)

    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write(
      spark
        .range(nCust)
        .select(
          col("id").as("c_custkey"),
          format_string("Customer#%09d", col("id")).as("c_name"),
          uniformLong(11, 25, col("id")).cast("int").as("c_nationkey"),
          money(12, -1000.0, 10000.0, col("id")).as("c_acctbal"),
          pick(13, segments, col("id")).as("c_mktsegment")),
      "customer",
      math.max(1, (nCust / 100000).toInt))

    write(
      spark
        .range(nSupp)
        .select(
          col("id").as("s_suppkey"),
          format_string("Supplier#%09d", col("id")).as("s_name"),
          uniformLong(21, 25, col("id")).cast("int").as("s_nationkey"),
          money(22, -1000.0, 10000.0, col("id")).as("s_acctbal")),
      "supplier",
      1)

    val adjs = Seq("red", "new", "hot", "old", "large", "blue", "cold", "small")
    val nouns = Seq("gear", "bolt", "ring", "widget", "anvil", "gizmo", "plate", "rod")
    val types = Seq("STANDARD", "ECONOMY", "LARGE", "PROMO", "SMALL", "MEDIUM")
    write(
      spark
        .range(nPart)
        .select(
          col("id").as("p_partkey"),
          concat_ws(" ", pick(31, adjs, col("id")), pick(32, nouns, col("id"))).as("p_name"),
          concat(lit("Brand#"), (uniformLong(33, 25, col("id")) + 1).cast("string")).as("p_brand"),
          pick(34, types, col("id")).as("p_type"),
          (uniformLong(35, 50, col("id")) + 1).cast("int").as("p_size"),
          round(lit(900.0) + pmod(col("id"), lit(1000)).cast("double") * 0.1, 1).as("p_retailprice")),
      "part",
      math.max(1, (nPart / 100000).toInt))

    // ---- orders ----
    val statuses = Seq("O", "F", "P")
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val orders = spark
      .range(nOrders)
      .select(
        col("id").as("o_orderkey"),
        uniformLong(41, nCust, col("id")).as("o_custkey"),
        pick(42, statuses, col("id")).as("o_orderstatus"),
        money(43, 1000.0, 500000.0, col("id")).as("o_totalprice"),
        expr(
          // uniform over the measured 1995-01-01 .. 2001-08-01 span (2405 days)
          "timestampadd(DAY, CAST(pmod(xxhash64(id, 44), 1000000000) / 1000000000.0 * 2405 AS INT), " +
            "TIMESTAMP_NTZ '1995-01-01 00:00:00')").as("o_orderdate"),
        pick(45, priorities, col("id")).as("o_orderpriority"))
    write(orders, "orders", math.max(1, (nOrders / 200000).toInt))

    // ---- lineitem: Poisson(4) lines per order via inverse CDF ----
    // cumulative P(X <= k) for k = 0..16; n_lines = #{cdf entries < u}
    val poissonCdf = {
      val lambda = 4.0
      val probs = Iterator
        .iterate((0, math.exp(-lambda))) { case (k, p) => (k + 1, p * lambda / (k + 1)) }
        .take(17)
        .map(_._2)
        .toSeq
      probs.scanLeft(0.0)(_ + _).drop(1)
    }
    val cdfArr = array(poissonCdf.map(lit): _*)
    val flags = Seq("A", "N", "R")
    val lstat = Seq("F", "O")
    val lines = orders
      .select(
        col("o_orderkey"),
        size(filter(cdfArr, p => u(51, col("o_orderkey")) > p)).as("n_lines"))
      // sequence(1, 0) would DESCEND ([1, 0]); zero-line orders must be
      // filtered out before the explode, exactly like the measured ~1.8%
      // of driver orders that carry no lineitem rows
      .filter(col("n_lines") >= 1)
      .select(col("o_orderkey"), explode(sequence(lit(1), col("n_lines"))).as("ln"))
    val li = lines.select(
      col("o_orderkey").as("l_orderkey"),
      uniformLong(52, nPart, col("o_orderkey"), col("ln")).as("l_partkey"),
      uniformLong(53, nSupp, col("o_orderkey"), col("ln")).as("l_suppkey"),
      (uniformLong(54, 7, col("o_orderkey"), col("ln")) + 1).cast("int").as("l_linenumber"),
      (uniformLong(55, 50, col("o_orderkey"), col("ln")) + 1).cast("double").as("l_quantity"),
      money(56, 900.0, 105000.0, col("o_orderkey"), col("ln")).as("l_extendedprice"),
      (uniformLong(57, 11, col("o_orderkey"), col("ln")).cast("double") / 100.0).as("l_discount"),
      (uniformLong(58, 9, col("o_orderkey"), col("ln")).cast("double") / 100.0).as("l_tax"),
      pick(59, flags, col("o_orderkey"), col("ln")).as("l_returnflag"),
      pick(60, lstat, col("o_orderkey"), col("ln")).as("l_linestatus"),
      expr(
        "timestampadd(DAY, CAST(pmod(xxhash64(o_orderkey, ln, 61), 1000000000) / 1000000000.0 * 2498 AS INT) + 1, " +
          "TIMESTAMP_NTZ '1995-01-01 00:00:00')").as("l_shipdate"))
    write(li, "lineitem", math.max(1, (nOrders * 4 / 200000).toInt))

    // ---- events: ns-BIGINT ts (the driver's TIMESTAMP_NANOS read path),
    // sorted by ts with event_id in ts order over a fixed 30-day window ----
    val nUsers = math.max(1, nCust / 10)
    val winNs = 30L * 86400 * 1000000000L
    val raw = spark
      .range(nEvents)
      .select(
        col("id"),
        // 2024-01-01T00:00:00Z in ns + uniform offset inside the window
        (lit(1704067200L * 1000000000L) +
          (u(71, col("id")) * winNs.toDouble).cast("long")).as("ts"),
        uniformLong(72, nUsers, col("id")).as("user_id"),
        pick(73, Seq("click", "error", "purchase", "signup", "view"), col("id")).as("event_type"),
        round(-lit(50.0) * log(lit(1.0) - u(74, col("id"))), 2).as("value"),
        format_string("{\"k\": %d}", uniformLong(75, 100, col("id"))).as("props"))
    val events = raw
      .withColumn(
        "event_id",
        (row_number().over(Window.orderBy(col("ts"), col("id"))) - lit(1)).cast("long"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
    write(events, "events", math.max(1, (nEvents / 100000).toInt))

    // ---- documents: 10..100 tokens from the 31-word vocab ----
    val vocab = Seq(
      "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast", "filter",
      "group", "hash", "join", "key", "line", "merge", "order", "part", "query", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "table", "the", "value",
      "vector", "window")
    val vocabArr = array(vocab.map(lit): _*)
    val langPick = // measured: en 0.40, de/es/fr/zh 0.15 each
      when(u(81, col("doc_id")) < 0.40, "en")
        .when(u(81, col("doc_id")) < 0.55, "de")
        .when(u(81, col("doc_id")) < 0.70, "es")
        .when(u(81, col("doc_id")) < 0.85, "fr")
        .otherwise("zh")
    val docs = spark
      .range(nDocs)
      .select(col("id").as("doc_id"))
      .withColumn("n_tok", (uniformLong(82, 91, col("doc_id")) + 10).cast("int"))
      .withColumn(
        "text",
        array_join(
          transform(
            sequence(lit(1), col("n_tok")),
            i => element_at(vocabArr, pmod(xxhash64(col("doc_id"), i, lit(83)), lit(31)).cast("int") + 1)),
          " "))
      .select(
        col("doc_id"),
        col("text"),
        langPick.as("lang"),
        concat(lit("src"), uniformLong(84, 20, col("doc_id")).cast("string")).as("source"),
        length(col("text")).cast("long").as("n_chars"))
    write(docs, "documents", math.max(1, (nDocs / 25000).toInt))

    // ---- embeddings: unit-norm 64-dim float vectors, Box-Muller from
    // hash-derived uniforms (deterministic; no randn()) ----
    val dims = 64
    val gauss = transform(
      sequence(lit(1), lit(dims)),
      i => {
        val u1 = (pmod(xxhash64(col("vec_id"), i, lit(91)), lit(Mod)).cast("double") + 1.0) / (Mod.toDouble + 1.0)
        val u2 = pmod(xxhash64(col("vec_id"), i, lit(92)), lit(Mod)).cast("double") / Mod.toDouble
        sqrt(-lit(2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
      })
    val vecs = spark
      .range(nVecs)
      .select(col("id").as("vec_id"))
      .withColumn("g", gauss)
      .withColumn("nrm", sqrt(aggregate(col("g"), lit(0.0), (acc, x) => acc + x * x)))
      .select(
        col("vec_id"),
        transform(col("g"), x => (x / col("nrm")).cast("float")).as("embedding"),
        pmod(xxhash64(col("vec_id"), lit(93)), lit(10)).cast("int").as("label"))
    write(vecs, "embeddings", math.max(1, (nVecs / 25000).toInt))
  }
}
