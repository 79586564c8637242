package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first job in a cold JVM pays 3-5 s of classloading
    // and codegen that would otherwise land on an arbitrary query and poison
    // cross-round per-query comparison. One small scan+agg+join absorbs it.
    locally {
      import org.apache.spark.sql.functions.count
      val n = Fixtures.table(spark, sfDir, "nation")
      val r = Fixtures.table(spark, sfDir, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey")).groupBy("r_name").agg(count("*")).count()
    }
    // Optional args: query names to run (repeats allowed) — for targeted
    // profiling. The driver's no-arg invocation runs the full map, sorted by
    // name so ordering (and any residual warmup placement) is deterministic
    // across rounds.
    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (args.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else args.toSeq.map(n => n -> SparkEntry.queries(n))
    val results: Seq[(String, Double)] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Millisecond precision keeps the JSON line short enough for the driver's
    // stdout tail buffer (r2's full-precision line was truncated → unparsed),
    // and sub-ms digits are pure noise at this workload anyway. Repeated
    // query-name args (profiling runs) get indexed keys instead of being
    // collapsed by a Map, so the reported total matches the runs executed.
    // Locale.ROOT: a comma-decimal default locale (de_DE) would emit "1,234"
    // and corrupt the JSON line the driver parses.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val qs = results.map { case (k, v) =>
      val n = seen.getOrElse(k, 0); seen(k) = n + 1
      val key = if (n == 0) k else s"$k#${n + 1}"
      "\"" + key + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
