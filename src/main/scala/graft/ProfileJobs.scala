package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Job-level profiler (optimization rounds): runs the named queries under
  * the Bench session settings with a listener that prints every Spark job's
  * wall time and call site, so per-commit protocol costs (write vs stats
  * scan vs DML probe) are attributable line-by-line. Not part of the driver
  * contract. `sbt "runMain graft.ProfileJobs q_snapshot_dv"`.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap.empty[Int, (Long, String, Int)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site, tasks) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add((je.jobId, f"  job ${je.jobId}%4d ${ms}%9.1f ms  tasks=$tasks%-5d $site"))
        }
    })
    // warmup identical to Bench
    locally {
      import org.apache.spark.sql.functions.count
      val n = Fixtures.table(spark, sfDir, "nation")
      val r = Fixtures.table(spark, sfDir, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey")).groupBy("r_name").agg(count("*")).count()
    }
    args.foreach { name =>
      Thread.sleep(300)
      lines.clear()
      graft.ops.BpeTokenizer.clearMemo()
      graft.ops.Graph.clearMemo()
      graft.ops.SnapshotCycle.clearMemo()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"==== $name  total=$total%.3f s ====")
      lines.toArray(Array.empty[(Int, String)]).sortBy(_._1).foreach(l => println(l._2))
    }
    spark.stop()
  }
}
