package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.sinks.{GraftTableProvider, SnapshotTable}
import graft.sinks.SnapshotTable.Bound
import org.apache.spark.sql.connector.catalog.SupportsRead
import org.apache.spark.sql.connector.read.{
  Batch,
  SupportsPushDownFilters,
  SupportsPushDownRequiredColumns,
  V1Scan
}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.sources
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 `TableProvider` (SURVEY §2.J `cap_dsv2_read`):
  * `spark.read.format("graft")` resolves through the connector API —
  * format-read ≡ `SnapshotTable.read` on main AND refs, pushed filters
  * drop `planInputPartitions` through the manifest stats, and masked /
  * renamed snapshots fall back to the exact V1Scan relation. */
class GraftDsv2Spec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String = Files.createTempDirectory("graft-dsv2").toString

  private def clustered(n: Int, files: Int) =
    spark
      .range(n.toLong)
      .selectExpr("id AS k", "concat('v', id) AS s")
      .repartitionByRange(files, org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k")

  private def opts(pairs: (String, String)*) =
    new CaseInsensitiveStringMap(pairs.toMap.asJava)

  test("format(graft) ≡ SnapshotTable.read on main, versionAsOf, tag, and a branch handle") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, clustered(1000, 8)) // v1
    SnapshotTable.deleteWhere(spark, root, Seq(Bound("k", Some(0L), Some(99L)))) // v2
    SnapshotTable.createTag(spark, root, "golden", Some(1))
    val dev = SnapshotTable.createBranch(spark, root, "dev")
    SnapshotTable.append(spark, dev, spark.range(2000, 2100).selectExpr("id AS k", "concat('v', id) AS s"))

    def viaFormat(extra: (String, String)*) = {
      val r = spark.read.format("graft")
      extra.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load(root)
    }
    assert(
      viaFormat().orderBy("k").collect().toSeq ==
        SnapshotTable.read(spark, root).orderBy("k").collect().toSeq)
    assert(viaFormat("versionAsOf" -> "1").count() == 1000)
    assert(viaFormat("tag" -> "golden").count() == 1000)
    assert(
      viaFormat("branch" -> "dev").orderBy("k").collect().toSeq ==
        SnapshotTable.read(spark, dev).orderBy("k").collect().toSeq)
    // the physical plan is a REAL DSv2 batch scan, not the V1 relation
    val plan = viaFormat().queryExecution.executedPlan
    assert(plan.collectFirst { case b: BatchScanExec => b }.isDefined, s"expected BatchScanExec in:\n$plan")
  }

  test("pushed filters drop planInputPartitions through the manifest stats, on main and on a branch") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, clustered(1000, 8)) // 8 range-clustered files
    val provider = new GraftTableProvider
    def partitionsWith(o: CaseInsensitiveStringMap, filters: Array[sources.Filter]): Int = {
      val table = provider.getTable(provider.inferSchema(o), Array.empty, o.asCaseSensitiveMap())
      val sb = table.asInstanceOf[SupportsRead].newScanBuilder(o)
      val remaining = sb.asInstanceOf[SupportsPushDownFilters].pushFilters(filters)
      // every filter is handed back for row-level re-evaluation: pruning
      // is never load-bearing
      assert(remaining.toSeq == filters.toSeq)
      sb.build().toBatch.planInputPartitions().length
    }
    val o = opts("path" -> root)
    assert(partitionsWith(o, Array.empty) == 8)
    val pruned = partitionsWith(o, Array(sources.GreaterThan("k", 874L)))
    assert(pruned == 1, s"k > 874 lives in exactly one clustered file, planned $pruned")
    assert(partitionsWith(o, Array(sources.EqualTo("k", -5L))) == 0, "a dead predicate plans zero partitions")
    // e2e: the executed plan's BatchScanExec carries exactly the pruned set
    val df = spark.read.format("graft").load(root).filter("k > 874")
    assert(df.count() == 125)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.inputPartitions.size == 1, s"e2e pushdown must prune to 1 file, got ${scan.inputPartitions.size}")

    // branch handles prune through their own manifest log
    val dev = SnapshotTable.createBranch(spark, root, "dev")
    SnapshotTable.append(spark, dev, clustered(1000, 8).selectExpr("k + 10000 AS k", "s"))
    val ob = opts("path" -> root, "branch" -> "dev")
    assert(partitionsWith(ob, Array.empty) == 16)
    assert(partitionsWith(ob, Array(sources.GreaterThan("k", 10874L))) == 1)
  }

  test("column pruning reaches the reader; count-style empty projections work") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, clustered(100, 2))
    val df = spark.read.format("graft").load(root).select("s")
    assert(df.schema.fieldNames.toSeq == Seq("s"))
    assert(df.collect().length == 100)
    assert(spark.read.format("graft").load(root).count() == 100)
    // the scan's readSchema really pruned (not a post-scan projection-only)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("s"))
  }

  test("masked (merge-on-read) and renamed snapshots read exactly through the V1Scan fallback") {
    val root = freshRoot()
    SnapshotTable.create(spark, root, clustered(1000, 8))
    SnapshotTable.deleteWhereMor(spark, root, Seq(Bound("k", Some(100L), Some(299L)))) // pending mask
    val viaFormat = spark.read.format("graft").load(root)
    assert(
      viaFormat.orderBy("k").collect().toSeq ==
        SnapshotTable.read(spark, root).orderBy("k").collect().toSeq,
      "a pending mask must not resurrect rows through the DSv2 path")
    assert(viaFormat.filter("k BETWEEN 100 AND 299").count() == 0)
    // the ScanBuilder really picked the fallback
    val provider = new GraftTableProvider
    val o = opts("path" -> root)
    val table = provider.getTable(provider.inferSchema(o), Array.empty, o.asCaseSensitiveMap())
    val scan = table.asInstanceOf[SupportsRead].newScanBuilder(o).build()
    assert(scan.isInstanceOf[V1Scan], s"masked table must take the V1Scan fallback, got $scan")

    // renamed column: logical name serves, physical stays frozen — and
    // the table KEEPS the native batch (the scan maps names itself)
    val root2 = freshRoot()
    SnapshotTable.create(spark, root2, clustered(1000, 8))
    SnapshotTable.renameColumn(spark, root2, "k", "id")
    val renamed = spark.read.format("graft").load(root2)
    assert(renamed.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(renamed.filter("s = 'v7'").select("id").as[Long].head() == 7L)
    val t2 = provider.getTable(
      provider.inferSchema(opts("path" -> root2)), Array.empty,
      opts("path" -> root2).asCaseSensitiveMap())
    val s2 = t2.asInstanceOf[SupportsRead].newScanBuilder(opts("path" -> root2)).build()
    assert(!s2.isInstanceOf[V1Scan], "a renamed table stays on the native batch")
    // pushed filters on the RENAMED column still prune through the
    // physical-name stats, and the e2e plan is a pruned BatchScanExec
    val prunedDf = renamed.filter("id > 874")
    assert(prunedDf.count() == 125)
    val scan2 = prunedDf.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan2.inputPartitions.size == 1,
      s"renamed-column pushdown must prune to 1 file, got ${scan2.inputPartitions.size}")
  }

  test("a clean table's filtered DSv2 read equals the engine read (pushdown is only an optimization)") {
    val root = freshRoot()
    // ints with nulls: exercises IsNull/IsNotNull/In translation soundness
    SnapshotTable.create(
      spark, root,
      spark.range(500).selectExpr(
        "id AS k",
        "CASE WHEN id % 9 = 0 THEN CAST(NULL AS STRING) ELSE concat('v', id) END AS s"))
    val f = spark.read.format("graft").load(root)
    assert(f.filter("s IS NULL").count() == SnapshotTable.read(spark, root).filter("s IS NULL").count())
    assert(f.filter("k IN (3, 7, 9999)").count() == 2)
    assert(f.filter("s LIKE 'v42%'").count() ==
      SnapshotTable.read(spark, root).filter("s LIKE 'v42%'").count())
  }

  test("cap_dsv2_runtime_filter: dim-side join keys prune fact files at EXECUTION time (static pushdown sees nothing)") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    val root = freshRoot()
    SnapshotTable.create(spark, root, clustered(1000, 8)) // 8 range-clustered files
    // unit contract: a runtime IN filter re-prunes planInputPartitions
    // through the same manifest stats the static path uses
    val provider = new GraftTableProvider
    val o = opts("path" -> root)
    val table = provider.getTable(provider.inferSchema(o), Array.empty, o.asCaseSensitiveMap())
    val scan = table.asInstanceOf[SupportsRead].newScanBuilder(o).build()
    val rt = scan.asInstanceOf[SupportsRuntimeFiltering]
    assert(rt.filterAttributes().map(_.fieldNames.mkString(".")).toSet == Set("k", "s"))
    assert(scan.toBatch.planInputPartitions().length == 8)
    rt.filter(Array[sources.Filter](sources.In("k", Array(5L, 7L, 9L))))
    assert(scan.toBatch.planInputPartitions().length == 1,
      "runtime keys from one clustered range must prune to one file")

    // e2e: a broadcast star join injects a dynamic-pruning subquery on
    // the fact scan — keys Spark only knows at execution time
    val dim = spark.range(3).selectExpr("id + 5 AS k", "concat('d', id) AS d")
    dim.createOrReplaceTempView("rt_dim")
    val fact = spark.read.format("graft").load(root)
    fact.createOrReplaceTempView("rt_fact")
    // DPP injects only when the dim side carries a SELECTIVE predicate
    // (Spark's isLikelySelective gate) — the star-join shape
    val joined = spark.sql(
      "SELECT /*+ BROADCAST(d) */ f.k, d.d FROM rt_fact f JOIN rt_dim d ON f.k = d.k WHERE d.d = 'd0'")
    assert(joined.count() == 1)
    val planStr = joined.queryExecution.executedPlan.toString
    assert(
      planStr.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-pruning subquery on the fact scan in:\n$planStr")
  }

  test("runtime filtering re-prunes a WIDENED-then-OPTIMIZEd key: the widen → compact → dynamic-pruning loop closes") {
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.types.LongType
    import graft.sinks.SnapshotTable.WidenCol
    val root = freshRoot()
    // hash-scattered INT keys: every file's [min,max] spans the domain, so
    // any file skipping — static OR runtime — rests entirely on the blooms
    SnapshotTable.create(
      spark, root,
      spark.range(4000).selectExpr("CAST(id AS INT) AS k", "concat('v', id) AS s")
        .repartition(16, org.apache.spark.sql.functions.col("k") * 2654435761L))
    def runtimePlanCount(): Int = {
      val provider = new GraftTableProvider
      val o = opts("path" -> root)
      val table = provider.getTable(provider.inferSchema(o), Array.empty, o.asCaseSensitiveMap())
      val scan = table.asInstanceOf[SupportsRead].newScanBuilder(o).build()
      scan.asInstanceOf[SupportsRuntimeFiltering]
        .filter(Array[sources.Filter](sources.In("k", Array(42L))))
      scan.toBatch.planInputPartitions().length
    }
    // widening strips the type-hashed blooms: the runtime IN degrades to
    // the near-full candidate set — correct, just unpruned
    SnapshotTable.alterSchema(spark, root, Seq(WidenCol("k", LongType)))
    assert(runtimePlanCount() >= 12,
      "a widened key must leave the runtime filter unpruned (stripped blooms), never wrong")
    assert(spark.read.format("graft").load(root).filter("k = 42").count() == 1)
    // OPTIMIZE rebuilds blooms AT THE WIDENED TYPE; the DSv2 runtime-filter
    // path must prune through them exactly like the static path
    SnapshotTable.compactSmall(spark, root, smallBytes = 8192, targetBytes = 8192)
    assert(runtimePlanCount() <= 2,
      "post-OPTIMIZE runtime keys must re-prune through the LONG-typed blooms")
    // e2e: the broadcast star join's dynamic-pruning subquery still
    // injects on the widened key and returns exactly the joined row
    val dim = spark.range(1).selectExpr("id + 42 AS k", "concat('d', id) AS d")
    dim.createOrReplaceTempView("rtw_dim")
    spark.read.format("graft").load(root).createOrReplaceTempView("rtw_fact")
    val joined = spark.sql(
      "SELECT /*+ BROADCAST(d) */ f.k, d.d FROM rtw_fact f JOIN rtw_dim d ON f.k = d.k WHERE d.d = 'd0'")
    assert(joined.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(joined.queryExecution.executedPlan.toString.toLowerCase.contains("dynamicpruning"))
  }
}
