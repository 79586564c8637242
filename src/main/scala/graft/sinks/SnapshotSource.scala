package graft.sinks

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The snapshot table as a STRUCTURED STREAMING SOURCE — the Delta
  * streaming-source core: `spark.readStream.format("snapshot-table")
  * .option("path", root).load()` turns the commit log into a stream.
  * Offsets ARE table versions, so the semantics fall out of the manifest
  * protocol: each micro-batch is the files the commits in `(start, end]`
  * ADDED (an append's new dir exactly; the first batch is the full
  * snapshot at the stream's starting version), progress survives restarts
  * through the ordinary checkpoint (offsets serialize as version numbers
  * and replayed ranges re-read the same immutable files — exactly-once
  * into an idempotent sink), and COMPACTION is invisible by construction
  * (data-identical commits are skipped, their file churn never re-emitted).
  * Row-level DML commits re-emit the rewritten files' surviving rows —
  * Delta's `ignoreChanges` contract, documented rather than silently
  * wrong; downstream dedup or the CDC reader ([[SnapshotTable
  * .changesBetween]]) are the precise tools for mutation streams.
  *
  * Scale shape: `getOffset` is one manifest listing; `getBatch` plans one
  * parquet scan over only the added files (through [[SnapshotFileIndex]],
  * so pushed-down filters of the streaming query prune within the batch
  * too — stats and Blooms keep working under `readStream`). A reader
  * behind by many versions pays one scan of the union of added files,
  * never a log replay per row. Old files must still exist: retain vacuum
  * history past the slowest reader, the same contract as time travel. */
final class SnapshotSource(spark: SparkSession, root: String, startVersion: Option[Int])
    extends Source {

  // the stream serves the schema recorded when it started; later evolved
  // files read by-name (missing columns null), like readVersion
  override val schema: StructType = {
    val v = SnapshotTable
      .latestVersion(spark, root)
      .getOrElse(sys.error(s"no snapshot table at $root"))
    SnapshotTable
      .readManifest(spark, root, v)
      .schemaJson
      .map(SnapshotTable.schemaFromJson)
      .getOrElse(SnapshotTable.readVersion(spark, root, v).schema)
  }

  private def ver(o: V1Offset): Int = o match {
    case LongOffset(l) => l.toInt
    case SerializedOffset(json) => json.trim.toInt
    case other => other.json().trim.toInt
  }

  override def getOffset: Option[V1Offset] =
    SnapshotTable.latestVersion(spark, root).map(v => LongOffset(v.toLong))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = ver(end)
    val entries: Seq[String] = start.map(ver).orElse(startVersion.map(_ - 1)) match {
      case None | Some(0) =>
        // initial load: the full snapshot at endV
        SnapshotTable.fileEntries(SnapshotTable.readManifest(spark, root, endV))
      case Some(s) =>
        // union of per-commit added files over (s, endV]; compaction is
        // data-identical and contributes nothing
        ((s + 1) to endV).flatMap { v =>
          val cur = SnapshotTable.readManifest(spark, root, v)
          if (cur.action == "compact") Seq.empty[String]
          else {
            val prev = SnapshotTable.fileEntries(SnapshotTable.readManifest(spark, root, v - 1)).toSet
            SnapshotTable.fileEntries(cur).filterNot(prev)
          }
        }.distinct
    }
    val endManifest = SnapshotTable.readManifest(spark, root, endV)
    val entrySet = entries.toSet
    // masks are deliberately NOT applied to streamed batches: the append
    // stream emits each file's rows as of the commit that ADDED it, and a
    // later merge-on-read mask never retracts already-emitted rows — the
    // same contract as COW DML re-emission (ignoreChanges): the CDC
    // reader (changesBetween / readChangeFeed) is the mutation-stream tool
    val synthetic = endManifest.copy(
      dirs = entries,
      files = endManifest.files.filter(f => entrySet.contains(f.path)),
      masks = Seq.empty)
    // scan PHYSICAL columns, surface logical (renamed tables; see
    // SnapshotTable's column mapping) — the stream's output schema stays
    // the logical one the source declared
    val phys = SnapshotTable.physicalSchemaOf(schema)
    val idx = new SnapshotFileIndex(spark, root, synthetic, phys)
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      idx,
      new StructType(),
      phys,
      None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty)(spark)
    val base =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, LogicalRelation(rel, isStreaming = true))
    if (phys.fieldNames.sameElements(schema.fieldNames)) base
    else
      base.select(schema.fields.map(f =>
        org.apache.spark.sql.functions.col("`" + SnapshotTable.physName(f) + "`").as(f.name)).toSeq: _*)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotSource[$root]"
}

/** `format("snapshot-table")` registration (META-INF service) — options:
  * `path` (table root, required), `startVersion` (first version whose data
  * the stream emits; default: full snapshot first). */
final class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "snapshot-table"

  private def root(parameters: Map[String, String]): String =
    parameters.getOrElse(
      "path",
      parameters.getOrElse("root", sys.error("snapshot-table source needs .option(\"path\", <table root>)")))

  override def sourceSchema(
      ctx: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val r = root(parameters)
    val spark = ctx.sparkSession
    val v = SnapshotTable.latestVersion(spark, r).getOrElse(sys.error(s"no snapshot table at $r"))
    val s = SnapshotTable
      .readManifest(spark, r, v)
      .schemaJson
      .map(SnapshotTable.schemaFromJson)
      .getOrElse(SnapshotTable.readVersion(spark, r, v).schema)
    (shortName(), schema.getOrElse(s))
  }

  override def createSource(
      ctx: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotSource(ctx.sparkSession, root(parameters), parameters.get("startVersion").map(_.toInt))
}
