package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** A minimal transactional snapshot table over plain parquet — the missing
  * sink-side primitive between "write parquet files" and a warehouse: at
  * 100 TB, incremental loads need ATOMIC visibility (readers must never see
  * a half-written batch), TIME TRAVEL (reprocess against the exact input a
  * job saw), and safe COMPACTION (rewrite files without breaking readers) —
  * the properties table formats (Delta/Iceberg/Hudi) exist for. This is the
  * core of that idea in one file, on nothing but parquet + a manifest log.
  *
  * Layout:
  * {{{
  *   <root>/_manifests/v00000001.json   // one immutable manifest per commit
  *   <root>/data/<commit-uuid>/...      // immutable parquet dirs, append-only
  * }}}
  *
  * Every manifest is a SELF-CONTAINED snapshot: it lists every live data dir
  * for its version (not a delta), so `readVersion` is one manifest read +
  * one multi-path parquet scan — no log replay, O(1) metadata reads at any
  * history length.
  *
  * Commit protocol (optimistic concurrency):
  *   1. read the current latest version V (one directory listing),
  *   2. write the new data files under `data/<fresh-uuid>/` — invisible to
  *      every reader, because readers only follow manifests,
  *   3. publish by creating `_manifests/v{V+1}.json` with
  *      `FileSystem.create(path, overwrite = false)` — atomic
  *      create-if-absent on HDFS-semantics filesystems, so of two racing
  *      committers exactly one wins; the loser gets
  *      [[ConcurrentCommitException]] and retries from step 1 (its orphaned
  *      data dir is reclaimed by [[vacuum]]). On S3-style stores without
  *      atomic create, point `_manifests` at an HDFS/consistent volume or
  *      front it with a lock service — the data dirs can stay on S3.
  *
  * Readers never list `data/`: a killed writer leaves only an unreferenced
  * dir, never a torn table. Failure atomicity therefore holds at every
  * step: crash before publish → invisible; crash after → fully visible.
  */
object SnapshotTable {

  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  /** One commit's metadata. `dirs` are root-relative live data dirs;
    * `batchId` tags commits made by [[appendBatchExactlyOnce]] so replayed
    * streaming epochs are recognized; `schemaJson` is the TABLE schema as
    * of this version (Spark StructType JSON) — the manifest, not the
    * parquet footers, is the source of truth, so an old version reads with
    * exactly the schema it committed and a widened table reads old files
    * with the new columns null. Absent only in pre-schema manifests
    * (read-compat: those fall back to footer mergeSchema). */
  final case class Commit(
      version: Int,
      action: String,
      dirs: Seq[String],
      addedRows: Long,
      batchId: Option[Long] = None,
      schemaJson: Option[String] = None)

  /** Table schema of `next` committed over `prior`: same-named columns
    * must keep their type (loud failure beats silent corruption — parquet
    * would happily coexist an int and a string column of the same name
    * until a reader dies much later); columns new in `next` append; columns
    * absent from `next` persist (an append needn't carry every column).
    * Everything nullable: any column can be missing from some files. */
  private[graft] def mergeSchemas(
      prior: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    val byName = next.fields.map(f => f.name -> f).toMap
    prior.fields.foreach { pf =>
      byName.get(pf.name).foreach { nf =>
        require(
          nf.dataType == pf.dataType,
          s"schema evolution cannot change column '${pf.name}' from ${pf.dataType.sql} to ${nf.dataType.sql}")
      }
    }
    val priorNames = prior.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      (prior.fields ++ next.fields.filterNot(f => priorNames(f.name))).map(_.copy(nullable = true)))
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def manifestPath(root: String, v: Int) =
    new Path(manifestDir(root), f"v$v%08d.json")

  private val ManifestRe = """v(\d{8})\.json""".r

  /** All committed versions, ascending (one listing). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir)
        .toSeq
        .flatMap(s => ManifestRe.findFirstMatchIn(s.getPath.getName).map(_.group(1).toInt))
        .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  private def readManifest(spark: SparkSession, root: String, v: Int): Commit = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, v))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val j = JsonMethods.parse(txt)
    implicit val fmts: Formats = DefaultFormats
    Commit(
      (j \ "version").extract[Int],
      (j \ "action").extract[String],
      (j \ "dirs").extract[Seq[String]],
      (j \ "addedRows").extract[Long],
      (j \ "batchId").extractOpt[Long],
      (j \ "schema").extractOpt[String])
  }

  /** The commit log, ascending by version. */
  def history(spark: SparkSession, root: String): Seq[Commit] =
    versions(spark, root).map(readManifest(spark, root, _))

  private def writeData(spark: SparkSession, root: String, df: DataFrame): (String, Long) = {
    val rel = "data/" + java.util.UUID.randomUUID().toString
    df.write.parquet(new Path(root, rel).toString)
    val n = spark.read.parquet(new Path(root, rel).toString).count()
    (rel, n)
  }

  /** Atomic publish: create-if-absent the next manifest. Package-private so
    * the spec can drive the commit race directly. */
  private[graft] def publish(spark: SparkSession, root: String, c: Commit): Int = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val p = manifestPath(root, c.version)
    val fields = List(
      "version" -> JInt(c.version),
      "action" -> JString(c.action),
      "dirs" -> JArray(c.dirs.map(JString(_)).toList),
      "addedRows" -> JLong(c.addedRows)) ++
      c.batchId.map(b => "batchId" -> (JLong(b): JValue)).toList ++
      c.schemaJson.map(s => "schema" -> (JString(s): JValue)).toList
    val json = JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
    val out =
      try f.create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new ConcurrentCommitException(
            s"version ${c.version} was committed concurrently (${e.getMessage}); retry from latest")
      }
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
    c.version
  }

  /** Table schema for a commit of `df` on top of version `base`: carried
    * commits (append) evolve the prior recorded schema via [[mergeSchemas]];
    * replacing commits (create/overwrite/compact) take `df`'s schema. A
    * prior manifest without a recorded schema contributes nothing (the
    * pre-schema files still read via the mergeSchema fallback). */
  private def evolvedSchema(
      spark: SparkSession,
      root: String,
      base: Option[Int],
      df: DataFrame,
      carryForward: Boolean): String = {
    val next = df.schema
    val prior =
      if (carryForward)
        base.flatMap(readManifest(spark, root, _).schemaJson).map(schemaFromJson)
      else None
    prior.fold(org.apache.spark.sql.types.StructType(next.map(_.copy(nullable = true))))(
      mergeSchemas(_, next)).json
  }

  private def schemaFromJson(s: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(s).asInstanceOf[org.apache.spark.sql.types.StructType]

  private def commit(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      action: String,
      carryForward: Boolean): Int = {
    val base = latestVersion(spark, root)
    val prior = if (carryForward) base.map(readManifest(spark, root, _).dirs).getOrElse(Nil) else Nil
    val schema = evolvedSchema(spark, root, base, df, carryForward)
    val (rel, n) = writeData(spark, root, df)
    publish(spark, root, Commit(base.getOrElse(0) + 1, action, prior :+ rel, n, None, Some(schema)))
  }

  /** Create the table with an initial snapshot (version 1). */
  def create(spark: SparkSession, root: String, df: DataFrame): Int = {
    require(latestVersion(spark, root).isEmpty, s"table at $root already exists")
    commit(spark, root, df, "create", carryForward = false)
  }

  /** Append a batch: new version = previous live dirs + the new one. */
  def append(spark: SparkSession, root: String, df: DataFrame): Int =
    commit(spark, root, df, "append", carryForward = true)

  /** EXACTLY-ONCE streaming append — the `foreachBatch` sink contract.
    * The micro-batch id is recorded in the manifest, and the manifest
    * publish IS the transaction: a replayed epoch (restart, retry) finds
    * its batchId already committed and becomes a no-op, so the table holds
    * each epoch's rows exactly once however many times the batch reruns.
    * A publish race (e.g. two speculative drivers of the SAME epoch) makes
    * the loser re-check the log: if the winner committed our batchId we
    * are done; otherwise (a genuine interleaved writer) we retry at the
    * next version. The orphaned data dir of a lost race is reclaimed by
    * [[vacuum]] — rows only exist for readers once a manifest references
    * them, so duplicates are impossible by construction, not by cleanup. */
  def appendBatchExactlyOnce(spark: SparkSession, root: String, df: DataFrame, batchId: Long): Int = {
    def committed(): Option[Int] =
      history(spark, root).find(_.batchId.contains(batchId)).map(_.version)
    committed().getOrElse {
      val (rel, n) = writeData(spark, root, df)
      var result = -1
      while (result < 0) {
        val base = latestVersion(spark, root)
        val prior =
          base.map(readManifest(spark, root, _).dirs).getOrElse(Nil)
        val schema = evolvedSchema(spark, root, base, df, carryForward = true)
        try result = publish(
          spark,
          root,
          Commit(base.getOrElse(0) + 1, "append", prior :+ rel, n, Some(batchId), Some(schema)))
        catch {
          case _: ConcurrentCommitException =>
            committed().foreach(v => return v) // replayed epoch lost the race: done
          // else: interleaved OTHER writer took the slot; loop re-reads latest
        }
      }
      result
    }
  }

  /** `foreachBatch` adapter: `stream.writeStream.foreachBatch(SnapshotTable
    * .streamAppend(root)).start()`. */
  def streamAppend(root: String): (DataFrame, Long) => Unit =
    (batch, id) => { appendBatchExactlyOnce(batch.sparkSession, root, batch, id); () }

  /** Replace the table contents atomically. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Int =
    commit(spark, root, df, "overwrite", carryForward = false)

  /** Read a specific committed snapshot (time travel) with exactly the
    * schema recorded at that version: columns a later commit added do not
    * exist here, columns some older files lack read as null. Pre-schema
    * manifests (no recorded schema) fall back to footer mergeSchema. */
  def readVersion(spark: SparkSession, root: String, v: Int): DataFrame = {
    val m = readManifest(spark, root, v)
    val paths = m.dirs.map(d => new Path(root, d).toString)
    m.schemaJson match {
      case Some(s) => spark.read.schema(schemaFromJson(s)).parquet(paths: _*)
      case None => spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** Read the latest snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(
      spark,
      root,
      latestVersion(spark, root).getOrElse(sys.error(s"no snapshot table at $root")))

  /** Rewrite the live snapshot into `nFiles` range-clustered files on
    * `keyCol` (the [[ParquetLayout]] small-files cure, made SAFE under
    * concurrent readers: the rewrite lands in a fresh data dir and becomes
    * visible only at manifest publish; readers of older versions keep
    * their files until vacuum). Data-identical by construction — publish
    * races with a concurrent append surface as [[ConcurrentCommitException]]
    * rather than lost rows. */
  def compact(spark: SparkSession, root: String, keyCol: String, nFiles: Int): Int = {
    import org.apache.spark.sql.functions.col
    val base = latestVersion(spark, root).getOrElse(sys.error(s"no snapshot table at $root"))
    val cur = readVersion(spark, root, base)
    val (rel, n) = writeData(
      spark,
      root,
      cur.repartitionByRange(nFiles, col(keyCol)).sortWithinPartitions(keyCol))
    // a compact is data-identical, so it CARRIES the current schema rather
    // than re-deriving it from the rewritten files
    val schema = readManifest(spark, root, base).schemaJson
      .getOrElse(org.apache.spark.sql.types.StructType(cur.schema.map(_.copy(nullable = true))).json)
    publish(spark, root, Commit(base + 1, "compact", Seq(rel), n, None, Some(schema)))
  }

  /** Drop history: delete manifests older than the `keepLast` most recent,
    * then delete every data dir no RETAINED manifest references — reclaims
    * overwritten/compacted-away files and orphans from failed commits.
    *
    * READER CONTRACT (spec-proven): a reader pinned at version V is safe
    * against any vacuum that retains V — retained manifests' dirs are by
    * construction never in the delete set, so the pinned scan can never
    * lose a file mid-read. A vacuum that DROPS V breaks that reader
    * LOUDLY: its manifest is gone (readVersion throws) and its
    * no-longer-referenced dirs are deleted, so an already-constructed scan
    * fails on the missing files (Spark's default
    * `spark.sql.files.ignoreMissingFiles=false`) rather than silently
    * returning a partial table. Choose `keepLast` ≥ the oldest version any
    * live reader may hold.
    *
    * Production note: an in-flight commit's data dir is unreferenced until
    * its publish; run vacuum with an age threshold (or quiesced writers) on
    * a live table. Returns the deleted root-relative paths. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must retain at least the latest version")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val (drop, keep) = vs.splitAt(math.max(vs.size - keepLast, 0))
    val live = keep.flatMap(readManifest(spark, root, _).dirs).toSet
    val deletedManifests = drop.map { v =>
      f.delete(manifestPath(root, v), false); f"_manifests/v$v%08d.json"
    }
    val dataDir = new Path(root, "data")
    val deletedData =
      if (!f.exists(dataDir)) Seq.empty[String]
      else
        f.listStatus(dataDir).toSeq.map(s => "data/" + s.getPath.getName).filterNot(live).map {
          rel =>
            f.delete(new Path(root, rel), true); rel
        }
    deletedManifests ++ deletedData
  }
}
