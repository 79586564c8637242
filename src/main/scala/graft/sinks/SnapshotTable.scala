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

  /** Per-file statistics recorded in the manifest at write time: row count
    * plus min/max per orderable top-level column (numeric, string, date,
    * timestamp, boolean). This is the planning-time data-skipping index the
    * table formats carry: at 100 TB a range predicate should decide from
    * the MANIFEST which of millions of files can possibly match, instead of
    * listing and footer-probing every one — parquet row-group stats only
    * help after the file is already opened. Values are stored as JSON
    * (numbers/strings; timestamps as epoch micros) and compared through the
    * manifest-recorded table schema. A column with no entry (all-null file,
    * unsupported type, 64-char-plus strings, non-finite doubles) is simply
    * unprunable for that file — absence is always safe. */
  final case class FileStat(
      path: String,
      rows: Long,
      min: Map[String, JValue],
      max: Map[String, JValue],
      nonNull: Map[String, Long] = Map.empty)

  /** One commit's metadata. `dirs` are root-relative live data dirs;
    * `batchId` tags commits made by [[appendBatchExactlyOnce]] so replayed
    * streaming epochs are recognized; `schemaJson` is the TABLE schema as
    * of this version (Spark StructType JSON) — the manifest, not the
    * parquet footers, is the source of truth, so an old version reads with
    * exactly the schema it committed and a widened table reads old files
    * with the new columns null. Absent only in pre-schema manifests
    * (read-compat: those fall back to footer mergeSchema). `files` carries
    * [[FileStat]] rows for every live file the manifest's writer could
    * attribute stats to — like `dirs` it is a SELF-CONTAINED snapshot
    * (carried forward across appends), so data skipping needs exactly one
    * manifest read. Dirs not covered by `files` (pre-stats commits) are
    * read in full. */
  final case class Commit(
      version: Int,
      action: String,
      dirs: Seq[String],
      addedRows: Long,
      batchId: Option[Long] = None,
      schemaJson: Option[String] = None,
      files: Seq[FileStat] = Seq.empty)

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
    // useBigDecimalForDouble: decimal stats must round-trip EXACTLY — a
    // double-rounded max that lands below the true max could wrongly skip a
    // file whose edge row matches the predicate
    val j = JsonMethods.parse(txt, useBigDecimalForDouble = true)
    implicit val fmts: Formats = DefaultFormats
    val files = (j \ "files") match {
      case JArray(fs) =>
        fs.map { f =>
          def statMap(field: String): Map[String, JValue] = (f \ field) match {
            case JObject(kvs) => kvs.toMap
            case _ => Map.empty
          }
          val nn = (f \ "nn") match {
            case JObject(kvs) =>
              kvs.collect {
                case (k, JInt(v)) => k -> v.toLong
                case (k, JLong(v)) => k -> v
              }.toMap
            case _ => Map.empty[String, Long]
          }
          FileStat(
            (f \ "path").extract[String],
            (f \ "rows").extract[Long],
            statMap("min"),
            statMap("max"),
            nn)
        }
      case _ => Seq.empty
    }
    Commit(
      (j \ "version").extract[Int],
      (j \ "action").extract[String],
      (j \ "dirs").extract[Seq[String]],
      (j \ "addedRows").extract[Long],
      (j \ "batchId").extractOpt[Long],
      (j \ "schema").extractOpt[String],
      files)
  }

  /** The commit log, ascending by version. */
  def history(spark: SparkSession, root: String): Seq[Commit] =
    versions(spark, root).map(readManifest(spark, root, _))

  /** Orderable atomic types we record min/max for. */
  private def statable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
          StringType | DateType | TimestampType | TimestampNTZType | BooleanType =>
        true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Encode one collected min/max cell as manifest JSON. None = no stat
    * (null, non-finite double, overlong string) — always safe to omit. */
  private def statJson(dt: org.apache.spark.sql.types.DataType, v: Any): Option[JValue] = {
    import org.apache.spark.sql.types._
    if (v == null) None
    else
      dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(JLong(v.asInstanceOf[Number].longValue()))
        case FloatType | DoubleType =>
          val d = v.asInstanceOf[Number].doubleValue()
          if (java.lang.Double.isFinite(d)) Some(JDouble(d)) else None
        case _: DecimalType => Some(JDecimal(BigDecimal(v.asInstanceOf[java.math.BigDecimal])))
        case StringType =>
          val s = v.asInstanceOf[String]
          if (s.length <= 64) Some(JString(s)) else None
        case DateType => Some(JString(v.toString)) // ISO yyyy-MM-dd: lexicographic = chronological
        case TimestampType =>
          val t = v.asInstanceOf[java.sql.Timestamp]
          Some(JLong(t.getTime / 1000 * 1000000L + t.getNanos / 1000)) // exact epoch micros
        case TimestampNTZType =>
          val t = v.asInstanceOf[java.time.LocalDateTime]
          Some(JLong(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000))
        case BooleanType => Some(JLong(if (v.asInstanceOf[Boolean]) 1L else 0L))
        case _ => None
      }
  }

  /** Write `df` to a fresh data dir and return (relative dir, row count,
    * per-file stats). The post-write validation scan the commit protocol
    * already paid for the row count now ALSO yields the skipping index:
    * one `groupBy(input_file_name())` agg computes count + min/max of every
    * orderable column per file — zero extra passes, and the collected rows
    * are file-count-sized (manifest metadata, same order as `dirs`). */
  private def writeData(spark: SparkSession, root: String, df: DataFrame): (String, Long, Seq[FileStat]) = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val rel = "data/" + java.util.UUID.randomUUID().toString
    val abs = new Path(root, rel).toString
    df.write.parquet(abs)
    val written = spark.read.parquet(abs)
    val statFields = written.schema.fields.filter(f => statable(f.dataType)).toSeq
    def q(n: String) = col("`" + n + "`")
    val aggs = count(lit(1)).as("__rows") +:
      statFields.flatMap(f =>
        Seq(
          min(q(f.name)).as("__min_" + f.name),
          max(q(f.name)).as("__max_" + f.name),
          count(q(f.name)).as("__nn_" + f.name))) // non-null count: min/max ignore nulls, so containment proofs need it
    val perFile = written
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .toSeq
    val stats = perFile.map { r =>
      val uri = r.getAs[String]("__file")
      val idx = uri.indexOf(rel)
      val path = if (idx >= 0) uri.substring(idx) else rel + "/" + uri.substring(uri.lastIndexOf('/') + 1)
      val mins = statFields.flatMap { f =>
        val mi = statJson(f.dataType, r.getAs[Any]("__min_" + f.name))
        val ma = statJson(f.dataType, r.getAs[Any]("__max_" + f.name))
        // record only complete [min,max] pairs — a one-sided bound can't prune safely here
        if (mi.isDefined && ma.isDefined) Some(f.name -> mi.get) else None
      }.toMap
      val maxs = statFields.flatMap { f =>
        val mi = statJson(f.dataType, r.getAs[Any]("__min_" + f.name))
        val ma = statJson(f.dataType, r.getAs[Any]("__max_" + f.name))
        if (mi.isDefined && ma.isDefined) Some(f.name -> ma.get) else None
      }.toMap
      val nns = statFields.map(f => f.name -> r.getAs[Long]("__nn_" + f.name)).toMap
      FileStat(path, r.getAs[Long]("__rows"), mins, maxs, nns)
    }
    (rel, stats.map(_.rows).sum, stats)
  }

  /** Atomic publish: create-if-absent the next manifest. Package-private so
    * the spec can drive the commit race directly. */
  private[graft] def publish(spark: SparkSession, root: String, c: Commit): Int = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val p = manifestPath(root, c.version)
    val fileArr = JArray(c.files.map { fst =>
      JObject(
        "path" -> JString(fst.path),
        "rows" -> JLong(fst.rows),
        "min" -> JObject(fst.min.toList.sortBy(_._1)),
        "max" -> JObject(fst.max.toList.sortBy(_._1)),
        "nn" -> JObject(fst.nonNull.toList.sortBy(_._1).map { case (k, v) => k -> (JLong(v): JValue) }))
    }.toList)
    val fields = List(
      "version" -> JInt(c.version),
      "action" -> JString(c.action),
      "dirs" -> JArray(c.dirs.map(JString(_)).toList),
      "addedRows" -> JLong(c.addedRows)) ++
      c.batchId.map(b => "batchId" -> (JLong(b): JValue)).toList ++
      c.schemaJson.map(s => "schema" -> (JString(s): JValue)).toList ++
      (if (c.files.nonEmpty) List("files" -> (fileArr: JValue)) else Nil)
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
    val priorManifest = if (carryForward) base.map(readManifest(spark, root, _)) else None
    val prior = priorManifest.map(_.dirs).getOrElse(Nil)
    val priorFiles = priorManifest.map(_.files).getOrElse(Nil)
    val schema = evolvedSchema(spark, root, base, df, carryForward)
    val (rel, n, stats) = writeData(spark, root, df)
    publish(
      spark,
      root,
      Commit(base.getOrElse(0) + 1, action, prior :+ rel, n, None, Some(schema), priorFiles ++ stats))
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
      val (rel, n, stats) = writeData(spark, root, df)
      var result = -1
      while (result < 0) {
        val base = latestVersion(spark, root)
        val priorManifest = base.map(readManifest(spark, root, _))
        val prior = priorManifest.map(_.dirs).getOrElse(Nil)
        val priorFiles = priorManifest.map(_.files).getOrElse(Nil)
        val schema = evolvedSchema(spark, root, base, df, carryForward = true)
        try result = publish(
          spark,
          root,
          Commit(
            base.getOrElse(0) + 1,
            "append",
            prior :+ rel,
            n,
            Some(batchId),
            Some(schema),
            priorFiles ++ stats))
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

  /** An inclusive range predicate on one column for manifest-level data
    * skipping: `lower <= col <= upper`, either side open. Values: numbers
    * for numeric columns, String/java.sql.Date for dates, String for
    * strings, java.sql.Timestamp for timestamps, Boolean for booleans. */
  final case class Bound(column: String, lower: Option[Any] = None, upper: Option[Any] = None)

  /** Normalize a stat JValue or user bound to one comparable axis per
    * column type: BigDecimal for numerics/timestamps/bools, String for
    * strings/dates (ISO dates compare lexicographically). None = not
    * comparable → never prune. */
  private def normJ(dt: org.apache.spark.sql.types.DataType, j: JValue): Option[Either[BigDecimal, String]] = {
    import org.apache.spark.sql.types._
    (dt, j) match {
      case (StringType | DateType, JString(s)) => Some(Right(s))
      case (_, JInt(v)) => Some(Left(BigDecimal(v)))
      case (_, JLong(v)) => Some(Left(BigDecimal(v)))
      case (_, JDouble(v)) => Some(Left(BigDecimal(v)))
      case (_, JDecimal(v)) => Some(Left(v))
      case _ => None
    }
  }

  private def normBound(dt: org.apache.spark.sql.types.DataType, v: Any): Option[Either[BigDecimal, String]] = {
    import org.apache.spark.sql.types._
    (dt, v) match {
      case (StringType | DateType, s: String) => Some(Right(s))
      case (DateType, d: java.sql.Date) => Some(Right(d.toString))
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        Some(Left(BigDecimal(t.getTime / 1000 * 1000000L + t.getNanos / 1000)))
      case (BooleanType, b: Boolean) => Some(Left(BigDecimal(if (b) 1 else 0)))
      case (_, n: Number) => Some(Left(BigDecimal(n.toString)))
      case _ => None
    }
  }

  private def lt(a: Either[BigDecimal, String], b: Either[BigDecimal, String]): Boolean =
    (a, b) match {
      case (Left(x), Left(y)) => x < y
      case (Right(x), Right(y)) => x < y
      case _ => false // mixed axes: never claim an ordering → never prune
    }

  /** The skipping decision for one version: which stat-covered files can
    * possibly match `bounds`, which are proven dead, and which live dirs
    * have no stats and must be read in full. Package-private so the spec
    * can assert skipping actually engages. */
  private[graft] final case class PrunePlan(keep: Seq[String], skipped: Seq[String], uncoveredDirs: Seq[String])

  private[graft] def prunePlan(spark: SparkSession, root: String, v: Int, bounds: Seq[Bound]): PrunePlan = {
    val m = readManifest(spark, root, v)
    val schema = m.schemaJson.map(schemaFromJson)
    val typed = bounds.flatMap { b =>
      schema.flatMap(_.fields.find(_.name == b.column)).map(f => (b, f.dataType))
    }
    val coveredDirs = m.files.map(f => f.path.take(f.path.lastIndexOf('/'))).toSet
    val uncovered = m.dirs.filterNot(coveredDirs.contains)
    // a file is provably dead iff SOME bound excludes its whole [min,max]
    def dead(fst: FileStat): Boolean =
      typed.exists { case (b, dt) =>
        val mi = fst.min.get(b.column).flatMap(normJ(dt, _))
        val ma = fst.max.get(b.column).flatMap(normJ(dt, _))
        val belowLower = (b.lower.flatMap(normBound(dt, _)), ma) match {
          case (Some(lo), Some(mx)) => lt(mx, lo)
          case _ => false
        }
        val aboveUpper = (b.upper.flatMap(normBound(dt, _)), mi) match {
          case (Some(hi), Some(mn)) => lt(hi, mn)
          case _ => false
        }
        belowLower || aboveUpper
      }
    val (skipped, keep) = m.files.partition(dead)
    PrunePlan(keep.map(_.path), skipped.map(_.path), uncovered)
  }

  /** Time-travel read with manifest-level data skipping: plans the scan
    * over only the files whose recorded [min,max] can intersect `bounds`
    * (plus any pre-stats dirs, read in full), then applies the bounds as a
    * residual row filter — so the result is EXACTLY
    * `readVersion(...).filter(bounds)`, just over fewer files. Skipping is
    * planning-time: at 100 TB the driver decides from one manifest read
    * which files exist for the scan at all — no listing, no footer probes,
    * no tasks for dead files. After [[compact]] range-clusters on the
    * predicate column, a narrow range touches ~1/nFiles of the data. */
  def readVersionWhere(spark: SparkSession, root: String, v: Int, bounds: Seq[Bound]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val m = readManifest(spark, root, v)
    val plan = prunePlan(spark, root, v, bounds)
    val paths = plan.keep.map(p => new Path(root, p).toString) ++
      plan.uncoveredDirs.map(d => new Path(root, d).toString)
    val schema = m.schemaJson.map(schemaFromJson)
    val base =
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema.getOrElse(sys.error("empty prune result on a pre-schema manifest")))
      else
        schema match {
          case Some(s) => spark.read.schema(s).parquet(paths: _*)
          case None => spark.read.option("mergeSchema", "true").parquet(paths: _*)
        }
    bounds.foldLeft(base) { (df, b) =>
      val c = col("`" + b.column + "`")
      val withLo = b.lower.fold(df)(lo => df.filter(c >= lit(lo)))
      b.upper.fold(withLo)(hi => withLo.filter(c <= lit(hi)))
    }
  }

  /** Latest-snapshot read with data skipping — see [[readVersionWhere]]. */
  def readWhere(spark: SparkSession, root: String, bounds: Seq[Bound]): DataFrame =
    readVersionWhere(
      spark,
      root,
      latestVersion(spark, root).getOrElse(sys.error(s"no snapshot table at $root")),
      bounds)

  /** The metadata/scan split behind [[countWhere]]: rows answerable from
    * manifest stats alone vs paths that still need a physical scan.
    * Package-private so the spec can assert the scan set is empty/small. */
  private[graft] final case class CountPlan(metaRows: Long, scanPaths: Seq[String])

  private[graft] def countPlan(spark: SparkSession, root: String, v: Int, bounds: Seq[Bound]): CountPlan = {
    val m = readManifest(spark, root, v)
    val schema = m.schemaJson.map(schemaFromJson)
    val typed = bounds.map { b =>
      b -> schema.flatMap(_.fields.find(_.name == b.column)).map(_.dataType)
    }
    val plan = prunePlan(spark, root, v, bounds)
    val keep = m.files.filter(f => plan.keep.contains(f.path))
    // a file counts WHOLLY iff every bound provably matches ALL its rows:
    // the bound column has no nulls in the file (min/max ignore nulls) and
    // the file's [min,max] sits inside [lower,upper]
    def whollyMatches(fst: FileStat): Boolean =
      typed.forall {
        case (b, Some(dt)) =>
          val mi = fst.min.get(b.column).flatMap(normJ(dt, _))
          val ma = fst.max.get(b.column).flatMap(normJ(dt, _))
          val noNulls = fst.nonNull.get(b.column).contains(fst.rows)
          val loOk = b.lower.fold(true)(lo =>
            (normBound(dt, lo), mi) match {
              case (Some(l), Some(mn)) => !lt(mn, l)
              case _ => false
            })
          val hiOk = b.upper.fold(true)(hi =>
            (normBound(dt, hi), ma) match {
              case (Some(h), Some(mx)) => !lt(h, mx)
              case _ => false
            })
          noNulls && loOk && hiOk
        case (_, None) => false // bound on a column the schema can't type: must scan
      }
    val (whole, boundary) = keep.partition(whollyMatches)
    CountPlan(whole.map(_.rows).sum, boundary.map(_.path) ++ plan.uncoveredDirs)
  }

  /** Count rows matching `bounds` with the manifest as the first-class
    * index: files whose stats PROVE every row matches (range contained,
    * no nulls in the bound columns) contribute their recorded row count
    * with no I/O at all; only boundary files — and pre-stats dirs — are
    * scanned, with the bounds as a residual filter. With no bounds over a
    * fully stats-covered table this is a pure metadata query: count(*) at
    * 100 TB from one manifest read, zero tasks. Exactness is structural:
    * every file lands in exactly one of {skipped: proven 0 matches,
    * whole: proven all-match, scan: counted physically}. */
  def countWhere(spark: SparkSession, root: String, bounds: Seq[Bound]): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = latestVersion(spark, root).getOrElse(sys.error(s"no snapshot table at $root"))
    val m = readManifest(spark, root, v)
    val plan = countPlan(spark, root, v, bounds)
    val scanned =
      if (plan.scanPaths.isEmpty) 0L
      else {
        val paths = plan.scanPaths.map(p => new Path(root, p).toString)
        val base = m.schemaJson match {
          case Some(s) => spark.read.schema(schemaFromJson(s)).parquet(paths: _*)
          case None => spark.read.option("mergeSchema", "true").parquet(paths: _*)
        }
        bounds
          .foldLeft(base) { (df, b) =>
            val c = col("`" + b.column + "`")
            val withLo = b.lower.fold(df)(lo => df.filter(c >= lit(lo)))
            b.upper.fold(withLo)(hi => withLo.filter(c <= lit(hi)))
          }
          .count()
      }
    plan.metaRows + scanned
  }

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
    val (rel, n, stats) = writeData(
      spark,
      root,
      cur.repartitionByRange(nFiles, col(keyCol)).sortWithinPartitions(keyCol))
    // a compact is data-identical, so it CARRIES the current schema rather
    // than re-deriving it from the rewritten files. Range-clustering on
    // keyCol is also what makes the per-file stats SELECTIVE: disjoint key
    // ranges per file turn a key predicate into near-perfect file skipping.
    val schema = readManifest(spark, root, base).schemaJson
      .getOrElse(org.apache.spark.sql.types.StructType(cur.schema.map(_.copy(nullable = true))).json)
    publish(spark, root, Commit(base + 1, "compact", Seq(rel), n, None, Some(schema), stats))
  }

  /** Multi-column clustering compaction — the OPTIMIZE ZORDER core. A
    * single-key [[compact]] makes per-file ranges tight on ONE column;
    * predicates on any other column touch every file. Z-ordering interleaves
    * the bits of each column's QUANTILE-bucket rank into one clustering key,
    * so every clustered column's values vary only locally along the curve
    * and per-file [min,max] stay narrow on ALL of them — a range predicate
    * on any one clustered column then skips most files via the manifest
    * stats [[readWhere]] already consumes.
    *
    * Quantile bucketing (not value scaling) is what makes this skew-proof:
    * each column's axis is its RANK, so a heavy-hitter value occupies many
    * buckets' worth of rows but the curve still splits the other columns
    * within it. Cuts come from one `approxQuantile` pass (driver holds
    * 2^bits-1 doubles per column — model-sized). The per-row z-value is a
    * compiled binary search + bit interleave over the broadcast cuts; a UDF
    * is the right tool here (a 255-branch `when` chain per column would
    * blow codegen), and it runs once per row on the WRITE path only.
    *
    * Supported clustering columns: numeric, date, timestamp (monotone cast
    * to a double axis). Strings are refused loudly — hashing one would
    * destroy the range locality z-ordering exists to create. Nulls cluster
    * at bucket 0 (stats omit them anyway; see [[FileStat]]). */
  def compactZOrder(spark: SparkSession, root: String, cols: Seq[String], nFiles: Int): Int = {
    import org.apache.spark.sql.functions.{col, datediff, lit, to_date, udf, unix_micros}
    import org.apache.spark.sql.types._
    require(cols.nonEmpty && cols.size <= 8, s"z-order over 1..8 columns, got ${cols.size}")
    val base = latestVersion(spark, root).getOrElse(sys.error(s"no snapshot table at $root"))
    val cur = readVersion(spark, root, base)
    val bits = math.min(8, 63 / cols.size)
    val nCuts = (1 << bits) - 1
    def axis(name: String): org.apache.spark.sql.Column = {
      val dt = cur.schema.fields
        .find(_.name == name)
        .getOrElse(sys.error(s"no column '$name' in table schema"))
        .dataType
      dt match {
        case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
            _: DecimalType =>
          col("`" + name + "`").cast("double")
        case DateType => datediff(col("`" + name + "`"), to_date(lit("1970-01-01"))).cast("double")
        case TimestampType => unix_micros(col("`" + name + "`")).cast("double")
        case other => sys.error(s"z-order needs a rangeable column; '$name' is ${other.sql}")
      }
    }
    val axisNames = cols.indices.map(i => s"__zx$i")
    val proj = cols.zip(axisNames).foldLeft(cur) { case (df, (c, a)) => df.withColumn(a, axis(c)) }
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    val cuts: Array[Array[Double]] =
      proj.stat.approxQuantile(axisNames.toArray, probs, 0.001)
    val zUdf = udf { (xs: Seq[java.lang.Double]) =>
      var z = 0L
      var c = 0
      while (c < xs.length) {
        val x = xs(c)
        val bucket =
          if (x == null) 0
          else {
            // first cut strictly greater than x = the bucket index
            val cc = cuts(c)
            var lo = 0; var hi = cc.length
            while (lo < hi) { val mid = (lo + hi) >>> 1; if (cc(mid) <= x) lo = mid + 1 else hi = mid }
            lo
          }
        var b = 0
        while (b < bits) { // MSB-first interleave: column c contributes bit (bits-1-b)
          if ((bucket & (1 << (bits - 1 - b))) != 0)
            z |= 1L << ((bits - 1 - b).toLong * xs.length + (xs.length - 1 - c))
          b += 1
        }
        c += 1
      }
      z
    }
    val clustered = proj
      .withColumn("__z", zUdf(org.apache.spark.sql.functions.array(axisNames.map(col): _*)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(axisNames :+ "__z": _*)
    val (rel, n, stats) = writeData(spark, root, clustered)
    val schema = readManifest(spark, root, base).schemaJson
      .getOrElse(org.apache.spark.sql.types.StructType(cur.schema.map(_.copy(nullable = true))).json)
    publish(spark, root, Commit(base + 1, "compact", Seq(rel), n, None, Some(schema), stats))
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
