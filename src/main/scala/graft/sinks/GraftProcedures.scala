package graft.sinks

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure,
  ProcedureParameter,
  UnboundProcedure
}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalog MAINTENANCE through plain SQL `CALL` statements (SURVEY §2.J
  * `cap_catalog_procedures`) — the operational surface a lakehouse user
  * expects next to the DML:
  *
  * {{{
  * CALL graft.system.vacuum(table => 'ns.t', keep_last => 3, min_age_ms => 3600000)
  * CALL graft.system.vacuum('ns.t', 3, 0, true)           -- dry run: report only
  * CALL graft.system.history('ns.t')                       -- DESCRIBE HISTORY rows
  * CALL graft.system.optimize('ns.t', 'k', 8)              -- compact, cluster by k
  * CALL graft.system.optimize('ns.t', 'k,s', 8)            -- multi-column = Z-ORDER
  * CALL graft.system.create_tag('ns.t', 'golden', 3)       -- pin a version
  * CALL graft.system.create_branch('ns.t', 'dev')
  * CALL graft.system.fast_forward('ns.t', 'dev')           -- publish the branch
  * CALL graft.system.cherry_pick('ns.t', 'dev')            -- append-only delta onto advanced main
  * CALL graft.system.rebase('ns.t', 'dev')                 -- replay onto current main
  * CALL graft.system.drop_branch('ns.t', 'dev')
  * CALL graft.system.drop_tag('ns.t', 'golden')
  * CALL graft.system.restore('ns.t', 3)                    -- roll back as a NEW commit
  * }}}
  *
  * Implemented on Spark's stored-procedure connector API
  * ([[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]): Spark's
  * own parser/analyzer resolve the CALL, bind named/positional arguments
  * with defaults, and execute the procedure — results come back as rows
  * (a driver-local [[LocalScan]]: every result here is model-sized — a
  * reclamation report, the commit log, a version number — never data).
  * All procedures route onto the SAME maintenance operators the
  * programmatic surface proves ([[SnapshotTable.vacuum]] / [[SnapshotTable.historyDf]] /
  * [[SnapshotTable.compact]] / [[SnapshotTable.compactZOrder]] /
  * [[SnapshotTable.createTag]] / [[SnapshotTable.createBranch]]);
  * unknown procedure names refuse loudly with the known list. */
private[sinks] object GraftProcedures {

  // SQL identifiers resolve case-insensitively — namespace AND name alike
  private def isSystem(namespace: Array[String]): Boolean =
    namespace.length == 1 && namespace.head.equalsIgnoreCase("system")

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(
      isSystem(ident.namespace),
      s"procedures live in the 'system' namespace: CALL ${catalog.name()}.system.<proc>(...), " +
        s"got ${(ident.namespace :+ ident.name).mkString(".")}")
    all(catalog).getOrElse(
      ident.name.toLowerCase(java.util.Locale.ROOT),
      sys.error(
        s"unknown procedure '${ident.name}' — known: ${all(catalog).keys.toSeq.sorted.mkString(", ")}"))
  }

  def list(catalog: GraftCatalog, namespace: Array[String]): Array[Identifier] =
    if (!isSystem(namespace)) Array.empty
    else all(catalog).keys.toSeq.sorted.map(n => Identifier.of(Array("system"), n)).toArray

  private def all(catalog: GraftCatalog): Map[String, UnboundProcedure] = Map(
    "vacuum" -> VacuumProc(catalog),
    "history" -> HistoryProc(catalog),
    "optimize" -> OptimizeProc(catalog),
    "create_tag" -> CreateTagProc(catalog),
    "create_branch" -> CreateBranchProc(catalog),
    "drop_tag" -> DropRefProc(catalog, "drop_tag"),
    "drop_branch" -> DropRefProc(catalog, "drop_branch"),
    "fast_forward" -> FastForwardProc(catalog),
    "cherry_pick" -> CherryPickProc(catalog),
    "rebase" -> RebaseProc(catalog),
    "restore" -> RestoreProc(catalog))

  private def spark = SparkSession.active

  private def param(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()
  private def paramDef(name: String, dt: org.apache.spark.sql.types.DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One driver-local result scan: every procedure result is model-sized. */
  private final case class RowsScan(schema: StructType, out: Seq[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out.toArray
    override def readSchema(): StructType = schema
  }
  private def result(schema: StructType, out: Seq[InternalRow]): util.Iterator[Scan] =
    util.Collections.singletonList(RowsScan(schema, out): Scan).iterator()

  private abstract class Proc(override val name: String) extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // maintenance mutates state
  }

  private final case class VacuumProc(catalog: GraftCatalog) extends Proc("vacuum") {
    override def description: String =
      "reclaim data/manifests/checkpoints/CDC outside the retained history; dry_run reports only"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("keep_last", IntegerType),
      paramDef("min_age_ms", LongType, "0"),
      paramDef("dry_run", BooleanType, "false"))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val deleted = SnapshotTable.vacuum(
        spark, root, input.getInt(1), input.getLong(2), input.getBoolean(3))
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("deleted_path", StringType))),
        deleted.map(p => InternalRow(UTF8String.fromString(p))))
    }
  }

  private final case class HistoryProc(catalog: GraftCatalog) extends Proc("history") {
    override def description: String = "the commit log (DESCRIBE HISTORY): one row per version"
    override def parameters(): Array[ProcedureParameter] = Array(param("table", StringType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val df = SnapshotTable.historyDf(spark, root)
      // the commit log is model-sized by construction — executeCollect
      // hands back InternalRows in the frame's own schema
      result(df.schema, df.queryExecution.executedPlan.executeCollect().toSeq)
    }
  }

  private final case class OptimizeProc(catalog: GraftCatalog) extends Proc("optimize") {
    override def description: String =
      "compact live files re-clustered by the given column(s); >1 column = Z-ORDER"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("cluster_by", StringType),
      param("n_files", IntegerType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val cols = input.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(cols.nonEmpty, "optimize needs at least one cluster_by column")
      val n = input.getInt(2)
      val v =
        if (cols.size == 1) SnapshotTable.compact(spark, root, cols.head, n)
        else SnapshotTable.compactZOrder(spark, root, cols, n)
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("version", IntegerType))),
        Seq(InternalRow(v)))
    }
  }

  private final case class CreateTagProc(catalog: GraftCatalog) extends Proc("create_tag") {
    override def description: String = "pin a version (default: latest) under an immutable tag name"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("tag", StringType),
      paramDef("version", IntegerType, "-1"))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val asOf = Some(input.getInt(2)).filter(_ >= 0)
      val v = SnapshotTable.createTag(spark, root, input.getUTF8String(1).toString, asOf)
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("pinned_version", IntegerType))),
        Seq(InternalRow(v)))
    }
  }

  /** The whole ref workflow from pure SQL — [[SnapshotTable.fastForward]]
    * / [[SnapshotTable.cherryPick]] / [[SnapshotTable.rebase]] behind one
    * `new_version` result shape, so fork → stage → rebase → publish needs
    * no programmatic calls. */
  private abstract class BranchVerbProc(catalog: GraftCatalog, name: String)
      extends Proc(name) {
    protected def run(root: String, branch: String): Int
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("branch", StringType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val v = run(root, input.getUTF8String(1).toString)
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("new_version", IntegerType))),
        Seq(InternalRow(v)))
    }
  }

  private final case class FastForwardProc(catalog: GraftCatalog)
      extends BranchVerbProc(catalog, "fast_forward") {
    override def description: String =
      "publish a branch's commits onto main verbatim (refuses a diverged main — rebase first)"
    override protected def run(root: String, branch: String): Int =
      SnapshotTable.fastForward(spark, root, branch)
  }

  private final case class CherryPickProc(catalog: GraftCatalog)
      extends BranchVerbProc(catalog, "cherry_pick") {
    override def description: String =
      "publish an append-only branch delta onto an advanced main as one commit"
    override protected def run(root: String, branch: String): Int =
      SnapshotTable.cherryPick(spark, root, branch)
  }

  private final case class RebaseProc(catalog: GraftCatalog)
      extends BranchVerbProc(catalog, "rebase") {
    override def description: String =
      "replay a diverged branch's commits onto current main (appends re-attach, MOR and captured COW DML replay)"
    override protected def run(root: String, branch: String): Int =
      SnapshotTable.rebase(spark, root, branch)
  }

  private final case class DropRefProc(catalog: GraftCatalog, verb: String)
      extends Proc(verb) {
    override def description: String =
      if (verb == "drop_tag") "remove a tag (its pinned version becomes vacuumable)"
      else "remove a branch and its private manifest log"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("name", StringType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val ref = input.getUTF8String(1).toString
      if (verb == "drop_tag") SnapshotTable.dropTag(spark, root, ref)
      else SnapshotTable.dropBranch(spark, root, ref)
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("dropped", StringType))),
        Seq(InternalRow(UTF8String.fromString(ref))))
    }
  }

  private final case class RestoreProc(catalog: GraftCatalog) extends Proc("restore") {
    override def description: String =
      "roll the table back to an earlier version as a NEW commit (history is never rewritten)"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("version", IntegerType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val v = SnapshotTable.restore(spark, root, input.getInt(1))
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("new_version", IntegerType))),
        Seq(InternalRow(v)))
    }
  }

  private final case class CreateBranchProc(catalog: GraftCatalog) extends Proc("create_branch") {
    override def description: String =
      "fork a writable branch at the current version; read it via VERSION AS OF '<name>'"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("branch", StringType))
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val root = catalog.tableRootOf(input.getUTF8String(0).toString)
      val handle = SnapshotTable.createBranch(spark, root, input.getUTF8String(1).toString)
      result(
        StructType(Seq(org.apache.spark.sql.types.StructField("branch_handle", StringType))),
        Seq(InternalRow(UTF8String.fromString(handle))))
    }
  }
}
