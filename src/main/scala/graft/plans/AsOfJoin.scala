package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension: a native left-outer as-of join —
  * for every left row, the single latest right row with the same key and
  * rightTime <= leftTime (ties broken by the largest tieBreak value).
  *
  * The composable formulation (theta join + row_number() = 1, q_join_asof)
  * is correct but materializes EVERY (left, prior-right) candidate pair
  * before the window discards all but one — O(sum of per-key history
  * lengths × matches) rows through the shuffle. This operator is the
  * at-scale path: it declares ClusteredDistribution on the key and
  * (key, time) child ordering, so Catalyst inserts the exchanges/sorts
  * exactly as it would for a sort-merge join, and the merge then emits one
  * row per left row in a single forward pass — no candidate blowup, state
  * of exactly one buffered right row per key.
  *
  * Key/time/tie expressions must be of 8-byte-integral internal types
  * (long, timestamp, timestamp_ntz) — the merge compares raw longs, which
  * covers the engine's id/event-time surface without a generic ordering
  * dispatch in the hot loop.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Long = -1L)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoin logical node → AsOfJoinExec physical node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Long = -1L)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // Same requirements a sort-merge join would declare: co-clustered on the
  // key, each side locally sorted — EnsureRequirements inserts compatible
  // hash exchanges and sorts. Right side additionally sorts by the tie
  // breaker so "last row consumed" is exactly the (max time, max tie) pick.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending), SortOrder(rightTieBreak, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt) = (rightKey, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      // Bind the output projection against a NULLABLE right-side schema:
      // binding against the child's original (non-null) attributes makes
      // codegen skip the isNullAt check, so the no-match nullRight row would
      // project as zeros instead of NULLs.
      val outProj =
        UnsafeProjection.create(outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      val tol = tolerance
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey = 0L
        private var rHeadTime = 0L
        private var rHeadValid = false
        private var best: InternalRow = _
        private var bestKey = 0L
        private var bestTime = 0L
        advanceRight()

        private def advanceRight(): Unit = {
          rHeadValid = false
          while (!rHeadValid && rIter.hasNext) {
            rHead = rIter.next()
            val kt = rProj(rHead)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              rHeadKey = kt.getLong(0)
              rHeadTime = kt.getLong(1)
              rHeadValid = true
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val kt = lProj(l)
          numOutputRows += 1
          if (kt.isNullAt(0) || kt.isNullAt(1)) {
            outProj(joined(l, nullRight))
          } else {
            val k = kt.getLong(0)
            val t = kt.getLong(1)
            if (best != null && bestKey != k) best = null
            // Consume right rows for keys already passed and, for this key,
            // all rows at or before t; the last one kept is the as-of match
            // (right side is (key, time, tie)-sorted; left times ascend).
            while (rHeadValid && (rHeadKey < k || (rHeadKey == k && rHeadTime <= t))) {
              if (rHeadKey == k) {
                best = rHead.copy() // rIter reuses its row buffer
                bestKey = k
                bestTime = rHeadTime
              }
              advanceRight()
            }
            // tolerance (< 0 = unbounded): a prior row older than t - tol is
            // stale for THIS left row but stays buffered — left times ascend
            // within the key, yet a later left row can never un-stale it, so
            // staleness only needs re-checking, never re-scanning.
            val matched = best != null && (tol < 0L || t - bestTime <= tol)
            outProj(joined(l, if (matched) best else nullRight))
          }
        }
      }
    }
  }
}

/** User-facing API for the native as-of join. */
object AsOfJoinOps {
  /** Left-outer as-of join by column names: for each `left` row, the latest
    * `right` row with equal key and rightTime <= leftTime, ties broken by
    * the largest tie-break value; right columns null when no prior row.
    * `toleranceMicros` >= 0 additionally requires
    * leftTime - rightTime <= tolerance (pandas merge_asof semantics) —
    * priors older than the bound emit the null row. Unit is whatever the
    * raw 8-byte time encoding uses (µs for timestamps, the value itself
    * for longs). */
  def latestPrior(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      toleranceMicros: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, AsOfJoinStrategy)
    // A self-join (or two frames derived from one source) carries the same
    // ExprIds on both sides; duplicate ids in the node's output misresolve.
    // Re-projecting the right side through fresh Aliases mints new ExprIds,
    // so the natural self-join use just works.
    val leftIds = left.queryExecution.analyzed.outputSet
    val rightSafe =
      if (right.queryExecution.analyzed.output.exists(leftIds.contains))
        right.select(right.columns.toIndexedSeq.map(c =>
          org.apache.spark.sql.functions.col(c).as(c)): _*)
      else right
    def attr(df: DataFrame, n: String): Attribute =
      df.queryExecution.analyzed.output
        .find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"column $n not in ${df.columns.mkString(",")}"))
    GraftSqlBridge.ofRows(
      spark,
      AsOfJoin(
        left.queryExecution.analyzed,
        rightSafe.queryExecution.analyzed,
        attr(left, leftKey),
        attr(rightSafe, rightKey),
        attr(left, leftTime),
        attr(rightSafe, rightTime),
        attr(rightSafe, rightTieBreak),
        toleranceMicros))
  }
}
