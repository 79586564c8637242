package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, And, Expression, LessThan, LessThanOrEqual, Length, Levenshtein, Literal, Subtract
}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Injected optimizer rule (the third extension kind beside the function
  * and the planner strategy): edit-distance pruning.
  *
  * `levenshtein(a, b) >= |length(a) - length(b)|` for all strings, so a
  * predicate `levenshtein(a, b) <= k` can be strengthened to
  * `|length(a) - length(b)| <= k AND levenshtein(a, b) <= k` without
  * changing results (nulls: both forms evaluate null → filtered — same
  * rows). The win: And evaluates left-to-right, so the O(len²) DP only
  * runs on pairs that survive the O(1) length check — on a fuzzy self-join
  * that is most of the candidate space. This is the classic length-filter
  * from edit-distance similarity search, applied automatically.
  *
  * Idempotent by construction: a conjunct is only added if no semantically
  * equal conjunct is already present, so the optimizer's fixpoint loop
  * terminates.
  */
object LevenshteinPruneRule extends Rule[LogicalPlan] {

  // Pre-fold literal lengths: ConstantFolding rewrites length('lit') to a
  // number between optimizer iterations, and the idempotence check compares
  // against the folded form — constructing it folded keeps semanticEquals
  // stable across iterations.
  private def lengthOf(e: Expression): Expression = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      Literal(s.numChars())
    case other => Length(other)
  }

  // Only the 2-arg form: levenshtein(a, b, t) returns -1 when the distance
  // exceeds t, so -1 <= k would pass the original predicate for arbitrarily
  // different strings while the length guard filters them — the rewrite
  // would change results.
  private def guardFor(cmp: Expression): Option[Expression] = cmp match {
    case LessThanOrEqual(l: Levenshtein, k @ Literal(_, _)) if l.threshold.isEmpty =>
      Some(LessThanOrEqual(Abs(Subtract(lengthOf(l.left), lengthOf(l.right))), k))
    case LessThan(l: Levenshtein, k @ Literal(_, _)) if l.threshold.isEmpty =>
      Some(LessThan(Abs(Subtract(lengthOf(l.left), lengthOf(l.right))), k))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjuncts(cond)
      val guards = conjuncts
        .flatMap(guardFor)
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else f.copy(condition = (guards ++ conjuncts).reduceLeft(And))
  }
}
