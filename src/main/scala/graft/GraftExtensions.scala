package graft

import graft.functions.{CosineSimilarity, SimHashExpr}
import graft.plans.{AsOfJoinStrategy, LevenshteinPruneRule}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Canonical SparkSessionExtensions entry point for the library — the
  * registration path a deployment uses via
  * `spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions`):
  * every session built from that config gets the native cosine expression
  * in its function registry and the as-of join strategy in its planner,
  * with no per-query registration calls. The runtime-injection twins
  * (GraftSqlBridge.registerFunction / addStrategy) exist for already-built
  * sessions; both paths install the same objects.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("graft_cosine"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarity(children(0), children(1))))
    ext.injectFunction(
      (
        new FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SimHashExpr(children.head)))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // row-level SQL DML (DELETE/UPDATE/MERGE) on graft catalog identifiers
    ext.injectPlannerStrategy(_ => graft.sinks.GraftDmlStrategy)
    ext.injectOptimizerRule(_ => LevenshteinPruneRule)
  }
}
