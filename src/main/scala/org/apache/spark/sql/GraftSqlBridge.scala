package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into package-private Spark SQL internals — the standard
  * pattern for third-party Catalyst extension libraries (native Expressions
  * need a way to become user-facing Columns). Kept to three one-liners so
  * the internal surface touched is as small as possible.
  */
object GraftSqlBridge {
  /** Wrap a raw Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst Expression behind a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a native expression under `name` for the spark.sql surface. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
