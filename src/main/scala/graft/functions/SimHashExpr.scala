package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the 64-bit SimHash signature over a token
  * array — the second custom Expression beside CosineSimilarity. Compared
  * to `simhashUdf` it removes the UDF serialization boundary (no
  * Seq[String] conversion per row) and participates in whole-stage codegen,
  * so the signature computation inlines into the scan/projection loop of
  * the near-dup pipeline. Both paths call the same `SimHash.hashArrayData`
  * kernel, so interpreted, codegen, and UDF results are bit-identical.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  // type annotation omitted: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash.hashArrayData(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash.hashArrayData($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
