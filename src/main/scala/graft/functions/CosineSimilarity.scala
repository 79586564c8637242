package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two float vectors
  * (SURVEY.md §4 optional item 1): participates in whole-stage codegen, so
  * the kernel inlines into the generated join/projection loop with no
  * UDF serialization boundary, no Seq[Float] boxing, and direct reads from
  * the columnar ArrayData.
  *
  * Semantics are IDENTICAL to SimKernel.cos and to the DuckDB oracle fold
  * (sequential index-order double accumulation, cos = dot/sqrt(na·nb)) —
  * the operation sequence must not be reordered or results stop being
  * bit-identical across the interpreted path, the codegen path, and DuckDB.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  // type annotation omitted: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
