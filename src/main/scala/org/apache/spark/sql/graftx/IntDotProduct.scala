package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst integer dot product over two `array<bigint>` columns —
  * the scoring kernel of the int8-quantized retrieval path
  * ([[graft.llm.Similarity.annInt8TopK]]): corpus × queries is the hottest
  * loop in quantized ANN serving, and exact 64-bit arithmetic means the
  * result participates in oracle-gated ranking, so the kernel must not
  * change semantics between interpreted and generated paths.
  *
  * Same packaging rationale as [[CosineSimilarity]] (the Column↔Expression
  * bridge is `private[sql]`), same escalation rationale (a Scala UDF pays
  * `Seq[Long]` materialization + boxing per row and breaks whole-stage
  * codegen; this reads the unsafe buffers in place and inlines the loop
  * into the generated stage).
  *
  * Mismatched lengths truncate to the shorter array (zip_with semantics);
  * null elements read as the primitive slot default (0L) — quantized
  * vectors are containsNull-free, so neither case arises in the engine.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0L
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      s"""
         |long $dot = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  /** column-API entry point: `IntDotProduct($"a", $"b")` */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      IntDotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
