package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst cosine similarity over two `array<float>` columns.
  *
  * Lives under `org.apache.spark.sql` because the Column↔Expression bridge
  * (`classic.ExpressionUtils`) and `AbstractDataType` are `private[sql]` —
  * the standard packaging technique for third-party native expressions.
  *
  * This is the deliberate "drop to a custom Expression" point (SURVEY.md §4):
  * a Scala UDF pays per-row `Seq[Float]` materialization + boxing at the UDF
  * boundary and breaks whole-stage codegen; this expression reads the
  * unsafe `ArrayData` buffers in place and `doGenCode` emits the dot-product
  * loop directly into the generated stage. The fold is the same
  * left-to-right interleaved accumulation as the DuckDB oracle's
  * `list_reduce`, so scores stay bit-identical across engines (LlmSpec +
  * the `ann_topk` oracle pin this).
  *
  * Zero vectors yield NaN (0/0) — identical to the UDF and oracle behavior.
  * Mismatched lengths truncate to the shorter array (zip_with semantics);
  * null ELEMENTS read as the primitive slot default (0.0f) in both the
  * interpreted and generated paths — embeddings are containsNull-free, so
  * neither case arises on the engine's own tables.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    // truncate to the shorter array (zip_with semantics) — looping the left
    // length over a shorter right would read past its unsafe buffer
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val x   = ctx.freshName("x")
      val y   = ctx.freshName("y")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** column-API entry point: `cosineSim($"a", $"b")` */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
