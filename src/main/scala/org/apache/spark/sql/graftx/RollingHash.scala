package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string's code points:
  * `h := (h * 131 + codepoint) % 1_000_000_007`, h₀ = 0 — the document
  * fingerprint definition shared with the DuckDB oracle's
  * `list_reduce(list_transform(split(text,''), unicode), ...)` fold
  * (`graft.llm.TextStats.fingerprint`).
  *
  * The "drop to a custom Expression" rung (SURVEY.md §4) for this scalar
  * hot path: the HOF formulation `aggregate(split(text,''), ...)` allocates
  * a per-CHARACTER array and evaluates the lambda interpreted
  * (higher-order functions are CodegenFallback). This expression decodes
  * UTF-8 code points straight off the string's byte buffer — no character
  * array, no lambda, one call emitted into the generated stage.
  *
  * Intermediate values stay < 2^63 (h < 1e9+7, ×131 + ≤0x10FFFF ≪ 2^63) —
  * the same overflow-free argument the HOF version relied on.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  /** column-API entry point: `RollingHash($"text")` */
  def apply(c: Column): Column =
    ExpressionUtils.column(RollingHash(ExpressionUtils.expression(c)))

  /** Shared by the interpreted and generated paths. Decodes UTF-8 inline
    * (sequence length from the lead byte, continuation bytes folded in) —
    * parquet/UTF8String content is valid UTF-8 by construction, and the
    * decode is exactly the code-point sequence `String.codePointAt` walks.
    */
  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      var cp = 0
      var len = 1
      if (c < 0x80) cp = c
      else if ((c & 0xE0) == 0xC0) { cp = c & 0x1F; len = 2 }
      else if ((c & 0xF0) == 0xE0) { cp = c & 0x0F; len = 3 }
      else { cp = c & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < b.length) {
        cp = (cp << 6) | (b(i + k) & 0x3F)
        k += 1
      }
      h = (h * 131L + cp) % 1000000007L
      i += len
    }
    h
  }
}
