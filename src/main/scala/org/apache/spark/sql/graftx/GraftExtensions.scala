package org.apache.spark.sql.graftx

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point for the engine's native expressions —
  * the (c) rung of the extension ladder (SURVEY.md §4): built-in operators
  * cover every whole-operator semantic this engine needs, so the only
  * Catalyst surface worth registering is the scalar expression layer, and
  * this class makes it reachable from SQL text, not just the Column API.
  *
  * Wire-up options:
  *  - config: `spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions`
  *    (works with spark-submit / connect, no code changes), or
  *  - builder: `SparkSession.builder().withExtensions(new GraftExtensions)`, or
  *  - post-hoc: [[GraftExtensions.register]] on a live session (tests, REPL —
  *    extension instances configured at build time don't apply to an
  *    already-created session returned by `getOrCreate`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimilarity)
}

object GraftExtensions {

  /** `cosine_similarity(array<float>, array<float>) -> double` */
  val cosineSimilarity: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(
      classOf[CosineSimilarity].getCanonicalName, "cosine_similarity"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        s"cosine_similarity expects exactly 2 arguments, got ${args.length}")
      CosineSimilarity(args(0), args(1))
    })

  /** Register into a LIVE session's function registry (same registration the
    * extension performs at session build). Idempotent: re-registering simply
    * replaces the entry.
    */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = cosineSimilarity
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
