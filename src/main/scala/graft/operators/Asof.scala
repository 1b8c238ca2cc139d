package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series join Spark lacks natively (SURVEY.md §2.5 A2
  * names it for trade→candle alignment).
  *
  * Formulated Spark-first as union + ignore-nulls running last instead of a
  * range join: tag both streams, union them, and within each key's
  * time-ordered window carry the latest right-side value forward; left rows
  * then read their as-of match off the window. ONE shuffle on the join key,
  * no (left × right-candidates) row explosion, no range-join planner support
  * needed — the formulation a 100 TB pipeline can actually run. (A
  * broadcast-range alternative only works when one side is dim-sized.)
  */
object Asof {

  /** Left as-of join: attach to each left row the `valueCol` of the LATEST
    * right row with `rightTs` <= `leftTs` for the same `key` (inclusive; no
    * match → null), as column `<valueCol>_asof`.
    *
    * Matching is by ROW, not by value (DuckDB `ASOF JOIN` semantics): the
    * carried payload is a struct wrapper, so a matched right row whose value
    * is null yields null — it does NOT fall through to an older non-null
    * value. Right rows with a null timestamp cannot be "latest at any time"
    * and are dropped.
    *
    * `right` must be unique per (key, ts) — pre-aggregate with `max_by` if it
    * is not, or the carried value is nondeterministic under equal timestamps.
    */
  def joinLatest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valueCol: String): DataFrame = {
    // The union tags both sides with fixed working columns; a left frame
    // already carrying one (e.g. a second joinLatest chained with the SAME
    // valueCol) would be silently overwritten by withColumn and dropped —
    // fail loudly instead of corrupting user columns.
    val reserved = Seq("_asof_side", "_asof_ts", "_asof_row", s"${valueCol}_asof")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"joinLatest: left input already contains reserved column(s) ${clash.mkString(", ")} — " +
        s"rename them first (alias a prior joinLatest's ${valueCol}_asof away before chaining)")
    val l = left
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_ts", col(leftTs))
    val r = right
      .where(col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("_asof_ts"),
        struct(col(valueCol).as("v")).as("_asof_row"))
      .withColumn("_asof_side", lit(0))
    // right rows sort BEFORE left rows at equal timestamps → inclusive <=
    val w = Window.partitionBy(key).orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"${valueCol}_asof",
        last(col("_asof_row"), ignoreNulls = true).over(w).getField("v"))
      .where(col("_asof_side") === 1)
      .drop("_asof_side", "_asof_ts", "_asof_row")
  }
}
