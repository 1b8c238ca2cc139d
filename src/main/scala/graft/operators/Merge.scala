package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE (CDC apply): fold a change stream into a base table.
  *
  * The reference's sink is append-only row inserts
  * (`/root/reference/app/for_clickhouse/from_rabbitmq_to_clickhouse.py:172`);
  * any mutable view of its entity tables (companies metadata changing over
  * time) needs exactly this operator downstream: latest-change-per-key wins,
  * deletes drop, unseen keys insert.
  *
  * Scale shape: one shuffle of `changes` on the key (window to pick the
  * latest version), one shuffle of `base` on the key for the outer join —
  * the same two exchanges a warehouse MERGE costs. No part of the plan
  * materializes more than hash-join state per key; change-log skew (one hot
  * key updated millions of times) is bounded by the window's per-partition
  * top-1, which Spark executes as a partial `Limit`-style rank filter after
  * local sort, never buffering a key's full history in one buffer beyond
  * the sort spill path.
  */
object Merge {

  /** Apply `changes` to `base`.
    *
    * @param base      current table snapshot
    * @param changes   change log carrying `keyCols`, `versionCols` (total
    *                  order within a key; later wins), `opCol` ('D' =
    *                  delete, anything else = upsert) and the new values of
    *                  `payloadCols`
    * @return the merged snapshot with columns `keyCols ++ payloadCols`,
    *         where payloads of un-changed base rows pass through, changed
    *         keys take the latest change's payload, 'D' keys are gone and
    *         change-only keys are inserted
    */
  def apply(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(col(_).desc): _*)
    val latest = changes
      .withColumn("_m_rn", row_number().over(w))
      .where(col("_m_rn") === 1)
      .select(
        keyCols.map(col) ++
          Seq(col(opCol).as("_m_op")) ++
          payloadCols.map(c => col(c).as("_m_" + c)): _*)

    val b = base.select((keyCols ++ payloadCols).map(col): _*)
    b.join(latest, keyCols, "full_outer")
      .where(col("_m_op").isNull || col("_m_op") =!= "D")
      .select(keyCols.map(col) ++ payloadCols.map(c =>
        // change-side payload wins when a change exists (op != 'D' here);
        // base payload when the key saw no change. A null payload IN an
        // upsert is honored (op drives the choice, not null-coalescing).
        when(col("_m_op").isNotNull, col("_m_" + c)).otherwise(col(c)).as(c)): _*)
  }
}
