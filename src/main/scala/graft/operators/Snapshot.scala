package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time snapshot downsampling — the S5 source semantics (SURVEY.md
  * §2.1; reference `from_parser_to_rabbitmq.py:171-212` steps through the
  * period in 15-minute increments and keeps one depth-N book per step).
  *
  * Spark-first form: instead of polling per step, derive the snapshot table
  * from the update stream — the LATEST update per (entity, cadence bucket).
  * One shuffle on (entity, bucket) — the key a production table would be
  * bucketed by; the window sorts within groups only.
  */
object Snapshot {

  /** Latest row per (keys × cadence bucket). `tieBreak` must make the
    * ordering total (e.g. a unique event id) or the survivor is
    * nondeterministic under equal timestamps.
    */
  def atCadence(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      cadenceMinutes: Int,
      tieBreak: Column): DataFrame = {
    val step = cadenceMinutes * 60L
    val bucket = (floor(col(tsCol).cast("long") / step) * step)
      .cast("timestamp").as("snapshot_ts")
    val w = Window
      .partitionBy(keys.map(col) :+ col("snapshot_ts"): _*)
      .orderBy(col(tsCol).desc, tieBreak.desc)
    df.withColumn("snapshot_ts", bucket)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
