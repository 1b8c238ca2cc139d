package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a derived aggregate table — the materialized-
  * view refresh pattern of a warehouse ETL: the base table is partitioned by
  * a window column, appends land in a handful of windows, and the refresh
  * recomputes ONLY those windows' aggregates, dynamic-overwriting their
  * partitions in the derived table. Untouched partitions are neither read
  * nor written.
  *
  * The recompute reads the touched windows from the FULL base (not the
  * delta): a delta-only merge would need every aggregate to be algebraic
  * AND the merge to handle retractions; recompute-the-partition is the
  * always-correct form, costs O(touched windows), and leaves the aggregate
  * function unconstrained (any DataFrame → DataFrame).
  *
  * Scale notes (100 TB posture): refresh cost tracks the APPEND RATE (rows
  * in touched windows), not the table size — the same asymptotics as
  * [[graft.sources.Compaction]]. The touched-window list is metadata-scale
  * (distinct partition values of the delta). Partition pruning makes the
  * base re-read a few-partition scan; the overwrite is per-partition
  * dynamic, so concurrent windows could refresh independently.
  */
object IncrementalAgg {

  /** Append `delta` to the windowed base table, then refresh the derived
    * aggregate for exactly the windows the delta touched.
    *
    * @param agg base rows → aggregate rows; MUST carry `windowCol` through
    *            (each output row belongs to the window it was computed from)
    * @return the touched window values (metadata-scale)
    */
  def appendAndRefresh(
      delta: DataFrame,
      windowCol: String,
      baseDir: String,
      aggDir: String,
      agg: DataFrame => DataFrame): Seq[Any] = {
    require(delta.columns.contains(windowCol),
      s"delta must carry the window column '$windowCol'")
    val spark = delta.sparkSession
    // cluster by the partition column before the partitioned write: without
    // it every task appends a file into every window directory — a delta
    // spanning W windows on C cores writes W×C files and the refresh
    // re-opens all of them (guide §6 small-files; the BatchIngest.ingest
    // grid repartition exists for the same reason)
    delta.repartition(col(windowCol))
      .write.mode(SaveMode.Append).partitionBy(windowCol).parquet(baseDir)
    val touched = delta.select(windowCol).distinct().collect().map(_.get(0)).toSeq
    refreshWindows(spark, touched, windowCol, baseDir, aggDir, agg)
    touched
  }

  /** Recompute the given windows' aggregates from the base table and
    * dynamic-overwrite their partitions in `aggDir`.
    */
  def refreshWindows(
      spark: SparkSession,
      windows: Seq[Any],
      windowCol: String,
      baseDir: String,
      aggDir: String,
      agg: DataFrame => DataFrame): Unit = {
    if (windows.isEmpty) return
    val base = spark.read.parquet(baseDir)
      .where(col(windowCol).isin(windows: _*)) // partition-pruned scan
    val out = agg(base)
    require(out.columns.contains(windowCol),
      s"aggregate output must carry the window column '$windowCol'")
    out.repartition(col(windowCol)).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(windowCol)
      .parquet(aggDir)
  }
}
