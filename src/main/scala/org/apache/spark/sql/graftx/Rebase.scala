package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, Row}

/** Lineage re-rooting for ITERATIVE jobs (guide §1.2 step 1 — fix the
  * distributed algorithm's hidden quadratic before tuning anything else).
  *
  * A loop of the shape
  *
  * {{{
  *   var cur = seed.cache()
  *   for (t <- rounds) { val next = f(cur).cache(); next.count(); cur = next }
  * }}}
  *
  * materializes each round's DATA into the cache, but every round's
  * LOGICAL plan still embeds the full plan of the previous round — when a
  * round references its predecessor k (≥2) times (k-core's two semi-joins +
  * degree aggregate, LPA's edge⋈label + argmin), the logical tree grows
  * k^t nodes and the driver re-analyzes/re-optimizes that whole tree on
  * EVERY action. Measured on the k-core peel at sf0.1 (7k-row edge
  * relation, 32 cores): round times 1.3 → 1.6 → 2.2 → 8.5 s with ZERO
  * surviving rows by round 2 — pure driver planning time, and the
  * same-JVM "accumulation" signature the round-12 verdict chased.
  *
  * [[fromMaterialized]] cuts the chain: given a df whose cache was just
  * materialized (cache() + count()), it returns a DataFrame whose logical
  * plan is a flat [[org.apache.spark.sql.execution.LogicalRDD]] over the
  * cached scan's InternalRow RDD — same rows, same schema, one node. The
  * next round's plan then wraps ONE scan node instead of the whole
  * history. The RDD replays through the cache (or, if evicted, through
  * the physical plan lineage captured in the RDD itself), so correctness
  * does not depend on the cache surviving; unpersist still goes through
  * the ORIGINAL cached DataFrame handle.
  *
  * Package-located here because `SparkSession.internalCreateDataFrame` is
  * `private[sql]` (the [[GraftLogSink]] precedent).
  */
object Rebase {
  /** Re-root `df`'s logical plan at its current physical RDD. Call AFTER
    * materializing the cache (the RDD of an unmaterialized plan would
    * recompute its full lineage on every action instead of reading the
    * cache). isStreaming=false, row-deterministic: the RDD pins the exact
    * partitions the cache holds.
    */
  def fromMaterialized(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    // LogicalRDD.fromDataset (the localCheckpoint internals, minus the extra
    // RDD persistence) carries the origin plan's outputPartitioning,
    // ordering, stats and constraints into the flat node — a bare
    // internalCreateDataFrame would forget that cur is hash-partitioned on
    // the join key and re-shuffle it every round.
    org.apache.spark.sql.classic.Dataset.ofRows(
      ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD
        .fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false))
  }

  /** [[fromMaterialized]] for typed Datasets is not needed — every iterative
    * loop in the engine works on DataFrames.
    */
  def apply(df: DataFrame): DataFrame = fromMaterialized(df)
}
