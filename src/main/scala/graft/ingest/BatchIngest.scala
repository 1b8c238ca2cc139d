package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** E1 re-architecture — the batch producer (SURVEY.md §3 E1; reference
  * `app/for_rabbit/from_parser_to_rabbitmq.py:36-77,214-245`).
  *
  * The reference walks instruments SEQUENTIALLY and pulls each one's history
  * in 30-day chunks because its source is a rate-limited RPC API and its sink
  * is a per-row queue publish. Spark-first, the same (instrument × 30-day
  * window) task grid becomes the job's PARTITIONING: one declarative plan
  * where each task owns whole grid cells in parallel, and the sink is a
  * window-partitioned Parquet append — so every later time-range query prunes
  * to the windows it touches instead of re-chunking manually.
  *
  * 100 TB posture: the only shuffle is the grid repartition (needed anyway to
  * cluster the partitioned write — without it every task appends a file into
  * every window directory, a small-files explosion); range restriction (F4)
  * happens BEFORE the shuffle; `gridBuckets` scales write parallelism per
  * window without changing layout. The write is idempotent per run
  * (overwrite = the reference's declare-then-publish K3 semantics).
  */
object BatchIngest {

  /** 30-day extraction window (`from_parser_to_rabbitmq.py:46`) */
  val ChunkDays = 30

  /** Fixed anchor for the window grid. Anchoring to a CONSTANT epoch — not
    * the run's `start` — makes window boundaries a pure function of the
    * timestamp, so overlapping or re-chunked ingest runs land the same rows
    * in the SAME partitions and dynamic overwrite truly replaces them
    * (a start-anchored grid would write one record under two different
    * window keys across runs → silent duplication).
    */
  val GridEpoch = "1970-01-01"

  /** partition-column value: the grid window this timestamp falls in,
    * expressed as the window's start date (epoch + chunk*30d) so the column
    * is human-readable AND range-prunable.
    */
  private def windowStart(ts: String): String =
    s"date_add(CAST('$GridEpoch' AS DATE), " +
      s"CAST(floor(datediff($ts, CAST('$GridEpoch' AS DATE)) / $ChunkDays) AS INT) * $ChunkDays)"

  /** producer projection per timestamped route (P1/P4/P5) */
  private val projections: Map[String, DataFrame => DataFrame] = Map(
    "candles" -> Normalize.projectCandles,
    "trades" -> Normalize.projectTrades,
    "order_book" -> Normalize.projectOrderBook)

  /** Ingest API-shaped records of one timestamped route for [start, end):
    * normalize (P1/P4/P5 + P2/P3), restrict to the range (F4),
    * grid-partition, append as window-partitioned Parquet at `outPath`.
    * Returns the written table (read back).
    *
    * The range is SNAPPED OUTWARD to whole grid windows before filtering:
    * partition overwrite is per-window, so a run must own every window it
    * touches completely — a range cutting through a window would overwrite
    * it with a partial slice and silently drop the complement written by an
    * earlier run. With snapping, any sequence of (possibly overlapping,
    * possibly re-chunked) runs converges to exactly what one big run over
    * the union range would write (BatchIngestSpec pins this equivalence).
    */
  def ingest(
      api: DataFrame,
      table: String,
      start: String,
      end: String,
      outPath: String,
      gridBuckets: Int = 8): DataFrame = {
    val project = projections.getOrElse(table,
      throw new IllegalArgumentException(
        s"unknown grid-ingest route '$table' (one of ${projections.keys.mkString(", ")})"))
    import java.time.LocalDate
    import java.time.temporal.ChronoUnit
    val epoch = LocalDate.parse(GridEpoch)
    def snapDown(d: LocalDate): LocalDate =
      epoch.plusDays(ChronoUnit.DAYS.between(epoch, d) / ChunkDays * ChunkDays)
    val effStart = snapDown(LocalDate.parse(start))
    val effEnd   = snapDown(LocalDate.parse(end).minusDays(1)).plusDays(ChunkDays)
    val flat = project(api)
      .withColumn("timestamp", to_timestamp(col("timestamp"), Schemas.TsFormat))
      .where(col("timestamp") >= lit(effStart.toString).cast("timestamp") &&
        col("timestamp") < lit(effEnd.toString).cast("timestamp"))
      .withColumn("window", expr(windowStart("timestamp")))
    flat
      .repartition(col("window"), pmod(hash(col("company_id")), lit(gridBuckets)))
      .write.mode(SaveMode.Overwrite)
      // DYNAMIC partition overwrite: a run replaces only the window
      // directories it produced — re-running a range is idempotent and a
      // later range APPENDS new windows (static overwrite would truncate
      // every previously ingested window in outPath)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("window")
      .parquet(outPath)
    api.sparkSession.read.parquet(outPath)
  }

  /** convenience wrapper for the candles route (the reference's main grid) */
  def ingestCandles(
      api: DataFrame,
      start: String,
      end: String,
      outPath: String,
      gridBuckets: Int = 8): DataFrame =
    ingest(api, "candles", start, end, outPath, gridBuckets)
}
