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
    * normalize (P1/P4/P5 + P2/P3), restrict to EXACTLY the requested range
    * (F4), grid-partition, append as window-partitioned Parquet at `outPath`.
    * Returns the written table (read back).
    *
    * Partition overwrite is per-window, but a requested range may cut
    * through its two BOUNDARY windows — overwriting those with only the
    * run's slice would silently drop the complement a previous run wrote
    * there (e.g. a Feb-only run erasing late-Jan rows from a straddling
    * window). So a run asserts authority over exactly [start, end): rows the
    * existing table holds in partially-covered boundary windows OUTSIDE the
    * range are read back (partition-pruned to those windows) and carried
    * through the overwrite. New-vs-preserved rows are disjoint by
    * construction (source is filtered inside the range, preserved rows sit
    * outside it), so any sequence of (possibly overlapping, possibly
    * re-chunked, possibly partial-source) runs converges to exactly what one
    * big run over the union range would write — WITHOUT requiring each run's
    * source to span snapped window boundaries (BatchIngestSpec pins both the
    * equivalence and the partial-source case).
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
    val startDay  = LocalDate.parse(start)
    val endDay    = LocalDate.parse(end)
    val effStart  = snapDown(startDay)
    val lastWin   = snapDown(endDay.minusDays(1))
    val effEnd    = lastWin.plusDays(ChunkDays)
    val spark     = api.sparkSession
    val startTs   = lit(start).cast("timestamp")
    val endTs     = lit(end).cast("timestamp")
    val newRows = project(api)
      .withColumn("timestamp", to_timestamp(col("timestamp"), Schemas.TsFormat))
      .where(col("timestamp") >= startTs && col("timestamp") < endTs)
      .withColumn("window", expr(windowStart("timestamp")))
    // boundary windows the range only partially covers
    val partialWins = Seq(
      Option.when(startDay != effStart)(effStart),
      Option.when(endDay != effEnd)(lastWin)).flatten.distinct
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val fs   = outP.getFileSystem(spark.sessionState.newHadoopConf())
    // "existing data" = at least one window= partition dir — a dir holding
    // only write markers (_SUCCESS from a zero-row run) has nothing to
    // preserve and no schema to infer
    def windowDirs: Array[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(outP)) Array.empty
      else fs.listStatus(outP).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith("window="))
    val withPreserved =
      if (partialWins.isEmpty || windowDirs.isEmpty) newRows
      else {
        val preserved = spark.read.parquet(outPath)
          .where(col("window")
            .isInCollection(partialWins.map(java.sql.Date.valueOf)))
          .where(col("timestamp") < startTs || col("timestamp") >= endTs)
          .select(newRows.columns.map(col): _*)
          // materialize OFF the outPath files before the overwrite replaces
          // them (also lifts Spark's cannot-read-and-overwrite-same-path
          // guard). localCheckpoint is deliberate here: this is a once-per-
          // ingest-action materialization of ≤2 windows of rows, not a
          // shared query subplan (where .cache() is the rule — CLAUDE.md).
          .localCheckpoint()
        newRows.unionByName(preserved)
      }
    withPreserved
      .repartition(col("window"), pmod(hash(col("company_id")), lit(gridBuckets)))
      .write.mode(SaveMode.Overwrite)
      // DYNAMIC partition overwrite: a run replaces only the window
      // directories it produced — re-running a range is idempotent and a
      // later range APPENDS new windows (static overwrite would truncate
      // every previously ingested window in outPath)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("window")
      .parquet(outPath)
    // a run whose range holds no rows may leave only a _SUCCESS marker —
    // return an empty relation instead of failing schema inference, with
    // the partition column LAST like every parquet read-back, so callers
    // see one column order regardless of whether the range was empty
    if (windowDirs.isEmpty) {
      val dataCols = withPreserved.columns.filterNot(_ == "window")
      withPreserved.limit(0).select((dataCols :+ "window").map(col): _*)
    } else spark.read.parquet(outPath)
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
