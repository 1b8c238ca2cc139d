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

  /** partition-column value: the grid window this timestamp falls in,
    * expressed as the window's start date (start + chunk*30d) so the column
    * is human-readable AND range-prunable.
    */
  private def windowStart(ts: String, start: String): String =
    s"date_add(CAST('$start' AS DATE), " +
      s"CAST(floor(datediff($ts, CAST('$start' AS DATE)) / $ChunkDays) AS INT) * $ChunkDays)"

  /** Ingest API-shaped candle records for [start, end): normalize (P1–P3),
    * restrict to the range (F4), grid-partition, append as window-partitioned
    * Parquet at `outPath`. Returns the ingested DataFrame's schema twin
    * (read back from the written table).
    */
  def ingestCandles(
      api: DataFrame,
      start: String,
      end: String,
      outPath: String,
      gridBuckets: Int = 8): DataFrame = {
    val flat = Normalize.projectCandles(api)
      .withColumn("timestamp", to_timestamp(col("timestamp"), Schemas.TsFormat))
      .where(col("timestamp") >= lit(start).cast("timestamp") &&
        col("timestamp") < lit(end).cast("timestamp"))
      .withColumn("window", expr(windowStart("timestamp", start)))
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
}
