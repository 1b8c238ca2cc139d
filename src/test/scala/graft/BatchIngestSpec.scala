package graft

import graft.ingest.{BatchIngest, IngestPack}
import org.apache.spark.sql.functions._

/** E1 batch grid ingest: window-partitioned layout + partition pruning. */
class BatchIngestSpec extends SparkSpec {

  test("grid ingest writes window-partitioned parquet and a window predicate prunes") {
    val out = "/tmp/graft_test_grid/candles"
    val table = BatchIngest.ingestCandles(
      IngestPack.apiCandles(spark, sfDir), "1995-01-01", "2002-01-01", out, gridBuckets = 2)

    // layout: window partition dirs on disk, ChunkDays apart
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("window=")).sorted
    assert(dirs.nonEmpty)
    val starts = dirs.map(d => java.time.LocalDate.parse(d.stripPrefix("window=")))
    starts.sliding(2).foreach {
      case Array(a, b) =>
        assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) % BatchIngest.ChunkDays == 0)
      case _ => ()
    }

    // a window predicate reaches PartitionFilters (pruned scan — no data read
    // outside the window) and the pruned slice matches the source computation
    val win = starts(starts.length / 2).toString
    val q = table.where(col("window") === lit(win).cast("date"))
    val plan = q.queryExecution.executedPlan.toString
    val partFilters = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(partFilters.exists(_.contains("window")), s"no window partition filter in:\n$plan")

    val expected = IngestPack.apiCandles(spark, sfDir)
      .select(to_timestamp(col("time")).as("ts"))
      .where(expr(s"date_add(DATE '1995-01-01', CAST(floor(datediff(ts, DATE '1995-01-01') / ${BatchIngest.ChunkDays}) AS INT) * ${BatchIngest.ChunkDays}) = DATE '$win'"))
      .count()
    assert(q.count() == expected && expected > 0)
  }

  test("grid ingest drops records outside [start, end); disjoint ranges accumulate") {
    val out = "/tmp/graft_test_grid_range/candles"
    val table = BatchIngest.ingestCandles(
      IngestPack.apiCandles(spark, sfDir), "1996-01-01", "1997-01-01", out, gridBuckets = 1)
    val bounds = table.agg(min("timestamp"), max("timestamp")).collect().head
    assert(!bounds.isNullAt(0))
    assert(bounds.getTimestamp(0).toString >= "1996-01-01")
    assert(bounds.getTimestamp(1).toString < "1997-01-01")

    // a later-range run must APPEND its windows (dynamic partition
    // overwrite), not truncate the previously ingested ones
    val both = BatchIngest.ingestCandles(
      IngestPack.apiCandles(spark, sfDir), "1997-01-01", "1998-01-01", out, gridBuckets = 1)
    val bounds2 = both.agg(min("timestamp"), max("timestamp")).collect().head
    assert(bounds2.getTimestamp(0).toString >= "1996-01-01")
    assert(bounds2.getTimestamp(0).toString < "1997-01-01")
    assert(bounds2.getTimestamp(1).toString >= "1997-01-01")
  }
}
