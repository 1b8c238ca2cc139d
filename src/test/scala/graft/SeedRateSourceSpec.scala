package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The custom DataSourceV2 connector ([[graft.sources.SeedRateSource]]):
  * rate-limited offset admission, per-slice executor reads, checkpointed
  * restart resume, and composition with the ingest demux.
  */
class SeedRateSourceSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/tmp/graft_test_seedrate"

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rm)
    f.delete(); ()
  }

  test("seed-rate source admits rowsPerBatch per trigger and resumes from checkpoint") {
    rm(new java.io.File(base))
    Files.createDirectories(Paths.get(base))
    val seed = s"$base/seed.jsonl"
    Files.writeString(Paths.get(seed), (0 until 10).map(i => s"frame-$i").mkString("\n"))

    val out = collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    val q = spark.readStream
      .format("graft.sources.SeedRateSource")
      .option("path", seed)
      .option("rowsPerBatch", "3")
      .load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        out += ((id, df.as[String].collect().toSeq.sorted))
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val sizes = out.map(_._2.size).filter(_ > 0)
    assert(sizes.forall(_ <= 3), s"a batch exceeded the 3-row admission cap: $sizes")
    assert(out.flatMap(_._2).sorted == (0 until 10).map(i => s"frame-$i").sorted,
      "every seed frame delivered exactly once")

    // restart on the same checkpoint with NO new rows → nothing re-admitted
    val before = out.map(_._2.size).sum
    val q2 = spark.readStream
      .format("graft.sources.SeedRateSource")
      .option("path", seed).option("rowsPerBatch", "3").load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        out += ((id, df.as[String].collect().toSeq))
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(out.map(_._2.size).sum == before, "restart re-admitted committed rows")
  }

  test("seed-rate frames flow through the ingest demux unchanged") {
    rm(new java.io.File(s"$base/demux"))
    Files.createDirectories(Paths.get(s"$base/demux"))
    val seed = s"$base/demux/seed.jsonl"
    val candle =
      """{"company_id":"FIGI1","timestamp":"2024-03-01 10:00:00","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":7}"""
    Files.writeString(Paths.get(seed), Seq(candle, candle, """{"junk":1}""").mkString("\n"))
    val q = spark.readStream
      .format("graft.sources.SeedRateSource")
      .option("path", seed).option("rowsPerBatch", "10").load()
      .writeStream
      .option("checkpointLocation", s"$base/demux/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ingest.Ingest.demux(df)("candles")
          .write.mode("append").parquet(s"$base/demux/candles")
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    assert(spark.read.parquet(s"$base/demux/candles").count() == 2L)
  }
}
