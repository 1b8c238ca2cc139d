package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PerfI {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[perf] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(Tables.load(spark, sfDir, "lineitem").count())
    // mirror IngestPack.allMessages via reflection-free copy: call the queries
    val msgs = ingest.IngestPack.allMessages(spark, sfDir)
    time("allMessages serialize")(msgs.write.mode("overwrite").format("noop").save())
    time("allMessages x2")(msgs.write.mode("overwrite").format("noop").save())
    time("classify")(ingest.Ingest.classify(msgs).write.mode("overwrite").format("noop").save())
    time("dropStats")(ingest.Ingest.dropStats(msgs).write.mode("overwrite").format("noop").save())
    time("demux candles")(ingest.Ingest.demux(msgs)("candles").write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
