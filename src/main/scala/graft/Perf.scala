package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler (not part of the driver contract): times the named
  * registered queries (all of them with no args) at SPARK_GRAFT_SF_DIR, twice
  * each (cold + warm), and prints the physical plan when PERF_EXPLAIN=1.
  */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "256k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[perf] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("warmup")(Tables.load(spark, sfDir, "documents").count())

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query: $n"))
      time(s"$n cold")(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      time(s"$n warm")(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      if (sys.env.get("PERF_EXPLAIN").contains("1")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
