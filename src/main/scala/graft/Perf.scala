package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for hot queries (not part of the driver contract). */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[perf] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // session warmup: parquet footer + codegen paths
    time("warmup count")(Tables.load(spark, sfDir, "documents").count())

    val docs = Tables.load(spark, sfDir, "documents")
    val sh = llm.Dedup.withShingles(docs)
    time("withShingles")(sh.write.mode("overwrite").format("noop").save())
    time("withShingles x2")(sh.write.mode("overwrite").format("noop").save())
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("inv explode")(inv.write.mode("overwrite").format("noop").save())
    val pairs = inv.as("a").hint("shuffle_hash")
      .join(inv.as("b").hint("shuffle_hash"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    time("pair join+agg")(pairs.write.mode("overwrite").format("noop").save())
    time("full jaccard")(llm.Dedup.jaccard(spark, sfDir).write.mode("overwrite").format("noop").save())
    time("full minhash")(llm.Dedup.minhash(spark, sfDir).write.mode("overwrite").format("noop").save())
    time("full simhash")(llm.Dedup.simhash(spark, sfDir).write.mode("overwrite").format("noop").save())
    llm.Dedup.jaccard(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
