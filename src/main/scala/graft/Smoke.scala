package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a plain SparkSession (none of our configs)
  * calling SparkEntry.entry, checking rows > 0. Run each round before
  * committing — entry() must work on a session we did NOT configure.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = SparkEntry.entry(spark)
    val n = res.count()
    res.show(5, truncate = false)
    println(s"[smoke] entry() rows=$n schema=${res.schema.simpleString}")
    assert(n > 0, "entry() returned 0 rows")
    spark.stop()
  }
}
