package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine operation.
  *
  * @param name   stable identifier (drives CORRECTNESS_r{N}.json keys)
  * @param fn     Spark implementation: (session, testdata dir) => result
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables; None for operations not cleanly SQL-expressible
  *               (the driver then records a weaker rows-only check)
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A themed group of queries (analytics, ingest, llm, ...). */
trait QueryPack {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §B). */
object Tables {
  import org.apache.spark.sql.functions.{expr, timestamp_micros}
  import org.apache.spark.sql.types.LongType

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default; read the raw int64 nanos and truncate to microseconds
      // (same truncation DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
