package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the storage-level half of shuffle avoidance: a
  * fact table written with `bucketBy(n, key)` + `sortBy(key)` hash-places
  * every row by key at WRITE time, so any later equi-join or aggregation on
  * that key reads co-located, pre-sorted buckets and plans with ZERO
  * exchange on the bucketed side(s) (BucketingSpec pins the exchange-free
  * join). At 100 TB this converts the nightly fact-×-fact join from the
  * cluster's largest shuffle into a file-parallel merge.
  *
  * Spark constraint: bucketed layout lives in the catalog (`saveAsTable`),
  * not bare parquet paths — `option("path", …)` keeps the data external so
  * the catalog entry is only metadata.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table at `path`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** The bucketed table, from the catalog (carries bucket metadata; a plain
    * `read.parquet(path)` would NOT — bucket info lives in the catalog).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
