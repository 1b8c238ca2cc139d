package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator pack into the single `queries` /
  * `oracleSql` surface the driver grades through (CORRECTNESS_r{N}.json).
  */
object SparkEntry {

  /** All query packs; each maps a slice of SURVEY.md §2 + the LLM-pipeline
    * extension surface onto the driver testdata tables.
    */
  def packs: Seq[QueryPack] = Seq(
    analytics.Analytics,
    analytics.Relational,
    analytics.TpchShapes,
    analytics.Graph,
    analytics.Mining,
    analytics.PortableSketch,
    analytics.Indicators,
    llm.TextStats,
    llm.Dedup,
    llm.Similarity,
    llm.Curation,
    llm.Features,
    llm.Governance,
    llm.EntityResolution,
    ingest.IngestPack,
    sources.Layout,
    sources.TableLog,
    sources.IncrementalView,
    sources.MatView,
    sources.Txn,
    multimodal.Multimodal)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A1 volatility end-to-end: read → window lag → returns → tumbling-day
    * stddev (SURVEY.md §2.5 A1).
    */
  def entry(spark: SparkSession): DataFrame =
    analytics.Analytics.volatility(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
