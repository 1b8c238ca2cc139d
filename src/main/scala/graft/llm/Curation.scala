package graft.llm

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the composition layer of a training-data
  * pipeline: deterministic sampling and the canonical
  * filter → dedup → account chain.
  *
  * Scale notes (100 TB posture): sampling is a pushed-down narrow predicate
  * on a content-independent hash (no shuffle, no RNG state, stable across
  * retries/replays — a `rand()` sample would resample every task retry);
  * the clean-corpus chain is two shuffles (hash-group dedup, then the
  * low-cardinality accounting aggregate), both on keys a production table
  * would bucket by.
  */
object Curation extends QueryPack {

  /** Deterministic ~10% sample: first two hex chars of md5(doc_id) compared
    * lexicographically (fixed-width lowercase hex orders numerically), so
    * membership is a pure function of the id — identical in Spark, DuckDB,
    * and any replay. Per-source accounting proves the strata stay balanced.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    docs
      .where(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < "1a")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).as("sampled_chars"))
  }

  private val sampleStratifiedSql =
    """SELECT source, count(*) AS n_sampled,
      |       CAST(sum(n_chars) AS BIGINT) AS sampled_chars
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      |GROUP BY source""".stripMargin

  /** The canonical curation chain composed end-to-end: length filter →
    * exact near-dup removal (keep the lowest doc_id per normalized-content
    * hash) → per-(source, lang) accounting of what survives.
    */
  def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(s, dir, "documents")
    val scored = docs
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(TextStats.tokensCol).as("n_tokens"),
        Dedup.contentHash.as("h"))
      .where(col("n_tokens") >= 10)
    val kept = scored
      .withColumn("rn", row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      .where(col("rn") === 1)
    kept.groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
  }

  private val cleanCorpusSql =
    s"""WITH scored AS (
      |  SELECT doc_id, source, lang, n_chars,
      |         len(list_filter(regexp_split_to_array(trim(text), '${TextStats.WsRe}'), x -> x <> '')) AS n_tokens,
      |         md5(lower(trim(regexp_replace(text, '${TextStats.WsRe}', ' ', 'g')))) AS h
      |  FROM documents),
      |filtered AS (SELECT * FROM scored WHERE n_tokens >= 10),
      |kept AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |    FROM filtered)
      |  WHERE rn = 1)
      |SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM kept GROUP BY source, lang""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("sample_stratified", sampleStratified, Some(sampleStratifiedSql)),
    Q("pipeline_clean_corpus", cleanCorpus, Some(cleanCorpusSql)))
}
