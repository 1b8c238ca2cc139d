package graft.llm

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the north-star
  * training-data-pipeline surface (SURVEY.md §2.6). Four strategies:
  *
  *  - exact:        normalize → md5 → group        (hash-groupBy, one shuffle)
  *  - n-gram Jaccard: inverted shingle index join   (exact, no all-pairs scan)
  *  - MinHash+LSH:  signature → bands → bucket join (approximate, sub-quadratic)
  *  - SimHash:      64-bit sketch → chunk buckets   (approximate, sub-quadratic)
  *
  * Scale notes (100 TB posture): none of these compares all document pairs.
  * The Jaccard join is keyed by shingle (candidate pairs only materialize for
  * docs sharing a shingle), with a document-frequency cap dropping stop-
  * shingles ([[DfCap]]) so no power-law hot key can go quadratic; MinHash
  * compares only within LSH band buckets (b=16 bands × r=4 rows:
  * P[candidate] = 1-(1-J^4)^16, ≈0.9998 at J=0.8 and ≈1-5e-8 at J≥0.9) and
  * verifies candidates pair-locally; SimHash compares only docs agreeing on
  * one of four 16-bit chunks (covers all Hamming-distance≤3 pairs by
  * pigeonhole). Shingle/band/chunk keys are what a production table would be
  * bucketed by, so each op is a single shuffle.
  */
object Dedup extends QueryPack {

  /** canonical text normalization — THE definition of "same content" for
    * exact dedup, shared with [[Curation.cleanCorpus]] so the two packs can
    * never diverge on what counts as a duplicate
    */
  private[llm] val normText: Column =
    lower(trim(regexp_replace(col("text"), "\\s+", " ")))

  /** normalized-content hash (md5 over [[normText]]) */
  private[llm] val contentHash: Column = md5(normText.cast("binary"))

  /** Single-pass trigram shingling as a Scala UDF (first-occurrence order,
    * distinct), matching the DuckDB oracle's list-comprehension formulation.
    *
    * A UDF, not `transform`/`filter` lambdas, on purpose: higher-order array
    * functions are CodegenFallback (interpreted), and InferFiltersFromGenerate
    * pushes a `size(sh) > 0` guard below the projection, re-inlining the whole
    * expression with the token array substituted into every index access —
    * O(tokens²) per doc, evaluated on BOTH sides of the inverted-index
    * self-join (measured: 20 s for the sf0.1 explode alone vs <1 s as a UDF).
    * The UDF body is one pass over the split tokens.
    */
  private val shingleUdf = udf { text: String =>
    if (text == null) Array.empty[String]
    else {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Array.empty[String]
      else {
        val seen = new scala.collection.mutable.LinkedHashSet[String]
        var i = 0
        while (i <= toks.length - 3) {
          seen += (toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
          i += 1
        }
        seen.toArray
      }
    }
  }

  private[graft] def withShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingleUdf(col("text")).as("sh"))

  /** whitespace tokens, duplicates kept (simhash weights by occurrence) */
  private val tokensUdf = udf { text: String =>
    if (text == null) Array.empty[String]
    else text.trim.split("\\s+").filter(_.nonEmpty)
  }

  private val shinglesSql =
    """list_distinct(CASE WHEN len(t) >= 3
      |  THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
      |  ELSE [] END)""".stripMargin

  private val toksSql = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"

  /** Exact duplicate accounting per source: docs vs distinct normalized
    * content hashes. The 100 TB form is the same plan — md5 in codegen, one
    * hash aggregate keyed by (source, hash).
    */
  def exact(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    docs.select(col("source"), contentHash.as("h"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dupes"))
  }

  private val exactSql =
    """SELECT source, count(*) AS n_docs,
      |       count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_unique,
      |       count(*) - count(DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS n_dupes
      |FROM documents GROUP BY source""".stripMargin

  /** Stop-shingle cap: shingles occurring in more than this many documents
    * are dropped from BOTH sides of every Jaccard computation (numerator and
    * denominator — i.e. Jaccard is defined over the retained shingle sets).
    * Real corpora have power-law shingle frequencies; a shingle shared by k
    * docs materializes k² candidate rows, so one hot boilerplate shingle
    * stalls the join stage at scale. The cap bounds per-key join fan-out at
    * DfCap² and loses nothing discriminative — a shingle in >DfCap docs
    * carries no near-dup signal.
    */
  val DfCap = 100

  /** inverted (doc_id, shingle) index with stop-shingles removed; the df
    * window partitions on `shingle` — the SAME key the downstream self-join
    * shuffles on, so the filter adds no extra exchange.
    */
  private def invIndex(docs: DataFrame): DataFrame =
    withShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .where(col("df") <= DfCap)
      .drop("df")

  /** Exact n-gram Jaccard near-dup pairs (J ≥ 0.5) via an inverted shingle
    * index: explode shingles → df cap → self-join on shingle → shared counts
    * → |A∩B| / (|A|+|B|-|A∩B|). Pairs never sharing a retained shingle never
    * materialize.
    */
  def jaccard(s: SparkSession, dir: String): DataFrame = {
    val inv = invIndex(Tables.load(s, dir, "documents"))
    val sizes = inv.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // shuffle-hash (not broadcast) → both sides hash-partition on shingle
    // with identical subplans → ReusedExchange computes the index ONCE
    val pairs = inv.as("a").hint("shuffle_hash")
      .join(inv.as("b").hint("shuffle_hash"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("shared") / (col("na.n_sh") + col("nb.n_sh") - col("shared")).cast("double"))
          .as("j"))
      .where(col("j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
  }

  private def jaccardOracle(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |sh0 AS (SELECT doc_id, unnest($shinglesSql) AS shingle FROM toks),
      |sh AS (
      |  SELECT doc_id, shingle FROM (
      |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
      |    FROM sh0)
      |  WHERE df <= $DfCap),
      |n AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       round(shared / CAST(na.n_sh + nb.n_sh - shared AS DOUBLE), 6) AS jaccard
      |FROM p JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id
      |WHERE shared / CAST(na.n_sh + nb.n_sh - shared AS DOUBLE) >= $threshold""".stripMargin

  // ---------------------------------------------------------------------------
  // MinHash + LSH banding
  // ---------------------------------------------------------------------------

  val NumPerms = 64
  val Bands    = 16
  val Rows     = 4 // NumPerms / Bands

  /** doc_id → minhash signature (NumPerms mins of seeded xxhash64 over the
    * retained shingle set), computed in ONE aggregation over the exploded
    * inverted index.
    */
  private[llm] def signatures(inv: DataFrame): DataFrame = {
    val mins = (0 until NumPerms).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    inv.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash near-dup pairs: LSH band buckets → candidates → CANDIDATE-LOCAL
    * exact-Jaccard verification at J ≥ 0.8. With r=4/b=16 the miss
    * probability at J=0.8 is (1-0.8⁴)¹⁶ ≈ 0.02%, ≈5e-8 at J≥0.9 — so
    * against the exact-Jaccard oracle a mismatch requires a pair sitting in
    * the narrow band just above the threshold AND missing all 16 bands;
    * verification removes all false positives, keeping output
    * exact-above-threshold.
    *
    * Verification joins the candidate id pairs to the two docs' retained
    * shingle ARRAYS and intersects per pair — cost O(candidates), preserving
    * the LSH win (the round-2 formulation re-ran the full inverted-index
    * pair join for ALL co-shingled pairs, defeating the bucketing).
    */
  def minhash(s: SparkSession, dir: String): DataFrame = {
    val inv  = invIndex(Tables.load(s, dir, "documents"))
    val sigs = signatures(inv)
    // bands as ONE exploded (band_idx, band_hash) relation → a single
    // self-join; per-band joins would recompute the signature aggregation
    // once per band per side
    val bandArr = array((0 until Bands).map(b =>
      xxhash64((b * Rows until (b + 1) * Rows).map(i => col(s"m$i")): _*)): _*)
    val banded = sigs.select(col("doc_id"), posexplode(bandArr).as(Seq("band_idx", "band_hash")))
    val candidates = banded.as("x").hint("shuffle_hash")
      .join(banded.as("y").hint("shuffle_hash"),
        col("x.band_idx") === col("y.band_idx") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // per-doc retained shingle sets (distinct by construction in shingleUdf)
    val sets = inv.groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("sh"), count(lit(1)).as("n_sh"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n_sh").as("na")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n_sh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("shared"),
        col("na"), col("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared") / (col("na") + col("nb") - col("shared")).cast("double")).as("j"))
      .where(col("j") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------------

  /** doc_id → 64-bit simhash over the token stream (per-bit majority vote of
    * token hashes, weighted by occurrence), plus the 4 × 16-bit chunk keys
    * used for Hamming-≤3 candidate bucketing.
    */
  private[llm] def simhashSketch(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokensUdf(col("text"))).as("token"))
    val h = xxhash64(col("token"))
    val bitVotes = (0 until 64).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val voted = toks.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_.bitwiseOR(_))
    voted.select(
      col("doc_id") +: (sig.as("simhash") +:
        (0 until 4).map(c => shiftright(sig, c * 16).bitwiseAND(0xffffL).as(s"chunk$c"))): _*)
  }

  /** SimHash near-dup pairs: candidates share at least one 16-bit chunk
    * (pigeonhole ⇒ complete for Hamming ≤ 3), verified by exact popcount.
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val sk = simhashSketch(docs)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c => col(s"chunk$c")): _*))
          .as(Seq("chunk_idx", "chunk_val")))
    val candidates = sk.as("x").hint("shuffle_hash")
      .join(sk.as("y").hint("shuffle_hash"),
        col("x.chunk_idx") === col("y.chunk_idx") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
    candidates
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  override val all: Seq[Q] = Seq(
    Q("dedup_exact", exact, Some(exactSql)),
    Q("dedup_jaccard", jaccard, Some(jaccardOracle(0.5))),
    Q("dedup_minhash", minhash, Some(jaccardOracle(0.8))),
    Q("dedup_simhash", simhash, None))
}
