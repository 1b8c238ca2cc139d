package graft.llm

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors) —
  * north-star ANN surface (SURVEY.md §2.6).
  *
  * Two paths:
  *  - brute-force exact cosine top-k for a small query set: broadcast the
  *    queries, ONE scan of the corpus, per-row dot products inside codegen
  *    (`zip_with` + `aggregate`), top-k via window `row_number`. This is the
  *    correct 100 TB plan for few queries — no shuffle of the corpus at all,
  *    cost = one pass.
  *  - LSH-bucketed ANN (random-hyperplane signs, L hash tables): corpus and
  *    queries meet only inside matching (table, bucket) keys — sub-linear
  *    candidate sets, then exact re-rank. The scale path when the query set
  *    itself is large.
  *
  * Determinism notes: dot/norm folds are sequential left-to-right double
  * adds over array elements (same order in Spark `aggregate` and DuckDB
  * `list_reduce`), so scores are bit-identical; ranking ties are broken by
  * vec_id on the 6-dp-rounded score.
  */
object Similarity extends QueryPack {

  /** number of fixed query vectors (lowest vec_ids) */
  val NumQueries = 8
  val TopK       = 5

  /** cosine(a, b) in double, sequential fold (bit-stable across engines) */
  private def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact cosine top-k neighbours for the NumQueries lowest vec_ids. */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.orderBy("vec_id").limit(NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = emb.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qvec"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= TopK)
  }

  private val bruteForceSql = {
    val dim = 64
    def dotSql(a: String, b: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, $dim + 1)]),
         |  (acc, v) -> acc + v)""".stripMargin
    s"""WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      |  ORDER BY vec_id LIMIT $NumQueries),
      |scored AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |         round(${dotSql("qvec", "e.embedding")}
      |           / (sqrt(${dotSql("qvec", "qvec")}) * sqrt(${dotSql("e.embedding", "e.embedding")})), 6)
      |           AS cos_sim
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos_sim DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $TopK""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // LSH-bucketed ANN
  // ---------------------------------------------------------------------------

  val Tables_ = 4  // L independent hash tables
  val Planes  = 8  // bits per table → 256 buckets/table

  /** Deterministic pseudo-random hyperplane component for (table t, plane p,
    * dim d): xxhash64 of the triple mapped into [-1, 1]. No RNG state needed —
    * every executor derives the same planes.
    */
  private def planeComponent(t: Int, p: Int, d: Column): Column =
    ((pmod(xxhash64(lit(t), lit(p), d), lit(2001L)) - 1000L) / 1000.0)

  /** bucket key for one table: sign bits of Planes hyperplane dot products */
  private[llm] def bucketKey(vec: Column, t: Int): Column =
    (0 until Planes).map { p =>
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), lit(63)), (v, d) => v.cast("double") * planeComponent(t, p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k via L×(256-bucket) random-hyperplane LSH: candidates are
    * corpus vectors sharing ≥1 bucket with the query, exact-cosine re-ranked.
    * Output is approximate (recall < 1 by design) → no SQL oracle; the
    * ScalaTest pins recall on planted clusters instead.
    */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val withBuckets = emb.select(
      col("vec_id") +: col("embedding") +:
        (0 until Tables_).map(t => bucketKey(col("embedding"), t).as(s"bucket$t")): _*)
    val queries = withBuckets.orderBy("vec_id").limit(NumQueries)
      .select(
        col("vec_id").as("query_id") +: col("embedding").as("qvec") +:
          (0 until Tables_).map(t => col(s"bucket$t").as(s"qbucket$t")): _*)
    val candidates = (0 until Tables_).map { t =>
        withBuckets.join(broadcast(queries),
            col(s"bucket$t") === col(s"qbucket$t") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qvec"), col("embedding"))
      }.reduce(_ union _)
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    candidates
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
  }

  // ---------------------------------------------------------------------------
  // Embedding-cosine near-dup (semantic dedup)
  // ---------------------------------------------------------------------------

  /** cosine threshold above which two vectors count as semantic duplicates */
  val DupThreshold = 0.95

  /** Embedding-cosine near-duplicate accounting, LSH-bucketed: candidate
    * pairs are vectors sharing ≥1 (table, bucket) key — never all pairs —
    * then exact-cosine verified against [[DupThreshold]]. Output is one row
    * per label (candidate/dup counts + the max candidate cosine), so the
    * result is non-empty even on corpora with no duplicates.
    *
    * 100 TB shape: bucket keys are computed in one scan; the self-join is a
    * single shuffle on (table, bucket); verified pairs re-fetch vectors by
    * id (two hash joins) instead of carrying 64-float payloads through the
    * exploded bucket relation.
    */
  def embCosDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val buckets = emb.select(
      col("vec_id"),
      posexplode(array((0 until Tables_).map(t => bucketKey(col("embedding"), t)): _*))
        .as(Seq("t", "b")))
    val cand = buckets.as("x").hint("shuffle_hash")
      .join(buckets.as("y").hint("shuffle_hash"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    val scored = cand
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("label")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .select(col("label"), cosine(col("va"), col("vb")).as("cos"))
    val perLabel = scored.groupBy("label").agg(
      count(lit(1)).as("n_candidate_pairs"),
      sum(when(col("cos") >= DupThreshold, 1L).otherwise(0L)).as("n_dups"),
      round(max(col("cos")), 6).as("max_cos"))
    emb.groupBy("label").agg(count(lit(1)).as("n_vectors"))
      .join(perLabel, Seq("label"), "left")
      .select(
        col("label"), col("n_vectors"),
        coalesce(col("n_candidate_pairs"), lit(0L)).as("n_candidate_pairs"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("max_cos"))
  }

  // ---------------------------------------------------------------------------
  // IVF (inverted-file) ANN
  // ---------------------------------------------------------------------------

  val NumCells = 16 // coarse-quantizer cells
  val NProbe   = 4  // cells probed per query

  /** IVF cell centroids: deterministic pseudo-random seed vectors (the
    * NumCells smallest xxhash64(vec_id)) refined by one Lloyd step. Means
    * accumulate in DECIMAL fixed-point so centroids are independent of
    * aggregation order (floats would make the cell assignment — and thus the
    * candidate sets — vary run to run).
    */
  private[llm] def centroids(emb: DataFrame): DataFrame = {
    val seeds = emb
      .select(col("vec_id"), col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy("h").limit(NumCells)
      .select(row_number().over(Window.orderBy("h")).as("cell"), col("embedding").as("cvec"))
    val assigned = assignCells(emb, seeds)
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell", "dim")
      .agg((sum(col("v").cast("decimal(28,9)")) / count(lit(1))).cast("double").as("mean"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("pairs"))
      .select(col("cell"), expr("transform(pairs, p -> p.mean)").as("cvec"))
  }

  /** nearest-centroid assignment (broadcast NumCells rows into the scan) */
  private def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"),
        struct(cosine(col("embedding"), col("cvec")).as("cos"), (-col("cell")).as("negc")).as("sc"),
        col("cell"))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), col("sc")).as("cell"), first(col("embedding")).as("embedding"))

  /** ANN top-k via IVF: corpus vectors live in their nearest-centroid cell;
    * each query probes its NProbe nearest cells and exact-cosine re-ranks
    * only those cells' members. Approximate (recall < 1 by design) → no SQL
    * oracle; the ScalaTest pins recall against brute force on planted
    * clusters.
    */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb   = Tables.load(s, dir, "embeddings")
    val cents = centroids(emb)
    val corpus = assignCells(emb, cents)
    val queries = emb.orderBy("vec_id").limit(NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qvec"), col("cell"),
        cosine(col("qvec"), col("cvec")).as("qcos"))
      .withColumn("r", row_number().over(probeW))
      .where(col("r") <= NProbe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qvec"), col("embedding")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TopK)
  }

  /** Per-label centroid statistics — element-wise mean over 6-dp fixed-point
    * values (decimal accumulation ⇒ row-order-independent exact sums).
    */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        round(col("v").cast("double"), 6).cast("decimal(18,6)").as("v6"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_values"),
        round(sum(col("v6")).cast("double") / count(lit(1)), 6).as("mean_component"),
        round(max(col("v6")).cast("double"), 6).as("max_component"))
  }

  private val labelCentroidsSql =
    """WITH x AS (
      |  SELECT label,
      |         CAST(round(CAST(v.val AS DOUBLE), 6) AS DECIMAL(18,6)) AS v6
      |  FROM embeddings, unnest(embedding) AS v(val))
      |SELECT label, count(*) AS n_values,
      |       round(CAST(sum(v6) AS DOUBLE) / count(*), 6) AS mean_component,
      |       round(CAST(max(v6) AS DOUBLE), 6) AS max_component
      |FROM x GROUP BY label""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("ann_topk", bruteForceTopK, Some(bruteForceSql)),
    Q("ann_lsh_topk", lshTopK, None),
    Q("ann_ivf_topk", ivfTopK, None),
    Q("dedup_embcos", embCosDedup, None),
    Q("emb_label_centroids", labelCentroids, Some(labelCentroidsSql)))
}
