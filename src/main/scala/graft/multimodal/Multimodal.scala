package graft.multimodal

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and per-record decode /
  * feature-extraction runs as partition-local batch functions
  * (`mapPartitions` over a typed Dataset — the Scala twin of `mapInPandas`:
  * same batch shape, same schema contract, same partitioning discipline).
  *
  * The actual codec step is a STUB — no image/audio libraries exist in this
  * environment — implemented as a deterministic fake ([[StubCodec]]) so the
  * Spark-side contract (schema, batching, partition parallelism, feature
  * shapes) is real and testable end-to-end. Swapping in a real decoder means
  * replacing ONLY [[StubCodec.decode]].
  *
  * Scale notes (100 TB posture): blobs never pass through a shuffle — decode
  * is a narrow per-partition map directly over the scan; only the small
  * (id, features) projection continues into joins/aggregations. Partition
  * sizing is governed by `spark.sql.files.maxPartitionBytes`, which is the
  * right knob when rows are MB-scale blobs.
  */
object Multimodal extends QueryPack {

  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, frames_sampled: Int, embedding: Array[Float])

  /** Deterministic stand-in for the binary codecs (STUB — see scaladoc). */
  object StubCodec {
    val EmbeddingDim = 8
    val FrameStride  = 64 // "sample one frame per 64 bytes" for video blobs

    val ResizeStride = 4 // "thumbnail": keep one byte per 4-byte block

    /** Resize/thumbnail stand-in: keeps each block's head byte, so the
      * output length is exactly ceil(n/stride) — an invariant the SQL oracle
      * checks from the input lengths without needing the codec.
      */
    def resize(r: MediaRecord): MediaRecord =
      r.copy(content = r.content.grouped(ResizeStride).map(_.head).toArray)

    /** Average-hash (perceptual-hash family) over the decoded byte plane:
      * 64 equal blocks, bit b = 1 iff block b's mean exceeds the global
      * mean. The compare is the integer cross-multiplication
      * `blockSum·n > total·blockLen` — no division, so the DuckDB oracle
      * reproduces the hash equivalence classes exactly. A real pHash swaps
      * the byte plane for DCT coefficients of decoded pixels; the blocking,
      * bit packing and dedup shape are what production keeps.
      */
    def avgHash(r: MediaRecord): Long = {
      val b = r.content
      val n = b.length
      if (n == 0) return 0L
      var total = 0L
      var i = 0
      while (i < n) { total += (b(i) & 0xff); i += 1 }
      var h = 0L
      var blk = 0
      while (blk < 64) {
        val lo = blk * n / 64
        val hi = (blk + 1) * n / 64
        var s = 0L
        var j = lo
        while (j < hi) { s += (b(j) & 0xff); j += 1 }
        if (hi > lo && s * n > total * (hi - lo)) h |= (1L << blk)
        blk += 1
      }
      h
    }

    /** ??? in spirit: a real implementation would decode the payload; this
      * derives deterministic pseudo-features so the pipeline is testable.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.content
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
      val frames = if (r.kind == "video") math.max(1, bytes.length / FrameStride) else 0
      val emb = Array.tabulate(EmbeddingDim) { d =>
        if (bytes.isEmpty) 0f
        else (bytes(d % bytes.length) & 0xff) / 255.0f
      }
      MediaFeatures(r.media_id, r.kind, bytes.length, mean, frames, emb)
    }
  }

  /** Attach the binary payload + typed metadata to the documents table (the
    * text bytes stand in for a real media blob; kind assigned round-robin).
    */
  def attachBinary(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("content_md5"),
        ascii(col("text")).as("header_byte")).as("meta"))

  /** Oracle-verifiable slice of the binary plumbing (metadata only). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    attachBinary(s, dir).select(
      col("media_id"), col("kind"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.content_md5").as("content_md5"),
      col("meta.header_byte").as("header_byte"))

  private val binaryMetaSql =
    """SELECT doc_id AS media_id,
      |       ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5,
      |       ascii(substr(text, 1, 1)) AS header_byte
      |FROM documents""".stripMargin

  /** Partition-local batch decode (mapInPandas-shaped): Dataset[MediaRecord]
    * → Dataset[MediaFeatures], one codec invocation per record, batched per
    * partition, no shuffle.
    */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(StubCodec.decode))
  }

  /** Feature-extraction query: binary attach → partition-local decode →
    * per-kind aggregate. Decode output is engine-specific (stub codec) → no
    * SQL oracle; the ScalaTest pins the codec contract instead.
    */
  def decodeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = attachBinary(s, dir)
      .select(col("media_id"), col("kind"), col("content")).as[MediaRecord]
    decodeFeatures(recs)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(col("frames_sampled").cast("long")).as("total_frames"),
        round(avg(round(col("mean_byte"), 6)), 6).as("avg_mean_byte"))
  }

  /** Partition-local resize: Dataset[MediaRecord] → Dataset[MediaRecord],
    * blobs shrunk in place on the scan partitions, never shuffled.
    */
  def resizeMedia(records: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(StubCodec.resize))
  }

  /** Resize pipeline with an oracle: the engine REALLY runs the partition-
    * local resize and measures the outputs; the oracle recomputes the
    * ceil(n/stride) length invariant from the source lengths.
    */
  def resizeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = attachBinary(s, dir)
      .select(col("media_id"), col("kind"), col("content")).as[MediaRecord]
    resizeMedia(recs).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum(octet_length(col("content")).cast("long")).as("total_resized_bytes"))
  }

  private val resizeStatsSql =
    """SELECT ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |       count(*) AS n_media,
      |       CAST(sum((octet_length(encode(text)) + 3) // 4) AS BIGINT) AS total_resized_bytes
      |FROM documents GROUP BY 1""".stripMargin

  case class Frame(media_id: Long, frame_idx: Long, frame_bytes: Long)

  /** Partition-local frame sampling: video blobs → one row per
    * [[StubCodec.FrameStride]]-byte frame. A flatMap directly over the scan
    * partitions (mapInPandas-shaped, like [[decodeFeatures]]): blobs never
    * shuffle — only (id, idx, len) scalars leave the stage. A real video
    * codec replaces the byte-chunking body only; the fan-out shape, schema
    * and partitioning are what production keeps.
    */
  def sampleFrames(records: Dataset[MediaRecord]): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      if (r.kind != "video") Iterator.empty
      else
        r.content.grouped(StubCodec.FrameStride).zipWithIndex.map {
          case (chunk, i) => Frame(r.media_id, i.toLong, chunk.length.toLong)
        }
    }
  }

  /** Frame-sample pipeline with an oracle: the engine REALLY chunks the
    * blobs on the scan partitions; the oracle recomputes every frame's
    * (index, length) from the source byte lengths alone.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = attachBinary(s, dir)
      .select(col("media_id"), col("kind"), col("content")).as[MediaRecord]
    sampleFrames(recs).toDF()
  }

  private val frameSampleSql = {
    val fs = StubCodec.FrameStride
    s"""WITH v AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT doc_id AS media_id,
      |         unnest([{'idx': CAST(fi AS BIGINT),
      |                  'fb': least(CAST($fs AS BIGINT), n - fi * $fs)}
      |                 for fi in range(0, CAST(ceil(n / $fs.0) AS BIGINT))]) AS u
      |  FROM v)
      |SELECT media_id, u.idx AS frame_idx, u.fb AS frame_bytes FROM f""".stripMargin
  }

  /** Perceptual-hash dedup over the blob plane: partition-local
    * [[StubCodec.avgHash]] per record (blobs never shuffle — only the
    * (id, kind, hash) triple leaves the stage), then the dedup_exact
    * accounting per kind. The oracle rebuilds each 64-bit-vector hash from
    * the text bytes with the same integer cross-multiplied compares and
    * counts the SAME equivalence classes — the gate proves the whole
    * blob → feature → group pipeline, not just the counts.
    */
  def phashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = attachBinary(s, dir)
      .select(col("media_id"), col("kind"), col("content")).as[MediaRecord]
    recs.mapPartitions(_.map(r => (r.media_id, r.kind, StubCodec.avgHash(r))))
      .toDF("media_id", "kind", "h")
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        countDistinct(col("h")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dupes"))
  }

  private val phashDedupSql =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
      |         text, length(text) AS n,
      |         list_sum([ascii(substr(text, i, 1)) for i in range(1, length(text) + 1)]) AS total
      |  FROM documents),
      |bits AS (
      |  SELECT media_id, kind, blk,
      |         CASE WHEN ((blk + 1) * n) // 64 > (blk * n) // 64 AND
      |                   list_sum([ascii(substr(text, i, 1))
      |                             for i in range((blk * n) // 64 + 1, ((blk + 1) * n) // 64 + 1)]) * n
      |                   > total * (((blk + 1) * n) // 64 - (blk * n) // 64)
      |              THEN '1' ELSE '0' END AS bit
      |  FROM m, unnest(range(0, 64)) AS t(blk)),
      |h AS (
      |  SELECT media_id, kind, string_agg(bit, '' ORDER BY blk) AS hs
      |  FROM bits GROUP BY 1, 2)
      |SELECT kind, count(*) AS n_media, count(DISTINCT hs) AS n_unique,
      |       count(*) - count(DISTINCT hs) AS n_dupes
      |FROM h GROUP BY kind""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("mm_phash_dedup", phashDedup, Some(phashDedupSql)),
    Q("mm_binary_meta", binaryMeta, Some(binaryMetaSql)),
    Q("mm_decode_stats", decodeStats, None),
    Q("mm_resize_stats", resizeStats, Some(resizeStatsSql)),
    Q("mm_frame_sample", frameSample, Some(frameSampleSql)))
}
