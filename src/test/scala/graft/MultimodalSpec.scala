package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord, StubCodec}

/** Pins the multimodal plumbing contract: schema, batch shape, deterministic
  * stub codec, frame sampling, partition-parallel decode.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stub codec is deterministic and shape-stable") {
    val r = MediaRecord(1L, "video", Array.tabulate(200)(_.toByte))
    val a = StubCodec.decode(r); val b = StubCodec.decode(r)
    assert(a == b.copy(embedding = a.embedding) && a.embedding.sameElements(b.embedding))
    assert(a.n_bytes == 200)
    assert(a.frames_sampled == 200 / StubCodec.FrameStride)
    assert(a.embedding.length == StubCodec.EmbeddingDim)
    assert(a.embedding.forall(v => v >= 0f && v <= 1f))
  }

  test("only video records sample frames; empty payload is safe") {
    assert(StubCodec.decode(MediaRecord(2L, "image", Array[Byte](1, 2, 3))).frames_sampled == 0)
    val empty = StubCodec.decode(MediaRecord(3L, "audio", Array.empty[Byte]))
    assert(empty.n_bytes == 0 && empty.mean_byte == 0.0 && empty.embedding.forall(_ == 0f))
  }

  test("decodeFeatures runs partition-local over a typed Dataset (no shuffle)") {
    val recs = (1L to 100L).map(i => MediaRecord(i, if (i % 3 == 0) "video" else "image",
      Array.tabulate((i % 10).toInt + 1)(b => (b + i).toByte))).toDS()
    val out = Multimodal.decodeFeatures(recs)
    // decode adds no Exchange on top of its input (narrow per-partition map)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan must be shuffle-free:\n$plan")
    val feats = out.collect()
    assert(feats.length == 100)
    assert(feats.filter(_.kind == "video").forall(_.frames_sampled >= 1))
  }

  test("sampleFrames chunks video blobs shuffle-free, byte-exactly") {
    val recs = Seq(
      MediaRecord(1L, "video", Array.tabulate(150)(_.toByte)), // 2 full + 22 tail
      MediaRecord(2L, "image", Array.tabulate(200)(_.toByte)), // skipped
      MediaRecord(3L, "video", Array.empty[Byte])).toDS()      // no frames
    val out = Multimodal.sampleFrames(recs)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must be shuffle-free:\n$plan")
    val frames = out.collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.forall(_.media_id == 1L))
    assert(frames.map(_.frame_bytes).sum == 150L)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 1L, 2L))
    assert(frames.last.frame_bytes == 150L % StubCodec.FrameStride)
  }

  test("average-hash: identical blobs collide, near-dups stay close, distinct content diverges") {
    import Multimodal.MediaRecord
    def rec(bytes: Array[Byte]) = MediaRecord(0L, "image", bytes)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(4096)((rnd.nextInt(64) + 32).toByte)
    val same = base.clone()
    val near = base.clone(); near(100) = (near(100) + 1).toByte // one-byte edit
    val other = Array.fill(4096)((rnd.nextInt(64) + 32).toByte)
    val h = StubCodec.avgHash(rec(base))
    assert(StubCodec.avgHash(rec(same)) == h)
    assert(hamming(StubCodec.avgHash(rec(near)), h) <= 4,
      "a one-byte edit must barely move the hash")
    assert(hamming(StubCodec.avgHash(rec(other)), h) >= 12,
      "independent content must not collide")
    assert(StubCodec.avgHash(rec(Array.empty)) == 0L) // empty blob is defined
  }

  test("binary attach exposes typed metadata over the real corpus") {
    val meta = Multimodal.binaryMeta(spark, sfDir).collect()
    assert(meta.length == 500)
    assert(meta.forall(r => r.getInt(2) > 0))                 // n_bytes
    assert(meta.forall(r => r.getString(3).length == 32))     // md5 hex
    assert(meta.map(_.getString(1)).toSet == Set("image", "audio", "video"))
  }
}
