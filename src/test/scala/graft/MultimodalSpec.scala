package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaCodec, MediaRecord, StubCodec}

/** Pins the multimodal plumbing contract: real container codecs (PPM / WAV /
  * y4m round trips, strict header parsing), schema, batch shape, frame
  * sampling, partition-parallel decode.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PPM round trip: spec header, exact pixel accounting, comments honored") {
    val payload = Array.tabulate(100)(i => (i + 1).toByte) // → 8×5 pixels, padded
    val ppm = MediaCodec.encodePpm(payload)
    assert(new String(ppm.take(2), "US-ASCII") == "P6")
    val d = MediaCodec.decode(MediaRecord(7L, "image", ppm))
    assert(d.format == "ppm" && d.width == 8 && d.height == 5)
    assert(d.payload_bytes == 8 * 5 * 3 && d.n_frames == 1)
    assert(d.payload_sum == (1 to 100).sum.toLong) // zero padding adds nothing
    // a real parser honors netpbm comment lines in the header
    val withComment = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++ Array.fill(6)(3.toByte)
    val c = MediaCodec.decode(MediaRecord(8L, "image", withComment))
    assert(c.width == 2 && c.height == 1 && c.payload_sum == 18L)
    // truncated pixel plane must throw, not mis-count
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaRecord(9L, "image", ppm.dropRight(1)))
    }
    ()
  }

  test("WAV round trip: RIFF framing, little-endian sizes, odd-length data") {
    for (n <- Seq(0, 1, 101)) {
      val samples = Array.tabulate(n)(i => (i * 3 + 2).toByte)
      val wav = MediaCodec.encodeWav(samples)
      assert(wav.length == 44 + n)
      val d = MediaCodec.decode(MediaRecord(1L, "audio", wav))
      assert(d.format == "wav" && d.n_samples == n && d.payload_bytes == n)
      assert(d.payload_sum == samples.map(_ & 0xff).map(_.toLong).sum)
    }
    // a corrupted RIFF size field must be rejected
    val bad = MediaCodec.encodeWav(Array.fill(10)(1.toByte))
    bad(4) = (bad(4) + 1).toByte
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaRecord(2L, "audio", bad))
    }
    ()
  }

  test("y4m round trip: header params parsed, frames counted, truncation rejected") {
    val payload = Array.tabulate(100)(i => (i + 1).toByte) // → 3 frames of 48
    val y4m = MediaCodec.encodeY4m(payload)
    val d = MediaCodec.decode(MediaRecord(1L, "video", y4m))
    assert(d.format == "y4m" && d.width == 4 && d.height == 4)
    assert(d.n_frames == 3 && d.payload_bytes == 144)
    assert(d.payload_sum == (1 to 100).sum.toLong)
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaRecord(2L, "video", y4m.dropRight(1)))
    }
    // the C420 colourspace sizes frames at w·h·3/2 per spec
    val c420 = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII") ++
      ("FRAME\n".getBytes("US-ASCII") ++ Array.fill(24)(2.toByte))
    val e = MediaCodec.decode(MediaRecord(3L, "video", c420))
    assert(e.n_frames == 1 && e.payload_bytes == 24 && e.payload_sum == 48L)
    ()
  }

  test("decode sniffs magic bytes — the kind column is a hint, not trusted") {
    val wav = MediaCodec.encodeWav(Array[Byte](1, 2, 3))
    // mislabeled kind still decodes by container magic
    assert(MediaCodec.decode(MediaRecord(1L, "image", wav)).format == "wav")
    intercept[IllegalArgumentException] {
      MediaCodec.decode(MediaRecord(2L, "image", Array[Byte]('X', 'Y', 'Z')))
    }
    ()
  }

  test("decodeFeatures runs partition-local over a typed Dataset (no shuffle)") {
    val recs = (1L to 100L).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = Array.tabulate((i % 10).toInt + 1)(b => (b + i).toByte)
      MediaRecord(i, kind, MediaCodec.encode(kind, payload))
    }.toDS()
    val out = Multimodal.decodeFeatures(recs)
    // decode adds no Exchange on top of its input (narrow per-partition map)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan must be shuffle-free:\n$plan")
    val feats = out.collect()
    assert(feats.length == 100)
    assert(feats.filter(_.format == "y4m").forall(_.n_frames >= 1))
    assert(feats.map(_.format).toSet == Set("ppm", "wav", "y4m"))
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

  test("phash near-dup: exact pairs equal the class pair-count; near is a candidate subset") {
    val rows = Multimodal.phashNear(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (cand, near, exact) =>
      assert(cand >= near && near >= exact, "candidates ⊇ near ⊇ exact")
    }
    // n_exact_pairs per kind must equal sum of C(k,2) over the hash classes
    // the exact-dedup query groups by (pigeonhole: hamming-0 pairs always
    // share every chunk, so no exact pair can be missed)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val classes = Multimodal.attachBinary(spark, sfDir)
      .select(col("media_id"), col("kind"), col("content"))
      .as[Multimodal.MediaRecord].collect()
      .map(r => (r.kind, Multimodal.StubCodec.avgHash(r)))
      .groupBy(identity).map { case ((k, _), v) => k -> v.length.toLong }
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map { case (_, c) => c * (c - 1) / 2 }.sum
      }
    classes.foreach { case (kind, expectPairs) =>
      val got = rows.get(kind).map(_._3).getOrElse(0L)
      assert(got == expectPairs, s"$kind: exact pairs $got != class count $expectPairs")
    }
  }

  test("audio features: delta energy / peak / sign changes on a hand-built PCM stream") {
    // samples 10, 13, 11, 11, 14 → deltas (3, -2, 0, 3)
    val wav = MediaCodec.encodeWav(Array[Byte](10, 13, 11, 11, 14))
    val pcm = MediaCodec.wavSamples(wav)
    assert(pcm.sameElements(Array[Byte](10, 13, 11, 11, 14)))
    // engine-path twin over the same bytes via the registered query math:
    // energy = 9+4+0+9 = 22; peak = 3; sign changes: (3,-2) yes, (-2,0) no,
    // (0,3) no → 1
    val out = Multimodal.audioFeatures(spark, sfDir).collect()
    assert(out.length == 167)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * 125L, "8 kHz PCM-8 duration law")
      assert(r.getLong(4) >= r.getLong(5) * r.getLong(5) / math.max(1L, r.getLong(1)),
        "energy bounds peak")
      assert(r.getLong(6) <= math.max(0L, r.getLong(1) - 2), "crossings bounded by deltas")
    }
  }

  test("image features: channel sums and gradient energy on a hand-built plane") {
    // 2 pixels worth of payload → padded to one 8-px row (24 bytes)
    val ppm = MediaCodec.encodePpm(Array[Byte](10, 20, 30, 40, 50, 60))
    val (w, h, px) = MediaCodec.ppmPixels(ppm)
    assert(w == 8 && h == 1 && px.length == 24)
    assert(px.take(6).sameElements(Array[Byte](10, 20, 30, 40, 50, 60)))
    assert(px.drop(6).forall(_ == 0), "P6 plane is zero-padded")
    val out = Multimodal.imageFeatures(spark, sfDir).collect()
    assert(out.length == 167)
    out.foreach { r =>
      assert(r.getLong(1) == MediaCodec.PpmWidth.toLong)
      assert(r.getLong(2) >= 1L)
      assert(r.getLong(3) >= 0L && r.getLong(6) >= 0L)
    }
  }

  test("video motion: frame segmentation drives the energy sums") {
    // two frames: 48 bytes of 1s then 48 bytes of 3s → one transition,
    // delta 2 per byte → energy 48*4 = 192
    val payload = Array.fill(48)(1.toByte) ++ Array.fill(48)(3.toByte)
    val y4m = MediaCodec.encodeY4m(payload)
    val (w, h, frames) = MediaCodec.y4mFrames(y4m)
    assert(w == 4 && h == 4 && frames.length == 2)
    assert(frames(0).forall(_ == 1) && frames(1).forall(_ == 3))
    val out = Multimodal.videoFeatures(spark, sfDir).collect()
    assert(out.length == 166)
    out.foreach { r =>
      val (nf, fb, energy, peak) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(fb == MediaCodec.Y4mFrameBytes.toLong)
      assert(peak <= energy, "peak transition bounded by the total")
      assert(peak <= fb * 255L * 255L, "per-transition energy bound")
      if (nf == 1) assert(energy == 0L)
    }
  }

  test("binary attach exposes typed metadata over the real corpus") {
    val meta = Multimodal.binaryMeta(spark, sfDir).collect()
    assert(meta.length == 500)
    assert(meta.forall(r => r.getInt(2) > 0))                 // n_bytes
    assert(meta.forall(r => r.getString(3).length == 32))     // md5 hex
    assert(meta.map(_.getString(1)).toSet == Set("image", "audio", "video"))
  }
}
