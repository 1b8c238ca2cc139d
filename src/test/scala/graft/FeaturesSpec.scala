package graft

import graft.llm.Features
import org.apache.spark.sql.functions._

/** Laws for the feature-engineering pack beyond the DuckDB hash gate:
  * leakage-freedom and smoothing bounds for target encoding, signed-sum
  * bounds for the hashing trick, and fold-partition + residual sanity for
  * k-fold CV.
  */
class FeaturesSpec extends SparkSpec {

  test("target encoding is leave-one-out: removing a singleton collapses to the prior") {
    val rows = Features.targetEncodeLoo(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute category stats locally and confirm the LOO identity per row
    val byCat = rows.groupBy(_.getAs[String]("cat"))
    val all = rows.map(_.getAs[Long]("y_c"))
    val prior = all.sum / all.length
    byCat.foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("y_c")).sum
      val n = rs.length.toLong
      rs.foreach { r =>
        val expected = (s - r.getAs[Long]("y_c") + Features.TeSmooth * prior) /
          (n - 1 + Features.TeSmooth)
        assert(r.getAs[Long]("enc_c") == expected, "LOO identity")
      }
      // a category singleton (n=1) would reduce to exactly the prior
      if (n == 1) assert(rs.head.getAs[Long]("enc_c") == prior)
    }
  }

  test("hashed features: buckets in range, |signed_sum| <= n_tok, same parity") {
    val rows = Features.featureHashExport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < Features.HashB)
      assert(r.getAs[Long]("doc_id") % Features.HashDocMod == 0)
      val (ss, nt) = (r.getAs[Long]("signed_sum"), r.getAs[Long]("n_tok"))
      assert(math.abs(ss) <= nt, "signed sum bounded by token count")
      assert((ss - nt) % 2 == 0, "sum and count share parity (+/-1 steps)")
    }
  }

  test("export manifest: shards partition the corpus and checksums replay the md5 twin") {
    val rows = Features.exportManifest(spark, sfDir).collect()
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total, "shards partition the corpus")
    assert(rows.map(_.getAs[Long]("shard")).distinct.length == rows.length)
    // driver-side MessageDigest twin of the shard assignment + row hash
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(8), 16)
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars", "text").collect()
    val local = docs.groupBy(d => h32(d.getLong(0).toString) % Features.ManifestShards)
      .view.mapValues(ds => (ds.length.toLong,
        ds.map(d => h32(s"${d.getLong(0)}:${d.getLong(1)}:${md5hex(d.getString(2))}")).sum))
      .toMap
    rows.foreach { r =>
      val (n, ck) = local(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("checksum") == ck, "order-free checksum replays")
    }
  }

  test("k-fold CV: folds partition the fact, train+test = total, MSE consistent") {
    val rows = Features.cvKfoldOls(spark, sfDir).collect()
    assert(rows.length == Features.CvK)
    val total = Tables.load(spark, sfDir, "lineitem").count()
    val nTests = rows.map(_.getAs[Long]("n_test"))
    assert(nTests.sum == total, "held-out folds partition the fact")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == total)
      assert(r.getAs[Long]("sse_h") >= 0)
      assert(r.getAs[Long]("mse_h") == r.getAs[Long]("sse_h") / r.getAs[Long]("n_test"))
    }
    // independent derivation: recompute fold 0's train slope from raw rows
    val li = Tables.load(spark, sfDir, "lineitem").select(
      (conv(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 8), 16, 10)
        .cast("long") % Features.CvK).as("fold"),
      col("l_quantity").cast("long").as("x"),
      floor(col("l_extendedprice") * 100).cast("long").as("y_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tr = li.filter(_._1 != 0L)
    val n = tr.length.toDouble
    val (sx, sy) = (tr.map(_._2).sum.toDouble, tr.map(_._3).sum.toDouble)
    val (sxx, sxy) = (tr.map(t => t._2 * t._2).sum.toDouble,
      tr.map(t => t._2 * t._3).sum.toDouble)
    val slope = (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n))
    val fold0 = rows.find(_.getAs[Long]("fold") == 0L).get
    assert(fold0.getAs[Long]("slope_ppm") == math.floor(slope * 1000000).toLong,
      "fold-0 slope matches an independent recomputation")
  }

  test("quantile normalize: deciles partition rows near-uniformly, ppms ordered") {
    import graft.llm.Features
    val rows = Features.quantileNormalize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val totalRows = Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_._3).sum == totalRows, "deciles must partition every row")
    // rank transform: decile row masses are uniform up to tie granularity
    rows.foreach { case (d, _, n, lo, hi) =>
      assert(lo <= hi && lo >= 0 && hi <= 1000000L)
      assert(n <= totalRows / 10 + totalRows / 50 + 1,
        s"decile $d holds $n rows — rank transform should spread near-uniformly")
    }
    // ppm ranges of successive deciles never overlap
    rows.toSeq.sliding(2).foreach {
      case scala.collection.Seq(a, b) => assert(a._5 < b._4)
      case _ =>
    }
  }
}
