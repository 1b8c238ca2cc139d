package graft

import graft.analytics.PortableSketch
import scala.util.Random

/** Laws for the engine-portable KMV sketches (the oracle already pins exact
  * cross-engine replay; these pin the ESTIMATOR quality and the aggregate's
  * algebra, which a hash gate alone cannot express).
  */
class PortableSketchSpec extends SparkSpec {

  test("MinKAgg is the sorted distinct min-K set function, any split/merge order") {
    val K = PortableSketch.K
    val rnd = new Random(7)
    val values = Array.fill(5000)(rnd.nextLong(1L << 52))
    val expected = values.distinct.sorted.take(K).toSeq
    // single-pass reduce
    val r1 = values.foldLeft(PortableSketch.MinKAgg.zero)(PortableSketch.MinKAgg.reduce)
    assert(PortableSketch.MinKAgg.finish(r1) == expected)
    // arbitrary partitioning + out-of-order merges
    val parts = values.grouped(613).map(
      _.foldLeft(PortableSketch.MinKAgg.zero)(PortableSketch.MinKAgg.reduce)).toSeq
    val merged = rnd.shuffle(parts).reduce(PortableSketch.MinKAgg.merge)
    assert(PortableSketch.MinKAgg.finish(merged) == expected)
    // duplicates never occupy sketch slots
    val dup = (values.take(10) ++ values.take(10) ++ values.take(10))
      .foldLeft(PortableSketch.MinKAgg.zero)(PortableSketch.MinKAgg.reduce)
    assert(PortableSketch.MinKAgg.finish(dup) == values.take(10).distinct.sorted.toSeq)
  }

  test("kmv_distinct: unsaturated sketches are exact; saturated within 4 sigma") {
    val out = PortableSketch.kmvDistinct(spark, sfDir).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val (exact, n, est) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      if (n < PortableSketch.K) assert(est == exact.toDouble, r.getString(0))
      else {
        val rsd = 1.0 / math.sqrt(PortableSketch.K - 2)
        assert(math.abs(est - exact) / exact <= 4 * rsd,
          s"${r.getString(0)}: est $est vs exact $exact")
      }
    }
  }

  test("sampled_quantiles: estimates ordered, bracketed by extremes, near exact") {
    val out = graft.analytics.Relational.sampledQuantiles(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = Seq("est_p25", "est_p50", "est_p75", "est_p99").map(r.getAs[Long])
      val exact = Seq("exact_p25", "exact_p50", "exact_p75", "exact_p99").map(r.getAs[Long])
      assert(est == est.sorted && exact == exact.sorted, "quantiles must be monotone")
      assert(r.getAs[Long]("n_sample") <= graft.analytics.Relational.SampleK)
      est.zip(exact).foreach { case (e, x) =>
        assert(math.abs(e - x).toDouble / x <= 0.25, s"est $e vs exact $x")
      }
    }
  }

  test("join_size_estimate: one-sided overestimate, truth matches the materialized join") {
    import org.apache.spark.sql.functions.col
    val r = PortableSketch.joinSizeEstimate(spark, sfDir).collect().head
    val truth = r.getAs[Long]("true_rows")
    val est = r.getAs[Long]("est_rows")
    assert(truth > 0, "the m:n join must be non-empty")
    assert(est >= truth, "CMS inner product must never underestimate")
    assert(r.getAs[Long]("overest_rows") == est - truth)
    assert(r.getAs[Long]("err_ppm") == (est - truth) * 1000000L / truth)
    // the 'truth' leg really is the join size (materialized recount)
    val joined = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "events"),
        col("o_custkey") === col("user_id")).count()
    assert(truth == joined, s"frequency-product truth $truth != joined $joined")
    // collision noise stays inside 10x the N_A N_B / width envelope
    val bound = 10L * r.getAs[Long]("n_a") * r.getAs[Long]("n_b") / PortableSketch.JsWidth
    assert(est - truth <= bound, s"overestimate ${est - truth} beyond envelope $bound")
  }

  test("pps_ht_estimate: certainty units sampled, HT estimate near truth, consistent counts") {
    val r = graft.analytics.Relational.ppsHtEstimate(spark, sfDir).collect().head
    val nPop = r.getAs[Long]("n_pop")
    val nSampled = r.getAs[Long]("n_sampled")
    assert(nPop > 0 && nSampled > 0 && nSampled <= nPop)
    assert(r.getAs[Long]("n_certainty") <= nSampled,
      "pi = 1 units are always in the sample")
    // size-biased PPS keeps HT terms near W/k — the estimate lands well
    // inside a few sigma of the truth (~1/sqrt(k) relative SE)
    assert(r.getAs[Long]("err_ppm") < 250000L,
      s"HT error ${r.getAs[Long]("err_ppm")} ppm exceeds the 25% envelope")
    // Poisson-PPS sample size concentrates around k
    val k = r.getAs[Long]("k_target")
    assert(nSampled > k / 4 && nSampled < k * 4,
      s"sample size $nSampled far from target $k")
    val again = graft.analytics.Relational.ppsHtEstimate(spark, sfDir).collect().head
    assert(again.getAs[Long]("ht_milli_c") == r.getAs[Long]("ht_milli_c"),
      "hash-membership sampling is rerun-deterministic")
  }

  test("kmv_set_ops: estimates track exact union/intersection; jaccard in [0,1]") {
    val r = PortableSketch.kmvSetOps(spark, sfDir).collect().head
    val (exU, exI) = (r.getAs[Long]("exact_union"), r.getAs[Long]("exact_inter"))
    val (esU, esI) = (r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"))
    val j = r.getAs[Double]("jaccard")
    assert(j >= 0.0 && j <= 1.0)
    assert(math.abs(esU - exU) / exU <= 0.25, s"union est $esU vs $exU")
    if (exI > 0) assert(math.abs(esI - exI) / exI <= 0.25, s"inter est $esI vs $exI")
  }
}
