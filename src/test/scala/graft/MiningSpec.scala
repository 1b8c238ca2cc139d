package graft

import graft.analytics.Mining
import org.apache.spark.sql.functions._

/** Laws for the pattern-mining pack beyond the DuckDB hash gate: rule-measure
  * identities (confidence bounds, lift symmetry, support containment),
  * Spearman-range and pairing invariants for the rank ACF, and CUSUM
  * split-evidence consistency.
  */
class MiningSpec extends SparkSpec {

  test("assoc_rules: measures respect their identities and the lift cut") {
    val rows = Mining.assocRules(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.RuleK)
    val n = rows.head.getAs[Long]("n_baskets")
    val lifts = rows.map(r =>
      (r.getAs[String]("ante"), r.getAs[String]("conseq")) ->
        r.getAs[Long]("lift_ppm")).toMap
    rows.foreach { r =>
      val (supA, supB, co) = (r.getAs[Long]("sup_a"), r.getAs[Long]("sup_b"),
        r.getAs[Long]("co_sup"))
      assert(co >= 1 && co <= math.min(supA, supB), "support containment")
      assert(supA <= n && supB <= n)
      val conf = r.getAs[Long]("conf_ppm")
      assert(conf == co * 1000000L / supA && conf <= 1000000L)
      val lift = r.getAs[Long]("lift_ppm")
      assert(lift == co * n * 1000000L / (supA * supB) && lift > 1000000L,
        "emitted rules must be positively associated")
      // lift is symmetric in (ante, conseq); the integer quotient is too
      lifts.get((r.getAs[String]("conseq"), r.getAs[String]("ante")))
        .foreach(rev => assert(rev == lift, "lift must be direction-invariant"))
    }
  }

  test("ts_acf: rho in [-1, 1] ppm, pair counts m = n - lag, lag-1 dominates noise floor") {
    val rows = Mining.tsAcf(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq == Mining.AcfLags)
    val n = rows.map(r => r.getAs[Long]("m") + r.getAs[Int]("lag")).distinct
    assert(n.length == 1, s"every lag must see the same series length, got $n")
    rows.foreach { r =>
      val (m, d2, rho) = (r.getAs[Long]("m"), r.getAs[Long]("d2"),
        r.getAs[Long]("rho_ppm"))
      assert(rho >= -1000000L && rho <= 1000000L)
      // reconstruct: rho_ppm is the floor of 1e6*(M-6D)/M
      val bigM = m * (m * m - 1)
      val num = 1000000L * (bigM - 6 * d2)
      assert(rho == Math.floorDiv(num, bigM))
    }
  }

  test("price_elasticity: the within estimator replays an in-memory recompute") {
    import org.apache.spark.sql.functions.{col, expr}
    val r = Mining.priceElasticity(spark, sfDir).collect().head
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(floor(l_discount * 100) AS BIGINT)").as("x"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("y"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    var numT = 0L; var denT = 0L; var used = 0L
    li.groupBy(_._1).foreach { case (_, rs) =>
      val n = rs.length.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(t => t._2 * t._3).sum; val sx2 = rs.map(t => t._2 * t._2).sum
      val den = n * sx2 - sx * sx
      numT += n * sxy - sx * sy; denT += den
      if (den > 0) used += 1
    }
    assert(r.getAs[Long]("n_parts_used") == used)
    assert(r.getAs[Long]("num_total") == numT && r.getAs[Long]("den_total") == denT)
    assert(denT > 0, "the corpus must have within-part discount variation")
    assert(r.getAs[Double]("elasticity_qty_per_pct") == numT.toDouble / denT)
  }

  test("ts_hw_forecast: the triple-smoothing fold replays bit-exactly in memory") {
    import org.apache.spark.sql.functions.{col, date_format, floor, lit, sum}
    val rows = Mining.tsHwForecast(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(1L to 7L))
    val xs = Tables.load(spark, sfDir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("v"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    var lsum = 0.0
    (0 until 7).foreach(i => lsum += xs(i))
    var level = lsum / 7; var trend = 0.0
    val sArr = Array.tabulate(7)(j => xs(j) - level)
    var t = 7
    while (t < xs.length) {
      val sOld = sArr(t % 7)
      val lNew = (xs(t) - sOld) / 2 + (level + trend) / 2
      val tNew = (lNew - level) / 5 + trend - trend / 5
      val sNew = (xs(t) - lNew) / 10 + sOld - sOld / 10
      sArr(t % 7) = sNew; level = lNew; trend = tNew; t += 1
    }
    rows.foreach { r =>
      val h = r.getLong(0).toInt
      val expect = level + h * trend + sArr((xs.length + h - 1) % 7)
      assert(r.getDouble(2) == expect, s"h=$h forecast bit-diverges")
      assert(r.getLong(1) == xs.length.toLong)
    }
  }

  test("ts_residual_outliers: median/MAD replay the ceil-rank rule and verdicts close") {
    val rows = Mining.tsResidualOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.ResidTopK)
    assert(rows.map(_.getLong(7)).sorted.sameElements(1L to rows.length))
    val resid = Mining.tsDecompose(spark, sfDir).collect().map(_.getAs[Long]("resid_c"))
    def ceilRankMedian(xs: Array[Long]): Long = {
      val sorted = xs.sorted
      sorted((xs.length + 1) / 2 - 1) // rank ceil(n/2), 1-based
    }
    val med = ceilRankMedian(resid)
    val mad = ceilRankMedian(resid.map(r => math.abs(r - med)))
    rows.foreach { r =>
      assert(r.getAs[Long]("med_c") == med && r.getAs[Long]("mad_c") == mad)
      assert(r.getAs[Long]("dev_c") == math.abs(r.getAs[Long]("resid_c") - med))
      assert((r.getAs[Long]("is_anomaly") == 1L) ==
        (r.getAs[Long]("dev_c") > Mining.ResidMadK * mad))
    }
    // worst-first: the top row carries the global max deviation
    assert(rows.head.getAs[Long]("dev_c") == resid.map(r => math.abs(r - med)).max)
  }

  test("trending_decay: weights replay in-memory and recency dominates raw counts at ties") {
    import org.apache.spark.sql.functions.{col, datediff, lit, to_date}
    val rows = Mining.trendingDecay(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.TrendK)
    assert(rows.map(_.getLong(3)).sorted.sameElements(1L to rows.length))
    val od = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dmax = od.values.max
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def w(ok: Long) = 1000000L / (1L << math.min((dmax - od(ok)) / Mining.TrendHalfLifeD, 40L))
    val expect = li.groupBy(_._2).map { case (p, ls) =>
      p -> (ls.map(l => w(l._1)).sum, ls.length.toLong)
    }
    rows.foreach { r =>
      val (score, n) = expect(r.getLong(0))
      assert(r.getLong(1) == score && r.getLong(2) == n,
        s"part ${r.getLong(0)}: decayed score/count mismatch")
    }
    // the emitted leaderboard is the true top-K of the in-memory scores
    val topScore = expect.values.map(_._1).max
    assert(rows.head.getLong(1) == topScore)
  }

  test("cf stages respect the cap laws that bound them at any scale") {
    val rows = Mining.cfStageRows(spark, sfDir).map(t => t._1 -> t._2).toMap
    // independent counts of the bounding sets
    val od = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val own = od.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("it")).distinct()
    val nUsers = own.select("u").distinct().count()
    val nItems = own.select("it").distinct().count()
    val cap = Mining.CfHistCap.toLong
    assert(rows("up_capped") <= rows("up0_ownership"))
    assert(rows("up_capped") <= nUsers * cap, "history cap violated")
    // THE dominant stage: in-basket pair expansion is C(cap,2) per user, so
    // its weak-scaling growth can never exceed the user count's
    assert(rows("pairs_raw") <= nUsers * cap * (cap - 1) / 2,
      s"pair expansion ${rows("pairs_raw")} exceeds users x C(cap,2)")
    assert(rows("pairs_minco") <= rows("pairs_raw"))
    assert(rows("sim_edges") == 2 * rows("pairs_minco"), "sym must double the pairs")
    assert(rows("nb_truncated") <= nItems * Mining.CfNeighborK,
      "neighbor lists exceed the serving truncation")
    // each target history item contributes at most K candidate paths
    assert(rows("cand_scored") <= rows("up_capped").min(
      Mining.CfTargetMax * cap) * Mining.CfNeighborK)
  }

  test("cf_item_recs: ranked, positive-score, never-owned recommendations per target") {
    import org.apache.spark.sql.functions.col
    val rows = Mining.cfItemRecs(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.CfTargetMax * Mining.CfRecK)
    val owned = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .where(col("o_custkey") < Mining.CfTargetMax)
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).sorted.sameElements(1L to rs.length), "ranks contiguous")
    }
    rows.foreach { r =>
      assert(r.getLong(0) < Mining.CfTargetMax)
      assert(!owned((r.getLong(0), r.getLong(1))), "recommended an owned item")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0, "positive score via >= 1 path")
      assert(r.getLong(2) >= r.getLong(3), "score is a sum of >= 1-ppm paths")
    }
  }

  test("ts_pinball: losses replay in memory and q90 covers at least as often as q50") {
    val rows = Mining.tsPinball(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("q50", "q90"))
    // q90 forecasts a higher order statistic -> it must cover >= q50's rate
    assert(rows("q90")._3 >= rows("q50")._3)
    // independent in-memory recompute of both legs
    val ser = Tables.load(spark, sfDir, "lineitem")
      .selectExpr("CAST(datediff(to_date(l_shipdate), '1970-01-01') AS LONG) AS d",
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS LONG) AS c")
      .groupBy("d").agg(org.apache.spark.sql.functions.sum("c").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val vs = ser.map(_._2)
    Seq(("q50", 5L, math.ceil(0.5 * Mining.PinW).toInt),
        ("q90", 9L, math.ceil(0.9 * Mining.PinW).toInt)).foreach { case (label, tenQ, rank) =>
      var n = 0L; var loss = 0L; var cov = 0L
      (Mining.PinW until vs.length).foreach { i =>
        val hist = vs.slice(i - Mining.PinW, i).sorted
        val f = hist(rank - 1)
        val v = vs(i)
        n += 1
        loss += tenQ * math.max(v - f, 0L) + (10 - tenQ) * math.max(f - v, 0L)
        if (v <= f) cov += 1
      }
      val (gn, gl, gc) = rows(label)
      assert(gn == n && gl == loss && gc == cov * 1000000L / n,
        s"$label: got ($gn,$gl,$gc) want ($n,$loss,${cov * 1000000L / n})")
    }
  }

  test("ts_backtest: both models replay an independent in-memory error recompute") {
    import org.apache.spark.sql.functions.{col, datediff, floor, lit, sum, to_date}
    val rows = Mining.tsBacktest(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("naive1", "seasonal7"))
    val ser = Tables.load(spark, sfDir, "lineitem")
      .groupBy(datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long").as("d"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(("naive1", 1L), ("seasonal7", 7L)).foreach { case (name, lagD) =>
      val pairs = ser.toSeq.flatMap { case (d, v) => ser.get(d - lagD).map(fc => (v, fc)) }
      val n = pairs.size.toLong
      val r = rows(name)
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("mae_c") == pairs.map(p => math.abs(p._1 - p._2)).sum / n)
      assert(r.getAs[Long]("mape_ppm") ==
        pairs.map(p => 1000000L * math.abs(p._1 - p._2) / p._1).sum / n)
      assert(r.getAs[Long]("bias_floor_c") ==
        math.floor(pairs.map(p => p._1 - p._2).sum.toDouble / n).toLong)
      assert(r.getAs[Long]("max_abs_err_c") == pairs.map(p => math.abs(p._1 - p._2)).max)
    }
  }

  test("ts_changepoint: one split per year, inside the year, with consistent side means") {
    val rows = Mining.tsChangepoint(spark, sfDir).collect()
    assert(rows.length >= 2, "multi-year shipdate range must yield multiple splits")
    assert(rows.map(_.getAs[Int]("yr")).distinct.length == rows.length)
    rows.foreach { r =>
      val (t, m) = (r.getAs[Long]("t_star"), r.getAs[Long]("m_days"))
      assert(t >= 1 && t < m, "split excludes the trivial whole-year cut")
      assert(r.getAs[String]("chg_day").startsWith(r.getAs[Int]("yr").toString))
      assert(r.getAs[Long]("score") >= 0)
      // CUSUM evidence: score = |m*P - t*S| = m*t*|mean_before - mean_after|
      // up to floor loss, so a positive score forces the side means apart
      if (r.getAs[Long]("score") > 2 * m * m)
        assert(r.getAs[Long]("mean_before_c") != r.getAs[Long]("mean_after_c"))
    }
  }

  test("ts_holt_forecast: forecast is the linear level+trend extrapolation; flat series fixpoint") {
    val rows = Mining.tsHoltForecast(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, t, f) = (r.getAs[Long]("level_c"), r.getAs[Long]("trend_c"),
        r.getAs[Long]("fc7_c"))
      // floors commute with the sum only up to 1 unit of floor loss
      assert(math.abs(f - (l + Mining.HoltH * t)) <= Mining.HoltH + 1,
        s"forecast must extrapolate level+h*trend, got l=$l t=$t f=$f")
      assert(r.getAs[Long]("n_days") >= 2)
    }
    // law: on a constant series the recurrence is a fixpoint (L=x, T=0)
    import spark.implicits._
    val flat = Seq.fill(50)(1000.0)
    val (lv, tr) = flat.indices.drop(1).foldLeft((flat.head, flat(1) - flat.head)) {
      case ((level, trend), i) =>
        val a = Mining.HoltAlphaNum.toDouble / 10
        val b = Mining.HoltBetaNum.toDouble / 10
        val l2 = a * flat(i) + (1 - a) * (level + trend)
        (l2, b * (l2 - level) + (1 - b) * trend)
    }
    assert(lv == 1000.0 && tr == 0.0)
  }

  test("ts_seasonality: seven slots partition every ship day and indices average to 1e6") {
    val rows = Mining.tsSeasonality(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("dow7")).sorted.sameElements(0 until 7))
    val idx = rows.map(_.getAs[Long]("idx_ppm"))
    // sum of floors of x_i*7e6/total with sum(x_i)=total: within 7 of 7e6
    assert(math.abs(idx.sum - 7000000L) <= 7, s"indices sum ${idx.sum}")
    val totalDays = rows.map(_.getAs[Long]("n_days")).sum
    val distinctDays = graft.Tables.load(spark, sfDir, "lineitem")
      .select(date_format(col("l_shipdate"), "yyyy-MM-dd")).distinct().count()
    assert(totalDays == distinctDays, "slots partition the day set")
  }

  test("cluster_grid_density: points conserved, noise row present, separation holds") {
    val rows = Mining.clusterGridDensity(spark, sfDir).collect()
    val noise = rows.filter(_.getAs[Long]("cluster_id") == -1L)
    assert(noise.length == 1, "exactly one noise row")
    val total = Tables.load(spark, sfDir, "part").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum == total,
      "clusters + noise partition the points")
    val clusters = rows.filter(_.getAs[Long]("cluster_id") >= 0)
    clusters.foreach { r =>
      // label is the min encoded cell id -> must sit inside the bbox
      val (cx, cy) = (r.getAs[Long]("cluster_id") / 1000,
        r.getAs[Long]("cluster_id") % 1000)
      assert(cx >= r.getAs[Long]("min_cx") && cx <= r.getAs[Long]("max_cx"))
      assert(cy >= r.getAs[Long]("min_cy") && cy <= r.getAs[Long]("max_cy"))
      assert(r.getAs[Long]("n_points") >= Mining.DbMinPts * r.getAs[Long]("n_cells") ||
        r.getAs[Long]("n_cells") == 0)
    }
    // recompute the dense-cell set locally: two DIFFERENT clusters may never
    // hold 8-adjacent dense cells (otherwise union-find should have merged)
    val cells = Tables.load(spark, sfDir, "part")
      .select((floor(col("p_retailprice") * 100).cast("long") / 1000).cast("long").as("cx"),
        col("p_size").cast("long").as("cy"))
      .groupBy("cx", "cy").count()
      .filter(col("count") >= Mining.DbMinPts)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dense = cells.toSet
    assert(clusters.map(_.getAs[Long]("n_cells")).sum == dense.size)
  }

  test("survival_km: survival is a non-increasing probability, risk sets shrink, first step exact") {
    val rows = Mining.survivalKm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byT = rows.sortBy(_.getAs[Long]("t"))
    byT.foreach { r =>
      assert(r.getAs[Long]("d") >= 1 && r.getAs[Long]("d") <= r.getAs[Long]("n_risk"))
      assert(r.getAs[Long]("s_e6") >= 0 && r.getAs[Long]("s_e6") <= 1000000L)
    }
    val s = byT.map(_.getAs[Long]("s_e6"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b }, "S never increases")
    val n = byT.map(_.getAs[Long]("n_risk"))
    assert(n.zip(n.tail).forall { case (a, b) => a > b }, "risk set strictly shrinks past each death time")
    val first = byT.head
    val expected = math.floor(
      (1.0 - first.getAs[Long]("d").toDouble / first.getAs[Long]("n_risk").toDouble) * 1e6).toLong
    assert(first.getAs[Long]("s_e6") == expected, "first product-limit step replays")
  }

  test("recursive_sql_reach equals the DataFrame-loop BFS exactly") {
    val sqlSide = Mining.recursiveSqlReach(spark, sfDir).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val loopSide = graft.analytics.Graph.reach(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlSide == loopSide,
      s"recursive CTE $sqlSide must equal frontier BFS $loopSide")
  }

  test("bitmap distinct equals count(DISTINCT) and the aggregator laws hold") {
    val rows = Mining.bitmapDistinctWeekly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy(expr("CAST(datediff(to_date(ts), '1970-01-01') AS BIGINT) div 7").as("week"))
      .agg(count_distinct(col("user_id")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("n_users") == exact(r.getAs[Long]("week"))))
    // direct aggregator laws: idempotent reduce, commutative merge
    val a = Mining.BitmapAgg
    val b1 = a.reduce(a.reduce(a.zero, 5L), 5L)
    assert(a.finish(b1) == 1L, "re-adding an id is idempotent")
    val x = a.reduce(a.reduce(a.zero, 1L), 200L)
    val y = a.reduce(a.zero, 64L)
    assert(a.finish(a.merge(x.clone(), y.clone())) == 3L)
    assert(a.finish(a.merge(y.clone(), x.clone())) == 3L, "merge commutes")
  }

  test("ts_peaks: every peak strictly dominates its neighborhood with the claimed prominence") {
    val peaks = Mining.tsPeaks(spark, sfDir).collect()
    // recompute the daily series locally and check each emitted peak
    val daily = Tables.load(spark, sfDir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100))
        .cast("long")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val idxOf = daily.zipWithIndex.map { case ((d, _), i) => d -> i }.toMap
    peaks.foreach { p =>
      val i = idxOf(p.getAs[String]("day"))
      val v = p.getAs[Long]("v")
      assert(daily(i)._2 == v)
      val nb = ((i - Mining.PeakW) to (i + Mining.PeakW))
        .filter(j => j != i && j >= 0 && j < daily.length).map(daily(_)._2)
      assert(nb.size == 2 * Mining.PeakW)
      assert(nb.max == p.getAs[Long]("runner_up"))
      assert(v > nb.max)
      assert((v - nb.max) * 1000000L >= v * Mining.PeakPromPpm)
    }
  }

  test("stump_train: split beats every other threshold in a local exhaustive re-search") {
    val r = Mining.stumpTrain(spark, sfDir).collect().head
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == rows.length)
    def score(thr: Long): Double = {
      val (l, rt) = rows.partition(_._1 <= thr)
      def side(xs: Array[(Long, String)]): Double = {
        if (xs.isEmpty) return 0.0
        val c = xs.groupBy(_._2).view.mapValues(_.length.toLong)
        val sq = List("A", "N", "R").map(k => { val v = c.getOrElse(k, 0L); v * v }).sum
        sq.toDouble / xs.length
      }
      side(l) + side(rt)
    }
    val qs = rows.map(_._1).distinct.sorted
    val best = r.getAs[Long]("split_q")
    val bestScore = score(best)
    qs.filter(_ < qs.max).foreach { t =>
      assert(score(t) <= bestScore + 1e-9, s"threshold $t beats chosen $best")
    }
    // leaf histograms replay
    val (l, rt) = rows.partition(_._1 <= best)
    assert(l.count(_._2 == "A") == r.getAs[Long]("la"))
    assert(rt.count(_._2 == "R") == r.getAs[Long]("rr"))
  }

  test("ts_mann_kendall: S from a local pair count, z replays, |S| bounded by pairs") {
    val r = Mining.tsMannKendall(spark, sfDir).collect().head
    val (n, s) = (r.getAs[Long]("n"), r.getAs[Long]("s_stat"))
    assert(math.abs(s) <= n * (n - 1) / 2, "|S| bounded by the pair count")
    assert(r.getAs[Long]("var_s") == n * (n - 1) * (2 * n + 5) / 18)
    val vals = Tables.load(spark, sfDir, "lineitem")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("m"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100))
        .cast("long")).as("v"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).sortBy(_._1).map(_._2)
    val sLocal = (for (i <- vals.indices; j <- i + 1 until vals.length)
      yield java.lang.Long.signum(vals(j) - vals(i)).toLong).sum
    assert(s == sLocal, "pairwise sign sum replays")
    val z = (s.toDouble - math.signum(s.toDouble)) /
      math.sqrt(n.toDouble * (n - 1) * (2 * n + 5) / 18)
    assert(r.getAs[Long]("z_milli") == math.floor(z * 1000).toLong)
  }

  test("tree_depth2: children partition the root and each child split is optimal on its side") {
    val rows = Mining.treeDepth2(spark, sfDir).collect()
      .map(r => r.getAs[String]("node") -> r).toMap
    assert(rows.keySet == Set("root", "left", "right"))
    assert(rows("left").getAs[Long]("n_rows") + rows("right").getAs[Long]("n_rows") ==
      rows("root").getAs[Long]("n_rows"))
    Seq("a", "n", "r").foreach { c =>
      assert(rows("left").getAs[Long](c) + rows("right").getAs[Long](c) ==
        rows("root").getAs[Long](c), s"class $c conserved")
    }
    // optimality of the left child's split on its own rows
    val q1 = rows("root").getAs[Long]("split_at")
    val data = Tables.load(spark, sfDir, "lineitem")
      .join(broadcast(Tables.load(spark, sfDir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_quantity").cast("long"), col("p_size").cast("long"),
        col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val leftRows = data.filter(_._1 <= q1)
    def score(rows: Array[(Long, Long, String)], thr: Long): Double = {
      val (l, rt) = rows.partition(_._2 <= thr)
      def side(xs: Array[(Long, Long, String)]): Double =
        if (xs.isEmpty) 0.0
        else {
          val c = xs.groupBy(_._3).view.mapValues(_.length.toLong)
          List("A", "N", "R").map(k => { val v = c.getOrElse(k, 0L); v * v }).sum
            .toDouble / xs.length
        }
      side(l) + side(rt)
    }
    val sizes = leftRows.map(_._2).distinct.sorted
    val chosen = rows("left").getAs[Long]("split_at")
    val best = score(leftRows, chosen)
    sizes.filter(_ < sizes.max).foreach { t =>
      assert(score(leftRows, t) <= best + 1e-9, s"size threshold $t beats chosen $chosen")
    }
  }

  test("ts_decompose: exact additive identity and centered-MA trend") {
    val rows = Mining.tsDecompose(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // v = trend + seasonal + residual EXACTLY (integer identity)
      assert(r.getAs[Long]("v") == r.getAs[Long]("trend_c") +
        r.getAs[Long]("seasonal_c") + r.getAs[Long]("resid_c"))
    }
    // seasonal components: 7 distinct values keyed by weekday slot, and the
    // residual means per slot are (near) zero by construction of the
    // seasonal floor-mean: |mean| < 1 cent
    val byDay = rows.map(r => r.getAs[String]("day") -> r).toMap
    val slots = rows.groupBy(r =>
      java.time.LocalDate.parse(r.getAs[String]("day")).toEpochDay % 7)
    slots.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("seasonal_c")).distinct.length == 1,
        "one seasonal value per slot")
      val resids = rs.map(_.getAs[Long]("resid_c"))
      val mean = resids.sum.toDouble / resids.length
      assert(mean >= 0 && mean < 1, s"slot residual mean $mean out of [0,1)")
    }
    assert(byDay.size == rows.length)
  }

  test("capped_running_balance: trajectory clamps bind and replay a local fold") {
    val rows = Mining.cappedRunningBalance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("balance_mc")
      assert(b >= 0 && b <= Mining.BalCap, "balance stays in [0, cap]")
    }
    // replay one user's full trajectory locally
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val (_, urs) = byUser.maxBy(_._2.length)
    val sorted = urs.sortBy(_.getAs[String]("day"))
    var b = 0L
    sorted.foreach { r =>
      b = math.min(Mining.BalCap, math.max(0L, b + r.getAs[Long]("delta_mc")))
      assert(r.getAs[Long]("balance_mc") == b, "fold replays step by step")
    }
    // the clamp is not vacuous on real data: some step hits floor or cap
    val hits = rows.count(r => r.getAs[Long]("balance_mc") == 0L ||
      r.getAs[Long]("balance_mc") == Mining.BalCap)
    assert(hits > 0, "clamp must bind somewhere or the cap is untested")
  }

  test("cohort_ltv is non-decreasing in age and conserves purchase spend") {
    val rows = graft.analytics.Analytics.cohortLtv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cohort")).values.foreach { rs =>
      val byAge = rs.sortBy(_.getAs[Long]("age_m"))
      val cums = byAge.map(_.getAs[Long]("cum_spend_mc"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      assert(byAge.map(_.getAs[Long]("spend_mc")).sum == cums.last)
    }
    val total = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 1000).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("spend_mc")).sum == total,
      "curves conserve total purchase spend")
  }

  test("assoc_triples: canonical order, support monotonicity, lift replay") {
    val rows = Mining.assocTriples(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Mining.TripleK)
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[String]("ia"), r.getAs[String]("ib"), r.getAs[String]("ic"))
      assert(a < b && b < c, "triples are canonically ordered")
      val (co, sa, sb, sc) = (r.getAs[Long]("co3"), r.getAs[Long]("sa"),
        r.getAs[Long]("sb"), r.getAs[Long]("sc_"))
      assert(co >= 1 && co <= math.min(sa, math.min(sb, sc)),
        "triple support bounded by every item support")
      // replay the double lift with the identical op order
      val n = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey").distinct().count()
      val lift = co.toDouble * n * n / (sa * sb * sc).toDouble * 1000
      assert(r.getAs[Long]("lift3_milli") == math.floor(lift).toLong)
    }
  }

  test("seq_prefixspan: supports replay a driver-side greedy subsequence scan") {
    val rows = Mining.seqPrefixspan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(_ >= Mining.SeqPatMinUsers))
    // driver twin: per user the time-ordered event list; greedy matching
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.load(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"), unix_micros(
          org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    def contains(s: Seq[(Long, String, Long)], pat: Seq[String]): Boolean = {
      var t = Long.MinValue
      pat.forall { p =>
        s.find(e => e._2 == p && e._3 > t) match {
          case Some(e) => t = e._3; true
          case None => false
        }
      }
    }
    val types = ev.map(_._2).distinct
    for (a <- types; b <- types; c <- types) {
      val n = byUser.values.count(s => contains(s.toSeq, Seq(a, b, c))).toLong
      val got = rows.getOrElse((a, b, c), 0L)
      if (n >= Mining.SeqPatMinUsers) assert(got == n, s"($a,$b,$c)")
      else assert(got == 0L, s"($a,$b,$c) under min support")
    }
  }

  test("ts_matrix_profile: motif/discord replay a driver-side all-pairs scan") {
    val rows = Mining.tsMatrixProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mi, mj) = (r.getAs[Long]("motif_i"), r.getAs[Long]("motif_j"))
      assert(mj >= mi + Mining.MpExcl, "motif pair respects the exclusion zone")
      assert(r.getAs[Long]("motif_d2") <= r.getAs[Long]("discord_d2"),
        "best pair distance cannot exceed the discord's nearest-neighbor distance")
    }
    // driver-side twin for one instrument: weekly closes -> all-pairs profile
    import org.apache.spark.sql.functions._
    val tik = rows.head.getString(0)
    val li = Tables.load(spark, sfDir, "lineitem")
    val weekly = li.select(
        concat(lit("FIGI"), col("l_partkey") % 20).as("tik"),
        expr("timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate)").as("tsv"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("eid"))
      .where(col("tik") === tik)
      .groupBy(date_trunc("week", col("tsv")).as("week"))
      .agg(max_by(col("cents"), struct(col("tsv"), col("eid"), col("cents"))).as("c"))
      .orderBy("week").select("c").collect().map(_.getLong(0))
    val m = Mining.MpWin
    val nW = weekly.length - m + 1
    val wins = (0 until nW).map(i => weekly.slice(i, i + m))
    def d2(a: Array[Long], b: Array[Long]): Long = {
      val (sa, sb) = (a.sum, b.sum)
      a.zip(b).map { case (x, y) => val d = (m * x - sa) - (m * y - sb); d * d }.sum
    }
    val pairs = for {
      i <- 0 until nW; j <- (i + Mining.MpExcl) until nW
    } yield (i + 1, j + 1, d2(wins(i).toArray, wins(j).toArray))
    val best = pairs.minBy(p => (p._3, p._1, p._2))
    val got = rows.find(_.getString(0) == tik).get
    assert(got.getAs[Long]("motif_i") == best._1 && got.getAs[Long]("motif_j") == best._2)
    assert(got.getAs[Long]("motif_d2") == best._3)
    val prof = pairs.flatMap(p => Seq(p._1 -> p._3, p._2 -> p._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
    val disc = prof.toSeq.minBy { case (idx, pd) => (-pd, idx) }
    assert(got.getAs[Long]("discord_i") == disc._1 && got.getAs[Long]("discord_d2") == disc._2)
  }

  test("mining queries are rerun-deterministic") {
    // includes every collect-localized query in the pack: a driver-side
    // union-find / argmax / fold that depended on row arrival order would
    // flicker here
    for (q <- Seq(Mining.assocRules _, Mining.assocTriples _, Mining.tsAcf _,
      Mining.tsChangepoint _, Mining.clusterGridDensity _, Mining.survivalKm _,
      Mining.treeDepth2 _, Mining.cappedRunningBalance _)) {
      val a = q(spark, sfDir).collect().map(_.toString).sorted
      val b = q(spark, sfDir).collect().map(_.toString).sorted
      assert(a.sameElements(b))
    }
  }
}
