package graft

import graft.operators.{Asof, Snapshot}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Micro-fixtures pinning the custom operator semantics. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join takes the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:05:00"), 101L),
      (1L, ts("2024-01-01 09:00:00"), 102L), // before any quote → null
      (2L, ts("2024-01-01 10:00:00"), 103L))
      .toDF("figi", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 11.0), // equal ts → inclusive match
      (1L, ts("2024-01-01 10:04:00"), 12.0),
      (2L, ts("2024-01-01 09:59:00"), 20.0))
      .toDF("figi", "ts", "quote")

    val out = Asof.joinLatest(trades, quotes, "figi", "ts", "ts", "quote")
      .select("trade_id", "quote_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(100L) == Some(11.0)) // equal-ts quote matches (inclusive)
    assert(out(101L) == Some(12.0)) // latest preceding
    assert(out(102L) == None)       // nothing at-or-before
    assert(out(103L) == Some(20.0)) // keys don't leak across figi
  }

  test("as-of join matches by row: a matched null value does not fall through") {
    val left = Seq(
      (1L, ts("2024-01-01 10:05:00"), 200L),  // latest match has null value
      (1L, ts("2024-01-01 08:00:00"), 201L))  // before everything
      .toDF("figi", "ts", "trade_id")
    val right = Seq(
      (1L, Some(ts("2024-01-01 09:00:00")), Some(10.0)),
      (1L, Some(ts("2024-01-01 10:00:00")), None),        // matched row, null value
      (1L, None, Some(99.0)))                             // null ts → dropped
      .toDF("figi", "ts", "quote")
    val out = Asof.joinLatest(left, right, "figi", "ts", "ts", "quote")
      .select("trade_id", "quote_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(200L) == None) // the 10:00 row matched; its null value is the answer
    assert(out(201L) == None) // null-ts right row must not leak a pre-time match
  }

  test("GraftExtensions makes cosine_similarity callable from SQL text") {
    org.apache.spark.sql.graftx.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("int_dot native expression: SQL-callable, interpreted == generated == manual") {
    org.apache.spark.sql.graftx.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT int_dot(array(1L, -2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(viaSql == 1L * 4 - 2L * 5 + 3L * 6)
    // column API over real rows (exercises the codegen path inside a stage)
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((Array.fill(8)(rnd.nextInt(1000).toLong - 500),
      Array.fill(8)(rnd.nextInt(1000).toLong - 500)))
    val got = rows.toDF("a", "b")
      .select(org.apache.spark.sql.graftx.IntDotProduct(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got == want)
  }

  test("as-of join guards its reserved working columns") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1L, 1L)).toDF("figi", "ts").withColumn("_asof_ts", lit(0L))
    val right = Seq((1L, 1L, 2.0)).toDF("figi", "ts", "quote")
    intercept[IllegalArgumentException] {
      Asof.joinLatest(left, right, "figi", "ts", "ts", "quote")
    }
    ()
  }

  test("snapshot cadence keeps exactly the latest update per bucket") {
    val updates = Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, 5.0),
      (1L, ts("2024-01-01 10:14:00"), 2L, 6.0),  // same 15-min bucket, later → survives
      (1L, ts("2024-01-01 10:16:00"), 3L, 7.0),  // next bucket
      (1L, ts("2024-01-01 10:16:00"), 4L, 8.0),  // equal ts → higher event_id survives
      (2L, ts("2024-01-01 10:01:00"), 5L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")

    val out = Snapshot.atCadence(updates, Seq("user_id"), "ts", 15, col("event_id"))
      .select("user_id", "snapshot_ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getLong(2)).toMap
    assert(out.size == 3)
    assert(out((1L, "2024-01-01 10:00:00.0")) == 2L)
    assert(out((1L, "2024-01-01 10:15:00.0")) == 4L)
    assert(out((2L, "2024-01-01 10:00:00.0")) == 5L)
  }

  test("range join matches the naive nested-loop result, once per pair") {
    // grid pitch 10; intervals spanning 1, 2 and 4 buckets + an empty one
    val points = Seq((1L, 5L, 100L), (1L, 19L, 101L), (1L, 35L, 102L),
      (2L, 5L, 103L), (1L, 40L, 104L), (1L, 45L, 105L))
      .toDF("k", "t", "pid")
    val ivs = Seq((1L, 0L, 20L, 200L), (1L, 15L, 45L, 201L),
      (1L, 30L, 30L, 202L), // empty: start == end
      (2L, 0L, 50L, 203L), (3L, 0L, 100L, 204L))
      .toDF("k", "s", "e", "iid")

    val got = graft.operators.RangeJoin
      .joinPointInInterval(points, ivs, "k", "t", "s", "e", granularity = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (pk, t, pid) <- Seq((1L, 5L, 100L), (1L, 19L, 101L), (1L, 35L, 102L),
        (2L, 5L, 103L), (1L, 40L, 104L), (1L, 45L, 105L))
      (ik, s0, e0, iid) <- Seq((1L, 0L, 20L, 200L), (1L, 15L, 45L, 201L),
        (1L, 30L, 30L, 202L), (2L, 0L, 50L, 203L), (3L, 0L, 100L, 204L))
      if pk == ik && t >= s0 && t < e0
    } yield (pid, iid)
    assert(got.sorted.toSeq == want.sorted) // no dup pairs, none missing
    assert(!got.contains((105L, 201L)))     // end exclusive: t=45 ∉ [15,45)
  }

  test("range join renames colliding interval columns instead of clobbering") {
    val points = Seq((1L, 5L, "p")).toDF("k", "t", "tag")
    val ivs = Seq((1L, 0L, 10L, "i")).toDF("k", "s", "t", "tag")
    val out = graft.operators.RangeJoin
      .joinPointInInterval(points, ivs, "k", "t", "s", "t_iv", granularity = 10L)
    assert(out.columns.count(_ == "tag") == 1 && out.columns.contains("tag_iv"))
    val r = out.select("tag", "tag_iv").head()
    assert(r.getString(0) == "p" && r.getString(1) == "i")
  }

  test("merge applies latest-wins upserts, deletes and inserts") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq(
      (1L, 1L, "U", 11.0),  // stale update...
      (1L, 2L, "U", 12.0),  // ...latest wins
      (2L, 1L, "D", 0.0),   // delete
      (3L, 1L, "D", 0.0),   // delete then re-insert: latest is the upsert
      (3L, 2L, "U", 33.0),
      (9L, 1L, "U", 90.0))  // key not in base → insert
      .toDF("k", "ver", "op", "v")
    val out = graft.operators.Merge(base, changes,
      keyCols = Seq("k"), versionCols = Seq("ver"), opCol = "op",
      payloadCols = Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 12.0, 3L -> 33.0, 9L -> 90.0))
  }

  test("merge honors a null payload in an upsert (op drives it, not coalesce)") {
    val base = Seq((1L, Some(10.0))).toDF("k", "v")
    val changes = Seq((1L, 1L, "U", Option.empty[Double])).toDF("k", "ver", "op", "v")
    val rows = graft.operators.Merge(base, changes, Seq("k"), Seq("ver"), "op", Seq("v"))
      .collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L && rows(0).isNullAt(1))
  }

  test("bloom prune keeps every true match and actually prunes the big side") {
    val small = (0L until 100L).map(k => k * 10).toDF("k")       // 100 of 1000 keys
    val big = (0L until 1000L).map(k => (k, k % 7)).toDF("bk", "payload")
    val pruned = graft.operators.BloomPrune
      .pruneByBloom(big, "bk", small, "k", expectedItems = 100L, fpp = 0.01)
    val keptKeys = pruned.select("bk").collect().map(_.getLong(0)).toSet
    // no false negatives: every real key survives the prune
    assert((0L until 100L).map(_ * 10).forall(keptKeys.contains))
    // and the prune is real: ≤ 100 true + ~1% fpp of the 900 others
    assert(keptKeys.size <= 130, s"kept ${keptKeys.size} of 1000")
    // null keys never match
    val withNull = big.select(when(col("bk") < 0, col("bk")).as("bk"))
    val prunedNull = graft.operators.BloomPrune
      .pruneByBloom(withNull, "bk", small, "k", expectedItems = 100L, fpp = 0.01)
    assert(prunedNull.count() == 0L)
  }

  test("overlap join equals the naive overlap join, exactly once per pair") {
    // spans engineered to cross multiple grid buckets (g = 10), share several
    // buckets per pair (dup hazard), touch bucket boundaries, and include an
    // empty interval that must never match
    val l = Seq((1L, 0L, 35L, "l0"), (1L, 5L, 12L, "l1"), (1L, 40L, 41L, "l2"),
      (2L, 0L, 100L, "l3"), (1L, 7L, 7L, "l4"), (1L, 10L, 20L, "l5"))
      .toDF("k", "s", "e", "lid")
    val r = Seq((1L, 30L, 50L, "r0"), (1L, 0L, 100L, "r1"), (1L, 12L, 13L, "r2"),
      (2L, 99L, 300L, "r3"), (3L, 0L, 10L, "r4"), (1L, 20L, 30L, "r5"))
      .toDF("k", "s", "e", "rid")
    val got = graft.operators.RangeJoin
      .joinOverlap(l, r, "k", "s", "e", "s", "e", granularity = 10L)
      .select("lid", "rid").collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq.sorted
    // the textbook predicate alone would "match" the empty [7,7) interval
    // (7 < 100 && 0 < 7); non-emptiness is part of overlap semantics
    val naive = l.as("a").join(r.as("b"),
      col("a.k") === col("b.k") && col("a.s") < col("b.e") && col("b.s") < col("a.e") &&
        col("a.s") < col("a.e") && col("b.s") < col("b.e"))
      .select(col("lid"), col("rid")).collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq.sorted
    assert(naive.nonEmpty && got == naive)
    assert(got.distinct.size == got.size) // no bucket-duplicated pairs
  }

  test("top-k aggregate is split-invariant (merge law)") {
    val agg = new graft.operators.TopKAgg(5)
    val rnd = new scala.util.Random(42)
    val items = Seq.fill(200)((rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val expected = items.sortBy(t => (-t._1, t._2)).take(5)
      .map(t => graft.operators.TopKItem(t._1, t._2))
    def fold(xs: Seq[(Long, Long)]) = xs.foldLeft(agg.zero)(agg.reduce)
    for (_ <- 1 to 10) {
      val shuffled = rnd.shuffle(items)
      val (a, b) = shuffled.splitAt(rnd.nextInt(items.size - 1) + 1)
      assert(agg.finish(agg.merge(fold(a), fold(b))) == expected)
    }
  }

  test("exact group quantile matches the sorted-sequence definition") {
    // duplicated values, uneven group sizes, a null to exclude
    val rows = Seq(
      ("a", Some(5L)), ("a", Some(1L)), ("a", Some(3L)), ("a", Some(3L)),
      ("a", Some(9L)), ("a", None),
      ("b", Some(7L)), ("b", Some(2L)),
      ("c", Some(4L)))
    val df = rows.toDF("g", "v")
    def expected(q: Double): Map[String, (Long, Long)] =
      rows.collect { case (g, Some(v)) => g -> v }
        .groupMap(_._1)(_._2).map { case (g, vs) =>
          val sorted = vs.sorted
          // quantile_disc rank: max(ceil(q·n), 1), here 0-based
          val k = math.max(math.ceil(q * sorted.length).toInt, 1) - 1
          g -> (sorted(k), sorted.length.toLong)
        }
    for (q <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val got = graft.operators.ExactQuantile.groupQuantileDisc(df, Seq("g"), "v", q)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expected(q), s"q=$q")
    }
  }

  test("skyline: window formulation equals brute-force dominance; front is a staircase") {
    val rows = graft.analytics.Relational.skylineParts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // brute-force dominance check over the full per-part relation
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sfDir, "lineitem")
    val pp = li.groupBy(col("l_partkey"))
      .agg(min(floor(col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")).as("c"),
        sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.foreach { case (_, c, q) =>
      assert(!pp.exists(o => o._1 <= c && o._2 >= q && (o._1 < c || o._2 > q)),
        s"($c, $q) is dominated")
    }
    // staircase law: sorted by cost asc, demand strictly increases (else dominated)
    val sorted = rows.sortBy(_._2)
    assert(sorted.sliding(2).forall {
      case Array(a, b) => a._2 < b._2 && a._3 < b._3
      case _           => true
    })
  }

  test("hopping windows: every event lands in exactly win/slide aligned windows") {
    import org.apache.spark.sql.functions.col
    val rows = graft.analytics.Relational.hoppingWindowAgg(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ev = Tables.load(spark, sfDir, "events")
    val nEvents = ev.count()
    // multiplicity law: 1h window / 15m slide = 4 windows per event
    assert(rows.map(_._2).sum == 4 * nEvents)
    // all window starts are epoch-aligned to the slide
    assert(rows.forall(_._1 % 900000000L == 0L))
    // cross-check one concrete window against a direct range count
    val (ws, n, _) = rows.maxBy(_._2)
    val direct = ev.where(
      org.apache.spark.sql.functions.unix_micros(col("ts")).between(ws, ws + 3600000000L - 1)).count()
    assert(n == direct, s"window at $ws")
  }

  test("asof_nearest: directions partition purchases and match a naive nearest scan") {
    import org.apache.spark.sql.functions.col
    val rows = graft.analytics.Relational.asofNearest(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val W = graft.analytics.Relational.NearestWinS * 1000000L
    var nb = 0L; var nf = 0L; var nn = 0L; var sb = 0L; var sf = 0L
    ev.groupBy(_._1).values.foreach { es =>
      val sorted = es.toSeq.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.foreach { case (e, i) =>
        if (e._4 == "purchase") {
          val prevV = sorted.take(i).reverse.find(_._4 == "view").map(v => e._2 - v._2)
          val nextV = sorted.drop(i + 1).find(_._4 == "view").map(v => v._2 - e._2)
          (prevV, nextV) match {
            case (Some(b), f) if b <= W && (f.isEmpty || b <= f.get || f.get > W) =>
              nb += 1; sb += b / 1000000L
            case (_, Some(f)) if f <= W => nf += 1; sf += f / 1000000L
            case _ => nn += 1
          }
        }
      }
    }
    assert(rows.getOrElse("backward", (0L, 0L, 0L))._1 == nb)
    assert(rows.getOrElse("forward", (0L, 0L, 0L))._1 == nf)
    assert(rows.getOrElse("none", (0L, 0L, 0L))._1 == nn)
    assert(rows.getOrElse("backward", (0L, 0L, 0L))._2 == sb)
    assert(rows.getOrElse("forward", (0L, 0L, 0L))._2 == sf)
  }
}
