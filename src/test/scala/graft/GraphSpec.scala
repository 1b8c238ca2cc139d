package graft

import graft.analytics.Graph
import org.apache.spark.sql.functions._

/** Laws for the graph pack beyond the DuckDB hash gate: mass bounds for the
  * fixed-point PageRank, orientation-invariance of the triangle census
  * (degree-ordered count == naive id-ordered count), and BFS frontier
  * sanity.
  */
class GraphSpec extends SparkSpec {

  test("pagerank: fixed-point mass stays within [base, init] bounds and ranks are 1..20") {
    val rows = Graph.pagerank(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_.getLong(3)).sorted.sameElements(1L to rows.length))
    // floor-division only ever LOSES mass: every rank sits between the
    // undamped base and total initial mass
    rows.foreach { r =>
      val pr = r.getLong(2)
      assert(pr >= Graph.PrBase, s"rank below additive base: $pr")
    }
    // top node outranks (or equals) every other emitted node
    assert(rows.map(_.getLong(2)).max == rows.find(_.getLong(3) == 1L).get.getLong(2))
  }

  test("triangle census: degree-ordered orientation count equals the naive a<b<c count") {
    val st = Graph.triangles(spark, sfDir).collect()(0)
    val nNodes = st.getAs[Long]("n_nodes")
    val nTris  = st.getAs[Long]("n_triangles")
    val wedges = st.getAs[Long]("n_wedges")

    // naive recount in Spark: id-ordered edge triple join
    val op = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = op.as("a").join(op.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("x"), col("b.p").as("y"))
      .agg(count(lit(1)).as("w")).where(col("w") >= Graph.MinCoOrders)
      .select("x", "y").cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.x") === col("e1.y"))
      .join(e.as("e3"), col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .count()
    assert(nTris == naive, s"oriented=$nTris naive=$naive")
    assert(wedges >= 3 * nTris, "every triangle contains exactly 3 wedges")
    assert(nNodes > 0)
  }

  test("personalized pagerank: only suppliers emitted, scores positive, seeds drive mass") {
    val rows = Graph.pprRecs(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length))
    rows.foreach(r => assert(r.getLong(1) > 0, "personalized score must be positive"))
    // a supplier's personalized score can exceed the global-walk base only
    // via seed-sourced flow; sanity: top supplier beats the bare base
    assert(rows.head.getLong(1) > 0)
  }

  test("equi-depth histogram: buckets partition each group's rows and extrema nest") {
    val rows = graft.analytics.Relational.histogramEquidepth(spark, sfDir).collect()
    val byFlag = rows.groupBy(_.getString(0))
    val li = Tables.load(spark, sfDir, "lineitem")
      .where(col("l_extendedprice").isNotNull)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byFlag.foreach { case (f, bs) =>
      assert(bs.map(_.getLong(2)).sum == li(f), s"bucket counts must sum to group rows for $f")
      assert(bs.map(_.getLong(1)).distinct.length == bs.length, "bucket ids unique")
      // buckets ordered by id have non-overlapping [lo, hi] ranges
      val sorted = bs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
          s"$f: bucket ${a.getLong(1)} hi must precede bucket ${b.getLong(1)} lo")
        case _ =>
      }
    }
  }

  test("reach: hop-0 equals the seed set; hop counts cover distinct nodes exactly once") {
    val rows = Graph.reach(spark, sfDir).collect()
    val byHop = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seed set from the SAME relation the engine builds edges from (orders
    // JOIN lineitem): a customer whose orders carry no lineitems is not in
    // the purchase graph and must not be counted as a seed
    val seeds = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .where(col("o_custkey") < 10).select("o_custkey").distinct().count()
    assert(byHop(0L) == seeds, s"hop0=${byHop(0L)} seeds=$seeds")
    assert(byHop.keys.max <= Graph.ReachHops)
    // levels partition the reached set: re-running yields identical counts
    val again = Graph.reach(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == byHop)
  }

  test("assortativity: coefficient replays a driver-side Pearson over directed edge copies") {
    val r = Graph.assortativity(spark, sfDir).collect().head
    val (n, rE6) = (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
    // driver twin: co-purchase edges at the same threshold
    val op = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairs = op.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= Graph.MinCoOrders).keys.toSeq
    val und = pairs ++ pairs.map(_.swap)
    val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(n == und.size.toLong)
    if (und.nonEmpty) {
      val (xs, ys) = und.map { case (a, b) => (deg(a), deg(b)) }.unzip
      val nn = und.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val (dx, dy) = (nn * sxx - sx * sx, nn * syy - sy * sy)
      if (dx > 0 && dy > 0) {
        val expect = math.floor(
          (nn * sxy - sx * sy).toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
            * 1000000).toLong
        assert(rE6.contains(expect))
        assert(math.abs(expect) <= 1000000L, "a Pearson coefficient stays in [-1, 1]")
      } else assert(rE6.isEmpty)
    }
  }

  test("harmonic centrality: replays a driver-side BFS over the collected edge list") {
    val rows = Graph.harmonic(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    // driver twin: adjacency from the same orders⋈lineitem relation
    val adj = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (adj ++ adj.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.keys.foreach { seed =>
      var visited = Map(seed -> 0L)
      var frontier = Set(seed)
      for (h <- 1 to Graph.ReachHops) {
        val next = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty)) -- visited.keySet
        visited ++= next.map(_ -> h.toLong)
        frontier = next
      }
      val reached = visited.filter(_._2 > 0)
      val harm = reached.values.map(1000000L / _).sum
      val ecc = if (reached.isEmpty) 0L else reached.values.max
      assert(rows(seed) == ((reached.size.toLong, harm, ecc)), s"seed $seed")
    }
  }

  test("link prediction: only non-edges, deg>=2 voters bound RA, ranks contiguous") {
    val rows = Graph.linkPrediction(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Graph.LpK)
    assert(rows.map(_.getLong(4)).sorted.sameElements(1L to rows.length))
    val op = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = op.as("a").join(op.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("x"), col("b.p").as("y"))
      .agg(count(lit(1)).as("w")).where(col("w") >= Graph.MinCoOrders)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(pair._1 < pair._2, "canonical pair order")
      assert(!edges(pair), s"predicted an EXISTING edge $pair")
      val (nCommon, ra) = (r.getLong(2), r.getLong(3))
      assert(nCommon >= 1 && ra > 0)
      // every common neighbor is linked to both endpoints, so deg >= 2 and
      // each vote is at most 1e6 div 2
      assert(ra <= nCommon * 500000L, "RA vote exceeds the deg>=2 bound")
    }
  }

  test("kcore: trajectory matches an independent in-memory peel, monotone shrink") {
    val rows = Graph.kcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == (0L to Graph.KcoreRounds).toSet)
    // monotone: peeling only ever shrinks nodes and edges
    (1L to Graph.KcoreRounds).foreach { t =>
      assert(rows(t)._1 <= rows(t - 1)._1 && rows(t)._2 <= rows(t - 1)._2)
    }
    // independent recompute: collect the (small at sf0.001) undirected edge
    // list and peel with plain Scala sets
    val op = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    var edges = op.as("a").join(op.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("x"), col("b.p").as("y"))
      .agg(count(lit(1)).as("w")).where(col("w") >= Graph.MinCoOrders)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def nodes(es: Set[(Long, Long)]) = es.flatMap(e => Set(e._1, e._2))
    assert(rows(0L) == ((nodes(edges).size.toLong, edges.size.toLong)))
    (1 to Graph.KcoreRounds).foreach { t =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val surv = deg.filter(_._2 >= Graph.KcoreK).keySet
      edges = edges.filter(e => surv(e._1) && surv(e._2))
      assert(rows(t.toLong) == ((surv.size.toLong, edges.size.toLong)),
        s"round $t diverges from the in-memory peel")
    }
  }

  test("lpa: communities match an independent in-memory synchronous propagation") {
    val got = Graph.lpa(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._5).toSeq == (1L to got.length).toSeq, "ranks must be contiguous")
    // independent recompute at sf0.001 scale: plain-Scala synchronous LPA
    // with the same (count desc, label asc) tie-break
    val op = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = op.as("a").join(op.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("x"), col("b.p").as("y"))
      .agg(count(lit(1)).as("w")).where(col("w") >= Graph.MinCoOrders)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = (e ++ e.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = und.keys.map(n => n -> n).toMap
    (1 to Graph.LpaRounds).foreach { _ =>
      lbl = und.map { case (n, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity).view.mapValues(_.size)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val want = lbl.toSeq.groupBy(_._2).map { case (c, ms) =>
      (c, ms.size.toLong, ms.map(_._1).sum, ms.map(_._1).min)
    }.toSeq.sortBy { case (c, n, _, _) => (-n, c) }.take(Graph.LpaTopK)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == want,
      s"LPA diverged from the in-memory propagation:\n got ${got.toSeq}\nwant $want")
  }

  test("sssp distances: seeds at 0, bounded by hops x max weight, dominated by hop counts") {
    import org.apache.spark.sql.functions._
    val byDist = Graph.sssp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .where(col("o_custkey") < 10).select("o_custkey").distinct().count()
    assert(byDist(0L) == seeds)
    assert(byDist.keys.max <= Graph.SsspHops * 9L, "distances bounded by hops x max weight")
    // every node the unweighted BFS reaches in <= hops is also reached here
    val reached = Graph.reach(spark, sfDir).collect().map(_.getLong(1)).sum
    assert(byDist.values.sum == reached,
      "sssp and BFS must reach the same node set at equal hop bounds")
  }

  test("degree profile: degrees non-increasing down the rank probes, shares consistent") {
    val rows = Graph.degreeProfile(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.head._1 == 1L)
    val byRank = rows.toSeq.sortBy(_._1)
    byRank.sliding(2).foreach {
      case scala.collection.Seq(a, b) =>
        assert(b._2 <= a._2, s"degree must fall with rank: $a -> $b")
      case _ =>
    }
    // rank-1 degree IS the max degree, so its share replays
    val (n1deg, halfedges) = (byRank.head._2, byRank.head._5)
    rows.foreach { case (_, _, growth, _, _) =>
      growth.foreach(g => assert(g >= 0 && g <= 1000000L,
        s"halving ratio must sit in [0, 1e6]: $g"))
    }
    assert(n1deg <= halfedges)
  }
}
