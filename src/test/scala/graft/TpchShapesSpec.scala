package graft

import graft.analytics.TpchShapes
import org.apache.spark.sql.functions._

/** Semantics + plan-shape pins for the adapted TPC-H query pack.
  * Values are cross-checked against independent naive recomputes at
  * sf0.001; plan shapes assert the join strategies the 100 TB notes in
  * TpchShapes.scala promise (semi/anti rewrites, broadcast dims).
  */
class TpchShapesSpec extends SparkSpec {

  test("q4: EXISTS plans as a left-semi join and matches a distinct-key recompute") {
    val df = TpchShapes.orderPriority(spark, sfDir)
    assert(df.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "EXISTS must rewrite to a semi join, not a distinct+inner join")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ord = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_shipdate")
    val expect = ord.join(li, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q6: all three predicates reach the scan and the sum matches a recompute") {
    val df = TpchShapes.forecastRevenue(spark, sfDir)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val filters = scans.head.dataFilters.map(_.toString).mkString(" ")
    assert(filters.contains("l_shipdate") && filters.contains("l_discount") &&
      filters.contains("l_quantity"),
      s"every q6 predicate must push to the lineitem scan, got: $filters")
    val got = df.collect()(0)
    val li = Tables.load(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .collect()
      .filter { r =>
        val disc = r.getAs[Double]("l_discount"); val qty = r.getAs[Double]("l_quantity")
        disc >= 0.05 && disc <= 0.07 && qty < 24
      }
    val rev = got.getDouble(0)
    assert(got.getLong(1) == li.length)
    val expect = li.map(r => BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(2) *
      BigDecimal(r.getAs[Double]("l_discount")).setScale(2)).sum.toDouble
    assert(rev == expect)
  }

  test("q8: one fact shuffle, every dim broadcast; share matches a per-year recompute") {
    val df = TpchShapes.marketShare(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val bcasts = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    val shuffled = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(bcasts.length >= 5, s"expected >=5 broadcast dims, got ${bcasts.length}")
    assert(shuffled.length <= 1,
      s"only the orders join may shuffle the fact, got ${shuffled.length}")
    // a year with no NATION_7 revenue legitimately carries a NULL share
    // (at sf0.001 the 10-supplier sample may miss the nation entirely)
    val rows = df.collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getDouble(2)))
      .toMap
    assert(rows.nonEmpty)
    // independent recompute of one year via plain SQL over temp views
    Seq("lineitem", "part", "orders", "customer", "nation", "supplier", "region")
      .foreach(t => Tables.load(spark, sfDir, t).createOrReplaceTempView(s"m_$t"))
    val y = rows.filter(_._2._1.isDefined).keys.minOption.getOrElse(rows.keys.min)
    val exp = spark.sql(
      s"""SELECT CAST(sum(CASE WHEN sn.n_name = 'NATION_7'
         |  THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(18,4)) END) AS DOUBLE) AS nrev,
         | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(18,4))) AS DOUBLE) AS trev
         |FROM m_lineitem JOIN m_part ON l_partkey = p_partkey
         |JOIN m_orders ON l_orderkey = o_orderkey
         |JOIN m_customer ON o_custkey = c_custkey
         |JOIN m_nation cn ON c_nationkey = cn.n_nationkey
         |JOIN m_region ON cn.n_regionkey = r_regionkey
         |JOIN m_supplier ON l_suppkey = s_suppkey
         |JOIN m_nation sn ON s_nationkey = sn.n_nationkey
         |WHERE p_type = 'PROMO' AND r_name = 'ASIA' AND year(o_orderdate) = $y""".stripMargin)
      .collect()(0)
    assert(rows(y)._2 == exp.getDouble(1), "total revenue must match the recompute")
    assert(rows(y)._1 == (if (exp.isNullAt(0)) None else Some(exp.getDouble(0))),
      "nation revenue must match the recompute")
  }

  test("q13: histogram covers every customer exactly once, including zero-order ones") {
    val rows = TpchShapes.orderCountDistribution(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables.load(spark, sfDir, "customer").count()
    assert(total == nCust, "distribution must partition the customer set")
    val zeros = rows.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    val ordered = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_custkey").distinct().count()
    assert(zeros == nCust - ordered,
      "outer join must preserve customers with no qualifying orders")
  }

  test("q15: winners carry exactly the global max revenue; dims broadcast") {
    val df = TpchShapes.topSupplier(spark, sfDir)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "1-row max and supplier dim must broadcast")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val li = Tables.load(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val best = li.groupBy("l_suppkey")
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
        .cast("decimal(18,4)")).cast("double").as("rev"))
      .agg(max("rev")).collect()(0).getDouble(0)
    rows.foreach(r => assert(r.getDouble(2) == best))
  }

  test("q17: per-part threshold classifies lines like a window recompute") {
    val got = TpchShapes.smallQtyRevenue(spark, sfDir).collect()(0)
    val part = Tables.load(spark, sfDir, "part")
      .where(col("p_brand") === "Brand#23" && col("p_size") <= 10)
      .select("p_partkey")
    val li = Tables.load(spark, sfDir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val thr = li.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2).sum / (xs.length * 5)
    }
    val nSmall = li.count { case (k, q) => q < thr(k) }
    assert(got.getLong(1) == nSmall)
  }

  test("q21: both self-join legs plan as semi/anti on the order key") {
    val df = TpchShapes.waitingSuppliers(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftSemi") && opt.contains("LeftAnti"),
      "the other-supplier EXISTS / no-other-late NOT EXISTS must stay semi/anti")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // naive SQL recompute via EXISTS over temp views
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("t_li")
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("t_ord")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("t_supp")
    val expect = spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM t_supp JOIN t_li l1 ON s_suppkey = l1.l_suppkey
        |JOIN t_ord ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAYS
        |  AND EXISTS (SELECT 1 FROM t_li l2 WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM t_li l3 WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey
        |                  AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAYS)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(r => (r.getString(0), r.getLong(1))).sameElements(expect))
  }

  test("q22: threshold uses the exact-decimal mean and anti join drops active customers") {
    val rows = TpchShapes.idleRichCustomers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cust = Tables.load(spark, sfDir, "customer").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getInt(2)))
    val pos = cust.filter(_._2 > 0).map(c => BigDecimal(c._2).setScale(2))
    val ab = (pos.sum.toDouble) / pos.length
    val active = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expectCnt = cust.count(c => c._2 > ab && !active(c._1))
    assert(rows.map(_.getLong(1)).sum == expectCnt)
  }

  // ---- derived-partsupp shapes (q2/q9/q11/q16/q20) ----------------------

  /** Brute-force derived partsupp off a lineitem collect: (partkey, suppkey)
    * -> (min 2dp price, total qty). Mirrors TpchShapes.partsupp exactly.
    */
  private def naivePs(): Map[(Long, Long), (BigDecimal, Long)] =
    Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) =>
        k -> (rs.map(r => BigDecimal(r.getDouble(2)).setScale(2)).min,
          rs.map(_.getDouble(3).toLong).sum)
      }

  private def euroSuppliers(): Map[Long, String] = {
    val eurKeys = Tables.load(spark, sfDir, "nation")
      .join(Tables.load(spark, sfDir, "region")
        .where(col("r_name") === "EUROPE"), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    Tables.load(spark, sfDir, "supplier").collect()
      .flatMap(r => eurKeys.get(r.getInt(2)).map(n => r.getLong(0) -> n)).toMap
  }

  test("q2: every winner carries its part's true min cost; dims broadcast, no SMJ") {
    val df = TpchShapes.minCostSupplier(spark, sfDir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("SortMergeJoin"), "q2 must broadcast every join side")
    val eligibleParts = Tables.load(spark, sfDir, "part")
      .where(col("p_type") === "ECONOMY" && col("p_size") <= 15)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val eur = euroSuppliers().keySet
    val ps = naivePs().filter { case ((pk, sk), _) => eligibleParts(pk) && eur(sk) }
    val minCost = ps.groupBy(_._1._1).map { case (pk, m) => pk -> m.values.map(_._1).min }
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(BigDecimal(r.getDouble(5)) == BigDecimal(minCost(r.getLong(0)).toDouble))
    }
    // one winner row per qualifying (part, min-cost supplier) pair
    val expect = ps.count { case ((pk, _), (c, _)) => c == minCost(pk) }
    assert(rows.length == expect)
  }

  test("q9: nation-year profit matches an exact BigDecimal recompute") {
    val ps = naivePs()
    val redParts = Tables.load(spark, sfDir, "part")
      .where(col("p_name").like("small%") || col("p_name").like("red%"))
      .collect().filter(_.getString(1).startsWith("red")).map(_.getLong(0)).toSet
    val suppNation = Tables.load(spark, sfDir, "supplier")
      .join(Tables.load(spark, sfDir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_shipdate").collect()
      .filter(r => redParts(r.getLong(0)))
      .groupBy(r => (suppNation(r.getLong(1)),
        r.getAs[java.time.LocalDateTime](5).getYear))
      .map { case (k, rs) =>
        k -> rs.map { r =>
          val price = BigDecimal(r.getDouble(2)).setScale(2)
          val disc = BigDecimal(r.getDouble(3)).setScale(2)
          val cost = ps((r.getLong(0), r.getLong(1)))._1
          val qty = BigDecimal(r.getDouble(4)).setScale(2)
          ((price * (1 - disc)) - cost * qty).setScale(4) * 10000
        }.map(_.toLong).sum
      }
    val got = TpchShapes.productProfit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("q11: returned parts are exactly those above 1/10000 of the regional total") {
    val eur = euroSuppliers().keySet
    val vals = naivePs().toSeq.collect { case ((pk, sk), (c, q)) if eur(sk) =>
      pk -> (c * 100).toLong * q
    }.groupBy(_._1).map { case (pk, vs) => pk -> vs.map(_._2).sum }
    val total = vals.values.sum
    val expect = vals.filter(_._2 * 10000L > total)
    val got = TpchShapes.importantStock(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q16: distinct supplier counts match and plan has no Expand") {
    val df = TpchShapes.supplierPartCount(spark, sfDir)
    assert(!df.queryExecution.sparkPlan.toString.contains("Expand"),
      "single distinct agg must plan as two-level HashAggregate, not Expand")
    val sizes = Set(1, 4, 7, 11, 14, 19, 23, 36)
    val partInfo = Tables.load(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
      .toMap
    val badSupp = Tables.load(spark, sfDir, "supplier")
      .where(col("s_acctbal") < 0).collect().map(_.getLong(0)).toSet
    val expect = naivePs().keys.toSeq
      .filter { case (pk, sk) =>
        val (b, t, z) = partInfo(pk)
        b != "Brand#23" && t != "PROMO" && sizes(z) && !badSupp(sk)
      }
      .groupBy { case (pk, _) => partInfo(pk) }
      .map { case (k, pairs) => k -> pairs.map(_._2).distinct.size.toLong }
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == expect)
  }

  test("q20: qualifying suppliers hold over twice their 1997 'small'-part shipments") {
    val smallParts = Tables.load(spark, sfDir, "part")
      .where(col("p_name").like("small%")).collect().map(_.getLong(0)).toSet
    val li97 = Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate").collect()
      .filter { r =>
        smallParts(r.getLong(0)) &&
          r.getAs[java.time.LocalDateTime](3).getYear == 1997
      }
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2).toLong).sum }
    val ps = naivePs()
    val expectSupp = li97.collect {
      case ((pk, sk), q97) if ps((pk, sk))._2 > 2 * q97 => sk
    }.toSet
    val suppName = Tables.load(spark, sfDir, "supplier").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TpchShapes.excessStockSuppliers(spark, sfDir).collect()
      .map(_.getString(0)).toSet
    assert(got == expectSupp.map(suppName))
  }
}
