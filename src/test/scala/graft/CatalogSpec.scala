package graft

import graft.sources.TableLog
import org.apache.spark.sql.functions._

/** Pins the DSv2 `GraftCatalog` contract: SQL reads over table logs equal
  * the API reads (latest, VERSION AS OF, TIMESTAMP AS OF, DV merge-on-read),
  * `count(*)` takes the zero-data-file metadata path, scans report
  * metadata-exact statistics, and the catalog is read-only.
  */
class CatalogSpec extends SparkSpec {

  private val root = "/tmp/graft_test_catalog"

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rm)
    f.delete(); ()
  }

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.graftcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat.root", root)
  }

  test("SQL snapshot, VERSION AS OF and TIMESTAMP AS OF equal the API reads") {
    rm(new java.io.File(root))
    val t = s"$root/orders_c"
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    TableLog.commitAppend(orders, t)                                   // v0
    TableLog.deleteWhere(spark, t, "o_orderkey % 10 = 3")              // v1 (DV)
    TableLog.commitAppend(orders.where("o_orderkey % 10 = 3"), t)      // v2
    register()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // latest snapshot through SQL == API read (DV'd files subtracted)
    assert(rows(spark.sql("SELECT * FROM graftcat.orders_c")) ==
      rows(TableLog.read(spark, t)))
    // time travel by version
    for (v <- 0L to 2L)
      assert(rows(spark.sql(s"SELECT * FROM graftcat.orders_c VERSION AS OF $v")) ==
        rows(TableLog.read(spark, t, asOf = Some(v))), s"version $v diverged")
    // v1 really differs from v0 (the DV delete is visible through SQL)
    assert(spark.sql("SELECT * FROM graftcat.orders_c VERSION AS OF 1").count() <
      spark.sql("SELECT * FROM graftcat.orders_c VERSION AS OF 0").count())
    // timestamp travel: 'now' resolves to the head version
    assert(rows(spark.sql(
      "SELECT * FROM graftcat.orders_c TIMESTAMP AS OF current_timestamp()")) ==
      rows(TableLog.read(spark, t)))
    // column pruning + predicate through SQL
    val sk = spark.sql(
      "SELECT o_orderkey FROM graftcat.orders_c WHERE o_orderstatus = 'F'")
    assert(rows(sk) == rows(TableLog.read(spark, t)
      .where("o_orderstatus = 'F'").select("o_orderkey")))
    // tables list
    assert(spark.sql("SHOW TABLES IN graftcat").collect()
      .map(_.getString(1)).contains("orders_c"))
  }

  test("count(*) is answered from metadata: zero data files read, DV-exact") {
    rm(new java.io.File(root))
    val t = s"$root/cnt"
    TableLog.commitAppend(spark.range(0, 1000).selectExpr("id AS k"), t) // v0
    TableLog.deleteWhere(spark, t, "k % 7 = 0")                          // v1
    register()
    val df = spark.sql("SELECT count(*) AS n FROM graftcat.cnt")
    val expected = TableLog.read(spark, t).count()
    assert(df.collect().head.getLong(0) == expected && expected < 1000L)
    // the plan carries the metadata-count scan, not a file scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftMetadataCount"),
      s"count(*) should push to the metadata scan:\n$plan")
    assert(!plan.contains("GraftLogScan"), s"no data-file scan expected:\n$plan")
    // grouped/filtered counts correctly stay real scans
    val g = spark.sql("SELECT count(*) FROM graftcat.cnt WHERE k > 10")
    assert(g.queryExecution.executedPlan.toString.contains("GraftLogScan"))
    assert(g.collect().head.getLong(0) ==
      TableLog.read(spark, t).where("k > 10").count())
  }

  test("scan statistics are metadata-exact, so the small log table broadcasts") {
    rm(new java.io.File(root))
    val t = s"$root/dim"
    TableLog.commitAppend(
      spark.range(0, 50).selectExpr("id AS k", "concat('n', id) AS nm"), t)
    register()
    val fact = spark.range(0, 100000).selectExpr("id % 50 AS k", "id AS x")
    fact.createOrReplaceTempView("fact_v")
    val j = spark.sql(
      "SELECT f.k, count(*) AS c FROM fact_v f JOIN graftcat.dim d ON f.k = d.k GROUP BY f.k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 50-row log table with reported stats must broadcast:\n$plan")
    // and the decision FLIPS on the stats: a log table reported above the
    // broadcast threshold must not be broadcast (no blind hint — the same
    // cost decision Spark would get from a Delta table's stats)
    val big = s"$root/bigdim"
    TableLog.commitAppend(
      spark.range(0, 2000000).selectExpr("id AS k", "concat('n', id) AS nm")
        .repartition(4), big)
    val sz = spark.sql("SELECT count(*) FROM graftcat.bigdim").collect().head.getLong(0)
    assert(sz == 2000000L)
    // a fact side itself above the broadcast threshold, so the only way a
    // broadcast appears is the planner (wrongly) trusting a default guess
    // for the log side
    spark.range(0, 5000000).selectExpr("id % 50 AS k", "id AS x")
      .createOrReplaceTempView("bigfact_v")
    val j2 = spark.sql(
      "SELECT f.k, count(*) AS c FROM bigfact_v f JOIN graftcat.bigdim d ON f.k = d.k GROUP BY f.k")
    j2.collect()
    val plan2 = j2.queryExecution.executedPlan.toString
    assert(!plan2.contains("BroadcastHashJoin"),
      s"a beyond-threshold log table must NOT broadcast:\n$plan2")
    // identical rows through either join strategy
    assert(j.collect().map(_.toString).sorted.toSeq ==
      spark.sql("SELECT f.k, count(*) AS c FROM fact_v f JOIN graftcat.bigdim d ON f.k = d.k WHERE d.k < 50 GROUP BY f.k")
        .collect().map(_.toString).sorted.toSeq)
  }

  test("pushed filters skip files from the stats and bloom sidecars") {
    rm(new java.io.File(root))
    // range-clustered on k with a stats sidecar AND a bloom index
    val t = s"$root/skip"
    TableLog.commitAppend(
      spark.range(0, 8000).selectExpr("id AS k", "id % 13 AS vv")
        .repartitionByRange(8, col("k")),
      t, statCols = Seq("k"))
    TableLog.buildBloomIndex(spark, t, "k")
    register()
    def parts(df: org.apache.spark.sql.DataFrame): Int = df.rdd.getNumPartitions
    val eq = spark.sql("SELECT * FROM graftcat.skip WHERE k = 4321")
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(4321L))
    assert(parts(eq) <= 2, s"point lookup should skip to ~1 of 8 files, got ${parts(eq)}")
    val ge = spark.sql("SELECT count(*) AS c FROM graftcat.skip WHERE k >= 7000")
    assert(ge.collect().head.getLong(0) == 1000L)
    assert(parts(spark.sql("SELECT * FROM graftcat.skip WHERE k >= 7000")) <= 2)
    // un-indexed column: no skipping, full scan, exact answer
    val u = spark.sql("SELECT count(*) AS c FROM graftcat.skip WHERE vv = 5")
    assert(u.collect().head.getLong(0) ==
      TableLog.read(spark, t).where("vv = 5").count())
    assert(parts(spark.sql("SELECT * FROM graftcat.skip WHERE vv = 5")) == 8)

    // hash-clustered layout: min/max is useless, the BLOOM does the skipping
    val h = s"$root/skiph"
    TableLog.commitAppend(
      spark.range(0, 8000).selectExpr("id AS k").repartition(8, col("k")), h)
    TableLog.buildBloomIndex(spark, h, "k")
    val hq = spark.sql("SELECT * FROM graftcat.skiph WHERE k = 4321")
    assert(hq.collect().map(_.getLong(0)).toSeq == Seq(4321L))
    assert(parts(hq) < 8,
      s"bloom should skip most of a hash layout, got ${parts(hq)}/8")
    // IN list unions the per-value bloom keeps
    val in = spark.sql("SELECT * FROM graftcat.skiph WHERE k IN (11, 4321)")
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 4321L))
    assert(parts(in) < 8)
  }

  test("array columns are SQL-queryable through the catalog") {
    rm(new java.io.File(root))
    val t = s"$root/emb"
    TableLog.commitAppend(
      Tables.load(spark, sfDir, "embeddings"), t)
    register()
    val viaSql = spark.sql(
      "SELECT vec_id, size(embedding) AS d, " +
        "aggregate(embedding, CAST(0 AS LONG), " +
        "(a, x) -> a + CAST(floor(CAST(x AS DOUBLE) * 1000000) AS LONG)) AS s " +
        "FROM graftcat.emb")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val direct = TableLog.read(spark, t)
      .selectExpr("vec_id", "size(embedding) AS d",
        "aggregate(embedding, CAST(0 AS LONG), " +
          "(a, x) -> a + CAST(floor(CAST(x AS DOUBLE) * 1000000) AS LONG)) AS s")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaSql == direct && viaSql.nonEmpty,
      "catalog array reads must equal the parquet read element-for-element")
  }

  test("the catalog is read-only and absent tables fail cleanly") {
    rm(new java.io.File(root))
    val t = s"$root/ro"
    TableLog.commitAppend(spark.range(3).selectExpr("id AS k"), t)
    register()
    val e = intercept[Exception](
      spark.sql("INSERT INTO graftcat.ro VALUES (9)"))
    assert(e.getMessage.contains("read-only") ||
      e.getMessage.toLowerCase.contains("does not support"),
      s"unexpected write error: ${e.getMessage}")
    intercept[Exception](spark.sql("SELECT * FROM graftcat.nope").collect())
    // a version outside the committed set fails loudly
    intercept[Exception](
      spark.sql("SELECT * FROM graftcat.ro VERSION AS OF 99").collect())
  }
}
