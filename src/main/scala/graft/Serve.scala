package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** Resident SQL serving endpoint — the engine's analogue of the reference's
  * always-on dashboard path (Grafana polling ClickHouse over HTTP,
  * `/root/reference/compose.yaml:16-28`, store exposed at `compose.yaml:11`):
  * a HiveServer2 Thrift/JDBC endpoint over the registered tables plus the
  * four §2 analyses as views, so any JDBC client (beeline, Grafana's
  * Hive-compatible data source, BI tools) can poll the same relations the
  * batch CLI computes — continuously, without spawning a JVM per query.
  *
  * Views are registered in the GLOBAL temp catalog (`global_temp.<name>`):
  * every JDBC connection opens its own Spark session, and global temp views
  * are the cross-session catalog that does not depend on the
  * `thriftServer.singleSession` static conf (which cannot be applied to an
  * already-running session). The CLI additionally sets singleSession so
  * plain unqualified names work from beeline.
  *
  * Scale notes: the server plans each JDBC statement through the shared
  * SparkContext — Catalyst + AQE + the cluster's full parallelism, identical
  * to batch execution; the endpoint itself holds no data. Analysis views are
  * lazy logical plans (re-planned and re-executed per poll, the Grafana
  * refresh model); result caching is the dashboard layer's job.
  *
  * Base tables serve from the TABLE LOG when one is committed
  * (`tableLogRoot/<table>` with ≥1 version): the served view is then a
  * snapshot-isolated [[graft.sources.TableLog.read]] — it composes with
  * commits, OPTIMIZE and time travel (re-register after a commit to follow
  * the log head; concurrent commits can never tear an in-flight JDBC scan).
  * Raw parquet under `dir` is the fallback for tables nobody has committed.
  */
object Serve {

  /** The four declared analyses of the reference's main loop
    * (`from_parser_to_rabbitmq.py:228-240`) — the relations its Grafana
    * dashboards exist to chart, served here as `global_temp.q_<name>`.
    */
  /** default served views: the four reference analyses (the Grafana role,
    * SURVEY §2.5) plus the dashboard-grade monitors a BI client charts
    * directly — weekly actives, seasonality, concentration, fulfillment
    * SLAs. All are bounded-row summaries, safe to recompute per register.
    */
  val AnalysisViews: Seq[String] =
    Seq("a1_volatility", "a2_trade_impact", "a3_predictability", "a4_imbalance",
      "bitmap_distinct_weekly", "ts_seasonality", "gini_spend", "fulfillment_lag",
      // growth/commerce dashboard row: daily rolling actives, the decayed
      // trending leaderboard, backtested forecast quality, and the A/B
      // experiment readout — every one a bounded-row summary
      "rolling_wau", "trending_decay", "ts_backtest", "ab_quantile_effect")

  /** Register base tables and analysis views into the global temp catalog.
    * A table with a committed table-log under `tableLogRoot` serves that
    * log's LATEST snapshot; others fall back to `dir`'s raw parquet.
    */
  def registerViews(spark: SparkSession, dir: String,
                    queries: Seq[String] = AnalysisViews,
                    tableLogRoot: Option[String] = None,
                    matViewPaths: Seq[String] = Nil): Unit = {
    // dashboard aggregates route to maintained rollups: the conf reaches
    // every JDBC child session via the context conf (same rule as the
    // catalog registration below); the REWRITE RULE itself reaches them
    // through SparkSessionExtensions inheritance — newSession() children
    // carry the parent's extensions object, and the serve CLI session is
    // built withExtensions(GraftExtensions). A session without the rule
    // just ignores the conf (correct, unrouted plans).
    if (matViewPaths.nonEmpty) {
      val v = matViewPaths.mkString(",")
      spark.conf.set("spark.graft.matview.paths", v)
      org.apache.spark.sql.graftx.ContextConf.set(spark.sparkContext,
        "spark.graft.matview.paths", v)
    }
    // the SQL face of the log: with a log root, JDBC clients also get the
    // graft catalog — `SELECT ... FROM graft.<table> [VERSION AS OF n]`,
    // metadata-only count(*), snapshot isolation — next to the view layer
    tableLogRoot.foreach { r =>
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.root", r)
      // JDBC connections get FRESH sessions (newSession(), not clones):
      // their SQLConf initializes from the SparkContext conf, so the
      // catalog registration must live there too to reach them
      org.apache.spark.sql.graftx.ContextConf.set(spark.sparkContext,
        "spark.sql.catalog.graft", classOf[graft.sources.GraftCatalog].getName)
      org.apache.spark.sql.graftx.ContextConf.set(spark.sparkContext,
        "spark.sql.catalog.graft.root", r)
    }
    Tables.All.foreach { t =>
      tableLogRoot.map(r => s"$r/$t")
        .filter(p => graft.sources.TableLog.versions(p).nonEmpty) match {
        case Some(logged) =>
          graft.sources.TableLog.read(spark, logged).createOrReplaceGlobalTempView(t)
        case None =>
          if (new java.io.File(s"$dir/$t.parquet").exists())
            Tables.load(spark, dir, t).createOrReplaceGlobalTempView(t)
      }
    }
    queries.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        fn(spark, dir).createOrReplaceGlobalTempView(s"q_$name")
      }
    }
  }

  /** Start the Thrift endpoint on `port` over `dir`'s tables. Returns the
    * server; callers own its lifecycle (`stop()`). Declared as the public
    * HiveServer2 ancestor — Spark's HiveThriftServer2 class itself is
    * `private[hive]` (only its companion is public API).
    */
  def start(spark: SparkSession, dir: String, port: Int,
            tableLogRoot: Option[String] = None): org.apache.hive.service.server.HiveServer2 = {
    registerViews(spark, dir, tableLogRoot = tableLogRoot)
    // the server reads its port from the session's hadoop conf at init
    spark.sparkContext.hadoopConfiguration.set("hive.server2.thrift.port", port.toString)
    spark.sparkContext.hadoopConfiguration.set("hive.server2.thrift.bind.host", "localhost")
    HiveThriftServer2.startWithContext(spark.sqlContext)
  }

  /** Block until `port` accepts TCP connections (the HiveServer2 services
    * start asynchronously after init), up to `timeoutMs`.
    */
  def awaitPort(port: Int, timeoutMs: Long = 60000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      try {
        val s = new java.net.Socket()
        try { s.connect(new java.net.InetSocketAddress("localhost", port), 1000); return true }
        finally s.close()
      } catch { case _: java.io.IOException => Thread.sleep(250) }
    }
    false
  }
}
