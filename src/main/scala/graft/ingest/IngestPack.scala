package graft.ingest

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-verifiable ingest queries: the consumer pipeline (F1–F3, P2, P3,
  * P7, P8) driven end-to-end over the driver testdata. Messages are
  * synthesized deterministically from the TPC-H-ish tables (including
  * deliberately corrupted rows exercising every drop path), run through the
  * REAL `Normalize`/`Ingest` code, and the surviving rows are aggregated; the
  * DuckDB oracle computes the expected outcome directly from the source
  * tables — so a semantics drift in any gate flips the compare.
  */
object IngestPack extends QueryPack {

  /** Candle wire messages derived from lineitem. Two corruption channels:
    * l_linenumber = 3 → unparseable timestamp (F3 drop)
    * l_linenumber = 4 → close omitted       (F2 drop; json drops null fields)
    */
  private def candleMessages(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val flat = li.select(
      concat(lit("FIGI"), col("l_partkey")).as("company_id"),
      when(col("l_linenumber") === 3, lit("not-a-timestamp"))
        .otherwise(date_format(col("l_shipdate"), Schemas.TsFormat)).as("timestamp"),
      col("l_extendedprice").as("open"),
      (col("l_extendedprice") + col("l_quantity")).as("high"),
      (col("l_extendedprice") - col("l_quantity")).as("low"),
      when(col("l_linenumber") === 4, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")).as("close"),
      col("l_quantity").cast("long").as("volume"))
    Normalize.serialize(flat)
  }

  private def tradeMessages(s: SparkSession, dir: String): DataFrame =
    Normalize.serialize(Tables.load(s, dir, "orders").select(
      concat(lit("FIGI"), col("o_custkey")).as("company_id"),
      date_format(col("o_orderdate"), Schemas.TsFormat).as("timestamp"),
      col("o_totalprice").as("price"),
      col("o_orderkey").as("volume"),
      when(col("o_orderkey") % 2 === 0, "buy").otherwise("sell").as("side")))

  private def bookMessages(s: SparkSession, dir: String): DataFrame =
    Normalize.serialize(Tables.load(s, dir, "customer").select(
      concat(lit("FIGI"), col("c_custkey")).as("company_id"),
      lit("2024-01-01 00:00:00").as("timestamp"),
      col("c_acctbal").as("bid_price"),
      col("c_custkey").as("bid_volume"),
      (col("c_acctbal") + lit(1.0)).as("ask_price"),
      (col("c_custkey") + lit(1L)).as("ask_volume")))

  private def companyMessages(s: SparkSession, dir: String): DataFrame =
    Normalize.serialize(Tables.load(s, dir, "part").select(
      concat(lit("FIGI"), col("p_partkey")).as("company_id"),
      col("p_name").as("name"),
      col("p_brand").as("ticker"),
      col("p_type").as("sector")))

  /** frames no classifier field matches → 'unknown' route (F1 drop) */
  private def unknownMessages(s: SparkSession, dir: String): DataFrame =
    Normalize.serialize(Tables.load(s, dir, "region").select(
      col("r_regionkey").as("blob"), col("r_name").as("label")))

  private[graft] def allMessages(s: SparkSession, dir: String): DataFrame =
    Seq(candleMessages(s, dir), tradeMessages(s, dir), bookMessages(s, dir),
      companyMessages(s, dir), unknownMessages(s, dir)).reduce(_ union _)

  /** F1+F2+F3 end-to-end drop accounting over the mixed frame stream. */
  def demuxCounts(s: SparkSession, dir: String): DataFrame =
    Ingest.dropStats(allMessages(s, dir))

  private val demuxCountsSql =
    """SELECT 'candles' AS route, count(*) AS n_received,
      |       count(*) FILTER (WHERE l_linenumber NOT IN (3, 4)) AS n_kept,
      |       count(*) FILTER (WHERE l_linenumber IN (3, 4)) AS n_dropped
      |FROM lineitem
      |UNION ALL
      |SELECT 'trades', count(*), count(*), 0 FROM orders
      |UNION ALL
      |SELECT 'order_book', count(*), count(*), 0 FROM customer
      |UNION ALL
      |SELECT 'companies', count(*), count(*), 0 FROM part
      |UNION ALL
      |SELECT 'unknown', count(*), 0, count(*) FROM region""".stripMargin

  /** Candle path end-to-end: corrupted frames dropped, survivors re-typed and
    * aggregated per company bucket with exact decimal sums + wire-format
    * timestamp bounds.
    */
  def candlesE2e(s: SparkSession, dir: String): DataFrame = {
    val candles = Ingest.demux(allMessages(s, dir))("candles")
    candles
      .groupBy(pmod(substring(col("company_id"), 5, 18).cast("long"), lit(10)).as("bucket"))
      .agg(
        count(lit(1)).as("n_candles"),
        sum(col("close").cast("decimal(12,2)")).cast("double").as("sum_close"),
        sum(col("volume")).as("sum_volume"),
        date_format(min(col("timestamp")), Schemas.TsFormat).as("min_ts"),
        date_format(max(col("timestamp")), Schemas.TsFormat).as("max_ts"))
  }

  private val candlesE2eSql =
    """SELECT l_partkey % 10 AS bucket, count(*) AS n_candles,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_close,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_volume,
      |       strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ts,
      |       strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ts
      |FROM lineitem WHERE l_linenumber NOT IN (3, 4)
      |GROUP BY 1""".stripMargin

  /** P2 quotation fold on synthesized units/nano (negative pairs included):
    * per-row IEEE-double and lossless-decimal folds, bit-compared.
    */
  def quotationFold(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
    val sign  = when(col("p_partkey") % 5 === 0, -1L).otherwise(1L)
    val units = (sign * (col("p_partkey") % 1000)).as("units")
    val nano  = (sign * ((col("p_partkey") * 7919) % 1000000000)).cast("int").as("nano")
    p.select(col("p_partkey"), units, nano)
      .select(
        col("p_partkey"),
        Quotation.toDouble(col("units"), col("nano")).as("price"),
        Quotation.toDecimal(col("units"), col("nano")).cast("double").as("price_dec"))
  }

  private val quotationFoldSql =
    """WITH q AS (
      |  SELECT p_partkey,
      |         (CASE WHEN p_partkey % 5 = 0 THEN -1 ELSE 1 END) * (p_partkey % 1000) AS units,
      |         (CASE WHEN p_partkey % 5 = 0 THEN -1 ELSE 1 END) * ((p_partkey * 7919) % 1000000000) AS nano
      |  FROM part)
      |SELECT p_partkey,
      |       CAST(units AS DOUBLE) + CAST(nano AS DOUBLE) / 1e9 AS price,
      |       CAST(CAST(units AS DECIMAL(28,9))
      |            + CAST(nano AS DECIMAL(18,0)) * CAST(0.000000001 AS DECIMAL(10,9)) AS DOUBLE) AS price_dec
      |FROM q""".stripMargin

  /** P3 wire round-trip: format to 'yyyy-MM-dd HH:mm:ss', reparse, compare
    * against the second-truncated original — pins the truncation semantics.
    */
  def tsRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    ev.select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        date_format(col("ts"), Schemas.TsFormat).as("wire"),
        col("ts"))
      .withColumn("reparsed", expr(s"try_to_timestamp(wire, '${Schemas.TsFormat}')"))
      .groupBy("day")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("reparsed") === date_trunc("second", col("ts")), 1L).otherwise(0L))
          .as("n_roundtrip_ok"),
        sum(when(col("ts") =!= date_trunc("second", col("ts")), 1L).otherwise(0L))
          .as("n_subsecond"))
  }

  private val tsRoundtripSql =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS tsv FROM events)
      |SELECT strftime(tsv, '%Y-%m-%d') AS day, count(*) AS n_events,
      |       CAST(sum(CASE WHEN strptime(strftime(tsv, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
      |                     = date_trunc('second', tsv) THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
      |       CAST(sum(CASE WHEN tsv <> date_trunc('second', tsv) THEN 1 ELSE 0 END) AS BIGINT) AS n_subsecond
      |FROM e GROUP BY 1""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("ingest_demux_counts", demuxCounts, Some(demuxCountsSql)),
    Q("ingest_candles_e2e", candlesE2e, Some(candlesE2eSql)),
    Q("ingest_quotation_fold", quotationFold, Some(quotationFoldSql)),
    Q("ingest_ts_roundtrip", tsRoundtrip, Some(tsRoundtripSql)))
}
