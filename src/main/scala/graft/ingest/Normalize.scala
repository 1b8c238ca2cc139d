package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Producer-side normalization (E1, SURVEY.md §2.2): broker-API shaped nested
  * records → the flat wire-message schema, as pure DataFrame→DataFrame
  * functions. Each is a narrow projection (no shuffle, whole-stage codegen).
  *
  *  - P1 candle projection   (`from_parser_to_rabbitmq.py:57-65`)
  *  - P2 quotation fold      (`:60-63` — see [[Quotation]])
  *  - P3 timestamp format    (`:59` — second truncation on the wire)
  *  - P4 trade projection + direction enum → 'buy'/'sell' (`:99-105`)
  *  - P5 top-of-book extraction from depth-N book arrays (`:189-192`)
  *  - P6 company projection (column pruning, `:153-160`)
  *  - P7 JSON serialize     (`:164`)
  */
object Normalize {

  private def wireTs(c: org.apache.spark.sql.Column) =
    date_format(to_timestamp(c), Schemas.TsFormat)

  /** P1+P2+P3: nested API candle → flat 7-col candle message */
  def projectCandles(api: DataFrame): DataFrame =
    api.select(
      col("figi").as("company_id"),
      wireTs(col("time")).as("timestamp"),
      Quotation.fold(col("open")).as("open"),
      Quotation.fold(col("high")).as("high"),
      Quotation.fold(col("low")).as("low"),
      Quotation.fold(col("close")).as("close"),
      col("volume"))

  /** P4: API trade → flat 5-col trade message, direction 1 → buy else sell */
  def projectTrades(api: DataFrame): DataFrame =
    api.select(
      col("figi").as("company_id"),
      wireTs(col("time")).as("timestamp"),
      Quotation.fold(col("price")).as("price"),
      col("quantity").as("volume"),
      when(col("direction") === 1, "buy").otherwise("sell").as("side"))

  /** P5: depth-N book → best bid/ask (array index 1 = top of book) */
  def projectOrderBook(api: DataFrame): DataFrame =
    api.select(
      col("figi").as("company_id"),
      wireTs(col("time")).as("timestamp"),
      Quotation.fold(element_at(col("bids"), 1).getField("price")).as("bid_price"),
      element_at(col("bids"), 1).getField("quantity").as("bid_volume"),
      Quotation.fold(element_at(col("asks"), 1).getField("price")).as("ask_price"),
      element_at(col("asks"), 1).getField("quantity").as("ask_volume"))

  /** P5+ (depth ladder, designed ahead of a driver round shipping depth
    * columns): the SAME flat top-of-book columns as [[projectOrderBook]]
    * PLUS the full ladders as `bids`/`asks` arrays of (price double,
    * volume long) structs, quotations folded per level with `transform`
    * (no UDF, stays in codegen). Because the flat columns are identical,
    * an existing `order_book` snapshot table upgrades by a schema-WIDENING
    * commit (two added array columns, null-backfilled in old files) — no
    * migration, no S5 change: readers that only touch the flat columns
    * never see the ladders, and ladder consumers guard on column presence
    * (see [[graft.ingest.IngestPack.bookDepthImbalance]]).
    */
  def projectOrderBookDepth(api: DataFrame): DataFrame = {
    def ladder(c: Column): Column = transform(c, lvl => struct(
      Quotation.fold(lvl.getField("price")).as("price"),
      lvl.getField("quantity").as("volume")))
    api.select(
      col("figi").as("company_id"),
      wireTs(col("time")).as("timestamp"),
      Quotation.fold(element_at(col("bids"), 1).getField("price")).as("bid_price"),
      element_at(col("bids"), 1).getField("quantity").as("bid_volume"),
      Quotation.fold(element_at(col("asks"), 1).getField("price")).as("ask_price"),
      element_at(col("asks"), 1).getField("quantity").as("ask_volume"),
      ladder(col("bids")).as("bids"),
      ladder(col("asks")).as("asks"))
  }

  /** P6: Share record (~60 broker fields) → 4-col company message */
  def projectCompanies(api: DataFrame): DataFrame =
    api.select(
      col("figi").as("company_id"),
      col("name"), col("ticker"), col("sector"))

  /** P7: any flat message → single-column JSON wire frame */
  def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
