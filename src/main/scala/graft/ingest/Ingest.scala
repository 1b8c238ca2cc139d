package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Consumer-side pipeline (E2, SURVEY.md §2.3): raw JSON wire frames → four
  * validated, typed tables, with the reference's drop-on-invalid semantics
  * (`from_rabbitmq_to_clickhouse.py:142-177`) expressed as declarative
  * filters so Catalyst fuses classify+parse+validate into one codegen stage:
  *
  *  - F1 type classification by field-sniffing (`:148-159`) — a message with
  *    an `open` field is a candle, `side` → trade, `bid_price` → order_book,
  *    `name` → company; anything else (incl. malformed JSON) is dropped
  *  - F2 required-field validation (`:122-140`) — any missing/null required
  *    field drops the row
  *  - F3 timestamp validity (`:164-170`) — unparseable timestamps drop
  *  - P8 JSON deserialize with null-on-failure (`:145,174-175`)
  *
  * Late/duplicate handling is intentionally NOT added here: the reference is
  * at-least-once and keeps duplicates (`:172-173`); dedup is opt-in via
  * [[graft.llm.Dedup]]-style operators downstream.
  */
object Ingest {

  /** F1: sniff the routing field off the raw JSON frame, with ONE JSON parse
    * per frame (a superset struct of the four discriminator fields) instead
    * of four `get_json_object` probes. Sniffing order matches the reference's
    * if/elif chain. from_json returns a null struct for malformed JSON, so
    * bad frames fall through to 'unknown'.
    */
  def classify(raw: DataFrame): DataFrame = {
    val sniff = from_json(col("value"), StructType(Seq(
      StructField("open", StringType), StructField("side", StringType),
      StructField("bid_price", StringType), StructField("name", StringType))))
    raw
      .withColumn("_sniff", sniff)
      .withColumn("route",
        when(col("_sniff.open").isNotNull, "candles")
          .when(col("_sniff.side").isNotNull, "trades")
          .when(col("_sniff.bid_price").isNotNull, "order_book")
          .when(col("_sniff.name").isNotNull, "companies")
          .otherwise("unknown"))
      .drop("_sniff")
  }

  private def allRequired(table: String): Column =
    Schemas.required(table).map(col(_).isNotNull).reduce(_ && _)

  /** Catalyst's per-field JSON pruning (enableJsonExpressionOptimization)
    * rewrites every `m.field` reference into its OWN pruned from_json parse;
    * inside the required-fields AND-chain those are conditionally evaluated,
    * so subexpression elimination can't merge them → ~7 full JSON parses per
    * frame (measured 3.8s → 25s at sf0.1). With the rule off, all references
    * share one full-schema parse via codegen CSE. Set lazily on the session
    * that owns the frames (same pattern as Tables.load's nanosAsLong).
    */
  private def disableJsonPruning(df: DataFrame): DataFrame = {
    df.sparkSession.conf.set("spark.sql.optimizer.enableJsonExpressionOptimization", "false")
    df
  }

  /** P8+F2+F3 for one table: parse frames against the table's wire schema,
    * drop rows missing required fields, convert + validate the timestamp.
    */
  def parseTable(raw0: DataFrame, table: String): DataFrame = {
    val raw = disableJsonPruning(raw0)
    // Required-fields gate as a TYPED filter on purpose: a Column predicate
    // gets pushed below the parse projection with the from_json alias
    // substituted per field reference — one full JSON parse per required
    // field per row (measured 13 s → 4 s at sf0.1 for the candle route).
    // The typed filter is an optimizer barrier, so the parse stays
    // materialized exactly once; the row-level null probe is index-based.
    val schema = Schemas.msgSchema(table)
    val reqIdx = Schemas.required(table).map(schema.fieldIndex)
    val parsed = raw
      .select(from_json(col("value"), schema).as("m"))
      .select(col("m.*"))
      .filter((r: org.apache.spark.sql.Row) => reqIdx.forall(i => !r.isNullAt(i)))
    if (Schemas.timestamped(table))
      // try_to_timestamp: malformed → null → dropped (ANSI-safe F3 semantics)
      parsed
        .withColumn("timestamp",
          expr(s"try_to_timestamp(timestamp, '${Schemas.TsFormat}')"))
        .where(col("timestamp").isNotNull)
    else parsed
  }

  /** Full consumer demux: one mixed frame stream → Map(table → typed rows).
    * Each table's plan re-reads only its own route slice; at 100 TB this is
    * the `foreachBatch` fan-out body (see [[graft.streaming.StreamIngest]]).
    */
  def demux(raw: DataFrame): Map[String, DataFrame] = {
    val routed = classify(raw)
    Schemas.msgSchema.keys.map { t =>
      t -> parseTable(routed.where(col("route") === t).select("value"), t)
    }.toMap
  }

  /** Drop accounting: how many frames landed per route vs survived all three
    * gates — ONE scan of the frame stream, the keep-predicate evaluated
    * inline per route, one tiny shuffle on the 5-valued route key. (The naive
    * formulation — re-running [[demux]] per table and unioning — rescans the
    * stream 5×; at 100 TB that is 5 queue replays.)
    */
  def dropStats(raw0: DataFrame): DataFrame = {
    val raw = disableJsonPruning(raw0)
    // ONE superset-schema parse serves every route's required-field check:
    // field names are disjoint across tables except company_id/timestamp/
    // volume (types agree), so per-field nullability is identical to the
    // per-table parses, at 1 parse per frame instead of 4.
    val superset = StructType(
      Schemas.msgSchema.values.flatMap(_.fields).toSeq.distinctBy(_.name))
    // Materialize the parse in its OWN projection below the aggregate:
    // references inside CaseWhen branches are conditionally evaluated, which
    // disqualifies them from subexpression elimination — with the parse
    // inlined, every per-route field probe re-parsed the frame (~14 full
    // JSON parses per row; measured 26 s → 4 s at sf0.1). CollapseProject
    // keeps the projection because the struct is non-cheap and multiply
    // referenced, so the branch probes read a materialized struct.
    val parsed = classify(raw)
      .select(col("route"), from_json(col("value"), superset).as("m"))
    val tsParsed = try_to_timestamp(col("m").getField("timestamp"), lit(Schemas.TsFormat))
    val keep = Schemas.msgSchema.foldLeft(when(lit(false), lit(false))) {
      case (acc, (t, _)) =>
        val req = Schemas.required(t).map(f => col("m").getField(f).isNotNull).reduce(_ && _)
        val tsOk = if (Schemas.timestamped(t)) tsParsed.isNotNull else lit(true)
        acc.when(col("route") === t, req && tsOk)
    }.otherwise(lit(false))
    parsed
      .groupBy("route")
      .agg(
        count(lit(1)).as("n_received"),
        sum(keep.cast("long")).as("n_kept"),
        (count(lit(1)) - sum(keep.cast("long"))).as("n_dropped"))
  }
}
