package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Consumer-side pipeline (E2, SURVEY.md §2.3): raw JSON wire frames → four
  * validated, typed tables, with the reference's drop-on-invalid semantics
  * (`from_rabbitmq_to_clickhouse.py:142-177`) expressed as declarative
  * filters:
  *
  *  - F1 type classification by field-sniffing (`:148-159`) — a message with
  *    an `open` field is a candle, `side` → trade, `bid_price` → order_book,
  *    `name` → company; anything else (incl. malformed JSON) is dropped
  *  - F2 required-field validation (`:122-140`) — any missing/null required
  *    field drops the row
  *  - F3 timestamp validity (`:164-170`) — unparseable timestamps drop
  *  - P8 JSON deserialize with null-on-failure (`:145,174-175`)
  *
  * PARSE-ONCE DISCIPLINE: every `from_json` sits inside
  * [[parsedOnce]]'s `explode(array(...))` Generate. The generator output is a
  * real attribute, so downstream field references and filters cannot be
  * alias-substituted back into per-field `from_json` copies — the historical
  * failure mode here: Catalyst's JSON pruning rewrote every field reference
  * into its own pruned parse (~7 full parses/frame, measured 3.8 s → 25 s at
  * sf0.1), and the earlier workarounds (session-wide
  * `enableJsonExpressionOptimization=false` + a typed-Row filter barrier)
  * mutated global conf and deserialized every row. The Generate barrier needs
  * neither: one parse per frame, plain Column filters, no conf side effects.
  *
  * Late/duplicate handling is intentionally NOT added here: the reference is
  * at-least-once and keeps duplicates (`:172-173`); dedup is opt-in via
  * [[graft.llm.Dedup]]-style operators downstream.
  */
object Ingest {

  /** one-parse barrier: parse `value` against `schema` into attribute `as` */
  private def parsedOnce(raw: DataFrame, schema: StructType, as: String): DataFrame =
    raw.select(col("*"), explode(array(from_json(col("value"), schema))).as(as))

  /** SINGLE routing rule table (the reference's if/elif chain,
    * `from_rabbitmq_to_clickhouse.py:148-159`, in declaration order) —
    * shared by [[classify]], [[demux]] and [[dropStats]] so the rules can
    * never diverge between the entry points.
    */
  private val routeRules: Seq[(String, String)] = Seq(
    "open" -> "candles", "side" -> "trades",
    "bid_price" -> "order_book", "name" -> "companies")

  private def routeFrom(struct: String): Column =
    routeRules
      .map { case (field, table) => (col(s"$struct.$field").isNotNull, table) }
      .foldRight(lit("unknown"): Column) { case ((cond, table), other) =>
        when(cond, table).otherwise(other)
      }

  private val sniffSchema = StructType(
    routeRules.map { case (field, _) => StructField(field, StringType) })

  /** F1: sniff the routing field off the raw JSON frame with ONE JSON parse
    * per frame (a superset struct of the four discriminator fields, string-
    * typed so presence — not parseability — routes, like the reference's
    * `in message` checks). from_json returns a null struct for malformed
    * JSON, so bad frames fall through to 'unknown'.
    */
  def classify(raw: DataFrame): DataFrame =
    parsedOnce(raw, sniffSchema, "_sniff")
      .withColumn("route", routeFrom("_sniff"))
      .drop("_sniff")

  /** P8+F2+F3 for one table: parse frames against the table's wire schema,
    * drop rows missing required fields, convert + validate the timestamp.
    */
  def parseTable(raw: DataFrame, table: String): DataFrame = {
    val required = Schemas.required(table)
      .map(f => col("m").getField(f).isNotNull).reduce(_ && _)
    val parsed = parsedOnce(raw.select("value"), Schemas.msgSchema(table), "m")
      .where(required)
      .select(col("m.*"))
    if (Schemas.timestamped(table))
      // try_to_timestamp: malformed → null → dropped (ANSI-safe F3 semantics)
      parsed
        .withColumn("timestamp",
          expr(s"try_to_timestamp(timestamp, '${Schemas.TsFormat}')"))
        .where(col("timestamp").isNotNull)
    else parsed
  }

  /** all-string superset of every table's wire fields: presence-faithful
    * (routing + required-field validation are presence checks in the
    * reference) and parseable ONCE for all routes.
    */
  private val supersetStr = StructType(
    Schemas.msgSchema.values.flatMap(_.fields).toSeq.distinctBy(_.name)
      .map(f => StructField(f.name, StringType)))

  /** Full consumer demux: one mixed frame stream → Map(table → typed rows),
    * with ONE JSON parse per frame total: the all-string superset parse
    * drives routing AND field extraction, and each route's slice re-types
    * via per-field CASTs (a cast of an already-extracted string is ~free
    * next to a second Jackson pass; a failed numeric cast nulls the field →
    * the required-fields gate drops the row, same outcome as a typed parse
    * failure). Each table's plan reads only its own route slice; at 100 TB
    * this is the `foreachBatch` fan-out body (see
    * [[graft.streaming.StreamIngest]]).
    */
  def demux(raw: DataFrame): Map[String, DataFrame] = {
    val parsed = parsedOnce(raw, supersetStr, "m").withColumn("route", routeFrom("m"))
    Schemas.msgSchema.map { case (t, schema) =>
      val typed = parsed.where(col("route") === t)
        .select(schema.fields.map(f =>
          // try_cast, NOT cast: ANSI mode (Spark 4 default) makes a plain
          // cast THROW on malformed numerics — drop-on-invalid requires null
          col("m").getField(f.name).try_cast(f.dataType).as(f.name)): _*)
      val required = Schemas.required(t).map(col(_).isNotNull).reduce(_ && _)
      val validated = typed.where(required)
      t -> (if (Schemas.timestamped(t))
        validated
          .withColumn("timestamp",
            expr(s"try_to_timestamp(timestamp, '${Schemas.TsFormat}')"))
          .where(col("timestamp").isNotNull)
      else validated)
    }
  }

  /** Drop accounting: how many frames landed per route vs survived all three
    * gates — ONE scan of the frame stream, ONE JSON parse per frame, the
    * keep-predicate evaluated inline per route, one tiny shuffle on the
    * 5-valued route key. (The naive formulation — re-running [[demux]] per
    * table and unioning — rescans the stream 5×; at 100 TB that is 5 queue
    * replays.)
    *
    * The single parse uses an ALL-STRING superset of every table's fields:
    * routing and required-field validation are PRESENCE checks in the
    * reference (`'open' in message`, `from_rabbitmq_to_clickhouse.py:148-159,
    * 122-140`), and string-typed fields make `from_json` presence-faithful —
    * a typed superset would null the whole row on one type-mismatched field
    * and mis-route it. Timestamp validity still parses for real (F3).
    */
  /** Quarantine relation: the raw frames the demux would DROP, each with its
    * route and the first failed gate — `unknown_type` (F1), then
    * `missing_required` (F2, which also covers type-mismatched required
    * fields — the try_cast discipline), then `bad_timestamp` (F3); gate
    * order matches the consumer's check order
    * (`from_rabbitmq_to_clickhouse.py:148-170`), so a frame failing several
    * gates reports the FIRST one, like the reference's early returns. The
    * reference logs-and-drops; a production pipeline lands these in a side
    * table for replay after a parser fix — same single-parse plan as
    * [[dropStats]], opposite polarity.
    */
  def quarantine(raw: DataFrame): DataFrame = {
    val parsed = parsedOnce(raw, supersetStr, "m").withColumn("route", routeFrom("m"))
    val tsParsed = try_to_timestamp(col("m").getField("timestamp"), lit(Schemas.TsFormat))
    val reason = Schemas.msgSchema.foldLeft(
      when(col("route") === "unknown", lit("unknown_type"))) {
      case (acc, (t, schema)) =>
        val req = Schemas.required(t).map { f =>
          col("m").getField(f).try_cast(schema(f).dataType).isNotNull
        }.reduce(_ && _)
        val tsOk = if (Schemas.timestamped(t)) tsParsed.isNotNull else lit(true)
        acc.when(col("route") === t && !req, lit("missing_required"))
          .when(col("route") === t && !tsOk, lit("bad_timestamp"))
    } // no otherwise: surviving frames get null → filtered out
    parsed.withColumn("reason", reason)
      .where(col("reason").isNotNull)
      .select(col("value"), col("route"), col("reason"))
  }

  def dropStats(raw: DataFrame): DataFrame = {
    val parsed = parsedOnce(raw, supersetStr, "m").withColumn("route", routeFrom("m"))
    val tsParsed = try_to_timestamp(col("m").getField("timestamp"), lit(Schemas.TsFormat))
    // keep == exactly what demux would emit: required fields must survive the
    // cast to their TYPED schema (presence alone would overcount — a frame
    // with open="abc" routes to candles but demux's cast nulls it out)
    val keep = Schemas.msgSchema.foldLeft(when(lit(false), lit(false))) {
      case (acc, (t, schema)) =>
        val req = Schemas.required(t).map { f =>
          col("m").getField(f).try_cast(schema(f).dataType).isNotNull
        }.reduce(_ && _)
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
