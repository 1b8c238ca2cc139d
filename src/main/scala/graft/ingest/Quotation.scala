package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quotation fixed-point fold — the reference collapses broker
  * `Quotation{units: int64, nano: int32}` pairs to float via `units + nano/1e9`
  * (`from_parser_to_rabbitmq.py:60-63,102,140,189-191`). Negative quotes carry
  * the sign on BOTH components (units=-2, nano=-250000000 → -2.25), which the
  * additive fold handles with no special-casing.
  */
object Quotation {

  /** reference-faithful IEEE-double fold (SURVEY.md §1.3 pins DoubleType) */
  def toDouble(units: Column, nano: Column): Column =
    units.cast("double") + nano.cast("double") / lit(1e9)

  /** lossless upgrade: nano is exactly 9 decimal digits → DECIMAL(28,9).
    * Implemented as exact decimal multiplication by 1e-9 (scale-9 constant),
    * not division — decimal division result scales are engine-specific.
    */
  def toDecimal(units: Column, nano: Column): Column =
    (units.cast("decimal(19,0)").cast("decimal(28,9)") +
      (nano.cast("decimal(10,0)") * lit("0.000000001").cast("decimal(10,9)"))
        .cast("decimal(28,9)"))
      .cast("decimal(28,9)")

  /** fold applied to a Quotation struct column */
  def fold(q: Column): Column = toDouble(q.getField("units"), q.getField("nano"))
}
