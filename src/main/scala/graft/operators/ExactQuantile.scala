package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles from value histograms.
  *
  * Spark's exact `percentile(...)` is a TypedImperativeAggregate that buffers
  * every value of a group inside ONE aggregation buffer — at 100× scale a hot
  * group is an executor OOM, and a window-sort formulation
  * (`row_number() over (partition by grp order by v)`) ships a whole group
  * into one task's sort. This operator instead reduces the data to a
  * per-group VALUE HISTOGRAM first — `groupBy(keys, value).count()` with
  * map-side combine — and selects the quantile element by cumulative count
  * over the histogram rows. Task state is bounded by the group's value
  * CARDINALITY (price grids, integer quantities, bucketed measures), not its
  * row count: a trillion-row group with 50 distinct values costs 50 histogram
  * rows. For genuinely continuous high-cardinality columns, use
  * `percentile_approx` instead — exactness from a histogram no longer pays.
  *
  * Rank semantics match DuckDB's `quantile_disc(v, q)`: the element at
  * ascending 1-based position `max(ceil(q·n), 1)`, the lower median at
  * q = 0.5 (verified numerically against DuckDB across n × q grids — the
  * textbook `floor(q·(n-1))+1` rule agrees at the median but picks one
  * element LOWER at the tails, e.g. q=0.99) — so results are oracle-gateable
  * bit-for-bit, unlike interpolating forms. (The single-group interpolating variant lives in
  * [[graft.analytics.Analytics]]'s A2 threshold — `quantileFromHist`.)
  *
  * Reference behavioral anchor: the reference declares quantile-style
  * analytics but delegates them to ClickHouse
  * (`/root/reference/app/for_rabbit/from_parser_to_rabbitmq.py:231-232`,
  * SURVEY.md §2.5 A2); this is the engine-native exact form.
  */
object ExactQuantile {

  /** Per-group exact discrete q-quantile of `valueCol` (nulls excluded, like
    * `quantile_disc`). Output: `keys :+ <valueCol>_q :+ n` — one row per
    * group present in `df` with at least one non-null value.
    */
  def groupQuantileDisc(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      q: Double): DataFrame =
    groupQuantilesDisc(df, keys, valueCol, Seq(q))
      .withColumnRenamed(s"${valueCol}_q0", valueCol + "_q")

  /** Several quantiles of one column in ONE histogram pass: the scan, the
    * `groupBy(keys, value)` shuffle and the cumulative window are shared;
    * each extra quantile is one more conditional `min` over the histogram
    * rows. Output: `keys :+ <valueCol>_q<i> (per q) :+ n`.
    */
  def groupQuantilesDisc(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(keys.map(col) :+ col(valueCol).as("_eq_v"): _*)
      .agg(count(lit(1)).as("_eq_cnt"))
      .withColumnRenamed("_eq_v", valueCol)
    groupQuantilesDiscWeighted(hist, keys, valueCol, "_eq_cnt", qs)
  }

  /** Quantiles over a PRE-BUILT value histogram — `hist` has one row per
    * (keys, value) carrying that value's occurrence count in `weightCol`.
    * This is the composition point when a pipeline already reduced its data
    * to a histogram (e.g. MAD: the deviation histogram derives from the
    * value histogram by key-local arithmetic, so the fact is scanned ONCE
    * for any number of downstream quantiles). Rank semantics identical to
    * [[groupQuantilesDisc]], which delegates here.
    */
  def groupQuantilesDiscWeighted(
      hist: DataFrame,
      keys: Seq[String],
      valueCol: String,
      weightCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile q=$q outside [0, 1]"))
    // both windows partition on the SAME keys a histogram groupBy shuffles
    // on, so they add sorts but no extra exchange
    val ordered = Window.partitionBy(keys.map(col): _*).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(keys.map(col): _*)
    val cum = hist
      .withColumn("_eq_cum", sum(weightCol).over(ordered))
      .withColumn("_eq_n", sum(weightCol).over(whole))
    // 1-based target rank, quantile_disc-compatible: max(ceil(q·n), 1).
    // The q-th element is the FIRST histogram row whose cumulative count
    // reaches the rank — a conditional min, so all quantiles fold into one
    // aggregate over the (tiny) histogram relation.
    val picks = qs.zipWithIndex.map { case (q, i) =>
      val rank = greatest(ceil(lit(q) * col("_eq_n")).cast("long"), lit(1L))
      min(when(col("_eq_cum") >= rank, col(valueCol))).as(s"${valueCol}_q$i")
    }
    cum.groupBy(keys.map(col): _*)
      .agg(picks.head, picks.tail :+ max(col("_eq_n")).as("n"): _*)
  }
}
