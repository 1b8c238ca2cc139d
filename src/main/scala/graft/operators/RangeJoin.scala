package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch interval (range) join without a nested loop.
  *
  * Spark plans a join whose condition is `key equal AND point BETWEEN start
  * AND end` as a shuffled equi-join on the key alone — fine — but with a
  * per-key skew hazard, and with NO equi-key at all (pure range condition)
  * it falls back to BroadcastNestedLoopJoin: O(|L|·|R|). The scale-correct
  * plan bucketizes time on a fixed grid: points land in exactly one bucket,
  * intervals are exploded over the (few) buckets they span, and the join
  * becomes a plain equi-join on (key, bucket) refined by the exact interval
  * predicate. Cost is O(|L| + |R|·span/granularity + |matches|), shuffled on
  * (key, bucket) — the grid also breaks up hot keys, acting as a natural
  * salt for keys with many intervals spread over time.
  *
  * Matches are NOT deduplicated because none are duplicated: a point is in
  * one bucket only, and an interval appears at most once per bucket.
  *
  * Reference behavioral anchor: the reference's per-window chunked range
  * extraction (`/root/reference/app/for_rabbit/from_parser_to_rabbitmq.py:36-44`)
  * is the degenerate single-table form of the same grid discipline.
  */
object RangeJoin {

  /** Join `points` to `intervals` rows whose `[startCol, endCol)` contains
    * `pointCol`, with `key` equality. Time columns are LONGs on any uniform
    * scale (epoch micros here); `granularity` is the grid pitch on the same
    * scale — choose it near the typical interval span so intervals explode
    * to O(1) buckets.
    *
    * Output: inner-join rows with all columns of both sides (interval side
    * suffixed `_iv` on name collisions).
    */
  def joinPointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      granularity: Long): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    val g = lit(granularity)

    val collide = intervals.columns.toSet.intersect(points.columns.toSet) - key
    val iv = collide.foldLeft(intervals)((df, c) => df.withColumnRenamed(c, c + "_iv"))
    val (startC, endC) =
      (if (collide(startCol)) startCol + "_iv" else startCol,
        if (collide(endCol)) endCol + "_iv" else endCol)

    val pts = points.withColumn("_rj_bucket", floor(col(pointCol) / g))
    // [start, end) spans buckets floor(start/g) .. floor((end-1)/g); empty
    // intervals (start >= end) are dropped up front, not exploded.
    val ivx = iv
      .where(col(startC) < col(endC))
      .withColumn("_rj_bucket",
        explode(sequence(floor(col(startC) / g), floor((col(endC) - 1) / g))))

    pts.join(ivx, Seq(key, "_rj_bucket"))
      .where(col(pointCol) >= col(startC) && col(pointCol) < col(endC))
      .drop("_rj_bucket")
  }

  /** Interval × interval OVERLAP join on the same grid: rows of `left` and
    * `right` with `key` equality whose half-open spans `[leftStart, leftEnd)`
    * and `[rightStart, rightEnd)` intersect. Both sides explode over the
    * buckets they span; the equi-join on (key, bucket) then meets every
    * overlapping pair at least once, and exactly-once de-duplication is a
    * FILTER, not a `distinct()`: a match is attributed to its canonical
    * bucket — the one containing the overlap's start `max(lStart, rStart)`.
    * That instant lies inside BOTH intervals, so both sides exploded a row
    * for its bucket (the pair survives), and it is a single well-defined
    * bucket (the pair survives once). No shuffle for dedup, no row-identity
    * columns required on either input.
    *
    * Cost: O(|L|·span/g + |R|·span/g + |bucket-local pairs|), shuffled on
    * (key, bucket) — the grid splits a hot key's time range across tasks,
    * same as [[joinPointInInterval]]. Empty intervals (start ≥ end) never
    * match. Right-side columns are suffixed `_r` on name collisions.
    */
  def joinOverlap(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      granularity: Long): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    val g = lit(granularity)

    val collide = right.columns.toSet.intersect(left.columns.toSet) - key
    val rv = collide.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + "_r"))
    val (rsC, reC) =
      (if (collide(rightStart)) rightStart + "_r" else rightStart,
        if (collide(rightEnd)) rightEnd + "_r" else rightEnd)

    def exploded(df: DataFrame, sC: String, eC: String) =
      df.where(col(sC) < col(eC))
        .withColumn("_rj_bucket",
          explode(sequence(floor(col(sC) / g), floor((col(eC) - 1) / g))))
    val lx = exploded(left, leftStart, leftEnd)
    val rx = exploded(rv, rsC, reC)

    lx.join(rx, Seq(key, "_rj_bucket"))
      .where(col(leftStart) < col(reC) && col(rsC) < col(leftEnd) &&
        col("_rj_bucket") === floor(greatest(col(leftStart), col(rsC)) / g))
      .drop("_rj_bucket")
  }
}
