package graft

import graft.operators.{Asof, Snapshot}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Micro-fixtures pinning the custom operator semantics. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join takes the latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:05:00"), 101L),
      (1L, ts("2024-01-01 09:00:00"), 102L), // before any quote → null
      (2L, ts("2024-01-01 10:00:00"), 103L))
      .toDF("figi", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 11.0), // equal ts → inclusive match
      (1L, ts("2024-01-01 10:04:00"), 12.0),
      (2L, ts("2024-01-01 09:59:00"), 20.0))
      .toDF("figi", "ts", "quote")

    val out = Asof.joinLatest(trades, quotes, "figi", "ts", "ts", "quote")
      .select("trade_id", "quote_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(100L) == Some(11.0)) // equal-ts quote matches (inclusive)
    assert(out(101L) == Some(12.0)) // latest preceding
    assert(out(102L) == None)       // nothing at-or-before
    assert(out(103L) == Some(20.0)) // keys don't leak across figi
  }

  test("as-of join matches by row: a matched null value does not fall through") {
    val left = Seq(
      (1L, ts("2024-01-01 10:05:00"), 200L),  // latest match has null value
      (1L, ts("2024-01-01 08:00:00"), 201L))  // before everything
      .toDF("figi", "ts", "trade_id")
    val right = Seq(
      (1L, Some(ts("2024-01-01 09:00:00")), Some(10.0)),
      (1L, Some(ts("2024-01-01 10:00:00")), None),        // matched row, null value
      (1L, None, Some(99.0)))                             // null ts → dropped
      .toDF("figi", "ts", "quote")
    val out = Asof.joinLatest(left, right, "figi", "ts", "ts", "quote")
      .select("trade_id", "quote_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(200L) == None) // the 10:00 row matched; its null value is the answer
    assert(out(201L) == None) // null-ts right row must not leak a pre-time match
  }

  test("GraftExtensions makes cosine_similarity callable from SQL text") {
    org.apache.spark.sql.graftx.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("as-of join guards its reserved working columns") {
    import org.apache.spark.sql.functions.lit
    val left = Seq((1L, 1L)).toDF("figi", "ts").withColumn("_asof_ts", lit(0L))
    val right = Seq((1L, 1L, 2.0)).toDF("figi", "ts", "quote")
    intercept[IllegalArgumentException] {
      Asof.joinLatest(left, right, "figi", "ts", "ts", "quote")
    }
    ()
  }

  test("snapshot cadence keeps exactly the latest update per bucket") {
    val updates = Seq(
      (1L, ts("2024-01-01 10:01:00"), 1L, 5.0),
      (1L, ts("2024-01-01 10:14:00"), 2L, 6.0),  // same 15-min bucket, later → survives
      (1L, ts("2024-01-01 10:16:00"), 3L, 7.0),  // next bucket
      (1L, ts("2024-01-01 10:16:00"), 4L, 8.0),  // equal ts → higher event_id survives
      (2L, ts("2024-01-01 10:01:00"), 5L, 9.0))
      .toDF("user_id", "ts", "event_id", "value")

    val out = Snapshot.atCadence(updates, Seq("user_id"), "ts", 15, col("event_id"))
      .select("user_id", "snapshot_ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString) -> r.getLong(2)).toMap
    assert(out.size == 3)
    assert(out((1L, "2024-01-01 10:00:00.0")) == 2L)
    assert(out((1L, "2024-01-01 10:15:00.0")) == 4L)
    assert(out((2L, "2024-01-01 10:00:00.0")) == 5L)
  }
}
