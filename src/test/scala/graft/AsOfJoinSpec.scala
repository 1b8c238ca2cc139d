package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.AsOf

/** The native as-of join exec (custom logical node + planner strategy +
  * co-partitioned merge exec) must agree with the union+window composition
  * [[graft.operators.Asof.joinLatest]] on real data and hold its plan
  * contract: exactly the SortMergeJoin exchange/sort shape, no candidate
  * fan-out, and left-clustering passthrough (downstream per-key aggregates
  * reuse the exchange).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def events = Tables.load(spark, sfDir, "events")

  test("native exec matches the union+window composition on events") {
    val clicks = events.where(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = events.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("pval"))

    val composed = graft.operators.Asof
      .joinLatest(clicks, purchases, "user_id", "ts", "ts", "pval")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("pval_asof").as("pval"))

    val native = AsOf.join(
        clicks,
        purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("pval")),
        Seq(col("user_id")), Seq(col("p_user")), col("ts"), col("p_ts"))
      .select(col("user_id"), col("ts"), col("event_id"), col("pval"))

    assert(native.count() === clicks.count(), "left-outer: every click survives")
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty,
      "native exec and composition disagree")
  }

  test("matched right row is the true row (ts payload), unmatched is all-null") {
    val left = Seq((1L, 100L, "a"), (1L, 5L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 100L, 2.0), (3L, 1L, 9.0))
      .toDF("rk", "rt", "v")
    val out = AsOf.join(left, right,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .orderBy("k", "t")
      .collect()
    // (1,5): no right at-or-before → nulls; (1,100): rt=100 ties inclusive;
    // (2,50): key absent on the right → nulls
    assert(out.toSeq === Seq(
      Row(1L, 5L, "b", null, null, null),
      Row(1L, 100L, "a", 1L, 100L, 2.0),
      Row(2L, 50L, "c", null, null, null)))
  }

  test("null left key or time never matches; null right time never held") {
    val left = Seq(
        (Option(1L), Option(10L), "ok"),
        (Option.empty[Long], Option(10L), "nullkey"),
        (Option(1L), Option.empty[Long], "nullts"))
      .toDF("k", "t", "tag")
    val right = Seq((Option(1L), Option(1L), 7.0),
        (Option(1L), Option.empty[Long], 8.0))
      .toDF("rk", "rt", "v")
    val out = AsOf.join(left, right,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .orderBy("tag").collect()
    assert(out.map(r => (r.getString(2), if (r.isNullAt(5)) null else r.getDouble(5))).toSeq
      === Seq(("nullkey", null), ("nullts", null), ("ok", 7.0)))
  }

  test("tolerance nulls a too-stale latest match, keeps a fresh one") {
    val left = Seq((1L, 100L, "far"), (1L, 15L, "near")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 7.0)).toDF("rk", "rt", "v")
    def run(tol: Option[Long]) = AsOf.join(left, right,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"), tol)
      .orderBy("t").collect()
      .map(r => (r.getString(2), if (r.isNullAt(5)) null else r.getDouble(5))).toSeq
    // rt=10 is the latest for both; at tol=50 only t=15 is within reach
    assert(run(Some(50L)) === Seq(("near", 7.0), ("far", null)))
    assert(run(Some(90L)) === Seq(("near", 7.0), ("far", 7.0)))
    assert(run(None) === Seq(("near", 7.0), ("far", 7.0)))
  }

  test("forward direction picks the earliest at-or-after row, tolerance bounds the wait") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 31L, "c"), (2L, 5L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 30L, 3.0), (3L, 1L, 9.0))
      .toDF("rk", "rt", "v")
    def run(tol: Option[Long]) = AsOf.join(left, right,
        Seq(col("k")), Seq(col("rk")), col("t"), col("rt"), tol, forward = true)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(2), if (r.isNullAt(5)) null else r.getDouble(5))).toSeq
    // a: rt=10 ties inclusive; b: next is rt=30; c: nothing at-or-after 31;
    // d: key absent on the right. The rt=30 row serves BOTH a-side waits
    // without being consumed early.
    assert(run(None) === Seq(("a", 1.0), ("b", 3.0), ("c", null), ("d", null)))
    // tol=4: b's wait (30-25=5) exceeds it → null
    assert(run(Some(4L)) === Seq(("a", 1.0), ("b", null), ("c", null), ("d", null)))
  }

  test("plan: merge exec with SMJ-shaped exchanges, rollup reuses left clustering") {
    val q = SparkEntry.queries("asof_native_exec")(spark, sfDir)
    q.collect() // finalize AQE
    val p = q.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("AsOfJoin "), finalPlan.take(1500))
    // exactly 3 exchanges: clicks→user, purchases pre-agg→(user,ts),
    // purchases→user. The post-join per-user rollup must NOT add a fourth
    // (outputPartitioning passthrough): nothing between the aggregate and
    // the join but the project.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(exchanges == 3, s"expected 3 exchanges (join/pre-agg inputs only), got $exchanges:\n" +
      finalPlan.take(2500))
    val aboveJoin = finalPlan.split("AsOfJoin \\[").head
    assert(aboveJoin.contains("HashAggregate") && !aboveJoin.contains("Exchange"),
      s"rollup above the join re-shuffled:\n$aboveJoin")
    assert(!finalPlan.contains("CartesianProduct") && !finalPlan.contains("SortMergeJoin"))
  }
}
