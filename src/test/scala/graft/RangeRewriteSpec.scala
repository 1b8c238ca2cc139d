package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftx.{GraftExtensions, RangeJoinRewrite}

/** Pins the RangeJoinRewrite optimizer rule: a pure range-condition inner
  * join (Spark's BroadcastNestedLoopJoin fallback) is rewritten to a
  * bucketed equi-join with EXACTLY the naive join's rows; joins that
  * already carry a cross-side equi-key are left alone; the rule is inert
  * until its granularity conf is set.
  */
class RangeRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def pts = (0L until 400L).map(i => (i, s"p$i")).toDF("p", "tag")
  private def ivs = Seq(
    (0L, 50L, "a"), (40L, 120L, "b"), (300L, 301L, "c"),
    (390L, 380L, "empty")).toDF("lo", "hi", "name")

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def expectedRows: Set[(Long, String, Long, Long, String)] = {
    val intervals = Seq((0L, 50L, "a"), (40L, 120L, "b"), (300L, 301L, "c"))
    (for {
      i <- 0L until 400L
      (lo, hi, n) <- intervals if i >= lo && i < hi
    } yield (i, s"p$i", lo, hi, n)).toSet
  }

  test("pure range join: nested loop without the rule, bucketed equi-join with it, same rows") {
    GraftExtensions.register(spark)
    def q = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
    // conf unset → rule inert → Spark's nested-loop fallback
    assert(executed(q).contains("BroadcastNestedLoopJoin"))
    spark.conf.set(RangeJoinRewrite.GranularityKey, "64")
    try {
      val on = q
      val got = on.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      assert(got == expectedRows)
      val plan = on.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    } finally spark.conf.unset(RangeJoinRewrite.GranularityKey)
  }

  test("mirrored operand order (lo <= p AND hi > p) is recognized too") {
    GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.GranularityKey, "64")
    try {
      val on = pts.join(ivs, $"lo" <= $"p" && $"hi" > $"p")
      val got = on.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      assert(got == expectedRows)
      assert(!on.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(RangeJoinRewrite.GranularityKey)
  }

  test("negative coordinates bucket by FLOOR division (no trunc-toward-zero gaps)") {
    GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.GranularityKey, "4")
    try {
      val negPts = (-10L to 10L).map(i => (i, i.toString)).toDF("p", "tag")
      val negIvs = Seq((-7L, -2L, "n"), (-3L, 5L, "z")).toDF("lo", "hi", "name")
      val on = negPts.join(negIvs, $"p" >= $"lo" && $"p" < $"hi")
      val got = on.collect().map(r => (r.getLong(0), r.getString(4))).toSet
      val want = (for {
        i <- -10L to 10L
        (lo, hi, n) <- Seq((-7L, -2L, "n"), (-3L, 5L, "z")) if i >= lo && i < hi
      } yield (i, n)).toSet
      assert(got == want)
      assert(!on.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(RangeJoinRewrite.GranularityKey)
  }

  test("a join that already has a cross-side equi-key is left alone") {
    GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.GranularityKey, "64")
    try {
      val p2 = pts.withColumn("k", $"p" % 3)
      val i2 = ivs.withColumn("k2", $"lo" % 3)
      val q = p2.join(i2, $"k" === $"k2" && $"p" >= $"lo" && $"p" < $"hi")
      // no bucket column may appear anywhere in the optimized plan
      assert(!q.queryExecution.optimizedPlan.toString.contains("_rj_bucket"))
      // and results are still the equi-refined subset
      val got = q.collect()
        .map(r => (r.getAs[Long]("p"), r.getAs[String]("name"))).toSet
      val want = expectedRows.filter { case (p, _, lo, _, _) => p % 3 == lo % 3 }
        .map { case (p, _, _, _, n) => (p, n) }
      assert(got == want)
    } finally spark.conf.unset(RangeJoinRewrite.GranularityKey)
  }

  test("extra single-side conjuncts ride along; outer joins are untouched") {
    GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.GranularityKey, "64")
    try {
      val q = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi" && $"name" =!= "b")
      val got = q.collect()
        .map(r => (r.getAs[Long]("p"), r.getAs[String]("name"))).toSet
      val want = expectedRows.collect { case (p, _, _, _, n) if n != "b" => (p, n) }
      assert(got == want)
      assert(!q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      val left = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi", "left")
      assert(!left.queryExecution.optimizedPlan.toString.contains("_rj_bucket"))
      assert(left.count() >= 400) // every point survives a left join
    } finally spark.conf.unset(RangeJoinRewrite.GranularityKey)
  }
}
