package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Pins the salted-join contract: result identity with the plain join,
  * reserved-column guard, and the actual key-spreading (the reason the
  * operator exists).
  */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def skewedFact = (1 to 1000).map { i =>
    val k = if (i % 10 < 8) 0L else (i % 5 + 1).toLong // 80% on key 0
    (k, i.toLong)
  }.toDF("k", "v")

  private def dim = (0L to 5L).map(k => (k, s"name$k")).toDF("k", "label")

  test("salted join returns exactly the plain join's rows") {
    val plain = skewedFact.join(dim, "k")
      .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SaltedJoin.join(skewedFact, dim, "k", salts = 8)
      .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("the hot key's rows spread across many (key, salt) shuffle groups") {
    // with broadcast off, the join shuffles on (k, _salt): the hot key must
    // occupy `salts` distinct groups instead of one
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salts = 8
      val joined = SaltedJoin.join(skewedFact, dim, "k", salts)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), s"salt column must reach the join:\n$plan")
      // group count per key as seen by the shuffle: reconstruct the salt
      val groups = skewedFact
        .withColumn("_salt", pmod(hash(skewedFact.columns.map(col): _*), lit(salts)))
        .where(col("k") === 0L)
        .select("_salt").distinct().count()
      assert(groups == salts, s"hot key should spread over $salts salt groups, got $groups")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE's native skew-join splits the same hot partition — the zero-code alternative") {
    // Documents when the manual operator is needed at all: on a batch
    // sort-merge plan AQE's runtime re-plan splits the skewed partition by
    // itself (plan shows "skew=true"), and returns exactly the salted
    // join's rows. The manual salt remains for the cases AQE can't reach —
    // broadcast-ineligible streaming joins and known-hot keys where the
    // first-pass materialization of the skewed shuffle files is the cost.
    val tuned = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // toy-scale thresholds: the hot key's partition is ~100 KB, so mark
      // partitions skewed past 2 KB and split at a 1 KB advisory size
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val bigFact = (1 to 5000).map { i =>
        val k = if (i % 10 < 8) 0L else (i % 5 + 1).toLong
        (k, i.toLong)
      }.toDF("k", "v")
      val joined = bigFact.join(dim, "k").select("k", "v", "label")
      // AQE finalizes on execution: collect the SAME QueryExecution first
      // (.as[...] would plan a fresh one), then read the final
      // (pre-"Initial Plan") section (CLAUDE.md rule)
      val aqeRows = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val finalPlan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the join skew-optimized in the final plan:\n$finalPlan")
      val saltedRows = SaltedJoin.join(bigFact, dim, "k", salts = 8)
        .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
      assert(aqeRows == saltedRows && aqeRows.nonEmpty,
        "AQE skew-join and manual salted join must return identical rows")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("reserved working column collides loudly") {
    intercept[IllegalArgumentException] {
      SaltedJoin.join(skewedFact.withColumn("_salt", lit(1)), dim, "k")
    }
    ()
  }
}
