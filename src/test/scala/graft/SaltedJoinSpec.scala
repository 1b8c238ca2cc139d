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

  test("reserved working column collides loudly") {
    intercept[IllegalArgumentException] {
      SaltedJoin.join(skewedFact.withColumn("_salt", lit(1)), dim, "k")
    }
    ()
  }
}
