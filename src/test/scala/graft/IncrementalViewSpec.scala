package graft

import graft.sources.{IncrementalView, TableLog}
import org.apache.spark.sql.functions._

/** Laws for the incremental join-view maintenance beyond the final-state
  * oracle gate: version k of the view must equal a from-scratch recompute
  * over the first k+1 batches (the self-maintainability identity, batch by
  * batch), and the delta merge must treat an absent group as the additive
  * identity.
  */
class IncrementalViewSpec extends SparkSpec {

  private def recompute(upTo: Int) = {
    val orders = Tables.load(spark, sfDir, "orders")
      .where((0 to upTo).map(IncrementalView.batchPredicate).reduce(_ || _))
    orders
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
          .as("revenue_cents"))
  }

  test("every view version equals the from-scratch recompute of its batch prefix") {
    val table = IncrementalView.revenueMv(spark, sfDir)
    val versions = TableLog.versions(table)
    assert(versions.size == 3, s"one version per batch, got $versions")
    versions.zipWithIndex.foreach { case (v, i) =>
      val mv  = TableLog.read(spark, table, Some(v))
      val ref = recompute(i)
      assert(mv.count() == ref.count(), s"v$v row count")
      assert(mv.except(ref).isEmpty && ref.except(mv).isEmpty,
        s"view v$v diverges from prefix recompute")
    }
  }

  test("delta merge: merging an empty delta is the identity; disjoint groups union") {
    import spark.implicits._
    val mv = Seq(("A", "P1", 2L, 100L), ("B", "P2", 1L, 50L))
      .toDF("n_name", "o_orderpriority", "n_orders", "revenue_cents")
    val empty = mv.where(lit(false))
    val same = IncrementalView.mergeDelta(mv, empty,
      IncrementalView.viewKeys, IncrementalView.viewSums)
    assert(same.except(mv).isEmpty && mv.except(same).isEmpty)

    val delta = Seq(("A", "P1", 1L, 25L), ("C", "P9", 4L, 400L))
      .toDF("n_name", "o_orderpriority", "n_orders", "revenue_cents")
    val merged = IncrementalView.mergeDelta(mv, delta,
      IncrementalView.viewKeys, IncrementalView.viewSums)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(merged(("A", "P1")) == ((3L, 125L)), "overlapping group adds")
    assert(merged(("B", "P2")) == ((1L, 50L)), "untouched group unchanged")
    assert(merged(("C", "P9")) == ((4L, 400L)), "new group appears")
  }
}
