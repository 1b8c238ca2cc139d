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

  test("CDC merge: retractions shrink groups and a zero-support group vanishes") {
    import spark.implicits._
    val keys = Seq("o_orderpriority")
    val sums = IncrementalView.viewSums
    val mv = Seq(("P1", 2L, 100L), ("P2", 1L, 50L), ("P3", 3L, 300L))
      .toDF("o_orderpriority", "n_orders", "revenue_cents")
    // delete one P1 row, delete THE P2 row (support hits zero), and move a
    // P3 row to P9 (update = retract leg + insert leg)
    val delta = Seq(
      ("P1", -1L, -40L), ("P2", -1L, -50L),
      ("P3", -1L, -100L), ("P9", 1L, 100L))
      .toDF("o_orderpriority", "n_orders", "revenue_cents")
    val merged = IncrementalView.mergeCdc(mv, delta, keys, sums, "n_orders")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged("P1") == ((1L, 60L)), "retraction shrinks the group")
    assert(!merged.contains("P2"), "zero-support group must vanish, as in a recompute")
    assert(merged("P3") == ((2L, 200L)) && merged("P9") == ((1L, 100L)),
      "update moves mass between groups")
  }

  test("every CDC view version equals the from-scratch recompute of its live set") {
    val table = IncrementalView.cdcMv(spark, sfDir)
    val versions = TableLog.versions(table)
    assert(versions.size == 3, s"one version per CDC batch, got $versions")
    // the oracle re-derives each version; here pin the retraction effects
    // structurally: deletes REDUCE totals at v1 (vs v0+batch1 inserts alone)
    // and the group-moving update creates the U-RECLASS group only at v2
    def totals(v: Long) = TableLog.read(spark, table, Some(v))
      .agg(sum("n_orders")).collect()(0).getLong(0)
    val orders = Tables.load(spark, sfDir, "orders")
    val n0 = orders.where(col("o_orderkey") % 3 === 0).count()
    val n1ins = orders.where(col("o_orderkey") % 3 === 1).count()
    val n1del = orders.where(col("o_orderkey") % 3 === 0 && col("o_orderkey") % 5 === 0).count()
    assert(totals(0L) == n0)
    assert(n1del > 0, "vacuous: the delete batch must delete something")
    assert(totals(1L) == n0 + n1ins - n1del, "v1 totals must reflect the deletes")
    val reclass = TableLog.read(spark, table, Some(2L))
      .where(col("o_orderpriority") === "U-RECLASS").count()
    assert(reclass == 1L, "updates must have moved rows into the reclassified group")
    val v01 = (0L to 1L).flatMap(v => TableLog.read(spark, table, Some(v))
      .where(col("o_orderpriority") === "U-RECLASS").collect())
    assert(v01.isEmpty, "reclassified group must not exist before the update batch")
  }

  test("minmax CDC view: partial recompute matches full refresh; both paths exercised") {
    val rows = IncrementalView.ivmMinmaxView(spark, sfDir).collect()
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("pc"))
    def liveState(pred: org.apache.spark.sql.Column, reclass: Boolean) = {
      val lv = if (reclass)
        orders.where(pred).select(
          when(col("k") % 7 === 0, lit("U-RECLASS")).otherwise(col("pr")).as("pr"), col("pc"))
      else orders.where(pred).select(col("pr"), col("pc"))
      lv.groupBy("pr").agg(count(lit(1)).as("n"), min("pc").as("mn"), max("pc").as("mx"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    }
    val preds = Seq(
      (col("k") % 3 === 0, false),
      ((col("k") % 3 === 0 && col("k") % 5 =!= 0) || col("k") % 3 === 1, false),
      ((col("k") % 3 === 0 && col("k") % 5 =!= 0) ||
        (col("k") % 3 === 1 && col("k") % 5 =!= 0) || col("k") % 3 === 2, true))
    preds.zipWithIndex.foreach { case ((p, rc), v) =>
      val expect = liveState(p, rc)
      val got = rows.filter(_.getLong(0) == v.toLong)
        .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expect, s"version $v state diverges from the full refresh")
    }
    // the delete batches must exercise BOTH maintenance paths: untouched
    // extrema merge cleanly, tied extrema re-aggregate
    Seq(1L, 2L).foreach { v =>
      val flags = rows.filter(_.getLong(0) == v).map(_.getLong(5)).toSet
      assert(flags == Set(0L, 1L),
        s"version $v should have both clean and recomputed groups, got $flags")
    }
  }
}
