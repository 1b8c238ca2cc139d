package graft.sources

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view over the table log —
  * the delta-processing discipline every warehouse MV engine implements:
  * when a batch of fact rows arrives, the view is refreshed by joining and
  * aggregating ONLY the delta, then additively merging the partial
  * aggregate into the stored view (count/sum are abelian, so
  * MV(R ∪ ΔR) = MV(R) ⊕ MV(ΔR) — the classic self-maintainable-view
  * identity for insert-only facts against a static dimension). The full
  * fact table is never re-read after its batch lands.
  *
  * The streaming twin is the incremental rollup pinned by
  * IncrementalAggSpec (engine-managed state); here the state is an
  * EXPLICIT [[TableLog]] table, so every refresh is atomic, versioned and
  * time-travelable — version k of the view IS the view of the first k+1
  * batches, which the spec asserts against prefix recomputes.
  *
  * 100 TB shape: the per-batch work is one broadcast join of the delta
  * against the dim and one partial aggregate of DELTA-sized input; the
  * merge reads only the aggregated view (bounded by group cardinality, not
  * fact rows) full-outer-joined with the delta aggregate on the group key.
  * Nothing fact-sized is ever re-shuffled, and the view rewrite cost is
  * O(|groups|) per batch.
  */
object IncrementalView extends QueryPack {

  private[graft] val viewKeys = Seq("n_name", "o_orderpriority")
  private[graft] val viewSums = Seq("n_orders", "revenue_cents")

  /** ΔMV merge: full-outer on the group key, absent side contributes the
    * additive identity. Works for any count/sum-shaped view.
    */
  private[graft] def mergeDelta(
      mv: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    val d = sums.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"_d_$c"))
    mv.join(d, keys, "full_outer")
      .select(keys.map(col) ++ sums.map(c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L))).as(c)): _*)
  }

  /** customer → nation dimension (broadcast side of every delta join) */
  private def dim(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))

  /** the three insert batches the build replays (hash-split so every batch
    * hits every group — the worst case for a merge, unlike a date split)
    */
  private[graft] def batchPredicate(i: Int) = col("o_orderkey") % 3 === i

  private def deltaAgg(batch: DataFrame, d: DataFrame): DataFrame =
    batch.join(broadcast(d), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name", "o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
          .as("revenue_cents"))

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** replay 3 insert batches through the incremental path, memoized per
    * data dir; returns the table-log path of the maintained view
    */
  private[graft] def revenueMv(s: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, { d =>
      val table = graft.Scratch.dir("graft_ivm", d) + "/rev_mv"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(table))
      val orders = Tables.load(s, d, "orders")
      val dimDf = dim(s, d)
      (0 until 3).foreach { i =>
        val delta = deltaAgg(orders.where(batchPredicate(i)), dimDf)
        val next =
          if (TableLog.versions(table).isEmpty) delta
          else mergeDelta(TableLog.read(s, table), delta, viewKeys, viewSums)
        TableLog.commitOverwrite(next, table)
        ()
      }
      table
    })

  /** the maintained view after all batches — the oracle recomputes it from
    * scratch over the full fact, so the gate proves the delta-merge path
    * reaches the same state as a full refresh
    */
  def ivmJoinView(s: SparkSession, dir: String): DataFrame =
    TableLog.read(s, revenueMv(s, dir))
      .select(col("n_name"), col("o_orderpriority"),
        col("n_orders"), col("revenue_cents"))

  private val ivmJoinViewSql =
    """SELECT n_name, o_orderpriority, count(*) AS n_orders,
      |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("ivm_join_view", ivmJoinView, Some(ivmJoinViewSql)))
}
