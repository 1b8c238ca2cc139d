package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Pins the z-order layout triple: the Morton interleave itself, the
  * soundness of manifest pruning (pruned scan ≡ full filter, row for row),
  * and that the clustering actually SKIPS — a box predicate over the
  * z-ordered table opens a strict minority of files.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd) and clamps") {
    val rows = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L),
      ((1L << Layout.ZBits) - 1, 0L),
      (-7L, 1L), // clamps to (0, 1)
      (1L << 40, 0L)) // clamps to (2^ZBits - 1, 0)
      .toDF("a", "b")
    val got = rows.select(Layout.zValue(col("a"), col("b"))).as[Long].collect()

    def interleave(a: Long, b: Long): Long = {
      val max = (1L << Layout.ZBits) - 1
      val (ca, cb) = (a.max(0L).min(max), b.max(0L).min(max))
      (0 until Layout.ZBits).foldLeft(0L) { (acc, i) =>
        acc | (((ca >> i) & 1L) << (2 * i)) | (((cb >> i) & 1L) << (2 * i + 1))
      }
    }
    val want = Seq(
      interleave(0, 0), interleave(1, 0), interleave(0, 1), interleave(3, 3),
      interleave(5, 2), interleave((1L << Layout.ZBits) - 1, 0),
      interleave(0, 1), interleave((1L << Layout.ZBits) - 1, 0))
    assert(got.toSeq == want)
    // spot values: z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert(interleave(1, 0) == 1L && interleave(0, 1) == 2L && interleave(3, 3) == 15L)
  }

  test("pruned scan is row-identical to the full filter and skips most files") {
    val (table, manifest) = Layout.ordersZOrdered(spark, sfDir)

    val epoch = lit("1970-01-01").cast("date")
    val (loA, hiA) = (lit(30L), lit(60L))
    val (loB, hiB) = (
      datediff(lit("1996-01-01").cast("date"), epoch),
      datediff(lit("1997-01-01").cast("date"), epoch))
    val rowFilter = col("o_custkey") >= 30L && col("o_custkey") < 60L &&
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1997-01-01").cast("timestamp")

    val pruned = Layout.prunedScan(spark, table, manifest, loA, hiA, loB, hiB, rowFilter)
      .select("o_orderkey").as[Long].collect().sorted
    val full = Tables.load(spark, sfDir, "orders").where(rowFilter)
      .select("o_orderkey").as[Long].collect().sorted
    assert(pruned.nonEmpty && pruned.toSeq == full.toSeq)

    val total = spark.read.parquet(manifest).count()
    val selected = Layout.selectFiles(spark, manifest, loA, hiA, loB, hiB).size
    assert(selected < total / 2,
      s"z-order should skip most files: selected $selected of $total")
  }

  test("manifest box miss selects zero files and yields an empty result") {
    val (table, manifest) = Layout.ordersZOrdered(spark, sfDir)
    val epoch = lit("1970-01-01").cast("date")
    val (loB, hiB) = (
      datediff(lit("2015-01-01").cast("date"), epoch),
      datediff(lit("2016-01-01").cast("date"), epoch))
    assert(Layout.selectFiles(spark, manifest, lit(0L), lit(100000L), loB, hiB).isEmpty)
    val out = Layout.prunedScan(spark, table, manifest,
      lit(0L), lit(100000L), loB, hiB,
      col("o_orderdate") >= lit("2015-01-01").cast("timestamp"))
    assert(out.count() == 0)
  }
}
