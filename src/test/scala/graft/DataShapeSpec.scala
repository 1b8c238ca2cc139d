package graft

import org.apache.spark.sql.functions.col

/** Layout-independence proof (SURVEY §2.8's claim made executable): every
  * query must return IDENTICAL results whether the input parquet is the
  * driver's single-file single-row-group testdata or a production-shaped
  * multi-file multi-row-group layout — i.e. `Tables.loadSpread` is a
  * local-mode parallelism crutch compensating for input layout, never
  * load-bearing semantics, and no query output depends on partitioning,
  * task count, or row order of the scan.
  *
  * The reshaped copy repartitions each table into 3 files written with a
  * 64 KB parquet block size, so each file carries MANY row groups (the
  * testdata ships exactly one per table) — both axes of layout change at
  * once. Representative queries cover the plain-load scan-adjacent
  * aggregate, loadSpread UDF pipelines (shingle hashing, tokenization),
  * a double-emitting analysis, and the iterative graph family.
  */
class DataShapeSpec extends SparkSpec {

  private lazy val shapedDir: String = {
    val out = Scratch.dir("reshape", sfDir)
    val p = java.nio.file.Paths.get(out)
    if (!java.nio.file.Files.isDirectory(p)) {
      java.nio.file.Files.createDirectories(p)
      Tables.All.foreach { t =>
        Tables.load(spark, sfDir, t)
          .repartition(3)
          .write.mode("overwrite")
          .option("parquet.block.size", 64 * 1024)
          .parquet(s"$out/$t.parquet")
      }
    }
    out
  }

  private def canon(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toString).sorted.toSeq

  test("reshaped tables really are multi-file and multi-row-group") {
    val files = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$shapedDir/lineitem.parquet"))
      .iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (files.hasNext) names += files.next().getFileName.toString
    assert(names.count(_.endsWith(".parquet")) >= 2, s"expected >=2 data files, got $names")
    // >1 row group ⇔ >1 scan task without any repartition (row-group
    // midpoint rule): with a 64 KB block size the scan must split
    val parts = spark.read.parquet(s"$shapedDir/lineitem.parquet")
      .rdd.getNumPartitions
    assert(parts > 1, s"expected a multi-split scan, got $parts partition(s)")
    val a = Tables.load(spark, sfDir, "lineitem").count()
    val b = Tables.load(spark, shapedDir, "lineitem").count()
    assert(a == b, s"reshape must preserve rows: $a vs $b")
  }

  test("representative queries are layout-invariant (no loadSpread semantics)") {
    val picks = Seq(
      "q1_pricing_summary", // plain load, scan-adjacent decimal agg
      "a1_volatility",      // double-emitting analysis over events
      "dedup_minhash",      // loadSpread + shingle/minhash UDF pipeline
      "text_quality",       // loadSpread + tokenizer scoring
      "graph_pagerank",     // cached iterative joins
      "ind_macd",           // sequential per-key double fold (order-sensitive if wrong)
      "dataset_card",       // multi-leg hash/histogram composition
      "ann_hamming_topk",   // sign-sketch fold + broadcast probe join
      "hopping_window_agg", // window-TVF Expand multiplicity
      "ts_matrix_profile",  // collect_list ordering under multi-split scans
      "curriculum_order")   // bucket windows + broadcast prefix offsets
    picks.foreach { q =>
      assert(canon(q, shapedDir) == canon(q, sfDir), s"$q differs across layouts")
    }
  }
}
