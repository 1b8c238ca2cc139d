package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Pins the persisted-IVF-index contract: result identity with the
  * in-memory ivfTopK (same deterministic seed centroids) and dynamic
  * partition pruning of the probed cells.
  */
class IvfIndexSpec extends SparkSpec {

  private val path = "/tmp/graft_test_ivf_index"

  test("persisted IVF index reproduces ivfTopK exactly and prunes cells") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path))
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.writeIvfIndex(emb, path)

    // the cells table is cell-partitioned on disk
    val cellDirs = new java.io.File(s"$path/cells").listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.length > 1, "index must be partitioned by cell")

    val queries = emb.orderBy("vec_id").limit(Similarity.NumQueries)
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val fromIndex = indexed.collect().map(key).toSet
    val inMemory = Similarity.ivfTopK(spark, sfDir).collect().map(key).toSet
    assert(fromIndex == inMemory && fromIndex.nonEmpty)

    // the member scan carries a static cell IN (...) partition filter
    val plan = indexed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("graft_test_ivf_index/cells") && l.contains("PartitionFilters"))
    assert(scanLine.exists(l => l.contains("cell") && l.toLowerCase.contains(" in ")
        || scanLine.exists(_.matches(".*PartitionFilters: \\[.*cell.*(IN|in).*"))),
      s"probed-cell scan should carry a static IN partition filter:\n$plan")
  }
}
