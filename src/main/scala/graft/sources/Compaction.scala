package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned Parquet tables — the maintenance
  * job that keeps a continuously-appended layout (streaming micro-batches,
  * [[graft.ingest.BatchIngest]] grid appends) scannable. Many small files
  * per partition turn a 100 TB scan into a metadata/open() storm and defeat
  * row-group pruning; compaction rewrites ONLY the partitions that need it,
  * each into ceil(bytes / targetBytes) files.
  *
  * Scale notes (100 TB posture): work is per-partition and embarrassingly
  * parallel across partitions — each rewrite is read(partition) →
  * repartition(n) → write, never a global shuffle; untouched partitions are
  * not read at all, so incremental compaction cost tracks the append rate,
  * not the table size. Crash discipline: the rewrite lands in a temp dir
  * first, the swap is delete-originals-then-move; a crash between the two
  * leaves either the old files or a complete new set plus the temp dir (a
  * re-run heals it) — the same non-transactional contract as dynamic
  * partition overwrite on a filesystem. Table formats with a metadata log
  * (the production choice) make the swap atomic; the partition-local rewrite
  * plan is identical.
  */
object Compaction {

  /** One partition's pre-compaction stats. */
  final case class PartitionStats(dir: String, nFiles: Int, bytes: Long)

  /** Partition dirs of `tableDir` (child dirs named `col=value`). */
  def partitionStats(spark: SparkSession, tableDir: String, partitionCol: String): Seq[PartitionStats] = {
    val fs = FileSystem.get(new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val root = new Path(tableDir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol="))
      .map { st =>
        val files = fs.listStatus(st.getPath).filter(f =>
          f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        PartitionStats(st.getPath.toString, files.length, files.map(_.getLen).sum)
      }
  }

  /** Compact partitions of a `partitionCol`-partitioned Parquet table whose
    * file count exceeds ceil(bytes/targetBytes). Returns (dir, filesBefore,
    * filesAfter) for every rewritten partition. Row content is preserved
    * exactly; file count per rewritten partition becomes
    * max(1, ceil(bytes/targetBytes)).
    */
  def compact(
      spark: SparkSession,
      tableDir: String,
      partitionCol: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val fs = FileSystem.get(new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    partitionStats(spark, tableDir, partitionCol).flatMap { p =>
      val want = math.max(1L, (p.bytes + targetBytes - 1) / targetBytes).toInt
      if (p.nFiles <= want) None
      else {
        val dir = new Path(p.dir)
        val tmp = new Path(p.dir + ".compact_tmp")
        fs.delete(tmp, true)
        spark.read.parquet(p.dir)
          .repartition(want)
          .write.parquet(tmp.toString)
        val fresh = fs.listStatus(tmp).filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        // sanity before destroying anything: the rewrite must have produced
        // the expected file count (a failed/partial write aborts the swap)
        require(fresh.length == want,
          s"compaction rewrite of ${p.dir} produced ${fresh.length} files, expected $want — aborting swap")
        // swap: drop originals, then move the new set in. Every FS call is
        // checked — rename returning false AFTER the deletes would otherwise
        // lose the partition silently (the temp dir still holds the data,
        // but the table would read empty).
        fs.listStatus(dir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .foreach { f =>
            require(fs.delete(f.getPath, false), s"failed to delete ${f.getPath}")
          }
        fresh.foreach { f =>
          require(fs.rename(f.getPath, new Path(dir, f.getPath.getName)),
            s"failed to move ${f.getPath} into $dir — recover from $tmp")
        }
        fs.delete(tmp, true)
        Some((p.dir, p.nFiles, fresh.length))
      }
    }
  }
}
