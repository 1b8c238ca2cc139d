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
  * not the table size.
  *
  * Crash discipline (filesystem, non-transactional): working dirs are
  * DOT-PREFIXED so Spark's file index and [[partitionStats]] never see them
  * as data. The swap per partition is: write `.compact_tmp_<part>` → move
  * originals to `.compact_trash_<part>` → move fresh files in → drop both
  * working dirs. Every FS call is checked, and [[compact]] begins by HEALING
  * any leftover trash dir (restoring the originals) from a previous crash,
  * so a re-run always converges to a consistent table whichever window the
  * crash hit. Table formats with a metadata log (the production choice) make
  * the swap atomic; the partition-local rewrite plan is identical.
  */
object Compaction {

  /** One partition's pre-compaction stats. */
  final case class PartitionStats(dir: String, nFiles: Int, bytes: Long)

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))

  /** Partition dirs of `tableDir` (child dirs named `col=value`). */
  def partitionStats(spark: SparkSession, tableDir: String, partitionCol: String): Seq[PartitionStats] = {
    val fs = fsFor(spark, tableDir)
    val root = new Path(tableDir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol="))
      .map { st =>
        val files = dataFiles(fs, st.getPath)
        PartitionStats(st.getPath.toString, files.length, files.map(_.getLen).sum)
      }
  }

  /** Restore originals from any `.compact_trash_*` left by a crashed run:
    * files are moved back into their partition dir (skipping names a
    * completed swap already replaced), then the trash dir is dropped.
    */
  private def heal(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".compact_trash_"))
      .foreach { st =>
        val part = new Path(root, st.getPath.getName.stripPrefix(".compact_trash_"))
        fs.mkdirs(part)
        fs.listStatus(st.getPath).filter(_.isFile).foreach { f =>
          val dst = new Path(part, f.getPath.getName)
          if (!fs.exists(dst))
            require(fs.rename(f.getPath, dst), s"heal: failed to restore ${f.getPath}")
        }
        fs.delete(st.getPath, true); ()
      }
  }

  /** Compact partitions of a `partitionCol`-partitioned Parquet table whose
    * file count exceeds ceil(bytes/targetBytes). Returns (dir, filesBefore,
    * filesAfter) for every rewritten partition. Row content is preserved
    * exactly; rewritten partitions end with at most max(1,
    * ceil(bytes/targetBytes)) files (fewer when Spark skips empty slots).
    */
  def compact(
      spark: SparkSession,
      tableDir: String,
      partitionCol: String,
      targetBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val fs = fsFor(spark, tableDir)
    heal(fs, new Path(tableDir))
    partitionStats(spark, tableDir, partitionCol).flatMap { p =>
      val want = math.max(1L, (p.bytes + targetBytes - 1) / targetBytes).toInt
      if (p.nFiles <= want) None
      else {
        val dir = new Path(p.dir)
        val root = dir.getParent
        val tmp = new Path(root, s".compact_tmp_${dir.getName}")
        val trash = new Path(root, s".compact_trash_${dir.getName}")
        fs.delete(tmp, true)
        spark.read.parquet(p.dir)
          .repartition(want)
          .write.parquet(tmp.toString)
        val fresh = fs.listStatus(tmp).filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        // a failed/partial rewrite aborts BEFORE anything is destroyed
        // (Spark skips empty slots, so fewer than `want` files is legal)
        require(fresh.nonEmpty && fresh.length <= want,
          s"compaction rewrite of ${p.dir} produced ${fresh.length} files (want ≤ $want) — aborting swap")
        // swap: originals to trash, fresh in, then drop the working dirs; a
        // crash at any point is recovered by heal() on the next run
        fs.mkdirs(trash)
        dataFiles(fs, dir).foreach { f =>
          require(fs.rename(f.getPath, new Path(trash, f.getPath.getName)),
            s"failed to move ${f.getPath} to trash")
        }
        fresh.foreach { f =>
          require(fs.rename(f.getPath, new Path(dir, f.getPath.getName)),
            s"failed to move ${f.getPath} into $dir — originals in $trash")
        }
        fs.delete(trash, true)
        fs.delete(tmp, true)
        Some((p.dir, p.nFiles, fresh.length))
      }
    }
  }
}
