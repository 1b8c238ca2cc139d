package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-visible stored procedures for [[GraftCatalog]] (Spark 4 DSv2
  * `ProcedureCatalog`) — the SQL face of the cross-table transaction API,
  * so a plain JDBC session can do atomic multi-table publishes:
  *
  *   CALL <cat>.system.txn_commit(
  *     id      => 'day_close_7',
  *     tables  => array('positions', 'balances'),
  *     modes   => array('append', 'overwrite'),
  *     queries => array('SELECT ...', 'SELECT ...'))
  *
  * Each query runs in the calling session, the resulting DataFrames go
  * through [[Txn.commitAll]] (stage-all → intent → idempotent tagged
  * publishes → done marker), and the procedure returns one (table,
  * version) row per member. Replaying a completed id returns the recorded
  * versions — CALL is exactly-once per id, like the API. Table names are
  * CATALOG-relative (the same resolution as `<cat>.<table>`); the intent
  * log lives under `<root>/_txn`.
  *
  *   CALL <cat>.system.txn_recover()
  *
  * rolls every crashed transaction forward from its intent record and
  * returns the completed ids.
  */
private[sources] object GraftProcedures {

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  /** Same name-part discipline as GraftCatalog.part: a caller-supplied table
    * name must stay INSIDE the catalog root. Raw `Paths.resolve` would accept
    * `../..`-style or absolute names over the JDBC face and commit TableLog
    * data outside the catalog — reject separators and dot-parts up front.
    */
  private def part(p: String): String = {
    require(p.nonEmpty && !p.contains("/") && !p.contains("\\") &&
      p != ".." && p != ".",
      s"illegal catalog table name '$p' (no separators, '..' or '.')")
    p
  }
  private def strs(r: InternalRow, i: Int): Seq[String] = {
    val a = r.getArray(i)
    (0 until a.numElements()).map(j => a.getUTF8String(j).toString)
  }

  private def resultScan(schema: StructType, out: Seq[InternalRow]): Scan =
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = out.toArray
    }

  private def one(s: Scan): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(s).iterator()

  /** `system.txn_commit(id, tables, modes, queries)` */
  final class TxnCommit(root: String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "txn_commit"
    override def description(): String =
      "atomically commit the queries' results across the named catalog tables"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("id", StringType).build(),
      ProcedureParameter.in("tables", ArrayType(StringType)).build(),
      ProcedureParameter.in("modes", ArrayType(StringType)).build(),
      ProcedureParameter.in("queries", ArrayType(StringType)).build())

    private val outSchema = new StructType()
      .add("table", StringType).add("version", LongType)

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val id = str(input, 0)
      val (tables, modes, queries) = (strs(input, 1), strs(input, 2), strs(input, 3))
      require(tables.nonEmpty && tables.length == modes.length &&
        tables.length == queries.length,
        s"txn_commit: tables/modes/queries must be same-length non-empty arrays " +
          s"(${tables.length}/${modes.length}/${queries.length})")
      modes.foreach(m => require(m == "append" || m == "overwrite",
        s"txn_commit: mode '$m' must be append or overwrite"))
      val spark = SparkSession.active
      val writes = tables.lazyZip(modes).lazyZip(queries).map { (t, m, q) =>
        Txn.Write(spark.sql(q), Paths.get(root).resolve(part(t)).toString,
          overwrite = m == "overwrite")
      }
      val landed = Txn.commitAll(spark, Paths.get(root).resolve("_txn").toString,
        id, writes.toSeq)
      val rows = landed.toSeq.sortBy(_._1).map { case (t, v) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(Paths.get(t).getFileName.toString), v)): InternalRow
      }
      one(resultScan(outSchema, rows))
    }
  }

  /** Shared shape for the MAINTENANCE procedures — storage operations a
    * JDBC-only operator (the dashboarding persona) must be able to run
    * without shell access: OPTIMIZE / ZORDER / VACUUM (+ dry-run plan) /
    * ROLLBACK / TAG / UNTAG, each delegating to the exact [[TableLog]]
    * entry point the CLI uses, so SQL and CLI semantics can never drift
    * (vacuum honors tags, rollback emits the undo change feed, tags are
    * write-once). All take the table name CATALOG-relative through the
    * same [[part]] discipline as `<cat>.<table>`.
    */
  private[sources] abstract class Maintenance(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def table(input: InternalRow, i: Int = 0): String =
      Paths.get(root).resolve(part(str(input, i))).toString
    protected def row(vals: Any*): InternalRow =
      new GenericInternalRow(vals.toArray)
    protected def utf(s: String): UTF8String = UTF8String.fromString(s)
  }

  /** `system.optimize(table, n_files)` — compact the head snapshot */
  final class Optimize(root: String) extends Maintenance(root) {
    override def name(): String = "optimize"
    override def description(): String =
      "compact the table's head snapshot into n_files files (new version)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("n_files", IntegerType).build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TableLog.optimize(SparkSession.active, table(input), input.getInt(1))
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.zorder(table, col_a, col_b, n_files)` */
  final class ZOrder(root: String) extends Maintenance(root) {
    override def name(): String = "zorder"
    override def description(): String =
      "rewrite the head snapshot z-order-clustered on two long columns"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("col_a", StringType).build(),
      ProcedureParameter.in("col_b", StringType).build(),
      ProcedureParameter.in("n_files", IntegerType).build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TableLog.optimizeZOrder(SparkSession.active, table(input),
        str(input, 1), str(input, 2), input.getInt(3))
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.zorder_n(table, columns, n_files)` — N-way Morton clustering */
  final class ZOrderN(root: String) extends Maintenance(root) {
    override def name(): String = "zorder_n"
    override def description(): String =
      "rewrite the head snapshot clustered by the N-way (2..6) Morton " +
        "interleave of long columns; per-file stats cover every dimension"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("columns",
        org.apache.spark.sql.types.ArrayType(StringType)).build(),
      ProcedureParameter.in("n_files", IntegerType).build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val a = input.getArray(1)
      val cols = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      val v = TableLog.optimizeZOrderN(SparkSession.active, table(input),
        cols, input.getInt(2))
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.vacuum(table, keep_versions)` — tag-aware prefix reclaim */
  final class Vacuum(root: String) extends Maintenance(root) {
    override def name(): String = "vacuum"
    override def description(): String =
      "drop manifests older than keep_versions (never past the oldest tag) and " +
        "delete data files no kept version references"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep_versions", IntegerType).build())
    private val out = new StructType()
      .add("versions_dropped", LongType).add("files_deleted", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dropped, files) = TableLog.vacuum(table(input), input.getInt(1))
      one(resultScan(out, Seq(row(dropped.size.toLong, files.toLong))))
    }
  }

  /** `system.vacuum_plan(table, keep_versions)` — dry run, zero mutation */
  final class VacuumPlan(root: String) extends Maintenance(root) {
    override def name(): String = "vacuum_plan"
    override def description(): String =
      "report what vacuum(keep_versions) would reclaim without deleting anything"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep_versions", IntegerType).build())
    private val out = new StructType()
      .add("versions_dropped", LongType).add("files", LongType).add("bytes", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (drop, files, bytes) = TableLog.vacuumPlan(table(input), input.getInt(1))
      one(resultScan(out, Seq(row(drop.size.toLong, files.toLong, bytes))))
    }
  }

  /** `system.clone(src, dst [, version])` — zero-copy shallow clone */
  final class Clone(root: String) extends Maintenance(root) {
    override def name(): String = "clone"
    override def description(): String =
      "hard-link the snapshot's files into a NEW table (zero-copy dev branch); " +
        "stats/row-counts/constraints carry, tags and NDV do not"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("src", StringType).build(),
      ProcedureParameter.in("dst", StringType).build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1").build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val asOf = if (input.isNullAt(2) || input.getLong(2) < 0) None
                 else Some(input.getLong(2))
      val v = TableLog.cloneTable(table(input), table(input, 1), asOf)
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.analyze(table, columns)` — footer-only stats sidecar build */
  final class Analyze(root: String) extends Maintenance(root) {
    override def name(): String = "analyze"
    override def description(): String =
      "build the per-file [min,max] stats sidecar at head from parquet " +
        "footers (INT64 columns; enables file skipping + metadata min/max)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("columns",
        org.apache.spark.sql.types.ArrayType(StringType)).build())
    private val out = new StructType().add("stat_lines", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val a = input.getArray(1)
      val cols = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      val n = TableLog.buildStatsIndex(table(input), cols)
      one(resultScan(out, Seq(row(n.toLong))))
    }
  }

  /** `system.optimize_size(table, target_bytes)` — size-targeted compaction */
  final class OptimizeSize(root: String) extends Maintenance(root) {
    override def name(): String = "optimize_size"
    override def description(): String =
      "compact the head snapshot toward target_bytes per file (new version)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("target_bytes", LongType).build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TableLog.optimizeToSize(SparkSession.active, table(input),
        input.getLong(1))
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.build_bloom(table, column)` — Bloom sidecar for point skips */
  final class BuildBloom(root: String) extends Maintenance(root) {
    override def name(): String = "build_bloom"
    override def description(): String =
      "build/refresh the per-file Bloom sidecar on a column (point-lookup " +
        "file skipping on unordered layouts)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("column", StringType).build())
    private val out = new StructType().add("files_indexed", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val n = TableLog.buildBloomIndex(SparkSession.active, table(input), str(input, 1))
      one(resultScan(out, Seq(row(n.toLong))))
    }
  }

  /** `system.build_ndv(table, columns)` — planner NDV estimates */
  final class BuildNdv(root: String) extends Maintenance(root) {
    override def name(): String = "build_ndv"
    override def description(): String =
      "build/refresh the per-column NDV sidecar at head (cost-based " +
        "broadcast evidence; planner metadata, never correctness)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("columns",
        org.apache.spark.sql.types.ArrayType(StringType)).build())
    private val out = new StructType().add("columns_indexed", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val a = input.getArray(1)
      val cols = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      TableLog.buildNdvIndex(SparkSession.active, table(input), cols)
      one(resultScan(out, Seq(row(cols.size.toLong))))
    }
  }

  /** `system.backup(table, dest_dir [, version])` — checksummed DR export.
    * `dest_dir` is a raw path by design: a backup's whole point is leaving
    * the catalog root (the caller's session already holds filesystem
    * authority; this is the CLI's exact semantics over JDBC).
    */
  final class Backup(root: String) extends Maintenance(root) {
    override def name(): String = "backup"
    override def description(): String =
      "export the snapshot as a self-contained checksummed backup directory"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("dest_dir", StringType).build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1").build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val asOf = if (input.isNullAt(2) || input.getLong(2) < 0) None
                 else Some(input.getLong(2))
      val v = TableLog.backup(SparkSession.active, table(input), str(input, 1), asOf)
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.restore(backup_dir, table)` — integrity-checked re-import */
  final class Restore(root: String) extends Maintenance(root) {
    override def name(): String = "restore"
    override def description(): String =
      "verify a backup's manifest (count + checksum) and commit it as a " +
        "fresh catalog table; a corrupted backup is refused"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("backup_dir", StringType).build(),
      ProcedureParameter.in("table", StringType).build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TableLog.restore(SparkSession.active, str(input, 0), table(input, 1))
      one(resultScan(out, Seq(row(v))))
    }
  }

  /** `system.rollback(table, to_version)` — restore by republishing */
  final class Rollback(root: String) extends Maintenance(root) {
    override def name(): String = "rollback"
    override def description(): String =
      "publish to_version's manifest as a new head (history stays time-travelable)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("to_version", LongType).build())
    private val out = new StructType().add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      one(resultScan(out,
        Seq(row(TableLog.rollbackTo(table(input), input.getLong(1))))))
  }

  /** `system.tag(table, tag, version)` — write-once named snapshot */
  final class Tag(root: String) extends Maintenance(root) {
    override def name(): String = "tag"
    override def description(): String =
      "name a committed version (vacuum-protected; resolve via VERSION AS OF '<tag>')"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("tag", StringType).build(),
      ProcedureParameter.in("version", LongType).build())
    private val out = new StructType()
      .add("tag", StringType).add("version", LongType)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (t, v) = (str(input, 1), input.getLong(2))
      TableLog.tagVersion(table(input), t, v)
      one(resultScan(out, Seq(row(utf(t), v))))
    }
  }

  /** `system.untag(table, tag)` — release a named snapshot */
  final class Untag(root: String) extends Maintenance(root) {
    override def name(): String = "untag"
    override def description(): String =
      "remove a tag; its version becomes vacuumable again"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("tag", StringType).build())
    private val out = new StructType().add("removed", BooleanType)
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      one(resultScan(out,
        Seq(row(TableLog.untagVersion(table(input), str(input, 1))))))
  }

  /** `system.txn_recover()` */
  final class TxnRecover(root: String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "txn_recover"
    override def description(): String =
      "roll crashed cross-table transactions forward from their intent records"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array.empty

    private val outSchema = new StructType().add("txn_id", StringType)

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ids = Txn.recover(SparkSession.active,
        Paths.get(root).resolve("_txn").toString)
      one(resultScan(outSchema, ids.map(id =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(id))): InternalRow)))
    }
  }
}
