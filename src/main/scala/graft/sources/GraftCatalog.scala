package graft.sources

import java.nio.file.{Files, Paths}
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 `TableCatalog` over a directory of [[TableLog]] tables — the SQL
  * face of the engine's own storage, completing the serving story (the
  * reference's Grafana→store role): after
  * `spark.sql.catalog.graft = graft.sources.GraftCatalog` and
  * `spark.sql.catalog.graft.root = <dir>`, any SQL client (including JDBC
  * sessions through [[graft.Serve]]) can run
  *
  *   SELECT ... FROM graft.<table>                      -- latest snapshot
  *   SELECT ... FROM graft.<table> VERSION AS OF 3      -- time travel
  *   SELECT ... FROM graft.<table> TIMESTAMP AS OF ...  -- commit-time travel
  *   SELECT count(*) FROM graft.<table>                 -- ZERO data files read
  *
  * with snapshot isolation (the file list pins at plan time), DV
  * merge-on-read (deleted positions subtracted per file), schema-evolution
  * reads (merged live-file footers), and `count(*)` answered entirely from
  * the log's recorded per-file row counts via complete aggregate pushdown
  * ([[TableLog.metadataCount]] — manifests and footers only, no scan).
  *
  * 100 TB posture: every catalog operation is metadata-sized (manifest
  * lists, parquet footers); the scan reports metadata-exact statistics
  * (row count + live bytes) so Catalyst's broadcast decision for log-table
  * joins is driven by REAL stats, not a default guess. The catalog is
  * read-only by design — writes go through [[TableLog]]'s commit protocol
  * (optimistic concurrency, constraints, stats), which a SQL INSERT could
  * not honor piecemeal.
  *
  * Current read-path limits (documented, not silent): scalar columns only
  * (the per-file reader is the change source's Group-API reader — project
  * around nested/array columns, which is what SQL analytics over log
  * tables needs), and filters evaluate post-scan (stats/bloom pruning
  * stays on the [[TableLog.readPruned]] API path).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog '$name' requires spark.sql.catalog.$name.root = <directory of table logs>"))
  }

  override def name(): String = catalogName

  private def part(p: String): String = {
    require(p.nonEmpty && !p.contains("/") && !p.contains("\\") && p != ".." && p != ".",
      s"illegal catalog name part '$p'")
    p
  }

  private def tablePath(ident: Identifier): String =
    (ident.namespace.toSeq :+ ident.name)
      .foldLeft(Paths.get(root))((d, n) => d.resolve(part(n))).toString

  private def nsPath(namespace: Array[String]) =
    namespace.toSeq.foldLeft(Paths.get(root))((d, n) => d.resolve(part(n)))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace.toSeq)
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(d => TableLog.versions(d.toString).nonEmpty)
      .map(d => Identifier.of(namespace, d.getFileName.toString))
      .toArray
    finally st.close()
  }

  override def tableExists(ident: Identifier): Boolean =
    TableLog.versions(tablePath(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$catalogName: VERSION AS OF takes a commit version number, got '$version'")
    }
    load(ident, Some(v))
  }

  /** `TIMESTAMP AS OF <t>` — the latest version committed at or before the
    * requested instant (micros), from the manifests' publish times
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    val vs = TableLog.versions(p)
    if (vs.isEmpty) throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    val at = vs.filter(v => TableLog.versionCommitTimeMicros(p, v) <= timestamp)
    require(at.nonEmpty,
      s"no version of ${ident.name} committed at or before timestamp $timestamp")
    load(ident, Some(at.last))
  }

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    val p = tablePath(ident)
    val vs = TableLog.versions(p)
    if (vs.isEmpty) throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v),
      s"version $v of ${ident.name} not in committed set ${vs.mkString(",")}")
    new GraftLogTable(s"$catalogName.${ident.name}" +
      asOf.map(a => s"@v$a").getOrElse(""), p, v)
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"catalog '$catalogName' is read-only: write through graft.sources.TableLog " +
      "(commitAppend/commitOverwrite/deleteWhere), whose commit protocol SQL DDL cannot honor")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly

  // ---- SupportsNamespaces (directories under root) --------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val st = Files.list(Paths.get(root))
    try st.iterator().asScala
      .filter(d => Files.isDirectory(d) && TableLog.versions(d.toString).isEmpty)
      .map(d => Array(d.getFileName.toString)).toArray
    finally st.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (Files.isDirectory(nsPath(namespace))) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || Files.isDirectory(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = readOnly
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = readOnly
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = readOnly
}

/** One [[TableLog]] table pinned at one version — the snapshot-isolation
  * unit: the catalog resolves the version at load, so every scan this table
  * produces reads exactly that manifest's files no matter what commits land
  * mid-query.
  */
private[sources] class GraftLogTable(ident: String, path: String, v: Long)
    extends Table with SupportsRead {

  override def name(): String = ident

  override lazy val schema: StructType = {
    val files = TableLog.liveFilePaths(path, v)
    if (files.isEmpty) new StructType()
    // merged footers: the schema-evolution union read() uses, minus nothing
    else SparkSession.active.read.option("mergeSchema", true).parquet(files: _*).schema
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScanBuilder(path, v, schema)
}

private[sources] class GraftLogScanBuilder(path: String, v: Long, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushedCount = false
  private var pushedSkips: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var keepFiles: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** FILE SKIPPING from the log's metadata indexes: comparison filters
    * consult the per-file min/max stats sidecar, equality/IN additionally
    * the per-file Bloom sidecar — so a selective SQL predicate over a
    * clustered (or bloom-indexed) log table reads O(matching files), not
    * O(table), exactly like [[TableLog.readPruned]] /
    * [[TableLog.readPointLookup]] but decided by Catalyst's pushdown.
    * EVERY filter is also returned as a residual (rows re-filtered
    * post-scan), so skipping only needs to be SOUND (keep any file that
    * might match; sidecar-less files are always kept). Range bounds stay
    * inclusive — conservative at the boundary, immune to overflow.
    */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    val all = TableLog.liveFiles(path, v).toSet
    var kept: Set[String] = all
    val used = scala.collection.mutable.ArrayBuffer.empty[Filter]
    def longOf(x: Any): Option[Long] = x match {
      case n: Long => Some(n)
      case n: Int => Some(n.toLong)
      case n: Short => Some(n.toLong)
      case n: Byte => Some(n.toLong)
      case _ => None
    }
    // bloom values are indexed via CAST(col AS STRING): integral and string
    // renderings are stable across that cast, other types are not pushed
    def strOf(x: Any): Option[String] = x match {
      case s: String => Some(s)
      case other => longOf(other).map(_.toString)
    }
    def statRange(c: String, lo: Long, hi: Long): Boolean =
      TableLog.hasStatsFor(path, v, c) && {
        kept = kept.intersect(
          TableLog.prunedFiles(path, c, lo, hi, Some(v))._1.toSet)
        true
      }
    def bloomEq(c: String, s: String): Boolean =
      TableLog.hasBloomFor(path, c) && {
        kept = kept.intersect(
          TableLog.pointLookupFiles(path, c, s, Some(v))._1.toSet)
        true
      }
    filters.foreach { f =>
      val usable = f match {
        case EqualTo(c, x) =>
          val st = longOf(x).exists(n => statRange(c, n, n))
          val bl = strOf(x).exists(s => bloomEq(c, s))
          st || bl
        case GreaterThan(c, x) => longOf(x).exists(n => statRange(c, n, Long.MaxValue))
        case GreaterThanOrEqual(c, x) => longOf(x).exists(n => statRange(c, n, Long.MaxValue))
        case LessThan(c, x) => longOf(x).exists(n => statRange(c, Long.MinValue, n))
        case LessThanOrEqual(c, x) => longOf(x).exists(n => statRange(c, Long.MinValue, n))
        case In(c, xs) if xs.nonEmpty =>
          val ns = xs.flatMap(longOf)
          val st = ns.length == xs.length && statRange(c, ns.min, ns.max)
          val ss = xs.flatMap(strOf)
          val bl = ss.length == xs.length && TableLog.hasBloomFor(path, c) && {
            // union of the per-value bloom keeps — a file survives if it
            // may contain ANY of the listed values
            kept = kept.intersect(ss.toSet.flatMap((s: String) =>
              TableLog.pointLookupFiles(path, c, s, Some(v))._1.toSet))
            true
          }
          st || bl
        case _ => false
      }
      if (usable) used += f
    }
    pushedSkips = used.toArray
    keepFiles = if (kept == all) None else Some(kept)
    filters // all residual: exact row filtering always happens post-scan
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushedSkips

  /** `count(*)` with no grouping answers from the log's recorded per-file
    * row counts minus DV rows — COMPLETE pushdown, zero data files read.
    * (Spark only offers the aggregate when every filter was pushed; this
    * source pushes none, so a filtered count correctly stays a scan.)
    */
  private def metadataCount(agg: Aggregation): Option[Long] =
    if (agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar])
      TableLog.metadataCount(path, Some(v))
    else None

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    metadataCount(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    pushedCount = metadataCount(agg).isDefined
    pushedCount
  }

  override def build(): Scan =
    if (pushedCount) new GraftMetadataCountScan(path, v)
    else new GraftLogScan(path, v, required, keepFiles)
}

/** Snapshot scan: one partition per live data file, DV positions shipped as
  * metadata-sized sorted skip lists, rows decoded by the change source's
  * per-file reader (no change-meta columns requested → pure data rows).
  * Reports metadata-exact statistics so join planning (broadcast side
  * choice) runs on real numbers.
  */
private[sources] class GraftLogScan(path: String, v: Long, required: StructType,
    keepFiles: Option[Set[String]] = None)
    extends Scan with Batch with SupportsReportStatistics {

  /** live files after metadata file-skipping (None = no skipping filter) */
  private def files: Seq[String] =
    keepFiles match {
      case None => TableLog.liveFiles(path, v)
      case Some(k) => TableLog.liveFiles(path, v).filter(k)
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val total = TableLog.liveFiles(path, v).size
    s"GraftLogScan($path@v$v, files=${files.size}/$total)"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val dvs = TableLog.dvFiles(path, v)
    val skip: Map[String, Array[Long]] =
      if (dvs.isEmpty) Map.empty
      else SparkSession.active.read
        .parquet(dvs.map(f => Paths.get(path).resolve(f).toString): _*)
        .select("f", "p").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (f, ps) => f -> ps.map(_._2).sorted }
    files.map { f =>
      ChangeFilePartition(Paths.get(path).resolve(f).toString, insert = true, v,
        skip = skip.getOrElse(f, Array.empty), only = null): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFileReaderFactory(required, TableChangeSource.caseSensitive)

  override def estimateStatistics(): Statistics = new Statistics {
    // post-skipping sizes: the fewer files a pushed filter keeps, the
    // smaller (and more broadcastable) this relation reports itself
    override def sizeInBytes(): OptionalLong = OptionalLong.of(
      files.map(f => Files.size(Paths.get(path).resolve(f))).sum)
    override def numRows(): OptionalLong =
      if (keepFiles.isEmpty)
        TableLog.metadataCount(path, Some(v))
          .map(OptionalLong.of).getOrElse(OptionalLong.empty())
      else OptionalLong.empty()
  }
}

/** the pushed-`count(*)` scan: ONE one-row partition carrying the metadata
  * count — no data file is opened
  */
private[sources] class GraftMetadataCountScan(path: String, v: Long)
    extends Scan with Batch {

  private val n: Long = TableLog.metadataCount(path, Some(v)).getOrElse(
    throw new IllegalStateException(s"$path@v$v lost its recorded row counts"))

  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"GraftMetadataCount($path@v$v, n=$n)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftCountPartition(n))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var served = false
          private val row =
            new GenericInternalRow(Array[Any](p.asInstanceOf[GraftCountPartition].n))
          override def next(): Boolean = { val r = !served; served = true; r }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
    }
}

private[sources] case class GraftCountPartition(n: Long) extends InputPartition
