package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable upstream for [[SeedRateSource]]: where the frames come from.
  *
  * The stream layer ([[SeedRateStream]]) owns offsets, admission control and
  * slice planning; an upstream only answers two questions — how many frames
  * exist right now ([[total]], driver-side) and the frames of one [lo, hi)
  * slice ([[open]], executor-side). This is the seam a production connector
  * fills with its pager: an HTTP/gRPC upstream implements [[open]] as "page
  * through the API from cursor lo until hi", and the offset/checkpoint/
  * admission machinery is inherited unchanged ([[PagedFrameUpstream]]-style
  * synthetic pager is spec-pinned against exactly that contract).
  *
  * Implementations MUST be serializable (the upstream travels inside each
  * metadata-sized [[SeedSlice]] to executors) and [[open]] must be
  * deterministic for a fixed [lo, hi) while the stream runs — replay of a
  * committed range after restart has to yield the same frames.
  */
trait FrameUpstream extends Serializable {
  /** number of frames currently available (driver-side, once per trigger) */
  def total(): Long
  /** open the [lo, hi) frame slice; the caller closes it when drained */
  def open(lo: Long, hi: Long): FrameSlice
}

/** one open slice of upstream frames — an iterator the reader must close
  * (releases the file handle / HTTP connection / page buffer)
  */
trait FrameSlice extends Iterator[String] with java.io.Closeable

object FrameUpstream {
  /** Resolve the upstream from DSv2 options: `upstream` names a
    * [[FrameUpstream]] class with a `(Map[String, String])` constructor
    * (instantiated reflectively with ALL the source options — the same
    * mechanism Spark uses to load the provider itself); default is the
    * seed-file upstream over option `path`.
    */
  def fromOptions(opts: Map[String, String]): FrameUpstream =
    opts.get("upstream") match {
      case Some(cls) =>
        Class.forName(cls)
          .getConstructor(classOf[Map[String, String]])
          .newInstance(opts)
          .asInstanceOf[FrameUpstream]
      case None =>
        val path = opts.getOrElse("path",
          throw new IllegalArgumentException(
            "graft-seed-rate requires option 'path' (or a custom 'upstream' class)"))
        new SeedFileUpstream(path)
    }
}

/** default upstream: a seed file of wire frames, one per line. Slices are
  * executor-read via `Files.lines(skip/limit)`; every opened stream is
  * closed (the count through `Using`, the slice through [[FrameSlice.close]])
  * — leaking one descriptor per slice per micro-batch until GC was the
  * round-5 advisor finding.
  */
final class SeedFileUpstream(path: String) extends FrameUpstream {
  override def total(): Long =
    Using.resource(Files.lines(Paths.get(path), StandardCharsets.UTF_8))(_.count())
  override def open(lo: Long, hi: Long): FrameSlice = new FrameSlice {
    private val stream = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
      .skip(lo).limit(hi - lo)
    private val it = stream.iterator()
    override def hasNext: Boolean = it.hasNext
    override def next(): String = it.next()
    override def close(): Unit = stream.close()
  }
}

/** Custom DataSourceV2 streaming connector: replay an upstream of wire
  * frames at a BOUNDED per-batch rate — the engine-native stand-in for the
  * reference's rate-limited API poller (`from_parser_to_rabbitmq.py:47-77`,
  * `:214-245`: sleep-paced requests against the broker, each response fanned
  * out as JSON frames). Usage:
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.SeedRateSource")
  *   .option("path", "/queue/seed.jsonl")      // one frame per line
  *   .option("rowsPerBatch", "100")            // the rate limit
  *   .load()                                   // schema: value STRING
  * }}}
  *
  * Output is `value STRING` — the same shape as `readStream.text`, so the
  * stream drops straight into [[graft.ingest.Ingest.demux]] / the
  * [[graft.streaming.StreamIngest]] fan-out unchanged.
  *
  * Mechanics (the full DSv2 micro-batch contract, which is the point of
  * this class next to the built-in file source):
  *  - Offsets are plain frame indexes into the upstream ([[SeedOffset]],
  *    JSON `long`), checkpointed by the engine — a restarted query resumes
  *    from the committed index, exactly-once downstream given the
  *    idempotent sink discipline.
  *  - `latestOffset(start, limit)` admits at most the ENGINE-SUPPLIED
  *    [[ReadLimit]] past the committed start (falling back to the source's
  *    own `rowsPerBatch` default) — the rate limit lives in offset
  *    planning, where a real connector meters its upstream (poll quotas,
  *    consumer `max.poll.records`, …).
  *  - `planInputPartitions(start, end)` splits the admitted range across
  *    `minPartitions` partitions; each partition re-opens ONLY its slice of
  *    the upstream on the executor (the upstream handle + range travel,
  *    never rows — an InputPartition must stay metadata-sized).
  *
  * The upstream itself is pluggable ([[FrameUpstream]], option `upstream`):
  * the default replays a seed file; a production twin pages from a live API
  * inside [[FrameUpstream.open]] and inherits offsets/admission/restart
  * unchanged — SeedRateSourceSpec proves the contract with a synthetic
  * paged upstream whose page size is deliberately ≠ rowsPerBatch.
  */
class SeedRateSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeedRateSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SeedRateTable(properties.asScala.toMap)
}

object SeedRateSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] class SeedRateTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-seed-rate(${props.getOrElse("path", props.getOrElse("upstream", "?"))})"
  override def schema(): StructType = SeedRateSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SeedRateSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SeedRateStream(
            upstream = FrameUpstream.fromOptions(options.asScala.toMap),
            rowsPerBatch = Option(options.get("rowsPerBatch")).map(_.toInt).getOrElse(100),
            minPartitions = Option(options.get("minPartitions")).map(_.toInt).getOrElse(2),
            targetBatchMs = Option(options.get("targetBatchMs")).map(_.toLong))
      }
    }
}

/** frame-index offset; serialized as a bare JSON long */
private[sources] case class SeedOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[sources] class SeedRateStream(
    upstream: FrameUpstream,
    rowsPerBatch: Int,
    minPartitions: Int,
    /** AIMD backpressure, same contract as the change-feed stream's
      * (`TableChangeStream`): an over-target batch halves the next row
      * admission (floor 1), at/under doubles back to `rowsPerBatch`.
      * The reference producer's ratelimit_reset sleep
      * (from_parser_to_rabbitmq.py:69-77), generalized. None = fixed cap.
      */
    targetBatchMs: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl {
  require(rowsPerBatch > 0, "rowsPerBatch must be positive")
  require(targetBatchMs.forall(_ > 0), "targetBatchMs must be positive")

  @volatile private var adaptiveCap: Long = rowsPerBatch.toLong
  /** admission instant per planned END offset — the engine constructs the
    * next batch's offsets before committing the previous one, so the pair
    * must be keyed, not held in a single mutable slot
    */
  private val admittedAtNs =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()

  // driver-side: only the COUNT is held; frames stay upstream for executors
  private lazy val total: Long = upstream.total()

  override def initialOffset(): Offset = SeedOffset(0L)
  override def deserializeOffset(json: String): Offset = SeedOffset(json.toLong)

  // admission control IS the rate limit: each trigger admits at most the
  // engine-supplied limit past the engine-supplied start (the committed
  // offset — correct across restarts, unlike any driver-held cursor)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  /** rows allowed by an engine [[ReadLimit]]: honor maxRows / allAvailable /
    * the strictest maxRows inside a composite; anything unrecognized falls
    * back to this source's own default — never silently exceeds it.
    */
  private def allowed(limit: ReadLimit): Long = {
    // adaptation OFF preserves the original contract exactly (an engine
    // maxRows is honored as-is); ON clamps every shape to the current cap
    def cap(engine: Long): Long =
      if (targetBatchMs.isDefined) math.min(engine, adaptiveCap) else engine
    limit match {
      case m: ReadMaxRows      => cap(m.maxRows())
      case _: ReadAllAvailable => if (targetBatchMs.isDefined) adaptiveCap else Long.MaxValue
      case c: CompositeReadLimit =>
        val caps = c.getReadLimits.collect { case m: ReadMaxRows => m.maxRows() }
        if (caps.nonEmpty) cap(caps.min) else cap(rowsPerBatch.toLong)
      case _ => cap(rowsPerBatch.toLong)
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeedOffset].index
    val cap = allowed(limit)
    val end = math.min(if (cap >= total - s) total else s + cap, total)
    if (end > s && targetBatchMs.isDefined)
      admittedAtNs.putIfAbsent(end, System.nanoTime())
    SeedOffset(end)
  }
  override def reportLatestOffset(): Offset = SeedOffset(total)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SeedOffset].index, end.asInstanceOf[SeedOffset].index)
    if (e <= s) Array.empty
    else {
      val span = e - s
      val n = math.min(span, minPartitions.toLong).toInt
      (0 until n).map { i =>
        val lo = s + span * i / n
        val hi = s + span * (i + 1) / n
        SeedSlice(upstream, lo, hi): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val slice = partition.asInstanceOf[SeedSlice]
        new PartitionReader[InternalRow] {
          private val frames = slice.upstream.open(slice.lo, slice.hi)
          private var current: String = _
          override def next(): Boolean =
            if (frames.hasNext) { current = frames.next(); true } else false
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(current))
          override def close(): Unit = frames.close()
        }
      }
    }

  /** AIMD adaptation point — see [[TableChangeStream.commit]] */
  override def commit(end: Offset): Unit = targetBatchMs.foreach { target =>
    val started = admittedAtNs.remove(end.asInstanceOf[SeedOffset].index)
    if (started != null) {
      val ms = (System.nanoTime() - started) / 1000000L
      if (ms > target) adaptiveCap = math.max(1L, adaptiveCap / 2)
      else adaptiveCap = math.min(rowsPerBatch.toLong, adaptiveCap * 2)
    }
  }
  override def stop(): Unit = ()
}

/** metadata-sized partition: the (serializable) upstream + the [lo, hi)
  * frame range
  */
private[sources] case class SeedSlice(upstream: FrameUpstream, lo: Long, hi: Long)
    extends InputPartition
