package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 streaming connector: replay a seed file of wire
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
  *  - Offsets are plain row indexes into the seed ([[SeedOffset]], JSON
  *    `long`), checkpointed by the engine — a restarted query resumes from
  *    the committed index, exactly-once downstream given the idempotent
  *    sink discipline.
  *  - `latestOffset` advances by at most `rowsPerBatch` per trigger — the
  *    rate limit lives in offset planning, where a real connector meters
  *    its upstream (poll quotas, consumer `max.poll.records`, …).
  *  - `planInputPartitions(start, end)` splits the admitted range across
  *    `minPartitions` partitions; each partition re-reads ONLY its slice of
  *    the seed on the executor (the seed path + range travel, never rows —
  *    an InputPartition must stay metadata-sized).
  *
  * Scale notes: a production twin would page from the upstream API inside
  * `PartitionReader.next()` and persist cursor state in the offset; the
  * planning/commit skeleton here is exactly that connector's. The seed file
  * is executor-read per slice, so driver state is one long.
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
  override def name(): String = s"graft-seed-rate(${props.getOrElse("path", "?")})"
  override def schema(): StructType = SeedRateSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SeedRateSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SeedRateStream(
            path = options.get("path"),
            rowsPerBatch = Option(options.get("rowsPerBatch")).map(_.toInt).getOrElse(100),
            minPartitions = Option(options.get("minPartitions")).map(_.toInt).getOrElse(2))
      }
    }
}

/** row-index offset; serialized as a bare JSON long */
private[sources] case class SeedOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[sources] class SeedRateStream(
    path: String,
    rowsPerBatch: Int,
    minPartitions: Int) extends MicroBatchStream with SupportsAdmissionControl {
  require(path != null, "graft-seed-rate requires option 'path'")
  require(rowsPerBatch > 0, "rowsPerBatch must be positive")

  // driver-side: only the COUNT is held; rows stay on disk for executors
  private lazy val total: Long =
    Files.lines(Paths.get(path), StandardCharsets.UTF_8).count()

  override def initialOffset(): Offset = SeedOffset(0L)
  override def deserializeOffset(json: String): Offset = SeedOffset(json.toLong)

  // admission control IS the rate limit: each trigger admits at most
  // rowsPerBatch rows past the engine-supplied start (the committed offset
  // — correct across restarts, unlike any driver-held cursor)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeedOffset].index
    SeedOffset(math.min(s + rowsPerBatch, total))
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
        SeedSlice(path, lo, hi): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val slice = partition.asInstanceOf[SeedSlice]
        new PartitionReader[InternalRow] {
          private val it = Files.lines(Paths.get(slice.path), StandardCharsets.UTF_8)
            .skip(slice.lo).limit(slice.hi - slice.lo).iterator()
          private var current: String = _
          override def next(): Boolean =
            if (it.hasNext) { current = it.next(); true } else false
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(current))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** metadata-sized partition: the seed path + the [lo, hi) row range */
private[sources] case class SeedSlice(path: String, lo: Long, hi: Long)
    extends InputPartition
