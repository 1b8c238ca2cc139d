package org.apache.spark.sql.graftx

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetInputFormat}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.metric.CustomTaskMetric
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** VECTORIZED (ColumnarBatch) reads for the table log's DSv2 scan — built
  * on Spark's own [[VectorizedParquetRecordReader]] (the exact decoder the
  * native parquet path uses), hosted in the graftx bridge package because
  * [[ParquetReadSupport]]'s conf keys are `private[sql]`.
  *
  * This is the 100 TB scan loop: the row-at-a-time Group-API reader decodes
  * one record-assembly object tree per row, while this path decodes whole
  * pages into column vectors and hands Spark 4096-row [[ColumnarBatch]]es
  * that flow straight into whole-stage codegen. The Group reader remains
  * the general path; this one serves the common flat case:
  *
  *  - FLAT primitive schemas only (no array/map/struct — those keep the
  *    recursive Group converter);
  *  - NO deletion vectors on the snapshot (DV subtraction needs the
  *    row-position cursor the batch decoder does not expose) and no
  *    change-feed `only` position lists;
  *  - row-group range skipping still applies, re-expressed as a parquet
  *    [[FilterPredicate]] (stats + dictionary row-group filtering inside
  *    `readNextFilteredRowGroup`; page-level column-index filtering is
  *    DISABLED so filtering stays block-granular and thus position-exact);
  *  - schema evolution null-backfill and INT32→long widening come with the
  *    Spark reader for free; a pushed range on a column ABSENT from the
  *    file is null-rejecting, so the whole file yields nothing (the same
  *    semantics as the row reader's absent-column sentinel).
  *
  * Mixing row and columnar partitions in ONE scan is a Spark error, so the
  * scan decides per SNAPSHOT (all partitions columnar or none), never per
  * file.
  */
object VectorizedLogReader {

  /** types the vectorized flat path serves (matches Spark's own
    * WritableColumnVector coverage for non-nested columns)
    */
  def flatSchema(schema: StructType): Boolean = schema.fields.forall(f =>
    primitiveOk(f.dataType))

  private def primitiveOk(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** types the NESTED vectorized path serves — the same recursive closure
    * Spark's own `ParquetUtils.isBatchReadSupported` admits once
    * `enableNestedColumnVectorizedReader` is on: arrays, structs and maps
    * over the supported primitives, at any depth. The embedding-array
    * corpora of the LLM pipeline (`ArrayType(FloatType)`) live here.
    * The reader itself (`VectorizedParquetRecordReader`) decodes nested
    * columns natively since Spark 3.3 (SPARK-34863); the conf only gates
    * Spark's planning decision, which this scan makes for itself.
    */
  def vectorizable(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => vectorizable(e)
    case StructType(fs) => fs.forall(f => vectorizable(f.dataType))
    case MapType(k, v, _) => vectorizable(k) && vectorizable(v)
    case other => primitiveOk(other)
  }

  def nestedSchema(schema: StructType): Boolean =
    schema.fields.forall(f => vectorizable(f.dataType))

  private val Empty: PartitionReader[ColumnarBatch] =
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = false
      override def get(): ColumnarBatch = throw new NoSuchElementException
      override def close(): Unit = ()
    }

  /** DV-AWARE columnar read: the vectorized decode with the partition's
    * sorted deleted positions subtracted. Positions are ABSOLUTE row
    * indexes, so this path reads the file with NO row-group filter (a
    * skipped group would shift every later position — the pushed ranges
    * stay residual in Spark's plan, so dropping the predicate costs only
    * the skip, never a wrong row). Batches with no deleted rows pass
    * through UNTOUCHED (the overwhelmingly common case); a batch that
    * intersects the DV is compacted by a typed survivor copy into fresh
    * column vectors.
    */
  def openWithDv(absPath: String, required: StructType, caseSensitive: Boolean,
      skip: Array[Long]): PartitionReader[ColumnarBatch] = {
    val inner = open(absPath, required, caseSensitive, Array.empty, _ => ())
    new PartitionReader[ColumnarBatch] {
      private var cursor = 0L // absolute row index of the next batch's first row
      private var sp = 0      // pointer into the sorted skip positions
      private var out: ColumnarBatch = _
      override def next(): Boolean = {
        while (inner.next()) {
          val b = inner.get()
          val n = b.numRows()
          // deleted positions inside [cursor, cursor + n)
          while (sp < skip.length && skip(sp) < cursor) sp += 1
          var se = sp
          while (se < skip.length && skip(se) < cursor + n) se += 1
          if (se == sp) { out = b; cursor += n; return true }
          val dead = java.util.Arrays.copyOfRange(skip, sp, se)
          val survivors = n - dead.length
          sp = se
          val base = cursor
          cursor += n
          if (survivors > 0) { out = compact(b, dead, base, survivors); return true }
          // fully-deleted batch: keep pulling
        }
        false
      }
      override def get(): ColumnarBatch = out
      override def close(): Unit = inner.close()

      /** copy the rows NOT listed in `dead` (absolute positions, sorted)
        * into fresh on-heap vectors — one typed dispatch per column
        */
      private def compact(b: ColumnarBatch, dead: Array[Long], base: Long,
          survivors: Int): ColumnarBatch = {
        import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
        val cols = required.fields.indices.map(i =>
          new OnHeapColumnVector(survivors, required.fields(i).dataType)).toArray
        var di = 0
        var dp = 0
        var i = 0
        val n = b.numRows()
        while (i < n) {
          if (dp < dead.length && dead(dp) == base + i) dp += 1
          else {
            var c = 0
            while (c < cols.length) {
              copyValue(required.fields(c).dataType, b.column(c), i, cols(c), di)
              c += 1
            }
            di += 1
          }
          i += 1
        }
        new ColumnarBatch(
          cols.map(v => v: org.apache.spark.sql.vectorized.ColumnVector), survivors)
      }
    }
  }

  private def copyValue(dt: DataType,
      src: org.apache.spark.sql.vectorized.ColumnVector, si: Int,
      dst: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      di: Int): Unit = {
    if (src.isNullAt(si)) { dst.putNull(di); return }
    dt match {
      case BooleanType => dst.putBoolean(di, src.getBoolean(si))
      case ByteType => dst.putByte(di, src.getByte(si))
      case ShortType => dst.putShort(di, src.getShort(si))
      case IntegerType | DateType => dst.putInt(di, src.getInt(si))
      case LongType | TimestampType | TimestampNTZType =>
        dst.putLong(di, src.getLong(si))
      case FloatType => dst.putFloat(di, src.getFloat(si))
      case DoubleType => dst.putDouble(di, src.getDouble(si))
      case StringType =>
        val s = src.getUTF8String(si); dst.putByteArray(di, s.getBytes); ()
      case BinaryType => dst.putByteArray(di, src.getBinary(si)); ()
      case d: DecimalType =>
        dst.putDecimal(di, src.getDecimal(si, d.precision, d.scale), d.precision)
      case other => throw new UnsupportedOperationException(
        s"DV-columnar copy does not support $other") // unreachable: flatSchema gates
    }
    ()
  }

  /** open one file as a ColumnarBatch reader; `ranges` are the pushed
    * per-column [lo, hi] envelopes (integral table columns), `strRanges`
    * their STRING twins (None = unbounded side; bounds compare as unsigned
    * UTF-8 bytes — parquet's binary stats order)
    */
  def open(absPath: String, required: StructType, caseSensitive: Boolean,
      ranges: Array[(String, Long, Long)],
      onGroupsSkipped: Long => Unit,
      strRanges: Array[(String, Option[String], Option[String])] = Array.empty)
      : PartitionReader[ColumnarBatch] = {
    val conf = new Configuration()
    val hadoopFile = HadoopInputFile.fromPath(new Path(absPath), conf)
    val (fileSchema, blocks, fileLen) = {
      val r = ParquetFileReader.open(hadoopFile)
      try (r.getFooter.getFileMetaData.getSchema,
        r.getFooter.getBlocks, r.getFooter.getFileMetaData) match {
        case (s, b, _) => (s, b, hadoopFile.getLength)
      } finally r.close()
    }
    def fileField(name: String): Option[org.apache.parquet.schema.Type] = {
      val names = (0 until fileSchema.getFieldCount).map(fileSchema.getFieldName)
      val hit = if (caseSensitive) names.find(_ == name)
        else names.find(_.equalsIgnoreCase(name))
      hit.map(n => fileSchema.getType(fileSchema.getFieldIndex(n)))
    }
    // build the row-group filter; a range over a column this file lacks is
    // null-rejecting → nothing in the file can match
    var predicate: Option[FilterPredicate] = None
    var provablyEmpty = false
    ranges.foreach { case (c, lo, hi) =>
      fileField(c) match {
        case None => provablyEmpty = true
        case Some(t) if t.isPrimitive =>
          val p = t.asPrimitiveType()
          val one: Option[FilterPredicate] = p.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT64 =>
              val col = FilterApi.longColumn(p.getName)
              Some(FilterApi.and(
                FilterApi.gtEq(col, java.lang.Long.valueOf(lo)),
                FilterApi.ltEq(col, java.lang.Long.valueOf(hi))))
            case PrimitiveTypeName.INT32 =>
              if (lo > Int.MaxValue.toLong || hi < Int.MinValue.toLong) {
                provablyEmpty = true; None
              } else {
                val col = FilterApi.intColumn(p.getName)
                val l = math.max(lo, Int.MinValue.toLong).toInt
                val h = math.min(hi, Int.MaxValue.toLong).toInt
                Some(FilterApi.and(
                  FilterApi.gtEq(col, java.lang.Integer.valueOf(l)),
                  FilterApi.ltEq(col, java.lang.Integer.valueOf(h))))
              }
            case _ => None // non-integral physical type: range not applicable, keep all
          }
          one.foreach(f => predicate = Some(
            predicate.map(FilterApi.and(_, f)).getOrElse(f)))
        case _ => // group-typed field under a range name: keep all (sound)
      }
    }
    strRanges.foreach { case (c, lo, hi) =>
      fileField(c) match {
        case None => provablyEmpty = true
        case Some(t) if t.isPrimitive &&
          t.asPrimitiveType().getPrimitiveTypeName == PrimitiveTypeName.BINARY =>
          val col = FilterApi.binaryColumn(t.asPrimitiveType().getName)
          def bin(s: String) = org.apache.parquet.io.api.Binary
            .fromString(s) // UTF-8 bytes; parquet compares unsigned-lex
          val parts = lo.map(l => FilterApi.gtEq(col, bin(l))).toSeq ++
            hi.map(h => FilterApi.ltEq(col, bin(h))).toSeq
          parts.reduceOption(FilterApi.and(_: FilterPredicate, _: FilterPredicate))
            .foreach(f => predicate = Some(
              predicate.map(FilterApi.and(_, f)).getOrElse(f)))
        case _ => // non-binary physical type under a string range: keep all
      }
    }
    if (provablyEmpty) {
      onGroupsSkipped(blocks.size().toLong)
      return Empty
    }
    // approximate the skip metric with the same footer-stats test parquet
    // runs (ours counts stats-based skips; dictionary skips are extra)
    predicate.foreach { _ =>
      def cmp(a: Array[Byte], bb: Array[Byte]): Int = {
        var i = 0
        val n = math.min(a.length, bb.length)
        while (i < n) {
          val d = (a(i) & 0xff) - (bb(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        a.length - bb.length
      }
      val skipped = blocks.asScalaCount { b =>
        !(ranges.forall { case (c, lo, hi) =>
          fileField(c).isEmpty || {
            var may = true
            val it = b.getColumns.iterator()
            while (it.hasNext) {
              val cc = it.next()
              if (cc.getPath.size() == 1 &&
                cc.getPath.toDotString.equalsIgnoreCase(c)) {
                val st = cc.getStatistics
                if (st != null && st.hasNonNullValue) st match {
                  case s: org.apache.parquet.column.statistics.LongStatistics =>
                    may = s.getMax >= lo && s.getMin <= hi
                  case s: org.apache.parquet.column.statistics.IntStatistics =>
                    may = s.getMax.toLong >= lo && s.getMin.toLong <= hi
                  case _ =>
                } else if (st != null && !st.hasNonNullValue)
                  may = st.getNumNulls < b.getRowCount
              }
            }
            may
          }
        } && strRanges.forall { case (c, lo, hi) =>
          fileField(c).isEmpty || {
            var may = true
            val it = b.getColumns.iterator()
            while (it.hasNext) {
              val cc = it.next()
              if (cc.getPath.size() == 1 &&
                cc.getPath.toDotString.equalsIgnoreCase(c)) {
                val st = cc.getStatistics
                if (st != null && st.hasNonNullValue) st match {
                  case s: org.apache.parquet.column.statistics.BinaryStatistics =>
                    val mn = s.genericGetMin.getBytes
                    val mx = s.genericGetMax.getBytes
                    may = lo.forall(l => cmp(mx,
                        l.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >= 0) &&
                      hi.forall(h => cmp(mn,
                        h.getBytes(java.nio.charset.StandardCharsets.UTF_8)) <= 0)
                  case _ =>
                } else if (st != null && !st.hasNonNullValue)
                  may = st.getNumNulls < b.getRowCount
              }
            }
            may
          }
        })
      }
      if (skipped > 0) onGroupsSkipped(skipped.toLong)
    }

    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, required.json)
    conf.set(SQLConf.CASE_SENSITIVE.key, caseSensitive.toString)
    // the read-side schema converters read several keys RAW (the write-side
    // twin of RowParquetWriter's pinning): set every one explicitly
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key,
      SQLConf.PARQUET_BINARY_AS_STRING.defaultValueString)
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      SQLConf.PARQUET_INT96_AS_TIMESTAMP.defaultValueString)
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.defaultValueString)
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.defaultValueString)
    conf.set(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      SQLConf.PARQUET_FIELD_ID_READ_ENABLED.defaultValueString)
    conf.set(SQLConf.IGNORE_MISSING_PARQUET_FIELD_ID.key,
      SQLConf.IGNORE_MISSING_PARQUET_FIELD_ID.defaultValueString)
    // block-granular filtering only: page-level column-index filtering
    // would return partial row groups (fine without DVs, but needless)
    conf.setBoolean(ParquetInputFormat.COLUMN_INDEX_FILTERING_ENABLED, false)
    predicate.foreach(ParquetInputFormat.setFilterPredicate(conf, _))

    val reader = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    // Spark's base reader downcasts to the OLD-API split class (which
    // extends the mapreduce one) — construct that exact type
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path(absPath), 0, fileLen, Array.empty[String])
    val ctx = new TaskAttemptContextImpl(conf, new TaskAttemptID())
    try {
      reader.initialize(split, ctx)
      reader.initBatch(new StructType(), InternalRow.empty)
      reader.enableReturningBatches()
    } catch {
      case e: Throwable => reader.close(); throw e
    }
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): ColumnarBatch =
        reader.getCurrentValue.asInstanceOf[ColumnarBatch]
      override def close(): Unit = reader.close()
    }
  }

  private implicit class BlockListOps(
      val bs: java.util.List[org.apache.parquet.hadoop.metadata.BlockMetaData]) extends AnyVal {
    def asScalaCount(
        f: org.apache.parquet.hadoop.metadata.BlockMetaData => Boolean): Int = {
      var n = 0
      val it = bs.iterator()
      while (it.hasNext) if (f(it.next())) n += 1
      n
    }
  }
}
