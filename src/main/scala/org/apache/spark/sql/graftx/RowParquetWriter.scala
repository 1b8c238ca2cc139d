package org.apache.spark.sql.graftx

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Executor-side `InternalRow` → parquet file writer — the write half of
  * the engine's Group-API per-file READER, but built on Spark's own
  * [[ParquetWriteSupport]] (the exact row consumer `df.write.parquet`
  * uses), so every Spark type (decimals, timestamps, nested arrays)
  * serializes byte-identically to a DataFrame write. Hosted in the graftx
  * bridge package with the other `private[sql]`-adjacent shims.
  *
  * This is what lets the table log participate in REAL DSv2 batch writes
  * (`BatchWrite`/`DataWriter`, e.g. the row-level UPDATE/MERGE path, which
  * cannot take the V1 whole-DataFrame fallback): each write task streams
  * its partition's rows straight into an immutable data file — no driver
  * materialization, no extra shuffle — and the driver publishes the file
  * list as one atomic manifest.
  *
  * Write-format pins (set explicitly, never inherited from a session that
  * may not exist on the executor): standard (non-legacy) parquet layout,
  * TIMESTAMP_MICROS (the encoding the change-feed reader and DuckDB both
  * read), CORRECTED rebase — matching what the engine's normal
  * `df.write.parquet` path produces under this repo's session defaults.
  */
object RowParquetWriter {

  private class B(p: Path) extends ParquetWriter.Builder[InternalRow, B](p) {
    override def self(): B = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  def open(absPath: String, schema: StructType): ParquetWriter[InternalRow] = {
    val hc = new Configuration()
    ParquetWriteSupport.setSchema(schema, hc)
    hc.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    hc.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    hc.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    hc.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    // the schema converter's Configuration ctor reads these RAW (no default
    // fallback — a missing key is a "null".toBoolean crash): pin to the
    // SQLConf defaults
    hc.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.defaultValueString)
    hc.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.defaultValueString)
    new B(new Path(absPath))
      .withConf(hc)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }
}
