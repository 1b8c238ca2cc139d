package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming SINK for the table log — the write half of the source/sink
  * pair the change-feed source opened:
  *
  *   df.writeStream.format("graft-log").option("table", dir)
  *     .option("checkpointLocation", ckpt).start()
  *
  * Each micro-batch lands as ONE table-log commit through
  * [[graft.sources.TableLog.commitOnceAppend]] (OutputMode.Complete →
  * `commitOnceOverwrite`), txn-tagged with the batch id — a replayed batch
  * (same id after a crash between the commit and the checkpoint write)
  * re-runs the data write but the txn-tagged manifest dedupes the publish,
  * so the table grows EXACTLY ONCE per batch; the replay's staged files
  * stay unreferenced for gcOrphans. Downstream, every commit is
  * snapshot-isolated, time-travelable, feeds the change-feed source, and —
  * with `statCols` — carries per-file min/max stats for pruned reads:
  * stream-to-log-to-stream pipelines compose with no foreachBatch
  * boilerplate.
  *
  * Lives in graftx because a V1 `Sink.addBatch` DataFrame is bound to the
  * in-flight IncrementalExecution — it must be re-bound through the
  * `private[sql]` `internalCreateDataFrame(queryExecution.toRdd, ...)`
  * bridge before a fresh write QueryExecution can plan it (the standard V1
  * connector discipline). The V1 sink API is deliberate: `addBatch` gets a
  * whole DataFrame, so the commit write runs DISTRIBUTED with full type
  * support; a DSv2 `StreamingWrite` would force a per-executor row codec.
  *
  * Multi-writer note: txn ids are `<txnPrefix>_b<batchId>` with the prefix
  * defaulting to "graft-log-sink" — TWO different queries appending to one
  * table must set distinct `txnPrefix` options or their batch ids collide
  * and dedupe each other.
  */
class GraftLogSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val table = parameters.getOrElse("table", throw new IllegalArgumentException(
      """graft-log sink requires .option("table", <table-log directory>)"""))
    require(partitionColumns.isEmpty,
      "graft-log sink: partitionBy is not supported — file layout is the " +
        "log's job (optimize / optimizeZOrder)")
    require(outputMode != OutputMode.Update(),
      "graft-log sink supports Append (commit per batch) and Complete " +
        "(overwrite per batch); Update has no log equivalent — use " +
        "foreachBatch + a MERGE (operators.Merge) instead")
    new GraftLogSink(
      table,
      parameters.get("statCols").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
      complete = outputMode == OutputMode.Complete(),
      txnPrefix = parameters.getOrElse("txnPrefix", "graft-log-sink"))
  }
}

private[graftx] class GraftLogSink(
    table: String, statCols: Seq[String], complete: Boolean, txnPrefix: String)
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val ds = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = ds.sparkSession
    // rebind the already-planned micro-batch RDD as a BATCH DataFrame: the
    // streaming plan itself cannot be handed to a new write QueryExecution
    val batchDf =
      spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
    val txn = s"${txnPrefix}_b$batchId"
    if (complete) graft.sources.TableLog.commitOnceOverwrite(batchDf, table, txn)
    else graft.sources.TableLog.commitOnceAppend(batchDf, table, txn, statCols)
    ()
  }

  override def toString: String = s"GraftLogSink($table)"
}
