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
        Txn.Write(spark.sql(q), Paths.get(root).resolve(t).toString,
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
