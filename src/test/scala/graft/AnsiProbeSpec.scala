package graft

import graft.ingest.{Ingest, Normalize}
import org.apache.spark.sql.functions._

/** Drop-on-invalid must hold for NON-NUMERIC values in numeric fields too —
  * under ANSI mode a plain CAST would throw instead of nulling the row out.
  */
class AnsiProbeSpec extends SparkSpec {
  import spark.implicits._

  test("ANSI default + bad numeric field drops the row instead of crashing") {
    println("[probe] ansi.enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
    val frames = Seq(
      """{"company_id":"F1","timestamp":"2024-03-01 10:00:00","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":7}""",
      """{"company_id":"F2","timestamp":"2024-03-01 10:00:00","open":"abc","high":2.0,"low":0.5,"close":1.5,"volume":7}""",
      """{"company_id":"F3","timestamp":"2024-03-01 10:00:00","open":1.0,"high":2.0,"low":0.5,"close":1.5,"volume":"not-a-number"}""")
      .toDF("value")
    val out = Ingest.demux(frames)("candles").collect()
    assert(out.map(_.getString(0)).toSet == Set("F1"))
    val stats = Ingest.dropStats(frames).where(col("route") === "candles").collect().head
    assert(stats.getLong(1) == 3 && stats.getLong(2) == 1 && stats.getLong(3) == 2)
  }
}
