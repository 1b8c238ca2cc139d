package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: plan audit over registered queries — counts the plan features
  * that matter at 100 TB (pushed filters, broadcast joins, codegen spans,
  * cartesian products) so a regression is visible without reading plans.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
        def c(p: String) = p.r.findAllIn(plan).length
        println(f"$n%-24s bcastJoin=${c("BroadcastHashJoin")}%2d smj=${c("SortMergeJoin")}%2d shj=${c("ShuffledHashJoin")}%2d cartesian=${c("CartesianProduct")}%2d bcastNL=${c("BroadcastNestedLoopJoin")}%2d exch=${c("Exchange")}%2d codegen=${c("WholeStageCodegen")}%2d pushed=${c("PushedFilters: \\[[^\\]]")}%2d")
      } catch { case e: Throwable => println(s"$n ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
