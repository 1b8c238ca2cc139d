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
        // AQE wraps everything in AdaptiveSparkPlan and only collapses
        // codegen stages (and finalizes join strategies) as stages EXECUTE —
        // the pre-execution plan shows zero codegen spans and provisional
        // joins. And it must be THIS QueryExecution that runs: a sink write
        // plans a fresh QueryExecution, leaving this one isFinalPlan=false.
        // collect() is safe — registered queries return small aggregates.
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.collect()
        // finalized AQE toString appends the pre-execution tree under
        // "== Initial Plan ==" — keep only the final plan or every count doubles
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        def c(p: String) = p.r.findAllIn(plan).length
        // codegen spans surface as `*(n) Node` prefixes in executedPlan
        // toString (WholeStageCodegenExec nodes don't print their own name);
        // distinct span ids = number of fused stages
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(f"$n%-24s bcastJoin=${c("BroadcastHashJoin")}%2d smj=${c("SortMergeJoin")}%2d shj=${c("ShuffledHashJoin")}%2d cartesian=${c("CartesianProduct")}%2d bcastNL=${c("BroadcastNestedLoopJoin")}%2d exch=${c("Exchange")}%2d codegen=$codegen%2d pushed=${c("PushedFilters: \\[[^\\]]")}%2d")
      } catch { case e: Throwable => println(s"$n ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
