package graft.tools

import graft.SparkEntry
import graft.FrontierBench

/** Print the executed plans of the corpus-assembly queries (plan
  * evidence, PLANS.md §9): sample_stratified must show a partial
  * WindowGroupLimit below the stratum exchange; shard_pack must show NO
  * single-partition global window (its two passes are per-partition). */
object CorpusPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("sample_stratified", "shard_pack", "decontaminate")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.count()
      println(s"=== $q ===")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
