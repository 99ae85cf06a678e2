package graft.tools

import graft.{FrontierBench, SparkEntry}

/** Print the executed plan of dedup_survivors (plan evidence, PLANS.md). */
object SurvivorsPlan {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("dedup_survivors")(spark, "/root/testdata/sf0.01")
    df.count()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
