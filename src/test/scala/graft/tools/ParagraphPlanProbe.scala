package graft.tools

import graft.FrontierBench
import graft.operators.TextDedup

object ParagraphPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val q = TextDedup.dedupParagraphs(docs, "text", "doc_id")
    val t0 = System.nanoTime()
    val n = q.count()
    println(f"rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    println(q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
