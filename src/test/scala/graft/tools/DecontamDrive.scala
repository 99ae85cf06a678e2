package graft.tools

import org.apache.spark.sql.functions._
import graft.FrontierBench
import graft.operators.Corpus

/** Drive Corpus.decontaminate end-to-end on the sf0.1 documents table:
  * prints kept/flagged counts and the executed anti-join plan. The
  * shipping join carries NO broadcast hint — assert AQE still picks a
  * broadcast anti-join when the contaminated set is small (the common
  * case), i.e. removing the hint costs nothing at the happy path. */
object DecontamDrive {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val bench = docs.filter(col("doc_id") % 41 === 0)
      .select(array_join(slice(Corpus.wordTokens(col("text")), lit(1),
        lit(8) + col("doc_id") % 7), " ").as("text"))
    val kept = Corpus.decontaminate(docs, bench, "text", "doc_id", n = 8)
    val nKept = kept.count()
    val nAll = docs.count()
    println(s"DECONTAM kept=$nKept of=$nAll flagged=${nAll - nKept}")
    val plan = kept.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    println(plan)
    val aqeBroadcast = plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti")
    println(s"DECONTAM aqe_broadcast_anti=$aqeBroadcast")
    spark.stop()
  }
}
