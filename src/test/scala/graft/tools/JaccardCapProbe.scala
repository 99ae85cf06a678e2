package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Regression probe at sf0.1: the df-capped jaccard path (bound-prefilter
  * + exact verify) must equal the uncapped exact pair set, values included. */
object JaccardCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sh = TextDedup.shingles(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet"), "text", "doc_id", 3)
      .persist()
    sh.count()
    sh.groupBy("shingle").count()
      .selectExpr("sum(count*count) as sum_df2", "max(count) as max_df").show(false)
    val t0 = System.nanoTime()
    val uncapped = TextDedup.jaccardPairs(sh, 500).collect().map(_.toSeq).toSet
    val t1 = System.nanoTime()
    val capped = TextDedup.jaccardPairs(sh, 500, maxDf = 32).collect().map(_.toSeq).toSet
    val t2 = System.nanoTime()
    println(f"CAPPROBE uncapped=${uncapped.size} (${(t1 - t0) / 1e9}%.1fs) " +
      f"capped32=${capped.size} (${(t2 - t1) / 1e9}%.1fs) equal=${uncapped == capped}")
    spark.stop()
  }
}
