package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.TextDedup
object JaccardCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sh = TextDedup.shingles(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet"), "text", "doc_id", 3)
      .persist()
    sh.count()
    val uncapped = TextDedup.jaccardPairs(sh, 500).collect().map(_.toSeq).toSet
    val capped = TextDedup.jaccardPairs(sh, 500, maxDf = 32).collect().map(_.toSeq).toSet
    println(s"CAPPROBE uncapped=${uncapped.size} capped32=${capped.size} equal=${uncapped == capped}")
    spark.stop()
  }
}
