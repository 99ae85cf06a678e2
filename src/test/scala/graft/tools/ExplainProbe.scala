package graft.tools

import org.apache.spark.sql.functions._
import graft.FrontierBench
import graft.operators.{Dedup, Politeness}

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(4)
    spark.sparkContext.setLogLevel("ERROR")
    val n = 100000L
    val cands = FrontierBench.candidates(spark, n)
    val seen = FrontierBench.seenState(spark, n)
    println("=== firstSeenInBatch ===")
    Dedup.firstSeenInBatch(cands, Seq(col("seq"))).explain("formatted")
    println("=== full wave ===")
    val blooms = FrontierBench.seenBloomState(seen, n)
    val deduped = Dedup.dedupWave(spark, cands, seen, Seq(col("seq")), Some(blooms),
      FrontierBench.BloomBuckets)
    val withHost = deduped.withColumn("host",
      udf((u: String) => graft.functions.UrlCanon.host(u)).apply(col("url_canon")))
    Politeness.schedule(withHost, 1000, n, 3, 32).explain("formatted")
    spark.stop()
  }
}
