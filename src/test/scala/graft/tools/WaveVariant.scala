package graft.tools

import org.apache.spark.sql.functions._
import graft.{FrontierBench, SparkEntry}
import graft.functions.UrlExprs
import graft.operators.{Dedup, Politeness}

/** Isolate the r3 wave regression: time the wave with each politeness
  * variant over the same dedup front end. Args: cores n variant(reps) */
object WaveVariant {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = FrontierBench.session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", FrontierBench.StorageBuckets.toString)
    val dir = FrontierBench.scratchDir("graft-wavevar")
    try {
      val seen = FrontierBench.seenStateTable(spark, n, dir.toString)
      val store = FrontierBench.seenBloomStore(spark, n, dir.toString)
      for (variant <- Seq("adaptive", "salted", "oldadaptive"); rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val cands = FrontierBench.candidates(spark, n)
        val deduped = Dedup.dedupWave(spark, cands, seen, Seq(col("seq")),
          None, FrontierBench.BloomBuckets, bloomStore = Some(store), bloomAligned = true)
        val withHost = deduped.withColumn("host", UrlExprs.urlHost(col("url_canon")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val clamped = withHost.withColumn("priority", Politeness.clampPriority(col("priority"), 3))
        val eligible = variant match {
          case "adaptive" => Politeness.hostEligibleAdaptive(clamped, 1000, 32)
          case "salted"   => Politeness.hostEligibleSalted(clamped, 1000, 32)
          case "oldadaptive" =>
            // r2 shape: agg subplan broadcast, no stats job, no boundary
            val hotHosts = clamped.groupBy(col("host")).agg(count(lit(1)).as("__hn"))
              .filter(col("__hn") > 1000).select(col("host"))
            val cold = clamped.join(broadcast(hotHosts), Seq("host"), "left_anti")
            val hot = clamped.join(broadcast(hotHosts), Seq("host"), "left_semi")
            cold.unionByName(Politeness.hostEligibleSalted(hot, 1000, 32))
        }
        val out = Politeness.applyQuotas(eligible, n, 3).count()
        withHost.unpersist(false)
        println(f"WAVEVAR $variant rep=$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$out")
      }
    } finally FrontierBench.deleteRecursively(dir)
    spark.stop()
  }
}
