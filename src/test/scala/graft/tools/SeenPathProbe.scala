package graft.tools

import org.apache.spark.sql.functions._
import graft.FrontierBench
import graft.operators.Dedup

/** Where do the ~9 flat seconds of the table-backed seen path go?
  * Times each stage with table vs cached seen. Args: cores n */
object SeenPathProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = FrontierBench.session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", FrontierBench.StorageBuckets.toString)

    val cands = FrontierBench.candidates(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands.count()
    val seenMem = FrontierBench.seenState(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seenMem.count()
    val probeDir = FrontierBench.scratchDir("graft-seenpath")
    val seenTab = FrontierBench.seenStateTable(spark, n, probeDir.toString)
    val blooms = FrontierBench.seenBloomState(seenMem, n)

    def t(tag: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(f"SEENPATH cores=$cores $tag%-22s ${runs.map(_._1).min}%7.2f rows=${runs.head._2} all=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    t("scan_table")(seenTab.count())
    t("scan_mem")(seenMem.count())
    t("anti_mem")(Dedup.antiJoinSeen(cands, seenMem).count())
    t("anti_table")(Dedup.antiJoinSeen(cands, seenTab).count())
    t("antiBloom_mem")(Dedup.antiJoinSeenWithBloom(spark, cands, seenMem, blooms, FrontierBench.BloomBuckets).count())
    t("antiBloom_table")(Dedup.antiJoinSeenWithBloom(spark, cands, seenTab, blooms, FrontierBench.BloomBuckets).count())
    spark.stop()
    FrontierBench.deleteRecursively(probeDir)
  }
}
