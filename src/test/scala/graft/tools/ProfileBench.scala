package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.FrontierBench
import graft.operators.{Dedup, Politeness}

/** Repeated full-wave scaling profile (min of k runs, warm). */
object ProfileBench {
  def session(cores: Int, shufflePartitions: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
  }

  def wave(spark: SparkSession, n: Long): Long = {
    val seen = FrontierBench.seenState(spark, n)
    FrontierBench.runWave(spark, n, seen)._1
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "32000000").toLong
    val sp = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_P", "64").toInt
    Seq(8, 32, 8).foreach { cores =>
      val spark = session(cores, sp)
      spark.sparkContext.setLogLevel("WARN")
      wave(spark, n / 10) // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); wave(spark, n); (System.nanoTime() - t0) / 1e9
      }
      println(f"[$cores cores, sp=$sp] n=$n wave times=${times.map(t => f"$t%.2f").mkString(",")}  min=${times.min}%.2f  thr=${n / times.min}%.0f urls/s")
      spark.stop()
      System.gc(); Thread.sleep(2000); System.gc()
    }
  }
}
