package graft.tools

import graft.{FrontierBench, SparkEntry}

/** Histogram of Spark jobs by call site for one SparkEntry query —
 *  finds where a driver-latency-bound query's job count goes.
 *  Usage: JobCountProbe [query] [sfDir] */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "crawl_schedule"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("?")
        sites.merge(site, 1, (a, b) => a + b)
      }
    })
    val reps = sys.env.getOrElse("PROBE_REPS", "1").toInt
    var n = 0L
    val times = (1 to reps).map { r =>
      if (r == reps) sites.clear() // histogram reflects the last (warm) rep
      val t0 = System.nanoTime()
      n = SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val total = sites.values.asScala.map(_.toInt).sum
    println(f"== $name rows=$n totalJobs=$total min=${times.min}%.2fs all=${times.map(t => f"$t%.2f").mkString(",")}")
    sites.asScala.toSeq.sortBy(-_._2).foreach { case (s, c) => println(f"$c%4d  $s") }
    spark.stop()
  }
}
