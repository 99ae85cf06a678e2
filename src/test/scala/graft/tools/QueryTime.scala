package graft.tools

import graft.{FrontierBench, SparkEntry}

/** Time a single SparkEntry query: `QueryTime <name> [sfDir] [reps]`. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    val nJobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        nJobs.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach(t0 => jobNanos.addAndGet(System.nanoTime() - t0))
      }
    })
    (1 to reps).foreach { r =>
      nJobs.set(0); jobNanos.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"QUERY $name rep=$r $wall%7.2f s rows=$n jobs=${nJobs.get} jobSecs=${jobNanos.get / 1e9}%.2f")
    }
    spark.stop()
  }
}
