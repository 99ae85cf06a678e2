package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark of the per-job fixed cost on this host (diagnostics
  * only): times a trivial one-stage job and a trivial two-stage shuffle
  * job repeatedly, so genuine operator costs can be separated from the
  * scheduler/stage-tail floor when reading the other profilers. */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = FrontierBench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def stats(tag: String, n: Int)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val s = ts.sorted
      println(f"[floor] $tag%-24s min=${s.head}%.3f med=${s(n / 2)}%.3f max=${s.last}%.3f")
    }
    val df = spark.range(10000).toDF("id")
    noop(df) // warm codegen
    stats("1-stage narrow", 20) { noop(spark.range(10000).toDF("id")) }
    stats("2-stage shuffle", 20) { noop(spark.range(10000).toDF("id").repartition(64, col("id"))) }
    stats("distinct (3 stages)", 20) {
      noop(spark.range(10000).toDF("id").repartition(64, col("id")).distinct())
    }
    stats("2-stage shuffle p8", 20) { noop(spark.range(10000).toDF("id").repartition(8, col("id"))) }
    stats("2-stage shuffle p256", 20) { noop(spark.range(10000).toDF("id").repartition(256, col("id"))) }
    stats("range 1-task", 20) { noop(spark.range(0, 10000, 1, 1).toDF("id")) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    stats("2-stage shuffle noAQE", 20) { noop(spark.range(10000).toDF("id").repartition(64, col("id"))) }
    stats("groupBy noAQE (64 red.)", 20) {
      noop(spark.range(10000).toDF("id").groupBy(col("id") % 97).count())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    stats("groupBy AQE", 20) {
      noop(spark.range(10000).toDF("id").groupBy(col("id") % 97).count())
    }
    spark.stop()
  }
}
