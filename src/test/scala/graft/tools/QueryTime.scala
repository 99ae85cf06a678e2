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
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"QUERY $name rep=$r ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }
    spark.stop()
  }
}
