package graft.tools

import org.apache.spark.sql.functions._
import graft.FrontierBench

/** Isolate the narrow canonicalize/host UDF stage: time it k times in one
  * JVM to separate steady-state scaling from first-run JIT/GC artifacts. */
object EnrichProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 8000000L
    val spark = FrontierBench.session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 8).foreach { rep =>
      val t0 = System.nanoTime()
      FrontierBench.candidates(spark, n)
        .select(sum(length(col("url_canon"))),
          sum(pmod(col("url_hash"), lit(1000000L)))).collect()
      println(f"GRAFT_ENRICH cores=$cores rep=$rep ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
