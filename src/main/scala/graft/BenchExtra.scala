package graft

import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round iteration harness (guide §1): times a SUBSET of the
  * declared query suite with the exact methodology of Bench stage 2
  * (same session, `.count()` action, cache cleared between reps, min of
  * reps recorded) so per-query numbers are comparable to BENCH_r*.json —
  * without paying for the 35-minute scaling stages. Optionally dumps
  * `.explain("formatted")` plans for the judge's plan-claim checks.
  *
  * This main is ADDITIVE: `Bench.scala` (the frozen driver contract) is
  * untouched. Env:
  *   SPARK_GRAFT_SF_DIR      data dir          (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS        local[] core count (default 32)
  *   SPARK_GRAFT_QUERY_REPS  timed reps/query  (default 2)
  *   SPARK_GRAFT_ONLY        comma list of query names (default: all)
  *   SPARK_GRAFT_PLAN_DIR    if set, write <dir>/<query>.txt explain output
  *   SPARK_GRAFT_NOOP        "true": time a noop-sink write instead of
  *                           count() (guide §1.4 — computes every column)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val useNoop = sys.env.get("SPARK_GRAFT_NOOP").contains("true")

    val spark = FrontierBench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    planDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        planDir.foreach { d =>
          try {
            val txt = fn(spark, sfDir).queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(d).resolve(s"$name.txt"), txt)
          } catch { case e: Throwable =>
            System.err.println(s"[bx] plan dump $name failed: ${e.getMessage}")
          }
        }
        val times = (1 to reps).map { _ =>
          spark.sparkContext.setJobDescription(name)
          val t = System.nanoTime()
          try {
            if (useNoop)
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            else fn(spark, sfDir).count()
          } catch { case e: Throwable =>
            System.err.println(s"[bx] $name failed: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t) / 1e9
          spark.catalog.clearCache()
          spark.sparkContext.setJobDescription(null)
          dt
        }
        acc += name -> times.min
        println(f"[bx] $name min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    val qs = acc.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(f"""{"metric":"bx_total","value":${acc.map(_._2).sum}%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
