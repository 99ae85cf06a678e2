package graft.tools
import graft.{FrontierBench, SparkEntry}
object ShipPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("decontaminate_ship")(spark, "/root/testdata/sf0.1")
    df.count()
    println("=== decontaminate_ship ===")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.startsWith("== Initial Plan")).mkString("\n"))
    spark.stop()
  }
}
