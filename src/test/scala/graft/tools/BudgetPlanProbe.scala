package graft.tools
import graft.{FrontierBench, SparkEntry}
object BudgetPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("budget_limit")(spark, "/root/testdata/sf0.1").explain("formatted")
    spark.stop()
  }
}
