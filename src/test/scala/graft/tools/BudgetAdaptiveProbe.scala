package graft.tools

import org.apache.spark.sql.functions._
import graft.FrontierBench
import graft.operators.Politeness

/** Plan evidence for the budgets-aware adaptive politeness path
  * (PLANS.md §11): the hot/cold split must survive a per-host budgets
  * table — hot-host rows ranked through the salted two-phase windows,
  * cold rows through a broadcast anti-join, one shared input exchange. */
object BudgetAdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cands = spark.range(0L, 3000000L).selectExpr(
      """concat('http://', case when id % 3 = 0 then 'mega'
           else concat('tail', cast(id % 97 as string)) end, '.example.com') as host""",
      "concat('http://x/', cast(id as string)) as url_canon",
      "cast(id % 4 as int) as priority",
      "id as seq")
    val budgets = Seq(("http://mega.example.com", 100)).toDF("host", "host_budget")
    val out = Politeness.hostEligibleBudgetsAdaptive(cands, budgets, 100000, salts = 8)
    out.count()
    println("=== budgets-adaptive politeness (mega-host budget 100, salts 8) ===")
    println(out.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.startsWith("== Initial Plan")).mkString("\n"))
    spark.stop()
  }
}
