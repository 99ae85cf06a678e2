package graft.tools

import graft.FrontierBench
import graft.operators.{Corpus, LinkGraph, TextDedup}
import org.apache.spark.sql.functions._

/** Executed-plan dump for the round-4 batch-II additions (anchor-text
  * corpus, source profile, LM scoring, host boilerplate) at sf0.1 —
  * feeds BENCH/PLANS.md §15.
  * Run: sbt "Test/runMain graft.tools.R4bPlanProbe" */
object R4bPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    def show(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"==== $tag rows=$n wall=" +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }

    val links = spark.sql(
      s"""SELECT concat('h', o_orderkey % 97) AS src_host,
                 concat('http://t', o_orderkey % 40, '.example.com/p/', o_orderkey % 200) AS dst,
                 concat('anchor ', o_orderkey % 13) AS anchor
          FROM parquet.`$sf/orders.parquet`""")
    show("anchor summary")(LinkGraph.anchorSummary(links, "src_host", "dst", "anchor"))
    show("source profile")(Corpus.sourceProfile(docs, "source", "text", "lang"))
    show("lm score (model = even half)") {
      Corpus.lmScore(docs,
        Corpus.unigramModel(docs.filter(col("doc_id") % 2 === 0), "text"),
        "text", "doc_id", threshold = 60000L)
    }
    show("host boilerplate")(TextDedup.hostBoilerplate(docs, "source", "text", "doc_id", 3))
    spark.stop()
  }
}
