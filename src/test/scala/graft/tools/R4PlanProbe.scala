package graft.tools

import graft.FrontierBench
import graft.operators.{Corpus, LinkGraph, Search, Sessions}

/** Executed-plan dump for the round-4 additions (PageRank, inverted
  * index, BM25 search, sessionization) at sf0.1 — feeds BENCH/PLANS.md.
  * Run: sbt "Test/runMain graft.tools.R4PlanProbe" */
object R4PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val events = spark.read.parquet(s"$sf/events.parquet")

    def show(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"==== $tag rows=$n wall=" +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ====")
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }

    val edges = spark.sql(
      s"""SELECT DISTINCT o_orderkey % 200 AS src, o_orderkey % 193 AS dst
          FROM parquet.`$sf/orders.parquet`
          WHERE o_orderkey % 200 <> o_orderkey % 193""")
    show("pagerank one-iteration update (materialize=false probe hook — " +
      "production rounds checkpoint, so the shipped per-round plan is " +
      "exactly this subtree over a checkpoint scan)") {
      LinkGraph.pageRankImpl(edges, "src", "dst", iters = 1,
        scale = 1000000L, damping = 85, materialize = false)
    }
    show("inverted index")(Corpus.invertedIndex(docs, "text", "doc_id", maxDf = 32))
    show("bm25 top-k")(Search.bm25TopK(docs, "text", "doc_id",
      Seq("q1" -> "spark join merge", "q2" -> "window filter vector"), k = 10))
    show("sessionize")(Sessions.sessionize(events, "user_id", "ts", "event_id", "24 hours"))
    spark.stop()
  }
}
