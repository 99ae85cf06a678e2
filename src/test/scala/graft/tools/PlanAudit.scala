package graft.tools

import graft.{FrontierBench, SparkEntry}

/** Sweeps EVERY SparkEntry query's executed plan for the silent
  * degradations that pass correctness but break at scale:
  * SortAggregate (a struct-valued min/min_by demotes the hash
  * aggregate — two full sorts), CartesianProduct / BroadcastNestedLoopJoin
  * (a join lost its equi-keys), and single-partition Window (a global
  * window serializes the stream through one task).
  * Run: sbt "Test/runMain graft.tools.PlanAudit [sfDir]" */
object PlanAudit {
  private val Flags = Seq(
    "SortAggregate", "CartesianProduct", "BroadcastNestedLoop",
    "Exchange SinglePartition")

  /** SPECIFIC flags that are the QUERY's design, not a degradation —
    * each entry names the one flag it excuses and says why. Any OTHER
    * flag on the same query (e.g. dedup_paragraphs regressing to a
    * SortAggregate) is still a finding. */
  private val ByDesign: Map[String, (String, String)] = Map(
    "embed_topk" -> (("BroadcastNestedLoop", "brute-force exact top-k IS " +
      "all-pairs by definition; queries broadcast, corpus streams")),
    "embed_ann_lsh" -> (("BroadcastNestedLoop", "the query embeds the " +
      "brute-force exact baseline for its containment check; the ANN " +
      "path itself is a bucket join (spec-pinned)")),
    "embed_ann_ivf_probe" -> (("BroadcastNestedLoop", "same embedded " +
      "brute-force containment baseline as embed_ann_lsh")),
    "dedup_paragraphs" -> (("BroadcastNestedLoop", "the query plants a " +
      "boilerplate paragraph via crossJoin(broadcast(1-row df)) — " +
      "fixture construction; the operator plan is clean (PLANS.md §13)")))

  /** Run the sweep; returns (query, finding) for every NON-whitelisted
    * flag. Used by the CLI below and by PlanAuditSpec as a gate. */
  def audit(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      report: String => Unit = _ => ()): Seq[(String, String)] = {
    val found = Seq.newBuilder[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val hits = Flags.filter(plan.contains)
        val (excused, real) = hits.partition(h => ByDesign.get(name).exists(_._1 == h))
        excused.foreach(h => report(f"$name%-28s by-design ($h) — ${ByDesign(name)._2}"))
        if (real.nonEmpty) {
          found += name -> real.mkString(", ")
          report(f"$name%-28s FLAG ${real.mkString(", ")}")
        } else if (excused.isEmpty) report(f"$name%-28s ok")
      } catch { case e: Throwable =>
        val msg = e.toString.take(120)
        found += name -> s"ERROR $msg"
        report(f"$name%-28s ERROR $msg")
      }
    }
    found.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val bad = audit(spark, sfDir, println)
    println(s"PLAN_AUDIT flagged=${bad.size}")
    spark.stop()
  }
}
