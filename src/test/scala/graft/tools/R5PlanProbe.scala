package graft.tools

import org.apache.spark.sql.functions._
import graft.{FrontierBench, SparkEntry}

/** Prints the executed plans behind BENCH/PLANS.md §16 (the r5
  * admission/index additions). Run:
  * sbt "Test/runMain graft.tools.R5PlanProbe [sfDir]" */
object R5PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String): Unit = {
      println(s"\n==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0))
    }

    Seq("url_latest_revision", "host_blocklist", "robots_filter_wildcard",
      "cdx_index", "split_assign", "quality_linear").foreach(show)

    // one pointer-doubling round of the redirect resolver, composed by
    // hand (resolve() checkpoints per round, hiding the join shape)
    println("\n==== redirect doubling round (composed) ====")
    val base = spark.sql(
      s"""SELECT DISTINCT concat('u', CAST(o_orderkey % 5000 AS STRING)) AS src,
                 concat('u', CAST((o_orderkey + 1) % 5000 AS STRING)) AS target,
                 CAST(1 AS BIGINT) AS hops
          FROM parquet.`$sfDir/orders.parquet`""")
    val jumped = base.join(
      base.select(col("src").as("target"), col("target").as("__nxt"),
        col("hops").as("__nhops")), Seq("target"), "left")
      .select(col("src"), coalesce(col("__nxt"), col("target")).as("target"),
        (col("hops") + coalesce(col("__nhops"), lit(0L))).as("hops"))
    println(jumped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0))

    // WET egress plan: the shard builder sits directly on the scan
    println("\n==== wet_shards ====")
    val pages = spark.sql(
      s"""SELECT concat('http://h/', CAST(o_orderkey AS STRING)) AS url,
                 o_orderdate AS ts, 'body text' AS text
          FROM parquet.`$sfDir/orders.parquet`""")
    println(graft.sources.Warc.wetShards(pages, "url", "ts", "text")
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))

    spark.stop()
  }
}
