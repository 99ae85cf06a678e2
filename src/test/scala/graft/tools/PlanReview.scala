package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Politeness, Similarity, TextDedup}

/** Prints formatted plans of the hot pipelines for manual review:
  * column pruning on the pages scan, join strategies, codegen spans.
  * Run: sbt "Test/runMain graft.tools.PlanReview" */
object PlanReview {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("plan-review").toString
    graft.sources.Fixtures.pagesDF(spark, 200L).write.parquet(s"$dir/pages")
    val pages = spark.read.parquet(s"$dir/pages")

    println("=== fetch join: scheduled(url_canon only) ⋈ pages — pages scan must prune to url/html/lang ===")
    val scheduled = Seq("http://host0.example.com/p/1", "http://host1.example.com/p/3")
      .toDF("url_canon")
    scheduled.join(pages.select(col("url").as("url_canon"), col("html"), col("lang")),
      Seq("url_canon"), "left").explain("formatted")

    println("=== frontier filter pushdown: priority filter must reach the scan ===")
    spark.range(10).selectExpr("concat('u', id) as url_canon", "cast(id % 3 as int) as priority", "id as seq")
      .write.parquet(s"$dir/frontier")
    spark.read.parquet(s"$dir/frontier").filter(col("priority") === 0)
      .select("url_canon", "seq").explain("formatted")

    println("=== dedup anti-join plan ===")
    val cands = spark.read.parquet(s"$dir/frontier")
      .withColumn("url_hash", xxhash64(col("url_canon")))
    val seen = cands.limit(3).select("url_hash", "url_canon")
    Dedup.antiJoinSeen(cands, seen).explain("formatted")

    println("=== salted politeness (two-phase) ===")
    val f = cands.withColumn("host", lit("h")).withColumn("force", lit(false))
    Politeness.hostEligibleSalted(f, 2, 4).explain("formatted")

    println("=== brute-force ANN: queries must broadcast ===")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 2)
      .explain("formatted")

    spark.stop()
  }
}
