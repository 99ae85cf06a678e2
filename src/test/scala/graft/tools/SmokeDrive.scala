package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Fixtures

/** Manual end-to-end drive: generate the pages table distributed through
  * Spark, write/read parquet, and re-extract text via a UDF — the same
  * surface the crawl job will use. Run: sbt "Test/runMain graft.tools.SmokeDrive" */
object SmokeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val v = 200L
    val pages = Fixtures.pagesDS(spark, v)
    val out = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    pages.write.mode("overwrite").parquet(s"$out/pages")
    val back = spark.read.parquet(s"$out/pages")
    println("schema: " + back.schema.simpleString)
    println("rows: " + back.count())

    val extractUdf = udf((html: Array[Byte], url: String) =>
      graft.functions.Extract.extractText(html, url))
    val reextracted = back
      .withColumn("text2", extractUdf(col("html"), col("url")))
      .withColumn("match", col("text") === col("text2"))
    val matches = reextracted.filter(col("match")).count()
    println(s"re-extraction byte-match: $matches / $v")

    val canonUdf = udf((u: String) => graft.functions.UrlCanon.canonicalize(u))
    val outlinksUdf = udf((html: Array[Byte], url: String) =>
      graft.functions.Extract.extractOutlinks(html, url))
    val links = back.select(explode(outlinksUdf(col("html"), col("url"))).as("out"))
      .select(canonUdf(col("out")).as("canon"))
    println("distinct outlink canon urls: " + links.distinct().count())
    links.show(5, truncate = false)
    back.select("url", "lang").show(5, truncate = false)
    println("sample text:\n" + back.filter(col("url").endsWith("/p/1")).select("text").as[String].head().take(200))
    spark.stop()
  }
}
