package graft

import org.apache.spark.sql.functions._
import graft.operators.Robots

/** Ad-hoc decomposition of the sitemap_parse query cost (diagnostics). */
object ProfileSitemap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = FrontierBench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ps] $tag%-24s min=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val urls = spark.sql(s"""
      SELECT concat('http://',
                    CASE WHEN (o_orderkey % 5000) % 5 = 0 THEN 'HOST' ELSE 'host' END,
                    CAST((o_orderkey % 5000) % 50 AS STRING), '.example.com/o/',
                    CAST(o_orderkey % 5000 AS STRING),
                    CASE WHEN (o_orderkey % 5000) % 7 = 0 THEN '#frag' ELSE '' END) AS url,
             CAST(o_orderkey % 3 AS INT) AS priority,
             o_orderkey AS seq
      FROM parquet.`$sfDir/orders.parquet`""")
    val stripFragUdf = udf((u: String) => graft.functions.UrlCanon.stripFragment(u))
    val hostUdf = udf((u: String) => graft.functions.UrlCanon.host(u))
    val enriched = urls
      .withColumn("url_canon", lower(stripFragUdf(col("url"))))
      .withColumn("host", hostUdf(lower(col("url"))))
    time("enriched only") { noop(enriched) }
    val sm = enriched.select(col("host"), col("seq"),
      concat(
        lit("<urlset><url><loc>"), col("url_canon"),
        lit("</loc><lastmod>202"), expr("cast(seq % 5 as string)"),
        lit("-0"), expr("cast(1 + seq % 9 as string)"),
        lit("-15</lastmod><priority>0."), expr("cast(seq % 10 as string)"),
        lit("</priority></url><url>\n  <loc>"), col("url_canon"),
        lit("/alt</loc>\n</url><url><lastmod>2020-01-01</lastmod></url></urlset>"))
        .as("body"))
    time("enriched+body") { noop(sm) }
    time("parse e2e") { noop(Robots.parseSitemapXml(sm, "body")
      .select(col("host"), col("seq"), col("loc"), col("lastmod"), col("sm_priority"))) }
    time("outer explode only") {
      noop(sm.withColumn("__entry",
        explode(expr("regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1)"))))
    }
    time("outer split only") {
      noop(Robots.tagEntries(sm, "body", "url"))
    }
    time("split outer + loc") {
      noop(Robots.tagEntries(sm, "body", "url")
        .withColumn("loc", trim(regexp_extract(col("__entry"), "<loc>([^<]*)</loc>", 1)))
        .filter(length(col("loc")) > 0).drop("__entry"))
    }
    time("split outer + loc + lastmod") {
      noop(Robots.tagEntries(sm, "body", "url")
        .withColumn("loc", trim(regexp_extract(col("__entry"), "<loc>([^<]*)</loc>", 1)))
        .filter(length(col("loc")) > 0)
        .withColumn("lastmod",
          nullif(regexp_extract(col("__entry"), "<lastmod>([^<]*)</lastmod>", 1), lit("")))
        .drop("__entry"))
    }
    spark.stop()
  }
}
