package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * robots.txt politeness rules (north-rule component; the reference has no
 * robots support — engine addition, offline model).
 *
 * Rules live in a small table (host, prefix): path prefixes disallowed for
 * `User-agent: *`. Candidate filtering is a broadcast join on host + an
 * `exists` prefix check — the rules side is tiny (one row per disallow
 * line) so the frontier never shuffles for robots.
 */
object Robots {

  /** Parse a robots.txt body for the `*` agent → disallowed path prefixes.
   *  Standard semantics: group by User-agent, collect Disallow lines of
   *  groups containing `*`; empty Disallow means allow-all; comments (#)
   *  stripped; `Allow` lines ignored (prefix-disallow model only). */
  def parseRobotsTxt(content: String): Seq[String] = {
    if (content == null) return Seq.empty
    var groupAgents = Set.empty[String]
    var inHeader = false // reading the consecutive User-agent lines of a group
    val out = Seq.newBuilder[String]
    content.linesIterator.foreach { raw =>
      val line = { val i = raw.indexOf('#'); if (i >= 0) raw.substring(0, i) else raw }.trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inHeader) { groupAgents = Set.empty; inHeader = true }
              groupAgents += value.toLowerCase
            case "disallow" =>
              inHeader = false
              if (groupAgents.contains("*") && value.nonEmpty) out += value
            case _ => // allow / crawl-delay / sitemap / unknown end the header
              inHeader = false
          }
        }
      }
    }
    out.result()
  }

  /** Build the rules table from (host, robots.txt body) rows. */
  def rulesFromTxt(spark: SparkSession, robots: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    robots.flatMap { case (host, txt) => parseRobotsTxt(txt).map(p => (host, p)) }
      .toDF("host", "prefix")
  }

  /** Path component of a canonical URL ('' → '/'). */
  def pathOf(urlCanon: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(urlCanon, "^[a-z][a-z0-9+.-]*://[^/]*", ""), "^$", "/")

  /** Drop candidates whose path is disallowed for their host.
   *  `candidates` needs (host, url_canon); `rules` is (host, prefix).
   *
   *  No broadcast HINT on the rules side: per-host rules for a 10^7+
   *  host web crawl reach GBs, and a hint is obeyed even at OOM size
   *  (the same hazard class as the r2 hot-host broadcast). AQE makes
   *  this a broadcast join at runtime when the measured rules table is
   *  small (every fixture/test here), and falls back to a shuffle join
   *  keyed on host — an exchange the politeness top-k downstream pays
   *  anyway — when it is not. */
  def filterAllowed(candidates: DataFrame, rules: DataFrame): DataFrame = {
    val agg = rules.groupBy(col("host")).agg(collect_list(col("prefix")).as("__prefixes"))
    candidates.join(agg, Seq("host"), "left")
      .withColumn("__path", pathOf(col("url_canon")))
      .filter(col("__prefixes").isNull ||
        !exists(col("__prefixes"), p => col("__path").startsWith(p)))
      .drop("__prefixes", "__path")
  }
}
