package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.UrlCanon
import graft.operators.{Dedup, Politeness}
import graft.plans.{CrawlJob, CrawlSettings}
import graft.sources.Fixtures

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §B.
  *
  * Each SQL-expressible operator gets a (Spark query, DuckDB oracle) pair
  * over a synthetic URL frontier derived inline from the sfDir `orders`
  * parquet with engine-portable SQL (identical expressions both sides, no
  * intermediate files). Engine-only operators (extraction, the crawl wave
  * loop) are exposed as rows-only queries and pinned by golden/simulator
  * specs instead. */
object SparkEntry {

  /** Shared frontier derivation (FIXTURES.md §B): urls with deterministic
    * duplicates (orderkey % 5000), mixed-case hosts, fragments. */
  private def urlsCte(from: String): String = s"""
    SELECT concat('http://',
                  CASE WHEN (o_orderkey % 5000) % 5 = 0 THEN 'HOST' ELSE 'host' END,
                  CAST((o_orderkey % 5000) % 50 AS STRING), '.example.com/o/',
                  CAST(o_orderkey % 5000 AS STRING),
                  CASE WHEN (o_orderkey % 5000) % 7 = 0 THEN '#frag' ELSE '' END) AS url,
           CAST(o_orderkey % 3 AS INT) AS priority,
           o_orderkey AS seq
    FROM $from"""

  private def urlsDF(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(urlsCte(s"parquet.`$sfDir/orders.parquet`"))

  private def oracle(body: String): String =
    s"WITH urls AS (${urlsCte("orders")}) $body"

  // engine UDFs (the operators under test)
  private val stripFragUdf = udf((u: String) => UrlCanon.stripFragment(u))
  private val hostUdf = udf((u: String) => UrlCanon.host(u))

  /** url_canon/host enrichment restricted to the SQL-expressible core
    * (P5/P7/P8) so DuckDB can reproduce it. */
  private def enriched(spark: SparkSession, sfDir: String): DataFrame =
    urlsDF(spark, sfDir)
      .withColumn("url_canon", lower(stripFragUdf(col("url"))))
      .withColumn("host", hostUdf(lower(col("url"))))

  private val enrichedOracle =
    """SELECT url, priority, seq,
              lower(regexp_replace(url, '#.*$', '')) AS url_canon,
              lower(regexp_extract(url, '^http://([^/#]+)', 1)) AS host
       FROM urls"""

  /** Flagship: the §7.2 end-to-end slice — a real crawl over the
    * deterministic synthetic corpus (seeds → dedup → politeness →
    * fetch-join → extract → outlinks → waves), returning the schedule. */
  def entry(spark: SparkSession): DataFrame = {
    val v = 200L
    val pages = Fixtures.pagesDF(spark, v)
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val settings = CrawlSettings(size = 60, nPriorities = 1, hostBudget = 4,
      waveCap = 60, retries = 1, maxWaves = 20, urlPattern = Fixtures.UrlPattern,
      extract = true, useBloom = true, bloomCapacity = 4096, numBuckets = 8)
    val job = new CrawlJob(spark, pages, settings, dir)
    job.run(Fixtures.seeds(v))
    job.scheduleTable
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P7/P8 core: fragment strip + lowercase
    "canon_strip_fragment" -> ((s, d) =>
      urlsDF(s, d).select(lower(stripFragUdf(col("url"))).as("url_nofrag"), col("seq"))),

    // P5: host extraction
    "host_extract" -> ((s, d) =>
      urlsDF(s, d).select(hostUdf(lower(col("url"))).as("host"), col("seq"))),

    // D1: first-seen dedup
    "dedup_anti" -> ((s, d) =>
      Dedup.firstSeenInBatch(enriched(s, d), Seq(col("seq")))
        .select(col("url_canon"), col("seq"))),

    // O6: per-host top-k politeness quota
    "politeness_topk" -> ((s, d) =>
      Politeness.hostEligible(enriched(s, d), 3)
        .select(col("host"), col("priority"), col("seq"), col("url_canon"))),

    // O6 at scale: salted two-phase top-k (same result — its own oracle)
    "politeness_topk_salted" -> ((s, d) =>
      Politeness.hostEligibleSalted(enriched(s, d), 3, 4)
        .select(col("host"), col("priority"), col("seq"), col("url_canon"))),

    // O4: globally ordered budget grant
    "budget_limit" -> ((s, d) =>
      urlsDF(s, d).orderBy(col("priority").asc, col("seq").asc).limit(100)
        .select(col("url"), col("priority"), col("seq"))),

    // P3: priority clamp
    "priority_clamp" -> ((s, d) =>
      urlsDF(s, d).select(col("seq"),
        Politeness.clampPriority(col("priority") * 7 - 3, 3).as("pclamp"))),

    // MQ put path: union two waves + first-seen dedup
    "frontier_union_dedup" -> ((s, d) => {
      val e = enriched(s, d)
      val w1 = e.filter(col("seq") % 2 === 0)
      val w2 = e.filter(col("seq") % 3 === 0)
      Dedup.firstSeenInBatch(w1.unionByName(w2), Seq(col("seq")))
        .select(col("url_canon"), col("seq"))
    }),

    // A1-A7: per-group counters (partial→final aggregation)
    "wave_counts" -> ((s, d) =>
      enriched(s, d).groupBy(col("host")).agg(
        count(lit(1)).as("n"),
        min(col("seq")).as("min_seq"),
        max(col("seq")).as("max_seq"),
        sum(col("priority")).as("sum_priority"))),

    // J5: salted partition assignment is total and countable
    "skew_salt" -> ((s, d) =>
      enriched(s, d)
        .withColumn("salt", (col("seq") % 8).cast("int"))
        .groupBy(col("host"), col("salt")).agg(count(lit(1)).as("n"))),

    // X1/X2: extraction over the synthetic corpus (engine-only → rows-only)
    "extract_text" -> ((s, _) => {
      val pages = Fixtures.pagesDF(s, 60L)
      val ex = udf((html: Array[Byte], u: String) =>
        graft.functions.Extract.extractText(html, u))
      pages.select(col("url"), length(ex(col("html"), col("url"))).as("n_chars"))
    }),

    // O1-O12 wave loop end-to-end (engine-only → rows-only)
    "crawl_schedule" -> ((s, _) => {
      val v = 150L
      val pages = Fixtures.pagesDF(s, v)
      val dir = java.nio.file.Files.createTempDirectory("graft-q-crawl").toString
      val settings = CrawlSettings(size = 40, nPriorities = 1, hostBudget = 3,
        waveCap = 40, retries = 1, maxWaves = 15, urlPattern = Fixtures.UrlPattern,
        extract = false, useBloom = true, bloomCapacity = 4096, numBuckets = 8)
      val job = new CrawlJob(s, pages, settings, dir)
      job.run(Fixtures.seeds(v))
      job.scheduleTable
    }))

  /** DuckDB-equivalent SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "canon_strip_fragment" -> oracle(
      "SELECT lower(regexp_replace(url, '#.*$', '')) AS url_nofrag, seq FROM urls"),

    "host_extract" -> oracle(
      "SELECT lower(regexp_extract(url, '^http://([^/#]+)', 1)) AS host, seq FROM urls"),

    "dedup_anti" -> oracle(
      s"""SELECT url_canon, min(seq) AS seq FROM ($enrichedOracle) e GROUP BY url_canon"""),

    "politeness_topk" -> oracle(
      s"""SELECT host, priority, seq, url_canon FROM (
            SELECT host, priority, seq, url_canon,
                   row_number() OVER (PARTITION BY host ORDER BY priority, seq) AS rn
            FROM ($enrichedOracle) e) t
          WHERE rn <= 3"""),

    "politeness_topk_salted" -> oracle(
      s"""SELECT host, priority, seq, url_canon FROM (
            SELECT host, priority, seq, url_canon,
                   row_number() OVER (PARTITION BY host ORDER BY priority, seq) AS rn
            FROM ($enrichedOracle) e) t
          WHERE rn <= 3"""),

    "budget_limit" -> oracle(
      "SELECT url, priority, seq FROM urls ORDER BY priority, seq LIMIT 100"),

    "priority_clamp" -> oracle(
      "SELECT seq, CAST(least(greatest(priority * 7 - 3, 0), 2) AS INT) AS pclamp FROM urls"),

    "frontier_union_dedup" -> oracle(
      s"""SELECT url_canon, min(seq) AS seq FROM (
            SELECT * FROM ($enrichedOracle) e WHERE seq % 2 = 0
            UNION ALL
            SELECT * FROM ($enrichedOracle) e2 WHERE seq % 3 = 0) u
          GROUP BY url_canon"""),

    "wave_counts" -> oracle(
      s"""SELECT host, count(*) AS n, min(seq) AS min_seq, max(seq) AS max_seq,
                 CAST(sum(priority) AS BIGINT) AS sum_priority
          FROM ($enrichedOracle) e GROUP BY host"""),

    "skew_salt" -> oracle(
      s"""SELECT host, CAST(seq % 8 AS INT) AS salt, count(*) AS n
          FROM ($enrichedOracle) e GROUP BY host, CAST(seq % 8 AS INT)"""))
}
