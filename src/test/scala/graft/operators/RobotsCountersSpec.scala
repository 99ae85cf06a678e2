package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{CrawlJob, CrawlSettings}
import graft.sources.Fixtures

class RobotsCountersSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("parseRobotsTxt: star group, comments, multi-agent headers, allow ignored") {
    val txt =
      """# comment
        |User-agent: googlebot
        |Disallow: /google-only
        |
        |User-agent: *
        |User-agent: graftbot
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok
        |Disallow: /tmp
        |
        |User-agent: bingbot
        |Disallow: /bing
        |""".stripMargin
    assert(Robots.parseRobotsTxt(txt) == Seq("/private/", "/tmp"))
    assert(Robots.parseRobotsTxt("User-agent: *\nDisallow:") == Seq.empty) // empty = allow all
    assert(Robots.parseRobotsTxt(null) == Seq.empty)
  }

  test("filterAllowed drops disallowed paths per host only") {
    val cands = spark.createDataFrame(Seq(
      ("http://a.com/private/x", "a.com"),
      ("http://a.com/public/x", "a.com"),
      ("http://b.com/private/x", "b.com"))).toDF("url_canon", "host")
    val rules = Robots.rulesFromTxt(spark, Seq("a.com" -> "User-agent: *\nDisallow: /private/"))
    val kept = Robots.filterAllowed(cands, rules).select("url_canon")
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("http://a.com/public/x", "http://b.com/private/x"))
  }

  test("filterAllowed: AQE still broadcasts a small rules table with no hint") {
    // the rules join carries no broadcast hint (unbounded at 10^7+ hosts);
    // this pins that AQE converts it to a broadcast join at runtime when
    // the rules table is actually small — the common case costs nothing
    val cands = spark.range(0, 2000).selectExpr(
      "concat('http://h', id % 50, '.com/p/', id) AS url_canon",
      "concat('h', id % 50, '.com') AS host")
    val rules = Robots.rulesFromTxt(spark, Seq("h0.com" -> "User-agent: *\nDisallow: /p/"))
    val out = Robots.filterAllowed(cands, rules)
    out.count() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), s"expected runtime broadcast in:\n$plan")
  }

  test("crawl with robots rules never schedules disallowed urls; counters/inc populated") {
    val v = 200L
    val pages = Fixtures.pagesDF(spark, v)
    val rules = Robots.rulesFromTxt(spark,
      Seq("host0.example.com" -> "User-agent: *\nDisallow: /p/"))
    val dir = java.nio.file.Files.createTempDirectory("crawl-robots").toString
    val settings = CrawlSettings(size = 60, hostBudget = 3, waveCap = 60, retries = 0,
      maxWaves = 20, urlPattern = Fixtures.UrlPattern, extract = true,
      useBloom = false, numBuckets = 8)
    val job = new CrawlJob(spark, pages, settings, dir, robotsRules = Some(rules))
    val summary = job.run(Fixtures.seeds(v))
    val host0 = job.scheduleTable.filter(col("host") === "host0.example.com").count()
    assert(host0 == 0, "robots-disallowed host0 pages must never be scheduled")
    assert(summary.finished > 0)
    // O9 inc table: one row per finished fetch
    assert(job.incTable.count() == summary.finished)
    // A1/A6 accumulator counters match driver-side metrics
    val c = job.counters.value
    assert(c(("budget", "finishes")) == summary.finished)
    assert(c(("extract", "pages")) >= summary.finished) // ≥: speculative/retried tasks may recount
  }

  test("counter aggregators map to sum/collect_list/collect_set/max_by") {
    val df = spark.createDataFrame(Seq(
      ("g1", "a", 1L, 1L), ("g1", "a", 2L, 2L), ("g1", "b", 5L, 3L),
      ("g2", "a", 7L, 4L), ("g2", "a", 7L, 5L))).toDF("g", "i", "v", "ord")
    def run(kind: Counters.Kind) =
      Counters.aggregate(df, col("g"), col("i"), col("v"), kind, col("ord"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.get(2)).toMap
    val add = run(Counters.Add)
    assert(add(("g1", "a")) == 3L && add(("g2", "a")) == 14L)
    val merge = run(Counters.Merge)
    assert(merge(("g1", "a")).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(1L, 2L))
    val uniq = run(Counters.Uniq)
    assert(uniq(("g2", "a")).asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(7L))
    val over = run(Counters.Overwrite)
    assert(over(("g1", "a")) == 2L) // last write by ord
  }

  test("CounterAccumulator merges executor partials") {
    val acc = new CounterAccumulator()
    spark.sparkContext.register(acc, "spec_counters")
    spark.sparkContext.parallelize(1 to 100, 8).foreach(i => acc.add("g", s"i${i % 2}"))
    assert(acc.value(("g", "i0")) == 50L)
    assert(acc.value(("g", "i1")) == 50L)
  }
}
