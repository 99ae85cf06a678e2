package graft.plans

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.ColaSimulator
import graft.sources.Fixtures

/** The north-rule contract: the engine's crawl ordering, URL-seen set,
  * dead letters and resume behavior must match the independent in-memory
  * reference simulator under the same seed list + politeness budget.
  * Engine runs are shared across assertions (each is ~15 Spark jobs/wave). */
class CrawlJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val V = 300L

  private lazy val pagesMap: Map[String, String] =
    (0L until V).map(id => Fixtures.canonUrl(id) -> Fixtures.htmlFor(id, V)).toMap

  private var pagesDF: DataFrame = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pagesDF = Fixtures.pagesDF(spark, V)
    pagesDF.persist().count()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"crawl-$tag").toString

  private val base = CrawlSettings(
    size = 120, nPriorities = 1, hostBudget = 3, waveCap = 60,
    retries = 1, maxWaves = 30, urlPattern = Fixtures.UrlPattern,
    extract = false, useBloom = false, numBuckets = 8)

  private def runEngine(settings: CrawlSettings, dir: String,
      priorityExpr: Column => Column = _ => lit(0)): (CrawlJob, CrawlSummary) = {
    val job = new CrawlJob(spark, pagesDF, settings, dir, priorityExpr)
    val summary = job.run(Fixtures.seeds(V))
    (job, summary)
  }

  private def runSim(settings: CrawlSettings, priorityOf: String => Int = _ => 0): ColaSimulator = {
    val sim = new ColaSimulator(settings, pagesMap, priorityOf)
    sim.run(Fixtures.seeds(V))
    sim
  }

  private def scheduleTuples(job: CrawlJob): Seq[(Int, Long, String)] =
    job.scheduleTable.select("wave", "rank", "url_canon")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def simTuples(sim: ColaSimulator): Seq[(Int, Long, String)] =
    sim.schedule.map(s => (s.wave, s.rank, s.canon)).toSeq

  // ---- shared runs ----
  private lazy val fullRun: (CrawlJob, CrawlSummary) = runEngine(base, tmpDir("full"))
  private lazy val fullSim: ColaSimulator = runSim(base)

  test("crawl ordering matches the reference simulator (priorities=1, the reference's own e2e config)") {
    assert(scheduleTuples(fullRun._1) == simTuples(fullSim), "schedule order diverged")
  }

  test("URL-seen set and dead letters match the simulator") {
    val engineSeen = fullRun._1.seenTable.select("url_canon").collect().map(_.getString(0)).toSet
    assert(engineSeen == fullSim.seen.toSet, "seen set diverged")
    val engineDead = fullRun._1.deadTable.select("url_canon").collect().map(_.getString(0)).toSet
    assert(engineDead == fullSim.dead.toSet, "dead letters diverged")
  }

  test("budget accounting (O4): applied/finished match; finished ≤ size") {
    val summary = fullRun._2
    assert(summary.finished == fullSim.finished)
    assert(summary.applied == fullSim.applied)
    assert(summary.finished <= base.size)
    assert(summary.applied == summary.finished, "error refunds must re-balance applied")
  }

  test("politeness: per (wave, host) scheduled count never exceeds hostBudget") {
    val maxPerHost = fullRun._1.scheduleTable.groupBy("wave", "host").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerHost <= base.hostBudget)
  }

  test("dedup: a url_canon is only re-scheduled for retries, never re-discovered") {
    val maxSched = fullRun._1.scheduleTable.groupBy("url_canon").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxSched <= base.retries + 1)
  }

  test("seq is monotone within (wave, priority) schedule order (O3 FIFO)") {
    val rows = fullRun._1.scheduleTable.select("wave", "priority", "rank", "seq")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
    rows.values.foreach { grp =>
      val byRank = grp.sortBy(_._3).map(_._4).toSeq
      assert(byRank == byRank.sorted, "seq not FIFO within priority")
    }
  }

  test("lineage partition counts sum to wave schedule totals") {
    val lineage = fullRun._1.lineageTable
    val byLineage = lineage.filter(col("stage") === "scheduled")
      .groupBy("wave").agg(sum("rows").as("rows"))
    val byTable = fullRun._1.scheduleTable.groupBy("wave").count()
    val mismatch = byLineage.join(byTable, Seq("wave"))
      .filter(col("rows") =!= col("count")).count()
    assert(mismatch == 0)
    assert(lineage.count() > 0)
  }

  test("adaptive skew politeness equals the plain per-host window (J5)") {
    import graft.operators.Politeness
    // skewed synthetic frontier: one mega-host + a long tail, multi-priority
    val cands = FrontierBenchLike.skewed(spark, 4000)
    val plain = Politeness.hostEligible(cands, 5)
      .select("host", "priority", "seq").collect().map(_.toSeq).toSet
    val adaptive = Politeness.hostEligibleAdaptive(cands, 5, 3)
      .select("host", "priority", "seq").collect().map(_.toSeq).toSet
    assert(adaptive == plain)
    // hot-host rows are clipped to the budget, cold hosts pass untouched
    val perHost = Politeness.hostEligibleAdaptive(cands, 5, 3)
      .groupBy("host").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost.values.forall(_ <= 5))
  }

  test("O7 adaptive throttling: budget decays to min fetched before banned waves") {
    import graft.operators.Politeness
    val sp = spark
    import sp.implicits._
    // host a: banned at waves 2 and 4 (prev fetched 7 and 4) -> budget 4
    // host b: banned at its first wave -> floor 1
    // host c: never banned -> default 10
    // host d: banned but prev fetched 15 > default -> CAPPED at default
    //         (the reference only ever lowers a rate, speed.py:226-227)
    val m = Seq(
      ("a", 1, 7L, 0L), ("a", 2, 5L, 2L), ("a", 3, 4L, 0L), ("a", 4, 6L, 1L),
      ("b", 1, 9L, 3L), ("b", 2, 8L, 0L),
      ("c", 1, 2L, 0L),
      ("d", 1, 15L, 0L), ("d", 2, 12L, 1L))
      .toDF("host", "wave", "fetched", "errors")
    val out = Politeness.adaptiveHostBudgets(m, defaultBudget = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 4, "b" -> 1, "c" -> 10, "d" -> 10))
  }

  test("O7 budget gate: decayed per-host budgets bound the next run's schedule") {
    import graft.operators.Politeness
    val sp = spark
    import sp.implicits._
    val cands = FrontierBenchLike.skewed(spark, 900)
    val mega = "http://mega.example.com"
    val budgets = Seq((mega, 2)).toDF("host", "host_budget")
    val out = Politeness.hostEligibleBudgets(cands, budgets, defaultBudget = 4)
      .groupBy("host").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out(mega) == 2)
    assert(out.filterNot(_._1 == mega).values.forall(_ <= 4))
    // matches the fixed-budget window when every budget equals the default
    val fixed = Politeness.hostEligible(cands, 4)
      .select("host", "seq").collect().map(_.toSeq).toSet
    val viaTable = Politeness.hostEligibleBudgets(cands, budgets.limit(0), 4)
      .select("host", "seq").collect().map(_.toSeq).toSet
    assert(fixed == viaTable)
  }

  test("bloom pre-filter + salted politeness change nothing (identical schedule)") {
    val (job, _) = runEngine(base.copy(useBloom = true, bloomCapacity = 4096, salts = 4),
      tmpDir("bloomsalt"))
    assert(scheduleTuples(job) == scheduleTuples(fullRun._1))
    assert(job.seenTable.count() == fullRun._1.seenTable.count())
  }

  test("multi-priority quotas ∝ 2^-i match the simulator (priorities=3)") {
    val settings = base.copy(nPriorities = 3, waveCap = 30, size = 90)
    val pExprEngine = (c: Column) =>
      coalesce(pmod(regexp_extract(c, "/p/([0-9]+)", 1).cast("long"), lit(3)), lit(0)).cast("int")
    val pOfSim = (canon: String) =>
      "/p/([0-9]+)".r.findFirstMatchIn(canon).map(_.group(1).toLong % 3).getOrElse(0L).toInt
    val (job, _) = runEngine(settings, tmpDir("p3"), pExprEngine)
    val sim = runSim(settings, pOfSim)
    assert(scheduleTuples(job) == simTuples(sim), "multi-priority schedule diverged")
    // all three priorities actually exercised
    val ps = job.scheduleTable.select("priority").distinct().collect().map(_.getInt(0)).toSet
    assert(ps == Set(0, 1, 2))
  }

  test("resume from checkpoint: killed run continues without re-fetch or reorder") {
    val partial = tmpDir("partial")
    runEngine(base.copy(maxWaves = 2), partial)
    // simulate a crash mid-wave-3: an uncommitted wave dir must be ignored
    Files.createDirectories(Paths.get(partial, "wave=3", "schedule"))
    val (resumed, _) = runEngine(base, partial)
    assert(scheduleTuples(resumed) == scheduleTuples(fullRun._1), "resume reordered the crawl")
    assert(resumed.seenTable.count() == fullRun._1.seenTable.count())
  }

  test("pipeline extraction matches the pages golden text (input_hint invariant)") {
    val settings = base.copy(extract = true, size = 20, waveCap = 20)
    val (job, _) = runEngine(settings, tmpDir("ex"))
    val joined = job.resultsTable.alias("r")
      .join(pagesDF.alias("p"), col("r.url_canon") === col("p.url"))
      .select((col("r.text") === col("p.text")).as("ok"))
    val rows = joined.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(0)), "pipeline extraction diverged from golden text")
  }
}

/** Deterministic skewed frontier for politeness unit checks. */
private[plans] object FrontierBenchLike {
  def skewed(spark: SparkSession, n: Long): DataFrame = {
    spark.range(0L, n).selectExpr(
      """concat('http://', case when id % 3 = 0 then 'mega'
           else concat('tail', cast(id % 97 as string)) end, '.example.com') as host""",
      "concat('http://x/', cast(id as string)) as url_canon",
      "cast(id % 4 as int) as priority",
      "id as seq")
  }
}
