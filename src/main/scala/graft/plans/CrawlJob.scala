package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel
import graft.functions.{Extract, UrlCanon}
import graft.operators.{Dedup, Politeness}

/**
 * Job configuration ≙ the reference's YAML settings tree
 * (cola/conf/main.yaml:11-40 + JobDescription):
 *
 * @param size        global fetch budget, -1 = unlimited (job.size, main.yaml:14)
 * @param nPriorities priority queue count (job.priorities, main.yaml:20)
 * @param hostBudget  per-host fetches per wave — the deterministic
 *                    politeness knob replacing wall-clock speed control (O6)
 * @param waveCap     max fetches per wave (≙ cluster-wide speed max)
 * @param retries     error retries before dead-letter (server policy,
 *                    main.yaml:29-33)
 * @param urlPattern  accept regex (P1, cola/core/urls.py:48-60) —
 *                    case-insensitive like re.IGNORECASE (urls.py:27)
 * @param salts       politeness salting shards for mega-hosts (J5)
 * @param useBloom    per-bucket Bloom pre-filter in front of the exact
 *                    anti-join (D2) — output provably identical either way
 * @param extract     run text extraction on fetched pages (the X1/X2 work);
 *                    off for pure frontier-throughput benchmarks
 */
case class CrawlSettings(
    size: Long = -1L,
    nPriorities: Int = 1,
    hostBudget: Int = 2,
    waveCap: Long = 1000000L,
    retries: Int = 1,
    maxWaves: Int = 1000,
    urlPattern: String = ".*",
    salts: Int = 1,
    numBuckets: Int = 32,
    useBloom: Boolean = true,
    bloomCapacity: Long = 1000000L, // D3 floor (cola/job/__init__.py:48)
    extract: Boolean = true,
    inc: Boolean = true) // O9 incremental queue (job.inc, main.yaml:22)

case class CrawlSummary(wavesRun: Int, applied: Long, finished: Long,
    scheduledTotal: Long, seenTotal: Long, deadTotal: Long)

/**
 * The wave-loop crawl driver (SURVEY §3.1 →Spark mapping): each wave is one
 * declarative DAG — candidates → dedup gate → politeness/priority/budget
 * schedule → "fetch" join against the pages table → extract → outlinks →
 * union-next-frontier — committed atomically per wave via [[Checkpoint]].
 * All coordination (budget arithmetic O4, termination O12) is O(1)
 * driver-side between waves: zero per-row coordination, which is the
 * structural reason the design scales N→4N (vs the reference's per-fetch
 * XML-RPC budget/speed round trips, cola/functions/budget.py:137-146).
 */
class CrawlJob(
    spark: SparkSession,
    pages: DataFrame,
    settings: CrawlSettings,
    workDir: String,
    priorityExpr: Column => Column = _ => lit(0),
    robotsRules: Option[DataFrame] = None) {

  import spark.implicits._

  private val ckpt = new Checkpoint(spark, workDir)

  /** Engine counters (A1/A6/A7): executor-side partials merged at the
   *  driver by Spark's accumulator machinery — the counter-server model. */
  val counters = new graft.operators.CounterAccumulator()
  spark.sparkContext.register(counters, "graft_counters")

  // native Catalyst expressions (UrlExprs): same semantics as the
  // UrlCanon functions, zero-copy fast path, no Scala-UDF bridge
  private def canonCol(c: Column): Column = graft.functions.UrlExprs.canonicalizeUrl(c)
  private def hostCol(c: Column): Column = graft.functions.UrlExprs.urlHost(c)
  private val extractTextUdf = {
    val ctr = counters // local capture: the closure must not drag `this` in
    udf((html: Array[Byte], u: String) => {
      ctr.add("extract", "pages")
      Extract.extractText(html, u)
    })
  }
  private val outlinksUdf = udf((html: Array[Byte], u: String) => Extract.extractOutlinks(html, u))

  /** seq base for wave w: keeps discovery FIFO monotone across waves while
   *  staying a pure function of (wave, within-wave rank) — deterministic
   *  across parallelism levels (O3). */
  private def waveBase(w: Int): Long = w.toLong << 40

  /** Dense deterministic sequence: total-order sort + zipWithIndex. The
   *  one justified RDD drop (SURVEY §2.10): a dense global rank must not
   *  depend on partition boundaries, and zipWithIndex is the distributed
   *  way to get one (row_number over an empty window would single-task). */
  private def withDenseSeq(df: DataFrame, ord: Seq[Column], start: Long, outCol: String): DataFrame = {
    val sorted = df.orderBy(ord: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (start + i)) }
    spark.createDataFrame(rdd, schema)
  }

  private def emptyFrontier: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.frontier)

  /** Candidate enrichment: url → (canon, hash, host); robots gate applied
   *  at discovery (disallowed urls never enter frontier or seen set). */
  private def enrich(df: DataFrame): DataFrame = {
    val e = df.withColumn("url_canon", canonCol(col("url")))
      .withColumn("url_hash", Dedup.urlHash(col("url_canon")))
      .withColumn("host", hostCol(col("url_canon")))
    robotsRules.fold(e)(rules => graft.operators.Robots.filterAllowed(e, rules))
  }

  private def perPartitionLineage(df: DataFrame, wave: Int, stage: String): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .select(lit(wave).as("wave"), lit(stage).as("stage"), col("partition_id"), col("rows"))

  /** Wave 0: admit the seed list (S1; dedup-at-discovery D1/D6 — seeds are
   *  anti-joined like any wave, mq.exist at cola/job/task.py:114-118). */
  private def admitSeeds(seeds: Seq[String]): Unit = {
    val raw = seeds.zipWithIndex.toDF("url", "__idx")
      .filter(length(trim(col("url"))) > 0) // P4 blank drop (store.py:249-250)
      .filter(col("url").rlike("(?i)" + settings.urlPattern))
    val entries = enrich(raw)
      .withColumn("priority", Politeness.clampPriority(priorityExpr(col("url_canon")), settings.nPriorities))
      .withColumn("depth", lit(0))
      .withColumn("force", lit(false))
      .withColumn("error_times", lit(0))
      .withColumn("discovered_wave", lit(0))
    val deduped = Dedup.firstSeenInBatch(entries, Seq(col("__idx")))
    val withSeq = withDenseSeq(deduped, Seq(col("__idx")), waveBase(0), "seq")
      .drop("__idx")
      .select(Schemas.frontier.fieldNames.map(col).toSeq: _*)
    ckpt.write(withSeq, 0, "frontier")
    ckpt.write(withSeq.select(col("url_hash"), col("url_canon"), lit(0).as("wave")), 0, "seen_delta")
    ckpt.commit(0, Map("applied" -> "0", "finished" -> "0", "scheduledTotal" -> "0", "deadTotal" -> "0"))
  }

  /** Run (or resume) the crawl to completion. */
  def run(seeds: Seq[String]): CrawlSummary = {
    ckpt.cleanUncommitted()
    val resumedWave = ckpt.latestWave
    if (resumedWave.isEmpty) admitSeeds(seeds)
    var wave = ckpt.latestWave.get
    var state = ckpt.manifest(wave)
    var applied = state("applied").toLong
    var finished = state("finished").toLong
    var scheduledTotal = state("scheduledTotal").toLong
    var deadTotal = state("deadTotal").toLong

    var frontier = ckpt.read(wave, "frontier", Schemas.frontier)
    def seenUpTo(w: Int): DataFrame = ckpt.readAll(w, "seen_delta", Schemas.seen)
    var blooms: Map[Int, Array[Byte]] =
      if (settings.useBloom)
        Dedup.seenBlooms(seenUpTo(wave), settings.numBuckets,
          math.max(settings.bloomCapacity / settings.numBuckets, 1024))
      else Map.empty

    var frontierSize = frontier.count()

    while (frontierSize > 0 && wave < settings.maxWaves &&
           (settings.size < 0 || finished < settings.size)) {
      val w = wave + 1
      val t0 = System.nanoTime()
      val grant =
        if (settings.size < 0) settings.waveCap
        else math.min(settings.waveCap, settings.size - applied)
      if (grant <= 0) return summary(wave, applied, finished, scheduledTotal, deadTotal)

      val seen = seenUpTo(wave)

      // ---- schedule (O1/O3/O4/O6) ----
      val scheduled = Politeness.schedule(frontier, settings.hostBudget, grant,
        settings.nPriorities, settings.salts)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nScheduled = scheduled.count()
      if (nScheduled == 0) { // frontier non-empty but nothing eligible: done
        scheduled.unpersist()
        return summary(wave, applied, finished, scheduledTotal, deadTotal)
      }
      applied += nScheduled
      scheduledTotal += nScheduled

      val scheduleTable = withDenseSeq(
        scheduled.select(col("priority"), col("seq"), col("host"), col("url_canon"), col("depth")),
        Seq(col("priority").asc, col("seq").asc), 0L, "rank")
        .select(lit(w).as("wave"), col("rank"), col("priority"), col("seq"),
          col("host"), col("url_canon"), col("depth"))

      // ---- "fetch" = join pages (J6/S2: html column IS the fetch result),
      //      then ONE pass over html computes extraction + outlinks + the
      //      fetch status together. Only that slim projection is persisted
      //      — raw html must never be cached or traversed twice (at crawl
      //      scale html dominates every other column by orders of
      //      magnitude). nErrors rides along via Observation (no extra job).
      val fetchedRaw = scheduled.join(
          pages.select(col("url").as("url_canon"), col("html"), col("lang")),
          Seq("url_canon"), "left")
      val frontierCols = Schemas.frontier.fieldNames.map(col).toSeq
      val obs = new org.apache.spark.sql.Observation(s"wave_$w")
      val processed = fetchedRaw.select(
          (frontierCols :+ col("lang") :+
            col("html").isNotNull.as("ok") :+
            (if (settings.extract)
               when(col("html").isNotNull, extractTextUdf(col("html"), col("url_canon")))
                 .otherwise(lit(null)).as("text")
             else lit(null).cast("string").as("text")) :+
            when(col("html").isNotNull, outlinksUdf(col("html"), col("url_canon")))
              .otherwise(array().cast("array<string>")).as("outs")): _*)
        .observe(obs, count(lit(1)).as("n"),
          sum(when(col("ok"), 0L).otherwise(1L)).as("errors"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      processed.count() // materialize: html traversed exactly once
      val nErrors = obs.get("errors").asInstanceOf[Long]
      val nSuccess = nScheduled - nErrors
      finished += nSuccess
      applied -= nErrors // O4 error refund (budget.py:154-158)

      // ---- retry / dead-letter (O8) ----
      val errors = processed.filter(!col("ok"))
      val bumped = errors.withColumn("error_times", col("error_times") + 1)
      val retry = bumped.filter(col("error_times") <= settings.retries).select(frontierCols: _*)
      val dead = bumped.filter(col("error_times") > settings.retries)
        .select(lit(w).as("wave"), col("url_canon"), col("host"),
          col("error_times"), lit("fetch_miss").as("reason"))
      // nDead rides the dead-letter write via Observation (one job, not two)
      val deadObs = new org.apache.spark.sql.Observation(s"dead_$w")
      ckpt.write(dead.observe(deadObs, count(lit(1)).as("n")), w, "dead")
      val nDead = deadObs.get("n").asInstanceOf[Long]
      deadTotal += nDead

      val success = processed.filter(col("ok"))
      if (settings.inc) // O9: finished units feed the incremental queue
        ckpt.write(success.select(col("url_canon"), lit(w).as("wave")), w, "inc")
      counters.add("budget", "applied", nScheduled)
      counters.add("budget", "finishes", nSuccess)
      counters.add("budget", "errors", nErrors)

      if (settings.extract) {
        val results = success.select(lit(w).as("wave"), col("url_canon"), col("lang"),
          col("text"), size(col("outs")).as("n_outlinks"))
        ckpt.write(results, w, "results")
      }

      // ---- outlinks (F1) → new candidates: P1 pattern filter, P6 resolve
      //      (inside extractOutlinks), P7 self-drop, P8 canonicalize ----
      val outlinks = success.select(
        col("url_canon").as("parent_canon"), col("seq").as("parent_seq"),
        col("depth").as("parent_depth"),
        posexplode(col("outs")).as(Seq("link_idx", "out_url")))
      val candidates = enrich(
          outlinks
            .filter(col("out_url").rlike("(?i)" + settings.urlPattern))
            .withColumnRenamed("out_url", "url"))
        .filter(col("url_canon") =!= col("parent_canon"))
        .withColumn("priority", Politeness.clampPriority(priorityExpr(col("url_canon")), settings.nPriorities))
        .withColumn("depth", col("parent_depth") + 1)
        .withColumn("force", lit(false))
        .withColumn("error_times", lit(0))
        .withColumn("discovered_wave", lit(w))
        .persist(StorageLevel.MEMORY_AND_DISK)

      val nCandidates = candidates.count()

      // ---- D1 dedup gate ----
      val fresh = Dedup.dedupWave(spark, candidates, seen,
          Seq(col("parent_seq"), col("link_idx")),
          if (settings.useBloom) Some(blooms) else None, settings.numBuckets)
      val newEntries = withDenseSeq(fresh, Seq(col("parent_seq").asc, col("link_idx").asc),
          waveBase(w), "seq")
        .select(Schemas.frontier.fieldNames.map(col).toSeq: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nNew = newEntries.count()

      // ---- next frontier ----
      val leftover = frontier.join(scheduled.select("url_canon"), Seq("url_canon"), "left_anti")
        .select(frontierCols: _*)
      val frontierNext = leftover.unionByName(retry).unionByName(newEntries)

      // ---- per-wave outputs + atomic commit (S6) ----
      val lineage = perPartitionLineage(candidates, w, "candidates")
        .unionByName(perPartitionLineage(newEntries, w, "admitted"))
        .unionByName(perPartitionLineage(scheduled, w, "scheduled"))
      ckpt.write(scheduleTable, w, "schedule")
      ckpt.write(newEntries.select(col("url_hash"), col("url_canon"), lit(w).as("wave")), w, "seen_delta")
      // frontierSize rides the frontier write (no separate count job)
      val frontierObs = new org.apache.spark.sql.Observation(s"frontier_$w")
      ckpt.write(frontierNext.observe(frontierObs, count(lit(1)).as("n")), w, "frontier")
      ckpt.write(lineage, w, "lineage")

      frontier = ckpt.read(w, "frontier", Schemas.frontier)
      frontierSize = frontierObs.get("n").asInstanceOf[Long]
      val secs = (System.nanoTime() - t0) / 1e9
      val metrics = Seq(WaveMetrics(w, nScheduled, nSuccess, nErrors, nNew,
        nCandidates - nNew, frontierSize, applied, finished, secs)).toDF()
      ckpt.write(metrics, w, "metrics")
      ckpt.commit(w, Map(
        "applied" -> applied.toString, "finished" -> finished.toString,
        "scheduledTotal" -> scheduledTotal.toString, "deadTotal" -> deadTotal.toString))

      if (settings.useBloom && nNew > 0)
        blooms = Dedup.updateBlooms(blooms, newEntries, settings.numBuckets,
          math.max(settings.bloomCapacity / settings.numBuckets, 1024))

      scheduled.unpersist(); processed.unpersist()
      candidates.unpersist(); newEntries.unpersist()
      wave = w
    }
    summary(wave, applied, finished, scheduledTotal, deadTotal)
  }

  private def summary(wave: Int, applied: Long, finished: Long,
      scheduledTotal: Long, deadTotal: Long): CrawlSummary = {
    val seenTotal = ckpt.readAll(wave, "seen_delta", Schemas.seen).count()
    CrawlSummary(wave, applied, finished, scheduledTotal, seenTotal, deadTotal)
  }

  /** Full schedule across committed waves, ordered (wave, rank). */
  def scheduleTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "schedule", Schemas.schedule)

  def seenTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "seen_delta", Schemas.seen)

  def deadTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "dead", Schemas.dead)

  def lineageTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "lineage", Schemas.lineage)

  def metricsTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "metrics", Schemas.metrics)

  def resultsTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "results", Schemas.results)

  /** O9 incremental re-crawl queue: re-enqueue as the lowest priority
   *  (task.py:135-139) — v1 ships the table; continuous re-crawl is a
   *  rerun seeded from it. */
  def incTable: DataFrame =
    ckpt.readAll(ckpt.latestWave.getOrElse(0), "inc", Schemas.inc)
}
