package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Windowed event analytics over the events stream — the aggregation side
 * of the crawl/clickstream surface ([[Sessions]] is the visit side).
 * Both operators are single hash aggregates with map-side partials and
 * emit only engine-portable integers (micros, cents, counts): a DOUBLE
 * sum is IEEE-order-dependent across engines/parallelism, so money-like
 * values are fixed-pointed to cents BEFORE the aggregate.
 */
object Events {

  /** Tumbling-window rollup via Spark's native `window()` grouping
   *  (streaming-compatible): one row per (window, event_type) with event
   *  count, distinct users, and exact cent-sum of `value`. Rounding
   *  contract: `round()` is HALF_UP — an exact half-cent rounds AWAY
   *  FROM ZERO on both signs (−0.125 → −13 cents), which DuckDB's
   *  round() matches; engines with banker's rounding (IEEE rint) differ
   *  on exact half-cents. The oracled query exercises non-negative
   *  values; the negative-sign behavior is pinned by EventsSpec's
   *  ±0.125 vector. Window identity = start micros. */
  def windowAgg(events: DataFrame, tsCol: String, typeCol: String,
      userCol: String, valueCol: String, every: String = "1 hour"): DataFrame =
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      // filter AFTER the cast: a value that casts to null (non-ANSI
      // sessions) must not enter the aggregate under a null window —
      // in streaming such a row's state could never be closed
      .filter(col("__ts").isNotNull && col(typeCol).isNotNull)
      .groupBy(window(col("__ts"), every).as("w"), col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_users"),
        sum(round(col(valueCol) * 100).cast(LongType)).as("value_cents"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("n_users"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"))

  /** Streaming tumbling-window rollup: the same window() aggregate under
   *  an event-time watermark — rows emit exactly once in Append mode when
   *  the watermark passes the window end. Distinct-user counting is
   *  batch-only (Structured Streaming rejects exact `countDistinct` in
   *  an aggregate; a streaming pipeline that needs it reaches for
   *  approx_count_distinct or a mapGroupsWithState set), so this variant
   *  carries the streaming-expressible subset: event count + exact
   *  cent-sum. Batch/stream parity is pinned by StreamingEventsSpec. */
  def windowAggStream(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, every: String = "1 hour",
      delay: String = "10 minutes"): DataFrame =
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .filter(col("__ts").isNotNull && col(typeCol).isNotNull)
      .withWatermark("__ts", delay)
      .groupBy(window(col("__ts"), every).as("w"), col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 100).cast(LongType)).as("value_cents"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"))

  /** Semi-structured metadata extraction: pull an integer field out of
   *  the JSON `props` column (codegen `get_json_object`, no UDF) and
   *  roll it up per event type — the metadata-column pattern of a
   *  webtext pipeline (page meta, fetch headers, source tags ride along
   *  as JSON and get promoted to columns on demand). Missing/malformed
   *  values count separately instead of silently nulling the sum. */
  def propsAgg(events: DataFrame, typeCol: String, propsCol: String,
      jsonPath: String): DataFrame = {
    val v = get_json_object(col(propsCol), jsonPath).cast(LongType)
    events
      .filter(col(typeCol).isNotNull)
      .withColumn("__v", v)
      .groupBy(col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__v")).as("n_with_field"),
        coalesce(sum(col("__v")), lit(0L)).as("field_sum"),
        coalesce(max(col("__v")), lit(0L)).as("field_max"))
  }

  /**
   * Cohort retention: users are cohorted by the period (default week =
   * `periodDays` days from the epoch) of their FIRST activity; for
   * every later period the rollup counts how many of the cohort came
   * back. Output: `(cohort_period, k, n_users)` — users of cohort
   * `cohort_period` active `k` periods later (k = 0 row is the cohort
   * size). Period index is exact integer `div` on epoch micros (no
   * double rounding at boundary microseconds); epoch-relative, so the
   * same integers fall out of any engine.
   *
   * Scale: (user, period) pairs are distinct-ed FIRST (the per-user
   * fan-in bound — a user's million events collapse to their active
   * periods before anything joins), then one user-keyed min aggregate
   * for cohorts, a user-keyed join back, and a partial-combining count
   * per (cohort, k). No windows, no per-user event lists.
   */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, s"period must be positive: $periodDays")
    val periodUs = 86400000000L * periodDays
    val per = events
      .withColumn("__ts", unix_micros(col(tsCol).cast("timestamp")))
      .filter(col(userCol).isNotNull && col("__ts").isNotNull)
      .select(col(userCol).as("__u"), expr(s"__ts div $periodUs").as("__p"))
      .distinct()
    val cohort = per.groupBy(col("__u")).agg(min(col("__p")).as("__c"))
    per.join(cohort, Seq("__u"))
      .groupBy(col("__c").as("cohort_period"), (col("__p") - col("__c")).as("k"))
      .agg(count(lit(1)).as("n_users")) // (user, period) pairs are distinct
  }

  /**
   * Strict-order funnel analysis: for each user who performed
   * `steps.head`, the FIRST time of each subsequent step occurring
   * STRICTLY after the previous step's time — the classic conversion
   * funnel (view → click → purchase). Output: one row per step-1 user
   * with `t1..tk` (epoch micros, null from the first unreached step
   * on) and `depth` (steps reached, ≥ 1). Ties at the exact same
   * microsecond do NOT advance the funnel (strict `>`); users who
   * never performed step 1 are absent.
   *
   * Scale: one pass per step — the events table is pre-filtered to
   * that step's type, then a user-keyed shuffle join against the
   * (one-row-per-user) funnel state and a partial-combining min
   * aggregate; k−1 joins total, never a per-user sorted event list or
   * a window over the raw stream. Times flow as epoch micros under the
   * engine's pinned UTC session (the [[Sessions]] convention), so the
   * SQL oracle compares exactly.
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"repeated step types: $steps")
    val e = events
      .withColumn("__ts", unix_micros(col(tsCol).cast("timestamp")))
      .filter(col(userCol).isNotNull && col("__ts").isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col("__ts"), col(typeCol).as("__ty"))
    var cur = e.filter(col("__ty") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val cand = e.filter(col("__ty") === st)
        .select(col("__u").as("__cu"), col("__ts").as("__cts"))
      val carried = col("__u") +: (1 to i).map(j => col(s"t$j"))
      cur = cur.join(cand,
          col("__u") === col("__cu") && col("__cts") > col(s"t$i"), "left")
        .groupBy(carried: _*)
        .agg(min(col("__cts")).as(s"t${i + 1}"))
    }
    val depth = steps.indices
      .map(j => when(col(s"t${j + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    cur.select((col("__u").as(userCol) +:
      steps.indices.map(j => col(s"t${j + 1}"))) :+
      depth.cast(LongType).as("depth"): _*)
  }
}
