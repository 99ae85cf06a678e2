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
}
