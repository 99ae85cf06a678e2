package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Gap-based event sessionization over the events stream — the classic
 * crawl/clickstream analytics step (visit reconstruction: consecutive
 * events of one user belong to one session while the inter-event gap
 * stays under the threshold).
 *
 * Spark-first: this is exactly what the built-in `session_window`
 * grouping expression computes (SPARK-10816's dynamic-gap session
 * windows) — a hash aggregate keyed on (user, merged-window), codegen'd,
 * and the SAME expression works under Structured Streaming with a
 * watermark (`withWatermark(ts, ...)` + append mode), so the batch and
 * streaming paths share one definition. No hand-rolled lag/cumsum
 * double-window pass (two sorts) — the merge happens inside the
 * aggregate.
 *
 * Scale: the aggregate shuffles once on the user key; a hyperactive user
 * is one hot key whose events still merge map-side per partial window.
 * Session identity is exposed as the session START (min event time) —
 * stable across parallelism, and integer micros so any engine replays it
 * exactly (no IEEE, no timestamp-format drift).
 */
object Sessions {

  /** One row per (user, session): session_start_us (micros since epoch of
   *  the first event), n_events, min/max event id, span_us. Two
   *  consecutive events share a session iff their gap ≤ `gap`
   *  (session_window extends a window `gap` past each event and merges
   *  touching windows — the inclusive-boundary behavior is pinned by
   *  SessionsSpec's exact-gap test). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gap: String = "30 minutes"): DataFrame =
    aggSessions(prepare(events, userCol, tsCol), userCol, idCol, gap)

  /** Streaming sessionize: the SAME aggregate over a streaming frame with
   *  an event-time watermark on the (cast) time column — sessions emit in
   *  Append mode once the watermark passes their close (start of a new
   *  gap). `delay` is the out-of-order tolerance. Batch/stream parity is
   *  pinned by StreamingSessionsSpec. */
  def sessionizeStream(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    aggSessions(prepare(events, userCol, tsCol).withWatermark("__ts", delay),
      userCol, idCol, gap)

  /** parquet event times are TIMESTAMP_NTZ; unix_micros/session_window
   *  want TIMESTAMP. The cast reads the naive value in the session zone
   *  — the engine pins spark.sql.session.timeZone=UTC (Verify/Bench/
   *  specs), so micros are epoch-exact and engine-portable. */
  private def prepare(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      // filter AFTER the cast: a value that casts to null (non-ANSI
      // sessions) must not open a session window no watermark can close
      .filter(col(userCol).isNotNull && col("__ts").isNotNull)

  private def aggSessions(prepared: DataFrame, userCol: String,
      idCol: String, gap: String): DataFrame =
    prepared
      .groupBy(col(userCol).cast(LongType).as("user_id"),
        session_window(col("__ts"), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(idCol)).cast(LongType).as("first_event_id"),
        max(col(idCol)).cast(LongType).as("last_event_id"),
        (unix_micros(max(col("__ts"))) - unix_micros(min(col("__ts"))))
          .as("span_us"),
        unix_micros(min(col("__ts"))).as("session_start_us"))
      .select(col("user_id"), col("session_start_us"), col("n_events"),
        col("first_event_id"), col("last_event_id"), col("span_us"))
}
