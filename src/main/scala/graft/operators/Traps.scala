package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Crawler-trap (spider-trap) detection over a URL stream.
 *
 * A production frontier must drop URLs from infinite URL spaces before
 * they enter the politeness queues — calendar pages, session-id loops,
 * faceted-search parameter explosions, and self-referencing path cycles
 * otherwise eat the per-host budget of a mega-domain. The reference
 * engine gates admission by regex only (`url_patterns`,
 * cola/core/urls.py + job config); these structural rules are the
 * industry-standard complement (public precedent: Heritrix's
 * `TooManyPathSegmentsDecideRule` and `PathologicalPathDecideRule`,
 * which rejects `/a/a/a/` — a segment repeating ≥3× — and paths deeper
 * than a bound).
 *
 * Three integer rules, all evaluated per-row with codegen-friendly
 * string/array expressions (a pure projection — no shuffle, no UDF, so
 * the gate composes with the admission filter at any scale; at 10^10
 * URLs this runs map-side inside the same stage as canonicalization):
 *
 *  1. depth: number of non-empty `/`-separated path segments
 *     > `maxDepth`;
 *  2. repetition: some path segment occurs > `maxRepeat` times in the
 *     path (the `/a/b/a/b/a/` cycle — counted exactly, not just
 *     adjacent, matching Heritrix's semantics for k=3);
 *  3. parameter explosion: number of `&`-separated query parameters
 *     > `maxParams`.
 *
 * The repetition count is `array_max(transform(segs, x ->
 * size(filter(segs, y -> y = x))))` — O(d²) per row on d ≤ a few dozen
 * segments, still cheaper than a regex backreference scan and (unlike
 * Java-regex backreferences) replayable on RE2-family engines, which is
 * what keeps the rule DuckDB-oracle-able.
 */
/** Trap-rule thresholds, bundled so the gate can ride in job settings
  * ([[graft.plans.CrawlSettings.trapGuard]]). Defaults mirror
  * [[Traps.detect]]. */
case class TrapRules(maxDepth: Int = 5, maxRepeat: Int = 2, maxParams: Int = 6)

object Traps {

  /** Path component of `url` ('' when the URL has no path). */
  private def pathOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)

  /** Query component of `url` ('' when absent). */
  private def queryOf(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Non-empty path segments. */
  private def segsOf(url: Column): Column =
    filter(split(pathOf(url), "/"), s => s =!= "")

  /** Single boolean predicate form of the three rules — lets the gate
    * compose into an existing admission filter as one codegen'd
    * expression (no withColumn round trip). Canonicalization preserves
    * path segments and parameter count, so gating the RAW discovered URL
    * (Heritrix's candidate-URI stage) is equivalent to gating the
    * canonical form. */
  def isTrap(u: Column, rules: TrapRules): Column = {
    val segs = segsOf(u)
    val q = queryOf(u)
    val segRepeat = coalesce(
      array_max(transform(segs, x => size(filter(segs, y => y === x)))),
      lit(0))
    val nParams = when(q === "", lit(0)).otherwise(size(split(q, "&")))
    size(segs) > rules.maxDepth || segRepeat > rules.maxRepeat ||
      nParams > rules.maxParams
  }

  /**
   * Annotate `df` with the trap metrics and verdict:
   * `depth` (int), `seg_repeat` (int, max multiplicity of any one path
   * segment; 0 for an empty path), `n_params` (int), `is_trap` (int
   * 0/1 — int rather than boolean so the column hashes identically
   * across engines in the verify pipeline).
   */
  def detect(
      df: DataFrame,
      urlCol: String = "url",
      maxDepth: Int = 5,
      maxRepeat: Int = 2,
      maxParams: Int = 6): DataFrame = {
    val u = col(urlCol)
    val segs = segsOf(u)
    val q = queryOf(u)
    val depth = size(segs)
    val segRepeat = coalesce(
      array_max(transform(segs, x => size(filter(segs, y => y === x)))),
      lit(0))
    val nParams = when(q === "", lit(0)).otherwise(size(split(q, "&")))
    df.withColumn("depth", depth.cast("int"))
      .withColumn("seg_repeat", segRepeat.cast("int"))
      .withColumn("n_params", nParams.cast("int"))
      .withColumn("is_trap",
        (col("depth") > maxDepth || col("seg_repeat") > maxRepeat ||
          col("n_params") > maxParams).cast("int"))
  }

  /** Admission gate: rows of `df` that trip none of the trap rules
    * (metric columns dropped — same schema in, same schema out). */
  def filterTraps(
      df: DataFrame,
      urlCol: String = "url",
      maxDepth: Int = 5,
      maxRepeat: Int = 2,
      maxParams: Int = 6): DataFrame =
    detect(df, urlCol, maxDepth, maxRepeat, maxParams)
      .filter(col("is_trap") === 0)
      .drop("depth", "seg_repeat", "n_params", "is_trap")
}
