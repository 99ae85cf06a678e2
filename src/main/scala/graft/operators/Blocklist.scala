package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Domain-blocklist admission (UT1/adult-hosts style): a blocklist entry
 * blocks the host itself AND every subdomain of it — `example.com`
 * blocks `example.com`, `www.example.com`, `a.b.example.com`, and
 * nothing else. The reference gates URLs by regex pattern only
 * (cola/core/urls.py url_patterns); a production webtext crawl also
 * carries a curated hostname blocklist, and at list sizes of 10^6+
 * entries the per-URL regex alternation is not a plan — this operator is
 * the join-shaped form.
 *
 * Matching is LABEL-BOUNDED by construction: the host is split on dots
 * and every dot-suffix is emitted as a candidate key (`a.b.example.com`
 * → 4 suffixes), then equi-joined against the blocklist. A blocklist
 * entry `ample.com` therefore does NOT match `example.com` — the classic
 * endsWith-matching bug — because `ample.com` is never one of its
 * label suffixes. Hosts and entries are lowercased and trimmed; a
 * trailing dot (DNS-absolute form) is dropped on both sides.
 *
 * Scale (10^10 URLs, 10^8 distinct hosts, 10^6 blocklist entries): the
 * suffix explosion runs on the HOST dimension, never the URL table —
 * ~4-5 suffix rows per distinct host — and the equi-join against the
 * blocklist is AQE-sized (a 10^6-entry list broadcasts; an adversarial
 * one degrades to a shuffle join instead of an executor OOM — no
 * unbounded hint, the r3 O7 lesson). The URL-sized table only ever sees
 * a semi/anti join on the plain host column against the matched-host
 * set, which is bounded by min(distinct hosts, blocklist coverage).
 */
object Blocklist {

  /** All dot-suffixes of a hostname, normalized (lower, trim, drop one
   *  trailing dot): `A.b.Example.com.` → [a.b.example.com,
   *  b.example.com, example.com, com]. Null or effectively-empty hosts
   *  yield an empty array (no suffix can match — unknown hosts are
   *  never blocked; gate them upstream if unknown means reject). */
  def hostSuffixes(host: Column): Column = {
    val norm = regexp_replace(lower(trim(host)), "\\.$", "")
    val labels = filter(split(norm, "\\."), l => l =!= "")
    // sequence(1, 0) would DESCEND to [1, 0] and slice(start=0) errors,
    // so the zero-label case (empty/null host) short-circuits to []
    when(size(labels) > 0,
      transform(sequence(lit(1), size(labels)),
        i => array_join(slice(labels, i, size(labels)), ".")))
      .otherwise(array().cast("array<string>"))
  }

  private def normEntries(blocklist: DataFrame, entryCol: String): DataFrame =
    blocklist.select(
      regexp_replace(lower(trim(col(entryCol))), "\\.$", "").as("__sfx"))
      .filter(col("__sfx") =!= "")

  /** The distinct hosts of `hosts(hostCol)` that a blocklist entry
   *  blocks (exact host or any dot-suffix). Output: one `hostCol` row
   *  per blocked host — the small side for the URL-table semi/anti
   *  join. */
  def blockedHosts(hosts: DataFrame, hostCol: String,
      blocklist: DataFrame, entryCol: String): DataFrame =
    hosts.select(col(hostCol)).distinct()
      .select(col(hostCol), explode(hostSuffixes(col(hostCol))).as("__sfx"))
      .join(normEntries(blocklist, entryCol), Seq("__sfx"), "left_semi")
      .select(col(hostCol)).distinct()

  /** Per-host verdict: the input host rows with an `is_blocked` flag
   *  appended. Meant for host-dimension tables (one row per host);
   *  URL-sized callers use [[admit]] instead. */
  def verdict(hosts: DataFrame, hostCol: String,
      blocklist: DataFrame, entryCol: String): DataFrame = {
    val blocked = blockedHosts(hosts, hostCol, blocklist, entryCol)
      .withColumn("__b", lit(true))
    hosts.join(blocked, Seq(hostCol), "left")
      .withColumn("is_blocked", coalesce(col("__b"), lit(false)))
      .drop("__b")
  }

  /** Admission filter for a URL-sized frame: drops every row whose
   *  `hostCol` is blocked. Two joins, both on the cheap side: suffix
   *  explosion over DISTINCT hosts, then a host-keyed anti join whose
   *  build side is the (bounded) blocked-host set. */
  def admit(df: DataFrame, hostCol: String,
      blocklist: DataFrame, entryCol: String): DataFrame =
    df.join(blockedHosts(df, hostCol, blocklist, entryCol),
      Seq(hostCol), "left_anti")

  /** Literal-list verdict for a DRIVER-HELD blocklist (the engine
   *  admission form, CrawlSettings.hostBlocklist): same label-bounded
   *  suffix semantics, evaluated as a pure map-side `arrays_overlap`
   *  between the host's suffixes and the normalized entry set — no
   *  join, no shuffle, same plan stage as the trap/pattern gates. The
   *  entry list lives in the plan as a literal, so this form is for
   *  curated lists (up to ~10^4 entries); table-sized lists use
   *  [[admit]]. Null/empty hosts are never blocked (same contract). */
  def isBlockedIn(host: Column, entries: Seq[String]): Column = {
    val norm = entries.iterator
      .filter(_ != null)
      .map(_.trim.toLowerCase.replaceAll("\\.$", ""))
      .filter(_.nonEmpty)
      .toArray.distinct
    if (norm.isEmpty) lit(false)
    else coalesce(arrays_overlap(hostSuffixes(host), lit(norm)), lit(false))
  }
}
