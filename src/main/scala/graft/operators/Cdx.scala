package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CDX-style capture indexing (the Common-Crawl / Wayback artifact): every
 * fetched page becomes one index row keyed by its SURT form — the
 * Sort-friendly URI Reordering Transform (`http://www.Example.com/a` →
 * `com,example)/a`) that groups a whole site, subdomains adjacent, under
 * one key prefix when sorted. CC publishes exactly this shape
 * (urlkey, timestamp14, digest, length) as the per-crawl `cdx-*` shards,
 * and downstream tooling range-scans it by prefix.
 *
 * SURT here: lowercase; scheme dropped; one leading `www.` dropped (the
 * Wayback canonicalizer's rule — `www2.` etc. are kept: they are real
 * distinct hosts more often than mirrors); host labels reversed and
 * comma-joined; a non-default port rides after the reversed host
 * (`com,example:8080)`); path+query follow `)` verbatim, '' → '/'.
 * Full URL canonicalization (percent-case, query sort, default-port
 * strip) is UrlCanon.canonicalize — run it UPSTREAM; this transform
 * only re-orders, so garbage stays garbage instead of being silently
 * "fixed" twice. A URL with no parseable authority yields a null key.
 *
 * Scale (10^10 captures): both the key and the row are pure per-row
 * codegen projections — no UDF, no shuffle. Writing sorted CDX shards is
 * then `repartitionByRange($"urlkey").sortWithinPartitions($"urlkey")`
 * — one range exchange, and each output file is an independently
 * binary-searchable sorted run exactly like CC's 300-shard layout.
 */
object Cdx {

  /** The SURT key Column (null when the URL has no parseable host). */
  def surtKey(url: Column): Column = {
    val u = lower(trim(url))
    val hostPort = regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    val host = substring_index(hostPort, ":", 1)
    val port = nullif(regexp_extract(hostPort, ":([0-9]+)$", 1), lit(""))
    val bare = regexp_replace(host, "^www\\.", "")
    val rev = array_join(reverse(split(bare, "\\.")), ",")
    val rest = regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]+([/?].*)?$", 1)
    when(hostPort === "" || hostPort.isNull, lit(null).cast("string"))
      .otherwise(concat(rev,
        coalesce(concat(lit(":"), port), lit("")),
        lit(")"),
        when(rest === "", lit("/")).otherwise(rest)))
  }

  /** One CDX row per capture: (urlkey, ts — the 14-digit wall-clock
   *  form CC uses, digest — md5 hex of the payload bytes, length —
   *  payload octets, url — the original). `payloadCol` may be string or
   *  binary; strings hash/measure their UTF-8 bytes, matching what a
   *  WARC writer would have stored. */
  def cdxIndex(pages: DataFrame, urlCol: String, tsCol: String,
      payloadCol: String): DataFrame =
    pages.select(
      surtKey(col(urlCol)).as("urlkey"),
      date_format(col(tsCol).cast("timestamp"), "yyyyMMddHHmmss").as("ts"),
      md5(col(payloadCol).cast("binary")).as("digest"),
      length(col(payloadCol).cast("binary")).cast("long").as("length"),
      col(urlCol).as("url"))
}
