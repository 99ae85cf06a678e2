package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Page-metadata extraction as codegen regexp columns: OpenGraph /
 * named `<meta>` content and first-JSON-LD-block fields — the
 * provenance/quality sidecar a webtext pipeline carries per document
 * (og:title / og:description for display titles,
 * article:published_time and JSON-LD datePublished for recency cuts
 * and dedup tie-breaks). Same design contract as
 * [[graft.operators.Robots.metaRobotsHas]]: the regex surface targets
 * well-formed tags — both attribute orders, either quote style, any
 * attribute casing, content case PRESERVED (unlike the robots reader,
 * which may lowercase: og content is display text) — and pathological
 * soup reads as absent (null), the fail-open reading. No UDF:
 * everything stays inside whole-stage codegen, and the identical
 * patterns replay in the SQL oracle (inline `(?is)` flags are in the
 * RE2 ∩ java.util.regex subset).
 */
object PageMeta {

  /** Content of the first `<meta property|name="key" content="…">`.
   *  `key` must be plain `[A-Za-z0-9:._-]` — it is spliced into the
   *  pattern verbatim, so regex metacharacters are rejected (`.` in a
   *  key matches itself or any char; accepted, the standard og/article
   *  keys contain none that collide). Null html or no match → null. */
  def metaContent(html: Column, key: String): Column = {
    require(key.matches("[A-Za-z0-9:._-]+"), s"non-literal meta key: $key")
    val h = coalesce(html, lit(""))
    val keyFirst = regexp_extract(h,
      s"""(?is)<meta[^>]*(?:property|name)\\s*=\\s*["']$key["'][^>]*content\\s*=\\s*["']([^"']*)""", 1)
    val contentFirst = regexp_extract(h,
      s"""(?is)<meta[^>]*content\\s*=\\s*["']([^"']*)["'][^>]*(?:property|name)\\s*=\\s*["']$key["']""", 1)
    nullif(when(keyFirst =!= "", keyFirst).otherwise(contentFirst), lit(""))
  }

  /** A field out of the page's FIRST JSON-LD block
   *  (`<script type="application/ld+json">…</script>`), by JSONPath.
   *  Absent block, malformed JSON, or missing field → null
   *  (`get_json_object` semantics — one dirty page never fails a
   *  10^10-page job). */
  def jsonLdField(html: Column, path: String): Column = {
    val block = regexp_extract(coalesce(html, lit("")),
      """(?is)<script[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>(.*?)</script>""", 1)
    get_json_object(nullif(block, lit("")), path)
  }

  /** The standard sidecar struct a webtext pipeline carries along:
   *  og:title, og:description, article:published_time, JSON-LD
   *  headline + datePublished. One projection, shuffle-free. */
  def standardSidecar(html: Column): Column = struct(
    metaContent(html, "og:title").as("og_title"),
    metaContent(html, "og:description").as("og_description"),
    metaContent(html, "article:published_time").as("published_time"),
    jsonLdField(html, "$.headline").as("ld_headline"),
    jsonLdField(html, "$.datePublished").as("ld_date_published"))
}
