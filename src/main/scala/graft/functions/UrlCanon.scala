package graft.functions

/**
 * URL utilities: relative-reference resolution matching the reference
 * crawler's semantics, plus full RFC 3986 canonicalization (the
 * north-rule superset the reference only approximates).
 *
 * Reference semantics carried:
 *  - `resolve` reproduces `cola/core/extractor/utils.py:37-69`
 *    (`absolute_url`): strip whitespace; keep absolute URLs; root-relative
 *    joins to scheme://netloc; otherwise join to the base path's directory.
 *  - `host` generalizes `cola/core/extractor/utils.py:25-35`
 *    (`host_for_url`): netloc of the parsed URL, here lowercased and
 *    port-stripped so politeness groups by real host.
 *  - fragment stripping carries `app/wiki/__init__.py:138-149`.
 *
 * Everything here is a pure, deterministic, null-safe function so the
 * registered Spark UDFs stay deterministic (Catalyst may reuse/reorder).
 */
object UrlCanon extends Serializable {

  /** Split url into (scheme, authority, path, query, fragment); any part
   *  may be empty. Mirrors RFC 3986 appendix-B regex semantics. */
  private[functions] def split(url: String): (String, String, String, String, String) = {
    var rest = url
    var fragment = ""
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) { fragment = rest.substring(hashIdx + 1); rest = rest.substring(0, hashIdx) }
    var query = ""
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) { query = rest.substring(qIdx + 1); rest = rest.substring(0, qIdx) }
    var scheme = ""
    val colonIdx = rest.indexOf(':')
    if (colonIdx > 0 && rest.substring(0, colonIdx).forall(c =>
        c.isLetterOrDigit || c == '+' || c == '-' || c == '.') &&
        rest.charAt(0).isLetter) {
      scheme = rest.substring(0, colonIdx)
      rest = rest.substring(colonIdx + 1)
    }
    var authority = ""
    if (rest.startsWith("//")) {
      val afterSlashes = rest.substring(2)
      val slashIdx = afterSlashes.indexOf('/')
      if (slashIdx >= 0) { authority = afterSlashes.substring(0, slashIdx); rest = afterSlashes.substring(slashIdx) }
      else { authority = afterSlashes; rest = "" }
    }
    (scheme, authority, rest, query, fragment)
  }

  /** Host (no port, lowercased) or null — politeness grouping key. */
  def host(url: String): String = {
    if (url == null) return null
    val (_, authority, _, _, _) = split(url.trim)
    if (authority.isEmpty) return null
    // strip userinfo then port (IPv6 [..] kept intact)
    val noUser = { val at = authority.lastIndexOf('@'); if (at >= 0) authority.substring(at + 1) else authority }
    val h =
      if (noUser.startsWith("[")) { val end = noUser.indexOf(']'); if (end >= 0) noUser.substring(0, end + 1) else noUser }
      else { val c = noUser.indexOf(':'); if (c >= 0) noUser.substring(0, c) else noUser }
    if (h.isEmpty) null else h.toLowerCase
  }

  /** Reference absolute_url semantics (cola/core/extractor/utils.py:37-69). */
  def resolve(href: String, baseUrl: String): String = {
    if (href == null) return null
    val url = href.trim
    if (baseUrl == null) return url
    val (scheme, _, _, _, _) = split(url)
    if (scheme.nonEmpty) return url
    val (bScheme, bAuth, bPath, _, _) = split(baseUrl.trim)
    val baseServer = s"$bScheme://$bAuth"
    if (url.startsWith("/")) baseServer + url
    else {
      val dir =
        if (bPath.contains("/")) bPath.substring(0, bPath.lastIndexOf('/')) + "/"
        else "/"
      baseServer + dir + url
    }
  }

  private val Unreserved: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~')).toSet

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-normalize: decode %XX when the octet is unreserved,
   *  uppercase surviving hex digits, leave malformed escapes alone. */
  private[functions] def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s // hot path: nothing to normalize
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        val ch = v.toChar
        if (v < 128 && Unreserved.contains(ch)) sb.append(ch)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[functions] def removeDotSegments(path: String): String = {
    // hot path: no "." or ".." segment anywhere
    if (path.indexOf("/.") < 0 && !path.startsWith(".")) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next >= 0) { out.append(in.substring(0, next)); in = in.substring(next) }
        else { out.append(in); in = "" }
      }
    }
    out.mkString
  }

  /**
   * Full canonical form (north rule P8): lowercase scheme+host, strip
   * fragment, strip default port, percent-normalize, remove dot segments,
   * empty path -> "/", query params sorted (stable, by full "k=v" text).
   * Idempotent: canonicalize(canonicalize(u)) == canonicalize(u).
   */
  /** Conservative single-scan check: true only when [[canonicalize]]
   *  would provably return the input unchanged (lowercase http/https, no
   *  userinfo/port, plain lowercase host, non-empty path, no %/#/?, no
   *  dot segments). False negatives just take the slow path; the whole
   *  point is that discovered URLs at crawl scale are usually already
   *  canonical, and this avoids re-building the string per row. */
  private[functions] def isCanonicalFast(u: String): Boolean = {
    val n = u.length
    val authStart =
      if (u.startsWith("http://")) 7
      else if (u.startsWith("https://")) 8
      else return false
    val pathStart = u.indexOf('/', authStart)
    if (pathStart <= authStart) return false
    var j = authStart
    while (j < pathStart) {
      val c = u.charAt(j)
      if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '.' || c == '-'))
        return false
      j += 1
    }
    j = pathStart
    while (j < n) {
      val c = u.charAt(j)
      if (c == '%' || c == '#' || c == '?') return false
      if (c == '.' && u.charAt(j - 1) == '/') return false // "/." or "/.."
      j += 1
    }
    true
  }

  def canonicalize(url: String): String = {
    if (url == null) return null
    val trimmed = url.trim
    if (trimmed.isEmpty) return trimmed
    if (isCanonicalFast(trimmed)) return trimmed
    val (scheme0, auth0, path0, query0, _) = split(trimmed)
    if (scheme0.isEmpty && auth0.isEmpty) {
      // not an absolute URL; best-effort: normalize path+query only
      val p = pctNormalize(path0)
      val q = canonQuery(query0)
      return if (q.isEmpty) p else s"$p?$q"
    }
    val scheme = scheme0.toLowerCase
    // authority: userinfo kept, host lowercased, default port stripped
    val (userinfo, hostport) = {
      val at = auth0.lastIndexOf('@')
      if (at >= 0) (auth0.substring(0, at + 1), auth0.substring(at + 1)) else ("", auth0)
    }
    val (h, port) =
      if (hostport.startsWith("[")) {
        val end = hostport.indexOf(']')
        if (end >= 0 && end + 1 < hostport.length && hostport.charAt(end + 1) == ':')
          (hostport.substring(0, end + 1), hostport.substring(end + 2))
        else (hostport, "")
      } else {
        val c = hostport.indexOf(':')
        if (c >= 0) (hostport.substring(0, c), hostport.substring(c + 1)) else (hostport, "")
      }
    val defaultPort = scheme match {
      case "http" => "80"; case "https" => "443"; case "ftp" => "21"; case _ => ""
    }
    val keepPort = port.nonEmpty && port != defaultPort
    val authority = userinfo + h.toLowerCase + (if (keepPort) ":" + port else "")
    val path = {
      val p = removeDotSegments(pctNormalize(path0))
      if (p.isEmpty) "/" else p
    }
    val q = canonQuery(query0)
    val base = s"$scheme://$authority$path"
    if (q.isEmpty) base else s"$base?$q"
  }

  /** Sort query params; drop empty segments; percent-normalize each. */
  private[functions] def canonQuery(query: String): String = {
    if (query == null || query.isEmpty) return ""
    if (query.indexOf('&') < 0) return pctNormalize(query) // single param
    val parts = query.split("&").toSeq.filter(_.nonEmpty).map(pctNormalize)
    parts.sorted.mkString("&")
  }

  /** Strip fragment only (P7 core; SQL-expressible for the oracle). */
  def stripFragment(url: String): String = {
    if (url == null) return null
    val i = url.indexOf('#')
    if (i >= 0) url.substring(0, i) else url
  }
}
