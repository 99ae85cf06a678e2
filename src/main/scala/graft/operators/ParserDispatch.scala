package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One routing rule: URLs matching `pattern` (case-insensitive, like
  * re.IGNORECASE at cola/core/urls.py:27) are handled by `parserId`. */
case class ParserRule(pattern: String, parserId: String)

/** What a parser does with a fetched page — the offline reading of a
  * reference parser class: does it emit extracted text (a result row),
  * and do its outlinks feed the frontier. */
case class ParserBehavior(extractsText: Boolean, followsLinks: Boolean)

/**
 * P2 parser dispatch (cola/core/urls.py:62-73): an ORDERED rule list maps
 * each URL to the parser of its FIRST matching pattern; a URL matching no
 * rule is dropped (P1 filter, urls.py:48-60 — `matches` and `get_parser`
 * share the rule table). The reference routes to arbitrary parser classes
 * (five in app/weibo/__init__.py:43-49, one in app/wiki/__init__.py:151-153);
 * the offline engine ships three behaviors over the fetched html column:
 *
 *  - `extract`: article parser — readability text emitted, outlinks followed
 *  - `links`:   hub parser — no text, outlinks followed (list/index pages)
 *  - `leaf`:    leaf parser — text emitted, outlinks NOT followed
 *
 * Dispatch is a pure first-match `when` chain over the RAW url (the
 * reference matches the produced url string, executor.py:415), fully
 * codegen'd — no UDF, no shuffle.
 */
object ParserDispatch {

  val behaviors: Map[String, ParserBehavior] = Map(
    "extract" -> ParserBehavior(extractsText = true, followsLinks = true),
    "links" -> ParserBehavior(extractsText = false, followsLinks = true),
    "leaf" -> ParserBehavior(extractsText = true, followsLinks = false))

  /** First-match parser id; null when no rule matches (→ dropped by P1). */
  def parserId(url: Column, rules: Seq[ParserRule]): Column = {
    require(rules.nonEmpty, "at least one parser rule required")
    rules.foreach(r => require(behaviors.contains(r.parserId),
      s"unknown parser '${r.parserId}' (have: ${behaviors.keys.mkString(", ")})"))
    rules.foldRight(lit(null).cast("string")) { case (r, acc) =>
      when(url.rlike("(?i)" + r.pattern), lit(r.parserId)).otherwise(acc)
    }
  }

  /** P1 accept gate: some rule matches. */
  def accepts(url: Column, rules: Seq[ParserRule]): Column =
    parserId(url, rules).isNotNull

  /** Parser ids of `rules` whose behavior passes `p` (driver-side plan
    * specialization: conditions compile to constant-folded isin sets). */
  def idsWhere(rules: Seq[ParserRule], p: ParserBehavior => Boolean): Seq[String] =
    rules.map(_.parserId).distinct.filter(id => p(behaviors(id)))
}
