package graft.functions

import scala.collection.mutable

/**
 * Minimal mutable HTML DOM + parser + serializer.
 *
 * Exists because the extraction pipeline (see [[Extract]]) needs the same
 * tree operations the reference performs with BeautifulSoup
 * (`cola/core/extractor/preprocess.py`, `readability.py`): find_all,
 * extract (detach), contents, parent links, tag rename, text collection,
 * and re-serialization. Not a full HTML5 tree builder, but handles the
 * dominant real-web tag-soup shapes the way BeautifulSoup repairs them
 * (MalformedHtmlSpec freezes the behavior): void elements, raw-text
 * script/style, stray close tags, stray '<', unquoted/valueless/duplicate
 * attributes, implicit closing (`<p>a<p>b` → sibling paragraphs, `<li>`,
 * `<td>`/`<tr>`, `<dt>`/`<dd>`, `<option>`, block elements closing an
 * open paragraph), misnested close tags (pop to the nearest open match),
 * unclosed elements at EOF, misnested inline formatting (a close tag that
 * pops over still-open formatting elements REOPENS them — the common-case
 * adoption-agency repair: `<b>a<i>b</b>c</i>` puts `c` inside a reopened
 * `<i>`, like a browser), and character references (decoded in text and
 * attribute values at parse — the FULL HTML5 named table incl. the
 * no-semicolon legacy forms (see [[HtmlEntities]]), numeric dec/hex with
 * the HTML5 windows-1252 remap for C1 refs (`&#147;` is a curly quote on
 * legacy pages); a bare `&` that starts no valid reference stays literal,
 * the real-web leniency). Serialization re-escapes `&` `<` `>`
 * in text and `&` `"` in attributes (the BeautifulSoup round-trip rule —
 * without it a decoded `&lt;b&gt;` would re-parse as a real element).
 * Implied html/head/body synthesis is a separate explicit step,
 * [[implySections]] — parse() stays fragment-shaped; the extractor
 * applies the synthesis to mirror the reference's lxml tree. Remaining
 * divergence from a browser: the exotic corners of the multi-step
 * adoption agency (the spec's 8-iteration outer loop) on
 * pathologically deep misnesting.
 */
object Html {

  private val VoidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Tag-soup leniency: a start tag implicitly closes these still-open
   *  elements (nearest-first, stopping at the first non-match) — the
   *  BeautifulSoup NESTABLE/RESET_NESTING_TAGS behavior the reference's
   *  extractor relies on for real-web HTML (`<p>a<p>b` is two sibling
   *  paragraphs, `<li>`/`<td>` rows self-terminate, a block element
   *  closes an open paragraph). */
  private val ParagraphClosers: Set[String] = Set(
    "p", "div", "ul", "ol", "dl", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "table", "form", "hr", "section", "article",
    "aside", "header", "footer", "fieldset", "address")
  private val ImplicitClosers: Map[String, Set[String]] =
    ParagraphClosers.map(t => t -> Set("p")).toMap ++ Map(
      "li" -> Set("li"),
      "dt" -> Set("dt", "dd"), "dd" -> Set("dt", "dd"),
      "tr" -> Set("tr", "td", "th"),
      "td" -> Set("td", "th"), "th" -> Set("td", "th"),
      "option" -> Set("option"))

  private val RawTextElements: Set[String] = Set("script", "style")

  /** The HTML5 "special" category members this parser can encounter as
   *  open elements (§13.2.4.2, abridged to the real-web set): the
   *  adoption agency's candidate "furthest blocks". A close tag for a
   *  formatting element that pops over one of these triggers the
   *  block-adoption repair (see the parse() close-tag branch); elements
   *  that are neither special nor formatting (span, sub, sup) are simply
   *  popped, matching browsers. */
  private val BlockElements: Set[String] = ParagraphClosers ++ Set(
    "li", "dd", "dt", "td", "th", "tr", "caption", "tbody", "thead",
    "tfoot", "body", "html", "center", "main", "nav", "figure",
    "figcaption", "details", "summary", "dir", "menu")

  /** The HTML5 formatting-element set (the spec's "list of active
   *  formatting elements" members, §13.2.4.3): a close tag popping over
   *  these reopens them at the new insertion point (the one-step
   *  adoption-agency repair for misnested inline runs). Deliberately NOT
   *  span/sub/sup — browsers close those at an enclosing end tag without
   *  reconstruction. The reopen is eager (the spec reconstructs lazily on
   *  the next insertion), so a reopened element with nothing after it
   *  leaves an empty trailing clone — invisible to text extraction. */
  private val FormattingElements: Set[String] = Set(
    "a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
    "strike", "strong", "tt", "u")

  /** Named character references decoded at parse: the FULL WHATWG HTML5
   *  table — 2125 semicolon-terminated names + the 106 no-semicolon
   *  legacy names — generated from the public spec data into
   *  [[HtmlEntities]] (tools/gen_html_entities.py). Matching follows the
   *  spec's named-character-reference state (§13.2.5.73): the
   *  semicolon-terminated name wins when present; otherwise the LONGEST
   *  legacy prefix of the alphanumeric run decodes (`&notit;` → `¬it;`),
   *  and inside an attribute value a legacy match followed by `=` or an
   *  alphanumeric stays literal (so `href="?a=1&copy=2"` keeps its query
   *  parameter). A bare `&` or unknown name stays literal — the real-web
   *  leniency. The nbsp rule: entity values that are Python-whitespace
   *  but not Java-ASCII-whitespace (NBSP, the U+2000 block, NNBSP, MMSP)
   *  are pre-folded to a plain space at table generation — the reference
   *  decodes `&nbsp;` to \xa0 but Python's Unicode-aware whitespace
   *  normalization folds it downstream, while java \s is ASCII-only;
   *  folding at decode yields the reference-equal FINAL text without
   *  widening every whitespace regex. zwnj/zwj/lrm/rlm are FORMAT chars,
   *  not whitespace, in both engines — they pass through as themselves. */

  /** HTML5 numeric-reference remap (§13.2.5.80): a `&#N;` in the C1
   *  range 0x80–0x9F decodes through windows-1252 — legacy pages write
   *  `&#147;` meaning a curly quote. Codepoints without a 1252 mapping
   *  (0x81 0x8D 0x8F 0x90 0x9D) pass through unchanged per spec. */
  private val Win1252C1: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  /** Decode character references leniently: `&name;`, `&#123;`, `&#x1f;`
   *  become their characters; a `&` that starts no valid reference stays
   *  literal (bare ampersands are everywhere on the real web). `inAttr`
   *  enables the attribute-value suppression rule for legacy
   *  no-semicolon references (see the table scaladoc above). */
  /** HTML5 §13.2.5.73 "ASCII alphanumeric" — entity names and the
   *  legacy-reference suppression check are ASCII-only by spec;
   *  Character.isLetterOrDigit would wrongly treat 'é' or '٣' as part
   *  of a name / as a suppressing character. */
  private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private[functions] def decodeEntities(s: String): String =
    decodeEntities(s, inAttr = false)

  private[functions] def decodeEntities(s: String, inAttr: Boolean): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (amp >= 0) {
      sb.append(s, i, amp)
      var consumed = 0
      if (amp + 1 < n && s.charAt(amp + 1) == '#') {
        val hex = amp + 2 < n && (s.charAt(amp + 2) == 'x' || s.charAt(amp + 2) == 'X')
        val dStart = if (hex) amp + 3 else amp + 2
        var j = dStart
        while (j < n && (if (hex) Character.digit(s.charAt(j), 16) >= 0 else s.charAt(j).isDigit)) j += 1
        if (j > dStart && j < n && s.charAt(j) == ';' && j - dStart <= 8) {
          try {
            val cp = Integer.parseInt(s.substring(dStart, j), if (hex) 16 else 10)
            // HTML5: NUL and surrogate references decode to U+FFFD — a
            // raw surrogate char would make the String malformed UTF-16
            // (strict encoders throw, UTF-8 writes '?')
            if (cp == 0 || (cp >= 0xD800 && cp <= 0xDFFF)) {
              sb.append('�'); consumed = j + 1 - amp
            } else if (cp >= 0x80 && cp <= 0x9F) {
              // HTML5 legacy remap: C1 refs mean windows-1252 (&#147; is
              // a curly quote on real pages); unmapped slots pass through
              sb.append(Win1252C1.getOrElse(cp, cp.toChar))
              consumed = j + 1 - amp
            } else if (cp == 0xA0) {
              // numeric nbsp folds to plain space like the named form
              sb.append(' '); consumed = j + 1 - amp
            } else if (Character.isValidCodePoint(cp)) {
              sb.append(Character.toChars(cp)); consumed = j + 1 - amp
            }
          } catch { case _: NumberFormatException => }
        }
      } else {
        // maximal alphanumeric run (HTML names are alphanumeric, always
        // letter-first); capped one past the longest table name so a
        // long run still distinguishes "ends exactly at ';'" from
        // "continues past any possible name"
        var j = amp + 1
        while (j < n && j - (amp + 1) <= HtmlEntities.MaxNameLen &&
            isAsciiAlnum(s.charAt(j))) j += 1
        if (j > amp + 1) {
          if (j < n && s.charAt(j) == ';' && j - (amp + 1) <= HtmlEntities.MaxNameLen) {
            val r = HtmlEntities.withSemi.get(s.substring(amp + 1, j))
            if (r != null) { sb.append(r); consumed = j + 1 - amp }
          }
          if (consumed == 0) {
            // longest legacy (no-semicolon) prefix: &copy, &not, &amp …
            // (§13.2.5.73). On an attribute-context suppression the WHOLE
            // reference stays literal — no shorter prefix is retried.
            var len = math.min(HtmlEntities.MaxLegacyLen, j - (amp + 1))
            var done = false
            while (!done && len >= 2) {
              val r = HtmlEntities.legacy.get(s.substring(amp + 1, amp + 1 + len))
              if (r != null) {
                done = true
                val nextIdx = amp + 1 + len
                val suppressed = inAttr && nextIdx < n &&
                  (s.charAt(nextIdx) == '=' || isAsciiAlnum(s.charAt(nextIdx)))
                if (!suppressed) { sb.append(r); consumed = 1 + len }
              } else len -= 1
            }
          }
        }
      }
      if (consumed == 0) { sb.append('&'); consumed = 1 }
      i = amp + consumed
      amp = s.indexOf('&', i)
    }
    sb.append(s, i, n)
    sb.toString
  }

  /** Serializer escaping (the BS4 round-trip rule): text must re-escape
   *  what parse decoded, or a decoded `<` would re-parse as markup. */
  private def escapeText(s: String): String =
    if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0) s
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def escapeAttr(s: String): String =
    if (s.indexOf('&') < 0 && s.indexOf('"') < 0) s
    else s.replace("&", "&amp;").replace("\"", "&quot;")

  sealed trait Node {
    var parent: Elem = _
    /** Concatenation of all descendant text (BS4 ''.join(find_all(text=True))). */
    def text: String
    def render: String
    /** Detach from parent (BS4 .extract()). */
    def extract(): Unit = {
      if (parent != null) { parent.children -= this; parent = null }
    }
  }

  final class Text(val data: String) extends Node {
    override def text: String = data
    override def render: String =
      if (parent != null && RawTextElements.contains(parent.name)) data
      else escapeText(data)
  }

  final class Elem(var name: String) extends Node {
    val attrs: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty
    val children: mutable.ArrayBuffer[Node] = mutable.ArrayBuffer.empty

    def attr(k: String): Option[String] = attrs.get(k)

    def append(n: Node): Unit = { n.extract(); n.parent = this; children += n }

    /** All descendant elements, document order, materialized (safe to mutate while iterating the result). */
    def findAllElems: Vector[Elem] = {
      val out = Vector.newBuilder[Elem]
      def walk(e: Elem): Unit = e.children.foreach {
        case c: Elem => out += c; walk(c)
        case _ =>
      }
      walk(this)
      out.result()
    }

    def findAll(names: String*): Vector[Elem] = {
      val set = names.toSet
      findAllElems.filter(e => set.contains(e.name))
    }

    def find(n: String): Option[Elem] = findAllElems.find(_.name == n)

    /** BS4 .string: the single string child, recursing through single-element wrappers. */
    def stringValue: Option[String] = {
      if (children.length != 1) None
      else children.head match {
        case t: Text => Some(t.data)
        case e: Elem => e.stringValue
      }
    }

    override def text: String = {
      val sb = new StringBuilder
      def walk(e: Elem): Unit = e.children.foreach {
        case t: Text => sb.append(t.data)
        case c: Elem => walk(c)
      }
      walk(this)
      sb.toString
    }

    override def render: String = {
      val sb = new StringBuilder
      renderTo(sb)
      sb.toString
    }

    private def renderTo(sb: StringBuilder): Unit = {
      if (name != "[document]") {
        sb.append('<').append(name)
        attrs.foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"").append(escapeAttr(v)).append('"') }
        if (children.isEmpty && VoidElements.contains(name)) { sb.append("/>"); return }
        sb.append('>')
      }
      val raw = RawTextElements.contains(name)
      children.foreach {
        case t: Text => sb.append(if (raw) t.data else escapeText(t.data))
        case e: Elem => e.renderTo(sb)
      }
      if (name != "[document]") sb.append("</").append(name).append('>')
    }
  }

  /** Elements libxml2 admits in an implied `<head>` (title/meta/link/
   *  base/style/script); the first top-level item outside this set — or
   *  any non-whitespace text — flips insertion to the implied body. */
  private val HeadLevelElements: Set[String] =
    Set("title", "meta", "link", "base", "style", "script")

  /**
   * Implied html/head/body synthesis (the lxml/libxml2 tree shape),
   * applied by the extractor AFTER parse — [[parse]] itself stays
   * fragment-shaped (the frozen MalformedHtmlSpec surface). The
   * reference parses with `BeautifulSoup(html, 'lxml')`
   * (`cola/core/utils.py:102`), so its tree ALWAYS has html>head/body:
   * `soup.head.title` (preprocess.py:106) finds a bare top-level
   * `<title>`, and `soup.body or soup` (preprocess.py:121) never falls
   * back to the whole document. Without this restructure a page that
   * declares no `<body>` would extract against the document root —
   * head content leaks into the candidate walk and sibling logic.
   *
   * Mutates and returns `root`. A document that already declares a
   * `<body>` ANYWHERE keeps its body untouched — the well-formed fast
   * path the golden corpus binds — but bare [[HeadLevelElements]]
   * sitting at the top level BEFORE the body still move into the
   * existing-or-synthesized `<head>` (lxml finds `soup.head.title` for
   * `<title>T</title><body>…` too). Otherwise: top-level
   * [[HeadLevelElements]] before the first content item move into the
   * existing-or-synthesized `<head>`; whitespace-only text between
   * them is dropped (libxml2 discards it); everything from the first
   * content item on — including later stray title/meta, which libxml2
   * also leaves in the body — wraps in a synthesized `<body>`; head
   * and body land under the existing-or-synthesized `<html>`. Content
   * misplaced OUTSIDE an explicit `<html>` element stays where it is
   * (rare soup; documented divergence).
   */
  def implySections(root: Elem): Elem = {
    def hasBody(e: Elem): Boolean = e.children.exists {
      case c: Elem => c.name == "body" || hasBody(c)
      case _ => false
    }
    val container = root.children.collectFirst {
      case e: Elem if e.name == "html" => e }.getOrElse(root)
    val explicitHead = container.children.collectFirst {
      case e: Elem if e.name == "head" => e }
    if (hasBody(root)) {
      // declared body: only repair a MISSING head for bare top-level
      // head elements before it (title extraction parity); the body
      // and everything under it stay untouched
      val bodyIdx = container.children.indexWhere {
        case e: Elem => e.name == "body"
        case _ => false
      }
      if (bodyIdx >= 0) {
        val strays = container.children.take(bodyIdx).collect {
          case e: Elem if HeadLevelElements.contains(e.name) => e
        }.toVector
        if (strays.nonEmpty) {
          val head = explicitHead.getOrElse {
            val h = new Elem("head")
            h.parent = container
            container.children.insert(math.max(container.children
              .indexWhere { case e: Elem => e.name == "body"; case _ => false }, 0), h)
            h
          }
          strays.foreach(head.append)
        }
      }
      return root
    }
    val headParts = mutable.ArrayBuffer.empty[Elem]
    val bodyParts = mutable.ArrayBuffer.empty[Node]
    var inHead = true
    container.children.toVector.foreach {
      case e: Elem if explicitHead.contains(e) => () // stays in place
      case e: Elem if inHead && HeadLevelElements.contains(e.name) =>
        headParts += e
      case t: Text if inHead && t.data.forall(_.isWhitespace) =>
        t.extract() // inter-head whitespace: libxml2 discards it
      case n => inHead = false; bodyParts += n
    }
    val head = explicitHead.getOrElse(
      if (headParts.nonEmpty) new Elem("head") else null)
    if (head != null) headParts.foreach(head.append)
    val body = new Elem("body")
    bodyParts.foreach(body.append)
    val html =
      if (container ne root) container
      else {
        val h = new Elem("html")
        // root now holds at most the explicit head (moved under html below)
        h.parent = root; root.children += h
        explicitHead.foreach(h.append)
        h
      }
    if (head != null && explicitHead.isEmpty) html.append(head)
    html.append(body)
    root
  }

  /** Parse into a synthetic "[document]" root. Comments and doctypes dropped. */
  def parse(html: String): Elem = {
    val root = new Elem("[document]")
    var cur = root
    val s = if (html == null) "" else html
    lazy val sLower = s.toLowerCase
    val n = s.length
    var i = 0

    def appendText(from: Int, until: Int): Unit =
      if (until > from) {
        val t = new Text(decodeEntities(s.substring(from, until)))
        t.parent = cur; cur.children += t
      }

    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) { appendText(i, n); i = n }
      else {
        appendText(i, lt)
        if (s.startsWith("<!--", lt)) {
          val end = s.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (s.charAt(lt + 1) == '!' || s.charAt(lt + 1) == '?')) {
          val end = s.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && s.charAt(lt + 1) == '/') {
          val end = s.indexOf('>', lt)
          if (end < 0) i = n
          else {
            val tag = s.substring(lt + 2, end).trim.toLowerCase
            // pop to the nearest matching open element; ignore if none.
            var p = cur
            while (p != null && p.name != tag) p = p.parent
            if (p != null) {
              def cloneShell(t: Elem): Elem = {
                val ne = new Elem(t.name)
                t.attrs.foreach { case (k, v) => ne.attrs(k) = v }
                ne
              }
              // open elements strictly below p, top-down (p's child first)
              val topDown = {
                val buf = mutable.ArrayBuffer.empty[Elem]
                var q = cur
                while (q ne p) { buf += q; q = q.parent }
                buf.reverseIterator.toVector
              }
              val firstBlock = topDown.indexWhere(e => BlockElements.contains(e.name))
              if (FormattingElements.contains(tag) && firstBlock >= 0) {
                // BLOCK ADOPTION (the multi-step adoption agency, simplified
                // to the append-only tree this parser builds): closing a
                // formatting element f over open special/"block" elements
                // moves the block chain OUT of f to f's parent, wraps each
                // block's existing children in clones of the formatting
                // elements whose scope covered them, and leaves the cursor
                // in the innermost block — the spec's own example
                // `<b>1<p>2</b>3` becomes `<b>1</b><p><b>2</b>3</p>`.
                // Formatting elements opened BEFORE the first block are
                // consumed (removed from scope, like the spec's inner
                // loop); ones opened AFTER it stay open — they reopen as
                // clones for subsequent content, so `<b>1<div>2<i>3</b>4`
                // puts 4 inside a reopened <i> within the div.
                val wrapChain = mutable.ArrayBuffer[Elem](p)
                topDown.take(firstBlock).foreach { e =>
                  if (FormattingElements.contains(e.name)) wrapChain += e }
                val reopen = mutable.ArrayBuffer.empty[Elem]
                var container = if (p.parent != null) p.parent else root
                var bi = firstBlock
                while (bi < topDown.length) {
                  val e = topDown(bi)
                  var jn = bi + 1
                  while (jn < topDown.length && !BlockElements.contains(topDown(jn).name)) jn += 1
                  val nextBlock = if (jn < topDown.length) topDown(jn) else null
                  val fmtsBetween = topDown.slice(bi + 1, jn)
                    .filter(x => FormattingElements.contains(x.name))
                  container.append(e)
                  if (nextBlock != null) nextBlock.extract()
                  if (e.children.nonEmpty) {
                    val moved = e.children.toVector
                    e.children.clear()
                    var parentEl = e
                    wrapChain.foreach { t =>
                      val c = cloneShell(t)
                      c.parent = parentEl; parentEl.children += c; parentEl = c
                    }
                    moved.foreach { ch => ch.parent = parentEl; parentEl.children += ch }
                  }
                  if (nextBlock != null) { nextBlock.parent = e; e.children += nextBlock }
                  wrapChain ++= fmtsBetween
                  reopen ++= fmtsBetween
                  container = e
                  cur = e
                  bi = if (nextBlock != null) jn else topDown.length
                }
                reopen.foreach { t =>
                  val c = cloneShell(t)
                  c.parent = cur; cur.children += c; cur = c
                }
              } else {
                // pop + reopen (one-step adoption agency): formatting
                // elements the pop passes over are REOPENED at the new
                // insertion point — in `<b>a<i>b</b>c</i>` the </b> pops
                // over the open <i>, and a fresh <i> reopens so `c` lands
                // inside it, like a browser.
                cur = if (p.parent != null) p.parent else root
                topDown.foreach { f =>
                  if (FormattingElements.contains(f.name)) {
                    val ne = cloneShell(f)
                    ne.parent = cur; cur.children += ne; cur = ne
                  }
                }
              }
            }
            i = end + 1
          }
        } else if (lt + 1 < n && (s.charAt(lt + 1).isLetter)) {
          val end = findTagEnd(s, lt)
          if (end < 0) { appendText(lt, n); i = n }
          else {
            val inner = s.substring(lt + 1, end)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val (tag, attrs) = parseTag(body)
            // implicit closes (tag soup): pop still-open elements this
            // start tag terminates, nearest-first
            ImplicitClosers.get(tag).foreach { closes =>
              while (cur.parent != null && closes.contains(cur.name)) cur = cur.parent
            }
            val e = new Elem(tag)
            // duplicate attributes: first occurrence wins (browser/BS rule)
            attrs.foreach { case (k, v) => if (!e.attrs.contains(k)) e.attrs(k) = v }
            e.parent = cur; cur.children += e
            i = end + 1
            if (!selfClose && RawTextElements.contains(tag)) {
              val close = sLower.indexOf("</" + tag, i)
              val stop = if (close < 0) n else close
              if (stop > i) { val t = new Text(s.substring(i, stop)); t.parent = e; e.children += t }
              i = if (close < 0) n
                  else { val gt = s.indexOf('>', close); if (gt < 0) n else gt + 1 }
            } else if (!selfClose && !VoidElements.contains(tag)) {
              cur = e
            }
          }
        } else { // stray '<'
          appendText(lt, lt + 1)
          i = lt + 1
        }
      }
    }
    root
  }

  /** End index of the tag's '>' honoring quoted attribute values. */
  private def findTagEnd(s: String, lt: Int): Int = {
    var i = lt + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  private def parseTag(body: String): (String, Seq[(String, String)]) = {
    var i = 0
    val n = body.length
    while (i < n && !body.charAt(i).isWhitespace) i += 1
    val tag = body.substring(0, i).toLowerCase
    val attrs = Seq.newBuilder[(String, String)]
    while (i < n) {
      while (i < n && body.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val keyStart = i
        while (i < n && body.charAt(i) != '=' && !body.charAt(i).isWhitespace) i += 1
        val key = body.substring(keyStart, i).toLowerCase
        var j = i
        while (j < n && body.charAt(j).isWhitespace) j += 1
        if (j < n && body.charAt(j) == '=') {
          j += 1
          while (j < n && body.charAt(j).isWhitespace) j += 1
          if (j < n && (body.charAt(j) == '"' || body.charAt(j) == '\'')) {
            val q = body.charAt(j)
            val vStart = j + 1
            var k = vStart
            while (k < n && body.charAt(k) != q) k += 1
            if (key.nonEmpty) attrs += key -> decodeEntities(body.substring(vStart, k), inAttr = true)
            i = math.min(k + 1, n)
          } else {
            val vStart = j
            var k = vStart
            while (k < n && !body.charAt(k).isWhitespace) k += 1
            if (key.nonEmpty) attrs += key -> decodeEntities(body.substring(vStart, k), inAttr = true)
            i = k
          }
        } else {
          if (key.nonEmpty) attrs += key -> ""
          i = if (j > i) j else i
        }
      }
    }
    (tag, attrs.result())
  }
}
