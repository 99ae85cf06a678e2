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
 * attribute values at parse — the XML five + full latin-1 block +
 * common typographic names, numeric dec/hex with the HTML5
 * windows-1252 remap for C1 refs (`&#147;` is a curly quote on legacy
 * pages); a bare `&` that starts no valid reference stays literal, the
 * real-web leniency). Serialization re-escapes `&` `<` `>`
 * in text and `&` `"` in attributes (the BeautifulSoup round-trip rule —
 * without it a decoded `&lt;b&gt;` would re-parse as a real element).
 * Remaining divergence from a browser: the long tail of the ~2k-name
 * HTML5 entity table (rare Greek/math/combining names), no-semicolon
 * legacy references, the multi-step adoption agency for deeply
 * misnested formatting, and implied html/head/body synthesis.
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

  /** Named character references decoded at parse: the XML five, the
   *  full HTML latin-1 block (0xA1–0xFF, the HTML 3.2 names — by far
   *  the densest real-web cluster after the XML five), and the common
   *  typographic/symbol names (curly quotes, dashes, ellipsis, bullets,
   *  arrows, legal marks, euro). The full HTML5 table is ~2k names;
   *  everything beyond this set (rare Greek, combining marks, the
   *  no-semicolon legacy forms) stays a documented divergence —
   *  semicolon-terminated references only, a bare `&` or unknown name
   *  stays literal. */
  private val NamedEntities: Map[String, String] = {
    val xml = Map(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      // nbsp decodes to a PLAIN space, not U+00A0: the reference decodes to
      // \xa0 but Python's whitespace normalization folds \xa0 to ' ' (str
      // .split()/\s are Unicode-aware), while java \s is ASCII-only — going
      // straight to ' ' yields the reference-equal FINAL text without
      // widening every whitespace regex downstream
      "apos" -> "'", "nbsp" -> " ")
    // HTML 3.2 latin-1 names for 0xA1..0xFF in codepoint order (nbsp
    // 0xA0 is special-cased above)
    val latin1Names = Seq(
      "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect", "uml",
      "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
      "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
      "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34",
      "iquest", "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring",
      "AElig", "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave",
      "Iacute", "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute",
      "Ocirc", "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute",
      "Ucirc", "Uuml", "Yacute", "THORN", "szlig", "agrave", "aacute",
      "acirc", "atilde", "auml", "aring", "aelig", "ccedil", "egrave",
      "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
      "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml",
      "divide", "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute",
      "thorn", "yuml")
    val latin1 = latin1Names.zipWithIndex.map {
      case (name, i) => name -> (0xA1 + i).toChar.toString
    }.toMap
    val typographic = Map(
      "ndash" -> "–", "mdash" -> "—", "horbar" -> "―",
      "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
      "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
      "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•",
      "hellip" -> "…", "permil" -> "‰", "prime" -> "′",
      "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
      "oline" -> "‾", "frasl" -> "⁄", "euro" -> "€",
      "trade" -> "™", "minus" -> "−", "infin" -> "∞",
      "ne" -> "≠", "le" -> "≤", "ge" -> "≥",
      "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
      "darr" -> "↓", "harr" -> "↔",
      "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š",
      "scaron" -> "š", "Yuml" -> "Ÿ", "fnof" -> "ƒ",
      "circ" -> "ˆ", "tilde" -> "˜",
      // Unicode-whitespace entities fold to plain space under the nbsp
      // rule (Python \s folds U+2002/3/9; java ASCII \s does not).
      // zwnj/zwj/lrm/rlm are FORMAT chars, not whitespace, in both
      // engines - they pass through as themselves.
      "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
      "zwnj" -> "‌", "zwj" -> "‍", "lrm" -> "‎",
      "rlm" -> "‏")
    xml ++ latin1 ++ typographic
  }

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
   *  literal (bare ampersands are everywhere on the real web). */
  private[functions] def decodeEntities(s: String): String = {
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
        var j = amp + 1
        // letters then optional digits (sup2, frac12, Dagger): HTML names
        // are alphanumeric, always letter-first
        while (j < n && j - amp <= 8 && s.charAt(j).isLetterOrDigit) j += 1
        if (j < n && s.charAt(j) == ';')
          NamedEntities.get(s.substring(amp + 1, j)).foreach { r =>
            sb.append(r); consumed = j + 1 - amp
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
            // Formatting elements the pop passes over are REOPENED at the
            // new insertion point (one-step adoption agency): in
            // `<b>a<i>b</b>c</i>` the </b> pops over the open <i>, and a
            // fresh <i> reopens so `c` lands inside it, like a browser.
            var p = cur
            while (p != null && p.name != tag) p = p.parent
            if (p != null) {
              val reopen = mutable.ArrayBuffer.empty[Elem]
              var q = cur
              while (q ne p) {
                if (FormattingElements.contains(q.name)) reopen += q
                q = q.parent
              }
              cur = if (p.parent != null) p.parent else root
              reopen.reverseIterator.foreach { f =>
                val ne = new Elem(f.name)
                f.attrs.foreach { case (k, v) => ne.attrs(k) = v }
                ne.parent = cur; cur.children += ne; cur = ne
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
            if (key.nonEmpty) attrs += key -> decodeEntities(body.substring(vStart, k))
            i = math.min(k + 1, n)
          } else {
            val vStart = j
            var k = vStart
            while (k < n && !body.charAt(k).isWhitespace) k += 1
            if (key.nonEmpty) attrs += key -> decodeEntities(body.substring(vStart, k))
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
