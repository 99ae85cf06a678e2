package graft.functions

import java.util.regex.Pattern
import scala.collection.mutable
import graft.functions.Html.{Elem, Node, Text}

/**
 * Deterministic HTML→article extraction: a faithful Scala re-expression of
 * the reference pipeline (preprocess regex cleanup + the Arc90
 * "readability" candidate-scoring algorithm).
 *
 * Reference semantics carried (file:line in /root/reference):
 *  - cruft regexes, attribute stripping, title/body split:
 *    cola/core/extractor/preprocess.py:42-74,102-136
 *  - unlikely-candidate removal, div→p transform, paragraph scoring with
 *    CJK comma handling, link-density scaling, best-candidate + sibling
 *    assembly, conditional sanitize, ruthless→safe retry at 250 chars:
 *    cola/core/extractor/readability.py:38-372
 *
 * Output contract (the byte-identical golden surface, BASELINE.json
 * input_hint): `extractText(html, url)` = normalized title + '\n' +
 * whitespace-normalized text of the sanitized article. Pure function:
 * no IO, no clock, no randomness.
 */
object Extract extends Serializable {

  val TextLengthThreshold = 25
  val RetryLength = 250

  // ---- preprocess.py:42-61 dodgy regexes (literal port) ----
  private val ReScript = Pattern.compile("(?si)<script.*?</script[^>]*>")
  private val ReDoubleQuoted = Pattern.compile("(=\"[^\"]+\")\"+")
  private val ReUnclosedTag = Pattern.compile("(<[a-zA-Z]+[^>]*)(<[a-zA-Z]+[^<>]*>)")
  private val ReUnclosedNumAttr = Pattern.compile("(<[^>]*[a-zA-Z]+\\s*=\\s*\"[0-9]+)( [a-zA-Z]+=\"\\w+\"|/?>)")
  private val ReComment = Pattern.compile("(?s)<!--[^-]+-->")

  // preprocess.py:64-74 nuisance-attribute stripper
  private val HtmlStrip = Pattern.compile(
    "<([^>]+) (?:width|height|style|[-a-z]*color|background[-a-z]*) *= *" +
      "(?:[^ \"'>]+|'[^']+'|\"[^\"]+\")([^>]*)>",
    Pattern.CASE_INSENSITIVE)

  // ---- readability.py:38-50 REGEXES (the ones the algorithm uses) ----
  private val UnlikelyCandidates = Pattern.compile(
    "combx|comment|disqus|foot|header|menu|meta|nav|rss|shoutbox|sidebar|aside|sponsor",
    Pattern.CASE_INSENSITIVE)
  private val OkMaybeCandidate = Pattern.compile("and|article|body|column|main", Pattern.CASE_INSENSITIVE)
  private val Positive = Pattern.compile(
    "article|body|content|entry|hentry|page|pagination|post|text", Pattern.CASE_INSENSITIVE)
  private val Negative = Pattern.compile(
    "combx|comment|contact|foot|footer|footnote|link|media|meta|promo|related|scroll|shoutbox|sponsor|tags|widget",
    Pattern.CASE_INSENSITIVE)
  private val DivToPElements = Pattern.compile(
    "<(a|blockquote|dl|div|img|ol|p|pre|table|ul)", Pattern.CASE_INSENSITIVE)
  // readability.py:206,292 comma split incl. CJK fullwidth comma
  private val CommaSplit = Pattern.compile(",|\uFF0C")
  private val SentenceEnd = Pattern.compile("\\.( |$)")

  private def reSub(p: Pattern, s: String, repl: String): String = p.matcher(s).replaceAll(repl)

  /** preprocess.py:85-88 — hack around lousy html before parsing. */
  private[functions] def removeCruftyHtml(html: String): String = {
    var h = html
    h = reSub(ReScript, h, "")
    h = reSub(ReDoubleQuoted, h, "$1")
    h = reSub(ReUnclosedTag, h, "$1>$2")
    h = reSub(ReUnclosedNumAttr, h, "$1\"$2")
    h = reSub(ReComment, h, "")
    h
  }

  /** preprocess.py:113-116 — strip width/height/style/color/background attrs. */
  private[functions] def cleanAttributes(html: String): String = {
    var h = html
    while (HtmlStrip.matcher(h).find()) h = HtmlStrip.matcher(h).replaceAll("<$1$2>")
    h
  }

  // (?U): the reference normalizes with Python str.split(), which is
  // Unicode-whitespace-aware — java's default \s is ASCII-only and would
  // leave a raw U+2002/U+3000 (or a decoded &#8194;) in the final text
  private def normalizeSpace(s: String): String =
    s.split("(?U)\\s+").filter(_.nonEmpty).mkString(" ")

  /** preprocess.py:125-136 — returns (title, body-soup). */
  private[functions] def preprocess(html: String, baseUrl: String): (String, Elem) = {
    val cleanedHtml = removeCruftyHtml(html)
    // lxml-shape parity (utils.py:102): a page with no declared <body>
    // still yields head>title and a real body element, so the title
    // lookup and the `body or soup` fallback below behave like BS4-lxml
    val soup = Html.implySections(Html.parse(cleanedHtml))
    if (baseUrl != null) {
      soup.findAll("a").foreach(a => a.attr("href").foreach(h => a.attrs("href") = UrlCanon.resolve(h, baseUrl)))
      soup.findAll("img").foreach(im => im.attr("src").foreach(s => im.attrs("src") = UrlCanon.resolve(s, baseUrl)))
    }
    val title = (for (head <- soup.find("head"); t <- head.find("title")) yield normalizeSpace(t.text)).getOrElse("")
    soup.findAll("script", "link", "style").foreach(_.extract())
    val rawBody = soup.find("body").getOrElse(soup).render
    val body = Html.parse(cleanAttributes(rawBody))
    (title, body)
  }

  private def classAndId(e: Elem): (String, String) =
    (e.attr("class").getOrElse(""), e.attr("id").getOrElse(""))

  /** readability.py:126-135 */
  private def removeUnlikelyCandidates(doc: Elem): Unit = {
    doc.findAllElems.foreach { e =>
      val (cls, id) = classAndId(e)
      val s = e.name + cls + id
      if (UnlikelyCandidates.matcher(s).find() && !OkMaybeCandidate.matcher(s).find() && e.name != "body")
        e.extract()
    }
  }

  /** readability.py:137-141 */
  private def transformMisusedDivsIntoP(doc: Elem): Unit = {
    doc.findAll("div").foreach { d =>
      val inner = d.children.map(_.render).mkString
      if (!DivToPElements.matcher(inner).find()) d.name = "p"
    }
  }

  /** readability.py:143-146 */
  private def linkDensity(e: Elem): Double = {
    val linkLen = e.findAll("a").map(_.text.length).sum
    val textLen = e.text.length
    linkLen.toDouble / math.max(textLen, 1)
  }

  /** readability.py:148-166 */
  private def weightNode(e: Elem): Int = {
    var w = 0
    val cls = e.attr("class").getOrElse("")
    if (cls.nonEmpty) {
      if (Negative.matcher(cls).find()) w -= 25
      if (Positive.matcher(cls).find()) w += 25
    }
    val id = e.attr("id").getOrElse("")
    if (id.nonEmpty) {
      if (Negative.matcher(id).find()) w -= 25
      if (Positive.matcher(id).find()) w += 25
    }
    w
  }

  /** readability.py:168-179 */
  private def scoreNode(e: Elem): Double = {
    var score = weightNode(e).toDouble
    e.name match {
      case "div" | "article" => score += 5
      case "blockquote" => score += 3
      case "form" => score -= 3
      case "th" => score -= 5
      case _ =>
    }
    score
  }

  private def commaParts(s: String): Int = CommaSplit.split(s, -1).length

  /** readability.py:181-219 — insertion order preserved (document order). */
  private def scoreParagraphs(doc: Elem, minTextLength: Int): mutable.LinkedHashMap[Elem, Double] = {
    val candidates = mutable.LinkedHashMap.empty[Elem, Double]
    doc.findAll("p", "td").foreach { elem =>
      val parent = elem.parent
      if (parent != null) {
        val grand = parent.parent
        val innerText = elem.text
        if (innerText.length >= minTextLength) {
          if (!candidates.contains(parent)) candidates(parent) = scoreNode(parent)
          if (grand != null && !candidates.contains(grand)) candidates(grand) = scoreNode(grand)
          var contentScore = 1.0
          contentScore += commaParts(innerText)
          contentScore += math.min(innerText.length / 100, 3) // Py2 int division
          candidates(parent) += contentScore
          if (grand != null) candidates(grand) += contentScore / 2.0
        }
      }
    }
    // readability.py:213-217 — scale by link density
    candidates.keys.toSeq.foreach { e => candidates(e) *= (1 - linkDensity(e)) }
    candidates
  }

  /** readability.py:221-236 — stable sort keeps document order among ties. */
  private def selectBestCandidate(candidates: mutable.LinkedHashMap[Elem, Double]): Option[Elem] = {
    if (candidates.isEmpty) None
    else Some(candidates.toSeq.sortBy { case (_, s) => -s }.head._1)
  }

  /** readability.py:238-267 — assemble article from best candidate + qualifying siblings. */
  private def getArticle(candidates: mutable.LinkedHashMap[Elem, Double], best: Elem): Elem = {
    val threshold = math.max(10.0, candidates(best) * 0.2)
    val output = new Elem("div")
    val parent = best.parent
    val siblings: Seq[Node] =
      if (parent != null) parent.children.toVector else Vector(best)
    siblings.foreach {
      case _: Text => // NavigableString skipped (readability.py:245)
      case sib: Elem =>
        var append = sib eq best
        if (!append && candidates.get(sib).exists(_ >= threshold)) append = true
        if (!append && sib.name == "p") {
          val ld = linkDensity(sib)
          val nodeContent = sib.stringValue.getOrElse("")
          val len = nodeContent.length
          if (len > 80 && ld < 0.25) append = true
          else if (len < 80 && ld == 0.0 && SentenceEnd.matcher(nodeContent).find()) append = true
        }
        if (append) output.append(sib)
    }
    output
  }

  /** readability.py:269-334 */
  private def sanitize(node: Elem, candidates: mutable.LinkedHashMap[Elem, Double], minTextLength: Int): Elem = {
    node.findAll("h1", "h2", "h3", "h4", "h5", "h6").foreach { h =>
      if (weightNode(h) < 0 || linkDensity(h) > 0.33) h.extract()
    }
    node.findAll("form", "iframe").foreach(_.extract())

    node.findAll("table", "ul", "div").foreach { el =>
      if (el.parent != null) { // may already be detached by an earlier removal
        val weight = weightNode(el)
        val contentScore = candidates.getOrElse(el, 0.0)
        if (weight + contentScore < 0) el.extract()
        else if (commaParts(el.text) < 10) {
          val counts = mutable.Map.empty[String, Int]
          Seq("p", "img", "li", "a", "embed", "input").foreach(k => counts(k) = el.findAll(k).length)
          counts("li") -= 100
          val contentLength = el.text.length
          val ld = linkDensity(el)
          val toRemove =
            if (counts("img") > counts("p")) true
            else if (counts("li") > counts("p") && el.name != "ul" && el.name != "ol") true
            else if (counts("input") > counts("p") / 3) true
            else if (contentLength < minTextLength && (counts("img") == 0 || counts("img") > 2)) true
            else if (weight < 25 && ld > 0.2) true
            else if (weight >= 25 && ld > 0.5) true
            else if ((counts("embed") == 1 && contentLength < 75) || counts("embed") > 1) true
            else false
          if (toRemove) el.extract()
        }
      }
    }
    // readability.py:330-332 — attributes cleared on output
    (node +: node.findAllElems).foreach(_.attrs.clear())
    node
  }

  /** Full extraction returning (title, articleNode) — readability.py:336-367. */
  private[functions] def extractArticle(html: String, baseUrl: String): (String, Elem) = {
    var ruthless = true
    while (true) {
      val (title, doc) = preprocess(html, baseUrl)
      doc.findAll("script", "style").foreach(_.extract())
      if (ruthless) removeUnlikelyCandidates(doc)
      transformMisusedDivsIntoP(doc)
      val candidates = scoreParagraphs(doc, TextLengthThreshold)
      val best = selectBestCandidate(candidates)
      best match {
        case Some(b) =>
          val article = getArticle(candidates, b)
          val cleaned = sanitize(article, candidates, TextLengthThreshold)
          val ok = cleaned.render.length >= RetryLength
          if (ruthless && !ok) { ruthless = false } // retry safe
          else return (title, cleaned)
        case None =>
          if (ruthless) { ruthless = false } // readability.py:352-356
          else {
            val article = doc.find("body").getOrElse(doc)
            return (title, sanitize(article, candidates, TextLengthThreshold))
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The golden surface: title + '\n' + whitespace-normalized article text. */
  def extractText(html: String, baseUrl: String): String = {
    if (html == null) return null
    val (title, article) = extractArticle(html, baseUrl)
    val body = normalizeSpace(article.text)
    if (title.isEmpty) body else if (body.isEmpty) title else title + "\n" + body
  }

  /** X3 charset sniffing (lab/generic/__init__.py:99-103: chardet detect,
   *  re-encode when confidence > 0.5) — a deterministic chardet-lite:
   *
   *  1. strict UTF-8 validity scan (incl. pure ASCII) → "utf-8";
   *  1.5. (r5) Cyrillic gate — distributional, BEFORE the CJK tier
   *     (even-run Cyrillic pairs strictly decode as plausible hanzi
   *     under GBK): ≥ 16 decoded Cyrillic-block chars at ≥ 95% of the
   *     non-ASCII chars with a high-byte run ≥ 4 (Russian words are
   *     all-Cyrillic runs; accented latin sits isolated). The gate then
   *     DISAMBIGUATES windows-1251 / KOI8-R / ISO-8859-5 by a
   *     common-lowercase-letter frequency score (chardet's Cyrillic
   *     language-model move): all three map high bytes into U+04xx, but
   *     only the true charset decodes case-correct common letters;
   *  2. else score each CJK candidate charset (GBK, Big5, Shift_JIS,
   *     EUC-JP, EUC-KR —
   *     the same family chardet splits with its frequency models): the
   *     bytes must strictly decode, ≥ half the decoded non-ASCII chars
   *     must be CJK-ish (the confidence>0.5 gate), and structural
   *     evidence must exist —
   *       - paired shape: every maximal run of high (≥0x80) bytes has
   *         even length with ≥ 2 such runs AND ≥ 3 decoded CJK chars
   *         (latin-1 accents sit isolated — odd runs; and one adjacent
   *         accent pair like 'üß' decoding to a lone hanzi is not
   *         evidence, it is the windows-1252 prior), or
   *       - overwhelming: ≥ 8 STRONG CJK chars (ideographs/full kana/CJK
   *         punctuation — halfwidth katakana are excluded: ANY single
   *         high byte 0xA1-0xDF decodes to one under SJIS, so they are
   *         near-zero evidence) at ≥ 90% of non-ASCII, AND at least one
   *         run of ≥ 2 high bytes (isolated accents each followed by an
   *         ASCII letter decode as plausible lead+trail pairs under
   *         GBK — accent-heavy latin-1 text would otherwise pass; real
   *         double-byte text always has some high-high character). This
   *         covers GBK/Big5/SJIS chars with ASCII-range trail bytes,
   *         which break run parity. Or,
   *       - (Shift_JIS/EUC-JP) ≥ 3 kana at ≥ 1/3 of the non-ASCII chars —
   *         real Japanese text is kana-dominant, while the WRONG charset
   *         decoding random double-byte pairs lands in the kana block
   *         only occasionally; SJIS's single-byte katakana breaks run
   *         parity by design, hence its own gate. Likewise (EUC-KR)
   *         ≥ 3 hangul at ≥ 1/3 — Korean text is hangul-dominant. The
   *         one systematic tie (kana-dominant EUC-JP bytes decode
   *         identically under GBK — GB2312 rows 4/5 are the kana rows)
   *         resolves to EUC-JP by candidate order; see the code comment.
   *     Among the passing candidates the winner has the highest
   *     frequency score: each decoded CJK-ish char counts 1, plus 3 for
   *     membership in a ~150-char top-frequency table (common simplified
   *     hanzi / traditional hanzi / all kana) — a miniaturized version
   *     of chardet's language models: the WRONG double-byte charset
   *     still decodes valid code points, but into rare random hanzi
   *     that miss the common table. Ties keep candidate order
   *     (GBK first — the dominant zh-web legacy charset).
   *  3. else a tier-2 Shift_JIS check for halfwidth-katakana-dominant
   *     legacy pages (halfkana are deliberately near-zero evidence in
   *     tier 1; see the gate comment in the code);
   *  4. else "windows-1252" (the web's de-facto 8-bit fallback, every
   *     byte valid — covers latin-1).
   *
   *  Pure-Scala, no detector library, no RNG — unlike chardet the result
   *  is a pure function of the bytes. Remaining divergence: chardet's
   *  full per-language byte-distribution models can split pathological
   *  cases (all-rare-hanzi text in the wrong charset) that this table
   *  cannot; such pages resolve by candidate order. */
  def sniffCharset(bytes: Array[Byte]): String = {
    if (bytes == null) return "utf-8"
    if (isValidUtf8(bytes)) return "utf-8"
    val (allEven, runCount, maxRun) = highByteRuns(bytes)
    // Tier 0.5 (r5, BEFORE the CJK candidates): KOI8-R Cyrillic pages.
    // KOI8-R is single-byte-total, so "strict decode" is no gate at all;
    // the evidence is distributional: Russian words are all-Cyrillic
    // (long high-byte runs, ≥ 4 — accented latin sits isolated) and
    // KOI8-R puts its letters in 0xC0-0xFF (+ ё at 0xA3/0xB3), so ≥ 95%
    // of the decoded non-ASCII chars landing in the Cyrillic block with
    // ≥ 16 of them is the KOI8-R shape. It must run before the CJK tier:
    // even-run Cyrillic byte pairs strictly decode as plausible hanzi
    // under GBK (chardet resolves the same ambiguity with its Cyrillic
    // model). Mixed CJK bytes fail the ratio (their 0xA1-0xBF bytes
    // decode to KOI8-R box-drawing symbols, not letters).
    if (maxRun >= 4) {
      val (cyr, _, nonA) = cyrStats(bytes, "KOI8-R")
      if (cyr >= 16 && cyr * 20 >= nonA * 19) {
        // The gate trips for ANY single-byte Cyrillic page: KOI8-R,
        // windows-1251 and ISO-8859-5 all map the high bytes into the
        // U+04xx block, just with shuffled identities and flipped case
        // (cp1251's lowercase 0xE0-0xFF is KOI8-R's UPPERcase row).
        // Disambiguate chardet-style with a frequency model: real
        // Russian text is lowercase-dominant and ~3/4 of its letters
        // come from the top-frequency set, while the WRONG charset's
        // decode scrambles identities and case so its common-lowercase
        // count collapses to near-chance. windows-1251 leads the
        // candidate order (the dominant Cyrillic web charset wins
        // exact ties).
        return Seq("windows-1251", "KOI8-R", "ISO-8859-5").map { cs =>
          val (_, common, _) = cyrStats(bytes, cs)
          cs -> common
        }.maxBy(_._2)._1 // maxBy keeps the FIRST max → candidate-order ties
      }
    }
    // Candidate order is the tie-break (score ties keep the FIRST).
    // EUC-JP leads because of the one SYSTEMATIC tie: kana-dominant
    // EUC-JP text decodes byte-identically under GBK (GB2312 rows 4/5
    // ARE the kana rows at the same positions), so both candidates can
    // score equal — and kana-dominant content is Japanese, while a real
    // GB2312 page never ties (its common-hanzi hits out-score EUC-JP's
    // random-kanji decode, which also cannot manufacture kana from
    // hanzi rows). GBK precedes Big5 (the dominant zh-web legacy
    // charset splits from Big5 by the frequency tables, spec-pinned).
    val scored = Seq("EUC-JP", "GBK", "Big5", "Shift_JIS", "EUC-KR").flatMap { cs =>
      decodeCjkStats(bytes, cs).collect {
        case st if st.cjkish * 2 >= st.nonAscii && (
            (st.strong >= 8 && st.cjkish * 10 >= st.nonAscii * 9 && maxRun >= 2) ||
            (allEven && runCount >= 2 && st.strong >= 3) ||
            ((cs == "Shift_JIS" || cs == "EUC-JP") &&
              st.kana >= 3 && st.kana * 3 >= st.nonAscii) ||
            (cs == "EUC-KR" && st.hangul >= 3 && st.hangul * 3 >= st.nonAscii)) =>
          // kana/hangul are "common" only when DOMINANT (real Japanese /
          // Korean): a wrong double-byte decode scatters a few chars
          // into those blocks, and they must not outvote a hanzi rival
          val kanaCommon = if (st.kana * 3 >= st.nonAscii) st.kana else 0
          val hangulCommon = if (st.hangul * 3 >= st.nonAscii) st.hangul else 0
          cs -> (st.cjkish + 3 * (st.common + kanaCommon + hangulCommon))
      }
    }
    if (scored.nonEmpty)
      scored.maxBy(_._2)._1 // maxBy keeps the FIRST max → candidate-order ties
    else {
      // Tier 2 (no tier-1 candidate passed): halfwidth-katakana-dominant
      // legacy SJIS pages. Halfkana are near-zero evidence in tier 1 (ANY
      // single 0xA1-0xDF byte decodes to one), so a genuinely halfkana
      // page needs its own gate: overwhelming halfkana purity AND a run
      // of ≥ 4 consecutive high bytes (kana words are multi-byte runs;
      // latin-1 accents sit isolated or in short clusters — ≥ 4
      // consecutive accent LETTERS don't occur in real words).
      val halfKanaPage = decodeCjkStats(bytes, "Shift_JIS").exists { st =>
        val halfKana = st.cjkish - st.strong
        halfKana >= 16 && halfKana * 20 >= st.nonAscii * 19 && maxRun >= 4
      }
      if (halfKanaPage) "Shift_JIS" else "windows-1252"
    }
  }

  /** Top-frequency CJK table (chardet-language-model-lite): common
   *  simplified hanzi, common traditional hanzi (incl. the distinct
   *  forms 們/這/國/... that split zh-CN from zh-TW), and kana handled
   *  as a block in [[decodeCjkStats]]. */
  private val CommonHanzi: Set[Char] =
    ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之" +
     "过家学对可她里后小么心多天而能好都然没日于起还发成事只作当想看文无开手用主行方又如前所" +
     "数据网络系统分析调度队列爬虫" +
     "們這國說時對會學來長發當經動問開關門見實體與點樣現內無後頭應該裡為個" +
     "網路爬蟲調度佇列資料係統傳統繁體").toSet

  private def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if (b >= 0xc2 && b <= 0xdf) 2
        else if (b >= 0xe0 && b <= 0xef) 3
        else if (b >= 0xf0 && b <= 0xf4) 4
        else return false
      if (i + len > n) return false
      var j = 1
      while (j < len) {
        if ((bytes(i + j) & 0xc0) != 0x80) return false
        j += 1
      }
      i += len
    }
    true
  }

  /** (every maximal run of bytes ≥ 0x80 has even length, run count, max
   *  run length). Even paired runs are the double-byte-charset shape; a
   *  max run of 1 means every high byte sits isolated between ASCII —
   *  the latin-1 accent shape, never real double-byte text. */
  private def highByteRuns(bytes: Array[Byte]): (Boolean, Int, Int) = {
    var i = 0
    val n = bytes.length
    var runs = 0
    var allEven = true
    var maxRun = 0
    while (i < n) {
      if ((bytes(i) & 0x80) != 0) {
        var j = i
        while (j < n && (bytes(j) & 0x80) != 0) j += 1
        if (((j - i) & 1) != 0) allEven = false
        if (j - i > maxRun) maxRun = j - i
        runs += 1
        i = j
      } else i += 1
    }
    (allEven && runs > 0, runs, maxRun)
  }

  /** KOI8-R distribution probe: (decoded chars in the Cyrillic block,
   *  decoded non-ASCII chars). KOI8-R maps all 256 bytes, so the decode
   *  is total by construction. */
  /** Top-frequency LOWERCASE Russian letters (~75% of running text);
   *  the Cyrillic analogue of [[CommonHanzi]]. Scoring the decoded text
   *  against this set is what splits KOI8-R from windows-1251 from
   *  ISO-8859-5 — the wrong single-byte Cyrillic decode flips case and
   *  scrambles identities, so only the true charset scores high. */
  private val CommonCyrLower: Set[Char] = "оеаинтсрвлкмдпуяыьгзб".toSet

  /** (cyrillic chars, common-lowercase hits, non-ASCII chars) of the
   *  bytes decoded under `charset`. */
  private def cyrStats(bytes: Array[Byte], charset: String): (Int, Int, Int) = {
    val s = new String(bytes, java.nio.charset.Charset.forName(charset))
    var cyr = 0
    var common = 0
    var nonAscii = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80) {
        nonAscii += 1
        if (c >= 0x0400 && c <= 0x04FF) {
          cyr += 1
          if (CommonCyrLower.contains(c)) common += 1
        }
      }
      i += 1
    }
    (cyr, common, nonAscii)
  }

  private case class CjkStats(cjkish: Int, strong: Int, kana: Int,
    hangul: Int, common: Int, nonAscii: Int)

  /** Strict decode + classification; None on any malformed/unmappable
   *  sequence or when nothing non-ASCII was decoded. cjkish counts
   *  ideographs, kana, CJK punctuation and fullwidth forms; `common`
   *  counts hits in the hanzi top-frequency table; kana are tallied
   *  separately (they count as common only when kana-dominant — see
   *  [[sniffCharset]]). */
  private def decodeCjkStats(bytes: Array[Byte], charset: String): Option[CjkStats] = {
    val dec = java.nio.charset.Charset.forName(charset).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val decoded =
      try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    var cjkish = 0
    var strong = 0
    var kana = 0
    var hangul = 0
    var common = 0
    var nonAscii = 0
    var i = 0
    while (i < decoded.length) {
      val c = decoded.charAt(i)
      if (c >= 0x80) {
        nonAscii += 1
        val isKana = c >= 0x3040 && c <= 0x30ff
        // halfwidth katakana: what ANY single 0xA1-0xDF byte decodes to
        // under SJIS — counted toward the confidence ratio but never as
        // STRONG evidence (see the sniffCharset scaladoc)
        val isHalfKana = c >= 0xff61 && c <= 0xff9f
        // hangul SYLLABLES only (EUC-KR evidence): real Korean text is
        // syllable blocks. Compatibility/conjoining JAMO are the hangul
        // analogue of halfwidth katakana — KS X 1001 row 4 is the jamo
        // row at the SAME positions GB2312/JIS put kana, so a wrong
        // EUC-KR decode of kana bytes lands exactly there; jamo count
        // toward the confidence ratio but never as strong/hangul evidence
        val isHangul = c >= 0xac00 && c <= 0xd7a3
        val isJamo = (c >= 0x3130 && c <= 0x318f) || (c >= 0x1100 && c <= 0x11ff)
        val isCjk = (c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3000 && c <= 0x303f) ||
          (c >= 0xff00 && c <= 0xffef) || isKana || isHangul || isJamo
        if (isCjk) cjkish += 1
        if (isCjk && !isHalfKana && !isJamo) strong += 1
        if (isKana) kana += 1
        if (isHangul) hangul += 1
        if (!isKana && CommonHanzi.contains(c)) common += 1
      }
      i += 1
    }
    if (nonAscii == 0) None
    else Some(CjkStats(cjkish, strong, kana, hangul, common, nonAscii))
  }

  /** Decode with the sniffed charset (X3). */
  def decodeHtml(bytes: Array[Byte]): String =
    if (bytes == null) null
    else new String(bytes, java.nio.charset.Charset.forName(sniffCharset(bytes)))

  def extractText(html: Array[Byte], baseUrl: String): String =
    if (html == null) null
    else extractText(decodeHtml(html), baseUrl)

  /** Outlink extraction (F1): hrefs of <a> in document order, resolved
   *  against the base URL (executor _parse → wiki parser semantics,
   *  cola/job/executor.py:308-317, app/wiki/__init__.py:122-149). */
  def extractOutlinks(html: String, baseUrl: String): Seq[String] =
    extractAnchors(html, baseUrl).map(_._1)

  def extractOutlinks(html: Array[Byte], baseUrl: String): Seq[String] =
    if (html == null) Seq.empty
    else extractOutlinks(decodeHtml(html), baseUrl)

  /** Outlinks WITH their anchor text: (resolved href, whitespace-
   *  normalized inner text of the <a>), document order. The anchor is
   *  the element's full descendant text (entities decoded by the parser,
   *  nested markup flattened), runs of whitespace collapsed to one space
   *  and trimmed — the normalization the anchor-corpus aggregation keys
   *  on (LinkGraph.anchorSummary). href-less <a> are skipped like in
   *  extractOutlinks. */
  def extractAnchors(html: String, baseUrl: String): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    val soup = Html.parse(removeCruftyHtml(html))
    soup.findAll("a").flatMap { a =>
      a.attr("href").map { h =>
        (UrlCanon.resolve(h, baseUrl),
          a.text.replaceAll("\\s+", " ").trim)
      }
    }.filter(_._1.nonEmpty).toSeq
  }

  def extractAnchors(html: Array[Byte], baseUrl: String): Seq[(String, String)] =
    if (html == null) Seq.empty
    else extractAnchors(decodeHtml(html), baseUrl)
}
