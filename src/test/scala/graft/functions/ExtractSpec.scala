package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Fixtures

/** Byte-identical golden checks for the extraction surface
  * (BASELINE.json input_hint per-row invariant). Goldens are frozen
  * under src/test/resources/golden/extract — see graft.tools.GenGolden. */
class ExtractSpec extends AnyFunSuite {

  private val goldenDir = Paths.get("src/test/resources/golden/extract")
  private val V = 1000L

  test("extractText matches frozen goldens byte-for-byte") {
    val files = Files.list(goldenDir).toArray.map(_.toString).filter(_.endsWith(".txt"))
    assert(files.length >= 40, "golden corpus too small")
    files.foreach { f =>
      val id = Paths.get(f).getFileName.toString.stripSuffix(".txt").toLong
      val expected = new String(Files.readAllBytes(Paths.get(f)), StandardCharsets.UTF_8)
      val actual = Fixtures.textFor(id, V)
      assert(actual == expected, s"extract drift for page id=$id")
    }
  }

  test("binary (input_hint html BINARY) and string inputs agree") {
    val id = 5L
    val html = Fixtures.htmlFor(id, V)
    assert(Extract.extractText(html.getBytes(StandardCharsets.UTF_8), Fixtures.canonUrl(id))
      == Extract.extractText(html, Fixtures.canonUrl(id)))
  }

  test("unlikely candidates (nav/sidebar/footer) are excluded from article text") {
    val txt = Fixtures.textFor(3L, V)
    assert(!txt.contains("ad one"))
    assert(!txt.contains("Copyright footer"))
    assert(!txt.contains("About"))
    assert(txt.contains("Heading 3"))
  }

  test("zh pages score via the fullwidth-comma path (readability.py:206)") {
    val txt = Fixtures.textFor(10L, V)
    assert(Fixtures.lang(10L) == "zh")
    assert(txt.contains("，"))
    assert(txt.length > Extract.RetryLength)
  }

  test("tiny pages hit the ruthless→safe retry and degrade to title") {
    val txt = Fixtures.textFor(97L, V)
    assert(txt == "Page 97")
  }

  test("preprocess strips scripts, styles and comments") {
    val (_, body) = Extract.preprocess(
      "<html><head><title>t</title></head><body><script>bad()</script>" +
        "<style>.x{}</style><!-- hidden comment --><p>keep this text here</p></body></html>", null)
    val txt = body.text
    assert(!txt.contains("bad()"))
    assert(!txt.contains("hidden"))
    assert(txt.contains("keep this text here"))
  }

  test("preprocess absolutizes links against base url (preprocess.py:90-100)") {
    val (_, body) = Extract.preprocess(
      """<html><body><a href="/x">l</a><img src="i.png"/></body></html>""",
      "http://h.com/a/b")
    assert(body.find("a").get.attr("href").contains("http://h.com/x"))
    assert(body.find("img").get.attr("src").contains("http://h.com/a/i.png"))
  }

  test("nuisance attributes stripped (preprocess.py:64-74)") {
    assert(Extract.cleanAttributes("""<div width="5" class="k"><p style='x' color=red>t</p></div>""")
      == """<div class="k"><p>t</p></div>""")
  }

  test("extractOutlinks returns resolved hrefs in document order") {
    val links = Extract.extractOutlinks(Fixtures.htmlFor(1L, V), Fixtures.canonUrl(1L))
    assert(links.head == "http://host0.example.com/p/1#self")
    assert(links.forall(_.startsWith("http://")))
  }

  test("charset sniffing (X3): UTF-8, GBK and latin-1 pages detected deterministically") {
    import java.nio.charset.StandardCharsets
    assert(Extract.sniffCharset("plain ascii".getBytes(StandardCharsets.US_ASCII)) == "utf-8")
    assert(Extract.sniffCharset("héllo — ü 中文".getBytes(StandardCharsets.UTF_8)) == "utf-8")
    // latin-1 / windows-1252: accented letters isolated inside ASCII words
    // (odd high-byte runs) \u2014 must NOT be claimed by the GBK detector
    val latin1 = "caf\u00e9 na\u00efve r\u00e9sum\u00e9".getBytes(StandardCharsets.ISO_8859_1)
    assert(Extract.sniffCharset(latin1) == "windows-1252")
    assert(Extract.decodeHtml(latin1) == "caf\u00e9 na\u00efve r\u00e9sum\u00e9")
    // a real GBK page body: Chinese sentence with ASCII mixed in
    val gbkText = "\u7f51\u7edc\u722c\u866b\u7684\u8c03\u5ea6\u961f\u5217 crawler \u6570\u636e\u5206\u6790\u7cfb\u7edf\u3002"
    val gbk = gbkText.getBytes(java.nio.charset.Charset.forName("GBK"))
    assert(Extract.sniffCharset(gbk) == "GBK")
    assert(Extract.decodeHtml(gbk) == gbkText) // round-trips through detection
    // end-to-end: a GBK-encoded HTML page extracts the same text as its
    // UTF-8 twin (the reference re-encodes after chardet, generic:99-103)
    val gbkHtml = "<html><head><title>T</title></head><body><div id='c'>" +
      (1 to 12).map(_ => gbkText).mkString("<p>", "</p><p>", "</p>") + "</div></body></html>"
    assert(Extract.extractText(gbkHtml.getBytes(java.nio.charset.Charset.forName("GBK")), "http://h/x") ==
      Extract.extractText(gbkHtml.getBytes(StandardCharsets.UTF_8), "http://h/x"))
    // GBK chars with ASCII-range trail bytes (GBK/3 region, trails
    // 0x40-0x7E) break high-byte-run parity — the strong-CJK branch
    // (≥8 CJK chars at ≥90%) must still claim them when they appear the
    // way real text carries them: MIXED among ordinary high-high hanzi
    // (ascii-trail chars are the rare extension region; a run of ≥2 high
    // bytes somewhere in the page is what separates this shape from
    // accent-heavy latin-1, whose high bytes are ALL isolated)
    val gbkCs = java.nio.charset.Charset.forName("GBK")
    val asciiTrail = (0x4E00 to 0x4FFF).map(_.toChar).filter { c =>
      val b = c.toString.getBytes(gbkCs)
      b.length == 2 && (b(1) & 0x80) == 0 && b(0) != '?'.toByte
    }.take(12)
    assert(asciiTrail.size >= 8, "JDK GBK table should contain ascii-trail hanzi")
    val tricky = asciiTrail.mkString + "的一 with ascii words"
    assert(Extract.sniffCharset(tricky.getBytes(gbkCs)) == "GBK")
    assert(Extract.decodeHtml(tricky.getBytes(gbkCs)) == tricky)
    // …but a page whose high bytes are ALL isolated (every one followed
    // by an ASCII byte — zero high-high pairs) is byte-shape-identical to
    // accent-heavy latin-1 text, which is overwhelmingly more common on
    // the web than pure-GBK/3 rare-hanzi text: the windows-1252 prior
    // wins (the r4 charset fuzz found GBK claiming accented German here)
    val allIsolated = asciiTrail.mkString
    assert(Extract.sniffCharset(allIsolated.getBytes(gbkCs)) == "windows-1252")
    // …while a halfwidth-katakana-dominant legacy SJIS page (single-byte
    // kana, so no double-byte run parity either) still detects via the
    // tier-2 gate: overwhelming halfkana purity + multi-byte kana runs
    val halfKana = "ｱｲｳｴｵ ｶｷｸｹｺ ｻｼｽｾｿ ﾀﾁﾂﾃﾄ ﾅﾆﾇﾈﾉ"
    val sjisHalf = halfKana.getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(sjisHalf.length == halfKana.length, "halfwidth kana must be single-byte in SJIS")
    assert(Extract.sniffCharset(sjisHalf) == "Shift_JIS")
    // a lone valid double-byte pair is NOT evidence (one even run, one
    // hanzi): the windows-1252 prior wins — a latin-1 snippet whose only
    // non-ASCII bytes are one adjacent accent pair ('üß') must not
    // decode as a hanzi (ADVICE r2)
    assert(Extract.sniffCharset(Array(0xE4.toByte, 0xB8.toByte)) == "windows-1252")
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    assert(Extract.sniffCharset("Grüße".getBytes(cp1252)) == "windows-1252")
    assert(Extract.sniffCharset("Größenwahn außen heiß".getBytes(cp1252)) == "windows-1252")
    assert(Extract.sniffCharset(Array(0x81.toByte, 0x3f.toByte, 0xFF.toByte, 0xFF.toByte)) == "windows-1252")
    assert(Extract.sniffCharset(Array[Byte]()) == "utf-8")
    // decode of valid utf-8 round-trips
    assert(Extract.decodeHtml("中文 test".getBytes(StandardCharsets.UTF_8)) == "中文 test")
  }

  test("charset sniffing (X3) r5 long tail: EUC-JP, EUC-KR and KOI8-R pages") {
    val eucJp = java.nio.charset.Charset.forName("EUC-JP")
    val eucKr = java.nio.charset.Charset.forName("EUC-KR")
    val koi8 = java.nio.charset.Charset.forName("KOI8-R")
    // mixed kana+kanji Japanese (the realistic shape): EUC-JP — the same
    // bytes strictly decode under GBK into random hanzi, the kana
    // dominance + true-kanji common hits must pick EUC-JP
    val ja = "日本語のテキストです、漢字も仮名も含みます。どうぞよろしく。"
    assert(Extract.sniffCharset(ja.getBytes(eucJp)) == "EUC-JP")
    // hangul-dominant Korean: EUC-KR (GBK decodes the pairs as random
    // hanzi; the hangul-dominance boost must out-score it)
    val ko = "한국어 텍스트 예제입니다 안녕하세요 감사합니다 서울에서"
    assert(Extract.sniffCharset(ko.getBytes(eucKr)) == "EUC-KR")
    // Russian in KOI8-R: single-byte total codec, detected by the
    // Cyrillic distribution gate BEFORE the CJK tier (its even-length
    // runs would otherwise decode as plausible hanzi)
    val ru = "привет мир это русский текст в кодировке пример страницы"
    assert(Extract.sniffCharset(ru.getBytes(koi8)) == "KOI8-R")
    // the same Russian text in the OTHER legacy Cyrillic charsets must
    // NOT be called KOI8-R (r5 review fix): all three land in U+04xx,
    // only the true charset decodes case-correct common letters
    val cp1251 = java.nio.charset.Charset.forName("windows-1251")
    val iso5 = java.nio.charset.Charset.forName("ISO-8859-5")
    assert(Extract.sniffCharset(ru.getBytes(cp1251)) == "windows-1251")
    assert(Extract.sniffCharset(ru.getBytes(iso5)) == "ISO-8859-5")
    assert(Extract.decodeHtml(ru.getBytes(cp1251)) == ru)
    assert(Extract.decodeHtml(ru.getBytes(iso5)) == ru)
    // short accented latin stays windows-1252 (the KOI8-R gate needs
    // ≥16 Cyrillic chars in runs of ≥4)
    val cp1252b = java.nio.charset.Charset.forName("windows-1252")
    assert(Extract.sniffCharset("déjà vu — crème brûlée".getBytes(cp1252b)) == "windows-1252")
    // end-to-end: each page decodes through its sniffed charset
    assert(Extract.decodeHtml(ko.getBytes(eucKr)) == ko)
    assert(Extract.decodeHtml(ru.getBytes(koi8)) == ru)
    assert(Extract.decodeHtml(ja.getBytes(eucJp)) == ja)
  }

  test("charset sniffing (X3): Big5 and Shift-JIS pages split from GBK by the frequency table") {
    // traditional Chinese (Big5): the same bytes often strictly decode as
    // GBK too, into rare random hanzi — the common-character score must
    // pick Big5
    val big5Text = "這是一個網路爬蟲的調度佇列。資料分析系統，傳統繁體測試。"
    val big5 = big5Text.getBytes(java.nio.charset.Charset.forName("Big5"))
    assert(Extract.sniffCharset(big5) == "Big5")
    assert(Extract.decodeHtml(big5) == big5Text)
    // Japanese (Shift_JIS): kana everywhere — including after mixing in
    // ASCII (odd-run shapes the paired gate alone would reject)
    val sjisText = "ウェブクローラーのスケジュールです。データ分析システム、テストします。"
    val sjis = sjisText.getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(Extract.sniffCharset(sjis) == "Shift_JIS")
    assert(Extract.decodeHtml(sjis) == sjisText)
    val sjisMixed = s"crawler: $sjisText ok".getBytes(java.nio.charset.Charset.forName("Shift_JIS"))
    assert(Extract.sniffCharset(sjisMixed) == "Shift_JIS")
    // simplified Chinese stays GBK (not claimed by Big5/SJIS)
    val gbkText2 = "网络爬虫的调度队列，数据分析系统。我们这是中文测试。"
    assert(Extract.sniffCharset(gbkText2.getBytes(java.nio.charset.Charset.forName("GBK"))) == "GBK")
    // an end-to-end Big5 page extracts identically to its UTF-8 twin
    val html = "<html><head><title>T</title></head><body><div id='c'>" +
      (1 to 12).map(_ => big5Text).mkString("<p>", "</p><p>", "</p>") + "</div></body></html>"
    assert(Extract.extractText(html.getBytes(java.nio.charset.Charset.forName("Big5")), "http://h/x") ==
      Extract.extractText(html.getBytes(StandardCharsets.UTF_8), "http://h/x"))
  }

  test("extraction is deterministic (same input → same bytes)") {
    val a = Fixtures.textFor(26L, V)
    val b = Fixtures.textFor(26L, V)
    assert(a == b)
  }

  test("extractAnchors pairs resolved hrefs with normalized anchor text") {
    val html =
      """<html><body>
        |<a href="/about">  About
        |   Us </a>
        |<a href="b.html"><b>Bold</b> link</a>
        |<a name="no-href">skipped</a>
        |<a href="http://other.example.com/x">Tom &amp; Jerry</a>
        |<a href="/img"><img src="i.png"/></a>
        |</body></html>""".stripMargin
    val got = Extract.extractAnchors(html, "http://host.example.com/dir/page.html")
    assert(got == Seq(
      ("http://host.example.com/about", "About Us"),
      ("http://host.example.com/dir/b.html", "Bold link"),
      ("http://other.example.com/x", "Tom & Jerry"),
      ("http://host.example.com/img", "")))
  }

  test("extractAnchors hrefs agree with extractOutlinks on the fixture corpus") {
    val html = Fixtures.htmlFor(1L, V)
    val base = Fixtures.canonUrl(1L)
    assert(Extract.extractAnchors(html, base).map(_._1) ==
      Extract.extractOutlinks(html, base))
  }
}
