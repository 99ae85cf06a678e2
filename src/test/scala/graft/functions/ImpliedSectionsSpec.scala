package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Fixtures

/**
 * Implied html/head/body synthesis ([[Html.implySections]]) — the
 * lxml/libxml2 tree shape the reference sees through
 * `BeautifulSoup(html, 'lxml')` (cola/core/utils.py:102). Two contracts:
 *
 *  1. SHAPE: a body-less document restructures to html>head/body with
 *     head-level elements in head, content in body; a document that
 *     declares a <body> anywhere is untouched (the golden fast path).
 *  2. EXTRACTION INVARIANCE: extraction output over a page is identical
 *     whether the html/head/body wrappers are written out or implied —
 *     pinned both on handcrafted fragments and on the full golden
 *     fixture corpus with its wrappers stripped. This is the evidence
 *     that the former "no implied sections" residual cannot change
 *     extraction results on these shapes.
 */
class ImpliedSectionsSpec extends AnyFunSuite {

  private def imply(html: String): String =
    Html.implySections(Html.parse(html)).render

  test("bare fragment wraps in html>body") {
    assert(imply("<p>x</p>") == "<html><body><p>x</p></body></html>")
    assert(imply("loose text") == "<html><body>loose text</body></html>")
  }

  test("head-level elements before content move into a synthesized head") {
    assert(imply("<title>T</title><meta charset=\"utf-8\"/><p>x</p>")
      == "<html><head><title>T</title><meta charset=\"utf-8\"/></head>" +
         "<body><p>x</p></body></html>")
    // whitespace between head items is dropped (libxml2 rule)
    assert(imply("<title>T</title>\n  <p>x</p>")
      == "<html><head><title>T</title></head><body><p>x</p></body></html>")
  }

  test("a stray title AFTER content stays in the body (libxml2 recovery)") {
    assert(imply("<p>x</p><title>late</title>")
      == "<html><body><p>x</p><title>late</title></body></html>")
  }

  test("explicit head without body: head kept, content wrapped") {
    assert(imply("<head><title>T</title></head><p>x</p>")
      == "<html><head><title>T</title></head><body><p>x</p></body></html>")
    assert(imply("<html><head><title>T</title></head><p>x</p></html>")
      == "<html><head><title>T</title></head><body><p>x</p></body></html>")
  }

  test("explicit html without body: content wrapped inside it") {
    assert(imply("<html><title>T</title><p>x</p></html>")
      == "<html><head><title>T</title></head><body><p>x</p></body></html>")
  }

  test("a document with an explicit body anywhere keeps its body untouched") {
    val wellFormed = "<html><head><title>T</title></head><body><p>x</p></body></html>"
    assert(imply(wellFormed) == wellFormed)
    val bare = "<body><p>x</p></body>"
    assert(imply(bare) == bare)
  }

  test("declared body + bare top-level title: the title still moves into a head") {
    // lxml yields head>title for this shape too — soup.head.title parity
    assert(imply("<title>T</title><body><p>x</p></body>")
      == "<head><title>T</title></head><body><p>x</p></body>")
    assert(imply("<html><meta charset=\"utf-8\"/><head><title>T</title></head>" +
        "<body><p>x</p></body></html>")
      == "<html><head><title>T</title><meta charset=\"utf-8\"/></head>" +
         "<body><p>x</p></body></html>")
    val text = Extract.extractText("<title>Bare</title><body><div id=\"m\">" +
      "<p>Plenty of article body text to pass the readability scoring " +
      "threshold, with a comma, and enough words to be safe here.</p>" +
      "</div></body>", "http://h/x")
    assert(text.startsWith("Bare\n"), s"title lost: ${text.take(40)}")
  }

  test("empty document synthesizes an empty html>body") {
    assert(imply("") == "<html><body></body></html>")
  }

  test("bare top-level title is extracted as the page title (soup.head.title parity)") {
    val frag = "<title>Bare Title</title>" +
      "<div id=\"main\"><p>Enough article text to pass the readability length " +
      "threshold and score as a candidate paragraph in extraction, words words " +
      "words and a comma, then more words to be safe.</p></div>"
    val text = Extract.extractText(frag, "http://h/x")
    assert(text.startsWith("Bare Title\n"), s"title lost: ${text.take(60)}")
    assert(text.contains("Enough article text"))
  }

  test("extraction is invariant to writing out the wrappers (fragments)") {
    val frags = Seq(
      "<div id=\"main\"><p>First paragraph with plenty of body text to score, " +
        "a comma, and enough length to clear the minimum threshold easily.</p>" +
        "<p>Second paragraph continues the article with further prose, also " +
        "comfortably long enough to contribute to the candidate score.</p></div>",
      // tag soup: unclosed paragraphs, nav noise
      "<div class=\"nav-links\"><a href=\"/x\">nav</a></div>" +
        "<div id=\"content\"><p>Alpha beta gamma delta epsilon zeta eta theta, " +
        "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon here." +
        "<p>Phi chi psi omega continues the malformed but scoreable article " +
        "text with sufficient length for readability to keep it.</div>",
      // head-level items at top, then content
      "<title>T</title><style>.x{}</style>" +
        "<div id=\"main\"><p>Body text long enough to score as the article, " +
        "with a comma, and additional words to pass every length gate.</p></div>")
    frags.foreach { f =>
      val implied = Extract.extractText(f, "http://h/x")
      val written = Extract.extractText(
        "<html><head></head><body>" + f + "</body></html>", "http://h/x")
      // the written form has no title either unless the fragment carries one
      val writtenWithHead =
        if (f.startsWith("<title>T</title>"))
          Extract.extractText("<html><head><title>T</title></head><body>" +
            f.stripPrefix("<title>T</title>") + "</body></html>", "http://h/x")
        else written
      assert(implied == writtenWithHead,
        s"implied != written for fragment:\n$f\nimplied: $implied\nwritten: $writtenWithHead")
    }
  }

  test("golden corpus: stripping the html/body wrappers changes nothing") {
    // Fixture pages are generated with literal <html><head>…</head>
    // <body>…</body></html> wrappers (Fixtures.htmlFor). Deleting the
    // html/body tags leaves head + bare content; synthesis must rebuild
    // the lxml shape and reproduce the frozen golden text byte-for-byte.
    val V = 1000L // GenGolden's fixture version
    var checked = 0
    (0L until 40L).foreach { id =>
      val html = Fixtures.htmlFor(id, V)
      val stripped = html
        .replace("<html>", "").replace("</html>", "")
        .replace("<body>", "").replace("</body>", "")
      assert(stripped != html, "fixture lost its wrappers?")
      val expect = Extract.extractText(html, Fixtures.canonUrl(id))
      val got = Extract.extractText(stripped, Fixtures.canonUrl(id))
      assert(got == expect, s"id=$id diverged after wrapper strip")
      checked += 1
    }
    assert(checked >= 30)
  }

  test("golden corpus: stripping head too (bare title/meta at top) changes nothing") {
    val V = 1000L
    (0L until 20L).foreach { id =>
      val html = Fixtures.htmlFor(id, V)
      val stripped = html
        .replace("<html>", "").replace("</html>", "")
        .replace("<head>", "").replace("</head>", "")
        .replace("<body>", "").replace("</body>", "")
      val expect = Extract.extractText(html, Fixtures.canonUrl(id))
      val got = Extract.extractText(stripped, Fixtures.canonUrl(id))
      assert(got == expect, s"id=$id diverged after head+body wrapper strip")
    }
  }
}
