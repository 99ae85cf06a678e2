package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Html.{Elem, Text}

class HtmlSpec extends AnyFunSuite {

  test("parse/find/text basics") {
    val doc = Html.parse(
      """<html><head><title>T</title></head><body><div class="a" id="b"><p>hello <b>world</b></p></div></body></html>""")
    assert(doc.find("title").map(_.text).contains("T"))
    val div = doc.find("div").get
    assert(div.attr("class").contains("a"))
    assert(div.attr("id").contains("b"))
    assert(div.text == "hello world")
    assert(doc.findAll("p", "b").map(_.name) == Vector("p", "b"))
  }

  test("void elements and self-closing tags do not swallow siblings") {
    val doc = Html.parse("""<div><img src="x"><br/><p>after</p></div>""")
    val div = doc.find("div").get
    assert(div.children.collect { case e: Elem => e.name } == Seq("img", "br", "p"))
    assert(doc.find("p").get.text == "after")
  }

  test("script/style raw text is not parsed as markup") {
    val doc = Html.parse("""<body><script>if (a<b) { x("</div>"); }</script><p>ok</p></body>""")
    assert(doc.find("p").get.text == "ok")
    assert(doc.find("script").get.text.contains("a<b"))
  }

  test("comments and doctype dropped") {
    val doc = Html.parse("<!DOCTYPE html><!-- c --><body><p>x</p></body>")
    assert(doc.text == "x")
  }

  test("extract detaches node; render round-trips") {
    val doc = Html.parse("<body><div><p>a</p><p>b</p></div></body>")
    val ps = doc.findAll("p")
    ps.head.extract()
    assert(doc.find("div").get.text == "b")
    assert(doc.find("div").get.render == "<div><p>b</p></div>")
  }

  test("stray close tags ignored; unclosed tags close at ancestor close") {
    val doc = Html.parse("<body></span><div><p>a</div><p>b</body>")
    assert(doc.findAll("p").map(_.text) == Vector("a", "b"))
  }

  test("stringValue follows single-child chains like BS4 .string") {
    val doc = Html.parse("<p><b>only</b></p><p>two<b>kids</b></p>")
    val ps = doc.findAll("p")
    assert(ps(0).stringValue.contains("only"))
    assert(ps(1).stringValue.isEmpty)
  }

  test("attributes: unquoted, single-quoted, valueless") {
    val doc = Html.parse("""<input type=text disabled value='a b'>""")
    val in = doc.find("input").get
    assert(in.attr("type").contains("text"))
    assert(in.attr("disabled").contains(""))
    assert(in.attr("value").contains("a b"))
  }
}
