package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.jdk.CollectionConverters._

class UrlCanonSpec extends AnyFunSuite {

  /** Deterministic sample stream from a Gen (no scalatestplus in the
   *  offline cache, so we drive scalacheck directly with fixed seeds). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](g: Gen[T])(f: T => Unit): Unit = samples(g, 300).foreach(f)

  test("golden canonicalization vectors (frozen)") {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("src/test/resources/golden/canon/vectors.tsv")).asScala
    assert(lines.nonEmpty)
    lines.foreach { line =>
      val Array(raw, expected) = line.split("\t", 2)
      assert(UrlCanon.canonicalize(raw) == expected, s"raw=$raw")
    }
  }

  test("resolve reproduces reference absolute_url doctests (extractor/utils.py:37-53)") {
    assert(UrlCanon.resolve("foo", "http://base/whatever/ooo/fdsh") == "http://base/whatever/ooo/foo")
    assert(UrlCanon.resolve("foo/bar/", "http://base") == "http://base/foo/bar/")
    assert(UrlCanon.resolve("/foo/bar", "http://base/whatever/fdskf") == "http://base/foo/bar")
    assert(UrlCanon.resolve("\n/foo/bar", "http://base/whatever/fdskf") == "http://base/foo/bar")
    assert(UrlCanon.resolve("http://localhost/foo", "http://base/whatever/fdskf") == "http://localhost/foo")
  }

  test("host extraction (extractor/utils.py:25-35 + lowercase/port-strip)") {
    assert(UrlCanon.host("http://base/whatever/fdsh") == "base")
    assert(UrlCanon.host("invalid") == null)
    assert(UrlCanon.host("HTTP://Host0.EXAMPLE.com:8080/p/1") == "host0.example.com")
    assert(UrlCanon.host("http://user:pw@h.com/x") == "h.com")
    assert(UrlCanon.host(null) == null)
  }

  test("fragment strip") {
    assert(UrlCanon.stripFragment("http://a/b#c#d") == "http://a/b")
    assert(UrlCanon.stripFragment("http://a/b") == "http://a/b")
  }

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https")
    host <- Gen.oneOf("Example.COM", "host3.example.com", "A.b.C")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.oneOf("a", "B", "..", ".", "p%41", "%7e", "x y".replace(" ", "%20")))
    q <- Gen.oneOf("", "?b=2&a=1", "?z&y=%41", "?a=1&a=0")
    f <- Gen.oneOf("", "#frag", "#a#b")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$q$f"

  test("canonicalize is idempotent (property)") {
    forAll(genUrl) { u =>
      val c = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(c) == c, s"u=$u c=$c")
    }
  }

  test("canonicalize strips fragments and sorts query params (property)") {
    forAll(genUrl) { u =>
      val c = UrlCanon.canonicalize(u)
      assert(!c.contains("#"))
      val qIdx = c.indexOf('?')
      if (qIdx >= 0) {
        val parts = c.substring(qIdx + 1).split("&").toSeq
        assert(parts == parts.sorted)
      }
    }
  }

  test("fast path never disagrees with the full canonicalizer (property)") {
    // for any url, canonical form must be a fixed point — and for inputs
    // the fast path accepts, the slow path must agree they are unchanged
    forAll(genUrl) { u =>
      val c = UrlCanon.canonicalize(u)
      if (UrlCanon.isCanonicalFast(u)) assert(c == u, s"fast path wrong on $u")
      assert(UrlCanon.canonicalize(c) == c)
    }
    // targeted fast-path rejects: port, userinfo, uppercase host, %, ?, #, dot segs, no path
    Seq("http://a.com:8080/x", "http://u@a.com/x", "http://A.com/x",
      "http://a.com/x%41", "http://a.com/x?b=1", "http://a.com/x#f",
      "http://a.com/./x", "http://a.com", "ftp://a.com/x")
      .foreach(u => assert(!UrlCanon.isCanonicalFast(u), u))
    assert(UrlCanon.isCanonicalFast("http://host0.example.com/p/123"))
  }

  test("byte kernel ≡ UrlCanon for canonicalize and host (property + vectors)") {
    import org.apache.spark.unsafe.types.UTF8String
    def u8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
    def checkOne(u: String): Unit = {
      val ck = Option(UrlCanonKernel.canonicalize(u8(u))).map(_.toString).orNull
      assert(ck == UrlCanon.canonicalize(u), s"canonicalize kernel diverged on $u")
      val hk = Option(UrlCanonKernel.host(u8(u))).map(_.toString).orNull
      assert(hk == UrlCanon.host(u), s"host kernel diverged on $u")
    }
    forAll(genUrl)(checkOne)
    // canonical inputs must take the zero-copy path (same object back)
    val canon = u8("http://host0.example.com/p/123")
    assert(UrlCanonKernel.canonicalize(canon) eq canon)
    // edge vectors incl. whitespace, unicode, empty-ish, missing path
    Seq("", " ", "http://a.com/x ", " http://a.com/x", "http://a.com/x\n",
      "http://a.com", "http://a.com/", "http://héllo.com/x", "http://a.com/ü",
      "invalid", "http://u@a.com/x", "https://a.com/x", "HTTP://A.com/x",
      "http://a.com/x/./y", "http://a.com/x?b=1&a=2#f")
      .foreach(checkOne)
    assert(UrlCanonKernel.canonicalize(null) == null && UrlCanonKernel.host(null) == null)
    // frozen vector file agreement
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("src/test/resources/golden/canon/vectors.tsv")).asScala
    lines.foreach(l => checkOne(l.split("\t", 2)(0)))
  }

  test("canonicalize equates raw-url variants of the same page") {
    assert(UrlCanon.canonicalize("HTTP://Host1.EXAMPLE.com:80/p/5") ==
      UrlCanon.canonicalize("http://host1.example.com/p/5#sec2"))
  }
}
