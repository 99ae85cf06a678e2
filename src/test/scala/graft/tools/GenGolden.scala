package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.functions.{Extract, UrlCanon}
import graft.sources.Fixtures

/**
 * One-shot golden-vector generator (FIXTURES.md A.3). Run manually
 * (`sbt "Test/runMain graft.tools.GenGolden"`), review output by hand,
 * commit. Specs compare against the committed files — never regenerate
 * inside a test.
 */
object GenGolden {
  val V = 1000L
  // coverage: zh/en, all raw-url variants, short retry pages (97k), skew
  // host, link-dense, every id%4 link count
  val GoldenIds: Seq[Long] = Seq(
    0L, 1L, 2L, 3L, 5L, 7L, 10L, 11L, 13L, 17L, 20L, 26L, 33L, 49L, 55L,
    70L, 77L, 91L, 97L, 100L, 110L, 130L, 143L, 170L, 194L, 200L, 231L,
    260L, 291L, 300L, 330L, 388L, 455L, 485L, 490L, 510L, 582L, 679L,
    776L, 873L, 910L, 970L, 999L)

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/golden/extract")
    Files.createDirectories(dir)
    GoldenIds.foreach { id =>
      val txt = Fixtures.textFor(id, V)
      Files.write(dir.resolve(s"$id.txt"), txt.getBytes(StandardCharsets.UTF_8))
    }
    // canonicalization vectors: raw \t canonical
    val canonDir = Paths.get("src/test/resources/golden/canon")
    Files.createDirectories(canonDir)
    val extra = Seq(
      "HTTP://Host3.EXAMPLE.com:80/p/42?b=2&a=1#frag",
      "https://example.com:443/a/../b/./c",
      "http://example.com",
      "http://example.com/%7Euser/%41%42?z=1&y=%20",
      "http://User@Example.COM:8080/Path/UP?b&a=2&a=1",
      "http://example.com/a//b/",
      "ftp://example.com:21/x")
    val lines = (Fixtures.seedIds(V).map(Fixtures.rawUrl) ++ extra)
      .map(u => s"$u\t${UrlCanon.canonicalize(u)}")
    Files.write(canonDir.resolve("vectors.tsv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${GoldenIds.size} extract goldens + ${lines.size} canon vectors")
    // preview a few for eyeballing
    Seq(1L, 0L, 97L).foreach { id =>
      println(s"--- id=$id url=${Fixtures.canonUrl(id)} lang=${Fixtures.lang(id)}")
      println(Fixtures.textFor(id, V).take(300))
      println(s"  outlinks: ${Extract.extractOutlinks(Fixtures.htmlFor(id, V), Fixtures.canonUrl(id)).mkString(" | ")}")
    }
  }
}
