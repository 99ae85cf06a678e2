package graft.functions

import java.nio.charset.Charset
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-fuzz for the X3 charset sniffer (VERDICT r3 #8): seeded
  * scalacheck generators (the repo's offline-cache idiom — fixed seeds,
  * deterministic forever) over the four byte families the detector splits.
  * The central property: pure latin-1 ACCENT text (accents isolated
  * inside ASCII words — the shape of real European text, and exactly what
  * the documented evidence gates promise to protect) must never be
  * claimed by a double-byte charset. */
class CharsetFuzzSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](g: Gen[T], n: Int = 300)(f: T => Unit): Unit =
    samples(g, n).foreach(f)

  private val cp1252 = Charset.forName("windows-1252")
  private val gbkCs = Charset.forName("GBK")
  private val big5Cs = Charset.forName("Big5")
  private val sjisCs = Charset.forName("Shift_JIS")

  private val asciiWord: Gen[String] =
    Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, Gen.alphaChar).map(_.mkString))

  // windows-1252 accents that are DEFINED in the codepage (avoid the
  // 0x80-0x9F holes) and sit isolated between ASCII letters
  private val accentChar: Gen[Char] =
    Gen.choose(0xC0, 0xFF).map(_.toChar).suchThat(_ != 0xD7).suchThat(_ != 0xF7)

  /** Real-European-text shape: ASCII words, some carrying ONE isolated
    * accent (never two adjacent — adjacent pairs are the documented
    * residual ambiguity the gates resolve by the windows-1252 prior). */
  private val latinAccentText: Gen[String] = for {
    words <- Gen.choose(3, 20).flatMap(k => Gen.listOfN(k, asciiWord))
    nAcc <- Gen.choose(1, math.max(1, words.length / 2))
    idx <- Gen.pick(math.min(nAcc, words.length), words.indices)
    accs <- Gen.listOfN(idx.size, accentChar)
  } yield words.zipWithIndex.map { case (w, i) =>
    val j = idx.indexOf(i)
    if (j < 0) w
    else {
      val mid = math.max(1, w.length / 2)
      w.substring(0, mid) + accs(j) + w.substring(mid) // accent INSIDE a word
    }
  }.mkString(" ")

  // common-table hanzi (mirrors the detector's frequency table by
  // construction: real zh text is dominated by these)
  private val simpHanzi: Gen[Char] = Gen.oneOf("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下".toSeq)
  private val tradHanzi: Gen[Char] = Gen.oneOf("們這國說時對會學來長發當經動問開關門見實體與點樣現內無後頭應該裡為個".toSeq)
  private val kanaChar: Gen[Char] = Gen.frequency(
    3 -> Gen.choose(0x3042, 0x3093).map(_.toChar), // hiragana
    1 -> Gen.choose(0x30A2, 0x30F3).map(_.toChar)) // katakana

  /** ≥ 8 CJK chars per sample — the detector's documented evidence bar
    * (the "overwhelming" gate): charsets whose encodings carry ASCII
    * trail bytes (Big5 點=c2 49) break run parity, so short snippets
    * below the bar legitimately resolve to the windows-1252 prior. */
  private def cjkText(ch: Gen[Char]): Gen[String] = for {
    words <- Gen.choose(4, 15).flatMap(k => Gen.listOfN(k,
      Gen.choose(2, 5).flatMap(m => Gen.listOfN(m, ch).map(_.mkString))))
    sep <- Gen.oneOf(" ", ", ", " a ", "1 ")
  } yield words.mkString(sep)

  test("pure latin-1 accent text is never claimed by a double-byte charset") {
    forAll(latinAccentText, 500) { t =>
      val got = Extract.sniffCharset(t.getBytes(cp1252))
      assert(got == "windows-1252", s"'$t' -> $got")
    }
  }

  test("simplified-common hanzi text encoded GBK detects as GBK") {
    forAll(cjkText(simpHanzi)) { t =>
      val got = Extract.sniffCharset(t.getBytes(gbkCs))
      assert(got == "GBK", s"'$t' -> $got")
    }
  }

  test("traditional-common hanzi text encoded Big5 detects as Big5") {
    forAll(cjkText(tradHanzi)) { t =>
      val got = Extract.sniffCharset(t.getBytes(big5Cs))
      assert(got == "Big5", s"'$t' -> $got")
    }
  }

  test("kana-dominant text encoded Shift_JIS detects as Shift_JIS") {
    forAll(cjkText(kanaChar)) { t =>
      val got = Extract.sniffCharset(t.getBytes(sjisCs))
      assert(got == "Shift_JIS", s"'$t' -> $got")
    }
  }

  test("hangul text encoded EUC-KR detects as EUC-KR (r5)") {
    val hangul: Gen[Char] = Gen.oneOf("한국어텍스트예제입니다안녕하세요감사합서울에서글자말이다는의하고지을가를".toSeq)
    forAll(cjkText(hangul)) { t =>
      val got = Extract.sniffCharset(t.getBytes(Charset.forName("EUC-KR")))
      assert(got == "EUC-KR", s"'$t' -> $got")
    }
  }

  test("mixed kana+kanji text encoded EUC-JP detects as EUC-JP (r5)") {
    // realistic Japanese: kana-dominant with some kanji — pure-kana text
    // is the documented benign GBK tie (identical decoded text)
    val jaChar: Gen[Char] = Gen.frequency(
      5 -> kanaChar,
      1 -> Gen.oneOf("日年時人大中文学国本語漢字含".toSeq))
    val jaText = cjkText(jaChar).suchThat { t =>
      t.exists(c => c >= 0x4e00 && c <= 0x9fff)
    }
    forAll(jaText) { t =>
      val got = Extract.sniffCharset(t.getBytes(Charset.forName("EUC-JP")))
      assert(got == "EUC-JP", s"'$t' -> $got")
    }
  }

  test("Russian text encoded KOI8-R detects as KOI8-R; accented latin never does (r5)") {
    // real-Russian letter shape: dominated by the top-frequency letters
    // (uniform-random Cyrillic is not a language; the charset split —
    // like chardet's — is a frequency model and needs frequency-shaped
    // input to be meaningful)
    val cyr: Gen[Char] = Gen.frequency(
      8 -> Gen.oneOf("оеаинтсрвлкмдпуяыьгзб".toSeq),
      2 -> Gen.choose(0x0430, 0x044F).map(_.toChar))
    val ruText: Gen[String] = Gen.choose(4, 15).flatMap(k => Gen.listOfN(k,
      Gen.choose(4, 9).flatMap(m => Gen.listOfN(m, cyr).map(_.mkString))))
      .map(_.mkString(" "))
    forAll(ruText) { t =>
      val got = Extract.sniffCharset(t.getBytes(Charset.forName("KOI8-R")))
      assert(got == "KOI8-R", s"'$t' -> $got")
    }
    // the SAME text in the other legacy Cyrillic charsets must resolve
    // to them, not KOI8-R (r5 review fix: case+identity frequency split)
    forAll(ruText) { t =>
      val got = Extract.sniffCharset(t.getBytes(Charset.forName("windows-1251")))
      assert(got == "windows-1251", s"'$t' -> $got")
    }
    forAll(ruText) { t =>
      val got = Extract.sniffCharset(t.getBytes(Charset.forName("ISO-8859-5")))
      assert(got == "ISO-8859-5", s"'$t' -> $got")
    }
    // and the Cyrillic gate never claims the latin accent shape
    forAll(latinAccentText, 500) { t =>
      assert(Extract.sniffCharset(t.getBytes(cp1252)) == "windows-1252")
    }
  }

  test("any unicode text encoded UTF-8 detects as utf-8 (validity wins)") {
    val anyText = Gen.choose(1, 40).flatMap(k =>
      Gen.listOfN(k, Gen.frequency(
        4 -> Gen.alphaChar, 2 -> accentChar, 2 -> simpHanzi, 1 -> kanaChar))
        .map(_.mkString))
    forAll(anyText) { t =>
      assert(Extract.sniffCharset(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == "utf-8")
    }
  }

  test("arbitrary bytes: the sniffer is total — one of the 10 charsets, decode never throws") {
    val charsets = Set("utf-8", "windows-1252", "GBK", "Big5", "Shift_JIS",
      "EUC-JP", "EUC-KR", "KOI8-R", "windows-1251", "ISO-8859-5")
    val anyBytes = Gen.choose(0, 64).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0, 255).map(_.toByte)).map(_.toArray))
    forAll(anyBytes, 500) { bs =>
      val cs = Extract.sniffCharset(bs)
      assert(charsets.contains(cs), s"unknown charset $cs")
      // the sniffed charset must DECODE the bytes without throwing
      // (windows-1252 maps every byte, so the fallback is always total)
      val s = Extract.decodeHtml(bs)
      assert(s != null)
    }
  }
}
