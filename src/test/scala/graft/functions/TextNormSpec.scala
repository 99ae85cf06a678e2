package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // composed forms (already NFC); escapes keep the test bytes unambiguous
  private val cafeC = "caf\u00E9"
  private val ringC = "\u00C5"
  private val oDiaMacC = "\u022B"
  // decomposed forms (NFD): base letter + combining mark(s)
  private val cafeD = "cafe\u0301"
  private val ringD = "A\u030A"
  private val oDiaMacD = "o\u0308\u0304"

  test("kernel: pure-ASCII input returns the SAME object (zero-copy fast path)") {
    val u = UTF8String.fromString("plain ascii text, nothing to do")
    assert(TextNormKernel.nfc(u) eq u)
  }

  test("kernel: already-NFC non-ASCII returns the same object") {
    val u = UTF8String.fromString(cafeC + " " + ringC + "ngstr\u00F6m")
    assert(TextNormKernel.nfc(u) eq u)
  }

  test("kernel: decomposed sequences compose (UAX #15 canonical pairs)") {
    assert(TextNormKernel.nfc(UTF8String.fromString(cafeD)).toString == cafeC)
    assert(TextNormKernel.nfc(UTF8String.fromString(ringD)).toString == ringC)
    assert(TextNormKernel.nfc(UTF8String.fromString(oDiaMacD)).toString == oDiaMacC)
    assert(TextNormKernel.nfc(null) == null)
  }

  test("kernel == java.text.Normalizer on seeded random strings (incl. combining marks)") {
    val rnd = new scala.util.Random(42)
    val pool = "abc \u00E9\u00C5\u4E2D\u0301\u030A\u0308\u05D0"
    (1 to 300).foreach { _ =>
      val s = (1 to (rnd.nextInt(30) + 1)).map(_ => pool(rnd.nextInt(pool.length))).mkString
      val got = TextNormKernel.nfc(UTF8String.fromString(s)).toString
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got == want, s"input codepoints: ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("expression evaluates through a DataFrame (codegen path) and is null-safe") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(cafeD), Some("ascii"), None).toDF("t")
      .select(TextNormExprs.normalizeNfc(col("t")).as("n"))
    val got = df.collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some(cafeC), Some("ascii"), None))
    // stays inside whole-stage codegen: no Scala-UDF encoder bridge
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("idempotence: nfc(nfc(x)) == nfc(x)") {
    Seq(cafeD + " " + ringD, oDiaMacD + "y", "plain").foreach { x =>
      val once = TextNormKernel.nfc(UTF8String.fromString(x))
      assert(TextNormKernel.nfc(once) eq once)
    }
  }
}
