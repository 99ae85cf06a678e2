package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CdxSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def keysOf(urls: String*): Seq[Option[String]] = {
    val s = spark
    import s.implicits._
    urls.toDF("url").select(Cdx.surtKey(col("url")))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("surtKey: reversal, www-strip, port, query, casing, no-path") {
    assert(keysOf(
      "http://www.Example.com/a/b?x=1",
      "http://example.com",
      "https://a.b.example.co.uk/p",
      "http://www2.example.com/",   // www2 is a real host, kept
      "http://example.com:8080/x",
      "HTTP://EXAMPLE.COM/UPPER",
      "not a url") === Seq(
      Some("com,example)/a/b?x=1"),
      Some("com,example)/"),
      Some("uk,co,example,b,a)/p"),
      Some("com,example,www2)/"),
      Some("com,example:8080)/x"),
      Some("com,example)/upper"),
      None))
  }

  test("surtKey groups a site contiguously under sort (the CDX shard property)") {
    val keys = keysOf(
      "http://z-other.net/1",
      "http://a.example.com/1",
      "http://example.com/2",
      "http://b.example.com/3").flatten.sorted
    val exampleBlock = keys.dropWhile(!_.startsWith("com,example"))
      .takeWhile(_.startsWith("com,example"))
    assert(exampleBlock.size === 3, s"site rows not contiguous: $keys")
  }

  test("cdxIndex: 14-digit ts, payload digest/length over bytes") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      ("http://www.a.com/x", "2023-04-05 06:07:08", "<html>é</html>"))
      .toDF("url", "ts", "body")
    val r = Cdx.cdxIndex(pages, "url", "ts", "body").collect().head
    assert(r.getString(0) === "com,a)/x")
    assert(r.getString(1) === "20230405060708")
    // é is 2 UTF-8 bytes: 14 chars -> 15 octets
    assert(r.getLong(3) === 15L)
    assert(r.getString(2).matches("[0-9a-f]{32}"))
    assert(r.getString(4) === "http://www.a.com/x")
  }
}
