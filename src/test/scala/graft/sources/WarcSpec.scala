package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("fixture file parses: gzip member per record, request/warcinfo interleaved") {
    val recs = Warc.parseBytes(Fixtures.warcFile(40)).toVector
    // 1 warcinfo + 40 responses + ceil(40/7)=6 requests
    assert(recs.count(_.warcType == "warcinfo") == 1)
    assert(recs.count(_.warcType == "response") == 40)
    assert(recs.count(_.warcType == "request") == 6)
    val r7 = recs.find(r => r.warcType == "response" && r.targetUri.endsWith("/w/7")).get
    assert(r7.httpStatus == 200)
    assert(r7.httpContentType == "text/html; charset=UTF-8")
    assert(new String(r7.body, "US-ASCII") == "Body 7. " * 3)
    // angle-bracketed URIs are stripped
    assert(!recs.exists(r => r.targetUri != null && r.targetUri.startsWith("<")))
    // 404s parse with their status
    assert(recs.find(r => r.warcType == "response" && r.targetUri.endsWith("/w/13"))
      .get.httpStatus == 404)
  }

  test("uncompressed WARC and LF-only header lines parse identically") {
    val body = "hello"
    val http = s"HTTP/1.1 200 OK\nContent-Type: text/plain\n\n$body"
    val rec = "WARC/1.1\nWARC-Type: response\nWARC-Target-URI: http://x/\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\nContent-Type: application/http; msgtype=response\n" +
      s"Content-Length: ${http.length}\n\n$http\n\n"
    val got = Warc.parseBytes(ascii(rec)).toVector
    assert(got.size == 1)
    assert(got.head.httpStatus == 200)
    assert(got.head.httpContentType == "text/plain")
    assert(new String(got.head.body, "US-ASCII") == body)
  }

  test("truncated tail yields the complete prefix records, never throws") {
    val full = Fixtures.warcFile(10)
    // chop into the middle of the last gzip member
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 25)
    val recs = Warc.parseBytes(cut).toVector
    assert(recs.nonEmpty && recs.size < 17) // 1 + 10 + 2 requests = 13 when whole
    // garbage input: no records, no throw
    assert(Warc.parseBytes(ascii("not a warc at all")).isEmpty)
    assert(Warc.parseBytes(Array[Byte]()).isEmpty)
    assert(Warc.parseBytes(null).isEmpty)
    // bit-flipped gzip member mid-stream: ZipException is swallowed like
    // EOF — the complete prefix comes back, the task never fails (r5
    // review fix: catch IOException, not just EOFException)
    val corrupt = full.clone()
    var i = full.length * 2 / 3
    while (i < full.length * 2 / 3 + 40 && i < corrupt.length) {
      corrupt(i) = (corrupt(i) ^ 0x5A).toByte; i += 1
    }
    val prefix = Warc.parseBytes(corrupt).toVector
    assert(prefix.size < 13) // strictly fewer than the intact 13
  }

  test("non-HTTP payloads come back whole with status -1") {
    val payload = "software: test\r\n"
    val rec = s"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
    val got = Warc.parseBytes(ascii(rec)).toVector
    assert(got.size == 1 && got.head.httpStatus == -1 && got.head.httpContentType == null)
    assert(new String(got.head.body, "US-ASCII") == payload)
  }

  test("records() over files + pages(): the canonical input_hint schema end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec")
    val f = dir.resolve("part-0.warc.gz")
    java.nio.file.Files.write(f, Fixtures.warcFile(26))
    try {
      val recs = Warc.records(spark, f.toString)
      assert(recs.count() == 1 + 26 + 4) // warcinfo + responses + requests
      val pages = Warc.pages(recs)
      assert(pages.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
      val rows = pages.collect()
      // 26 responses minus the 404s at seq 0 and 13
      assert(rows.length == 24)
      val r = rows.find(_.getString(0).endsWith("/w/7")).get
      assert(r.getTimestamp(1).toString.startsWith("2024-03-08 07:05:00"))
      // the golden extractor runs over the body bytes (plain text here)
      assert(r.getString(3) == ("Body 7. " * 3).trim)
      assert(r.getString(4) == "und") // no language markers in the fixture body
    } finally {
      Checkpointless.deleteRecursively(dir)
    }
  }

  test("wetShards round-trips through the reader (gzip members and plain)") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      ("http://a.com/1", "2024-03-08 07:05:00", "Hello text one"),
      ("http://a.com/2", "2024-03-08 07:05:01", "Second body é"),
      (null, "2024-03-08 07:05:02", "skipped: null url"),
      ("http://a.com/4", null, "null ts gets the epoch date"))
      .toDF("url", "ts", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
      .repartition(1)
    Seq(true, false).foreach { gz =>
      val shards = Warc.wetShards(pages, "url", "ts", "text", gzipMembers = gz).collect()
      assert(shards.length == 1)
      assert(shards.head.getLong(1) == 3L) // null-url row skipped
      val name = shards.head.getString(0)
      assert(if (gz) name.endsWith(".warc.wet.gz") else name.endsWith(".warc.wet"))
      val recs = Warc.parseBytes(shards.head.getAs[Array[Byte]](2)).toVector
      assert(recs.size == 3)
      assert(recs.forall(_.warcType == "conversion"))
      assert(recs.forall(_.httpStatus == -1)) // text/plain payload, not HTTP
      val byUrl = recs.map(r => r.targetUri -> r).toMap
      assert(new String(byUrl("http://a.com/1").body, "UTF-8") == "Hello text one")
      assert(new String(byUrl("http://a.com/2").body, "UTF-8") == "Second body é")
      assert(byUrl("http://a.com/1").warcDate == "2024-03-08T07:05:00Z")
      assert(byUrl("http://a.com/4").warcDate == "1970-01-01T00:00:00Z")
      // deterministic record ids: same input -> byte-identical shard
      val again = Warc.wetShards(pages, "url", "ts", "text", gzipMembers = gz)
        .collect().head.getAs[Array[Byte]](2)
      assert(java.util.Arrays.equals(again, shards.head.getAs[Array[Byte]](2)))
    }
  }

  private object Checkpointless {
    def deleteRecursively(p: java.nio.file.Path): Unit =
      graft.plans.Checkpoint.deleteRecursively(p)
  }
}
