package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class StreamingFrontierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000)

  private def ev(url: String, host: String, p: Int, s: Long): UrlEvent =
    UrlEvent(url, host, p, ts(s))

  test("streaming dedup drops repeated url_canon across micro-batches") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[UrlEvent]
    val q = StreamingFrontier.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(ev("u1", "a", 0, 1), ev("u2", "a", 0, 2), ev("u1", "a", 0, 3))
    q.processAllAvailable()
    input.addData(ev("u2", "b", 0, 4), ev("u3", "b", 0, 5))
    q.processAllAvailable()
    val got = spark.table("dedup_out").select("url_canon")
      .collect().map(_.getString(0)).toSeq
    q.stop()
    assert(got.sorted == Seq("u1", "u2", "u3"))
  }

  test("windowed per-host counts aggregate with watermark") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[UrlEvent]
    val q = StreamingFrontier.hostWindowCounts(input.toDS(), "1 minute")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    input.addData(ev("u1", "a", 2, 10), ev("u2", "a", 0, 20), ev("u3", "b", 1, 70))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select("host", "n", "best_priority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    q.stop()
    assert(rows == Set(("a", 2L, 0), ("b", 1L, 1)))
  }

  test("politeness gate emits at most hostBudget per host per window") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[UrlEvent]
    val q = StreamingFrontier.politenessGate(input.toDS(), hostBudget = 2)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode(OutputMode.Append()).start()
    // 4 urls for host a in the same minute window, 1 for host b
    input.addData(ev("a1", "a", 0, 1), ev("a2", "a", 1, 2), ev("a3", "a", 2, 3),
      ev("a4", "a", 0, 4), ev("b1", "b", 0, 5))
    q.processAllAvailable()
    // next window: host a allowed again
    input.addData(ev("a5", "a", 0, 65))
    q.processAllAvailable()
    val got = spark.table("gate_out").select("url_canon")
      .collect().map(_.getString(0)).toSet
    q.stop()
    // within window 0, host a's best two by (priority, ts): a1 (p0), a4 (p0)
    assert(got == Set("a1", "a4", "b1", "a5"))
  }

  test("politeness gate accounts per window when one micro-batch spans windows") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[UrlEvent]
    val q = StreamingFrontier.politenessGate(input.toDS(), hostBudget = 1)
      .writeStream.format("memory").queryName("gate_span_out")
      .outputMode(OutputMode.Append()).start()
    // ONE batch spanning two windows; sorted-by-priority order would
    // interleave the windows (x1 w0, y1 w1, x2 w0) — a naive global-order
    // counter resets on each window flip and over-emits from window 0
    input.addData(ev("x1", "a", 0, 1), ev("y1", "a", 0, 65), ev("x2", "a", 1, 2))
    q.processAllAvailable()
    // budget continues across batches for the newest window
    input.addData(ev("y2", "a", 0, 70))
    q.processAllAvailable()
    val got = spark.table("gate_span_out").select("url_canon")
      .collect().map(_.getString(0)).toSet
    q.stop()
    assert(got == Set("x1", "y1"), s"got $got")
  }

  test("O9-continuous end-to-end: dedup + gate + durable seen admission match the batch semantics") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val stateDir = java.nio.file.Files.createTempDirectory("graft-stream-state").toString
    val streamCkpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    // pre-seed the durable seen table (wave 0) the way a prior BATCH crawl
    // leaves it — the continuous mode must extend, not fork, that state
    val ckpt = new graft.plans.Checkpoint(spark, stateDir, 8)
    ckpt.ensureBucketed("seen", "url_hash BIGINT, url_canon STRING")
    ckpt.writeBucketed(
      Seq("pre1", "pre2").toDF("url_canon")
        .withColumn("url_hash", xxhash64(col("url_canon")))
        .select("url_hash", "url_canon"),
      0, "seen")

    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val input = MemoryStream[UrlEvent]
    val q = StreamingFrontier.runContinuous(input.toDS(), stateDir, streamCkpt,
      hostBudget = 2, onBatch = (df, bid) =>
        admitted ++= df.select("url_canon").collect().map(r => (bid, r.getString(0))))

    // batch 1: host a has 3 candidates in one window (budget 2), one of
    // which is already seen; an in-batch duplicate of a2; host b has 1
    input.addData(
      ev("pre1", "a", 0, 1), ev("a2", "a", 1, 2), ev("a2", "a", 1, 2),
      ev("a3", "a", 2, 3), ev("b1", "b", 0, 4))
    q.processAllAvailable()
    // batch 2: a new window reopens host a's budget; a cross-batch
    // duplicate (a2) must be dropped by the streaming dedup state
    input.addData(ev("a2", "a", 1, 62), ev("a9", "a", 0, 65), ev("pre2", "b", 0, 66))
    q.processAllAvailable()
    q.stop()

    // batch-engine expectation on the same events: dedup first, then the
    // per-(host, window) top-hostBudget by (priority, ts, canon), then
    // the durable-seen anti-join at admission
    // window 0 host a: pre1(p0), a2(p1), a3(p2) → gate keeps pre1, a2;
    //   pre1 is already seen → admitted: a2. host b: b1 → admitted.
    // window 1 host a: a9 (a2 is a cross-batch dup, dropped) → admitted;
    //   host b: pre2 gated but already seen → not admitted.
    assert(admitted.map(_._2).toSet == Set("a2", "b1", "a9"),
      s"admitted ${admitted.toSeq}")
    // the durable seen table extended by exactly the admitted urls
    val seenNow = ckpt.readBucketed("seen", Int.MaxValue)
      .select("url_canon").collect().map(_.getString(0)).toSet
    assert(seenNow == Set("pre1", "pre2", "a2", "b1", "a9"))
  }
}
