package graft.streaming

import java.sql.Timestamp
import graft.operators.Events
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class WinEvent(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Batch/stream parity for the tumbling-window rollup: the SAME window()
  * aggregate ([[Events.windowAggStream]]) under a watermark emits each
  * closed window exactly once in Append mode, and the emitted rows equal
  * the batch operator's streaming-expressible columns over the same
  * events. */
class StreamingEventsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val base = 1704067200000L // 2024-01-01T00:00:00Z ms
  private def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000)

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("micro-batch window rollup ≡ batch windowAgg on the shared columns") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._

    val events = Seq(
      WinEvent(1, ts(10), "view", 1.25),   // window 0
      WinEvent(2, ts(50), "view", 2.50),   // window 0
      WinEvent(3, ts(70), "view", 0.75),   // window 1 (60s tumble)
      WinEvent(4, ts(20), "click", 10.00), // window 0
      WinEvent(5, ts(130), "click", 0.10)) // window 2

    val input = MemoryStream[WinEvent]
    val q = Events.windowAggStream(input.toDS().toDF(),
        "ts", "event_type", "value", every = "1 minute", delay = "30 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    // out-of-order within the watermark tolerance, across micro-batches
    input.addData(events(0), events(3))
    q.processAllAvailable()
    input.addData(events(2), events(1), events(4))
    q.processAllAvailable()
    // flush: advance the watermark far past every window above
    input.addData(WinEvent(99, ts(100000), "flush", 0.0))
    q.processAllAvailable()
    input.addData(WinEvent(100, ts(200000), "flush", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("win_out")
      .filter($"event_type" =!= "flush").collect()
    q.stop()

    val batch = Events.windowAgg(events.toDF(), "ts", "event_type",
        "event_id", "value", every = "1 minute")
      .select("window_start_us", "event_type", "n_events", "value_cents")
      .collect()
    assert(asTuples(streamed) == asTuples(batch))
    // hand-computed shape: window starts in epoch micros
    val w0 = base * 1000; val w1 = w0 + 60000000L; val w2 = w0 + 120000000L
    assert(asTuples(batch) == Seq(
      (w0, "click", 1L, 1000L),
      (w0, "view", 2L, 375L),
      (w1, "view", 1L, 75L),
      (w2, "click", 1L, 10L)))
  }

  test("late event beyond the watermark is dropped from the stream") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[WinEvent]
    val q = Events.windowAggStream(input.toDS().toDF(),
        "ts", "event_type", "value", every = "1 minute", delay = "30 seconds")
      .writeStream.format("memory").queryName("win_late")
      .outputMode(OutputMode.Append()).start()
    input.addData(WinEvent(1, ts(10), "view", 1.00))
    q.processAllAvailable()
    input.addData(WinEvent(2, ts(10000), "other", 0.0))
    q.processAllAvailable()
    // event time far below the watermark: dropped, must not reopen w0
    input.addData(WinEvent(3, ts(20), "view", 5.00))
    q.processAllAvailable()
    input.addData(WinEvent(4, ts(50000), "other", 0.0))
    q.processAllAvailable()
    input.addData(WinEvent(5, ts(90000), "other", 0.0))
    q.processAllAvailable()
    val got = spark.table("win_late").filter($"event_type" === "view").collect()
    q.stop()
    assert(got.length == 1 && got(0).getLong(2) == 1L && got(0).getLong(3) == 100L,
      s"late event must not reopen the closed window: ${got.mkString}")
  }
}
