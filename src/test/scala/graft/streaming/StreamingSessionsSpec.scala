package graft.streaming

import java.sql.Timestamp
import graft.operators.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class SessEvent(event_id: Long, user_id: Long, ts: Timestamp)

/** Batch/stream parity for gap sessionization: the SAME session_window
  * aggregate ([[Sessions]]) runs under Structured Streaming with a
  * watermark, emits each session exactly once in Append mode when the
  * watermark passes it, and the emitted rows equal the batch operator
  * over the same events. */
class StreamingSessionsSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(t => (t._1, t._2))

  test("micro-batch sessions ≡ batch sessionize; append emits each closed session once") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._

    val events = Seq(
      // u1: one session of three events (gaps 60s < 5min)
      SessEvent(1, 1, ts(0)), SessEvent(2, 1, ts(60)), SessEvent(3, 1, ts(120)),
      // u2: two sessions (gap 3600s > 5min)
      SessEvent(4, 2, ts(30)), SessEvent(5, 2, ts(3630)),
      // u1 second session, far later
      SessEvent(6, 1, ts(7200)))
    // a final flush event far past everything advances the watermark so
    // every session above is closed and emitted
    val flush = SessEvent(99, 9, ts(100000))

    val input = MemoryStream[SessEvent]
    val q = Sessions.sessionizeStream(input.toDS().toDF(),
        "user_id", "ts", "event_id", gap = "5 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    // three micro-batches, out of order within the watermark tolerance
    input.addData(events(0), events(3), events(1))
    q.processAllAvailable()
    input.addData(events(2), events(4), events(5))
    q.processAllAvailable()
    input.addData(flush)
    q.processAllAvailable()
    // one more empty-advance pass so the flush batch's watermark applies
    input.addData(SessEvent(100, 9, ts(200000)))
    q.processAllAvailable()
    val streamed = spark.table("sess_out")
      .filter($"user_id" =!= 9L) // drop the flush user
      .collect()
    q.stop()

    val batch = Sessions.sessionize(events.toDF(), "user_id", "ts", "event_id",
      gap = "5 minutes").collect()
    assert(asTuples(streamed) == asTuples(batch))
    // and the expected shape, hand-computed
    assert(asTuples(batch) == Seq(
      (1L, base * 1000, 3L, 1L, 3L, 120L * 1000000),
      (1L, (base + 7200 * 1000) * 1000, 1L, 6L, 6L, 0L),
      (2L, (base + 30 * 1000) * 1000, 1L, 4L, 4L, 0L),
      (2L, (base + 3630 * 1000) * 1000, 1L, 5L, 5L, 0L)))
  }

  test("late event beyond the watermark is dropped from the stream (batch keeps it)") {
    val sp = spark
    implicit val sql: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[SessEvent]
    val q = Sessions.sessionizeStream(input.toDS().toDF(),
        "user_id", "ts", "event_id", gap = "5 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append()).start()
    input.addData(SessEvent(1, 1, ts(0)))
    q.processAllAvailable()
    // advance watermark far past t=0
    input.addData(SessEvent(2, 2, ts(10000)))
    q.processAllAvailable()
    // a very late event for u1 (event time t=10 << watermark) is dropped
    input.addData(SessEvent(3, 1, ts(10)))
    q.processAllAvailable()
    input.addData(SessEvent(4, 3, ts(50000)))
    q.processAllAvailable()
    input.addData(SessEvent(5, 3, ts(90000)))
    q.processAllAvailable()
    val got = spark.table("sess_late").filter($"user_id" === 1L).collect()
    q.stop()
    assert(got.length == 1 && got(0).getLong(2) == 1L,
      s"late event must not extend the closed session: ${got.mkString}")
  }
}
