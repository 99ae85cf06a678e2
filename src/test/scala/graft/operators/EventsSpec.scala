package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val h0 = 1704067200000000L // 2024-01-01T00:00:00Z (hour-aligned)
  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  test("windowAgg: hand-computed hourly rollup, cents exact, null rows dropped") {
    val s = spark
    import s.implicits._
    val m = 60L * 1000000L
    val df = Seq(
      (Option(ts(h0)), Option("click"), Option(1L), Option(1.25)),
      (Option(ts(h0 + 10 * m)), Option("click"), Option(2L), Option(2.10)),
      (Option(ts(h0 + 59 * m)), Option("buy"), Option(1L), Option(185.22)),
      (Option(ts(h0 + 61 * m)), Option("click"), Option(1L), Option(0.99)),
      (None, Option("click"), Option(3L), Option(5.0)),          // null ts dropped
      (Option(ts(h0)), None, Option(3L), Option(5.0))            // null type dropped
    ).toDF("ts", "event_type", "user_id", "value")
    val got = Events.windowAgg(df, "ts", "event_type", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (h0, "click", 2L, 2L, 335L),          // 125 + 210 cents
      (h0, "buy", 1L, 1L, 18522L),          // round(185.22*100)
      (h0 + 3600L * 1000000L, "click", 1L, 1L, 99L)))
  }

  test("windowAgg: negative money rounds half AWAY FROM ZERO (pinned contract)") {
    val s = spark
    import s.implicits._
    // VERDICT r4 hazard #4: Spark round() is HALF_UP — away from zero on
    // BOTH signs — while some engines use banker's rounding. ±0.125 is an
    // exactly-representable half-cent, so the tie rule is actually hit:
    // HALF_UP gives ±13 cents, banker's would give ±12.
    val df = Seq(
      (ts(h0), "refund", 1L, -0.125),
      (ts(h0), "charge", 1L, 0.125),
      (ts(h0), "refund", 2L, -2.00))
      .toDF("ts", "event_type", "user_id", "value")
    val got = Events.windowAgg(df, "ts", "event_type", "user_id", "value")
      .collect().map(r => (r.getString(1), r.getLong(4))).toMap
    assert(got == Map("refund" -> -213L, "charge" -> 13L))
  }

  test("propsAgg: integer field extraction incl. missing and malformed JSON") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("click", """{"k": 7}"""),
      ("click", """{"k": 11, "x": 1}"""),
      ("click", """{"other": 2}"""),   // field missing
      ("click", "not json at all"),    // malformed
      ("buy", """{"k": 3}"""),
      ("buy", null.asInstanceOf[String])
    ).toDF("event_type", "props")
    val got = Events.propsAgg(df, "event_type", "props", "$.k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("click", 4L, 2L, 18L, 11L),
      ("buy", 2L, 1L, 3L, 3L)))
  }

  test("plans: both are single hash aggregates, no UDF/ScalaUDF node") {
    val s = spark
    import s.implicits._
    val df = Seq((ts(h0), "t", 1L, 1.0, """{"k":1}"""))
      .toDF("ts", "event_type", "user_id", "value", "props")
    val p1 = Events.windowAgg(df, "ts", "event_type", "user_id", "value")
      .queryExecution.executedPlan.toString
    val p2 = Events.propsAgg(df, "event_type", "props", "$.k")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("ScalaUDF") && !p2.contains("ScalaUDF"))
    assert(p2.contains("HashAggregate"), p2)
  }
}
