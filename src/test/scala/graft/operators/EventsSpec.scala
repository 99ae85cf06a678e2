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

  test("funnel: strict-order step times, ties and out-of-order ignored, depth exact") {
    val s = spark
    import s.implicits._
    def e(u: Long, t: Long, ty: String) = (Option(u), Option(ts(t)), Option(ty))
    val df = (Seq(
      // u1 converts fully in order
      e(1L, h0 + 10, "view"), e(1L, h0 + 20, "click"), e(1L, h0 + 30, "purchase"),
      // u2: view only
      e(2L, h0 + 10, "view"),
      // u3: clicks BEFORE the first view never count; a later one does
      e(3L, h0 + 5, "click"), e(3L, h0 + 8, "click"), e(3L, h0 + 10, "view"),
      e(3L, h0 + 15, "click"),
      // u4: an early purchase is ignored; the one after the click wins
      e(4L, h0 + 15, "purchase"), e(4L, h0 + 10, "view"), e(4L, h0 + 20, "click"),
      e(4L, h0 + 25, "purchase"),
      // u5: never views → absent from the funnel
      e(5L, h0 + 10, "click"), e(5L, h0 + 20, "purchase"),
      // u6: click at the exact same microsecond as view → strict > rejects
      e(6L, h0 + 10, "view"), e(6L, h0 + 10, "click")) :+
      ((Option(7L), Option.empty[java.sql.Timestamp], Option("view"))) // null ts dropped
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 6L))
    assert(got(1L) == ((Some(h0 + 10), Some(h0 + 20), Some(h0 + 30), 3L)))
    assert(got(2L) == ((Some(h0 + 10), None, None, 1L)))
    assert(got(3L) == ((Some(h0 + 10), Some(h0 + 15), None, 2L)))
    assert(got(4L) == ((Some(h0 + 10), Some(h0 + 20), Some(h0 + 25), 3L)))
    assert(got(6L) == ((Some(h0 + 10), None, None, 1L)))
  }

  test("retention: cohort by first period, offsets exact, same-period repeats collapse") {
    val s = spark
    import s.implicits._
    val day = 86400000000L
    def e(u: Long, d: Long, off: Long = 0L) = (Option(u), Option(ts(d * day + off)))
    val df = (Seq(
      e(1L, 0), e(1L, 1), e(1L, 3),
      e(2L, 1),
      e(3L, 0), e(3L, 0, 5000000L)) :+ // same-day repeat: one (user, period)
      ((Option(4L), Option.empty[java.sql.Timestamp])) // null ts dropped
    ).toDF("user_id", "ts")
    val got = Events.retention(df, "user_id", "ts", periodDays = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // u1, u3 cohort day 0
      (0L, 1L) -> 1L, // u1 back next day
      (0L, 3L) -> 1L, // u1 back on day 3
      (1L, 0L) -> 1L)) // u2 cohorts on day 1
  }

  test("funnel is partition-independent") {
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map { i =>
      val ty = Seq("view", "click", "purchase", "error")((i % 4).toInt)
      (i % 23, ts(h0 + (i * 37 % 101) * 1000000L), ty)
    }.toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val base = Events.funnel(df, "user_id", "ts", "event_type", steps)
      .collect().map(_.toSeq).toSet
    val shuffled = Events.funnel(df.repartition(17), "user_id", "ts", "event_type", steps)
      .collect().map(_.toSeq).toSet
    assert(base == shuffled && base.nonEmpty)
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
