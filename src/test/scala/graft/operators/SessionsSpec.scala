package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val base = 1704067200000000L // 2024-01-01T00:00:00Z in micros

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def eventsDF(es: Seq[(Long, Long, Long)]): DataFrame = {
    // (event_id, user_id, offset_us from base)
    val s = spark
    import s.implicits._
    es.map { case (id, u, off) => (id, u, tsOf(base + off)) }
      .toDF("event_id", "user_id", "ts")
  }

  private def sessions(df: DataFrame, gap: String = "30 minutes") =
    Sessions.sessionize(df, "user_id", "ts", "event_id", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(t => (t._1, t._2))

  /** Sequential replay: merge consecutive events (per user, ts order,
   *  id tiebreak) while the gap is AT MOST the threshold — empirically
   *  pinned below: session_window merges an event landing exactly on the
   *  previous window's end. */
  private def brute(es: Seq[(Long, Long, Long)], gapUs: Long) = {
    es.groupBy(_._2).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.map { case (id, _, off) => (base + off, id) }.sortBy(identity)
      val groups = sorted.foldLeft(List.empty[List[(Long, Long)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._1 - cur.head._1 <= gapUs => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse
      groups.map { g =>
        (u, g.head._1, g.size.toLong, g.map(_._2).min, g.map(_._2).max,
          g.last._1 - g.head._1)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("hand-computed: two users, gaps split sessions") {
    val m = 60L * 1000000L // one minute in micros
    val es = Seq(
      (1L, 7L, 0L), (2L, 7L, 10 * m), (3L, 7L, 50 * m),   // u7: {1,2} then {3}
      (4L, 9L, 0L), (5L, 9L, 29 * m), (6L, 9L, 58 * m))   // u9: chained {4,5,6}
    val got = sessions(eventsDF(es))
    assert(got == Seq(
      (7L, base, 2L, 1L, 2L, 10 * m),
      (7L, base + 50 * m, 1L, 3L, 3L, 0L),
      (9L, base, 3L, 4L, 6L, 58 * m)))
  }

  test("boundary: a gap of exactly the threshold MERGES; one microsecond past splits") {
    val gapUs = 30L * 60L * 1000000L
    val atGap = Seq((1L, 1L, 0L), (2L, 1L, gapUs))
    val past = Seq((1L, 1L, 0L), (2L, 1L, gapUs + 1L))
    assert(sessions(eventsDF(atGap)).size == 1, "exact-gap events merge (inclusive end)")
    assert(sessions(eventsDF(atGap)) == brute(atGap, gapUs))
    assert(sessions(eventsDF(past)).size == 2, "gap+1us events split")
    assert(sessions(eventsDF(past)) == brute(past, gapUs))
  }

  test("sessionize ≡ sequential replay on an LCG event stream") {
    var x = 5L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val es = (0L until 400L).map { id =>
      (id, math.floorMod(next(), 12L), math.floorMod(next(), 4L * 3600L * 1000000L))
    }
    assert(sessions(eventsDF(es)) == brute(es, 30L * 60L * 1000000L))
  }

  test("partition independence") {
    val es = (0L until 200L).map(i =>
      (i, i % 7, (i * 977L) % (3600L * 1000000L)))
    val one = sessions(eventsDF(es).repartition(1))
    val many = sessions(eventsDF(es).repartition(9))
    assert(one == many && one.nonEmpty)
  }

  test("null user/ts rows are dropped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Option(3L), Option(Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L)))),
      (2L, None, Option(Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L)))),
      (3L, Option(3L), None)
    ).toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(df, "user_id", "ts", "event_id").collect()
    assert(got.length == 1 && got(0).getLong(2) == 1L)
  }
}
