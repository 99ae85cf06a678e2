package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spider-trap detection (Traps) + freshness re-crawl scheduling
  * (Recrawl): hand vectors, a brute-force property sweep, determinism
  * under partitioning, and the plan pins (projection-only gate; one
  * exchange shared by the rate window+aggregate; WindowGroupLimit on
  * the host top-k). */
class TrapsRecrawlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def urlsDF(us: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    us.zipWithIndex.map { case (u, i) => (u, i.toLong) }.toDF("url", "seq")
  }

  private def detectMap(us: Seq[String]): Map[String, (Int, Int, Int, Int)] =
    Traps.detect(urlsDF(us)).collect().map { r =>
      r.getString(0) -> ((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    }.toMap

  // ---- Traps: hand vectors ----

  test("traps: depth, repetition, and param counts on hand vectors") {
    val m = detectMap(Seq(
      "http://h.com/a/b/c",
      "http://h.com/a/b/a/b/a",
      "http://h.com/a/b/c/d/e/f",
      "http://h.com/",
      "http://h.com",
      "http://h.com/p?a=1&b=2",
      "http://h.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7",
      "http://h.com/p?x=1#frag",
      "https://h.com/a/a/a",
      "notaurl"))
    assert(m("http://h.com/a/b/c") === ((3, 1, 0, 0)))
    // 'a' occurs 3x -> repetition trap even though depth is within bounds
    assert(m("http://h.com/a/b/a/b/a") === ((5, 3, 0, 1)))
    assert(m("http://h.com/a/b/c/d/e/f") === ((6, 1, 0, 1)))
    assert(m("http://h.com/") === ((0, 0, 0, 0)))
    assert(m("http://h.com") === ((0, 0, 0, 0)))
    assert(m("http://h.com/p?a=1&b=2") === ((1, 1, 2, 0)))
    assert(m("http://h.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7") === ((1, 1, 7, 1)))
    // the fragment never counts into the query
    assert(m("http://h.com/p?x=1#frag") === ((1, 1, 1, 0)))
    assert(m("https://h.com/a/a/a") === ((3, 3, 0, 1)))
    // unparseable URL -> no path, no trap verdict (the admission regex
    // upstream is the gate for garbage; traps only bound URL SHAPE)
    assert(m("notaurl") === ((0, 0, 0, 0)))
  }

  test("traps: filterTraps keeps schema and drops exactly the flagged rows") {
    val us = Seq(
      "http://h.com/a/b/c",
      "http://h.com/a/b/a/b/a",
      "http://h.com/x?a=1&b=2&c=3&d=4&e=5&f=6&g=7")
    val kept = Traps.filterTraps(urlsDF(us))
    assert(kept.columns.toSeq === Seq("url", "seq"))
    assert(kept.collect().map(_.getString(0)).toSeq === Seq("http://h.com/a/b/c"))
  }

  // ---- Traps: brute-force property ----

  /** Plain-Scala reference of the three rules. */
  private def bruteForce(url: String): (Int, Int, Int, Int) = {
    val pm = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)".r
    val path = pm.findFirstMatchIn(url).map(_.group(1)).getOrElse("")
    val segs = path.split("/", -1).filter(_.nonEmpty).toSeq
    val depth = segs.size
    val rep = if (segs.isEmpty) 0 else segs.groupBy(identity).values.map(_.size).max
    val qm = "\\?([^#]*)".r
    val q = qm.findFirstMatchIn(url).map(_.group(1)).getOrElse("")
    val nParams = if (q.isEmpty) 0 else q.split("&", -1).length
    val trap = if (depth > 5 || rep > 2 || nParams > 6) 1 else 0
    (depth, rep, nParams, trap)
  }

  test("traps: detect ≡ brute force on 400 LCG-shaped URLs") {
    var s = 42L
    def nxt(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L; (((s >>> 33) % n) + n).toInt % n }
    val urls = (0 until 400).map { _ =>
      val host = s"h${nxt(5)}.example.com"
      val segs = (0 until nxt(9)).map(_ => s"s${nxt(4)}")
      val q = nxt(3) match {
        case 0 => ""
        case 1 => "?" + (0 until 1 + nxt(9)).map(i => s"k$i=${nxt(10)}").mkString("&")
        case _ => "?" + (0 until 1 + nxt(9)).map(i => s"k$i=${nxt(10)}").mkString("&") + "#f" + nxt(10)
      }
      s"http://$host${segs.map("/" + _).mkString}$q"
    }
    val got = detectMap(urls)
    urls.distinct.foreach { u =>
      assert(got(u) === bruteForce(u), s"mismatch on $u")
    }
  }

  test("traps: plan is a pure projection (no exchange, no aggregate)") {
    val plan = Traps.detect(urlsDF(Seq("http://h.com/a/b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(!plan.contains("Aggregate"), s"unexpected aggregate in:\n$plan")
  }

  // ---- Recrawl ----

  private def snapsDF(rows: Seq[(String, Long, Int, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    // (url, day, sig, tie)
    rows.toDF("url", "day", "sig", "tie")
  }

  test("recrawl: change rates on hand vectors (incl. single-obs and zero-span)") {
    val rates = Recrawl.changeRates(snapsDF(Seq(
      ("u1", 0L, 1, 1L), ("u1", 10L, 1, 2L), ("u1", 20L, 2, 3L),
      ("u2", 5L, 7, 1L),
      ("u3", 5L, 1, 1L), ("u3", 5L, 2, 2L), ("u3", 5L, 1, 3L))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // u1: 1 change over 20 days -> 50 milli-changes/day
    assert(rates("u1") === ((3L, 1L, 20L, 50L)))
    // a single observation can't evidence change
    assert(rates("u2") === ((1L, 0L, 0L, 0L)))
    // same-day flapping: changes counted (tie order), but zero span -> rate 0
    assert(rates("u3") === ((3L, 2L, 0L, 0L)))
  }

  test("recrawl: rate estimate is partitioning-invariant (tie columns make the order total)") {
    var s = 7L
    def nxt(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L; (((s >>> 33) % n) + n).toInt % n }
    val rows = (0 until 500).map { i =>
      (s"u${nxt(20)}", nxt(40).toLong, nxt(4), i.toLong)
    }
    val a = Recrawl.changeRates(snapsDF(rows)).collect().map(_.toSeq).toSet
    val b = Recrawl.changeRates(snapsDF(scala.util.Random.shuffle(rows)).repartition(7))
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("recrawl: schedule keeps top-k per host by rate desc, url asc; plan uses WindowGroupLimit") {
    val s0 = spark
    import s0.implicits._
    val rates = Seq(
      ("h1", "u1", 5L), ("h1", "u2", 9L), ("h1", "u3", 9L), ("h1", "u4", 1L),
      ("h2", "u5", 0L))
      .toDF("host", "url", "rate_milli")
    val out = Recrawl.schedule(rates, 2)
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
      Seq(("h1", "u2"), ("h1", "u3"), ("h2", "u5")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("recrawl: the window and the per-url aggregate share one exchange") {
    val plan = Recrawl.changeRates(snapsDF(Seq(("u1", 0L, 1, 1L))))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val n = "Exchange".r.findAllIn(plan).size
    assert(n === 1, s"expected exactly one exchange, got $n in:\n$plan")
  }
}
