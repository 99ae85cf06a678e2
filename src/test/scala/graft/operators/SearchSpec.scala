package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docsDF(ds: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    ds.toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Seq[(String, Long, Long, Long)] =
    df.select("query_id", "doc_id", "score", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._4))

  /** Exact sequential replay of the integer scoring rule (same formula,
   *  same floor divisions — an independent implementation, not a call
   *  into the operator). */
  private def brute(ds: Seq[(Long, String)], queries: Seq[(String, String)],
      k: Int, k1: Long = 1200L, b: Long = 750L): Seq[(String, Long, Long, Long)] = {
    def toks(t: String): Seq[String] =
      Option(t).getOrElse("").trim.split("\\s+").filter(_.nonEmpty).toSeq
    val lens = ds.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val n = ds.size.toLong
    val tot = lens.values.sum
    val avgMilli = tot * 1000 / n
    val tf = ds.flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case ((id, w), g) => (id, w) -> g.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    queries.flatMap { case (qid, qtext) =>
      val terms = toks(qtext).distinct
      val scores = ds.flatMap { case (id, _) =>
        val s = terms.map { w =>
          tf.get((id, w)).fold(0L) { f =>
            val idf = (n - df(w) + 1) * 10000 / (df(w) + 1)
            val lenratio = lens(id) * 1000000 / avgMilli
            val inner = 1000 - b + (b * lenratio) / 1000
            val denom = f * 1000 + (k1 * inner) / 1000
            val tfnorm = f * (k1 + 1000) * 1000 / denom
            idf * tfnorm / 1000
          }
        }.sum
        if (terms.exists(w => tf.contains((id, w)))) Some(id -> s) else None
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._4))
  }

  test("bm25TopK ≡ sequential replay on an LCG corpus") {
    var x = 7L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val vocab = Seq("spark", "join", "merge", "scan", "filter", "table", "row", "agg")
    val ds = (0L until 60L).map { id =>
      val len = (math.floorMod(next(), 9L) + 1).toInt
      (id, (0 until len).map(_ => vocab(math.floorMod(next(), 8L).toInt)).mkString(" "))
    }
    val qs = Seq("a" -> "spark join", "b" -> "filter", "c" -> "scan table row")
    assert(rows(Search.bm25TopK(docsDF(ds), "text", "doc_id", qs, k = 5)) ==
      brute(ds, qs, k = 5))
  }

  test("absent terms contribute nothing; all-absent query returns no rows") {
    val ds = Seq((1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma"))
    val qs = Seq("q" -> "alpha nosuchword", "dead" -> "nada zip")
    val got = rows(Search.bm25TopK(docsDF(ds), "text", "doc_id", qs, k = 10))
    assert(got.map(_._1).toSet == Set("q"))
    assert(got == brute(ds, qs, k = 10))
  }

  test("rank is deterministic: score desc then doc_id asc, capped at k") {
    // two identical docs tie on score; the lower id must rank first
    val ds = Seq((9L, "x y"), (4L, "x y"), (7L, "x"), (2L, "z"))
    val got = rows(Search.bm25TopK(docsDF(ds), "text", "doc_id", Seq("q" -> "x y"), k = 2))
    assert(got.map(_._4) == Seq(1L, 2L))
    assert(got.map(_._2) == Seq(4L, 9L)) // tie broken by id
    assert(got == brute(ds, Seq("q" -> "x y"), k = 2))
  }

  test("partition independence") {
    val ds = (0L until 40L).map(i => (i, s"w${i % 5} w${i % 3} w${i % 7}"))
    val qs = Seq("q" -> "w0 w2 w4")
    val one = rows(Search.bm25TopK(docsDF(ds).repartition(1), "text", "doc_id", qs, 8))
    val many = rows(Search.bm25TopK(docsDF(ds).repartition(7), "text", "doc_id", qs, 8))
    assert(one == many)
  }

  test("query-batch DataFrame form ≡ Seq form on the same queries") {
    val s = spark
    import s.implicits._
    var x = 11L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val vocab = Seq("spark", "join", "merge", "scan", "filter", "table", "row", "agg")
    val ds = (0L until 50L).map { id =>
      val len = (math.floorMod(next(), 9L) + 1).toInt
      (id, (0 until len).map(_ => vocab(math.floorMod(next(), 8L).toInt)).mkString(" "))
    }
    val qs = Seq("a" -> "spark join", "b" -> "filter agg row", "c" -> "merge")
    val viaSeq = rows(Search.bm25TopK(docsDF(ds), "text", "doc_id", qs, k = 5))
    val viaDf = rows(Search.bm25TopK(docsDF(ds), "text", "doc_id",
      qs.toDF("query_id", "terms"), k = 5))
    assert(viaDf == viaSeq && viaDf.nonEmpty)
  }

  test("10^3-query batch: no giant In predicate, corpus pruned via semi-join") {
    val s = spark
    import s.implicits._
    // 1000 queries over a 2000-term vocabulary — the VERDICT r4 hazard:
    // an isin would compile one 2000-literal In predicate into codegen
    val ds = (0L until 80L).map(i => (i, (0 until 6).map(j => s"t${(i * 7 + j * 13) % 500}").mkString(" ")))
    val qdf = (0 until 1000).map(q =>
        (s"q$q", s"t${q % 500} t${(q * 3 + 1) % 2000} t${(q * 5 + 2) % 2000}"))
      .toDF("query_id", "terms")
    val out = Search.bm25TopK(docsDF(ds), "text", "doc_id", qdf, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains(" IN ("), "query vocabulary leaked into an In-list predicate")
    assert(plan.contains("LeftSemi"), s"expected a semi-join prune:\n${plan.take(2000)}")
    // spot-check one query against the sequential replay
    val got = rows(out.filter(col("query_id") === "q0"))
    val want = brute(ds, Seq("q0" -> "t0 t1 t2"), k = 3)
    assert(got == want)
  }

  test("plan: per-query top-k compiles to WindowGroupLimit (partial before the exchange)") {
    val ds = (0L until 30L).map(i => (i, "common words here"))
    val plan = Search.bm25TopK(docsDF(ds), "text", "doc_id", Seq("q" -> "common"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }
}
