package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LinkGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def edgesDF(es: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  private def ranksMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Exact sequential replay of the integer update rule. */
  private def bruteRank(es: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L, damping: Int = 85): Map[Long, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val base = (100L - damping) * scale / 100L
    var rank = nodes.map(_ -> scale).toMap
    (0 until iters).foreach { _ =>
      val inflow = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(n => n -> (base + damping * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRank: hand-computed 3-node graph, 2 iterations") {
    // 1→2, 1→3, 2→1; node 3 dangles (its mass leaks, by the rule)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 1L))
    val r1 = ranksMap(LinkGraph.pageRank(edgesDF(es), "src", "dst", iters = 1))
    assert(r1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = ranksMap(LinkGraph.pageRank(edgesDF(es), "src", "dst", iters = 2))
    assert(r2 == Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("pageRank: zero iterations returns the initial scale for every node") {
    val es = Seq((1L, 2L), (7L, 9L))
    val r = ranksMap(LinkGraph.pageRank(edgesDF(es), "src", "dst", iters = 0))
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 7L -> 1000000L, 9L -> 1000000L))
  }

  test("pageRank ≡ sequential replay on an LCG random graph, 5 iterations") {
    var x = 12345L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val es = (0 until 150).map { _ =>
      val s = math.floorMod(next(), 40L)
      val d = math.floorMod(next(), 40L)
      (s, d)
    }.filter { case (s, d) => s != d }.distinct
    val got = ranksMap(LinkGraph.pageRank(edgesDF(es), "src", "dst", iters = 5))
    assert(got == bruteRank(es, 5))
  }

  test("pageRank is partition-independent") {
    val es = (0L until 60L).map(i => (i % 12, (i * 7 + 3) % 12)).filter(p => p._1 != p._2).distinct
    val one = ranksMap(LinkGraph.pageRank(edgesDF(es).repartition(1), "src", "dst", iters = 4))
    val many = ranksMap(LinkGraph.pageRank(edgesDF(es).repartition(7), "src", "dst", iters = 4))
    assert(one == many)
  }

  test("withHostRank: frontier rows pick up their host's rank, missing hosts rank 0") {
    val s = spark
    import s.implicits._
    val ranks = Seq((1L, 500000L), (2L, 900000L)).toDF("node", "rank")
    val frontier = Seq((1L, "a"), (2L, "b"), (5L, "c")).toDF("host_id", "url")
    val out = LinkGraph.withHostRank(frontier, ranks, "host_id")
      .select("url", "host_rank").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 500000L, "b" -> 900000L, "c" -> 0L))
  }
}
