package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PageMetaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def metaOf(html: String, key: String): Option[String] = {
    val s = spark
    import s.implicits._
    Seq(Option(html)).toDF("h")
      .select(PageMeta.metaContent(col("h"), key).as("v"))
      .collect().map(r => Option(r.getString(0))).head
  }

  test("metaContent: orders, quotes, casing; content case preserved; absent null") {
    assert(metaOf("""<meta property="og:title" content="My Title">""", "og:title")
      == Some("My Title"))
    // content-first order, attribute casing
    assert(metaOf("""<META CONTENT="Rev Title" PROPERTY="og:title">""", "og:title")
      == Some("Rev Title"))
    // name= instead of property=, single quotes
    assert(metaOf("<meta name='og:title' content='Q Title'>", "og:title")
      == Some("Q Title"))
    // first occurrence wins
    assert(metaOf("""<meta property="og:title" content="A"><meta property="og:title" content="B">""",
      "og:title") == Some("A"))
    // other keys don't leak; empty content reads as absent
    assert(metaOf("""<meta property="og:type" content="article">""", "og:title").isEmpty)
    assert(metaOf("""<meta property="og:title" content="">""", "og:title").isEmpty)
    assert(metaOf("<p>nothing</p>", "og:title").isEmpty)
    assert(metaOf(null, "og:title").isEmpty)
    // key is validated as a literal
    intercept[IllegalArgumentException](PageMeta.metaContent(lit("x"), "og:(title"))
  }

  test("jsonLdField: first block, malformed JSON null, missing field null") {
    val s = spark
    import s.implicits._
    def ld(html: String, path: String): Option[String] =
      Seq(Option(html)).toDF("h")
        .select(PageMeta.jsonLdField(col("h"), path).as("v"))
        .collect().map(r => Option(r.getString(0))).head
    val page = """<script type="application/ld+json">
      {"headline": "The Headline", "datePublished": "2023-12-01"}</script>"""
    assert(ld(page, "$.headline") == Some("The Headline"))
    assert(ld(page, "$.datePublished") == Some("2023-12-01"))
    assert(ld(page, "$.author").isEmpty)
    assert(ld("""<script type="application/ld+json">{broken</script>""", "$.headline").isEmpty)
    assert(ld("<script>var x = 1;</script>", "$.headline").isEmpty)
    assert(ld(null, "$.headline").isEmpty)
  }

  test("standardSidecar is a pure projection (no Exchange)") {
    val s = spark
    import s.implicits._
    val plan = Seq("<p>x</p>").toDF("h")
      .select(PageMeta.standardSidecar(col("h")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")
  }
}
