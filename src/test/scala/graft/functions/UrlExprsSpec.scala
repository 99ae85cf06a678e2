package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level behavior of the native URL expressions that the pure-Scala
  * kernel equivalence tests (UrlCanonSpec) cannot see. */
class UrlExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("UrlHost is nullable even over a non-nullable child (no authority → null)") {
    // concat over spark.range is non-nullable; authority-less strings make
    // the kernel return null — the expression must declare nullable=true so
    // codegen derives isNull from the result (a "non-nullable" null string
    // would corrupt downstream hash aggregation)
    val df = spark.range(3).select(concat(lit("no-authority-"), col("id")).as("u"))
    val projected = df.select(UrlExprs.urlHost(col("u")).as("h"))
    assert(projected.schema.head.nullable)
    val grouped = projected.groupBy(col("h")).count().collect()
    assert(grouped.length == 1 && grouped(0).isNullAt(0) && grouped(0).getLong(1) == 3L)
  }

  test("UrlHost null result survives a join key position (no NPE, rows drop)") {
    val df = spark.range(4).select(
      when(col("id") % 2 === 0, concat(lit("http://h"), col("id"), lit(".com/x")))
        .otherwise(concat(lit("relative/"), col("id"))).as("u"))
    val hosts = df.select(UrlExprs.urlHost(col("u")).as("host"))
    val dim = spark.range(10).select(concat(lit("h"), col("id"), lit(".com")).as("host"))
    // null join keys never match; the two well-formed rows do
    assert(hosts.join(dim, Seq("host")).count() == 2)
  }

  test("CanonicalizeUrl keeps null-in → null-out and non-null canonical output") {
    val df = spark.createDataFrame(Seq(
      Tuple1("HTTP://A.com/x#f"), Tuple1(null.asInstanceOf[String]))).toDF("u")
    val out = df.select(UrlExprs.canonicalizeUrl(col("u")).as("c")).collect()
    assert(out.map(r => Option(r.getString(0))).toSet ==
      Set(Some("http://a.com/x"), None))
  }
}
