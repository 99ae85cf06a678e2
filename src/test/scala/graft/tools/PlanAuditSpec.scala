package graft.tools

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regression gate over every SparkEntry query's physical plan: no query
  * may silently pick up a SortAggregate (struct-valued min/min_by
  * demotion), a cartesian/nested-loop join, or a single-partition
  * Exchange. By-design exceptions live in PlanAudit.ByDesign with a
  * one-line justification each — a new flag fails here and must either
  * be fixed or justified there. */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("no query plan degrades to sort-agg / cartesian / single-partition (audit = 0 flags)") {
    val flags = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(flags.isEmpty, flags.map { case (q, f) => s"$q: $f" }.mkString("\n"))
  }
}
