package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Ad-hoc profiler for the embedding-cosine near-dup query (guide §1):
  * candidate-volume stats plus a timed A/B of the two candidate-join
  * shapes (bucket-local verify vs slim candidates + vector re-attach).
  * Diagnostics only — never part of the driver contract. */
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = FrontierBench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $tag%-32s min=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      spark.catalog.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    println(s"[prof] embeddings=${emb.count()}")

    val dim = 64; val tables = 48; val bits = 5
    val sigUdf = graft.operators.Similarity.signaturesUdf(dim, tables, bits)
    val clean = emb.filter(col("embedding").isNotNull)
    val buckets = clean.select(col("vec_id").as("id"),
        posexplode(sigUdf(col("embedding"))).as(Seq("table", "bucket")))
    val candRaw = buckets.as("x").join(buckets.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    println(s"[prof] bucket rows=${buckets.count()} candRaw=${candRaw.count()} candDistinct=${candRaw.distinct().count()}")

    time("stage: buckets only") { noop(buckets) }
    time("stage: candRaw") { noop(candRaw) }
    time("stage: candDistinct") { noop(candRaw.distinct()) }
    val bucketsR = buckets.repartition(64, col("table"), col("bucket"))
    val candR = bucketsR.as("x").join(bucketsR.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    time("stage: candDistinct repart64") { noop(candR.distinct()) }
    val d = candR.distinct(); noop(d)
    println(s"[prof] distinct output partitions=${d.rdd.getNumPartitions}")
    time("full query") {
      noop(Similarity.cosineNearDups(emb, "vec_id", "embedding", 400, dim = 64,
        tables = 48, bits = 5))
    }
    println(Similarity.cosineNearDups(emb, "vec_id", "embedding", 400, dim = 64,
      tables = 48, bits = 5).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
  }
}
