package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object IvfProbeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1"); nProbe <- Seq(4, 6, 8); topK <- Seq(10, 20)) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 20)
      val ann = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 3, nClusters = 16, nProbe = nProbe, iters = 2)
      val exactK = Similarity.bruteForceTopK(
        q.withColumn("embedding", col("embedding").cast("array<double>")),
        emb.withColumn("embedding", col("embedding").cast("array<double>")),
        "vec_id", "embedding", topK)
        .select(col("query_id"), col("neighbor_id")).withColumn("__in", lit(1))
      val joined = ann.join(exactK, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("__in"), lit(0))).as("hits"))
        .collect()
      val bad = joined.filter(r => r.getLong(1) != 3 || r.getLong(2) != 3)
      println(s"== $sf nProbe=$nProbe topK=$topK queries=${joined.length} bad=${bad.length} ${bad.map(_.toString).mkString(" ")}")
    }
    spark.stop()
  }
}
