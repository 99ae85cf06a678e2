package graft.tools

import org.apache.spark.sql.functions._
import graft.FrontierBench

/** Bisect where embed_ann_lsh spends time. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = FrontierBench.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime(); val n = f
        println(f"LSH $tag rep=$r ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      }
    }
    t("scan")(emb.count())
    val q = emb.filter(col("vec_id") < 20)
    val exact = graft.operators.Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((tables, bits) <- Seq((32, 5), (16, 10), (16, 12), (24, 12), (12, 14))) {
      var ann: Set[(Long, Long)] = Set.empty
      t(s"t${tables}_b$bits") {
        val res = graft.operators.Similarity.lshTopK(
          q, emb, "vec_id", "embedding", 3, dim = 64, tables = tables, bits = bits).collect()
        ann = res.map(r => (r.getLong(0), r.getLong(1))).toSet
        res.length.toLong
      }
      println(f"LSH t${tables}_b$bits recall=${(exact intersect ann).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
