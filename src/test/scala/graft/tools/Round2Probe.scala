package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off measurements for round-2 oracle design: (a) exact-rank spread of
  * LSH-ANN results, (b) exhaustive-probe IVF ≡ brute force, (c) LSH
  * candidate coverage of the exact cosine near-dup pair set. */
object Round2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.FrontierBench.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)

    val exact50 = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ann = Similarity.lshTopK(q, emb, "vec_id", "embedding", 3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ranks = ann.map(p => exact50.getOrElse(p, 999))
    println(s"PROBE lsh results=${ann.length} maxExactRank=${ranks.max} " +
      s"distro=${ranks.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")

    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 3)
      .collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 3,
      nClusters = 16, nProbe = 16, iters = 2).collect().map(_.toSeq).toSet
    println(s"PROBE ivf exhaustive==bf: ${ivf == bf} (${ivf.size}/${bf.size})")

    val embD = emb.withColumn("embedding", col("embedding").cast("array<double>"))
    val exactPairs = Similarity.cosineNearDups(embD, "vec_id", "embedding", 400, dim = 64, tables = 0)
      .collect().map(_.toSeq).toSet
    println(s"PROBE exact pair cos_milli distro: min=${exactPairs.map(_(2).asInstanceOf[Long]).min} " +
      s"sorted=${exactPairs.map(_(2).asInstanceOf[Long]).toSeq.sorted.take(10)}")
    for ((tables, bits) <- Seq((32, 5), (48, 5), (64, 5))) {
      val t0 = System.nanoTime()
      val viaLsh = Similarity.cosineNearDups(embD, "vec_id", "embedding", 400,
        dim = 64, tables = tables, bits = bits).collect().map(_.toSeq).toSet
      println(f"PROBE neardup t${tables}b$bits equal=${viaLsh == exactPairs} " +
        s"missing=${(exactPairs -- viaLsh).size} sizes=${viaLsh.size}/${exactPairs.size} " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
