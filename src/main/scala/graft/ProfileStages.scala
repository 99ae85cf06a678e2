package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Ad-hoc stage profiler for the optimization round (guide §1): times the
  * internal stages of the expensive operators with a noop sink so the cost
  * of each stage is visible in isolation. Diagnostics only — never part of
  * the driver contract. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = FrontierBench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $tag%-28s min=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      spark.catalog.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[prof] docs=${docs.count()}")

    // ---- minhash pipeline stages ----
    time("collapseExact") {
      val (reps, members) = TextDedup.collapseExact(docs, "text", "doc_id")
      noop(reps); noop(members)
    }
    val (reps, _) = TextDedup.collapseExact(docs, "text", "doc_id")
    time("shingleHashes(reps)") { noop(TextDedup.shingleHashes(reps, "text", "id", 3)) }
    val sh = TextDedup.shingleHashes(reps, "text", "id", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[prof] shingle rows=${sh.count()} distinct=${sh.select("shingle").distinct().count()}")
    time("minhashSignatures(cached sh)") { noop(TextDedup.minhashSignatures(sh, 64)) }
    val sig = TextDedup.minhashSignatures(sh, 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count()
    time("banding+candidates(cached)") {
      val bands = 32; val rowsPerBand = 2
      val banded = sig.select(col("id"), posexplode(
          expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), b))"))
          .as(Seq("band", "bucket")))
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b"))
        .distinct()
      noop(candidates)
    }
    val bands = 32; val rowsPerBand = 2
    val banded = sig.select(col("id"), posexplode(
        expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), b))"))
        .as(Seq("band", "bucket")))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[prof] candidate pairs=${candidates.count()}")
    time("jaccardForPairs(cached cand)") {
      noop(TextDedup.jaccardForPairs(candidates, sh, 800))
    }
    if (sys.env.contains("PROF_JFP")) {
      val cand = candidates.select(col("a"), col("b")).distinct()
      val candIds = cand.select(col("a").as("id"))
        .union(cand.select(col("b").as("id"))).distinct()
      time("jfp: candIds") { noop(candIds) }
      val sets = sh.join(candIds, Seq("id"), "left_semi")
        .groupBy(col("id")).agg(collect_list(col("shingle")).as("set"))
      time("jfp: sets aggregate") { noop(sets) }
      val inter = cand
        .join(sets.select(col("id").as("a"), col("set").as("__sa")), Seq("a"))
        .join(sets.select(col("id").as("b"), col("set").as("__sb")), Seq("b"))
      time("jfp: attach joins") { noop(inter) }
      time("jfp: full verify") {
        noop(TextDedup.jaccardForPairs(candidates, sh, 800))
      }
    }
    sh.unpersist(); sig.unpersist(); candidates.unpersist()
    time("minhashLshDuplicates e2e") {
      noop(TextDedup.minhashLshDuplicates(docs, "text", "doc_id"))
    }

    // ---- ngram jaccard stages ----
    val shAll = TextDedup.shingleHashes(docs, "text", "doc_id", 3)
    time("jaccardPairs maxDf=32 e2e") { noop(TextDedup.jaccardPairs(shAll, 500, maxDf = 32)) }

    // ---- simhash stages ----
    val planted = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
    time("simhash signatures") { noop(TextDedup.simhash(planted, "text", "doc_id")) }
    val sigs = TextDedup.simhash(planted, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    time("simhash cand+verify(cached)") {
      noop(TextDedup.verifyHamming(TextDedup.simhashCandidates(sigs, 3, 6), 3))
    }
    sigs.unpersist()
    time("simhashDuplicates e2e") {
      noop(TextDedup.simhashDuplicates(planted, "text", "doc_id", maxDist = 3, nBlocks = 6))
    }

    // ---- embedding cosine near-dup stages ----
    if (sys.env.contains("PROF_EMB")) {
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      println(s"[prof] vectors=${emb.count()}")
      time("embCosine e2e") {
        noop(Similarity.cosineNearDups(emb, "vec_id", "embedding", 400, dim = 64,
          tables = 48, bits = 5))
      }
    }
    spark.stop()
  }
}
