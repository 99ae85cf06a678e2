package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-local bloom state (D2 at scale): output equivalence with the
  * exact anti-join, incremental delta folding with no false negatives,
  * version replacement + pruning, and the crash superset rule. */
class BloomStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val Buckets = 8

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def urls(ids: Range): DataFrame =
    spark.range(ids.start, ids.end).toDF("id")
      .withColumn("url_canon", concat(lit("http://h"), col("id") % 7, lit(".com/p/"), col("id")))
      .withColumn("url_hash", xxhash64(col("url_canon")))
      .select("url_hash", "url_canon")

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-bloomstore-$tag").toString

  test("store-filtered dedup ≡ exact anti-join (aligned and unaligned)") {
    val dir = tmp("equiv")
    val seen = urls(0 until 400)
    val store = new BloomStore(spark, dir, Buckets, bucketCapacity = 1024)
    store.rebuild(seen, 0)
    val candidates = urls(300 until 700).withColumn("seq", monotonically_increasing_id())
    val exact = Dedup.antiJoinSeen(candidates, seen)
      .select("url_canon").collect().map(_.getString(0)).toSet
    for (aligned <- Seq(false, true)) {
      BloomStore.clearCache()
      val got = Dedup.antiJoinSeenWithBloomStore(candidates, seen, store, aligned)
        .select("url_canon").collect().map(_.getString(0)).toSet
      assert(got == exact, s"aligned=$aligned")
    }
    assert(exact == urls(400 until 700).collect().map(_.getString(1)).toSet)
  }

  test("incremental deltas: never a false negative; max-wave file wins; old pruned") {
    val dir = tmp("delta")
    val store = new BloomStore(spark, dir, Buckets, bucketCapacity = 1024)
    store.rebuild(urls(0 until 100), 0)
    store.writeDelta(urls(100 until 200), 1)
    store.writeDelta(urls(200 until 300), 2)
    val files = store.currentFiles()
    assert(files.nonEmpty)
    // lazy pruning (tail-write race fix): each bucket keeps AT MOST two
    // versions — the current one and the one live wave plans may still
    // hold paths to; anything older is pruned by the next delta
    val onDisk = Files.list(java.nio.file.Paths.get(dir, "bloom")).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(onDisk).asScala
      .map(_.getFileName.toString).filter(_.endsWith(".bloom")).toSeq
    val re = "b(\\d+)-w(\\d+)\\.bloom".r
    val byBucket = names.collect { case re(b, w) => (b.toInt, w.toInt) }.groupBy(_._1)
    byBucket.foreach { case (b, vs) =>
      assert(vs.size <= 2, s"bucket $b kept ${vs.size} versions: $vs")
      // the previous version kept is the immediately-superseded one
      if (vs.size == 2) assert(vs.map(_._2).max > vs.map(_._2).min)
    }
    // currentFiles picks the max-wave version per bucket
    files.foreach { case (b, path) =>
      assert(path.endsWith(s"b$b-w${byBucket(b).map(_._2).max}.bloom"))
    }
    // a filter may only over-approximate: every seen url must probe maybe
    BloomStore.clearCache()
    val probe = store.probeUdf(files)
    val misses = urls(0 until 300)
      .withColumn("__b", store.bucketIdCol(col("url_hash"), col("url_canon")))
      .withColumn("maybe", probe(col("__b"), col("url_hash")))
      .filter(!col("maybe")).count()
    assert(misses == 0L, "bloom false negative would re-admit a seen url")
  }

  test("crash re-run: rewriting the same wave's delta replaces the file atomically") {
    val dir = tmp("rerun")
    val store = new BloomStore(spark, dir, Buckets, bucketCapacity = 1024)
    store.rebuild(urls(0 until 50), 0)
    // wave 1 written, 'crash', wave 1 re-run with the same deterministic delta
    store.writeDelta(urls(50 until 120), 1)
    store.writeDelta(urls(50 until 120), 1)
    BloomStore.clearCache()
    val probe = store.probeUdf(store.currentFiles())
    val misses = urls(0 until 120)
      .withColumn("__b", store.bucketIdCol(col("url_hash"), col("url_canon")))
      .withColumn("maybe", probe(col("__b"), col("url_hash")))
      .filter(!col("maybe")).count()
    assert(misses == 0L)
  }

  test("crashed rebuild (bucket files, no completion marker) reads as empty") {
    val dir = tmp("crashed")
    val store = new BloomStore(spark, dir, Buckets, bucketCapacity = 1024)
    store.rebuild(urls(0 until 100), 0)
    assert(!store.isEmpty)
    // simulate a crash mid-rebuild: SOME bucket files exist but the
    // completion marker does not — trusting them would let probeUdf call
    // seen urls in marker-less buckets "definitely new" (superset-rule
    // violation, ADVICE r3)
    val marker = java.nio.file.Paths.get(dir, "bloom", "_complete")
    java.nio.file.Files.delete(marker)
    val aBucket = Files.list(java.nio.file.Paths.get(dir, "bloom")).iterator()
    val bloomFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(aBucket).asScala
      .filter(_.getFileName.toString.endsWith(".bloom")).toSeq
    java.nio.file.Files.delete(bloomFiles.head) // partial state
    assert(store.isEmpty, "marker-less debris must force a fresh rebuild")
    // the recovery path: rebuild restores a committed superset state
    store.rebuild(urls(0 until 100), 0)
    assert(!store.isEmpty)
    BloomStore.clearCache()
    val probe = store.probeUdf(store.currentFiles())
    val misses = urls(0 until 100)
      .withColumn("__b", store.bucketIdCol(col("url_hash"), col("url_canon")))
      .withColumn("maybe", probe(col("__b"), col("url_hash")))
      .filter(!col("maybe")).count()
    assert(misses == 0L)
  }

  test("empty store degrades to the exact anti-join") {
    val dir = tmp("empty")
    val store = new BloomStore(spark, dir, Buckets, bucketCapacity = 1024)
    assert(store.isEmpty)
    val seen = urls(0 until 100)
    val cands = urls(50 until 150)
    val got = Dedup.antiJoinSeenWithBloomStore(cands, seen, store)
      .select("url_canon").collect().map(_.getString(0)).toSet
    assert(got == urls(100 until 150).collect().map(_.getString(1)).toSet)
  }
}
