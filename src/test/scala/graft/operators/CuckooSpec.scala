package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cuckoo seen-filter (north rule "bloom/cuckoo URL-seen"): the
  * unconditional no-false-negative contract (incl. the overflow path past
  * design load), false-positive sanity, delete/merge semantics, wire
  * format dispatch, and drop-in equivalence inside [[BloomStore]] with
  * kind=cuckoo — including the kind-switch rebuild gate. */
class CuckooSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // deterministic key stream (no Random in tests)
  private def keys(n: Int, seed: Long = 0L): Seq[Long] =
    (0 until n).map(i => i * 0x9E3779B97F4A7C15L + seed)

  test("no false negatives at design load") {
    val f = CuckooFilter.create(10000)
    val ks = keys(10000)
    ks.foreach(f.put)
    assert(ks.forall(f.mightContain), "inserted key reported absent")
  }

  test("no false negatives PAST design load (overflow path)") {
    // 3x the sized capacity: kicks must fail for some keys; the overflow
    // list (not insert failure) is what upholds the superset rule
    val f = CuckooFilter.create(1000)
    val ks = keys(3000, seed = 7L)
    ks.foreach(f.put)
    assert(f.overflowSize > 0, "expected the overfilled table to overflow")
    assert(ks.forall(f.mightContain), "overflowed key reported absent")
  }

  test("false-positive rate is sane (well under the bloom's 1%)") {
    val f = CuckooFilter.create(10000)
    keys(10000).foreach(f.put)
    val probes = keys(20000, seed = 999999L) // disjoint from inserted
    val fps = probes.count(f.mightContain)
    // expected ~2*4/2^16 ≈ 0.012% → ~2.4 of 20000; allow generous slack
    assert(fps < 60, s"fp count $fps of ${probes.size}")
  }

  test("delete removes an inserted key; duplicates stack one per delete") {
    val f = CuckooFilter.create(1000)
    val ks = keys(100, seed = 13L)
    ks.foreach(f.put)
    assert(f.mightContain(ks(5)))
    assert(f.delete(ks(5)))
    assert(!f.mightContain(ks(5)), "deleted key still reported present")
    // duplicate insertions: two copies need two deletes
    f.put(ks(7)); // now stored twice
    assert(f.delete(ks(7)) && f.mightContain(ks(7)),
      "first delete of a duplicate must leave one copy")
    assert(f.delete(ks(7)) && !f.mightContain(ks(7)))
    assert(!f.delete(ks(5)), "double delete must report not-found")
  }

  test("merge ≡ union (incl. overflowed entries)") {
    val a = CuckooFilter.create(500)
    val b = CuckooFilter.create(500)
    val ka = keys(700, seed = 1L) // overfill a little so overflow merges too
    val kb = keys(700, seed = 2L)
    ka.foreach(a.put)
    kb.foreach(b.put)
    a.merge(b)
    assert((ka ++ kb).forall(a.mightContain), "merged filter lost a key")
  }

  test("serialization roundtrip preserves membership and overflow") {
    val f = CuckooFilter.create(300)
    val ks = keys(900, seed = 21L)
    ks.foreach(f.put)
    val back = CuckooFilter.fromBytes(f.toBytes)
    assert(back.overflowSize == f.overflowSize)
    assert(ks.forall(back.mightContain))
    // and through the kind-dispatching entry point
    val dispatched = SeenFilter.fromBytes(f.toBytes)
    assert(dispatched.isInstanceOf[CuckooFilter])
    assert(ks.forall(dispatched.mightContain))
  }

  test("wire dispatch: bloom bytes stay bloom; cross-kind merge throws") {
    val bloom = BloomFilter.create(1000)
    keys(100).foreach(bloom.put)
    assert(SeenFilter.fromBytes(bloom.toBytes).isInstanceOf[BloomFilter])
    val cuckoo = CuckooFilter.create(1000)
    keys(100).foreach(cuckoo.put)
    intercept[IllegalStateException] {
      SeenFilter.mergeBytes(bloom.toBytes, cuckoo.toBytes)
    }
  }

  // ---- drop-in inside the store ----

  private def urls(ids: Range): DataFrame =
    spark.range(ids.start, ids.end).toDF("id")
      .withColumn("url_canon", concat(lit("http://h"), col("id") % 7, lit(".com/p/"), col("id")))
      .withColumn("url_hash", xxhash64(col("url_canon")))
      .select("url_hash", "url_canon")

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-cuckoo-$tag").toString

  test("store-filtered dedup with kind=cuckoo ≡ exact anti-join") {
    val dir = tmp("equiv")
    val seen = urls(0 until 400)
    val store = new BloomStore(spark, dir, 8, bucketCapacity = 1024, kind = "cuckoo")
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
  }

  test("incremental cuckoo deltas keep the superset rule across waves") {
    val dir = tmp("delta")
    val store = new BloomStore(spark, dir, 8, bucketCapacity = 1024, kind = "cuckoo")
    store.rebuild(urls(0 until 200), 0)
    store.writeDelta(urls(200 until 500), 1)
    BloomStore.clearCache()
    val files = store.currentFiles()
    val probe = store.probeUdf(files)
    val all = urls(0 until 500)
      .withColumn("bucket", store.bucketIdCol(col("url_hash"), col("url_canon")))
      .withColumn("maybe", probe(col("bucket"), col("url_hash")))
    assert(all.filter(!col("maybe")).count() == 0L,
      "a seen url read 'definitely new' after a delta fold")
  }

  test("kind switch on an existing checkpoint forces a rebuild") {
    val dir = tmp("switch")
    val seen = urls(0 until 300)
    val asBloom = new BloomStore(spark, dir, 8, bucketCapacity = 1024, kind = "bloom")
    asBloom.rebuild(seen, 0)
    assert(!asBloom.needsRebuild)
    val asCuckoo = new BloomStore(spark, dir, 8, bucketCapacity = 1024, kind = "cuckoo")
    assert(asCuckoo.needsRebuild, "cuckoo store must not trust bloom files")
    asCuckoo.rebuild(seen, 0)
    assert(!asCuckoo.needsRebuild)
    BloomStore.clearCache()
    val probe = asCuckoo.probeUdf(asCuckoo.currentFiles())
    val all = seen
      .withColumn("bucket", asCuckoo.bucketIdCol(col("url_hash"), col("url_canon")))
      .withColumn("maybe", probe(col("bucket"), col("url_hash")))
    assert(all.filter(!col("maybe")).count() == 0L)
  }
}
