package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Partition-local persistent Bloom state (D2/D3 at 100 TB scale).
 *
 * The r2 design collected every bucket's filter into one driver map and
 * re-broadcast it per wave — at 10^10 seen URLs / fpr 0.01 that is
 * ~1.2 GB on the driver AND on every executor (VERDICT r2 Wrong #3).
 * This store keeps the filters as per-bucket FILES beside the bucketed
 * seen table, and probes them PARTITION-LOCALLY:
 *
 *  - **Bucket alignment.** The bloom bucket id is exactly Spark's
 *    storage-bucket function for the seen table's layout —
 *    `pmod(hash(url_hash, url_canon), numBuckets)` (HashPartitioning's
 *    partitionIdExpression: Murmur3 seed 42) — so repartitioning the
 *    candidate delta by (url_hash, url_canon) INTO numBuckets both (a)
 *    lands every row in the task that owns its bloom bucket and (b)
 *    satisfies the downstream anti-join's required distribution against
 *    the bucketed seen scan. The probe costs no exchange the join would
 *    not already have paid; each task loads ONE bucket's filter
 *    (executor-resident set = its own buckets, never the full state).
 *
 *  - **Immutable versioned files.** `<dir>/bloom/b<bucket>-w<wave>.bloom`
 *    holds the CUMULATIVE filter of all seen urls in that bucket through
 *    `wave`. Files are written once (tmp + atomic rename) and never
 *    mutated, so the executor-side cache keys on the path and can never
 *    serve a stale filter for it. Per wave only buckets with new urls
 *    get a new file (read current + fold delta + write next); older
 *    versions are deleted best-effort after the new one lands.
 *
 *  - **Crash safety (superset rule).** A bloom may only ever OVER-approximate
 *    the seen set: "maybe seen" rows go through the exact anti-join,
 *    while "definitely new" rows skip it — so a filter missing a seen
 *    url would re-admit it. Delta files are therefore written BEFORE the
 *    wave manifest commits: a crash between the two leaves a filter
 *    containing uncommitted urls (harmless false "maybe"), never one
 *    missing committed urls. Resume keeps using the max-wave file per
 *    bucket and the deterministic re-run converges it.
 *
 * Filesystem access goes through the Hadoop FileSystem API (the dir
 * resolves to HDFS/object-store on a real cluster; local fs here, same
 * assumption as [[graft.plans.Checkpoint]]).
 */
final class BloomStore(
    spark: SparkSession,
    val dir: String,
    val numBuckets: Int,
    bucketCapacity: Long,
    fpr: Double = 0.01,
    val kind: String = "bloom") extends Serializable {

  require(kind == "bloom" || kind == "cuckoo",
    s"seen-filter kind must be bloom|cuckoo: $kind")

  import BloomStore._

  @transient private lazy val fs: FileSystem =
    new Path(dir).getFileSystem(new Configuration())

  private def bloomDir: Path = new Path(dir, "bloom")

  /** Completion marker: written after the first successful writeDelta /
   *  rebuild. A crash mid-rebuild (delete dir → distributed re-write)
   *  otherwise leaves SOME buckets with files — `isEmpty` would read
   *  false, the caller would skip the rebuild, and buckets with no filter
   *  make [[probeUdf]] return false ("definitely new"), letting
   *  already-seen URLs bypass the exact anti-join (superset-rule
   *  violation). A missing marker is treated as "no state", forcing a
   *  fresh rebuild. */
  private def markerPath: Path = new Path(bloomDir, "_complete")

  /** The storage-bucket id of a (url_hash, url_canon) row — identical to
   *  the seen table's HashPartitioning bucket function. */
  def bucketIdCol(urlHash: Column, urlCanon: Column): Column =
    pmod(hash(urlHash, urlCanon), lit(numBuckets)).cast("int")

  /** Current (max-wave) bloom file per bucket. Empty map = no state yet. */
  def currentFiles(): Map[Int, String] = {
    if (!fs.exists(bloomDir)) return Map.empty
    val re = "b(\\d+)-w(\\d+)\\.bloom".r
    fs.listStatus(bloomDir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case re(b, w) => Some((b.toInt, w.toInt, st.getPath.toString))
          case _        => None
        }
      }
      .groupBy(_._1)
      .map { case (b, vs) => b -> vs.maxBy(_._2)._3 }
  }

  /** True when the store has no COMMITTED filter state: no completion
   *  marker (see [[markerPath]] — bucket files without a marker are the
   *  debris of a crashed rebuild and must not be trusted). */
  def isEmpty: Boolean = !fs.exists(markerPath)

  /** True when the store must be rebuilt before probing: no committed
   *  state, or the on-disk filters are of the OTHER kind (a checkpoint
   *  written with kind=bloom resumed under kind=cuckoo or vice versa —
   *  merging across kinds is impossible and probing a mismatched file
   *  would throw; a rebuild from the exact seen table re-establishes the
   *  superset rule under the configured kind). Reads one current file's
   *  4-byte header (the [[SeenFilter.fromBytes]] sign dispatch). */
  def needsRebuild: Boolean = {
    if (isEmpty) return true
    currentFiles().values.headOption.exists { path =>
      val in = fs.open(new Path(path))
      val head = try in.readInt() finally in.close()
      val onDisk = if (head < 0) "cuckoo" else "bloom"
      onDisk != kind
    }
  }

  /** Fold one wave's NEW urls (url_hash, url_canon) into the per-bucket
   *  filters, executor-side: aggregate delta filters per bucket (a tiny
   *  shuffle of numBuckets bloom blobs), then each task merges its
   *  buckets' deltas into the current files and writes the wave-`w`
   *  versions. No bloom bytes ever pass through the driver. Call BEFORE
   *  the wave manifest commit (superset rule above). */
  def writeDelta(delta: DataFrame, wave: Int): Unit = {
    val d = dir; val cap = bucketCapacity; val f = fpr; val k = kind
    delta
      .groupBy(bucketIdCol(col("url_hash"), col("url_canon")).as("bucket"))
      .agg(SeenFilter.aggCol(k, col("url_hash"), cap, f).as("bytes"))
      .select(col("bucket"), col("bytes"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val fsLocal = new Path(d).getFileSystem(new Configuration())
        it.foreach { r =>
          mergeAndWrite(fsLocal, new Path(d, "bloom"), r.getInt(0),
            r.getAs[Array[Byte]](1), wave)
        }
      }
    // commit: all bucket files for this delta are on disk. A crash BEFORE
    // this line leaves either (a) a marker-less dir — isEmpty forces a
    // rebuild — or (b) an already-committed store whose partial extra
    // files only over-approximate (harmless "maybe"): superset rule holds
    // in both regimes.
    if (!fs.exists(markerPath)) {
      fs.mkdirs(bloomDir)
      fs.create(markerPath, true).close()
    }
  }

  /** Rebuild the full filter state from a seen table (resume onto a
   *  checkpoint without bloom files, after changing capacity, or resume
   *  onto a crashed rebuild's marker-less debris). Crash-atomic via the
   *  completion marker: the delete drops the old marker, writeDelta
   *  re-creates it only after every bucket's file is written. */
  def rebuild(seen: DataFrame, wave: Int): Unit = {
    if (fs.exists(bloomDir)) fs.delete(bloomDir, true)
    writeDelta(seen.select(col("url_hash"), col("url_canon")), wave)
  }

  /** Probe column: TRUE when the row's bucket filter might contain its
   *  url_hash; rows of buckets with no filter yet are never "maybe".
   *  `files` must be [[currentFiles]] captured at plan-build time (the
   *  closure pins the immutable versions this wave reads). Marked
   *  nondeterministic for the same reason as the broadcast variant: the
   *  maybe/!maybe branch filters must not be pushed below the shared
   *  subtree, or its exchange is duplicated per branch. */
  def probeUdf(files: Map[Int, String]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bucket: Int, h: Long) =>
      files.get(bucket).exists(path => cachedFilter(bucket, path).mightContain(h))
    ).asNondeterministic()
}

object BloomStore {

  /** Executor-local filter cache: one entry per bucket, replaced when a
   *  newer wave's file shows up (paths are immutable-once-written, so a
   *  path hit can never be stale). Bounded by the buckets an executor
   *  actually probes — with the aligned repartition that is its own
   *  partition slice of the state, never the full set. */
  private val cache = new ConcurrentHashMap[Int, (String, SeenFilter)]()

  private[operators] def cachedFilter(bucket: Int, path: String): SeenFilter = {
    val hit = cache.get(bucket)
    if (hit != null && hit._1 == path) return hit._2
    val fs = new Path(path).getFileSystem(new Configuration())
    val in = fs.open(new Path(path))
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val filter = SeenFilter.fromBytes(bytes)
    cache.put(bucket, (path, filter))
    filter
  }

  /** Visible for tests: drop all executor-cached filters. */
  def clearCache(): Unit = cache.clear()

  /** Merge `deltaBytes` into bucket `b`'s current filter and write the
   *  wave-`w` version (tmp + atomic rename); prune older versions. */
  private def mergeAndWrite(fs: FileSystem, bloomDir: Path, b: Int,
      deltaBytes: Array[Byte], w: Int): Unit = {
    fs.mkdirs(bloomDir)
    val re = s"b$b-w(\\d+)\\.bloom".r
    val versions = fs.listStatus(bloomDir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case re(wv) => Some((wv.toInt, st.getPath))
        case _      => None
      }
    }
    val merged = versions.sortBy(-_._1).headOption match {
      case Some((_, cur)) =>
        val in = fs.open(cur)
        val curBytes = try in.readAllBytes() finally in.close()
        SeenFilter.mergeBytes(curBytes, deltaBytes)
      case None => deltaBytes
    }
    val target = new Path(bloomDir, s"b$b-w$w.bloom")
    val tmp = new Path(bloomDir, s".b$b-w$w.bloom.tmp")
    val out = fs.create(tmp, true)
    try out.write(merged) finally out.close()
    if (fs.exists(target)) fs.delete(target, false) // re-run of a crashed wave
    fs.rename(tmp, target)
    // LAZY prune (ADVICE r3 tail-write race): the version that was current
    // coming INTO this wave stays on disk one generation longer — live
    // wave plans (inc-reseed dedup, or a cache-evicted recompute of the
    // wave's dedup subtree) captured its path via currentFiles() at wave
    // start, and deleting it mid-wave would fail their tasks with
    // FileNotFound. It becomes prunable when a LATER delta supersedes it.
    // Disk cost: ≤ 2 versions per bucket, ever. This keeps the wave's
    // tail writes fully concurrent (no bloom-after-frontier ordering).
    val prevMax = versions.filter(_._1 != w).map(_._1).maxOption
    versions.filter(v => v._1 != w && !prevMax.contains(v._1))
      .foreach(v => fs.delete(v._2, false))
  }
}
