package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/**
 * Common contract of the approximate URL-seen pre-filters (the
 * "bloom/cuckoo URL-seen set" of the north rule): a serializable
 * set-membership sketch over 64-bit url hashes that may only ever
 * OVER-approximate its insertions — `put(h)` guarantees every later
 * `mightContain(h)` is true (no false negatives, the superset rule
 * [[BloomStore]] depends on), while false positives merely route a row
 * through the exact anti-join.
 */
trait SeenFilter extends Serializable {
  def put(hash64: Long): Unit
  def mightContain(hash64: Long): Boolean
  def toBytes: Array[Byte]
}

object SeenFilter {
  /** Wire-format dispatch: [[BloomFilter.toBytes]] leads with numBits
   *  (always > 0); [[CuckooFilter.toBytes]] leads with a negative magic
   *  int. */
  def fromBytes(bytes: Array[Byte]): SeenFilter =
    if (java.nio.ByteBuffer.wrap(bytes).getInt < 0) CuckooFilter.fromBytes(bytes)
    else BloomFilter.fromBytes(bytes)

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    (fromBytes(a), fromBytes(b)) match {
      case (x: BloomFilter, y: BloomFilter)   => x.merge(y).toBytes
      case (x: CuckooFilter, y: CuckooFilter) => x.merge(y).toBytes
      case _ => throw new IllegalStateException(
        "seen-filter kind mismatch on disk (bloom vs cuckoo) — switching " +
        "kinds on an existing checkpoint requires a filter rebuild")
    }

  /** Per-bucket filter-building aggregate for the configured kind. */
  def aggCol(kind: String, hashCol: Column, capacity: Long, fpr: Double): Column =
    kind match {
      case "bloom"  => BloomFilter.bloomAggCol(hashCol, capacity, fpr)
      case "cuckoo" => CuckooFilter.cuckooAggCol(hashCol, capacity)
      case other    => throw new IllegalArgumentException(
        s"unknown seen-filter kind '$other' (expected bloom|cuckoo)")
    }
}

/**
 * Cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher 2014, "Cuckoo
 * Filter: Practically Better Than Bloom") — the alternative URL-seen
 * pre-filter named by the north rule next to the Bloom (reference
 * counterpart: the same seen-set role as
 * cola/core/bloomfilter/__init__.py, different sketch).
 *
 * Layout: `nBuckets` (power of two) buckets × 4 slots × 16-bit
 * fingerprints, packed one bucket per Long (an empty slot is 0; a
 * fingerprint is never 0). An item hashes to bucket `i1` and its
 * partner `i2 = i1 XOR h(fp)` (partial-key cuckoo hashing — the XOR
 * makes the pair symmetric, so relocation needs only the resident
 * fingerprint, which is also what makes [[merge]] possible). Inserts
 * displace a resident fingerprint to its partner bucket for up to
 * `MaxKicks` rounds; the rare terminal victim goes to a tiny exact
 * `overflow` list rather than being dropped, so `put` UNCONDITIONALLY
 * upholds the no-false-negative contract (the paper's filter reports
 * insert failure instead; a pre-filter that can silently forget a seen
 * URL would re-admit it — [[BloomStore]]'s superset rule).
 *
 * Vs the Bloom at the same role: ~16 bits/entry against the 1%-fpr
 * Bloom's ~9.6, but a ~0.012% false-positive rate (2·4/2^16), O(2)
 * probe locality (two buckets against k=7 scattered bits), and support
 * for [[delete]] — which a Bloom fundamentally lacks and which a D3
 * capacity-eviction policy needs if evicted URLs must leave the sketch.
 * Deletion carries the paper's standard caveat: only delete items
 * actually inserted (a duplicate fingerprint of a DIFFERENT key in the
 * same bucket pair is indistinguishable, and removing it would create a
 * false negative for that key); duplicate insertions of the SAME key
 * stack (≤ 8 in the bucket pair, then overflow) and delete removes one
 * copy per call.
 *
 * Determinism note: like the BloomAgg, partition merge order inside a
 * Spark aggregate is nondeterministic, so the slot LAYOUT of a merged
 * filter can vary run to run; the membership contract (superset of all
 * inserted keys) holds for every order, which is the only property the
 * engine relies on (bloom-on ≡ bloom-off equality is the spec gate).
 */
final class CuckooFilter private (
    val nBuckets: Int,
    val slots: Array[Long],
    private var overflow: Array[Long],
    private var overflowLen: Int) extends SeenFilter {

  import CuckooFilter._

  def this(nBuckets: Int) = this(nBuckets, new Array[Long](nBuckets), Array.emptyLongArray, 0)

  require(Integer.bitCount(nBuckets) == 1, s"nBuckets must be a power of two: $nBuckets")
  private def mask: Int = nBuckets - 1

  /** Number of entries parked on the exact overflow list (observability:
   *  a growing overflow means the filter is past its design load). */
  def overflowSize: Int = overflowLen

  @inline private def slotFp(word: Long, s: Int): Int =
    ((word >>> (s * 16)) & 0xFFFFL).toInt

  @inline private def withSlot(word: Long, s: Int, fp: Int): Long =
    (word & ~(0xFFFFL << (s * 16))) | (fp.toLong << (s * 16))

  private def tryInsertAt(b: Int, fp: Int): Boolean = {
    val w = slots(b)
    var s = 0
    while (s < 4) {
      if (slotFp(w, s) == 0) { slots(b) = withSlot(w, s, fp); return true }
      s += 1
    }
    false
  }

  /** Insert a fingerprint whose CURRENT bucket is `b` (either of its two
   *  buckets — the XOR partner relation is symmetric). */
  private def insertFp(b0: Int, fp0: Int): Unit = {
    var b = b0
    var fp = fp0
    if (tryInsertAt(b, fp) || tryInsertAt(b ^ altOffset(fp, mask), fp)) return
    var kicks = 0
    while (kicks < MaxKicks) {
      // deterministic victim slot (no RNG — rotate by kick count)
      val s = kicks & 3
      val w = slots(b)
      val victim = slotFp(w, s)
      slots(b) = withSlot(w, s, fp)
      fp = victim
      b = b ^ altOffset(fp, mask)
      if (tryInsertAt(b, fp)) return
      kicks += 1
    }
    // terminal victim → exact overflow (superset rule over insert failure)
    if (overflowLen == overflow.length)
      overflow = java.util.Arrays.copyOf(overflow, math.max(8, overflow.length * 2))
    overflow(overflowLen) = pack(b, fp)
    overflowLen += 1
  }

  override def put(hash64: Long): Unit = {
    val fp = fingerprint(hash64)
    insertFp(bucketOf(hash64, mask), fp)
  }

  override def mightContain(hash64: Long): Boolean = {
    val fp = fingerprint(hash64)
    val i1 = bucketOf(hash64, mask)
    val i2 = i1 ^ altOffset(fp, mask)
    val w1 = slots(i1); val w2 = slots(i2)
    var s = 0
    while (s < 4) {
      if (slotFp(w1, s) == fp || slotFp(w2, s) == fp) return true
      s += 1
    }
    var i = 0
    while (i < overflowLen) {
      val b = unpackBucket(overflow(i)); val f = unpackFp(overflow(i))
      if (f == fp && (b == i1 || b == i2)) return true
      i += 1
    }
    false
  }

  /** Remove ONE stored copy of the key's fingerprint; true when found.
   *  Only call for keys known to have been inserted (class doc caveat). */
  def delete(hash64: Long): Boolean = {
    val fp = fingerprint(hash64)
    val i1 = bucketOf(hash64, mask)
    val i2 = i1 ^ altOffset(fp, mask)
    var bi = 0
    while (bi < 2) {
      val b = if (bi == 0) i1 else i2
      val w = slots(b)
      var s = 0
      while (s < 4) {
        if (slotFp(w, s) == fp) { slots(b) = withSlot(w, s, 0); return true }
        s += 1
      }
      bi += 1
    }
    var i = 0
    while (i < overflowLen) {
      val b = unpackBucket(overflow(i)); val f = unpackFp(overflow(i))
      if (f == fp && (b == i1 || b == i2)) {
        overflow(i) = overflow(overflowLen - 1)
        overflowLen -= 1
        return true
      }
      i += 1
    }
    false
  }

  /** Union by re-inserting the other filter's resident fingerprints (the
   *  partner relation is recoverable from (bucket, fp) alone). */
  def merge(other: CuckooFilter): CuckooFilter = {
    require(other.nBuckets == nBuckets,
      s"cuckoo shape mismatch: $nBuckets vs ${other.nBuckets}")
    var b = 0
    while (b < other.nBuckets) {
      val w = other.slots(b)
      if (w != 0L) {
        var s = 0
        while (s < 4) {
          val fp = slotFp(w, s)
          if (fp != 0) insertFp(b, fp)
          s += 1
        }
      }
      b += 1
    }
    var i = 0
    while (i < other.overflowLen) {
      insertFp(unpackBucket(other.overflow(i)), unpackFp(other.overflow(i)))
      i += 1
    }
    this
  }

  override def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + slots.length * 8 + overflowLen * 8)
    bb.putInt(Magic).putInt(nBuckets).putInt(overflowLen)
    slots.foreach(bb.putLong)
    var i = 0
    while (i < overflowLen) { bb.putLong(overflow(i)); i += 1 }
    bb.array()
  }
}

object CuckooFilter {
  /** Negative on purpose — [[SeenFilter.fromBytes]] dispatches on sign
   *  (a BloomFilter's leading numBits int is always positive). */
  private[operators] val Magic: Int = 0xCCF17E55 // < 0 as an Int
  private val MaxKicks = 500
  private val SlotsPerBucket = 4
  /** The paper's practical load ceiling for 4-slot tables. */
  private val TargetLoad = 0.95

  @inline private def mix(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 16-bit nonzero fingerprint. */
  @inline private[operators] def fingerprint(hash64: Long): Int = {
    val f = (mix(hash64) >>> 48).toInt & 0xFFFF
    if (f == 0) 1 else f
  }

  @inline private[operators] def bucketOf(hash64: Long, mask: Int): Int =
    (mix(hash64 ^ 0x5DEECE66DL) & mask).toInt

  /** Partner-bucket XOR offset from the fingerprint alone. */
  @inline private[operators] def altOffset(fp: Int, mask: Int): Int =
    (mix(fp.toLong) & mask).toInt

  @inline private def pack(bucket: Int, fp: Int): Long =
    (bucket.toLong << 16) | fp.toLong
  @inline private def unpackBucket(v: Long): Int = (v >>> 16).toInt
  @inline private def unpackFp(v: Long): Int = (v & 0xFFFFL).toInt

  /** Size for `capacity` keys at the paper's 0.95 load: the next power
   *  of two of capacity/(4·0.95) buckets (≥ 16). */
  def create(capacity: Long): CuckooFilter = {
    require(capacity > 0)
    val need = math.ceil(capacity / (SlotsPerBucket * TargetLoad)).toLong
    val n = math.max(16L, java.lang.Long.highestOneBit(math.max(1L, need - 1)) * 2)
    require(n <= (1L << 30), s"cuckoo bucket count too large: $n")
    new CuckooFilter(n.toInt)
  }

  def fromBytes(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt
    require(magic == Magic, f"not a cuckoo filter (magic 0x$magic%08X)")
    val n = bb.getInt
    val ovLen = bb.getInt
    val slots = new Array[Long](n)
    var i = 0
    while (i < n) { slots(i) = bb.getLong; i += 1 }
    val ov = new Array[Long](ovLen)
    i = 0
    while (i < ovLen) { ov(i) = bb.getLong; i += 1 }
    new CuckooFilter(n, slots, ov, ovLen)
  }

  /** Typed Aggregator building a per-group cuckoo filter from 64-bit url
   *  hashes (the [[BloomFilter.BloomAgg]] counterpart for kind=cuckoo). */
  final class CuckooAgg(capacity: Long)
      extends Aggregator[Long, CuckooFilter, Array[Byte]] {
    override def zero: CuckooFilter = create(capacity)
    override def reduce(b: CuckooFilter, h: Long): CuckooFilter = { b.put(h); b }
    override def merge(a: CuckooFilter, b: CuckooFilter): CuckooFilter = a.merge(b)
    override def finish(b: CuckooFilter): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[CuckooFilter] = Encoders.kryo[CuckooFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column building a cuckoo filter over a LongType hash column. */
  def cuckooAggCol(hashCol: Column, capacity: Long): Column =
    functions.udaf(new CuckooAgg(capacity)).apply(hashCol)
}
