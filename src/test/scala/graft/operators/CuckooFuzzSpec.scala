package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-fuzz for the cuckoo seen-filter (the repo's offline-cache
  * scalacheck idiom — fixed seeds, deterministic forever). The central
  * property is the one [[BloomStore]]'s superset rule rests on: over
  * ARBITRARY key multisets (duplicates, adversarial low-entropy
  * clusters), arbitrary chunk splits merged in arbitrary order, a
  * serialization round-trip, and deletes of once-inserted keys, an
  * inserted-and-not-deleted key is NEVER reported absent. A false
  * negative would re-admit a seen URL — silent crawl-order divergence —
  * so these properties gate harder than the unit vectors in CuckooSpec. */
class CuckooFuzzSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[T](g: Gen[T], n: Int = 120)(f: T => Unit): Unit =
    samples(g, n).foreach(f)

  // key generators: spread (hash-like), clustered (sequential ids — the
  // low-entropy shape that stresses bucket locality), and duplicated
  private val keySet: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 3000)
    mode <- Gen.choose(0, 2)
    base <- Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)
  } yield mode match {
    case 0 => (0 until n).map(i => base + i * 0x9E3779B97F4A7C15L) // spread
    case 1 => (0 until n).map(i => base + i)                       // clustered
    case _ => (0 until n).map(i => base + (i % math.max(1, n / 3))) // duplicates
  }

  test("property: inserted keys are always contained, even past design load") {
    forAll(keySet) { ks =>
      // deliberately undersized half the time (capacity < n exercises
      // the kick loop and the exact overflow list)
      val f = CuckooFilter.create(math.max(16, ks.length / 2))
      ks.foreach(f.put)
      assert(ks.forall(f.mightContain),
        s"false negative on n=${ks.length} overflow=${f.overflowSize}")
    }
  }

  test("property: chunked build + merge in arbitrary order is a superset of all chunks") {
    val g = for {
      ks <- keySet
      chunks <- Gen.choose(2, 7)
      reverse <- Gen.oneOf(true, false)
    } yield (ks, chunks, reverse)
    forAll(g, n = 80) { case (ks, chunks, reverse) =>
      val cap = math.max(16, ks.length) // same shape across chunks (merge requires it)
      val parts = ks.grouped(math.max(1, ks.length / chunks)).toSeq
      val filters = parts.map { p =>
        val f = CuckooFilter.create(cap); p.foreach(f.put); f
      }
      val ordered = if (reverse) filters.reverse else filters
      val merged = ordered.reduce((a, b) => a.merge(b))
      assert(ks.forall(merged.mightContain),
        s"merge lost a key: n=${ks.length} chunks=$chunks overflow=${merged.overflowSize}")
    }
  }

  test("property: serialization round-trip preserves membership exactly") {
    forAll(keySet, n = 80) { ks =>
      val f = CuckooFilter.create(math.max(16, ks.length / 2))
      ks.foreach(f.put)
      val rt = CuckooFilter.fromBytes(f.toBytes)
      assert(ks.forall(rt.mightContain), "round-trip lost a key")
      // and the round-trip answers identically on a disjoint probe set
      val probes = (0 until 500).map(i => 0x6C078965L * i - 0x61C88647L)
      probes.foreach { p =>
        assert(f.mightContain(p) == rt.mightContain(p), s"probe $p diverged")
      }
    }
  }

  test("property: deleting once-inserted keys never creates a false negative for the rest") {
    // distinct keys, each inserted exactly once: fingerprint collisions
    // STACK (one stored copy per insert), so deleting one key removes
    // exactly its own copy — every surviving key stays contained (the
    // class-doc deletion caveat concerns deleting keys NEVER inserted)
    forAll(keySet, n = 80) { ks0 =>
      val ks = ks0.distinct
      val f = CuckooFilter.create(math.max(16, ks.length))
      ks.foreach(f.put)
      val (gone, kept) = ks.zipWithIndex.partition(_._2 % 2 == 0)
      gone.foreach { case (k, _) => assert(f.delete(k), s"delete($k) found nothing") }
      assert(kept.forall { case (k, _) => f.mightContain(k) },
        s"delete created a false negative (n=${ks.length})")
    }
  }

  test("property: false-positive rate stays sane across shapes") {
    // aggregate over many generated filters: disjoint probes hitting a
    // ~half-loaded filter should false-positive well under 1% (the
    // bloom's design rate; the cuckoo's theoretical rate is ~0.012%)
    var fp = 0L; var probes = 0L
    samples(keySet, 60).foreach { ks =>
      val f = CuckooFilter.create(math.max(64, ks.length * 2))
      ks.foreach(f.put)
      val inserted = ks.toSet
      (0 until 2000).foreach { i =>
        val p = 0x5851F42D4C957F2DL * (i + 1) + 0x14057B7EF767814FL
        if (!inserted.contains(p)) {
          probes += 1
          if (f.mightContain(p)) fp += 1
        }
      }
    }
    val rate = fp.toDouble / probes
    assert(rate < 0.01, f"aggregate fp rate $rate%.5f over $probes probes")
  }
}
