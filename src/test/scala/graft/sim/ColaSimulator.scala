package graft.sim

import scala.collection.mutable
import graft.functions.{Extract, UrlCanon}
import graft.plans.CrawlSettings

/**
 * In-memory reference model of the deterministic crawl contract
 * (SURVEY §5.2-1): Cola's semantics at the deterministic configuration —
 * dedup-at-discovery (cola/core/mq/store.py:252-254), FIFO within
 * priority (store.py:301-340), budget grants (functions/budget.py:137-146),
 * per-host politeness quota (the offline reading of functions/speed.py),
 * priority quotas ∝ 2^-i (task.py:66-69 deterministic equivalent), error
 * retry/refund (executor.py:319-328, budget.py:154-158).
 *
 * Deliberately implemented with plain lists/sets — structurally
 * independent of the Spark engine — so agreement is evidence, not
 * tautology. Shares only the pure functions (UrlCanon, Extract) whose
 * byte-level behavior is pinned by their own golden tests.
 */
class ColaSimulator(
    settings: CrawlSettings,
    pages: Map[String, String], // canon url -> html
    priorityOf: String => Int = _ => 0) {

  case class Entry(url: String, canon: String, host: String, priority: Int,
      depth: Int, seq: Long, var errorTimes: Int)

  case class Scheduled(wave: Int, rank: Long, priority: Int, seq: Long,
      host: String, canon: String, depth: Int)

  val schedule = mutable.ArrayBuffer.empty[Scheduled]
  val seen = mutable.LinkedHashSet.empty[String]
  val dead = mutable.ArrayBuffer.empty[String]
  var applied = 0L
  var finished = 0L

  private def waveBase(w: Int): Long = w.toLong << 40

  private val pattern = ("(?i)" + settings.urlPattern).r

  private def accepts(url: String): Boolean = pattern.findFirstIn(url).isDefined

  private def clamp(p: Int): Int = math.min(math.max(p, 0), settings.nPriorities - 1)

  private def quotas(grant: Long): Seq[Long] = {
    val n = settings.nPriorities
    val denom = (1L << n) - 1
    val base = (0 until n).map(i => grant * (1L << (n - 1 - i)) / denom)
    val rem = grant - base.sum
    base.zipWithIndex.map { case (q, i) => if (i < rem) q + 1 else q }
  }

  def run(seeds: Seq[String]): Unit = {
    var frontier = mutable.ArrayBuffer.empty[Entry]
    // wave 0: seed admission (S1 + D1/D6)
    seeds.map(_.trim).filter(_.nonEmpty).filter(accepts).zipWithIndex.foreach { case (raw, idx) =>
      val canon = UrlCanon.canonicalize(raw)
      if (!seen.contains(canon)) {
        seen += canon
        frontier += Entry(raw, canon, UrlCanon.host(canon), clamp(priorityOf(canon)),
          0, waveBase(0) + frontier.length, 0)
      }
    }
    var wave = 0
    while (frontier.nonEmpty && wave < settings.maxWaves &&
           (settings.size < 0 || finished < settings.size)) {
      val w = wave + 1
      val grant =
        if (settings.size < 0) settings.waveCap
        else math.min(settings.waveCap, settings.size - applied)
      if (grant <= 0) return

      // step 1: host-eligible — rank within host by (priority, seq)
      val byOrder = frontier.sortBy(e => (e.priority, e.seq))
      val hostCount = mutable.Map.empty[String, Int].withDefaultValue(0)
      val eligible = byOrder.filter { e =>
        hostCount(e.host) += 1
        hostCount(e.host) <= settings.hostBudget
      }
      // step 2: per-priority quota, FIFO by seq
      val qs = quotas(grant)
      val scheduledEntries = (0 until settings.nPriorities).flatMap { p =>
        eligible.filter(_.priority == p).sortBy(_.seq).take(
          math.min(qs(p), Int.MaxValue).toInt)
      }
      if (scheduledEntries.isEmpty) return
      applied += scheduledEntries.length

      val ordered = scheduledEntries.sortBy(e => (e.priority, e.seq))
      ordered.zipWithIndex.foreach { case (e, r) =>
        schedule += Scheduled(w, r.toLong, e.priority, e.seq, e.host, e.canon, e.depth)
      }

      val scheduledSet = ordered.map(_.canon).toSet
      val leftover = frontier.filterNot(e => scheduledSet.contains(e.canon))
      val retries = mutable.ArrayBuffer.empty[Entry]
      val candidates = mutable.ArrayBuffer.empty[(Long, Int, String)] // (parentSeq, linkIdx, rawUrl)

      ordered.foreach { e =>
        pages.get(e.canon) match {
          case None =>
            applied -= 1 // error refund
            e.errorTimes += 1
            if (e.errorTimes <= settings.retries) retries += e
            else dead += e.canon
          case Some(html) =>
            finished += 1
            Extract.extractOutlinks(html, e.canon).zipWithIndex.foreach { case (out, li) =>
              if (accepts(out)) {
                val canon = UrlCanon.canonicalize(out)
                if (canon != e.canon) candidates += ((e.seq, li, out))
              }
            }
        }
      }

      // D1: in-batch first-seen then seen-set gate, discovery order
      val fresh = mutable.ArrayBuffer.empty[Entry]
      val parentDepth = ordered.map(e => e.seq -> e.depth).toMap
      candidates.sortBy(c => (c._1, c._2)).foreach { case (pSeq, _, raw) =>
        val canon = UrlCanon.canonicalize(raw)
        if (!seen.contains(canon)) {
          seen += canon
          fresh += Entry(raw, canon, UrlCanon.host(canon), clamp(priorityOf(canon)),
            parentDepth(pSeq) + 1, waveBase(w) + fresh.length, 0)
        }
      }
      frontier = leftover ++ retries ++ fresh
      wave = w
    }
  }
}
