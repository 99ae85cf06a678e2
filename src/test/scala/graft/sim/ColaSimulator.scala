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
    priorityOf: String => Int = _ => 0,
    // O8 classed mode (≙ the engine's pages.fetch_status column):
    // Some(map) where map(canon) = "server" marks present-but-erroring
    // pages; canons missing from `pages` are then network errors.
    pageStatus: Option[Map[String, String]] = None,
    // O7: per-host politeness quota override (≙ the engine's decayed
    // hostBudgets table); hosts not overridden keep settings.hostBudget
    hostBudgetOf: Map[String, Int] = Map.empty) {

  case class Entry(url: String, canon: String, host: String, priority: Int,
      depth: Int, seq: Long, var errorTimes: Int, bundle: Option[String] = None,
      var eligibleWave: Int = 0) // O8 span: not schedulable before this wave

  case class Scheduled(wave: Int, rank: Long, priority: Int, seq: Long,
      host: String, canon: String, depth: Int)

  val schedule = mutable.ArrayBuffer.empty[Scheduled]
  val seen = mutable.LinkedHashSet.empty[String]
  /** (canon, reason) — one row per reference error pack (_pack_error:
   *  server/default classes, ignored or not; network never packs) plus
   *  the engine-terminating records: non-ignored network exhaustion
   *  ("network_error") and poisoned-bundle survivors ("bundle_blocked"). */
  val dead = mutable.ArrayBuffer.empty[(String, String)]
  /** O7 banned-window evidence: (wave, host) -> (fetched, errors). */
  val hostMetrics = mutable.LinkedHashMap.empty[(Int, String), (Long, Long)]
  var applied = 0L
  var finished = 0L
  // O9 inc store: finished units in first-finish FIFO order (canon -> raw)
  private val incQueue = mutable.LinkedHashMap.empty[String, String]
  private var incPassesLeft = settings.incPasses
  // O10 in-bundle error_urls (executor.py:500-501): ignore-exhausted
  // BUNDLE members, first-exhaustion order, canon -> (raw, label). Retried
  // at the bundle's next pop — at wave granularity, the O9 inc pass
  // (execute() re-extends the worklist with error_urls, :559-560; put_inc
  // re-queues the bundle, :610-612). Members of a poisoned label never
  // retry (the terminal poisoned-bundle reading).
  private val bundleErrorUrls = mutable.LinkedHashMap.empty[String, (String, String)]
  private val poisonedLabels = mutable.Set.empty[String]

  private def waveBase(w: Int): Long = w.toLong << 40

  // P1/P2 rule table: ordered patterns, first match dispatches, no match
  // drops (cola/core/urls.py:48-73). Behaviors duplicated here on purpose
  // (structural independence from graft.operators.ParserDispatch).
  private val rules: Seq[(scala.util.matching.Regex, String)] =
    (if (settings.parsers.nonEmpty) settings.parsers.map(r => (r.pattern, r.parserId))
     else Seq((settings.urlPattern, "extract")))
      .map { case (p, id) => (("(?i)" + p).r, id) }
  private val followsLinks = Map("extract" -> true, "links" -> true, "leaf" -> false)

  private def parserOf(url: String): Option[String] =
    rules.collectFirst { case (re, id) if re.findFirstIn(url).isDefined => id }

  private def accepts(url: String): Boolean = parserOf(url).isDefined

  // F2/F3: links whose bundle-pattern capture group is non-empty discover
  // labels (routed to the bundle channel instead of the plain channel)
  private val bundleRe = settings.bundles.map(bs => ("(?i)" + bs.pattern).r)
  private def labelOf(url: String): Option[String] =
    bundleRe.flatMap(re => re.findFirstMatchIn(url).map(_.group(1)))
      .filter(s => s != null && s.nonEmpty)

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

      // step 1: host-eligible — rank within host by (priority, seq);
      // rows inside their per-class retry delay (span ≙ waves) never
      // enter the ranking this wave
      val byOrder = frontier.filter(_.eligibleWave <= w).sortBy(e => (e.priority, e.seq))
      val hostCount = mutable.Map.empty[String, Int].withDefaultValue(0)
      val eligible = byOrder.filter { e =>
        hostCount(e.host) += 1
        hostCount(e.host) <= hostBudgetOf.getOrElse(e.host, settings.hostBudget)
      }
      // step 2: per-priority quota, FIFO by seq
      val qs = quotas(grant)
      val scheduledEntries = (0 until settings.nPriorities).flatMap { p =>
        eligible.filter(_.priority == p).sortBy(_.seq).take(
          math.min(qs(p), Int.MaxValue).toInt)
      }
      if (scheduledEntries.isEmpty) {
        if (!frontier.exists(_.eligibleWave > w)) return
        wave = w // idle wave: delayed retries tick down (engine ≡)
      } else {
        applied += scheduledEntries.length

        val ordered = scheduledEntries.sortBy(e => (e.priority, e.seq))
        ordered.zipWithIndex.foreach { case (e, r) =>
          schedule += Scheduled(w, r.toLong, e.priority, e.seq, e.host, e.canon, e.depth)
        }

        val scheduledSet = ordered.map(_.canon).toSet
        val leftover = frontier.filterNot(e => scheduledSet.contains(e.canon))
        val retries = mutable.ArrayBuffer.empty[Entry]
        // bundles that had a non-ignored exhaustion this wave — the whole
        // bundle fails (UnitRetryFailed, executor.py:503-506): its
        // surviving rows leave the frontier at wave end
        val poisoned = mutable.Set.empty[String]
        // (parentSeq, linkIdx, memberIdx, rawUrl, bundle) — memberIdx 0 = plain link
        val candidates = mutable.ArrayBuffer.empty[(Long, Int, Int, String, Option[String])]
        val labelCands = mutable.ArrayBuffer.empty[(Long, Int, String)] // (parentSeq, linkIdx, label)

        ordered.foreach { e =>
          // O8: error class of this fetch — classed mode distinguishes
          // network (no page) from server (page present, erroring status)
          val status = pageStatus match {
            case Some(m) =>
              if (!pages.contains(e.canon)) "network" else m.getOrElse(e.canon, "ok")
            case None => if (!pages.contains(e.canon)) "default" else "ok"
          }
          { // O7 evidence: one fetch outcome per scheduled row
            val (f0, e0) = hostMetrics.getOrElse((w, e.host), (0L, 0L))
            hostMetrics((w, e.host)) =
              if (status == "ok") (f0 + 1, e0) else (f0, e0 + 1)
          }
          if (status != "ok") {
              applied -= 1 // error refund
              e.errorTimes += 1
              val (limit, ignore, span) = status match {
                case "default" => (settings.retries, false, settings.retrySpanWaves)
                case "network" => (settings.networkRetries, settings.networkIgnore,
                  settings.networkSpanWaves)
                case _         => (settings.serverRetries, settings.serverIgnore,
                  settings.serverSpanWaves)
              }
              if (limit < 0 || e.errorTimes <= limit) {
                e.eligibleWave = w + span // O8 span ≙ wave-delay
                retries += e
              }
              else {
                // exhausted: server/default pack an error record whether
                // ignored or not (_pack_error precedes the ignore branch,
                // executor.py:494-502); network never packs (pack=False)
                // but a non-ignored network exhaustion gets a terminal row
                val reason = status match {
                  case "default" => "fetch_miss"
                  case s         => s + "_error" + (if (ignore) "_ignored" else "")
                }
                if (status != "network" || !ignore) dead += ((e.canon, reason))
                if (!ignore) e.bundle.foreach(poisoned += _)
                // O10: an ignore-class exhaustion of a BUNDLE member joins
                // its bundle's error_urls (first exhaustion wins the order)
                if (ignore) e.bundle.foreach { lbl =>
                  if (!bundleErrorUrls.contains(e.canon))
                    bundleErrorUrls += e.canon -> ((e.url, lbl))
                }
              }
          } else pages.get(e.canon).foreach { html =>
              finished += 1
              if (!incQueue.contains(e.canon)) incQueue += e.canon -> e.url
              // P2: only link-following parsers feed the frontier; dispatch
              // on the raw url like the engine (executor.py:415)
              if (parserOf(e.url).exists(followsLinks)) {
                Extract.extractOutlinks(html, e.canon).zipWithIndex.foreach { case (out, li) =>
                  if (accepts(out)) {
                    labelOf(out) match {
                      case Some(label) => labelCands += ((e.seq, li, label))
                      case None =>
                        val canon = UrlCanon.canonicalize(out)
                        if (canon != e.canon) candidates += ((e.seq, li, 0, out, None))
                    }
                  }
                }
              }
          }
        }

        // F2/F3: label-seen gate (bundle://<label> in the same seen set),
        // then fresh labels expand to member urls joining the candidates
        settings.bundles.foreach { bs =>
          labelCands.sortBy(c => (c._1, c._2)).foreach { case (pSeq, li, label) =>
            val key = s"bundle://$label"
            if (!seen.contains(key)) {
              seen += key
              bs.memberUrls(label).zipWithIndex.foreach { case (m, mi) =>
                candidates += ((pSeq, li, mi + 1, m, Some(label)))
              }
            }
          }
        }

        // D1: in-batch first-seen then seen-set gate, discovery order
        val fresh = mutable.ArrayBuffer.empty[Entry]
        val parentDepth = ordered.map(e => e.seq -> e.depth).toMap
        candidates.sortBy(c => (c._1, c._2, c._3)).foreach { case (pSeq, _, _, raw, label) =>
          val canon = UrlCanon.canonicalize(raw)
          if (!seen.contains(canon)) {
            seen += canon
            fresh += Entry(raw, canon, UrlCanon.host(canon), clamp(priorityOf(canon)),
              parentDepth(pSeq) + 1, waveBase(w) + fresh.length, 0, label)
          }
        }
        // poisoned bundles: surviving rows leave the frontier, recorded as
        // blocked. One-wave removal is complete — the label is seen, so no
        // member of a failed bundle can be re-admitted later.
        val (blocked, surviving) = (leftover ++ retries ++ fresh)
          .partition(e => e.bundle.exists(poisoned))
        blocked.foreach(e => dead += ((e.canon, "bundle_blocked")))
        poisonedLabels ++= poisoned
        frontier = surviving
        // O9 automated re-crawl: frontier drained with budget left → one
        // pass over the inc store (first-finish FIFO), lowest priority,
        // bypassing the seen gate (put_inc force=True, node.py:181-184)
        if (frontier.isEmpty && settings.inc && incPassesLeft > 0 &&
            (settings.size < 0 || settings.size - applied > 0)) {
          incQueue.zipWithIndex.foreach { case ((canon, raw), i) =>
            frontier += Entry(raw, canon, UrlCanon.host(canon),
              settings.nPriorities - 1, 0, waveBase(w) + i, 0)
          }
          // O10: the pass ≙ re-popping every finished unit's bundle, so
          // each bundle's error_urls ride it too (executor.py:559-560) —
          // after the finished FIFO, first-exhaustion order, label kept
          // (a repeat exhaustion re-joins error_urls; a poisoned label's
          // members stay withheld). Units that later finished ride the
          // inc FIFO instead (the bundle worklist dedups, :596).
          bundleErrorUrls.iterator
            .filter { case (canon, (_, lbl)) =>
              !incQueue.contains(canon) && !poisonedLabels(lbl) }
            .zipWithIndex.foreach { case ((canon, (raw, lbl)), i) =>
              frontier += Entry(raw, canon, UrlCanon.host(canon),
                settings.nPriorities - 1, 0, waveBase(w) + incQueue.size + i, 0, Some(lbl))
            }
          incPassesLeft -= 1
        }
        wave = w
      } // else (non-idle wave)
    }
  }
}
