package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Host-graph link analysis for crawl prioritization: PageRank over the
 * (src_host → dst_host) outlink graph, the classic importance-ordered
 * crawl-scheduling signal (Cho & Garcia-Molina, "Efficient Crawling
 * Through URL Ordering", WWW 1998). The reference schedules purely by
 * breadth + per-job priority (`cola/job/task.py`); this operator is the
 * training-data-pipeline extension: rank hosts by link structure and
 * feed the rank into the politeness/priority stage as a tiebreak.
 *
 * All arithmetic is integer fixed-point (micro-units, floor division) so
 * the result is EXACTLY reproducible by any engine — no IEEE drift, no
 * convergence tolerance. The update rule per iteration is
 *
 *   share(s)  = rank(s) div outdeg(s)             (floor; dangling hosts
 *                                                  contribute nothing)
 *   rank'(d)  = base + (damping * Σ_{s→d} share(s)) div 100
 *
 * with `base = ((100 - damping) * scale) div 100` and rank₀ = scale for
 * every node. Ranks stay bounded by base + damping% of total mass, so
 * BIGINT never overflows for any graph below ~10^11 nodes at the default
 * scale.
 *
 * Scale (10^8-host graph): the edge list joined with out-degrees is
 * iteration-constant — it is materialized ONCE (localCheckpoint) and
 * every iteration reuses its (src-hashed) partitioning for the rank
 * join. The inflow aggregate `groupBy(dst).sum` partial-aggregates
 * map-side, so a mega-hub destination (the in-degree skew case) combines
 * before its single exchange. Each iteration ends in an eager
 * localCheckpoint: the rank frame's lineage stays O(1) across rounds —
 * without it the self-referential loop doubles the logical plan per
 * iteration (the label-propagation OOM, TextDedup.propagateComponents).
 */
object LinkGraph {

  /** PageRank after exactly `iters` rounds of the integer update rule.
   *  Input: an edge list (srcCol: long, dstCol: long); parallel edges
   *  count once each (pre-distinct if you want simple-graph semantics).
   *  Output: (node: long, rank: long), one row per node appearing as
   *  src or dst. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L, damping: Int = 85): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iters, scale, damping, materialize = true)

  /** `materialize = false` skips the per-round localCheckpoint so probes
   *  can inspect the composed update plan (R4PlanProbe / BENCH/PLANS.md).
   *  Production callers MUST materialize: the self-referential loop
   *  otherwise doubles the logical plan per iteration. */
  private[graft] def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long, damping: Int, materialize: Boolean): DataFrame = {
    require(iters >= 0, s"iterations must be non-negative: $iters")
    require(scale > 0, s"scale must be positive: $scale")
    require(damping >= 0 && damping <= 100, s"damping must be in [0,100]: $damping")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // iteration-constant and consumed every round (the rank rebuild's
    // left side) — materialize once instead of re-running the distinct
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    // iteration-constant: every edge with its source's out-degree,
    // partitioned by src (the join key of every round) — materialize once
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = e.join(outdeg, "src").localCheckpoint(true)
    val base = ((100L - damping) * scale) / 100L
    var ranks = nodes.withColumn("rank", lit(scale)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val inflow = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div deg").as("share"))
        .groupBy("node").agg(sum("share").as("inflow"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($damping * coalesce(inflow, 0L)) div 100"))
            .as("rank"))
      // eager checkpoint per round: O(1) lineage (propagateComponents'
      // plan-doubling lesson); superseded rank blocks age out via LRU
      ranks = if (materialize) next.localCheckpoint(true) else next
      i += 1
    }
    ranks
  }

  /** Rank-prioritized frontier: joins each frontier row's host id to its
   *  PageRank and exposes `host_rank` (missing hosts rank 0) for the
   *  scheduling stage to order by. Broadcast is left to AQE — a host
   *  rank table is one row per host and usually broadcastable, but at
   *  10^8 hosts it must shuffle; no unbounded hint (the r3 O7 lesson). */
  def withHostRank(frontier: DataFrame, ranks: DataFrame,
      hostIdCol: String): DataFrame =
    frontier.join(ranks.withColumnRenamed("node", hostIdCol), Seq(hostIdCol), "left")
      .withColumn("host_rank", coalesce(col("rank"), lit(0L))).drop("rank")
}
