package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Corpus-assembly operators for training-data pipelines: deterministic
 * stratified sampling and token-budget shard packing. Both are pure
 * functions of the input rows — identical output at any parallelism —
 * so they cross-check exactly against a single-node SQL oracle.
 */
object Corpus {

  /** Deterministic stratified sample: the k lexicographically-first docs
   *  per stratum by `md5(id ':' stratum)` — a keyed pseudo-random order
   *  that any engine reproduces exactly (no RNG state, no seed plumbing).
   *
   *  Scale: the `row_number <= k` filter compiles to WindowGroupLimit,
   *  so each mapper keeps only its local top-k per stratum before the
   *  single per-stratum exchange — the same partial-limit shape as the
   *  politeness top-k (BENCH/PLANS.md §3); a giant stratum never
   *  materializes more than k rows per task. Output = input columns +
   *  `sample_rank` (1-based within stratum). Strata must be non-null:
   *  Spark's concat nulls the key for a null stratum (ordering it first)
   *  while SQL oracles typically skip nulls in concat — null strata rows
   *  are dropped up front so both engines agree. */
  def sampleStratified(df: DataFrame, strataCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    df.filter(col(strataCol).isNotNull)
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(":"), col(strataCol))))
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(col(strataCol)).orderBy(col("__h"), col(idCol)))
          .cast(LongType))
      .filter(col("sample_rank") <= k)
      .drop("__h")
  }

  /** Token-budget shard packing: documents in `idCol` order are laid out
   *  contiguously and cut into shards of ~`budget` tokens each —
   *  `shard = floor(exclusivePrefixSum(tokens) / budget)`. A document
   *  starts a new shard exactly when the tokens before it cross a budget
   *  multiple, so every shard's total lands within one document of the
   *  budget, and the assignment is a pure function of the sorted prefix
   *  sums (identical at any parallelism).
   *
   *  A window cumsum over an empty partition spec would single-task the
   *  corpus; this is the engine's dense-seq pattern (CrawlJob.withDenseSeq)
   *  with a running-sum payload: sort by id (range exchange), one
   *  per-partition pass gives the driver P partial sums (bounded: one
   *  Long per partition), scanLeft turns them into exact global offsets,
   *  and a second partition-local pass assigns shards at the InternalRow
   *  level (no external-Row boxing). Output: (idCol, n_tokens, shard). */
  def packShards(df: DataFrame, idCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"shard budget must be positive: $budget")
    val spark = df.sparkSession
    val sorted = df.select(col(idCol),
        coalesce(col(tokensCol).cast(LongType), lit(0L)).as("n_tokens"))
      .orderBy(col(idCol))
    val schema = sorted.schema.add("shard", LongType, nullable = false)
    val rdd0 = sorted.queryExecution.toRdd
    val sums = rdd0.mapPartitions { it =>
      var s = 0L
      while (it.hasNext) s += it.next().getLong(1)
      Iterator.single(s)
    }.collect() // bounded driver state: one Long per partition
    val offsets = sums.scanLeft(0L)(_ + _)
    val rdd = rdd0.mapPartitionsWithIndex { (p, it) =>
      val joined = new JoinedRow()
      val shardRow = new GenericInternalRow(1)
      var run = offsets(p)
      it.map { r =>
        shardRow.update(0, run / budget)
        run += r.getLong(1)
        joined(r, shardRow): InternalRow
      }
    }
    ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
  }

  /**
   * Concat-and-chunk sequence packing (the GPT-2/-3 pretraining layout:
   * documents concatenated in a deterministic order, then cut into
   * fixed-length training sequences, documents SPLIT across sequence
   * boundaries — vs [[packShards]], which never splits a document, and
   * [[chunkDocs]], which windows within one). Documents in `idCol`
   * order get a global token start offset (exclusive prefix sum); each
   * doc then emits one row per training sequence it overlaps:
   * `(seq_id, id, n_frag_tokens, frag_md5)` where `seq_id =
   * tokenOffset div seqLen` and the fragment is the doc's token
   * sub-range landing in that sequence. Every sequence holds exactly
   * `seqLen` tokens (the last may be short); empty docs emit nothing.
   * Pure function of the rows — identical at any parallelism.
   *
   * Scale: the offset is the same dense-seq prefix-sum bridge as
   * [[packShards]] (driver state = one Long per partition, never a
   * global window); the boundary explode is map-side `sequence()` over
   * at most `n/seqLen + 1` elements per doc — a doc only fans out as
   * wide as the sequences it actually spans. Offsets use exact integer
   * `div` (no double rounding at 10^13+ global token counts). Like
   * [[packShards]], the sorted input is evaluated twice (partial-sums
   * pass + layout pass) — cache upstream if it is expensive.
   */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"sequence length must be positive: $seqLen")
    val spark = df.sparkSession
    val sorted = df.select(col(idCol), wordTokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast(LongType))
      .orderBy(col(idCol))
    val schema = sorted.schema.add("__start", LongType, nullable = false)
    val rdd0 = sorted.queryExecution.toRdd
    val sums = rdd0.mapPartitions { it =>
      var s = 0L
      while (it.hasNext) s += it.next().getLong(2)
      Iterator.single(s)
    }.collect() // bounded driver state: one Long per partition
    val offsets = sums.scanLeft(0L)(_ + _)
    val rdd = rdd0.mapPartitionsWithIndex { (p, it) =>
      val joined = new JoinedRow()
      val startRow = new GenericInternalRow(1)
      var run = offsets(p)
      it.map { r =>
        startRow.update(0, run)
        run += r.getLong(2)
        joined(r, startRow): InternalRow
      }
    }
    ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"), col("__n"), col("__start"),
        explode(sequence(
          expr(s"__start div $seqLen"),
          expr(s"(__start + __n - 1) div $seqLen"))).as("seq_id"))
      .select(col("seq_id"), col(idCol),
        greatest(lit(0L), col("seq_id") * seqLen - col("__start")).as("__from"),
        least(col("__n"), (col("seq_id") + 1) * seqLen - col("__start")).as("__until"),
        col("__t"))
      .select(col("seq_id"), col(idCol),
        (col("__until") - col("__from")).as("n_frag_tokens"),
        md5(array_join(
          slice(col("__t"), (col("__from") + 1).cast("int"),
            (col("__until") - col("__from")).cast("int")), " ")).as("frag_md5"))
  }

  /** Source-weighted corpus mixing (the dolma/RedPajama-style mixing
   *  step): each source contributes documents up to its own token budget,
   *  chosen in the deterministic keyed-md5 order (the same engine-
   *  portable pseudo-random order as [[sampleStratified]]) — keep a doc
   *  iff the tokens of the docs BEFORE it within its source (exclusive
   *  prefix sum in `md5(id ':' source)` order, id tiebreak) are still
   *  under the source's budget. Every source lands within one document
   *  of its budget, and the selection is a pure function of the rows.
   *
   *  `budgetCol` is evaluated against the INPUT frame (typically a
   *  function of the source column — per-source weights × total tokens).
   *
   *  Scale: a per-source window cumsum would funnel each source into one
   *  task (a giant source ≙ the J5 mega-host). This is the engine's
   *  dense-seq/prefix-sum pattern grouped by source: global sort by
   *  (source, hash, id) — a range exchange, sources contiguous — then
   *  one per-partition pass collects ORDERED (source, partial-sum) runs
   *  (driver state ≤ partitions + sources rows), scanLeft per source
   *  yields exact start offsets, and a second partition-local pass
   *  filters at the InternalRow level. No window, no per-source task.
   *  Output: (idCol, source, n_tokens). Null sources are dropped (the
   *  [[sampleStratified]] rule). */
  def mixSources(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, budgetCol: Column): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.filter(col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"), col(idCol).as("id"),
        coalesce(col(tokensCol).cast(LongType), lit(0L)).as("n_tokens"),
        budgetCol.cast(LongType).as("__budget"),
        md5(concat(col(idCol).cast("string"), lit(":"), col(sourceCol))).as("__h"))
      .orderBy(col("source"), col("__h"), col("id"))
    val rdd0 = sorted.queryExecution.toRdd
    // pass 1: ordered per-source partial sums per partition
    val partials = rdd0.mapPartitionsWithIndex { (p, it) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var curSrc: String = null
      var s = 0L
      it.foreach { r =>
        val src = r.getUTF8String(0).toString
        if (src != curSrc) {
          if (curSrc != null) runs += ((curSrc, s))
          curSrc = src; s = 0L
        }
        s += r.getLong(2)
      }
      if (curSrc != null) runs += ((curSrc, s))
      Iterator.single((p, runs.toSeq))
    }.collect().sortBy(_._1) // bounded driver state: ≤ partitions + sources
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    val seen = scala.collection.mutable.HashMap.empty[String, Long]
    partials.foreach { case (p, runs) =>
      runs.foreach { case (src, s) =>
        offsets((p, src)) = seen.getOrElse(src, 0L)
        seen(src) = seen.getOrElse(src, 0L) + s
      }
    }
    val bc = spark.sparkContext.broadcast(offsets.toMap)
    // pass 2: partition-local exclusive-prefix filter (rows arrive in the
    // same (source, hash, id) order as pass 1 — same sorted RDD)
    val rdd = rdd0.mapPartitionsWithIndex { (p, it) =>
      val off = bc.value
      var curSrc: String = null
      var run = 0L
      it.filter { r =>
        val src = r.getUTF8String(0).toString
        if (src != curSrc) { curSrc = src; run = off.getOrElse((p, src), 0L) }
        val keep = run < r.getLong(3)
        run += r.getLong(2)
        keep
      }
    }
    ColumnBridge.internalCreateDataFrame(spark, rdd, sorted.schema)
      .select(col("id").as(idCol), col("source").as(sourceCol), col("n_tokens"))
  }

  /**
   * CCNet-style per-source quality buckets (Wenzek et al. 2020,
   * "CCNet: Extracting High Quality Monolingual Datasets from Web
   * Crawl Data" — the head/middle/tail split): rank each document
   * within its source by `(score, id)` ascending and cut the source
   * into `nBuckets` equal-count buckets, `bucket = pos·nBuckets/n` —
   * bucket 0 is the best (lowest-score, e.g. lowest-perplexity) head,
   * the last the tail. Pure function of the rows (exact, not an
   * approximate percentile), identical at any parallelism.
   *
   * Scale: the textbook `ntile() over (partition by source)` funnels
   * each source into ONE window task (the J5 mega-host trap — a
   * 10^9-doc source would sort on a single core). This is the
   * [[mixSources]] two-pass dense-seq pattern instead: global sort by
   * (source, score, id) — a range exchange, sources contiguous across
   * partitions — pass 1 collects ordered per-source COUNT runs
   * (driver state ≤ partitions + sources rows), and pass 2 assigns
   * positions partition-locally at the InternalRow level. Output:
   * (idCol, sourceCol, scoreCol, bucket). Null sources are dropped,
   * null scores coalesce to 0 (the [[mixSources]] rules).
   */
  def scoreBuckets(df: DataFrame, sourceCol: String, idCol: String,
      scoreCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"bucket count must be positive: $nBuckets")
    val spark = df.sparkSession
    val sorted = df.filter(col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"), col(idCol).as("id"),
        coalesce(col(scoreCol).cast(LongType), lit(0L)).as("score"))
      .orderBy(col("source"), col("score"), col("id"))
    val rdd0 = sorted.queryExecution.toRdd
    // pass 1: ordered per-source row-count runs per partition
    val partials = rdd0.mapPartitionsWithIndex { (p, it) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var curSrc: String = null
      var c = 0L
      it.foreach { r =>
        val src = r.getUTF8String(0).toString
        if (src != curSrc) {
          if (curSrc != null) runs += ((curSrc, c))
          curSrc = src; c = 0L
        }
        c += 1L
      }
      if (curSrc != null) runs += ((curSrc, c))
      Iterator.single((p, runs.toSeq))
    }.collect().sortBy(_._1) // bounded driver state: ≤ partitions + sources
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    partials.foreach { case (p, runs) =>
      runs.foreach { case (src, c) =>
        offsets((p, src)) = totals.getOrElse(src, 0L)
        totals(src) = totals.getOrElse(src, 0L) + c
      }
    }
    val bcOff = spark.sparkContext.broadcast(offsets.toMap)
    val bcTot = spark.sparkContext.broadcast(totals.toMap)
    val schema = sorted.schema.add("bucket", LongType, nullable = false)
    val nb = nBuckets.toLong
    // pass 2: partition-local position → bucket (same sorted RDD order)
    val rdd = rdd0.mapPartitionsWithIndex { (p, it) =>
      val off = bcOff.value
      val tot = bcTot.value
      val joined = new JoinedRow()
      val bRow = new GenericInternalRow(1)
      var curSrc: String = null
      var pos = 0L
      var n = 1L
      it.map { r =>
        val src = r.getUTF8String(0).toString
        if (src != curSrc) {
          curSrc = src
          pos = off.getOrElse((p, src), 0L)
          n = math.max(tot.getOrElse(src, 1L), 1L)
        }
        bRow.update(0, pos * nb / n)
        pos += 1L
        joined(r, bRow): InternalRow
      }
    }
    ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
      .select(col("id").as(idCol), col("source").as(sourceCol),
        col("score").as(scoreCol), col("bucket"))
  }

  /** Fixed-window document chunking (the tokenize→chunk step between
   *  cleaning and shard packing): each doc's token stream is cut into
   *  windows of `chunkSize` tokens starting every `stride` tokens
   *  (stride < chunkSize ⇒ overlapping context windows, the usual LM
   *  pretraining shape). Chunk i covers tokens [i·stride, i·stride +
   *  chunkSize); the last window truncates at the doc end; a doc emits
   *  a chunk for every start position < its token count (empty docs
   *  emit nothing). One row per chunk: (idCol, chunk_id, n_tokens,
   *  chunk_md5) — the md5 of the space-rejoined window (narrow rows;
   *  the text stays derivable from the doc + the deterministic rule).
   *
   *  Scale shape: completely shuffle-free — tokens are projected BELOW
   *  the start-position explode (one split per doc, not per chunk: the
   *  Generate-inlining trap), and every output column is per-row
   *  arithmetic on the carried token array. The plan is scan → project
   *  → generate → project; output partitioning inherits the scan, so a
   *  downstream packShards/write sees ~chunkSize-uniform rows. */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunk size must be positive: $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: $stride")
    val starts = when(size(col("__t")) > 0,
        sequence(lit(0), size(col("__t")) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), wordTokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        posexplode(starts).as(Seq("chunk_id", "__s")))
      .select(col(idCol), col("chunk_id"),
        size(slice(col("__t"), col("__s") + 1, lit(chunkSize))).as("n_tokens"),
        md5(array_join(slice(col("__t"), col("__s") + 1, lit(chunkSize)), " "))
          .as("chunk_md5"))
  }

  /** Whitespace token array (trimmed, empties dropped) — the shared
   *  tokenization for word n-grams; identical to the DuckDB oracle's
   *  `list_filter(string_split_regex(trim(text), '\s+'), ...)`. */
  def wordTokens(text: Column): Column =
    filter(split(trim(coalesce(text, lit(""))), "\\s+"), w => length(w) > 0)

  /** Unigram LM table for [[lmScore]]: one row per distinct token with
   *  its corpus occurrence count (map-side-partial hash aggregate over
   *  the exploded token stream — the same shape as invertedIndex pass 1). */
  def unigramModel(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(wordTokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** CCNet-style LM document scoring (Wenzek et al. 2020: score each doc
   *  with a reference language model, gate on the score) in EXACT integer
   *  arithmetic. Deliberate log-free deviation (the BM25 idf precedent):
   *  instead of perplexity = exp(-mean log p), each token contributes its
   *  inverse relative frequency `min(1000·N/cnt, oovMilli)` (N = total
   *  model mass; unseen tokens pay the `oovMilli` ceiling) and the doc
   *  score is the floor-mean — monotone in the same direction as
   *  perplexity (rare/garbage-heavy docs score high), but every division
   *  is integer and any engine replays it bit-for-bit. A real KenLM
   *  slots in through [[lmScoreLogprob]] — the same output shape over a
   *  (token, logprob_milli) table, no code change.
   *
   *  Output per doc: (idCol, n_tokens, surprisal_milli,
   *  keep = surprisal_milli <= threshold). Empty docs score 0 (kept).
   *
   *  NOTE (ADVICE r4): the model's total mass N is ONE bounded driver
   *  scalar, but computing it is an EAGER action at call time, and the
   *  model plan is evaluated twice (once for N, once in the token join).
   *  For an expensive or non-deterministic model input, persist it
   *  first — `lmScore(docs, model.cache(), …)` — or an N inconsistent
   *  with the joined counts can result. The corpus-derived
   *  [[unigramModel]] at sf scale is cheap enough to scan twice;
   *  [[lmScoreLogprob]] needs no mass scalar and has no eager action.
   *
   *  Scale (10^9 docs × 10^6-token vocab): tokens explode map-side; the
   *  model join keys on token — vocab tables are usually broadcastable
   *  but NOT unboundedly (no hint, AQE decides — the r3 O7 lesson); a
   *  stopword's 10^8 occurrences hit the join as a lookup, not a
   *  shuffle-group. The per-doc aggregate partial-combines map-side. N is
   *  ONE driver scalar (bounded: one row). */
  def lmScore(docs: DataFrame, model: DataFrame, textCol: String,
      idCol: String, threshold: Long = 200000L, oovMilli: Long = 1000000L): DataFrame = {
    // coalesce: an empty model has a null sum — every token is then OOV
    val n = model.agg(coalesce(sum(col("cnt")), lit(0L)).cast(LongType)).head().getLong(0)
    val m = 1000L * n // fits a long below ~9·10^15 total model mass
    val toks = docs.select(col(idCol).as("__id"),
      explode(wordTokens(col(textCol))).as("token"))
    val scored = toks.join(model, Seq("token"), "left")
      .select(col("__id"),
        least(coalesce(expr(s"${m}L div cnt"), lit(oovMilli)), lit(oovMilli)).as("surp"))
      .groupBy("__id").agg(count(lit(1)).as("n_tokens"),
        expr("sum(surp) div count(1)").as("surprisal_milli"))
    docs.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_milli"), lit(0L)).as("surprisal_milli"))
      .withColumn("keep", col("surprisal_milli") <= threshold)
  }

  /** KenLM-shaped scoring seam (VERDICT r4 #7): the model arrives as a
   *  (token: string, logprob_milli: long) table — logprob_milli ≤ 0,
   *  integer-quantized the way an ARPA unigram dump ships (e.g.
   *  floor(1000·log10 p)) — and each token contributes its NEGATED
   *  logprob capped at `oovMilli` (unseen tokens pay the cap). The doc
   *  score is the floor-mean surprisal, same output shape as [[lmScore]]
   *  ((idCol, n_tokens, surprisal_milli, keep)), so swapping the
   *  corpus-derived unigram model for a real KenLM table is CONFIG, not
   *  code (spec-pinned). No global mass scalar exists on this path —
   *  logprobs arrive normalized — so there is no eager driver action and
   *  the model plan is evaluated exactly once.
   *
   *  Scale: identical join/aggregate shape to [[lmScore]] — tokens
   *  explode map-side, the model join is AQE-sized, the per-doc
   *  aggregate partial-combines. */
  def lmScoreLogprob(docs: DataFrame, model: DataFrame, textCol: String,
      idCol: String, threshold: Long = 5000L, oovMilli: Long = 7000L): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(wordTokens(col(textCol))).as("token"))
    val scored = toks.join(model, Seq("token"), "left")
      .select(col("__id"),
        least(coalesce(-col("logprob_milli"), lit(oovMilli)), lit(oovMilli))
          .cast(LongType).as("surp"))
      .groupBy("__id").agg(count(lit(1)).as("n_tokens"),
        expr("sum(surp) div count(1)").as("surprisal_milli"))
    docs.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_milli"), lit(0L)).as("surprisal_milli"))
      .withColumn("keep", col("surprisal_milli") <= threshold)
  }

  /** Per-source corpus audit (the dolma/RedPajama source-mix report and
   *  the input to blocklist/reweighting decisions): one row per source
   *  with `n_docs`, `n_tokens` (whitespace tokens, summed), `n_keep`
   *  (docs passing [[graft.functions.TextStats.qualityKeep]]),
   *  `mean_tokens` (floor), `n_langs` (distinct), and `top_lang` (most
   *  frequent language; ties break lexicographically — deterministic).
   *  Null languages normalize to 'und' BEFORE grouping (Spark sorts
   *  nulls first, most SQL engines last — normalizing sidesteps the
   *  divergence).
   *
   *  Scale: per-row signals are codegen'd scalars; both aggregates
   *  partial-combine map-side, so a 10^9-doc source arrives at its
   *  reducer as one partial per task, and the output is source-sized
   *  (tiny). The top-lang pick is the same (group, key) pre-aggregate +
   *  WindowGroupLimit rank-1 shape as LinkGraph.anchorSummary. */
  def sourceProfile(docs: DataFrame, sourceCol: String, textCol: String,
      langCol: String): DataFrame = {
    import graft.functions.TextStats
    // null text → '' (0 tokens, keep=false) — under legacy sizeOfNull
    // (non-ANSI sessions) a raw size(null) is -1 and would corrupt the sum
    val textC = coalesce(col(textCol), lit(""))
    val base = docs.select(
      col(sourceCol).cast("string").as("source"),
      coalesce(col(langCol).cast("string"), lit("und")).as("lang"),
      TextStats.tokenCount(textC).cast(LongType).as("n_toks"),
      when(TextStats.qualityKeep(textC), lit(1L)).otherwise(lit(0L)).as("keep"))
    val perSource = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks")).as("n_tokens"),
      sum(col("keep")).as("n_keep"),
      countDistinct(col("lang")).as("n_langs"))
    val top = base.groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("n").desc, col("lang").asc)))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    perSource.join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_keep"),
        col("n_langs"), col("top_lang"),
        expr("n_tokens div n_docs").as("mean_tokens"))
  }

  /** Inverted index (token → postings), the corpus-search/attribution
   *  primitive: one row per distinct token with its exact document
   *  frequency and — for tokens with `doc_freq <= maxDf` — the md5 of
   *  the comma-joined doc-id list in ascending numeric id order.
   *
   *  The df cap is the memory contract, not an approximation: a stopword
   *  token's postings list is corpus-sized, and an uncapped collect_list
   *  on it is the reducer-OOM skew case (the J5 mega-host shape). Hot
   *  tokens (`doc_freq > maxDf`) keep their EXACT df but report the
   *  empty-string sentinel instead of a materialized list — real systems
   *  shard or elide exactly these. Two passes so the cap binds BEFORE
   *  any list exists: (1) count-only df aggregate (map-side partials);
   *  (2) cold tokens re-join (both sides already token-partitioned) and
   *  collect ≤ maxDf ids per group — bounded by construction. */
  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
      maxDf: Int): DataFrame = {
    require(maxDf > 0, s"postings df cap must be positive: $maxDf")
    val tok = docs.select(col(idCol).cast(LongType).as("doc_id"),
      explode(array_distinct(wordTokens(col(textCol)))).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val cold = tok.join(dfreq.filter(col("doc_freq") <= maxDf), "token")
      .groupBy(col("token"), col("doc_freq"))
      .agg(md5(array_join(transform(array_sort(collect_list(col("doc_id"))),
        _.cast("string")), ",")).as("postings_md5"))
    val hot = dfreq.filter(col("doc_freq") > maxDf)
      .select(col("token"), col("doc_freq"), lit("").as("postings_md5"))
    cold.unionByName(hot)
  }

  /** All word n-grams of a pre-tokenized array (space-joined strings);
   *  fewer than n tokens → empty array. */
  def wordGrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Hashed word n-grams: xxhash64 over the n words as SEPARATE
   *  arguments — the hash folds per argument, so word boundaries are
   *  preserved and hash equality ⟺ [[wordGrams]]-string equality up to
   *  2^-64 collisions (words are \\s+-split, never contain spaces, so
   *  the joined string is injective on word tuples). For consumers that
   *  use grams only through equality (decontamination matching), no
   *  gram string is ever built and joins/broadcasts carry 8 bytes per
   *  gram. */
  def wordGramHashes(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => xxhash64((0 until n).map(j => element_at(tokens, i + lit(j + 1))): _*)))
      .otherwise(array().cast("array<bigint>"))

  /** Benchmark decontamination, flag stage (the GPT-3/Gopher n-gram
   *  rule): a corpus document is contaminated iff it shares at least one
   *  word n-gram with the eval set; `n_hits` counts its matching n-gram
   *  positions. The shipping step is [[decontaminate]] (anti-join).
   *
   *  Scale shape: eval sets are tiny relative to a 100 TB corpus
   *  (~10^5–10^7 distinct grams ≈ tens of MB), so the bench side is
   *  distinct-ed and BROADCAST; the corpus side explodes map-side into a
   *  broadcast LEFT SEMI hash join — the corpus is never shuffled, and
   *  only the (rare) matching gram rows reach the per-doc count, whose
   *  exchange is sized by contaminated docs, not the corpus. One scan,
   *  one pass, partial-aggregated map-side. */
  def contaminationHits(docs: DataFrame, bench: DataFrame,
                        textCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"n-gram order must be positive: $n")
    // tokenize in a Project BELOW the explode: wordGrams references its
    // tokens arg 3× and CollapseProject won't merge a Project into a
    // Generate, so the trim+split+filter runs once per row, not thrice
    // hashed grams on BOTH sides (r6): the match is pure equality, so no
    // gram string is ever built and the broadcast set carries 8 bytes per
    // gram (identical hits up to 2^-64 collisions — [[wordGramHashes]])
    val bgrams = bench
      .select(wordTokens(col(textCol)).as("__t"))
      .select(explode(wordGramHashes(col("__t"), n)).as("gram"))
      .distinct()
    docs.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("__t"))
      .select(col("doc_id"), explode(wordGramHashes(col("__t"), n)).as("gram"))
      .join(broadcast(bgrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Benchmark decontamination, shipping stage: the corpus minus every
   *  document sharing an n-gram with the eval set. The contaminated-id
   *  side is USUALLY tiny (eval leakage is rare) but not bounded by
   *  construction — a boilerplate-heavy eval gram could flag a large
   *  corpus fraction — so no broadcast HINT here (a hint is obeyed even
   *  at OOM size; cf. the r2 hot-host-broadcast hazard): AQE converts
   *  the anti-join to a broadcast at runtime exactly when the measured
   *  contaminated set is small, and degrades to a shuffle join instead
   *  of an executor OOM when it is not. */
  def decontaminate(docs: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, n: Int): DataFrame =
    docs.join(
      contaminationHits(docs, bench, textCol, idCol, n)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** fasttext-shaped linear document scorer — the quality-filter seam
   *  the GPT-3/CCNet pipelines use (a linear model over token features
   *  deciding keep/drop): `score = bias + (Σ weight(token)) div n`,
   *  mean-pooled over the document's tokens like fasttext's averaged
   *  word vectors, all integer milli-units. A trained model drops in as
   *  the `(token, weight_milli)` table — the same swap-is-config seam as
   *  [[lmScore]]'s KenLM shape and TextStats.langIdFromModel; the spec's
   *  fixture model proves the plumbing with hand weights. OOV tokens
   *  weigh 0; token-free docs score exactly `bias`. Integer division
   *  truncates toward zero on a negative sum — identical in Spark
   *  (`div`) and DuckDB (`//`), so the oracle replays exactly.
   *
   *  Scale (10^9 docs × 10^6-token vocab): tokens explode map-side, the
   *  vocab join is AQE-sized (no unbounded hint), and the per-doc
   *  aggregate partial-combines before its one exchange — the
   *  [[lmScore]] shape without the mass scalar or its eager action. */
  def linearScore(docs: DataFrame, model: DataFrame, textCol: String,
      idCol: String, biasMilli: Long = 0L, thresholdMilli: Long = 0L): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(wordTokens(col(textCol))).as("token"))
    val agg = toks.join(model, Seq("token"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("weight_milli"), lit(0L))).as("__dot"))
      .select(col("__id").as(idCol), col("n_tokens"),
        (lit(biasMilli) + expr("__dot div n_tokens")).as("score_milli"))
    docs.select(col(idCol)).distinct()
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_milli"), lit(biasMilli)).as("score_milli"))
      .withColumn("keep", col("score_milli") >= thresholdMilli)
  }

  /** Deterministic train/validation/test assignment by keyed hash — the
   *  split every training pipeline needs and `randomSplit` cannot give at
   *  scale: `randomSplit` is positional (a repartition, an appended file,
   *  or a different partition count silently reassigns rows across
   *  splits, leaking eval data into train), while a content-keyed hash is
   *  a pure per-row projection whose verdict is stable under ANY
   *  re-sharding, re-run, append, or engine. bucket =
   *  md5(key ':' salt) taken as a 60-bit integer mod `buckets`; splits
   *  claim contiguous bucket ranges in order. The same md5-keyed-order
   *  trick as [[sampleStratified]] / [[mixSources]], so DuckDB replays it
   *  exactly.
   *
   *  `splits` are (name, weight-in-buckets) and must sum to `buckets` —
   *  a partial cover would silently drop rows from every split, the one
   *  mistake a split assigner must not allow. A null key gets a null
   *  bucket and split (unknown identity cannot be placed stably);
   *  callers wanting a fallback coalesce the key first.
   *
   *  Scale (10^10 docs): shuffle-free — one codegen'd projection, no
   *  exchange, no state; changing `salt` re-deals every bucket for a
   *  fresh split without touching the data layout. */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
      buckets: Int = 1000, salt: String = ""): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(splits.nonEmpty, "at least one split required")
    splits.foreach { case (n, w) =>
      require(w > 0, s"split '$n' must claim at least one bucket: $w") }
    require(splits.map(_._2).sum == buckets,
      s"split weights ${splits.map(_._2).sum} must sum to buckets=$buckets " +
        "(a partial cover silently drops rows)")
    val bucket = (conv(substring(
        md5(concat(col(keyCol).cast("string"), lit(":" + salt))), 1, 15),
      16, 10).cast("long") % buckets).as("bucket")
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    // ranges are cumulative, so a chained when(bucket < upper) assigns
    // the first (lowest-bound) claiming split; a null bucket falls
    // through every branch to the null default
    val split = splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), upper), acc) =>
        when(col("bucket") < upper, lit(name)).otherwise(acc)
    }
    // two selects so `split` can reference the bucket column by name;
    // CollapseProject folds them into one codegen'd projection
    df.withColumn("bucket", bucket).withColumn("split", split)
  }
}
