package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Corpus keyword search: BM25-shaped ranked retrieval over the documents
 * table — the attribution/inspection primitive next to [[Corpus.invertedIndex]]
 * (find the training documents most relevant to a probe query). The
 * reference has no search operator; this is part of the training-data
 * pipeline surface (SURVEY §2.7).
 *
 * **Integer fixed-point scoring (engine-portable by construction).** The
 * classic BM25 idf is a log — IEEE doubles whose last-ulp behaviour
 * differs across engines/libms, which would force the cross-engine oracle
 * into tolerance comparisons. This operator instead uses the RATIONAL idf
 *
 *   idf(t)      = ((N - df + 1) * 10^4) div (df + 1)
 *
 * (the same (N-df+0.5)/(df+0.5) odds ratio BM25 takes the log of, scaled
 * to integers with the log's monotone compression dropped — rank order
 * between two terms of equal tf is unchanged, relative weighting of rare
 * terms is steeper than Robertson's; a DOCUMENTED deviation) and the
 * standard tf normalization in per-mille integer arithmetic:
 *
 *   lenratio    = (doclen * 10^6) div avglen_milli        ~ 10^3 len/avg
 *   inner       = 1000 - b + (b * lenratio) div 1000      ~ 10^3 (1-b+b·len/avg)
 *   denom       = tf * 1000 + (k1 * inner) div 1000       ~ 10^3 (tf + k1·inner)
 *   tfnorm      = (tf * (k1 + 1000) * 1000) div denom     ~ 10^3 tf(k1+1)/denom
 *   contrib     = (idf * tfnorm) div 1000
 *   score(q,d)  = Σ_{t ∈ q ∩ d} contrib(t, d)
 *
 * with k1/b given in per-mille (defaults 1200/750 = the textbook
 * k1=1.2, b=0.75). Every operand is a non-negative Long and every
 * division is floor division, so any engine replays the score EXACTLY.
 * Overflow bound: idf ≤ (N+1)·10^4 and tfnorm < k1+1000, so a
 * contribution stays under (N+1)·10^4·2200 — safe in signed 64-bit up to
 * N ≈ 4·10^11 documents.
 *
 * **Scale shape.** The corpus is pruned to the query vocabulary BEFORE
 * any aggregate — a LEFT SEMI join of the exploded token stream against
 * the (distinct) query vocabulary, so a 100 TB corpus reduces to the
 * rows mentioning query terms. A literal `isin` would compile a 10^4-term
 * query batch into one giant codegen'd In predicate (VERDICT r4 hazard
 * #2); the semi-join stays a hash probe whatever the batch size, and is
 * broadcast when the vocabulary is bounded (the `Seq` overload — a
 * driver-supplied literal) or AQE-sized when the queries arrive as a
 * DataFrame of unknown cardinality (the decontaminate-ship precedent:
 * never an unguarded broadcast hint on an unbounded input). Doclen is a
 * per-row `size()` (no explode); the global (N, Σlen) pair is ONE
 * bounded driver row; df/tf are hash aggregates with map-side partials;
 * and the final per-query top-k compiles to WindowGroupLimit (partial
 * top-k per mapper before the single per-query exchange — the
 * politeness-top-k shape).
 */
object Search {

  /** Top-k documents per query under the integer BM25 variant above.
   *  `queries`: (query_id, whitespace-separated terms); duplicate terms
   *  within one query count once. Output: (query_id, doc_id, score, rank)
   *  with rank 1..k ordered by (score desc, doc_id asc); queries whose
   *  terms appear in no document return no rows. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(String, String)], k: Int,
      k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val spark = docs.sparkSession
    import spark.implicits._
    // a literal argument is bounded by construction → broadcast hints on
    bm25TopKImpl(docs, textCol, idCol,
      queries.toDF("query_id", "terms"), k, k1Milli, bMilli, bounded = true)
  }

  /** Query-batch form: `queries` is a DataFrame with (query_id: string,
   *  terms: string — whitespace-separated). The scale path for real
   *  query batches (10^3-10^6 probe queries): no driver collect, no
   *  literal In predicate; the vocabulary joins are AQE-sized because a
   *  DataFrame argument has unknown cardinality. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, k: Int, k1Milli: Long, bMilli: Long): DataFrame =
    bm25TopKImpl(docs, textCol, idCol, queries, k, k1Milli, bMilli, bounded = false)

  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, k: Int): DataFrame =
    bm25TopKImpl(docs, textCol, idCol, queries, k, 1200L, 750L, bounded = false)

  private def bm25TopKImpl(docs: DataFrame, textCol: String, idCol: String,
      queries: DataFrame, k: Int, k1Milli: Long, bMilli: Long,
      bounded: Boolean): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"k1Milli/bMilli out of range: $k1Milli/$bMilli")

    // (query_id, token), duplicates within a query collapsed
    val qTerms = queries.select(col("query_id"),
      explode(Corpus.wordTokens(col("terms"))).as("token")).distinct()
    val vocab = qTerms.select("token").distinct()
    def maybeBroadcast(df: DataFrame): DataFrame = if (bounded) broadcast(df) else df

    val base = docs.select(col(idCol).cast(LongType).as("doc_id"),
      Corpus.wordTokens(col(textCol)).as("toks"))
    // (doc_id, doclen) is consumed three times — the global stats action,
    // and the per-doc length join of every query's scoring plan — and
    // each lazy consumer would re-tokenize the corpus; materialize the
    // 16-byte-per-doc projection once (r6: corpus tokenizations 3 → 2)
    val doclens = base.select(col("doc_id"), size(col("toks")).cast(LongType).as("doclen"))
      .localCheckpoint(true)
    // the two global scalars — ONE driver row, computed once
    val statsRow = doclens.agg(count(lit(1)).as("n"), sum("doclen").as("tot")).head()
    val n = statsRow.getLong(0)
    val tot = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    require(n > 0 && tot > 0, s"corpus is empty or token-free (n=$n, tot=$tot)")
    val avgLenMilli = tot * 1000L / n

    // corpus pruned to the query vocabulary BEFORE the tf aggregate:
    // semi-join, never an In-list (see the scale-shape note above)
    val tf = base.select(col("doc_id"), explode(col("toks")).as("token"))
      .join(maybeBroadcast(vocab), Seq("token"), "left_semi")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // exact df for the query terms (tf is one row per containing doc)
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))

    val scored = tf
      .join(maybeBroadcast(dfreq), "token")  // ≤ |query vocabulary| rows
      .join(maybeBroadcast(qTerms), "token")
      .join(doclens, "doc_id")
      .withColumn("idf", expr(s"(($n - df + 1) * 10000L) div (df + 1)"))
      .withColumn("lenratio", expr(s"(doclen * 1000000L) div ${avgLenMilli}L"))
      .withColumn("inner", expr(s"1000L - $bMilli + ($bMilli * lenratio) div 1000"))
      .withColumn("denom", expr(s"tf * 1000L + ($k1Milli * inner) div 1000"))
      .withColumn("tfnorm", expr(s"(tf * ${k1Milli + 1000L} * 1000) div denom"))
      .withColumn("contrib", expr("(idf * tfnorm) div 1000"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))

    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)).cast(LongType))
      .filter(col("rank") <= k)
  }
}
