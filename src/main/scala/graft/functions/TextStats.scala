package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language ID, quality scoring, token counting, document fingerprinting.
 *
 * Everything is expressed as Catalyst Column expressions (whole-stage
 * codegen, no UDFs) except the rolling-hash fingerprint, which is a
 * deterministic Scala function + UDF. Scores are emitted as integers
 * (per-mille / counts) so cross-engine oracles compare exactly — no
 * floating-point drift between Spark and DuckDB.
 */
object TextStats {

  /** Whitespace token count (codegen'd, no UDF). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: letter-runs, digits, and single punctuation
   *  marks each count as one token (a cheap stand-in for a real BPE
   *  vocab — the regex shape matches GPT-2's pre-tokenizer classes). */
  val BpeishPattern = "[a-zA-Z\\u00C0-\\u024F\\u4e00-\\u9fff]+|[0-9]|[^\\sa-zA-Z0-9\\u00C0-\\u024F\\u4e00-\\u9fff]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Marker-word regexes per language (n-gram heuristic; word-boundary
   *  anchored). CJK is charset-detected. Identical patterns run in the
   *  DuckDB oracle (RE2 and java.util.regex agree on this subset). */
  val LangMarkers: Seq[(String, String)] = Seq(
    "zh" -> "[\\u4e00-\\u9fff]",
    "en" -> "\\b(the|and|of|is|to|in|that|it|for|was)\\b",
    "es" -> "\\b(el|los|las|es|y|de|que|la|en|un)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu|den|mit)\\b",
    "fr" -> "\\b(le|la|les|et|est|ne|pas|des|une|du)\\b")

  /** Language ID: argmax of marker hits, ties broken by the fixed order
   *  zh > en > es > de > fr; zero hits anywhere → "und". */
  def langId(text: Column): Column = {
    val counts = LangMarkers.map { case (lang, re) =>
      lang -> size(regexp_extract_all(text, lit(re), lit(0)))
    }
    val maxCount = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight nests so the FIRST marker in LangMarkers order wins ties
    counts.foldRight(lit("und")) { case ((lang, c), acc) =>
      when(maxCount > 0 && c === maxCount, lit(lang)).otherwise(acc)
    }
  }

  /** Model-table seam for [[langId]] (VERDICT r4 #7): the marker set
   *  arrives as a (lang: string, pattern: string, weight_milli: long)
   *  table — e.g. a distilled fastText marker list — instead of the
   *  built-in [[LangMarkers]]. Per language, score = Σ weight_milli ×
   *  regex hits; the argmax wins; zero total score → "und". A language
   *  may contribute several rows.
   *
   *  Tie-break is part of the MODEL's content, never its physical
   *  layout (a collect() over a multi-partition table has
   *  partition-order semantics — rewriting the same logical model could
   *  reorder rows): an optional `priority` column (long, ascending)
   *  orders the languages explicitly; without one they are ordered
   *  lexicographically by lang name. The built-in-parity spec ships a
   *  priority column reproducing langId's zh > en > es > de > fr order.
   *
   *  The model is a bounded driver artifact (the broadcast-centroid
   *  precedent, not a corpus-sized table): it is collected once and
   *  compiled into the same codegen'd expression tree [[langId]] uses —
   *  so the per-row scoring stays whole-stage-codegen'd regexp counting
   *  with zero joins, and swapping models is config, not code
   *  (spec-pinned: the built-in markers as a model table reproduce
   *  langId exactly). */
  def langIdFromModel(model: DataFrame): Column => Column = {
    val hasPriority = model.columns.contains("priority")
    val rows =
      if (hasPriority)
        model.select(col("lang"), col("pattern"), col("weight_milli"), col("priority"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      else
        model.select(col("lang"), col("pattern"), col("weight_milli"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), 0L))
    require(rows.nonEmpty, "language-ID model table is empty")
    // lang order = tie-break order: min priority per lang (then lang
    // name), or plain lexicographic without a priority column — a pure
    // function of the model's content, independent of collect() order
    val langOrder = rows.groupBy(_._1).toSeq
      .map { case (lang, rs) => (rs.map(_._4).min, lang) }
      .sorted.map(_._2)
    (text: Column) => {
      val scores = langOrder.map { lang =>
        lang -> rows.filter(_._1 == lang).map { case (_, re, w, _) =>
          size(regexp_extract_all(text, lit(re), lit(0))).cast("long") * lit(w)
        }.reduce(_ + _)
      }
      val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
      scores.foldRight(lit("und")) { case ((lang, c), acc) =>
        when(maxScore > 0 && c === maxScore, lit(lang)).otherwise(acc)
      }
    }
  }

  /** Quality signals, all integers (exact cross-engine):
   *  n_tokens, mean_token_len_milli, punct_per_mille, stopword_per_mille,
   *  upper_per_mille. */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val toks = tokenCount(text)
    val chars = length(text)
    val punct = size(regexp_extract_all(text, lit("[\\.,;:!\\?]"), lit(0)))
    val stop = size(regexp_extract_all(text,
      lit("\\b(the|and|of|is|to|a|in|that|it|for)\\b"), lit(0)))
    val upper = size(regexp_extract_all(text, lit("[A-Z]"), lit(0)))
    Seq(
      "n_tokens" -> toks,
      "mean_token_len_milli" -> when(toks > 0,
        (lit(1000) * (chars - (toks - 1)) / toks).cast("long")).otherwise(lit(0L)),
      "punct_per_mille" -> when(chars > 0, (lit(1000) * punct / chars).cast("long")).otherwise(lit(0L)),
      "stopword_per_mille" -> when(toks > 0, (lit(1000) * stop / toks).cast("long")).otherwise(lit(0L)),
      "upper_per_mille" -> when(chars > 0, (lit(1000) * upper / chars).cast("long")).otherwise(lit(0L)))
  }

  /** Composite quality gate (the usual "keep if" heuristics — length,
   *  punctuation presence, not shouting, stopword density). */
  def qualityKeep(text: Column): Column = {
    val sig = qualitySignals(text).toMap
    (sig("n_tokens") >= 10) && (sig("n_tokens") <= 100000) &&
      (sig("upper_per_mille") < 500) &&
      (sig("mean_token_len_milli") between (1500, 20000))
  }

  // ---- C4 cleaning (Raffel et al. 2020, "Exploring the Limits of
  // Transfer Learning...", §2.2) ----

  /** C4 line-level cleaning: keep only lines that end in a terminal
   *  punctuation mark (`.` `!` `?` or a closing double quote), contain
   *  at least three words, and do not mention "javascript"; kept lines
   *  re-join with `\n`. Pure per-row HOF chain (split → filter →
   *  array_join), whole-stage codegen, shuffle-free. */
  def c4CleanText(text: Column): Column = {
    val lines = split(coalesce(text, lit("")), "\n", -1)
    val kept = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(filter(split(t, "\\s+"), w => length(w) > 0)) >= 3 &&
        !lower(t).contains("javascript")
    })
    array_join(kept, "\n")
  }

  /** C4 page gate over the [[c4CleanText]] output: at least five
   *  sentences (terminal marks in the retained lines, the TF-C4
   *  implementation order), no "lorem ipsum", no curly bracket (the
   *  paper's code-page heuristic), and no bad-word hit. `badWords`
   *  entries must be plain word characters (they are spliced into a
   *  `\b(...)\b` alternation that must mean the same thing to the SQL
   *  oracle's RE2 — no escaping is applied); the published blocklist
   *  plugs in here as data. */
  def c4PageKeep(text: Column, badWords: Seq[String] = Nil): Column = {
    val lo = lower(coalesce(text, lit("")))
    val nSent = size(regexp_extract_all(c4CleanText(text), lit("[.!?]"), lit(0)))
    val bad =
      if (badWords.isEmpty) lit(false)
      else {
        require(badWords.forall(_.matches("[A-Za-z0-9_]+")),
          "c4 badWords must be plain word characters (oracle-portable regex)")
        lo.rlike("\\b(" + badWords.mkString("|") + ")\\b")
      }
    nSent >= 5 && !lo.contains("lorem ipsum") && !lo.contains("{") && !bad
  }

  // ---- Gopher quality gate (Rae et al. 2021, "Scaling Language
  // Models: Methods, Analysis & Insights from Training Gopher", A1.1)
  // — distinct from the repetition section, which is [[repetition]] ----

  /** The paper's stop-word set for the "contains at least two" clause. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality signals, all integers: word count, mean word length
   *  (milli), per-word hash/ellipsis symbol rates, bullet-start and
   *  ellipsis-end line rates, alphabetic-word rate (all per-mille), and
   *  the count of distinct stop words present. Per-row HOFs only —
   *  scan → project, nothing moves. */
  def gopherSignals(text: Column,
      stopWords: Seq[String] = GopherStopWords): Seq[(String, Column)] = {
    require(stopWords.nonEmpty &&
      stopWords.forall(_.matches("[A-Za-z0-9_]+")),
      "stop words must be plain word characters (oracle-portable regex)")
    val t = coalesce(text, lit(""))
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val nWords = size(words).cast("long")
    val wordChars = aggregate(words, lit(0L), (a, w) => a + length(w))
    val lines = filter(split(t, "\n", -1), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
    val hashes = size(regexp_extract_all(t, lit("#"), lit(0)))
    val ellipses = size(regexp_extract_all(t, lit("\\.\\.\\.|…"), lit(0)))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val stopHits = stopWords
      .map(sw => when(t.rlike("(?i)\\b" + sw + "\\b"), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    Seq(
      "n_words" -> nWords,
      "mean_word_len_milli" -> milli(wordChars, nWords),
      "hash_per_mille" -> milli(hashes, nWords),
      "ellipsis_per_mille" -> milli(ellipses, nWords),
      "bullet_line_per_mille" -> milli(bulletLines, nLines),
      "ellipsis_line_per_mille" -> milli(ellipsisLines, nLines),
      "alpha_word_per_mille" -> milli(alphaWords, nWords),
      "stop_hits" -> stopHits)
  }

  /** The paper's keep rule over [[gopherSignals]]: 50–100k words, mean
   *  word length 3–10, symbol-to-word ratio ≤ 0.1 for `#` and for
   *  ellipses, ≤ 90% bullet-start lines, ≤ 30% ellipsis-end lines,
   *  ≥ 80% of words with an alphabetic character, and ≥ 2 stop words. */
  def gopherKeep(text: Column,
      stopWords: Seq[String] = GopherStopWords): Column = {
    val sig = gopherSignals(text, stopWords).toMap
    sig("n_words").between(50L, 100000L) &&
      sig("mean_word_len_milli").between(3000L, 10000L) &&
      (sig("hash_per_mille") <= 100L) && (sig("ellipsis_per_mille") <= 100L) &&
      (sig("bullet_line_per_mille") <= 900L) &&
      (sig("ellipsis_line_per_mille") <= 300L) &&
      (sig("alpha_word_per_mille") >= 800L) &&
      (sig("stop_hits") >= 2L)
  }

  /** floor(1000 * num / den), 0 when den is 0/null (exact cross-engine). */
  private def milli(num: Column, den: Column): Column =
    when(coalesce(den, lit(0L)) > 0, (lit(1000) * num / den).cast("long"))
      .otherwise(lit(0L))

  /** Run statistics over a sorted string array, as one `aggregate` HOF
   *  pass: equal values are adjacent after array_sort, so distinct count,
   *  longest run, total chars, and chars-in-runs-of->1 all fall out of a
   *  single linear scan with a struct accumulator — no explode, no
   *  shuffle. `arr` must be a sorted array<string> expression. Fields:
   *  total, uniq, maxrun, chars, dupchars. */
  private def runStats(arr: String): String =
    s"""aggregate($arr,
         named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
                      'total', CAST(0 AS BIGINT), 'uniq', CAST(0 AS BIGINT),
                      'maxrun', CAST(0 AS BIGINT), 'chars', CAST(0 AS BIGINT),
                      'dupchars', CAST(0 AS BIGINT)),
         (a, x) -> named_struct(
           'prev', x,
           'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, CAST(1 AS BIGINT)),
           'total', a.total + 1,
           'uniq', a.uniq + IF(a.prev IS NULL OR x != a.prev, 1, 0),
           'maxrun', greatest(a.maxrun,
             IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, CAST(1 AS BIGINT))),
           'chars', a.chars + length(x),
           'dupchars', a.dupchars + CASE
             WHEN a.prev IS NOT NULL AND x = a.prev AND a.run = 1 THEN 2 * length(x)
             WHEN a.prev IS NOT NULL AND x = a.prev THEN length(x)
             ELSE CAST(0 AS BIGINT) END),
         a -> named_struct('total', a.total, 'uniq', a.uniq, 'maxrun', a.maxrun,
                           'chars', a.chars, 'dupchars', a.dupchars))"""

  /** Repetition signals (the Gopher/RefinedWeb boilerplate filters), all
   *  integer per-mille: duplicate-line fraction, characters-in-duplicated-
   *  lines fraction, top-word fraction, top-bigram fraction.
   *
   *  Shuffle-free by design: these are per-document scalars, and the
   *  obvious explode → (doc, token) → per-doc agg shape exchanges
   *  near-corpus-size data twice just to count within rows. Instead each
   *  row sorts its own token array (equal values become adjacent) and a
   *  single `aggregate` pass per array extracts distinct/longest-run/char
   *  totals — O(len log len) per doc, plan = scan → project, nothing
   *  moves. Output: doc_id + 4 signals; docs with no lines/words/bigrams
   *  get 0. */
  def repetition(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines =
      "filter(transform(split(__text, '\\n'), l -> trim(l)), l -> length(l) > 0)"
    val bigrams = """CASE WHEN size(__ws) >= 2
        THEN transform(sequence(0, size(__ws) - 2),
               i -> concat_ws(' ', slice(__ws, i + 1, 2)))
        ELSE array() END"""
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .select(col("doc_id"), col("__text"),
        expr("filter(split(trim(__text), '\\\\s+'), x -> length(x) > 0)").as("__ws"))
      .select(col("doc_id"),
        expr(runStats(s"array_sort($lines)")).as("__l"),
        expr(runStats("array_sort(__ws)")).as("__w"),
        expr(runStats(s"array_sort($bigrams)")).as("__b"))
      .select(col("doc_id"),
        milli(col("__l.total") - col("__l.uniq"), col("__l.total")).as("dup_line_frac_milli"),
        milli(col("__l.dupchars"), col("__l.chars")).as("dup_line_char_frac_milli"),
        milli(col("__w.maxrun"), col("__w.total")).as("top_word_frac_milli"),
        milli(col("__b.maxrun"), col("__b.total")).as("top_bigram_frac_milli"))
  }

  /** PII patterns — the ASCII subset where java.util.regex and RE2 agree
   *  exactly (identical strings run in the DuckDB oracle). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
  def piiIpv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))

  /** PII redaction: emails first (so address-local digit runs never half-
   *  match as IPs), then IPv4s — a fixed order both engines replay. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  /** Rolling polynomial fingerprint of the token stream (order-sensitive,
   *  whitespace-normalized). Pure deterministic Scala — pinned by spec. */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 1469598103934665603L // FNV-1a offset basis, over word hashes
    val it = text.split("\\s+").iterator.filter(_.nonEmpty)
    while (it.hasNext) {
      val w = it.next()
      var wh = 0L
      var i = 0
      while (i < w.length) { wh = wh * 131 + w.charAt(i); i += 1 }
      h = (h ^ wh) * 1099511628211L
    }
    h
  }

  val fingerprintUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => fingerprint(s))
}
