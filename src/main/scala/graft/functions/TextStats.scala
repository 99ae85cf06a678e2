package graft.functions

import org.apache.spark.sql.Column
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
