package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Substring-tier phrase blocklist hits — see
    * [[graft.expressions.PhraseHits]] for the counting contract
    * (non-overlapping per phrase, summed; map-only codegen'd).
    * The token-exact tier is [[blocklistFilter]]. */
  def phraseHits(c: Column, phrases: Seq[String]): Column = {
    require(phrases.size <= 10000,
      s"phrase list is a scan parameter; got ${phrases.size} (cap 10000)")
    val b = org.apache.spark.sql.GraftColumnBridge
    b.column(graft.expressions.PhraseHits(b.expression(c), phrases))
  }

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

  /** Gopher-style repetition statistics, computed map-only (no shuffle):
    * `struct(n_tokens, distinct_ratio, top_token_frac)` where
    * `top_token_frac` is the fraction of tokens occupied by the single
    * most frequent token and `distinct_ratio` = distinct/total tokens.
    * High top-token fraction or low distinct ratio flags the
    * boilerplate/spam documents the Gopher repetition rules drop.
    *
    * The relational formulation (explode → groupBy(doc, token) →
    * groupBy(doc)) shuffles every token occurrence in the corpus —
    * ~1e12 rows at 100 TB. Here the most-frequent-token count is the
    * longest run of equal adjacent elements in the SORTED token array:
    * O(n log n) per row inside whole-stage codegen, zero exchanges.
    * The single-element outer `aggregate` is a let-binding so the
    * tokenize+sort subtree evaluates once (HOF arguments are otherwise
    * re-evaluated per reference). */
  def repetitionStats(c: Column): Column =
    aggregate(array(sort_array(tokens(c))), // let-bind sorted tokens
      lit(null).cast(StructType(Seq(
        StructField("n_tokens", IntegerType),
        StructField("distinct_ratio", DoubleType),
        StructField("top_token_frac", DoubleType)))),
      (_, w) => {
        // longest equal-adjacent run = most-frequent-token count
        // (shared fold: topRunCount)
        val best = topRunCount(w)
        val n = size(w).cast(DoubleType)
        struct(
          size(w).as("n_tokens"),
          (size(array_distinct(w)).cast(DoubleType) / n).as("distinct_ratio"),
          (best.cast(DoubleType) / n).as("top_token_frac"))
      })

  /** Count of the most frequent whitespace token — the longest run of
    * equal adjacent elements in the sorted token array (same fold as
    * [[repetitionStats]], but returned as the raw INTEGER so gating
    * thresholds can be integer cross-multiplications instead of
    * double-ratio comparisons). Map-only, codegen'd. */
  private def topRunCount(w: Column): Column =
    when(size(w) <= 1, size(w)).otherwise(aggregate(
      sequence(lit(1), size(w) - 1),
      struct(lit(1).as("run"), lit(1).as("best")),
      (st, i) => {
        val run = when(element_at(w, i + 1) === element_at(w, i),
          st.getField("run") + 1).otherwise(lit(1))
        struct(run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best")))

  /** PII scrubbing — the redaction pass a training pipeline runs
    * before text ever reaches a tokenizer: emails, IPv4 literals and
    * international/dashed phone numbers are replaced with typed
    * placeholder tags and counted. Patterns are deliberately
    * RE2-compatible (character classes, bounded repeats, `\b` — no
    * lookaround, no backrefs) so an oracle engine replays them
    * verbatim; order is fixed (emails → IPv4 → phones) because the
    * phone pattern could otherwise eat digit runs inside the other
    * two. Counts are taken BEFORE any replacement, each against the
    * original text. A conservative-by-design detector: precision
    * over recall (a false positive deletes training signal forever;
    * a false negative gets another chance at a later pipeline
    * stage). Map-only, codegen'd.
    *
    * Returns struct<clean_text string, n_emails int, n_ipv4 int,
    * n_phones int>. */
  def piiScrub(c: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    val phone = "\\+\\d{7,14}\\b|\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
    val cleaned = regexp_replace(
      regexp_replace(regexp_replace(c, email, "<EMAIL>"),
        ipv4, "<IP>"),
      phone, "<PHONE>")
    struct(
      cleaned.as("clean_text"),
      regexp_count(c, lit(email)).cast(IntegerType).as("n_emails"),
      regexp_count(c, lit(ipv4)).cast(IntegerType).as("n_ipv4"),
      regexp_count(c, lit(phone)).cast(IntegerType).as("n_phones"))
  }

  /** Gopher's duplicate-n-gram repetition signals, word-n-gram tier —
    * the per-doc numbers behind "fraction of characters in the most
    * common 2/3/4-gram" and "fraction of characters in duplicated
    * 5..10-grams". Emitted as EXACT INTEGERS (counts and char sums),
    * never ratios: the caller divides by `doc_chars` (or n_ngrams)
    * itself, so the whole signal is replayable bit-for-bit in any
    * engine and gate thresholds stay integer cross-multiplications.
    * Char sums count every occurrence's characters (occurrences ×
    * n-gram length incl. joining spaces) — the cheap relational
    * estimator, NOT Gopher's overlap-deduplicated character union
    * (that needs interval merging per doc; the estimator upper-bounds
    * it and ranks documents the same way in practice). Divergence
    * documented here on purpose.
    *
    * Returns struct<n_ngrams int, top_cnt int, top_gram string,
    * top_chars bigint, dup_chars bigint> where `top_gram` is the
    * most frequent n-gram (ties → lexicographically smallest),
    * `top_chars` = top_cnt × length(top_gram) and `dup_chars` =
    * Σ over n-grams occurring ≥2 times of cnt × length.
    *
    * Scale shape: the corpus-shuffling formulation (explode n-grams +
    * groupBy doc) moves ~1e12 rows at 100 TB; this is instead ONE
    * O(len) hash-count pass per row inside the native
    * `graft_dup_ngrams` kernel — map-only, no shuffle, codegen'd. A
    * first formulation as a sorted-run `aggregate` fold measured
    * ~108 µs/doc at 1M docs (interpreted HOFs sit outside
    * whole-stage codegen — the SCALE.md rule); the kernel swap is a
    * pure implementation change under the same contract, value-pinned
    * by the unchanged spec vectors and the q123 oracle. Tie-break
    * comparison is Java BMP string order — identical to the oracle's
    * binary order for BMP text (the corpus scope). */
  def dupNgramStats(c: Column, n: Int): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.column(graft.expressions.DupNgramStatsExpr(b.expression(c), n))
  }

  /** Composite Gopher-style quality gate — the keep/drop decision a
    * training pipeline runs over every document, with the firing rule
    * named (`reject_reason` = first failed rule in a fixed order, so
    * reject statistics are stable and auditable):
    *  - tokens: `minTokens ≤ n ≤ maxTokens`
    *  - word_len: `minCharsPerTok·n ≤ chars ≤ maxCharsPerTok·n`
    *  - repetition: `top_count·100 ≤ n·maxTopTokenPct`
    *  - stopwords: `stop_hits·1000 ≥ n·minStopPermille`
    * EVERY threshold is an integer cross-multiplication over exact
    * counts — no double-ratio comparisons, so the verdict is
    * bit-portable across engines and partitionings. Map-only,
    * codegen'd; output struct carries the counts for auditing.
    *
    * `chars` is `length(text)` — it counts the separator characters
    * BETWEEN tokens, not bare word lengths. The default band [4n, 11n]
    * is the Gopher mean-word-length rule (3 ≤ mean ≤ 10) adjusted for
    * single-space separation: mean word length w over n words gives
    * chars = w·n + (n−1), so w ∈ [3, 10] ⇔ chars ∈ [4n−1, 11n−1];
    * the integer band keeps the cross-multiplication form at the cost
    * of the one-off-the-floor boundary (a doc of ALL exactly-3-char
    * words lands 1 char under 4n — acceptable for a heuristic gate;
    * pass explicit bounds to move the band). */
  def qualityGate(text: Column,
      minTokens: Int = 30, maxTokens: Int = 100000,
      minCharsPerTok: Int = 4, maxCharsPerTok: Int = 11,
      maxTopTokenPct: Int = 10, minStopPermille: Int = 50,
      stops: Seq[String] = Seq("the", "a", "and", "of", "to")): Column =
    aggregate(array(sort_array(tokens(text))),
      lit(null).cast(StructType(Seq(
        StructField("n_tokens", IntegerType),
        StructField("n_chars", IntegerType),
        StructField("top_count", IntegerType),
        StructField("stop_hits", IntegerType),
        StructField("keep", BooleanType),
        StructField("reject_reason", StringType)))),
      (_, w) => {
        val n = size(w)
        val chars = length(text)
        val top = topRunCount(w)
        val stopHits = size(filter(w, x => x.isin(stops: _*)))
        val tokOk = n >= minTokens && n <= maxTokens
        val lenOk = chars >= lit(minCharsPerTok) * n &&
          chars <= lit(maxCharsPerTok) * n
        val repOk = top * 100 <= n * maxTopTokenPct
        val stopOk = stopHits * 1000 >= n * minStopPermille
        struct(n.as("n_tokens"), chars.as("n_chars"),
          top.as("top_count"), stopHits.as("stop_hits"),
          (tokOk && lenOk && repOk && stopOk).as("keep"),
          when(!tokOk, "tokens").when(!lenOk, "word_len")
            .when(!repOk, "repetition").when(!stopOk, "stopwords")
            .otherwise("ok").as("reject_reason"))
      })

  /** PII scrubbing: replace email addresses and 16-digit card-shaped
    * numbers with typed placeholder tags. Patterns are deliberately
    * RE2-compatible (no lookahead/backrefs) so the same regex runs in
    * any engine; `regexp_replace` replaces ALL occurrences. Map-only,
    * codegen'd — scales linearly. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CardPattern = "[0-9]{4}(-[0-9]{4}){3}|[0-9]{16}"
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, lit(EmailPattern), lit("<EMAIL>")),
      lit(CardPattern), lit("<CARD>"))

  /** HTML stripping (web-scrape cleaning): remove tags, unescape the
    * five XML entities, collapse whitespace, trim. Tag regex is
    * RE2-compatible (`<[^>]+>` — no lookahead/backrefs) so the same
    * pattern runs in any engine (oracle: q85). `&amp;` decodes LAST:
    * the escaper encoded it first, so "&amp;lt;" round-trips to "&lt;"
    * (literal), not "<" — decode order is the difference between
    * unescaping and double-unescaping. Map-only, codegen'd. */
  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(c, lit("<[^>]+>"), lit(" "))
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (e, r)) => replace(col0, lit(e), lit(r)) }
    trim(regexp_replace(unescaped, lit("\\s+"), lit(" ")))
  }

  /** Block-level tags that delimit content blocks for [[mainContent]]
    * (opening or closing, attributes allowed, case-insensitive). */
  private val BlockTagPattern =
    "(?i)</?(?:p|div|td|th|h[1-6]|li|ul|ol|table|tr|article|section|" +
      "header|footer|nav|aside|blockquote|br)[^>]*>"

  /** Elements whose CONTENT is not page text. */
  val NonContentTags: Seq[String] = Seq("script", "style", "noscript")

  /** Remove the content of `<script>`/`<style>`/`<noscript>` elements
    * and HTML comments — the pass jusText/trafilatura run BEFORE any
    * block scoring. Tag-only stripping ([[stripHtml]]) removes the
    * `<script>` markers but leaves the JavaScript/CSS BODY behind,
    * and inline code is exactly the kind of long, link-free run that
    * passes a (length, link-density) gate and lands in a "clean"
    * corpus as prose; the element span has to go as a whole. One
    * RE2-compatible non-greedy replace per tag (no backreferences, so
    * the same patterns run in the DuckDB oracle); an UNCLOSED tag
    * keeps its content (no close marker to bound the span —
    * documented, spec-pinned). Map-only, codegen'd. */
  def dropNonContent(c: Column): Column = {
    val noComments = regexp_replace(c, lit("(?s)<!--.*?-->"), lit(" "))
    NonContentTags.foldLeft(noComments)((acc, t) =>
      regexp_replace(acc, lit(s"(?is)<$t[^>]*>.*?</$t\\s*>"), lit(" ")))
  }

  /** Main-content extraction (a jusText/trafilatura-lite heuristic —
    * the boilerplate-removal pass between "raw fetched HTML" and
    * "corpus document"): split the page into blocks at block-level
    * tags, strip each block ([[stripHtml]] semantics), and keep blocks
    * that are long enough (`>= minChars` stripped chars) AND not
    * link-dominated (`anchorChars·100 <= maxLinkDensityPct·textChars`
    * — integer cross-multiplication, so the verdict is bit-portable
    * like q96's gates). Navigation bars, share widgets, and footer
    * link rows are short and/or link-dense; article prose is neither.
    * Kept blocks re-join with newlines in page order. Anchor chars
    * count simple `<a ...>text</a>` bodies (nested markup inside an
    * anchor does not match — deterministic, mirrored in the oracle).
    * `<script>`/`<style>`/`<noscript>` element spans and HTML
    * comments are removed FIRST ([[dropNonContent]]) — script/style
    * are not block tags and their bodies are not markup, so without
    * this pass inline JS/CSS would survive as a long link-free
    * "block" and pass both gates.
    * Map-only: one split + in-array transform/filter, no shuffle. */
  def mainContent(c: Column, minChars: Int = 20,
      maxLinkDensityPct: Int = 30): Column = {
    val scored = transform(split(dropNonContent(c), BlockTagPattern), b => {
      val txt = stripHtml(b)
      // long verdict math: a single multi-MB link-farm block would
      // wrap aChars*100 in 32 bits and flip the keep decision (the
      // oracle computes in BIGINT)
      val aChars = aggregate(
        regexp_extract_all(b, lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)),
        lit(0L), (acc, x) => acc + length(x))
      struct(txt.as("t"),
        (length(txt) >= minChars &&
          aChars * 100L <= lit(maxLinkDensityPct.toLong) *
            length(txt).cast("long")).as("keep"))
    })
    // null-propagating (when() guard): concat_ws would fold a NULL
    // page to '' while the oracle's array_to_string propagates NULL
    when(c.isNotNull, concat_ws("\n",
      transform(filter(scored, s => s.getField("keep")),
        s => s.getField("t"))))
  }

  /** Unicode NFC normalization — native `graft_nfc` expression (Spark
    * has no built-in; see [[graft.expressions.NfcNormalize]] for why
    * dedup needs it and why NFC rather than NFKC). */
  def nfc(c: Column): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.column(graft.expressions.NfcNormalize(b.expression(c)))
  }

  /** Char-trigram language ID → struct<lang, score> — the native
    * `graft_langid` expression over the bundled integer-weight model
    * (see [[graft.expressions.LangIdKernel]]). Map-only, exact
    * integer scoring, oracle-replayable; use THIS (not the stopword
    * heuristic) as the mixing / per-language-sharding key. */
  def langId(c: Column): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.column(graft.expressions.LangIdExpr(b.expression(c)))
  }

  /** Compression-ratio quality signal (Gopher's repetitiousness
    * filter): DEFLATE-compressed size over UTF-8 size. Near-0 ratios
    * are template/repetition junk; near-1 (or >1 on short inputs —
    * DEFLATE has fixed overhead) is incompressible, often encoded
    * junk; prose sits between. Map-only native expression with
    * per-task Deflater reuse. NOT oracle-portable by design (DEFLATE
    * length is implementation-defined) — gate with it, don't
    * hash-compare it across engines; TextAnalysisSpec pins the
    * ordering and determinism properties instead. Empty text has no
    * meaningful ratio (0/0 bytes) — returns NULL, spec-pinned, so
    * gates must decide empties explicitly (an isNull arm), not
    * inherit a silent drop. */
  def compressionRatio(c: Column): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    val sz = b.column(graft.expressions.DeflateSize(b.expression(c)))
    // the guard is load-bearing under ANSI mode (default): an
    // unguarded divide THROWS on the first empty document
    when(octet_length(c) > 0, sz.cast(DoubleType) / octet_length(c))
  }

  /** The `k` most frequent whitespace tokens as (term, cnt), ordered
    * (count desc, term): map-side-combined counts + a TakeOrdered cut,
    * never a global sort. The ONE definition of "top corpus terms" —
    * shared by [[unigramLogProb]]'s vocabulary and
    * `TrainingOps.buildVocab`, so the tokenization and tie-break can
    * never drift between the scoring vocab and the exported one. */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(k)
  }

  /** Corpus-relative unigram log-probability score — the cheap
    * perplexity-style quality filter of a training pipeline (documents
    * whose tokens are improbable under the corpus's own unigram model
    * are disproportionately mojibake, boilerplate, or wrong-language).
    *
    * Two passes: (1) token counts → top-`vocabSize` vocabulary by
    * (count desc, term) via orderBy+limit — a TakeOrdered, O(V) to the
    * driver, never a global single-partition rank window; (2) tokens
    * LEFT-join the BROADCAST vocab; out-of-vocabulary tokens take an
    * add-half floor (ln(0.5/total)). Per-token log-probs land in
    * integer MICRO-units (round(ln·10⁶)) so the per-doc sum is exact
    * in any aggregation order — the q66 micropoint trick; a raw double
    * sum would be order-dependent and never hash-stable.
    *
    * Output: (doc_id, n_tokens, sum_logprob_micro, avg_logprob). */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val counts = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val vocab = topTerms(df.select(col(textCol)), textCol, vocabSize)
    tok.join(broadcast(vocab), Seq("term"), "left")
      .join(broadcast(total))
      .withColumn("_micro",
        coalesce(
          round(log(col("cnt").cast(DoubleType) / col("total")) * 1e6),
          round(log(lit(0.5) / col("total")) * 1e6)).cast(LongType))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_micro")).as("sum_logprob_micro"))
      .withColumn("avg_logprob",
        round(col("sum_logprob_micro") / 1e6 / col("n_tokens"), 4))
  }

  /** MODEL-BASED quality classifier — the learned tier above
    * [[qualityScore]]'s fixed heuristics (the role the fastText
    * classifier plays in public pipeline write-ups: bootstrap labels
    * from a trusted slice, train a cheap linear text model, score the
    * whole corpus). The model is multinomial Naive Bayes with
    * Laplace smoothing — chosen over iterated logistic regression
    * because NB training IS one relational aggregate (per-class token
    * counts), so train-then-score stays a fixed declarative plan an
    * independent SQL engine can replay exactly, no driver loop, no
    * learning-rate nondeterminism.
    *
    * Per-token class log-odds land in integer MICRO-units
    * (`round(ln·10⁶)` BEFORE summing — the [[unigramLogProb]]
    * micropoint trick) so the per-doc sum is exact in any aggregation
    * order. Smoothing: `w(t) = ln((c₁(t)+1)/(N₁+V)) −
    * ln((c₀(t)+1)/(N₀+V))` with V = corpus vocabulary size; prior =
    * `ln(D₁/D₀)` in the same micro-units. Train corpus = score corpus
    * (the bootstrap shape), so no unseen-token arm is needed — both
    * factors of every token's odds are materialized by the same scan.
    *
    * Scale shape: token counts are ONE hash aggregate with map-side
    * partials (a token in 10⁸ docs is one cell per map partition);
    * the per-token weight table is vocabulary-sized and joins the
    * token stream on `term` (AQE broadcasts it when it fits; worst
    * case a keys-plus-8-bytes shuffle, never document text); scoring
    * folds by doc id — token text crosses the wire once. Scalar
    * totals (N₁ N₀ V D₁ D₀) ride a broadcast 1-row cross join, in-plan.
    *
    * Output: (doc_id, n_tokens, score_micro, predicted) — positive
    * `score_micro` means the posterior favors the positive class. */
  def naiveBayesScore(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val lab = col(labelCol).cast(BooleanType)
    val base = df.select(col(idCol).as("doc_id"), lab.as("_y"),
      col(textCol).as("_t"))
    val tok = base.select(col("doc_id"), col("_y"),
      explode(tokens(col("_t"))).as("term"))
    val counts = tok.groupBy("term").agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("_y"), 0L).otherwise(1L)).as("c0"))
    val tot = counts.agg(
      sum("c1").as("n1"), sum("c0").as("n0"),
      count(lit(1)).as("v"))
    val priors = base.agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("_y"), 0L).otherwise(1L)).as("d0"))
    val weights = counts.join(broadcast(tot))
      .withColumn("w_micro",
        round((log((col("c1") + 1).cast(DoubleType) / (col("n1") + col("v"))) -
               log((col("c0") + 1).cast(DoubleType) / (col("n0") + col("v"))))
          * 1e6).cast(LongType))
      .select("term", "w_micro")
    tok.join(weights, Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("w_micro").as("_sum_w"))
      .join(broadcast(priors))
      // an empty class has no log-odds: fail loudly, not NaN-quietly
      .withColumn("_prior", when(col("d1") > 0 && col("d0") > 0,
          round(log(col("d1").cast(DoubleType) / col("d0")) * 1e6)
            .cast(LongType))
        .otherwise(raise_error(
          lit("naiveBayesScore: one class is empty — both label " +
            "values must occur in the training frame"))))
      .select(col("doc_id"), col("n_tokens"),
        (col("_sum_w") + col("_prior")).as("score_micro"),
        (col("_sum_w") + col("_prior") > 0).as("predicted"))
  }

  /** Mojibake artifact → intended character, the ftfy-style repair
    * table for the single most common encoding corruption in web
    * corpora: UTF-8 bytes decoded as Latin-1/cp1252 (é = C3 A9 reads
    * as "Ã©", ' = E2 80 99 reads as "â€™"). Pairs are ordered
    * 3-byte-artifact first; no artifact string contains another
    * pair's search key, so the replace fold can never cascade.
    * Deliberately conservative — only unambiguous digraphs whose
    * artifact form is vanishingly rare in legitimate text. */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€¦" -> "…",
    "â€“" -> "–",
    "Ã©" -> "é", "Ã¨" -> "è", "Ãª" -> "ê", "Ã£" -> "ã", "Ã§" -> "ç",
    "Ã±" -> "ñ", "Ã¶" -> "ö", "Ã¼" -> "ü", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã¡" -> "á", "Ã¬" -> "ì", "Ã²" -> "ò", "Ã¤" -> "ä", "Ã¥" -> "å",
    "Ã­" -> "í")

  /** Count of encoding-corruption artifacts in the text: UTF-8-as-
    * Latin-1 lead bytes (Ã/Â followed by a Latin-1 symbol-range
    * char) and the â€ punctuation-artifact prefix. The detection
    * signal a cleaning gate thresholds on (clean multilingual text —
    * Cyrillic, CJK, Arabic — never matches: those scripts don't
    * contain the Latin-1 artifact chars). Map-only. */
  def mojibakeCount(c: Column): Column =
    regexp_count(c, lit("[ÃÂ][ -¿]|â€"))

  /** Repair the [[MojibakeTable]] artifacts via an ordered replace
    * fold — the relational (oracle-replayable) slice of ftfy's fix:
    * table-driven, not a re-decode, so an independent engine applies
    * the identical pairs. Artifacts outside the table survive (the
    * count tells the caller). Map-only. */
  def mojibakeRepair(c: Column): Column =
    MojibakeTable.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** Per-script character counts + dominant script — the
    * language-consistency signal next to [[langId]] (a doc whose
    * langid says English but whose chars are 40% CJK is a mixed or
    * mis-segmented page). Counts are regexp_count over Unicode
    * ranges: latin (ASCII letters + Latin-1/Extended letters),
    * cyrillic, arabic, cjk (Han + kana + Hangul syllables). `script`
    * is the largest class (ties resolve in that listed order); text
    * outside all four classes — Thai, Greek, Hebrew, Devanagari,
    * digits-only — reports 'other', not a guess. Map-only; one pass
    * per class. */
  def scriptRatios(c: Column): Column = {
    // ×/÷ (00D7/00F7) sit inside the Latin-1 letter block and are
    // excluded; CJK = Han + hiragana/katakana + Hangul syllables
    val nLatin = regexp_count(c, lit(
      "[A-Za-zÀ-ÖØ-öø-ɏḀ-ỿ]"))
    val nCyr = regexp_count(c, lit("[Ѐ-ӿ]"))
    val nAr = regexp_count(c, lit("[؀-ۿ]"))
    val nCjk = regexp_count(c, lit(
      "[一-鿿぀-ヿ가-힣]"))
    val top = greatest(nLatin, nCyr, nAr, nCjk)
    struct(
      length(c).cast(LongType).as("n_chars"),
      nLatin.cast(LongType).as("n_latin"),
      nCyr.cast(LongType).as("n_cyrillic"),
      nAr.cast(LongType).as("n_arabic"),
      nCjk.cast(LongType).as("n_cjk"),
      when(top === 0, "other")
        .when(nLatin === top, "latin")
        .when(nCyr === top, "cyrillic")
        .when(nAr === top, "arabic")
        .otherwise("cjk").as("script"))
  }

  /** C4-style blocklist filter: flag documents containing any term
    * from a word blocklist (the "badwords" pass every public corpus
    * pipeline runs), matched TOKEN-EXACT on lowercased whitespace
    * tokens — substring matching is deliberately NOT offered
    * (the classic over-blocking failure: a blocklist entry hiding
    * inside an innocent longer word). Returns per-doc evidence, not
    * just a verdict: hit count with multiplicity, the distinct
    * blocked terms found (sorted, comma-joined — engine-portable
    * unlike array columns), and `kept`. Map-only: the blocklist is
    * a plan literal (Catalyst turns a >10-term isin into an O(1)
    * InSet probe inside codegen — the PSL-tier pattern), so a
    * 1000-term list costs one hash probe per token, no join, no
    * broadcast, no shuffle. */
  def blocklistFilter(df: DataFrame, idCol: String, textCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blocklist must not be empty")
    require(blocked.forall(w => w == w.toLowerCase),
      "blocklist entries must be lowercase (tokens are lowercased)")
    val lows = transform(tokens(col(textCol)), t => lower(t))
    // let-bind: HOF args re-evaluate per reference (the chunkByTokens
    // trick) — without this every use re-splits the text
    val out = aggregate(array(lows), lit(null).cast(
        "struct<n:long,terms:string>"),
      (_, ts) => {
        val hits = filter(ts, t => t.isin(blocked: _*))
        struct(
          size(hits).cast(LongType).as("n"),
          array_join(array_sort(array_distinct(hits)), ",").as("terms"))
      })
    df.select(col(idCol).as("doc_id"),
      out.getField("n").as("n_blocked_tokens"),
      out.getField("terms").as("blocked_terms"),
      (out.getField("n") === 0L).as("kept"))
  }

  /** Corpus-relative BIGRAM log-probability — one order up from
    * [[unigramLogProb]], the model CCNet-style perplexity filtering
    * actually wants (unigrams can't see scrambled word order; a
    * bag-of-frequent-words spam page scores fluent under a unigram
    * model and junk under a bigram one). Laplace-smoothed conditional:
    * `p(w₂|w₁) = (c(w₁,w₂)+1) / (c_left(w₁)+V)` with V = corpus
    * vocabulary size; per-bigram log-probs land in integer MICRO-units
    * before summing (the micropoint trick — order-exact sums).
    * Train corpus = score corpus, so every scored bigram is in the
    * count table by construction. Single-token documents have no
    * bigram evidence and are EXCLUDED from the output (run a length
    * gate first, as every pipeline does).
    *
    * Scale shape: bigram construction is map-only (two shifted array
    * slices zipped per doc); counts are one hash aggregate with
    * map-side partials; the (w₁,w₂)→weight table is
    * distinct-bigram-sized and joins the bigram stream on its own
    * keys (AQE broadcasts when small); scoring folds by doc id.
    *
    * Output: (doc_id, n_bigrams, sum_logprob_micro). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("_ws"))
      .withColumn("_n", size(col("_ws")))
    val bg = base.select(col("doc_id"),
        explode(when(col("_n") >= 2,
            arrays_zip(slice(col("_ws"), lit(1), col("_n") - 1).as("w1"),
                       slice(col("_ws"), lit(2), col("_n") - 1).as("w2")))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("_p"))
      .select(col("doc_id"), col("_p").getField("w1").as("w1"),
        col("_p").getField("w2").as("w2"))
    // r16: c12 is consumed twice (the cleft roll-up and the weight
    // join) — past the Par gate (big input) a lineage cut stops the
    // second consumer from re-running the whole corpus-sized bigram
    // explode + count (c12 is distinct-bigram-sized, orders below the
    // token stream); on a bench-small input the recompute is trivial
    // and the eager checkpoint job is overhead (the q191 lesson).
    val c12n = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val c12 =
      if (graft.ops.Par.isSmall(df)) c12n else c12n.localCheckpoint()
    val cl = c12.groupBy("w1").agg(sum("c").as("cleft"))
    val v = base.select(explode(col("_ws")).as("_t"))
      .agg(countDistinct(col("_t")).as("v"))
    val w = c12.join(cl, Seq("w1")).join(broadcast(v))
      .withColumn("lp_micro",
        round(log((col("c") + 1).cast(DoubleType) / (col("cleft") + col("v")))
          * 1e6).cast(LongType))
      .select("w1", "w2", "lp_micro")
    bg.join(w, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("lp_micro").as("sum_logprob_micro"))
  }

  /** Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; the
    * smoothing a CCNet-style corpus-quality LM actually uses) with
    * absolute discount D = 3/4, in EXACT micro-units: the whole
    * probability is one rational —
    *
    *   P(w|u) = [max(4·c(u,w) − 3, 0)·N₊₊ + 3·N₁₊(u·)·N₁₊(·w)]
    *            / (4·c(u·)·N₊₊)
    *
    * (numerator and denominator scaled by the discount's 4; N₁₊(u·) =
    * distinct continuations of u, N₁₊(·w) = distinct histories of w —
    * the continuation counts that make KN rank "Francisco" low as a
    * fresh continuation despite its raw frequency — N₊₊ = distinct
    * bigrams), evaluated as a single 128-bit integer floor division,
    * so every probability — including UNSEEN pairs, the point of
    * smoothing — is engine-exact. Probes are the `probeTopK`×
    * `probeTopK` pair grid of the top unigrams (count desc, word
    * tie-break) restricted to u seen as a history (c(u·) > 0 — the
    * backoff-to-unigram arm for unseen histories is a separate model
    * choice, and dividing by zero is not it).
    *
    * Scale shape: counts are three hash aggregates over the bigram
    * stream (map-side partials); the probe grid is parameter-bounded;
    * N₊₊ rides as a broadcast single-row aggregate. Output: (u, w, c,
    * p_micro) — Σ_w P(w|u) over the FULL vocab is 1 by construction
    * (spec-verified on a closed fixture). */
  def kneserNeyBigram(df: DataFrame, textCol: String,
      probeTopK: Int = 8): DataFrame = {
    require(probeTopK >= 1, s"probeTopK must be >= 1, got $probeTopK")
    val base = df.select(tokens(col(textCol)).as("_ws"))
      .withColumn("_n", size(col("_ws")))
    val bg = base.select(
        explode(when(col("_n") >= 2,
            arrays_zip(slice(col("_ws"), lit(1), col("_n") - 1).as("w1"),
                       slice(col("_ws"), lit(2), col("_n") - 1).as("w2")))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("_p"))
      .select(col("_p").getField("w1").as("w1"),
        col("_p").getField("w2").as("w2"))
    // r16: c12 feeds FOUR consumers (cu, cw, ncc, the probe join) and
    // uni feeds two (both probe-grid sides) — unmaterialized, each
    // consumer re-runs the corpus-sized bigram/token aggregation.
    // The lineage cut is gated INVERSELY on input size: on a big
    // input (the 100 TB path) c12 is distinct-bigram-sized and uni
    // probeTopK-bounded, so materializing them turns four corpus
    // passes into one; on a bench/dev-small input the recomputed
    // aggregates are trivial and the checkpoint's eager jobs are
    // pure overhead (A/B: unconditional checkpoint measured q191 at
    // 1.21-1.30× its baseline — reverted to lazy under the gate).
    val small = graft.ops.Par.isSmall(df)
    def cut(d: DataFrame): DataFrame =
      if (small) d else d.localCheckpoint()
    val c12 = cut(bg.groupBy("w1", "w2").agg(count(lit(1)).as("c")))
    val cu = c12.groupBy("w1").agg(sum("c").as("c_u"),
      count(lit(1)).as("n1u"))
    val cw = c12.groupBy("w2").agg(count(lit(1)).as("n1w"))
    val ncc = c12.agg(count(lit(1)).as("ncc"))
    val uni = cut(base.select(explode(col("_ws")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("tc"))
      .orderBy(col("tc").desc, col("t")).limit(probeTopK))
    val probes = uni.select(col("t").as("u"))
      .crossJoin(uni.select(col("t").as("w")))
    probes
      // name-keyed joins on renamed frames: cu/cw/c12 share lineage
      // (all derive from the bigram stream), so df("col") equality
      // predicates would be ambiguous self-join references
      .join(cu.select(col("w1").as("u"), col("c_u"), col("n1u")),
        Seq("u")) // inner: only seen histories
      .join(cw.select(col("w2").as("w"), col("n1w")), Seq("w"), "left")
      .join(c12.select(col("w1").as("u"), col("w2").as("w"), col("c")),
        Seq("u", "w"), "left")
      .crossJoin(broadcast(ncc))
      .select(col("u"), col("w"),
        coalesce(col("c"), lit(0L)).as("c"),
        col("c_u"), col("n1u"),
        coalesce(col("n1w"), lit(0L)).as("n1w"), col("ncc"))
      .withColumn("p_micro", expr(
        "CAST((CAST(greatest(4 * c - 3, 0) AS DECIMAL(38,0)) * ncc " +
          "+ CAST(3 AS DECIMAL(38,0)) * n1u * n1w) * 1000000 div " +
          "(CAST(4 AS DECIMAL(38,0)) * c_u * ncc) AS BIGINT)"))
      .select("u", "w", "c", "p_micro")
  }

  /** Windowed co-occurrence PMI (the word2vec/GloVe statistic): for
    * every ordered (center, context) pair within ±`window` positions,
    * the pointwise-mutual-information RATIO n(w,c)·N / (n(w)·n(c)) in
    * exact micro-units — the quantity inside the log, kept as one
    * 128-bit integer floor division so it is engine-exact (PMI itself
    * is ln(ratio/10⁶); a cross-engine ln can differ in the last ulp,
    * the ratio cannot — and ranking by ratio IS ranking by PMI).
    *
    * Scale shape: pair construction is MAP-ONLY — 2·window shifted
    * array zips per document, never a positions self-join (which is
    * |doc|·window rows too, but pays a shuffle and a join); counts are
    * hash aggregates with map-side partials; N rides as a broadcast
    * 1-row aggregate. `minCount` drops noise pairs BEFORE the count
    * joins; output is the top `topK` pairs by (ratio desc, w, c) — a
    * TakeOrdered, never a global sort. */
  def pmiPairs(df: DataFrame, textCol: String, window: Int = 2,
      minCount: Int = 5, topK: Int = 20): DataFrame = {
    require(window >= 1 && window <= 16, s"window $window")
    require(minCount >= 1 && topK >= 1, s"minCount $minCount topK $topK")
    val base = df.select(tokens(col(textCol)).as("_ws"))
      .withColumn("_n", size(col("_ws")))
    val empty = array().cast("array<struct<w:string,c:string>>")
    val arms = (1 to window).flatMap { dd =>
      Seq(
        when(col("_n") > dd, arrays_zip(
            slice(col("_ws"), lit(1), col("_n") - dd).as("w"),
            slice(col("_ws"), lit(dd + 1), col("_n") - dd).as("c")))
          .otherwise(empty),
        when(col("_n") > dd, arrays_zip(
            slice(col("_ws"), lit(dd + 1), col("_n") - dd).as("w"),
            slice(col("_ws"), lit(1), col("_n") - dd).as("c")))
          .otherwise(empty))
    }
    val pairs = base.filter(col("_n") >= 2)
      .select(explode(flatten(array(arms: _*))).as("_p"))
      .select(col("_p").getField("w").as("w"),
        col("_p").getField("c").as("c"))
    // r16: nwc feeds four consumers (nw, nc, tot, the scored join) —
    // past the Par gate (big input) a lineage cut stops each from
    // re-running the corpus-sized window-pair explode (nwc is
    // distinct-pair-sized); on a bench-small input the recompute is
    // trivial and the eager checkpoint job is overhead (the q191
    // lesson), so the plan stays lazy there.
    val nwc0 = pairs.groupBy("w", "c").agg(count(lit(1)).as("n_wc"))
    val nwc =
      if (graft.ops.Par.isSmall(df)) nwc0 else nwc0.localCheckpoint()
    val nw = nwc.groupBy("w").agg(sum("n_wc").as("n_w"))
    val nc = nwc.groupBy("c").agg(sum("n_wc").as("n_c"))
    val tot = nwc.agg(sum("n_wc").as("n_tot"))
    nwc.filter(col("n_wc") >= minCount)
      .join(nw, Seq("w"))
      .join(nc, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("ratio_micro", expr(
        "CAST(CAST(n_wc AS DECIMAL(38,0)) * n_tot * 1000000 div " +
          "(CAST(n_w AS DECIMAL(38,0)) * n_c) AS BIGINT)"))
      .orderBy(col("ratio_micro").desc, col("w"), col("c"))
      .limit(topK)
      .select("w", "c", "n_wc", "ratio_micro")
  }

  /** CCNet-style perplexity banding over [[bigramLogProb]]: rank every
    * document by mean bigram log-probability (best first, doc id
    * tie-break) and split the corpus into `nBuckets` equal bands —
    * band 1 ("head") is the most-fluent third under the corpus's own
    * LM, band `nBuckets` ("tail") the least. The split reproduces SQL
    * `ntile` EXACTLY (first `n mod k` bands take `⌊n/k⌋+1` rows) so an
    * independent engine's ntile is a value-level oracle — but the rank
    * itself comes from [[TrainingOps.globalRank]]'s range-parallel
    * prefix count, NEVER a single-task global window, and the band
    * arithmetic is per-row math against one broadcast count row.
    * Output: bigramLogProb columns + (avg_logprob, bucket). */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be at least 1")
    val scores0 = bigramLogProb(df, idCol, textCol)
      .withColumn("avg_logprob",
        round(col("sum_logprob_micro") / 1e6 / col("n_bigrams"), 4))
    // r16: the score table has THREE executions downstream —
    // globalRank's zipWithIndex is inherently two passes (offsets
    // count + the indexed map) and the band count aggregate is a
    // third — each re-running the whole bigram-LM scoring pipeline.
    // Under the Par gate (the input is the caller's raw projection)
    // the per-doc score table materializes once at bench/dev scale;
    // past the gate — the 100 TB path — the plan is unchanged (no
    // corpus-sized materialization).
    val scores =
      if (graft.ops.Par.isSmall(df)) scores0.localCheckpoint() else scores0
    val ranked = TrainingOps.globalRank(scores,
      Seq((col("sum_logprob_micro") / col("n_bigrams")).desc,
        col("doc_id")))
    val n = scores.agg(count(lit(1)).as("_nn"))
    val k = lit(nBuckets.toLong)
    ranked.join(broadcast(n))
      .withColumn("_q", floor(col("_nn") / k))
      .withColumn("_m", col("_nn") - col("_q") * k)
      .withColumn("_cut", col("_m") * (col("_q") + 1))
      .withColumn("bucket",
        when(col("rank") <= col("_cut"),
            ceil(col("rank") / (col("_q") + 1)))
          .otherwise(col("_m") +
            ceil((col("rank") - col("_cut")) / col("_q")))
          .cast(IntegerType))
      .select(col("doc_id"), col("n_bigrams"), col("sum_logprob_micro"),
        col("avg_logprob"), col("bucket"))
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

  /** Public-suffix rules for the registrable-domain logic, loaded from
    * the bundled resource (an ICANN-section subset of the Public
    * Suffix List, publicsuffix.org — ~800 entries covering the ccTLD
    * second/third levels real corpora actually hit, in PSL syntax:
    * literal suffixes, `*.<tld>` wildcards, `!<host>` exceptions).
    * All tiers ship as plan literals (one `isin` per tier — Catalyst
    * turns >10 literals into an O(1) InSet probe inside codegen), so
    * growing the list never changes the plan shape. Wildcard scope:
    * the `*.X` form (one wildcard label directly under a TLD) and its
    * `!Y.X` exceptions — the only wildcard shapes in the ICANN ccTLD
    * section this subset covers; deeper wildcard rules
    * (`*.name.tld`) would be one more literal tier. */
  private val pslLines: Vector[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_multilabel.txt")
    require(in != null, "bundled public-suffix resource missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .toVector.distinct.sorted
    finally in.close()
  }

  /** Literal multi-label public suffixes (wildcards/exceptions split
    * out into [[WildcardTlds]] / [[PslExceptions]]). */
  val MultiLabelSuffixes: Seq[String] =
    pslLines.filterNot(l => l.startsWith("*.") || l.startsWith("!"))

  /** TLDs under which EVERY second-level label is a public suffix
    * (`*.ck` → suffix = `<anything>.ck`). */
  val WildcardTlds: Seq[String] =
    pslLines.filter(_.startsWith("*.")).map(_.drop(2))

  /** Exception hosts carved out of a wildcard rule (`!www.ck` → the
    * registrable domain of `[…].www.ck` is `www.ck` itself). */
  val PslExceptions: Seq[String] =
    pslLines.filter(_.startsWith("!")).map(_.drop(1))

  /** [[MultiLabelSuffixes]] split by label count: (2-label, 3-label). */
  private val (suffixes2, suffixes3) =
    MultiLabelSuffixes.partition(_.count(_ == '.') == 1)

  /** SQL string literal with embedded single quotes doubled — the
    * resource files are clean today, but un-escaped interpolation is
    * one data edit away from silently breaking the oracle query. */
  private def sqlLit(s: String): String = s"'${s.replace("'", "''")}'"

  /** The suffix tiers as SQL literal lists, so oracle SQL interpolates
    * the SAME bundled list the plan uses — the two can never drift. */
  def suffix2SqlList: String = suffixes2.map(sqlLit).mkString(",")
  def suffix3SqlList: String = suffixes3.map(sqlLit).mkString(",")
  def wildcardTldSqlList: String = WildcardTlds.map(sqlLit).mkString(",")
  def pslExceptionSqlList: String = PslExceptions.map(sqlLit).mkString(",")

  /** URL provenance parts — the canonicalization every web-scrape
    * pipeline needs before per-site dedup, domain mixing (q68), and
    * contamination audits: `struct(host, domain, path)` where
    *  - `host` = lowercased authority with scheme/userinfo/port
    *    stripped and a leading `www.` removed;
    *  - `domain` = registrable domain: suffix + one label, where the
    *    suffix is the PSL's prevailing rule: an exception
    *    ([[PslExceptions]], `!www.ck`) beats everything and IS the
    *    registrable domain; else the longest match among 3-label
    *    literals, `*.tld` wildcards ([[WildcardTlds]] — the wildcard
    *    expands to a 2-label suffix), 2-label literals, and the TLD
    *    default; single-label hosts (and hosts that EQUAL a public
    *    suffix, which have no registrable domain) pass through;
    *  - `path` = the path component, query/fragment stripped (the
    *    utm-junk defense — tracking params must not split a page's
    *    identity).
    * Pure codegen'd Column functions, map-only, and every step is
    * replayable in ANSI SQL — the oracle mirrors it exactly. */
  def urlParts(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url,
        "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)),
      "^www\\.", "")
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = when(n >= 2,
      concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
    val last3 = when(n >= 3,
      concat_ws(".", element_at(parts, -3), element_at(parts, -2),
        element_at(parts, -1)))
    val last4 = when(n >= 4,
      concat_ws(".", element_at(parts, -4), element_at(parts, -3),
        element_at(parts, -2), element_at(parts, -1)))
    val domain = when(n >= 2 && last2.isin(PslExceptions: _*), last2)
      .when(n >= 4 && last3.isin(suffixes3: _*), last4)
      .when(n >= 3 && element_at(parts, -1).isin(WildcardTlds: _*), last3)
      .when(n >= 3 && last2.isin(suffixes2: _*), last3)
      .otherwise(coalesce(last2, host))
    val path = regexp_extract(url, "://[^/]*(/[^?#]*)", 1)
    struct(host.as("host"), domain.as("domain"), path.as("path"))
  }

  /** Unicode CONFUSABLE folding — the typographic-variant
    * normalization that runs before hashing/dedup (NFC won't touch
    * these: curly quotes, en/em dashes, NBSP, the ellipsis glyph and
    * the fi/fl ligatures are all distinct NFC-normal codepoints that
    * make byte-identical prose hash differently across sources).
    * 1→1 maps go through ONE translate pass, 1→many through three
    * replaces; every step replays verbatim in any engine with
    * translate/replace. Deliberately NOT NFKC (which would also fold
    * ², ½, roman numerals — lossy beyond typography). Map-only. */
  def foldConfusables(c: Column): Column = {
    val folded = translate(c,
      "‘’“”–— ",
      "''\"\"--" + " ")
    regexp_replace(regexp_replace(regexp_replace(folded,
      lit("…"), lit("...")),
      lit("ﬁ"), lit("fi")),
      lit("ﬂ"), lit("fl"))
  }

  /** URL QUERY-PARAM canonicalization — the finer-grained sibling of
    * [[urlParts]]' strip-everything `path`: keeps the params that
    * select content but drops tracking params (`utm_*` plus an
    * explicit list) and re-emits the survivors SORTED, so
    * `?b=2&a=1&utm_source=x` and `?a=1&b=2` canonicalize identically
    * — the crawl-frontier dedup key for sites where params DO select
    * content (product ids, page numbers). The fragment drops.
    * Pure list ops, map-only, engine-replayable. */
  def canonicalizeUrlParams(url: Column,
      dropParams: Seq[String] = Seq("fbclid", "gclid", "msclkid",
        "ref", "source")): Column = {
    val base = regexp_extract(url, "^([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !substring_index(p, "=", 1).startsWith("utm_") &&
        !substring_index(p, "=", 1).isin(dropParams: _*)))
    when(size(kept) > 0, concat(base, lit("?"), array_join(kept, "&")))
      .otherwise(base)
  }

  /** License-family tag for compliance filtering (the code/document
    * provenance gate): FIRST match wins over an ordered rule list of
    * (family, case-insensitive literal marker phrase); no match →
    * "unknown". Literal `contains` matching, not regex — the marker
    * phrases identifying the major license families are distinctive
    * fixed strings, and literal matching is trivially engine-
    * portable. Map-only, one pass. */
  def licenseFamily(text: Column,
      rules: Seq[(String, String)] = Seq(
        "apache-2.0" -> "licensed under the apache license",
        "mit" -> "permission is hereby granted, free of charge",
        "gpl" -> "gnu general public license",
        "bsd" -> "redistribution and use in source and binary forms",
        "cc" -> "creative commons")): Column = {
    require(rules.nonEmpty, "at least one license rule required")
    val lowered = lower(coalesce(text, lit("")))
    rules.foldRight(lit("unknown")) { case ((fam, marker), rest) =>
      when(lowered.contains(lit(marker.toLowerCase)), lit(fam))
        .otherwise(rest)
    }
  }

  /** Length of the longest common prefix of two strings as an
    * early-stopping linear scan: one single-char probe per position
    * with an `ok` flag that freezes the count at the first mismatch —
    * O(min len) character compares, never O(len²) prefix re-compares.
    * Empty/NULL-adjacent inputs yield 0. */
  def lcpLen(a: Column, b: Column): Column = {
    val n = least(length(a), length(b))
    val idx = when(n >= 1, sequence(lit(1), n))
      .otherwise(array().cast("array<int>"))
    aggregate(idx,
      struct(lit(0).as("k"), lit(true).as("ok")),
      (acc, i) => when(
        acc.getField("ok") && a.substr(i, lit(1)) === b.substr(i, lit(1)),
        struct(i.as("k"), lit(true).as("ok")))
        .otherwise(struct(acc.getField("k").as("k"),
          lit(false).as("ok"))),
      acc => acc.getField("k"))
  }

  /** Per-group boilerplate prefix detection via the sorted-extremes
    * LCP identity: the longest common prefix of ALL strings in a
    * group equals LCP(min(s), max(s)) under lexicographic order — any
    * string between the extremes shares at least their common prefix,
    * so ONE (min, max, count) aggregate replaces every pairwise
    * comparison. This is the shared-header/nav-chrome stripper for
    * crawled corpora: docs from one template-driven site open with
    * identical chrome, and the group LCP IS that chrome. Scale shape:
    * one map-side-combinable aggregate over the corpus, then a
    * group-count-sized map-only LCP scan ([[lcpLen]], O(len) probes)
    * — no self-join, no per-pair work, state per group is two strings.
    * Output: (groupCol, n_docs, lcp_len, boilerplate). */
  def groupBoilerplate(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        min(col(textCol)).as("_lo"), max(col(textCol)).as("_hi"))
    val lcp = lcpLen(col("_lo"), col("_hi"))
    agg.select(col(groupCol), col("n_docs"),
      lcp.cast(LongType).as("lcp_len"),
      col("_lo").substr(lit(1), lcp).as("boilerplate"))
  }

  /** PII pattern set for [[piiRedact]] — deliberately restricted to a
    * regex dialect Java and RE2 (DuckDB) share, so the scrub is
    * oracle-replayable: no lookarounds, no backrefs, ASCII classes.
    * Emails redact FIRST — an email's local/domain parts contain
    * digit-and-dot runs an IPv4 pattern could otherwise bite into;
    * with the email gone the remaining matches are disjoint by
    * construction (phones require separators IPv4 forbids). */
  private[llm] val PiiEmailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[llm] val PiiIpv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[llm] val PiiPhoneRe =
    "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4,10}"

  /** PII scrubbing — the redaction pass every released training
    * corpus runs (emails, IPv4 addresses, international-format phone
    * numbers → typed placeholders). Each pattern's count is taken on
    * the text AFTER the previous pattern's redaction — exactly the
    * sequence the replacements run (n_emails on the raw text, n_ipv4
    * on the email-redacted text, n_phones on the email+IP-redacted
    * text) — so a count can never include characters an earlier
    * placeholder replaced, and the q232 oracle replays the same
    * sequence; the ordering-disjointness argument above (emails
    * first) is what keeps the later counts faithful to the raw text
    * too. Map-only: three regexp_count + three regexp_replace per
    * row, no shuffle, codegen-friendly — at 100 TB this is a pure
    * scan. Output: (idCol, n_emails, n_ipv4, n_phones, redacted). */
  def piiRedact(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    val noEmail = regexp_replace(t, PiiEmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, PiiIpv4Re, "<IP>")
    df.select(col(idCol),
      regexp_count(t, lit(PiiEmailRe)).cast(LongType).as("n_emails"),
      regexp_count(noEmail, lit(PiiIpv4Re)).cast(LongType).as("n_ipv4"),
      regexp_count(noIp, lit(PiiPhoneRe)).cast(LongType).as("n_phones"),
      regexp_replace(noIp, PiiPhoneRe, "<PHONE>").as("redacted"))
  }
}
