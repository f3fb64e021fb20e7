package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q121+: round-8 additions.
  *
  * Every query ends in a total ORDER BY.
  */
object R8Queries {
  private val T = Tables

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] iterative BPE tokenizer training: 6 driver-looped merge
    // rounds over the documents corpus — each round counts adjacent
    // symbol pairs (occurrence-weighted over the distinct-word
    // frequency table), merges the single most frequent pair
    // (deterministic tie-break: count desc, left, right) in every
    // word, and repeats on the merged table. The ordered merge table
    // IS the trained tokenizer. The oracle unrolls the same 6 rounds
    // as chained CTEs over the same separator-string representation
    // (chr(31)-bounded symbols; replace() is the greedy merge in both
    // engines).
    //
    // BENCH READING: trainBpe is the INCREMENTAL trainer (r9) — it
    // pays a constant setup (initial full pair table + per-round
    // localCheckpoint of the delta-maintained counts) that DOMINATES
    // at this demo's 6 rounds, so q121's bench time is ~1.7× the old
    // full-recount number BY DESIGN. The crossover is ~round 10:
    // SCALE.md's bpe_train_inc10/inc50 vs recount10 rows measure
    // 0.68 s/round (rounds 1-10) and 0.54 s/round (rounds 11-50)
    // incremental vs 1.49 s/round recount on a 3.5M-word Zipf corpus
    // — at production 32k merges the recount form is ~50 ks slower.
    // Do not "fix" q121 by reverting to trainBpeRecount.
    "q121_bpe_train" -> ((s, d) =>
      graft.llm.TrainingOps.trainBpe(
        T.documents(s, d).select(col("text")), "text", numMerges = 6)
      .orderBy("merge_idx")),

    // [EXT] BPE ENCODE with the trained table (the serving side):
    // train 6 merges on the corpus, collect the parameter-bounded
    // merge table to the driver, then re-encode every document
    // map-only through the native graft_bpe_encode expression.
    // The oracle replays the same 6 training rounds (carrying the
    // word through each round this time) and joins each document
    // token to its final segmentation relationally.
    "q122_bpe_encode" -> ((s, d) => {
      // r15: fan-out A/B'd and rejected in both shapes (all-fanned
      // 1.57×, serving-only 1.49× — the char-level native encode is
      // too cheap per row to amortize 32 tasks' fixed costs; contrast
      // q213's byte-level encode, where serving-only fan-out wins)
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val merges = graft.llm.TrainingOps.trainBpe(
        docs.select(col("text")), "text", numMerges = 6)
        .orderBy("merge_idx").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      docs.select(col("doc_id"),
          graft.llm.TrainingOps.bpeEncode(col("text"), merges).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_bpe_tokens"),
          concat_ws(" ", col("toks")).as("bpe_text"))
        .orderBy("doc_id")
    }),

    // [EXT] Gopher duplicate-n-gram repetition signals: per doc the
    // top-2-gram count/chars and the duplicated-5-gram char mass, all
    // exact integers (ratios are the caller's division — see
    // TextAnalysis.dupNgramStats for the overlap-estimator caveat).
    // Map-only sorted-run folds; the oracle recomputes the same
    // multisets relationally per doc.
    "q123_dup_ngrams" -> ((s, d) => {
      val s2 = graft.llm.TextAnalysis.dupNgramStats(col("text"), 2)
      val s5 = graft.llm.TextAnalysis.dupNgramStats(col("text"), 5)
      T.documents(s, d)
        .select(col("doc_id"), s2.as("s2"), s5.as("s5"),
          length(col("text")).cast("int").as("doc_chars"))
        .select(col("doc_id"),
          col("s2.n_ngrams").as("n2_ngrams"),
          col("s2.top_cnt").as("n2_top_cnt"),
          col("s2.top_gram").as("n2_top_gram"),
          col("s2.top_chars").as("n2_top_chars"),
          col("s5.n_ngrams").as("n5_ngrams"),
          col("s5.dup_chars").as("n5_dup_chars"),
          col("doc_chars"))
        .orderBy("doc_id")
    }),

    // [EXT] recursive sitemap expansion end-to-end: per nation a
    // 2-level planted index (root sitemapindex → two child urlsets,
    // one page listed in BOTH children with different lastmods) runs
    // through the full fetch→parse→anti-join loop; fetch is a lookup
    // join against the in-plan bodies table. The oracle derives the
    // flattened frontier from the same base rows relationally —
    // including the cross-sitemap min-lastmod pick.
    "q124_sitemap_expand" -> ((s, d) => {
      val nat = T.nation(s, d)
        .select(col("n_nationkey").cast("int").as("k"))
      val host = concat(lit("https://n"), col("k").cast("string"),
        lit(".example"))
      val rootXml = concat(
        lit("<sitemapindex><sitemap><loc>"), host,
        lit("/s1.xml</loc></sitemap><sitemap><loc>"), host,
        lit("/s2.xml</loc></sitemap></sitemapindex>"))
      val s1Xml = concat(
        lit("<urlset><url><loc>"), host,
        lit("/p1</loc><lastmod>2024-01-0"),
        (pmod(col("k"), lit(9)) + 1).cast("string"),
        lit("</lastmod></url><url><loc>"), host,
        lit("/p2</loc></url><url><loc>"), host,
        lit("/p3</loc><lastmod>2024-03-05</lastmod></url></urlset>"))
      val s2Xml = concat(
        lit("<urlset><url><loc>"), host,
        lit("/p3</loc><lastmod>2024-02-02</lastmod></url><url><loc>"),
        host, lit("/p4</loc></url></urlset>"))
      val seeds = nat.select(
        concat(host, lit("/sitemap.xml")).as("sm_url"), rootXml.as("xml"))
      val bodies = nat
        .select(concat(host, lit("/s1.xml")).as("sm_url"), s1Xml.as("xml"))
        .union(nat.select(concat(host, lit("/s2.xml")).as("sm_url"),
          s2Xml.as("xml")))
      val fetch = (u: org.apache.spark.sql.DataFrame) =>
        u.join(bodies, Seq("sm_url"))
      graft.llm.Crawl.expandSitemaps(seeds, "sm_url", "xml", fetch)
        .orderBy("url")
    }),

    // [EXT] PII scrubbing: plant a deterministic email / IPv4 /
    // phone-pair per document, redact with typed tags, count each
    // category against the original text. Patterns are RE2-safe so
    // the oracle replays them verbatim (with the 'g' flag — DuckDB
    // replaces first-match-only by default).
    "q125_pii_scrub" -> ((s, d) => {
      val planted = concat(col("text"),
        lit(" contact p"), col("doc_id").cast("string"),
        lit("@example.com or 10.0."),
        pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
        pmod(col("doc_id"), lit(100)).cast("string"),
        lit(" or call +49151123450"),
        pmod(col("doc_id"), lit(10)).cast("string"),
        lit(" or 555-123-4567 today"))
      // r15: six per-row regex passes single-task — fan out (q232 twin)
      graft.ops.Par.fanOut(
          T.documents(s, d).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"),
          graft.llm.TextAnalysis.piiScrub(planted).as("p"))
        .select(col("doc_id"), col("p.clean_text").as("clean_text"),
          col("p.n_emails").as("n_emails"), col("p.n_ipv4").as("n_ipv4"),
          col("p.n_phones").as("n_phones"))
        .orderBy("doc_id")
    }),

    // [EXT] vocabulary coverage curve (tokenizer sizing): cumulative
    // corpus-occurrence coverage per vocab rank in exact integer
    // micro-units (long floor division in both engines — never a
    // double ratio).
    "q126_vocab_coverage" -> ((s, d) =>
      graft.llm.TrainingOps.vocabCoverage(
        T.documents(s, d).select(col("text")), "text", size = 200)
        .orderBy("rank")),

    // [EXT] perceptual image dHash over REAL decoded BMP pixels (the
    // q91 planted-pixel fixture, larger dims): 9×8 nearest-neighbor
    // grid → integer milli-luma → 64 horizontal-gradient bits — the
    // embedding-free image near-dup key. Exact integer arithmetic
    // end-to-end, so the oracle replays sampling, luma and bit
    // packing relationally from the same pixel formula (bit 63 is
    // the min-long literal: DuckDB's << throws on 1<<63).
    "q127_image_dhash" -> ((s, d) => {
      val k = col("p_partkey")
      graft.llm.Multimodal.imageDHash(
        T.part(s, d).filter(pmod(k, lit(5)) === 0)
          .select(k.as("id"), plantedBmp(k).as("payload")),
        "id", "payload")
        .orderBy("id")
    }),

    // [EXT] image NEAR-DUP pairs over the dHash: each planted image
    // appears under TWO ids (byte-identical twins) plus unrelated
    // images; the Hamming blocking join (pigeonhole chunks over the
    // 64-bit signature) must find exactly the pairs the oracle's
    // ALL-PAIRS bit_count replay finds — the oracle proves the
    // blocking is COMPLETE w.r.t. the threshold, not a recall trade.
    "q128_image_neardup" -> ((s, d) => {
      val ids = T.part(s, d)
        .filter(pmod(col("p_partkey"), lit(5)) === 0)
        .select(col("p_partkey").as("kk"))
        .select(col("kk"), explode(array(lit(0), lit(1))).as("twin"))
        .select((col("kk") * 2 + col("twin")).as("id"), col("kk"))
      val hashed = graft.llm.Multimodal.imageDHash(
        ids.select(col("id"), plantedBmp(col("kk")).as("payload")),
        "id", "payload")
        .filter(col("dhash").isNotNull)
      graft.llm.Dedup.hammingPairs64(hashed, "id", "dhash",
        maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // [EXT] Sitemap: directives from robots.txt — the expandSitemaps
    // seed source. Fixture exercises the protocol shapes: canonical
    // casing with a trailing comment, a tab-indented lowercase
    // directive with tab after the colon (group-independent — it
    // sits inside a User-agent section), and an empty value (drops).
    "q129_robots_sitemaps" -> ((s, d) => {
      val k = col("n_nationkey").cast("int")
      val host = concat(lit("n"), k.cast("string"), lit(".example"))
      val txt = concat(
        lit("User-agent: *\nDisallow: /private/\n"),
        lit("Sitemap: https://"), host,
        lit("/sitemap.xml   # primary\n"),
        lit("\tsitemap:\thttps://"), host,
        lit("/s"), pmod(k, lit(3)).cast("string"), lit(".xml\n"),
        lit("Sitemap:\nUser-agent: bot\nDisallow: /\n"))
      graft.llm.Crawl.extractRobotsSitemaps(
        T.nation(s, d).select(host.as("host"), txt.as("txt")),
        "host", "txt")
        .orderBy("host", "idx")
    }),

    // [EXT] audio fingerprint over REAL decoded WAV PCM: 65
    // constant-amplitude windows (the q92 planted-amp scheme at
    // fingerprint width — exact float RMS) → 64 energy-gradient
    // bits. The oracle replays every bit as a pure integer amplitude
    // comparison; bit 63 is the min-long literal as in q127.
    "q130_audio_fingerprint" -> ((s, d) => {
      val k = col("p_partkey")
      graft.llm.Multimodal.audioFingerprint(
        T.part(s, d).filter(pmod(k, lit(5)) === 0)
          .select(k.as("id"), plantedWav(k).as("payload")),
        "id", "payload")
        .orderBy("id")
    }),

    // [EXT] per-frame video dHash over REAL uncompressed-AVI frames
    // (the q93 planted-pixel fixture): every sampled frame's 64
    // gradient bits replayed by the oracle from the same affine
    // pixel formula — the video tier of the near-dup family.
    "q131_video_dhash" -> ((s, d) => {
      val k = col("p_partkey")
      graft.llm.Multimodal.videoFrameDHash(
        T.part(s, d).filter(pmod(k, lit(5)) === 0)
          .select(k.as("id"), R5Queries.plantedAvi(k).as("payload")),
        "id", "payload", every = 2)
        .orderBy("id", "frame_idx")
    }),

    // [EXT] per-language vocabulary (the routing table a multilingual
    // tokenizer/mix pass keys on): top-k terms per language by
    // (count desc, term). Scale shape: counts are map-side combined
    // on (lang, term); the per-language rank is a WindowGroupLimit —
    // partial top-k per partition, so a hot language never buffers
    // its whole distinct-term set in one task.
    "q132_vocab_per_lang" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = T.documents(s, d)
        .select(col("lang"),
          explode(graft.llm.TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
      counts
        .withColumn("rank", row_number().over(
          Window.partitionBy("lang")
            .orderBy(col("cnt").desc, col("term"))))
        .filter(col("rank") <= 10)
        .select(col("lang"), col("rank").cast("int").as("rank"),
          col("term"), col("cnt"))
        .orderBy("lang", "rank")
    }),

    // [EXT] per-host frontier cap (crawl politeness): keep the top-k
    // URLs per host by a deterministic priority — the per-trigger
    // fetch budget. Same WindowGroupLimit shape as q132; a mega-host
    // frontier never serializes through one task's full sort.
    "q133_frontier_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = col("o_orderkey")
      val urls = T.orders(s, d).select(
        concat(lit("h"), pmod(k, lit(50)).cast("string"),
          lit(".example.com")).as("host"),
        concat(lit("/page/"), k.cast("string")).as("path"),
        pmod(k * 2654435761L, lit(1000003)).as("priority"))
      urls
        .withColumn("rank", row_number().over(
          Window.partitionBy("host")
            .orderBy(col("priority").desc, col("path"))))
        .filter(col("rank") <= 5)
        .select(col("host"), col("rank").cast("int").as("rank"),
          col("path"), col("priority"))
        .orderBy("host", "rank")
    }),

    // [EXT] the training-data chain end-to-end in one call — the
    // q112 counterpart for the corpus side: token-band quality
    // filter → exact content dedup (keep-min survivor) → per-language
    // token packing. Every stage is the audited operator (tokenCountWs
    // / exactDedupByContent / packByTokenBudget), so the chain's plan
    // is the composition of their pinned shapes; the oracle replays
    // filter, min-per-hash, and the prefix-sum pack relationally.
    "q134_training_chain" -> ((s, d) => {
      val docs = T.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("n_tokens",
          graft.llm.TextAnalysis.tokenCountWs(col("text")))
        .filter(col("n_tokens").between(5, 1000))
      val keep = graft.llm.Dedup.exactDedupByContent(docs, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      val surv = docs.join(keep, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_tokens"))
      graft.llm.TrainingOps.packByTokenBudget(surv, "lang", "doc_id",
          col("n_tokens").cast("long"), budget = 2000)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("pack_id"))
        .orderBy("doc_id")
    }),

    // [EXT] exact-substring passage dedup (Lee et al. ACL 2022, the
    // token-window formulation): erase every token covered by a
    // 6-token window whose exact text occurs ≥2 times corpus-wide,
    // and rebuild each document from its surviving tokens (~9% of
    // tokens at every SF of the synthetic corpus). Exact-string
    // window keys here for oracle parity; the byHash tier (spec-
    // pinned equal) is the 100 TB mode where window text never
    // crosses the wire.
    "q135_exact_substr" -> ((s, d) =>
      // r15: fan-out A/B'd and rejected (1.16× — q233's verdict)
      graft.llm.Dedup.exactSubstrDedup(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k = 6)
        .orderBy("doc_id")),

    // [EXT] model-based quality classifier: bootstrap labels from a
    // trusted slice (here: the langid-tagged English cohort), train
    // Laplace-smoothed Naive Bayes log-odds in one relational
    // aggregate, score every document in integer micro-units — the
    // fastText-classifier role of public pipelines with a plan an
    // independent SQL engine replays exactly.
    "q136_nb_quality" -> ((s, d) =>
      graft.llm.TextAnalysis.naiveBayesScore(
          T.documents(s, d).select(col("doc_id"), col("text"),
            (col("lang") === "en").as("is_en")),
          "doc_id", "text", "is_en")
        .orderBy("doc_id")),

    // [EXT] CCNet-style perplexity banding: score every document
    // under the corpus's own Laplace bigram LM (integer micro-unit
    // logprobs), rank by mean logprob via the range-parallel global
    // prefix count (never a single-task window), and cut the corpus
    // into head/middle/tail thirds with exact ntile arithmetic — the
    // oracle's ntile() is the independent check of the band formula.
    "q137_ppl_buckets" -> ((s, d) =>
      graft.llm.TextAnalysis.perplexityBuckets(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", nBuckets = 3)
        .withColumn("ppl_band",
          when(col("bucket") === 1, "head")
            .when(col("bucket") === 2, "middle").otherwise("tail"))
        .drop("bucket")
        .orderBy("doc_id")),

    // [EXT] C4-style blocklist ("badwords") filter: token-exact,
    // lowercased, with per-doc evidence — hit count, the distinct
    // blocked terms found, and the keep verdict. Map-only InSet
    // probe per token; no join, no shuffle.
    "q138_blocklist" -> ((s, d) =>
      graft.llm.TextAnalysis.blocklistFilter(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", Seq("dup", "fast"))
        .orderBy("doc_id")),

    // [EXT] Crawl-delay extraction with parseRobotsTxt's group
    // resolution: the fixture plants a * delay on every host, an
    // agent-specific group with TWO delays (first-in-file wins) on
    // every 3rd, a crawl-delay BETWEEN two User-agent lines on every
    // 4th (a rule line here — it closes the first header), and an
    // invalid value on every 5th (drops).
    "q139_crawl_delay" -> ((s, d) => {
      val hosts = T.documents(s, d)
        .select(pmod(col("doc_id"), lit(40)).as("hi")).distinct()
      val txt = concat(
        lit("User-agent: *\nCrawl-delay: 2   # default pace\n" +
          "Disallow: /private/\n"),
        when(pmod(col("hi"), lit(3)) === 0,
          lit("\nUser-agent: graftbot\nCrawl-delay:\t0.5\n" +
            "Allow: /fast/\nCrawl-delay: 9\n")).otherwise(lit("")),
        when(pmod(col("hi"), lit(4)) === 0,
          lit("User-agent: extra\nCrawl-delay: 7\n" +
            "User-agent: other\nDisallow: /x/\n")).otherwise(lit("")),
        when(pmod(col("hi"), lit(5)) === 0,
          lit("User-agent: slowbot\nCrawl-delay: soon\n"))
          .otherwise(lit("")))
      graft.llm.Crawl.extractCrawlDelay(
          hosts.select(
            concat(lit("h"), col("hi").cast("string"),
              lit(".example.com")).as("host"), txt.as("txt")),
          "host", "txt", agent = "graftbot")
        .orderBy("host")
    }),

    // [EXT] politeness scheduling — the frontier cap (q133) composed
    // with per-host Crawl-delay (q139 shape): each host's rank-k URL
    // is offset (rank−1)·delay ms into the crawl window, defaulting
    // to 1000 ms where the host declares none. The host-time budget
    // a real fetcher enforces, computed corpus-wide in one plan.
    "q140_politeness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = col("o_orderkey")
      val urls = T.orders(s, d).select(
        concat(lit("h"), pmod(k, lit(50)).cast("string"),
          lit(".example.com")).as("host"),
        concat(lit("/page/"), k.cast("string")).as("path"),
        pmod(k * 2654435761L, lit(1000003)).as("priority"))
      val frontier = urls
        .withColumn("rank", row_number().over(
          Window.partitionBy("host")
            .orderBy(col("priority").desc, col("path"))))
        .filter(col("rank") <= 5)
      val hosts = T.documents(s, d)
        .select(pmod(col("doc_id"), lit(40)).as("hi")).distinct()
      val robots = hosts.select(
        concat(lit("h"), col("hi").cast("string"),
          lit(".example.com")).as("host"),
        concat(lit("User-agent: *\nCrawl-delay: "),
          (pmod(col("hi"), lit(4)) + 1).cast("string"),
          lit("\nDisallow: /private/\n")).as("txt"))
      val delays = graft.llm.Crawl.extractCrawlDelay(
        robots, "host", "txt", agent = "graftbot")
      frontier.join(delays, Seq("host"), "left")
        .withColumn("delay_ms",
          coalesce(col("crawl_delay_ms"), lit(1000L)))
        .select(col("host"), col("rank").cast("int").as("rank"),
          col("path"),
          ((col("rank") - 1) * col("delay_ms")).as("fetch_offset_ms"))
        .orderBy("host", "rank")
    }),

    // [EXT] mojibake detect + repair: each doc takes its langid
    // fixture sentence plus a curly-punctuation suffix, corrupted by
    // the INVERSE of the repair table (real UTF-8-as-cp1252
    // digraphs, byte-verified); the detector must count artifacts on
    // accented-Latin rows and ZERO on clean Cyrillic/CJK/Arabic
    // rows, and the ordered replace fold must round-trip every doc
    // back to its clean form.
    "q141_mojibake" -> ((s, d) => {
      val id = col("doc_id")
      val clean = concat(element_at(
        array(R6Queries.LangFixtures.map(lit): _*),
        (pmod(id, lit(R6Queries.LangFixtures.size)) + 1).cast("int")),
        lit(MojiSuffix))
      val corrupted = graft.llm.TextAnalysis.MojibakeTable
        .foldLeft(clean) { case (acc, (bad, good)) =>
          replace(acc, lit(good), lit(bad))
        }
      T.documents(s, d).select(id,
          graft.llm.TextAnalysis.mojibakeCount(corrupted)
            .cast("long").as("n_artifacts"),
          (graft.llm.TextAnalysis.mojibakeRepair(corrupted) === clean)
            .as("repaired_ok"))
        .orderBy("doc_id")
    }),

    // [EXT] per-script character histogram + dominant script over
    // the 40-language fixture cohort — the language-consistency
    // signal next to langid; Thai/Greek/Hebrew/Devanagari rows
    // report 'other', never a guess.
    "q142_script_ratios" -> ((s, d) => {
      val id = col("doc_id")
      val text = element_at(
        array(R6Queries.LangFixtures.map(lit): _*),
        (pmod(id, lit(R6Queries.LangFixtures.size)) + 1).cast("int"))
      T.documents(s, d)
        .select(id, graft.llm.TextAnalysis.scriptRatios(text).as("r"))
        .select(id, col("r.n_chars").as("n_chars"),
          col("r.n_latin").as("n_latin"),
          col("r.n_cyrillic").as("n_cyrillic"),
          col("r.n_arabic").as("n_arabic"),
          col("r.n_cjk").as("n_cjk"),
          col("r.script").as("script"))
        .orderBy("doc_id")
    })
  )

  /** q141's curly-punctuation suffix — exercises the 3-byte artifact
    * pairs the fixtures themselves (plain lowercase sentences) never
    * contain. Shared verbatim with the oracle builder. */
  private val MojiSuffix = " she said ’well“ … – end"

  /** The q130 planted WAV: 130 16-bit PCM samples in 65
    * constant-amplitude windows (amp = (k·97 + w·131) mod 4097), so
    * float RMS per window is exact and an oracle replays the
    * fingerprint as integer comparisons. */
  private[graft] def plantedWav(k: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val rate = lit(8000) + pmod(k, lit(1000))
    def amp(wi: org.apache.spark.sql.Column) =
      pmod(k * 97 + wi * 131, lit(4097))
    val samplesHex = array_join(
      transform(sequence(lit(0), lit(129)),
        i => R5Queries.le16(amp(floor(i / 2)))), "")
    unhex(concat(
      lit("52494646"), R5Queries.le32(lit(296)), lit("57415645"),
      lit("666D7420"), R5Queries.le32(lit(16)), lit("01000100"),
      R5Queries.le32(rate), R5Queries.le32(rate * 2), lit("02001000"),
      lit("64617461"), R5Queries.le32(lit(260)),
      samplesHex))
  }

  /** The q91/q127 planted BMP: a 24-bit uncompressed bitmap whose
    * every channel is a distinct affine hash of (k, x, y) — so an
    * oracle recomputes any pixel analytically. Dims 2..10 × 2..8. */
  private[graft] def plantedBmp(k: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val w = pmod(k, lit(9)) + 2 // 2..10 px
    val h = pmod(k, lit(7)) + 2 // 2..8 px
    val rowBytes = floor((w * 3 + 3) / 4) * 4
    val imgSize = h * rowBytes
    def pix(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) = concat(
      R5Queries.b1(k * 31 + x * 17 + y * 23), // B
      R5Queries.b1(k * 7 + x * 29 + y * 13),  // G
      R5Queries.b1(k * 13 + x * 11 + y * 19)) // R
    val rowPad = lit("000000").substr(lit(1), (rowBytes - w * 3) * 2)
    val rows = array_join(
      transform(sequence(h - 1, lit(0), lit(-1)), y =>
        concat(array_join(
          transform(sequence(lit(0), w - 1), x => pix(x, y)), ""),
          rowPad)), "")
    unhex(concat(
      lit("424D"), R5Queries.le32(imgSize + 54), lit("00000000"),
      R5Queries.le32(lit(54)), R5Queries.le32(lit(40)),
      R5Queries.le32(w), R5Queries.le32(h), lit("01001800"),
      R5Queries.le32(lit(0)), R5Queries.le32(imgSize),
      R5Queries.le32(lit(0)), R5Queries.le32(lit(0)),
      R5Queries.le32(lit(0)), R5Queries.le32(lit(0)), rows))
  }

  /** One BPE oracle round over word-carrying tables: pair counts
    * over v{k}, top-1, merge — same arithmetic as [[bpeRound]] but
    * each round keeps the original word alongside its symbol string,
    * so q122 can join document tokens to their final segmentation. */
  private[queries] def bpeRoundW(k: Int): String = {
    val (wIn, wOut, c, t) = (s"v$k", s"v${k + 1}", s"vc$k", s"vt$k")
    s"""$c AS (
       |  SELECT s.l AS l, s.r AS r, CAST(sum(s.freq) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(list_transform(
       |          generate_series(1, len(ls) - 1),
       |          i -> struct_pack(l := ls[i], r := ls[i+1],
       |                           freq := freq))) AS s
       |        FROM (SELECT freq,
       |                regexp_split_to_array(trim(sym, chr(31)),
       |                  chr(31) || chr(31)) AS ls
       |              FROM $wIn))
       |  GROUP BY 1, 2),
       |$t AS (SELECT l, r FROM $c
       |       ORDER BY cnt DESC, l, r LIMIT 1),
       |$wOut AS (SELECT w, replace(sym,
       |    chr(31) || l || chr(31) || chr(31) || r || chr(31),
       |    chr(31) || l || r || chr(31)) AS sym, freq
       |  FROM $wIn, $t)""".stripMargin
  }

  /** One BPE oracle round: pair counts over w{k}, top-1, merge. */
  private[queries] def bpeRound(k: Int): String = {
    val (wIn, wOut, c, t) = (s"w$k", s"w${k + 1}", s"c$k", s"t$k")
    s"""$c AS (
       |  SELECT s.l AS l, s.r AS r, CAST(sum(s.freq) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(list_transform(
       |          generate_series(1, len(ls) - 1),
       |          i -> struct_pack(l := ls[i], r := ls[i+1],
       |                           freq := freq))) AS s
       |        FROM (SELECT freq,
       |                regexp_split_to_array(trim(sym, chr(31)),
       |                  chr(31) || chr(31)) AS ls
       |              FROM $wIn))
       |  GROUP BY 1, 2),
       |$t AS (SELECT $k AS merge_idx, l, r, cnt FROM $c
       |       ORDER BY cnt DESC, l, r LIMIT 1),
       |$wOut AS (SELECT replace(sym,
       |    chr(31) || l || chr(31) || chr(31) || r || chr(31),
       |    chr(31) || l || r || chr(31)) AS sym, freq
       |  FROM $wIn, $t)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q121_bpe_train" ->
      s"""WITH toks AS (
         |  SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  WHERE w <> '' AND w NOT LIKE '%' || chr(31) || '%'
         |  GROUP BY 1),
         |w0 AS (
         |  SELECT chr(31) || array_to_string(regexp_extract_all(w, '.'),
         |    chr(31) || chr(31)) || chr(31) AS sym, freq
         |  FROM toks),
         |${(0 until 6).map(bpeRound).mkString(",\n")}
         |SELECT CAST(merge_idx AS INT) AS merge_idx, l AS "left",
         |  r AS "right", cnt
         |FROM (${(0 until 6).map(k => s"SELECT * FROM t$k")
             .mkString(" UNION ALL ")})
         |ORDER BY merge_idx""".stripMargin,

    "q122_bpe_encode" ->
      s"""WITH toks AS (
         |  SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |    FROM documents)
         |  WHERE w <> '' AND w NOT LIKE '%' || chr(31) || '%'
         |  GROUP BY 1),
         |v0 AS (
         |  SELECT w, chr(31) || array_to_string(regexp_extract_all(w, '.'),
         |    chr(31) || chr(31)) || chr(31) AS sym, freq
         |  FROM toks),
         |${(0 until 6).map(bpeRoundW).mkString(",\n")},
         |seg AS (
         |  SELECT w, regexp_split_to_array(trim(sym, chr(31)),
         |    chr(31) || chr(31)) AS syms
         |  FROM v6),
         |d AS (SELECT doc_id,
         |        regexp_split_to_array(trim(text), '\\s+') AS ws
         |      FROM documents),
         |tok AS (
         |  SELECT doc_id, s.i AS ord, s.w AS w
         |  FROM (SELECT doc_id, unnest(list_transform(
         |          generate_series(1, len(ws)),
         |          i -> struct_pack(i := i, w := ws[i]))) AS s
         |        FROM d)
         |  WHERE s.w <> '' AND s.w NOT LIKE '%' || chr(31) || '%')
         |SELECT doc_id,
         |  CAST(coalesce(sum(len(syms)), 0) AS INT) AS n_bpe_tokens,
         |  coalesce(string_agg(array_to_string(syms, ' '), ' '
         |    ORDER BY ord), '') AS bpe_text
         |FROM d LEFT JOIN tok USING (doc_id)
         |  LEFT JOIN seg USING (w)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    "q123_dup_ngrams" ->
      """WITH d AS (
        |  SELECT doc_id, text, list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), w -> w <> '') AS ws
        |  FROM documents),
        |g2 AS (
        |  SELECT doc_id, gram, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(ws) - 1),
        |      i -> array_to_string(ws[i:i+1], ' '))) AS gram
        |    FROM d WHERE len(ws) >= 2)
        |  GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, CAST(sum(c) AS INT) AS n2_ngrams
        |       FROM g2 GROUP BY 1),
        |r2 AS (SELECT doc_id, gram, c, row_number() OVER
        |         (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
        |       FROM g2),
        |b2 AS (SELECT doc_id, CAST(c AS INT) AS n2_top_cnt,
        |         gram AS n2_top_gram,
        |         CAST(c * length(gram) AS BIGINT) AS n2_top_chars
        |       FROM r2 WHERE rn = 1),
        |g5 AS (
        |  SELECT doc_id, gram, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(ws) - 4),
        |      i -> array_to_string(ws[i:i+4], ' '))) AS gram
        |    FROM d WHERE len(ws) >= 5)
        |  GROUP BY 1, 2),
        |a5 AS (SELECT doc_id, CAST(sum(c) AS INT) AS n5_ngrams,
        |         CAST(coalesce(sum(CASE WHEN c >= 2
        |           THEN c * length(gram) END), 0) AS BIGINT)
        |           AS n5_dup_chars
        |       FROM g5 GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(n2_ngrams, 0) AS n2_ngrams,
        |  coalesce(n2_top_cnt, 0) AS n2_top_cnt,
        |  n2_top_gram,
        |  CAST(coalesce(n2_top_chars, 0) AS BIGINT) AS n2_top_chars,
        |  coalesce(n5_ngrams, 0) AS n5_ngrams,
        |  CAST(coalesce(n5_dup_chars, 0) AS BIGINT) AS n5_dup_chars,
        |  CAST(length(text) AS INT) AS doc_chars
        |FROM d LEFT JOIN a2 USING (doc_id) LEFT JOIN b2 USING (doc_id)
        |  LEFT JOIN a5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q124_sitemap_expand" ->
      """WITH n AS (
        |  SELECT CAST(n_nationkey AS INT) AS k,
        |    'https://n' || CAST(CAST(n_nationkey AS INT) AS VARCHAR)
        |      || '.example' AS h
        |  FROM nation)
        |SELECT url, lastmod FROM (
        |  SELECT h || '/p1' AS url,
        |    '2024-01-0' || CAST(k % 9 + 1 AS VARCHAR) AS lastmod FROM n
        |  UNION ALL SELECT h || '/p2', NULL FROM n
        |  UNION ALL SELECT h || '/p3', '2024-02-02' FROM n
        |  UNION ALL SELECT h || '/p4', NULL FROM n)
        |ORDER BY url""".stripMargin,

    "q125_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, text
        |    || ' contact p' || CAST(doc_id AS VARCHAR) || '@example.com'
        |    || ' or 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |    || CAST(doc_id % 100 AS VARCHAR)
        |    || ' or call +49151123450' || CAST(doc_id % 10 AS VARCHAR)
        |    || ' or 555-123-4567 today' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{7,14}\b|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b',
        |    '<PHONE>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t,
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(t,
        |    '\+\d{7,14}\b|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b')) AS INT)
        |    AS n_phones
        |FROM d ORDER BY doc_id""".stripMargin,

    "q126_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT term, count(*) AS cnt FROM tok
        |      WHERE term <> '' GROUP BY 1),
        |tot AS (SELECT count(*) AS total FROM tok WHERE term <> ''),
        |top AS (SELECT term, cnt FROM t ORDER BY cnt DESC, term LIMIT 200),
        |r AS (SELECT row_number() OVER (ORDER BY cnt DESC, term) AS rank,
        |        term, cnt,
        |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
        |      FROM top)
        |SELECT CAST(rank AS INT) AS rank, term, cnt, cum_cnt,
        |  CAST((1000000 * cum_cnt) // total AS BIGINT) AS coverage_micro
        |FROM r, tot ORDER BY rank""".stripMargin,

    "q127_image_dhash" ->
      """WITH d AS (
        |  SELECT p_partkey AS id,
        |    CAST(p_partkey % 9 + 2 AS INT) AS width,
        |    CAST(p_partkey % 7 + 2 AS INT) AS height
        |  FROM part WHERE p_partkey % 5 = 0),
        |g AS (
        |  SELECT id, width, height, r.r AS r, c.c AS c,
        |    (c.c * width) // 9 AS sx, (r.r * height) // 8 AS sy
        |  FROM d, generate_series(0, 7) AS r(r),
        |       generate_series(0, 8) AS c(c)),
        |l AS (
        |  SELECT id, r, c,
        |      299 * ((id * 13 + sx * 11 + sy * 19) % 256)
        |    + 587 * ((id * 7 + sx * 29 + sy * 13) % 256)
        |    + 114 * ((id * 31 + sx * 17 + sy * 23) % 256) AS lum
        |  FROM g),
        |b AS (
        |  SELECT a.id,
        |    CASE WHEN bb.lum > a.lum THEN
        |      CASE WHEN a.r * 8 + a.c = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE 1::BIGINT << (a.r * 8 + a.c) END
        |      ELSE 0::BIGINT END AS bit
        |  FROM l a JOIN l bb ON a.id = bb.id AND a.r = bb.r
        |    AND bb.c = a.c + 1
        |  WHERE a.c < 8)
        |SELECT d.id, width, height, CAST(sum(bit) AS BIGINT) AS dhash
        |FROM d JOIN b USING (id)
        |GROUP BY 1, 2, 3 ORDER BY id""".stripMargin,

    "q128_image_neardup" ->
      """WITH ks AS (
        |  SELECT p_partkey AS kk FROM part WHERE p_partkey % 5 = 0),
        |ids AS (
        |  SELECT kk * 2 + t.t AS id, kk,
        |    CAST(kk % 9 + 2 AS INT) AS width,
        |    CAST(kk % 7 + 2 AS INT) AS height
        |  FROM ks, generate_series(0, 1) AS t(t)),
        |g AS (
        |  SELECT id, kk, r.r AS r, c.c AS c,
        |    (c.c * width) // 9 AS sx, (r.r * height) // 8 AS sy
        |  FROM ids, generate_series(0, 7) AS r(r),
        |       generate_series(0, 8) AS c(c)),
        |l AS (
        |  SELECT id, r, c,
        |      299 * ((kk * 13 + sx * 11 + sy * 19) % 256)
        |    + 587 * ((kk * 7 + sx * 29 + sy * 13) % 256)
        |    + 114 * ((kk * 31 + sx * 17 + sy * 23) % 256) AS lum
        |  FROM g),
        |b AS (
        |  SELECT a.id,
        |    CASE WHEN bb.lum > a.lum THEN
        |      CASE WHEN a.r * 8 + a.c = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE 1::BIGINT << (a.r * 8 + a.c) END
        |      ELSE 0::BIGINT END AS bit
        |  FROM l a JOIN l bb ON a.id = bb.id AND a.r = bb.r
        |    AND bb.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (SELECT id, CAST(sum(bit) AS BIGINT) AS dhash
        |      FROM b GROUP BY 1)
        |SELECT a.id AS id_a, b2.id AS id_b,
        |  CAST(bit_count(xor(a.dhash, b2.dhash)) AS INT) AS hamming
        |FROM h a JOIN h b2 ON a.id < b2.id
        |WHERE bit_count(xor(a.dhash, b2.dhash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q129_robots_sitemaps" ->
      """WITH n AS (
        |  SELECT CAST(n_nationkey AS INT) AS k,
        |    'n' || CAST(CAST(n_nationkey AS INT) AS VARCHAR)
        |      || '.example' AS h
        |  FROM nation)
        |SELECT h AS host, CAST(idx AS INT) AS idx, url AS sitemap_url
        |FROM (
        |  SELECT h, 2 AS idx,
        |    'https://' || h || '/sitemap.xml' AS url FROM n
        |  UNION ALL
        |  SELECT h, 3 AS idx,
        |    'https://' || h || '/s' || CAST(k % 3 AS VARCHAR)
        |      || '.xml' AS url FROM n)
        |ORDER BY host, idx""".stripMargin,

    "q130_audio_fingerprint" ->
      """WITH d AS (
        |  SELECT p_partkey AS id FROM part WHERE p_partkey % 5 = 0),
        |b AS (
        |  SELECT id,
        |    CASE WHEN ((id * 97 + (w.w + 1) * 131) % 4097)
        |           > ((id * 97 + w.w * 131) % 4097) THEN
        |      CASE WHEN w.w = 63 THEN (-9223372036854775807 - 1)
        |        ELSE 1::BIGINT << w.w END
        |      ELSE 0::BIGINT END AS bit
        |  FROM d, generate_series(0, 63) AS w(w))
        |SELECT d.id, CAST(8000 + id % 1000 AS INT) AS sample_rate,
        |  CAST(130 AS BIGINT) AS n_samples,
        |  CAST(sum(bit) AS BIGINT) AS afp
        |FROM d JOIN b USING (id)
        |GROUP BY 1, 2, 3 ORDER BY id""".stripMargin,

    "q131_video_dhash" ->
      """WITH d AS (
        |  SELECT p_partkey AS id,
        |    CAST(p_partkey % 5 + 2 AS INT) AS width,
        |    CAST(p_partkey % 3 + 1 AS INT) AS height,
        |    CAST(p_partkey % 3 + 2 AS INT) AS total_frames
        |  FROM part WHERE p_partkey % 5 = 0),
        |fr AS (
        |  SELECT id, width, height, total_frames, f.f AS frame_idx
        |  FROM d, generate_series(0, 3) AS f(f)
        |  WHERE f.f % 2 = 0 AND f.f < total_frames),
        |g AS (
        |  SELECT id, frame_idx, width, height, total_frames,
        |    r.r AS r, c.c AS c,
        |    (c.c * width) // 9 AS sx, (r.r * height) // 8 AS sy
        |  FROM fr, generate_series(0, 7) AS r(r),
        |       generate_series(0, 8) AS c(c)),
        |l AS (
        |  SELECT id, frame_idx, r, c,
        |      299 * ((id * 13 + frame_idx * 43 + sx * 11 + sy * 19) % 256)
        |    + 587 * ((id * 7 + frame_idx * 37 + sx * 29 + sy * 13) % 256)
        |    + 114 * ((id * 31 + frame_idx * 41 + sx * 17 + sy * 23) % 256)
        |      AS lum
        |  FROM g),
        |b AS (
        |  SELECT a.id, a.frame_idx,
        |    CASE WHEN bb.lum > a.lum THEN
        |      CASE WHEN a.r * 8 + a.c = 63
        |        THEN (-9223372036854775807 - 1)
        |        ELSE 1::BIGINT << (a.r * 8 + a.c) END
        |      ELSE 0::BIGINT END AS bit
        |  FROM l a JOIN l bb ON a.id = bb.id
        |    AND a.frame_idx = bb.frame_idx AND a.r = bb.r
        |    AND bb.c = a.c + 1
        |  WHERE a.c < 8)
        |SELECT fr.id, CAST(frame_idx AS INT) AS frame_idx, width, height,
        |  total_frames, CAST(sum(bit) AS BIGINT) AS dhash
        |FROM fr JOIN b USING (id, frame_idx)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY id, frame_idx""".stripMargin,

    "q132_vocab_per_lang" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT lang, term, count(*) AS cnt FROM tok
        |      WHERE term <> '' GROUP BY 1, 2),
        |r AS (SELECT lang, term, cnt, row_number() OVER
        |        (PARTITION BY lang ORDER BY cnt DESC, term) AS rank
        |      FROM c)
        |SELECT lang, CAST(rank AS INT) AS rank, term, cnt
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,

    "q133_frontier_cap" ->
      """WITH u AS (
        |  SELECT 'h' || CAST(o_orderkey % 50 AS VARCHAR)
        |      || '.example.com' AS host,
        |    '/page/' || CAST(o_orderkey AS VARCHAR) AS path,
        |    (o_orderkey * 2654435761) % 1000003 AS priority
        |  FROM orders),
        |r AS (SELECT host, path, priority, row_number() OVER
        |        (PARTITION BY host ORDER BY priority DESC, path) AS rank
        |      FROM u)
        |SELECT host, CAST(rank AS INT) AS rank, path, priority
        |FROM r WHERE rank <= 5 ORDER BY host, rank""".stripMargin,

    "q134_training_chain" ->
      """WITH d0 AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
        |      AS n_tokens
        |  FROM documents),
        |d1 AS (SELECT * FROM d0 WHERE n_tokens BETWEEN 5 AND 1000),
        |keep AS (SELECT min(doc_id) AS doc_id FROM d1
        |         GROUP BY sha256(text)),
        |surv AS (SELECT d1.doc_id, lang, n_tokens
        |         FROM d1 JOIN keep USING (doc_id))
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER
        |    (PARTITION BY lang ORDER BY doc_id) - n_tokens) / 2000)
        |    AS BIGINT) AS pack_id
        |FROM surv ORDER BY doc_id""".stripMargin,

    "q135_exact_substr" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_matches(text, '\S') AS has_tok,
        |    regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |n AS (SELECT doc_id, ws,
        |        CASE WHEN has_tok THEN len(ws) ELSE 0 END AS n FROM d),
        |wi AS (SELECT doc_id, unnest(list_transform(range(1, n - 6 + 2),
        |         i -> struct_pack(s := i,
        |                w := array_to_string(ws[i:i+5], ' ')))) AS u
        |       FROM n),
        |wins AS (SELECT doc_id, u.s AS start, u.w AS win FROM wi),
        |dup AS (SELECT win FROM wins GROUP BY 1 HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |          SELECT doc_id, unnest(range(start, start + 6)) AS pos
        |          FROM wins JOIN dup USING (win))),
        |tok AS (SELECT doc_id, unnest(ws) AS tok,
        |          unnest(range(1, n + 1)) AS pos FROM n WHERE n > 0),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
        |         ANTI JOIN cov c
        |           ON t.doc_id = c.doc_id AND t.pos = c.pos),
        |agg AS (SELECT doc_id,
        |          string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT n.doc_id, n.n AS n_tokens,
        |       n.n - coalesce(a.n_kept, 0) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM n LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q136_nb_quality" ->
      """WITH base AS (
        |  SELECT doc_id, (lang = 'en') AS y,
        |    regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, y, unnest(ws) AS term FROM base),
        |c AS (SELECT term,
        |        CAST(count(*) FILTER (WHERE y) AS BIGINT) AS c1,
        |        CAST(count(*) FILTER (WHERE NOT y) AS BIGINT) AS c0
        |      FROM tok GROUP BY 1),
        |t AS (SELECT sum(c1) AS n1, sum(c0) AS n0,
        |        count(*) AS v FROM c),
        |w AS (SELECT term,
        |        CAST(round((ln((c1 + 1.0) / (n1 + v))
        |          - ln((c0 + 1.0) / (n0 + v))) * 1e6) AS BIGINT) AS wm
        |      FROM c CROSS JOIN t),
        |p AS (SELECT CAST(round(ln(
        |          CAST(count(*) FILTER (WHERE y) AS DOUBLE)
        |          / count(*) FILTER (WHERE NOT y)) * 1e6) AS BIGINT)
        |        AS prior
        |      FROM base),
        |s AS (SELECT doc_id, count(*) AS n_tokens,
        |        CAST(sum(wm) AS BIGINT) AS sw
        |      FROM tok JOIN w USING (term) GROUP BY 1)
        |SELECT doc_id, n_tokens, sw + prior AS score_micro,
        |       (sw + prior) > 0 AS predicted
        |FROM s CROSS JOIN p ORDER BY doc_id""".stripMargin,

    "q137_ppl_buckets" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |n0 AS (SELECT doc_id, ws, len(ws) AS n FROM base),
        |bg AS (SELECT doc_id, unnest(ws[1:n-1]) AS w1,
        |         unnest(ws[2:n]) AS w2
        |       FROM n0 WHERE n >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |cl AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cleft
        |       FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM
        |        (SELECT unnest(ws) AS tok FROM n0)),
        |w AS (SELECT w1, w2,
        |        CAST(round(ln((c + 1.0) / (cleft + v)) * 1e6) AS BIGINT)
        |          AS lp
        |      FROM c12 JOIN cl USING (w1) CROSS JOIN v),
        |s AS (SELECT doc_id, count(*) AS n_bigrams,
        |        CAST(sum(lp) AS BIGINT) AS sum_logprob_micro
        |      FROM bg JOIN w USING (w1, w2) GROUP BY 1),
        |r AS (SELECT *,
        |        round(sum_logprob_micro / 1e6 / n_bigrams, 4)
        |          AS avg_logprob,
        |        ntile(3) OVER (ORDER BY
        |          sum_logprob_micro / n_bigrams DESC, doc_id) AS b
        |      FROM s)
        |SELECT doc_id, n_bigrams, sum_logprob_micro, avg_logprob,
        |       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |              ELSE 'tail' END AS ppl_band
        |FROM r ORDER BY doc_id""".stripMargin,

    "q138_blocklist" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    lower(unnest(regexp_split_to_array(trim(text), '\s+')))
        |      AS term
        |  FROM documents),
        |h AS (SELECT doc_id,
        |        CAST(count(*) FILTER (WHERE term IN ('dup', 'fast'))
        |          AS BIGINT) AS n_blocked_tokens,
        |        coalesce(string_agg(DISTINCT term, ',' ORDER BY term)
        |          FILTER (WHERE term IN ('dup', 'fast')), '')
        |          AS blocked_terms
        |      FROM tok GROUP BY 1)
        |SELECT doc_id, n_blocked_tokens, blocked_terms,
        |       n_blocked_tokens = 0 AS kept
        |FROM h ORDER BY doc_id""".stripMargin,

    "q139_crawl_delay" ->
      """WITH hs AS (SELECT DISTINCT doc_id % 40 AS hi FROM documents),
        |t AS (SELECT 'h' || CAST(hi AS VARCHAR) || '.example.com' AS host,
        |    'User-agent: *' || chr(10)
        |    || 'Crawl-delay: 2   # default pace' || chr(10)
        |    || 'Disallow: /private/' || chr(10)
        |    || CASE WHEN hi % 3 = 0 THEN
        |         chr(10) || 'User-agent: graftbot' || chr(10)
        |         || 'Crawl-delay:' || chr(9) || '0.5' || chr(10)
        |         || 'Allow: /fast/' || chr(10)
        |         || 'Crawl-delay: 9' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN hi % 4 = 0 THEN
        |         'User-agent: extra' || chr(10)
        |         || 'Crawl-delay: 7' || chr(10)
        |         || 'User-agent: other' || chr(10)
        |         || 'Disallow: /x/' || chr(10)
        |       ELSE '' END
        |    || CASE WHEN hi % 5 = 0 THEN
        |         'User-agent: slowbot' || chr(10)
        |         || 'Crawl-delay: soon' || chr(10)
        |       ELSE '' END AS txt
        |  FROM hs),
        |sp AS (SELECT host, regexp_split_to_array(txt, '\r?\n') AS ls
        |  FROM t),
        |ln AS (SELECT host, i,
        |    regexp_replace(regexp_replace(ls[i], '#.*$', ''),
        |      '^[ \t]+|[ \t]+$', '', 'g') AS l
        |  FROM (SELECT host, ls,
        |          unnest(generate_series(1, len(ls))) AS i FROM sp)),
        |kv AS (SELECT host, i,
        |    lower(regexp_extract(l, '^([A-Za-z-]+)\s*:', 1)) AS k,
        |    regexp_replace(regexp_extract(l, '^[A-Za-z-]+\s*:(.*)$', 1),
        |      '^[ \t]+|[ \t]+$', '', 'g') AS v
        |  FROM ln
        |  WHERE lower(regexp_extract(l, '^([A-Za-z-]+)\s*:', 1))
        |    IN ('user-agent', 'allow', 'disallow', 'crawl-delay')),
        |g AS (SELECT host, i, k, v,
        |    CASE WHEN k = 'user-agent' AND NOT coalesce(
        |        lag(k = 'user-agent') OVER (PARTITION BY host ORDER BY i),
        |        false)
        |      THEN 1 ELSE 0 END AS st
        |  FROM kv),
        |g2 AS (SELECT host, i, k, v,
        |    sum(st) OVER (PARTITION BY host ORDER BY i
        |      ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM g),
        |tier AS (SELECT host, grp,
        |    max(CASE WHEN lower(v) = 'graftbot' THEN 2
        |             WHEN v = '*' THEN 1 ELSE 0 END) AS tier
        |  FROM g2 WHERE k = 'user-agent' GROUP BY 1, 2),
        |best AS (SELECT host, max(tier) AS b FROM tier GROUP BY 1),
        |sel AS (SELECT tier.host, grp FROM tier JOIN best USING (host)
        |  WHERE tier = b AND tier > 0),
        |cd AS (SELECT g2.host AS host, v, i
        |  FROM g2 JOIN sel ON g2.host = sel.host AND g2.grp = sel.grp
        |  WHERE k = 'crawl-delay'
        |    AND regexp_matches(v, '^[0-9]+(\.[0-9]+)?$'))
        |SELECT host,
        |  CAST(round(CAST(arg_min(v, i) AS DOUBLE) * 1000) AS BIGINT)
        |    AS crawl_delay_ms
        |FROM cd GROUP BY host ORDER BY host""".stripMargin,

    "q140_politeness" ->
      """WITH u AS (
        |  SELECT 'h' || CAST(o_orderkey % 50 AS VARCHAR)
        |      || '.example.com' AS host,
        |    '/page/' || CAST(o_orderkey AS VARCHAR) AS path,
        |    (o_orderkey * 2654435761) % 1000003 AS priority
        |  FROM orders),
        |r AS (SELECT host, path, priority, row_number() OVER
        |        (PARTITION BY host ORDER BY priority DESC, path) AS rank
        |      FROM u),
        |f AS (SELECT host, rank, path FROM r WHERE rank <= 5),
        |hs AS (SELECT DISTINCT doc_id % 40 AS hi FROM documents),
        |dl AS (SELECT 'h' || CAST(hi AS VARCHAR) || '.example.com'
        |         AS host,
        |         (hi % 4 + 1) * 1000 AS crawl_delay_ms
        |       FROM hs)
        |SELECT f.host AS host, CAST(rank AS INT) AS rank, path,
        |  CAST((rank - 1) * coalesce(crawl_delay_ms, 1000) AS BIGINT)
        |    AS fetch_offset_ms
        |FROM f LEFT JOIN dl USING (host)
        |ORDER BY host, rank""".stripMargin,

    "q141_mojibake" -> {
      val fixtures = R6Queries.LangFixtures.zipWithIndex
        .map { case (t, i) => s"($i,'$t')" }.mkString(",")
      val corrupt = graft.llm.TextAnalysis.MojibakeTable
        .foldLeft("clean") { case (e, (bad, good)) =>
          s"replace($e, '$good', '$bad')"
        }
      val repair = graft.llm.TextAnalysis.MojibakeTable
        .foldLeft("corrupted") { case (e, (bad, good)) =>
          s"replace($e, '$bad', '$good')"
        }
      s"""WITH s(k, t) AS (VALUES $fixtures),
         |d AS (SELECT doc_id, s.t || '$MojiSuffix' AS clean
         |      FROM documents s2
         |      JOIN s ON s2.doc_id % ${R6Queries.LangFixtures.size} = s.k),
         |c AS (SELECT doc_id, clean, $corrupt AS corrupted FROM d)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(corrupted,
         |    '[ÃÂ][\\x{A0}-\\x{BF}]|â€')) AS BIGINT) AS n_artifacts,
         |  $repair = clean AS repaired_ok
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "q142_script_ratios" -> {
      val fixtures = R6Queries.LangFixtures.zipWithIndex
        .map { case (t, i) => s"($i,'$t')" }.mkString(",")
      val g = "greatest(n_latin, n_cyrillic, n_arabic, n_cjk)"
      s"""WITH s(k, t) AS (VALUES $fixtures),
         |d AS (SELECT doc_id, s.t AS text FROM documents s2
         |      JOIN s ON s2.doc_id % ${R6Queries.LangFixtures.size} = s.k),
         |m AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z\\x{C0}-\\x{D6}\\x{D8}-\\x{F6}\\x{F8}-\\x{24F}\\x{1E00}-\\x{1EFF}]'))
         |    AS BIGINT) AS n_latin,
         |  CAST(len(regexp_extract_all(text, '[\\x{400}-\\x{4FF}]'))
         |    AS BIGINT) AS n_cyrillic,
         |  CAST(len(regexp_extract_all(text, '[\\x{600}-\\x{6FF}]'))
         |    AS BIGINT) AS n_arabic,
         |  CAST(len(regexp_extract_all(text,
         |    '[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7A3}]'))
         |    AS BIGINT) AS n_cjk
         | FROM d)
         |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_arabic, n_cjk,
         |  CASE WHEN $g = 0 THEN 'other'
         |       WHEN n_latin = $g THEN 'latin'
         |       WHEN n_cyrillic = $g THEN 'cyrillic'
         |       WHEN n_arabic = $g THEN 'arabic'
         |       ELSE 'cjk' END AS script
         |FROM m ORDER BY doc_id""".stripMargin
    }
  )
}
