package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q143+: round-8 second wave — data SELECTION (DSIR importance
  * scoring, weighted sampling, mixture epoch planning), incremental
  * crawl (snapshot diff, trap signals), and the postings export.
  *
  * Every query ends in a total ORDER BY.
  */
object R9Queries {
  private val T = Tables

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] DSIR importance scores (arXiv:2302.03169): hashed
    // bag-of-words unigram models of the TARGET slice (lang='en')
    // vs the RAW corpus over 512 SHA buckets, Laplace-smoothed;
    // per-doc score = Σ per-token micro-rounded log-ratio — exact
    // integer summation, order-independent. Models are ≤512-row
    // aggregates broadcast onto the token stream; the oracle
    // replays the identical buckets and micro arithmetic.
    "q143_dsir_scores" -> ((s, d) => {
      // r15: the per-token hashing of the scoring pass ran in the
      // single scan task — fan out once; all three roles inherit it
      val docs = graft.ops.Par.fanOut(
        T.documents(s, d).select("doc_id", "lang", "text"), col("doc_id"))
      graft.llm.Selection.dsirScores(
          docs, docs.filter(col("lang") === "en"), docs,
          "doc_id", "text", numBuckets = 512, salt = "dsir8")
        .orderBy("doc_id")
    }),

    // [EXT] weighted sampling WITHOUT replacement (Efraimidis–
    // Spirakis A-ES): key = ln(u)/w with a salted-SHA 52-bit
    // uniform, top-50 keys = exact weighted sample. Map-only +
    // TakeOrdered; keys are micro-rounded BEFORE the compare so the
    // boundary row is engine-stable. Weight = n_chars (longer docs
    // proportionally likelier).
    "q144_weighted_sample" -> ((s, d) =>
      graft.llm.Selection.sampleWeightedK(
          T.documents(s, d).select(col("doc_id"),
            col("n_chars").cast("double").as("weight")),
          "doc_id", "weight", k = 50, salt = "ws8")
        .orderBy("doc_id")),

    // [EXT] mixture epoch planning: three sources at target weights
    // 0.5/0.3/0.2 under a budget of 3× their combined chars —
    // per-source repeat factor f = budget·w/T_s, each doc emitted
    // floor(f) times + 1 more iff its salted-SHA uniform < frac(f).
    // Per-source stats are a bounded broadcast; the explode IS the
    // upsampling. The 1-row budget action is the parameter, not
    // data. Oracle replays f and the Bernoulli exactly.
    "q145_mixture_epochs" -> ((s, d) => {
      val base = T.documents(s, d)
        .filter(col("source").isin("src0", "src1", "src2"))
        .select(col("doc_id"), col("source"), col("n_chars"))
      val total = base.agg(coalesce(sum("n_chars"), lit(0L)))
        .first().getLong(0)
      graft.llm.Selection.upsampleToMixture(base, "doc_id", "source",
          "n_chars", Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
          budgetTokens = 3L * total, salt = "mix8")
        .orderBy("doc_id", "epoch")
    }),

    // [EXT] crawl snapshot diff: two derived snapshots of the same
    // URL space (old drops doc_id≡4 mod 5; new drops ≡3 mod 7 and
    // edits ≡0 mod 3) classified added/removed/changed/unchanged by
    // content SHA — the delta driving an incremental recrawl. ONE
    // full-outer join on url carrying only (url, hash).
    "q146_snapshot_diff" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val urlc = concat(lit("https://ex.com/p/"), col("doc_id"))
      val oldSnap = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
        .select(urlc.as("url"), sha2(col("text"), 256).as("h"))
      val newSnap = docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
        .select(urlc.as("url"),
          sha2(when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")),
            256).as("h"))
      graft.llm.Crawl.snapshotDiff(oldSnap, newSnap, "url", "h")
        .orderBy("url")
    }),

    // [EXT] crawl-trap URL signals: planted URLs with varying
    // depth (repeated lang segment), duplicate segments, and
    // query-param blowup; map-only columnar verdicts (depth>8 ∨
    // dup>2 ∨ params>8). The oracle recomputes the same list ops.
    "q147_url_traps" -> ((s, d) => {
      val docs = T.documents(s, d)
      val url = concat(lit("https://"), col("source"), lit(".com/cat/"),
        col("lang"), lit("/"), col("source"), lit("/"),
        repeat(concat(col("lang"), lit("/")),
          pmod(col("doc_id"), lit(7)).cast("int")),
        lit("?a=1"), repeat(lit("&b=2"),
          pmod(col("doc_id"), lit(10)).cast("int")))
      graft.llm.Crawl.urlTrapSignals(
          docs.select(col("doc_id"), url.as("url")), "url")
        .select("doc_id", "depth", "dup_segments", "n_params", "is_trap")
        .orderBy("doc_id")
    }),

    // [EXT] postings export: the (term, doc_id, tf, positions)
    // inverted-index table — posexplode map-only, ONE exchange on
    // (term, doc_id); per-posting state bounded by the doc's own
    // term count, never corpus df. Positions 0-based, ascending,
    // comma-joined.
    "q148_postings" -> ((s, d) =>
      graft.llm.Search.buildPostings(
          T.documents(s, d).filter(col("doc_id") < 100),
          "doc_id", "text")
        .orderBy("term", "doc_id")),

    // [EXT] per-GROUP weighted sampling without replacement: the
    // A-ES key ranked inside each lang — row_number ≤ k compiles to
    // WindowGroupLimit (k-row heap per group, never a full-group
    // buffer). The oracle replays the identical keys and window.
    "q150_wsk_per_group" -> ((s, d) =>
      graft.llm.Selection.sampleWeightedKPerGroup(
          T.documents(s, d).select(col("lang"), col("doc_id"),
            col("n_chars").cast("double").as("w")),
          Seq("lang"), "doc_id", "w", k = 10, salt = "wg8")
        .orderBy("lang", "rank")),

    // [EXT] canonical-URL dedup: pages sharing a page-declared
    // canonical (planted: doc_id%50 buckets; doc_id≡1 mod 4 has no
    // canonical tag → keys to its own URL) collapse to one kept
    // page — the crawl-side dedup that runs BEFORE content hashing.
    // canonicalUrl is map-only; one groupBy on the canonical key.
    "q151_canonical_dedup" -> ((s, d) => {
      val url = concat(lit("https://ex.com/p/"), col("doc_id"))
      val html = when(pmod(col("doc_id"), lit(4)) =!= 1,
          concat(lit("<html><head><link rel=\"canonical\" href=\"https://ex.com/c/"),
            pmod(col("doc_id"), lit(50)),
            lit("\"></head><body>x</body></html>")))
        .otherwise(lit("<html><head></head><body>x</body></html>"))
      T.documents(s, d).select(url.as("url"), html.as("html"))
        .withColumn("canon", coalesce(
          graft.llm.Crawl.canonicalUrl(col("html"), lit("ex.com")),
          col("url")))
        .groupBy("canon")
        .agg(min("url").as("kept_url"), count(lit(1)).as("n_pages"))
        .orderBy("canon")
    }),

    // [EXT] classifier calibration sweep: q143's DSIR score against
    // the lang='en' label at 5 thresholds — ONE pass bucket
    // histogram + suffix sums over the ≤T+1-row bounded table (not
    // the textbook T× cross-join). The oracle cross-joins (correct
    // at oracle scale); values match exactly.
    "q152_calibration" -> ((s, d) => {
      // r15: calibrationSweep's bucket checkpoint EXECUTES the DSIR
      // scoring pass at query-construction time, single-task — fan
      // the corpus out first (q143's fix, felt here at build time)
      val docs = graft.ops.Par.fanOut(
        T.documents(s, d).select("doc_id", "lang", "text"), col("doc_id"))
      val scored = graft.llm.Selection.dsirScores(
        docs, docs.filter(col("lang") === "en"), docs,
        "doc_id", "text", numBuckets = 512, salt = "dsir8")
      val labeled = scored.join(
        docs.select(col("doc_id"), (col("lang") === "en").as("y")),
        Seq("doc_id"))
      graft.llm.Selection.calibrationSweep(labeled, "score_micro", "y",
          Seq(-2000000L, -1000000L, -500000L, 0L, 100000L))
        .orderBy("threshold")
    }),

    // [EXT] the crawl FRONTIER-ADMISSION chain end-to-end: outlink
    // extraction (all quoting forms) → global frontier dedup →
    // trap-signal filter → robots-exclusion filter (literal rules)
    // → per-host fetch cap (WindowGroupLimit). The q112/q134
    // counterpart for the frontier side: every stage is an already-
    // oracle-green operator; this pins their composition. The
    // oracle rebuilds the link set arithmetically and replays the
    // full trap condition, the longest-match robots verdict, and
    // the per-host rank.
    "q153_frontier_chain" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val id = col("doc_id")
      val hostc = concat(lit("h"), pmod(id, lit(5)).cast("string"),
        lit(".com"))
      val html = concat(
        lit("<html><body><a href=\"https://h"), pmod(id, lit(5)),
        lit(".com/cat/"), pmod(id, lit(7)),
        lit("\">c</a><a href='/private/x"), id, lit("'>p</a>"),
        when(pmod(id, lit(3)) === 0,
            lit("<a href=/t/x/x/x/x/x/x/x/x/x/e>t</a>"))
          .otherwise(lit("<a href=\"/about\">a</a>")),
        lit("</body></html>"))
      val pages = T.documents(s, d)
        .select(id, hostc.as("host"), html.as("html"))
      val links = graft.llm.Crawl
        .extractLinks(pages, "doc_id", "html", "host")
        .select(col("url")).distinct()
      val safe = graft.llm.Crawl.urlTrapSignals(links, "url")
        .filter(!col("is_trap")).select("url")
      val parsed = safe.select(col("url"),
        regexp_extract(col("url"), "^https://([^/]*)", 1).as("host"),
        regexp_extract(col("url"), "^https://[^/]*(/.*)$", 1).as("path"))
      val rules = (0 until 5).map(k => (s"h$k.com", false, "/private/"))
        .toDF("host", "allow", "prefix")
      graft.llm.Crawl.robotsFilter(parsed, "url", "host", "path", rules)
        .filter(col("allowed"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("host").orderBy("url")))
        .filter(col("rank") <= 4)
        .select(col("host"), col("rank").cast("int").as("rank"), col("url"))
        .orderBy("host", "rank")
    }),

    // [EXT] per-DOMAIN quality rollup: the q96 gate aggregated per
    // source — n_docs / n_keep / token mass / exact integral
    // keep-permille and the spam-domain verdict (keep < 50%), the
    // domain-level filtering step (RefinedWeb-style) that runs
    // after per-doc gating. One bounded groupBy over map-only gate
    // columns.
    "q154_domain_quality" -> ((s, d) =>
      // r15: per-row gate arithmetic single-task — fan out (q96 twin)
      graft.ops.Par.fanOut(
          T.documents(s, d).select("doc_id", "source", "text"),
          col("doc_id"))
        .select(col("source"),
          graft.llm.TextAnalysis.qualityGate(col("text")).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("g.keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(col("g.n_tokens").cast("long")).as("n_tokens"))
        .withColumn("keep_permille",
          expr("(n_keep * 1000) div n_docs"))
        .withColumn("low_quality", col("keep_permille") < 500)
        .orderBy("source")),

    // [EXT] corpus drift monitor: KL (both directions) + total
    // variation between the en and fr token distributions over 512
    // hashed buckets — per-bucket micro-rounded contributions summed
    // exactly (the defined metric; the oracle replays it bucket for
    // bucket). Two token scans → ≤512-row aggregates; arithmetic
    // over the bounded table only.
    "q155_corpus_drift" -> ((s, d) => {
      val docs = T.documents(s, d)
      graft.llm.Selection.distributionDrift(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") === "fr"),
          "text", numBuckets = 512, salt = "drift8")
        .orderBy("n_buckets")
    }),

    // [EXT] stratified split with EXACT per-stratum proportions:
    // 80/10/10 within each lang, boundaries by exact integral
    // arithmetic over a range-partitioned global rank (never a
    // per-stratum window sort). The oracle's per-stratum
    // row_number replays the same hash order and bounds.
    "q156_stratified_split" -> ((s, d) =>
      graft.llm.Selection.stratifiedSplit(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          Seq("lang"), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "ss8")
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")),

    // [EXT] HITS hubs/authorities over the q109 planted link graph
    // (i→7i, i→13i+1 mod N, deduped): 2 iterations of exact integer
    // micro-unit arithmetic with integral max-renormalization — the
    // oracle unrolls the identical half-iterations as chained CTEs.
    "q157_hits" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      val withN = docs.join(broadcast(n))
      val e = withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7, col("n")).as("dst"))
        .union(withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 1, col("n")).as("dst")))
      graft.llm.Crawl.hitsInt(e, iters = 2).orderBy("node")
    }),

    // [EXT] incremental index maintenance: the q146 snapshot diff
    // drives a postings DELTA — changed+added docs re-index through
    // buildPostings on the NEW text, removed+changed docs emit
    // delete markers for the old postings. The 100 TB point: the
    // index update costs ∝ the delta, never a corpus re-index.
    "q158_postings_delta" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"), col("text"))
      val key = col("doc_id").cast("string")
      val oldSnap = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
        .select(key.as("k"), sha2(col("text"), 256).as("h"))
      val newText = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text"))
      val newDocs = docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
        .select(col("doc_id"), key.as("k"), newText.as("text"))
      val diff = graft.llm.Crawl.snapshotDiff(
        oldSnap, newDocs.select(col("k"), sha2(col("text"), 256).as("h")),
        "k", "h").withColumnRenamed("url", "k")
      val upserts = graft.llm.Search.buildPostings(
          diff.filter(col("status").isin("added", "changed"))
            .join(newDocs.select(col("k"), col("doc_id"), col("text")),
              Seq("k")),
          "doc_id", "text")
        .select(lit("upsert").as("op"), col("term"), col("doc_id"),
          col("tf"), col("positions"))
      val deletes = diff.filter(col("status").isin("removed", "changed"))
        .select(lit("delete").as("op"),
          lit(null).cast("string").as("term"),
          col("k").cast("long").as("doc_id"),
          lit(null).cast("long").as("tf"),
          lit(null).cast("string").as("positions"))
      upserts.union(deletes).orderBy("op", "doc_id", "term")
    }),

    // [EXT] IP-range enrichment (GeoIP-style): hash-derived 32-bit
    // IPs against 64 non-uniform [k², (k+1)²)·10⁶ ranges through the
    // bucketized rangeJoin — the equi-joinable form of an interval
    // lookup (an inequality θ-join would be a broadcast nested loop
    // over the corpus). The oracle uses DuckDB's native BETWEEN
    // join; results must agree exactly.
    "q159_ip_range_enrich" -> ((s, d) => {
      val ips = T.documents(s, d).select(col("doc_id"),
        pmod(col("doc_id") * 2654435761L, lit(4294967296L)).as("ip"))
      val ranges = s.range(64).select(
        (col("id") * col("id") * 1000000L).as("r_start"),
        ((col("id") + 1L) * (col("id") + 1L) * 1000000L - 1L).as("r_end"),
        concat(lit("geo"), col("id")).as("geo"))
      graft.ops.relational.rangeJoin(ips, ranges, "ip",
          "r_start", "r_end", bucketWidth = 1L << 22)
        .select("doc_id", "ip", "geo")
        .orderBy("doc_id")
    }),

    // [EXT] dataset card: the one-pass corpus summary a training-
    // data release ships — doc/token/char mass, lang+source breadth,
    // exact-dup surplus, quality-keep count — as a tidy
    // (metric, value) table. ONE scan; the multi-count-distinct
    // Expand triples the aggregate's input, which is the documented
    // price of exact breadth counts in one pass (swap KMV sketches
    // at 100 TB if approximate breadth suffices).
    "q160_dataset_card" -> ((s, d) => {
      // r15: gate + sha + token-count map work single-task — fan out
      val g = graft.llm.TextAnalysis.qualityGate(col("text"))
      graft.ops.Par.fanOut(
          T.documents(s, d).select("doc_id", "lang", "source", "n_chars",
            "text"),
          col("doc_id"))
        .select(col("lang"), col("source"), col("n_chars"),
          graft.llm.TextAnalysis.tokenCountWs(col("text")).cast("long")
            .as("ntok"),
          sha2(trim(col("text")), 256).as("h"),
          g.getField("keep").as("keep"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum("ntok").as("n_tokens"),
          countDistinct("lang").as("n_langs"),
          countDistinct("source").as("n_sources"),
          (count(lit(1)) - countDistinct("h")).as("n_exact_dup_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_keep"),
          sum("n_chars").as("n_chars"))
        .select(expr(
          """stack(7,
            |  'n_chars', n_chars,
            |  'n_docs', n_docs,
            |  'n_exact_dup_docs', n_exact_dup_docs,
            |  'n_langs', n_langs,
            |  'n_quality_keep', n_quality_keep,
            |  'n_sources', n_sources,
            |  'n_tokens', n_tokens) AS (metric, value)""".stripMargin))
        .orderBy("metric")
    }),

    // [EXT] substring-tier phrase blocklist: the graft_phrase_hits
    // native expression counts non-overlapping occurrences of each
    // phrase (replace() semantics — the oracle replays it as
    // (len − len(replace))/len per phrase) in ONE codegen'd pass;
    // multi-word phrases are exactly what the token-exact q138 tier
    // cannot express. Map-only.
    "q161_phrase_blocklist" -> ((s, d) => {
      val phrases = Seq("table scan", "merge part", "slow small")
      T.documents(s, d)
        .select(col("doc_id"),
          graft.llm.TextAnalysis.phraseHits(col("text"), phrases)
            .as("hits"))
        .withColumn("blocked", col("hits") > 0)
        .orderBy("doc_id")
    }),

    // [EXT] NEAREST as-of join (q45 backward / q113 forward's third
    // arm, the pandas merge_asof nearest convention — ties prefer
    // backward): both candidates from ONE window pass over the same
    // union, per-row delta compare picks. Oracle: two DuckDB ASOF
    // joins + the same CASE.
    "q162_asof_nearest" -> ((s, d) => {
      val ev = T.events(s, d)
      val left = ev.select(col("event_id"), col("user_id").as("custkey"),
        T.tsMillis(ev, "ts").as("t_ms"))
      val right = T.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"),
          unix_millis(col("o_orderdate")
            .cast(org.apache.spark.sql.types.TimestampType)).as("od_ms"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.ops.relational.asofJoin(left, right, Seq("custkey"),
          "t_ms", "od_ms", direction = "nearest")
        .select("event_id", "custkey", "o_orderkey", "order_date")
        .orderBy("event_id")
    }),

    // [EXT] per-GROUP drift triage: q155's metric per lang between
    // the even- and odd-doc_id halves of the corpus — "which
    // language drifted?" after the global alarm. Dense
    // groups×256-bucket table, all bounded aggregates.
    "q163_drift_by_group" -> ((s, d) => {
      val docs = T.documents(s, d)
      graft.llm.Selection.distributionDriftByGroup(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          "lang", "text", numBuckets = 256, salt = "drift8")
        .orderBy("lang")
    }),

    // [EXT] SEMANTIC dedup end-to-end (SemDeDup-shaped): exact
    // blocked cosine pairs over the embeddings table → connected
    // components → one representative per cluster (min id; quality
    // flat) — q97's resolution composition on the EMBEDDING near-dup
    // tier instead of the token tier. Oracle: list_cosine_similarity
    // pairs + the recursive-CTE clustering + rank window.
    "q164_semantic_resolve" -> ((s, d) => {
      // r15: the blocked pair-gen's per-pair dot products execute
      // EAGERLY inside CC's pair materialization, single-task — fan
      // the embedding scan out first (guide §2.5)
      val emb = graft.ops.Par.fanOut(
        T.embeddings(s, d).select("vec_id", "embedding", "label"),
        col("vec_id"))
      val pairs = graft.llm.Dedup.embeddingPairsExact(emb,
          "vec_id", "embedding", "label")
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 4).as("c"))
        .filter(col("c") >= 0.35)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      graft.llm.Dedup.resolveNearDups(
          emb.select(col("vec_id")), pairs, "vec_id", lit(0.0))
        .orderBy("vec_id")
    }),

    // [EXT] T5 span corruption, deterministic: per-(doc, position)
    // salted-SHA mask decision at rate 0.15, consecutive masks form
    // sentinel spans — ONE fold over the token array per row,
    // map-only. The oracle rebuilds the spans relationally
    // (gaps-and-islands) with the identical 52-bit threshold.
    "q165_span_corrupt" -> ((s, d) =>
      // r15: the per-token SHA mask fold ran in the single scan task —
      // scale-gated fan-out first (guide §2.5)
      graft.llm.TrainingOps.spanCorrupt(
          graft.ops.Par.fanOut(
            T.documents(s, d).select(col("doc_id"), col("text")),
            col("doc_id")),
          "doc_id", "text", maskRate = 0.15, salt = "t5")
        .orderBy("doc_id")),

    // [EXT] interval-OVERLAP join: two event-span sets meet on
    // fixed-width bucket keys with the EMIT-ONCE guard (only the
    // bucket holding the overlap's left edge emits — dedup by
    // construction, no distinct pass). Oracle: the plain inequality
    // join, which must agree row-for-row.
    "q166_interval_join" -> ((s, d) => {
      val ev = T.events(s, d)
      val t = T.tsMillis(ev, "ts")
      val a = ev.filter(pmod(col("event_id"), lit(3)) === 0)
        .select(col("event_id").as("a_id"), t.as("a_s"),
          (t + 120000L).as("a_e"))
      val b = ev.filter(pmod(col("event_id"), lit(3)) === 1)
        .select(col("event_id").as("b_id"), (t - 60000L).as("b_s"),
          (t + 60000L).as("b_e"))
      graft.ops.relational.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e",
          bucketWidth = 60000L)
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    }),

    // [EXT] pack concatenation: q52's packs per lang at budget 512
    // collapsed to ONE training sequence each, docs joined in pack
    // order by an EOD sentinel — the step between packing and the
    // tokenizer. Per-group state is budget-bounded. Oracle replays
    // the cumsum pack ids + string_agg in doc order.
    "q167_packed_sequences" -> ((s, d) =>
      graft.llm.TrainingOps.exportPackedSequences(
          T.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
          "lang", "doc_id", "text",
          graft.llm.TextAnalysis.tokenCountWs(col("text")), budget = 512L,
          sep = " <eod> ")
        .orderBy("lang", "pack_id")),

    // [EXT] prefix-LM split (UL2 S-denoiser): deterministic uniform
    // split point k ∈ [1, n−1] per doc from a salted-SHA uniform —
    // prefix conditions, suffix targets. Map-only; the oracle
    // replays the identical arithmetic and array slices.
    "q168_prefix_lm" -> ((s, d) =>
      // r15: fan-out A/B'd — neutral (1.02×), left at baseline shape
      graft.llm.TrainingOps.prefixLmSplit(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", salt = "plm8")
        .orderBy("doc_id")),

    // [EXT] Unicode confusable folding: curly quotes, dashes, NBSP,
    // ellipsis, fi/fl ligatures → ASCII before hashing (NFC leaves
    // all of these distinct). One translate + three replaces,
    // map-only; the oracle replays them verbatim.
    "q169_fold_confusables" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"),
          graft.llm.TextAnalysis.foldConfusables(
            concat(lit("‘q’ “t” – — … ﬁﬂ "), col("text")))
            .as("folded"))
        .orderBy("doc_id")),

    // [EXT] URL query-param canonicalization: tracking params drop
    // (utm_* + an explicit list), survivors re-emit SORTED, fragment
    // drops — the frontier dedup key where params select content.
    // Map-only list ops; the oracle mirrors them.
    "q170_url_params" -> ((s, d) => {
      val id = col("doc_id")
      val url = concat(lit("https://s.com/p/"), id,
        lit("?b=2&a="), pmod(id, lit(5)),
        lit("&utm_source=x"),
        when(pmod(id, lit(3)) === 0, lit("&fbclid=abc")).otherwise(lit("")),
        when(pmod(id, lit(4)) === 1, lit("")).otherwise(lit("#frag")))
      T.documents(s, d)
        .select(id, graft.llm.TextAnalysis.canonicalizeUrlParams(url)
          .as("canon"))
        .orderBy("doc_id")
    }),

    // [EXT] pipeline FUNNEL report: survivor counts through quality
    // gate → exact dedup (keep-min among quality survivors) →
    // blocklist — the stage-by-stage audit a dataset card publishes.
    // ONE text scan + one bounded hash join; all four counts in one
    // aggregate, emitted as a tidy (stage, n_rows) table.
    "q171_pipeline_report" -> ((s, d) => {
      val kq = graft.llm.TextAnalysis.qualityGate(col("text"))
        .getField("keep")
      // r15: fan-out A/B'd — neutral (0.99×), left at baseline shape.
      // r16: the projected (kq, h) table feeds BOTH the winner groupBy
      // and the join's left side — each re-ran the per-row
      // qualityGate + SHA pass; under the Par gate (fan-out + cut) the
      // pass runs once and in parallel. Past the gate: unchanged.
      val proj = T.documents(s, d).select(col("doc_id"), col("text"))
      val withH0 = graft.ops.Par.fanOut(proj, col("doc_id"))
        .select(col("doc_id"), col("text"), kq.as("kq"),
          sha2(trim(col("text")), 256).as("h"))
      val withH =
        if (graft.ops.Par.isSmall(proj)) withH0.localCheckpoint()
        else withH0
      val win = withH.filter(col("kq")).groupBy("h")
        .agg(min("doc_id").as("_keep"))
      val kb = size(filter(
        transform(graft.llm.TextAnalysis.tokens(col("text")),
          t => lower(t)),
        t => t.isin("dup", "fast"))) === 0
      withH.join(win, Seq("h"), "left")
        .withColumn("w", col("doc_id") === col("_keep"))
        .withColumn("kb", kb)
        .agg(count(lit(1)).as("n0"),
          sum(when(col("kq"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("kq") && col("w"), 1L).otherwise(0L)).as("n2"),
          sum(when(col("kq") && col("w") && col("kb"), 1L).otherwise(0L))
            .as("n3"))
        .select(expr(
          """stack(4,
            |  '0_input', n0,
            |  '1_quality', n1,
            |  '2_dedup', n2,
            |  '3_blocklist', n3) AS (stage, n_rows)""".stripMargin))
        .orderBy("stage")
    }),

    // [EXT] UL2 mixture-of-denoisers (arXiv:2205.05131): every doc
    // deterministically draws an objective (R 50% / S 25% / X 25%
    // via splitAssign), then R/X run span corruption at rates
    // 0.15/0.5 and S runs the prefix-LM split — the full denoising
    // training mix in ONE corpus scan with a per-row objective
    // dispatch (the r8 three-arm filter+union formulation re-read
    // the corpus once per arm). The oracle replays the assignment
    // buckets and all three arms.
    "q172_ul2_mixture" -> ((s, d) =>
      graft.llm.TrainingOps.ul2Mixture(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text",
          rSalt = "t5r8", sSalt = "plmu8", xSalt = "t5x8")
        .orderBy("objective", "doc_id")),

    // [EXT] per-GROUP heavy hitters: the SpaceSaving aggregate of
    // q57 run per lang over source — bounded ≤64-entry state per
    // group through partial/merge/final; exact (err=0) here because
    // 20 distinct sources < capacity, which is what lets the exact
    // groupBy oracle match.
    "q149_hh_per_group" -> ((s, d) =>
      T.documents(s, d)
        .groupBy("lang")
        .agg(graft.llm.Sketches.heavyHitters(col("source"), 64).as("_hh"))
        .select(col("lang"), explode(col("_hh")).as("h"))
        .select(col("lang"), col("h.item").as("item"),
          col("h.cnt").as("cnt"), col("h.err").as("err"))
        .orderBy(col("lang"), col("cnt").desc, col("item"))))

  val oracleSql: Map[String, String] = Map(
    "q143_dsir_scores" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, lang,
        |         ('0x' || substr(sha256('dsir8|' || term), 1, 13))::BIGINT
        |           % 512 AS bucket
        |       FROM tok WHERE term <> ''),
        |tc AS (SELECT bucket, count(*) AS t_cnt FROM tk
        |       WHERE lang = 'en' GROUP BY 1),
        |rc AS (SELECT bucket, count(*) AS r_cnt FROM tk GROUP BY 1),
        |tt AS (SELECT coalesce(sum(t_cnt), 0) AS t_tot FROM tc),
        |rt AS (SELECT coalesce(sum(r_cnt), 0) AS r_tot FROM rc),
        |m AS (SELECT b.bucket,
        |        CAST(round((ln(CAST(coalesce(t_cnt, 0) + 1 AS DOUBLE)
        |                       / CAST(t_tot + 512 AS DOUBLE)) -
        |                    ln(CAST(coalesce(r_cnt, 0) + 1 AS DOUBLE)
        |                       / CAST(r_tot + 512 AS DOUBLE))) * 1e6)
        |          AS BIGINT) AS ratio_micro
        |      FROM (SELECT range AS bucket FROM range(512)) b
        |      LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
        |      CROSS JOIN tt CROSS JOIN rt)
        |SELECT tk.doc_id, count(*) AS n_tokens,
        |       CAST(sum(ratio_micro) AS BIGINT) AS score_micro
        |FROM tk JOIN m USING (bucket)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q144_weighted_sample" ->
      """SELECT doc_id, weight, key_micro FROM (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    CAST(round(ln(
        |        (('0x' || substr(sha256('ws8:' || CAST(doc_id AS VARCHAR)),
        |            1, 13))::BIGINT + 1) / 4503599627370496.0)
        |      / CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS key_micro
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
        |  ORDER BY key_micro DESC, doc_id LIMIT 50)
        |ORDER BY doc_id""".stripMargin,
    "q145_mixture_epochs" ->
      """WITH base AS (
        |  SELECT doc_id, source, n_chars FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2')),
        |tot AS (SELECT 3 * coalesce(sum(n_chars), 0) AS budget FROM base),
        |st AS (SELECT source, sum(n_chars) AS src_tokens
        |       FROM base GROUP BY 1),
        |wt AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3),
        |         ('src2', 0.2)) AS t(source, w)),
        |f AS (SELECT st.source,
        |        CAST(budget AS DOUBLE) * CAST(w AS DOUBLE)
        |          / CAST(src_tokens AS DOUBLE) AS f
        |      FROM st JOIN wt USING (source) CROSS JOIN tot),
        |c AS (SELECT b.doc_id, b.source,
        |        CAST(floor(f) AS INT) + CASE WHEN
        |          (('0x' || substr(sha256('mix8:' ||
        |              CAST(b.doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
        |            / 4503599627370496.0 < f - floor(f)
        |          THEN 1 ELSE 0 END AS copies
        |      FROM base b JOIN f USING (source))
        |SELECT doc_id, source, CAST(unnest(generate_series(1, copies))
        |    AS INT) AS epoch
        |FROM c WHERE copies > 0
        |ORDER BY doc_id, epoch""".stripMargin,
    "q146_snapshot_diff" ->
      """WITH o AS (
        |  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
        |         sha256(text) AS old_hash
        |  FROM documents WHERE doc_id % 5 <> 4),
        |n AS (
        |  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
        |         sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
        |                     ELSE text END) AS new_hash
        |  FROM documents WHERE doc_id % 7 <> 3)
        |SELECT coalesce(o.url, n.url) AS url, old_hash, new_hash,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.url = n.url
        |ORDER BY url""".stripMargin,
    "q147_url_traps" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.com/cat/' || lang || '/' || source
        |      || '/' || repeat(lang || '/', CAST(doc_id % 7 AS INT))
        |      || '?a=1' || repeat('&b=2', CAST(doc_id % 10 AS INT)) AS url
        |  FROM documents),
        |p AS (SELECT doc_id,
        |        regexp_extract(url,
        |          '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |        regexp_extract(url, '\?([^#]*)', 1) AS q
        |      FROM u),
        |g AS (SELECT doc_id,
        |        list_filter(str_split(path, '/'), x -> x <> '') AS segs, q
        |      FROM p)
        |SELECT doc_id, CAST(len(segs) AS INT) AS depth,
        |  CAST(len(segs) - len(list_distinct(segs)) AS INT) AS dup_segments,
        |  CAST(CASE WHEN q = '' THEN 0
        |            ELSE len(str_split(q, '&')) END AS INT) AS n_params,
        |  (len(segs) > 8 OR len(segs) - len(list_distinct(segs)) > 2 OR
        |   CASE WHEN q = '' THEN 0 ELSE len(str_split(q, '&')) END > 8)
        |    AS is_trap
        |FROM g ORDER BY doc_id""".stripMargin,
    "q148_postings" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term,
        |    unnest(range(len(regexp_split_to_array(trim(text), '\s+'))))
        |      AS pos
        |  FROM documents WHERE doc_id < 100)
        |SELECT term, doc_id, count(*) AS tf,
        |  string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions
        |FROM tok WHERE term <> ''
        |GROUP BY 1, 2 ORDER BY term, doc_id""".stripMargin,
    "q149_hh_per_group" ->
      """SELECT lang, source AS item, count(*) AS cnt,
        |       CAST(0 AS BIGINT) AS err
        |FROM documents GROUP BY 1, 2
        |ORDER BY lang, cnt DESC, item""".stripMargin,
    "q150_wsk_per_group" ->
      """WITH k AS (
        |  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS weight,
        |    CAST(round(ln(
        |        (('0x' || substr(sha256('wg8:' || CAST(doc_id AS VARCHAR)),
        |            1, 13))::BIGINT + 1) / 4503599627370496.0)
        |      / CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS key_micro
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY lang ORDER BY key_micro DESC, doc_id)
        |        AS rank FROM k)
        |SELECT lang, doc_id, weight, key_micro, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    "q151_canonical_dedup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
        |    CASE WHEN doc_id % 4 <> 1 THEN
        |      'https://ex.com/c/' || CAST(doc_id % 50 AS VARCHAR)
        |    END AS canon0
        |  FROM documents)
        |SELECT coalesce(canon0, url) AS canon, min(url) AS kept_url,
        |       count(*) AS n_pages
        |FROM p GROUP BY 1 ORDER BY canon""".stripMargin,
    "q152_calibration" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, lang,
        |         ('0x' || substr(sha256('dsir8|' || term), 1, 13))::BIGINT
        |           % 512 AS bucket
        |       FROM tok WHERE term <> ''),
        |tc AS (SELECT bucket, count(*) AS t_cnt FROM tk
        |       WHERE lang = 'en' GROUP BY 1),
        |rc AS (SELECT bucket, count(*) AS r_cnt FROM tk GROUP BY 1),
        |tt AS (SELECT coalesce(sum(t_cnt), 0) AS t_tot FROM tc),
        |rt AS (SELECT coalesce(sum(r_cnt), 0) AS r_tot FROM rc),
        |m AS (SELECT b.bucket,
        |        CAST(round((ln(CAST(coalesce(t_cnt, 0) + 1 AS DOUBLE)
        |                       / CAST(t_tot + 512 AS DOUBLE)) -
        |                    ln(CAST(coalesce(r_cnt, 0) + 1 AS DOUBLE)
        |                       / CAST(r_tot + 512 AS DOUBLE))) * 1e6)
        |          AS BIGINT) AS ratio_micro
        |      FROM (SELECT range AS bucket FROM range(512)) b
        |      LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
        |      CROSS JOIN tt CROSS JOIN rt),
        |sc AS (SELECT tk.doc_id, max(tk.lang = 'en') AS y,
        |         CAST(sum(ratio_micro) AS BIGINT) AS score
        |       FROM tk JOIN m USING (bucket) GROUP BY 1),
        |th AS (SELECT * FROM (VALUES (-2000000), (-1000000), (-500000),
        |         (0), (100000)) AS t(threshold)),
        |cx AS (SELECT threshold,
        |         sum(CASE WHEN y AND score >= threshold
        |               THEN 1 ELSE 0 END) AS tp,
        |         sum(CASE WHEN NOT y AND score >= threshold
        |               THEN 1 ELSE 0 END) AS fp,
        |         sum(CASE WHEN y AND score < threshold
        |               THEN 1 ELSE 0 END) AS fn,
        |         sum(CASE WHEN NOT y AND score < threshold
        |               THEN 1 ELSE 0 END) AS tn
        |       FROM sc CROSS JOIN th GROUP BY 1)
        |SELECT CAST(threshold AS BIGINT) AS threshold,
        |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |       ELSE CAST(round(CAST(tp AS DOUBLE) * 1e6
        |              / CAST(tp + fp AS DOUBLE)) AS BIGINT)
        |  END AS precision_micro,
        |  CASE WHEN tp + fn = 0 THEN NULL
        |       ELSE CAST(round(CAST(tp AS DOUBLE) * 1e6
        |              / CAST(tp + fn AS DOUBLE)) AS BIGINT)
        |  END AS recall_micro
        |FROM cx ORDER BY threshold""".stripMargin,
    "q153_frontier_chain" ->
      """WITH l0 AS (
        |  SELECT DISTINCT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
        |    || '.com/cat/' || CAST(doc_id % 7 AS VARCHAR) AS url
        |  FROM documents
        |  UNION
        |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
        |    || '.com/private/x' || CAST(doc_id AS VARCHAR)
        |  FROM documents
        |  UNION
        |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
        |    || '.com/t/x/x/x/x/x/x/x/x/x/e'
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION
        |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.com/about'
        |  FROM documents WHERE doc_id % 3 <> 0),
        |p AS (SELECT url,
        |        regexp_extract(url, '^https://([^/]*)', 1) AS host,
        |        regexp_extract(url, '^https://[^/]*(/.*)$', 1) AS path,
        |        regexp_extract(url, '\?([^#]*)', 1) AS q
        |      FROM l0),
        |g AS (SELECT url, host, path,
        |        list_filter(str_split(
        |          regexp_extract(path, '^([^?#]*)', 1), '/'),
        |          x -> x <> '') AS segs, q
        |      FROM p),
        |f AS (SELECT url, host, path FROM g
        |      WHERE NOT (len(segs) > 8
        |        OR len(segs) - len(list_distinct(segs)) > 2
        |        OR CASE WHEN q = '' THEN 0
        |                ELSE len(str_split(q, '&')) END > 8)),
        |a AS (SELECT url, host FROM f WHERE path NOT LIKE '/private/%'),
        |r AS (SELECT host, url, row_number() OVER
        |        (PARTITION BY host ORDER BY url) AS rank FROM a)
        |SELECT host, CAST(rank AS INT) AS rank, url
        |FROM r WHERE rank <= 4 ORDER BY host, rank""".stripMargin,
    "q154_domain_quality" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |         regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM
        |        (SELECT doc_id, unnest(w) AS tok FROM t) u GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(c) AS top FROM c GROUP BY 1),
        |j AS (SELECT t.doc_id, t.source, len(w) AS n,
        |        length(text) AS chars,
        |        len(list_filter(w,
        |          x -> x IN ('the','a','and','of','to'))) AS stop_hits,
        |        m.top
        |      FROM t JOIN m ON t.doc_id = m.doc_id),
        |k AS (SELECT source,
        |        (n BETWEEN 30 AND 100000)
        |          AND (chars BETWEEN 4 * n AND 11 * n)
        |          AND top * 100 <= n * 10
        |          AND stop_hits * 1000 >= n * 50 AS keep, n
        |      FROM j)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST((sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000)
        |    // count(*) AS BIGINT) AS keep_permille,
        |  ((sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000) // count(*))
        |    < 500 AS low_quality
        |FROM k GROUP BY 1 ORDER BY source""".stripMargin,
    "q172_ul2_mixture" ->
      """WITH asg AS (
        |  SELECT doc_id, text,
        |    CASE WHEN b < 5000 THEN 'r' WHEN b < 7500 THEN 's'
        |         ELSE 'x' END AS obj
        |  FROM (SELECT doc_id, text,
        |          ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)
        |            || ':ul2'), 1, 15))::BIGINT % 10000 AS b
        |        FROM documents)),
        |rtok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |      AS term,
        |    unnest(range(len(regexp_split_to_array(trim(text), '\s+'))))
        |      AS pos
        |  FROM asg WHERE obj = 'r' AND trim(text) <> ''),
        |rm AS (SELECT doc_id, pos, term,
        |        ('0x' || substr(sha256('t5r8:' || CAST(doc_id AS VARCHAR)
        |           || ':' || CAST(pos AS VARCHAR)), 1, 13))::BIGINT
        |          < 675539944105574 AS mk
        |      FROM rtok),
        |risl AS (SELECT doc_id, pos, term,
        |          pos - row_number() OVER (PARTITION BY doc_id
        |            ORDER BY pos) AS grp
        |        FROM rm WHERE mk),
        |rsp AS (SELECT doc_id, grp, min(pos) AS span_start,
        |         string_agg(term, ' ' ORDER BY pos) AS toks
        |       FROM risl GROUP BY 1, 2),
        |rspk AS (SELECT doc_id, span_start, toks,
        |          CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY span_start) - 1 AS INT) AS k
        |        FROM rsp),
        |rii AS (SELECT doc_id, pos, term FROM rm WHERE NOT mk
        |        UNION ALL
        |        SELECT doc_id, span_start,
        |          '<extra_id_' || CAST(k AS VARCHAR) || '>' FROM rspk),
        |rinp AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos)
        |           AS input_text FROM rii GROUP BY 1),
        |rns AS (SELECT doc_id, count(*) AS n FROM rspk GROUP BY 1),
        |rtgt AS (SELECT doc_id,
        |          string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> '
        |            || toks, ' ' ORDER BY k) AS t
        |        FROM rspk GROUP BY 1),
        |rarm AS (
        |  SELECT 'r' AS objective, a.doc_id,
        |    coalesce(rinp.input_text, '') AS input_text,
        |    CASE WHEN rns.n IS NULL THEN '<extra_id_0>'
        |         ELSE rtgt.t || ' <extra_id_' || CAST(rns.n AS VARCHAR)
        |           || '>' END AS target_text
        |  FROM (SELECT doc_id FROM asg WHERE obj = 'r'
        |        AND trim(text) <> '') a
        |  LEFT JOIN rns USING (doc_id) LEFT JOIN rinp USING (doc_id)
        |  LEFT JOIN rtgt USING (doc_id)),
        |xtok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |      AS term,
        |    unnest(range(len(regexp_split_to_array(trim(text), '\s+'))))
        |      AS pos
        |  FROM asg WHERE obj = 'x' AND trim(text) <> ''),
        |xm AS (SELECT doc_id, pos, term,
        |        ('0x' || substr(sha256('t5x8:' || CAST(doc_id AS VARCHAR)
        |           || ':' || CAST(pos AS VARCHAR)), 1, 13))::BIGINT
        |          < 2251799813685248 AS mk
        |      FROM xtok),
        |xisl AS (SELECT doc_id, pos, term,
        |          pos - row_number() OVER (PARTITION BY doc_id
        |            ORDER BY pos) AS grp
        |        FROM xm WHERE mk),
        |xsp AS (SELECT doc_id, grp, min(pos) AS span_start,
        |         string_agg(term, ' ' ORDER BY pos) AS toks
        |       FROM xisl GROUP BY 1, 2),
        |xspk AS (SELECT doc_id, span_start, toks,
        |          CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY span_start) - 1 AS INT) AS k
        |        FROM xsp),
        |xii AS (SELECT doc_id, pos, term FROM xm WHERE NOT mk
        |        UNION ALL
        |        SELECT doc_id, span_start,
        |          '<extra_id_' || CAST(k AS VARCHAR) || '>' FROM xspk),
        |xinp AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos)
        |           AS input_text FROM xii GROUP BY 1),
        |xns AS (SELECT doc_id, count(*) AS n FROM xspk GROUP BY 1),
        |xtgt AS (SELECT doc_id,
        |          string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> '
        |            || toks, ' ' ORDER BY k) AS t
        |        FROM xspk GROUP BY 1),
        |xarm AS (
        |  SELECT 'x' AS objective, a.doc_id,
        |    coalesce(xinp.input_text, '') AS input_text,
        |    CASE WHEN xns.n IS NULL THEN '<extra_id_0>'
        |         ELSE xtgt.t || ' <extra_id_' || CAST(xns.n AS VARCHAR)
        |           || '>' END AS target_text
        |  FROM (SELECT doc_id FROM asg WHERE obj = 'x'
        |        AND trim(text) <> '') a
        |  LEFT JOIN xns USING (doc_id) LEFT JOIN xinp USING (doc_id)
        |  LEFT JOIN xtgt USING (doc_id)),
        |sw AS (SELECT doc_id,
        |         regexp_split_to_array(trim(text), '\s+') AS w
        |       FROM asg WHERE obj = 's'),
        |sn AS (SELECT doc_id, w, len(w) AS n_tokens FROM sw
        |       WHERE len(w) >= 2),
        |sk AS (SELECT doc_id, w, n_tokens,
        |        1 + CAST(floor(
        |          (('0x' || substr(sha256('plmu8:' ||
        |             CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |            / 4503599627370496.0) * (n_tokens - 1)) AS INT)
        |          AS split_at
        |      FROM sn),
        |sarm AS (
        |  SELECT 's' AS objective, doc_id,
        |    array_to_string(w[1:split_at], ' ') AS input_text,
        |    array_to_string(w[split_at+1:n_tokens], ' ') AS target_text
        |  FROM sk)
        |SELECT * FROM rarm
        |UNION ALL SELECT * FROM xarm
        |UNION ALL SELECT * FROM sarm
        |ORDER BY objective, doc_id""".stripMargin,
    "q171_pipeline_report" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM
        |        (SELECT doc_id, unnest(w) AS tok FROM t) u GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(c) AS top FROM c GROUP BY 1),
        |k AS (SELECT t.doc_id, t.text, t.w,
        |        (len(w) BETWEEN 30 AND 100000)
        |          AND (length(t.text) BETWEEN 4 * len(w) AND 11 * len(w))
        |          AND m.top * 100 <= len(w) * 10
        |          AND len(list_filter(w,
        |            x -> x IN ('the','a','and','of','to'))) * 1000
        |            >= len(w) * 50 AS kq
        |      FROM t JOIN m ON t.doc_id = m.doc_id),
        |win AS (SELECT sha256(trim(text)) AS h, min(doc_id) AS keep_id
        |        FROM k WHERE kq GROUP BY 1),
        |fl AS (SELECT k.doc_id, k.kq,
        |         k.doc_id = win.keep_id AS w2,
        |         len(list_filter(k.w, x -> lower(x) IN ('dup', 'fast')))
        |           = 0 AS kb
        |       FROM k LEFT JOIN win ON sha256(trim(k.text)) = win.h)
        |SELECT stage, n_rows FROM (
        |  SELECT '0_input' AS stage, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM fl
        |  UNION ALL SELECT '1_quality',
        |    CAST(sum(CASE WHEN kq THEN 1 ELSE 0 END) AS BIGINT) FROM fl
        |  UNION ALL SELECT '2_dedup',
        |    CAST(sum(CASE WHEN kq AND w2 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM fl
        |  UNION ALL SELECT '3_blocklist',
        |    CAST(sum(CASE WHEN kq AND w2 AND kb THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM fl)
        |ORDER BY stage""".stripMargin,
    "q169_fold_confusables" ->
      """SELECT doc_id,
        |  replace(replace(replace(
        |    translate('‘q’ “t” – — … ﬁﬂ' || chr(160) || text,
        |      '‘’“”–—' || chr(160), '''''""--' || ' '),
        |    '…', '...'), 'ﬁ', 'fi'), 'ﬂ', 'fl') AS folded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q170_url_params" ->
      """WITH u AS (
        |  SELECT doc_id, 'https://s.com/p/' || CAST(doc_id AS VARCHAR)
        |    || '?b=2&a=' || CAST(doc_id % 5 AS VARCHAR)
        |    || '&utm_source=x'
        |    || CASE WHEN doc_id % 3 = 0 THEN '&fbclid=abc' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 1 THEN '' ELSE '#frag' END AS url
        |  FROM documents),
        |p AS (SELECT doc_id,
        |        regexp_extract(url, '^([^?#]*)', 1) AS base,
        |        regexp_extract(url, '\?([^#]*)', 1) AS q
        |      FROM u),
        |k AS (SELECT doc_id, base,
        |        list_sort(list_filter(str_split(q, '&'),
        |          x -> x <> ''
        |            AND NOT starts_with(split_part(x, '=', 1), 'utm_')
        |            AND split_part(x, '=', 1) NOT IN
        |              ('fbclid', 'gclid', 'msclkid', 'ref', 'source')))
        |          AS kept
        |      FROM p)
        |SELECT doc_id,
        |  CASE WHEN len(kept) > 0
        |       THEN base || '?' || array_to_string(kept, '&')
        |       ELSE base END AS canon
        |FROM k ORDER BY doc_id""".stripMargin,
    "q168_prefix_lm" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |n AS (SELECT doc_id, w, len(w) AS n_tokens FROM t
        |      WHERE len(w) >= 2),
        |k AS (SELECT doc_id, w, n_tokens,
        |        1 + CAST(floor(
        |          (('0x' || substr(sha256('plm8:' ||
        |             CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |            / 4503599627370496.0) * (n_tokens - 1)) AS INT)
        |          AS split_at
        |      FROM n)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, split_at,
        |  array_to_string(w[1:split_at], ' ') AS prefix_text,
        |  array_to_string(w[split_at+1:n_tokens], ' ') AS target_text
        |FROM k ORDER BY doc_id""".stripMargin,
    "q167_packed_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, lang, text, toks,
        |        CAST(floor((sum(toks) OVER (PARTITION BY lang
        |            ORDER BY doc_id) - toks) / 512) AS BIGINT) AS pack_id
        |      FROM t)
        |SELECT lang, pack_id, count(*) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  string_agg(text, ' <eod> ' ORDER BY doc_id) AS sequence
        |FROM p GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin,
    "q166_interval_join" ->
      """WITH a AS (
        |  SELECT event_id AS a_id, epoch_ms(ts) AS a_s,
        |         epoch_ms(ts) + 120000 AS a_e
        |  FROM events WHERE event_id % 3 = 0),
        |b AS (
        |  SELECT event_id AS b_id, epoch_ms(ts) - 60000 AS b_s,
        |         epoch_ms(ts) + 60000 AS b_e
        |  FROM events WHERE event_id % 3 = 1)
        |SELECT a_id, b_id FROM a JOIN b
        |  ON a_s <= b_e AND b_s <= a_e
        |ORDER BY a_id, b_id""".stripMargin,
    "q165_span_corrupt" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE trim(text) <> ''),
        |tok AS (SELECT doc_id, unnest(w) AS term,
        |          unnest(range(len(w))) AS pos
        |        FROM d),
        |m AS (SELECT doc_id, pos, term,
        |        ('0x' || substr(sha256('t5:' || CAST(doc_id AS VARCHAR)
        |           || ':' || CAST(pos AS VARCHAR)), 1, 13))::BIGINT
        |          < 675539944105574 AS mk
        |      FROM tok),
        |isl AS (SELECT doc_id, pos, term,
        |          pos - row_number() OVER (PARTITION BY doc_id
        |            ORDER BY pos) AS grp
        |        FROM m WHERE mk),
        |sp AS (SELECT doc_id, grp, min(pos) AS span_start,
        |         string_agg(term, ' ' ORDER BY pos) AS toks
        |       FROM isl GROUP BY 1, 2),
        |spk AS (SELECT doc_id, span_start, toks,
        |          CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY span_start) - 1 AS INT) AS k
        |        FROM sp),
        |ii AS (
        |  SELECT doc_id, pos, term FROM m WHERE NOT mk
        |  UNION ALL
        |  SELECT doc_id, span_start,
        |    '<extra_id_' || CAST(k AS VARCHAR) || '>' FROM spk),
        |inp AS (SELECT doc_id,
        |          string_agg(term, ' ' ORDER BY pos) AS input_text
        |        FROM ii GROUP BY 1),
        |ns AS (SELECT doc_id, count(*) AS n_spans FROM spk GROUP BY 1),
        |tgt AS (SELECT doc_id,
        |          string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> '
        |            || toks, ' ' ORDER BY k) AS t
        |        FROM spk GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(ns.n_spans, 0) AS INT) AS n_spans,
        |  coalesce(inp.input_text, '') AS input_text,
        |  CASE WHEN ns.n_spans IS NULL THEN '<extra_id_0>'
        |       ELSE tgt.t || ' <extra_id_'
        |         || CAST(ns.n_spans AS VARCHAR) || '>'
        |  END AS target_text
        |FROM d LEFT JOIN ns USING (doc_id) LEFT JOIN inp USING (doc_id)
        |LEFT JOIN tgt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q164_semantic_resolve" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding, b.embedding),
        |          4) >= 0.35),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |reach AS (
        |  SELECT src AS id, src AS lbl FROM e
        |  UNION
        |  SELECT e.dst, reach.lbl FROM reach JOIN e ON e.src = reach.id),
        |cl AS (SELECT id AS vec_id, min(lbl) AS cluster_id
        |       FROM reach GROUP BY id),
        |a AS (SELECT d.vec_id,
        |        coalesce(cl.cluster_id, d.vec_id) AS cluster_id
        |      FROM embeddings d LEFT JOIN cl ON d.vec_id = cl.vec_id),
        |r AS (SELECT vec_id, cluster_id,
        |        count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |        row_number() OVER (PARTITION BY cluster_id
        |                           ORDER BY vec_id) AS rn
        |      FROM a)
        |SELECT vec_id, cluster_id, cluster_size, rn = 1 AS kept
        |FROM r ORDER BY vec_id""".stripMargin,
    "q163_drift_by_group" ->
      """WITH tok AS (
        |  SELECT lang, doc_id % 2 AS half,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT lang, half,
        |         ('0x' || substr(sha256('drift8|' || term), 1, 13))::BIGINT
        |           % 256 AS bucket
        |       FROM tok WHERE term <> ''),
        |ac AS (SELECT lang, bucket, count(*) AS a_cnt FROM tk
        |       WHERE half = 0 GROUP BY 1, 2),
        |bc AS (SELECT lang, bucket, count(*) AS b_cnt FROM tk
        |       WHERE half = 1 GROUP BY 1, 2),
        |at AS (SELECT lang, sum(a_cnt) AS a_tot FROM ac GROUP BY 1),
        |bt AS (SELECT lang, sum(b_cnt) AS b_tot FROM bc GROUP BY 1),
        |gs AS (SELECT DISTINCT lang FROM (
        |         SELECT lang FROM ac UNION ALL SELECT lang FROM bc)),
        |m AS (SELECT gs.lang,
        |        CAST(coalesce(a_cnt, 0) + 1 AS DOUBLE)
        |          / CAST(coalesce(a_tot, 0) + 256 AS DOUBLE) AS p,
        |        CAST(coalesce(b_cnt, 0) + 1 AS DOUBLE)
        |          / CAST(coalesce(b_tot, 0) + 256 AS DOUBLE) AS q
        |      FROM gs CROSS JOIN (SELECT range AS bucket FROM range(256)) bk
        |      LEFT JOIN ac ON ac.lang = gs.lang AND ac.bucket = bk.bucket
        |      LEFT JOIN bc ON bc.lang = gs.lang AND bc.bucket = bk.bucket
        |      LEFT JOIN at ON at.lang = gs.lang
        |      LEFT JOIN bt ON bt.lang = gs.lang)
        |SELECT lang, count(*) AS n_buckets,
        |  CAST(sum(CAST(round(p * ln(p / q) * 1e6) AS BIGINT))
        |    AS BIGINT) AS kl_ab_micro,
        |  CAST(sum(CAST(round(q * ln(q / p) * 1e6) AS BIGINT))
        |    AS BIGINT) AS kl_ba_micro,
        |  CAST(sum(CAST(round(abs(p - q) / 2.0 * 1e6) AS BIGINT))
        |    AS BIGINT) AS tv_micro
        |FROM m GROUP BY 1 ORDER BY lang""".stripMargin,
    "q162_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id AS custkey, epoch_ms(ts) AS t_ms
        |  FROM events),
        |o AS (
        |  SELECT o_custkey AS custkey, epoch_ms(o_orderdate) AS od_ms,
        |         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |         max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2, 3),
        |b AS (SELECT e.event_id, e.custkey, e.t_ms, o.od_ms AS b_ms,
        |        o.o_orderkey AS b_key, o.order_date AS b_date
        |      FROM e ASOF LEFT JOIN o
        |        ON e.custkey = o.custkey AND e.t_ms >= o.od_ms),
        |f AS (SELECT e.event_id, o.od_ms AS f_ms,
        |        o.o_orderkey AS f_key, o.order_date AS f_date
        |      FROM e ASOF LEFT JOIN o
        |        ON e.custkey = o.custkey AND e.t_ms <= o.od_ms)
        |SELECT b.event_id, b.custkey,
        |  CASE WHEN f_ms IS NULL THEN b_key
        |       WHEN b_ms IS NULL THEN f_key
        |       WHEN (t_ms - b_ms) <= (f_ms - t_ms) THEN b_key
        |       ELSE f_key END AS o_orderkey,
        |  CASE WHEN f_ms IS NULL THEN b_date
        |       WHEN b_ms IS NULL THEN f_date
        |       WHEN (t_ms - b_ms) <= (f_ms - t_ms) THEN b_date
        |       ELSE f_date END AS order_date
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,
    "q161_phrase_blocklist" ->
      """SELECT doc_id,
        |  CAST((length(text) - length(replace(text, 'table scan', '')))
        |         // length('table scan')
        |     + (length(text) - length(replace(text, 'merge part', '')))
        |         // length('merge part')
        |     + (length(text) - length(replace(text, 'slow small', '')))
        |         // length('slow small') AS INT) AS hits,
        |  ((length(text) - length(replace(text, 'table scan', '')))
        |         // length('table scan')
        |     + (length(text) - length(replace(text, 'merge part', '')))
        |         // length('merge part')
        |     + (length(text) - length(replace(text, 'slow small', '')))
        |         // length('slow small')) > 0 AS blocked
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q160_dataset_card" ->
      """WITH t AS (
        |  SELECT lang, source, n_chars,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS ntok,
        |    sha256(trim(text)) AS h,
        |    regexp_split_to_array(trim(text), '\s+') AS w,
        |    text
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM
        |        (SELECT doc_id, unnest(regexp_split_to_array(trim(text),
        |           '\s+')) AS tok FROM documents) u GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(c) AS top FROM c GROUP BY 1),
        |k AS (SELECT d.doc_id,
        |        (len(w) BETWEEN 30 AND 100000)
        |          AND (length(d.text) BETWEEN 4 * len(w) AND 11 * len(w))
        |          AND m.top * 100 <= len(w) * 10
        |          AND len(list_filter(w,
        |            x -> x IN ('the','a','and','of','to'))) * 1000
        |            >= len(w) * 50 AS keep
        |      FROM documents d
        |      JOIN (SELECT doc_id, regexp_split_to_array(trim(text),
        |              '\s+') AS w FROM documents) s ON d.doc_id = s.doc_id
        |      JOIN m ON d.doc_id = m.doc_id),
        |agg AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(count(*) - count(DISTINCT h) AS BIGINT)
        |      AS n_exact_dup_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS nc
        |  FROM t),
        |kq AS (SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_quality_keep FROM k)
        |SELECT metric, value FROM (
        |  SELECT 'n_chars' AS metric, nc AS value FROM agg
        |  UNION ALL SELECT 'n_docs', n_docs FROM agg
        |  UNION ALL SELECT 'n_exact_dup_docs', n_exact_dup_docs FROM agg
        |  UNION ALL SELECT 'n_langs', n_langs FROM agg
        |  UNION ALL SELECT 'n_quality_keep', n_quality_keep FROM kq
        |  UNION ALL SELECT 'n_sources', n_sources FROM agg
        |  UNION ALL SELECT 'n_tokens', n_tokens FROM agg)
        |ORDER BY metric""".stripMargin,
    "q159_ip_range_enrich" ->
      """WITH ips AS (
        |  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS ip
        |  FROM documents),
        |r AS (SELECT range AS k, range * range * 1000000 AS r_start,
        |        (range + 1) * (range + 1) * 1000000 - 1 AS r_end,
        |        'geo' || CAST(range AS VARCHAR) AS geo
        |      FROM range(64))
        |SELECT doc_id, CAST(ip AS BIGINT) AS ip, geo
        |FROM ips JOIN r ON ip BETWEEN r_start AND r_end
        |ORDER BY doc_id""".stripMargin,
    "q157_hits" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src, (doc_id * 7) % n AS dst
        |  FROM documents, nn
        |  UNION ALL
        |  SELECT doc_id, (doc_id * 13 + 1) % n FROM documents, nn) t),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |a1r AS (SELECT dst AS node, CAST(count(*) AS BIGINT) * 1000000
        |          AS raw FROM e GROUP BY 1),
        |s1 AS (SELECT greatest(1, coalesce(max(raw), 0) // 1000000)
        |         AS s FROM a1r),
        |a1 AS (SELECT nodes.node, coalesce(raw, 0) // s AS auth
        |       FROM nodes LEFT JOIN a1r USING (node) CROSS JOIN s1),
        |h1r AS (SELECT e.src AS node, sum(a1.auth) AS raw
        |        FROM e JOIN a1 ON e.dst = a1.node GROUP BY 1),
        |t1 AS (SELECT greatest(1, coalesce(max(raw), 0) // 1000000)
        |         AS s FROM h1r),
        |h1 AS (SELECT nodes.node, coalesce(raw, 0) // s AS hub
        |       FROM nodes LEFT JOIN h1r USING (node) CROSS JOIN t1),
        |a2r AS (SELECT e.dst AS node, sum(h1.hub) AS raw
        |        FROM e JOIN h1 ON e.src = h1.node GROUP BY 1),
        |s2 AS (SELECT greatest(1, coalesce(max(raw), 0) // 1000000)
        |         AS s FROM a2r),
        |a2 AS (SELECT nodes.node, coalesce(raw, 0) // s AS auth
        |       FROM nodes LEFT JOIN a2r USING (node) CROSS JOIN s2),
        |h2r AS (SELECT e.src AS node, sum(a2.auth) AS raw
        |        FROM e JOIN a2 ON e.dst = a2.node GROUP BY 1),
        |t2 AS (SELECT greatest(1, coalesce(max(raw), 0) // 1000000)
        |         AS s FROM h2r),
        |h2 AS (SELECT nodes.node, coalesce(raw, 0) // s AS hub
        |       FROM nodes LEFT JOIN h2r USING (node) CROSS JOIN t2)
        |SELECT nodes.node, CAST(h2.hub AS BIGINT) AS hub,
        |       CAST(a2.auth AS BIGINT) AS auth
        |FROM nodes JOIN h2 USING (node) JOIN a2 USING (node)
        |ORDER BY node""".stripMargin,
    "q158_postings_delta" ->
      """WITH st AS (
        |  SELECT doc_id, text,
        |    (doc_id % 5 <> 4) AS in_old, (doc_id % 7 <> 3) AS in_new,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END
        |      AS ntext
        |  FROM documents),
        |up AS (SELECT doc_id, ntext FROM st
        |       WHERE in_new AND ((NOT in_old) OR doc_id % 3 = 0)),
        |tok AS (SELECT doc_id,
        |          unnest(regexp_split_to_array(trim(ntext), '\s+'))
        |            AS term,
        |          unnest(range(len(regexp_split_to_array(trim(ntext),
        |            '\s+')))) AS pos
        |        FROM up),
        |posts AS (SELECT 'upsert' AS op, term, doc_id,
        |            count(*) AS tf,
        |            string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos)
        |              AS positions
        |          FROM tok WHERE term <> '' GROUP BY 2, 3),
        |del AS (SELECT 'delete' AS op, CAST(NULL AS VARCHAR) AS term,
        |          doc_id, CAST(NULL AS BIGINT) AS tf,
        |          CAST(NULL AS VARCHAR) AS positions
        |        FROM st
        |        WHERE in_old AND ((NOT in_new) OR doc_id % 3 = 0))
        |SELECT op, term, doc_id, tf, positions FROM posts
        |UNION ALL SELECT * FROM del
        |ORDER BY op, doc_id, term""".stripMargin,
    "q155_corpus_drift" ->
      """WITH tok AS (
        |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS term
        |  FROM documents WHERE lang IN ('en', 'fr')),
        |tk AS (SELECT lang,
        |         ('0x' || substr(sha256('drift8|' || term), 1, 13))::BIGINT
        |           % 512 AS bucket
        |       FROM tok WHERE term <> ''),
        |ac AS (SELECT bucket, count(*) AS a_cnt FROM tk
        |       WHERE lang = 'en' GROUP BY 1),
        |bc AS (SELECT bucket, count(*) AS b_cnt FROM tk
        |       WHERE lang = 'fr' GROUP BY 1),
        |at AS (SELECT coalesce(sum(a_cnt), 0) AS a_tot FROM ac),
        |bt AS (SELECT coalesce(sum(b_cnt), 0) AS b_tot FROM bc),
        |m AS (SELECT
        |        CAST(coalesce(a_cnt, 0) + 1 AS DOUBLE)
        |          / CAST(a_tot + 512 AS DOUBLE) AS p,
        |        CAST(coalesce(b_cnt, 0) + 1 AS DOUBLE)
        |          / CAST(b_tot + 512 AS DOUBLE) AS q
        |      FROM (SELECT range AS bucket FROM range(512)) b
        |      LEFT JOIN ac USING (bucket) LEFT JOIN bc USING (bucket)
        |      CROSS JOIN at CROSS JOIN bt)
        |SELECT count(*) AS n_buckets,
        |  CAST(sum(CAST(round(p * ln(p / q) * 1e6) AS BIGINT))
        |    AS BIGINT) AS kl_ab_micro,
        |  CAST(sum(CAST(round(q * ln(q / p) * 1e6) AS BIGINT))
        |    AS BIGINT) AS kl_ba_micro,
        |  CAST(sum(CAST(round(abs(p - q) / 2.0 * 1e6) AS BIGINT))
        |    AS BIGINT) AS tv_micro
        |FROM m ORDER BY n_buckets""".stripMargin,
    "q156_stratified_split" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    sha256('ss8:' || CAST(doc_id AS VARCHAR)) AS hh
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id)
        |          AS rk,
        |        count(*) OVER (PARTITION BY lang) AS n
        |      FROM h)
        |SELECT doc_id, lang,
        |  CASE WHEN rk <= (n * 800000) // 1000000 THEN 'train'
        |       WHEN rk <= (n * 900000) // 1000000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin)
}
