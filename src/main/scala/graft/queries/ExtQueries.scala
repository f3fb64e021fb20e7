package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm.{Dedup, Multimodal, Similarity, TrainingOps, TextAnalysis => TA}

/** q25–q37, q41–q45, q51–q53, q57: LLM-training-data-pipeline extension
  * queries ([EXT] — SURVEY.md §2.7 north-star surface) over `documents`,
  * `embeddings`, and `events`: dedup (exact/MinHash/SimHash/Jaccard/
  * embedding), ANN (brute/LSH/IVF), text analysis, multimodal plumbing,
  * streaming batch-twins, training-corpus assembly (split/pack/
  * decontaminate), and the heavy-hitters sketch.
  *
  * Oracle-backed wherever the semantics are engine-independent —
  * including the SimHash/MinHash-LSH portable SHA tiers (the xxhash64
  * native tiers are bit-parity spec-locked against them). Only
  * seeded-RNG hyperplanes (q35) and KMeans cells (q44) are rows-only:
  * their randomness is engine-local by construction.
  */
object ExtQueries {
  private val T = Tables

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact content dedup: hash → keep lowest id (one narrow shuffle).
    "q25_dedup_exact_hash" -> ((s, d) =>
      Dedup.exactDedupByContent(T.documents(s, d), "text", "doc_id")
        .orderBy("keep_id")),

    // Token counting: whitespace + BPE-ish pre-tokenization proxy.
    "q26_token_count" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"),
          TA.tokenCountWs(col("text")).as("ws_tokens"),
          TA.tokenCountBpeish(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id")),

    // Quality scoring: stopword/punct/word-length heuristics.
    "q27_text_quality" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"),
          TA.tokenCountWs(col("text")).as("n_words"),
          TA.avgWordLen(col("text")).as("avg_word_len"),
          TA.stopwordRatio(col("text"), Seq("the", "a")).as("stop_ratio"),
          TA.punctRatio(col("text")).as("punct_ratio"))
        .orderBy("doc_id")),

    // Language-ID heuristic signal: en-stopword hit ratio + threshold flag.
    "q28_lang_stopwords" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TA.stopwordRatio(col("text"), Seq("the", "a", "and", "of", "to"))
            .as("en_stop_ratio"))
        .withColumn("is_en_like", col("en_stop_ratio") > 0.05)
        .orderBy("doc_id")),

    // Document fingerprint: min-SHA256 over word 5-grams (1-perm MinHash).
    "q29_fingerprint" -> ((s, d) =>
      // r15: per-row 5-gram SHA fingerprint ran in the single scan task
      // — scale-gated fan-out first (guide §2.5, Par.fanOut)
      graft.ops.Par.fanOut(
          T.documents(s, d).select(col("doc_id"), col("text")),
          col("doc_id"))
        .select(col("doc_id"), TA.fingerprint(col("text"), 5).as("fingerprint"))
        .orderBy("doc_id")),

    // N-gram Jaccard near-dup via inverted shingle index, blocked by
    // lang — shuffles Σ|shingles| rows, never materializes the O(n²)
    // pair space (SURVEY.md scale posture).
    "q30_ngram_jaccard_pairs" -> ((s, d) =>
      // r15: fan-out A/B'd and rejected (1.13× — the inverted-index
      // joins dominate, not the shingle map; see OPTIMIZATION_r15.md)
      Dedup.jaccardPairs(T.documents(s, d), "doc_id", "text",
          blockCols = Seq("lang"), shingleN = 3, threshold = 0.03)
        .orderBy("doc_a", "doc_b")),

    // Portable MinHash signature (SHA-based, 8 perms) — oracle-able.
    "q31_minhash_sha" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"),
          array_join(Dedup.minHashSignatureSha(col("text"), 8, 3), ",")
            .as("minhash_sig"))
        .orderBy("doc_id")),

    // MinHash+LSH banding candidates, portable tier: SHA signature,
    // verbatim-slice bucket keys → DuckDB reproduces the exact buckets
    // and agreement fractions (the native xxhash64 tier keeps its
    // bit-parity + planted-dup spec coverage in DedupSpec).
    "q32_minhash_lsh_pairs" -> ((s, d) =>
      Dedup.minhashCandidatesSha(T.documents(s, d), "doc_id", "text",
          bands = 4, rowsPerBand = 2)
        .orderBy("doc_a", "doc_b")),

    // SimHash signatures, portable tier (SHA-based 60-bit bit votes) —
    // oracle-able; the native graft_simhash64 tier stays spec-covered.
    "q33_simhash" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), Dedup.simHashSha(col("text")).as("simhash"))
        .orderBy("doc_id")),

    // ANN: exact brute-force cosine top-5 for 8 query vectors.
    "q34_ann_cosine_topk" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.topKBruteForce(
          emb.filter(col("vec_id") < 8), emb, "vec_id", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine_r"))
        .orderBy("query_id", "rank")
    }),

    // ANN scale path #2: IVF (k-means inverted file, FAISS-style) —
    // rows-only (clustering is engine-local by construction).
    "q44_ann_ivf_topk" -> ((s, d) => {
      // r15: fan-out A/B'd and rejected (1.85× — bounded-state
      // aggregate's per-task fixed cost outweighs the map parallelism)
      val emb = T.embeddings(s, d)
      Similarity.topKIvf(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .orderBy("query_id", "rank")
    }),

    // ANN scale path: hyperplane-LSH bucketed top-k — rows-only
    // (seeded-random planes are engine-local by construction).
    "q35_ann_lsh_topk" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.topKLsh(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "vec_id", "embedding", k = 5, bands = 4, bitsPerBand = 8)
        .orderBy("query_id", "rank")
    }),

    // Embedding near-dup pairs, exact cosine, blocked by label — the
    // brute-force verify tier, now through Dedup.embeddingPairsExact:
    // quadratic-in-block by definition, so the operator carries a
    // fail-fast block-size guard (oversized blocks must route through
    // the embeddingNearDup LSH tier instead of silently exploding).
    "q42_embedding_pairs" -> ((s, d) =>
      Dedup.embeddingPairsExact(T.embeddings(s, d), "vec_id", "embedding",
          "label")
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine_r"))
        .filter(col("cosine_r") >= 0.35)
        .orderBy("id_a", "id_b")),

    // Composite analytical query (TPC-H Q3 shape): join + agg + top-k —
    // the optimizer-led capability §2.7 claims (broadcast dim, partial
    // aggregation, WindowGroupLimit).
    "q43_revenue_topk" -> ((s, d) => {
      val cust = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = T.orders(s, d)
      val li = T.lineitem(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        // exact decimal sum; DOUBLE final representation (hash-portable)
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2))))
          .cast(DecimalType(18, 4)).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("revenue"))
    }),

    // As-of (point-in-time) join: each event picks the customer's
    // latest order at-or-before the event — composed from built-ins
    // (union + window), one shuffle. Oracle: DuckDB's native ASOF JOIN.
    "q45_asof_join" -> ((s, d) => {
      val ev = T.events(s, d)
      val left = ev.select(col("event_id"), col("user_id").as("custkey"),
        T.tsMillis(ev, "ts").as("t_ms"))
      val right = T.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"),
          // o_orderdate is TIMESTAMP_NTZ; cast is identity under UTC session
          unix_millis(col("o_orderdate").cast(TimestampType)).as("od_ms"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.ops.relational.asofJoin(left, right, Seq("custkey"), "t_ms", "od_ms")
        .select("event_id", "custkey", "o_orderkey", "order_date")
        .orderBy("event_id")
    }),

    // Multimodal plumbing: binary payload + typed metadata struct.
    "q36_multimodal_meta" -> ((s, d) =>
      Multimodal.binaryFromText(T.documents(s, d), "text", "doc_id")
        .select(col("doc_id"),
          col("meta.size_bytes").as("size_bytes"),
          col("meta.content_hash").as("content_hash"),
          col("meta.mime").as("mime"))
        .orderBy("doc_id")),

    // Gap-based sessionization (30-min gap) — the window-function batch
    // twin of the streaming flatMapGroupsWithState operator.
    "q41_sessionize" -> ((s, d) => {
      val ev = T.events(s, d)
      graft.streaming.Streaming.sessionizeBatch(
          ev.select(col("user_id"), T.tsMillis(ev, "ts").as("ts_ms")),
          "user_id", "ts_ms", 30 * 60 * 1000L)
        .orderBy("user_id", "session_seq")
    }),

    // Time-series rollup on the stream-shaped table (batch counterpart
    // of the streaming windowed aggregation in graft.streaming).
    "q37_hourly_rollup" -> ((s, d) => {
      // r15: fan-out A/B'd and rejected (1.76× — agg map too cheap)
      val ev = T.events(s, d)
      ev.select(
          date_format(timestamp_millis(T.tsMillis(ev, "ts")), "yyyy-MM-dd HH")
            .as("hour"),
          col("user_id"), col("value"))
        .groupBy("hour")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
            .cast(DoubleType).as("sum_value"))
        .orderBy("hour")
    }),

    // [EXT] deterministic train/val/test split — salted-hash bucket,
    // stable under reruns/repartitioning (rand() is not), portable.
    "q51_split_assign" -> ((s, d) =>
      TrainingOps.splitAssign(T.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
        .orderBy("doc_id")),

    // [EXT] token-budget packing, sharded by lang — two-phase
    // distributed prefix sum (range partitions + broadcast offsets);
    // a hot shard spans many tasks instead of serializing through one.
    "q52_token_packing" -> ((s, d) =>
      TrainingOps.packByTokenBudget(T.documents(s, d), "lang", "doc_id",
          graft.llm.TextAnalysis.tokenCountWs(col("text")).cast(LongType),
          budget = 512)
        .select("doc_id", "lang", "pack_id")
        .orderBy("doc_id")),

    // [EXT] SpaceSaving heavy-hitters aggregate (native
    // TypedImperativeAggregate): top event types per user bucket.
    // Capacity (32) exceeds the distinct event-type count, so the
    // sketch is provably EXACT here and the flat-count oracle applies;
    // the same plan at 100 TB carries ≤32 entries per group per
    // partition instead of a full (group, item) count table.
    "q57_heavy_hitters" -> ((s, d) =>
      T.events(s, d)
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(graft.llm.Sketches.heavyHitters(col("event_type"), 32).as("hh"))
        .select(col("bucket"), explode(col("hh")).as("h"))
        .select(col("bucket"), col("h.item").as("item"),
          col("h.cnt").as("cnt"), col("h.err").as("err"))
        .orderBy(col("bucket"), col("cnt").desc, col("item"))),

    // [EXT] benchmark decontamination: n-gram containment of a probe
    // set (every 97th doc as the stand-in benchmark) in each corpus
    // doc; probe shingle index broadcast, corpus never shuffles.
    "q53_decontam" -> ((s, d) => {
      // r15: the corpus-side shingle pass ran in the single scan task —
      // fan out the corpus side only (the probe side stays broadcast)
      val docs = graft.ops.Par.fanOut(
        T.documents(s, d).select("doc_id", "text"), col("doc_id"))
      TrainingOps.decontaminate(docs, docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "doc_id", "text", shingleN = 3, threshold = 0.5)
        .orderBy("corpus_id", "probe_id")
    })
  )

  /** DuckDB oracles for the engine-independent subset. */
  val oracleSql: Map[String, String] = Map(
    "q57_heavy_hitters" ->
      """SELECT user_id % 10 AS bucket, event_type AS item,
        |       count(*) AS cnt, CAST(0 AS BIGINT) AS err
        |FROM events GROUP BY 1, 2
        |ORDER BY bucket, cnt DESC, item""".stripMargin,
    "q51_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN b < 8000 THEN 'train'
        |       WHEN b < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':graft'), 1, 15))::BIGINT
        |          % 10000 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q52_token_packing" ->
      """SELECT doc_id, lang,
        |  CAST(floor((sum(toks) OVER (PARTITION BY lang ORDER BY doc_id)
        |              - toks) / 512) AS BIGINT) AS pack_id
        |FROM (SELECT doc_id, lang,
        |        len(regexp_split_to_array(trim(text), '\s+')) AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q53_decontam" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |      i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM documents),
        |p AS (SELECT doc_id AS probe_id, sh AS psh, len(sh) AS probe_sz
        |      FROM sh WHERE doc_id % 97 = 0)
        |SELECT c.doc_id AS corpus_id, p.probe_id,
        |       CAST(len(list_intersect(c.sh, p.psh)) AS DOUBLE) / p.probe_sz
        |         AS containment
        |FROM sh c CROSS JOIN p
        |WHERE CAST(len(list_intersect(c.sh, p.psh)) AS DOUBLE) / p.probe_sz >= 0.5
        |ORDER BY corpus_id, probe_id""".stripMargin,
    "q25_dedup_exact_hash" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_dupes
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin,
    "q26_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
        |    AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q27_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(w) AS INT) AS n_words,
        |  CAST(length(text) AS DOUBLE) / len(w) AS avg_word_len,
        |  CAST(len(list_filter(w, x -> x = 'the' OR x = 'a')) AS DOUBLE)
        |    / len(w) AS stop_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |    / length(text) AS punct_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "q28_lang_stopwords" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST(len(list_filter(w, x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
        |    / len(w) AS en_stop_ratio,
        |  (CAST(len(list_filter(w, x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
        |    / len(w)) > 0.05 AS is_en_like
        |FROM t ORDER BY doc_id""".stripMargin,
    "q29_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents)
        |SELECT doc_id,
        |  list_min(list_transform(
        |    generate_series(1, greatest(len(w) - 4, 1)),
        |    i -> sha256(array_to_string(w[i:i+4], ' ')))) AS fingerprint
        |FROM t ORDER BY doc_id""".stripMargin,
    "q30_ngram_jaccard_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(
        |           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |           i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        |FROM t a JOIN t b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.03
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q31_minhash_sha" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |      i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_transform(generate_series(0, 7),
        |    j -> list_min(list_transform(sh,
        |      s -> sha256(s || '|' || CAST(j AS VARCHAR))))), ',') AS minhash_sig
        |FROM t ORDER BY doc_id""".stripMargin,
    "q32_minhash_lsh_pairs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |      i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 7),
        |      j -> list_min(list_transform(sh,
        |        s -> sha256(s || '|' || CAST(j AS VARCHAR))))) AS sig
        |  FROM t),
        |banded AS (
        |  SELECT doc_id, sig, b.band AS band,
        |         array_to_string(sig[b.band*2+1 : b.band*2+2], '|') AS bucket
        |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b)
        |SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |  list_sum(list_transform(generate_series(1, 8),
        |    i -> CASE WHEN a.sig[i] = c.sig[i] THEN 1.0 ELSE 0.0 END)) / 8
        |    AS est_jaccard
        |FROM banded a
        |JOIN banded c ON a.band = c.band AND a.bucket = c.bucket
        |             AND a.doc_id < c.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q33_simhash" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      t -> ('0x' || substr(sha256(t), 1, 15))::BIGINT) AS hs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 59),
        |    i -> CASE WHEN list_sum(list_transform(hs,
        |           h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |         THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM h ORDER BY doc_id""".stripMargin,
    "q34_ann_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |         list_cosine_similarity(qv, cv) AS cosine
        |  FROM q CROSS JOIN c),
        |r AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |  FROM s)
        |SELECT query_id, rank, neighbor_id, round(cosine, 4) AS cosine_r
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q45_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id AS custkey, epoch_ms(ts) AS t_ms
        |  FROM events),
        |o AS (
        |  SELECT o_custkey AS custkey, epoch_ms(o_orderdate) AS od_ms,
        |         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |         max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT e.event_id, e.custkey, o.o_orderkey, o.order_date
        |FROM e ASOF LEFT JOIN o
        |  ON e.custkey = o.custkey AND e.t_ms >= o.od_ms
        |ORDER BY event_id""".stripMargin,
    "q42_embedding_pairs" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.v, b.v), 4) AS cosine_r
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    "q43_revenue_topk" ->
      """SELECT l_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(1.0 - l_discount AS DECIMAL(18,2)))
        |            AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q36_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
        |       sha256(text) AS content_hash,
        |       'text/plain' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |f AS (
        |  SELECT user_id, ts_ms,
        |    CASE WHEN ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
        |              > 1800000 THEN 1
        |         WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
        |              IS NULL THEN 1
        |         ELSE 0 END AS new_session
        |  FROM t),
        |s AS (
        |  SELECT user_id, ts_ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM f)
        |SELECT user_id, session_seq,
        |       min(ts_ms) AS session_start_ms,
        |       max(ts_ms) AS session_end_ms,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q37_hourly_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin
  )
}
