package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Sketches

/** q82+: round-4 additions.
  *
  * Scale-tier promotions: the bounded-state KMV sketch (q82) is the
  * TypedImperativeAggregate tier of q60's relational oracle spec —
  * same hash space, same estimator, oracle-verified against the same
  * relational SQL, but the shuffle carries k-long sketches instead of
  * the distinct-hash set.
  *
  * Every query is DuckDB-oracle-backed and ends in a total ORDER BY.
  */
object R4Queries {
  private val T = Tables

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] KMV distinct, bounded-state tier: per-group state is k
    // longs through partial/merge/final — the 100 TB form of q60. The
    // oracle computes the same k-minimum-values relationally, so this
    // is a full value check of the sketch path, not rows-only.
    "q82_kmv_sketch" -> ((s, d) =>
      Sketches.kmvDistinctSketch(
          T.events(s, d), Seq("event_type"), "user_id", k = 64)
        .select("event_type", "n_kept", "kmv_est")
        .orderBy("event_type")),

    // [EXT] n-step funnel via relational.funnel (EXISTS-chain
    // semantics): view → click → purchase, each step within 24 h of
    // the matched previous event. One id equi join per step, per-step
    // distinct keeps the intermediate bounded by per-user in-window
    // event counts.
    "q83_funnel_3step" -> ((s, d) => {
      val ev = T.events(s, d)
      val ms = graft.Tables.tsMillis(ev, "ts")
      val base = ev.select(col("user_id"), col("event_type"), ms.as("ms"))
      graft.ops.relational.funnel(base, "user_id", "event_type", "ms",
          Seq("view", "click", "purchase"), Seq(86400000L, 86400000L))
        .orderBy("user_id", "start_ms")
    }),

    // [EXT] media-header differential test: Spark BUILDS a GIF header
    // per part row (dims derived from the key) and PARSES it back with
    // the native graft_media_header expression; the oracle computes
    // the expected (format, width, height) analytically — a full
    // value-check of the expression path with zero binary handling in
    // the oracle.
    "q84_media_header" -> ((s, d) => {
      def byte(x: org.apache.spark.sql.Column) =
        lpad(hex(x.cast("long")), 2, "0")
      val w = pmod(col("p_partkey"), lit(300)) + 1
      val h = pmod(col("p_partkey"), lit(200)) + 1
      // "GIF89a" + u16le width + u16le height + 2 pad bytes (kernel
      // requires ≥10 bytes before it recognizes any container)
      val payload = unhex(concat(lit("474946383961"),
        byte(pmod(w, lit(256))), byte((w / 256).cast("int")),
        byte(pmod(h, lit(256))), byte((h / 256).cast("int")),
        lit("0000")))
      graft.llm.Multimodal.parseMediaHeaders(
          T.part(s, d).select(col("p_partkey").as("pk"), payload.as("payload")),
          "pk", "payload")
        .select(col("id"), col("format"), col("width"), col("height"))
        .orderBy("id")
    }),

    // [EXT] decontamination, beyond-broadcast tier: Bloom pre-filter
    // (probe shingles, built distributed) + shuffle join. Same values
    // as q53's broadcast tier — same oracle SQL — different wire
    // shape for the regime where the probe index can't broadcast.
    "q85_decontam_bloom" -> ((s, d) => {
      // r15: fan-out A/B'd and rejected (1.07× — unlike q53's broadcast
      // tier, the Bloom build + shuffle join dominates, not the map)
      val docs = T.documents(s, d)
      graft.llm.TrainingOps.decontaminateBloom(docs,
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "doc_id", "text", shingleN = 3, threshold = 0.5)
        .orderBy("corpus_id", "probe_id")
    }),

    // [EXT] HTML stripping (web-scrape cleaning): deterministic HTML
    // wrapper built around each doc, then tag-strip + entity-unescape
    // + whitespace-collapse — RE2-compatible patterns, same pass order
    // in the oracle.
    "q86_html_strip" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), graft.llm.TextAnalysis.stripHtml(
          concat(lit("<div class=\"doc\"><p>"), col("text"),
            lit("</p>&amp; footer &lt;tag&gt;</div>"))).as("clean"))
        .orderBy("doc_id")),

    // [EXT] Unicode NFC normalization via the native graft_nfc
    // expression; decomposed "e"+U+0301 composes to "é" in both
    // engines (DuckDB: nfc_normalize).
    "q87_nfc_normalize" -> ((s, d) =>
      T.part(s, d)
        .select(col("p_partkey"), graft.llm.TextAnalysis.nfc(
          concat(col("p_name"), lit(" café"))).as("norm"))
        .orderBy("p_partkey")),

    // [EXT] int8 embedding quantization: symmetric per-vector scale in
    // exact micro-units, one row per element — the 4× storage cut of
    // an embedding store; map-only until the final deterministic sort.
    "q88_embedding_quantize" -> ((s, d) =>
      graft.llm.Embeddings.quantizeInt8(
          T.embeddings(s, d).filter(col("vec_id") < 256),
          "vec_id", "embedding")
        .orderBy("vec_id", "idx")),

    // [EXT] unigram log-prob quality score (perplexity-lite filter):
    // top-V vocab via TakeOrdered + broadcast, OOV add-half floor,
    // exact micropoint sums (order-independent ⇒ hash-stable).
    "q89_unigram_logprob" -> ((s, d) =>
      graft.llm.TextAnalysis.unigramLogProb(
          T.documents(s, d), "doc_id", "text", vocabSize = 1000)
        .orderBy("doc_id")),

    // [EXT] deterministic stratified sample: 5 users per event type as
    // the k smallest salted-SHA hashes, via the bounded-state
    // graft_ksample aggregate (the relational rank-window form is the
    // oracle — it would buffer a hot stratum in one task at scale).
    "q90_group_sample" -> ((s, d) =>
      graft.llm.TrainingOps.sampleKPerGroup(
          T.events(s, d), Seq("event_type"), "user_id", k = 5)
        .orderBy("event_type", "rank")))

  val oracleSql: Map[String, String] = Map(
    "q82_kmv_sketch" ->
      """WITH dist AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h,
        |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |      FROM dist),
        |a AS (SELECT event_type, count(*) AS exact_distinct,
        |        max(CASE WHEN rn <= 64 THEN h END) AS kth,
        |        count(*) FILTER (WHERE rn <= 64) AS n_kept
        |      FROM r GROUP BY 1)
        |SELECT event_type, n_kept,
        |  CASE WHEN exact_distinct < 64 THEN CAST(exact_distinct AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END
        |    AS kmv_est
        |FROM a ORDER BY event_type""".stripMargin,
    "q83_funnel_3step" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |v AS (SELECT DISTINCT user_id, ms AS start_ms, ms AS cur
        |      FROM e WHERE event_type = 'view'),
        |c AS (SELECT DISTINCT v.user_id, v.start_ms, n.ms AS cur
        |      FROM v JOIN e n ON n.user_id = v.user_id
        |       AND n.event_type = 'click'
        |       AND n.ms > v.cur AND n.ms <= v.cur + 86400000),
        |p AS (SELECT DISTINCT c.user_id, c.start_ms, n.ms AS cur
        |      FROM c JOIN e n ON n.user_id = c.user_id
        |       AND n.event_type = 'purchase'
        |       AND n.ms > c.cur AND n.ms <= c.cur + 86400000)
        |SELECT user_id, start_ms, min(cur) AS end_ms
        |FROM p GROUP BY 1, 2 ORDER BY user_id, start_ms""".stripMargin,
    "q84_media_header" ->
      """SELECT p_partkey AS id, 'gif' AS format,
        |  CAST(p_partkey % 300 + 1 AS INT) AS width,
        |  CAST(p_partkey % 200 + 1 AS INT) AS height
        |FROM part ORDER BY id""".stripMargin,
    // identical semantics to q53 — the tiers must agree exactly
    "q85_decontam_bloom" ->
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
    "q86_html_strip" ->
      """SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(
        |    regexp_replace('<div class="doc"><p>' || text
        |        || '</p>&amp; footer &lt;tag&gt;</div>',
        |      '<[^>]+>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q87_nfc_normalize" ->
      """SELECT p_partkey,
        |  nfc_normalize(p_name || ' cafe' || chr(769)) AS norm
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q88_embedding_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 256),
        |s AS (SELECT vec_id, v,
        |        CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
        |             THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
        |             ELSE 0.0 END AS scale
        |      FROM v),
        |e AS (SELECT vec_id, scale,
        |        unnest(list_transform(v, x -> round(x * scale))) AS q,
        |        unnest(generate_series(0, len(v) - 1)) AS idx
        |      FROM s)
        |SELECT vec_id, CAST(idx AS INT) AS idx,
        |       CAST(least(127, greatest(-127, q)) AS INT) AS qval,
        |       CAST(round(scale * 1e6) AS BIGINT) AS scale_micro
        |FROM e ORDER BY vec_id, idx""".stripMargin,
    "q89_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |v AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 1000),
        |m AS (SELECT tok.doc_id,
        |        coalesce(
        |          CAST(round(ln(CAST(v.cnt AS DOUBLE) / total) * 1e6) AS BIGINT),
        |          CAST(round(ln(0.5 / total) * 1e6) AS BIGINT)) AS micro
        |      FROM tok LEFT JOIN v USING (term) CROSS JOIN t)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(micro) AS BIGINT) AS sum_logprob_micro,
        |       round(sum(micro) / 1e6 / count(*), 4) AS avg_logprob
        |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // Collision caveat: on a 60-bit hash collision between DISTINCT
    // ids, the graft_ksample aggregate keeps one id per hash (min
    // payload) while this rank-window oracle keeps both within rank k
    // — so the specs agree only in the collision-free regime
    // (birthday-expected past ~2^30 distinct ids per group; the test
    // corpora are far below). Documented rather than papered over.
    "q90_group_sample" ->
      """WITH d AS (
        |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS uid
        |  FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT event_type, uid,
        |        ('0x' || substr(sha256('smpl' || uid), 1, 15))::BIGINT AS h
        |      FROM d),
        |r AS (SELECT event_type, uid,
        |        row_number() OVER (PARTITION BY event_type ORDER BY h, uid) AS rn
        |      FROM h)
        |SELECT event_type, CAST(rn AS INT) AS rank, uid AS user_id
        |FROM r WHERE rn <= 5 ORDER BY event_type, rank""".stripMargin)
}
