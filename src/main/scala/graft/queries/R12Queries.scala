package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** q216+: round-12 wave — SemDeDup-style semantic deduplication and
  * DPO preference-pair assembly. Conventions as everywhere: every
  * query ends in a total ORDER BY, every aggregate/computed column is
  * aliased identically in the Spark plan and the DuckDB oracle,
  * real-valued signals ride as micro-unit BIGINTs. */
object R12Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // [EXT] SEMANTIC dedup (SemDeDup, Abbas et al. 2023): coarse-
    // quantize the embedding corpus into cells, exact pairwise cosine
    // ONLY within cells, drop rows with a higher-cosine-than-τ
    // duplicate of smaller id. Near-dups are PLANTED in-plan (every
    // vec_id % 7 == 0 gains a 1.0009-scaled copy at id+1000000 —
    // cosine ≈ 1 by construction, exact-double arithmetic both
    // engines replay), τ = 0.999 sits between the plant (≈ 1) and
    // the corpus's natural cosine ceiling (≈ 0.44 at this data), so
    // every verdict has a ≥ 0.55 margin — double noise between
    // engines is ~1e-15. The oracle replays cells (the q214 CTE),
    // in-cell pairs, cosines, and the keep rule.
    "q216_semantic_dedup" -> ((s, d) => {
      val emb = T.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double"))
          .as("embedding"))
      val planted = emb.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.0009))
            .as("embedding"))
      graft.llm.Dedup.semanticDedup(emb.unionByName(planted),
          "vec_id", "embedding", dim = 64, nsub = 8, nlist = 8,
          tauMicro = 999000L, salt = "216")
        .orderBy("vec_id")
    }),

    // [EXT] MMR diversified re-ranking (Carbonell & Goldstein
    // 1998): per query (label group), greedily pick 5 candidates
    // maximizing 0.7·rel − 0.3·maxSim(c, picked) — the rerank stage
    // after retrieval, as ONE grouped bounded-state aggregate.
    // Relevance is a sha-derived micro score (any oracle-replayable
    // scorer slots in); sims are floor(cos·10⁶) over the nested
    // nsub×dsub dot, so the oracle replays EVERY greedy round
    // (5 unrolled argmax rounds over the in-group sim matrix).
    "q218_mmr_rerank" -> ((s, d) => {
      val cand = T.embeddings(s, d).select(col("label").as("q"),
        col("vec_id"),
        expr("cast(conv(substr(sha2(concat('mmr:', " +
          "cast(vec_id as string)), 256), 1, 13), 16, 10) as bigint)" +
          " % 1000000").as("rel_micro"),
        col("embedding"))
      graft.llm.Similarity.mmrRerank(cand, "q", "vec_id",
          "embedding", "rel_micro", dim = 64, nsub = 8, k = 5,
          lambdaMicro = 700000L, maxCandidates = 2000)
        .orderBy("query_id", "rank")
    }),

    // [EXT] DPO preference-pair assembly (Rafailov et al. 2023): per
    // prompt, chosen = highest-scored candidate, rejected = lowest,
    // emitted only past a strict margin — ONE bounded aggregate (two
    // min_by picks per prompt), no window, no self-join. Prompts are
    // synthesized by doc_id arithmetic; the score is the q181
    // alphabetic-ratio micro signal (any oracle-replayable scorer
    // slots in).
    "q217_dpo_pairs" -> ((s, d) => {
      val cand = T.documents(s, d).select(
        (col("doc_id") % 40).as("prompt"), col("doc_id"),
        expr("(CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) " +
          "AS BIGINT) * 1000000) div greatest(length(text), 1)")
          .as("score_micro"))
      graft.llm.Selection.dpoPairs(cand, "prompt", "doc_id",
          "score_micro", minMarginMicro = 1000L)
        .orderBy("prompt_id")
    }),

    // [EXT] skew-salted join (relational.saltedJoin): a planted hot
    // key — 70% of lineitem lands on k=0 — joined against a 50-row
    // derived dimension through the salted path (salts=8, the hot
    // key's rows spread over 8 reducers). Results are identical to
    // the plain join BY CONTRACT; the oracle runs the plain join.
    // Integer keys and per-row-cast quantities keep every aggregate
    // exact (l_quantity is an integral double in this data).
    "q219_salted_join" -> ((s, d) => {
      val fact = T.lineitem(s, d).select(
        when(col("l_orderkey") % 10 < 7, lit(0L))
          .otherwise(pmod(col("l_suppkey"), lit(50L))).as("k"),
        col("l_quantity").cast("long").as("qty"))
      val dim = s.range(50).select(col("id").as("k"),
        pmod(col("id"), lit(7L)).as("tier"))
      graft.ops.relational.saltedJoin(fact, dim, Seq("k"), salts = 8)
        .groupBy("k", "tier")
        .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"))
        .orderBy("k")
    }),

    // [EXT] Bloom-prefiltered join (relational.bloomPreJoin): the
    // explicit cross-stage runtime filter — a ~20%-selective orders
    // dimension's keys become a Bloom filter probed INSIDE the
    // lineitem scan (codegen'd BloomContainsLong), then the exact
    // join drops the false positives, so the result equals the plain
    // join and the oracle runs the plain join. Revenue rides as
    // floor-cents (floor is the same function in both engines; a
    // round() would pit HALF_UP against banker's).
    "q220_bloom_prejoin" -> ((s, d) => {
      val fact = T.lineitem(s, d).select(col("l_orderkey"),
        floor(col("l_extendedprice") * lit(100)).as("rev_cents"))
      val dim = T.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.ops.relational
        .bloomPreJoin(fact, dim, "l_orderkey", "o_orderkey", fpp = 0.01)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("rev_cents")).as("rev_cents_sum"))
        .orderBy("month")
    }),

    // [EXT] per-node triangle counts (Crawl.triangleCounts, degree-
    // ordered orientation): the link-farm density signal over a
    // planted doc graph i→7i, i→49i (mod N) — every i closes the
    // triangle {i, 7i, 49i} since 49i = 7·(7i), so the count surface
    // is dense and varied. Exact integer counts; the oracle replays
    // canonicalization, degrees, orientation, wedge join, and the
    // closing-edge join.
    "q221_triangles" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      val withN = docs.join(broadcast(n))
      val e = withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7, col("n")).as("dst"))
        .union(withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 49, col("n")).as("dst")))
      graft.llm.Crawl.triangleCounts(e).orderBy("node")
    }),

    // [EXT] reciprocal rank fusion (Search.rrfFuse; Cormack et al.
    // 2009): fuse the BM25 lexical top-50 (q104's ranker) with the
    // dense cosine top-50 for query vector 0 (q34's ranker) — the
    // canonical lexical+dense hybrid retrieval stage. Both input
    // ranks are engine-exact (micropoint BM25 scores; double cosine
    // with id tiebreaks), and the fused score is floor-divided
    // micro-units summed as longs, so the fusion is bit-identical.
    "q222_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // rank window over ≤ 50 rows — bounded by the PARAMETER k,
      // not the corpus (the q60/q65 small-window convention)
      // r15: fan-out A/B'd and rejected (1.25× — the bounded top-k
      // heap aggregate dominates, not the tokenize map)
      val lex = graft.llm.Search
        .bm25Search(T.documents(s, d), "doc_id", "text",
          terms = Seq("spark", "join", "window"), k = 50)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).as("rank"))
      val emb = T.embeddings(s, d)
      val den = graft.llm.Similarity
        .topKBruteForce(emb.filter(col("vec_id") === 0), emb,
          "vec_id", "vec_id", "embedding", 50)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.llm.Search.rrfFuse(Seq(lex, den), "doc_id", "rank",
          kRrf = 60, k = 20)
        .orderBy(col("rrf_micro").desc, col("doc_id"))
    }),

    // [EXT] SFT loss-mask spans (TrainingOps.sftLossSpans): exact
    // [start, end) codepoint offsets of every assistant turn's
    // content+<|end|> inside the q208-rendered conversation — the
    // mask the trainer applies so loss lands only on replies. Same
    // event-derived conversations as q208; the oracle replays the
    // (ts, event_id) turn sort, per-turn piece lengths, and a
    // cumulative-offset window.
    "q223_sft_spans" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(col("user_id"),
        T.tsMillis(ev, "ts").as("ts_ms"), col("event_id"),
        when(col("event_type").isin("click", "view"), lit("user"))
          .when(col("event_type") === "error", lit("system"))
          .otherwise(lit("assistant")).as("role"),
        col("props").as("content"))
      graft.llm.TrainingOps.sftLossSpans(base, "user_id", "ts_ms",
          "event_id", "role", "content")
        .orderBy("conv_id", "span_idx")
    }),

    // [EXT] group-relative advantages (Selection.grpoAdvantages,
    // GRPO — Shao et al. 2024): per prompt group, reward − groupMean
    // (engine-exact integer floor, see the operator's proof) and the
    // z-normalized form over one exact-integer variance numerator +
    // one IEEE sqrt. Same prompt/scorer derivation as q217, so the
    // DPO pair and the GRPO advantage tiers are directly comparable.
    "q224_grpo_advantage" -> ((s, d) => {
      val cand = T.documents(s, d).select(
        (col("doc_id") % 40).as("prompt"), col("doc_id"),
        expr("(CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) " +
          "AS BIGINT) * 1000000) div greatest(length(text), 1)")
          .as("score_micro"))
      graft.llm.Selection.grpoAdvantages(cand, "prompt", "doc_id",
          "score_micro")
        .orderBy("prompt_id", "cand_id")
    }),

    // [EXT] anchor-text aggregation (Crawl.anchorTexts): what the
    // web calls each URL — per-target mention counts, distinct
    // normalized anchor texts, and the dominant text (ties → lex
    // smallest). Planted: 20 shared hub targets each anchored by a
    // constant "read more" and a per-source variant (the constant
    // dominates), per-doc external targets with messy whitespace,
    // plus single-quoted and relative anchors that must NOT match
    // the double-quoted-absolute contract.
    "q225_anchor_text" -> ((s, d) => {
      val id = col("doc_id")
      val html = concat(
        lit("<p><a href=\"https://hub.example.org/t"),
        pmod(id, lit(20)).cast("string"),
        lit("\">read more</a>"),
        lit("<a href=\"https://hub.example.org/t"),
        pmod(id, lit(20)).cast("string"),
        lit("\">"), col("source"), lit(" page</a>"),
        when(pmod(id, lit(3)) === 0,
          concat(lit("<a href=\"https://ext.example.net/p"),
            id.cast("string"),
            lit("\">  spaced   anchor </a>")))
          .otherwise(
            lit("<a href='https://q.example.org/x'>sq dropped</a>")),
        lit("<a href=\"/rel\">relative dropped</a>"))
      graft.llm.Crawl.anchorTexts(
          T.documents(s, d).select(id, html.as("html")), "html")
        .orderBy("url")
    }),

    // [EXT] leakage-safe train/val/test split (Lee et al. 2022's
    // train/test-leak finding, closed by construction): near-dup
    // clusters (the q69 pair shape → connected components) each land
    // WHOLLY in one split — the salted-SHA verdict hashes the CLUSTER
    // id, not the doc id, so no held-out document can have a
    // train-side near-dup. Docs in no pair are their own singleton
    // clusters. The oracle replays the pairs, the recursive closure,
    // the singleton fallback, and the q51 bucket rule.
    "q226_cluster_split" -> ((s, d) =>
      graft.llm.Dedup.leakageSafeSplit(
          T.documents(s, d), "doc_id",
          graft.llm.Dedup.jaccardPairs(T.documents(s, d), "doc_id",
            "text", blockCols = Seq("lang"), shingleN = 3,
            threshold = 0.03),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")),

    // [EXT] per-site boilerplate prefix via the sorted-extremes LCP
    // identity: LCP(all texts in a group) = LCP(min, max) — one
    // (min, max, count) aggregate replaces every pairwise compare,
    // then a groups-sized O(len) early-stop scan. The shared chrome
    // is planted in-plan (template sites open with identical nav),
    // so the detected prefix is non-trivial and both engines replay
    // it exactly.
    "q227_boilerplate_lcp" -> ((s, d) =>
      graft.llm.TextAnalysis.groupBoilerplate(
          T.documents(s, d).select(col("source"),
            concat(lit("NAV "), col("source"),
              lit(" | Home | About | "), col("text")).as("text2")),
          "source", "text2")
        .orderBy("source")),

    // [EXT] serpentine (snake-draft) balanced sharding: rows dealt
    // across 8 shards in boustrophedon order of descending token
    // cost — the sorted-greedy LPT approximation with NO sequential
    // state (shard = rank arithmetic over globalRank's range-parallel
    // rank). The oracle replays the rank and the parity deal.
    "q228_snake_shards" -> ((s, d) =>
      graft.llm.TrainingOps.snakeShards(
          T.documents(s, d), "doc_id",
          graft.llm.TextAnalysis.tokenCountWs(col("text")),
          nShards = 8)
        .orderBy("doc_id")),

    // [EXT] per-group quantile normalization (the CCNet per-language
    // threshold move, generalized): each doc's within-LANG percentile
    // indexes a 1001-point GLOBAL quantile grid, so one threshold on
    // norm_score prunes every language at the same rate. Integer
    // floor division end-to-end — the oracle replays ranks, the grid,
    // and both index computations exactly.
    "q229_quantile_norm" -> ((s, d) =>
      graft.llm.Selection.quantileNormalize(
          T.documents(s, d), "doc_id", "lang", "n_chars",
          nQuantiles = 1000)
        .orderBy("doc_id")),

    // [EXT] k-core peeling (Seidman 1983): the crawl-graph density
    // tier next to q221's triangles. The planted graph is per-group
    // (each 6 consecutive ids = one triangle + a 3-edge tail), so
    // the peel depth is EXACTLY 3 rounds at every corpus size —
    // tail nodes fall in waves, triangles survive k=2. The oracle
    // unrolls all three rounds (degrees → low set → filtered edges →
    // node-set diff) and replays the isolated-node rule verbatim.
    "q230_kcore" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      val withN = docs.join(broadcast(n))
      val m6 = pmod(col("doc_id"), lit(6))
      val raw = withN.filter(m6.isin(0, 2, 3, 4))
          .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"),
            col("n"))
        .unionByName(withN.filter(m6 === 0)
          .select(col("doc_id").as("a"), (col("doc_id") + 2).as("b"),
            col("n")))
        .unionByName(withN.filter(m6 === 0)
          .select((col("doc_id") + 1).as("a"),
            (col("doc_id") + 2).as("b"), col("n")))
      graft.llm.Crawl.kCore(
          raw.filter(col("b") < col("n")).select("a", "b"),
          k = 2, srcCol = "a", dstCol = "b", maxIter = 10)
        .orderBy("node")
    }))

  /** q216's oracle: plant → hash-rank cells → nested nsub×dsub
    * squared-L2 cell assignment (the q214 CTE shape) → in-cell pairs
    * → cosine → keep rule. */
  private val semanticDedupOracle: String =
    """WITH e0 AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |pl AS (
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_transform(v, x -> x * 1.0009) AS v
      |  FROM e0 WHERE vec_id % 7 = 0),
      |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM pl),
      |r AS (SELECT vec_id, v,
      |        ('0x' || substr(sha256('ivf:216:' ||
      |          CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS rk
      |      FROM e),
      |cells AS (SELECT v AS cv, row_number() OVER (ORDER BY rk, vec_id)
      |            - 1 AS cell
      |          FROM r ORDER BY rk, vec_id LIMIT 8),
      |cd AS (
      |  SELECT e.vec_id, c.cell,
      |    list_sum(list_transform(generate_series(0, 7), s ->
      |      list_sum(list_transform(generate_series(1, 8), j ->
      |        (e.v[s * 8 + j] - c.cv[s * 8 + j])
      |          * (e.v[s * 8 + j] - c.cv[s * 8 + j]))))) AS dd
      |  FROM e, cells c),
      |asn AS (SELECT vec_id, cell FROM (
      |          SELECT vec_id, cell, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY dd, cell) AS rn
      |          FROM cd)
      |        WHERE rn = 1),
      |av AS (SELECT a.vec_id, a.cell, e.v,
      |         sqrt(list_sum(list_transform(generate_series(1, 64),
      |           j -> e.v[j] * e.v[j]))) AS nv
      |       FROM asn a JOIN e ON e.vec_id = a.vec_id),
      |dup AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM av a JOIN av b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE floor(list_sum(list_transform(generate_series(1, 64),
      |          j -> a.v[j] * b.v[j])) / (a.nv * b.nv) * 1000000.0)
      |        >= 999000)
      |SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
      |  (d.vec_id IS NULL) AS kept
      |FROM asn a LEFT JOIN dup d ON d.vec_id = a.vec_id
      |ORDER BY a.vec_id""".stripMargin

  /** q217's oracle: the two picks as rank windows (a window is fine
    * HERE — DuckDB is the spec, not the scale path; the Spark plan
    * is the bounded two-min_by aggregate). */
  private val dpoPairsOracle: String =
    """WITH c AS (
      |  SELECT doc_id % 40 AS prompt, doc_id,
      |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |        AS BIGINT) * 1000000
      |      // greatest(length(text), 1) AS score_micro
      |  FROM documents),
      |ch AS (SELECT prompt, doc_id, score_micro FROM (
      |         SELECT prompt, doc_id, score_micro, row_number() OVER
      |           (PARTITION BY prompt
      |            ORDER BY score_micro DESC, doc_id) AS rn
      |         FROM c) WHERE rn = 1),
      |rj AS (SELECT prompt, doc_id, score_micro FROM (
      |         SELECT prompt, doc_id, score_micro, row_number() OVER
      |           (PARTITION BY prompt
      |            ORDER BY score_micro ASC, doc_id) AS rn
      |         FROM c) WHERE rn = 1),
      |n AS (SELECT prompt, CAST(count(*) AS BIGINT) AS n_candidates
      |      FROM c GROUP BY prompt)
      |SELECT ch.prompt AS prompt_id, ch.doc_id AS chosen_id,
      |  rj.doc_id AS rejected_id,
      |  ch.score_micro - rj.score_micro AS margin_micro,
      |  n.n_candidates
      |FROM ch JOIN rj ON rj.prompt = ch.prompt
      |  JOIN n ON n.prompt = ch.prompt
      |WHERE n.n_candidates >= 2
      |  AND ch.score_micro - rj.score_micro >= 1000
      |ORDER BY prompt_id""".stripMargin

  /** q218's oracle: the 5 greedy MMR rounds unrolled — per round,
    * the argmax of 0.7·rel − 0.3·(max sim to everything selected so
    * far) over the not-yet-selected, ties to the lower id; sims and
    * norms use the nested 8×8 sequential sums the Spark aggregate
    * mirrors, so every pick and score is bit-identical. */
  private val mmrOracle: String = """
WITH e AS (
  SELECT label AS q, vec_id AS id,
    ('0x' || substr(sha256('mmr:' || CAST(vec_id AS VARCHAR)),
      1, 13))::BIGINT % 1000000 AS rel,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
n AS (
  SELECT q, id, rel, v,
    sqrt(list_sum(list_transform(generate_series(0, 7), s ->
      list_sum(list_transform(generate_series(1, 8), j ->
        v[s * 8 + j] * v[s * 8 + j]))))) AS nv
  FROM e),
s AS (
  SELECT a.q, a.id AS ia, b.id AS ib,
    CAST(floor(list_sum(list_transform(generate_series(0, 7), s ->
        list_sum(list_transform(generate_series(1, 8), j ->
          a.v[s * 8 + j] * b.v[s * 8 + j]))))
      / (a.nv * b.nv) * 1000000.0) AS BIGINT) AS sim
  FROM n a JOIN n b ON a.q = b.q AND a.id <> b.id),
r1 AS (SELECT q, id, CAST(700000 * rel AS BIGINT) AS score FROM (
    SELECT q, id, rel, row_number() OVER (PARTITION BY q
      ORDER BY rel DESC, id) AS rn
    FROM n) WHERE rn = 1),
sel1 AS (SELECT q, id FROM r1),
m2 AS (
  SELECT n.q, n.id, n.rel, max(s.sim) AS ms
  FROM n
  JOIN sel1 sl ON sl.q = n.q
  JOIN s ON s.q = n.q AND s.ia = n.id AND s.ib = sl.id
  WHERE NOT EXISTS (SELECT 1 FROM sel1 x
                    WHERE x.q = n.q AND x.id = n.id)
  GROUP BY n.q, n.id, n.rel),
r2 AS (SELECT q, id, score FROM (
  SELECT q, id, 700000*rel - 300000*ms AS score,
    row_number() OVER (PARTITION BY q
      ORDER BY 700000*rel - 300000*ms DESC, id) AS rn
  FROM m2) WHERE rn = 1),
sel2 AS (SELECT q, id FROM r1 UNION ALL SELECT q, id FROM r2),
m3 AS (
  SELECT n.q, n.id, n.rel, max(s.sim) AS ms
  FROM n
  JOIN sel2 sl ON sl.q = n.q
  JOIN s ON s.q = n.q AND s.ia = n.id AND s.ib = sl.id
  WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                    WHERE x.q = n.q AND x.id = n.id)
  GROUP BY n.q, n.id, n.rel),
r3 AS (SELECT q, id, score FROM (
  SELECT q, id, 700000*rel - 300000*ms AS score,
    row_number() OVER (PARTITION BY q
      ORDER BY 700000*rel - 300000*ms DESC, id) AS rn
  FROM m3) WHERE rn = 1),
sel3 AS (SELECT q, id FROM r1 UNION ALL SELECT q, id FROM r2 UNION ALL SELECT q, id FROM r3),
m4 AS (
  SELECT n.q, n.id, n.rel, max(s.sim) AS ms
  FROM n
  JOIN sel3 sl ON sl.q = n.q
  JOIN s ON s.q = n.q AND s.ia = n.id AND s.ib = sl.id
  WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                    WHERE x.q = n.q AND x.id = n.id)
  GROUP BY n.q, n.id, n.rel),
r4 AS (SELECT q, id, score FROM (
  SELECT q, id, 700000*rel - 300000*ms AS score,
    row_number() OVER (PARTITION BY q
      ORDER BY 700000*rel - 300000*ms DESC, id) AS rn
  FROM m4) WHERE rn = 1),
sel4 AS (SELECT q, id FROM r1 UNION ALL SELECT q, id FROM r2 UNION ALL SELECT q, id FROM r3 UNION ALL SELECT q, id FROM r4),
m5 AS (
  SELECT n.q, n.id, n.rel, max(s.sim) AS ms
  FROM n
  JOIN sel4 sl ON sl.q = n.q
  JOIN s ON s.q = n.q AND s.ia = n.id AND s.ib = sl.id
  WHERE NOT EXISTS (SELECT 1 FROM sel4 x
                    WHERE x.q = n.q AND x.id = n.id)
  GROUP BY n.q, n.id, n.rel),
r5 AS (SELECT q, id, score FROM (
  SELECT q, id, 700000*rel - 300000*ms AS score,
    row_number() OVER (PARTITION BY q
      ORDER BY 700000*rel - 300000*ms DESC, id) AS rn
  FROM m5) WHERE rn = 1)
SELECT query_id, CAST(rank AS INT) AS rank, cand_id, mmr_micro
FROM (
  SELECT q AS query_id, rank, id AS cand_id,
    CAST(score AS BIGINT) AS mmr_micro
  FROM (SELECT q, 1 AS rank, id, score FROM r1 UNION ALL SELECT q, 2 AS rank, id, score FROM r2 UNION ALL SELECT q, 3 AS rank, id, score FROM r3 UNION ALL SELECT q, 4 AS rank, id, score FROM r4 UNION ALL SELECT q, 5 AS rank, id, score FROM r5))
ORDER BY query_id, rank"""

  val oracleSql: Map[String, String] = Map(
    "q216_semantic_dedup" -> semanticDedupOracle,
    "q217_dpo_pairs" -> dpoPairsOracle,
    "q218_mmr_rerank" -> mmrOracle,

    // the oracle is the PLAIN join — saltedJoin's contract is
    // result-identity with it; only the partitioning differs
    "q219_salted_join" ->
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN CAST(0 AS BIGINT)
        |              ELSE l_suppkey % 50 END AS k,
        |         CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |d AS (SELECT CAST(i AS BIGINT) AS k, CAST(i % 7 AS BIGINT) AS tier
        |      FROM generate_series(0, 49) t(i))
        |SELECT f.k, d.tier, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(f.qty) AS BIGINT) AS sum_qty
        |FROM f JOIN d USING (k) GROUP BY 1, 2 ORDER BY k""".stripMargin,

    // the oracle is the PLAIN filtered join — the Bloom prefilter
    // admits false positives only, and the exact join removes them
    "q220_bloom_prejoin" ->
      """WITH f AS (
        |  SELECT l_orderkey,
        |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS rev_cents
        |  FROM lineitem),
        |o AS (SELECT o_orderkey, o_orderdate FROM orders
        |      WHERE o_orderpriority = '1-URGENT')
        |SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(f.rev_cents) AS BIGINT) AS rev_cents_sum
        |FROM f JOIN o ON f.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY month""".stripMargin,

    // replays canonicalization → degrees → (deg, id) orientation →
    // wedge join → closing-edge join → per-node counts, exactly the
    // Crawl.triangleCounts plan
    "q221_triangles" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |raw AS (SELECT doc_id AS s, (doc_id * 7) % n AS t
        |        FROM documents, nn
        |        UNION ALL
        |        SELECT doc_id AS s, (doc_id * 49) % n AS t
        |        FROM documents, nn),
        |und AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        |        FROM raw WHERE s <> t),
        |deg AS (SELECT node, count(*) AS d FROM
        |          (SELECT a AS node FROM und
        |           UNION ALL SELECT b AS node FROM und)
        |        GROUP BY 1),
        |o AS (SELECT
        |        CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |             THEN u.a ELSE u.b END AS u,
        |        CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |             THEN u.b ELSE u.a END AS v,
        |        CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
        |             THEN db.d ELSE da.d END AS dv
        |      FROM und u JOIN deg da ON da.node = u.a
        |                 JOIN deg db ON db.node = u.b),
        |w AS (SELECT e1.u, e1.v AS x, e2.v AS y
        |      FROM o e1 JOIN o e2 ON e1.u = e2.u
        |      WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)),
        |tri AS (SELECT w.u AS a, w.x AS b, w.y AS c
        |        FROM w JOIN o ON o.u = w.x AND o.v = w.y),
        |cnt AS (SELECT node, count(*) AS tri FROM
        |          (SELECT a AS node FROM tri
        |           UNION ALL SELECT b AS node FROM tri
        |           UNION ALL SELECT c AS node FROM tri) GROUP BY 1)
        |SELECT nd.node, CAST(coalesce(cnt.tri, 0) AS BIGINT) AS tri
        |FROM (SELECT node FROM deg) nd LEFT JOIN cnt USING (node)
        |ORDER BY node""".stripMargin,

    // lexical CTE chain = q104's BM25 (rank <= 50 instead of LIMIT
    // 20); dense CTE = q34's cosine ranker for query vector 0; the
    // fusion floor-divides micro contributions and sums exact longs
    "q222_rrf_fusion" ->
      """WITH stats AS (
        |  SELECT count(*) AS n_docs,
        |    sum(len(regexp_split_to_array(trim(text), '\s+'))) AS sum_dl
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS dl,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
        |      WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2, 3),
        |dd AS (SELECT doc_id, dl, term, tf,
        |         count(*) OVER (PARTITION BY term) AS df_t FROM f),
        |lexs AS (SELECT doc_id,
        |  CAST(sum(CAST(round(1e6 *
        |    ln(1e0 + (n_docs - df_t + 5e-1) / (df_t + 5e-1)) *
        |    (tf * (1.2e0 + 1e0)) /
        |    (tf + 1.2e0 * ((1e0 - 7.5e-1) +
        |      7.5e-1 * dl * n_docs / sum_dl))) AS BIGINT)) AS BIGINT)
        |    AS score
        |  FROM dd, stats GROUP BY doc_id),
        |lex AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM lexs) WHERE rank <= 50),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id = 0),
        |den AS (SELECT doc_id, rank FROM (
        |  SELECT c.vec_id AS doc_id,
        |    row_number() OVER (ORDER BY
        |      list_cosine_similarity(qv, CAST(c.embedding AS DOUBLE[]))
        |        DESC, c.vec_id) AS rank
        |  FROM embeddings c, q) WHERE rank <= 50),
        |u AS (SELECT doc_id, 1000000 // (60 + rank) AS c FROM lex
        |      UNION ALL
        |      SELECT doc_id, 1000000 // (60 + rank) AS c FROM den)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
        |       CAST(count(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,

    // replays the q208 turn sort, per-turn piece lengths
    // (len(role)+len(content)+11 for <|role|>content<|end|>), a
    // cumulative-offset window, and the assistant filter
    "q223_sft_spans" ->
      """WITH base AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |  CASE WHEN event_type IN ('click', 'view') THEN 'user'
        |       WHEN event_type = 'error' THEN 'system'
        |       ELSE 'assistant' END AS role,
        |  props AS content FROM events),
        |t AS (SELECT user_id, ts_ms, event_id, role,
        |  length(COALESCE(role, '')) AS rl,
        |  length(COALESCE(role, '')) + length(COALESCE(content, ''))
        |    + 11 AS piece_len,
        |  count(*) OVER (PARTITION BY user_id) AS n_turns
        |  FROM base),
        |o AS (SELECT user_id, ts_ms, event_id, role, rl, piece_len,
        |  n_turns,
        |  COALESCE(sum(piece_len) OVER (PARTITION BY user_id
        |    ORDER BY ts_ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS off
        |  FROM t),
        |a AS (SELECT user_id AS conv_id, n_turns,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_ms, event_id) - 1 AS INT) AS span_idx,
        |  CAST(off + rl + 4 AS BIGINT) AS start_char,
        |  CAST(off + piece_len AS BIGINT) AS end_char
        |  FROM o WHERE role = 'assistant')
        |SELECT conv_id, n_turns, span_idx, start_char, end_char
        |FROM a ORDER BY conv_id, span_idx""".stripMargin,

    // replays the group stats (n, Σr, Σr² exact), the exact-integer
    // advantage numerator n·r − Σr, floor(num/n), and
    // floor(1000·num/sqrt(n·Σr² − (Σr)²)) — see grpoAdvantages'
    // Scaladoc for why the first floor is exact and the second
    // carries only the q89-class sqrt measure-zero exposure
    "q224_grpo_advantage" ->
      """WITH c AS (
        |  SELECT doc_id % 40 AS prompt_id, doc_id AS cand_id,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |        AS BIGINT) * 1000000
        |      // greatest(length(text), 1) AS score_micro
        |  FROM documents),
        |s AS (SELECT prompt_id, count(*) AS n,
        |        sum(score_micro) AS sum_r,
        |        sum(CAST(score_micro AS HUGEINT) * score_micro)
        |          AS sum_r2
        |      FROM c GROUP BY 1 HAVING count(*) >= 2),
        |j AS (SELECT c.prompt_id, c.cand_id, c.score_micro, s.n,
        |        CAST(s.n * c.score_micro - s.sum_r AS BIGINT) AS num,
        |        CAST(s.n AS HUGEINT) * s.sum_r2
        |          - CAST(s.sum_r AS HUGEINT) * s.sum_r AS var_num
        |      FROM c JOIN s USING (prompt_id))
        |SELECT prompt_id, cand_id, score_micro,
        |  CAST(floor(CAST(num AS DOUBLE) / n) AS BIGINT) AS adv_micro,
        |  CASE WHEN var_num = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST(floor(1000.0 * CAST(num AS DOUBLE)
        |              / sqrt(CAST(var_num AS DOUBLE))) AS BIGINT)
        |  END AS z_milli
        |FROM j ORDER BY prompt_id, cand_id""".stripMargin,

    // replays the planted HTML, the double-quoted-absolute anchor
    // regex (positional unnest zips href and text from the SAME
    // pattern), whitespace normalization, and the (count desc, text)
    // dominant pick
    "q225_anchor_text" ->
      """WITH h AS (SELECT doc_id,
        |  '<p><a href="https://hub.example.org/t'
        |    || CAST(doc_id % 20 AS VARCHAR) || '">read more</a>'
        |    || '<a href="https://hub.example.org/t'
        |    || CAST(doc_id % 20 AS VARCHAR) || '">' || source
        |    || ' page</a>'
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN '<a href="https://ext.example.net/p'
        |           || CAST(doc_id AS VARCHAR)
        |           || '">  spaced   anchor </a>'
        |         ELSE '<a href=''https://q.example.org/x''>sq dropped</a>'
        |       END
        |    || '<a href="/rel">relative dropped</a>' AS html
        |  FROM documents),
        |p AS (SELECT
        |  unnest(regexp_extract_all(html,
        |    '<a href="(https?://[^"]+)">([^<]*)</a>', 1)) AS url,
        |  unnest(regexp_extract_all(html,
        |    '<a href="(https?://[^"]+)">([^<]*)</a>', 2)) AS t
        |  FROM h),
        |a AS (SELECT url,
        |        trim(regexp_replace(t, '\s+', ' ', 'g')) AS anchor
        |      FROM p),
        |g AS (SELECT url, anchor, count(*) AS c FROM a GROUP BY 1, 2),
        |r AS (SELECT url, anchor, c, row_number() OVER (
        |        PARTITION BY url ORDER BY c DESC, anchor) AS rn
        |      FROM g)
        |SELECT g.url AS url, CAST(sum(g.c) AS BIGINT) AS n_refs,
        |       CAST(count(*) AS BIGINT) AS n_anchors,
        |       min(w.anchor) AS top_anchor
        |FROM g JOIN (SELECT url AS wurl, anchor FROM r WHERE rn = 1) w
        |  ON g.url = w.wurl
        |GROUP BY g.url ORDER BY url""".stripMargin,

    // the q69 closure (pairs → recursive min-label reach) + the
    // singleton fallback, then the q51 bucket rule over CLUSTER ids
    "q226_cluster_split" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(
        |           generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |           i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.03),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |reach AS (
        |  SELECT src AS id, src AS lbl FROM e
        |  UNION
        |  SELECT e.dst, reach.lbl FROM reach JOIN e ON e.src = reach.id),
        |lab AS (SELECT id AS doc_id, min(lbl) AS cl FROM reach GROUP BY id),
        |c AS (SELECT d.doc_id, coalesce(lab.cl, d.doc_id) AS cluster_id
        |      FROM documents d LEFT JOIN lab USING (doc_id))
        |SELECT doc_id, cluster_id,
        |  CASE WHEN b < 8000 THEN 'train'
        |       WHEN b < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, cluster_id,
        |        ('0x' || substr(sha256(CAST(cluster_id AS VARCHAR) || ':graft'), 1, 15))::BIGINT
        |          % 10000 AS b
        |      FROM c)
        |ORDER BY doc_id""".stripMargin,

    // sorted-extremes identity: group LCP = LCP(min, max); the
    // lateral max-i prefix probe is exact (prefix equality at i
    // implies it at every j < i)
    "q227_boilerplate_lcp" ->
      """WITH t AS (
        |  SELECT source,
        |    'NAV ' || source || ' | Home | About | ' || text AS text2
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        min(text2) AS lo, max(text2) AS hi
        |      FROM t GROUP BY 1),
        |l AS (SELECT source, n_docs, lo,
        |        CAST(coalesce(list_max(list_filter(
        |          generate_series(1, least(length(lo), length(hi))),
        |          i -> substr(lo, 1, CAST(i AS INT)) =
        |               substr(hi, 1, CAST(i AS INT)))), 0) AS BIGINT)
        |          AS lcp_len
        |      FROM g)
        |SELECT source, n_docs, lcp_len,
        |  substr(lo, 1, CAST(lcp_len AS INT)) AS boilerplate
        |FROM l ORDER BY source""".stripMargin,

    "q228_snake_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS cost
        |  FROM documents),
        |r AS (SELECT doc_id, cost,
        |        row_number() OVER (ORDER BY cost DESC, doc_id) - 1 AS pos
        |      FROM t)
        |SELECT doc_id, cost,
        |  CAST(CASE WHEN (pos // 8) % 2 = 0 THEN pos % 8
        |       ELSE 7 - (pos % 8) END AS INT) AS shard
        |FROM r ORDER BY doc_id""".stripMargin,

    // within-lang rank → integer pr_micro → global 1001-point grid
    // lookup; integer floor division throughout
    "q229_quantile_norm" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS grp, CAST(n_chars AS BIGINT) AS score
        |  FROM documents),
        |w AS (SELECT doc_id, grp, score,
        |        row_number() OVER (PARTITION BY grp
        |          ORDER BY score, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY grp) AS n
        |      FROM t),
        |p AS (SELECT doc_id, grp, score,
        |        CASE WHEN n = 1 THEN 0
        |             ELSE ((rn - 1) * 1000000) // (n - 1) END AS pr_micro
        |      FROM w),
        |g AS (SELECT score,
        |        row_number() OVER (ORDER BY score, doc_id) AS rg
        |      FROM t),
        |nn AS (SELECT count(*) AS ng FROM t),
        |grid AS (SELECT k, (k * (ng - 1)) // 1000 AS idx
        |         FROM generate_series(0, 1000) s(k), nn),
        |gq AS (SELECT grid.k, g.score AS norm_score
        |       FROM grid JOIN g ON g.rg - 1 = grid.idx)
        |SELECT p.doc_id, p.grp AS lang, p.score,
        |  CAST(p.pr_micro AS BIGINT) AS pr_micro, gq.norm_score
        |FROM p JOIN gq ON gq.k = (p.pr_micro * 1000) // 1000000
        |ORDER BY p.doc_id""".stripMargin,

    // three peel rounds unrolled: degrees -> low set -> filtered
    // edges -> node-set diff per round; the left join assigns each
    // node the round it left the live graph
    "q230_kcore" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |raw AS (
        |  SELECT doc_id AS a, doc_id + 1 AS b FROM documents
        |  WHERE doc_id % 6 IN (0, 2, 3, 4)
        |  UNION ALL
        |  SELECT doc_id, doc_id + 2 FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id + 1, doc_id + 2 FROM documents WHERE doc_id % 6 = 0),
        |e0 AS (SELECT a, b FROM raw, nn WHERE b < n),
        |n0 AS (SELECT DISTINCT node FROM
        |        (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) t),
        |l0 AS (SELECT node FROM
        |        (SELECT node, count(*) AS d FROM
        |          (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) t
        |         GROUP BY 1) g WHERE d < 2),
        |e1 AS (SELECT a, b FROM e0
        |       WHERE a NOT IN (SELECT node FROM l0)
        |         AND b NOT IN (SELECT node FROM l0)),
        |n1 AS (SELECT DISTINCT node FROM
        |        (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) t),
        |l1 AS (SELECT node FROM
        |        (SELECT node, count(*) AS d FROM
        |          (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) t
        |         GROUP BY 1) g WHERE d < 2),
        |e2 AS (SELECT a, b FROM e1
        |       WHERE a NOT IN (SELECT node FROM l1)
        |         AND b NOT IN (SELECT node FROM l1)),
        |n2 AS (SELECT DISTINCT node FROM
        |        (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) t),
        |l2 AS (SELECT node FROM
        |        (SELECT node, count(*) AS d FROM
        |          (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) t
        |         GROUP BY 1) g WHERE d < 2),
        |e3 AS (SELECT a, b FROM e2
        |       WHERE a NOT IN (SELECT node FROM l2)
        |         AND b NOT IN (SELECT node FROM l2)),
        |n3 AS (SELECT DISTINCT node FROM
        |        (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3) t),
        |drops AS (
        |  SELECT node, 0 AS r FROM
        |    (SELECT node FROM n0 EXCEPT SELECT node FROM n1) t
        |  UNION ALL
        |  SELECT node, 1 FROM
        |    (SELECT node FROM n1 EXCEPT SELECT node FROM n2) t
        |  UNION ALL
        |  SELECT node, 2 FROM
        |    (SELECT node FROM n2 EXCEPT SELECT node FROM n3) t)
        |SELECT n0.node, CAST(d.r AS INT) AS peel_round,
        |  d.r IS NULL AS in_core
        |FROM n0 LEFT JOIN drops d USING (node)
        |ORDER BY n0.node""".stripMargin)
}
