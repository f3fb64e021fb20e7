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
    "q218_mmr_rerank" -> mmrOracle)
}
