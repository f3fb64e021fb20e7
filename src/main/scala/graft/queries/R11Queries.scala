package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** q184+: round-10 continuation wave — fixed-state sketches
  * (HyperLogLog cardinality, Count-Min frequency) and product-
  * quantization embedding compression with ADC search. Conventions as
  * everywhere: every query ends in a total ORDER BY, every aggregate/
  * computed column is aliased identically in the Spark plan and the
  * DuckDB oracle, floats ride as micro-unit BIGINTs. */
object R11Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // [EXT] HyperLogLog distinct-count sketch: per-language distinct
    // word cardinality over the documents corpus through the NATIVE
    // bounded-state tier (graft.expressions.HllSketchAgg — 64 bytes of
    // state per group at p=6, never growing with the distinct count;
    // the 100 TB cardinality answer). The DuckDB oracle replays the
    // registers relationally from the shared SHA-derived 60-bit hash
    // space, so the sketch — registers, harmonic denominator, and the
    // exact-integer-division estimate — is value-verified end-to-end,
    // not just rows-counted. SketchesSpec additionally parity-tests
    // this tier against the relational hllDistinct spec tier.
    "q184_hll_distinct" -> ((s, d) => {
      val words = T.documents(s, d).select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      graft.llm.Sketches.hllDistinctSketch(words, Seq("lang"), "word", p = 6)
        .orderBy("lang")
    }),

    // [EXT] Count-Min point-frequency estimation: per-user event
    // counts answered from ONE d×w counter matrix (d=4, w=64 — 2 KiB
    // of state however many users exist) instead of a corpus-wide
    // per-key groupBy. w is deliberately smaller than the user
    // cardinality so the one-sided error regime is exercised: the
    // oracle replays every counter from the shared salted SHA hash
    // space and the `overcount` column shows est ≥ exact row by row.
    // The probe set is chosen AFTER the scan — the property a top-k
    // sketch can't give.
    "q185_cms_freq" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"))
      val probes = ev.filter(col("user_id") % 13 === 0).distinct()
      val est = graft.llm.Sketches.cmsFrequencies(
        ev, "user_id", probes, "user_id", d = 4, w = 64)
      val exact = ev.filter(col("user_id") % 13 === 0)
        .groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("user_id"))
        .select(col("user_id"), col("cms_est"), col("exact_cnt"),
          (col("cms_est") - col("exact_cnt")).as("overcount"))
        .orderBy("user_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q184_hll_distinct" ->
      s"""WITH w AS (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+'))
         |    AS word
         |  FROM documents),
         |h AS (SELECT lang,
         |        ('0x' || substr(sha256(word), 1, 15))::BIGINT AS h
         |      FROM w WHERE word IS NOT NULL),
         |r AS (SELECT lang, CAST(h % 64 AS INT) AS reg,
         |        CAST(55 - CASE WHEN h // 64 = 0 THEN 0
         |          ELSE length(format('{:b}', h // 64)) END AS INT) AS rho
         |      FROM h),
         |mx AS (SELECT lang, reg, max(rho) AS rmax FROM r
         |       GROUP BY lang, reg),
         |g AS (SELECT lang, CAST(64 - count(*) AS INT) AS n_zero,
         |        CAST(sum(CAST(1 AS BIGINT) << (55 - rmax))
         |          + (64 - count(*)) * (CAST(1 AS BIGINT) << 55)
         |          AS BIGINT) AS denom_scaled
         |      FROM mx GROUP BY lang)
         |SELECT lang, n_zero, denom_scaled,
         |  CAST(CAST('${graft.llm.Sketches.hllNumerator(6)}' AS HUGEINT)
         |    // denom_scaled AS BIGINT) AS hll_est_micro
         |FROM g ORDER BY lang""".stripMargin,

    "q185_cms_freq" ->
      """WITH v AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |probes AS (SELECT DISTINCT user_id FROM v WHERE user_id % 13 = 0),
        |hrows AS (SELECT unnest(generate_series(0, 3)) AS i),
        |cnt AS (
        |  SELECT i,
        |    ('0x' || substr(sha256('cms' || CAST(i AS VARCHAR) || ':'
        |      || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket,
        |    count(*) AS c
        |  FROM v, hrows GROUP BY 1, 2),
        |est AS (
        |  SELECT p.user_id, min(c.c) AS cms_est
        |  FROM probes p
        |  JOIN hrows r ON TRUE
        |  JOIN cnt c ON c.i = r.i AND c.bucket =
        |    ('0x' || substr(sha256('cms' || CAST(r.i AS VARCHAR) || ':'
        |      || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT % 64
        |  GROUP BY 1),
        |ex AS (SELECT user_id, count(*) AS exact_cnt FROM v
        |       WHERE user_id % 13 = 0 GROUP BY 1)
        |SELECT p.user_id AS user_id, CAST(e.cms_est AS BIGINT) AS cms_est,
        |  CAST(x.exact_cnt AS BIGINT) AS exact_cnt,
        |  CAST(e.cms_est - x.exact_cnt AS BIGINT) AS overcount
        |FROM probes p
        |JOIN est e ON e.user_id = p.user_id
        |JOIN ex x ON x.user_id = p.user_id
        |ORDER BY p.user_id""".stripMargin)
}
