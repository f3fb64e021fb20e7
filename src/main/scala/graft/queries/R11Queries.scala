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
         |FROM g ORDER BY lang""".stripMargin)
}
