package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q114+: round-7 additions.
  *
  * Every query ends in a total ORDER BY.
  */
object R7Queries {
  private val T = Tables

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] incremental admission through the PRECOMPUTED signature
    // store (q103's semantics, the store entry point): the corpus's
    // hash set + LSH band index are built once (buildSignatureStore)
    // and the batch probes them — the shape a nightly job runs so the
    // immutable 100 TB corpus is never re-signatured per run. Batch =
    // every 7th doc, half verbatim (exact dups), half one appended
    // token (near dups). Oracle replays the content-hash membership
    // and the SHA banding cross-join, like q103.
    "q114_admit_store" -> ((s, d) => {
      val corpus = T.documents(s, d)
      val newb = corpus.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          when(pmod(col("doc_id"), lit(14)) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" nearly"))).as("text"))
      val store = graft.llm.Dedup.buildSignatureStore(corpus, "doc_id",
        "text")
      store.admit(newb, "doc_id", "text").orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q114_admit_store" ->
      """WITH newb AS (
        |  SELECT doc_id + 2000000 AS id,
        |    CASE WHEN doc_id % 14 = 0 THEN text
        |         ELSE text || ' nearly' END AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |ch AS (SELECT DISTINCT sha256(trim(text)) AS h FROM documents),
        |ex AS (SELECT id,
        |         sha256(trim(text)) IN (SELECT h FROM ch) AS exact_dup
        |       FROM newb),
        |tn AS (
        |  SELECT id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |      i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM newb),
        |tc AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |      i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' '))) AS sh
        |  FROM documents),
        |sn AS (
        |  SELECT id,
        |    list_transform(generate_series(0, 7),
        |      j -> list_min(list_transform(sh,
        |        s -> sha256(s || '|' || CAST(j AS VARCHAR))))) AS sig
        |  FROM tn),
        |sc AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 7),
        |      j -> list_min(list_transform(sh,
        |        s -> sha256(s || '|' || CAST(j AS VARCHAR))))) AS sig
        |  FROM tc),
        |bn AS (
        |  SELECT id, b.band AS band,
        |         array_to_string(sig[b.band*2+1 : b.band*2+2], '|') AS bucket
        |  FROM sn CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
        |bc AS (
        |  SELECT doc_id, b.band AS band,
        |         array_to_string(sig[b.band*2+1 : b.band*2+2], '|') AS bucket
        |  FROM sc CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
        |near AS (
        |  SELECT bn.id, count(DISTINCT bc.doc_id) AS near_candidates
        |  FROM bn JOIN bc ON bn.band = bc.band AND bn.bucket = bc.bucket
        |  GROUP BY bn.id)
        |SELECT e.id AS doc_id, e.exact_dup,
        |  CAST(coalesce(n.near_candidates, 0) AS BIGINT) AS near_candidates
        |FROM ex e LEFT JOIN near n ON e.id = n.id
        |ORDER BY doc_id""".stripMargin
  )
}
