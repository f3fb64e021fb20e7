package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** Round-14 additions: the composed SCRUB chain — NightlyLoop v4's
  * release-time cleaning stage (PII redaction → paragraph-granularity
  * exact dedup) proven end-to-end as one oracle-replayed query, the
  * way q231 composed the release chain. Conventions as everywhere:
  * total ORDER BY, identical aliases on both engines, floats as
  * micro-unit BIGINTs. */
object R14Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // [EXT] COMPOSED release-time SCRUB (q232 → q233 in one chain —
    // exactly NightlyLoop v4's scrub stage): plant BOTH structures in
    // one document (a per-SOURCE cookie banner and a per-LANG license
    // footer around the body, q233's fixture; an email + IPv4 + phone
    // appended to the body, q232's fixture), then (1) redact PII with
    // typed placeholders and per-type counts, (2) paragraph-dedup the
    // REDACTED text corpus-wide (first occurrence wins: lowest doc
    // id, then position). Order matters and the chain pins it: the
    // dedup runs on redacted text, so two documents whose bodies
    // differed only by PII would collapse AFTER redaction — and the
    // banner/footer boilerplate never reaches a released pack twice.
    // Scale shape: redaction is map-only (three count + three replace
    // regexes per row); the dedup is the q233 keys-only plan (winner
    // election on 32-byte hashes, document text crosses the wire once
    // in the by-id join back, rebuilt in place). The oracle replays
    // the full composition: the exact redaction sequence (each count
    // on the PREVIOUS pattern's output), the paragraph split, the
    // first-occurrence window, and the ordered reassembly.
    "q238_scrub_chain" -> ((s, d) => {
      val id = col("doc_id")
      val text2 = concat(
        lit("Shared cookie banner for "), col("source"), lit("\n\n"),
        col("text"),
        lit(" contact user"), id.cast("string"),
        lit("@mail"), pmod(id, lit(7)).cast("string"),
        lit(".example from 10."), pmod(id, lit(200)).cast("string"),
        lit(".4."), pmod(id, lit(250)).cast("string"),
        lit(" call +1 555-01"),
        lpad(pmod(id, lit(100)).cast("string"), 2, "0"),
        lit("\n\nLicense footer "), col("lang"))
      // r15: both chain stages' map work (six regex passes, paragraph
      // split+hash+rebuild) ran in the single scan task — fan out once
      // at the chain head (guide §2.5); both stages inherit it
      val pii = graft.llm.TextAnalysis.piiRedact(
        graft.ops.Par.fanOut(
            T.documents(s, d).select(id, col("source"), col("lang"),
              col("text")), id)
          .select(id, text2.as("text2")),
        "doc_id", "text2")
      val para = graft.llm.Dedup.paragraphDedup(
        pii.select(id, col("redacted")), "doc_id", "redacted")
      pii.select(id, col("n_emails"), col("n_ipv4"), col("n_phones"))
        .join(para, Seq("doc_id"))
        .select(id, col("n_emails"), col("n_ipv4"), col("n_phones"),
          col("n_paras"), col("n_kept"),
          col("dedup_text").as("scrub_text"))
        .orderBy("doc_id")
    }))

  val oracleSql: Map[String, String] = Map(

    // the q232 redaction CTE chain feeding the q233 paragraph logic,
    // composed exactly as the engine runs them: counts ride the
    // redaction sequence (emails on raw, IPv4 on email-redacted,
    // phones on both-redacted); the dedup splits the FULLY redacted
    // text, first occurrence wins over (doc_id, idx), documents
    // reassemble in original paragraph order
    "q238_scrub_chain" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    'Shared cookie banner for ' || source || chr(10) || chr(10) ||
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example from 10.' || CAST(doc_id % 200 AS VARCHAR) ||
        |    '.4.' || CAST(doc_id % 250 AS VARCHAR) ||
        |    ' call +1 555-01' ||
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |    chr(10) || chr(10) || 'License footer ' || lang AS text2
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, text2,
        |    regexp_replace(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g') AS ne
        |  FROM t),
        |r2 AS (
        |  SELECT doc_id, text2, ne,
        |    regexp_replace(ne,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '<IP>', 'g') AS ni
        |  FROM r),
        |r3 AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(ne,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |      AS BIGINT) AS n_ipv4,
        |    CAST(len(regexp_extract_all(ni,
        |      '\+[0-9]{1,2} [0-9]{3}-[0-9]{4,10}')) AS BIGINT)
        |      AS n_phones,
        |    regexp_replace(ni, '\+[0-9]{1,2} [0-9]{3}-[0-9]{4,10}',
        |      '<PHONE>', 'g') AS red
        |  FROM r2),
        |sp AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(parts)),
        |      i -> struct_pack(idx := i, para := trim(parts[i])))) AS s
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(red, '\n\n') AS parts
        |        FROM r3)),
        |p AS (SELECT doc_id, s.idx AS idx, s.para AS para FROM sp
        |      WHERE s.para <> ''),
        |k AS (SELECT doc_id, idx, para,
        |        row_number() OVER (PARTITION BY para
        |          ORDER BY doc_id, idx) AS rn
        |      FROM p),
        |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(para, chr(10) || chr(10) ORDER BY idx)
        |            AS scrub_text
        |        FROM k WHERE rn = 1 GROUP BY doc_id),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras
        |        FROM p GROUP BY doc_id)
        |SELECT r3.doc_id, r3.n_emails, r3.n_ipv4, r3.n_phones,
        |  coalesce(cnt.n_paras, 0) AS n_paras,
        |  coalesce(reb.n_kept, 0) AS n_kept,
        |  coalesce(reb.scrub_text, '') AS scrub_text
        |FROM r3
        |LEFT JOIN cnt USING (doc_id) LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin)
}
