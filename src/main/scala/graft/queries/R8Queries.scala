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
    "q121_bpe_train" -> ((s, d) =>
      graft.llm.TrainingOps.trainBpe(
        T.documents(s, d).select(col("text")), "text", numMerges = 6)
      .orderBy("merge_idx"))
  )

  /** One BPE oracle round: pair counts over w{k}, top-1, merge. */
  private def bpeRound(k: Int): String = {
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
         |ORDER BY merge_idx""".stripMargin
  )
}
