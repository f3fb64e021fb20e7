package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** q173+: round-9 additions — the composed crawl cycle and the
  * unigram-LM tokenizer family. Conventions as everywhere: every
  * query ends in a total ORDER BY, every aggregate/computed column
  * is aliased identically in the Spark plan and the DuckDB oracle,
  * floats ride as micro-unit BIGINTs. */
object R10Queries {

  /** Shared daemon pool for concurrent trainer-loop submission
    * (q215): four independent tokenizer families, four threads.
    * Daemon threads so a JVM exit never hangs on the pool. */
  private lazy val TrainerPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        (r: Runnable) => {
          val t = new Thread(r, "graft-trainer")
          t.setDaemon(true)
          t
        }))

  /** q174's planted corpus: six words over {a,b,c} with heavy shared
    * substring structure, three per document by doc_id arithmetic —
    * both engines rebuild the identical word-frequency table. */
  private val UniFixtures =
    Seq("ababab", "abcabc", "cabcab", "abc", "cab", "bc")

  /** q177's planted corpus: six morphologically related words, so
    * WordPiece's likelihood ranking has real prefix/suffix structure
    * ("un-", "-ness") to find; three per document by the same doc_id
    * arithmetic as [[UniFixtures]]. */
  private val WpFixtures = Seq(
    "unhappiness", "unhappy", "happiness", "happy", "unkind", "kindness")

  /** One WordPiece training round as DuckDB CTEs — [[R8Queries]]'
    * bpeRound with LIKELIHOOD ranking: symbol freqs (the score
    * denominators), pair counts, top-1 by exact integer nano-score
    * `(cnt·10⁹) // (f_l·f_r)` (HUGEINT-exact, ties cnt desc then l,
    * r — trainWordPiece's order bit for bit), then the positional
    * merge: the right side always carries `##`, the merged piece
    * inherits the left's word-initial-ness (`substr(r, 3)`). */
  private def wpRound(k: Int): String = {
    val (wIn, wOut, fq, c, t) =
      (s"wpw$k", s"wpw${k + 1}", s"wps$k", s"wpc$k", s"wpt$k")
    s"""$fq AS MATERIALIZED (
       |  SELECT s, CAST(sum(freq) AS BIGINT) AS f FROM (
       |    SELECT unnest(regexp_split_to_array(trim(sym, chr(31)),
       |      chr(31) || chr(31))) AS s, freq
       |    FROM $wIn)
       |  GROUP BY s),
       |$c AS MATERIALIZED (
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
       |$t AS MATERIALIZED (
       |  SELECT $k AS merge_idx, l, r, cnt,
       |    CAST((CAST(cnt AS HUGEINT) * 1000000000) //
       |         (CAST(fl.f AS HUGEINT) * fr.f) AS BIGINT) AS score_nano
       |  FROM $c c JOIN $fq fl ON fl.s = c.l JOIN $fq fr ON fr.s = c.r
       |  ORDER BY score_nano DESC, cnt DESC, l, r LIMIT 1),
       |$wOut AS MATERIALIZED (
       |  SELECT replace(sym,
       |    chr(31) || l || chr(31) || chr(31) || r || chr(31),
       |    chr(31) || l || substr(r, 3) || chr(31)) AS sym, freq
       |  FROM $wIn, $t)""".stripMargin
  }

  /** Shared oracle prefix for every tokenizer-family query: the
    * planted fixture array `f` and the word-frequency table `wt`
    * (three words per document by doc_id arithmetic — both engines
    * rebuild the identical corpus). */
  private def fixtureWt(fixtures: Seq[String]): String = {
    val fx = fixtures.map(w => s"'$w'").mkString(", ")
    s"""WITH f AS MATERIALIZED (SELECT [$fx] AS arr),
       |wt AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT arr[CAST(doc_id % 6 AS INT) + 1] AS w
       |    FROM documents, f
       |    UNION ALL
       |    SELECT arr[CAST((doc_id * 2 + 1) % 6 AS INT) + 1]
       |    FROM documents, f
       |    UNION ALL
       |    SELECT arr[CAST((doc_id * 3 + 2) % 6 AS INT) + 1]
       |    FROM documents, f)
       |  GROUP BY w)""".stripMargin
  }

  /** The WordPiece training chain (assumes `wt` exists): positional
    * symbol strings (first char bare, continuations `##`-marked) →
    * 6 likelihood-ranked merge rounds ending in `wpw6`. */
  private def wpChain: String =
    s"""wpw0 AS MATERIALIZED (
       |  SELECT chr(31) || array_to_string(list_transform(
       |      generate_series(1, len(w)),
       |      i -> CASE WHEN i = 1 THEN substr(w, 1, 1)
       |           ELSE '##' || substr(w, i, 1) END),
       |    chr(31) || chr(31)) || chr(31) AS sym, freq
       |  FROM wt),
       |${(0 until 6).map(wpRound).mkString(",\n")}""".stripMargin

  /** The shared q177/q178 oracle prefix. */
  private def wpCtes: String =
    fixtureWt(WpFixtures) + ",\n" + wpChain

  private def wpOracle: String =
    wpCtes + s"""
      |SELECT CAST(merge_idx AS INT) AS merge_idx, l AS "left",
      |  r AS "right", cnt, score_nano
      |FROM (${(0 until 6).map(k => s"SELECT * FROM wpt$k")
          .mkString(" UNION ALL ")})
      |ORDER BY merge_idx""".stripMargin

  /** The WordPiece greedy-serving walk (assumes `wt`/`wpw6` exist):
    * the trained vocabulary `wvocab` drives an unrolled greedy
    * longest-match walk — step k extends each word's single greedy
    * path by the longest matching piece (continuation positions
    * match `##` pieces) — ending in `gall` (every emitted path step)
    * and `gdone` (words whose path reached their end; the rest
    * collapse to '[UNK]' exactly as `graft_wordpiece_encode` does). */
  private def wpWalkCtes: String = {
    val maxLen = WpFixtures.map(_.length).max
    val steps = (1 to maxLen).map { k =>
      s"""g$k AS MATERIALIZED (
         |  SELECT w, pos + len(raw) AS pos, piece, $k AS step FROM (
         |    SELECT g.w AS w, g.pos AS pos, v.piece AS piece,
         |      v.raw AS raw,
         |      row_number() OVER (PARTITION BY g.w
         |        ORDER BY len(v.raw) DESC) AS rn
         |    FROM g${k - 1} g JOIN wvocab v
         |      ON v.cont = (g.pos > 0)
         |      AND substr(g.w, g.pos + 1, len(v.raw)) = v.raw
         |    WHERE g.pos < len(g.w))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val parts = (1 to maxLen).map(k => s"SELECT w, pos, piece, step FROM g$k")
      .mkString("\n    UNION ALL ")
    s"""wvocab AS MATERIALIZED (
       |  SELECT s AS piece,
       |    CASE WHEN s LIKE '##%' THEN substr(s, 3) ELSE s END AS raw,
       |    (s LIKE '##%') AS cont
       |  FROM (SELECT DISTINCT unnest(regexp_split_to_array(
       |      trim(sym, chr(31)), chr(31) || chr(31))) AS s FROM wpw6)),
       |g0 AS MATERIALIZED (SELECT w, 0 AS pos FROM wt),
       |$steps,
       |gall AS MATERIALIZED ($parts),
       |gdone AS MATERIALIZED (
       |  SELECT DISTINCT w FROM gall WHERE pos = len(w))""".stripMargin
  }

  /** q178's oracle: [[wpWalkCtes]]' greedy walk, then per-word
    * segmentations re-assemble into documents from their three
    * fixture words (failed words collapse to '[UNK]'). */
  private def wpEncodeOracle: String = {
    wpCtes + s""",
      |$wpWalkCtes,
      |wseg AS MATERIALIZED (
      |  SELECT wt.w,
      |    CAST(CASE WHEN d.w IS NULL THEN 1 ELSE s.np END AS INT) AS np,
      |    CASE WHEN d.w IS NULL THEN '[UNK]' ELSE s.seg END AS seg
      |  FROM wt LEFT JOIN gdone d ON d.w = wt.w
      |  LEFT JOIN (SELECT w, CAST(count(*) AS INT) AS np,
      |      string_agg(piece, ' ' ORDER BY step) AS seg
      |    FROM gall GROUP BY w) s ON s.w = wt.w),
      |docw AS MATERIALIZED (
      |  SELECT doc_id,
      |    arr[CAST(doc_id % 6 AS INT) + 1] AS w1,
      |    arr[CAST((doc_id * 2 + 1) % 6 AS INT) + 1] AS w2,
      |    arr[CAST((doc_id * 3 + 2) % 6 AS INT) + 1] AS w3
      |  FROM documents, f)
      |SELECT d.doc_id, CAST(s1.np + s2.np + s3.np AS INT) AS n_pieces,
      |  s1.seg || ' ' || s2.seg || ' ' || s3.seg AS pieces_text
      |FROM docw d JOIN wseg s1 ON s1.w = d.w1
      |  JOIN wseg s2 ON s2.w = d.w2 JOIN wseg s3 ON s3.w = d.w3
      |ORDER BY doc_id""".stripMargin
  }

  /** One Viterbi-DP round of the unigram oracle, as DuckDB CTEs:
    * segment every word of `wordsCte(w, freq)` under
    * `scoreCte(piece, s)` (max word length `maxLen`, piece length ≤
    * `maxPiece`; candidates compare by max(struct(s, l)) — higher
    * score, then longer piece, exactly `graft_unigram_segment`'s
    * order), recover the best path, and recount pieces of
    * `vocabCte(piece, …)` into `cnt$tag(piece, cnt)` plus rescored
    * `sc$tag(piece, s)` (Laplace micro-log — the trainer's
    * [[graft.llm.TrainingOps]] unigramScores). Pure string
    * generation: the unrolled recurrence IS the oracle. */
  private def uniDpRound(tag: String, scoreCte: String,
      vocabCte: String, maxLen: Int, maxPiece: Int): String = {
    val b = new StringBuilder
    b ++= s"b${tag}0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS s, 0 AS l FROM wt),\n"
    for (i <- 1 to maxLen) {
      val cands = (1 to math.min(maxPiece, i)).map { l =>
        s"""    SELECT b.w AS w, b.s + p.s AS cs, $l AS cl
           |    FROM b$tag${i - l} b JOIN $scoreCte p
           |      ON p.piece = substr(b.w, ${i - l + 1}, $l)
           |    WHERE len(b.w) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      b ++= s"""b$tag$i AS MATERIALIZED (
               |  SELECT w, m.s AS s, m.l AS l FROM (
               |    SELECT w, max(struct_pack(s := cs, l := cl)) AS m FROM (
               |$cands
               |    ) GROUP BY w)),\n""".stripMargin
    }
    b ++= s"ball$tag AS MATERIALIZED (" + (1 to maxLen).map(i =>
      s"SELECT w, $i AS pos, s, l FROM b$tag$i")
      .mkString("\n  UNION ALL ") + "),\n"
    b ++= s"p${tag}0 AS MATERIALIZED (SELECT w, freq, len(w) AS pos FROM wt),\n"
    for (k <- 1 to maxLen) {
      b ++= s"""p$tag$k AS MATERIALIZED (
               |  SELECT p.w, p.freq,
               |    substr(p.w, p.pos - ba.l + 1, ba.l) AS piece,
               |    p.pos - ba.l AS pos, $k AS step
               |  FROM p$tag${k - 1} p JOIN ball$tag ba
               |    ON ba.w = p.w AND ba.pos = p.pos
               |  WHERE p.pos > 0),\n""".stripMargin
    }
    b ++= s"used$tag AS MATERIALIZED (" + (1 to maxLen).map(k =>
      s"SELECT piece, freq FROM p$tag$k").mkString("\n  UNION ALL ") + "),\n"
    b ++= s"""cnt$tag AS MATERIALIZED (
             |  SELECT v.piece, CAST(coalesce(sum(u.freq), 0) AS BIGINT) AS cnt
             |  FROM $vocabCte v LEFT JOIN used$tag u ON u.piece = v.piece
             |  GROUP BY v.piece),
             |sc$tag AS MATERIALIZED (
             |  SELECT piece,
             |    CAST(round(ln((cnt + 1.0) / (t.tot + t.nv)) * 1e6) AS BIGINT) AS s
             |  FROM cnt$tag,
             |    (SELECT CAST(sum(cnt) AS DOUBLE) AS tot,
             |       CAST(count(*) AS DOUBLE) AS nv FROM cnt$tag) t),\n""".stripMargin
    b.toString
  }

  /** The shared q174/q175 oracle CTE chain: word table from the
    * planted fixtures → substring seed (all singles + top-8 multi) →
    * EM ×2 → prune 3 by alternative-segmentation loss → final EM.
    * Mirrors trainUnigram step for step; `fin` holds the trained
    * (piece, cnt, score_micro) model. */
  private def uniCtes(fixtures: Seq[String] = UniFixtures): String = {
    val maxLen = fixtures.map(_.length).max
    // alt-segmentation DP over the multi pieces themselves (len ≤ 3),
    // vocab = sc2 minus the piece being scored
    val altCands = (i: Int) => (1 to math.min(3, i)).map { l =>
      s"""    SELECT a.x AS x, a.s + p.s AS cs, $l AS cl
         |    FROM alt${i - l} a JOIN sc2 p
         |      ON p.piece = substr(a.x, ${i - l + 1}, $l)
         |        AND p.piece <> a.x
         |    WHERE len(a.x) >= $i""".stripMargin
    }.mkString("\n    UNION ALL\n")
    val altBlocks = (1 to 3).map { i =>
      s"""alt$i AS MATERIALIZED (
         |  SELECT x, m.s AS s FROM (
         |    SELECT x, max(struct_pack(s := cs, l := cl)) AS m FROM (
         |${altCands(i)}
         |    ) GROUP BY x)),""".stripMargin
    }.mkString("\n")
    fixtureWt(fixtures) + s""",
       |sub AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(flatten(list_transform(
       |        generate_series(1, least(3, len(w))),
       |        l -> list_transform(generate_series(1, len(w) - l + 1),
       |          st -> substr(w, st, l))))) AS piece, freq
       |    FROM wt)
       |  GROUP BY piece),
       |seed AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt,
       |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       |    FROM sub WHERE len(piece) > 1) WHERE rn <= 8),
       |sc0 AS MATERIALIZED (
       |  SELECT piece,
       |    CAST(round(ln((cnt + 1.0) / (t.tot + t.nv)) * 1e6) AS BIGINT) AS s
       |  FROM seed,
       |    (SELECT CAST(sum(cnt) AS DOUBLE) AS tot,
       |       CAST(count(*) AS DOUBLE) AS nv FROM seed) t),
       |${uniDpRound("1", "sc0", "seed", maxLen, 3)}
       |${uniDpRound("2", "sc1", "seed", maxLen, 3)}
       |alt0 AS MATERIALIZED (SELECT piece AS x, CAST(0 AS BIGINT) AS s
       |         FROM sc2 WHERE len(piece) > 1),
       |$altBlocks
       |altf AS MATERIALIZED (SELECT x, s FROM alt2 WHERE len(x) = 2
       |         UNION ALL SELECT x, s FROM alt3 WHERE len(x) = 3),
       |delta AS MATERIALIZED (
       |  SELECT c.piece, c.cnt * (a.s - sc.s) AS d
       |  FROM cnt2 c JOIN sc2 sc ON sc.piece = c.piece
       |  JOIN altf a ON a.x = c.piece
       |  WHERE len(c.piece) > 1),
       |dropp AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, row_number() OVER (ORDER BY d DESC, piece) AS rn
       |    FROM delta) WHERE rn <= 3),
       |vocab3 AS MATERIALIZED (
       |  SELECT c.piece, c.cnt FROM cnt2 c
       |  WHERE c.piece NOT IN (SELECT piece FROM dropp)),
       |sc2p AS MATERIALIZED (
       |  SELECT piece,
       |    CAST(round(ln((cnt + 1.0) / (t.tot + t.nv)) * 1e6) AS BIGINT) AS s
       |  FROM vocab3,
       |    (SELECT CAST(sum(cnt) AS DOUBLE) AS tot,
       |       CAST(count(*) AS DOUBLE) AS nv FROM vocab3) t),
       |${uniDpRound("3", "sc2p", "vocab3", maxLen, 3)}
       |fin AS MATERIALIZED (SELECT c.piece, c.cnt, s.s AS score_micro
       |        FROM cnt3 c JOIN sc3 s ON s.piece = c.piece)""".stripMargin
  }

  private def uniOracle: String =
    uniCtes() + "\nSELECT piece, cnt, score_micro FROM fin ORDER BY piece"

  /** q175's oracle: one more Viterbi round under the TRAINED scores
    * (sc3 = the published model) with ORDERED path recovery — the
    * path steps emit pieces from the word's end, so
    * `string_agg(... ORDER BY step DESC)` rebuilds reading order —
    * then each document re-assembles from its three fixture words. */
  private def uniEncodeOracle: String = {
    val maxLen = UniFixtures.map(_.length).max
    val parts = (1 to maxLen).map(k => s"SELECT w, piece, step FROM p4$k")
      .mkString("\n    UNION ALL ")
    uniCtes() + ",\n" + uniDpRound("4", "sc3", "vocab3", maxLen, 3) +
      s"""wseg AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS INT) AS np,
         |    string_agg(piece, ' ' ORDER BY step DESC) AS seg
         |  FROM ($parts) u
         |  GROUP BY w),
         |docw AS MATERIALIZED (
         |  SELECT doc_id,
         |    arr[CAST(doc_id % 6 AS INT) + 1] AS w1,
         |    arr[CAST((doc_id * 2 + 1) % 6 AS INT) + 1] AS w2,
         |    arr[CAST((doc_id * 3 + 2) % 6 AS INT) + 1] AS w3
         |  FROM documents, f)
         |SELECT d.doc_id, CAST(s1.np + s2.np + s3.np AS INT) AS n_pieces,
         |  s1.seg || ' ' || s2.seg || ' ' || s3.seg AS pieces_text
         |FROM docw d JOIN wseg s1 ON s1.w = d.w1
         |  JOIN wseg s2 ON s2.w = d.w2 JOIN wseg s3 ON s3.w = d.w3
         |ORDER BY doc_id""".stripMargin
  }

  /** One BPE oracle round over word-carrying tables ([[R8Queries]]'
    * bpeRoundW arithmetic with eval-local names): pair counts over
    * {p}{k}, top-1 by (cnt DESC, l, r) — trainBpe's order — merge.
    * Prefix-parameterized so the char chain (`bv`) and the
    * byte chain (`by`, q215) run the SAME rounds side by side. */
  private def wordRound(p: String)(k: Int): String = {
    val (wIn, wOut, c, t) = (s"$p$k", s"$p${k + 1}", s"${p}c$k", s"${p}t$k")
    s"""$c AS MATERIALIZED (
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
       |$t AS MATERIALIZED (SELECT l, r FROM $c
       |       ORDER BY cnt DESC, l, r LIMIT 1),
       |$wOut AS MATERIALIZED (SELECT w, replace(sym,
       |    chr(31) || l || chr(31) || chr(31) || r || chr(31),
       |    chr(31) || l || r || chr(31)) AS sym, freq
       |  FROM $wIn, $t)""".stripMargin
  }

  /** q215's oracle (inherited from the retired q179): ALL tokenizer
    * families trained AND served over the same [[WpFixtures]] corpus,
    * entirely relationally — the unigram chain + one serving DP round
    * (uniCtes/uniDpRound), the WordPiece chain + greedy walk
    * (wpChain/wpWalkCtes), a word-carrying char-BPE chain
    * ([[wordRound]] `bv`), and for q215 the byte-BPE chain
    * ([[wordRound]] `by` seeded from `lower(hex(encode(w)))` two-hex
    * symbols — the q212 seeding) — then per-family corpus stats from
    * word-level segmentations weighted by `wt.freq`
    * (Σ_docs Σ_{w∈doc} = Σ_w freq·per-word, the same totals the
    * Spark side aggregates per document). */
  private def tokEvalOracle(withByte: Boolean = false): String = {
    val maxLen = WpFixtures.map(_.length).max
    val uniParts = (1 to maxLen).map(k => s"SELECT w, piece FROM p4$k")
      .mkString("\n    UNION ALL ")
    val byteCtes = if (!withByte) "" else s"""
      |by0 AS MATERIALIZED (
      |  SELECT w, chr(31) || array_to_string(
      |    regexp_extract_all(lower(hex(encode(w))), '..'),
      |    chr(31) || chr(31)) || chr(31) AS sym, freq
      |  FROM wt),
      |${(0 until 6).map(wordRound("by")).mkString(",\n")},
      |byseg AS MATERIALIZED (
      |  SELECT w, freq, regexp_split_to_array(trim(sym, chr(31)),
      |    chr(31) || chr(31)) AS syms
      |  FROM by6),""".stripMargin
    val byteArm = if (!withByte) "" else """
      |  UNION ALL
      |  SELECT 'byte_bpe', n.n, n.n * 3, s.tp, p.dp, CAST(0 AS BIGINT),
      |    CAST((CAST(s.tp AS HUGEINT) * 1000000) // (n.n * 3) AS BIGINT)
      |  FROM ndocs n,
      |    (SELECT CAST(sum(freq * len(syms)) AS BIGINT) AS tp FROM byseg) s,
      |    (SELECT CAST(count(DISTINCT piece) AS BIGINT) AS dp FROM
      |       (SELECT unnest(syms) AS piece FROM byseg)) p""".stripMargin
    uniCtes(WpFixtures) + ",\n" +
      uniDpRound("4", "sc3", "vocab3", maxLen, 3) +
      wpChain + s""",
      |$wpWalkCtes,
      |bv0 AS MATERIALIZED (
      |  SELECT w, chr(31) || array_to_string(regexp_extract_all(w, '.'),
      |    chr(31) || chr(31)) || chr(31) AS sym, freq
      |  FROM wt),
      |${(0 until 6).map(wordRound("bv")).mkString(",\n")},
      |bseg AS MATERIALIZED (
      |  SELECT w, freq, regexp_split_to_array(trim(sym, chr(31)),
      |    chr(31) || chr(31)) AS syms
      |  FROM bv6),$byteCtes
      |uall AS MATERIALIZED ($uniParts),
      |ustat AS MATERIALIZED (
      |  SELECT wt.freq, u.np FROM wt JOIN
      |    (SELECT w, CAST(count(*) AS BIGINT) AS np FROM uall GROUP BY w) u
      |    ON u.w = wt.w),
      |wpstat AS MATERIALIZED (
      |  SELECT wt.freq,
      |    CAST(CASE WHEN d.w IS NULL THEN 1 ELSE s.np END AS BIGINT) AS np,
      |    CAST(CASE WHEN d.w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS unk
      |  FROM wt LEFT JOIN gdone d ON d.w = wt.w
      |  LEFT JOIN (SELECT w, CAST(count(*) AS BIGINT) AS np
      |    FROM gall GROUP BY w) s ON s.w = wt.w),
      |wppieces AS MATERIALIZED (
      |  SELECT DISTINCT piece FROM gall JOIN gdone USING (w)
      |  UNION
      |  SELECT DISTINCT '[UNK]' AS piece FROM wt
      |  LEFT JOIN gdone d ON d.w = wt.w WHERE d.w IS NULL),
      |ndocs AS MATERIALIZED (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
      |SELECT * FROM (
      |  SELECT 'bpe' AS family, n.n AS n_docs, n.n * 3 AS total_words,
      |    s.tp AS total_pieces, p.dp AS distinct_pieces,
      |    CAST(0 AS BIGINT) AS unk_words,
      |    CAST((CAST(s.tp AS HUGEINT) * 1000000) // (n.n * 3)
      |      AS BIGINT) AS fertility_micro
      |  FROM ndocs n,
      |    (SELECT CAST(sum(freq * len(syms)) AS BIGINT) AS tp FROM bseg) s,
      |    (SELECT CAST(count(DISTINCT piece) AS BIGINT) AS dp FROM
      |       (SELECT unnest(syms) AS piece FROM bseg)) p
      |  UNION ALL
      |  SELECT 'unigram', n.n, n.n * 3, s.tp, p.dp, CAST(0 AS BIGINT),
      |    CAST((CAST(s.tp AS HUGEINT) * 1000000) // (n.n * 3) AS BIGINT)
      |  FROM ndocs n,
      |    (SELECT CAST(sum(freq * np) AS BIGINT) AS tp FROM ustat) s,
      |    (SELECT CAST(count(DISTINCT piece) AS BIGINT) AS dp FROM uall) p
      |  UNION ALL
      |  SELECT 'wordpiece', n.n, n.n * 3, s.tp, p.dp, s.uw,
      |    CAST((CAST(s.tp AS HUGEINT) * 1000000) // (n.n * 3) AS BIGINT)
      |  FROM ndocs n,
      |    (SELECT CAST(sum(freq * np) AS BIGINT) AS tp,
      |       CAST(sum(freq * unk) AS BIGINT) AS uw FROM wpstat) s,
      |    (SELECT CAST(count(*) AS BIGINT) AS dp FROM wppieces) p$byteArm)
      |ORDER BY family""".stripMargin
  }

  /** q215's Spark side: train every family on the planted
    * fixture corpus (parameter-bounded driver collects, the
    * q122/q175/q178/q213 discipline), serve each over every
    * document, aggregate fertility / utilization / UNK per family —
    * one serving scan + one aggregate per family. `withByte` adds
    * the byte-BPE column (q215).
    *
    * The three (four) trainer loops are INDEPENDENT driver-side
    * round loops of tiny jobs, so they are submitted CONCURRENTLY
    * (one Future per family over one shared SparkSession — the
    * standard multi-threaded job-submission pattern); the wall time
    * of the training phase is the slowest family, not the sum. The
    * cached corpus word tables inside each trainer are per-family,
    * so no state is shared across threads. */
  private def tokenizerEval(s: SparkSession, d: String,
      withByte: Boolean): DataFrame = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val arr = array(WpFixtures.map(lit): _*)
    val id = col("doc_id")
    val text = concat_ws(" ",
      element_at(arr, (pmod(id, lit(6)) + 1).cast("int")),
      element_at(arr, (pmod(id * 2 + 1, lit(6)) + 1).cast("int")),
      element_at(arr, (pmod(id * 3 + 2, lit(6)) + 1).cast("int")))
    val docs = T.documents(s, d).select(id, text.as("text"))
    val corpus = docs.select(col("text"))
    import graft.llm.TrainingOps
    implicit val ec: ExecutionContext = TrainerPool
    val bpeF = Future(TrainingOps.trainBpe(corpus, "text", numMerges = 6)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
    val uniF = Future(TrainingOps.trainUnigram(corpus, "text",
        seedSize = 8, maxPieceLen = 3, emRounds = 2, pruneCount = 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq)
    val wpF = Future {
      val wpMerges = TrainingOps.trainWordPiece(corpus, "text",
          numMerges = 6)
        .orderBy("merge_idx").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TrainingOps.wordPieceVocab(corpus, "text", wpMerges)
        .collect().map(_.getString(0)).toSeq
    }
    val byteF =
      if (!withByte) Future.successful(Seq.empty[(String, String)])
      else Future(TrainingOps.trainBpeBytes(corpus, "text", numMerges = 6)
        .orderBy("merge_idx").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
    val bpeMerges = Await.result(bpeF, Duration.Inf)
    val uniModel = Await.result(uniF, Duration.Inf)
    val wpVocab = Await.result(wpF, Duration.Inf)
    val byteMerges = Await.result(byteF, Duration.Inf)
    def famStats(family: String, pieces: Column): DataFrame =
      docs.select(id, explode(pieces).as("piece"))
        .agg(
          count_distinct(id).as("n_docs"),
          count(lit(1)).as("total_pieces"),
          count_distinct(col("piece")).as("distinct_pieces"),
          sum(when(col("piece") === "[UNK]", 1L).otherwise(0L))
            .cast("bigint").as("unk_words"))
        .select(lit(family).as("family"), col("n_docs"),
          (col("n_docs") * 3).as("total_words"), col("total_pieces"),
          col("distinct_pieces"), col("unk_words"))
        .withColumn("fertility_micro",
          expr("(total_pieces * 1000000) div total_words"))
    val threeFam =
      famStats("bpe", TrainingOps.bpeEncode(col("text"), bpeMerges))
        .unionByName(famStats("unigram",
          TrainingOps.unigramEncode(col("text"), uniModel)))
        .unionByName(famStats("wordpiece",
          TrainingOps.wordpieceEncode(col("text"), wpVocab)))
    val all = if (!withByte) threeFam
      else threeFam.unionByName(famStats("byte_bpe",
        TrainingOps.byteBpeEncode(col("text"), byteMerges)))
    all.orderBy("family")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // [EXT] UNIGRAM-LM tokenizer training (the SentencePiece family
    // sibling of q121's BPE trainer; Kudo 2018): substring seed →
    // hard-EM Viterbi rounds with exact integer micro-unit
    // log-likelihoods → prune by alternative-segmentation loss →
    // final recount. The oracle replays EVERY step relationally —
    // the Viterbi recurrence unrolls as max(struct(score, len)) DP
    // layers, so the segmentation tie-breaks (longer piece on equal
    // score) are pinned engine-exact, not just the final table.
    "q174_unigram_train" -> ((s, d) => {
      val arr = array(UniFixtures.map(lit): _*)
      val id = col("doc_id")
      val text = concat_ws(" ",
        element_at(arr, (pmod(id, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 2 + 1, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 3 + 2, lit(6)) + 1).cast("int")))
      graft.llm.TrainingOps.trainUnigram(
        T.documents(s, d).select(text.as("text")), "text",
        seedSize = 8, maxPieceLen = 3, emRounds = 2, pruneCount = 3)
    }),

    // [EXT] unigram ENCODE with the trained model — the serving-side
    // sibling (q122's analog for the unigram family): each document
    // re-encodes to its tokens' Viterbi-best pieces in reading
    // order. The oracle runs ONE more relational DP round under the
    // published scores, rebuilding piece order from the path steps
    // (string_agg ORDER BY step DESC) — so the per-document
    // segmentation, not just the model, is pinned engine-exact.
    "q175_unigram_encode" -> ((s, d) => {
      val arr = array(UniFixtures.map(lit): _*)
      val id = col("doc_id")
      val text = concat_ws(" ",
        element_at(arr, (pmod(id, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 2 + 1, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 3 + 2, lit(6)) + 1).cast("int")))
      val docs = T.documents(s, d).select(id, text.as("text"))
      val model = graft.llm.TrainingOps.trainUnigram(
          docs.select(col("text")), "text",
          seedSize = 8, maxPieceLen = 3, emRounds = 2, pruneCount = 3)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      docs.select(id,
          graft.llm.TrainingOps.unigramEncode(col("text"), model)
            .as("_p"))
        .select(id, size(col("_p")).as("n_pieces"),
          array_join(col("_p"), " ").as("pieces_text"))
        .orderBy("doc_id")
    }),

    // [EXT] the FULL CRAWL CYCLE in one plan — seed (robots.txt
    // DECLARES the sitemap via its Sitemap directive) → expand
    // (recursive sitemapindex → urlsets) → admit (URL trap signals +
    // robots exclusion parsed from the SAME robots.txt) → schedule
    // (per-host fetch cap + politeness offsets from the same file's
    // Crawl-delay): the crawl-side q134 analog, one host's whole
    // contract derived from one planted robots.txt. Every stage is
    // an already-oracle-green operator (q129 seeds, q124 expansion,
    // q147 traps, q115/q116 robots, q140 politeness); this pins
    // their COMPOSITION. Per-stage plan shape: map-only parses, the
    // expansion's per-level anti-join, ONE robots winner groupBy,
    // the per-host rank as WindowGroupLimit, broadcast delay join.
    // The oracle rebuilds the page set arithmetically and replays
    // the trap condition, the robots verdict, the rank, and the
    // delay arithmetic.
    "q173_crawl_cycle" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nat = T.nation(s, d)
        .select(col("n_nationkey").cast("int").as("k"))
      val host = concat(lit("n"), col("k").cast("string"), lit(".example"))
      val hurl = concat(lit("https://"), host)
      val robots = nat.select(col("k"), host.as("host"),
        concat(lit("User-agent: *\nCrawl-delay: "),
          (pmod(col("k"), lit(4)) + 1).cast("string"),
          lit("\nDisallow: /private/\nSitemap: "), hurl,
          lit("/sitemap.xml\n")).as("txt"))
      // stage 1 — SEEDS: the sitemap URLs the hosts themselves
      // declare (q129's operator)
      val seeds0 = graft.llm.Crawl
        .extractRobotsSitemaps(robots, "host", "txt")
        .select(col("sitemap_url").as("sm_url"))
      // planted sitemap bodies: root index → two child urlsets; s1
      // carries a /private/ page (robots must drop it), s2 carries a
      // deep trap URL on every third host (trap signals must drop it)
      val rootXml = concat(lit("<sitemapindex><sitemap><loc>"), hurl,
        lit("/s1.xml</loc></sitemap><sitemap><loc>"), hurl,
        lit("/s2.xml</loc></sitemap></sitemapindex>"))
      val s1Xml = concat(
        lit("<urlset><url><loc>"), hurl,
        lit("/p1</loc></url><url><loc>"), hurl,
        lit("/p2</loc></url><url><loc>"), hurl,
        lit("/private/x"), col("k").cast("string"),
        lit("</loc></url></urlset>"))
      val s2Xml = concat(
        lit("<urlset><url><loc>"), hurl,
        lit("/p3</loc></url><url><loc>"), hurl,
        lit("/p4</loc></url>"),
        when(pmod(col("k"), lit(3)) === 0,
          concat(lit("<url><loc>"), hurl,
            lit("/t/x/x/x/x/x/x/x/x/x/e</loc></url>")))
          .otherwise(lit("")),
        lit("</urlset>"))
      val bodies = nat.select(
          concat(hurl, lit("/sitemap.xml")).as("sm_url"), rootXml.as("xml"))
        .union(nat.select(concat(hurl, lit("/s1.xml")).as("sm_url"),
          s1Xml.as("xml")))
        .union(nat.select(concat(hurl, lit("/s2.xml")).as("sm_url"),
          s2Xml.as("xml")))
      // stage 2 — EXPAND: recursive fetch→parse→anti-join loop
      val seeds = seeds0.join(bodies, Seq("sm_url"))
      val pages = graft.llm.Crawl.expandSitemaps(seeds, "sm_url", "xml",
        u => u.join(bodies, Seq("sm_url")))
      // stage 3 — ADMIT: trap shapes out, then robots exclusion with
      // rules parsed from the same robots.txt registry
      val safe = graft.llm.Crawl.urlTrapSignals(
          pages.select(col("url")), "url")
        .filter(!col("is_trap")).select("url")
      val parsed = safe.select(col("url"),
        regexp_extract(col("url"), "^https://([^/]*)", 1).as("host"),
        regexp_extract(col("url"), "^https://[^/]*(/.*)$", 1).as("path"))
      val rules = graft.llm.Crawl.parseRobotsTxt(robots, "host", "txt")
      val allowed = graft.llm.Crawl
        .robotsFilter(parsed, "url", "host", "path", rules)
        .filter(col("allowed"))
      // stage 4 — SCHEDULE: per-host fetch cap (WindowGroupLimit) +
      // politeness offsets from the declared Crawl-delay
      val ranked = allowed
        .withColumn("rank", row_number().over(
          Window.partitionBy("host").orderBy("url")))
        .filter(col("rank") <= 3)
      val delays = graft.llm.Crawl
        .extractCrawlDelay(robots, "host", "txt")
      ranked.join(delays, Seq("host"), "left")
        .select(col("host"), col("rank").cast("int").as("rank"),
          col("url"),
          ((col("rank") - 1) *
            coalesce(col("crawl_delay_ms"), lit(1000L)))
            .as("fetch_offset_ms"))
        .orderBy("host", "rank")
    }),

    // [EXT] pack PROVENANCE — the attribution table for q167's packed
    // training sequences: per packed document its pack coordinates
    // (doc_seq in pack order) and the 0-based token offset of its
    // first token inside the concatenated sequence (prior docs'
    // tokens + one <eod> sentinel per joint). Any token position in
    // a training batch maps back to its source document — takedown,
    // contamination tracing, provenance-aware loss masking. The
    // oracle extends q167's cumsum-pack replay with the same
    // in-pack running sum + row_number arithmetic.
    "q176_pack_provenance" -> ((s, d) =>
      graft.llm.TrainingOps.packProvenance(
          T.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
          "lang", "doc_id",
          graft.llm.TextAnalysis.tokenCountWs(col("text")),
          budget = 512L, sepTokens = 1)
        .orderBy("lang", "pack_id", "doc_id")),

    // [EXT] WORDPIECE tokenizer training (the third dominant family
    // next to q121's BPE and q174's unigram-LM; Schuster & Nakajima
    // 2012, the BERT vocabulary algorithm): the merge loop ranked by
    // LIKELIHOOD — count(pair)/(freq(l)·freq(r)) as an exact integer
    // nano-unit floor division, so a rare pair whose parts co-occur
    // exclusively beats a frequent pair of frequent parts. Positional
    // `##` continuation marks ride inside the symbols (word-initial
    // and continuation pieces are distinct vocabulary items). The
    // oracle replays every round: same pair counts, same denominators,
    // same HUGEINT-exact score, same (score, cnt, l, r) selection.
    "q177_wordpiece_train" -> ((s, d) => {
      val arr = array(WpFixtures.map(lit): _*)
      val id = col("doc_id")
      val text = concat_ws(" ",
        element_at(arr, (pmod(id, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 2 + 1, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 3 + 2, lit(6)) + 1).cast("int")))
      graft.llm.TrainingOps.trainWordPiece(
          T.documents(s, d).select(text.as("text")), "text",
          numMerges = 6)
        .orderBy("merge_idx")
    }),

    // [EXT] WordPiece ENCODE with the trained vocabulary — greedy
    // longest-match-first with `##` continuations and the `[UNK]`
    // arm (the published BERT tokenizer, q122/q175's serving-side
    // analog for this family). Greedy is not total-coverage: a
    // training word can encode to [UNK] when a merge consumed the
    // piece its path needs — the oracle's unrolled greedy walk
    // replays exactly that (words whose single greedy path never
    // reaches their end collapse to '[UNK]').
    "q178_wordpiece_encode" -> ((s, d) => {
      val arr = array(WpFixtures.map(lit): _*)
      val id = col("doc_id")
      val text = concat_ws(" ",
        element_at(arr, (pmod(id, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 2 + 1, lit(6)) + 1).cast("int")),
        element_at(arr, (pmod(id * 3 + 2, lit(6)) + 1).cast("int")))
      // r15: fan-out A/B'd and rejected in both shapes (q122's verdict:
      // all-fanned 1.86×, serving-only 1.66×)
      val docs = T.documents(s, d).select(id, text.as("text"))
      val merges = graft.llm.TrainingOps.trainWordPiece(
          docs.select(col("text")), "text", numMerges = 6)
        .orderBy("merge_idx").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val vocab = graft.llm.TrainingOps.wordPieceVocab(
          docs.select(col("text")), "text", merges)
        .collect().map(_.getString(0)).toSeq
      docs.select(id,
          graft.llm.TrainingOps.wordpieceEncode(col("text"), vocab)
            .as("_p"))
        .select(id, size(col("_p")).as("n_pieces"),
          array_join(col("_p"), " ").as("pieces_text"))
        .orderBy("doc_id")
    }),

    // [EXT] cross-family tokenizer EVALUATION — the model-selection
    // report a vocabulary build ends with: all THREE families (BPE
    // q121, unigram-LM q174, WordPiece q177) trained on the SAME
    // corpus and served over every document, compared on the metrics
    // that drive tokenizer choice — fertility (pieces per word, the
    // inference-cost driver, exact micro-unit floor division),
    // vocabulary utilization (distinct pieces actually emitted), and
    // UNK rate (greedy WordPiece is not total-coverage; BPE/unigram
    // are by construction). One serving scan + one aggregate per
    // family; the trained models are parameter-bounded driver
    // collects exactly as in q122/q175/q178. The oracle replays all
    // trainings AND servings relationally (the existing CTE
    // machinery composed over one shared word table) and aggregates
    // the same stats freq-weighted per word.
    // (q179, the r10 three-family variant, was retired in r13 —
    // q215 strictly supersedes it; `withByte = false` remains the
    // callable three-family arm of `tokenizerEval`.)

    // [EXT] FOUR-family tokenizer evaluation (r12): the three-family
    // model-selection report with the byte-level BPE family
    // (q212/q213, the GPT lineage) in the comparison — its UNK
    // column is structurally 0 (the 256-byte base alphabet drops
    // nothing), and the metric that matters is its FERTILITY cost:
    // hex-byte seeding doubles the symbols per word before merges
    // start, so at equal merge budget byte-BPE emits more pieces per
    // word than char-BPE. The oracle replays all four trainings and
    // servings (the three-family CTEs + the q212 byte chain over the same
    // word table).
    "q215_tokenizer_eval4" -> ((s, d) => tokenizerEval(s, d,
      withByte = true)),

    // [EXT] FIM — fill-in-the-middle transform (Bavarian et al.
    // 2022, arXiv:2207.14255): the code-LLM training objective
    // complementing q165's span corruption and q168's prefix-LM.
    // Deterministic: one SHA uniform dispatches the arm (PSM / SPM /
    // plain at fimRate/2 each and 1−fimRate), two more pick the cut
    // points over [0, n]; the document splits into prefix/middle/
    // suffix and re-emits middle-last under a fixed sentinel
    // template. Map-only, one scan, everything let-bound; the oracle
    // replays the identical SHA arithmetic, slices, and template.
    "q180_fim_split" -> ((s, d) =>
      graft.llm.TrainingOps.fimSplit(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", fimRate = 0.9, salt = "fim180")
        .orderBy("doc_id")),

    // [EXT] quality-ANNEALED curriculum plan: the end-of-training
    // schedule (bulk phase on the full mix, final 10% of the token
    // budget on the highest-quality slice) as one deterministic
    // relational plan. Quality here is the alphabetic-character
    // ratio in exact micro-units (any oracle-replayable score slots
    // in); the anneal set is the greedy best-first prefix whose
    // running token mass starts inside 10% of the corpus total
    // (q106's two-phase prefix sum — no global window), and
    // order_key is the salted-SHA shuffle both engines rebuild. The
    // oracle replays the total, the boundary arithmetic, the cumsum
    // (a window is fine THERE — DuckDB is the spec, not the scale
    // path), and the hash.
    "q181_anneal_plan" -> ((s, d) => {
      val qual = expr("(CAST(length(regexp_replace(text, '[^a-zA-Z]', " +
        "'')) AS BIGINT) * 1000000) div greatest(length(text), 1)")
      graft.llm.Selection.annealPlan(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", qual,
          graft.llm.TextAnalysis.tokenCountWs(col("text")),
          annealFracMicro = 100000L, salt = "anl181")
        .orderBy("doc_id")
    }),

    // [EXT] adaptive RECRAWL scheduling — the change-frequency
    // policy that closes the crawl loop (q173 schedules the first
    // fetch; this schedules every revisit): per URL the fetch
    // history's trailing unchanged streak drives a capped
    // exponential backoff, so static pages decay to the interval cap
    // while churning pages stay at base cadence. Fetch log planted
    // from events (URL by event_id arithmetic, fingerprint =
    // event_type). One groupBy + bounded per-URL fold, no window;
    // the oracle replays the history with lag/max windows — DuckDB
    // is the spec, not the scale path.
    "q182_recrawl_schedule" -> ((s, d) => {
      val ev = T.events(s, d)
      val url = concat(lit("https://h"),
        pmod(col("event_id"), lit(7)).cast("string"),
        lit(".example/p"),
        pmod(col("event_id"), lit(97)).cast("string"))
      graft.llm.Crawl.recrawlSchedule(
          ev.select(url.as("url"), T.tsMillis(ev, "ts").as("ts_ms"),
            col("event_type").as("fp")),
          "url", "ts_ms", "fp", baseMs = 3600000L, maxDoublings = 6)
        .orderBy("url")
    }),

    // [EXT] PERSISTENT ANN index — the embedding sibling of the q114
    // signature store: hyperplane band signatures + vectors land in
    // bucketed catalog tables ONCE (this query builds the index
    // inline — that is the demo, like q114), then the probe joins
    // exchange-free against the stored layout: keys-only candidate
    // join on the (band, bucket)-bucketed sigs table, exact cosine
    // re-rank against the id-bucketed vec table with norms
    // precomputed at index time. Identical math to q75's inline
    // tier — the oracle IS q75's oracle, verbatim — so what this
    // query pins is that persistence changes nothing: index once,
    // probe forever.
    "q183_ann_index" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      graft.llm.Similarity.writeAnnIndex(emb, "vec_id", "embedding",
        "q183_annix", bands = 4, bitsPerBand = 8, dim = 64)
      graft.llm.Similarity.probeAnnIndex(
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          "q183_annix", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine_r"))
        .orderBy("query_id", "rank")
    }))

  val oracleSql: Map[String, String] = Map(
    "q176_pack_provenance" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, lang, toks,
        |        CAST(floor((sum(toks) OVER (PARTITION BY lang
        |            ORDER BY doc_id) - toks) / 512) AS BIGINT) AS pack_id
        |      FROM t)
        |SELECT lang, pack_id, doc_id,
        |  CAST(row_number() OVER (PARTITION BY lang, pack_id
        |    ORDER BY doc_id) - 1 AS INT) AS doc_seq,
        |  CAST(sum(toks) OVER (PARTITION BY lang, pack_id
        |      ORDER BY doc_id) - toks
        |    + row_number() OVER (PARTITION BY lang, pack_id
        |      ORDER BY doc_id) - 1 AS BIGINT) AS token_offset,
        |  CAST(toks AS BIGINT) AS n_tokens
        |FROM p ORDER BY lang, pack_id, doc_id""".stripMargin,
    "q174_unigram_train" -> uniOracle,
    "q175_unigram_encode" -> uniEncodeOracle,
    "q177_wordpiece_train" -> wpOracle,
    "q178_wordpiece_encode" -> wpEncodeOracle,
    "q215_tokenizer_eval4" -> tokEvalOracle(withByte = true),
    "q180_fim_split" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |u AS (SELECT doc_id, w, len(w) AS n,
        |        ('0x' || substr(sha256('fim180:a:' ||
        |           CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |          / 4503599627370496.0 AS u0,
        |        CAST(floor(('0x' || substr(sha256('fim180:c1:' ||
        |           CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |          / 4503599627370496.0 * (len(w) + 1)) AS INT) AS c1,
        |        CAST(floor(('0x' || substr(sha256('fim180:c2:' ||
        |           CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |          / 4503599627370496.0 * (len(w) + 1)) AS INT) AS c2
        |      FROM t),
        |k AS (SELECT doc_id, w, n, u0,
        |        least(c1, c2) AS lo, greatest(c1, c2) AS hi,
        |        (n < 2 OR u0 >= 0.9) AS plain_arm
        |      FROM u)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |  CASE WHEN plain_arm THEN 'plain'
        |       WHEN u0 < 0.45 THEN 'psm' ELSE 'spm' END AS arm,
        |  CAST(CASE WHEN plain_arm THEN 0 ELSE lo END AS INT) AS cut_lo,
        |  CAST(CASE WHEN plain_arm THEN 0 ELSE hi END AS INT) AS cut_hi,
        |  CASE WHEN plain_arm THEN array_to_string(w, ' ')
        |       WHEN u0 < 0.45 THEN '<PRE> ' || coalesce(array_to_string(w[1:lo], ' '), '')
        |         || ' <SUF> ' || coalesce(array_to_string(w[hi+1:n], ' '), '')
        |         || ' <MID> ' || coalesce(array_to_string(w[lo+1:hi], ' '), '')
        |       ELSE '<SUF> ' || coalesce(array_to_string(w[hi+1:n], ' '), '')
        |         || ' <PRE> ' || coalesce(array_to_string(w[1:lo], ' '), '')
        |         || ' <MID> ' || coalesce(array_to_string(w[lo+1:hi], ' '), '') END
        |    AS fim_text
        |FROM k ORDER BY doc_id""".stripMargin,
    "q181_anneal_plan" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |        AS BIGINT) * 1000000
        |      // greatest(length(text), 1) AS quality_micro,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (SELECT greatest(sum(n_tokens) * 100000 // 1000000, 1)
        |        AS budget FROM t),
        |c AS (SELECT doc_id, quality_micro, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY quality_micro DESC, doc_id)
        |          - n_tokens AS start_off
        |      FROM t)
        |SELECT doc_id, quality_micro, n_tokens,
        |  CASE WHEN start_off < b.budget THEN 'anneal' ELSE 'main' END
        |    AS phase,
        |  ('0x' || substr(sha256('anl181:' || CAST(doc_id AS VARCHAR)),
        |    1, 13))::BIGINT AS order_key
        |FROM c, b ORDER BY doc_id""".stripMargin,
    "q182_recrawl_schedule" ->
      """WITH log AS (
        |  SELECT 'https://h' || CAST(event_id % 7 AS VARCHAR)
        |      || '.example/p' || CAST(event_id % 97 AS VARCHAR) AS url,
        |    epoch_ms(ts) AS ts_ms, event_type AS fp
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |w AS (SELECT url, ts_ms, fp,
        |        row_number() OVER (PARTITION BY url
        |          ORDER BY ts_ms, fp) AS idx,
        |        lag(fp) OVER (PARTITION BY url
        |          ORDER BY ts_ms, fp) AS pfp
        |      FROM log),
        |s AS (SELECT url,
        |        CAST(count(*) AS INT) AS n_fetches,
        |        CAST(sum(CASE WHEN pfp IS NOT NULL AND fp <> pfp
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
        |        max(CASE WHEN pfp IS NOT NULL AND fp <> pfp
        |          THEN idx ELSE 1 END) AS last_change_idx,
        |        max(idx) AS max_idx,
        |        max(ts_ms) AS last_ts
        |      FROM w GROUP BY url)
        |SELECT url, n_fetches, n_changes,
        |  CAST(max_idx - last_change_idx AS BIGINT) AS unchanged_streak,
        |  CAST(3600000 * (1 << CAST(least(max_idx - last_change_idx, 6)
        |    AS INT)) AS BIGINT) AS interval_ms,
        |  CAST(last_ts + 3600000 * (1 << CAST(least(
        |    max_idx - last_change_idx, 6) AS INT)) AS BIGINT)
        |    AS next_fetch_ms
        |FROM s ORDER BY url""".stripMargin,
    // the persisted-index probe must agree with q75's inline tier to
    // the bit — same planes, buckets, candidates, ranking
    "q183_ann_index" ->
      graft.queries.R3Queries.oracleSql("q75_ann_lsh_sha"),
    "q173_crawl_cycle" ->
      """WITH n AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation),
        |pages AS (
        |  SELECT k, 'https://n' || CAST(k AS VARCHAR) || '.example'
        |    || p AS url
        |  FROM n, unnest(['/p1', '/p2', '/p3', '/p4']) AS t(p)
        |  UNION ALL
        |  SELECT k, 'https://n' || CAST(k AS VARCHAR)
        |    || '.example/private/x' || CAST(k AS VARCHAR) FROM n
        |  UNION ALL
        |  SELECT k, 'https://n' || CAST(k AS VARCHAR)
        |    || '.example/t/x/x/x/x/x/x/x/x/x/e'
        |  FROM n WHERE k % 3 = 0),
        |p AS (SELECT k, url,
        |        regexp_extract(url, '^https://([^/]*)', 1) AS host,
        |        regexp_extract(url, '^https://[^/]*(/.*)$', 1) AS path
        |      FROM pages),
        |g AS (SELECT k, url, host, path,
        |        list_filter(str_split(path, '/'), x -> x <> '') AS segs
        |      FROM p),
        |f AS (SELECT k, url, host, path FROM g
        |      WHERE NOT (len(segs) > 8
        |        OR len(segs) - len(list_distinct(segs)) > 2)),
        |a AS (SELECT k, url, host FROM f
        |      WHERE path NOT LIKE '/private/%'),
        |r AS (SELECT k, host, url, row_number() OVER
        |        (PARTITION BY host ORDER BY url) AS rank FROM a)
        |SELECT host, CAST(rank AS INT) AS rank, url,
        |  CAST((rank - 1) * (k % 4 + 1) * 1000 AS BIGINT)
        |    AS fetch_offset_ms
        |FROM r WHERE rank <= 3 ORDER BY host, rank""".stripMargin)
}
