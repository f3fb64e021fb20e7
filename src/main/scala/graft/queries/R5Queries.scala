package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q91+: round-5 additions — the REAL media decoders under the
  * driver's DuckDB hash gate.
  *
  * Pattern (same as q84's GIF header test): Spark BUILDS a media
  * container in-plan from plain SQL byte construction — an
  * uncompressed 24-bpp BMP (q91), a PCM-16 RIFF/WAV (q92) — runs the
  * REAL JDK decoder (`ImageIO` / `javax.sound.sampled`) over it, and
  * the oracle computes the expected decode output ANALYTICALLY from
  * the same arithmetic that generated the pixels/samples. Both
  * formats are decompressed containers, so every byte is constructible
  * with `concat`/`transform`/`unhex` — no binary handling in the
  * oracle, yet the decoder's pixel/sample path is value-verified
  * end-to-end (previously scalatest-only; VERDICT r4 "What's missing"
  * #2).
  *
  * Every query ends in a total ORDER BY.
  */
object R5Queries {
  private val T = Tables

  /** Hex of the low byte of an integral column (2 chars). */
  private[queries] def b1(c: Column): Column =
    lpad(hex(pmod(c.cast("long"), lit(256))), 2, "0")

  /** Hex of a u32 little-endian (8 chars). */
  private[queries] def le32(c: Column): Column =
    concat(b1(c), b1(floor(c / 256)), b1(floor(c / 65536)),
      b1(floor(c / 16777216)))

  /** Hex of a u16 little-endian (4 chars). */
  private[queries] def le16(c: Column): Column = concat(b1(c), b1(floor(c / 256)))

  /** The q93 planted uncompressed AVI: nf frames of affine-hash
    * pixels (frame index folded into every channel), dims 2..6 ×
    * 1..3, 2..4 frames — every pixel of every frame reconstructable
    * analytically by an oracle. Frame rows are written in STORAGE
    * order (y = 0 first). */
  private[graft] def plantedAvi(k: Column): Column = {
      val w = pmod(k, lit(5)) + 2   // 2..6 px
      val h = pmod(k, lit(3)) + 1   // 1..3 px
      val nf = pmod(k, lit(3)) + 2  // 2..4 frames
      val rowBytes = floor((w * 3 + 3) / 4) * 4
      val frameBytes = h * rowBytes
      def pix(f: Column, x: Column, y: Column): Column = concat(
        b1(k * 31 + f * 41 + x * 17 + y * 23),  // B
        b1(k * 7 + f * 37 + x * 29 + y * 13),   // G
        b1(k * 13 + f * 43 + x * 11 + y * 19))  // R
      val rowPad = lit("000000").substr(lit(1), (rowBytes - w * 3) * 2)
      def frameHex(f: Column): Column = concat(
        lit("30306462"), le32(frameBytes),      // "00db" + size
        array_join(transform(sequence(lit(0), h - 1), y =>
          concat(array_join(
            transform(sequence(lit(0), w - 1), x => pix(f, x, y)), ""),
            rowPad)), ""))
      val strh = concat(lit("73747268"), le32(lit(56)),  // "strh"
        lit("76696473"), lit("44494220"),                // "vids","DIB "
        le32(lit(0)), lit("00000000"),                   // flags, prio+lang
        le32(lit(0)), le32(lit(1)), le32(lit(25)),       // initial, scale, rate
        le32(lit(0)), le32(nf), le32(lit(0)),            // start, length, bufsz
        le32(lit(0)), le32(lit(0)),                      // quality, samplesz
        lit("0000000000000000"))                         // rcFrame
      val strf = concat(lit("73747266"), le32(lit(40)),  // "strf"
        le32(lit(40)), le32(w), le32(h), lit("01001800"),
        le32(lit(0)), le32(frameBytes), le32(lit(0)), le32(lit(0)),
        le32(lit(0)), le32(lit(0)))
      val strl = concat(lit("4C495354"), le32(lit(4 + 64 + 48)),
        lit("7374726C"), strh, strf)                     // LIST strl
      val avih = concat(lit("61766968"), le32(lit(56)),  // "avih"
        le32(lit(40000)), le32(lit(0)), le32(lit(0)), le32(lit(0)),
        le32(nf), le32(lit(0)), le32(lit(1)), le32(lit(0)),
        le32(w), le32(h), le32(lit(0)), le32(lit(0)), le32(lit(0)),
        le32(lit(0)))
      val hdrl = concat(lit("4C495354"), le32(lit(4 + 64 + 124)),
        lit("6864726C"), avih, strl)                     // LIST hdrl
      val moviBody = array_join(
        transform(sequence(lit(0), nf - 1), f => frameHex(f)), "")
      val movi = concat(lit("4C495354"),
        le32(nf * (frameBytes + 8) + 4), lit("6D6F7669"), moviBody)
      unhex(concat(lit("52494646"),
        le32(nf * (frameBytes + 8) + 4 + lit(200) + 12),
        lit("41564920"), hdrl, movi))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] REAL pixel decode, value-verified: per part row build a
    // W×H uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
    // bottom-up BGR rows, 4-byte-aligned) whose pixel bytes derive
    // from (key, x, y); decode with ImageIO; emit the 16-bin BT.601
    // luminance histogram as exact per-bin PIXEL COUNTS (the
    // normalized float × W·H rounds back to the integer count). The
    // oracle replays the same (key, x, y) → luma → bin arithmetic —
    // pure integer math on both sides.
    "q91_bmp_pixel_decode" -> ((s, d) => {
      val k = col("p_partkey")
      val w = pmod(k, lit(6)) + 2  // 2..7 px
      val h = pmod(k, lit(4)) + 1  // 1..4 px
      val rowBytes = floor((w * 3 + 3) / 4) * 4
      val imgSize = h * rowBytes
      // pixel (x, y): stored BGR, each channel a distinct affine hash
      def pix(x: Column, y: Column): Column = concat(
        b1(k * 31 + x * 17 + y * 23),   // B
        b1(k * 7 + x * 29 + y * 13),    // G
        b1(k * 13 + x * 11 + y * 19))   // R
      val rowPad = lit("000000").substr(lit(1), (rowBytes - w * 3) * 2)
      val rows = array_join(
        transform(sequence(h - 1, lit(0), lit(-1)), y =>
          concat(array_join(
            transform(sequence(lit(0), w - 1), x => pix(x, y)), ""),
            rowPad)), "")
      val payload = unhex(concat(
        lit("424D"), le32(imgSize + 54), lit("00000000"), le32(lit(54)),
        le32(lit(40)), le32(w), le32(h), lit("01001800"), le32(lit(0)),
        le32(imgSize), le32(lit(0)), le32(lit(0)), le32(lit(0)),
        le32(lit(0)), rows))
      // 1-in-5 subsample: per-image ImageIO reader setup dominates at
      // bench scale; thousands of decoded images still hash-gate the
      // pixel path and the oracle applies the same predicate.
      // r15: fan-out A/B'd and REJECTED (2.46×): ImageIO decode goes
      // through the JDK's global synchronized registry, so 32
      // same-JVM tasks contend instead of scaling (fine on a real
      // cluster where executors are separate JVMs; harmful here)
      val decoded = graft.llm.Multimodal.decodeImage(
        T.part(s, d).filter(pmod(k, lit(5)) === 0)
          .select(k.as("id"), payload.as("payload")),
        "id", "payload")
      decoded
        .select(col("id"), col("width"), col("height"),
          posexplode(col("features")).as(Seq("bin", "f")))
        .select(col("id"), col("width"), col("height"),
          col("bin").cast("int").as("bin"),
          round(col("f") * col("width") * col("height"))
            .cast("int").as("npix"))
        .orderBy("id", "bin")
    }),

    // [EXT] REAL audio decode, value-verified: per part row build a
    // 32-sample PCM-16 mono WAV whose samples are constant within
    // each of decodeAudio's 8 RMS windows (amplitude a_w =
    // (key·97 + w·131) mod 4097), so every window RMS is EXACTLY
    // a_w/32768 in IEEE double (a_w² < 2²⁴ keeps the square exact;
    // the mean of 4 identical values is exact; sqrt recovers a_w/2¹⁵
    // which fits a float mantissa) — multiplying back by 2¹⁵ recovers
    // the integer amplitude bit-exactly on both engines.
    "q92_wav_pcm_decode" -> ((s, d) => {
      val k = col("p_partkey")
      val rate = lit(8000) + pmod(k, lit(1000))
      def amp(wi: Column): Column = pmod(k * 97 + wi * 131, lit(4097))
      val samplesHex = array_join(
        transform(sequence(lit(0), lit(31)), i => le16(amp(floor(i / 4)))),
        "")
      val payload = unhex(concat(
        lit("52494646"), le32(lit(100)), lit("57415645"),    // RIFF/WAVE
        lit("666D7420"), le32(lit(16)), lit("01000100"),     // fmt: PCM mono
        le32(rate), le32(rate * 2), lit("02001000"),         // rates, align, bits
        lit("64617461"), le32(lit(64)),                      // data chunk
        samplesHex))
      // r15: fan-out A/B'd and rejected (3.21× — q91's registry verdict)
      val decoded = graft.llm.Multimodal.decodeAudio(
        T.part(s, d).filter(pmod(k, lit(5)) === 0)
          .select(k.as("id"), payload.as("payload")),
        "id", "payload", windows = 8)
      decoded
        .select(col("id"), col("sample_rate"), col("channels"),
          col("n_samples"), posexplode(col("energy")).as(Seq("win", "e")))
        .select(col("id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("win").cast("int").as("win"),
          round(col("e") * 32768).cast("int").as("amp"))
        .orderBy("id", "win")
    }),

    // [EXT] REAL video frame sampling, value-verified: per part row
    // build an uncompressed RIFF/AVI (raw 24-bpp DIB frames — plain
    // bytes, same trick as q91's BMP) with F frames whose pixels
    // derive from (key, frame, x, y); sample every 2nd frame with the
    // VideoKernel container walk; emit exact per-bin luminance pixel
    // counts per sampled frame. The oracle replays the (key, f, x, y)
    // → luma → bin arithmetic for even f — pure integer math both
    // sides, zero binary handling in the oracle.
    "q93_avi_frame_sample" -> ((s, d) => {
      val k = col("p_partkey")
      val payload = R5Queries.plantedAvi(k)
      // r15: fan-out A/B'd and rejected (1.79× — q91's registry verdict)
      val sampled = graft.llm.Multimodal.sampleFrames(
        T.part(s, d).filter(pmod(k, lit(5)) === 0)
          .select(k.as("id"), payload.as("payload")),
        "id", "payload", every = 2)
      sampled
        .select(col("id"), col("frame_idx"), col("width"), col("height"),
          col("n_frames"),
          posexplode(col("features")).as(Seq("bin", "f")))
        .select(col("id"), col("frame_idx"), col("width"), col("height"),
          col("n_frames"), col("bin").cast("int").as("bin"),
          round(col("f") * col("width") * col("height"))
            .cast("int").as("npix"))
        .orderBy("id", "frame_idx", "bin")
    }),

    // [EXT] line-level dedup (the C4/RefinedWeb boilerplate pass):
    // every doc gets the same planted footer line (df = corpus size,
    // removed), a cohort-shared line (df = docs per 7-residue cohort,
    // removed at minDf=3), and a per-doc unique tail (df = 1, kept);
    // the doc's own text line survives unless its exact text repeats
    // in ≥3 docs. Oracle replays the same split/df/filter/reassemble.
    "q94_line_dedup" -> ((s, d) =>
      // r15: fan-out A/B'd and rejected (1.60× — q233's verdict)
      graft.llm.Dedup.lineDedup(
        T.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit("\ncopyright acme corp all rights reserved\ncohort "),
            pmod(col("doc_id"), lit(7)).cast("string"),
            lit(" shared banner\nunique tail "),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text", minDf = 3)
      .orderBy("doc_id")),

    // [EXT] URL canonicalization for provenance: six planted URL
    // shapes per doc cohort — www + multi-label suffix + utm junk,
    // bare http, subdomain + port, userinfo + fragment, a `*.ck`
    // wildcard-suffix host, and a `!www.ck` exception host — through
    // urlParts; the oracle replays the same regex/suffix arithmetic
    // including the wildcard/exception tiers.
    "q95_url_normalize" -> ((s, d) => {
      val id = col("doc_id")
      val url = when(pmod(id, lit(6)) === 0,
          concat(lit("https://www."), col("source"),
            lit(".Example.CO.UK/path/"), id.cast("string"),
            lit("?utm_source=feed&utm_medium=rss")))
        .when(pmod(id, lit(6)) === 1,
          concat(lit("http://"), col("source"), lit(".example.com/a/b")))
        .when(pmod(id, lit(6)) === 2,
          concat(lit("https://cdn."), col("source"),
            lit(".example.com:8080/static/img")))
        .when(pmod(id, lit(6)) === 3,
          concat(lit("https://user@"), col("source"),
            lit(".example.org/p#frag")))
        .when(pmod(id, lit(6)) === 4,
          concat(lit("https://shop."), col("source"), lit(".ck/w/"),
            id.cast("string")))
        .otherwise(
          concat(lit("https://b."), col("source"), lit(".www.ck/e")))
      T.documents(s, d)
        .select(id, graft.llm.TextAnalysis.urlParts(url).as("u"))
        .select(id, col("u.host").as("host"), col("u.domain").as("domain"),
          col("u.path").as("path"))
        .orderBy("doc_id")
    }),

    // [EXT] composite Gopher-style quality gate: keep/drop verdict
    // with the firing rule named, every threshold an integer
    // cross-multiplication over exact counts (never a double-ratio
    // compare) so the verdict is bit-portable. Map-only.
    "q96_quality_gate" -> ((s, d) =>
      // r15: per-row gate arithmetic ran in the single scan task — fan out
      graft.ops.Par.fanOut(
          T.documents(s, d).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"),
          graft.llm.TextAnalysis.qualityGate(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_tokens").as("n_tokens"),
          col("g.n_chars").as("n_chars"), col("g.top_count").as("top_count"),
          col("g.stop_hits").as("stop_hits"), col("g.keep").as("keep"),
          col("g.reject_reason").as("reject_reason"))
        .orderBy("doc_id")),

    // [EXT] full near-dup RESOLUTION (q69's clusters + q64's
    // keep-best, composed): Jaccard pairs → connected components →
    // one highest-quality representative per cluster; docs in no pair
    // are singleton clusters and kept. The oracle replays clustering
    // with a recursive CTE and the pick with a rank window.
    "q97_dedup_resolve" -> ((s, d) => {
      val docs = T.documents(s, d)
      graft.llm.Dedup.resolveNearDups(docs,
          graft.llm.Dedup.jaccardPairs(docs, "doc_id", "text",
            blockCols = Seq("lang"), shingleN = 3, threshold = 0.03),
          "doc_id", col("n_chars"))
        .orderBy("doc_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q91_bmp_pixel_decode" ->
      """WITH d AS (
        |  SELECT p_partkey AS id,
        |    CAST(p_partkey % 6 + 2 AS INT) AS width,
        |    CAST(p_partkey % 4 + 1 AS INT) AS height
        |  FROM part WHERE p_partkey % 5 = 0),
        |xs AS (SELECT id, width, height,
        |         unnest(generate_series(0, width - 1)) AS x FROM d),
        |xy AS (SELECT id, width, height, x,
        |         unnest(generate_series(0, height - 1)) AS y FROM xs),
        |px AS (
        |  SELECT id, width, height,
        |    ((299 * ((id * 13 + x * 11 + y * 19) % 256)
        |      + 587 * ((id * 7 + x * 29 + y * 13) % 256)
        |      + 114 * ((id * 31 + x * 17 + y * 23) % 256)) // 1000) // 16
        |      AS bin
        |  FROM xy),
        |c AS (SELECT id, width, height, bin, count(*) AS n
        |      FROM px GROUP BY 1, 2, 3, 4),
        |bins AS (SELECT g.id, g.width, g.height, b.bin
        |         FROM d g, generate_series(0, 15) AS b(bin))
        |SELECT bins.id, bins.width, bins.height,
        |       CAST(bins.bin AS INT) AS bin,
        |       CAST(coalesce(c.n, 0) AS INT) AS npix
        |FROM bins LEFT JOIN c
        |  ON bins.id = c.id AND bins.bin = c.bin
        |ORDER BY bins.id, bins.bin""".stripMargin,
    "q92_wav_pcm_decode" ->
      """SELECT p_partkey AS id,
        |  CAST(8000 + p_partkey % 1000 AS INT) AS sample_rate,
        |  1 AS channels, CAST(32 AS BIGINT) AS n_samples,
        |  CAST(w AS INT) AS win,
        |  CAST((p_partkey * 97 + w * 131) % 4097 AS INT) AS amp
        |FROM part CROSS JOIN generate_series(0, 7) AS g(w)
        |WHERE p_partkey % 5 = 0
        |ORDER BY id, win""".stripMargin,
    "q93_avi_frame_sample" ->
      """WITH d AS (
        |  SELECT p_partkey AS id,
        |    CAST(p_partkey % 5 + 2 AS INT) AS width,
        |    CAST(p_partkey % 3 + 1 AS INT) AS height,
        |    CAST(p_partkey % 3 + 2 AS INT) AS n_frames
        |  FROM part WHERE p_partkey % 5 = 0),
        |fr AS (SELECT id, width, height, n_frames,
        |         unnest(generate_series(0, n_frames - 1, 2)) AS fi FROM d),
        |xs AS (SELECT id, width, height, n_frames, fi,
        |         unnest(generate_series(0, width - 1)) AS x FROM fr),
        |xy AS (SELECT id, width, height, n_frames, fi, x,
        |         unnest(generate_series(0, height - 1)) AS y FROM xs),
        |px AS (
        |  SELECT id, fi,
        |    ((299 * ((id * 13 + fi * 43 + x * 11 + y * 19) % 256)
        |      + 587 * ((id * 7 + fi * 37 + x * 29 + y * 13) % 256)
        |      + 114 * ((id * 31 + fi * 41 + x * 17 + y * 23) % 256)) // 1000) // 16
        |      AS bin
        |  FROM xy),
        |c AS (SELECT id, fi, bin, count(*) AS n FROM px GROUP BY 1, 2, 3),
        |bins AS (SELECT f.id, f.width, f.height, f.n_frames, f.fi, b.bin
        |         FROM fr f, generate_series(0, 15) AS b(bin))
        |SELECT bins.id, CAST(bins.fi AS INT) AS frame_idx, bins.width,
        |       bins.height, bins.n_frames, CAST(bins.bin AS INT) AS bin,
        |       CAST(coalesce(c.n, 0) AS INT) AS npix
        |FROM bins LEFT JOIN c
        |  ON bins.id = c.id AND bins.fi = c.fi AND bins.bin = c.bin
        |ORDER BY bins.id, bins.fi, bins.bin""".stripMargin,
    "q94_line_dedup" ->
      """WITH doc AS (
        |  SELECT doc_id, text || chr(10)
        |    || 'copyright acme corp all rights reserved' || chr(10)
        |    || 'cohort ' || CAST(doc_id % 7 AS VARCHAR) || ' shared banner'
        |    || chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents),
        |a AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM doc),
        |ix AS (SELECT doc_id, arr,
        |         unnest(generate_series(1, len(arr))) AS i FROM a),
        |l AS (SELECT doc_id, i, arr[i] AS line, trim(arr[i]) AS t
        |      FROM ix WHERE trim(arr[i]) <> ''),
        |d AS (SELECT t, count(DISTINCT doc_id) AS df FROM l GROUP BY 1),
        |f AS (SELECT l.doc_id, l.i, l.line, d.df < 3 AS keep
        |      FROM l JOIN d USING (t))
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
        |                      ORDER BY i), '') AS clean_text,
        |  count(*) AS n_lines,
        |  count(*) FILTER (WHERE NOT keep) AS n_removed
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q95_url_normalize" ->
      s"""WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN 'https://www.' || source || '.Example.CO.UK/path/'
        |                  || CAST(doc_id AS VARCHAR)
        |                  || '?utm_source=feed&utm_medium=rss'
        |      WHEN 1 THEN 'http://' || source || '.example.com/a/b'
        |      WHEN 2 THEN 'https://cdn.' || source
        |                  || '.example.com:8080/static/img'
        |      WHEN 3 THEN 'https://user@' || source || '.example.org/p#frag'
        |      WHEN 4 THEN 'https://shop.' || source || '.ck/w/'
        |                  || CAST(doc_id AS VARCHAR)
        |      ELSE 'https://b.' || source || '.www.ck/e'
        |    END AS url
        |  FROM documents),
        |h AS (SELECT doc_id, url,
        |        regexp_replace(lower(regexp_extract(url,
        |          '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)),
        |          '^www\\.', '') AS host
        |      FROM u),
        |p AS (SELECT doc_id, url, host,
        |        string_split(host, '.') AS parts FROM h)
        |SELECT doc_id, host,
        |  CASE WHEN len(parts) >= 2
        |         AND parts[-2] || '.' || parts[-1] IN
        |           (${graft.llm.TextAnalysis.pslExceptionSqlList})
        |       THEN parts[-2] || '.' || parts[-1]
        |       WHEN len(parts) >= 4
        |         AND parts[-3] || '.' || parts[-2] || '.' || parts[-1] IN
        |           (${graft.llm.TextAnalysis.suffix3SqlList})
        |       THEN parts[-4] || '.' || parts[-3] || '.' || parts[-2]
        |            || '.' || parts[-1]
        |       WHEN len(parts) >= 3
        |         AND parts[-1] IN
        |           (${graft.llm.TextAnalysis.wildcardTldSqlList})
        |       THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
        |       WHEN len(parts) >= 3
        |         AND parts[-2] || '.' || parts[-1] IN
        |           (${graft.llm.TextAnalysis.suffix2SqlList})
        |       THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
        |       WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
        |       ELSE host END AS domain,
        |  regexp_extract(url, '://[^/]*(/[^?#]*)', 1) AS path
        |FROM p ORDER BY doc_id""".stripMargin,
    "q96_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM
        |        (SELECT doc_id, unnest(w) AS tok FROM t) u GROUP BY 1, 2),
        |m AS (SELECT doc_id, max(c) AS top FROM c GROUP BY 1),
        |j AS (SELECT t.doc_id, len(w) AS n, length(text) AS chars,
        |        len(list_filter(w,
        |          x -> x IN ('the','a','and','of','to'))) AS stop_hits,
        |        m.top
        |      FROM t JOIN m ON t.doc_id = m.doc_id)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |  CAST(chars AS INT) AS n_chars, CAST(top AS INT) AS top_count,
        |  CAST(stop_hits AS INT) AS stop_hits,
        |  (n BETWEEN 30 AND 100000) AND (chars BETWEEN 4 * n AND 11 * n)
        |    AND top * 100 <= n * 10 AND stop_hits * 1000 >= n * 50 AS keep,
        |  CASE WHEN NOT (n BETWEEN 30 AND 100000) THEN 'tokens'
        |       WHEN NOT (chars BETWEEN 4 * n AND 11 * n) THEN 'word_len'
        |       WHEN top * 100 > n * 10 THEN 'repetition'
        |       WHEN stop_hits * 1000 < n * 50 THEN 'stopwords'
        |       ELSE 'ok' END AS reject_reason
        |FROM j ORDER BY doc_id""".stripMargin,
    // q69's recursive-CTE clustering + a rank-window representative
    // pick (the window is fine as an ORACLE; the engine side is the
    // bounded-state min_by)
    "q97_dedup_resolve" ->
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
        |cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id
        |       FROM reach GROUP BY id),
        |a AS (SELECT d.doc_id,
        |        coalesce(cl.cluster_id, d.doc_id) AS cluster_id, d.n_chars
        |      FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |r AS (SELECT doc_id, cluster_id,
        |        count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |        row_number() OVER (PARTITION BY cluster_id
        |                           ORDER BY n_chars DESC, doc_id) AS rn
        |      FROM a)
        |SELECT doc_id, cluster_id, cluster_size, rn = 1 AS kept
        |FROM r ORDER BY doc_id""".stripMargin)
}
