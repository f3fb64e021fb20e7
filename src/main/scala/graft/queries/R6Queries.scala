package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q98+: round-6 additions.
  *
  * q98 extends the q84/q91-q93 pattern to ISO BMFF: Spark BUILDS a
  * spec-complete minimal MP4 in-plan (ftyp + moov{mvhd,
  * trak{tkhd, mdia{hdlr vide, minf{stbl{stsd avc1, stsz}}}}}) whose
  * metadata fields derive from the part key, parses it back with the
  * native `graft_media_header` expression, and the oracle computes the
  * expected (format, dims, duration, frame count, codec) analytically.
  * Box sizes are CONSTANT (fixed-length boxes) — only field bytes
  * vary — so the container assembles from hex literals + key-derived
  * big-endian fields with zero binary handling in the oracle.
  *
  * Every query ends in a total ORDER BY.
  */
object R6Queries {
  private val T = Tables

  /** Hex of a u32 big-endian (8 chars). */
  private def be32(c: Column): Column = lpad(hex(c.cast("long")), 8, "0")

  /** Hex of a u16 big-endian (4 chars). */
  private def be16(c: Column): Column =
    lpad(hex(pmod(c.cast("long"), lit(65536))), 4, "0")

  private def z(nBytes: Int): String = "0" * (2 * nBytes)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] MP4/MOV container metadata (the routing/filtering pass a
    // 100 TB multimodal corpus runs BEFORE any decode): minimal valid
    // ISO BMFF built per part row, walked back natively. mvhd
    // timescale is 1000, so duration_ms === the planted duration.
    "q98_mp4_metadata" -> ((s, d) => {
      val k = col("p_partkey")
      val w = pmod(k, lit(300)) + 1      // tkhd/avc1 dims
      val h = pmod(k, lit(200)) + 1
      val dur = pmod(k, lit(5000)) + 1000 // ms (timescale 1000)
      val frames = pmod(k, lit(50)) + 1   // stsz sample_count
      // VisualSampleEntry 'avc1' (86 B): 6 reserved + dataref 1,
      // predefined/reserved, u16 dims, 72dpi 16.16 resolutions,
      // frame_count 1, 32-B compressor name, depth 24, predefined -1
      val entry = concat(
        lit("0000005661766331" + z(6) + "00010000" + "0000" + z(12)),
        be16(w), be16(h),
        lit("00480000" + "00480000" + z(4) + "0001" + z(32) + "0018" + "FFFF"))
      val stsd = concat(lit("0000006673747364" + z(4) + "00000001"), entry)
      val stsz = concat(lit("000000147374737A" + z(4) + z(4)), be32(frames))
      val stbl = concat(lit("000000827374626C"), stsd, stsz)
      val minf = concat(lit("0000008A6D696E66"), stbl)
      // hdlr: handler_type 'vide', empty (NUL) name
      val hdlr = lit("0000002168646C72" + z(4) + z(4) + "76696465" + z(12) + "00")
      val mdia = concat(lit("000000B36D646961"), hdlr, minf)
      // tkhd v0 (enabled): track 1, duration, identity matrix,
      // 16.16-fixed dims
      val tkhd = concat(
        lit("0000005C746B6864" + "00000003" + z(4) + z(4) + "00000001" + z(4)),
        be32(dur),
        lit(z(8) + z(8) +
          "000100000000000000000000" +
          "000000000001000000000000" +
          "000000000000000040000000"),
        be16(w), lit("0000"), be16(h), lit("0000"))
      val trak = concat(lit("000001177472616B"), tkhd, mdia)
      // mvhd v0: timescale 1000, duration = planted ms
      val mvhd = concat(
        lit("0000006C6D766864" + z(4) + z(4) + z(4) + "000003E8"),
        be32(dur), lit(z(80)))
      val moov = concat(lit("0000018B6D6F6F76"), mvhd, trak)
      val ftyp = lit("0000001066747970" + "69736F6D" + "00000200")
      val payload = unhex(concat(ftyp, moov))
      graft.llm.Multimodal.parseMediaHeaders(
          T.part(s, d).select(k.as("pk"), payload.as("payload")),
          "pk", "payload")
        .select(col("id"), col("format"), col("width"), col("height"),
          col("duration_ms"), col("frame_count"), col("codec"))
        .orderBy("id")
    }),

    // [EXT] char-trigram language ID over planted multilingual
    // fixtures (40 languages cycled by doc key — 13 round-7 rows plus
    // the round-8 breadth cohort with overlapping Latin/Cyrillic
    // scripts): exact integer scoring against the bundled model; the
    // oracle rebuilds the identical argmax relationally from the SAME
    // interpolated weight table.
    "q99_langid" -> ((s, d) => {
      val id = col("doc_id")
      val text = element_at(
        array(R6Queries.LangFixtures.map(lit): _*),
        (pmod(id, lit(R6Queries.LangFixtures.size)) + 1).cast("int"))
      T.documents(s, d)
        .select(id, graft.llm.TextAnalysis.langId(text).as("l"))
        .select(id, col("l.lang").as("lang"), col("l.score").as("score"))
        .orderBy("doc_id")
    }),

    // [EXT] PARAGRAPH-level boilerplate dedup (q94's separator-
    // generalized tier): every doc gets a corpus-wide sponsored
    // paragraph (removed), a 5-residue cohort promo block (removed at
    // minDf=3), and a unique paragraph (kept); the doc's own text is
    // one unit unless it happens to contain blank lines. Oracle
    // replays the same split/df/filter/reassemble on the double
    // newline.
    "q100_para_dedup" -> ((s, d) =>
      graft.llm.Dedup.unitDedup(
        T.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit("\n\nsponsored content visit our partner store"),
            lit("\n\ncohort "), pmod(col("doc_id"), lit(5)).cast("string"),
            lit(" promo paragraph block"),
            lit("\n\nunique paragraph "),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text", minDf = 3, sep = "\n\n")
      .orderBy("doc_id")),

    // [EXT] WARC ingestion (the Common Crawl record walk): each part
    // row becomes a two-record WARC file built in-plan — an
    // application/http response (status/MIME/body decomposed) and a
    // warc-fields metadata record (raw block) — exploded back through
    // the graft_warc_records Generator. The oracle rebuilds every
    // field analytically, string-side (no binary in DuckDB).
    "q101_warc_extract" -> ((s, d) => {
      val k = col("p_partkey")
      val crlf = "\r\n"
      val uri = concat(lit("http://example.com/doc/"), k.cast("string"))
      val body1 = concat(lit("body "),
        expr("repeat('x', CAST(p_partkey % 17 AS INT))"))
      val status = when(pmod(k, lit(2)) === 0, lit("200 OK"))
        .otherwise(lit("404 Not Found"))
      val block1 = concat(lit("HTTP/1.1 "), status,
        lit(crlf + "Content-Type: text/html" + crlf + crlf), body1)
      val rec1 = concat(
        lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
          "WARC-Target-URI: "), uri,
        lit(crlf + "WARC-Date: 2024-01-01T00:00:00Z" + crlf +
          "Content-Type: application/http; msgtype=response" + crlf +
          "Content-Length: "), length(block1).cast("string"),
        lit(crlf + crlf), block1, lit(crlf + crlf))
      val body2 = concat(lit("k: "), k.cast("string"))
      val rec2 = concat(
        lit("WARC/1.0" + crlf + "WARC-Type: metadata" + crlf +
          "WARC-Target-URI: "), uri,
        lit(crlf + "Content-Type: application/warc-fields" + crlf +
          "Content-Length: "), length(body2).cast("string"),
        lit(crlf + crlf), body2, lit(crlf + crlf))
      T.part(s, d)
        .select(k.as("id"), concat(rec1, rec2).cast("binary").as("w"))
        .select(col("id"),
          graft.ops.functions.warcRecords(col("w"))
            .as(Seq("rec_idx", "warc_type", "target_uri", "warc_date",
              "content_type", "content_length", "http_status",
              "http_content_type", "body")))
        .select(col("id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("warc_date"), col("content_length"),
          col("http_status"), col("http_content_type"),
          col("body").cast("string").as("body_text"))
        .orderBy("id", "rec_idx")
    }),

    // [EXT] deterministic global uniform sample: top-100 documents by
    // salted SHA-256 — TakeOrderedAndProject (per-partition heaps +
    // 32×k driver merge), never a global sort. The oracle replays the
    // identical hash order.
    "q102_corpus_sample" -> ((s, d) =>
      graft.llm.TrainingOps.sampleGlobalK(
        T.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", k = 100, salt = "s6")
      .orderBy("doc_id")),

    // [EXT] incremental dedup: a derived "tonight's crawl" batch
    // (every 10th doc, half verbatim = exact dups, half with one
    // appended token = near dups) admitted against the full corpus.
    // Oracle replays the content-hash membership and the q32 SHA
    // banding cross-join, counting distinct corpus bucket-mates.
    "q103_dedup_incremental" -> ((s, d) => {
      val corpus = T.documents(s, d)
      val newb = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          when(pmod(col("doc_id"), lit(20)) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" almost"))).as("text"))
      graft.llm.Dedup.dedupIncremental(newb, corpus, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // [EXT] full Okapi BM25 ranking (q66's micropoint skeleton + idf
    // and length normalization): the per-row double expression has one
    // evaluation order, mirrored verbatim in the oracle; rounding to
    // long micropoints happens BEFORE the per-doc sum, so aggregation
    // order cannot change the ranking.
    "q104_bm25" -> ((s, d) =>
      graft.llm.Search.bm25Search(T.documents(s, d), "doc_id", "text",
        terms = Seq("spark", "join", "window"), k = 20)),

    // [EXT] temperature-weighted domain mixing (p ∝ count^α): exact
    // integer quotas from micropoint-quantized pow weights (BigInt /
    // HUGEINT floor division on both sides), per-domain pick = the
    // quota smallest salted hashes via the bounded-state ksample
    // aggregate. The oracle replays weights, quotas, and hash ranks.
    "q105_temperature_mix" -> ((s, d) =>
      graft.llm.TrainingOps.mixByTemperature(
        T.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "source", totalDocs = 200, alpha = 0.7, salt = "t6")
      .orderBy("source", "rank")),

    // [EXT] budget-limited greedy selection ("the best 20k tokens"):
    // longest-docs-first with an id tiebreak, keep while the running
    // token offset starts inside the budget. Runs the q52 two-phase
    // prefix sum in its single-global-shard degenerate case — the
    // shape a window cumsum would serialize through one task.
    "q106_budget_select" -> ((s, d) =>
      graft.llm.TrainingOps.selectByTokenBudget(
        T.documents(s, d).select(col("doc_id"), col("n_chars"),
          graft.llm.TextAnalysis.tokenCountWs(col("text")).as("n_tokens")),
        orderBy = struct((-col("n_chars")).as("q"), col("doc_id").as("i")),
        tokens = col("n_tokens"), budget = 20000L)
      .orderBy("doc_id")),

    // [EXT] robots-exclusion filtering (RFC 9309 longest-match, with
    // §2.2.3 wildcards, pattern-octet specificity — the reference-
    // parser convention): planted per-host rule registry exercises
    // longest-match override, deny-all + allow-subtree, tie→allow,
    // the no-rule default-allow arm, a wildcard whose pattern octets
    // TIE the literal allow (`/private/*` vs `/private/1` on
    // `/private/1…` → allow wins the tie), a `$`-anchored extension
    // rule (`/*.php$`, anchor excluded from the count so the
    // `/files/p1.php` literal out-ranks it → allow). The oracle
    // replays the same pattern→regex translation and the
    // pattern-length/allow/pattern ordering with a rank window.
    "q107_robots_filter" -> ((s, d) => {
      import s.implicits._
      val id = col("doc_id")
      val urls = T.documents(s, d).select(id,
        concat(col("source"), lit(".example.com")).as("host"),
        when(pmod(id, lit(4)) === 0,
            concat(lit("/private/"), id.cast("string")))
          .when(pmod(id, lit(4)) === 1, lit("/public/a"))
          .when(pmod(id, lit(4)) === 2, lit("/public/tmp/x"))
          .otherwise(concat(lit("/files/p"), pmod(id, lit(3)).cast("string"),
            lit(".php"))).as("path"))
      val rules = Seq(
        ("src0.example.com", false, "/private/"),
        ("src0.example.com", true, "/private/1"),
        ("src0.example.com", false, "/private/*"),
        ("src1.example.com", false, "/"),
        ("src1.example.com", true, "/public/"),
        ("src2.example.com", false, "/public/tmp/"),
        ("src2.example.com", true, "/public/*/x"),
        ("src3.example.com", true, "/private/"),
        ("src3.example.com", false, "/private/"),
        ("src3.example.com", false, "/*.php$"),
        ("src3.example.com", true, "/files/p1.php")
      ).toDF("host", "allow", "prefix")
      graft.llm.Crawl.robotsFilter(urls, "doc_id", "host", "path", rules)
        .orderBy("doc_id")
    }),

    // [EXT] outlink extraction for the crawl frontier, across HTML's
    // three href quoting forms: root-relative links resolve against
    // the base (a planted <base href> on every 5th doc, else the
    // page's own URL), dir-relative links resolve against the base
    // DIRECTORY with dot-segment normalization, protocol-relative
    // resolves as https, absolute links pass, fragments / mailto
    // drop. Map-only; the oracle replays the same token scan,
    // resolution chain, and a 10-round dot-segment recursion.
    "q108_extract_links" -> ((s, d) => {
      val id = col("doc_id")
      val html = concat(
        when(pmod(id, lit(5)) === 0,
          lit("<base href=\"https://b.example.org/dir/\">"))
          .otherwise(lit("")),
        lit("<p><a href=\"/about\">a</a>"),
        lit("<a href='/sq/"), pmod(id, lit(7)).cast("string"),
        lit("'>s</a>"),
        lit("<a href=img/i"), pmod(id, lit(5)).cast("string"),
        lit(".png>u</a>"),
        lit("<a href=\"https://ext.example.org/p/"), id.cast("string"),
        lit("\">e</a>"),
        when(pmod(id, lit(3)) === 0, lit("<a href=\"#top\">t</a>"))
          .otherwise(lit("<a href=\"../rel\">r</a>")),
        when(pmod(id, lit(2)) === 0,
            lit("<a href=\"mailto:x@y\">m</a>" +
              "<a href=\"//cdn.example.net/z\">c</a>"))
          .otherwise(lit("<a href=\"/item?id=1\">i</a>")))
      graft.llm.Crawl.extractLinks(
          T.documents(s, d).select(id, html.as("html"),
            concat(col("source"), lit(".example.com")).as("host"),
            concat(lit("/sec/p"), pmod(id, lit(4)).cast("string"),
              lit("/index.html")).as("path")),
          "doc_id", "html", "host", "path")
        .orderBy("doc_id", "link_idx")
    }),

    // [EXT] crawl-graph PageRank, 3 iterations, exact integer
    // micro-unit arithmetic: a planted 2-regular doc graph
    // (i → 7i mod N, i → 13i+1 mod N); the oracle unrolls the same
    // three integer iterations — bit-identical ranks.
    "q109_pagerank" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      val withN = docs.join(broadcast(n))
      val e = withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7, col("n")).as("dst"))
        .union(withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 1, col("n")).as("dst")))
      graft.llm.Crawl.pageRankInt(e, iters = 3).orderBy("node")
    }),

    // [EXT] main-content extraction (jusText-lite boilerplate
    // removal): planted page = nav links + inline script/style + an
    // HTML comment + article prose + a short block + a share widget +
    // footer links; only the prose survives the (length, link-density)
    // gates — the script/style BODIES are long and link-free, so they
    // would pass both gates if the element spans were not dropped
    // before scoring. Integer cross-multiplication verdicts; the
    // oracle replays the identical span-removal/split/strip/score.
    "q110_main_content" -> ((s, d) => {
      val html = concat(
        lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about</a> " +
          "<a href=\"/contact\">contact</a></nav>" +
          "<script type=\"text/javascript\">var tracker = 1; " +
          "function track(x){return x + 42;}</script>" +
          "<style>.share{color:red;font-size:12px;margin:0 auto}</style>" +
          "<!-- rendered by engine --><div id=\"main\"><p>"),
        col("text"),
        lit("</p><p>short</p><div class=\"share\">" +
          "<a href=\"/s\">share this page now</a></div>" +
          "<footer><a href=\"/terms\">terms</a> " +
          "<a href=\"/privacy\">privacy</a></footer></div>"))
      // r15: span-removal + gate lambdas single-task — fan out first
      graft.ops.Par.fanOut(
          T.documents(s, d).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"),
          graft.llm.TextAnalysis.mainContent(html).as("content"))
        .orderBy("doc_id")
    }),

    // [EXT] the END-TO-END crawl ingestion chain in ONE call: WARC
    // record parse (q101's Generator) → HTTP 200 filter → main-content
    // extraction (q110's gates) → token count + keep verdict. A third
    // of the pages are link-farm-only (no prose blocks) and fail the
    // keep gate with empty content. Map-only throughout — the whole
    // chain is one Generate + in-array lambdas, no shuffle before the
    // final ORDER BY. The oracle rebuilds the response analytically
    // and replays the q110 strip/score lambdas.
    "q112_warc_ingest" -> ((s, d) => {
      val k = col("p_partkey")
      val crlf = "\r\n"
      val prosePage = concat(
        lit("<nav><a href=\"/\">home</a> <a href=\"/a\">about</a></nav>" +
          "<script>var hits = 0; function bump(n){return n + hits;}" +
          "</script><p>"),
        col("p_name"), lit(" "), col("p_name"),
        lit(" quality prose body</p><div class=\"share\">" +
          "<a href=\"/s\">share this page</a></div>"))
      val farmPage = lit("<nav><a href=\"/\">home</a> " +
        "<a href=\"/a\">about</a></nav>" +
        "<style>.share{display:flex;align-items:center}</style>" +
        "<div class=\"share\"><a href=\"/s\">share this page</a></div>")
      val html = when(pmod(k, lit(3)) === 0, farmPage).otherwise(prosePage)
      val status = when(pmod(k, lit(2)) === 0, lit("200 OK"))
        .otherwise(lit("404 Not Found"))
      val block = concat(lit("HTTP/1.1 "), status,
        lit(crlf + "Content-Type: text/html" + crlf + crlf), html)
      val rec = concat(
        lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
          "WARC-Target-URI: http://example.com/p/"), k.cast("string"),
        lit(crlf + "Content-Type: application/http; msgtype=response" +
          crlf + "Content-Length: "), length(block).cast("string"),
        lit(crlf + crlf), block, lit(crlf + crlf))
      // r15: WARC parse + strip/score lambdas single-task — fan out
      graft.ops.Par.fanOut(
          T.part(s, d).select(k, col("p_name")), k)
        .select(k.as("id"), rec.cast("binary").as("w"))
        .select(col("id"),
          graft.ops.functions.warcRecords(col("w"))
            .as(Seq("rec_idx", "warc_type", "target_uri", "warc_date",
              "content_type", "content_length", "http_status",
              "http_content_type", "body")))
        .filter(col("http_status") === 200)
        .select(col("id"), col("http_status"),
          graft.llm.TextAnalysis.mainContent(col("body").cast("string"))
            .as("content"))
        .withColumn("n_tokens",
          graft.llm.TextAnalysis.tokenCountWs(col("content")))
        .withColumn("keep", length(col("content")) >= 20)
        .orderBy("id")
    }),

    // [EXT] FORWARD as-of join (next-order-after-event, the
    // next-quote-after-trade shape): q45's backward twin — smallest
    // right time >= left time per key, equal timestamps match. Oracle:
    // DuckDB native ASOF with <=.
    "q113_asof_forward" -> ((s, d) => {
      val ev = T.events(s, d)
      val left = ev.select(col("event_id"), col("user_id").as("custkey"),
        T.tsMillis(ev, "ts").as("t_ms"))
      val right = T.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"),
          unix_millis(col("o_orderdate")
            .cast(org.apache.spark.sql.types.TimestampType)).as("od_ms"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.ops.relational.asofJoin(left, right, Seq("custkey"),
          "t_ms", "od_ms", direction = "forward")
        .select("event_id", "custkey", "o_orderkey", "order_date")
        .orderBy("event_id")
    }),

    // [EXT] WITHIN-doc repeated-unit removal (intra-doc complement of
    // q100's cross-doc dedup): every doc carries its own promo line
    // twice and a blank; the repeat drops, the first stays, blanks
    // stay. Map-only; the oracle replays the indexed first-occurrence
    // filter in DuckDB lambdas.
    "q111_intra_doc_dedup" -> ((s, d) =>
      graft.llm.Dedup.dedupUnitsWithinDoc(
        T.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit("\npromo block "), pmod(col("doc_id"), lit(7)).cast("string"),
            lit("\n\npromo block "), pmod(col("doc_id"), lit(7)).cast("string"),
            lit("\nunique tail "), col("doc_id").cast("string")).as("text")),
        "doc_id", "text")
      .orderBy("doc_id"))
  )

  /** Planted per-language fixture sentences for q99 (index = key %
    * LangFixtures.size; lowercase, apostrophe-free so both engines
    * embed them verbatim), paired 1:1 with [[LangFixtureLangs]] — the
    * label the bundled model must assign each sentence (spec-pinned
    * in TextAnalysisSpec). Rows 14+ are the round-8 breadth cohort;
    * close-pair sentences (id/ms, cs/sk, da/nb, fi/et, hr/sl,
    * ru/uk/bg/sr Cyrillic) deliberately contain the orthographic
    * discriminators their sibling lacks. */
  val LangFixtures: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog and the children are playing in the garden with you",
    "die kinder spielen auf der wiese und der hund ist schon wieder zu hause bei den eltern",
    "les enfants vont à la maison pour manger et le petit chat est sur la table avec eux",
    "el perro y el gato están en la casa que los niños tienen para jugar con ellos",
    "il cane che gioca nella casa con i bambini per una giornata di sole e di vento",
    "o cão não está na casa que as crianças têm para a educação e para o coração",
    "het huis van de man is niet ver van de school en een ijsje voor het kind van de buurman",
    "det är en dag som är för alla och barnen ska till skolan på morgonen med en vän",
    "дети играют в саду и собака уже дома у родителей что они любят",
    "الاطفال يلعبون في البيت مع الكلب والقطة في الحديقة من الصباح",
    "孩子们在花园里玩耍我们的房子很大他们喜欢这个地方",
    "こどもたちはにわであそんでいますわたしたちのいえはおおきいです",
    "아이들은 정원에서 놀고 있다 우리 집은 아주 크다 그들은 이곳을 좋아한다",
    "çocuklar bahçede oynuyor ve bir köpek var evde onlar bu yeri çok seviyor ve annesi bir çay içiyor",
    "کودکان در باغ بازی می کنند خانه ی ما بزرگ است که همه جای آن را دوست دارند و کتاب های خوبی است",
    "dzieci bawią się w ogrodzie i pies jest w domu nie mają przy sobie niczego ale się bardzo cieszą przez cały dzień",
    "trẻ em chơi trong vườn và ngôi nhà của chúng tôi rất lớn các em rất thích nơi này và một người không thể quên",
    "anak anak bermain di taman dan rumah kami sangat besar mereka bisa datang karena tempat ini bagus dan ada uang yang cukup",
    "kanak kanak bermain di taman dan rumah kami sangat besar mereka boleh datang kerana tempat itu bagus dan ada wang yang cukup",
    "děti si hrají na zahradě a pes je doma při domě je to pěkné že mají tři přátele a že je ten den dobrý",
    "deti sa hrajú na záhrade a pes je doma ľudia sú radi že môže byť pekný deň a deti sú tu s nami",
    "діти граються у саду і собака вже вдома що вони люблять і мама знає що все добре і пес має що їсти",
    "децата играят в градината и кучето е вкъщи домът е голям и децата обичат това място където играят",
    "она је у кући и пас је ту са њима породица има велику кућу и то је место које они воле",
    "copiii se joacă în grădină și câinele doarme acasă în casă și copiii vor să vadă locul frumos și să cânte împreună",
    "a gyerekek a kertben játszanak és a kutya otthon van az egyik házban egy nagy fa van és a gyerekek nagyon boldogok hogy ott vannak",
    "børnene vil ikke gå væk af huset og vi kan lide at lege højt i haven og så går vi tilbage og hygger os af gode grunde",
    "barna vil ikke gå vekk av huset og vi kan like å leke høyt i hagen og så går vi tilbake og koser oss av gode grunner",
    "lapset leikkivät puutarhassa ja koira on kotona meillä on iso talo ja he ovat siellä koko päivän ja saavat hyvää ruokaa",
    "lapsed mängivad aias ja koer on kodus meie maja on suur ja nad on seal iga päev ja kõik on olnud hästi tehtud",
    "เด็ก เล่น ใน สวน และ สุนัข อยู่ ที่ บ้าน ของ เรา และ เด็ก ชอบ การ เล่น ที่ นี่",
    "बच्चे बगीचे में खेलते हैं और कुत्ता घर में है हमारा घर बड़ा है और बच्चों को यह जगह पसंद है",
    "শিশুরা বাগানে খেলা করে এবং কুকুর ঘরে আছে আমাদের ঘর বড় এবং শিশুরা জায়গাটা ভালোবাসে",
    "τα παιδια παιζουν στον κηπο και ο σκυλος ειναι στο σπιτι και τα παιδια αγαπουν αυτο το μερος της πολης",
    "הילדים משחקים בגן והכלב נמצא בבית של המשפחה הם אוהבים את המקום הזה ואת הבית של כולם",
    "djeca se igraju u vrtu i pas je kod kuće imamo veliku kuću i djeca vole ići u školu i pjevati cijeli dan",
    "otroci se igrajo v vrtu in pes je doma v hiši imamo veliko hišo in otroci imajo radi šolo in se veselijo",
    "els nens passegen amb el gos al carrer i canten amb els amics aquesta tarda els nens mengen el sopar amb els pares",
    "vaikai žaidžia sode ir šuo yra namuose kad daug žmonių nori dainuoti ir vaikai turi daug gerų dienų",
    "bērni spēlējas dārzā un suns ir mājās un bērniem patīk tā vieta kur ir saule un viņi dzied katru dienu")

  /** Expected model label per [[LangFixtures]] row. */
  val LangFixtureLangs: Seq[String] = Seq(
    "en", "de", "fr", "es", "it", "pt", "nl", "sv", "ru", "ar", "zh",
    "ja", "ko",
    "tr", "fa", "pl", "vi", "id", "ms", "cs", "sk", "uk", "bg", "sr",
    "ro", "hu", "da", "nb", "fi", "et", "th", "hi", "bn", "el", "he",
    "hr", "sl", "ca", "lt", "lv")

  /** DuckDB oracles (analytic — no binary handling). */
  val oracleSql: Map[String, String] = Map(
    "q98_mp4_metadata" ->
      """SELECT p_partkey AS id, 'mp4' AS format,
        |  CAST(p_partkey % 300 + 1 AS INT) AS width,
        |  CAST(p_partkey % 200 + 1 AS INT) AS height,
        |  CAST(p_partkey % 5000 + 1000 AS BIGINT) AS duration_ms,
        |  CAST(p_partkey % 50 + 1 AS INT) AS frame_count,
        |  'avc1' AS codec
        |FROM part ORDER BY id""".stripMargin,
    "q99_langid" -> {
      val fixtures = LangFixtures.zipWithIndex
        .map { case (t, i) => s"($i,'$t')" }.mkString(",")
      s"""WITH s(k, text) AS (VALUES $fixtures),
        |d AS (SELECT doc_id, s.text FROM documents s2
        |      JOIN s ON s2.doc_id % ${LangFixtures.size} = s.k),
        |tri AS (SELECT doc_id, unnest(list_transform(
        |          generate_series(1, length(text) - 2),
        |          i -> substr(lower(text), CAST(i AS INT), 3))) AS g
        |        FROM d),
        |w(lang, g, wt) AS
        |  (VALUES ${graft.expressions.LangIdKernel.modelSqlValues}),
        |sc AS (SELECT doc_id, lang, CAST(sum(wt) AS BIGINT) AS score
        |       FROM tri JOIN w USING (g) GROUP BY 1, 2),
        |r AS (SELECT doc_id, lang, score, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |      FROM sc WHERE score > 0)
        |SELECT d.doc_id, coalesce(b.lang, 'und') AS lang,
        |  CAST(coalesce(b.score, 0) AS BIGINT) AS score
        |FROM d LEFT JOIN (SELECT doc_id, lang, score FROM r
        |                  WHERE rn = 1) b USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    },
    "q100_para_dedup" ->
      """WITH doc AS (
        |  SELECT doc_id, text
        |    || chr(10) || chr(10) || 'sponsored content visit our partner store'
        |    || chr(10) || chr(10) || 'cohort ' || CAST(doc_id % 5 AS VARCHAR)
        |    || ' promo paragraph block'
        |    || chr(10) || chr(10) || 'unique paragraph '
        |    || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents),
        |a AS (SELECT doc_id,
        |        string_split(text, chr(10) || chr(10)) AS arr FROM doc),
        |ix AS (SELECT doc_id, arr,
        |         unnest(generate_series(1, len(arr))) AS i FROM a),
        |l AS (SELECT doc_id, i, arr[i] AS line, trim(arr[i]) AS t
        |      FROM ix WHERE trim(arr[i]) <> ''),
        |d AS (SELECT t, count(DISTINCT doc_id) AS df FROM l GROUP BY 1),
        |f AS (SELECT l.doc_id, l.i, l.line, d.df < 3 AS keep
        |      FROM l JOIN d USING (t))
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN keep THEN line END,
        |                      chr(10) || chr(10) ORDER BY i), '') AS clean_text,
        |  count(*) AS n_units,
        |  count(*) FILTER (WHERE NOT keep) AS n_removed
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q101_warc_extract" ->
      """WITH r0 AS (
        |  SELECT p_partkey AS id, 0 AS rec_idx, 'response' AS warc_type,
        |    'http://example.com/doc/' || CAST(p_partkey AS VARCHAR) AS target_uri,
        |    '2024-01-01T00:00:00Z' AS warc_date,
        |    CAST(length('HTTP/1.1 '
        |      || CASE WHEN p_partkey % 2 = 0 THEN '200 OK'
        |              ELSE '404 Not Found' END
        |      || chr(13) || chr(10) || 'Content-Type: text/html'
        |      || chr(13) || chr(10) || chr(13) || chr(10)
        |      || 'body ' || repeat('x', CAST(p_partkey % 17 AS INT)))
        |      AS BIGINT) AS content_length,
        |    CAST(CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 404 END AS INT)
        |      AS http_status,
        |    'text/html' AS http_content_type,
        |    'body ' || repeat('x', CAST(p_partkey % 17 AS INT)) AS body_text
        |  FROM part),
        |r1 AS (
        |  SELECT p_partkey AS id, 1 AS rec_idx, 'metadata' AS warc_type,
        |    'http://example.com/doc/' || CAST(p_partkey AS VARCHAR) AS target_uri,
        |    CAST(NULL AS VARCHAR) AS warc_date,
        |    CAST(length('k: ' || CAST(p_partkey AS VARCHAR)) AS BIGINT)
        |      AS content_length,
        |    CAST(NULL AS INT) AS http_status,
        |    CAST(NULL AS VARCHAR) AS http_content_type,
        |    'k: ' || CAST(p_partkey AS VARCHAR) AS body_text
        |  FROM part)
        |SELECT * FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1)
        |ORDER BY id, rec_idx""".stripMargin,
    "q102_corpus_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source FROM documents
        |  ORDER BY sha256('s6:' || CAST(doc_id AS VARCHAR)) LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "q103_dedup_incremental" ->
      """WITH newb AS (
        |  SELECT doc_id + 1000000 AS id,
        |    CASE WHEN doc_id % 20 = 0 THEN text
        |         ELSE text || ' almost' END AS text
        |  FROM documents WHERE doc_id % 10 = 0),
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
        |ORDER BY doc_id""".stripMargin,
    // e-notation literals force DOUBLE (a bare 0.5 is DECIMAL in
    // DuckDB, whose division scale would diverge from Spark's double
    // math); the expression tree mirrors bm25Search token for token.
    "q104_bm25" ->
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
        |d AS (SELECT doc_id, dl, term, tf,
        |        count(*) OVER (PARTITION BY term) AS df_t FROM f)
        |SELECT doc_id,
        |  CAST(sum(CAST(round(1e6 *
        |    ln(1e0 + (n_docs - df_t + 5e-1) / (df_t + 5e-1)) *
        |    (tf * (1.2e0 + 1e0)) /
        |    (tf + 1.2e0 * ((1e0 - 7.5e-1) +
        |      7.5e-1 * dl * n_docs / sum_dl))) AS BIGINT)) AS BIGINT)
        |    AS score,
        |  count(*) AS n_terms
        |FROM d, stats GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q105_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents
        |           WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |           GROUP BY 1),
        |w AS (SELECT source,
        |        CAST(round(1e6 * pow(n, 7e-1)) AS BIGINT) AS w FROM c),
        |tw AS (SELECT sum(CAST(w AS HUGEINT)) AS tot FROM w),
        |t AS (SELECT source,
        |        CAST(CAST(200 AS HUGEINT) * w // tot AS BIGINT) AS target
        |      FROM w, tw),
        |d AS (SELECT DISTINCT source, CAST(doc_id AS VARCHAR) AS id
        |      FROM documents
        |      WHERE doc_id IS NOT NULL AND source IS NOT NULL),
        |h AS (SELECT source, id,
        |        ('0x' || substr(sha256('t6' || id), 1, 15))::BIGINT AS h
        |      FROM d),
        |r AS (SELECT source, id,
        |        row_number() OVER (PARTITION BY source ORDER BY h, id)
        |          AS rn FROM h)
        |SELECT r.source, CAST(rn AS INT) AS rank, id AS doc_id
        |FROM r JOIN t USING (source) WHERE rn <= target
        |ORDER BY source, rank""".stripMargin,
    "q106_budget_select" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_chars, n_tokens,
        |        sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM t)
        |SELECT doc_id, n_chars, n_tokens FROM c
        |WHERE cum - n_tokens < 20000 ORDER BY doc_id""".stripMargin,
    "q107_robots_filter" ->
      """WITH u AS (
        |  SELECT doc_id, source || '.example.com' AS host,
        |    CASE doc_id % 4
        |      WHEN 0 THEN '/private/' || CAST(doc_id AS VARCHAR)
        |      WHEN 1 THEN '/public/a'
        |      WHEN 2 THEN '/public/tmp/x'
        |      ELSE '/files/p' || CAST(doc_id % 3 AS VARCHAR) || '.php'
        |    END AS path
        |  FROM documents),
        |r(host, allow, prefix) AS (VALUES
        |  ('src0.example.com', false, '/private/'),
        |  ('src0.example.com', true, '/private/1'),
        |  ('src0.example.com', false, '/private/*'),
        |  ('src1.example.com', false, '/'),
        |  ('src1.example.com', true, '/public/'),
        |  ('src2.example.com', false, '/public/tmp/'),
        |  ('src2.example.com', true, '/public/*/x'),
        |  ('src3.example.com', true, '/private/'),
        |  ('src3.example.com', false, '/private/'),
        |  ('src3.example.com', false, '/*.php$'),
        |  ('src3.example.com', true, '/files/p1.php')),
        |r2 AS (SELECT host, allow, prefix,
        |  length(prefix)
        |    - CASE WHEN prefix LIKE '%$' THEN 1 ELSE 0 END AS plen,
        |  '^' || replace(regexp_replace(
        |      CASE WHEN prefix LIKE '%$'
        |        THEN substr(prefix, 1, length(prefix)-1) ELSE prefix END,
        |      '([.^+?(){}\[\]|$\\])', '\\\1', 'g'), '*', '.*')
        |    || CASE WHEN prefix LIKE '%$' THEN '$' ELSE '' END AS rx
        |  FROM r),
        |m AS (SELECT u.doc_id, r2.allow, r2.prefix,
        |        row_number() OVER (PARTITION BY u.doc_id
        |          ORDER BY r2.plen DESC,
        |            r2.allow DESC, r2.prefix DESC) AS rn
        |      FROM u JOIN r2 ON u.host = r2.host
        |        AND regexp_matches(u.path, r2.rx))
        |SELECT u.doc_id, u.host, u.path,
        |  coalesce(b.allow, true) AS allowed,
        |  b.prefix AS matched_prefix
        |FROM u LEFT JOIN (SELECT doc_id, allow, prefix FROM m
        |                  WHERE rn = 1) b USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q108_extract_links" ->
      """WITH RECURSIVE h AS (
        |  SELECT doc_id, source || '.example.com' AS host,
        |    '/sec/p' || CAST(doc_id % 4 AS VARCHAR) || '/index.html' AS path,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN '<base href="https://b.example.org/dir/">' ELSE '' END
        |    || '<p><a href="/about">a</a>'
        |    || '<a href=''/sq/' || CAST(doc_id % 7 AS VARCHAR) || '''>s</a>'
        |    || '<a href=img/i' || CAST(doc_id % 5 AS VARCHAR) || '.png>u</a>'
        |    || '<a href="https://ext.example.org/p/'
        |    || CAST(doc_id AS VARCHAR) || '">e</a>'
        |    || CASE WHEN doc_id % 3 = 0 THEN '<a href="#top">t</a>'
        |            ELSE '<a href="../rel">r</a>' END
        |    || CASE WHEN doc_id % 2 = 0
        |            THEN '<a href="mailto:x@y">m</a>'
        |                 || '<a href="//cdn.example.net/z">c</a>'
        |            ELSE '<a href="/item?id=1">i</a>' END AS html
        |  FROM documents),
        |b AS (SELECT doc_id, host, path, html,
        |    CASE WHEN bq LIKE '"%' OR bq LIKE '''%'
        |         THEN substr(bq, 2, length(bq)-2) ELSE bq END AS braw
        |  FROM (SELECT h.*, regexp_extract(html,
        |      '(?i)<base\s[^>]*href\s*=\s*("[^"]*"|''[^'']*''|[^\s"''>]+)',
        |      1) AS bq FROM h)),
        |bb AS (SELECT doc_id, host, path, html,
        |    CASE WHEN regexp_matches(braw, '(?i)^https?://') THEN braw
        |    END AS babs FROM b),
        |bs AS (SELECT doc_id, html,
        |    coalesce(regexp_extract(babs, '(?i)^https?://[^/?#]*', 0),
        |             'https://' || host) AS broot,
        |    CASE WHEN babs IS NOT NULL THEN
        |        (CASE WHEN regexp_extract(babs,
        |                '(?i)^https?://[^/?#]*(/[^?#]*)', 1) = ''
        |              THEN '/'
        |              ELSE regexp_extract(babs,
        |                '(?i)^https?://[^/?#]*(/[^?#]*)', 1) END)
        |      ELSE coalesce(path, '/') END AS bpath
        |  FROM bb),
        |bd AS (SELECT doc_id, html, broot,
        |    CASE WHEN regexp_extract(bpath, '^(.*/)', 1) = '' THEN '/'
        |         ELSE regexp_extract(bpath, '^(.*/)', 1) END AS bdir
        |  FROM bs),
        |tok AS (SELECT doc_id, broot, bdir,
        |    regexp_extract_all(html,
        |      '(?i)<(?:a|area)\s[^>]*?href\s*=\s*("[^"]*"|''[^'']*''|[^\s"''>]+)',
        |      1) AS toks
        |  FROM bd),
        |ix AS (SELECT doc_id, broot, bdir, toks,
        |    unnest(generate_series(1, len(toks))) AS i FROM tok),
        |t2 AS (SELECT doc_id, broot, bdir, i,
        |    CASE WHEN toks[i] LIKE '"%' OR toks[i] LIKE '''%'
        |         THEN substr(toks[i], 2, length(toks[i])-2)
        |         ELSE toks[i] END AS l
        |  FROM ix),
        |res AS (SELECT doc_id, i,
        |    CASE WHEN regexp_matches(l, '(?i)^https?://') THEN l
        |         WHEN regexp_matches(l, '^[A-Za-z][A-Za-z0-9+.-]*:')
        |           THEN NULL
        |         WHEN l LIKE '//%' THEN 'https:' || l
        |         ELSE NULL END AS final,
        |    CASE WHEN regexp_matches(l, '(?i)^https?://') THEN NULL
        |         WHEN regexp_matches(l, '^[A-Za-z][A-Za-z0-9+.-]*:')
        |           THEN NULL
        |         WHEN l LIKE '//%' THEN NULL
        |         WHEN l LIKE '/%' THEN broot
        |         WHEN l = '' OR l LIKE '#%' OR l LIKE '?%' THEN NULL
        |         ELSE broot END AS root,
        |    CASE WHEN regexp_matches(l, '(?i)^https?://') THEN NULL
        |         WHEN regexp_matches(l, '^[A-Za-z][A-Za-z0-9+.-]*:')
        |           THEN NULL
        |         WHEN l LIKE '//%' THEN NULL
        |         WHEN l LIKE '/%' THEN l
        |         WHEN l = '' OR l LIKE '#%' OR l LIKE '?%' THEN NULL
        |         ELSE bdir || l END AS p
        |  FROM t2),
        |rec AS (
        |  SELECT doc_id, i, final, root,
        |    regexp_replace(regexp_replace(p,
        |      '/\.$', '/./'), '/\.\.$', '/../') AS p, 0 AS it
        |  FROM res
        |  UNION ALL
        |  SELECT doc_id, i, final, root,
        |    regexp_replace(regexp_replace(regexp_replace(p,
        |      '/\./', '/', 'g'), '/[^/]+/\.\./', '/', 'g'),
        |      '^/\.\./', '/'), it + 1
        |  FROM rec WHERE it < 10),
        |kept AS (SELECT doc_id, i, coalesce(final, root || p) AS url
        |  FROM rec WHERE it = 10 AND coalesce(final, root || p) IS NOT NULL)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
        |    AS INT) AS link_idx,
        |  url
        |FROM kept ORDER BY doc_id, link_idx""".stripMargin,
    "q109_pagerank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS (SELECT doc_id AS src, (doc_id * 7) % n AS dst
        |      FROM documents, nn
        |      UNION ALL
        |      SELECT doc_id AS src, (doc_id * 13 + 1) % n AS dst
        |      FROM documents, nn),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |c1 AS (SELECT e.dst AS node, sum(r0.rank // od.outdeg) AS cs
        |       FROM e JOIN r0 ON e.src = r0.node
        |       JOIN od ON e.src = od.src GROUP BY 1),
        |r1 AS (SELECT nodes.node,
        |         CAST(150000 + (85 * coalesce(cs, 0)) // 100 AS BIGINT)
        |           AS rank
        |       FROM nodes LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.dst AS node, sum(r1.rank // od.outdeg) AS cs
        |       FROM e JOIN r1 ON e.src = r1.node
        |       JOIN od ON e.src = od.src GROUP BY 1),
        |r2 AS (SELECT nodes.node,
        |         CAST(150000 + (85 * coalesce(cs, 0)) // 100 AS BIGINT)
        |           AS rank
        |       FROM nodes LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.dst AS node, sum(r2.rank // od.outdeg) AS cs
        |       FROM e JOIN r2 ON e.src = r2.node
        |       JOIN od ON e.src = od.src GROUP BY 1),
        |r3 AS (SELECT nodes.node,
        |         CAST(150000 + (85 * coalesce(cs, 0)) // 100 AS BIGINT)
        |           AS rank
        |       FROM nodes LEFT JOIN c3 USING (node))
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,
    "q110_main_content" ->
      """WITH h AS (SELECT doc_id,
        |  '<nav><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav><script type="text/javascript">var tracker = 1; function track(x){return x + 42;}</script><style>.share{color:red;font-size:12px;margin:0 auto}</style><!-- rendered by engine --><div id="main"><p>'
        |  || text ||
        |  '</p><p>short</p><div class="share"><a href="/s">share this page now</a></div><footer><a href="/terms">terms</a> <a href="/privacy">privacy</a></footer></div>'
        |  AS html FROM documents),
        |hc AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
        |    '(?is)<noscript[^>]*>.*?</noscript\s*>', ' ', 'g') AS html
        |  FROM h),
        |s AS (SELECT doc_id, list_transform(
        |        regexp_split_to_array(html,
        |          '(?i)</?(?:p|div|td|th|h[1-6]|li|ul|ol|table|tr|article|section|header|footer|nav|aside|blockquote|br)[^>]*>'),
        |        x -> struct_pack(
        |          t := trim(regexp_replace(replace(replace(replace(replace(replace(
        |                 regexp_replace(x, '<[^>]+>', ' ', 'g'),
        |                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |                 '&amp;', '&'), '\s+', ' ', 'g')),
        |          a := coalesce(list_sum(list_transform(
        |                 regexp_extract_all(x, '(?i)<a[^>]*>([^<]*)</a>', 1),
        |                 y -> length(y))), 0))) AS blks
        |      FROM hc),
        |k AS (SELECT doc_id, list_filter(blks,
        |        b -> length(b.t) >= 20 AND b.a * 100 <= 30 * length(b.t))
        |        AS kept
        |      FROM s)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_transform(kept, b -> b.t),
        |    chr(10)), '') AS content
        |FROM k ORDER BY doc_id""".stripMargin,
    "q113_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id AS custkey, epoch_ms(ts) AS t_ms
        |  FROM events),
        |o AS (
        |  SELECT o_custkey AS custkey, epoch_ms(o_orderdate) AS od_ms,
        |         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |         max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT e.event_id, e.custkey, o.o_orderkey, o.order_date
        |FROM e ASOF LEFT JOIN o
        |  ON e.custkey = o.custkey AND e.t_ms <= o.od_ms
        |ORDER BY event_id""".stripMargin,
    "q112_warc_ingest" ->
      """WITH h AS (SELECT p_partkey AS id,
        |    CASE WHEN p_partkey % 3 = 0
        |      THEN '<nav><a href="/">home</a> <a href="/a">about</a></nav><style>.share{display:flex;align-items:center}</style><div class="share"><a href="/s">share this page</a></div>'
        |      ELSE '<nav><a href="/">home</a> <a href="/a">about</a></nav><script>var hits = 0; function bump(n){return n + hits;}</script><p>'
        |        || p_name || ' ' || p_name
        |        || ' quality prose body</p><div class="share"><a href="/s">share this page</a></div>'
        |    END AS html
        |  FROM part WHERE p_partkey % 2 = 0),
        |hc AS (SELECT id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
        |    '(?is)<noscript[^>]*>.*?</noscript\s*>', ' ', 'g') AS html
        |  FROM h),
        |s AS (SELECT id, html, list_transform(
        |        regexp_split_to_array(html,
        |          '(?i)</?(?:p|div|td|th|h[1-6]|li|ul|ol|table|tr|article|section|header|footer|nav|aside|blockquote|br)[^>]*>'),
        |        x -> struct_pack(
        |          t := trim(regexp_replace(replace(replace(replace(replace(replace(
        |                 regexp_replace(x, '<[^>]+>', ' ', 'g'),
        |                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |                 '&amp;', '&'), '\s+', ' ', 'g')),
        |          a := coalesce(list_sum(list_transform(
        |                 regexp_extract_all(x, '(?i)<a[^>]*>([^<]*)</a>', 1),
        |                 y -> length(y))), 0))) AS blks
        |      FROM hc),
        |c AS (SELECT id, coalesce(array_to_string(list_transform(
        |        list_filter(blks,
        |          b -> length(b.t) >= 20 AND b.a * 100 <= 30 * length(b.t)),
        |        b -> b.t), chr(10)), '') AS content
        |      FROM s)
        |SELECT id, CAST(200 AS INT) AS http_status, content,
        |  CAST(len(regexp_split_to_array(trim(content), '\s+')) AS INT)
        |    AS n_tokens,
        |  length(content) >= 20 AS keep
        |FROM c ORDER BY id""".stripMargin,
    "q111_intra_doc_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text
        |    || chr(10) || 'promo block ' || CAST(doc_id % 7 AS VARCHAR)
        |    || chr(10) || chr(10) || 'promo block '
        |    || CAST(doc_id % 7 AS VARCHAR)
        |    || chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents),
        |u AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM d),
        |k AS (SELECT doc_id, l, list_filter(
        |        list_transform(l, (x, i) -> struct_pack(t := x, i := i)),
        |        s -> trim(s.t) = '' OR len(list_filter(l[1:s.i-1],
        |               p -> trim(p) = trim(s.t))) = 0) AS kept
        |      FROM u)
        |SELECT doc_id,
        |  array_to_string(list_transform(kept, s -> s.t), chr(10))
        |    AS clean_text,
        |  CAST(len(l) AS BIGINT) AS n_units,
        |  CAST(len(l) - len(kept) AS BIGINT) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin
  )
}
