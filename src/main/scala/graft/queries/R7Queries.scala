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
    }),

    // [EXT] end-to-end crawl-frontier construction (the q112 pattern
    // for the crawl side): page HTML → outlink extraction (incl. a
    // dir-relative link that dot-normalizes) → URL canonicalization →
    // DISTINCT frontier → RFC 9309 robots filtering with wildcard
    // rules ('/doc/*' deny overridden by a '/doc/7' literal tie→allow,
    // an ext-host deny-all with an allow '/p/*' carve-out) → the
    // allowed frontier keyed by registrable domain. The per-source
    // rule registry is DERIVED from the corpus (distinct sources), so
    // the whole chain is one composition: extractLinks → urlParts →
    // distinct → robotsFilter → filter. The oracle computes the
    // resolved links analytically (the fixture's three links have
    // closed-form resolutions) and replays the robots translation.
    "q115_crawl_frontier" -> ((s, d) => {
      import s.implicits._
      val id = col("doc_id")
      val html = concat(
        lit("<a href=\"/doc/"), pmod(id, lit(50)).cast("string"),
        lit("\">d</a><a href=\"../shared/page\">s</a>"),
        lit("<a href=\"https://ext.example.org/p/"),
        pmod(id, lit(20)).cast("string"), lit("\">e</a>"))
      val pages = T.documents(s, d).select(id, html.as("html"),
        concat(col("source"), lit(".example.com")).as("host"),
        lit("/sec/a/index.html").as("path"))
      val links = graft.llm.Crawl.extractLinks(
        pages, "doc_id", "html", "host", "path")
      val withParts = links
        .select(col("url"),
          graft.llm.TextAnalysis.urlParts(col("url")).as("u"))
        .select(col("url"), col("u.host").as("lhost"),
          col("u.domain").as("domain"), col("u.path").as("lpath"))
        .distinct()
      val srcHosts = T.documents(s, d).select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("host"))
      val rules = srcHosts
        .select(col("host"), lit(false).as("allow"),
          lit("/doc/*").as("prefix"))
        .union(srcHosts.select(col("host"), lit(true).as("allow"),
          lit("/doc/7").as("prefix")))
        .union(Seq(("ext.example.org", false, "/"),
          ("ext.example.org", true, "/p/*"))
          .toDF("host", "allow", "prefix"))
      graft.llm.Crawl.robotsFilter(withParts, "url", "lhost", "lpath",
          rules)
        .filter(col("allowed"))
        .select(col("domain"), col("url"))
        .orderBy("domain", "url")
    }),

    // [EXT] robots.txt PARSING (the registry materializer): 40 planted
    // per-host robots bodies — comments, an allow-all empty Disallow,
    // an ignored Sitemap key, and on every 3rd host a two-agent group
    // naming the crawler — parsed for agent 'graftbot'. Hosts with an
    // exact-agent group use ONLY its rules (RFC most-specific-match);
    // the rest fall back to the `*` group. The oracle replays the
    // line/key split, the consecutive-UA grouping windows, and the
    // tier selection.
    "q116_robots_parse" -> ((s, d) => {
      val hosts = T.documents(s, d)
        .select(pmod(col("doc_id"), lit(40)).as("hi")).distinct()
      val txt = concat(
        lit("# robots for host\nUser-agent: *\n" +
          "Disallow: /private/   # keep out\nAllow: /private/open\n" +
          "Disallow:\n"),
        when(pmod(col("hi"), lit(3)) === 0,
          lit("\nUser-agent: graftbot\nUser-agent: otherbot\n" +
            "Disallow: /bot/*\nAllow: /bot/ok$\n" +
            "Disallow:\t/bot/tmp/\n")).otherwise(lit("")),
        lit("Sitemap: https://example.com/s.xml\n"))
      graft.llm.Crawl.parseRobotsTxt(
          hosts.select(
            concat(lit("h"), col("hi").cast("string"),
              lit(".example.com")).as("host"), txt.as("txt")),
          "host", "txt", agent = "graftbot")
        .orderBy("host", "prefix", "allow")
    }),

    // [EXT] sitemap extraction (the other frontier seed): every 4th
    // doc carries a <sitemapindex> (child sitemaps, one without
    // lastmod and a whitespace-padded <loc>), the rest a <urlset>
    // with a lastmod entry, an &amp;-escaped query URL, and a
    // loc-less entry that must drop. Map-only; the oracle computes
    // the rows analytically.
    "q117_sitemap" -> ((s, d) => {
      val id = col("doc_id")
      val k = pmod(id, lit(9))
      val xml = when(pmod(id, lit(4)) === 0,
        concat(
          lit("<?xml version=\"1.0\"?><sitemapindex><sitemap><loc> " +
            "https://s"), k.cast("string"),
          lit(".example.com/sitemap1.xml </loc></sitemap>" +
            "<sitemap><loc>https://s"), k.cast("string"),
          lit(".example.com/sitemap2.xml</loc><lastmod>2024-01-0"),
          (k + 1).cast("string"),
          lit("</lastmod></sitemap></sitemapindex>")))
        .otherwise(concat(
          lit("<?xml version=\"1.0\"?><urlset><url>" +
            "<loc>https://h.example.com/p/"), id.cast("string"),
          lit("</loc><lastmod>2024-02-11</lastmod></url>" +
            "<url><loc>https://h.example.com/q?a=1&amp;b="),
          pmod(id, lit(7)).cast("string"),
          lit("</loc></url>" +
            "<url><lastmod>2024-03-01</lastmod></url></urlset>")))
      graft.llm.Crawl.extractSitemapUrls(
          T.documents(s, d).select(id, xml.as("xml")), "doc_id", "xml")
        .orderBy("doc_id", "entry_idx")
    }),

    // [EXT] deterministic vocabulary build (tokenizer seeding): top
    // 500 whitespace tokens of the documents table with contiguous
    // (count desc, term) ids — the id-assignment window runs over at
    // most `size` rows (parameter-bounded). Oracle replays the same
    // count/rank.
    "q118_vocab" -> ((s, d) =>
      graft.llm.TrainingOps.buildVocab(
        T.documents(s, d).select(col("text")), "text", size = 500)
      .orderBy("token_id")),

    // [EXT] one BPE counting round: the 100 most frequent adjacent
    // character pairs across all token occurrences — the merge
    // candidates of a tokenizer trainer's next round. Oracle replays
    // the substring windows and the (count desc, pair) cut.
    "q119_bpe_pairs" -> ((s, d) =>
      graft.llm.TrainingOps.bpePairCounts(
        T.documents(s, d).select(col("text")), "text", topK = 100)
      .orderBy(col("cnt").desc, col("pair"))),

    // [EXT] canonical-URL extraction: the page-declared dedup key.
    // Five cohorts — absolute rel-first, root-relative href-first
    // (single-quoted value, unquoted rel), dir-relative (unquoted
    // href, resolves against the page path's directory), a `../`
    // canonical (dot-segments pop), and a non-canonical link tag
    // (NULL). Map-only; analytic oracle.
    "q120_canonical" -> ((s, d) => {
      val id = col("doc_id")
      val html = when(pmod(id, lit(5)) === 0,
          concat(lit("<head><link rel=\"canonical\" " +
            "href=\"https://c.example.org/x/"), id.cast("string"),
            lit("\"></head><p>body</p>")))
        .when(pmod(id, lit(5)) === 1,
          concat(lit("<head><link href='/canon/"), id.cast("string"),
            lit("' rel=canonical></head><p>body</p>")))
        .when(pmod(id, lit(5)) === 2,
          concat(lit("<head><link rel=canonical href=sub/c"),
            id.cast("string"), lit(".html></head>")))
        .when(pmod(id, lit(5)) === 3,
          concat(lit("<head><link rel=\"canonical\" href=\"../up/"),
            id.cast("string"), lit("\"></head>")))
        .otherwise(
          lit("<head><link rel=\"stylesheet\" href=\"/s.css\"></head>"))
      T.documents(s, d)
        .select(id, graft.llm.Crawl.canonicalUrl(html,
          concat(col("source"), lit(".example.com")),
          concat(lit("/sec/p"), pmod(id, lit(4)).cast("string"),
            lit("/index.html"))).as("canonical"))
        .orderBy("doc_id")
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
        |ORDER BY doc_id""".stripMargin,
    "q115_crawl_frontier" ->
      """WITH l AS (
        |  SELECT DISTINCT 'https://' || source || '.example.com/doc/'
        |    || CAST(doc_id % 50 AS VARCHAR) AS url FROM documents
        |  UNION
        |  SELECT DISTINCT 'https://' || source
        |    || '.example.com/sec/shared/page' FROM documents
        |  UNION
        |  SELECT DISTINCT 'https://ext.example.org/p/'
        |    || CAST(doc_id % 20 AS VARCHAR) FROM documents),
        |p AS (SELECT url,
        |    regexp_replace(lower(regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)),
        |      '^www\.', '') AS lhost,
        |    regexp_extract(url, '://[^/]*(/[^?#]*)', 1) AS lpath
        |  FROM l),
        |d2 AS (SELECT url, lhost, lpath,
        |    regexp_extract(lhost, '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM p),
        |r(host, allow, prefix) AS (
        |  SELECT DISTINCT source || '.example.com', false, '/doc/*'
        |  FROM documents
        |  UNION ALL
        |  SELECT DISTINCT source || '.example.com', true, '/doc/7'
        |  FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES ('ext.example.org', false, '/'),
        |                        ('ext.example.org', true, '/p/*'))),
        |r2 AS (SELECT host, allow, prefix,
        |  length(prefix)
        |    - CASE WHEN prefix LIKE '%$' THEN 1 ELSE 0 END AS plen,
        |  '^' || replace(regexp_replace(
        |      CASE WHEN prefix LIKE '%$'
        |        THEN substr(prefix, 1, length(prefix)-1) ELSE prefix END,
        |      '([.^+?(){}\[\]|$\\])', '\\\1', 'g'), '*', '.*')
        |    || CASE WHEN prefix LIKE '%$' THEN '$' ELSE '' END AS rx
        |  FROM r),
        |m AS (SELECT d2.url, r2.allow, r2.prefix,
        |        row_number() OVER (PARTITION BY d2.url
        |          ORDER BY r2.plen DESC,
        |            r2.allow DESC, r2.prefix DESC) AS rn
        |      FROM d2 JOIN r2 ON d2.lhost = r2.host
        |        AND regexp_matches(d2.lpath, r2.rx))
        |SELECT d2.domain, d2.url
        |FROM d2 LEFT JOIN (SELECT url, allow FROM m WHERE rn = 1) b
        |  USING (url)
        |WHERE coalesce(b.allow, true)
        |ORDER BY domain, url""".stripMargin,
    "q116_robots_parse" ->
      """WITH hs AS (SELECT DISTINCT doc_id % 40 AS hi FROM documents),
        |t AS (SELECT 'h' || CAST(hi AS VARCHAR) || '.example.com' AS host,
        |    '# robots for host' || chr(10) || 'User-agent: *' || chr(10)
        |    || 'Disallow: /private/   # keep out' || chr(10)
        |    || 'Allow: /private/open' || chr(10) || 'Disallow:' || chr(10)
        |    || CASE WHEN hi % 3 = 0 THEN
        |         chr(10) || 'User-agent: graftbot' || chr(10)
        |         || 'User-agent: otherbot' || chr(10)
        |         || 'Disallow: /bot/*' || chr(10)
        |         || 'Allow: /bot/ok$' || chr(10)
        |         || 'Disallow:' || chr(9) || '/bot/tmp/' || chr(10)
        |       ELSE '' END
        |    || 'Sitemap: https://example.com/s.xml' || chr(10) AS txt
        |  FROM hs),
        |sp AS (SELECT host, regexp_split_to_array(txt, '\r?\n') AS ls
        |  FROM t),
        |ln AS (SELECT host, i,
        |    regexp_replace(regexp_replace(ls[i], '#.*$', ''),
        |      '^[ \t]+|[ \t]+$', '', 'g') AS l
        |  FROM (SELECT host, ls,
        |          unnest(generate_series(1, len(ls))) AS i FROM sp)),
        |kv AS (SELECT host, i,
        |    lower(regexp_extract(l, '^([A-Za-z-]+)\s*:', 1)) AS k,
        |    regexp_replace(regexp_extract(l, '^[A-Za-z-]+\s*:(.*)$', 1),
        |      '^[ \t]+|[ \t]+$', '', 'g') AS v
        |  FROM ln
        |  WHERE lower(regexp_extract(l, '^([A-Za-z-]+)\s*:', 1))
        |    IN ('user-agent', 'allow', 'disallow')),
        |g AS (SELECT host, i, k, v, (k = 'user-agent') AS ua,
        |    CASE WHEN k = 'user-agent' AND NOT coalesce(
        |        lag(k = 'user-agent') OVER (PARTITION BY host ORDER BY i),
        |        false)
        |      THEN 1 ELSE 0 END AS st
        |  FROM kv),
        |g2 AS (SELECT *, sum(st) OVER (PARTITION BY host ORDER BY i
        |    ROWS UNBOUNDED PRECEDING) AS grp FROM g),
        |tier AS (SELECT host, grp,
        |    max(CASE WHEN lower(v) = 'graftbot' THEN 2
        |             WHEN v = '*' THEN 1 ELSE 0 END) AS tier
        |  FROM g2 WHERE ua GROUP BY 1, 2),
        |best AS (SELECT host, max(tier) AS b FROM tier GROUP BY 1),
        |sel AS (SELECT tier.host, grp FROM tier JOIN best USING (host)
        |  WHERE tier = b AND tier > 0)
        |SELECT g2.host AS host, (k = 'allow') AS allow, v AS prefix
        |FROM g2 JOIN sel ON g2.host = sel.host AND g2.grp = sel.grp
        |WHERE NOT ua AND v <> ''
        |ORDER BY host, prefix, allow""".stripMargin,
    "q117_sitemap" ->
      """WITH d AS (SELECT doc_id, doc_id % 9 AS k, doc_id % 7 AS m
        |  FROM documents),
        |rows_ AS (
        |  SELECT doc_id, 0 AS entry_idx, 'sitemap' AS kind,
        |    'https://s' || CAST(k AS VARCHAR) || '.example.com/sitemap1.xml'
        |      AS url,
        |    CAST(NULL AS VARCHAR) AS lastmod
        |  FROM d WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 1, 'sitemap',
        |    'https://s' || CAST(k AS VARCHAR) || '.example.com/sitemap2.xml',
        |    '2024-01-0' || CAST(k + 1 AS VARCHAR)
        |  FROM d WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 0, 'url',
        |    'https://h.example.com/p/' || CAST(doc_id AS VARCHAR),
        |    '2024-02-11'
        |  FROM d WHERE doc_id % 4 <> 0
        |  UNION ALL
        |  SELECT doc_id, 1, 'url',
        |    'https://h.example.com/q?a=1&b=' || CAST(m AS VARCHAR),
        |    NULL
        |  FROM d WHERE doc_id % 4 <> 0)
        |SELECT doc_id, CAST(entry_idx AS INT) AS entry_idx, kind, url,
        |  lastmod
        |FROM rows_ ORDER BY doc_id, entry_idx""".stripMargin,
    "q118_vocab" ->
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1
        |      ORDER BY cnt DESC, term LIMIT 500)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) - 1
        |    AS INT) AS token_id,
        |  term, cnt
        |FROM c ORDER BY token_id""".stripMargin,
    "q119_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |p AS (SELECT unnest(list_transform(
        |        generate_series(1, length(w) - 1),
        |        i -> substr(w, CAST(i AS INT), 2))) AS pair
        |      FROM w WHERE length(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM p GROUP BY 1
        |ORDER BY cnt DESC, pair LIMIT 100""".stripMargin,
    "q120_canonical" ->
      """SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'https://c.example.org/x/' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN 'https://' || source || '.example.com/canon/'
        |                || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN 'https://' || source || '.example.com/sec/p'
        |                || CAST(doc_id % 4 AS VARCHAR) || '/sub/c'
        |                || CAST(doc_id AS VARCHAR) || '.html'
        |    WHEN 3 THEN 'https://' || source || '.example.com/sec/up/'
        |                || CAST(doc_id AS VARCHAR)
        |    ELSE NULL END AS canonical
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
