package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** q173+: round-9 additions — the composed crawl cycle and the
  * unigram-LM tokenizer family. Conventions as everywhere: every
  * query ends in a total ORDER BY, every aggregate/computed column
  * is aliased identically in the Spark plan and the DuckDB oracle,
  * floats ride as micro-unit BIGINTs. */
object R10Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
    }))

  val oracleSql: Map[String, String] = Map(
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
