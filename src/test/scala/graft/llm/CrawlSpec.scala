package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CrawlSpec extends SparkSuite {
  import spark.implicits._

  private val rules = Seq(
    ("a.com", false, "/private/"),
    ("a.com", true, "/private/open"),
    ("b.com", false, "/"),
    ("b.com", true, "/pub/"),
    ("c.com", true, "/x"),
    ("c.com", false, "/x")
  ).toDF("host", "allow", "prefix")

  private val urls = Seq(
    (1L, "a.com", "/private/secret"),   // deny: /private/
    (2L, "a.com", "/private/open/f"),   // allow: longer prefix overrides
    (3L, "a.com", "/index"),            // no matching rule -> allow
    (4L, "b.com", "/anything"),         // deny-all
    (5L, "b.com", "/pub/doc"),          // allow subtree under deny-all
    (6L, "c.com", "/x/y"),              // length tie -> allow wins
    (7L, "d.com", "/whatever")          // host with no rules -> allow
  ).toDF("id", "host", "path")

  test("robotsFilter: longest match, tie->allow, default allow") {
    val r = Crawl.robotsFilter(urls, "id", "host", "path", rules)
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(3), Option(x.getString(4))))).toMap
    assert(r(1L) === ((false, Some("/private/"))))
    assert(r(2L) === ((true, Some("/private/open"))))
    assert(r(3L) === ((true, None)))
    assert(r(4L) === ((false, Some("/"))))
    assert(r(5L) === ((true, Some("/pub/"))))
    assert(r(6L) === ((true, Some("/x"))))
    assert(r(7L) === ((true, None)))
  }

  test("robotsFilter: RFC 9309 wildcards — *, $-anchor, pattern-length specificity") {
    val wr = Seq(
      // wildcard whose PATTERN octets tie the literal allow
      ("w.com", false, "/private/*"),
      ("w.com", true, "/private/1"),
      // $-anchored extension rule ($ excluded from the octet count)
      ("w.com", false, "/*.php$"),
      ("w.com", true, "/files/p1.php"),
      // mid-pattern star
      ("w.com", true, "/pub/*/x"),
      ("w.com", false, "/pub/"),
      // the reference-parser shape: a short wildcard allow must NOT
      // out-rank a longer literal deny (greedy matched-text would)
      ("v.com", true, "/*"),
      ("v.com", false, "/private")
    ).toDF("host", "allow", "prefix")
    val wu = Seq(
      (1L, "w.com", "/private/1"),    // literal 10 ties wildcard 10 -> allow
      (2L, "w.com", "/private/12"),   // same two patterns match -> allow
      (3L, "w.com", "/files/p1.php"), // literal 13 > /*.php$ 6 -> allow
      (4L, "w.com", "/files/p2.php"), // only /*.php$ matches -> deny
      (5L, "w.com", "/files/p2.phpx"),// $ anchor: no .php$ match -> allow
      (6L, "w.com", "/pub/a/x"),      // /pub/*/x 8 > /pub/ 5 -> allow
      (7L, "w.com", "/pub/a/y"),      // only /pub/ matches -> deny
      (8L, "v.com", "/private/x")     // /private 8 > /* 2 -> deny
    ).toDF("id", "host", "path")
    val r = Crawl.robotsFilter(wu, "id", "host", "path", wr)
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(3), Option(x.getString(4))))).toMap
    assert(r(1L) === ((true, Some("/private/1"))))
    assert(r(2L) === ((true, Some("/private/1"))))
    assert(r(3L) === ((true, Some("/files/p1.php"))))
    assert(r(4L) === ((false, Some("/*.php$"))))
    assert(r(5L) === ((true, None)))
    assert(r(6L) === ((true, Some("/pub/*/x"))))
    assert(r(7L) === ((false, Some("/pub/"))))
    assert(r(8L) === ((false, Some("/private"))))
  }

  test("robotsFilter: payload columns pass through the join-back untouched") {
    val u = Seq((1L, "a.com", "/private/secret", "payload-1", 42),
      (2L, "d.com", "/ok", "payload-2", 7))
      .toDF("id", "host", "path", "extra", "num")
    val r = Crawl.robotsFilter(u, "id", "host", "path", rules)
      .orderBy("id").collect()
    assert(r.map(_.schema.fieldNames.toSeq).head ===
      Seq("id", "host", "path", "extra", "num", "allowed", "matched_prefix"))
    assert(r.map(x => (x.getLong(0), x.getString(3), x.getInt(4),
      x.getBoolean(5))).toSeq ===
      Seq((1L, "payload-1", 42, false), (2L, "payload-2", 7, true)))
  }

  test("robotsFilter: shuffle-join tier agrees with the broadcast tier") {
    val a = Crawl.robotsFilter(urls, "id", "host", "path", rules)
      .orderBy("id").collect().toSeq
    val nb = Crawl.robotsFilter(urls, "id", "host", "path", rules,
      broadcastRules = false)
    assert(a === nb.orderBy("id").collect().toSeq)
    // the non-broadcast tier materializes the translated rules side
    // (localCheckpoint -> ExistingRDD scan): the pattern->regex chain
    // must not re-derive inside the join per probed row
    val p = nb.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD"), p.take(1200))
  }

  test("extractLinks: resolution, ordering, linkless pages absent") {
    val df = Seq(
      (1L, """<a href="/a">x</a><a href="https://e.org/p">y</a>""" +
        """<a href="#f">z</a><a href="mailto:m@n">m</a>""" +
        """<a href="//cdn.e.org/c">c</a><a href="../rel">r</a>""", "h.com"),
      (2L, "no links here", "h.com")
    ).toDF("id", "html", "host")
    val r = Crawl.extractLinks(df, "id", "html", "host").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSeq
    // protocol-relative resolves as https; dir-relative against the
    // site root (no pathCol) with the root-level '..' ignored
    assert(r === Seq(
      (1L, 0, "https://h.com/a"),
      (1L, 1, "https://e.org/p"),
      (1L, 2, "https://cdn.e.org/c"),
      (1L, 3, "https://h.com/rel")))
  }

  test("extractLinks: single-quoted and unquoted hrefs, all forms interleave in order") {
    val df = Seq(
      (1L, """<a href="/dq">d</a><a href='/sq'>s</a>""" +
        """<a href=/uq>u</a><a href = "/sp">w</a>""", "h.com")
    ).toDF("id", "html", "host")
    val r = Crawl.extractLinks(df, "id", "html", "host").collect()
      .map(x => (x.getInt(1), x.getString(2))).toSeq
    assert(r === Seq((0, "https://h.com/dq"), (1, "https://h.com/sq"),
      (2, "https://h.com/uq"), (3, "https://h.com/sp")))
  }

  test("extractLinks: base href wins over host; base tag itself never emitted") {
    val df = Seq(
      (1L, """<base href="https://b.org/dir/sub/"><a href="/r">x</a>""" +
        """<a href="img/i.png">i</a><a href="../up">u</a>""", "h.com"),
      // relative <base> is ignored -> falls back to the host root
      (2L, """<base href="/nope/"><a href="img/i.png">i</a>""", "h.com")
    ).toDF("id", "html", "host")
    val r = Crawl.extractLinks(df, "id", "html", "host").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSeq
    assert(r === Seq(
      (1L, 0, "https://b.org/r"),
      (1L, 1, "https://b.org/dir/sub/img/i.png"),
      (1L, 2, "https://b.org/dir/up"),
      (2L, 0, "https://h.com/img/i.png")))
  }

  test("extractLinks: anchors only — link/script/basefont hrefs stay out of the frontier") {
    val df = Seq(
      (1L, """<link rel="stylesheet" href="/style.css">""" +
        """<basefont href="https://other.example/f" size=3>""" +
        """<script src="/app.js"></script>""" +
        """<a href="/p">x</a><area href="/map">""", "h.com")
    ).toDF("id", "html", "host")
    val r = Crawl.extractLinks(df, "id", "html", "host").collect()
      .map(x => (x.getInt(1), x.getString(2))).toSeq
    // stylesheet + basefont hrefs are resource references, not
    // outlinks; basefont must not become the page base either
    assert(r === Seq((0, "https://h.com/p"), (1, "https://h.com/map")))
  }

  test("robotsFilter: one id under two paths keeps two rows with per-path rules") {
    val u = Seq(
      (1L, "a.com", "/private/secret"),
      (1L, "a.com", "/index")
    ).toDF("id", "host", "path")
    val r = Crawl.robotsFilter(u, "id", "host", "path", rules)
      .orderBy("path").collect()
      .map(x => (x.getString(2), x.getBoolean(3))).toSeq
    assert(r === Seq(("/index", true), ("/private/secret", false)))
  }

  test("extractLinks: dir-relative resolves against the page path; dot-segments collapse") {
    val df = Seq(
      (1L, """<a href="img/x.png">a</a><a href="../sib">b</a>""" +
        """<a href="./here">c</a><a href="a/b/../../c">d</a>""",
        "h.com", "/sec/p1/index.html"),
      (2L, """<a href="x">n</a>""", "h.com", null)
    ).toDF("id", "html", "host", "path")
    val r = Crawl.extractLinks(df, "id", "html", "host", "path").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSeq
    assert(r === Seq(
      (1L, 0, "https://h.com/sec/p1/img/x.png"),
      (1L, 1, "https://h.com/sec/sib"),
      (1L, 2, "https://h.com/sec/p1/here"),
      (1L, 3, "https://h.com/sec/p1/c"),
      (2L, 0, "https://h.com/x")))
  }

  test("extractRobotsSitemaps: group-independent, case/WS tolerant, CRLF, empties drop") {
    import spark.implicits._
    val txt = "User-agent: *\r\n" +
      "Disallow: /private/\r\n" +
      "SITEMAP: https://a.com/one.xml  # comment\r\n" +
      "\tsitemap:\thttps://a.com/two.xml\t\r\n" +
      "Sitemap:\r\n" +               // empty value: drops
      "# Sitemap: https://a.com/commented.xml\r\n" + // whole-line comment
      "Sitemapx: https://a.com/not-a-directive\r\n" +
      "User-agent: bot\r\n" +
      "Sitemap: https://a.com/three.xml\r\n" // inside a group: still applies
    val out = Crawl.extractRobotsSitemaps(
        Seq(("a.com", txt)).toDF("host", "txt"), "host", "txt")
      .orderBy("idx").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(out === Seq(
      (2, "https://a.com/one.xml"),
      (3, "https://a.com/two.xml"),
      (8, "https://a.com/three.xml")))
  }

  test("parseRobotsTxt: groups, comments, agent precedence, empty Disallow") {
    val txt =
      """# banner comment
        |User-agent: *
        |Disallow: /private/  # inline comment
        |Allow: /private/open
        |Disallow:
        |
        |User-agent: GraftBot
        |User-agent: otherbot
        |Disallow: /bot/*
        |Allow: /bot/ok$
        |Sitemap: https://a.com/s.xml
        |Crawl-delay: 10""".stripMargin
    val df = Seq(("a.com", txt), ("b.com",
      "User-agent: *\nDisallow: /x/")).toDF("host", "txt")
    // agent named by a group (case-insensitive): ONLY its rules apply
    val bot = Crawl.parseRobotsTxt(df, "host", "txt", agent = "graftbot")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      .toSet
    assert(bot === Set(("a.com", false, "/bot/*"), ("a.com", true, "/bot/ok$"),
      ("b.com", false, "/x/"))) // b.com has no graftbot group -> * applies
    // RFC 9309 *WS is space OR TAB: a tab after the colon must not
    // survive into the prefix, and a tab-indented UA line still opens
    // its group (space-only trim would silently misfile both)
    val tabbed = Seq(("t.com",
      "\tUser-agent: graftbot\nDisallow:\t/tab/\nAllow: /tab/ok"))
      .toDF("host", "txt")
    val tr = Crawl.parseRobotsTxt(tabbed, "host", "txt", agent = "graftbot")
      .collect().map(r => (r.getBoolean(1), r.getString(2))).toSet
    assert(tr === Set((false, "/tab/"), (true, "/tab/ok")))
    // default agent: the * groups
    val star = Crawl.parseRobotsTxt(df, "host", "txt")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      .toSet
    assert(star === Set(("a.com", false, "/private/"),
      ("a.com", true, "/private/open"), ("b.com", false, "/x/")))
    // parsed rules feed robotsFilter directly (wildcards included)
    val urls = Seq((1L, "a.com", "/bot/123"), (2L, "a.com", "/bot/ok"))
      .toDF("id", "host", "path")
    val rules = Crawl.parseRobotsTxt(df, "host", "txt", agent = "graftbot")
    val filtered = Crawl.robotsFilter(urls, "id", "host", "path", rules)
      .collect().map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(filtered === Map(1L -> false, 2L -> true))
  }

  test("extractSitemapUrls: urlset + sitemapindex, entities, drops, trim") {
    val urlset =
      """<?xml version="1.0"?><urlset>
        |<url><loc> https://a.com/p1 </loc><lastmod>2024-01-02</lastmod></url>
        |<url><loc>https://a.com/q?x=1&amp;y=2</loc></url>
        |<url><loc>https://a.com/o&apos;brien</loc></url>
        |<url><lastmod>2024-03-01</lastmod></url>
        |<url><loc></loc></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc></sitemap>
        |<sitemap><loc>https://a.com/s2.xml</loc>
        |<lastmod>2024-02-03</lastmod></sitemap></sitemapindex>""".stripMargin
    val df = Seq((1L, urlset), (2L, index), (3L, "no xml at all"))
      .toDF("id", "xml")
    val r = Crawl.extractSitemapUrls(df, "id", "xml").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getString(3),
        Option(x.getString(4)))).toSeq
    assert(r === Seq(
      (1L, 0, "url", "https://a.com/p1", Some("2024-01-02")),
      (1L, 1, "url", "https://a.com/q?x=1&y=2", None),
      (1L, 2, "url", "https://a.com/o'brien", None),
      (2L, 0, "sitemap", "https://a.com/s1.xml", None),
      (2L, 1, "sitemap", "https://a.com/s2.xml", Some("2024-02-03"))))
  }

  test("expandSitemaps: 2-level index flattens, cycles terminate, lastmod keeps min") {
    // level 0: an index listing two child sitemaps (one of which is
    // itself an index -> level 2) plus a direct urlset entry source
    val idx = "<sitemapindex>" +
      "<sitemap><loc>https://a.com/s1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.com/sub.xml</loc></sitemap>" +
      "</sitemapindex>"
    val sub = "<sitemapindex>" +
      "<sitemap><loc>https://a.com/s2.xml</loc></sitemap>" +
      // cycle back to the root index: must not loop
      "<sitemap><loc>https://a.com/root.xml</loc></sitemap>" +
      "</sitemapindex>"
    val s1 = "<urlset>" +
      "<url><loc>https://a.com/p1</loc><lastmod>2024-01-02</lastmod></url>" +
      "<url><loc>https://a.com/p2</loc></url></urlset>"
    val s2 = "<urlset>" +
      "<url><loc>https://a.com/p3</loc></url>" +
      // p1 again with a LATER lastmod: dedup keeps the min
      "<url><loc>https://a.com/p1</loc><lastmod>2024-05-05</lastmod></url>" +
      "</urlset>"
    val bodies = Map("https://a.com/root.xml" -> idx,
      "https://a.com/sub.xml" -> sub, "https://a.com/s1.xml" -> s1,
      "https://a.com/s2.xml" -> s2)
    val lookup = bodies.toSeq.toDF("sm_url", "xml")
    val seeds = Seq(("https://a.com/root.xml", idx)).toDF("sm_url", "xml")
    val fetch = (urls: org.apache.spark.sql.DataFrame) =>
      urls.join(lookup, Seq("sm_url"))
    val r = Crawl.expandSitemaps(seeds, "sm_url", "xml", fetch)
      .orderBy("url").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSeq
    assert(r === Seq(
      ("https://a.com/p1", Some("2024-01-02")),
      ("https://a.com/p2", None),
      ("https://a.com/p3", None)))
    // depth cap: with maxDepth = 1 only the seed level parses
    val shallow = Crawl.expandSitemaps(seeds, "sm_url", "xml", fetch,
      maxDepth = 1).collect()
    assert(shallow.isEmpty, "an index-only seed yields no page URLs at depth 1")
    // r16 small-seed tier ≡ distributed loop: localRowThreshold = 0
    // trips the mid-flight fallback after the first collect, so the
    // distributed arm (rebuilt from driver state) must produce the
    // identical (url, lastmod) set — cycles, min-lastmod and all
    val dist = Crawl.expandSitemaps(seeds, "sm_url", "xml", fetch,
      localRowThreshold = 0)
      .orderBy("url").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSeq
    assert(dist === r.toSeq)
  }

  test("canonicalUrl: both attribute orders, quoting forms, resolution, absence") {
    val cases = Seq(
      (1L, """<link rel="canonical" href="https://c.org/a">""", "h.com"),
      (2L, """<link href='/rel/p' rel=canonical>""", "h.com"),
      (3L, """<link rel=canonical href=https://c.org/u>""", "h.com"),
      (4L, """<link rel="stylesheet" href="/s.css">""", "h.com"),
      (5L, """no head""", "h.com"),
      // dir-relative canonical: NULL without the page path
      (6L, """<link rel="canonical" href="page.html">""", "h.com"),
      // first tag wins
      (7L, """<link rel="canonical" href="/one">""" +
        """<link rel="canonical" href="/two">""", "h.com"),
      // POSITIONALLY first: an earlier href-then-rel tag beats a
      // later rel-then-href tag (naive pattern preference would flip)
      (8L, """<link href="/pos1" rel="canonical">""" +
        """<link rel="canonical" href="/pos2">""", "h.com"),
      // unquoted rel must be a whole token: rel=canonical-alt is NOT
      // a canonical declaration
      (9L, """<link rel=canonical-alt href="/x">""", "h.com"),
      // protocol-relative resolves with the https scheme
      (10L, """<link rel="canonical" href="//m.c.org/pp">""", "h.com"),
      // other schemes stay NULL
      (11L, """<link rel="canonical" href="ftp://c.org/f">""", "h.com"),
      // STRICT positional: a first canonical tag with an EMPTY href
      // is still the page's declaration (-> NULL); presence gates on
      // regexp_instr, so the later tag must NOT win by virtue of the
      // first extract being empty
      (12L, """<link rel="canonical" href="">""" +
        """<link href="/late" rel="canonical">""", "h.com")
    ).toDF("id", "html", "host")
    val r = cases.select(col("id"),
        Crawl.canonicalUrl(col("html"), col("host")).as("c"))
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r === Map(
      1L -> Some("https://c.org/a"), 2L -> Some("https://h.com/rel/p"),
      3L -> Some("https://c.org/u"), 4L -> None, 5L -> None,
      6L -> None, 7L -> Some("https://h.com/one"),
      8L -> Some("https://h.com/pos1"), 9L -> None,
      10L -> Some("https://m.c.org/pp"), 11L -> None, 12L -> None))
  }

  test("canonicalUrl: dir-relative resolves against the page path when supplied") {
    val cases = Seq(
      (1L, """<link rel="canonical" href="page.html">""", "h.com",
        "/sec/p1/index.html"),
      (2L, """<link rel="canonical" href="../up/c">""", "h.com",
        "/sec/p1/index.html"),
      (3L, """<link rel="canonical" href="./here">""", "h.com",
        "/sec/p1/index.html"),
      // null page path falls back to the site root
      (4L, """<link rel="canonical" href="x.html">""", "h.com", null),
      // root-relative keeps working (and dot-normalizes)
      (5L, """<link rel="canonical" href="/a/../b">""", "h.com",
        "/sec/p1/index.html")
    ).toDF("id", "html", "host", "path")
    val r = cases.select(col("id"),
        Crawl.canonicalUrl(col("html"), col("host"), col("path")).as("c"))
      .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r === Map(
      1L -> Some("https://h.com/sec/p1/page.html"),
      2L -> Some("https://h.com/sec/up/c"),
      3L -> Some("https://h.com/sec/p1/here"),
      4L -> Some("https://h.com/x.html"),
      5L -> Some("https://h.com/b")))
  }

  test("pageRankInt: exact integer ranks, hand-computed 2 iterations") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // outdeg 1:2, 2:1, 3:1; base = 150000
    // iter1: cs 1←1e6, 2←5e5, 3←1.5e6 ⇒ r1 = (1e6, 575000, 1425000)
    // iter2: cs 1←1425000, 2←500000, 3←1075000
    //        ⇒ r2 = (1361250, 575000, 1063750)
    val r = Crawl.pageRankInt(e, iters = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r === Seq((1L, 1361250L), (2L, 575000L), (3L, 1063750L)))
  }

  test("pageRankInt: dangling mass dropped, sink still gets base + in") {
    val e = Seq((1L, 2L)).toDF("src", "dst") // node 2 dangles
    val r = Crawl.pageRankInt(e, iters = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    // r1: node1 = base (no in-edges); node2 = base + 85*1e6/100
    assert(r === Seq((1L, 150000L), (2L, 1000000L)))
  }

  test("pageRankInt: dangling redistribution conserves mass, hand-computed") {
    val e = Seq((1L, 2L)).toDF("src", "dst") // node 2 dangles; N = 2
    // iter1: danglingSum = rank(2) = 1e6, share = 5e5
    //   node1 = 150000 + 85*(0 + 500000)//100       = 575000
    //   node2 = 150000 + 85*(1000000 + 500000)//100 = 1425000
    val r = Crawl.pageRankInt(e, iters = 1, redistributeDangling = true)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r === Seq((1L, 575000L), (2L, 1425000L)))
    assert(r.map(_._2).sum === 2000000L) // mass conserved exactly here
    // second iteration stays exact-integer deterministic
    val r2 = Crawl.pageRankInt(e, iters = 2, redistributeDangling = true)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    // iter2: danglingSum = 1425000, share = 712500
    //   node1 = 150000 + 85*712500//100            = 755625
    //   node2 = 150000 + 85*(575000 + 712500)//100 = 1244375
    assert(r2 === Seq((1L, 755625L), (2L, 1244375L)))
  }

  test("pageRankConverge: stops under tol, equals the fixed-iter run, cadence-invariant") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (ranks, it, conv) = Crawl.pageRankConverge(e, maxIters = 60,
      tolMicro = 10L, checkpointEvery = 3)
    assert(conv, "should report convergence explicitly")
    assert(it < 60, "should converge well before maxIters")
    // a cap-bound run reports converged=false even though it==maxIters
    val (_, itCap, convCap) = Crawl.pageRankConverge(e, maxIters = 2,
      tolMicro = 0L, checkpointEvery = 1)
    assert(itCap === 2 && !convCap)
    val got = ranks.collect().map(x => (x.getLong(0), x.getLong(1)))
      .sorted.toSeq
    // exact-integer semantics: the converged table IS the fixed-iter
    // table at the same iteration count
    val fixed = Crawl.pageRankInt(e, iters = it).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got === fixed)
    // checkpoint cadence must not change values (only lineage depth)
    val (r1, it1, conv1) = Crawl.pageRankConverge(e, maxIters = 60,
      tolMicro = 10L, checkpointEvery = 1)
    assert(it1 === it && conv1)
    assert(r1.collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      === got)
    // converged state: one more iteration moves every rank <= tol
    val next = Crawl.pageRankInt(e, iters = it + 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val cur = got.toMap
    assert(cur.forall { case (k, v) => math.abs(next(k) - v) <= 10L })
  }

  test("extractCrawlDelay: group scoping, first-wins, non-breaking, validation") {
    def delay(txt: String, agent: String = "graftbot"): Option[Long] = {
      val r = Crawl.extractCrawlDelay(
        Seq(("h", txt)).toDF("host", "txt"), "host", "txt", agent)
        .collect()
      r.headOption.map(_.getAs[Long]("crawl_delay_ms"))
    }
    // agent group beats *, first directive in file order wins
    assert(delay("User-agent: *\nCrawl-delay: 2\n" +
      "User-agent: graftbot\nCrawl-delay: 0.5\nAllow: /a\n" +
      "Crawl-delay: 9\n") === Some(500L))
    // falls back to the * group
    assert(delay("User-agent: *\nCrawl-delay: 2\nDisallow: /p/\n")
      === Some(2000L))
    // a crawl-delay BETWEEN two User-agent lines is a rule line HERE
    // (unlike in parseRobotsTxt, which ignores the key): it closes
    // the first header, so the delay belongs to the first agent only
    val split = "User-agent: graftbot\nCrawl-delay: 3\n" +
      "User-agent: second\nDisallow: /x/\n"
    assert(delay(split) === Some(3000L))
    assert(delay(split, agent = "second") === None)
    // invalid values drop; a host with no valid delay emits no row
    assert(delay("User-agent: *\nCrawl-delay: soon\n") === None)
    assert(delay("User-agent: *\nCrawl-delay: -1\n") === None)
    // unmatched agent with no * group: no row
    assert(delay("User-agent: otherbot\nCrawl-delay: 4\n") === None)
    // comments and tab whitespace handled like parseRobotsTxt
    assert(delay("User-agent: *\nCrawl-delay:\t1.25  # slow\n")
      === Some(1250L))
  }
  test("snapshotDiff: added/removed/changed/unchanged by content hash") {
    import spark.implicits._
    val o = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3")).toDF("url", "ch")
    val n = Seq(("u2", "h2"), ("u3", "hX"), ("u4", "h4")).toDF("url", "ch")
    val d = Crawl.snapshotDiff(o, n, "url", "ch").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(d === Map("u1" -> "removed", "u2" -> "unchanged",
      "u3" -> "changed", "u4" -> "added"))
    // hash columns survive for downstream joins
    val row = Crawl.snapshotDiff(o, n, "url", "ch")
      .filter(org.apache.spark.sql.functions.col("url") === "u3").collect()(0)
    assert(row.getString(1) === "h3" && row.getString(2) === "hX")
  }

  test("urlTrapSignals: depth, duplicate segments, param blowup") {
    import spark.implicits._
    val urls = Seq(
      "https://a.com/x/y/z",                         // benign
      "https://a.com/a/b/a/b/a/b",                   // dup run: 6 segs, 2 distinct
      "https://a.com/1/2/3/4/5/6/7/8/9",             // deep: 9 > 8
      "https://a.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9", // 9 params
      "https://a.com/",                              // root: depth 0
      "https://a.com/x?",                            // empty query
      "https://a.com/x#frag"                         // fragment only
    ).toDF("url")
    val m = Crawl.urlTrapSignals(urls, "url").collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(m("https://a.com/x/y/z") === ((3, 0, 0, false)))
    assert(m("https://a.com/a/b/a/b/a/b") === ((6, 4, 0, true)))
    assert(m("https://a.com/1/2/3/4/5/6/7/8/9") === ((9, 0, 0, true)))
    assert(m("https://a.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9")
      === ((1, 0, 9, true)))
    assert(m("https://a.com/") === ((0, 0, 0, false)))
    assert(m("https://a.com/x?") === ((1, 0, 0, false)))
    assert(m("https://a.com/x#frag") === ((1, 0, 0, false)))
  }
  test("hitsInt: hand-computed 3-node graph, multi-edge dedup, determinism") {
    import spark.implicits._
    // 1->2, 1->3, 2->3, 3->1 (edge 1->2 duplicated: must collapse)
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = Crawl.hitsInt(e, iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // iter1: a_raw=(1e6,1e6,2e6) s=2 -> a=(5e5,5e5,1e6);
    //        h_raw=(1.5e6,1e6,5e5) s=1 -> h as-is
    // iter2: a_raw=(5e5,1.5e6,2.5e6) s=2 -> a=(25e4,75e4,125e4);
    //        h_raw=(2e6,1.25e6,25e4) s=2 -> h=(1e6,625e3,125e3)
    assert(got(1L) === ((1000000L, 250000L)))
    assert(got(2L) === ((625000L, 750000L)))
    assert(got(3L) === ((125000L, 1250000L)))
    // deterministic under repartition
    val re = Crawl.hitsInt(e.repartition(4), iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(re === got)
    // one iteration: the first half-round values
    val one = Crawl.hitsInt(e, iters = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(one(3L) === ((500000L, 1000000L)))
    intercept[IllegalArgumentException] { Crawl.hitsInt(e, iters = 0) }
  }
  test("robotsFilterStream: row parity with the batch tier on literal and wildcard rules") {
    val wr = Seq(
      ("w.com", false, "/private/*"),
      ("w.com", true, "/private/1"),
      ("w.com", false, "/*.php$"),
      ("w.com", true, "/files/p1.php"),
      ("w.com", true, "/pub/*/x"),
      ("w.com", false, "/pub/"),
      ("v.com", true, "/*"),
      ("v.com", false, "/private")
    ).toDF("host", "allow", "prefix")
    val wu = Seq(
      (1L, "w.com", "/private/1"), (2L, "w.com", "/private/12"),
      (3L, "w.com", "/files/p1.php"), (4L, "w.com", "/files/p2.php"),
      (5L, "w.com", "/files/p2.phpx"), (6L, "w.com", "/pub/a/x"),
      (7L, "w.com", "/pub/a/y"), (8L, "v.com", "/private/x"),
      (9L, "nohost.com", "/anything")
    ).toDF("id", "host", "path")
    val batch = Crawl.robotsFilter(wu, "id", "host", "path", wr)
      .select("id", "host", "path", "allowed", "matched_prefix")
      .orderBy("id").collect().toSeq
    val stream = Crawl.robotsFilterStream(wu, "id", "host", "path",
        Crawl.robotsRulesByHost(wr))
      .select("id", "host", "path", "allowed", "matched_prefix")
      .orderBy("id").collect().toSeq
    assert(stream === batch)
    // payload columns pass through
    val withPayload = wu.withColumn("extra",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("p"), col("id")))
    val sp = Crawl.robotsFilterStream(withPayload, "id", "host", "path",
      Crawl.robotsRulesByHost(wr))
    assert(sp.columns.toSeq ===
      Seq("id", "host", "path", "extra", "allowed", "matched_prefix"))
  }

  test("recrawlSchedule: streak resets on change, backoff doubles to the cap, deterministic") {
    import spark.implicits._
    val base = 1000L
    val log = Seq(
      // churn: a b a -> every fetch changes, streak 0, base interval
      ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "a"),
      // static: 5 identical fetches -> streak 4, interval base*2^4
      ("u2", 10L, "x"), ("u2", 20L, "x"), ("u2", 30L, "x"),
      ("u2", 40L, "x"), ("u2", 50L, "x"),
      // change then settle: streak counts only the tail
      ("u3", 10L, "a"), ("u3", 20L, "b"), ("u3", 30L, "b"),
      // single fetch
      ("u4", 99L, "z"),
      // null fingerprint rows drop (failed fetches)
      ("u5", 10L, null)
    ).toDF("url", "ts", "fp")
    val got = Crawl.recrawlSchedule(log, "url", "ts", "fp",
        baseMs = base, maxDoublings = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got.keySet === Set("u1", "u2", "u3", "u4"))
    assert(got("u1") === ((3, 2L, 0L, base, 30L + base)))
    // maxDoublings=3 caps the static page's 4-streak at 2^3
    assert(got("u2") === ((5, 0L, 4L, base * 8, 50L + base * 8)))
    assert(got("u3") === ((3, 1L, 1L, base * 2, 30L + base * 2)))
    assert(got("u4") === ((1, 0L, 0L, base, 99L + base)))
    // deterministic under repartition
    val re = Crawl.recrawlSchedule(log.repartition(4), "url", "ts",
        "fp", baseMs = base, maxDoublings = 3)
      .orderBy("url").collect().toSeq
    assert(re === Crawl.recrawlSchedule(log, "url", "ts", "fp",
      baseMs = base, maxDoublings = 3).orderBy("url").collect().toSeq)
  }

  test("labelPropagation: two communities converge, ties to smallest, deterministic") {
    import spark.implicits._
    // two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val r = Crawl.labelPropagation(e, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // each triangle settles on ONE label and the two differ (label
    // VALUES are arbitrary ids — min-label ties let a bridge carry a
    // neighbor community's id, here 3 across the 3–10 bridge)
    assert(Set(1L, 2L, 3L).map(r).size === 1, r)
    assert(Set(10L, 11L, 12L).map(r).size === 1, r)
    assert(r(1L) !== r(10L), r)
    assert(r(1L) === 1L && r(10L) === 3L) // the hand-traced fixpoint
    // synchronous + min-label tie-break => identical across runs and
    // partitionings
    val again = Crawl.labelPropagation(e.repartition(5), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again === r)
    // self-loops are dropped, not self-votes
    val withSelf = Crawl.labelPropagation(
      e.union(Seq((2L, 2L)).toDF("src", "dst")), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(withSelf === r)
  }

  test("personalizedPageRankInt: mass concentrates at seeds; guards") {
    import spark.implicits._
    // star: hub 0 <-> leaves 1..6; seed = node 1 only
    val e = (1L to 6L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val ppr = Crawl.personalizedPageRankInt(e, Seq(1L).toDF("node"),
        iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the seed leaf outranks every other leaf (same link structure,
    // only the teleport differs)
    assert((2L to 6L).forall(i => ppr(1L) > ppr(i)), ppr)
    // non-seed leaves are symmetric -> identical ranks
    assert((3L to 6L).forall(i => ppr(i) === ppr(2L)), ppr)
    // seeds outside the graph are ignored; all-outside fails fast
    val withGhost = Crawl.personalizedPageRankInt(e,
      Seq(1L, 99L).toDF("node"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    intercept[IllegalArgumentException] {
      Crawl.personalizedPageRankInt(e, Seq(99L).toDF("node"), iters = 3)
    }
    // ghost seed halves the per-seed base? no — it is EXCLUDED, so
    // the fit equals the clean single-seed run
    assert(withGhost === ppr)
  }

  test("triangleCounts: K4, path, pair, dup/reversed edges, self-loops") {
    import spark.implicits._
    // K4 on {1,2,3,4}: 4 triangles, every node in exactly 3.
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    // path 10-11-12 (0 triangles), isolated pair (20,21), plus noise:
    // duplicated and REVERSED k4 edges and self-loops — canonicalize
    // must collapse them all without changing any count
    val edges = (k4 ++ Seq((10L, 11L), (11L, 12L), (20L, 21L)) ++
      k4.map(_.swap) ++ Seq((1L, 2L), (3L, 3L), (20L, 20L)))
      .toDF("src", "dst")
    val got = Crawl.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 0L, 11L -> 0L, 12L -> 0L, 20L -> 0L, 21L -> 0L))
    // global count: Σ per-node / 3
    assert(got.values.sum / 3 === 4L)
    // partitioning-invariant (the orientation is a total order on
    // (degree, id), never on physical row order)
    val re = Crawl.triangleCounts(edges.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === got)
  }

  test("anchorTexts: dominance, lex tiebreak, ws-normalize, contract drops") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<a href=\"https://t.org/a\">read more</a>" +
        "<a href=\"https://t.org/a\">Docs</a>"),
      (2L, "<a href=\"https://t.org/a\">read  \n more</a>" + // ws collapses
        "<a href=\"https://t.org/a\">read more</a>"),
      // tie on counts → lexicographically smallest anchor wins
      (3L, "<a href=\"https://t.org/b\">zzz</a>" +
        "<a href=\"https://t.org/b\">aaa</a>"),
      // out of contract: single quotes, relative, nested markup
      (4L, "<a href='https://t.org/c'>sq</a><a href=\"/rel\">r</a>" +
        "<a href=\"https://t.org/d\"><b>nested</b></a>"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "html")
    val got = Crawl.anchorTexts(pages, "html")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // /a: 4 refs, anchors {read more ×3 (ws-normalized), Docs ×1}
    assert(got === Map(
      "https://t.org/a" -> ((4L, 2L, "read more")),
      "https://t.org/b" -> ((2L, 2L, "aaa"))))
  }

  test("triangleCounts: hub-and-spoke star has no triangles") {
    import spark.implicits._
    // a celebrity node with 50 spokes: degree-ordered orientation
    // points every edge INTO the hub, so the hub's wedge fan-out is
    // zero — the skew-boundedness claim in the Scaladoc
    val star = (1L to 50L).map(i => (0L, i)).toDF("src", "dst")
    val got = Crawl.triangleCounts(star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 51 && got.values.forall(_ === 0L))
  }

  test("kCore: wave peeling, isolated-by-peel rule, maxIter raise") {
    // triangle {1,2,3} + path 3-4-5-6 + disconnected pair 7-8
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L))
      .toDF("src", "dst").repartition(3)
    val k2 = Crawl.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1)), r.getBoolean(2)))
      .toMap
    // waves: deg-1 leaves first, then the path unravels one per round
    assert(k2(6L) === ((0, false)) && k2(7L) === ((0, false)) &&
      k2(8L) === ((0, false)))
    assert(k2(5L) === ((1, false)))
    assert(k2(4L) === ((2, false)))
    // the triangle is the 2-core
    assert(Seq(1L, 2L, 3L).forall(n => k2(n) === ((-1, true))))
    // k=3: the first peel isolates node 3 (its neighbors all drop) —
    // it leaves the live graph in the SAME round, by the node-set
    // diff rule the Scaladoc pins
    val k3 = Crawl.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1)), r.getBoolean(2)))
      .toMap
    assert(k3.size === 8)
    assert(k3.values.forall(_ === ((0, false))))
    // a bare 8-path needs 4 peel rounds at k=2: maxIter=2 raises
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Crawl.kCore(path, k = 2, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("fixpoint"), e.getMessage)
  }

  test("graph local tiers ≡ distributed loops (r15): pageRank, " +
      "personalized, HITS, label prop, kCore") {
    // the r15 small-graph tier (localEdgeThreshold, the
    // componentsLocal convention) must be row-identical to the
    // distributed loop on a graph with hubs, dangling nodes, multi
    // direction edges, ties and an isolated-by-peel wave.
    // threshold=0 forces distributed; default takes the local tier.
    val e = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 5L),
      (5L, 6L), (6L, 4L), (7L, 1L), (2L, 7L), (8L, 9L), (9L, 8L)
    ).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toSeq).toSeq
        .sortBy(_.head.asInstanceOf[Long])
    for (redis <- Seq(false, true)) {
      assert(rows(Crawl.pageRankInt(e, 3, redistributeDangling = redis)) ===
        rows(Crawl.pageRankInt(e, 3, redistributeDangling = redis,
          localEdgeThreshold = 0L)), s"pageRank redis=$redis")
    }
    val seeds = Seq(1L, 8L, 99L).toDF("node")
    assert(rows(Crawl.personalizedPageRankInt(e, seeds, 3)) ===
      rows(Crawl.personalizedPageRankInt(e, seeds, 3,
        localEdgeThreshold = 0L)), "personalized")
    assert(rows(Crawl.hitsInt(e, iters = 3)) ===
      rows(Crawl.hitsInt(e, iters = 3, localEdgeThreshold = 0L)), "hits")
    assert(rows(Crawl.labelPropagation(e, iters = 3)) ===
      rows(Crawl.labelPropagation(e, iters = 3,
        localEdgeThreshold = 0L)), "labelProp")
    assert(rows(Crawl.kCore(e, k = 2)) ===
      rows(Crawl.kCore(e, k = 2, localEdgeThreshold = 0L)), "kCore")
  }

  test("pageRankConverge local tier ≡ distributed loop (r16): ranks, " +
      "iteration count and converged flag") {
    val e = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 5L),
      (5L, 6L), (6L, 4L), (7L, 1L), (2L, 7L), (8L, 9L), (9L, 8L)
    ).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toSeq).toSeq
        .sortBy(_.head.asInstanceOf[Long])
    for (redis <- Seq(false, true); tol <- Seq(0L, 500L, 2000000L)) {
      val (lr, li, lc) = Crawl.pageRankConverge(e, maxIters = 12,
        tolMicro = tol, redistributeDangling = redis)
      val (dr, di, dc) = Crawl.pageRankConverge(e, maxIters = 12,
        tolMicro = tol, redistributeDangling = redis,
        localEdgeThreshold = 0L)
      assert(li === di && lc === dc, s"iters/flag redis=$redis tol=$tol")
      assert(rows(lr) === rows(dr), s"ranks redis=$redis tol=$tol")
    }
    // the converged run's ranks equal the fixed-iteration run at the
    // same count — the pageRankConverge contract, now also on the tier
    val (cr, ci, cflag) = Crawl.pageRankConverge(e, maxIters = 30,
      tolMicro = 100L)
    assert(cflag)
    assert(rows(cr) === rows(Crawl.pageRankInt(e, ci)))
  }

  test("local-tier gate (r16): byte cap and unsafe node types take " +
      "the distributed arm; null edges drop in both tiers") {
    val e0 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e = e0.localCheckpoint()
    // default caps: small long-typed graph collects
    assert(Crawl.edgesIfSmall(e, e0).isDefined)
    // over-bytes/under-rows: a 1-byte cap refuses collection even at
    // 2 rows — the fat-edge-list guard (and, at production scale, the
    // same comparison short-circuits BEFORE any count job)
    assert(Crawl.edgesIfSmall(e, e0, bytesCap = BigInt(1)).isEmpty)
    // over-threshold rows: distributed arm
    assert(Crawl.edgesIfSmall(e, e0, threshold = 1L).isEmpty)
    // binary node ids: value-equality/ordering unsafe on the driver —
    // distributed arm (the equi-joins handle binary fine)
    val eb0 = Seq((Array[Byte](1), Array[Byte](2))).toDF("src", "dst")
    val eb = eb0.localCheckpoint()
    assert(Crawl.edgesIfSmall(eb, eb0).isEmpty)
    // null src/dst rows are dropped from the shared PageRank edge
    // projection (r15 ADVICE): no null node row, no null-keyed
    // contributions, identical across tiers
    val withNulls = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(1L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long])
    ).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toSeq).toSeq
        .sortBy(_.head.asInstanceOf[Long])
    val local = Crawl.pageRankInt(withNulls, 3)
    val dist = Crawl.pageRankInt(withNulls, 3, localEdgeThreshold = 0L)
    assert(local.collect().forall(!_.isNullAt(0)))
    assert(rows(local) === rows(dist))
    // and the null-free graph ranks identically to the nulls-carrying
    // input: the null edges contributed nothing
    val clean = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(rows(local) === rows(Crawl.pageRankInt(clean, 3)))
  }
}
