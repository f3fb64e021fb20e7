package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Crawl-pipeline operators ([EXT]): the steps between "fetched page"
  * and "candidate corpus document" — robots-exclusion filtering and
  * outlink extraction for the crawl frontier. Pure relational string
  * logic in both engines (no network, no parser dependency).
  */
object Crawl {

  /** Robots-exclusion filtering (RFC 9309 longest-match, over a
    * pre-parsed rule table) — WITH the `*`/`$` wildcard forms of
    * RFC 9309 §2.2.3: `*` matches any character sequence, a trailing
    * `$` anchors the end of the URL path (a non-trailing `$` is
    * literal, the reference-parser convention). Each rule pattern is
    * translated IN-PLAN to an anchored regex on the (tiny) rules side:
    * regex metacharacters escaped, `*` → `.*`, trailing `$` → anchor.
    * For each URL the matching rule with the most PATTERN octets
    * decides — specificity is the rule pattern's own length (trailing
    * `$` anchor excluded), the convention of Google's reference
    * parser, which every mainstream crawler follows; for a literal
    * prefix this is exactly the matched-prefix length, so the
    * wildcard-free behavior is the RFC's longest-match directly. On a
    * specificity tie the ALLOW rule wins (the RFC's least-restrictive
    * tiebreak); a URL with no matching rule is allowed. `rules`
    * columns: (host, allow: boolean, prefix).
    *
    * Scale shape: the rule registry joins on the host equi-key —
    * broadcast by default (robots rules are tiny next to a crawl), or
    * a shuffle equi-join with `broadcastRules = false` when the
    * registry itself is corpus-sized; the per-URL winner is a single
    * bounded `max(struct(pattern_len, allow, prefix))` aggregate (state
    * = one struct per URL), never a rank window — a popular host's
    * URLs never serialize through one task. The regex pattern column
    * is non-foldable, so the matcher recompiles when the pattern
    * changes row-to-row — microseconds against a registry of rule
    * count R. In the non-broadcast tier the translated rules side is
    * localCheckpointed (one small eager job), so a corpus-sized
    * registry's pattern→regex translation chain materializes once
    * instead of re-deriving inside the join condition per probe.
    *
    * Specificity note: the RFC's "match that has the most octets"
    * wording also admits a greedy matched-TEXT-length read, under
    * which a short `*` rule's greedy match can out-rank a longer
    * literal of the opposite polarity (an allow-everything star rule
    * plus `Disallow: /private` would ALLOW `/private/x` — every
    * mainstream parser blocks it). This operator uses the
    * pattern-length convention so
    * a crawler never fetches what the site operator's parser-of-
    * record disallows; pinned in CrawlSpec and mirrored by the
    * oracle.
    *
    * Contract: rows are keyed by (idCol, hostCol, pathCol) — the
    * winner is a single aggregate over those keys and every OTHER
    * column of `urls` rides through it as a `first(…)` (each key's
    * joined copies carry identical payload values, so the pick is
    * value-deterministic; fully duplicated (id, host, path) rows
    * collapse to one). Carrying the payload through the ONE groupBy
    * shuffle — with map-side partial aggregation collapsing the
    * per-rule row multiplication — beats aggregating keys-only and
    * joining back, which would shuffle the URL table a second time.
    * Same-length same-type DIFFERENT patterns break the tie on the
    * lexicographically larger pattern — deterministic, mirrored in
    * the oracle. */
  def robotsFilter(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame,
      broadcastRules: Boolean = true): DataFrame = {
    val reserved = Seq("_uhost", "_upath", "_rhost", "_rallow",
      "_rprefix", "_rlen", "_rx", "_best", "allowed", "matched_prefix")
    require(!urls.columns.exists(reserved.contains),
      "urls must not carry the scratch or output columns " + reserved)
    // pattern → anchored regex, computed once per RULE row (not per URL)
    val hasEnd = col("prefix").endsWith("$")
    val body = when(hasEnd,
      expr("substring(prefix, 1, length(prefix)-1)")).otherwise(col("prefix"))
    val escaped =
      regexp_replace(body, lit("[.^+?(){}\\[\\]|$\\\\]"), lit("\\\\$0"))
    val rx = concat(lit("^"), replace(escaped, lit("*"), lit(".*")),
      when(hasEnd, lit("$")).otherwise(lit("")))
    val r0 = rules.select(col("host").as("_rhost"),
      col("allow").as("_rallow"), col("prefix").as("_rprefix"),
      (length(col("prefix")) - hasEnd.cast("int")).as("_rlen"),
      rx.as("_rx"))
    val r = if (broadcastRules) broadcast(r0) else r0.localCheckpoint()
    val keyCols = Seq(idCol, hostCol, pathCol)
    val payload = urls.columns.filterNot(keyCols.contains)
    val best = max(when(col("_rprefix").isNotNull,
      struct(col("_rlen").as("l"),
        col("_rallow").cast("int").as("a"),
        col("_rprefix").as("p")))).as("_best")
    urls
      .withColumn("_uhost", col(hostCol))
      .withColumn("_upath", col(pathCol))
      .join(r, col("_uhost") === col("_rhost") &&
        expr("_upath RLIKE _rx"), "left")
      .groupBy(col(idCol), col("_uhost"), col("_upath"))
      .agg(best, payload.map(c => first(col(c)).as(c)): _*)
      .select(col(idCol) +: col("_uhost").as(hostCol) +:
        col("_upath").as(pathCol) +: payload.map(col) ++: Seq(
        coalesce(col("_best.a") === 1, lit(true)).as("allowed"),
        col("_best.p").as("matched_prefix")): _*)
  }

  /** Per-host rule ARRAYS for the streaming tier: the same
    * pattern→regex translation as [[robotsFilter]], collapsed to one
    * row per host with a rules array — bounded per host by RFC
    * 9309's 500 KiB robots.txt cap, so a row never outgrows a task.
    * Build once from the registry, broadcast into
    * [[robotsFilterStream]]. Output: (host, robots_rules). */
  def robotsRulesByHost(rules: DataFrame): DataFrame = {
    val hasEnd = col("prefix").endsWith("$")
    val body = when(hasEnd,
      expr("substring(prefix, 1, length(prefix)-1)")).otherwise(col("prefix"))
    val escaped =
      regexp_replace(body, lit("[.^+?(){}\\[\\]|$\\\\]"), lit("\\\\$0"))
    val rx = concat(lit("^"), replace(escaped, lit("*"), lit(".*")),
      when(hasEnd, lit("$")).otherwise(lit("")))
    rules.select(col("host"), col("allow"), col("prefix"),
        (length(col("prefix")) - hasEnd.cast("int")).as("_l"), rx.as("_rx"))
      .groupBy("host")
      .agg(collect_list(struct(col("_rx").as("rx"), col("_l").as("l"),
        col("allow").as("allow"), col("prefix").as("p")))
        .as("robots_rules"))
  }

  /** STREAMING-tier robots filtering: identical verdicts to
    * [[robotsFilter]] (CrawlSpec pins row parity), restructured
    * STATELESS so it runs in a Structured Streaming append query:
    * the batch tier's winner is a groupBy max(struct) — a streaming
    * AGGREGATION that would demand watermark state — so here the
    * per-host rules ride in as an ARRAY via one stream-static
    * broadcast left join and the winner folds per ROW inside an
    * `aggregate` HOF over that array (bounded by the RFC's per-host
    * cap). Each row pays the regex probes over its host's rules —
    * same work as the batch join, no shuffle, no state.
    * Tie-breaks mirror the batch tier exactly: (pattern octets,
    * allow, prefix) lexicographic max; no match → allowed. */
  def robotsFilterStream(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rulesByHost: DataFrame): DataFrame = {
    val reserved = Seq("_rb_host", "_rb_rules", "_rb_path", "_best",
      "allowed", "matched_prefix")
    require(!urls.columns.exists(reserved.contains),
      "urls must not carry the scratch or output columns " + reserved)
    val r = broadcast(rulesByHost.select(col("host").as("_rb_host"),
      col("robots_rules").as("_rb_rules")))
    urls
      .withColumn("_rb_path", col(pathCol))
      .join(r, col(hostCol) === col("_rb_host"), "left")
      .withColumn("_best", expr(
        """aggregate(
          |  filter(coalesce(_rb_rules,
          |           cast(array() as array<struct<rx:string,l:int,allow:boolean,p:string>>)),
          |         x -> _rb_path rlike x.rx),
          |  cast(null as struct<l:int,a:int,p:string>),
          |  (acc, x) -> case
          |    when acc is null
          |      then named_struct('l', x.l, 'a', cast(x.allow as int), 'p', x.p)
          |    when struct(x.l, cast(x.allow as int), x.p) >
          |         struct(acc.l, acc.a, acc.p)
          |      then named_struct('l', x.l, 'a', cast(x.allow as int), 'p', x.p)
          |    else acc end)""".stripMargin))
      .withColumn("allowed", coalesce(col("_best.a") === 1, lit(true)))
      .withColumn("matched_prefix", col("_best.p"))
      .drop("_rb_host", "_rb_rules", "_rb_path", "_best")
  }

  /** Parse raw robots.txt BODIES into the (host, allow, prefix) rule
    * table [[robotsFilter]] consumes — the registry materializer: a
    * crawl pipeline fetches one robots.txt per host and needs its
    * RFC 9309 groups resolved for the crawler's user-agent. Per host:
    *  - lines split on CR?LF; `#` comments stripped; keys
    *    (`User-agent`, `Allow`, `Disallow`) case-insensitive; other
    *    keys (Sitemap, Crawl-delay, …) ignored;
    *  - CONSECUTIVE User-agent lines form one group header; the
    *    group's rules run until the next header (RFC 9309 §2.2.1);
    *  - group selection is the RFC's most-specific-match: groups
    *    naming `agent` exactly (case-insensitive) win; only when NO
    *    group names it do the `*` groups apply; rules from ALL
    *    selected groups merge;
    *  - an empty rule value (`Disallow:` — the idiomatic allow-all)
    *    matches nothing and is dropped.
    * Output: (host, allow, prefix) — `prefix` may contain `*`/`$`,
    * which [[robotsFilter]] translates.
    *
    * Scale shape: line explode is map-only; group assignment is a
    * running count over each host's OWN lines (two windows partitioned
    * by host) — robots.txt is capped at 500 KiB by the RFC, so a
    * host's line set is bounded by protocol, not by corpus size: the
    * one place a per-key window is the RIGHT tool. */
  def parseRobotsTxt(df: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)
    // RFC 9309 whitespace is space OR horizontal tab (*WS) — Spark's
    // trim() strips only 0x20, which would leave a tab-indented line
    // failing the anchored key regex (its rules silently attaching to
    // the previous group) and a tab after the colon inside the prefix
    def hTrim(c: Column): Column =
      regexp_replace(c, "^[ \\t]+|[ \\t]+$", "")
    val lines = df.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("idx", "line")))
      .select(col("host"), col("idx"),
        hTrim(regexp_replace(col("line"), "#.*$", "")).as("l"))
      .select(col("host"), col("idx"),
        lower(regexp_extract(col("l"), "^([A-Za-z-]+)\\s*:", 1)).as("k"),
        hTrim(regexp_extract(col("l"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("v"))
      .filter(col("k").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("idx")
    val grouped = lines
      .withColumn("_ua", col("k") === "user-agent")
      // a UA line opens a NEW group iff the previous kept line wasn't
      // one (consecutive UA lines share the header)
      .withColumn("_start",
        (col("_ua") && !coalesce(lag(col("_ua"), 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("_g", sum(col("_start")).over(w))
    val tiers = grouped.filter(col("_ua"))
      .groupBy(col("host"), col("_g"))
      .agg(max(when(lower(col("v")) === agentLower, 2)
        .when(col("v") === "*", 1).otherwise(0)).as("_tier"))
    val best = tiers.groupBy("host").agg(max(col("_tier")).as("_best"))
    val selected = tiers.join(best, Seq("host"))
      .filter(col("_tier") === col("_best") && col("_tier") > 0)
      .select(col("host"), col("_g"))
    grouped.filter(!col("_ua") && col("v") =!= "")
      .join(selected, Seq("host", "_g"))
      .select(col("host"), (col("k") === "allow").as("allow"),
        col("v").as("prefix"))
  }

  /** `Sitemap:` directives from raw robots.txt bodies — the seed
    * source [[expandSitemaps]] starts from (robots.txt is where a
    * host DECLARES its sitemaps; sitemaps.org §"informing search
    * engines"). Per the protocol the directive is GROUP-INDEPENDENT
    * — it applies regardless of any User-agent section it happens to
    * sit in — so this is a flat per-line scan, no group resolution:
    * case-insensitive key, RFC *WS (space/tab) trimming, `#` comment
    * stripping, one (host, sitemap_url) row per directive with the
    * host's own line order preserved in `idx`. Empty values drop.
    * Map-only: line explode + anchored extract, no shuffle. */
  def extractRobotsSitemaps(df: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    def hTrim(c: Column): Column =
      regexp_replace(c, "^[ \\t]+|[ \\t]+$", "")
    df.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("idx", "line")))
      .select(col("host"), col("idx"),
        hTrim(regexp_extract(
          hTrim(regexp_replace(col("line"), "#.*$", "")),
          "(?i)^sitemap\\s*:(.*)$", 1)).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
  }

  /** `Crawl-delay:` extraction with the SAME group resolution as
    * [[parseRobotsTxt]] — unlike `Sitemap:`, crawl-delay is
    * group-SCOPED (the Bing/Yandex extension convention: the delay in
    * the group your agent matched applies to you; RFC 9309 leaves it
    * as an "other record" inside the group). Group attribution is
    * [[parseRobotsTxt]]'s convention with crawl-delay PROMOTED to a
    * recognized rule line: a crawl-delay between two User-agent
    * lines closes the first header (the delay belongs to the agent
    * it follows), exactly as an allow/disallow line would — the
    * behavior of parsers that honor the extension. parseRobotsTxt
    * itself (which ignores the key) would merge such UA lines into
    * one header; the two functions deliberately diverge on that
    * pathological shape and nowhere else, spec-pinned. Within the
    * selected best-tier groups the FIRST directive
    * in file order wins (the multi-group/multi-line tie convention
    * of the parsers that honor the extension); values must be
    * non-negative decimal seconds — anything else (`soon`, negatives,
    * empties) drops. Output: one `(host, crawl_delay_ms)` row per
    * host that declares a valid delay for the agent — integer
    * milliseconds, engine-portable.
    *
    * Scale shape: [[parseRobotsTxt]]'s exactly — line explode
    * map-only, two windows PARTITIONED BY HOST (bounded by the
    * protocol's 500 KiB robots.txt cap, not corpus size), bounded
    * aggregates for tier/best/first resolution. */
  def extractCrawlDelay(df: DataFrame, hostCol: String, txtCol: String,
      agent: String = "*"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)
    def hTrim(c: Column): Column =
      regexp_replace(c, "^[ \\t]+|[ \\t]+$", "")
    val kv = df.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("idx", "line")))
      .select(col("host"), col("idx"),
        hTrim(regexp_replace(col("line"), "#.*$", "")).as("l"))
      .select(col("host"), col("idx"),
        lower(regexp_extract(col("l"), "^([A-Za-z-]+)\\s*:", 1)).as("k"),
        hTrim(regexp_extract(col("l"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("v"))
      .filter(col("k").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
    val w = Window.partitionBy("host").orderBy("idx")
    val grouped = kv
      .withColumn("_ua", col("k") === "user-agent")
      .withColumn("_start",
        (col("_ua") && !coalesce(lag(col("_ua"), 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("_g", sum(col("_start")).over(w))
    val tiers = grouped.filter(col("k") === "user-agent")
      .groupBy(col("host"), col("_g"))
      .agg(max(when(lower(col("v")) === agentLower, 2)
        .when(col("v") === "*", 1).otherwise(0)).as("_tier"))
    val best = tiers.groupBy("host").agg(max(col("_tier")).as("_best"))
    val selected = tiers.join(best, Seq("host"))
      .filter(col("_tier") === col("_best") && col("_tier") > 0)
      .select(col("host"), col("_g"))
    grouped.filter(col("k") === "crawl-delay" &&
        col("v").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .join(selected, Seq("host", "_g"))
      .groupBy(col("host"))
      .agg(min_by(col("v"), col("idx")).as("_v"))
      .select(col("host"),
        round(col("_v").cast(DoubleType) * 1000).cast(LongType)
          .as("crawl_delay_ms"))
  }

  /** Sitemap extraction — the OTHER frontier seed next to page
    * outlinks: parse sitemap XML (plain `<urlset>` entries and
    * `<sitemapindex>` child-sitemap entries, sitemaps.org protocol)
    * into (id, entry_idx, kind, url, lastmod) rows. `kind` is `url`
    * for page entries and `sitemap` for index entries (a crawler
    * fetches the latter recursively); `lastmod` is the raw value or
    * NULL when absent; `<loc>` values are whitespace-trimmed and
    * XML's five predefined entities (incl. `&apos;`, which the
    * sitemaps.org protocol mandates for apostrophes) plus the common
    * `&#39;` numeric reference decode with `&amp;` last (the
    * [[TextAnalysis.stripHtml]] order — sitemap URLs legally carry
    * `&amp;` in query strings). Map-only: one block scan + in-array
    * extraction →
    * posexplode; all patterns are RE2-compatible (non-greedy, no
    * lookahead) so the oracle replays them verbatim. Entries with an
    * empty/missing `<loc>` drop. */
  def extractSitemapUrls(df: DataFrame, idCol: String,
      xmlCol: String): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?is)<(?:url|sitemap)>.*?</(?:url|sitemap)>"), lit(0))
    def decode(x: Column): Column =
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&#39;" -> "'", "&amp;" -> "&")
        .foldLeft(x) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val entries = filter(
      transform(blocks, b => struct(
        when(b.rlike("(?is)^<url>"), lit("url"))
          .otherwise(lit("sitemap")).as("kind"),
        decode(regexp_extract(b, "(?is)<loc>\\s*([^<]*?)\\s*</loc>", 1))
          .as("url"),
        nullif(regexp_extract(b,
          "(?is)<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1), lit(""))
          .as("lastmod"))),
      e => e.getField("url") =!= "")
    df.select(col(idCol), posexplode(entries).as(Seq("entry_idx", "e")))
      .select(col(idCol), col("entry_idx"), col("e.kind").as("kind"),
        col("e.url").as("url"), col("e.lastmod").as("lastmod"))
  }

  /** Recursive sitemap expansion — the driver loop that turns
    * [[extractSitemapUrls]]'s per-document parse into the full
    * frontier seed set: a `<sitemapindex>` entry (`kind='sitemap'`)
    * points at ANOTHER sitemap that must be fetched and re-parsed,
    * and the sitemaps.org protocol allows indexes of indexes. Per
    * level: collect the yet-unseen child-sitemap URLs, `fetch` their
    * bodies (`fetch` receives a one-column DataFrame named `urlCol`
    * and returns (`urlCol`, `xmlCol`) rows — compose with the HTTP
    * source, or a lookup join in tests; URLs it fails to return
    * simply contribute no entries), parse, repeat to `maxDepth`
    * levels. Already-seen
    * sitemap URLs are never re-fetched (an index that lists itself —
    * or two indexes listing each other — terminates instead of
    * looping). Returns the page-URL rows (`kind='url'`) from every
    * level, deduplicated: (url, lastmod) keyed by url, min lastmod on
    * conflict (deterministic).
    *
    * Scale shape: each level is one distributed parse + one anti-join
    * against the seen set; the driver holds NOTHING but the loop
    * counter — URL sets stay DataFrames (the seen set
    * localCheckpoints per level: it feeds an anti-join every later
    * level, and without truncation level d re-derives d parses). A
    * level with no new sitemap URLs stops the loop early; `maxDepth`
    * bounds a hostile index chain (protocol practice is ≤2 levels). */
  /** Small-seed tier threshold for [[expandSitemaps]] (r16): the
    * collected per-level parse output (kind, url, lastmod rows) stays
    * under this many rows or the loop falls back to the distributed
    * arm mid-flight with its state rebuilt as DataFrames. */
  private[graft] val LocalExpandRowThreshold = 100000

  def expandSitemaps(seeds: DataFrame, urlCol: String, xmlCol: String,
      fetch: DataFrame => DataFrame, maxDepth: Int = 5,
      localRowThreshold: Int = LocalExpandRowThreshold): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be at least 1")
    val spark = seeds.sparkSession
    def parsed(df: DataFrame): DataFrame =
      extractSitemapUrls(df.withColumnRenamed(urlCol, "_src"), "_src",
        xmlCol)
    // the distributed loop, resumable from any (out, seen, depth)
    // state — both the >cap path (production: seeds estimate over the
    // byte cap, no driver state ever) and the local tier's mid-flight
    // fallback land here
    def distributedFrom(out0: DataFrame, seen0: DataFrame,
        depth0: Int): DataFrame = {
      var out = out0
      var seen = seen0
      var depth = depth0
      var more = true
      while (depth < maxDepth && more) {
        val next = out.filter(col("kind") === "sitemap")
          .select(col("url")).distinct()
          .join(seen, Seq("url"), "left_anti").localCheckpoint()
        if (next.isEmpty) more = false
        else {
          seen = seen.union(next).localCheckpoint()
          val bodies = fetch(next.withColumnRenamed("url", urlCol))
          out = out.union(parsed(bodies)
            .select(col("kind"), col("url"), col("lastmod")))
            .localCheckpoint()
          depth += 1
        }
      }
      out.filter(col("kind") === "url")
        .groupBy(col("url")).agg(min(col("lastmod")).as("lastmod"))
    }
    // r16 small-seed tier (the r15 verdict's q173 item): the
    // distributed loop pays ~4 actions + 2 shuffles PER LEVEL
    // (anti-join, distinct, three localCheckpoints, isEmpty) for
    // frontier levels that at bench/dev scale hold dozens of rows.
    // Under the byte-cap gate (estimate check only — no job on the
    // production path) the loop keeps its state on the driver and
    // pays exactly ONE action per level: fetch+parse+collect. The
    // parse itself stays the SAME distributed extractSitemapUrls
    // expression pipeline — no reimplemented XML/regex semantics.
    // A level that blows the row threshold rebuilds (out, seen) as
    // DataFrames and resumes the distributed loop at that depth.
    if (seeds.queryExecution.optimizedPlan.stats.sizeInBytes >
        LocalGraphBytesCap)
      return distributedFrom(
        parsed(seeds).select(col("kind"), col("url"), col("lastmod"))
          .localCheckpoint(),
        seeds.select(col(urlCol).as("url")).distinct().localCheckpoint(),
        1)
    def collectEntries(df: DataFrame): Array[(String, String, String)] =
      df.select(col("kind"), col("url"), col("lastmod")).collect()
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2)))
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String)]
    entries ++= collectEntries(parsed(seeds))
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    seen ++= seeds.select(col(urlCol).as("url")).distinct()
      .collect().iterator.filterNot(_.isNullAt(0)).map(_.getString(0))
    def fallback(depth: Int): DataFrame = {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val outDf = spark.createDataFrame(
        spark.sparkContext.parallelize(entries.toSeq.map { case (k, u, l) =>
          org.apache.spark.sql.Row(k, u, l)
        }, 1),
        StructType(Seq(StructField("kind", StringType),
          StructField("url", StringType), StructField("lastmod", StringType))))
        .localCheckpoint()
      val seenDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          seen.toSeq.map(org.apache.spark.sql.Row(_)), 1),
        StructType(Seq(StructField("url", StringType)))).localCheckpoint()
      distributedFrom(outDf, seenDf, depth)
    }
    if (entries.length > localRowThreshold) return fallback(1)
    var depth = 1
    var more = true
    while (depth < maxDepth && more) {
      val next = entries.iterator.filter(_._1 == "sitemap").map(_._2)
        .filterNot(seen).toArray.distinct
      if (next.isEmpty) more = false
      else {
        seen ++= next
        val nextDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            next.toSeq.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(urlCol,
              org.apache.spark.sql.types.StringType))))
        entries ++= collectEntries(parsed(fetch(nextDf)))
        depth += 1
        if (entries.length > localRowThreshold) return fallback(depth)
      }
    }
    // (url, min lastmod) over the page rows — Spark's min: UTF8 binary
    // order, nulls ignored, all-null group → null
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, String]
    entries.iterator.filter(_._1 == "url").foreach { case (_, u, l) =>
      if (!acc.contains(u)) acc(u) = l
      else if (l != null) {
        val cur = acc(u)
        if (cur == null ||
          org.apache.spark.unsafe.types.UTF8String.fromString(l)
            .compareTo(
              org.apache.spark.unsafe.types.UTF8String.fromString(cur)) < 0)
          acc(u) = l
      }
    }
    localResult(spark,
      acc.iterator.map { case (u, l) =>
        org.apache.spark.sql.Row(u, l)
      }.toSeq,
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lastmod",
        org.apache.spark.sql.types.StringType))
  }

  /** An href attribute VALUE in any of HTML's three quoting forms:
    * double-quoted, single-quoted, or unquoted (unquoted values run to
    * the first whitespace, quote, or `>`). */
  private val HrefValue = "(\"[^\"]*\"|'[^']*'|[^\\s\"'>]+)"
  // Outlinks come from ANCHOR tags only (`<a>`, and `<area>` image
  // maps): scanning every href attribute would land `<link
  // rel="stylesheet">` CSS, preloads, and canonical tags in the crawl
  // frontier. `[^>]*?` keeps the match inside one tag (it cannot
  // cross '>'), so an href elsewhere on the page never attaches to an
  // anchor; `\s` after the name keeps <a..> from matching <area>'s
  // prefix or <abbr>. (A '>' inside a quoted EARLIER attribute value
  // ends the scan early — accepted edge.)
  private val AnchorHrefPattern =
    "(?i)<(?:a|area)\\s[^>]*?href\\s*=\\s*" + HrefValue
  // `<base\s` (not `<base[^>]*`): a tag whose name merely STARTS with
  // "base" (<basefont>) must not hijack the page base
  private val BaseHrefPattern = "(?i)<base\\s[^>]*href\\s*=\\s*" + HrefValue

  /** Strip the quoting form off a matched [[HrefValue]] token. */
  private def unquote(x: Column): Column =
    when(x.startsWith("\"") || x.startsWith("'"),
      x.substr(lit(2), length(x) - 2)).otherwise(x)

  /** One pass of RFC 3986 dot-segment removal: `/./` collapses,
    * `/seg/../` pops, a root-level `/../` is ignored (RFC 3986
    * §5.2.4's "if the buffer is empty" arm). All replaces are global
    * per pass; one pass resolves one nesting level. */
  private def dotPass(p: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(p,
      lit("/\\./"), lit("/")),
      lit("/[^/]+/\\.\\./"), lit("/")),
      lit("^/\\.\\./"), lit("/"))

  /** Dot-segments a crawler must not emit verbatim (`/a/../b` is the
    * same resource as `/b`): trailing bare `.`/`..` get their slash,
    * then [[dotPass]] runs a FIXED 10 rounds — paths nested deeper
    * than 10 dot-segment levels keep their residue (bounded by
    * construction so the same computation replays in the oracle's
    * recursive CTE; real hrefs are 1-2 levels). Applies to the whole
    * path+query string — a query string containing `/../` is
    * normalized too (degenerate; documented rather than special-
    * cased). */
  private def normalizeDots(p: Column): Column = {
    val pre = regexp_replace(regexp_replace(p,
      lit("/\\.$"), lit("/./")), lit("/\\.\\.$"), lit("/../"))
    (1 to 10).foldLeft(pre)((acc, _) => dotPass(acc))
  }

  /** The `rel=canonical` attribute in any quoting form. The unquoted
    * alternative is bounded by a delimiter class — without it,
    * `rel=canonical-alt` would false-positive as a prefix match. The
    * class differs by position: mid-tag (rel before href) the next
    * char must be `\s` or `/`; tag-final (rel after href) it may also
    * be the closing `>`. */
  private def relCanonical(delim: String) =
    "rel\\s*=\\s*(?:\"canonical\"|'canonical'|canonical" + delim + ")"
  private val CanonRelFirst = "(?i)<link\\s[^>]*?" +
    relCanonical("[\\s/]") + "[^>]*?href\\s*=\\s*" + HrefValue
  private val CanonHrefFirst = "(?i)<link\\s[^>]*?href\\s*=\\s*" +
    HrefValue + "[^>]*?" + relCanonical("[\\s/>]")

  /** Canonical-URL extraction (`<link rel="canonical">`) — the page's
    * own declared identity, and the dedup key a crawl pipeline
    * prefers over the fetch URL (mirrors, tracking params, and mobile
    * variants all declare one canonical). Handles both attribute
    * orders (rel-then-href and href-then-rel, any quoting form); the
    * POSITIONALLY first canonical tag wins regardless of its
    * attribute order (the two order-patterns' match offsets are
    * compared — preferring one pattern unconditionally would let a
    * later rel-first tag beat an earlier href-first one). Absolute
    * http(s) values pass through, protocol-relative `//host/p`
    * resolves with the https scheme, root-relative values resolve
    * against `https://<host>`, and dir-relative values resolve
    * against the page path's directory when `path` is supplied
    * (dot-segments collapse, as in [[extractLinks]]) — without a
    * `path`, dir-relative yields NULL, as do other schemes, empty
    * values, and a page with no canonical tag. A `<base href>` tag is
    * NOT consulted (documented limit — pages that declare both a base
    * and a relative canonical are vanishingly rare). Map-only,
    * codegen'd; patterns RE2-compatible. */
  def canonicalUrl(html: Column, host: Column): Column =
    canonUrl(html, host, None)

  /** [[canonicalUrl]] with the page path supplied — dir-relative
    * canonicals resolve against the path's directory. */
  def canonicalUrl(html: Column, host: Column, path: Column): Column =
    canonUrl(html, host, Some(path))

  private def canonUrl(html: Column, host: Column,
      path: Option[Column]): Column = {
    // LET-BIND the extracted raw value: the resolution CASE below
    // references it ~8 times, and CASE branches defeat codegen
    // subexpression hoisting — un-bound, each reference re-runs the
    // two lazy-quantifier link-tag extracts per row (the r1 "loop
    // inversion" lesson; measured 4× on q120). A 1-element aggregate
    // makes `raw` a lambda variable, evaluated once per row. The
    // positional compare (two extra regexp_instr passes) only runs
    // when BOTH attribute orders matched — a page with two canonical
    // tags, vanishingly rare.
    // Presence is gated on regexp_instr > 0, NOT on the extracted
    // group being non-empty: a rel-first canonical tag with an EMPTY
    // href is still the page's first canonical declaration, and the
    // positional first-tag-wins rule must resolve it ("" → NULL
    // below), not fall through to a later href-first tag. The two
    // positions are let-bound in their own 1-element aggregate so
    // each regex runs once per row regardless of which CASE branch
    // references them.
    val relFirst = regexp_extract(html, CanonRelFirst, 1)
    val hrefFirst = regexp_extract(html, CanonHrefFirst, 1)
    val rawExpr = unquote(
      aggregate(
        array(struct(
          regexp_instr(html, lit(CanonRelFirst)).as("r"),
          regexp_instr(html, lit(CanonHrefFirst)).as("h"))),
        lit(null).cast(StringType),
        (_, p) =>
          when(p.getField("r") === 0 && p.getField("h") === 0,
            lit(null).cast(StringType))
            .when(p.getField("h") === 0, relFirst)
            .when(p.getField("r") === 0, hrefFirst)
            .when(p.getField("r") <= p.getField("h"), relFirst)
            .otherwise(hrefFirst)))
    def norm(p: Column): Column =
      when(p.contains("/."), normalizeDots(p)).otherwise(p)
    aggregate(array(rawExpr), lit(null).cast(StringType), (_, raw) =>
      when(raw.rlike("(?i)^https?://"), raw)
        .when(raw.startsWith("//"), concat(lit("https:"), raw))
        .when(raw.startsWith("/"), concat(lit("https://"), host, norm(raw)))
        .when(raw === "" || raw.startsWith("#") || raw.startsWith("?") ||
          raw.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null).cast("string"))
        .otherwise(path match {
          case None => lit(null).cast("string")
          case Some(p) =>
            val pagePath = coalesce(p, lit("/"))
            val d = regexp_extract(pagePath, "^(.*/)", 1)
            val dir = when(d === "", lit("/")).otherwise(d)
            concat(lit("https://"), host, norm(concat(dir, raw)))
        }))
  }

  /** Outlink extraction for the crawl frontier: every ANCHOR
    * (`<a>`/`<area>`) `href` value in any quoting form (double-,
    * single-, or unquoted — `<link>`/`<script>` hrefs are resource
    * references, not outlinks, and stay out of the frontier),
    * resolved to an absolute URL per RFC 3986 resolution against the
    * page's base:
    *  - absolute http(s) links pass through verbatim;
    *  - non-http(s) schemes (`mailto:`, `javascript:`, `data:`, …),
    *    empty values, pure fragments (`#…`), and query-only links
    *    (`?…`) are dropped — the frontier wants fetchable URLs;
    *  - protocol-relative `//host/p` resolves with the `https` scheme;
    *  - root-relative `/p` resolves against the base's scheme+host;
    *  - dir-relative `p` resolves against the base DIRECTORY;
    * where the base is the page's first `<base href>` when present
    * and absolute-http(s) (relative `<base>` values are ignored —
    * resolving them needs the page URL, which then IS the base), else
    * `https://<hostCol><pathCol>` (page path defaults to `/` when
    * `pathCol` is not supplied — dir-relative links then resolve
    * against the site root). Resolved relative links get dot-segment
    * normalization ([[normalizeDots]], skipped when the path has no
    * `/.` substring — no dot-segment, no regex chain); absolute links
    * pass through unnormalized. Map-only: regexp scan → in-array
    * transform/filter → posexplode; no shuffle.
    *
    * Output: (idCol, link_idx, url) — link_idx is the 0-based position
    * among the KEPT links, so downstream joins have a stable per-page
    * ordinal. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String,
      hostCol: String, pathCol: String = null): DataFrame = {
    val html = col(htmlCol)
    val baseRaw = unquote(regexp_extract(html, BaseHrefPattern, 1))
    val baseAbs = when(baseRaw.rlike("(?i)^https?://"), baseRaw)
    val baseRoot = coalesce(
      regexp_extract(baseAbs, "(?i)^https?://[^/?#]*", 0),
      concat(lit("https://"), col(hostCol)))
    val pagePath =
      if (pathCol == null) lit("/") else coalesce(col(pathCol), lit("/"))
    val basePathRaw =
      regexp_extract(baseAbs, "(?i)^https?://[^/?#]*(/[^?#]*)", 1)
    val basePath = when(baseAbs.isNotNull,
      when(basePathRaw === "", lit("/")).otherwise(basePathRaw))
      .otherwise(pagePath)
    val baseDir = {
      val d = regexp_extract(basePath, "^(.*/)", 1)
      when(d === "", lit("/")).otherwise(d)
    }
    // Stage the base columns and the token array as PROJECTED
    // attributes before the per-link lambda: inlining baseRoot/baseDir
    // (regexp chains over the whole page) into transform() would
    // re-evaluate them once per LINK instead of once per row — the
    // HOF-argument re-evaluation hazard the shingles/repetitionStats
    // let-bindings exist for (Catalyst won't collapse the projection
    // back in: the aliases are non-cheap and consumed inside a lambda).
    val staged = df.select(col(idCol),
      baseRoot.as("_broot"), baseDir.as("_bdir"),
      regexp_extract_all(html, lit(AnchorHrefPattern), lit(1)).as("_toks"))
    // `/.`-free paths skip the 30-regexp normalizeDots chain entirely
    // (the overwhelmingly common case; a path with no `/.` substring
    // has no dot-segment, so the guard is semantics-neutral and the
    // oracle replays the unguarded recursion)
    def norm(p: Column): Column =
      when(p.contains("/."), normalizeDots(p)).otherwise(p)
    val resolved = filter(
      transform(col("_toks"), t => {
        val l = unquote(t)
        when(l.rlike("(?i)^https?://"), l)
          .when(l.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"),
            lit(null).cast("string"))
          .when(l.startsWith("//"), concat(lit("https:"), l))
          .when(l.startsWith("/"),
            concat(col("_broot"), norm(l)))
          .when(l === "" || l.startsWith("#") || l.startsWith("?"),
            lit(null).cast("string"))
          .otherwise(concat(col("_broot"),
            norm(concat(col("_bdir"), l))))
      }),
      l => l.isNotNull)
    staged.select(col(idCol),
      posexplode(resolved).as(Seq("link_idx", "url")))
  }

  /** PageRank over the crawl link graph in EXACT integer arithmetic —
    * the standard frontier-prioritization / quality-prior signal.
    * Ranks live in micro-units (initial 10⁶ per node); damping is the
    * exact rational `dampNum/dampDen` (default 85/100); every division
    * is integral floor division on positives — so a fixed iteration
    * count yields bit-identical ranks in any engine (float PageRank is
    * summation-order-dependent and can never hash-match an oracle).
    * Per iteration: `contrib(u→v) = rank(u) div outdeg(u)`,
    * `rank'(v) = (10⁶·(dampDen−dampNum)) div dampDen +
    * (dampNum·Σcontrib(v)) div dampDen`. Dangling-node mass is
    * DROPPED by default — the deterministic, action-free choice;
    * dangling nodes still receive the base term and
    * in-contributions. `redistributeDangling = true` instead adds
    * `danglingSum div N` (exact integral division; danglingSum is a
    * bounded 1-row action per iteration) to EVERY node's contribution
    * sum before the damping multiply — total mass is conserved up to
    * the two floor divisions.
    *
    * Scale shape: nodes/outdeg are plain aggregates; each iteration
    * is one equi-join on src plus one sum keyed by dst — map-side
    * partial combine bounds a mega-hub's fan-in (its contributions
    * pre-aggregate per map partition; no per-node window, no
    * collect). Lineage grows linearly in `iters` — fine for the
    * 3-10 iterations a quality prior needs; checkpoint between
    * iterations if you push to convergence-scale counts. Σcontrib
    * must stay under 2⁶³/dampNum — holds through ~10¹⁴ nodes at
    * micro-unit scale. Output: (node, rank). */
  /** The materialized loop invariants of an integer-PageRank run:
    * `(edges, nodes, edges-with-outdeg, dangling-nodes)` — see
    * [[pageRankInt]] for why they localCheckpoint pre-partitioned.
    * `dangling` is lazy (a thunk): only the redistribution arm reads
    * it, and the default mass-dropping mode must not pay its
    * anti-join + checkpoint job. */
  private case class PrInvariants(e: DataFrame, nodes: DataFrame,
      eo: DataFrame, danglingThunk: () => DataFrame) {
    lazy val dangling: DataFrame = danglingThunk()
  }

  /** r15 small-graph tier threshold — the
    * [[Dedup.connectedComponents]] `localEdgeThreshold` convention
    * extended to every iterative graph operator here: a crawl-cycle
    * edge list at bench/dev scale is a few thousand rows, and each
    * distributed round costs 2-4 Spark jobs (checkpoint + action)
    * whose fixed costs dwarf the arithmetic (r15 profile: kCore
    * construction 3.5 s for microseconds of peeling). At or under the
    * threshold the loop runs in-process on the collected edge list —
    * same exact integer arithmetic, same tie-breaks, same output,
    * spec-pinned per operator. Past it the distributed loop runs
    * unchanged — the 100 TB path. */
  private val LocalGraphEdgeThreshold = 2000000L

  /** Driver-safety byte cap for the local tier (r16, r15 ADVICE): the
    * row threshold alone would collect a byte-FAT edge list — 2M
    * long-URL edges can be GBs of driver heap. The optimizer's size
    * estimate (taken from the PRE-checkpoint lineage, where file-scan
    * sizes are known) is checked BEFORE the count() action, so the
    * production >threshold path pays NO job at all: at 100 TB the
    * estimate exceeds the cap immediately. At bench/dev scale every
    * sf input is MBs, far under the cap, so the tier decision falls
    * through to the exact row count as before. */
  private val LocalGraphBytesCap = BigInt(256L << 20)

  /** Node types the local tiers may collect (r16, r15 ADVICE): types
    * whose JVM representation is value-equal under HashMap hashing
    * AND ordered like Spark's ORDER BY via [[graphLt]]. Binary and
    * array ids collect as Array[Byte]/WrappedArray — reference
    * equality in a HashMap and a ClassCastException in graphLt —
    * where the distributed equi-joins and min_by work fine, so those
    * graphs take the distributed loop. */
  private def localTierSafeType(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case StringType | org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | LongType |
         org.apache.spark.sql.types.FloatType | DoubleType |
         org.apache.spark.sql.types.BooleanType |
         org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.TimestampType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _ => false
  }

  /** Total order matching Spark's ORDER BY for the id types graph
    * operators carry: UTF8 binary for strings (NOT UTF-16 — the
    * componentsLocal lesson), natural order otherwise. Callers are
    * gated by [[localTierSafeType]], so the Comparable cast is total
    * for every type that can reach it. */
  private def graphLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: String, y: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
  }

  /** Collect a materialized (localCheckpointed) 2-col edge list when
    * it is at or under the tier threshold; None past it.
    * `preCheckpoint` is the same projection BEFORE localCheckpoint —
    * a checkpointed LogicalRDD may report the unknown-size default,
    * while the original lineage carries the file-scan estimate the
    * short-circuit needs. Gate order: node type (free), size estimate
    * (driver-side, no job — false at production scale, so the 100 TB
    * path no longer pays a count job per operator call), exact
    * count. */
  private[graft] def edgesIfSmall(e: DataFrame, preCheckpoint: DataFrame,
      threshold: Long = LocalGraphEdgeThreshold,
      bytesCap: BigInt = LocalGraphBytesCap): Option[Array[(Any, Any)]] = {
    val fs = e.schema.fields
    if (!localTierSafeType(fs(0).dataType) ||
        !localTierSafeType(fs(1).dataType)) return None
    if (preCheckpoint.queryExecution.optimizedPlan.stats.sizeInBytes >
        bytesCap) return None
    if (e.count() <= threshold)
      Some(e.collect().map(r => (r.get(0), r.get(1))))
    else None
  }

  /** One-partition result table with the given fields — local tiers
    * return through this so the node column keeps its input type. */
  private def localResult(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      fields: org.apache.spark.sql.types.StructField*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(fields))

  /** The shared PageRank edge projection: null src/dst rows drop HERE
    * (r16, r15 ADVICE) — the distributed equi-joins silently dropped
    * null-keyed CONTRIBUTIONS but still surfaced a null node row,
    * while the local HashMaps accumulated under the null key; both
    * tiers now see the same (null-free) edge set, like [[hitsInt]]. */
  private def prEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

  private def prInvariantsFromE(e: DataFrame): PrInvariants = {
    // Materialize the loop invariants ONCE (lineage truncation, the
    // connectedComponents convention): without this the unrolled plan
    // re-derives edges/nodes/outdeg inside EVERY iteration — the
    // edge-generation subtree executed 16× per 3 iterations in the
    // pre-checkpoint PlanAudit. Both invariants checkpoint ALREADY
    // HASH-PARTITIONED on their join keys (localCheckpoint preserves
    // outputPartitioning), so each iteration's joins re-shuffle only
    // the iteration-varying ranks side — at web scale the edge table
    // dwarfs the rank table, and moving it once instead of per
    // iteration is the dominant cost of the loop.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).localCheckpoint()
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")),
      Seq("src")).repartition(col("src")).localCheckpoint()
    PrInvariants(e, nodes, eo,
      () => nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").localCheckpoint())
  }

  /** One exact-integer PageRank iteration. `extraContrib` is added to
    * every node's contribution sum BEFORE the damping multiply — 0 in
    * the mass-dropping mode, `danglingSum div N` in the
    * redistribution arm. */
  private def prStep(inv: PrInvariants, ranks: DataFrame, base: Long,
      dampNum: Long, dampDen: Long, extraContrib: Long): DataFrame = {
    val contrib = inv.eo.join(ranks, inv.eo("src") === ranks("node"))
      .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
      .groupBy("node").agg(sum(col("c")).as("cs"))
    inv.nodes.join(contrib, Seq("node"), "left")
      .select(col("node"), (lit(base) +
        expr(s"($dampNum * (coalesce(cs, CAST(0 AS BIGINT)) + " +
          s"CAST($extraContrib AS BIGINT))) div $dampDen"))
        .cast("long").as("rank"))
  }

  /** Σ rank over dangling nodes (one bounded 1-row action). */
  private def danglingSum(inv: PrInvariants, ranks: DataFrame): Long = {
    val r = inv.dangling.join(ranks, Seq("node"))
      .agg(sum(col("rank"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  def pageRankInt(edges: DataFrame, iters: Int, dampNum: Long = 85,
      dampDen: Long = 100,
      redistributeDangling: Boolean = false,
      localEdgeThreshold: Long = LocalGraphEdgeThreshold): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    val e0 = prEdges(edges)
    val e = e0.localCheckpoint()
    // r15 small-graph tier (see [[LocalGraphEdgeThreshold]])
    edgesIfSmall(e, e0, localEdgeThreshold).foreach { es =>
      return pageRankLocal(e.sparkSession, es, e.schema("src").dataType,
        iters, dampNum, dampDen, redistributeDangling)
    }
    val inv = prInvariantsFromE(e)
    val base = 1000000L * (dampDen - dampNum) / dampDen
    // The redistribution arm needs the CURRENT dangling mass each
    // iteration — a 1-row action per iteration (N is one more). The
    // default mass-dropping mode stays action-free and lazily
    // composable, exactly as before.
    lazy val n = inv.nodes.count()
    var ranks = inv.nodes.select(col("node"), lit(1000000L).as("rank"))
    for (i <- 1 to iters) {
      val extra =
        if (!redistributeDangling) 0L
        else if (n == 0L) 0L
        else danglingSum(inv, ranks) / n
      ranks = prStep(inv, ranks, base, dampNum, dampDen, extra)
      // under redistribution every iteration runs an action over the
      // ranks lineage — truncate it so iteration i is O(1) deep, not
      // O(i) (the convergence-mode cadence rationale, forced here)
      if (redistributeDangling && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Driver-local [[pageRankInt]] — bit-identical exact integer
    * arithmetic on the collected edge list (multi-edges kept: outdeg
    * and contributions count edge ROWS, exactly as the distributed
    * join does). */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Any, Any)], nodeType: org.apache.spark.sql.types.DataType,
      iters: Int, dampNum: Long, dampDen: Long,
      redistribute: Boolean): DataFrame = {
    val base = 1000000L * (dampDen - dampNum) / dampDen
    val outdeg = scala.collection.mutable.HashMap.empty[Any, Long]
    es.foreach { case (s, _) => outdeg(s) = outdeg.getOrElse(s, 0L) + 1L }
    val nodes: Set[Any] =
      es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    val n = nodes.size.toLong
    var rank: Map[Any, Long] = nodes.iterator.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val extra =
        if (!redistribute || n == 0L) 0L
        else nodes.iterator.filterNot(outdeg.contains).map(rank).sum / n
      val cs = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (s, d) =>
        cs(d) = cs.getOrElse(d, 0L) + rank(s) / outdeg(s)
      }
      rank = nodes.iterator.map(nd => nd ->
        (base + dampNum * (cs.getOrElse(nd, 0L) + extra) / dampDen)).toMap
    }
    localResult(spark,
      nodes.toSeq.map(nd => org.apache.spark.sql.Row(nd, rank(nd))),
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType))
  }

  /** Driver-local [[pageRankConverge]] — [[pageRankLocal]]'s exact
    * integer iteration plus the convergence rule: per iteration the
    * largest per-node |Δrank| compares against `tolMicro`, stopping
    * the loop exactly where the distributed max-|Δ| action would
    * (spec-pinned: same ranks, same iteration count, same flag). */
  private def pageRankConvergeLocal(
      spark: org.apache.spark.sql.SparkSession, es: Array[(Any, Any)],
      nodeType: org.apache.spark.sql.types.DataType, maxIters: Int,
      tolMicro: Long, dampNum: Long, dampDen: Long,
      redistribute: Boolean): (DataFrame, Int, Boolean) = {
    val base = 1000000L * (dampDen - dampNum) / dampDen
    val outdeg = scala.collection.mutable.HashMap.empty[Any, Long]
    es.foreach { case (s, _) => outdeg(s) = outdeg.getOrElse(s, 0L) + 1L }
    val nodes: Set[Any] =
      es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    val n = nodes.size.toLong
    var rank: Map[Any, Long] = nodes.iterator.map(_ -> 1000000L).toMap
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val extra =
        if (!redistribute || n == 0L) 0L
        else nodes.iterator.filterNot(outdeg.contains).map(rank).sum / n
      val cs = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (s, d) =>
        cs(d) = cs.getOrElse(d, 0L) + rank(s) / outdeg(s)
      }
      val next: Map[Any, Long] = nodes.iterator.map(nd => nd ->
        (base + dampNum * (cs.getOrElse(nd, 0L) + extra) / dampDen)).toMap
      val delta = if (nodes.isEmpty) 0L
        else nodes.iterator.map(nd => math.abs(next(nd) - rank(nd))).max
      rank = next
      it += 1
      converged = delta <= tolMicro
    }
    (localResult(spark,
      nodes.toSeq.map(nd => org.apache.spark.sql.Row(nd, rank(nd))),
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType)), it, converged)
  }

  /** Iterate-to-convergence PageRank: run [[pageRankInt]] iterations
    * until the largest per-node rank change is ≤ `tolMicro`
    * micro-units (or `maxIters`), localCheckpointing the rank table
    * every `checkpointEvery` iterations — the Scaladoc warning on the
    * fixed-iteration form (lineage grows linearly in iters) is the
    * reason this mode REQUIRES a cadence: each iteration runs a
    * 1-row max-|Δ| action, and without periodic truncation iteration
    * i would recompute an i-deep plan. A smaller cadence trades
    * checkpoint IO for recompute depth (each delta action re-derives
    * at most `checkpointEvery` iterations).
    *
    * Returns (ranks, iterationsRun, converged) — the flag is explicit
    * because `iterationsRun < maxIters` alone cannot distinguish a
    * run that converges exactly ON the maxIters-th iteration from one
    * that hit the cap still moving. Same exact-integer semantics as
    * [[pageRankInt]] — a converged run's ranks equal the
    * fixed-iteration run at the same count, spec-pinned. */
  def pageRankConverge(edges: DataFrame, maxIters: Int, tolMicro: Long,
      dampNum: Long = 85, dampDen: Long = 100, checkpointEvery: Int = 5,
      redistributeDangling: Boolean = false,
      localEdgeThreshold: Long = LocalGraphEdgeThreshold): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, "maxIters must be at least 1")
    require(tolMicro >= 0, "tolMicro must be non-negative")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    val e0 = prEdges(edges)
    val e = e0.localCheckpoint()
    // r16 small-graph tier (see [[LocalGraphEdgeThreshold]]): the
    // convergence mode pays one max-|Δ| action PER ITERATION on top of
    // pageRankInt's per-round cost — the same fixed-job overhead the
    // r15 tier removed from the fixed-iteration form, only worse.
    edgesIfSmall(e, e0, localEdgeThreshold).foreach { es =>
      return pageRankConvergeLocal(e.sparkSession, es,
        e.schema("src").dataType, maxIters, tolMicro, dampNum, dampDen,
        redistributeDangling)
    }
    val inv = prInvariantsFromE(e)
    val base = 1000000L * (dampDen - dampNum) / dampDen
    lazy val n = inv.nodes.count()
    var ranks = inv.nodes.select(col("node"), lit(1000000L).as("rank"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val extra =
        if (!redistributeDangling) 0L
        else if (n == 0L) 0L
        else danglingSum(inv, ranks) / n
      var next = prStep(inv, ranks, base, dampNum, dampDen, extra)
      if ((it + 1) % checkpointEvery == 0) next = next.localCheckpoint()
      val d = ranks.join(next.withColumnRenamed("rank", "rank_next"),
          Seq("node"))
        .agg(max(abs(col("rank_next") - col("rank")))).collect()(0)
      val delta = if (d.isNullAt(0)) 0L else d.getLong(0)
      ranks = next
      it += 1
      converged = delta <= tolMicro
    }
    (ranks, it, converged)
  }

  /** Personalized (topic-sensitive) PageRank: teleport mass lands
    * ONLY on the `seeds` set instead of uniformly — the crawl-
    * prioritization prior ("rank the web as seen from these trusted
    * hubs"). Same exact integer micro-unit arithmetic as
    * [[pageRankInt]]; the per-node teleport base is
    * `(10⁶·(dampDen−dampNum)·N) div (dampDen·|S|)` for seeds and 0
    * elsewhere (total teleport mass preserved vs the uniform prior).
    * Seeds not present in the graph are ignored; an empty effective
    * seed set fails fast. Same scale shape as pageRankInt: invariants
    * checkpoint once, each iteration shuffles only the rank table. */
  def personalizedPageRankInt(edges: DataFrame, seeds: DataFrame,
      iters: Int, dampNum: Long = 85, dampDen: Long = 100,
      localEdgeThreshold: Long = LocalGraphEdgeThreshold): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    val ePre = prEdges(edges)
    val e0 = ePre.localCheckpoint()
    // r15 small-graph tier (see [[LocalGraphEdgeThreshold]]): seeds
    // still resolve against the graph through a Spark semi-join (the
    // seed table's size is caller-shaped, never assumed driver-sized)
    edgesIfSmall(e0, ePre, localEdgeThreshold).foreach { es =>
      val spark = e0.sparkSession
      val nodeType = e0.schema("src").dataType
      val nodes: Set[Any] =
        es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
      val nodesDf = localResult(spark,
        nodes.toSeq.map(org.apache.spark.sql.Row(_)),
        org.apache.spark.sql.types.StructField("node", nodeType))
      val sdl = seeds.select(col(seeds.columns.head).as("node")).distinct()
        .join(nodesDf, Seq("node"), "left_semi")
        .collect().map(_.get(0)).toSet
      require(sdl.nonEmpty,
        "personalizedPageRankInt: no seed appears in the graph")
      return personalizedPageRankLocal(spark, es, nodeType, nodes, sdl,
        iters, dampNum, dampDen)
    }
    val inv = prInvariantsFromE(e0)
    val sd = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .join(inv.nodes, Seq("node"), "left_semi").localCheckpoint()
    val s = sd.count() // 1-row action
    require(s > 0, "personalizedPageRankInt: no seed appears in the graph")
    val n = inv.nodes.count() // 1-row action
    val baseSeed = (BigInt(1000000L) * (dampDen - dampNum) * n /
      (BigInt(dampDen) * s)).toLong
    val based = inv.nodes
      .join(sd.withColumn("_s", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("_s").isNotNull, lit(baseSeed)).otherwise(lit(0L))
          .as("base"))
      .repartition(col("node")).localCheckpoint()
    var ranks = based.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = inv.eo.join(ranks, inv.eo("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cs"))
      ranks = based.join(contrib, Seq("node"), "left")
        .select(col("node"), (col("base") +
          expr(s"($dampNum * coalesce(cs, CAST(0 AS BIGINT))) " +
            s"div $dampDen")).cast("long").as("rank"))
    }
    ranks
  }

  /** Driver-local [[personalizedPageRankInt]] — same exact integer
    * arithmetic (BigInt seed base, per-edge-row contributions, left
    * coalesce-0), on the collected edge list. */
  private def personalizedPageRankLocal(
      spark: org.apache.spark.sql.SparkSession, es: Array[(Any, Any)],
      nodeType: org.apache.spark.sql.types.DataType, nodes: Set[Any],
      sd: Set[Any], iters: Int, dampNum: Long, dampDen: Long): DataFrame = {
    val n = nodes.size.toLong
    val s = sd.size.toLong
    val baseSeed = (BigInt(1000000L) * (dampDen - dampNum) * n /
      (BigInt(dampDen) * s)).toLong
    val outdeg = scala.collection.mutable.HashMap.empty[Any, Long]
    es.foreach { case (src, _) =>
      outdeg(src) = outdeg.getOrElse(src, 0L) + 1L
    }
    var rank: Map[Any, Long] = nodes.iterator.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val cs = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (src, d) =>
        cs(d) = cs.getOrElse(d, 0L) + rank(src) / outdeg(src)
      }
      rank = nodes.iterator.map { nd =>
        val base = if (sd.contains(nd)) baseSeed else 0L
        nd -> (base + dampNum * cs.getOrElse(nd, 0L) / dampDen)
      }.toMap
    }
    localResult(spark,
      nodes.toSeq.map(nd => org.apache.spark.sql.Row(nd, rank(nd))),
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType))
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community and each round adopts the most
    * frequent label among its neighbors (ties → smallest label) —
    * computed for ALL nodes from the PREVIOUS round's labels, so the
    * result is deterministic (the classic asynchronous LPA is
    * schedule-dependent; this is the deterministic variant a
    * replayable pipeline needs). Edges are treated as UNDIRECTED
    * (symmetrized + dedup); self-loops drop (they only vote a node's
    * own label).
    *
    * Scale shape: per round one edge⋈labels hash join + two hash
    * aggregates ((node, label) counts, then a `min_by` winner per
    * node) — no window, no driver state; labels localCheckpoint per
    * round (the pageRankInt lineage discipline). */
  def labelPropagation(edges: DataFrame, iters: Int,
      localEdgeThreshold: Long = LocalGraphEdgeThreshold): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val cols = edges.columns
    val e0 = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val e1 = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("dst"))
    val e = e1.localCheckpoint()
    // r15 small-graph tier (see [[LocalGraphEdgeThreshold]])
    edgesIfSmall(e, e1, localEdgeThreshold).foreach { es =>
      return labelPropagationLocal(e.sparkSession, es,
        e.schema("src").dataType, iters)
    }
    val nodes = e.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val nbr = e
        .join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("_c"))
      labels = nbr.groupBy(col("src").as("node"))
        .agg(min_by(col("lbl"),
          struct((-col("_c")).as("nc"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    labels
  }

  /** Driver-local [[labelPropagation]] — the same synchronous rounds
    * on the collected symmetrized edge list: every node adopts the
    * most frequent previous-round neighbor label, ties to the
    * smallest label in Spark's ordering ([[graphLt]]). */
  private def labelPropagationLocal(
      spark: org.apache.spark.sql.SparkSession, es: Array[(Any, Any)],
      nodeType: org.apache.spark.sql.types.DataType, iters: Int): DataFrame = {
    val nodes: Set[Any] = es.iterator.map(_._1).toSet
    var lbl: Map[Any, Any] = nodes.iterator.map(nd => nd -> nd).toMap
    for (_ <- 1 to iters) {
      val votes =
        scala.collection.mutable.HashMap.empty[(Any, Any), Long]
      es.foreach { case (src, dst) =>
        val k = (src, lbl(dst))
        votes(k) = votes.getOrElse(k, 0L) + 1L
      }
      val best = scala.collection.mutable.HashMap.empty[Any, (Any, Long)]
      votes.foreach { case ((node, l), c) =>
        best.get(node) match {
          case Some((bl, bc)) if c < bc || (c == bc && !graphLt(l, bl)) => ()
          case _ => best(node) = (l, c)
        }
      }
      lbl = nodes.iterator.map(nd => nd -> best(nd)._1).toMap
    }
    localResult(spark,
      nodes.toSeq.map(nd => org.apache.spark.sql.Row(nd, lbl(nd))),
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("lbl", nodeType))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over the crawl link
    * graph in EXACT integer micro-units — the directory-page /
    * content-page decomposition that complements PageRank's single
    * quality prior. Per iteration (auth first, then hub from the NEW
    * auth, the standard order):
    * `auth_raw(v) = Σ_{u→v} hub(u)`, then every score renormalizes by
    * the exact integral divisor `s = max(1, max(raw) div 10⁶)` —
    * HITS is defined only up to scale, and the classic float L2
    * normalization is summation-order-dependent, so it could never
    * hash-match an oracle; the integral max-renorm keeps the top
    * score at ~10⁶ with zero float ops. Multi-edges collapse
    * (`distinct`) — HITS is an adjacency-matrix algorithm.
    *
    * Scale: per half-iteration one edge join + one bounded max()
    * action (1 row); the edge list and each round's scores are
    * localCheckpointed so iteration i is O(1) plan-deep (the
    * pageRankInt redistribution discipline). Renorm bounds every
    * score ≤ ~10⁶·(raw spread), so `Σ hub` over any in-degree stays
    * far from int64 overflow at any corpus size.
    *
    * Output: (node, hub, auth) — micro-units, top score ≈ 10⁶. */
  def hitsInt(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iters: Int = 2,
      localEdgeThreshold: Long = LocalGraphEdgeThreshold): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val e1 = edges.select(col(srcCol).as("_h_src"), col(dstCol).as("_h_dst"))
      .filter(col("_h_src").isNotNull && col("_h_dst").isNotNull)
      .distinct()
    val e = e1.localCheckpoint()
    // r15 small-graph tier (see [[LocalGraphEdgeThreshold]])
    edgesIfSmall(e, e1, localEdgeThreshold).foreach { es =>
      return hitsLocal(e.sparkSession, es, e.schema("_h_src").dataType,
        iters)
    }
    val nodes = e.select(col("_h_src").as("node"))
      .union(e.select(col("_h_dst").as("node")))
      .distinct().localCheckpoint()

    def rescaled(raw: DataFrame, out: String): DataFrame = {
      val r = raw.localCheckpoint() // max() action + join reuse: 1 pass
      val m = r.agg(coalesce(max("raw"), lit(0L))).first().getLong(0)
      val s = math.max(1L, m / 1000000L)
      nodes.join(r, Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(raw, 0L) div ${s}L").as(out))
    }

    var scores = nodes.select(col("node"), lit(1000000L).as("hub"),
      lit(1000000L).as("auth"))
    for (_ <- 1 to iters) {
      val aRaw = e.join(
          scores.select(col("node").as("_h_src"), col("hub")), Seq("_h_src"))
        .groupBy(col("_h_dst").as("node")).agg(sum("hub").as("raw"))
      val auth = rescaled(aRaw, "auth")
      val hRaw = e.join(
          auth.select(col("node").as("_h_dst"), col("auth")), Seq("_h_dst"))
        .groupBy(col("_h_src").as("node")).agg(sum("auth").as("raw"))
      val hub = rescaled(hRaw, "hub")
      scores = hub.join(auth, Seq("node")).localCheckpoint()
    }
    scores
  }

  /** Driver-local [[hitsInt]] — the same exact integer half-
    * iterations (auth from hub, hub from the NEW auth, integral
    * max-renormalization `div max(1, max(raw) div 10⁶)`) on the
    * collected deduped edge list. */
  private def hitsLocal(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Any, Any)], nodeType: org.apache.spark.sql.types.DataType,
      iters: Int): DataFrame = {
    val nodes: Set[Any] =
      es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    var hub: Map[Any, Long] = nodes.iterator.map(_ -> 1000000L).toMap
    var auth: Map[Any, Long] = hub
    def rescale(raw: scala.collection.Map[Any, Long]): Map[Any, Long] = {
      val m = if (raw.isEmpty) 0L else raw.valuesIterator.max
      val s = math.max(1L, m / 1000000L)
      nodes.iterator.map(nd => nd -> raw.getOrElse(nd, 0L) / s).toMap
    }
    for (_ <- 1 to iters) {
      val aRaw = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (src, dst) =>
        aRaw(dst) = aRaw.getOrElse(dst, 0L) + hub(src)
      }
      auth = rescale(aRaw)
      val hRaw = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (src, dst) =>
        hRaw(src) = hRaw.getOrElse(src, 0L) + auth(dst)
      }
      hub = rescale(hRaw)
    }
    localResult(spark,
      nodes.toSeq.map(nd =>
        org.apache.spark.sql.Row(nd, hub(nd), auth(nd))),
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("hub",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("auth",
        org.apache.spark.sql.types.LongType))
  }

  /** Crawl snapshot diff: classify every URL across two crawl
    * snapshots as added / removed / changed / unchanged by content
    * hash — the delta that drives an INCREMENTAL recrawl (only
    * `changed`+`added` re-enter the processing pipeline; `removed`
    * feeds takedown propagation, e.g.
    * [[Dedup.removeFromSignatureStore]]).
    *
    * One full-outer shuffle join on the URL — both sides carry only
    * (url, hash), so wire volume is two key columns regardless of
    * page sizes; at 100 TB the pages themselves never move, and the
    * verdict joins back to whichever side needs it by url. Callers
    * diffing against the same base snapshot nightly should persist
    * the old side bucketed by url (the signature-store pattern) to
    * delete even this exchange. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      urlCol: String, hashCol: String): DataFrame = {
    val o = oldSnap.select(col(urlCol).as("url"), col(hashCol).as("old_hash"))
    val n = newSnap.select(col(urlCol).as("url"), col(hashCol).as("new_hash"))
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Crawl-trap signals: the map-only URL-shape heuristics every
    * production crawler applies before admitting a URL to the
    * frontier — calendar pages, session-id mazes, and symlink loops
    * produce unbounded URL spaces whose shape is visible in the URL
    * alone: deep paths, repeated path segments, and query-parameter
    * blowup. Output per URL: `depth` (non-empty path segments),
    * `dup_segments` (segments minus distinct segments — a `/a/b/a/b`
    * loop scores 2), `n_params` (query parameters), and the
    * composite `is_trap` verdict. Purely columnar — no shuffle, no
    * state; at 100 TB this runs inside the frontier scan. */
  def urlTrapSignals(urls: DataFrame, urlCol: String,
      maxDepth: Int = 8, maxDupSegments: Int = 2,
      maxParams: Int = 8): DataFrame = {
    val path = regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val segs = filter(split(path, "/"), s => s =!= "")
    val query = regexp_extract(col(urlCol), "\\?([^#]*)", 1)
    urls.withColumn("depth", size(segs))
      .withColumn("dup_segments", size(segs) - size(array_distinct(segs)))
      .withColumn("n_params",
        when(query === "", 0).otherwise(size(split(query, "&"))))
      .withColumn("is_trap",
        col("depth") > maxDepth || col("dup_segments") > maxDupSegments ||
          col("n_params") > maxParams)
  }

  /** Adaptive revisit scheduling — the capped-exponential change-
    * frequency policy (Cho & Garcia-Molina's revisit model is the
    * classic statement) every production crawler runs a variant of:
    * walk each URL's fetch history in time order; a fetch whose
    * content fingerprint differs from the previous one resets the
    * unchanged streak, an identical one extends it. The next revisit
    * interval is `baseMs · 2^min(streak, maxDoublings)` — hot pages
    * re-fetch at base cadence, static ones decay toward the cap —
    * and `next_fetch_ms = last_ts + interval`.
    *
    * Scale shape: ONE shuffle (the groupBy); per-URL histories are
    * protocol-bounded (politeness caps fetch frequency), so the
    * sorted-array fold is per-row bounded state — no window, no
    * per-URL rank. Ties on ts order by fingerprint, making the fold
    * total-ordered and engine-portable. Null fingerprints are
    * refused by filter (a failed fetch belongs in the fetch-error
    * ledger, not the change model).
    *
    * Output: url, n_fetches, n_changes, unchanged_streak,
    * interval_ms, next_fetch_ms. */
  def recrawlSchedule(df: DataFrame, urlCol: String, tsMsCol: String,
      fpCol: String, baseMs: Long = 3600000L,
      maxDoublings: Int = 6): DataFrame = {
    require(baseMs > 0, s"baseMs $baseMs")
    require(maxDoublings >= 0 && maxDoublings <= 16,
      s"maxDoublings $maxDoublings (interval multiplier is 2^k)")
    val stT = "struct<n:bigint,changes:bigint,streak:bigint," +
      "last_ts:bigint,prev:string>"
    val folded = df
      .filter(col(fpCol).isNotNull && col(tsMsCol).isNotNull)
      .groupBy(col(urlCol).as("url"))
      .agg(sort_array(collect_list(struct(
        col(tsMsCol).cast(LongType).as("ts"),
        col(fpCol).cast(StringType).as("fp")))).as("_h"))
      .select(col("url"), aggregate(col("_h"),
        expr(s"CAST(struct(0L, 0L, 0L, 0L, NULL) AS $stT)"),
        (s, e) => struct(
          (s.getField("n") + 1L).as("n"),
          (s.getField("changes") + when(s.getField("n") > 0 &&
            e.getField("fp") =!= s.getField("prev"), 1L).otherwise(0L))
            .as("changes"),
          when(s.getField("n") === 0, 0L)
            .when(e.getField("fp") =!= s.getField("prev"), 0L)
            .otherwise(s.getField("streak") + 1L).as("streak"),
          e.getField("ts").as("last_ts"),
          e.getField("fp").as("prev"))).as("_s"))
    val streak = col("_s.streak")
    val capped = least(streak, lit(maxDoublings.toLong))
    val mult = (1 to maxDoublings).foldLeft(
      when(capped === 0L, lit(1L))) { (acc, k) =>
      acc.when(capped === k.toLong, lit(1L << k))
    }.otherwise(lit(1L << maxDoublings))
    folded.select(col("url"),
      col("_s.n").cast("int").as("n_fetches"),
      col("_s.changes").as("n_changes"),
      streak.as("unchanged_streak"),
      (lit(baseMs) * mult).as("interval_ms"),
      (col("_s.last_ts") + lit(baseMs) * mult).as("next_fetch_ms"))
  }

  /** Per-node triangle counts over an UNDIRECTED graph — the classic
    * link-spam / community-density signal (a page whose neighborhood
    * is a clique is a link farm; a bridge page sits in none). Input
    * edges may be directed, duplicated, or self-looped: they are
    * canonicalized (min,max), self-loops dropped, multi-edges
    * collapsed first.
    *
    * Algorithm: degree-ordered edge orientation (Cohen's MapReduce
    * triangle enumeration; also Suri & Vassilvitskii WWW'11, public
    * literature): every edge is directed from its lower-(degree, id)
    * endpoint to the higher one, so each triangle {x<y<z} (in that
    * total order) is found EXACTLY once — as the wedge y←x→z closed
    * by the oriented edge y→z. Orientation is the whole scale story:
    * out-degrees in the oriented graph are O(√m), so the wedge
    * self-join fans out at most deg⁺² per node instead of deg² — a
    * celebrity node with 10⁶ undirected neighbors but √m oriented
    * out-neighbors no longer owns a quadratic task.
    *
    * Scale shape: 3 hash aggregates (distinct, degrees, counts) + 3
    * hash joins (attach degrees, wedge join on the center, closing-
    * edge join) — all key-partitioned, no windows, no driver state.
    * The wedge join's skew is BOUNDED by the orientation invariant
    * above; the closing join keys on the (x, y) pair, which is
    * near-unique.
    *
    * Output: (node, tri) for every node with ≥1 edge, tri = number
    * of triangles the node participates in (0 for none). Exact
    * integer counts — hash-matches any engine. */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    // und feeds deg twice and the orientation once, and oriented
    // feeds the wedge join twice and the closing join once — without
    // a lineage cut each reuse RE-EXPANDS the whole upstream subtree
    // (the first PlanAudit of this operator showed 68 scans and 25
    // exchanges for a 3-join algorithm); localCheckpoint is the
    // connectedComponents/labelPropagation discipline: materialize
    // the O(m) edge list once, reuse it as a leaf
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
    // orient low-(d, id) → high-(d, id); carry the head's (d, id) so
    // the wedge join can order its two heads without re-joining deg
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val wedges = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
      .join(oriented.select(col("u"), col("v").as("y"), col("dv").as("dy")),
        Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    val cnt = tri
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.select("node").join(cnt, Seq("node"), "left")
      .select(col("node"), coalesce(col("tri"), lit(0L)).as("tri"))
  }

  /** Anchor-text aggregation per link target — the search-corpus
    * signal the web graph gives away for free: what OTHER pages call
    * a URL is often a better description than the page's own title
    * (the classic anchor-text ranking feature), and a target whose
    * anchors are all one spammy phrase is a link-farm tell. Extracts
    * `<a href="http(s)://…">text</a>` pairs (double-quoted absolute
    * targets with element-local text — the well-formed subset;
    * relative-link resolution is [[extractLinks]]' job and nested
    * markup inside an anchor is out of this regex tier's contract),
    * normalizes whitespace in the text, and aggregates per target.
    *
    * Scale shape: extraction is MAP-ONLY (two `regexp_extract_all`
    * scans zipped positionally — href and text come from the SAME
    * pattern, so the lists always align); then one (url, anchor)
    * count aggregate and one per-url fold — both hash aggregates
    * with map-side partials; the dominant anchor is a `min_by` on
    * (count desc, text), never a rank window (a popular URL may
    * collect 10⁹ anchor rows; per-(url, anchor) state stays a
    * counter).
    *
    * Output: (url, n_refs, n_anchors, top_anchor) — total mentions,
    * distinct normalized texts, and the most frequent text
    * (ties → lexicographically smallest). */
  def anchorTexts(df: DataFrame, htmlCol: String): DataFrame = {
    val pat = "<a href=\"(https?://[^\"]+)\">([^<]*)</a>"
    val pairs = df.select(
        arrays_zip(
          regexp_extract_all(col(htmlCol), lit(pat), lit(1)).as("u"),
          regexp_extract_all(col(htmlCol), lit(pat), lit(2)).as("t"))
          .as("_p"))
      .select(explode(col("_p")).as("_a"))
      .select(col("_a").getField("u").as("url"),
        trim(regexp_replace(col("_a").getField("t"), "\\s+", " "))
          .as("anchor"))
    pairs.groupBy("url", "anchor").agg(count(lit(1)).as("c"))
      .groupBy("url")
      .agg(sum(col("c")).as("n_refs"),
        count(lit(1)).as("n_anchors"),
        min_by(col("anchor"), struct((-col("c")).as("nc"),
          col("anchor").as("a"))).as("top_anchor"))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983): remove
    * every node of degree < k from the undirected simple graph,
    * recompute degrees, repeat to fixpoint — survivors form the
    * k-core, the crawl graph's density tier (organic pages fall out
    * in early rounds; link farms and tight spam cliques survive
    * high k, which is why coreness is a standard link-spam feature
    * next to [[triangleCounts]]).
    *
    * `peel_round` is the round the node LEFT THE LIVE GRAPH: the
    * rounds' low-degree sets plus any node a peel isolated (degree
    * fell to 0 — it can never rejoin, so it leaves with the round
    * that orphaned it). Core members carry peel_round NULL /
    * in_core true. This node-set-difference rule is what the oracle
    * replays verbatim.
    *
    * Scale shape per round: one degree aggregate over the LIVE edge
    * list + one two-sided anti-join — O(live edges) shuffle, and the
    * live list shrinks monotonically, so per-round cost FALLS. The
    * live edges localCheckpoint every round (the connectedComponents
    * lineage discipline); each round's dropped-node set derives from
    * two checkpointed leaves, so the accumulated union never chains
    * lineage. Convergence needs one ≤1-row `isEmpty` action per
    * round; raises past `maxIter` instead of returning a
    * non-fixpoint (peel depth is graph-shaped: bounded for crawl
    * graphs, O(n) for a bare path — size maxIter to the graph).
    * Output: (node, peel_round, in_core). */
  def kCore(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", maxIter: Int = 30,
      localEdgeThreshold: Long = LocalGraphEdgeThreshold): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    def nodesOf(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node"))).distinct()
    val live0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    var live = live0.localCheckpoint()
    // r15 small-graph tier (see [[LocalGraphEdgeThreshold]]) — the
    // edge list is already canonicalized (a < b, simple), so the
    // driver loop needs no ordering of its own
    edgesIfSmall(live, live0, localEdgeThreshold).foreach { es =>
      return kCoreLocal(live.sparkSession, es,
        live.schema("a").dataType, k, maxIter)
    }
    val allNodes = nodesOf(live).localCheckpoint()
    var nodesBefore = allNodes
    var drops = List.empty[DataFrame]
    var round = 0
    var done = false
    while (!done) {
      val low = live.select(col("a").as("node"))
        .unionByName(live.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).select("node").localCheckpoint()
      if (low.isEmpty) done = true
      else {
        if (round >= maxIter) throw new IllegalStateException(
          s"kCore did not reach a fixpoint in $maxIter rounds — " +
            "raise maxIter (peel depth is graph-shaped; a long path " +
            "peels one layer per round)")
        live = live
          .join(low.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(low.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .localCheckpoint()
        val nodesAfter = nodesOf(live).localCheckpoint()
        drops = nodesBefore.join(nodesAfter, Seq("node"), "left_anti")
          .select(col("node"), lit(round).as("peel_round")) :: drops
        nodesBefore = nodesAfter
        round += 1
      }
    }
    val dropped =
      if (drops.isEmpty)
        allNodes.select(col("node"),
          lit(null).cast("int").as("peel_round")).limit(0)
      else drops.reduce(_ unionByName _)
    allNodes.join(dropped, Seq("node"), "left")
      .select(col("node"), col("peel_round"),
        col("peel_round").isNull.as("in_core"))
  }

  /** Driver-local [[kCore]] — the same peeling rounds on the
    * collected canonical edge list: per round drop degree-&lt;k
    * nodes, a node leaves with the round that removed it from the
    * live node set (including isolation), core members carry NULL
    * peel_round. Same maxIter fail-fast. */
  private def kCoreLocal(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Any, Any)], nodeType: org.apache.spark.sql.types.DataType,
      k: Int, maxIter: Int): DataFrame = {
    val allNodes: Set[Any] =
      es.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    val peel = scala.collection.mutable.HashMap.empty[Any, Int]
    var live = es
    var nodesBefore = allNodes
    var round = 0
    var done = false
    while (!done) {
      val deg = scala.collection.mutable.HashMap.empty[Any, Long]
      live.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      val low = deg.iterator.filter(_._2 < k).map(_._1).toSet
      if (low.isEmpty) done = true
      else {
        if (round >= maxIter) throw new IllegalStateException(
          s"kCore did not reach a fixpoint in $maxIter rounds — " +
            "raise maxIter (peel depth is graph-shaped; a long path " +
            "peels one layer per round)")
        live = live.filter { case (a, b) => !low(a) && !low(b) }
        val nodesAfter: Set[Any] =
          live.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
        (nodesBefore -- nodesAfter).foreach(nd => peel(nd) = round)
        nodesBefore = nodesAfter
        round += 1
      }
    }
    localResult(spark,
      allNodes.toSeq.map { nd =>
        val pr: Any = peel.get(nd).map(Int.box).orNull
        org.apache.spark.sql.Row(nd, pr, !peel.contains(nd))
      },
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("peel_round",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("in_core",
        org.apache.spark.sql.types.BooleanType))
  }
}
