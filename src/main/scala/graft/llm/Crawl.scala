package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-pipeline operators ([EXT]): the steps between "fetched page"
  * and "candidate corpus document" — robots-exclusion filtering and
  * outlink extraction for the crawl frontier. Pure relational string
  * logic in both engines (no network, no parser dependency).
  */
object Crawl {

  /** Robots-exclusion filtering (RFC 9309 longest-match core, over a
    * pre-parsed rule table): for each URL, the matching rule with the
    * LONGEST path prefix decides; on a length tie the ALLOW rule wins
    * (the RFC's least-restrictive tiebreak); a URL with no matching
    * rule is allowed. `rules` columns: (host, allow: boolean, prefix).
    * Literal prefixes only — the `*`/`$` wildcard forms of RFC 9309
    * §2.2.3 are out of scope here; a registry materializer would
    * expand them to literal alternatives first.
    *
    * Scale shape: the rule registry joins on the host equi-key —
    * broadcast by default (robots rules are tiny next to a crawl), or
    * a shuffle equi-join with `broadcastRules = false` when the
    * registry itself is corpus-sized; the per-URL winner is a single
    * bounded `max(struct(prefix_len, allow, prefix))` aggregate (state
    * = one struct per URL), never a rank window — a popular host's
    * URLs never serialize through one task.
    *
    * Same-length same-type duplicate prefixes are impossible
    * (identical rules); same-length same-type DIFFERENT prefixes
    * break the tie on the lexicographically larger prefix —
    * deterministic, mirrored in the oracle. */
  def robotsFilter(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame,
      broadcastRules: Boolean = true): DataFrame = {
    val r0 = rules.select(col("host").as("_rhost"),
      col("allow").as("_rallow"), col("prefix").as("_rprefix"))
    val r = if (broadcastRules) broadcast(r0) else r0
    urls.join(r, urls(hostCol) === col("_rhost") &&
        col(pathCol).startsWith(col("_rprefix")), "left")
      .groupBy(col(idCol), col(hostCol), col(pathCol))
      .agg(max(when(col("_rprefix").isNotNull,
        struct(length(col("_rprefix")).as("l"),
          col("_rallow").cast("int").as("a"),
          col("_rprefix").as("p")))).as("_best"))
      .select(col(idCol), col(hostCol), col(pathCol),
        coalesce(col("_best.a") === 1, lit(true)).as("allowed"),
        col("_best.p").as("matched_prefix"))
  }

  /** Outlink extraction for the crawl frontier: every double-quoted
    * `href` attribute value, resolved to an absolute URL — absolute
    * http(s) links pass through, root-relative paths (`/...`) resolve
    * against `https://<host>`, and everything else (fragments,
    * `mailto:`, `javascript:`, protocol-relative, dir-relative) is
    * dropped — the frontier wants fetchable absolute URLs, and
    * dir-relative resolution needs the page's full path, which a
    * corpus row often lacks. Map-only: regexp scan → in-array
    * transform/filter → posexplode; no shuffle.
    *
    * Output: (idCol, link_idx, url) — link_idx is the 0-based position
    * among the KEPT links, so downstream joins have a stable per-page
    * ordinal. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String,
      hostCol: String): DataFrame = {
    val raw =
      regexp_extract_all(col(htmlCol), lit("href=\"([^\"]*)\""), lit(1))
    val resolved = filter(
      transform(raw, l =>
        when(l.startsWith("http://") || l.startsWith("https://"), l)
          .when(l.startsWith("//"), lit(null)) // protocol-relative: ambiguous
          .when(l.startsWith("/"),
            concat(lit("https://"), col(hostCol), l))
          .otherwise(lit(null))),
      l => l.isNotNull)
    df.select(col(idCol),
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
    * DROPPED (not redistributed) — the deterministic choice; dangling
    * nodes still receive the base term and in-contributions.
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
  def pageRankInt(edges: DataFrame, iters: Int, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
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
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).localCheckpoint()
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")),
      Seq("src")).repartition(col("src")).localCheckpoint()
    val base = 1000000L * (dampDen - dampNum) / dampDen
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) +
          expr(s"($dampNum * coalesce(cs, CAST(0 AS BIGINT))) div $dampDen"))
          .cast("long").as("rank"))
    }
    ranks
  }
}
