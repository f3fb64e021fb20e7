package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.llm.{Dedup, Search, Similarity, Sketches, TrainingOps, TextAnalysis => TA}

/** q58–q65: round-3 additions.
  *
  * Training-data pipeline ([EXT]): Gopher-style repetition filters
  * (q58), C4-style cross-document duplicate-shingle audit (q59),
  * portable KMV distinct sketch (q60), PII scrubbing (q63),
  * normalization-exact keep-best dedup (q64).
  *
  * Relational capability (SURVEY.md §2.7): pivot (q61), semi/anti join
  * (q62), nearest-rank percentiles (q65).
  *
  * Every query is DuckDB-oracle-backed and ends in a total ORDER BY.
  */
object R3Queries {
  private val T = Tables

  /** Order counts by priority × status, wide form — shared by q61
    * (pivot) and q71 (unpivot) so the value list and column renames
    * cannot desynchronize between the pair. */
  private def orderStatusWide(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_filled"),
        coalesce(col("P"), lit(0L)).as("n_pending"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] Gopher repetition rules, map-only: the most-frequent-token
    // fraction comes from a sorted-array run fold, not an explode —
    // zero shuffles (the relational shape would shuffle every token
    // occurrence in the corpus).
    "q58_repetition_stats" -> ((s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), TA.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
          col("r.distinct_ratio").as("distinct_ratio"),
          col("r.top_token_frac").as("top_token_frac"))
        .orderBy("doc_id")),

    // [EXT] cross-doc duplicate-shingle audit: inverted index COUNTED
    // (Σ df, linear), never self-joined (no Σ df² pair blow-up) — the
    // audit that sizes jaccardPairs' df-cap at scale.
    "q59_dup_shingles" -> ((s, d) =>
      // r15: fan-out A/B'd and rejected (1.44× — the counted inverted
      // index shuffles dominate, not the shingle map)
      Dedup.dupShingleStats(T.documents(s, d), "doc_id", "text", shingleN = 3)
        .orderBy("doc_id")),

    // [EXT] KMV distinct sketch vs exact, per event type. Portable by
    // construction (SHA-256-derived hashes), unlike HLL.
    "q60_kmv_distinct" -> ((s, d) =>
      // r15: fan-out A/B'd and rejected (1.73× — sketch partials are
      // too cheap per row to amortize 32 tasks' fixed costs)
      Sketches.kmvDistinct(T.events(s, d), Seq("event_type"), "user_id", k = 64)
        .select("event_type", "exact_distinct", "n_kept", "kmv_est")
        .orderBy("event_type")),

    // §2.7 pivot: order counts by priority × status, explicit value
    // list (no extra distinct-values pass over the data).
    "q61_pivot" -> ((s, d) =>
      orderStatusWide(s, d).orderBy("o_orderpriority")),

    // §2.7 semi/anti join: customers with vs without orders per
    // segment. Both probes share one build side; the counts-only
    // aggregates are tiny, their full-outer stitch is trivial.
    "q62_semi_anti" -> ((s, d) => {
      val c = T.customer(s, d)
      val okeys = T.orders(s, d).select(col("o_custkey"))
      val withO = c.join(okeys, c("c_custkey") === okeys("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
      val withoutO = c.join(okeys, c("c_custkey") === okeys("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
      withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
        .orderBy("c_mktsegment")
    }),

    // [EXT] PII scrubbing over a synthesized doc (testdata carries no
    // real PII): email + card-number patterns → typed tags. RE2-safe
    // patterns, all-occurrence replace, map-only.
    "q63_pii_scrub" -> ((s, d) =>
      T.part(s, d)
        .select(col("p_partkey"),
          concat(col("p_name"), lit(" contact "),
            regexp_replace(lower(col("p_brand")), "#", ""),
            lit("@example.com card 4111-1111-1111-"),
            lpad(pmod(col("p_partkey"), lit(10000)).cast(StringType), 4, "0"))
            .as("raw"))
        .select(col("p_partkey"), TA.scrubPii(col("raw")).as("scrubbed"))
        .orderBy("p_partkey")),

    // [EXT] normalization-exact dedup keeping the highest-quality
    // representative (quality = n_chars here): the cheap exact pass a
    // pipeline runs before MinHash/SimHash near-dup.
    "q64_norm_dedup" -> ((s, d) =>
      Dedup.normalizedKeepBest(T.documents(s, d), "doc_id", "text",
          col("n_chars"))
        .select(col("doc_id"), col("content_hash"), col("n_dupes"))
        .orderBy("doc_id")),

    // §2.7 percentiles, nearest-rank formulation: value at rank
    // ceil(p·n) — picks an ELEMENT, no interpolation arithmetic, so the
    // result is bit-identical across engines (percentile_cont's
    // lower+(upper-lower)·f leaves IEEE rounding to the implementation).
    //
    // Computed from the per-group VALUE DISTRIBUTION, not a row-level
    // window: a row-number window partitioned by 3 flags would sort all
    // rows in 3 tasks (parallelism = group count — a scale-killer). Here
    // the only row-level pass is a map-side-combined groupBy(flag, v);
    // the windows run over ≤|distinct v| rows per group. The rank-r
    // value is the smallest v whose cumulative count ≥ r. For
    // high-cardinality value columns swap in approx_percentile.
    "q65_percentile_rank" -> ((s, d) => {
      val t = T.lineitem(s, d).select(col("l_returnflag").as("flag"),
        col("l_quantity").cast(DoubleType).as("v"))
      val dist = t.groupBy("flag", "v").agg(count(lit(1)).as("c"))
      val cum = Window.partitionBy("flag").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("flag")
      dist
        .withColumn("cum", sum(col("c")).over(cum))
        .withColumn("n", sum(col("c")).over(tot))
        .groupBy("flag")
        .agg(
          min(when(col("cum") >= ceil(lit(0.5) * col("n")).cast(LongType),
            col("v"))).as("p50_qty"),
          min(when(col("cum") >= ceil(lit(0.95) * col("n")).cast(LongType),
            col("v"))).as("p95_qty"))
        .orderBy("flag")
    }),

    // [EXT] keyword search: TF×(N/df) ranking in integer micropoints —
    // scores sum exactly, so the ranking is engine-portable (a float
    // sum would be aggregation-order-dependent). Corpus scan map-only:
    // tokens filter to query terms before any shuffle.
    "q66_keyword_search" -> ((s, d) =>
      Search.keywordSearch(T.documents(s, d), "doc_id", "text",
        terms = Seq("spark", "join", "window"), k = 20)),

    // [EXT] overlapping token-window chunking (RAG/context assembly) —
    // map-only; chunk text hashed so the check stays compact while
    // still value-exact.
    "q67_chunking" -> ((s, d) =>
      TrainingOps.chunkByTokens(T.documents(s, d), "doc_id", "text",
          window = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          sha2(col("chunk_text"), 256).as("chunk_hash"))
        .orderBy("doc_id", "chunk_id")),

    // [EXT] deterministic domain-mix sampling: salted-hash keep-rates
    // per source — auditable, stable under reruns (rand() is neither).
    "q68_domain_sample" -> ((s, d) =>
      TrainingOps.sampleByDomain(T.documents(s, d), "doc_id", "source",
          rates = Map("src0" -> 0.5, "src1" -> 0.0, "src2" -> 1.0))
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // §2.7 date arithmetic: calendar parts, day offsets, day diffs.
    // Convention note baked into the oracle: Spark dayofweek is
    // 1=Sunday..7, DuckDB date_part('dow') is 0=Sunday..6.
    "q81_date_arith" -> ((s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_add(col("o_orderdate"), 30).as("due"),
          datediff(lit("1995-01-01").cast(DateType), col("o_orderdate"))
            .as("days_to_95"))
        .orderBy("o_orderkey")),

    // §2.7 statistical aggregates, portably: mean/variance/stddev from
    // EXACT decimal sums (Σx, Σx²) folded to double in one fixed
    // expression. Spark's native stddev/var use Welford-style partition
    // merges whose float rounding depends on merge order — correct
    // statistically, but never hash-stable across engines or even
    // across partitionings.
    "q80_stats" -> ((s, d) => {
      val q = col("l_quantity").cast(DecimalType(18, 2))
      val sx = sum(q).cast(DecimalType(38, 2)).cast(DoubleType)
      val sxx = sum((q * q).cast(DecimalType(38, 4)))
        .cast(DecimalType(38, 4)).cast(DoubleType)
      val n = count(lit(1)).cast(DoubleType)
      T.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(sx.as("sx"), sxx.as("sxx"), n.as("n"))
        .select(col("flag"),
          (col("sx") / col("n")).as("mean_qty"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            .as("var_qty"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            .as("stddev_qty"))
        .orderBy("flag")
    }),

    // §2.7 histogram binning: explicit arithmetic bins (portable —
    // DuckDB 1.0 lacks width_bucket), map-side-combined count.
    "q76_histogram" -> ((s, d) =>
      T.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          least(floor((col("l_quantity").cast(DoubleType) - 1) / 10), lit(4))
            .cast(IntegerType).as("bin"))
        .groupBy("flag", "bin").agg(count(lit(1)).as("n"))
        .orderBy("flag", "bin")),

    // §2.7 lag/lead: per-user deltas between consecutive event values;
    // the window orders by (time, event_id) — a time-only order is
    // nondeterministic under same-timestamp events.
    "q77_lag_delta" -> ((s, d) => {
      val ev = T.events(s, d)
      val w = Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
      ev.select(col("event_id"), col("user_id"),
          Tables.tsMillis(ev, "ts").as("ms"),
          col("value").cast(DoubleType).as("v"))
        .withColumn("delta", col("v") - lag(col("v"), 1).over(w))
        .select("event_id", "delta")
        .orderBy("event_id")
    }),

    // §2.7 argmax per group, deterministically: rank by (balance desc,
    // key) — a bare max_by/arg_max leaves ties engine-defined.
    "q78_argmax" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("balance").desc, col("c_custkey"))
      T.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          col("c_acctbal").cast(DoubleType).as("balance"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("c_mktsegment")
    }),

    // §2.7 ordered string aggregation: distinct values joined in
    // numeric order — collect_set alone is partition-order-dependent,
    // sort_array makes it total.
    "q79_string_agg" -> ((s, d) =>
      T.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(array_join(sort_array(collect_set(col("c_nationkey"))), ",")
          .as("nations"))
        .orderBy("c_mktsegment")),

    // [EXT] ANN hyperplane-LSH, PORTABLE tier: planes are ±1 from
    // SHA-256 parity (the MinHash/SimHash SHA-tier trick), so DuckDB
    // rebuilds the identical buckets, candidate set, and ranking —
    // the oracle-checkable sibling of q35's seeded-RNG native tier.
    "q75_ann_lsh_sha" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.topKLshSha(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "vec_id", "embedding", k = 5, bands = 4, bitsPerBand = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine_r"))
        .orderBy("query_id", "rank")
    }),

    // [EXT] funnel analysis: users converting signup → purchase within
    // one hour, counted per signup day — via the n-step
    // relational.funnel operator (EXISTS-chain semantics, one id equi
    // join per step with the time window as a residual predicate;
    // per-user event counts bound the join fan-out, so no
    // range-bucketing machinery is needed — genuinely wide windows
    // route through relational.rangeJoin instead).
    "q74_funnel" -> ((s, d) => {
      val ev = T.events(s, d)
      val ms = Tables.tsMillis(ev, "ts")
      val base = ev.select(col("user_id"), col("event_type"), ms.as("ms"))
      graft.ops.relational.funnel(base, "user_id", "event_type", "ms",
          Seq("signup", "purchase"), Seq(3600000L))
        .select(
          date_format(timestamp_millis(col("start_ms")), "yyyy-MM-dd").as("day"),
          col("user_id"))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_converted"))
        .orderBy("day")
    }),

    // [EXT] edit-distance fuzzy matching: levenshtein between each
    // part's name and its key-successor's — a 1:1 shifted-key equi
    // join, linear (never the all-pairs fuzzy join, which needs the
    // q30-style blocking machinery instead).
    "q73_edit_distance" -> ((s, d) => {
      val a = T.part(s, d).select(col("p_partkey"), col("p_name"))
      val b = T.part(s, d).select(
        (col("p_partkey") - 1).as("p_partkey"), col("p_name").as("next_name"))
      a.join(b, Seq("p_partkey"))
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("next_name")).as("dist"))
        .orderBy("p_partkey")
    }),

    // §2.7 CUBE: all grouping-set combinations (q46 covers ROLLUP).
    // Subtotal NULLs → 'ALL' sentinels: Spark sorts NULLS FIRST,
    // DuckDB NULLS LAST, so raw grouping nulls can't hash-match.
    "q72_cube" -> ((s, d) =>
      T.orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"))
        .orderBy("priority", "status")),

    // §2.7 unpivot (wide → long): the inverse of q61's pivot, via the
    // native Dataset.unpivot (an Expand node — one pass, no join).
    "q71_unpivot" -> ((s, d) =>
      orderStatusWide(s, d).unpivot(
          Array(col("o_orderpriority")),
          Array(col("n_open"), col("n_filled"), col("n_pending")),
          "status", "cnt")
        .orderBy("o_orderpriority", "status")),

    // [EXT] time-series gap-fill: dense (type × hour) grid from the
    // observed span, 0-filled counts, forward-filled sums — the
    // resample step between raw events and charts/features. Grid =
    // distinct types × explode(sequence(lo, hi)): generated, never a
    // driver loop; the span is a broadcast 1-row agg. Leading nulls
    // (before a type's first observation) stay null by design.
    "q70_gap_fill" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(col("event_type"),
        (Tables.tsMillis(ev, "ts") / lit(3600000L)).cast(LongType).as("hour_id"),
        col("value"))
      val hourly = base.groupBy("event_type", "hour_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
            .cast(DoubleType).as("sv"))
      val span = base.agg(min(col("hour_id")).as("lo"), max(col("hour_id")).as("hi"))
      val grid = base.select("event_type").distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("hour_id"))
      val w = Window.partitionBy("event_type").orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "hour_id"), "left")
        .select(col("event_type"), col("hour_id"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("sv"), ignoreNulls = true).over(w).as("sv_ffill"))
        .orderBy("event_type", "hour_id")
    }),

    // [EXT] dedup clusters: near-dup pairs (same shape as q30) grouped
    // into transitive components via min-label propagation — the step
    // between candidate pairs and keep-one-per-cluster. Oracle is a
    // recursive-CTE closure over the same pair list.
    "q69_dedup_clusters" -> ((s, d) =>
      Dedup.connectedComponents(
          Dedup.jaccardPairs(T.documents(s, d), "doc_id", "text",
            blockCols = Seq("lang"), shingleN = 3, threshold = 0.03))
        .orderBy("doc_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "q58_repetition_stats" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(c) AS n, count(*) AS dd, max(c) AS m
        |        FROM cnt GROUP BY 1)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |       CAST(dd AS DOUBLE) / n AS distinct_ratio,
        |       CAST(m AS DOUBLE) / n AS top_token_frac
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q59_dup_shingles" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
        |    i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' ')))) AS g
        |  FROM documents),
        |d AS (SELECT g, count(*) AS df_g FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |       count(*) FILTER (WHERE d.df_g > 1) AS n_shared,
        |       CAST(count(*) FILTER (WHERE d.df_g > 1) AS DOUBLE)
        |         / count(*) AS shared_frac
        |FROM sh JOIN d USING (g)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,
    "q60_kmv_distinct" ->
      """WITH dist AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h,
        |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |      FROM dist),
        |a AS (SELECT event_type, count(*) AS exact_distinct,
        |        max(CASE WHEN rn <= 64 THEN h END) AS kth,
        |        count(*) FILTER (WHERE rn <= 64) AS n_kept
        |      FROM r GROUP BY 1)
        |SELECT event_type, exact_distinct, n_kept,
        |  CASE WHEN exact_distinct < 64 THEN CAST(exact_distinct AS DOUBLE)
        |       ELSE 63.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE) END
        |    AS kmv_est
        |FROM a ORDER BY event_type""".stripMargin,
    "q61_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q62_semi_anti" ->
      """SELECT c_mktsegment,
        |  count(*) FILTER (WHERE EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with,
        |  count(*) FILTER (WHERE NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without
        |FROM customer c GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q63_pii_scrub" ->
      """SELECT p_partkey,
        |  regexp_replace(regexp_replace(
        |    p_name || ' contact ' || replace(lower(p_brand), '#', '')
        |      || '@example.com card 4111-1111-1111-'
        |      || lpad(CAST(p_partkey % 10000 AS VARCHAR), 4, '0'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{4}(-[0-9]{4}){3}|[0-9]{16}', '<CARD>', 'g') AS scrubbed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q64_norm_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |      AS content_hash
        |  FROM documents),
        |r AS (SELECT doc_id, content_hash,
        |        row_number() OVER (PARTITION BY content_hash
        |                           ORDER BY n_chars DESC, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY content_hash) AS n_dupes
        |      FROM t)
        |SELECT doc_id, content_hash, n_dupes FROM r
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q66_keyword_search" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |      WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
        |d AS (SELECT doc_id, tf,
        |        count(*) OVER (PARTITION BY term) AS df_t FROM f),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id,
        |  CAST(sum(CAST(round(1e6 * tf * n_docs / df_t) AS BIGINT)) AS BIGINT)
        |    AS score,
        |  count(*) AS n_terms
        |FROM d, n GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q81_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(date_part('dow', o_orderdate) + 1 AS INT) AS dow,
        |  CAST(o_orderdate AS DATE) + 30 AS due,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |       DATE '1995-01-01') AS INT) AS days_to_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q80_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |      AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |          * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT flag, sx / n AS mean_qty,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty
        |FROM a ORDER BY flag""".stripMargin,
    "q76_histogram" ->
      """SELECT l_returnflag AS flag,
        |  CAST(least(floor((CAST(l_quantity AS DOUBLE) - 1) / 10), 4) AS INT)
        |    AS bin,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY flag, bin""".stripMargin,
    "q77_lag_delta" ->
      """SELECT event_id,
        |  CAST(value AS DOUBLE) - lag(CAST(value AS DOUBLE), 1) OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS delta
        |FROM events ORDER BY event_id""".stripMargin,
    "q78_argmax" ->
      """SELECT c_mktsegment, c_custkey, balance FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(c_acctbal AS DOUBLE) AS balance,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    "q79_string_agg" ->
      """SELECT c_mktsegment,
        |  string_agg(DISTINCT c_nationkey, ',' ORDER BY c_nationkey)
        |    AS nations
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q75_ann_lsh_sha" ->
      """WITH pl AS (
        |  SELECT b, j,
        |    list(CASE WHEN ('0x' || substr(sha256(b || ':' || j || ':' || (i-1)), 1, 2))::INT % 2 = 0
        |         THEN 1.0 ELSE -1.0 END ORDER BY i) AS h
        |  FROM (SELECT unnest(generate_series(0, 3)) AS b),
        |       (SELECT unnest(generate_series(0, 7)) AS j),
        |       (SELECT unnest(generate_series(1, 64)) AS i)
        |  GROUP BY b, j),
        |e AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings),
        |sig AS (
        |  SELECT e.vec_id, pl.b,
        |    CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, 64),
        |           k -> v[k] * h[k])) >= 0 THEN 1 << j ELSE 0 END) AS INT)
        |      AS bucket
        |  FROM e, pl GROUP BY e.vec_id, pl.b),
        |cand AS (
        |  SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
        |  FROM sig qs JOIN sig cs ON qs.b = cs.b AND qs.bucket = cs.bucket
        |  WHERE qs.vec_id < 8),
        |scored AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      k -> qe.v[k] * ce.v[k]))
        |      / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |           k -> qe.v[k] * qe.v[k])))
        |         * sqrt(list_sum(list_transform(generate_series(1, 64),
        |             k -> ce.v[k] * ce.v[k])))) AS cosine
        |  FROM cand c
        |  JOIN e qe ON qe.vec_id = c.query_id
        |  JOIN e ce ON ce.vec_id = c.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       round(cosine, 4) AS cosine_r
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q74_funnel" ->
      """WITH s AS (SELECT user_id, epoch_ms(ts) AS s_ms FROM events
        |           WHERE event_type = 'signup'),
        |p AS (SELECT user_id, epoch_ms(ts) AS p_ms FROM events
        |      WHERE event_type = 'purchase')
        |SELECT strftime(make_timestamp(s_ms * 1000), '%Y-%m-%d') AS day,
        |       count(DISTINCT s.user_id) AS n_converted
        |FROM s JOIN p ON s.user_id = p.user_id
        |WHERE p_ms > s_ms AND p_ms <= s_ms + 3600000
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q73_edit_distance" ->
      """SELECT a.p_partkey,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
        |ORDER BY a.p_partkey""".stripMargin,
    "q72_cube" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,
    "q71_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
        |    count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status, cnt FROM (
        |  SELECT o_orderpriority, 'n_open' AS status, n_open AS cnt FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'n_filled', n_filled FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'n_pending', n_pending FROM w)
        |ORDER BY o_orderpriority, status""".stripMargin,
    "q70_gap_fill" ->
      """WITH base AS (
        |  SELECT event_type, epoch_ms(ts) // 3600000 AS hour_id, value
        |  FROM events),
        |h AS (SELECT event_type, hour_id, count(*) AS n,
        |        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |          AS DOUBLE) AS sv
        |      FROM base GROUP BY 1, 2),
        |span AS (SELECT min(hour_id) AS lo, max(hour_id) AS hi FROM base),
        |grid AS (SELECT t.event_type, g.hour_id
        |         FROM (SELECT DISTINCT event_type FROM base) t
        |         CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS hour_id
        |                     FROM span) g)
        |SELECT grid.event_type, grid.hour_id,
        |  coalesce(h.n, 0) AS n,
        |  last_value(h.sv IGNORE NULLS) OVER (
        |    PARTITION BY grid.event_type ORDER BY grid.hour_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv_ffill
        |FROM grid LEFT JOIN h USING (event_type, hour_id)
        |ORDER BY event_type, hour_id""".stripMargin,
    "q69_dedup_clusters" ->
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
        |  SELECT e.dst, reach.lbl FROM reach JOIN e ON e.src = reach.id)
        |SELECT id AS doc_id, min(lbl) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q67_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |n AS (SELECT doc_id, w,
        |        greatest(CAST(ceil((len(w) - 8) / 24.0) AS INT), 1) AS nch
        |      FROM t),
        |c AS (SELECT doc_id,
        |        unnest(list_transform(generate_series(0, nch - 1),
        |          k -> CAST(k AS INT))) AS chunk_id,
        |        unnest(list_transform(generate_series(0, nch - 1),
        |          k -> array_to_string(w[k*24+1 : k*24+32], ' '))) AS chunk_text
        |      FROM n)
        |SELECT doc_id, chunk_id,
        |  CAST(len(regexp_split_to_array(trim(chunk_text), '\s+')) AS INT)
        |    AS n_tokens,
        |  sha256(chunk_text) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q68_domain_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE (('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':graft'), 1, 15))::BIGINT
        |       % 10000)
        |  < CAST(round((CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.0
        |          WHEN 'src2' THEN 1.0 ELSE 1.0 END) * 10000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "q65_percentile_rank" ->
      """WITH t AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS DOUBLE) AS v
        |  FROM lineitem),
        |r AS (SELECT flag, v,
        |        row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY flag) AS n
        |      FROM t)
        |SELECT flag,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END)
        |    AS p50_qty,
        |  max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END)
        |    AS p95_qty
        |FROM r GROUP BY flag ORDER BY flag""".stripMargin
  )
}
