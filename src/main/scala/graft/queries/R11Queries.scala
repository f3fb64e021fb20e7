package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables => T}

/** q184+: round-10 continuation wave — fixed-state sketches
  * (HyperLogLog cardinality, Count-Min frequency) and product-
  * quantization embedding compression with ADC search. Conventions as
  * everywhere: every query ends in a total ORDER BY, every aggregate/
  * computed column is aliased identically in the Spark plan and the
  * DuckDB oracle, floats ride as micro-unit BIGINTs. */
object R11Queries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // [EXT] HyperLogLog distinct-count sketch: per-language distinct
    // word cardinality over the documents corpus through the NATIVE
    // bounded-state tier (graft.expressions.HllSketchAgg — 64 bytes of
    // state per group at p=6, never growing with the distinct count;
    // the 100 TB cardinality answer). The DuckDB oracle replays the
    // registers relationally from the shared SHA-derived 60-bit hash
    // space, so the sketch — registers, harmonic denominator, and the
    // exact-integer-division estimate — is value-verified end-to-end,
    // not just rows-counted. SketchesSpec additionally parity-tests
    // this tier against the relational hllDistinct spec tier.
    "q184_hll_distinct" -> ((s, d) => {
      val words = T.documents(s, d).select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      graft.llm.Sketches.hllDistinctSketch(words, Seq("lang"), "word", p = 6)
        .orderBy("lang")
    }),

    // [EXT] Count-Min point-frequency estimation: per-user event
    // counts answered from ONE d×w counter matrix (d=4, w=64 — 2 KiB
    // of state however many users exist) instead of a corpus-wide
    // per-key groupBy. w is deliberately smaller than the user
    // cardinality so the one-sided error regime is exercised: the
    // oracle replays every counter from the shared salted SHA hash
    // space and the `overcount` column shows est ≥ exact row by row.
    // The probe set is chosen AFTER the scan — the property a top-k
    // sketch can't give.
    "q185_cms_freq" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id"))
      val probes = ev.filter(col("user_id") % 13 === 0).distinct()
      val est = graft.llm.Sketches.cmsFrequencies(
        ev, "user_id", probes, "user_id", d = 4, w = 64)
      val exact = ev.filter(col("user_id") % 13 === 0)
        .groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("user_id"))
        .select(col("user_id"), col("cms_est"), col("exact_cnt"),
          (col("cms_est") - col("exact_cnt")).as("overcount"))
        .orderBy("user_id")
    }),

    // [EXT] product-quantization encode: every embedding compressed to
    // 8 one-byte codes (32× smaller than 64 float32s) against a
    // deterministic hash-rank-sampled codebook — map-only, the
    // codebook rides as one broadcast array. The oracle rebuilds the
    // sample, the per-slot centroids, and every exact-double argmin,
    // so the compression is value-verified code by code (a Lloyd
    // codebook would be rows-only; see Similarity.pqCodebook).
    "q186_pq_encode" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      val cb = graft.llm.Similarity.pqCodebook(
        emb, "vec_id", "embedding", dim = 64, nsub = 8, ncent = 16,
        salt = "186")
      graft.llm.Similarity.pqEncode(emb, "vec_id", "embedding", cb,
          64, 8, 16)
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("slot", "code")))
        .orderBy("vec_id", "slot")
    }),

    // [EXT] ADC top-k search over the PQ codes: per query one integer
    // micro-unit lookup table (slot × centroid exact distances), then
    // the corpus scan is 8 table lookups per candidate instead of 64
    // float multiplies — the compressed-domain search that makes a
    // 100 TB embedding sweep IO-bound instead of FLOP-bound. Integer
    // LUT entries make the candidate sums order-free, so the oracle
    // replays the full ranking exactly.
    "q187_pq_adc_topk" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      val cb = graft.llm.Similarity.pqCodebook(
        emb, "vec_id", "embedding", dim = 64, nsub = 8, ncent = 16,
        salt = "186")
      graft.llm.Similarity.pqAdcTopK(emb.filter(col("vec_id") < 8), emb,
          "vec_id", "vec_id", "embedding", cb, 64, 8, 16, k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("adc_micro"))
        .orderBy("query_id", "rank")
    }),

    // [EXT] hard-negative mining for contrastive training: per
    // anchor, the 5 most-cosine-similar vectors with a DIFFERENT
    // label — close in embedding space but the wrong class. Map-only
    // over the corpus (anchors broadcast); the oracle replays the
    // full label-excluded ranking.
    "q188_hard_negatives" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      graft.llm.Similarity.hardNegatives(emb.filter(col("vec_id") < 8),
          emb, "vec_id", "vec_id", "embedding", "label", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("n_label"), round(col("cosine"), 4).as("cosine_r"))
        .orderBy("query_id", "rank")
    }),

    // [EXT] two-stage compressed-domain retrieval (the FAISS
    // IVF-PQ + refine pipeline shape): LSH band candidates → ADC
    // shortlist of 20 over the PQ codes → exact cosine re-rank of
    // only those 20. Each stage is deterministic, so the oracle
    // replays candidates, shortlist, and final ranks bit for bit —
    // the whole production retrieval path value-verified, not just
    // its pieces.
    "q189_two_stage" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      val cb = graft.llm.Similarity.pqCodebook(
        emb, "vec_id", "embedding", dim = 64, nsub = 8, ncent = 16,
        salt = "186")
      graft.llm.Similarity.twoStageRetrieve(emb.filter(col("vec_id") < 8),
          emb, "vec_id", "vec_id", "embedding", cb, 64, 8, 16,
          bands = 4, bitsPerBand = 8, m = 20, k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine_r"))
        .orderBy("query_id", "rank")
    }),

    // [EXT] length-bucketed batching ("sorted batching"): the batch
    // plan for fixed-shape training steps — docs ordered by token
    // count through the range-parallel globalRank (never an
    // unpartitioned window), cut into 32-doc batches, each padding to
    // ITS max. pad_tokens makes the waste auditable; the oracle
    // replays rank, batch cut, and per-batch max exactly.
    "q190_length_batching" -> ((s, d) =>
      graft.llm.TrainingOps.lengthBatching(
          T.documents(s, d), "doc_id", "text", batchSize = 32)
        .orderBy("batch_id", "doc_id")),

    // [EXT] interpolated Kneser-Ney bigram model, exact micro-units:
    // the CCNet-style corpus-quality LM's smoothing, as ONE rational
    // per pair evaluated with a single 128-bit integer floor division
    // — so even UNSEEN-pair probabilities (the point of smoothing, and
    // of KN's continuation counts) hash-match the oracle. Probes are
    // the top-8 unigram grid.
    "q191_kneser_ney" -> ((s, d) =>
      graft.llm.TextAnalysis.kneserNeyBigram(
          T.documents(s, d), "text", probeTopK = 8)
        .orderBy("u", "w")),

    // [EXT] windowed co-occurrence PMI (the word2vec/GloVe corpus
    // statistic): top collocations by the exact integer PMI ratio —
    // map-only shifted-zip pair construction (never a positions
    // self-join), bounded output via TakeOrdered. The ratio stays in
    // micro-units so the ranking is engine-exact; PMI = ln(ratio/1e6).
    "q192_pmi" -> ((s, d) =>
      graft.llm.TextAnalysis.pmiPairs(
          T.documents(s, d), "text", window = 2, minCount = 5, topK = 20)
        .orderBy(col("ratio_micro").desc, col("w"), col("c"))),

    // [EXT] the sketch-TABLE idiom: one persistable HLL register blob
    // per (lang, source) shard, max-merged back to per-lang summaries
    // — the precompute-at-ingest / merge-at-query pattern that answers
    // cardinality questions over 100 TB without re-scanning. The
    // oracle is q184's VERBATIM: merged shard sketches must equal the
    // direct per-lang sketch register for register, which is exactly
    // the associativity contract the idiom rests on.
    "q193_hll_shards" -> ((s, d) => {
      val words = T.documents(s, d).select(col("lang"), col("source"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      val shards = graft.llm.Sketches.hllShardSketch(
        words, Seq("lang", "source"), "word", p = 6)
      graft.llm.Sketches.hllMergeShards(shards, Seq("lang"),
          "hll_regs", p = 6)
        .orderBy("lang")
    }),

    // [EXT] contrastive training triplets: per anchor, the nearest
    // same-label positive and the nearest different-label hard
    // negative with the cosine margin — the artifact an embedding
    // trainer consumes. One scored pass + one max_by aggregate per
    // arm (never a rank window over the corpus); the oracle replays
    // both selections and the micro-exact margin.
    "q194_triplets" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      graft.llm.Similarity.contrastiveTriplets(
          emb.filter(col("vec_id") < 8), emb,
          "vec_id", "vec_id", "embedding", "label")
        .select(col("anchor_id"), col("pos_id"), col("neg_id"),
          round(col("pos_cosine"), 4).as("pos_cos_r"),
          round(col("neg_cosine"), 4).as("neg_cos_r"),
          col("margin_micro"))
        .orderBy("anchor_id")
    }),

    // [EXT] Bradley-Terry preference ranking: per-user consecutive
    // event pairs vote (higher `value` wins, ties to the later
    // event), the comparison stream reduces distributively to one
    // bounded pair table, and 3 exact-integer MM rounds fit the
    // strengths — the RLHF preference-fit artifact. The oracle
    // replays the smoothing, all three iterations, and the final
    // normalization as HUGEINT CTEs — every floor division
    // bit-identical.
    "q195_bradley_terry" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seq = T.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .withColumn("prev_value", lag("value", 1).over(w))
      val comp = seq
        .filter(col("prev_type").isNotNull &&
          col("event_type") =!= col("prev_type") &&
          col("value").isNotNull && col("prev_value").isNotNull)
        .select(
          when(col("value") >= col("prev_value"), col("event_type"))
            .otherwise(col("prev_type")).as("winner"),
          when(col("value") >= col("prev_value"), col("prev_type"))
            .otherwise(col("event_type")).as("loser"))
      graft.llm.Selection.bradleyTerry(comp, "winner", "loser", iters = 3)
        .orderBy(col("strength_micro").desc, col("item"))
    }),

    // [EXT] inter-annotator agreement: Cohen's kappa per language
    // between two deterministic "annotators" labeling document length
    // bands from different evidence (raw chars vs whitespace words) —
    // the label-quality gate for an annotated corpus. The correlated
    // proxies give substantial positive kappa; the exact integer
    // ratio means the chance correction is replayed bit-identically.
    "q196_annotator_kappa" -> ((s, d) => {
      val docs = T.documents(s, d)
        .withColumn("_a", when(col("n_chars") < 220, lit("short"))
          .when(col("n_chars") < 380, lit("mid")).otherwise(lit("long")))
        .withColumn("_wc", size(split(trim(col("text")), "\\s+")))
        .withColumn("_b", when(col("_wc") < 40, lit("short"))
          .when(col("_wc") < 68, lit("mid")).otherwise(lit("long")))
      graft.llm.Selection.interAnnotatorKappa(
          docs, Seq("lang"), "_a", "_b")
        .orderBy("lang")
    }),

    // [EXT] fuzzy record linkage: probe names derived by DELETING one
    // deterministic character from every 37th part name, then linked
    // back to the catalog through prefix/suffix blocking + a
    // Levenshtein cap + one min_by best-match aggregate — the
    // entity-resolution join for hand-typed keys. Levenshtein is
    // exact integer edit distance in both engines, so the oracle
    // replays blocking, cap, and tie-break verbatim.
    "q197_fuzzy_link" -> ((s, d) => {
      // r15: blocking explode + capped Levenshtein ran in the single
      // scan task — fan the catalog side out (guide §2.5)
      val parts = graft.ops.Par.fanOut(
        T.part(s, d).select(col("p_partkey"), col("p_name")),
        col("p_partkey"))
      val probes = parts.filter(col("p_partkey") % 37 === 0)
        .withColumn("_pos",
          expr("(p_partkey div 37) % length(p_name)").cast("int"))
        .select(col("p_partkey").as("probe_id"),
          expr("concat(substring(p_name, 1, _pos), " +
            "substring(p_name, _pos + 2, length(p_name)))").as("noisy"))
      graft.ops.relational.fuzzyLinkJoin(
          probes, parts, "probe_id", "noisy", "p_partkey", "p_name",
          maxDist = 2)
        .orderBy("left_id")
    }),

    // [EXT] Z-order (Morton) layout keys: events gridded on
    // (user_id, ts) and bit-interleaved — the Delta/Iceberg OPTIMIZE
    // ZORDER primitive. The per-bucket span report IS the pruning
    // story: consecutive key ranges bound BOTH dimensions (a linear
    // sort bounds one). Grid scaling is one exact integer floor
    // division per dim and the interleave is pure bit shuffling, so
    // the oracle replays every key bit-identically.
    "q198_zorder_layout" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(col("user_id"),
        T.tsMillis(ev, "ts").as("ts_ms"))
      graft.ops.Layout.zOrderKeys(base, Seq("user_id", "ts_ms"),
          bits = 16)
        .withColumn("bucket", shiftright(col("z_key"), 24))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          (max("user_id") - min("user_id")).as("user_span"),
          (max("ts_ms") - min("ts_ms")).as("ts_span"))
        .orderBy("bucket")
    }),

    // [EXT] profile drift: the schema-stability report a nightly
    // pipeline diffs before trusting a new generation — per-column
    // rows/nulls/exact-distinct for two snapshots (events split at
    // the timestamp midpoint) with the null-rate delta in exact
    // micro-units.
    "q199_profile_drift" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(T.tsMillis(ev, "ts").as("ts_ms"),
        col("user_id"), col("event_type"), col("value"))
      val agg = base.agg(min("ts_ms"), max("ts_ms")).head()
      val mid = (agg.getLong(0) + agg.getLong(1)) / 2
      graft.ops.etl.profileDrift(
          base.filter(col("ts_ms") < mid),
          base.filter(col("ts_ms") >= mid),
          Seq("user_id", "event_type", "value"))
        .orderBy("column")
    }),

    // [EXT] SCD Type-2 history: per-user event_type timeline as
    // half-open validity intervals — last-writer-wins within a
    // timestamp (event_id tie-break), consecutive no-op updates
    // collapse, latest row open-ended. The warehouse dimension shape.
    "q200_scd2_history" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(col("user_id"),
        T.tsMillis(ev, "ts").as("ts_ms"),
        col("event_type"), col("event_id"))
      graft.ops.etl.scd2History(base, "user_id", "ts_ms",
          Seq("event_type"), "event_id")
        .orderBy("user_id", "valid_from")
    }),

    // [EXT] snapshot diff: a deterministically-perturbed "new"
    // customer generation (drops, balance bumps, segment migrations,
    // key-shifted inserts) diffed against the old — added/removed/
    // changed rows only, with the changed columns named. One full
    // outer join; the unchanged mass never materializes.
    "q201_table_diff" -> ((s, d) => {
      val cust = T.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val newC = cust.filter(col("c_custkey") % 13 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 11 === 0, col("c_acctbal") + 100)
            .otherwise(col("c_acctbal")))
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 17 === 0, lit("MIGRATED"))
            .otherwise(col("c_mktsegment")))
      val added = cust.filter(col("c_custkey") % 19 === 0)
        .select((col("c_custkey") + 1000000000L).as("c_custkey"),
          col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      graft.ops.etl.tableDiff(cust, newC.unionByName(added),
          Seq("c_custkey"), Seq("c_name", "c_acctbal", "c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // [EXT] data-quality gate: declarative rules (violation
    // predicates) over lineitem evaluated in ONE aggregate pass,
    // plus key-uniqueness checks in the same report shape — the
    // dbt-test / expectations layer. NULL rule results count as
    // violations (unknown is not a pass).
    "q202_dq_checks" -> ((s, d) => {
      // r16: dqReport = the same qualityChecks ∪ uniqueCheck ∪
      // uniqueCheck report in ONE aggregate pass over lineitem
      // (row-for-row identical, spec-pinned; was three full scans).
      // The pass is fanned out under the Par gate (projected to the 7
      // referenced columns first): the countDistinct legs build a
      // near-unique-key hash table over every row, and on the
      // single-row-group bench scan that partial aggregate ran on one
      // core (A/B same-session: merged 1.18-1.29 s → fanned 0.94-0.99 s;
      // unfanned-unmerged chain 1.2-1.3 s).
      val li = graft.ops.Par.fanOut(
        T.lineitem(s, d).select(col("l_quantity"), col("l_discount"),
          col("l_tax"), col("l_extendedprice"), col("l_returnflag"),
          col("l_orderkey"), col("l_linenumber")),
        col("l_orderkey"), col("l_linenumber"))
      graft.ops.etl.dqReport(li, Seq(
          "quantity_max_40" -> (col("l_quantity") > 40),
          "discount_le_10pct" -> (col("l_discount") > 0.1),
          "tax_range" -> (col("l_tax") < 0 || col("l_tax") > 0.08),
          "price_positive" -> (col("l_extendedprice") <= 0),
          "returnflag_domain" ->
            !col("l_returnflag").isin("A", "N", "R")),
        Seq(Seq("l_orderkey", "l_linenumber") -> "unique_order_line",
          Seq("l_orderkey") -> "unique_orderkey_alone"))
        .orderBy("rule")
    }),

    // [EXT] referential-integrity gate: FK relations checked by one
    // left-anti join each in the same report shape — two real
    // relations (pass) and one against a deterministically pruned
    // parent (the orphan case a real pipeline catches).
    "q203_ri_checks" -> ((s, d) => {
      val li = T.lineitem(s, d)
      graft.ops.etl.referentialCheck(li, T.orders(s, d),
          Seq("l_orderkey"), Seq("o_orderkey"), "lineitem_orderkey_fk")
        .unionByName(graft.ops.etl.referentialCheck(li, T.part(s, d),
          Seq("l_partkey"), Seq("p_partkey"), "lineitem_partkey_fk"))
        .unionByName(graft.ops.etl.referentialCheck(T.orders(s, d),
          T.customer(s, d).filter(col("c_custkey") % 7 =!= 0),
          Seq("o_custkey"), Seq("c_custkey"), "orders_custkey_vs_pruned"))
        .orderBy("rule")
    }),

    // [EXT] last-touch attribution: every purchase attributed to the
    // user's latest preceding click — PURE COMPOSITION of the as-of
    // join (one shuffle, per-key window carry-forward); the oracle is
    // DuckDB's own ASOF LEFT JOIN, so the operator's semantics are
    // pinned against an independent engine's implementation of the
    // same join type. Clicks pre-deduped last-writer per (user, ms).
    "q204_attribution" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(col("user_id"),
        T.tsMillis(ev, "ts").as("ts_ms"),
        col("event_type"), col("event_id"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_ms"))
      val clicks = base.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_ms").as("c_ts"))
        .agg(max("event_id").as("click_id"))
        .withColumn("click_ts", col("c_ts"))
      graft.ops.relational.asofJoin(purchases, clicks, Seq("user_id"),
          "ts_ms", "c_ts")
        .select(col("purchase_id"), col("user_id"), col("ts_ms"),
          col("click_id"), col("click_ts"),
          (col("ts_ms") - col("click_ts")).as("latency_ms"))
        .orderBy("purchase_id")
    }),

    // [EXT] sketch algebra — HLL intersection: per-language vocab
    // overlap estimated ENTIRELY from the stored shard registers
    // (inclusion-exclusion over merged blobs; no rescan of the
    // corpus). Register merges and the exact-integer estimator make
    // every pairwise estimate engine-replayable.
    "q205_hll_intersect" -> ((s, d) => {
      val words = T.documents(s, d).select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      val shards = graft.llm.Sketches.hllShardSketch(
        words, Seq("lang"), "word", p = 6)
      val single = graft.llm.Sketches.hllMergeShards(
          shards, Seq("lang"), "hll_regs", p = 6)
        .select(col("lang"), col("hll_est_micro"))
      val prs = shards.select(col("lang").as("lang_a"), col("hll_regs"))
        .crossJoin(shards.select(col("lang").as("lang_b"),
          col("hll_regs").as("_rb")))
        .filter(col("lang_a") < col("lang_b"))
      val both = prs.select(col("lang_a"), col("lang_b"), col("hll_regs"))
        .unionByName(prs.select(col("lang_a"), col("lang_b"),
          col("_rb").as("hll_regs")))
      graft.llm.Sketches.hllMergeShards(both, Seq("lang_a", "lang_b"),
          "hll_regs", p = 6)
        .select(col("lang_a"), col("lang_b"),
          col("hll_est_micro").as("est_union_micro"))
        .join(single.select(col("lang").as("lang_a"),
          col("hll_est_micro").as("est_a")), Seq("lang_a"))
        .join(single.select(col("lang").as("lang_b"),
          col("hll_est_micro").as("est_b")), Seq("lang_b"))
        .select(col("lang_a"), col("lang_b"), col("est_a"), col("est_b"),
          col("est_union_micro"),
          (col("est_a") + col("est_b") - col("est_union_micro"))
            .as("est_intersect_micro"))
        .orderBy("lang_a", "lang_b")
    }),

    // [EXT] deterministic label propagation over the planted q109
    // graph (symmetrized): 3 synchronous rounds, most-frequent
    // neighbor label, ties to the smallest — community detection for
    // domain clustering, schedule-independent by construction. The
    // oracle unrolls the identical rounds.
    "q206_label_prop" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      val withN = docs.join(broadcast(n))
      val e = withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7, col("n")).as("dst"))
        .union(withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 1, col("n")).as("dst")))
      graft.llm.Crawl.labelPropagation(e, iters = 3).orderBy("node")
    }),

    // [EXT] personalized PageRank: teleport mass lands only on the
    // doc_id % 97 seed set — the topic-sensitive crawl prior. Exact
    // integer micro-units; the oracle unrolls all three iterations
    // with the identical per-node teleport base.
    "q207_personalized_pr" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      val withN = docs.join(broadcast(n))
      val e = withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 7, col("n")).as("dst"))
        .union(withN.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 13 + 1, col("n")).as("dst")))
      graft.llm.Crawl.personalizedPageRankInt(e,
          docs.filter(col("doc_id") % 97 === 0), iters = 3)
        .orderBy("node")
    }),

    // [EXT] chat-template rendering (SFT data assembly): per-user
    // event turns become one training transcript — roles mapped from
    // event types, turns sorted INSIDE the aggregate by (ts, id) so
    // the render is arrival-order-independent. Oracle replays the
    // template with an ordered string_agg.
    "q208_chat_render" -> ((s, d) => {
      val ev = T.events(s, d)
      val base = ev.select(col("user_id"),
        T.tsMillis(ev, "ts").as("ts_ms"), col("event_id"),
        when(col("event_type").isin("click", "view"), lit("user"))
          .when(col("event_type") === "error", lit("system"))
          .otherwise(lit("assistant")).as("role"),
        col("props").as("content"))
      graft.llm.TrainingOps.renderChatTemplate(base, "user_id",
          "ts_ms", "event_id", "role", "content")
        .orderBy("user_id")
    }),

    // [EXT] license-family tagging (the compliance/provenance gate):
    // marker phrases planted deterministically on the corpus (the
    // q110 planted-fixture pattern), tagged by first-match literal
    // contains — distribution + a witness doc per family.
    "q209_license_id" -> ((s, d) => {
      val planted = T.documents(s, d).withColumn("text2",
        concat(col("text"),
          when(col("doc_id") % 4 === 0,
            lit(" Licensed under the Apache License, Version 2.0"))
          .when(col("doc_id") % 4 === 1,
            lit(" Permission is hereby granted, free of charge, " +
              "to any person"))
          .when(col("doc_id") % 4 === 2,
            lit(" terms of the GNU General Public License"))
          .otherwise(lit(""))))
      planted
        .select(col("doc_id"),
          graft.llm.TextAnalysis.licenseFamily(col("text2"))
            .as("license"))
        .groupBy("license")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"))
        .orderBy("license")
    }),

    // [EXT] k·σ outlier gate with no floating σ: the verdict is the
    // exact integer cross-multiplication (n·x−S)²·kDen² >
    // kNum²·(nQ−S²) in micro units, so both engines agree on every
    // boundary row. Per event type: counts + the outlier value span.
    "q210_outlier_gate" -> ((s, d) => {
      val ev = T.events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
      graft.ops.etl.outlierGate(ev, Seq("event_type"), "value",
          kNum = 2, kDen = 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L))
            .as("n_outliers"),
          min(when(col("is_outlier"), col("x_micro")))
            .as("min_out_micro"),
          max(when(col("is_outlier"), col("x_micro")))
            .as("max_out_micro"))
        .orderBy("event_type")
    }),

    // [EXT] histogram-sketch quantiles: P50/P90/P99 value BRACKETS
    // per event type from a 64-bin fixed histogram — bounded state
    // per group however many rows, every pick an exact integer
    // comparison (cum·100 ≥ p·n). The bounded-state quantile answer
    // a 100 TB column cannot get from a per-group sort.
    "q211_hist_quantiles" -> ((s, d) =>
      graft.llm.Sketches.histogramQuantiles(
          T.events(s, d).select(col("event_type"), col("value")),
          Seq("event_type"), "value", buckets = 64,
          ps = Seq(50, 90, 99))
        .orderBy("event_type", "p")),

    // [EXT] BYTE-level BPE training (the GPT-family lineage, closing
    // the tokenizer matrix next to char-BPE q121, unigram q174,
    // WordPiece q177): words become UTF-8 byte sequences as two-hex
    // symbols, so the base alphabet is the 256 bytes, NOTHING is
    // dropped, and no UNK can exist by construction. Same incremental
    // trainer as q121; the oracle replays every byte-merge selection
    // round (hex(encode(w)) seeding, then the q121 CTE chain).
    "q212_byte_bpe_train" -> ((s, d) =>
      graft.llm.TrainingOps.trainBpeBytes(
        T.documents(s, d).select(col("text")), "text", numMerges = 6)
      .orderBy("merge_idx")),

    // [EXT] BYTE-level BPE serving: train 6 byte merges, re-encode
    // every document map-only through the native expression in byte
    // mode. Every token of every document encodes (no filter — the
    // q122 separator drop does not exist at byte level); the oracle
    // carries words through the same 6 rounds and joins tokens to
    // their final segmentations.
    "q213_byte_bpe_encode" -> ((s, d) => {
      // r15: the encode is the most expensive per-row map in the bench
      // (profile: 11 s in ONE task — the single-row-group scan feeds one
      // core); fan the SERVING pass out (guide §2.5, Par.fanOut; the
      // training input stays unfanned per the q122/q178 split verdict)
      val docs0 = T.documents(s, d).select(col("doc_id"), col("text"))
      val docs = graft.ops.Par.fanOut(docs0, col("doc_id"))
      val merges = graft.llm.TrainingOps.trainBpeBytes(
        docs0.select(col("text")), "text", numMerges = 6)
        .orderBy("merge_idx").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      docs.select(col("doc_id"),
          graft.llm.TrainingOps.byteBpeEncode(col("text"), merges)
            .as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_bpe_tokens"),
          concat_ws(" ", col("toks")).as("bpe_text"))
        .orderBy("doc_id")
    }),

    // [EXT] IVF-ADC composed ANN search (FAISS IVFADC) as ONE
    // bounded-state aggregate over a single corpus pass
    // (PqAdcCellTopKAgg): coarse cells prune the candidate rows
    // (each row's codes score only against the queries probing its
    // cell), PQ codes prune the per-candidate arithmetic (nsub
    // native LUT lookups), state is nq·k heap pairs — no rank
    // window, no cell-key candidate join. Both quantizers here are
    // the hash-rank-sampled oracle tiers, so DuckDB replays every
    // cell assignment, code, LUT entry and rank; `production = true`
    // swaps BOTH arms to Lloyd (farthest-seeded coarse cells +
    // pqCodebookLloyd) plus the native graft_cell_assign corpus
    // kernel — rows-only checkable, spec-pinned (SimilaritySpec
    // production tier, PlanQualitySpec both arms) and
    // recall-measured (PqRecallProbe ivfadc rows, SCALE.md).
    "q214_ivf_adc_topk" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      graft.llm.Similarity.topKIvfAdc(
          emb.filter(col("vec_id") < 8), emb, "vec_id", "vec_id",
          "embedding", dim = 64, nsub = 8, ncent = 16, nlist = 8,
          nprobe = 3, k = 5, salt = "214")
        .orderBy("query_id", "rank")
    }))

  /** Shared PQ oracle prelude: hash-rank sample → per-slot codebook →
    * exact-double squared-L2 of EVERY (vector, slot, centroid) →
    * argmin codes. `dist` doubles as q187's per-query lookup table. */
  private val pqCte =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |    AS v
      |  FROM embeddings),
      |r AS (SELECT vec_id, v,
      |        ('0x' || substr(sha256('pq:186:' ||
      |          CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS rk
      |      FROM e),
      |samp AS (SELECT v, row_number() OVER (ORDER BY rk, vec_id) - 1
      |           AS code
      |         FROM r ORDER BY rk, vec_id LIMIT 16),
      |cb AS (SELECT ss.s AS slot, code,
      |         list_transform(generate_series(1, 8),
      |           j -> v[ss.s * 8 + j]) AS cvec
      |       FROM samp, (SELECT unnest(generate_series(0, 7)) AS s) ss),
      |dist AS (
      |  SELECT e.vec_id, cb.slot, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      j -> (e.v[cb.slot * 8 + j] - cb.cvec[j])
      |         * (e.v[cb.slot * 8 + j] - cb.cvec[j]))) AS dd
      |  FROM e, cb),
      |codes AS (
      |  SELECT vec_id, slot, code FROM (
      |    SELECT vec_id, slot, code, row_number() OVER
      |      (PARTITION BY vec_id, slot ORDER BY dd, code) AS rn
      |    FROM dist)
      |  WHERE rn = 1)""".stripMargin

  private val baseOracle: Map[String, String] = Map(
    "q186_pq_encode" ->
      s"""$pqCte
         |SELECT vec_id, CAST(slot AS INT) AS slot,
         |  CAST(code AS INT) AS code
         |FROM codes ORDER BY vec_id, slot""".stripMargin,

    "q187_pq_adc_topk" ->
      s"""$pqCte,
         |lut AS (SELECT vec_id AS query_id, slot, code,
         |          CAST(floor(dd * 1000000.0) AS BIGINT) AS d_micro
         |        FROM dist WHERE vec_id < 8),
         |adc AS (SELECT l.query_id, c.vec_id AS neighbor_id,
         |          sum(l.d_micro) AS adc_micro
         |        FROM codes c
         |        JOIN lut l ON l.slot = c.slot AND l.code = c.code
         |        GROUP BY 1, 2),
         |rk AS (SELECT query_id, neighbor_id, adc_micro,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY adc_micro, neighbor_id) AS rank
         |       FROM adc)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  CAST(adc_micro AS BIGINT) AS adc_micro
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q184_hll_distinct" ->
      s"""WITH w AS (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+'))
         |    AS word
         |  FROM documents),
         |h AS (SELECT lang,
         |        ('0x' || substr(sha256(word), 1, 15))::BIGINT AS h
         |      FROM w WHERE word IS NOT NULL),
         |r AS (SELECT lang, CAST(h % 64 AS INT) AS reg,
         |        CAST(55 - CASE WHEN h // 64 = 0 THEN 0
         |          ELSE length(format('{:b}', h // 64)) END AS INT) AS rho
         |      FROM h),
         |mx AS (SELECT lang, reg, max(rho) AS rmax FROM r
         |       GROUP BY lang, reg),
         |g AS (SELECT lang, CAST(64 - count(*) AS INT) AS n_zero,
         |        CAST(sum(CAST(1 AS BIGINT) << (55 - rmax))
         |          + (64 - count(*)) * (CAST(1 AS BIGINT) << 55)
         |          AS BIGINT) AS denom_scaled
         |      FROM mx GROUP BY lang)
         |SELECT lang, n_zero, denom_scaled,
         |  CAST(CAST('${graft.llm.Sketches.hllNumerator(6)}' AS HUGEINT)
         |    // denom_scaled AS BIGINT) AS hll_est_micro
         |FROM g ORDER BY lang""".stripMargin,

    "q185_cms_freq" ->
      """WITH v AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |probes AS (SELECT DISTINCT user_id FROM v WHERE user_id % 13 = 0),
        |hrows AS (SELECT unnest(generate_series(0, 3)) AS i),
        |cnt AS (
        |  SELECT i,
        |    ('0x' || substr(sha256('cms' || CAST(i AS VARCHAR) || ':'
        |      || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket,
        |    count(*) AS c
        |  FROM v, hrows GROUP BY 1, 2),
        |est AS (
        |  SELECT p.user_id, min(c.c) AS cms_est
        |  FROM probes p
        |  JOIN hrows r ON TRUE
        |  JOIN cnt c ON c.i = r.i AND c.bucket =
        |    ('0x' || substr(sha256('cms' || CAST(r.i AS VARCHAR) || ':'
        |      || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT % 64
        |  GROUP BY 1),
        |ex AS (SELECT user_id, count(*) AS exact_cnt FROM v
        |       WHERE user_id % 13 = 0 GROUP BY 1)
        |SELECT p.user_id AS user_id, CAST(e.cms_est AS BIGINT) AS cms_est,
        |  CAST(x.exact_cnt AS BIGINT) AS exact_cnt,
        |  CAST(e.cms_est - x.exact_cnt AS BIGINT) AS overcount
        |FROM probes p
        |JOIN est e ON e.user_id = p.user_id
        |JOIN ex x ON x.user_id = p.user_id
        |ORDER BY p.user_id""".stripMargin,

    "q188_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |nrm AS (SELECT vec_id, label, v,
        |          sqrt(list_sum(list_transform(generate_series(1, 64),
        |            i -> v[i] * v[i]))) AS nn
        |        FROM e),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    c.label AS n_label,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> q.v[i] * c.v[i])) / (q.nn * c.nn) AS cosine
        |  FROM nrm q, nrm c
        |  WHERE q.vec_id < 8 AND c.label <> q.label),
        |ranked AS (
        |  SELECT query_id, neighbor_id, n_label, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |  n_label, round(cosine, 4) AS cosine_r
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q189_two_stage" ->
      s"""$pqCte,
         |pl AS (
         |  SELECT b, j,
         |    list(CASE WHEN ('0x' || substr(sha256(b || ':' || j || ':'
         |        || (i-1)), 1, 2))::INT % 2 = 0
         |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS h
         |  FROM (SELECT unnest(generate_series(0, 3)) AS b),
         |       (SELECT unnest(generate_series(0, 7)) AS j),
         |       (SELECT unnest(generate_series(1, 64)) AS i)
         |  GROUP BY b, j),
         |sig AS (
         |  SELECT e.vec_id, pl.b,
         |    CAST(sum(CASE WHEN list_sum(list_transform(
         |        generate_series(1, 64), kk -> v[kk] * h[kk])) >= 0
         |      THEN 1 << j ELSE 0 END) AS INT) AS bucket
         |  FROM e, pl GROUP BY e.vec_id, pl.b),
         |cand AS (
         |  SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
         |  FROM sig qs JOIN sig cs ON qs.b = cs.b AND qs.bucket = cs.bucket
         |  WHERE qs.vec_id < 8),
         |lut AS (SELECT vec_id AS query_id, slot, code,
         |          CAST(floor(dd * 1000000.0) AS BIGINT) AS d_micro
         |        FROM dist WHERE vec_id < 8),
         |adc AS (SELECT ca.query_id, ca.neighbor_id,
         |          sum(l.d_micro) AS adc_micro
         |        FROM cand ca
         |        JOIN codes c ON c.vec_id = ca.neighbor_id
         |        JOIN lut l ON l.query_id = ca.query_id
         |          AND l.slot = c.slot AND l.code = c.code
         |        GROUP BY 1, 2),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER
         |      (PARTITION BY query_id ORDER BY adc_micro, neighbor_id)
         |      AS ar
         |    FROM adc)
         |  WHERE ar <= 20),
         |nrm AS (SELECT vec_id, v,
         |          sqrt(list_sum(list_transform(generate_series(1, 64),
         |            i -> v[i] * v[i]))) AS nn
         |        FROM e),
         |scored AS (
         |  SELECT s.query_id, s.neighbor_id,
         |    list_sum(list_transform(generate_series(1, 64),
         |      i -> q.v[i] * c.v[i])) / (q.nn * c.nn) AS cosine
         |  FROM short s
         |  JOIN nrm q ON q.vec_id = s.query_id
         |  JOIN nrm c ON c.vec_id = s.neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
         |  round(cosine, 4) AS cosine_r
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q190_length_batching" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)
        |      AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |        row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
        |      FROM t),
        |b AS (SELECT doc_id, n_tokens,
        |        CAST((rn - 1) // 32 AS BIGINT) AS batch_id
        |      FROM r)
        |SELECT doc_id, n_tokens, batch_id,
        |  CAST(max(n_tokens) OVER (PARTITION BY batch_id) AS INT)
        |    AS batch_max,
        |  CAST(max(n_tokens) OVER (PARTITION BY batch_id) - n_tokens
        |    AS INT) AS pad_tokens
        |FROM b ORDER BY batch_id, doc_id""".stripMargin,

    "q191_kneser_ney" ->
      """WITH base AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |n0 AS (SELECT ws, len(ws) AS n FROM base),
        |bg AS (SELECT unnest(ws[1:n-1]) AS w1, unnest(ws[2:n]) AS w2
        |       FROM n0 WHERE n >= 2),
        |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |cu AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_u,
        |         count(*) AS n1u
        |       FROM c12 GROUP BY 1),
        |cw AS (SELECT w2, count(*) AS n1w FROM c12 GROUP BY 1),
        |ncc AS (SELECT count(*) AS ncc FROM c12),
        |uni AS (SELECT tok AS t, count(*) AS tc
        |        FROM (SELECT unnest(ws) AS tok FROM n0)
        |        GROUP BY 1 ORDER BY tc DESC, t LIMIT 8),
        |probes AS (SELECT a.t AS u, b.t AS w FROM uni a, uni b),
        |j AS (SELECT p.u, p.w, coalesce(c12.c, 0) AS c,
        |        cu.c_u, cu.n1u, coalesce(cw.n1w, 0) AS n1w, ncc.ncc
        |      FROM probes p
        |      JOIN cu ON cu.w1 = p.u
        |      LEFT JOIN cw ON cw.w2 = p.w
        |      LEFT JOIN c12 ON c12.w1 = p.u AND c12.w2 = p.w
        |      CROSS JOIN ncc)
        |SELECT u, w, CAST(c AS BIGINT) AS c,
        |  CAST((CAST(greatest(4 * c - 3, 0) AS HUGEINT) * ncc
        |      + CAST(3 AS HUGEINT) * n1u * n1w) * 1000000
        |    // (CAST(4 AS HUGEINT) * c_u * ncc) AS BIGINT) AS p_micro
        |FROM j ORDER BY u, w""".stripMargin,

    "q192_pmi" ->
      """WITH base AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |n0 AS (SELECT ws, len(ws) AS n FROM base WHERE len(ws) >= 2),
        |pairs AS (
        |  SELECT unnest(ws[1:n-1]) AS w, unnest(ws[2:n]) AS c FROM n0
        |  UNION ALL
        |  SELECT unnest(ws[2:n]), unnest(ws[1:n-1]) FROM n0
        |  UNION ALL
        |  SELECT unnest(ws[1:n-2]), unnest(ws[3:n]) FROM n0 WHERE n > 2
        |  UNION ALL
        |  SELECT unnest(ws[3:n]), unnest(ws[1:n-2]) FROM n0 WHERE n > 2),
        |nwc AS (SELECT w, c, count(*) AS n_wc FROM pairs GROUP BY 1, 2),
        |nw AS (SELECT w, CAST(sum(n_wc) AS BIGINT) AS n_w
        |       FROM nwc GROUP BY 1),
        |nc AS (SELECT c, CAST(sum(n_wc) AS BIGINT) AS n_c
        |       FROM nwc GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_wc) AS BIGINT) AS n_tot FROM nwc)
        |SELECT w, c, CAST(n_wc AS BIGINT) AS n_wc,
        |  CAST(CAST(n_wc AS HUGEINT) * n_tot * 1000000
        |    // (CAST(n_w AS HUGEINT) * n_c) AS BIGINT) AS ratio_micro
        |FROM nwc JOIN nw USING (w) JOIN nc USING (c) CROSS JOIN tot
        |WHERE n_wc >= 5
        |ORDER BY ratio_micro DESC, w, c LIMIT 20""".stripMargin)

  private val tripletOracle: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |nrm AS (SELECT vec_id, label, v,
      |          sqrt(list_sum(list_transform(generate_series(1, 64),
      |            i -> v[i] * v[i]))) AS nn
      |        FROM e),
      |scored AS (
      |  SELECT a.vec_id AS anchor_id, a.label AS a_label,
      |    c.vec_id AS neighbor_id, c.label AS n_label,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> a.v[i] * c.v[i])) / (a.nn * c.nn) AS cosine
      |  FROM nrm a, nrm c
      |  WHERE a.vec_id < 8 AND c.vec_id <> a.vec_id
      |    AND a.label IS NOT NULL AND c.label IS NOT NULL),
      |pos AS (SELECT anchor_id, neighbor_id AS pos_id,
      |          cosine AS pos_cosine,
      |          row_number() OVER (PARTITION BY anchor_id
      |            ORDER BY cosine DESC, neighbor_id) AS rn
      |        FROM scored WHERE n_label = a_label),
      |neg AS (SELECT anchor_id, neighbor_id AS neg_id,
      |          cosine AS neg_cosine,
      |          row_number() OVER (PARTITION BY anchor_id
      |            ORDER BY cosine DESC, neighbor_id) AS rn
      |        FROM scored WHERE n_label <> a_label)
      |SELECT p.anchor_id AS anchor_id, p.pos_id, n.neg_id,
      |  round(p.pos_cosine, 4) AS pos_cos_r,
      |  round(n.neg_cosine, 4) AS neg_cos_r,
      |  CAST(floor((p.pos_cosine - n.neg_cosine) * 1000000.0) AS BIGINT)
      |    AS margin_micro
      |FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id AND n.rn = 1
      |WHERE p.rn = 1 ORDER BY p.anchor_id""".stripMargin

  /** The Bradley-Terry MM recurrence unrolled: one CTE per
    * iteration, every division an integer floor over HUGEINT — the
    * same discipline as the q174 Viterbi replay. */
  private val btIter = (k: Int) =>
    s"""it$k AS (SELECT n.i AS item,
       |  (CAST(SUM(n.w) AS HUGEINT) * 1000000000000) //
       |  SUM((CAST(n.nij AS HUGEINT) * 1000000000000) // (pi.p + pj.p))
       |    AS p
       |FROM n JOIN it${k - 1} pi ON pi.item = n.i
       |       JOIN it${k - 1} pj ON pj.item = n.j
       |GROUP BY n.i)""".stripMargin
  private val btOracle: String =
    s"""WITH seq AS (
       |  SELECT event_type, value,
       |    lag(event_type) OVER w AS prev_type,
       |    lag(value) OVER w AS prev_value
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |comp AS (
       |  SELECT CASE WHEN value >= prev_value THEN event_type
       |              ELSE prev_type END AS i,
       |         CASE WHEN value >= prev_value THEN prev_type
       |              ELSE event_type END AS j
       |  FROM seq
       |  WHERE prev_type IS NOT NULL AND event_type <> prev_type
       |    AND value IS NOT NULL AND prev_value IS NOT NULL),
       |raw AS (SELECT i, j, count(*) AS w FROM comp GROUP BY i, j),
       |dirs AS (SELECT i, j FROM raw UNION SELECT j AS i, i AS j FROM raw),
       |sm AS (SELECT d.i, d.j, COALESCE(r.w, 0) + 1 AS w
       |       FROM dirs d LEFT JOIN raw r ON r.i = d.i AND r.j = d.j),
       |n AS (SELECT a.i, a.j, a.w, a.w + b.w AS nij
       |      FROM sm a JOIN sm b ON b.i = a.j AND b.j = a.i),
       |it0 AS (SELECT DISTINCT i AS item, CAST(1000000 AS HUGEINT) AS p
       |        FROM sm),
       |${btIter(1)},
       |${btIter(2)},
       |${btIter(3)},
       |tot AS (SELECT SUM(p) AS sp, COUNT(*) AS ni FROM it3),
       |rw AS (SELECT i AS item, SUM(w) AS wins FROM raw GROUP BY i),
       |gm AS (SELECT item, SUM(w) AS games FROM (
       |         SELECT i AS item, w FROM raw
       |         UNION ALL SELECT j AS item, w FROM raw)
       |       GROUP BY item)
       |SELECT t.item, CAST(COALESCE(rw.wins, 0) AS BIGINT) AS wins,
       |  CAST(gm.games AS BIGINT) AS games,
       |  CAST((t.p * 1000000 * tot.ni) // tot.sp AS BIGINT)
       |    AS strength_micro
       |FROM it3 t
       |JOIN gm ON gm.item = t.item
       |LEFT JOIN rw ON rw.item = t.item
       |CROSS JOIN tot
       |ORDER BY strength_micro DESC, t.item""".stripMargin

  private val kappaOracle: String =
    """WITH base AS (
      |  SELECT lang,
      |    CASE WHEN n_chars < 220 THEN 'short'
      |         WHEN n_chars < 380 THEN 'mid' ELSE 'long' END AS a,
      |    CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 40
      |           THEN 'short'
      |         WHEN len(regexp_split_to_array(trim(text), '\s+')) < 68
      |           THEN 'mid' ELSE 'long' END AS b
      |  FROM documents),
      |tot AS (SELECT lang, count(*) AS n,
      |          SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
      |        FROM base GROUP BY lang),
      |ac AS (SELECT lang, a AS lbl, count(*) AS ak FROM base
      |       GROUP BY lang, a),
      |bc AS (SELECT lang, b AS lbl, count(*) AS bk FROM base
      |       GROUP BY lang, b),
      |pe AS (SELECT ac.lang, SUM(ak * bk) AS pe_num
      |       FROM ac JOIN bc ON bc.lang = ac.lang AND bc.lbl = ac.lbl
      |       GROUP BY ac.lang)
      |SELECT t.lang, CAST(t.n AS BIGINT) AS n,
      |  CAST(t.agree AS BIGINT) AS agree,
      |  CASE WHEN CAST(t.n AS HUGEINT) * t.n = pe.pe_num THEN NULL
      |       ELSE CAST(((CAST(t.agree AS HUGEINT) * t.n - pe.pe_num)
      |                  * 1000000) //
      |                 (CAST(t.n AS HUGEINT) * t.n - pe.pe_num)
      |                 AS BIGINT) END AS kappa_micro
      |FROM tot t JOIN pe ON pe.lang = t.lang
      |ORDER BY t.lang""".stripMargin

  private val fuzzyOracle: String =
    """WITH probes AS (
      |  SELECT p_partkey AS probe_id,
      |    substring(p_name, 1, pos) || substring(p_name, pos + 2)
      |      AS noisy
      |  FROM (SELECT p_partkey, p_name,
      |          CAST((p_partkey // 37) % length(p_name) AS INT) AS pos
      |        FROM part WHERE p_partkey % 37 = 0)),
      |lb AS (SELECT DISTINCT probe_id, noisy, blk FROM (
      |         SELECT probe_id, noisy, unnest([
      |           substring(noisy, 1, 3), substring(noisy, -3, 3)]) AS blk
      |         FROM probes)),
      |rb AS (SELECT DISTINCT p_partkey, p_name, blk FROM (
      |         SELECT p_partkey, p_name, unnest([
      |           substring(p_name, 1, 3), substring(p_name, -3, 3)])
      |             AS blk
      |         FROM part)),
      |cand AS (SELECT DISTINCT l.probe_id, l.noisy, r.p_partkey,
      |           r.p_name, levenshtein(l.noisy, r.p_name) AS dist
      |         FROM lb l JOIN rb r ON r.blk = l.blk
      |         WHERE levenshtein(l.noisy, r.p_name) <= 2)
      |SELECT probe_id AS left_id, noisy AS left_key,
      |  p_partkey AS match_id, p_name AS match_key,
      |  CAST(dist AS INT) AS dist
      |FROM cand
      |QUALIFY row_number() OVER (PARTITION BY probe_id
      |  ORDER BY dist, p_partkey) = 1
      |ORDER BY left_id""".stripMargin

  private val zorderOracle: String = {
    val ilv = graft.ops.Layout.mortonInterleaveSql(Seq("d0", "d1"), 16)
    s"""WITH base AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
       |sp AS (SELECT min(user_id) AS lo0, max(user_id) AS hi0,
       |              min(ts_ms) AS lo1, max(ts_ms) AS hi1 FROM base),
       |sc AS (SELECT user_id, ts_ms,
       |         CASE WHEN hi0 = lo0 THEN 0
       |              ELSE ((user_id - lo0) * 65535) // (hi0 - lo0)
       |         END AS d0,
       |         CASE WHEN hi1 = lo1 THEN 0
       |              ELSE ((ts_ms - lo1) * 65535) // (hi1 - lo1)
       |         END AS d1
       |       FROM base CROSS JOIN sp),
       |z AS (SELECT user_id, ts_ms, $ilv AS z_key FROM sc)
       |SELECT z_key >> 24 AS bucket, count(*) AS n,
       |  max(user_id) - min(user_id) AS user_span,
       |  max(ts_ms) - min(ts_ms) AS ts_span
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  private val profileDriftOracle: String = {
    def prof(side: String, src: String): String =
      Seq("user_id", "event_type", "value").map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_$side,
           |  count(*) FILTER (WHERE $c IS NULL) AS nulls_$side,
           |  count(DISTINCT $c) AS distinct_$side FROM $src"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH base AS (SELECT epoch_ms(ts) AS ts_ms, user_id,
       |    event_type, value FROM events),
       |m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM base),
       |sa AS (SELECT * FROM base, m WHERE ts_ms < mid),
       |sb AS (SELECT * FROM base, m WHERE ts_ms >= mid),
       |pa AS (${prof("a", "sa")}),
       |pb AS (${prof("b", "sb")})
       |SELECT pa."column", n_a, n_b, nulls_a, nulls_b,
       |  distinct_a, distinct_b,
       |  CASE WHEN n_a = 0 THEN 0
       |       ELSE (nulls_a * 1000000) // n_a END AS null_rate_a_micro,
       |  CASE WHEN n_b = 0 THEN 0
       |       ELSE (nulls_b * 1000000) // n_b END AS null_rate_b_micro,
       |  (CASE WHEN n_b = 0 THEN 0
       |        ELSE (nulls_b * 1000000) // n_b END) -
       |  (CASE WHEN n_a = 0 THEN 0
       |        ELSE (nulls_a * 1000000) // n_a END)
       |    AS null_rate_delta_micro,
       |  distinct_b - distinct_a AS distinct_delta
       |FROM pa JOIN pb ON pb."column" = pa."column"
       |ORDER BY pa."column"""".stripMargin
  }

  private val scd2Oracle: String =
    """WITH base AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
      |    event_type, event_id FROM events),
      |last_w AS (SELECT user_id, ts_ms AS valid_from,
      |             max_by(event_type, event_id) AS v
      |           FROM base GROUP BY user_id, ts_ms),
      |ordered AS (SELECT user_id, valid_from, v,
      |              lag(v) OVER w AS pv,
      |              row_number() OVER w AS rn
      |            FROM last_w
      |            WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)),
      |changes AS (SELECT user_id, valid_from, v FROM ordered
      |            WHERE rn = 1 OR v IS DISTINCT FROM pv)
      |SELECT user_id, v AS event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
      |    AS valid_to,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
      |    IS NULL AS is_current
      |FROM changes ORDER BY user_id, valid_from""".stripMargin

  private val tableDiffOracle: String =
    """WITH cust AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |              FROM customer),
      |newc AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100
      |         ELSE c_acctbal END AS c_acctbal,
      |    CASE WHEN c_custkey % 17 = 0 THEN 'MIGRATED'
      |         ELSE c_mktsegment END AS c_mktsegment
      |  FROM cust WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000000, c_name, c_acctbal, c_mktsegment
      |  FROM cust WHERE c_custkey % 19 = 0),
      |j AS (SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
      |        o.c_custkey IS NOT NULL AS in_old,
      |        n.c_custkey IS NOT NULL AS in_new,
      |        o.c_name IS DISTINCT FROM n.c_name AS d_name,
      |        o.c_acctbal IS DISTINCT FROM n.c_acctbal AS d_bal,
      |        o.c_mktsegment IS DISTINCT FROM n.c_mktsegment AS d_seg
      |      FROM cust o FULL OUTER JOIN newc n
      |        ON n.c_custkey = o.c_custkey)
      |SELECT c_custkey,
      |  CASE WHEN NOT in_old THEN 'added'
      |       WHEN NOT in_new THEN 'removed'
      |       ELSE 'changed' END AS status,
      |  CASE WHEN in_old AND in_new THEN concat_ws(',',
      |         CASE WHEN d_name THEN 'c_name' END,
      |         CASE WHEN d_bal THEN 'c_acctbal' END,
      |         CASE WHEN d_seg THEN 'c_mktsegment' END)
      |       ELSE '' END AS changed_cols
      |FROM j
      |WHERE NOT in_old OR NOT in_new OR d_name OR d_bal OR d_seg
      |ORDER BY c_custkey""".stripMargin

  private val dqOracle: String = {
    val rules = Seq(
      "quantity_max_40" -> "l_quantity > 40",
      "discount_le_10pct" -> "l_discount > 0.1",
      "tax_range" -> "l_tax < 0 OR l_tax > 0.08",
      "price_positive" -> "l_extendedprice <= 0",
      "returnflag_domain" -> "l_returnflag NOT IN ('A', 'N', 'R')")
    val ruleSelects = rules.map { case (nm, bad) =>
      s"""SELECT '$nm' AS rule,
         |  count(*) FILTER (WHERE $bad) AS violations,
         |  count(*) AS n_rows,
         |  count(*) FILTER (WHERE $bad) = 0 AS pass FROM lineitem"""
        .stripMargin
    }
    val uniq = Seq(
      "unique_order_line" -> "(l_orderkey, l_linenumber)",
      "unique_orderkey_alone" -> "(l_orderkey)").map { case (nm, k) =>
      s"""SELECT '$nm' AS rule,
         |  count(*) - count(DISTINCT $k) AS violations,
         |  count(*) AS n_rows,
         |  count(*) - count(DISTINCT $k) = 0 AS pass FROM lineitem"""
        .stripMargin
    }
    (ruleSelects ++ uniq).mkString("", "\nUNION ALL\n",
      "\nORDER BY rule")
  }

  // q193 shares q184's oracle VERBATIM: merged shard sketches must
  // equal the direct per-lang sketch — the associativity contract.
  val oracleSql: Map[String, String] = baseOracle +
    ("q193_hll_shards" -> baseOracle("q184_hll_distinct")) +
    ("q194_triplets" -> tripletOracle) +
    ("q195_bradley_terry" -> btOracle) +
    ("q196_annotator_kappa" -> kappaOracle) +
    ("q197_fuzzy_link" -> fuzzyOracle) +
    ("q198_zorder_layout" -> zorderOracle) +
    ("q199_profile_drift" -> profileDriftOracle) +
    ("q200_scd2_history" -> scd2Oracle) +
    ("q201_table_diff" -> tableDiffOracle) +
    ("q202_dq_checks" -> dqOracle) +
    ("q203_ri_checks" -> riOracle) +
    ("q204_attribution" -> attributionOracle) +
    ("q205_hll_intersect" -> hllIntersectOracle) +
    ("q206_label_prop" -> lpaOracle) +
    ("q207_personalized_pr" -> pprOracle) +
    ("q208_chat_render" -> chatOracle) +
    ("q209_license_id" -> licenseOracle) +
    ("q210_outlier_gate" -> outlierOracle) +
    ("q211_hist_quantiles" -> histQuantOracle) +
    ("q212_byte_bpe_train" -> byteBpeTrainOracle) +
    ("q213_byte_bpe_encode" -> byteBpeEncodeOracle) +
    ("q214_ivf_adc_topk" -> ivfAdcOracle)

  // IVF-ADC oracle: coarse cells (sha-rank sample, nested 8×8
  // sequential squared-L2 — the q186-pinned summation grouping),
  // PQ codebook/codes/LUT (the q186/q187 CTE shapes at salt 214),
  // candidate = probed-cell join, ADC = per-slot LUT sum, rank ≤ k.
  private lazy val ivfAdcOracle: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |    AS v
      |  FROM embeddings),
      |rc AS (SELECT vec_id, v,
      |         ('0x' || substr(sha256('ivf:214:' ||
      |           CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS rk
      |       FROM e),
      |cells AS (SELECT v AS cv, row_number() OVER (ORDER BY rk, vec_id)
      |            - 1 AS cell
      |          FROM rc ORDER BY rk, vec_id LIMIT 8),
      |cd AS (
      |  SELECT e.vec_id, c.cell,
      |    list_sum(list_transform(generate_series(0, 7), s ->
      |      list_sum(list_transform(generate_series(1, 8), j ->
      |        (e.v[s * 8 + j] - c.cv[s * 8 + j])
      |          * (e.v[s * 8 + j] - c.cv[s * 8 + j]))))) AS dd
      |  FROM e, cells c),
      |asn AS (SELECT vec_id, cell FROM (
      |          SELECT vec_id, cell, row_number() OVER
      |            (PARTITION BY vec_id ORDER BY dd, cell) AS rn
      |          FROM cd)
      |        WHERE rn = 1),
      |r AS (SELECT vec_id, v,
      |        ('0x' || substr(sha256('pq:214:' ||
      |          CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS rk
      |      FROM e),
      |samp AS (SELECT v, row_number() OVER (ORDER BY rk, vec_id) - 1
      |           AS code
      |         FROM r ORDER BY rk, vec_id LIMIT 16),
      |cb AS (SELECT ss.s AS slot, code,
      |         list_transform(generate_series(1, 8),
      |           j -> v[ss.s * 8 + j]) AS cvec
      |       FROM samp, (SELECT unnest(generate_series(0, 7)) AS s) ss),
      |dist AS (
      |  SELECT e.vec_id, cb.slot, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      j -> (e.v[cb.slot * 8 + j] - cb.cvec[j])
      |         * (e.v[cb.slot * 8 + j] - cb.cvec[j]))) AS dd
      |  FROM e, cb),
      |codes AS (
      |  SELECT vec_id, slot, code FROM (
      |    SELECT vec_id, slot, code, row_number() OVER
      |      (PARTITION BY vec_id, slot ORDER BY dd, code) AS rn
      |    FROM dist)
      |  WHERE rn = 1),
      |probe AS (SELECT vec_id AS query_id, cell FROM (
      |            SELECT vec_id, cell, row_number() OVER
      |              (PARTITION BY vec_id ORDER BY dd, cell) AS rn
      |            FROM cd WHERE vec_id < 8)
      |          WHERE rn <= 3),
      |lut AS (SELECT vec_id AS query_id, slot, code,
      |          CAST(floor(dd * 1000000.0) AS BIGINT) AS d_micro
      |        FROM dist WHERE vec_id < 8),
      |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
      |         FROM probe p JOIN asn a ON a.cell = p.cell),
      |adc AS (SELECT c.query_id, c.neighbor_id,
      |          sum(l.d_micro) AS adc_micro
      |        FROM cand c
      |        JOIN codes co ON co.vec_id = c.neighbor_id
      |        JOIN lut l ON l.query_id = c.query_id
      |          AND l.slot = co.slot AND l.code = co.code
      |        GROUP BY 1, 2),
      |rk2 AS (SELECT query_id, neighbor_id, adc_micro,
      |          row_number() OVER (PARTITION BY query_id
      |            ORDER BY adc_micro, neighbor_id) AS rank
      |        FROM adc)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
      |  CAST(adc_micro AS BIGINT) AS adc_micro
      |FROM rk2 WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // Byte-level BPE oracles: the q121/q122 CTE round chains verbatim
  // (reused from R8Queries), with the SEEDING swapped to UTF-8 bytes —
  // lower(hex(encode(w))) chunked in twos — and NO token filter (the
  // byte alphabet cannot collide with the separator; nothing drops).
  private lazy val byteBpeTrainOracle: String =
    s"""WITH toks AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> ''
       |  GROUP BY 1),
       |w0 AS (
       |  SELECT chr(31) || array_to_string(
       |    regexp_extract_all(lower(hex(encode(w))), '..'),
       |    chr(31) || chr(31)) || chr(31) AS sym, freq
       |  FROM toks),
       |${(0 until 6).map(R8Queries.bpeRound).mkString(",\n")}
       |SELECT CAST(merge_idx AS INT) AS merge_idx, l AS "left",
       |  r AS "right", cnt
       |FROM (${(0 until 6).map(k => s"SELECT * FROM t$k")
           .mkString(" UNION ALL ")})
       |ORDER BY merge_idx""".stripMargin

  private lazy val byteBpeEncodeOracle: String =
    s"""WITH toks AS (
       |  SELECT w, count(*) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE w <> ''
       |  GROUP BY 1),
       |v0 AS (
       |  SELECT w, chr(31) || array_to_string(
       |    regexp_extract_all(lower(hex(encode(w))), '..'),
       |    chr(31) || chr(31)) || chr(31) AS sym, freq
       |  FROM toks),
       |${(0 until 6).map(R8Queries.bpeRoundW).mkString(",\n")},
       |seg AS (
       |  SELECT w, regexp_split_to_array(trim(sym, chr(31)),
       |    chr(31) || chr(31)) AS syms
       |  FROM v6),
       |d AS (SELECT doc_id,
       |        regexp_split_to_array(trim(text), '\\s+') AS ws
       |      FROM documents),
       |tok AS (
       |  SELECT doc_id, s.i AS ord, s.w AS w
       |  FROM (SELECT doc_id, unnest(list_transform(
       |          generate_series(1, len(ws)),
       |          i -> struct_pack(i := i, w := ws[i]))) AS s
       |        FROM d)
       |  WHERE s.w <> '')
       |SELECT doc_id,
       |  CAST(coalesce(sum(len(syms)), 0) AS INT) AS n_bpe_tokens,
       |  coalesce(string_agg(array_to_string(syms, ' '), ' '
       |    ORDER BY ord), '') AS bpe_text
       |FROM d LEFT JOIN tok USING (doc_id)
       |  LEFT JOIN seg USING (w)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  private lazy val histQuantOracle: String =
    """WITH b AS (SELECT event_type,
      |    CAST(floor(value * 1000000) AS BIGINT) AS x
      |  FROM events WHERE value IS NOT NULL),
      |sp AS (SELECT event_type, min(x) AS lo, max(x) AS hi
      |       FROM b GROUP BY event_type),
      |bn AS (SELECT b.event_type, sp.lo, sp.hi,
      |        CASE WHEN hi = lo THEN 0
      |             ELSE least(63, ((x - lo) * 64) // (hi - lo))
      |        END AS bin
      |      FROM b JOIN sp USING (event_type)),
      |cnt AS (SELECT event_type, lo, hi, bin, count(*) AS c
      |        FROM bn GROUP BY 1, 2, 3, 4),
      |cum AS (SELECT event_type, lo, hi, bin, c,
      |         sum(c) OVER (PARTITION BY event_type ORDER BY bin)
      |           AS cm,
      |         sum(c) OVER (PARTITION BY event_type) AS n
      |       FROM cnt),
      |pk AS (SELECT c.event_type, p.p, min(c.bin) AS bin,
      |         max(c.n) AS n, max(c.lo) AS lo, max(c.hi) AS hi
      |       FROM cum c
      |       CROSS JOIN (SELECT unnest([50, 90, 99]) AS p) p
      |       WHERE c.cm * 100 >= p.p * c.n
      |       GROUP BY 1, 2)
      |SELECT event_type, CAST(p AS INT) AS p, CAST(n AS BIGINT) AS n,
      |  CAST(bin AS BIGINT) AS bin,
      |  CAST(lo + (bin * (hi - lo)) // 64 AS BIGINT) AS lo_micro,
      |  CAST(CASE WHEN bin = 63 THEN hi
      |       ELSE lo + ((bin + 1) * (hi - lo)) // 64 END AS BIGINT)
      |    AS hi_micro
      |FROM pk ORDER BY event_type, p""".stripMargin

  private lazy val outlierOracle: String =
    """WITH b AS (SELECT event_type, event_id,
      |    CAST(floor(value * 1000000) AS HUGEINT) AS x
      |  FROM events WHERE value IS NOT NULL),
      |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |         SUM(x) AS s, SUM(x * x) AS q
      |       FROM b GROUP BY event_type),
      |f AS (SELECT b.event_type, b.x,
      |        (n * x - s) * (n * x - s) > 4 * (n * q - s * s) AS o
      |      FROM b JOIN st USING (event_type))
      |SELECT event_type, count(*) AS n,
      |  CAST(count(*) FILTER (WHERE o) AS BIGINT) AS n_outliers,
      |  CAST(min(CASE WHEN o THEN x END) AS BIGINT) AS min_out_micro,
      |  CAST(max(CASE WHEN o THEN x END) AS BIGINT) AS max_out_micro
      |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin

  private lazy val chatOracle: String =
    """WITH base AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |  CASE WHEN event_type IN ('click', 'view') THEN 'user'
      |       WHEN event_type = 'error' THEN 'system'
      |       ELSE 'assistant' END AS role,
      |  props AS content FROM events)
      |SELECT user_id, count(*) AS n_turns,
      |  string_agg('<|' || COALESCE(role, '') || '|>'
      |      || COALESCE(content, '') || '<|end|>', ''
      |    ORDER BY ts_ms, event_id) AS conversation
      |FROM base GROUP BY user_id ORDER BY user_id""".stripMargin

  private lazy val licenseOracle: String =
    """WITH planted AS (SELECT doc_id, lower(text ||
      |    CASE WHEN doc_id % 4 = 0
      |           THEN ' Licensed under the Apache License, Version 2.0'
      |         WHEN doc_id % 4 = 1
      |           THEN ' Permission is hereby granted, free of charge, to any person'
      |         WHEN doc_id % 4 = 2
      |           THEN ' terms of the GNU General Public License'
      |         ELSE '' END) AS t
      |  FROM documents),
      |tagged AS (SELECT doc_id,
      |  CASE WHEN contains(t, 'licensed under the apache license')
      |         THEN 'apache-2.0'
      |       WHEN contains(t, 'permission is hereby granted, free of charge')
      |         THEN 'mit'
      |       WHEN contains(t, 'gnu general public license')
      |         THEN 'gpl'
      |       WHEN contains(t, 'redistribution and use in source and binary forms')
      |         THEN 'bsd'
      |       WHEN contains(t, 'creative commons')
      |         THEN 'cc'
      |       ELSE 'unknown' END AS license
      |  FROM planted)
      |SELECT license, count(*) AS n, min(doc_id) AS min_doc
      |FROM tagged GROUP BY license ORDER BY license""".stripMargin

  private lazy val lpaOracle: String = {
    def round(k: Int): String =
      s"""l$k AS (SELECT node, lbl FROM (
         |  SELECT e.src AS node, l.lbl, count(*) AS c,
         |    row_number() OVER (PARTITION BY e.src
         |      ORDER BY count(*) DESC, l.lbl) AS rn
         |  FROM ed e JOIN l${k - 1} l ON l.node = e.dst
         |  GROUP BY e.src, l.lbl) WHERE rn = 1)""".stripMargin
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |e0 AS (SELECT doc_id AS src, (doc_id * 7) % n AS dst
       |       FROM documents, nn
       |       UNION ALL
       |       SELECT doc_id, (doc_id * 13 + 1) % n FROM documents, nn),
       |ed AS (SELECT DISTINCT src, dst FROM (
       |        SELECT src, dst FROM e0 WHERE src <> dst
       |        UNION ALL
       |        SELECT dst AS src, src AS dst FROM e0 WHERE src <> dst)),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ed),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT node, lbl FROM l3 ORDER BY node""".stripMargin
  }

  private lazy val pprOracle: String = {
    def iter(k: Int): String =
      s"""c$k AS (SELECT e.dst AS node, sum(r${k - 1}.rank // od.outdeg)
         |         AS cs
         |       FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |       JOIN od ON e.src = od.src GROUP BY 1),
         |r$k AS (SELECT bt.node,
         |         CAST(bt.base + (85 * coalesce(cs, 0)) // 100 AS BIGINT)
         |           AS rank
         |       FROM bt LEFT JOIN c$k USING (node))""".stripMargin
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |e AS (SELECT doc_id AS src, (doc_id * 7) % n AS dst
       |      FROM documents, nn
       |      UNION ALL
       |      SELECT doc_id AS src, (doc_id * 13 + 1) % n AS dst
       |      FROM documents, nn),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |sdn AS (SELECT DISTINCT doc_id AS node FROM documents
       |        WHERE doc_id % 97 = 0
       |          AND doc_id IN (SELECT node FROM nodes)),
       |prm AS (SELECT (SELECT count(*) FROM nodes) AS n2,
       |               (SELECT count(*) FROM sdn) AS s),
       |bt AS (SELECT nodes.node,
       |         CASE WHEN nodes.node IN (SELECT node FROM sdn)
       |           THEN CAST((CAST(1000000 AS HUGEINT) * 15 * n2)
       |                // (CAST(100 AS HUGEINT) * s) AS BIGINT)
       |           ELSE 0 END AS base
       |       FROM nodes, prm),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT node, rank FROM r3 ORDER BY node""".stripMargin
  }

  private lazy val attributionOracle: String =
    """WITH base AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
      |    event_type, event_id FROM events),
      |p AS (SELECT user_id, event_id AS purchase_id, ts_ms FROM base
      |      WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts_ms AS c_ts, max(event_id) AS click_id
      |      FROM base WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.purchase_id, p.user_id, p.ts_ms, c.click_id,
      |  c.c_ts AS click_ts, p.ts_ms - c.c_ts AS latency_ms
      |FROM p ASOF LEFT JOIN c
      |  ON c.user_id = p.user_id AND c.c_ts <= p.ts_ms
      |ORDER BY p.purchase_id""".stripMargin

  private lazy val hllIntersectOracle: String =
    s"""WITH w AS (
       |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+'))
       |    AS word
       |  FROM documents),
       |h AS (SELECT lang,
       |        ('0x' || substr(sha256(word), 1, 15))::BIGINT AS h
       |      FROM w WHERE word IS NOT NULL),
       |r AS (SELECT lang, CAST(h % 64 AS INT) AS reg,
       |        CAST(55 - CASE WHEN h // 64 = 0 THEN 0
       |          ELSE length(format('{:b}', h // 64)) END AS INT) AS rho
       |      FROM h),
       |mx AS (SELECT lang, reg, max(rho) AS rmax FROM r
       |       GROUP BY lang, reg),
       |single AS (
       |  SELECT lang,
       |    CAST(CAST('${graft.llm.Sketches.hllNumerator(6)}' AS HUGEINT)
       |      // (sum(CAST(1 AS BIGINT) << (55 - rmax))
       |          + (64 - count(*)) * (CAST(1 AS BIGINT) << 55))
       |      AS BIGINT) AS est
       |  FROM mx GROUP BY lang),
       |langs AS (SELECT DISTINCT lang FROM mx),
       |prs AS (SELECT a.lang AS lang_a, b.lang AS lang_b
       |        FROM langs a JOIN langs b ON a.lang < b.lang),
       |ur AS (SELECT p.lang_a, p.lang_b, m.reg, max(m.rmax) AS rmax
       |       FROM prs p JOIN mx m
       |         ON m.lang = p.lang_a OR m.lang = p.lang_b
       |       GROUP BY 1, 2, 3),
       |uest AS (
       |  SELECT lang_a, lang_b,
       |    CAST(CAST('${graft.llm.Sketches.hllNumerator(6)}' AS HUGEINT)
       |      // (sum(CAST(1 AS BIGINT) << (55 - rmax))
       |          + (64 - count(*)) * (CAST(1 AS BIGINT) << 55))
       |      AS BIGINT) AS est_union_micro
       |  FROM ur GROUP BY lang_a, lang_b)
       |SELECT u.lang_a, u.lang_b, sa.est AS est_a, sb.est AS est_b,
       |  u.est_union_micro,
       |  sa.est + sb.est - u.est_union_micro AS est_intersect_micro
       |FROM uest u
       |JOIN single sa ON sa.lang = u.lang_a
       |JOIN single sb ON sb.lang = u.lang_b
       |ORDER BY u.lang_a, u.lang_b""".stripMargin

  private lazy val riOracle: String = {
    def one(name: String, child: String, fk: String, parent: String,
        pk: String, parentFilter: String = ""): String =
      s"""SELECT '$name' AS rule,
         |  (SELECT count(*) FROM $child c
         |   WHERE c.$fk IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $parent p
         |      WHERE p.$pk = c.$fk$parentFilter)) AS violations,
         |  (SELECT count(*) FROM $child) AS n_rows,
         |  (SELECT count(*) FROM $child c
         |   WHERE c.$fk IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $parent p
         |      WHERE p.$pk = c.$fk$parentFilter)) = 0 AS pass"""
        .stripMargin
    Seq(
      one("lineitem_orderkey_fk", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("lineitem_partkey_fk", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("orders_custkey_vs_pruned", "orders", "o_custkey",
        "customer", "c_custkey", " AND p.c_custkey % 7 <> 0"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }
}
