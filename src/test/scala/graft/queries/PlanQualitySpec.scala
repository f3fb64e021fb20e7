package graft.queries

import graft.{SparkSuite, SparkEntry}

/** Plan-quality regression guards: the physical plans the 100 TB design
  * depends on (SCALE.md). If a refactor silently loses a pushdown, a
  * broadcast, or the window top-k rewrite, these fail — correctness
  * tests would not notice.
  */
class PlanQualitySpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    // formatted mode prints scan metadata (PushedFilters/ReadSchema)
    // unabridged; executedPlan.toString truncates it at 100 chars
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q06: both predicates pushed to the parquet scan") {
    val p = plan("q06_filter_predicate")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThan(l_quantity,30.0)"), p.take(800))
    assert(p.contains("EqualTo(l_returnflag,R)"))
  }

  test("q01: scan schema pruned to the projected columns only") {
    val p = plan("q01_scan_projection")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_returnflag"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_shipdate"), read)
  }

  test("q21: dimension joins broadcast (no fact-side shuffle join)") {
    val p = plan("q21_join_enrich")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q23: window top-k uses WindowGroupLimit pushdown") {
    val p = plan("q23_window_topk")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("q43: top-N is TakeOrderedAndProject, not a global sort") {
    val p = plan("q43_revenue_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || p.contains("EqualTo(c_mktsegment,BUILDING)"))
  }

  test("q34: ANN brute force broadcasts queries and bounds ranks early") {
    val p = plan("q34_ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("q19: IP round-trip runs on native expressions, no regex per row") {
    val p = plan("q19_ip_from_int")
    assert(p.contains("graft_ip_to_int"), p.take(800))
    // the old Column-composed parser re-evaluated an rlike per reference
    assert(!p.contains("RLIKE") && !p.contains("rlike"))
  }

  test("q40: CIDR expansion is a streamed Generate, not an array explode") {
    val p = plan("q40_cidr_explode")
    assert(p.contains("graft_cidr_hosts"), p.take(800))
  }

  test("q42: guarded exact pairs — per-block counts broadcast, no cartesian") {
    val p = plan("q42_embedding_pairs")
    assert(p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q53: decontamination broadcasts the probe index; corpus side map-only") {
    val p = plan("q53_decontam")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q52: token packing has NO running-sum window — two-phase prefix sum") {
    val p = plan("q52_token_packing")
    // any Window node would mean a whole shard serializes through one
    // task again; the two-phase plan surfaces as an RDD scan instead
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q57: sketch aggregate is partial — the shuffle carries summaries") {
    val p = plan("q57_heavy_hitters")
    // partial + final ObjectHashAggregate around the exchange: map-side
    // summaries move, never raw (group, item) rows
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q56: range join plans as an equi join, not nested loop") {
    val p = plan("q56_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("q58: repetition stats are map-only — no hash exchange before the sort") {
    val p = plan("q58_repetition_stats")
    // only the deterministic final ORDER BY may repartition (range);
    // the stats themselves must not shuffle token occurrences
    assert(!p.contains("hashpartitioning"), p.take(1200))
  }

  test("q63: PII scrub is map-only") {
    val p = plan("q63_pii_scrub")
    assert(!p.contains("hashpartitioning"), p.take(1200))
  }

  test("q59: shingle audit never buffers a hot shingle group in one task") {
    val p = plan("q59_dup_shingles")
    // the count-window formulation (count().over(partitionBy(g))) would
    // land a df=10⁶ boilerplate shingle's whole group in ONE task — the
    // exact corpus this audit exists for. The safe plan has NO window:
    // every hash exchange sits above a partial aggregate, so a hot
    // shingle crosses the wire as one (count, min) cell per map task.
    assert(!p.contains("Window"), p.take(1200))
    assert("partial_count|partial count|functions=\\[partial".r
      .findFirstIn(p).isDefined || "HashAggregate".r.findAllIn(p).size >= 4,
      p.take(1200))
    // the only joins are doc-keyed (one row per doc on both sides)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q64: keep-best dedup is a bounded aggregate, not a content_hash window") {
    val p = plan("q64_norm_dedup")
    // a row_number/count window partitioned by content_hash buffers a
    // mass-duplicated document's ENTIRE group (text payload included)
    // in one task. The safe plan is min_by+count with map-side partial
    // combine: one winner candidate per map partition crosses the wire.
    assert(!p.contains("Window"), p.take(1200))
    // struct-valued min_by buffer ⇒ SortAggregate, still partial+final:
    // the partial aggregate must sit BELOW the content_hash exchange so
    // only one candidate per map partition crosses the wire.
    assert(p.contains("partial_min_by"), p.take(2000))
  }

  test("q62: semi/anti probes plan as hash joins, never nested loop") {
    val p = plan("q62_semi_anti")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q65: percentiles aggregate the value distribution, not a row window") {
    val p = plan("q65_percentile_rank")
    // the only full-data pass is the map-side-combined groupBy(flag, v):
    // its exchange keys on BOTH columns; a row-level rank window would
    // exchange on flag alone with all rows
    assert(p.contains("hashpartitioning(flag") , p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial count")
      || "HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }

  test("q64: keep-best dedup partitions by content hash") {
    val p = plan("q64_norm_dedup")
    assert(p.contains("hashpartitioning(content_hash"), p.take(1200))
  }

  test("q66: keyword search takes top-k without a global sort; N broadcast") {
    val p = plan("q66_keyword_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(1200))
    // df comes from a broadcast ≤|terms|-row count table, never a
    // per-term count window (which buffers every doc matching a common
    // term in one task)
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q67: chunking is map-only — no hash exchange") {
    val p = plan("q67_chunking")
    assert(!p.contains("hashpartitioning"), p.take(1200))
  }

  test("q70: gap-fill grid is generated, span broadcast, no nested loop") {
    val p = plan("q70_gap_fill")
    assert(p.contains("Generate"), p.take(1200)) // explode(sequence)
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q74: funnel joins on user equi-key, never nested loop") {
    val p = plan("q74_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("q82: KMV sketch shuffle carries bounded sketches, not hashes") {
    val p = plan("q82_kmv_sketch")
    // partial + final ObjectHashAggregate around the exchange (same
    // shape as q57): the wire carries ≤(4+8k)-byte buffers per (group,
    // map task). The relational tier's rank window must be absent.
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q94: line text never shuffles by line-hash — keys-only decision") {
    val p = plan("q94_line_dedup")
    // an exchange keyed on the line hash `_k` that also carries the
    // `_line` text column is the r5 shape this plan removed (2.3× at
    // 10M docs): the drop decision must shuffle the keys-only
    // projection, text moves only in the by-id reassembly exchange
    assert(!p.contains("Window"), p.take(1200))
    val exchangeBlocks =
      "\\(\\d+\\) Exchange[\\s\\S]*?Arguments: [^\\n]*".r.findAllIn(p).toSeq
    val byLineKey = exchangeBlocks.filter(_.contains("hashpartitioning(_k"))
    assert(byLineKey.nonEmpty, p.take(1200))
    assert(byLineKey.forall(b => !b.contains("_line")),
      byLineKey.mkString("\n\n"))
  }

  test("q101: WARC explode is a streamed Generate in-plan") {
    val p = plan("q101_warc_extract")
    assert(p.contains("Generate"), p.take(1200))
    assert(!p.contains("hashpartitioning"), p.take(1200)) // map-only
  }

  test("q102: global sample is TakeOrderedAndProject, never a full sort") {
    val p = plan("q102_corpus_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q104: BM25 keeps q66's shape — top-k heap, broadcast df, no window") {
    val p = plan("q104_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q106: budget selection never plans a global cumsum window") {
    val p = plan("q106_budget_select")
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q107: robots winner is one aggregate over a broadcast rule join — no rank window, one exchange") {
    val p = plan("q107_robots_filter")
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    // ONE hash exchange (the winner groupBy); the payload rides it —
    // a keys-only agg + join-back would cost a second URL shuffle
    // (formatted mode lists partitioning under Arguments:)
    val exchanges = "hashpartitioning\\(".r.findAllIn(p).length
    assert(exchanges === 1, p.take(1500))
  }

  test("q108: outlink extraction is map-only — a Generate, no exchange") {
    val p = plan("q108_extract_links")
    assert(p.contains("Generate"), p.take(800))
    assert(!p.contains("hashpartitioning("), p.take(1200))
  }

  test("q123: dup-n-gram signals are one native kernel pass — no exchange, no HOF fold") {
    val p = plan("q123_dup_ngrams")
    assert(!p.contains("hashpartitioning("), p.take(1200))
    assert(p.contains("graft_dup_ngrams"), p.take(1200))
    // the retired formulation showed here as aggregate(...) lambdas
    assert(!p.contains("lambdafunction"), p.take(1600))
  }

  test("q125: PII scrub is map-only past the scale-gated fan-out — " +
      "the only hash exchange is Par.fanOut's id-hash repartition") {
    val p = plan("q125_pii_scrub")
    // r15: at bench SF the single-row-group scan feeds one core, so
    // the query fans out by doc_id before the regex passes
    // (Par.fanOut — gated off at production input sizes); the scrub
    // itself stays map-only: no content-keyed exchange may appear
    val hashParts = "hashpartitioning\\(([a-zA-Z0-9_#]+)"
      .r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(hashParts.nonEmpty && hashParts.forall(_.startsWith("doc_id")),
      s"expected only doc_id fan-out exchanges, got $hashParts\n" +
        p.take(1200))
  }

  test("q132/q133: per-group top-k uses WindowGroupLimit (hot group never full-sorts in one task)") {
    for (q <- Seq("q132_vocab_per_lang", "q133_frontier_cap")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q\n" + p.take(1200))
    }
  }

  test("q126: coverage curve windows only the TakeOrdered vocab cut") {
    val p = plan("q126_vocab_coverage")
    // the corpus-sized side ends in a partial->final count, then a
    // TakeOrdered bounds everything the running-sum window sees
    assert(p.contains("TakeOrderedAndProject"), p.take(1600))
    // exactly one hash exchange: the term count; the window input is
    // the limit output, never a corpus-sized exchange
    val exchanges = "hashpartitioning\\(".r.findAllIn(p).length
    assert(exchanges <= 1, s"$exchanges hash exchanges\n" + p.take(1600))
  }
  test("q150: per-group weighted sample uses WindowGroupLimit; q144 is map-only TakeOrdered") {
    val p = plan("q150_wsk_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    val p2 = plan("q144_weighted_sample")
    assert(p2.contains("TakeOrderedAndProject"), p2.take(1200))
    assert(!p2.contains("hashpartitioning("), p2.take(1200))
  }

  test("q143: DSIR models broadcast back onto the token stream (no corpus-sized shuffle join)") {
    val p = plan("q143_dsir_scores")
    // the model side joins via broadcast; the only hash exchanges are
    // the bucket-count aggregates (≤ numBuckets rows) and the final
    // per-doc sum
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("q152: calibration sweep aggregates once — no per-threshold pass over the data") {
    val p = plan("q152_calibration")
    // the data stream is scanned by the score pass only; thresholds
    // join against the bounded bucket table (broadcast, no SMJ)
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("q172: UL2 dispatch is ONE spread corpus scan — no per-arm re-read") {
    val p = plan("q172_ul2_mixture")
    // exactly one parquet scan (the r9 three-arm form read the corpus
    // once per arm); detail headers only — the tree would double-count
    assert("\\n\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1, p.take(1500))
    // the fold pass is spread across cores BEFORE the dispatch
    // projection (round-robin, not a keyed shuffle): without it the
    // single scan concentrates the per-row folds onto the source's
    // input splits — measured 1.4× SLOWER than three arm scans on a
    // one-split parquet (graft.MicroBench ul2)
    assert(p.contains("RoundRobinPartitioning"), p.take(1500))
    assert(!p.contains("Arguments: hashpartitioning"), p.take(1500))
  }

  test("q128: hamming pairs emit once per agreeing chunk — no distinct pass, one join") {
    val p = plan("q128_image_neardup")
    // the emit-once pigeonhole discipline: a pair emits from its FIRST
    // agreeing chunk only, so the plan needs NO aggregate anywhere —
    // the r8 form deduped with a full (id_a, id_b) distinct exchange
    assert(!p.contains("HashAggregate"), p.take(1500))
    assert(!p.contains("ObjectHashAggregate"), p.take(1500))
    // detail headers only — the tree line would double-count
    assert("\\n\\(\\d+\\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(p).size === 1, p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q173: crawl cycle — per-host cap pushes WindowGroupLimit, rules broadcast, no SMJ") {
    val p = plan("q173_crawl_cycle")
    // stage shapes: the politeness cap must not full-sort a host's
    // pages in one task; every rule/bodies join stays broadcast at
    // registry scale; the bounded-depth sitemap recursion must never
    // degrade to a cartesian or a sort-merge over URL strings
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q181: anneal plan never plans a global cumsum window") {
    val p = plan("q181_anneal_plan")
    // the anneal boundary comes from the two-phase prefix sum — a
    // Window.orderBy cumsum would serialize the corpus in one task
    assert(!p.contains("(1) Window"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window\\n".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q182: recrawl schedule is ONE exchange — no window, no per-URL rank") {
    val p = plan("q182_recrawl_schedule")
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
    // the groupBy fold is the only hash exchange; the final ORDER BY
    // is a range exchange
    assert("Arguments: hashpartitioning".r.findAllIn(p).size === 1,
      p.take(1500))
  }

  test("q183: ANN index probe — keys-only candidate join, broadcast queries, top-k as WindowGroupLimit") {
    val p = plan("q183_ann_index")
    // the candidate join against the sigs table and both vector
    // re-attach joins broadcast the (small) query side; the corpus
    // side must never sort-merge, and per-query top-k must push down
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the bucketed index tables scan as catalog parquet
    assert(p.contains("_ann_v1_sigs"), p.take(2000))
    assert(p.contains("_ann_v1_vecs"), p.take(2000))
  }

  test("q184: HLL — one hash exchange (the register fold), no window") {
    val p = plan("q184_hll_distinct")
    // the sketch aggregate is a TypedImperativeAggregate → object agg;
    // the corpus is NEVER grouped per distinct value
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
    assert("Arguments: hashpartitioning".r.findAllIn(p).size === 1,
      p.take(1500))
  }

  test("q185: CMS — corpus never grouped by key, sketch broadcast to probes") {
    val p = plan("q185_cms_freq")
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q186: PQ encode — map-only corpus pass, NO join at all (native kernel)") {
    val p = plan("q186_pq_encode")
    // the codebook rides INSIDE graft_pq_encode — not even a
    // broadcast join remains (the pre-native pin asserted a BNLJ)
    assert(!p.contains("Join"), p.take(1500))
    assert(p.contains("graft_pq_encode"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q187/q188/q189: compressed search + mining — broadcast small sides, partial top-k") {
    for (q <- Seq("q188_hard_negatives", "q189_two_stage")) {
      val p = plan(q)
      // per-query top-k must push down before the rank shuffle
      assert(p.contains("WindowGroupLimit"), s"$q: ${p.take(1500)}")
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
    }
    // q187's ADC scan is ONE bounded-state aggregate (nq·k heap pairs)
    // — the corpus×queries crossJoin + rank window is GONE
    val p187 = plan("q187_pq_adc_topk")
    assert(p187.contains("ObjectHashAggregate") ||
      p187.contains("SortAggregate"), p187.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p187).hasNext,
      p187.take(1500))
    assert(!p187.contains("CartesianProduct") &&
      !p187.contains("SortMergeJoin"), p187.take(1500))
  }

  test("q191/q192: LM statistics — hash-agg counts, TakeOrdered output, no shuffle joins") {
    for (q <- Seq("q191_kneser_ney", "q192_pmi")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(1500)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext,
        s"$q: ${p.take(1500)}")
    }
    // the bounded top-k is a TakeOrdered, never a global sort
    assert(plan("q192_pmi").contains("TakeOrderedAndProject"))
  }

  test("q193: shard sketches — two object aggregates, no window, no shuffle join") {
    val p = plan("q193_hll_shards")
    assert("ObjectHashAggregate".r.findAllIn(p).nonEmpty, p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q194: triplets — anchors broadcast, one max_by aggregate, no rank window") {
    val p = plan("q194_triplets")
    // the ≤8-anchor side rides a broadcast NLJ; never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // both arms resolve in ONE per-anchor aggregate — no per-corpus
    // rank window ever materializes
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q197: fuzzy link — probes broadcast onto blocks, min_by not a rank window") {
    val p = plan("q197_fuzzy_link")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
  }

  test("q198: z-order — map-only key arithmetic, no join, no window") {
    val p = plan("q198_zorder_layout")
    assert(!p.contains("Join"), p.take(1500))
    assert(!"\\n\\(\\d+\\) Window".r.findAllIn(p).hasNext, p.take(1500))
    // one scan feeding one partial/final aggregate pair
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size === 1, p.take(1500))
  }

  test("q196/q204/q205: kappa joins broadcast; asof has no join node; sketch algebra bounded") {
    val p196 = plan("q196_annotator_kappa")
    assert(p196.contains("BroadcastHashJoin") &&
      !p196.contains("SortMergeJoin"), p196.take(1500))
    // the as-of composition carries the right row forward in a per-key
    // window — no join operator at all, one hash exchange family
    val p204 = plan("q204_attribution")
    assert(!p204.contains("Join"), p204.take(1500))
    val p205 = plan("q205_hll_intersect")
    assert(!p205.contains("SortMergeJoin") &&
      !p205.contains("CartesianProduct"), p205.take(1500))
  }

  test("q200/q201: SCD2 windows partition by key; diff joins SMJ full-outer") {
    val p200 = plan("q200_scd2_history")
    // per-KEY windows are the contract — no empty-partition global sort
    assert(p200.contains("Window"), p200.take(1500))
    assert(p200.contains("partitionBy") ||
      p200.contains("PartitionSpec") ||
      "windowspecdefinition\\(user_id".r.findAllIn(p200.toLowerCase)
        .nonEmpty, p200.take(2000))
    val p201 = plan("q201_table_diff")
    // FULL OUTER of same-sized snapshots: SMJ is the scale-right shape
    assert(p201.contains("SortMergeJoin FullOuter") ||
      (p201.contains("SortMergeJoin") && p201.contains("FullOuter")),
      p201.take(1500))
    assert(!p201.contains("CartesianProduct"), p201.take(1500))
  }

  private def scanCount(p: String): Int =
    "\\(\\d+\\) Scan parquet".r.findAllIn(p).length

  test("q214: IVF-ADC — ONE corpus pass, both prunings in-aggregate, no window, no candidate join") {
    val p = plan("q214_ivf_adc_topk")
    // the whole search is the bounded-state PqAdcCellTopKAgg over a
    // single corpus scan (quantizers and query LUTs/probes are
    // bounded plan-BUILD collects); the only join is the ≤nq-row
    // q_idx broadcast back to query ids — never a cell-key join
    // expanding corpus rows by matching probes, never a rank window
    assert(p.contains("graft_pq_adc_cell_topk"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(scanCount(p) == 1, s"expected 1 parquet scan, got " +
      s"${scanCount(p)}\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin"), p.take(1500))
  }

  test("topKIvfAdc production arm: same single-pass plan discipline") {
    // not a SparkEntry query (Lloyd arms are rows-only-checkable, the
    // q44 caveat) — build the plan directly on the same table
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.llm.Similarity.topKIvfAdc(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      emb, "vec_id", "vec_id", "embedding", dim = 64, nsub = 8,
      ncent = 16, nlist = 8, nprobe = 3, k = 5, production = true)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_pq_adc_cell_topk"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(scanCount(p) == 1, s"expected 1 parquet scan, got " +
      s"${scanCount(p)}\n${p.take(1500)}")
    // the production corpus assignment is the NATIVE one-read kernel —
    // the interpreted oracle-replay fold must not appear in this plan
    assert(p.contains("graft_cell_assign"), p.take(1500))
    assert(!p.contains("aggregate(sequence"), p.take(1500))
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q216/q217: semantic dedup joins only inside cells (no cartesian, no window); DPO pairs is ONE aggregate") {
    val p216 = plan("q216_semantic_dedup")
    // centroids collect at plan BUILD (bounded); the returned plan is
    // the map-only assignment + the cell-key equi self-join — never a
    // cartesian, and the keep rule is an anti-style left join, not a
    // rank window
    assert(!p216.contains("CartesianProduct") &&
      !p216.contains("BroadcastNestedLoopJoin") &&
      !p216.contains("Window"), p216.take(1500))
    val p217 = plan("q217_dpo_pairs")
    // both picks are min_by inside ONE hash aggregate — no join, no
    // window, one scan
    assert(!p217.contains("Join") && !p217.contains("Window"),
      p217.take(1500))
    assert(scanCount(p217) == 1, s"expected 1 parquet scan, got " +
      s"${scanCount(p217)}\n${p217.take(1500)}")
  }

  test("q218: MMR rerank is ONE grouped aggregate — no window, no self-join, guard broadcast") {
    val p = plan("q218_mmr_rerank")
    assert(p.contains("graft_mmr_topk"), p.take(1500))
    assert(!p.contains("Window") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p.take(1500))
    // the only join is the broadcast per-query count guard
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q213: byte-BPE serve is map-only — merge training happens at plan build, the returned plan has no join/window") {
    val p = plan("q213_byte_bpe_encode")
    // the 6 merge rounds are driver-looped incremental aggregates at
    // plan-BUILD time (cost ∝ distinct words, the q121 discipline);
    // the plan the caller executes is one scan through the native
    // byte-mode encode expression + the output ordering
    assert(!p.contains("Join") && !p.contains("Window"), p.take(1500))
    assert(scanCount(p) == 1, s"expected 1 parquet scan, got " +
      s"${scanCount(p)}\n${p.take(1500)}")
    // the merge table rides inside the native expression as hex-byte
    // symbol pairs (byte mode flag true)
    assert(p.contains("graft_bpe_encode"), p.take(1500))
  }

  test("q219: salted join — salt in the join keys, salt never in the output") {
    val p = plan("q219_salted_join")
    // the join must key on (k, _salt) — that spread IS the operator;
    // the salt column is internal and dropped before the aggregate
    assert(p.contains("_salt"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    val out = graft.SparkEntry.queries("q219_salted_join")(spark, sf)
    assert(out.columns.toSeq === Seq("k", "tier", "n_rows", "sum_qty"))
  }

  test("q220: bloom prejoin — codegen'd probe filters the fact scan before the join") {
    val p = plan("q220_bloom_prejoin")
    assert(p.contains("graft_bloom_contains_long"), p.take(2000))
    // the probe must sit BELOW the join (a prefilter, not a
    // post-join residual): in the formatted plan the Filter node
    // carrying the probe appears in the fact scan's stage, so the
    // text order is probe-before-join
    val probeAt = p.indexOf("graft_bloom_contains_long")
    val joinAt = math.max(p.indexOf("HashJoin"), p.indexOf("SortMergeJoin"))
    assert(probeAt >= 0 && joinAt >= 0, p.take(2000))
  }

  test("q221: triangles — hash joins only, no cartesian, no window, no driver loop") {
    val p = plan("q221_triangles")
    // the only nested-loop joins allowed are the query's own 1-row
    // corpus-count broadcasts that parameterize the planted edge
    // families (the q109 pattern) — the OPERATOR itself (wedge +
    // closing joins) must stay equi-joins
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    import org.apache.spark.sql.functions.col
    val op = graft.llm.Crawl.triangleCounts(
      spark.range(100).select(col("id").as("src"),
        ((col("id") * 3 + 1) % 100).as("dst")))
    val opPlan = op.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!opPlan.contains("CartesianProduct") &&
      !opPlan.contains("BroadcastNestedLoopJoin") &&
      !opPlan.contains("Window"), opPlan.take(2000))
  }

  test("q223: SFT spans — offsets fold inside ONE aggregate, no window, no join back") {
    val p = plan("q223_sft_spans")
    // the naive formulation is a cumulative-sum window over turns
    // plus a join back to the rendered string — this one is the
    // renderer's single hash aggregate + an in-aggregate HOF fold
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(p.contains("Generate"), p.take(1500)) // posexplode of spans
  }

  test("q224: GRPO advantages — stats aggregate joined back, no window") {
    val p = plan("q224_grpo_advantage")
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q225: anchor texts — map-only extraction, two hash aggregates, min_by not a window") {
    val p = plan("q225_anchor_text")
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(scanCount(p) == 1, p.take(1500))
  }

  test("q222: RRF fusion — both rankers TakeOrdered-bounded, fusion is one hash aggregate") {
    val p = plan("q222_rrf_fusion")
    // the final top-k cut is a TakeOrderedAndProject, never a global
    // sort over the corpus; the only Window is the lex ranker's
    // parameter-bounded (≤ 50 rows) rank assignment
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q227: boilerplate LCP — ONE aggregate over the corpus, no join, no window") {
    val p = plan("q227_boilerplate_lcp")
    // the sorted-extremes identity means NO pairwise compare ever
    // appears: one (min, max, count) aggregate, then map-only LCP
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(scanCount(p) == 1, p.take(1500))
  }

  test("q228: snake shards — range-partitioned rank, never an unpartitioned window") {
    val p = plan("q228_snake_shards")
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
  }

  test("q231: release chain — CC on the pair list only, no cartesian, " +
      "the one window per (shard, pack) bounded by the token budget") {
    val p = plan("q231_release_chain")
    // the quadratic stays inside the shingle-blocked pair derivation —
    // never a cartesian over the corpus
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // snake sharding rides globalRank's range-parallel rank (RDD
    // zipWithIndex — no Window at all), so the ONLY windows left are
    // packProvenance's, partitioned by (shard, pack_id) — bounded by
    // a pack's doc count, never corpus-sized: every
    // windowspecdefinition must carry the shard partition column
    val winSpecs = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winSpecs.nonEmpty, "expected packProvenance's window")
    assert(winSpecs.forall(_.contains("shard#")),
      winSpecs.mkString("\n").take(1500))
  }

  test("q135: exact-substring dedup rebuilds in place — no token-level " +
      "re-explode, drop sets join back keys-only") {
    val p = plan("q135_exact_substr")
    // the window derivation explodes an INT start sequence; tokens
    // themselves are never posexploded and re-aggregated (the r14
    // rewrite: the per-doc drop-position set joins back to the
    // original row, surviving tokens rebuild from the row's own
    // split — document text crosses the wire once, in that join)
    assert(!p.contains("posexplode"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("collect_set") || p.contains("ObjectHashAggregate"),
      p.take(1500))
  }

  test("q233: paragraph text never shuffles by paragraph-hash — " +
      "keys-only winner election (the q94 discipline)") {
    val p = plan("q233_paragraph_dedup")
    // the winner election and the per-doc kept-index list are
    // keys-only ((_ph, id, idx) then (id, idx-array)); full document
    // text crosses the wire exactly once, in the by-id join back to
    // the original rows — an exchange keyed on the paragraph hash
    // `_ph` that also carries paragraph/document text is the r13
    // two-text-shuffle shape this plan removed
    assert(!p.contains("Window"), p.take(1500))
    val exchangeBlocks =
      "\\(\\d+\\) Exchange[\\s\\S]*?Arguments: [^\\n]*".r.findAllIn(p).toSeq
    val byParaHash = exchangeBlocks.filter(_.contains("hashpartitioning(_ph"))
    assert(byParaHash.nonEmpty, p.take(1500))
    assert(byParaHash.forall(b =>
      !b.contains("_para") && !b.contains("text2")),
      byParaHash.mkString("\n\n"))
  }

  test("q238: scrub chain keeps the q233 keys-only discipline — " +
      "redaction map-only, no text on paragraph-hash exchanges") {
    val p = plan("q238_scrub_chain")
    // piiRedact contributes zero joins/windows (map-only regexes);
    // the paragraph pass inherits q233's shape on the REDACTED text
    val exchangeBlocks =
      "\\(\\d+\\) Exchange[\\s\\S]*?Arguments: [^\\n]*".r.findAllIn(p).toSeq
    val byParaHash = exchangeBlocks.filter(_.contains("hashpartitioning(_ph"))
    assert(byParaHash.nonEmpty, p.take(1500))
    assert(byParaHash.forall(b =>
      !b.contains("_para") && !b.contains("redacted") &&
        !b.contains("text2")),
      byParaHash.mkString("\n\n"))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q236: best-of-n is bounded aggregates — no window, no cartesian") {
    val p = plan("q236_best_of_n")
    // the top pick and the runner-up are min_by/max hash aggregates
    // (state per prompt = one struct), never a per-prompt rank window
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("min_by") || p.contains("HashAggregate"), p.take(1500))
  }
}
