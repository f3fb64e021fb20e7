package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operator pack ([EXT] — SURVEY.md §2.7): exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-duplicate detection,
  * designed shuffle-first for 100 TB corpora:
  *
  *  - exact dedup = hash-partitioned aggregate on a content hash (one
  *    shuffle of (hash, id), never of full text);
  *  - MinHash/LSH = per-row signature (map-only, codegen'd) → explode
  *    `bands` rows/doc → self-join on (band, bandHash) so only
  *    same-bucket docs ever meet — the classic way to avoid the O(n²)
  *    pair explosion;
  *  - SimHash = 64-bit per-row signature; candidate blocking on 16-bit
  *    chunks (hamming ≤ 3 ⟹ some chunk equal, pigeonhole);
  *  - verification joins carry doc ids + shingle sets only, not texts.
  */
object Dedup {

  /** Exact duplicate removal on explicit key columns. */
  def exactDedup(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact content dedup: group by SHA-256 of the text, keep the lowest
    * id per group. Returns (content_hash, keep_id, n_dupes) — join back
    * on keep_id to materialize survivors. Partial aggregation makes the
    * shuffle carry one row per distinct hash per map partition. */
  def exactDedupByContent(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Distinct word `n`-gram shingles of a text column.
    *
    * The single-element `aggregate` is a let-binding: it evaluates the
    * token split ONCE and exposes it as the lambda-bound `w`. A naive
    * `transform(starts, i => slice(w, i, n))` would re-evaluate the
    * captured split expression at every window position (interpreted
    * lambdas re-evaluate captured subtrees) — O(len²) tokenization. */
  def shingles(c: Column, n: Int = 3): Column =
    aggregate(array(TextAnalysis.tokens(c)),
      array().cast(ArrayType(StringType)),
      (_, w) => array_distinct(
        transform(sequence(lit(1), greatest(size(w) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(w, i, lit(n))))))

  /** Distinct shingles hashed to 64-bit — set operations on longs are
    * several times cheaper than on strings, and Jaccard over the hashed
    * sets equals Jaccard over the string sets absent 64-bit collisions
    * (P ≈ n²/2⁶⁴ per pair — negligible). Preferred at scale. */
  def shingleHashes(c: Column, n: Int = 3): Column =
    transform(shingles(c, n), s => xxhash64(s))

  /** Exact Jaccard similarity of two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }

  /** MinHash signature, fast path: each shingle is xxhash64'd ONCE,
    * then `numHashes` permutations are derived by integer mixing
    * (xor-multiply with per-permutation constants) — the standard
    * one-pass minwise scheme without re-hashing strings per
    * permutation. Array<long> of length `numHashes`. */
  def minHashSignature(c: Column, numHashes: Int = 32, shingleN: Int = 3): Column = {
    // Loop inversion matters: a naive transform(perms, j =>
    // array_min(transform(hs, ...))) re-evaluates the captured shingle
    // pipeline once PER PERMUTATION (interpreted lambdas re-evaluate
    // captured subtrees), turning O(shingles × perms) hashing into
    // O(shingles × perms) full re-shingling. Aggregating over hs with an
    // array-of-minima accumulator evaluates the shingle pipeline exactly
    // once. XOR + re-hash mixing (no multiply: ANSI mode forbids
    // wrap-around overflow); hashing a fixed 8-byte long is cheap.
    val hs = transform(shingles(c, shingleN), s => xxhash64(s))
    aggregate(hs,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, j) => least(m, xxhash64(h.bitwiseXOR(j * lit(2654435761L))))))
  }

  /** MinHash signature, portable path: SHA-256(shingle ++ "|" ++ perm)
    * lexicographic minima — engine-independent (DuckDB-oracle-able).
    * Computed by the native `graft_minhash_sha` expression (one
    * imperative pass; bit-parity spec-locked against
    * [[minHashSignatureShaSql]]). Array<string>. */
  def minHashSignatureSha(c: Column, numHashes: Int = 8, shingleN: Int = 3): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.column(graft.expressions.MinHashShaSig(b.expression(c), numHashes, shingleN))
  }

  /** The SQL-expression formulation of [[minHashSignatureSha]] — the
    * executable spec the native expression is parity-tested against
    * (and the shape the DuckDB oracle mirrors). Interpreted lambdas:
    * use the native form in data paths. */
  def minHashSignatureShaSql(c: Column, numHashes: Int = 8, shingleN: Int = 3): Column =
    // same loop inversion as the fast path: one pass over the shingles
    aggregate(shingles(c, shingleN),
      array_repeat(lit("~"), numHashes), // '~' > any hex digit
      (acc, s) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (m, j) => least(m, sha2(concat(s, lit("|"), j.cast(StringType)), 256))))

  /** Exact Jaccard-similar pairs via an inverted shingle index: explode
    * (doc, shingle) rows, self-join on the shingle (plus optional
    * blocking columns), count shared shingles per pair, derive Jaccard
    * from the counts. Only pairs that share ≥1 shingle are ever
    * materialized, so cost is Σ_g C(df_g, 2) (document frequency per
    * shingle) instead of the all-pairs O(n²·|set|) of pairwise
    * intersection — the standard set-similarity join shape. Output:
    * (doc_a, doc_b, jaccard) for jaccard ≥ threshold, doc_a < doc_b. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String] = Seq.empty, shingleN: Int = 3,
      threshold: Double = 0.5, dfCap: Long = 10000L): DataFrame = {
    graft.expressions.NativeFunctions.register(df.sparkSession)
    // r15 small-input tier: when the projected input is too small to
    // feed every core from its file splits (one row group at bench SF
    // — Par.isSmall), fan it out by id AND materialize the hashed
    // shingle arrays ONCE (localCheckpoint), so the four consumers
    // below read cached arrays instead of each re-running the
    // single-task scan+shingle+hash. Past the gate — the 100 TB path —
    // the plan is byte-identical to before: recompute-per-consumer,
    // no corpus-sized cache, no added exchange.
    val projIn = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+ col(textCol): _*)
    val small = graft.ops.Par.isSmall(projIn)
    val fanned =
      if (small) projIn.repartition(
        df.sparkSession.sparkContext.defaultParallelism, col("id"))
      else projIn
    val base0 = fanned.select(
      (col("id") +: blockCols.map(col)) :+
        expr(s"graft_shingle_hashes(`$textCol`, $shingleN)").as("sh"): _*)
    val base = if (small) base0.localCheckpoint() else base0
    // The exploded set is consumed by four subtrees (df counts, both
    // self-join sides, hot-set collection), each recomputing the
    // scan+hash — deliberately: a shared explicit exchange was measured
    // (round 3) and did NOT help — ReuseExchange cannot fire because the
    // consumers sit under different parents (one inside a
    // BroadcastExchange), so the extra full-set shuffle just added IO.
    // Recompute-per-consumer is map-parallel and cheap relative to the
    // joins it feeds. (At bench SF the small-input tier above replaces
    // the recompute with one cached pass.)
    val ex = base.select(
      (col("id") +: blockCols.map(col)) ++
        Seq(size(col("sh")).as("sz"), explode(col("sh")).as("g")): _*)
    // Hot-shingle guard: the inverted-index join costs Σ_g C(df_g, 2), so
    // ONE boilerplate shingle with df=1M yields 5·10¹¹ join rows — the
    // scale-killer at 100 TB. Shingles with document frequency > dfCap
    // are excluded from CANDIDATE GENERATION only; their contribution to
    // the intersection is added back exactly via tiny per-doc hot-shingle
    // sets, so every emitted pair carries its EXACT Jaccard. The sole
    // semantic delta: a pair whose shared shingles are ALL hot (pure
    // boilerplate overlap — not a near-dup signal) is not emitted.
    val hot = ex.groupBy("g").agg(count(lit(1)).as("df_g"))
      .filter(col("df_g") > dfCap).select("g")
    val rare = ex.join(broadcast(hot), Seq("g"), "left_anti")
    // per-doc sets of hot shingles (empty at test scale; ≤ distinct-hot
    // long values per doc at 100 TB — KBs, never the full shingle set)
    val docHot = ex.join(broadcast(hot), Seq("g"))
      .groupBy("id").agg(collect_set(col("g")).as("hot_set"))
    val l = rare.as("l")
    val r = rare.as("r")
    val joinCond = (col("l.g") === col("r.g")) +:
      blockCols.map(c => col(s"l.$c") === col(s"r.$c")) :+
      (col("l.id") < col("r.id"))
    val interRare = l.join(r, joinCond.reduce(_ && _))
      .groupBy(col("l.id").as("doc_a"), col("r.id").as("doc_b"),
        col("l.sz").as("sz_a"), col("r.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter_rare"))
    val emptyHot = array().cast(ArrayType(LongType))
    interRare
      .join(docHot.select(col("id").as("doc_a"), col("hot_set").as("hot_a")),
        Seq("doc_a"), "left")
      .join(docHot.select(col("id").as("doc_b"), col("hot_set").as("hot_b")),
        Seq("doc_b"), "left")
      .withColumn("inter", col("inter_rare") +
        size(array_intersect(coalesce(col("hot_a"), emptyHot),
          coalesce(col("hot_b"), emptyHot))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-document duplicate-shingle statistics (C4-style corpus
    * repetition audit): for each document, how many of its distinct
    * `n`-gram shingles also occur in at least one OTHER document, and
    * what fraction of the document that is. High `shared_frac` flags
    * boilerplate-heavy documents before pair-level dedup runs.
    *
    * Cost is linear in total shingle count — the inverted index is only
    * COUNTED per shingle (Σ df), never self-joined (no Σ df² pair
    * blow-up), so no df-cap is needed: this is the cheap audit you run
    * to CHOOSE the df-cap for [[jaccardPairs]] at 100 TB.
    *
    * Hot-key posture: the audit exists FOR corpora with df=10⁶⁺
    * boilerplate shingles, so the plan must not buffer a shingle's
    * whole occurrence group in one task (a `count().over(partitionBy
    * (g))` window would — each hot shingle becomes a giant spilling
    * partition). Instead it never materializes df next to occurrences
    * at all: shingles() emits DISTINCT shingles per doc, so a df=1
    * shingle belongs to exactly ONE doc, and
    *   n_shared(doc) = n_shingles(doc) − #{its shingles with df = 1}.
    * Both sides are hash aggregates with bounded per-key state
    * (count + min carry through map-side partials; a df=10⁶ shingle
    * contributes one (count, min) cell, not 10⁶ buffered rows), joined
    * doc-keyed (one row per doc, no skew). Verified against a planted
    * hot shingle in ScaleSmoke. Shingle strings stay strings here for
    * oracle portability; the counts are identical under hashing. */
  def dupShingleStats(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val ex = df.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), shingleN)).as("g"))
    // Per-shingle: df and (for df=1 groups) the one owning doc. min()
    // over a singleton group IS that doc; for df>1 the min is unused.
    val uniqueOwner = ex.groupBy("g")
      .agg(count(lit(1)).as("df_g"), min(col("doc_id")).as("only_doc"))
      .filter(col("df_g") === 1)
      .groupBy(col("only_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    ex.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
      .join(uniqueOwner, Seq("doc_id"), "left")
      .withColumn("n_shared",
        col("n_shingles") - coalesce(col("n_unique"), lit(0L)))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast(DoubleType) / col("n_shingles"))
          .as("shared_frac"))
  }

  /** Normalization-exact dedup, keep-best: documents whose text is
    * identical after whitespace/case normalization collapse to one
    * representative — the highest-`qualityCol` row (ties broken by
    * smallest id, so the choice is total and deterministic). This is
    * the standard first dedup pass of a training-data pipeline (cheap,
    * exact, removes the bulk) run before MinHash/SimHash near-dup.
    *
    * BOUNDED STATE, not a window: the corpora this pass exists for
    * contain boilerplate pages duplicated 10⁶-10⁸×, and a
    * `row_number().over(partitionBy(content_hash))` would land such a
    * document's ENTIRE group — full rows, text payload included — in
    * one task (the q59/q66 scale-killer shape). Instead one
    * `min_by` + `count` aggregate per content key: partial aggregation
    * combines map-side, so the shuffle carries ONE winner candidate
    * and one count per map partition per key, never the group. The
    * ordering key ([[bestFirstOrd]]) under min is exactly the
    * window's `ORDER BY quality DESC, id ASC` (null quality last, as
    * `desc` defaults to nulls-last; NaN first, as DESC ranks NaN
    * greatest) and is total because ids are unique, so the pick is
    * deterministic. `qualityCol` must be numeric; every quality score
    * in this library is. */
  /** Ascending ordering key reproducing `ORDER BY q DESC NULLS LAST,
    * id ASC` under min/min_by EXACTLY — including the two edges where
    * plain negation diverges from the window:
    *  - NaN: DESC ranks NaN first (sorts greatest), but −NaN is still
    *    NaN and would rank LAST under min — so NaN gets its own level;
    *  - integral MinValue: `q * -1` overflows back to MinValue, making
    *    the worst row win — the negation here happens after a double
    *    cast, which cannot overflow.
    * Key: (q IS NULL, isnan(q) ? 0 : 1, isnan(q) ? 0 : −q, id).
    * Qualities needing > 53 bits of integer precision would tie on the
    * double cast (none in this library come close). */
  private[llm] def bestFirstOrd(q: Column, id: Column): Column = {
    val d = q.cast(DoubleType)
    struct(q.isNull,
      when(isnan(d), lit(0)).otherwise(lit(1)),
      when(isnan(d), lit(0d)).otherwise(-d),
      id)
  }

  def normalizedKeepBest(df: DataFrame, idCol: String, textCol: String,
      qualityCol: Column): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    val withKey = df.withColumn("content_hash", sha2(norm, 256))
    val ord = bestFirstOrd(qualityCol, col(idCol))
    withKey
      .groupBy(col("content_hash").as("_ch"))
      .agg(min_by(struct(withKey.columns.map(col): _*), ord).as("_best"),
        count(lit(1)).as("n_dupes"))
      .select(col("_best.*"), col("n_dupes"))
  }

  /** Connected components over a near-duplicate PAIR list — the step
    * every dedup pipeline needs between candidate pairs and "keep one
    * per group": transitively-connected docs form one cluster labeled
    * by its minimum id. Output: (doc_id, cluster_id) for every id
    * appearing in `pairs`.
    *
    * Min-label propagation with path-halving: every node starts
    * labeled with itself; each round pushes labels across edges, keeps
    * the per-node min, then shortcuts label → label-of-label (the
    * pointer-jumping step), so convergence needs O(log diameter)
    * rounds, not O(diameter) — the property that matters when a
    * pathological near-dup CHAIN (each doc similar only to its
    * neighbors) makes the diameter linear in cluster size. Convergence
    * = no label changed this round, carried IN-PLAN as a `_changed`
    * flag (each round's aggregate keeps the previous label next to
    * the new one — no separate join against the prior round's table,
    * which cost one extra shuffle per round), probed on the
    * materialized checkpoint with `filter(_changed).limit(1)` — a
    * shuffle-free early-exit scan, type-agnostic (a numeric-sum trick
    * would break on string ids). `checkEvery` batches the probe to
    * every k-th round: each skipped probe saves one scheduler
    * round-trip at the price of up to k−1 extra (converged) label
    * rounds — leave it at 1 unless rounds are measurably cheaper than
    * job latency. The loop raises if the graph hasn't converged by
    * `maxIter` rather than returning wrong labels.
    * Each round is one shuffle of (edge, label), materialized by a
    * `localCheckpoint` BEFORE the convergence probe: each round's
    * labels feed two consumers (the probe and the next join), so an
    * unmaterialized round would be recomputed twice — compounding to
    * 2^k chains between sparser checkpoints (measured: 16 s instead of
    * ~2 s at bench scale with checkpoints every 5 rounds).
    *
    * Adaptive execution tier: the edge list is the OUTPUT of pair
    * generation — orders of magnitude smaller than the corpus — so
    * when it fits comfortably on the driver (≤ `localEdgeThreshold`
    * edges, checked against the materialized count), labels come from
    * an exact in-process union-find: microseconds instead of one
    * Spark job per round. Same min-label semantics, same output. Past
    * the threshold the distributed loop runs — the 100 TB path. This
    * is the broadcast-join trade: bounded driver work where the data
    * provably fits, distributed where it doesn't. */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
      bCol: String = "doc_b", maxIter: Int = 20,
      checkpointEvery: Int = 1,
      localEdgeThreshold: Long = 2000000L,
      checkEvery: Int = 1): DataFrame = {
    require(checkEvery >= 1, "checkEvery must be >= 1")
    // Materialize the PAIR list ONCE, before any tiering: the
    // iteration below runs an action per round, and without this every
    // action would re-execute the whole upstream pair-generation plan —
    // at bench scale that turned a 1-second clustering into 100 s.
    // Materializing raw pairs (not the bidirected-distinct edge list)
    // matters twice over: union-ing the reversed copy UNDER the
    // checkpoint re-executed the pair-generation plan per branch (the
    // two union arms share no exchange Catalyst can reuse), and the
    // local tier's union-find is direction- and duplicate-oblivious,
    // so it collects raw pairs directly — half the rows, and the
    // count/distinct exchange never runs at all on the local path.
    val rawPairs = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint()
    if (rawPairs.count() <= localEdgeThreshold)
      return componentsLocal(rawPairs)
    val edges = rawPairs
      .union(rawPairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .withColumn("_changed", lit(true))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"),
          lit(null).cast(labels.schema("label").dataType).as("_own"))
      // the node's own row carries its previous label in `_own`; the
      // aggregate keeps it beside the new min — convergence is then a
      // column compare inside THIS round's plan, not a join against
      // the previous round's table (one shuffle per round saved)
      val propagated = labels
        .select(col("id"), col("label"), col("label").as("_own"))
        .union(msgs)
        .groupBy("id").agg(min(col("label")).as("label"),
          min(col("_own")).as("_prev"))
      // path-halving: follow one more hop through the label table —
      // label(id) := min(label(id), label(label(id))). The label table
      // is only the docs appearing in pairs, so this self-join is cheap
      // relative to the halved round count it buys. The hop side is
      // renamed via a projection: alias-only self-joins of the same
      // plan hit ambiguous-attribute resolution.
      val hop = propagated.select(col("id").as("_hop_id"),
        col("label").as("_hop_label"))
      labels = propagated
        .join(hop, col("label") === col("_hop_id"), "left")
        .select(col("id"),
          least(col("label"),
            coalesce(col("_hop_label"), col("label"))).as("label"),
          (least(col("label"),
            coalesce(col("_hop_label"), col("label"))) =!= col("_prev"))
            .as("_changed"))
      if ((iter + 1) % checkpointEvery == 0)
        labels = labels.localCheckpoint() // before the probe: see Scaladoc
      if ((iter + 1) % checkEvery == 0 || iter + 1 == maxIter)
        converged = labels.filter(col("_changed")).limit(1).isEmpty
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter rounds — " +
          "graph diameter exceeds maxIter; raise it explicitly")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Exact union-find on a driver-collected edge list (the small-graph
    * tier of [[connectedComponents]]). Union by min root preserves the
    * min-label semantics exactly. TYPE-PRESERVING: ids stay whatever
    * type the pair columns carry (long, int, string, ...), compared in
    * the SAME order the distributed tier's `min(label)` uses — for
    * strings that is UTF-8 BYTE order (Spark's UTF8String.compareTo),
    * NOT Java String's UTF-16 code-unit order: the two disagree for
    * supplementary-plane characters (a surrogate-pair code unit sorts
    * below U+E000..U+FFFF in UTF-16 but above in UTF-8), and a
    * tier-dependent cluster label would be a correctness bug. */
  private def componentsLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("src").dataType
    val es = edges.collect().map(r => (r.get(0), r.get(1)))
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    val parent = scala.collection.mutable.Map[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by MIN root = min-label semantics
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows = parent.keys.toSeq.map(id => org.apache.spark.sql.Row(id, find(id)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", idType),
        org.apache.spark.sql.types.StructField("cluster_id", idType))))
  }

  /** Candidate near-duplicate pairs via MinHash + LSH banding.
    * Signature length = bands × rowsPerBand. Output: (id_a, id_b,
    * est_jaccard) with id_a < id_b, est_jaccard = signature agreement
    * fraction. The only shuffle is the band-bucket self-join; bucket
    * keys are 64-bit hashes, so skew only arises from genuinely
    * identical content (AQE skew-join handles the rest). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rowsPerBand: Int = 4, shingleN: Int = 3): DataFrame = {
    val numHashes = bands * rowsPerBand
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    // Native Catalyst expression for the signature (bit-identical to
    // minHashSignature, one imperative loop per row instead of
    // interpreted lambdas) — tier (b) of the custom-op preference order.
    graft.expressions.NativeFunctions.register(df.sparkSession)
    // Two deliberate exchanges around the signature projection:
    //  - BEFORE: a small parquet file is one input split, so the
    //    CPU-bound signature pass would otherwise run on a single task;
    //    spreading (id, text) first makes it embarrassingly parallel —
    //    the shape that holds at 100 TB where compute dwarfs shuffle.
    //  - AFTER: a collapse guard. Interpreted higher-order lambdas
    //    re-evaluate captured subtrees per invocation, so if
    //    CollapseProject merges the band projection into this one, the
    //    full signature is recomputed once per band per row. Shuffling
    //    (id, sig) — numHashes longs per doc — is orders of magnitude
    //    cheaper.
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .repartition(p)
      .select(col("id"),
        expr(s"graft_minhash64(t, $numHashes, $shingleN)").as("sig"))
      .repartition(p)
    // One row per (doc, band); band bucket = native graft_band_fold
    // (bit-identical to the SQL xxhash64 fold chain, one imperative
    // pass per row). The candidate self-join then carries
    // (id, band, bh) ONLY — 24 bytes a row: with signatures attached,
    // every banded replica drags a numHashes-long array through the
    // exchange (measured 4 GB and 4× the wall time at 1M docs).
    // Signatures re-attach afterwards for the (distinct, far smaller)
    // candidate set — the same fetch-back shape the verify tier uses.
    // The join strategy stays with the planner: AQE broadcasts the
    // banded frame at small scale, shuffled hash join beyond.
    val banded = sigs.select(col("id"),
      posexplode(expr(s"graft_band_fold(sig, $bands, $rowsPerBand)"))
        .as(Seq("band", "bh")))
    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      // native agreement: one imperative pass per candidate pair (the
      // interpreted zip_with chain was itself a 60µs-per-pair cost)
      .select(col("id_a"), col("id_b"),
        expr("graft_sig_agreement(sig_a, sig_b)").as("est_jaccard"))
  }

  /** Near-duplicates = LSH candidates verified with exact shingle
    * Jaccard ≥ `threshold`. Joins candidate ids back to shingle sets so
    * the verify join moves shingle arrays only for candidate rows. */
  def nearDuplicatesMinhash(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, bands: Int = 8, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, bands, rowsPerBand, shingleN)
    val sh = df.select(col(idCol).as("sid"),
      expr(s"graft_shingle_hashes(`$textCol`, $shingleN)").as("sh"))
    cand
      .join(sh, col("id_a") === col("sid")).withColumnRenamed("sh", "sh_a").drop("sid")
      .join(sh, col("id_b") === col("sid")).withColumnRenamed("sh", "sh_b").drop("sid")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** 64-bit SimHash of a text column: per-token xxhash64, each bit
    * votes ±1, sign of each bit-sum forms the signature. Built as a SQL
    * expression (shiftleft/shiftright need expression bit counts). */
  def simHash64(textColName: String): Column = {
    val toks = s"split(trim(`$textColName`), '\\\\s+')"
    // acc: 64-long vote vector; per token t, bit i gets +1 if set else -1
    val votes =
      s"""aggregate($toks,
         |  array_repeat(0L, 64),
         |  (acc, t) -> zip_with(acc,
         |    transform(sequence(0, 63),
         |      i -> CASE WHEN (shiftright(xxhash64(t), i) & 1L) = 1L
         |                THEN 1L ELSE -1L END),
         |    (a, v) -> a + v))""".stripMargin
    // fold votes into a 64-bit long: set bit i when votes[i] > 0
    expr(
      s"""aggregate(
         |  zip_with($votes, sequence(0, 63),
         |    (v, i) -> CASE WHEN v > 0L THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Portable SimHash (SHA-based, 60-bit): per-token hash = first 15
    * hex chars of sha256 as an integer (60 bits — positive BIGINT in
    * every engine), each bit votes ±1, sign of the vote forms the
    * signature. Cross-engine reproducible (DuckDB:
    * `('0x'||substr(sha256(t),1,15))::BIGINT`) — the oracle tier for
    * [[simHash64]]'s xxhash64 fast path. Computed by the native
    * `graft_simhash_sha` expression (one imperative pass, 9× the
    * interpreted-HOF formulation, bit-parity spec-locked against
    * [[simHashShaSql]]). */
  def simHashSha(textCol: Column, bits: Int = 60): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    b.column(graft.expressions.SimHashSha(b.expression(textCol), bits))
  }

  /** The SQL-expression formulation of [[simHashSha]] — the executable
    * spec the native expression is bit-parity-tested against (and the
    * shape the DuckDB oracle mirrors). Interpreted lambdas: use the
    * native form in data paths. */
  def simHashShaSql(textColName: String, bits: Int = 60): Column = {
    // each token hashed ONCE (transform), then votes accumulate over the
    // hashed longs — the let-binding shape that avoids re-evaluating the
    // hash per bit position (interpreted-lambda capture trap)
    val hs = s"transform(split(trim(`$textColName`), '\\\\s+'), " +
      "t -> cast(conv(substr(sha2(t, 256), 1, 15), 16, 10) as bigint))"
    val votes =
      s"""aggregate($hs, array_repeat(0L, $bits),
         |  (acc, h) -> zip_with(acc, sequence(0, ${bits - 1}),
         |    (a, i) -> a + CASE WHEN (shiftright(h, i) & 1L) = 1L
         |                  THEN 1L ELSE -1L END))""".stripMargin
    expr(
      s"""aggregate(
         |  zip_with($votes, sequence(0, ${bits - 1}),
         |    (v, i) -> CASE WHEN v > 0L THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** MinHash+LSH banding candidates, portable tier: bands over the
    * SHA-based signature ([[minHashSignatureSha]]), bucket key = the
    * band's signature slice joined verbatim (strings — no engine hash
    * in the bucket id, so DuckDB reproduces the buckets exactly).
    * Same join shape as [[minhashCandidates]] (never all-pairs); use
    * the native tier at scale, this one for cross-engine verification. */
  def minhashCandidatesSha(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame = {
    graft.expressions.NativeFunctions.register(df.sparkSession)
    val (sigs, banded) = shaBanded(df, idCol, textCol, bands, rowsPerBand,
      shingleN)
    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r, col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("doc_a"), col("r.id").as("doc_b"))
      .distinct()
    candidates
      .join(sigs.select(col("id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("graft_sig_agreement(sig_a, sig_b)").as("est_jaccard"))
  }

  /** SHA-tier signatures + per-band bucket rows, shared by
    * [[minhashCandidatesSha]] (self-join) and [[dedupIncremental]]
    * (cross-corpus probe). The repartition barriers spread rows before
    * the CPU-bound signature pass and stop CollapseProject from
    * inlining the signature HOF into the per-band explode (one re-eval
    * per band otherwise). Returns (sigs(id, sig), banded(id, band,
    * bucket)). */
  private def shaBanded(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, shingleN: Int): (DataFrame, DataFrame) = {
    val n = bands * rowsPerBand
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("t"))
      .repartition(p)
      .select(col("id"), minHashSignatureSha(col("t"), n, shingleN).as("sig"))
      .repartition(p)
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "|")))
        .as(Seq("band", "bucket")))
    (sigs, banded)
  }

  /** Incremental (cross-corpus) dedup — the nightly-crawl admission
    * pass: flag every NEW-batch document against an EXISTING corpus
    * without ever joining text to text. Two tiers in one output row
    * per new doc:
    *   - `exact_dup`: the trimmed text's sha2 exists in the corpus
    *     (content-hash membership — the q20/q25 exact tier, probed
    *     against the other table);
    *   - `near_candidates`: how many distinct corpus docs share ≥1
    *     MinHash/LSH band bucket (SHA tier — cross-engine-verifiable,
    *     same banding as [[minhashCandidatesSha]]); 0 = no candidate.
    * The caller drops `exact_dup` rows and routes near-candidates to
    * verification (jaccard / resolution) — this operator only decides
    * WHO must be checked, which is the part that touches 100 TB.
    *
    * Scale shape: the corpus side reduces to DISTINCT hashes and
    * (band, bucket, id) triples — keys only, aggregated before any
    * join; candidate counting is a bounded count-distinct aggregate
    * per new doc, never a collected list. The quadratic hazard is a
    * MASS-DUP bucket (a boilerplate page duplicated k times in the
    * corpus meets m copies in the batch ⇒ m×k candidate rows):
    * `maxBucket` fail-fasts when any bucket on EITHER side exceeds
    * it, naming the side, band and bucket (one bounded agg + ≤1-row
    * collect, the funnel / embeddingPairsExact convention) — run
    * exact dedup over that side first; a bucket that hot means
    * byte-identical pages, which the hash tier removes for free.
    * 0 disables the check. */
  def dedupIncremental(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String, bands: Int = 4, rowsPerBand: Int = 2,
      shingleN: Int = 3, maxBucket: Long = 1L << 20): DataFrame = {
    // the build validates (and localCheckpoints) the corpus banded
    // side, so the candidate join reuses that materialization instead
    // of re-running the CPU-bound SHA signature pass over the full
    // corpus, and admitCore only needs the batch-side guard
    val store = buildSignatureStore(corpusDf, idCol, textCol, bands,
      rowsPerBand, shingleN, validateMaxBucket = maxBucket)
    admitCore(newDf, store, idCol, textCol, maxBucket)
  }

  /** Precomputed corpus-side signatures for incremental admission:
    * `hashes(content_hash)` = DISTINCT sha2 of the trimmed text (the
    * exact tier's membership set) and `banded(band, bucket, id)` = the
    * SHA-tier LSH bucket rows (the near tier's probe index), plus the
    * banding parameters they were built with so a probe can never run
    * with mismatched banding. The point: the corpus is IMMUTABLE
    * between admission runs, so its signatures should be computed once
    * — not re-derived from 100 TB of raw text every nightly batch /
    * micro-batch, which is otherwise the dominant cost of the whole
    * admission job. Build with [[buildSignatureStore]] (in-session),
    * persist with [[writeSignatureStore]] (bucketed catalog tables →
    * exchange-free corpus side on every later probe), reload with
    * [[readSignatureStore]]. `buckets`, when present (persisted
    * stores), is the PRE-GROUPED band index — one row per
    * (band, bucket) carrying its id list, possibly several rows per
    * key after appends (one generation per appended batch; compaction
    * collapses them) — built at store build time so a streaming
    * admission never re-runs the corpus-wide collect_list groupBy
    * per trigger (see `Streaming.admitAgainstStore`). */
  final case class SignatureStore(hashes: DataFrame, banded: DataFrame,
      bands: Int, rowsPerBand: Int, shingleN: Int,
      buckets: Option[DataFrame] = None) {

    /** Admit a new batch against this precomputed corpus: same output
      * contract as [[dedupIncremental]] (id, exact_dup,
      * near_candidates). Only the BATCH side is signatured here; the
      * corpus side is probed as-is. `maxBucket` fail-fasts on a
      * mass-dup BATCH bucket; the corpus side was validated when the
      * store was built ([[buildSignatureStore]]'s default
      * `validateMaxBucket`) or written ([[writeSignatureStore]]) —
      * a store built with `validateMaxBucket = 0` skips that check
      * and its hot corpus buckets are the caller's accepted risk; 0
      * here disables the batch-side check. */
    def admit(newDf: DataFrame, idCol: String, textCol: String,
        maxBucket: Long = 1L << 20): DataFrame =
      admitCore(newDf, this, idCol, textCol, maxBucket)
  }

  /** Derive a [[SignatureStore]] from a corpus DataFrame. With the
    * default `validateMaxBucket > 0` the banded side is
    * localCheckpointed and the corpus-side mass-dup-bucket guard runs
    * HERE, once (a bounded agg + ≤1-row action) — so every later
    * probe both reuses the materialized signatures and inherits a
    * validated corpus, making [[SignatureStore.admit]]'s batch-only
    * guard sufficient. Pass 0 for a fully lazy, UNVALIDATED store
    * (hot corpus buckets then become the caller's accepted risk);
    * persist with [[writeSignatureStore]] to pay the signature pass
    * exactly once across admission runs. */
  def buildSignatureStore(corpusDf: DataFrame, idCol: String,
      textCol: String, bands: Int = 4, rowsPerBand: Int = 2,
      shingleN: Int = 3,
      validateMaxBucket: Long = 1L << 20): SignatureStore = {
    val hashes = corpusDf
      .select(sha2(trim(col(textCol)), 256).as("content_hash"))
      .distinct()
    val (_, banded0) = shaBanded(corpusDf, idCol, textCol, bands,
      rowsPerBand, shingleN)
    val keys = banded0.select(col("band"), col("bucket"), col("id"))
    val banded =
      if (validateMaxBucket <= 0) keys
      else {
        val b = keys.localCheckpoint()
        val hot = b.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("_n"))
          .filter(col("_n") > validateMaxBucket)
          .orderBy(col("_n").desc).limit(1).collect()
        hot.headOption.foreach { r =>
          throw new IllegalArgumentException(
            s"buildSignatureStore: corpus LSH bucket band=${r.get(0)} " +
              s"bucket=${r.get(1)} holds ${r.getLong(2)} docs " +
              s"(> maxBucket=$validateMaxBucket) — admission probes " +
              "against it would be quadratic; exact-dedup the corpus " +
              "first or raise the cap explicitly")
        }
        b
      }
    SignatureStore(hashes, banded, bands, rowsPerBand, shingleN)
  }

  /** Resolved store metadata: banding parameters, bucket COUNT, the
    * per-table versions (None ⇒ a legacy unversioned store layout —
    * still readable; the first compaction migrates it), and the
    * append fencing sequence (see [[compactSignatureStore]]). */
  private[llm] final case class StoreMeta(bands: Int, rowsPerBand: Int,
      shingleN: Int, buckets: Int, hashesVersion: Option[Int],
      bandedVersion: Option[Int], appendSeq: Long) {
    def hashesTable(prefix: String): String =
      hashesVersion.map(v => s"${prefix}_v${v}_hashes")
        .getOrElse(s"${prefix}_hashes")
    def bandedTable(prefix: String): String =
      bandedVersion.map(v => s"${prefix}_v${v}_banded")
        .getOrElse(s"${prefix}_banded")
    /** Pre-grouped band index — versioned stores only (the legacy
      * layout has no buckets table). */
    def bucketsTable(prefix: String): Option[String] =
      bandedVersion.map(v => s"${prefix}_v${v}_buckets")
    def maxVersion: Int =
      math.max(hashesVersion.getOrElse(0), bandedVersion.getOrElse(0))
  }

  private[llm] def readStoreMeta(
      spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): StoreMeta = {
    val t = s"${tablePrefix}_meta"
    // The meta flip is an INSERT OVERWRITE data-only replace; the
    // table is never unregistered, but with the default
    // FileOutputCommitter the overwrite deletes the old file before
    // the new one commits, so a read racing a flip can observe the
    // window TWO ways: an EMPTY table (listed after the delete,
    // before the commit) or a FAILED_READ_FILE/FileNotFound (listed
    // the old file, scanned after its delete). Both are transient —
    // retry with backoff (total ~3 s; flips are one-row writes, over
    // in milliseconds). Persistent emptiness means a flip was
    // interrupted mid-overwrite (non-atomic committer) and throws
    // with the remedy; an atomic-commit table format (Delta/Iceberg)
    // or committer removes the window entirely.
    val maxAttempts = 6
    var attempt = 0
    var found: Option[(Array[String], org.apache.spark.sql.Row)] = None
    while (found.isEmpty && attempt < maxAttempts) {
      if (attempt > 0) {
        Thread.sleep(100L << (attempt - 1))
        spark.catalog.refreshTable(t)
      }
      try {
        val df = spark.table(t)
        val h = df.head(1)
        if (h.nonEmpty) found = Some((df.columns, h(0)))
      } catch {
        case e: Exception
            if attempt < maxAttempts - 1 &&
              Option(e.getMessage).exists(_.contains("does not exist")) =>
          () // mid-flip file-listing race — retry (final attempt rethrows)
      }
      attempt += 1
    }
    val (cols, m) = found.getOrElse(throw new IllegalStateException(
      s"readStoreMeta: $t still empty after $attempt attempts — a " +
        "concurrent meta flip exposes an empty table only for its " +
        "commit window; a persistently empty meta row means a flip " +
        "was interrupted mid-overwrite (non-atomic committer). " +
        "Rebuild the store with writeSignatureStore, or host the " +
        "meta table on an atomic-commit format"))
    def optInt(c: String): Option[Int] =
      if (cols.contains(c)) Some(m.getAs[Int](c)) else None
    StoreMeta(m.getAs[Int]("bands"), m.getAs[Int]("rows_per_band"),
      m.getAs[Int]("shingle_n"),
      optInt("buckets").getOrElse(0),
      optInt("hashes_version"), optInt("banded_version"),
      if (cols.contains("append_seq")) m.getAs[Long]("append_seq")
      else 0L)
  }

  /** Write the one-row meta table. When the table already exists with
    * the current schema this is an INSERT OVERWRITE — a data-only
    * replace that never unregisters the table, so readers resolving
    * the store mid-flip see either the old row or the new row, never
    * an absent store (the drop-and-recreate `saveAsTable` path runs
    * only on first write or legacy-schema migration). */
  private def writeStoreMeta(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, m: StoreMeta): Unit = {
    import spark.implicits._
    require(m.hashesVersion.isDefined && m.bandedVersion.isDefined,
      "writeStoreMeta: versions must be resolved")
    val df = Seq((m.bands, m.rowsPerBand, m.shingleN, m.buckets,
        m.hashesVersion.get, m.bandedVersion.get, m.appendSeq))
      .toDF("bands", "rows_per_band", "shingle_n", "buckets",
        "hashes_version", "banded_version", "append_seq")
    val t = s"${tablePrefix}_meta"
    if (spark.catalog.tableExists(t) &&
        spark.table(t).columns.sameElements(df.columns))
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).insertInto(t)
    else
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(t)
  }

  /** The append FENCE LOG `<prefix>_applog`: one row appended per
    * [[appendToSignatureStore]] run, AFTER its data lands and BEFORE
    * its meta bump. Unlike the meta row (which a maintenance flip
    * overwrites — so a bump landing inside the flip's check-to-write
    * window left no evidence, the r9 residual race), the log is
    * APPEND-ONLY parquet: nothing ever overwrites it, so maintenance
    * can compare its row count before and after the flip and detect
    * an append in ANY interleaving. One tiny row per nightly append —
    * growth is noise; it is never read on a data path. */
  private def applogCount(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): Long = {
    val t = s"${tablePrefix}_applog"
    if (spark.catalog.tableExists(t)) spark.table(t).count() else 0L
  }

  private def applogAppend(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, seq: Long): Unit = {
    import spark.implicits._
    Seq(seq).toDF("seq").write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .format("parquet").saveAsTable(s"${tablePrefix}_applog")
  }

  /** Shared maintenance COMMIT: fencing re-check → meta flip →
    * post-flip verify (with rollback) → grace drop of superseded
    * tables. Used by compaction, removal and rebuild — every path
    * that writes a new store version.
    *
    * Interleaving proof vs a concurrent append (append order: data →
    * fence-log row → meta version re-check → meta bump):
    *  - log row lands before the RE-CHECK here → seq/log comparison
    *    aborts the maintenance cleanly (new tables dropped, current
    *    version — which contains the append — stays live).
    *  - log row lands between the re-check and the VERIFY → the
    *    meta flip may have overwritten the append's bump, but the
    *    append-only log row survives; the verify sees it and ROLLS
    *    the flip back — meta re-points at the snapshot versions,
    *    whose tables hold the append's data. The new version's
    *    tables stay on disk as grace for any reader that resolved
    *    them inside the window; the next maintenance run overwrites
    *    them (rewrites DROP their target first).
    *  - log row lands after the verify → the append's own meta
    *    re-check (which follows its log write) sees the flipped
    *    versions and aborts the APPEND instead; re-running it is
    *    idempotent.
    * Maintenance ops must still not race EACH OTHER (one
    * orchestrator per store — Spark's catalog is non-transactional);
    * what the fence removes is every append-vs-maintenance lost
    * write. `midFlipHook` is a test seam running between the
    * re-check and the flip — the exact residual window. */
  private def fencedVersionFlip(
      spark: org.apache.spark.sql.SparkSession, tablePrefix: String,
      m0: StoreMeta, applog0: Long, newTables: Seq[String],
      flipTo: StoreMeta => StoreMeta, keep: Set[String], op: String,
      midFlipHook: () => Unit = () => ()): Unit = {
    val m1 = readStoreMeta(spark, tablePrefix)
    if (m1.appendSeq != m0.appendSeq ||
        m1.hashesVersion != m0.hashesVersion ||
        m1.bandedVersion != m0.bandedVersion ||
        applogCount(spark, tablePrefix) != applog0) {
      newTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      throw new IllegalStateException(
        s"$op: store $tablePrefix changed while rewriting " +
          s"(append_seq ${m0.appendSeq} -> ${m1.appendSeq}) — the " +
          "concurrent append is preserved in the live store and this " +
          "maintenance wrote nothing; re-run it")
    }
    midFlipHook()
    writeStoreMeta(spark, tablePrefix, flipTo(m1))
    if (m0.hashesVersion.isDefined && m0.bandedVersion.isDefined &&
        applogCount(spark, tablePrefix) != applog0) {
      val mR = readStoreMeta(spark, tablePrefix)
      writeStoreMeta(spark, tablePrefix, mR.copy(
        hashesVersion = m0.hashesVersion,
        bandedVersion = m0.bandedVersion))
      throw new IllegalStateException(
        s"$op: an append landed inside $tablePrefix's flip window — " +
          "the flip was rolled back (meta re-points at the snapshot " +
          "version, which holds the append; the new version's tables " +
          "remain on disk for in-window readers and are overwritten " +
          "by the next maintenance run); re-run the maintenance")
    }
    dropSupersededStoreTables(spark, tablePrefix, keep)
  }

  /** Drop every store data table of `tablePrefix` (any `_vN_` version
    * or the legacy unversioned names) that is not in `keep` — run
    * AFTER a version flip, keeping the new current tables plus the
    * just-superseded ones as grace for in-flight readers that
    * resolved their version before the flip. */
  private def dropSupersededStoreTables(
      spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, keep: Set[String]): Unit = {
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(tablePrefix) +
        "(_v\\d+)?_(hashes|banded|buckets)")
    val all = spark.catalog.listTables().collect().map(_.name)
    all.filter(t => pat.matcher(t).matches() && !keep.contains(t))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** The pre-grouped band index rows for a banded key set: one row
    * per (band, bucket) with the sorted id list (sorted so a
    * generation merge is order-independent and spec-comparable). */
  private def groupBuckets(banded: DataFrame): DataFrame =
    banded.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))

  /** Materialize a corpus's [[SignatureStore]] as VERSIONED bucketed
    * catalog tables (`<prefix>_v1_hashes` bucketed on content_hash,
    * `<prefix>_v1_banded` and `<prefix>_v1_buckets` bucketed on
    * (band, bucket), `<prefix>_meta` recording the banding parameters
    * and the current table versions): the one-time layout cost that
    * makes every subsequent admission probe exchange-free on the
    * corpus side — the nightly job shuffles only the nightly batch,
    * never the 100 TB corpus (see IoSpec's no-Exchange pin on
    * bucketed joins). Readers resolve the current version from the
    * ONE-ROW meta table, which is what makes maintenance
    * ([[compactSignatureStore]] / [[removeFromSignatureStore]])
    * non-disruptive: a new version is written completely while the
    * current one stays live, then the meta row flips. The
    * `_buckets` table is the band index pre-grouped to one row per
    * (band, bucket) with its id list — built here so streaming
    * admission never re-groups the corpus per trigger. The
    * corpus-side mass-dup-bucket guard runs at store BUILD time,
    * once, instead of on every probe: a bucket hotter than
    * `maxBucket` fails the build naming band and bucket. */
  def writeSignatureStore(corpusDf: DataFrame, idCol: String,
      textCol: String, tablePrefix: String, buckets: Int = 32,
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      maxBucket: Long = 1L << 20): Unit = {
    // the build runs the corpus-side guard (and checkpoints the
    // banded keys the writes below share)
    val store = buildSignatureStore(corpusDf, idCol, textCol, bands,
      rowsPerBand, shingleN, validateMaxBucket = maxBucket)
    val spark = corpusDf.sparkSession
    graft.io.Sinks.writeBucketed(store.hashes,
      s"${tablePrefix}_v1_hashes", Seq("content_hash"), buckets)
    graft.io.Sinks.writeBucketed(store.banded,
      s"${tablePrefix}_v1_banded", Seq("band", "bucket"), buckets)
    graft.io.Sinks.writeBucketed(groupBuckets(store.banded),
      s"${tablePrefix}_v1_buckets", Seq("band", "bucket"), buckets)
    writeStoreMeta(spark, tablePrefix, StoreMeta(bands, rowsPerBand,
      shingleN, buckets, Some(1), Some(1), appendSeq = 0L))
    // a re-write is a fresh store: clear any older/legacy versions
    // and any stale fence log from a previous store at this prefix
    dropSupersededStoreTables(spark, tablePrefix,
      Set(s"${tablePrefix}_v1_hashes", s"${tablePrefix}_v1_banded",
        s"${tablePrefix}_v1_buckets"))
    spark.sql(s"DROP TABLE IF EXISTS ${tablePrefix}_applog")
  }

  /** Merge an ADMITTED batch's signatures into a persisted store —
    * the last step of the nightly loop (probe → admit → append), so
    * tomorrow's batch dedups against today's accepted documents
    * without ever re-signaturing the corpus. Banding parameters come
    * from the store's meta table (a probe can never append mismatched
    * banding); only hashes NOT already present append (the hash table
    * stays distinct-valued) and only (band, bucket, id) rows not
    * already present append (re-running a day is idempotent). Both
    * anti-joins and the append writes are bucketed on the probe keys,
    * so the corpus side stays exchange-free — the append job's cost
    * is the batch's own signature pass.
    *
    * The post-append mass-dup guard checks the MERGED bucket sizes
    * for the touched buckets only (batch bucket counts join the
    * store's counts exchange-free): a batch that would push a bucket
    * past `maxBucket` fails BEFORE writing, naming the bucket —
    * without this, appends could silently grow the hot bucket the
    * build-time guard exists to reject. 0 disables. */
  def appendToSignatureStore(batch: DataFrame, idCol: String,
      textCol: String, tablePrefix: String,
      maxBucket: Long = 1L << 20): Unit =
    appendToSignatureStoreHooked(batch, idCol, textCol, tablePrefix,
      maxBucket, () => ())

  /** [[appendToSignatureStore]] with test seams: `beforeFence` runs
    * after the batch's data writes land and before the fence-log row
    * + meta re-check — the window where a maintenance flip landing
    * makes this append's rows superseded; `betweenWrites` runs after
    * the hashes+banded commits and before the bucket-index commit —
    * the intra-append crash window whose replay must HEAL the index
    * (each table's delta is its own anti-join). Production callers
    * use the no-hook overload. */
  private[graft] def appendToSignatureStoreHooked(batch: DataFrame,
      idCol: String, textCol: String, tablePrefix: String,
      maxBucket: Long, beforeFence: () => Unit,
      betweenWrites: () => Unit = () => ()): Unit = {
    val spark = batch.sparkSession
    // ONE meta read serves banding params, the current table versions
    // AND the bucket count; the append must write with the SAME
    // bucketBy the store was created with or it would corrupt the
    // exchange-free layout — fail with a remedy if the store predates
    // the recorded count
    val meta = readStoreMeta(spark, tablePrefix)
    require(meta.buckets > 0,
      s"appendToSignatureStore: ${tablePrefix}_meta has no 'buckets' " +
        "column — the store was written before bucket counts were " +
        "recorded; rewrite it with writeSignatureStore before appending")
    val store = SignatureStore(
      spark.table(meta.hashesTable(tablePrefix)),
      spark.table(meta.bandedTable(tablePrefix)),
      meta.bands, meta.rowsPerBand, meta.shingleN)
    val buckets = meta.buckets
    // null text hashes to a NULL key, which a left_anti join can never
    // match (NULL = NULL is NULL) — it would re-append every run and
    // break idempotency; a null document has no content to admit
    val hashes = batch
      .select(sha2(trim(col(textCol)), 256).as("content_hash"))
      .filter(col("content_hash").isNotNull)
      .distinct()
    val newHashes = hashes.join(store.hashes,
      Seq("content_hash"), "left_anti")
    val (_, banded0) = shaBanded(batch, idCol, textCol, store.bands,
      store.rowsPerBand, store.shingleN)
    // ONE signature pass: the checkpointed batch keys feed the banded
    // delta, the bucket-index delta and the guard below
    val batchKeys = banded0
      .select(col("band"), col("bucket"), col("id")).distinct()
      .localCheckpoint()
    val newBanded = batchKeys
      .join(store.banded, Seq("band", "bucket", "id"), "left_anti")
      .localCheckpoint() // guard + write share one anti-join
    if (maxBucket > 0) {
      val batchCounts = newBanded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("_bn"))
      // count the corpus side for the TOUCHED buckets only. NO
      // broadcast hint on the bucket set: "batch-bounded" stops being
      // broadcast-SMALL at night scale — a 10M-doc batch touches ~36M
      // (band, bucket) keys, and the hinted broadcast collect breached
      // spark.driver.maxResultSize (1 GiB) in the r14 10M nightly run
      // (a real bug this measurement caught). The corpus side is
      // BUCKETED on (band, bucket), so the semi-join is exchange-free
      // on the store under sort-merge too; AQE still picks broadcast
      // when the batch is genuinely small. Guard cost stays ∝ batch.
      val touched = newBanded.select(col("band"), col("bucket")).distinct()
      val corpusCounts = store.banded
        .join(touched, Seq("band", "bucket"), "left_semi")
        .groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("_cn"))
      val hot = batchCounts.join(corpusCounts, Seq("band", "bucket"),
          "left")
        .select(col("band"), col("bucket"),
          (col("_bn") + coalesce(col("_cn"), lit(0L))).as("_n"))
        .filter(col("_n") > maxBucket)
        .orderBy(col("_n").desc).limit(1).collect()
      hot.headOption.foreach { r =>
        throw new IllegalArgumentException(
          s"appendToSignatureStore: merged LSH bucket band=${r.get(0)} " +
            s"bucket=${r.get(1)} would hold ${r.getLong(2)} docs " +
            s"(> maxBucket=$maxBucket) — exact-dedup the batch against " +
            "the corpus first (admit + filter) or raise the cap")
      }
    }
    graft.io.Sinks.writeBucketed(newHashes,
      meta.hashesTable(tablePrefix), Seq("content_hash"), buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
    graft.io.Sinks.writeBucketed(newBanded,
      meta.bandedTable(tablePrefix), Seq("band", "bucket"), buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
    betweenWrites()
    // the pre-grouped band index gains ONE GENERATION of rows per
    // append — the batch's own groups only (batch-sized, never a
    // corpus re-group); a streaming reader merges generations per
    // (band, bucket) and the next compaction collapses them.
    //
    // The index delta is computed with its OWN anti-join against the
    // index (the batch keys minus the ids the index already lists for
    // the touched buckets) instead of reusing newBanded: the banded
    // append above and this one are two separate table commits, so a
    // crash BETWEEN them would otherwise be unhealable — the replay's
    // banded anti-join sees everything present, newBanded comes back
    // empty, and the index would permanently miss the batch (silent
    // near-dup misses in streaming admission until the next
    // compaction). With per-table deltas every append write is
    // independently idempotent: a replay refills exactly the tables
    // the crash left behind. Disjointness across generations holds
    // per table by its own anti-join; the probe side additionally
    // array_distincts. Cost: one bounded read of the TOUCHED buckets'
    // index rows (semi-join on the batch's bucket set, then the
    // exploded ids join the batch keys — both batch-bounded).
    meta.bucketsTable(tablePrefix).foreach { bt =>
      // same no-hint rule as the guard above: the index table is
      // bucketed on (band, bucket), the touched set is night-sized
      val touchedB = batchKeys.select(col("band"), col("bucket")).distinct()
      val indexed = spark.table(bt)
        .join(touchedB, Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), explode(col("ids")).as("id"))
      val bucketsDelta = batchKeys
        .join(indexed, Seq("band", "bucket", "id"), "left_anti")
      graft.io.Sinks.writeBucketed(groupBuckets(bucketsDelta), bt,
        Seq("band", "bucket"), buckets,
        mode = org.apache.spark.sql.SaveMode.Append)
    }
    // FENCE (after the data lands; legacy unversioned stores skip —
    // they predate the fencing columns):
    //  1. land one APPEND-ONLY fence-log row — a maintenance flip
    //     only overwrites the meta row, so the log row is the one
    //     piece of evidence a flip can never erase
    //     (see fencedVersionFlip's interleaving proof);
    //  2. re-read meta and publish the seq bump against the CURRENT
    //     versions — blindly writing back the snapshot's versions
    //     would silently REVERT a flip that landed mid-append (meta
    //     re-points at superseded tables, the new version is
    //     orphaned, and the next grace drop loses data). If the
    //     versions moved, this append's rows landed in superseded
    //     tables: abort — re-running is idempotent (the anti-joins
    //     re-detect what the current version is missing).
    beforeFence()
    if (meta.hashesVersion.isDefined) {
      applogAppend(spark, tablePrefix, meta.appendSeq + 1)
      val mNow = readStoreMeta(spark, tablePrefix)
      if (mNow.hashesVersion != meta.hashesVersion ||
          mNow.bandedVersion != meta.bandedVersion)
        throw new IllegalStateException(
          s"appendToSignatureStore: store $tablePrefix was " +
            "compacted/rewritten while appending — this append's rows " +
            "landed in the superseded tables; re-run the append " +
            "(idempotent) against the current version")
      writeStoreMeta(spark, tablePrefix,
        mNow.copy(appendSeq = mNow.appendSeq + 1))
    }
  }

  /** Rewrite one bucketed store table's content to `target` (a NEW
    * version's table name — never the live one, so nothing here
    * disrupts readers). The write runs with the auto-bucketed-scan
    * rule pinned OFF: that rule silently downgrades a bucketed read
    * to a plain file scan when the query has no join/agg to benefit
    * (a bare rewrite doesn't), which hands the writer the FRAGMENTED
    * file-group partitioning and re-fragments the very layout being
    * compacted — worse, a caller-side repartition on the bucket keys
    * is eliminated as redundant against the table's declared
    * partitioning before that downgrade is decided, so it cannot fix
    * it. With the bucketed scan forced, the read yields exactly one
    * partition per bucket (all its file fragments coalesced), the
    * declared partitioning satisfies the write, and the job is
    * EXCHANGE-FREE: each task holds one whole bucket and emits one
    * file. */
  private def rewriteBucketedTo(snapshot: DataFrame, target: String,
      keys: Seq[String], buckets: Int): Unit = {
    val spark = snapshot.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $target")
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try graft.io.Sinks.writeBucketed(snapshot, target, keys, buckets)
    finally spark.conf.set(conf, old)
  }

  /** Compact a persisted signature store: every
    * [[appendToSignatureStore]] night adds one file set per touched
    * bucket (and one generation of bucket-index rows), so after N
    * nights each bucketed table holds O(N) files per bucket and the
    * "exchange-free" probe's scan cost quietly grows N-fold. This
    * rewrites all three data tables under the NEXT version prefix
    * (`<prefix>_v(N+1)_*`) preserving their bucketing (bucket count
    * and keys from the meta table — the layout contract cannot
    * drift), leaving ~one file per bucket and ONE generation of
    * bucket-index rows, then flips the current version in the
    * one-row meta table. Admit results are byte-identical before and
    * after (spec-pinned). The store is NEVER absent: the current
    * version stays fully live while the next is written, the flip is
    * a data-only replace of the meta row, and the just-superseded
    * version's tables survive one more maintenance cycle as grace
    * for in-flight readers (older versions are dropped).
    *
    * Concurrent appends are FENCED, not silently discarded (the
    * failure mode of a shadow-table drop+rename swap): every append
    * bumps `append_seq` in meta AFTER its data lands, and the flip
    * here re-reads meta and compares the sequence against the
    * snapshot — an append that committed anywhere between snapshot
    * and flip aborts the compaction cleanly (the new version's
    * tables are deleted, the current version — which fully contains
    * the append — stays live, and the thrown error says to re-run).
    * The snapshot-vs-flip check and the meta write are not a single
    * CAS (Spark's catalog is non-transactional), so maintenance jobs
    * themselves must not race each other — one maintenance
    * orchestrator per store, the same contract any non-transactional
    * catalog mutation has; what the fencing removes is the
    * append-vs-maintenance lost-write hazard.
    *
    * A legacy unversioned store (pre-version meta) migrates here: its
    * tables are compacted into `_v1_*` and the meta row gains the
    * version columns. Cost: one bounded read+write of the store's
    * CURRENT size — at nightly-append cadence, run it weekly/monthly,
    * amortized to noise. */
  def compactSignatureStore(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): Unit =
    compactSignatureStoreHooked(spark, tablePrefix, () => ())

  /** [[compactSignatureStore]] with test seams: `beforeFlip` runs
    * after the new version's tables are fully written and before the
    * fencing re-check (the r8 lost-write window); `midFlip` runs
    * BETWEEN the re-check and the meta write — the r9 residual
    * check-to-flip window the fence log closes. Production callers
    * use the no-hook overload. */
  private[graft] def compactSignatureStoreHooked(
      spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, beforeFlip: () => Unit,
      midFlip: () => Unit = () => ()): Unit = {
    val applog0 = applogCount(spark, tablePrefix)
    val m0 = readStoreMeta(spark, tablePrefix)
    require(m0.buckets > 0,
      s"compactSignatureStore: ${tablePrefix}_meta has no 'buckets' " +
        "column — rewrite the store with writeSignatureStore first")
    val newV = m0.maxVersion + 1
    val banded = spark.table(m0.bandedTable(tablePrefix))
    rewriteBucketedTo(spark.table(m0.hashesTable(tablePrefix)),
      s"${tablePrefix}_v${newV}_hashes", Seq("content_hash"), m0.buckets)
    rewriteBucketedTo(banded,
      s"${tablePrefix}_v${newV}_banded", Seq("band", "bucket"), m0.buckets)
    // the bucket index regroups from the snapshot banded rows —
    // collapsing however many append generations accumulated
    rewriteBucketedTo(groupBuckets(banded),
      s"${tablePrefix}_v${newV}_buckets", Seq("band", "bucket"),
      m0.buckets)
    beforeFlip()
    fencedVersionFlip(spark, tablePrefix, m0, applog0,
      newTables = Seq("hashes", "banded", "buckets")
        .map(t => s"${tablePrefix}_v${newV}_$t"),
      flipTo = m1 =>
        m1.copy(hashesVersion = Some(newV), bandedVersion = Some(newV)),
      keep = Set(s"${tablePrefix}_v${newV}_hashes",
        s"${tablePrefix}_v${newV}_banded",
        s"${tablePrefix}_v${newV}_buckets",
        m0.hashesTable(tablePrefix), m0.bandedTable(tablePrefix)) ++
        m0.bucketsTable(tablePrefix),
      op = "compactSignatureStore", midFlipHook = midFlip)
  }

  /** Retention path for DELETED corpus documents (takedowns): drop the
    * removed ids' rows from `<prefix>_banded` (anti-join by id,
    * bucketing-preserving rewrite — same shadow-table swap and
    * no-concurrent-append caveat as [[compactSignatureStore]]), so
    * removed documents stop contributing near-candidates.
    *
    * The HASH table is deliberately NOT touched: `<prefix>_hashes` is
    * a distinct value set with no per-document provenance, so "does
    * any RETAINED doc still produce this hash" is unanswerable from
    * the store alone — removing a shared hash would un-flag incoming
    * exact dups of documents still in the corpus. Retiring hashes
    * needs either per-hash refcounts (not kept: they'd turn the
    * append's distinct-valued anti-join into a read-modify-write) or
    * a rebuild from the retained corpus — run
    * [[rebuildSignatureStore]] over the post-deletion corpus when
    * exact re-admission of taken-down content must be possible (one
    * fenced maintenance call); until then a removed doc's hash keeps
    * flagging byte-identical incoming copies, which is the safe
    * default for takedown semantics. */
  def removeFromSignatureStore(removeIds: DataFrame,
      tablePrefix: String): Unit = {
    val spark = removeIds.sparkSession
    val applog0 = applogCount(spark, tablePrefix)
    val m0 = readStoreMeta(spark, tablePrefix)
    require(m0.buckets > 0,
      s"removeFromSignatureStore: ${tablePrefix}_meta has no 'buckets' " +
        "column — rewrite the store with writeSignatureStore first")
    val ids = removeIds.select(col(removeIds.columns.head).as("id"))
    // same versioned flip + append fencing as compactSignatureStore:
    // the filtered banded (and regrouped bucket-index) tables land
    // under the next version while the current stays live, and a
    // concurrent append aborts the removal cleanly rather than being
    // silently discarded. The hash table is shared, not rewritten —
    // its version is unchanged by design (see Scaladoc above).
    val newV = m0.maxVersion + 1
    val filtered = spark.table(m0.bandedTable(tablePrefix))
      .join(broadcast(ids), Seq("id"), "left_anti")
    rewriteBucketedTo(filtered, s"${tablePrefix}_v${newV}_banded",
      Seq("band", "bucket"), m0.buckets)
    rewriteBucketedTo(groupBuckets(filtered),
      s"${tablePrefix}_v${newV}_buckets", Seq("band", "bucket"),
      m0.buckets)
    // a legacy (unversioned) store migrates its hash table too —
    // meta must never point at a versioned name that doesn't exist
    val newHashesV = m0.hashesVersion.getOrElse {
      rewriteBucketedTo(spark.table(m0.hashesTable(tablePrefix)),
        s"${tablePrefix}_v${newV}_hashes", Seq("content_hash"),
        m0.buckets)
      newV
    }
    val newTables = Seq(s"${tablePrefix}_v${newV}_banded",
      s"${tablePrefix}_v${newV}_buckets") ++
      (if (m0.hashesVersion.isEmpty)
        Seq(s"${tablePrefix}_v${newV}_hashes") else Nil)
    fencedVersionFlip(spark, tablePrefix, m0, applog0, newTables,
      flipTo = m1 => m1.copy(hashesVersion = Some(newHashesV),
        bandedVersion = Some(newV)),
      keep = Set(s"${tablePrefix}_v${newV}_banded",
        s"${tablePrefix}_v${newV}_buckets",
        s"${tablePrefix}_v${newHashesV}_hashes",
        m0.hashesTable(tablePrefix), m0.bandedTable(tablePrefix)) ++
        m0.bucketsTable(tablePrefix),
      op = "removeFromSignatureStore")
  }

  /** Rebuild a persisted store's data tables FROM the retained corpus
    * under the next version — the takedown-hash retirement path
    * [[removeFromSignatureStore]] deliberately lacks: removal leaves
    * the shared hash set untouched (no per-document provenance), so a
    * byte-identical copy of a taken-down document keeps getting
    * flagged `exact_dup`. After deleting the documents from the
    * corpus itself, one call here re-derives hashes, banded keys AND
    * the bucket index from what actually remains, so exact
    * re-admission of taken-down content becomes possible in a single
    * maintenance op instead of a manual recipe.
    *
    * Unlike [[writeSignatureStore]] (a FRESH store: resets to v1,
    * drops every other version immediately, no fencing — first-write
    * semantics), this is a LIVE-store maintenance op: banding
    * parameters come from meta (the layout contract cannot drift),
    * the new tables land under `_v(N+1)_*` while the current version
    * stays fully live, and the same fence-log flip as
    * [[compactSignatureStore]] aborts or rolls back if an append
    * races it (an append racing a rebuild MUST abort one side — its
    * documents are not in the rebuild's corpus snapshot). */
  def rebuildSignatureStore(corpusDf: DataFrame, idCol: String,
      textCol: String, tablePrefix: String,
      maxBucket: Long = 1L << 20): Unit = {
    val spark = corpusDf.sparkSession
    val applog0 = applogCount(spark, tablePrefix)
    val m0 = readStoreMeta(spark, tablePrefix)
    require(m0.buckets > 0,
      s"rebuildSignatureStore: ${tablePrefix}_meta has no 'buckets' " +
        "column — rewrite the store with writeSignatureStore first")
    val store = buildSignatureStore(corpusDf, idCol, textCol, m0.bands,
      m0.rowsPerBand, m0.shingleN, validateMaxBucket = maxBucket)
    val newV = m0.maxVersion + 1
    def writeTo(df: DataFrame, suffix: String, keys: Seq[String]): String = {
      val t = s"${tablePrefix}_v${newV}_$suffix"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.io.Sinks.writeBucketed(df, t, keys, m0.buckets)
      t
    }
    val newTables = Seq(
      writeTo(store.hashes, "hashes", Seq("content_hash")),
      writeTo(store.banded, "banded", Seq("band", "bucket")),
      writeTo(groupBuckets(store.banded), "buckets",
        Seq("band", "bucket")))
    fencedVersionFlip(spark, tablePrefix, m0, applog0, newTables,
      flipTo = m1 =>
        m1.copy(hashesVersion = Some(newV), bandedVersion = Some(newV)),
      keep = newTables.toSet +
        m0.hashesTable(tablePrefix) + m0.bandedTable(tablePrefix) ++
        m0.bucketsTable(tablePrefix),
      op = "rebuildSignatureStore")
  }

  /** Reload a persisted [[SignatureStore]]; banding parameters AND
    * the current table versions come from the `<prefix>_meta` table,
    * so probes can never silently run with banding that differs from
    * what the store was built with, and maintenance flips
    * (compaction / removal) are invisible to callers — the next read
    * resolves the new version. The pre-grouped `buckets` index rides
    * along when present (versioned stores); legacy unversioned stores
    * load without it. */
  def readSignatureStore(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): SignatureStore = {
    val m = readStoreMeta(spark, tablePrefix)
    val buckets = m.bucketsTable(tablePrefix)
      .filter(spark.catalog.tableExists)
      .map(spark.table)
    SignatureStore(
      spark.table(m.hashesTable(tablePrefix)),
      spark.table(m.bandedTable(tablePrefix)),
      m.bands, m.rowsPerBand, m.shingleN, buckets)
  }

  /** Export the CURRENT signature-store version as a plain,
    * self-describing parquet snapshot that any engine (DuckDB, pandas,
    * another Spark) can read WITHOUT knowing the meta-flip protocol:
    *
    * {{{
    * exportDir/
    *   _export_meta/   one row: store kind + version + banding params
    *   hashes/         content_hash
    *   banded/         band, bucket, id
    *   buckets/        band, bucket, ids        (versioned stores only)
    * }}}
    *
    * Consistency rides the SAME fence discipline as maintenance:
    * meta + append-log are snapshotted BEFORE the data copy and
    * re-checked AFTER it — an append or version flip landing anywhere
    * inside the export window (which could tear the snapshot: appends
    * add rows to the live tables between the hashes read and the
    * banded read) deletes the partial export and fails by name; the
    * live store is never touched. `midExportHook` is the test seam in
    * that window. Returns the exported store version.
    *
    * Residual window, stated honestly: the fence catches an append
    * whose applog row / meta bump is VISIBLE at re-check time. Under
    * true multi-driver concurrency an appender can land data rows
    * mid-copy while its applog row and meta bump land only after the
    * re-check — that interleaving escapes detection (no finite number
    * of re-checks closes it; the appender's bookkeeping is not yet
    * written to disagree with). Single-writer deployments (the
    * NightlyLoop contract — one maintenance owner per store) have no
    * such appender, and there the fence is airtight.
    *
    * The snapshot is for EXTERNAL readers — re-importing it via
    * [[readExportedSignatureStore]] yields correct results but plain
    * (unbucketed) layout, so admission probes against it shuffle the
    * corpus side; the live bucketed tables remain the exchange-free
    * path. */
  def exportSignatureStoreSnapshot(
      spark: org.apache.spark.sql.SparkSession, tablePrefix: String,
      exportDir: String,
      midExportHook: () => Unit = () => ()): Int = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(exportDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val createdRoot = !fs.exists(root)
    require(createdRoot || fs.listStatus(root).isEmpty,
      s"exportSignatureStoreSnapshot: exportDir '$exportDir' exists and " +
        "is non-empty — exports never overwrite; point at a fresh dir")
    val m0 = readStoreMeta(spark, tablePrefix)
    val applog0 = applogCount(spark, tablePrefix)
    try {
      spark.table(m0.hashesTable(tablePrefix))
        .write.parquet(s"$exportDir/hashes")
      spark.table(m0.bandedTable(tablePrefix))
        .write.parquet(s"$exportDir/banded")
      val hasBuckets = m0.bucketsTable(tablePrefix)
        .filter(spark.catalog.tableExists)
      hasBuckets.foreach(t =>
        spark.table(t).write.parquet(s"$exportDir/buckets"))
      Seq(("signature_store", m0.maxVersion, m0.bands, m0.rowsPerBand,
          m0.shingleN, m0.buckets, hasBuckets.isDefined, m0.appendSeq))
        .toDF("store", "version", "bands", "rows_per_band", "shingle_n",
          "bucket_count", "has_buckets", "append_seq")
        .coalesce(1).write.parquet(s"$exportDir/_export_meta")
      midExportHook()
      val m1 = readStoreMeta(spark, tablePrefix)
      if (m1.appendSeq != m0.appendSeq ||
          m1.hashesVersion != m0.hashesVersion ||
          m1.bandedVersion != m0.bandedVersion ||
          applogCount(spark, tablePrefix) != applog0)
        throw new IllegalStateException(
          s"exportSignatureStoreSnapshot: store $tablePrefix changed " +
            s"while exporting (append_seq ${m0.appendSeq} -> " +
            s"${m1.appendSeq}, version ${m0.maxVersion} -> " +
            s"${m1.maxVersion}) — the snapshot could be torn (an " +
            "append lands rows between the hashes and banded copies) " +
            "so it was deleted; the live store is untouched. Re-run " +
            "the export")
      m0.maxVersion
    } catch {
      case t: Throwable =>
        // delete what the export CREATED: the root only when this
        // call made it — a caller-owned pre-existing (empty) mount
        // point / tempdir survives, only the partial children go
        if (createdRoot) fs.delete(root, true)
        else Seq("hashes", "banded", "buckets", "_export_meta")
          .foreach(c => fs.delete(
            new org.apache.hadoop.fs.Path(root, c), true))
        throw t
    }
  }

  /** Re-import an [[exportSignatureStoreSnapshot]] directory as a
    * probe-ready [[SignatureStore]] — correctness-equivalent to the
    * live store at the exported version (spec-pinned), minus the
    * bucketed layout (see the export Scaladoc). */
  def readExportedSignatureStore(
      spark: org.apache.spark.sql.SparkSession,
      exportDir: String): SignatureStore = {
    val m = spark.read.parquet(s"$exportDir/_export_meta").head()
    require(m.getAs[String]("store") == "signature_store",
      s"'$exportDir' is a ${m.getAs[String]("store")} snapshot, not a " +
        "signature_store one")
    val buckets =
      if (m.getAs[Boolean]("has_buckets"))
        Some(spark.read.parquet(s"$exportDir/buckets"))
      else None
    SignatureStore(
      spark.read.parquet(s"$exportDir/hashes"),
      spark.read.parquet(s"$exportDir/banded"),
      m.getAs[Int]("bands"), m.getAs[Int]("rows_per_band"),
      m.getAs[Int]("shingle_n"), buckets)
  }

  /** The live store's current VERSION — the value every export in a
    * delta chain is keyed by ([[exportSignatureStoreDelta]] refuses a
    * chain at any other version). Exposed so chain owners (e.g. the
    * NightlyLoop ship stage) can decide delta-vs-fresh-base up front
    * instead of parsing a failed export's message. */
  def signatureStoreVersion(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): Int =
    readStoreMeta(spark, tablePrefix).maxVersion

  /** DELTA export: copy only the rows APPENDED since the prior
    * export(s) — the nightly external handoff stays batch-sized
    * instead of re-copying an unbounded corpus every night (the full
    * [[exportSignatureStoreSnapshot]] is the day-0 base; each night
    * adds one delta dir). `priorDirs` is the chain so far: the base
    * snapshot first, then every delta already taken, in order. The
    * delta is each table's anti-join of the live store against the
    * chain's union — append-only tables never lose rows within a
    * version, so base ∪ deltas ≡ the live tables at the head
    * (spec-pinned). The anti-join READS corpus-sized tables (keys
    * only — content hashes and (band, bucket, id) keys), but WRITES
    * and ships only the delta: the handoff's transfer volume is the
    * night's appends.
    *
    * Version discipline: a delta only composes while the store
    * VERSION matches the chain's — maintenance (compaction/removal/
    * rebuild) rewrites tables and may REMOVE rows, which no
    * append-only delta can express, so a version mismatch fails by
    * name demanding a fresh base snapshot. Fence discipline and the
    * residual window are exactly [[exportSignatureStoreSnapshot]]'s
    * (`midExportHook` is the same test seam); failure deletes only
    * what this export created. Returns the head `append_seq` the
    * delta reaches. */
  def exportSignatureStoreDelta(
      spark: org.apache.spark.sql.SparkSession, tablePrefix: String,
      priorDirs: Seq[String], deltaDir: String,
      midExportHook: () => Unit = () => ()): Long = {
    import spark.implicits._
    require(priorDirs.nonEmpty,
      "exportSignatureStoreDelta: need the prior export chain (base " +
        "snapshot first) — for a first export use " +
        "exportSignatureStoreSnapshot")
    val root = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val createdRoot = !fs.exists(root)
    require(createdRoot || fs.listStatus(root).isEmpty,
      s"exportSignatureStoreDelta: deltaDir '$deltaDir' exists and " +
        "is non-empty — exports never overwrite; point at a fresh dir")
    val priors = priorDirs.map(d =>
      (d, spark.read.parquet(s"$d/_export_meta").head()))
    priors.zipWithIndex.foreach { case ((d, m), i) =>
      val st = m.getAs[String]("store")
      require(if (i == 0) st == "signature_store"
        else st == "signature_store_delta",
        s"exportSignatureStoreDelta: '$d' is a $st export — the chain " +
          "is one signature_store base followed by " +
          "signature_store_delta dirs, in order")
    }
    val baseVersion = priors.head._2.getAs[Int]("version")
    priors.foreach { case (d, m) =>
      require(m.getAs[Int]("version") == baseVersion,
        s"exportSignatureStoreDelta: '$d' was exported at version " +
          s"${m.getAs[Int]("version")}, chain base is $baseVersion")
    }
    val m0 = readStoreMeta(spark, tablePrefix)
    val applog0 = applogCount(spark, tablePrefix)
    require(m0.maxVersion == baseVersion,
      s"exportSignatureStoreDelta: store $tablePrefix is at version " +
        s"${m0.maxVersion} but the chain was exported at " +
        s"$baseVersion — maintenance rewrote the tables (rows may " +
        "have been removed, which a delta cannot express); take a " +
        "fresh exportSignatureStoreSnapshot base")
    val hasBuckets = priors.head._2.getAs[Boolean]("has_buckets")
    def unionOf(sub: String): DataFrame = priorDirs
      .map(d => spark.read.parquet(s"$d/$sub"))
      .reduce(_.unionByName(_))
    try {
      spark.table(m0.hashesTable(tablePrefix))
        .join(unionOf("hashes"), Seq("content_hash"), "left_anti")
        .write.parquet(s"$deltaDir/hashes")
      spark.table(m0.bandedTable(tablePrefix))
        .join(unionOf("banded"), Seq("band", "bucket", "id"),
          "left_anti")
        .write.parquet(s"$deltaDir/banded")
      if (hasBuckets) m0.bucketsTable(tablePrefix).foreach { t =>
        // generations are disjoint id-sets per (band, bucket), so row
        // equality on (band, bucket, ids) identifies the new ones
        spark.table(t)
          .join(unionOf("buckets"), Seq("band", "bucket", "ids"),
            "left_anti")
          .write.parquet(s"$deltaDir/buckets")
      }
      Seq(("signature_store_delta", m0.maxVersion, m0.bands,
          m0.rowsPerBand, m0.shingleN, m0.buckets, hasBuckets,
          m0.appendSeq))
        .toDF("store", "version", "bands", "rows_per_band", "shingle_n",
          "bucket_count", "has_buckets", "append_seq")
        .coalesce(1).write.parquet(s"$deltaDir/_export_meta")
      midExportHook()
      val m1 = readStoreMeta(spark, tablePrefix)
      if (m1.appendSeq != m0.appendSeq ||
          m1.hashesVersion != m0.hashesVersion ||
          m1.bandedVersion != m0.bandedVersion ||
          applogCount(spark, tablePrefix) != applog0)
        throw new IllegalStateException(
          s"exportSignatureStoreDelta: store $tablePrefix changed " +
            s"while exporting (append_seq ${m0.appendSeq} -> " +
            s"${m1.appendSeq}, version ${m0.maxVersion} -> " +
            s"${m1.maxVersion}) — the delta could be torn so it was " +
            "deleted; the live store is untouched. Re-run the export")
      m0.appendSeq
    } catch {
      case t: Throwable =>
        if (createdRoot) fs.delete(root, true)
        else Seq("hashes", "banded", "buckets", "_export_meta")
          .foreach(c => fs.delete(
            new org.apache.hadoop.fs.Path(root, c), true))
        throw t
    }
  }

  /** Read a base-plus-deltas export CHAIN as one probe-ready
    * [[SignatureStore]] — row-equal to the live store at the last
    * delta's head append_seq (spec-pinned ≡ a full snapshot taken
    * there). Same unbucketed caveat as [[readExportedSignatureStore]];
    * [[importSignatureStore]] promotes a chain back to a live
    * bucketed store.
    *
    * The read path re-validates what [[exportSignatureStoreDelta]]
    * enforced at write time — it cannot assume the caller assembled
    * the same chain the exporter built: every delta must have been
    * exported at the BASE's store version (a delta taken against a
    * different base, or after maintenance rewrote the store, would
    * union into a silently wrong store), and `append_seq` must be
    * non-decreasing along the chain (out-of-order dirs mean the
    * caller skipped or shuffled deltas). Both fail by name. */
  def readExportedSignatureStoreChain(
      spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): SignatureStore = {
    require(dirs.nonEmpty, "readExportedSignatureStoreChain: no dirs")
    val metas = dirs.map(d =>
      (d, spark.read.parquet(s"$d/_export_meta").head()))
    metas.zipWithIndex.foreach { case ((d, m), i) =>
      val st = m.getAs[String]("store")
      require(if (i == 0) st == "signature_store"
        else st == "signature_store_delta",
        s"readExportedSignatureStoreChain: '$d' is a $st export — " +
          "expected one signature_store base, then " +
          "signature_store_delta dirs")
    }
    val baseVersion = metas.head._2.getAs[Int]("version")
    metas.tail.foreach { case (d, m) =>
      require(m.getAs[Int]("version") == baseVersion,
        s"readExportedSignatureStoreChain: '$d' was exported at store " +
          s"version ${m.getAs[Int]("version")}, chain base is " +
          s"$baseVersion — a delta only composes with the base it was " +
          "taken against (maintenance rewrites bump the version and " +
          "may remove rows); re-export from a fresh base snapshot")
    }
    metas.map { case (d, m) => (d, m.getAs[Long]("append_seq")) }
      .sliding(2).foreach {
        case Seq((d0, s0), (d1, s1)) =>
          require(s1 >= s0,
            s"readExportedSignatureStoreChain: append_seq regresses " +
              s"along the chain ('$d1' at $s1 after '$d0' at $s0) — " +
              "dirs are out of order or a delta is missing")
        case _ => ()
      }
    val base = metas.head._2
    def unionOf(sub: String): DataFrame = dirs
      .map(d => spark.read.parquet(s"$d/$sub"))
      .reduce(_.unionByName(_))
    val buckets =
      if (base.getAs[Boolean]("has_buckets")) Some(unionOf("buckets"))
      else None
    SignatureStore(unionOf("hashes"), unionOf("banded"),
      base.getAs[Int]("bands"), base.getAs[Int]("rows_per_band"),
      base.getAs[Int]("shingle_n"), buckets)
  }

  /** Promote an export (a base snapshot, or a base-plus-deltas chain)
    * back to a LIVE bucketed store at `tablePrefix` — the
    * disaster-recovery / region-migration closer for the export
    * surface: after import, admission probes run exchange-free on the
    * corpus side again (spec-pinned: the bucketed-layout probe plan,
    * and admit results identical to the source store's).
    *
    * Semantics mirror [[writeSignatureStore]]: a fresh v1 store —
    * bucketed tables (bucket count from the export's meta), fresh
    * one-row meta with `append_seq = 0`, superseded/legacy tables and
    * any stale fence log cleared. The `_buckets` band index is
    * REBUILT from the banded rows (collapsing the export's append
    * generations — an import is a natural compaction point).
    *
    * SINGLE-OWNER contract, stated plainly: an import OVERWRITES the
    * `${tablePrefix}_v1_*` tables in place and then flips the meta —
    * there is no staging-name + fenced-flip here, so a CONCURRENT
    * reader of a live store at the same prefix can resolve
    * half-written v1 tables mid-import. Import targets must have no
    * concurrent readers or writers for the duration of the call: a
    * fresh prefix, or a DR/migration target whose readers are held
    * off until the import returns (the NightlyLoop deployment shape —
    * one owner per prefix). Contrast the EXPORT functions, which
    * never touch the live store and document their residual window
    * instead. */
  def importSignatureStore(spark: org.apache.spark.sql.SparkSession,
      exportDirs: Seq[String], tablePrefix: String): Unit = {
    val chain = readExportedSignatureStoreChain(spark, exportDirs)
    val meta0 = spark.read.parquet(s"${exportDirs.head}/_export_meta")
      .head()
    val buckets = math.max(1, meta0.getAs[Int]("bucket_count"))
    graft.io.Sinks.writeBucketed(chain.hashes,
      s"${tablePrefix}_v1_hashes", Seq("content_hash"), buckets)
    graft.io.Sinks.writeBucketed(chain.banded,
      s"${tablePrefix}_v1_banded", Seq("band", "bucket"), buckets)
    graft.io.Sinks.writeBucketed(groupBuckets(chain.banded),
      s"${tablePrefix}_v1_buckets", Seq("band", "bucket"), buckets)
    writeStoreMeta(spark, tablePrefix, StoreMeta(chain.bands,
      chain.rowsPerBand, chain.shingleN, buckets, Some(1), Some(1),
      appendSeq = 0L))
    dropSupersededStoreTables(spark, tablePrefix,
      Set(s"${tablePrefix}_v1_hashes", s"${tablePrefix}_v1_banded",
        s"${tablePrefix}_v1_buckets"))
    spark.sql(s"DROP TABLE IF EXISTS ${tablePrefix}_applog")
  }

  /** Shared probe core for [[dedupIncremental]] and
    * [[SignatureStore.admit]]: signatures the batch side, probes the
    * (precomputed or inline) corpus hashes + banded index, and applies
    * the mass-dup-bucket guard over the batch side (plus the corpus
    * side is validated where the store is BUILT — see
    * [[buildSignatureStore]]'s `validateMaxBucket`). */
  private def admitCore(newDf: DataFrame, store: SignatureStore,
      idCol: String, textCol: String, maxBucket: Long): DataFrame = {
    val newHash = newDf.select(col(idCol),
      sha2(trim(col(textCol)), 256).as("_h"))
    val corpusHash = store.hashes
      .select(col("content_hash").as("_h"))
      .withColumn("_e", lit(true))
    val exact = newHash.join(corpusHash, Seq("_h"), "left")
      .select(col(idCol), coalesce(col("_e"), lit(false)).as("exact_dup"))
    val (_, bNew0) = shaBanded(newDf, idCol, textCol, store.bands,
      store.rowsPerBand, store.shingleN)
    val bNew = if (maxBucket > 0) bNew0.localCheckpoint() else bNew0
    if (maxBucket > 0) {
      // the documented hazard is m batch copies × k corpus copies — a
      // mass-dup batch (m huge) is quadratic even against a modest
      // corpus bucket, so the batch side is checked on EVERY probe
      // (the corpus side was checked once, where the store was built)
      val hot = bNew
        .groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("_n"))
        .filter(col("_n") > maxBucket)
        .orderBy(col("_n").desc).limit(1).collect()
      hot.headOption.foreach { r =>
        throw new IllegalArgumentException(
          s"dedupIncremental: batch LSH bucket " +
            s"band=${r.get(0)} bucket=${r.get(1)} holds " +
            s"${r.getLong(2)} docs (> maxBucket=$maxBucket) — candidate " +
            "join would be quadratic; exact-dedup the batch first or " +
            "raise maxBucket explicitly")
      }
    }
    val near = bNew.join(
        store.banded.select(col("band"), col("bucket"),
          col("id").as("_cid")),
        Seq("band", "bucket"))
      .groupBy(col("id"))
      .agg(countDistinct(col("_cid")).as("near_candidates"))
    exact.join(near.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("exact_dup"),
        coalesce(col("near_candidates"), lit(0L)).as("near_candidates"))
  }

  /** SimHash near-duplicate candidate pairs with hamming ≤ maxHamming.
    * Blocking: split each signature into four 16-bit chunks — pairs
    * within hamming ≤ 3 share at least one exact chunk (pigeonhole), so
    * the self-join runs per chunk bucket, never all-pairs.
    *
    * Occupancy math the caller must own (measured at the 1M-doc scale
    * smoke): expected candidate pairs ≈ 4·n²/2¹⁷ for n docs with
    * uniform signatures, so cost grows quadratically in the docs per
    * bucket — ~28M pairs at n=1M, unusable by n=100M WITHOUT sharding.
    * The pigeonhole fixes the chunk width (64/(maxHamming+1) bits), so
    * the scale lever is `blockCols`: shard by language / length bucket
    * / source so each block's n stays ≤ ~10M, exactly like
    * [[jaccardPairs]]. Near-dups across different blocks are the
    * (documented) recall trade. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blockCols: Seq[String] = Seq.empty): DataFrame = {
    graft.expressions.NativeFunctions.register(df.sparkSession)
    val sigs = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        expr(s"graft_simhash64(`$textCol`)").as("sig"): _*)
    hammingPairs64(sigs, "id", "sig", maxHamming, blockCols)
  }

  /** Hamming near-dup candidate pairs over an EXISTING 64-bit
    * signature column — the blocking join [[simhashPairs]] uses,
    * factored out so any 64-bit perceptual signature rides the same
    * discipline (text SimHash, image dHash
    * [[Multimodal.imageDHash]], audio fingerprints). The signature
    * splits into `maxHamming + 1` chunks (width 64 div (h+1); the
    * top chunk takes the remainder bits via an UNSIGNED shift): two
    * signatures within hamming ≤ h differ in at most h chunks, so
    * they must agree on at least one exact chunk (pigeonhole) —
    * the per-chunk equi-join is COMPLETE w.r.t. the threshold,
    * never a recall trade, and the q128 oracle exploits exactly that
    * (its all-pairs bit_count replay must equal the blocked join's
    * output). Pairs agreeing on several chunks emit ONCE — from the
    * first agreeing chunk only (a map-side signature compare), so no
    * de-dup `.distinct()` exchange follows the join. Occupancy math
    * and the `blockCols` sharding lever are [[simhashPairs]]'s — see
    * its Scaladoc. */
  def hammingPairs64(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, blockCols: Seq[String] = Seq.empty): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      "maxHamming must be in [0, 32)")
    val n = maxHamming + 1
    val w = 64 / n
    def chunkOf(sig: Column, c: Int): Column =
      if (c == n - 1) shiftrightunsigned(sig, c * w)
      else shiftright(sig, c * w).bitwiseAND(lit((1L << w) - 1))
    val chunkExpr = (0 until n).map { c =>
      if (c == n - 1) s"shiftrightunsigned(`$sigCol`, ${c * w})"
      else s"shiftright(`$sigCol`, ${c * w}) & ${(1L << w) - 1}L"
    }.mkString("array(", ", ", ")")
    val chunked = sigs.select(
      (col(idCol).as("id") +: blockCols.map(col)) ++ Seq(
        col(sigCol).as("sig"),
        posexplode(expr(chunkExpr)).as(Seq("chunk", "ck"))): _*)
    val l = chunked.as("l")
    val r = chunked.as("r")
    val joinCond = Seq(col("l.chunk") === col("r.chunk"),
      col("l.ck") === col("r.ck")) ++
      blockCols.map(c => col(s"l.$c") === col(s"r.$c")) :+
      (col("l.id") < col("r.id"))
    // EMIT-ONCE: a pair within the threshold agrees on several chunks
    // and would surface once per agreeing chunk — emit it only from
    // the FIRST chunk both signatures agree on (a map-side compare of
    // the joined signatures, the intervalJoin canonical-chunk
    // discipline), which removes the de-dup `.distinct()` exchange
    // the join otherwise needs.
    val firstAgree = array_position(
      array((0 until n).map(c =>
        chunkOf(col("l.sig"), c) === chunkOf(col("r.sig"), c)): _*),
      true) - 1
    l.join(r, joinCond.reduce(_ && _))
      .filter(col("l.chunk").cast("long") === firstAgree)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact within-block embedding pairs — the brute-force verify tier.
    * Emits EVERY within-block pair with its exact cosine, so cost is
    * quadratic in block size by definition; a fail-fast guard bounds
    * that: any block larger than `maxBlock` rows raises with the block
    * named rather than silently grinding through C(n,2) pairs — at
    * 100 TB a skewed block must route through the LSH tier
    * ([[embeddingNearDup]]), and this guard is what enforces the
    * routing decision instead of leaving it to luck. The guard rides
    * the join key expression (a broadcast of per-block counts), so it
    * costs one tiny aggregate, no extra action. */
  def embeddingPairsExact(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, maxBlock: Long = 10000L): DataFrame = {
    graft.expressions.NativeFunctions.register(df.sparkSession)
    val e = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      Similarity.asDouble(col(vecCol)).as("v"),
      Similarity.norm(Similarity.asDouble(col(vecCol))).as("nv"))
    val counts = e.groupBy("block").agg(count(lit(1)).as("block_n"))
    val guarded = e.join(broadcast(counts), Seq("block"))
      .withColumn("block",
        when(col("block_n") > maxBlock,
          raise_error(concat(
            lit("embeddingPairsExact: block '"), col("block").cast(StringType),
            lit(s"' exceeds maxBlock=$maxBlock ("), col("block_n").cast(StringType),
            lit(" rows, quadratic pair cost); use Dedup.embeddingNearDup "
              + "(LSH tier) or raise maxBlock explicitly")))
            .cast(e.schema("block").dataType))
          .otherwise(col("block")))
      .drop("block_n")
    val l = guarded.as("l")
    val r = guarded.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (expr("graft_dot(l.v, r.v)") / (col("l.nv") * col("r.nv"))).as("cosine"))
  }

  /** Embedding-cosine near-duplicates: pairs with cosine ≥ threshold,
    * blocked by hyperplane-LSH buckets (see [[Similarity]]). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, dim: Int = 64, planes: Int = 16,
      seed: Long = 42L): DataFrame = {
    graft.expressions.NativeFunctions.register(df.sparkSession)
    // bucket join carries (id, bucket) only — vectors re-attach for the
    // distinct candidate pairs (see minhashCandidates for the measured
    // rationale); pair-level cosine runs on the native graft_dot with
    // norms computed once per row
    val withSig = df.select(col(idCol).as("id"),
      Similarity.hyperplaneSignature(col(vecCol), Similarity.randomPlanes(
        dim = dim, n = planes, seed = seed)).as("bucket"))
    val l = withSig.as("l")
    val r = withSig.as("r")
    val candidates = l.join(r,
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("id"),
      Similarity.asDouble(col(vecCol)).as("v"),
      Similarity.norm(Similarity.asDouble(col(vecCol))).as("n"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")),
        Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (expr("graft_dot(va, vb)") / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Full near-dup RESOLUTION — the composition a dedup pipeline
    * actually ships: candidate `pairs` (from any near-dup tier:
    * MinHash/LSH, SimHash, Jaccard) → [[connectedComponents]] → ONE
    * representative per cluster (highest `qualityCol`, ties to the
    * smallest id — the q64 ordering), with every document in NO pair
    * kept as its own singleton cluster. Output: one row per input doc
    * `(idCol, cluster_id, cluster_size, kept)` — callers filter
    * `kept` to dedup, or keep all rows for audit.
    *
    * Scale shape: cluster labels join back to docs on id (one
    * shuffle); the representative is a bounded-state `min_by` argmax
    * per cluster (one candidate per map partition crosses the wire —
    * never a window over a mass-duplicated cluster); the winner table
    * (one row per cluster) joins back co-partitioned on cluster_id.
    * `qualityCol` must be numeric (negated for the ordering). */
  def resolveNearDups(docs: DataFrame, pairs: DataFrame, idCol: String,
      qualityCol: Column): DataFrame = {
    val clusters = connectedComponents(pairs)
      .withColumnRenamed("doc_id", idCol)
    val withCluster = docs.select(col(idCol), qualityCol.as("_q"))
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    val best = withCluster.groupBy("cluster_id").agg(
      min_by(col(idCol), bestFirstOrd(col("_q"), col(idCol))).as("_keep"),
      count(lit(1)).as("cluster_size"))
    withCluster.join(best, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("_keep")).as("kept"))
  }

  /** LINE-level dedup (the C4/RefinedWeb cleaning pass): remove every
    * line whose trimmed form occurs in ≥ `minDf` DISTINCT documents —
    * navigation bars, cookie banners, "all rights reserved" footers —
    * and reassemble each document from its surviving lines in original
    * order. Whitespace-only lines are dropped unconditionally. Output:
    * `(idCol, clean_text, n_lines, n_removed)` where `n_lines` counts
    * the document's non-empty lines before filtering. Documents with
    * NO non-empty lines disappear (there is nothing to clean).
    *
    * Scale shape — aggregates only, no windows, and DOCUMENT TEXT
    * CROSSES THE WIRE EXACTLY ONCE (the by-id join of the keys-only
    * drop set back to the original rows; surviving lines rebuild IN
    * PLACE from the row's own split — the r14 rewrite that removed
    * the exploded-line reassembly aggregate this pass used to carry).
    * Everything that decides what to drop runs on a keys-only
    * projection `(_k, id, _i)` where `_k` is the line's sha2 as
    * 32-byte binary (2⁻¹²⁸ collision bound — the standard
    * content-hash assumption the exact-dedup pass already makes):
    * line-df is a two-level count-distinct aggregate over it; the
    * hot set (keys with df ≥ minDf — the boilerplate lines
    * themselves, tiny in exactly the corpora this pass exists for)
    * joins back against the SAME keys-only projection (AQE
    * broadcasts it when small; worst case a ~40-byte-per-row
    * shuffle, never the text); and the result folds to one
    * `(id, drop-index set)` row per affected document, bounded by
    * per-doc line count. A boilerplate line in 10⁸ docs is one
    * aggregate cell, never a window buffer. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDf: Long): DataFrame =
    unitDedup(df, idCol, textCol, minDf, sep = "\n")
      .withColumnRenamed("n_units", "n_lines")

  /** Separator-generalized tier of [[lineDedup]]: dedup any
    * newline-delimited unit — lines (`"\n"`), paragraphs (`"\n\n"`) —
    * by cross-document frequency. Paragraph-level removal is the
    * C4-style pass for templated page sections (promo blocks, nav
    * footers) that repeat verbatim across a site but are too long to
    * catch line-by-line with a meaningful df threshold. Same plan
    * shape as [[lineDedup]] (which is `sep = "\n"`); output column is
    * `n_units`. */
  def unitDedup(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, sep: String): DataFrame = {
    require(minDf >= 2, "minDf must be at least 2")
    require(sep.nonEmpty, "separator must be non-empty")
    val lines = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("_i", "_line")))
      .withColumn("_t", trim(col("_line")))
      .filter(col("_t") =!= "")
      .withColumn("_k", unhex(sha2(col("_t"), 256)))
      .drop("_t")
    val keys = lines.select(col("_k"), col(idCol), col("_i"))
    val hot = keys.groupBy("_k")
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDf)
      .select("_k")
    val dropIdx = keys.join(hot, Seq("_k"))
      .groupBy(col(idCol))
      .agg(collect_set(col("_i")).as("_drop"))
    // ONE text-carrying join (the r14 in-place rebuild, the same
    // rewrite as exactSubstrDedup/paragraphDedup): the keys-only
    // per-doc drop set joins back to the ORIGINAL rows and the
    // surviving units rebuild from the row's own split — unit text
    // never rides a reassembly aggregate. Kept units stay RAW
    // (untrimmed), blanks drop from the output, and docs with zero
    // non-blank units keep the historical absent-row contract (the
    // q94 oracle replays it) via the n_units filter.
    val arr = split(col(textCol), java.util.regex.Pattern.quote(sep))
    df.select(col(idCol), col(textCol))
      .join(dropIdx, Seq(idCol), "left")
      .select(col(idCol),
        concat_ws(sep, filter(arr, (l, i) =>
          trim(l) =!= "" && (col("_drop").isNull ||
            !array_contains(col("_drop"), i)))).as("clean_text"),
        size(filter(arr, l => trim(l) =!= "")).cast("long")
          .as("n_units"),
        coalesce(size(col("_drop")), lit(0)).cast("long")
          .as("n_removed"))
      .filter(col("n_units") > 0)
  }

  /** WITHIN-document repeated-unit removal — the intra-doc complement
    * of [[unitDedup]] (which needs cross-doc df): keep the FIRST
    * occurrence of each trimmed-identical unit inside a document, drop
    * later repeats (scraped pages duplicate their own nav/promo blocks;
    * generation artifacts repeat sentences). Blank units always stay —
    * they are formatting, not content. Output mirrors [[unitDedup]]:
    * (id, clean_text, n_units, n_removed).
    *
    * Scale shape: map-only — one split, one in-array indexed
    * filter, no shuffle, no state. The filter is O(units²) per doc,
    * so one degenerate document (a log dump split into 10⁶ lines =
    * 10¹² compares) could stall its task for hours: `maxUnits`
    * fail-fasts in-plan (raise_error naming the doc) before the
    * quadratic work starts — the funnel/embeddingPairs convention.
    * 0 disables the guard. */
  def dedupUnitsWithinDoc(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", maxUnits: Int = 10000): DataFrame = {
    val rawUnits = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val units =
      if (maxUnits <= 0) rawUnits
      else when(size(rawUnits) > maxUnits,
          raise_error(concat(lit("dedupUnitsWithinDoc: doc "),
            col(idCol).cast("string"),
            lit(s" has more than maxUnits=$maxUnits units (the " +
              "first-occurrence filter is O(units²) per doc); " +
              "split upstream or raise maxUnits explicitly"))))
        .otherwise(rawUnits)
    // let-bind the unit array (HOF args re-evaluate per reference —
    // the chunkByTokens trick): without this, every slice() inside the
    // per-element lambda re-splits the full text, turning the intended
    // O(units²) trims into O(units)·full-text regex splits on top
    val kept = aggregate(
      array(units),
      lit(null).cast("array<struct<l:string,i:int>>"),
      (_, w) => filter(
        transform(w, (u, i) => struct(u.as("l"), i.as("i"))),
        s => {
          val t = trim(s.getField("l"))
          t === "" || size(filter(slice(w, lit(1), s.getField("i")),
            p => trim(p) === t)) === 0
        }))
    df.select(col(idCol),
      concat_ws(sep, transform(kept, s => s.getField("l")))
        .as("clean_text"),
      size(units).cast("long").as("n_units"),
      (size(units) - size(kept)).cast("long").as("n_removed"))
  }

  /** EXACT-SUBSTRING passage dedup (the token-window tier of the
    * cleaning family, between [[exactDedupByContent]] at document
    * granularity and [[unitDedup]] at line/paragraph granularity):
    * remove every token covered by a `k`-token window whose exact
    * text occurs ≥ `minCount` times anywhere in the corpus — the
    * repeated-passage pass of Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" (ACL 2022), re-expressed
    * relationally: their suffix-array scan over the concatenated
    * corpus finds maximal repeats ≥ k tokens; every such repeat is a
    * union of duplicated k-windows, so flagging duplicated k-windows
    * and erasing the tokens they cover removes the same passages
    * (erasing ALL occurrences, where the paper's dropper keeps one —
    * the variant that needs no global occurrence ordering and is the
    * common production simplification). Tokens are `\s+` splits of
    * the trimmed text (the [[graft.llm.TextAnalysis.unigramLogProb]]
    * convention); output is `(idCol, n_tokens, n_removed,
    * clean_text)` with surviving tokens rejoined by single spaces in
    * original order. Every input document survives — a fully-covered
    * document comes back with `clean_text = ""` (the caller's length
    * filter decides its fate), unlike [[unitDedup]] where an
    * all-blank doc has nothing to reassemble. An input document with
    * no non-whitespace character reports `n_tokens = 0`,
    * `n_removed = 0`, `clean_text = ""` (guarded: splitting a
    * trimmed blank string yields phantom `''` tokens that would
    * otherwise count).
    *
    * Scale shape — the [[lineDedup]] discipline at token granularity:
    * the duplicate decision runs on a windows projection
    * `(idCol, start, key)` whose row count ≈ token count; the
    * occurrence count is a hash aggregate with map-side partials (a
    * window duplicated 10⁸ times is one cell per map partition on
    * the wire, then one reduce cell); the hot window set (tiny — the
    * boilerplate passages themselves) joins back against the same
    * keys-only projection and folds to one `(id, drop-position set)`
    * row per affected doc, bounded by per-doc token count. Document
    * text crosses the wire exactly once — in the by-id join of that
    * keys-only drop set back to the ORIGINAL rows, with the
    * surviving tokens rebuilt in place from the row's own split (the
    * q94/q233 discipline; the first formulation posexploded every
    * token and re-aggregated per doc, which moved token text through
    * an extra exchange plus a per-doc sort). With `byHash = true` the window
    * key is the window text's SHA-256 (32-byte binary, the 2⁻¹²⁸
    * standard content-hash assumption) so window TEXT never crosses
    * the wire either — the 100 TB mode; exact-string mode exists for
    * oracle parity and tiny corpora. Window construction is map-only
    * (`slice` over the let-bound token array per start position —
    * O(k·n) chars per doc, the same work the suffix-array build pays
    * as O(n log n) comparisons). */
  def exactSubstrDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 2, byHash: Boolean = false): DataFrame = {
    require(k >= 2, "window size k must be at least 2 tokens")
    require(minCount >= 2, "minCount below 2 would erase every token")
    val base = df.select(col(idCol),
        split(trim(col(textCol)), "\\s+").as("_ws"))
      .withColumn("_n", size(col("_ws")))
    // one row per window start (1-based); docs shorter than k emit none
    val wins = base
      .select(col(idCol), col("_ws"),
        explode(when(col("_n") >= k, sequence(lit(1), col("_n") - (k - 1)))
          .otherwise(array().cast("array<int>"))).as("_s"))
      .select(col(idCol), col("_s"),
        concat_ws(" ", slice(col("_ws"), col("_s"), lit(k))).as("_w"))
    val winKeyed =
      if (byHash) wins.withColumn("_wk", unhex(sha2(col("_w"), 256))).drop("_w")
      else wins.withColumnRenamed("_w", "_wk")
    val dup = winKeyed.groupBy("_wk").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount).select("_wk")
    val dropIdx = winKeyed.join(dup, Seq("_wk"))
      .select(col(idCol),
        explode(sequence(col("_s"), col("_s") + (k - 1))).as("_p"))
      .groupBy(col(idCol)).agg(collect_set(col("_p")).as("_drop"))
    // ONE text-carrying join; n_tokens, n_removed and the surviving
    // tokens all rebuild from the row's own split (positions are
    // 1-based like the window starts; filter's index is 0-based).
    // Docs with NO non-whitespace character are guarded explicitly:
    // split of a trimmed empty (or tab-only — trim strips spaces
    // only) string yields phantom '' tokens, so n_tokens would read
    // ≥1 and clean_text a stray space for a doc with no tokens at all
    val hasTok = col(textCol).rlike("\\S")
    val arr = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), col(textCol))
      .join(dropIdx, Seq(idCol), "left")
      .select(col(idCol),
        when(hasTok, size(arr).cast("long")).otherwise(lit(0L))
          .as("n_tokens"),
        coalesce(size(col("_drop")), lit(0)).cast("long")
          .as("n_removed"),
        when(hasTok, concat_ws(" ", filter(arr, (_, i) =>
            col("_drop").isNull ||
              !array_contains(col("_drop"), i + 1))))
          .otherwise(lit("")).as("clean_text"))
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — cluster the embedding space, then dedup only
    * WITHIN clusters): coarse-quantize the corpus into `nlist` cells
    * (the shared [[Similarity.coarseCentroids]] quantizer — hash-rank
    * SAMPLED oracle tier by default, `production = true` for the
    * farthest-seeded Lloyd tier), compute exact pairwise cosine only
    * inside each cell, and drop every row that has a higher-cosine-
    * than-`tauMicro` duplicate with a SMALLER id (greedy keep-first —
    * deterministic, order-free, and exactly replayable). This is the
    * shape that makes embedding dedup tractable at 100 TB: the
    * quadratic is bounded per cell (`maxCellRows` fail-fast names an
    * over-full cell and points at the LSH tier, the
    * [[embeddingPairsExact]] contract), cells shrink as nlist grows,
    * and everything else is one map-only assignment pass + one
    * self-join on the cell key.
    *
    * Quantizer regimes (SCALE.md r13 measured the wall): at constant
    * cell size nlist must track n, so the FLAT assignment pass is
    * n·nlist·dim = quadratic in n — fine to ~10⁴ cells (≈5M rows at
    * the 488-row default cell), 52× over linear at 10M. Past that,
    * set `twoLevel = true` (requires `production`): the hierarchical
    * quantizer ([[Similarity.coarseCentroidsTwoLevel]] + the fused
    * [[graft.expressions.CellAssign2Expr]] kernel) assigns in
    * ≈2√nlist·dim per row and trains each level on bounded samples.
    * The in-cell dedup and every verdict rule are IDENTICAL — only
    * which rows share a cell changes (hierarchical argmin vs flat
    * argmin near super-cell boundaries); verdict equivalence is
    * spec-pinned on planted clusters, where co-located duplicates
    * land together under any centroid set.
    *
    * Cosine thresholding is an exact integer comparison:
    * `floor(cosine · 10⁶) >= tauMicro`. The PAIR dot products go
    * through [[embeddingPairsExact]]'s flat `graft_dot` (one
    * sequential dim-length sum — the form the q216 oracle replays as
    * a flat list_sum); only the CELL distances use the nested
    * nsub×dsub grouping (the q186 parity form), so `nsub` shapes
    * cell assignment and never the dedup verdicts. DuckDB replays
    * every cell assignment, every pair cosine, and every verdict
    * under exactly those two groupings. Approximation contract
    * (the paper's): duplicates that land in DIFFERENT cells are not
    * compared — recall improves with fewer/larger cells, cost with
    * more/smaller ones.
    *
    * Output: (vec_id, cell, kept) — every input row, kept = false
    * iff some same-cell row with a smaller id is tauMicro-similar. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nsub: Int, nlist: Int, tauMicro: Long,
      salt: String = "", production: Boolean = false, seed: Long = 42L,
      maxIter: Int = 8, samplePerCell: Int = 50,
      maxCellRows: Long = 10000L, twoLevel: Boolean = false): DataFrame = {
    require(dim >= 1 && nsub >= 1 && dim % nsub == 0,
      s"dim $dim not divisible by nsub $nsub")
    require(nlist >= 1, "nlist must be positive")
    require(tauMicro >= -1000000L && tauMicro <= 1000000L,
      s"tauMicro is a cosine in micro-units, got $tauMicro")
    // the two-level quantizer is Lloyd-trained at both levels, so it
    // is production-tier by construction; the SAMPLED tier stays flat
    // — its hash-rank centroids are what the q216 oracle replays
    require(!twoLevel || production,
      "semanticDedup: twoLevel is a production-tier arm (both levels " +
        "Lloyd-trained); the sampled oracle tier stays flat")
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    val dsub = dim / nsub
    lazy val cents = Similarity.coarseCentroids(corpus, idCol, vecCol,
      dim, nlist, production, seed, maxIter, samplePerCell, salt)
    // ONE map-only pass: argmin cell per row (bounded centroid
    // literal, no join); vectors stay attached for the in-cell pairs.
    // The cell-key repartition is load-bearing twice over: (1) it is
    // an exchange BARRIER, so the interpreted argmin HOF evaluates
    // once per row instead of being CollapseProject-inlined into
    // every consumer (both self-join sides, the guard counts, the
    // final projection — measured 5.5 s → the HOF re-ran ~4×); (2) it
    // pre-co-locates cells, so the in-cell self-join reuses ONE
    // exchange on both sides instead of shuffling twice.
    // production assigns through the native CellAssignExpr kernel
    // (vector read once); the sampled tier keeps the relational fold
    // whose nested sums are the oracle replay
    // twoLevel assigns through the fused hierarchical kernel
    // (≈2√nlist·dim per row — the >10⁴-cell scale arm, SCALE.md r13)
    val cellCol: Column =
      if (twoLevel)
        Similarity.cellAssign2Column(
          Similarity.coarseCentroidsTwoLevel(corpus, idCol, vecCol,
            dim, nlist, seed, maxIter, samplePerCell))(col(vecCol))
      else if (production)
        Similarity.cellAssignColumn(cents, dim)(col(vecCol))
      else array_min(Similarity.cellDistStructs(cents, nlist, dsub)(
        Similarity.asDouble(col(vecCol)))).getField("cell")
    // r15: the per-row argmin assignment (interpreted HOF on the
    // sampled tier) otherwise runs inside the single-row-group scan
    // task at bench SF — scale-gated fan-out first (Par.fanOut; a
    // no-op at production input sizes)
    val proj = corpus.select(col(idCol), col(vecCol))
    val small = graft.ops.Par.isSmall(proj)
    val fanned =
      if (small) proj.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, col(idCol))
      else proj
    val assigned0 = fanned
      .select(col(idCol).as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("_v"),
        cellCol.as("cell"))
      .repartition(col("cell"))
    // r16: under the same gate, materialize the assigned table ONCE
    // (the jaccardPairs small-input convention). The operator has five
    // consumer subtrees (the final keep projection, both in-cell
    // pair-join sides, the zero-norm filter, the guard count), and
    // ReuseExchange cannot fire across them — column pruning gives
    // each subtree a different exchange child — so the r15 plan
    // re-derived scan+fan-out+assignment five times (plan evidence:
    // 5 parquet-scan pairs / 32 Exchanges), re-running the
    // interpreted sampled-tier argmin per subtree. Past the gate —
    // the 100 TB path — the plan is unchanged: recompute-per-consumer,
    // no corpus-sized materialization.
    val assigned = if (small) assigned0.localCheckpoint() else assigned0
    // exact in-cell pairs (id_a < id_b), guarded by maxCellRows.
    // Zero-norm vectors are excluded from the pair computation BY
    // RULE, not by arithmetic accident: a vector with no direction
    // can certify nothing, and letting it reach the cosine division
    // is a DIVIDE_BY_ZERO error under ANSI / a NaN→0 cast artifact
    // without it. Excluded rows still appear in the output (kept —
    // nothing can prove them duplicates).
    val nonzero = assigned
      .filter(Similarity.norm(col("_v")) > lit(0.0))
    val pairs = embeddingPairsExact(nonzero, "vec_id", "_v", "cell",
      maxCellRows)
    val dropped = pairs
      .filter(!isnan(col("cosine")) && col("cosine").isNotNull &&
        floor(col("cosine") * lit(1e6)).cast(LongType) >= tauMicro)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("_dup", lit(true))
    assigned.select("vec_id", "cell")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("_dup").isNull.as("kept"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle a split boundary — a held-out document with a
    * train-side near-dup is contamination, not evaluation data (the
    * train/test leak Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", measures directly). Clusters come
    * from [[connectedComponents]] over the caller's candidate pairs;
    * every document in NO pair is its own singleton cluster
    * (cluster_id = its own id — the CC label convention). The split
    * verdict is assigned to the CLUSTER id by the same salted-SHA
    * bucket as [[TrainingOps.splitAssign]], so every member inherits
    * one verdict and the assignment is deterministic under reruns and
    * repartitioning. Scale shape: CC runs on the PAIR list (orders of
    * magnitude below the corpus; local union-find tier when it fits),
    * the corpus side is ONE left join against the label table
    * (broadcast when labels are small — they are pair-participant-
    * sized), and the bucket hash is map-only. Output:
    * (idCol, cluster_id, split). */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      fractions: Seq[(String, Double)], salt: String = "graft",
      ccMaxIter: Int = 20): DataFrame = {
    // ccMaxIter passes through to connectedComponents: near-dup pair
    // graphs of TEMPLATED corpora chain (page k near-dups page k+1
    // without page 1 near-dupping page n), and a chain's CC round
    // count is its diameter — callers on chained corpora must be able
    // to raise the cap instead of hitting the distributed tier's
    // fail-fast (found by the r13 10-stage ScaleSmoke, whose feed
    // accidentally planted a diameter-113 shift-chain)
    val labels = connectedComponents(pairs, maxIter = ccMaxIter)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val withCluster = docs.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    TrainingOps.splitAssign(withCluster, "cluster_id", fractions, salt)
      .select(col(idCol), col("cluster_id"), col("split"))
  }

  /** Near-dup CLUSTER-size profile — the dedup observability report
    * (how much of the corpus sits in 2-clusters vs mega-clusters
    * decides the near-dup threshold and the keep rule): connected
    * components over the pair list, then one row per cluster SIZE
    * with the cluster count and the documents covered; documents in
    * no pair report as size-1 singletons. Scale shape: CC runs on
    * the PAIR list only (the [[leakageSafeSplit]] argument), the
    * corpus contributes one anti-join to count singletons, and the
    * histogram is two tiny aggregates over cluster labels — never a
    * corpus-keyed window. Output: (cluster_size, n_clusters,
    * n_docs). */
  def dupClusterStats(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val multi = sizes.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
    val singletons = docs.select(col(idCol))
      .join(labels.select(col(idCol)), Seq(idCol), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"),
        col("n_clusters").as("n_docs"))
      .filter(col("n_clusters") > 0)
    multi.unionByName(singletons)
  }

  /** PARAGRAPH-granularity exact dedup (the Lee et al. 2022 /
    * Dolma-style sub-document pass): boilerplate paragraphs repeated
    * across a corpus — cookie banners, license footers, nav chrome —
    * survive whole-document dedup because the documents differ, yet
    * dominate the token distribution. Split each document on `sep`,
    * keep only the FIRST occurrence of every distinct trimmed
    * paragraph corpus-wide (order: lowest doc id, then paragraph
    * position — deterministic, rerun-stable), and reassemble each
    * document from its surviving paragraphs in original order.
    * Empty/whitespace paragraphs drop before deduplication.
    *
    * Scale shape — KEYS-ONLY throughout, paragraph text crosses the
    * wire exactly ONCE (the q94 line-dedup discipline): the exploded
    * scan projects to (hash, id, idx) BEFORE its aggregate, so the
    * winner election (min(struct(id, idx)) per sha2-256 content hash
    * — map-side combinable, one (id, idx) pair of state per distinct
    * paragraph, 32-byte keys on the exchange) and the per-doc
    * kept-index list (one array_agg over winner PAIRS, sized by the
    * doc's kept count) never carry text. The document side then
    * takes ONE join against that keys-only per-doc index list and
    * rebuilds in place from its OWN row — split, keep the positions
    * in the kept list, trim, re-join — so full text shuffles once
    * (the doc-id join) and only once. n_paras is computed map-only
    * from the same row (no count aggregate). No window, no
    * self-join. (The first formulation joined winners back onto the
    * exploded rows and re-aggregated them per doc: correct, but
    * paragraph text crossed the wire twice — once keyed by hash,
    * once by doc id.)
    *
    * `idCol` must uniquely identify rows (one row = one document —
    * the corpus-operator contract shared with [[leakageSafeSplit]]).
    * Output: (idCol, n_paras, n_kept, dedup_text) — every input doc
    * keeps a row; a doc whose every paragraph lost has n_kept = 0
    * and an empty dedup_text. */
  /** The default paragraph separator — ONE constant shared by
    * [[paragraphDedup]] and [[graft.pipeline.NightlyLoop]]'s scrub
    * stage, so the "what is a paragraph" notion cannot drift between
    * the operator and the loop's disabled-pass audit counters (both
    * split on `Pattern.quote` of this literal). */
  val DefaultParagraphSep: String = "\n\n"

  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      sep: String = DefaultParagraphSep): DataFrame = {
    val id = col(idCol)
    val sepQ = java.util.regex.Pattern.quote(sep)
    // keys-only winner election: text is hashed and DROPPED before
    // anything shuffles
    val paraKeys = df
      .select(id, posexplode(split(col(textCol), sepQ))
        .as(Seq("_idx", "_para")))
      .select(id, col("_idx"),
        sha2(trim(col("_para")), 256).as("_ph"),
        (trim(col("_para")) =!= "").as("_nonblank"))
      .filter(col("_nonblank"))
    val keptIdx = paraKeys.groupBy(col("_ph"))
      .agg(min(struct(id.as("_wid"), col("_idx").as("_widx")))
        .as("_w"))
      .groupBy(col("_w._wid").as(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_sort(collect_list(col("_w._widx"))).as("_kidx"))
    // ONE text-carrying join; rebuild + n_paras from the row itself
    val arr = split(col(textCol), sepQ)
    df.select(id, col(textCol))
      .join(keptIdx, Seq(idCol), "left")
      .select(id,
        size(filter(arr, p => trim(p) =!= "")).cast("long")
          .as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(array_join(transform(
            filter(arr, (p, i) => array_contains(col("_kidx"), i)),
            p => trim(p)), sep), lit(""))
          .as("dedup_text"))
  }
}
