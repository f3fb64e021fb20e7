package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus assembly operators ([EXT] — the pipeline steps
  * between "deduplicated documents" and "training shards" that every
  * large-scale LLM data pipeline needs):
  *
  *  - deterministic train/val/test split assignment,
  *  - token-budget packing (documents → fixed-budget packs),
  *  - benchmark decontamination (n-gram containment against eval sets).
  *
  * All three are declarative single-pass plans with engine-independent
  * (DuckDB-oracle-able) semantics.
  */
object TrainingOps {

  /** Overlapping token-window chunks (retrieval / context assembly):
    * chunk k covers tokens [k·stride+1, k·stride+window] with
    * stride = window − overlap, so consecutive chunks share `overlap`
    * tokens. Output: (id, chunk_id, chunk_text, n_tokens) — one row per
    * chunk, map-only (tokenize → window slices → posexplode; no
    * shuffle). Distinct from [[packByTokenBudget]]: packing groups
    * whole documents INTO budgets, chunking splits documents into
    * windows. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    // let-bind the token array (HOF args re-evaluate per reference)
    val chunks = aggregate(
      array(graft.llm.TextAnalysis.tokens(col(textCol))),
      lit(null).cast(ArrayType(StringType)),
      (_, w) => {
        val n = size(w)
        val nChunks = greatest(
          ceil((n - lit(overlap)).cast(DoubleType) / stride).cast(IntegerType),
          lit(1))
        transform(sequence(lit(0), nChunks - 1),
          k => concat_ws(" ", slice(w, k * stride + 1, lit(window))))
      })
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_tokens",
        graft.llm.TextAnalysis.tokenCountWs(col("chunk_text")))
  }

  /** Deterministic per-source downsampling to target keep-rates (domain
    * mixing): a row survives iff its salted-hash bucket falls under its
    * source's rate. Same salted-SHA bucket as [[splitAssign]] — the
    * sample is stable across reruns, partitionings, and engines
    * (`rand()`-based sampling draws a different corpus every run and
    * can't be audited). Sources missing from `rates` keep everything. */
  def sampleByDomain(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    val bucket = expr(
      s"cast(conv(substr(sha2(concat(cast(`$idCol` as string), ':', '$salt'), 256), " +
        "1, 15), 16, 10) as bigint) % 10000")
    val rate = rates.foldLeft(lit(1.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    // round, don't truncate: 0.3 * 10000 is 2999.999... in IEEE double,
    // and a truncating cast would keep one bucket fewer than every
    // engine that rounds on cast (DuckDB does) — breaking the
    // cross-engine stability this helper exists for
    df.filter(bucket < round(rate * 10000).cast(LongType))
  }

  /** Deterministic split assignment: `split` column ∈ `fractions` keys,
    * chosen by a salted SHA-256 bucket of the id — NOT `rand()`:
    *  - stable under reruns, repartitioning, and engine changes (the
    *    bucket is data-derived, so the same doc lands in the same split
    *    on any cluster, any day — rand() splits silently leak val into
    *    train on every recompute);
    *  - portable: bucket = first 15 hex chars of sha256("<id>:<salt>")
    *    mod 10000, reproducible in any engine with sha256.
    * Fractions are quantized to 1/10000 and must sum to 1. */
  def splitAssign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val bucket = expr(
      s"cast(conv(substr(sha2(concat(cast(`$idCol` as string), ':', '$salt'), 256), " +
        "1, 15), 16, 10) as bigint) % 10000")
    val thresholds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 10000).toInt)
    val assign = fractions.map(_._1).zip(thresholds).init
      .foldRight(lit(fractions.last._1)) { case ((name, th), rest) =>
        when(bucket < th, lit(name)).otherwise(rest)
      }
    df.withColumn("split", assign)
  }

  /** Canonical run-detection key for [[packByTokenBudget]]: Row.get
    * returns reference types whose `equals` diverges from SQL VALUE
    * equality for two cases — Array[Byte] (identity equals: every row
    * would look like its own run, silently zeroing all pack offsets)
    * and ±0.0 (sort treats them equal, boxed equals does not, breaking
    * the interior-only fragment invariant). Map both to value-equal
    * forms. */
  private def runKey(v: Any): Any = v match {
    case a: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    case d: java.lang.Double if d.doubleValue == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue == 0.0f => java.lang.Float.valueOf(0.0f)
    case x => x
  }

  /** Token-budget packing: assign each document to a pack of ~`budget`
    * tokens, filling packs in `orderCol` order WITHIN each `shardCol`
    * partition — `pack_id` is shard-local ((shard, pack_id) is the pack
    * key). A document is assigned to the pack where its running offset
    * starts: pack_id = floor((cumsum(tokens) − tokens) / budget).
    *
    * Scale shape — TWO-PHASE DISTRIBUTED PREFIX SUM, not a per-shard
    * running-sum window. A `Window.partitionBy(shard)` cumsum pushes a
    * whole shard through ONE task: with shard = language, the English
    * shard of a 100 TB corpus is tens of TB serialized through a single
    * thread. Instead:
    *
    *   1. range-partition + sort by (shard, order) — the one shuffle;
    *      a hot shard spans MANY contiguous partitions;
    *   2. pass 1: per partition, the token totals of its FIRST and
    *      LAST shard runs (data is sorted, so a shard that spans
    *      partitions is interior-only in the middle ones — first/last
    *      runs capture every fragment of every spanning shard). Collect
    *      is ≤ 2 rows per partition — bounded by the partition count,
    *      NOT by shard cardinality or shard size;
    *   3. driver: prefix-sum each spanning shard's fragment totals in
    *      partition order → a tiny (pid, shard) → start-offset map,
    *      broadcast;
    *   4. pass 2: per-partition streaming cumsum seeded from the
    *      broadcast offset; pack_id = floorDiv(offset_before_row,
    *      budget).
    *
    * Both passes share ONE RDD lineage, so the shuffle map output is
    * written once and reused — partition ids are consistent between
    * passes by construction (re-sampling range boundaries per pass
    * would not be). Only the reduce-side sort re-runs. This is genuine
    * per-partition imperative logic — the documented last-resort seam.
    *
    * Null `tokens` yield a null pack_id and do not advance the running
    * sum (matching SQL window-sum null semantics). `orderCol` ties are
    * resolved arbitrarily (as with any non-unique window ordering) —
    * use a unique order key for fully deterministic output. */
  def packByTokenBudget(df: DataFrame, shardCol: String, orderCol: String,
      tokens: Column, budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val nPart = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // withColumn-replace semantics for re-packing already-packed input
    val base = if (df.columns.contains("pack_id")) df.drop("pack_id") else df
    val staged = base.withColumn("_toks", tokens.cast(LongType))
      .repartitionByRange(nPart, col(shardCol), col(orderCol))
      .sortWithinPartitions(shardCol, orderCol)
    val schema = staged.schema
    val si = schema.fieldIndex(shardCol)
    val ti = schema.fieldIndex("_toks")
    val rdd = staged.rdd // single lineage: both passes reuse its shuffle

    // Pass 1: boundary-run totals. (pid, shard, total) for the first
    // and (if different) last shard run of each partition.
    val frags: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex {
      (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          var firstShard: Any = null; var firstTot = 0L
          var curShard: Any = null; var curTot = 0L
          var started = false
          var haveFirst = false
          it.foreach { r =>
            val s = runKey(r.get(si))
            if (!started || !java.util.Objects.equals(s, curShard)) {
              if (started && !haveFirst) {
                firstShard = curShard; firstTot = curTot; haveFirst = true
              }
              curShard = s; curTot = 0L; started = true
            }
            if (!r.isNullAt(ti)) curTot += r.getLong(ti)
          }
          if (!haveFirst) Iterator.single((pid, curShard, curTot)) // one run
          else Iterator((pid, firstShard, firstTot), (pid, curShard, curTot))
        }
    }.collect()

    // Driver: offsets only for shards that span >1 partition. A
    // spanning shard is interior-only in its middle partitions, so the
    // boundary runs above are ALL of its fragments.
    val offsets: Map[(Int, Any), Long] = frags
      .groupBy(_._2).iterator
      .filter(_._2.length > 1)
      .flatMap { case (shard, fs) =>
        val sorted = fs.sortBy(_._1)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3))
          .drop(1) // first fragment's offset is 0 — omit
          .map { case ((pid, _, _), off) => (pid, shard) -> off }
      }.toMap
    val bOffsets = spark.sparkContext.broadcast(offsets)

    // Pass 2: streaming per-partition cumsum seeded from the offsets.
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var curShard: Any = null; var started = false; var cum = 0L
      it.map { r =>
        val s = runKey(r.get(si))
        if (!started || !java.util.Objects.equals(s, curShard)) {
          curShard = s; started = true
          cum = bOffsets.value.getOrElse((pid, s), 0L)
        }
        val pack: Any =
          if (r.isNullAt(ti)) null
          else {
            val start = cum
            cum += r.getLong(ti)
            java.lang.Long.valueOf(Math.floorDiv(start, budget))
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pack)
      }
    }
    spark.createDataFrame(packed, schema.add("pack_id", LongType))
      .drop("_toks")
  }

  /** Budget-limited greedy corpus selection: walk the corpus in
    * `orderBy` order (best-first — e.g. quality descending with an id
    * tiebreak) and keep every document whose running token offset
    * STARTS inside `budget` — i.e. pack 0 of [[packByTokenBudget]]
    * with a single global shard. "Give me the best B tokens" is the
    * final step of most curation pipelines.
    *
    * Scale shape: the single-shard case is exactly the regime the
    * two-phase prefix sum exists for — a window formulation
    * (`sum().over(Window.orderBy(...))`) would serialize the WHOLE
    * CORPUS through one task; here the range partitioner spreads the
    * one shard across every partition, the driver sees ≤ 2
    * boundary-fragment rows per partition, and each task streams its
    * own slice. */
  def selectByTokenBudget(df: DataFrame, orderBy: Column, tokens: Column,
      budget: Long): DataFrame =
    packByTokenBudget(
        df.withColumn("_ord", orderBy).withColumn("_shard", lit(0)),
        "_shard", "_ord", tokens, budget)
      .filter(col("pack_id") === 0)
      .drop("_ord", "_shard", "pack_id")

  /** Deterministic stratified sample: exactly min(k, distinct ids) rows
    * per group — the ids carried by the k SMALLEST salted-SHA hashes,
    * via the bounded-state `graft_ksample` aggregate. Uniform (SHA
    * spreads ids evenly), rerun/partitioning/engine-stable (rand()
    * reservoirs are none of those), and hot-stratum-safe: per-group
    * state is ≤ k entries through partial/merge/final, where the
    * relational rank-window spec (q90's oracle) would buffer the
    * group's whole row set in one task. Output: (groupCols..., rank,
    * idCol-as-string), rank 1..k in hash order. */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int, salt: String = "smpl"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val idStr = col(idCol).cast(StringType)
    // Column functions, not interpolated SQL text: a quote in `salt`
    // or a backtick in `idCol` must reach the hash as DATA, never as
    // syntax (same 60-bit SHA-prefix hash either way).
    val h = conv(substring(sha2(concat(lit(salt), idStr), 256), 1, 15),
      16, 10).cast("bigint")
    val b = org.apache.spark.sql.GraftColumnBridge
    val agg = b.column(graft.expressions.KSampleAgg(
      b.expression(h), b.expression(idStr), k).toAggregateExpression())
    val g = groupCols.map(col)
    df.filter(col(idCol).isNotNull)
      .groupBy(g: _*)
      .agg(agg.as("_s"))
      .select((g :+ posexplode(col("_s")).as(Seq("_pos", "_e"))): _*)
      .select((g ++ Seq((col("_pos") + 1).cast(IntegerType).as("rank"),
        col("_e.v").as(idCol))): _*)
  }

  /** Temperature-weighted domain mixing with EXACT integer quotas:
    * domain d gets `target_d = floor(totalDocs · w_d / Σw)` documents,
    * where `w_d = round(1e6 · n_d^alpha)` — the standard
    * `p ∝ count^α` temperature rebalancing (α=1 proportional, α→0
    * uniform), quantized to long micropoints so the quota arithmetic
    * is exact integer division (a float Σw would be summation-order-
    * dependent and never engine-portable). The per-domain pick is the
    * target_d smallest salted-SHA hashes ([[sampleKPerGroup]]'s
    * bounded-state aggregate) — rerun/partitioning/engine-stable.
    *
    * Scale shape: per-domain counts are ONE bounded aggregate,
    * collected only up to `maxDomains` rows (fail-fast past it — the
    * driver never holds an unbounded domain list); quota math is
    * driver-side BigInt (exact, overflow-free); the pick is the
    * `graft_ksample` aggregate with per-group state ≤ max target,
    * never a rank window buffering a hot domain in one task; targets
    * join back as a broadcast ≤ maxDomains-row table. Floor quotas can
    * undershoot `totalDocs` by < #domains (largest-remainder
    * redistribution is deliberately NOT applied — it would make every
    * quota depend on every float remainder). Quotas are capped at the
    * ksample state bound (65536 per domain — fail-fast names the
    * remedy); for larger totals derive RATES from the same weights and
    * use [[sampleByDomain]] instead. The one non-integer step is
    * `pow(n, α)` itself: JVM `Math.pow` and the oracle's `pow` are
    * correctly-rounded-to-~1-ulp libm calls, so a quota could shift by
    * 1 only when 10⁶·n^α lands within an ulp of a half-integer —
    * the same measure-zero exposure q89/q99 accept for `ln`.
    *
    * Output: (sourceCol, rank, idCol-as-string), rank 1..target_d in
    * hash order; domains whose quota floors to 0 are absent. */
  def mixByTemperature(df: DataFrame, idCol: String, sourceCol: String,
      totalDocs: Long, alpha: Double, salt: String = "mix",
      maxDomains: Int = 10000): DataFrame = {
    require(totalDocs > 0, "totalDocs must be positive")
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val spark = df.sparkSession
    val rows = df.filter(col(idCol).isNotNull && col(sourceCol).isNotNull)
    val counts = rows.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .limit(maxDomains + 1).collect()
    require(counts.length <= maxDomains,
      s"mixByTemperature: more than maxDomains=$maxDomains distinct " +
        s"`$sourceCol` values — quota mixing needs a bounded domain " +
        "list; pre-aggregate sources or raise maxDomains explicitly")
    val weights = counts.map(r =>
      (r.get(0), math.round(1e6 * math.pow(r.getLong(1).toDouble, alpha))))
    val totalW = weights.iterator.map(w => BigInt(w._2)).sum
    val targets = weights
      .map { case (s, w) => (s, (BigInt(totalDocs) * w / totalW).toLong) }
      .filter(_._2 > 0)
    require(targets.nonEmpty,
      s"mixByTemperature: every domain quota floored to 0 — totalDocs=" +
        s"$totalDocs is too small for ${counts.length} domains")
    val maxT = targets.map(_._2).max
    // graft_ksample's hard state cap — fail HERE with the remedy named,
    // not inside KSampleAgg's constructor with a bare k-range message
    require(maxT <= 65536,
      s"mixByTemperature: largest domain quota $maxT exceeds the " +
        "ksample state cap (65536 per group); for totals this large " +
        "derive RATES from the same count^alpha weights and use " +
        "sampleByDomain instead")
    val srcType = df.schema(df.schema.fieldIndex(sourceCol)).dataType
    val tDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        targets.toSeq.map { case (s, t) => org.apache.spark.sql.Row(s, t) }, 1),
      StructType(Seq(StructField(sourceCol, srcType),
        StructField("_target", LongType))))
    sampleKPerGroup(rows, Seq(sourceCol), idCol, maxT.toInt, salt)
      .join(broadcast(tDf), Seq(sourceCol))
      .filter(col("rank") <= col("_target"))
      .drop("_target")
  }

  /** Deterministic GLOBAL uniform k-sample: the top k rows by salted
    * content hash — the corpus-wide companion of [[sampleKPerGroup]]
    * (eyeball sets, eval slices, "give me 10k random docs" pulls that
    * must be rerun/partitioning/engine-stable, which `rand()` is not).
    * Scale shape: `orderBy(hash).limit(k)` plans as
    * TakeOrderedAndProject — per-partition top-k heaps and a driver
    * merge of numPartitions×k rows — NEVER a global sort; k is the
    * only driver-memory bound. SHA-256 of salt:key makes the pick
    * uniform and collision-free for distinct keys. NULL-key rows are
    * excluded (the [[sampleKPerGroup]] convention): a null key hashes
    * to a null sort key, which ascending order would place FIRST —
    * every null row would silently crowd out the uniform pick. */
  def sampleGlobalK(df: DataFrame, keyCol: String, k: Int,
      salt: String = "smpl"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val h = sha2(concat(lit(salt + ":"), col(keyCol).cast(StringType)), 256)
    df.filter(col(keyCol).isNotNull)
      .withColumn("_h", h).orderBy(col("_h")).limit(k).drop("_h")
  }

  /** Benchmark decontamination: for each corpus document, the n-gram
    * CONTAINMENT of each probe (eval/benchmark) document —
    * |shingles(corpus) ∩ shingles(probe)| / |shingles(probe)| — kept
    * where ≥ `threshold`. Containment (not Jaccard) is the standard
    * contamination signal: a 10-token benchmark item fully quoted
    * inside a 10k-token document has tiny Jaccard but containment 1.
    *
    * Scale shape: the probe side is small by definition (benchmarks),
    * so its exploded shingle index is BROADCAST — the corpus never
    * shuffles for the join; only matched (corpus_id, probe_id) pairs
    * reach the counting aggregate. String shingles keep the operator
    * engine-portable; the broadcast is |probe shingles|, not corpus. */
  def decontaminate(corpus: DataFrame, probes: DataFrame,
      corpusId: String, probeId: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val cEx = corpus.select(col(corpusId).as("corpus_id"),
      explode(Dedup.shingles(col(textCol), shingleN)).as("g"))
    val pEx = probes.select(col(probeId).as("probe_id"),
        Dedup.shingles(col(textCol), shingleN).as("psh"))
      .select(col("probe_id"), size(col("psh")).as("probe_sz"),
        explode(col("psh")).as("g"))
    cEx.join(broadcast(pEx), Seq("g"))
      .groupBy("corpus_id", "probe_id", "probe_sz")
      .agg(count(lit(1)).as("inter"))
      .select(col("corpus_id"), col("probe_id"),
        (col("inter").cast(DoubleType) / col("probe_sz")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Decontamination, BEYOND-BROADCAST tier: same semantics and output
    * as [[decontaminate]] (TrainingOpsSpec pins exact parity), for the
    * regime where the probe-shingle index is too large to broadcast
    * (a full eval registry at 100 TB). The join becomes a SHUFFLE
    * join — which would exchange every corpus shingle — so a Bloom
    * filter over the probe shingles (built distributed via
    * treeAggregate, O(filter bits) on the driver regardless of probe
    * count) pre-filters the corpus stream map-side first:
    * corpus-side exchange volume drops to matching shingles + the fpp
    * tail. False positives are eliminated by the exact join; the
    * answer is identical, only the wire volume changes.
    *
    * Inserts and probes both use UTF-8 bytes (the probe path is the
    * native `graft_bloom_contains` expression, inside codegen). */
  def decontaminateBloom(corpus: DataFrame, probes: DataFrame,
      corpusId: String, probeId: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      fpp: Double = 0.01): DataFrame = {
    val cEx = corpus.select(col(corpusId).as("corpus_id"),
      explode(Dedup.shingles(col(textCol), shingleN)).as("g"))
    val pEx = probes.select(col(probeId).as("probe_id"),
        Dedup.shingles(col(textCol), shingleN).as("psh"))
      .select(col("probe_id"), size(col("psh")).as("probe_sz"),
        explode(col("psh")).as("g"))
    // Size the filter from a CHEAP upper bound — the total
    // (pre-distinct) shingle count, one map-only pass with no shuffle
    // — instead of an exact distinct count (which would cost a second
    // full distinct-shuffle pass). Oversizing by the duplication
    // factor only LOWERS the fpp (more bits per element, still
    // O(filter bits) on the driver); the exact join removes every
    // false positive regardless.
    // greatest(size, 0): size(NULL) is -1 under legacy sizeOfNull, so
    // null-text probes would each subtract 1 from the upper bound
    val expected = math.max(1000L, probes
      .select(coalesce(sum(greatest(size(Dedup.shingles(col(textCol),
        shingleN)), lit(0)).cast("long")), lit(0L)))
      .first().getLong(0))
    val pg = pEx.select("g").distinct()
    val bf = pg.rdd.map(_.getString(0)).treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(expected, fpp))(
      (f, s) => { f.putBinary(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val b = org.apache.spark.sql.GraftColumnBridge
    val contains = b.column(graft.expressions.BloomContains(
      b.expression(col("g")), bos.toByteArray))
    cEx.filter(contains)
      .join(pEx, Seq("g")) // shuffle join: the beyond-broadcast path
      .groupBy("corpus_id", "probe_id", "probe_sz")
      .agg(count(lit(1)).as("inter"))
      .select(col("corpus_id"), col("probe_id"),
        (col("inter").cast(DoubleType) / col("probe_sz")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Deterministic corpus vocabulary (tokenizer seeding / unigram
    * model export): the `size` most frequent whitespace tokens with
    * contiguous ids 0..V−1 assigned by (count desc, term) — the same
    * deterministic ordering on any engine or partitioning. Counting
    * is a map-side-combined aggregate over every token occurrence;
    * the cut is orderBy+limit (a TakeOrdered, never a global sort);
    * the id assignment IS a single-partition rank window — over at
    * most `size` rows, bounded by the PARAMETER, not the corpus (the
    * q60/q65 convention: windows are fine when the partition is
    * provably small). Output: (token_id, term, cnt). */
  def buildVocab(df: DataFrame, textCol: String,
      size: Int = 32768): DataFrame = {
    require(size > 0, "size must be positive")
    import org.apache.spark.sql.expressions.Window
    val top = TextAnalysis.topTerms(df, textCol, size)
    top.select(
      (row_number().over(Window.orderBy(col("cnt").desc, col("term")))
        - 1).as("token_id"),
      col("term"), col("cnt"))
  }

  /** Vocabulary coverage curve — the tokenizer-sizing diagnostic: for
    * each of the top-`size` terms (same ranking as [[buildVocab]]:
    * count desc, term), the CUMULATIVE fraction of all corpus token
    * occurrences a vocab cut at that rank would cover, in exact
    * integer micro-units (`coverage_micro = (10⁶ × cum_cnt) div
    * total` — long floor division, bit-replayable in any engine; a
    * double ratio would be neither). Read it to answer "how big must
    * the vocab be for ≥99% coverage" without re-running anything.
    *
    * Scale shape: counting is one map-side-combined aggregate; the
    * TakeOrdered cut bounds the window input to `size` rows (the
    * [[buildVocab]] driver-residency contract), so the running sum
    * never windows over corpus-sized data; the 1-row total broadcast
    * joins back. */
  def vocabCoverage(df: DataFrame, textCol: String,
      size: Int = 32768): DataFrame = {
    require(size > 0, "size must be positive")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val total = tok.agg(count(lit(1)).as("total"))
    val top = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(size)
    val w = Window.orderBy(col("cnt").desc, col("term"))
    top.select(row_number().over(w).as("rank"), col("term"), col("cnt"),
        sum(col("cnt")).over(w).as("cum_cnt"))
      .join(broadcast(total))
      .select(col("rank"), col("term"), col("cnt"), col("cum_cnt"),
        expr("(1000000 * cum_cnt) div total").as("coverage_micro"))
  }

  /** One counting round of byte-pair-encoding tokenizer training at
    * corpus scale: the `topK` most frequent ADJACENT CHARACTER pairs
    * across all whitespace-token occurrences (occurrence-weighted,
    * as BPE counts), ranked (count desc, pair) — the pair a BPE
    * trainer would merge next, plus the candidates behind it. Pairs
    * come from in-array substring windows (no char-array explosion);
    * single-char tokens contribute none. Map-only until the
    * map-side-combined pair count; top-k is a TakeOrdered. Iterating
    * real BPE training means re-tokenizing with the merged symbol
    * between rounds — this primitive is the per-round counting
    * kernel, the part that touches 100 TB. */
  def bpePairCounts(df: DataFrame, textCol: String,
      topK: Int = 100): DataFrame = {
    require(topK > 0, "topK must be positive")
    val pairs = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .select(explode(
        when(length(col("w")) >= 2,
          transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topK)
  }

  /** Symbol-boundary separator for the BPE word representation: each
    * word is stored as `SEP sym SEP SEP sym … SEP` — every symbol
    * carries its OWN leading and trailing separator, so the merge of
    * pair (l, r) is the plain string replacement
    * `SEP l SEP SEP r SEP → SEP l r SEP`, whose non-overlapping
    * left-to-right scan IS BPE's greedy merge order ("aaaa" with pair
    * (a,a) → [aa, aa]), and a symbol whose SUFFIX spells `l` can
    * never false-match (the pattern demands a boundary on both
    * sides). A single shared separator would break both properties:
    * consecutive merges would steal each other's boundary char, and
    * `…b SEP c…` would match pair (b, c) inside symbol "ab". U+001F
    * (the ASCII unit separator) never occurs in natural text; tokens
    * containing it are dropped (with the oracle in lockstep). */
  private val BpeSep = "\u001f"

  /** The distinct-word BPE working table: tokenize, drop empties and
    * separator-carrying tokens (oracle in lockstep), aggregate to
    * (sym, freq) with every symbol in its own `SEP…SEP` brackets
    * (see [[BpeSep]]). Text crosses the wire exactly once — this is
    * the only corpus-sized pass either trainer makes. */
  private def bpeWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(BpeSep))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(BpeSep),
        array_join(regexp_extract_all(col("w"), lit("."), lit(0)),
          BpeSep + BpeSep), lit(BpeSep)).as("sym"), col("freq"))

  /** The byte-level BPE working table: words become their UTF-8 byte
    * sequences as two-hex-digit symbols. NOTHING is dropped — hex
    * digits can never contain the separator, so every token the
    * corpus holds trains (the char-level table's separator filter
    * does not exist here; that is the point of byte level). */
  private def bpeByteWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(BpeSep),
        array_join(regexp_extract_all(
          lower(hex(encode(col("w"), "UTF-8"))), lit(".."), lit(0)),
          BpeSep + BpeSep), lit(BpeSep)).as("sym"), col("freq"))

  /** Raw adjacent-symbol pair occurrences of a BPE word table: one
    * row per pair occurrence carrying the word's frequency as `cnt`
    * (callers negate `freq` upstream for removal deltas). The symbol
    * array is staged as a projected attribute before the per-pair
    * lambda (the HOF re-evaluation discipline). */
  private def bpePairRows(words: DataFrame): DataFrame =
    words
      .select(col("freq"),
        split(col("sym").substr(lit(2), length(col("sym")) - 2),
          BpeSep + BpeSep).as("ls"))
      .select(col("freq"), explode(
        when(size(col("ls")) >= 2,
          transform(sequence(lit(0), size(col("ls")) - 2),
            j => struct(element_at(col("ls"), j + 1).as("l"),
              element_at(col("ls"), j + 2).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"),
        col("freq").as("cnt"))

  /** Iterative BPE tokenizer training — INCREMENTAL: a persistent
    * (pair → count) table is built once from the full word table,
    * then each merge round updates it with DELTAS computed from ONLY
    * the words that actually contain the just-merged pair. Merging
    * (l, r) changes the adjacent-pair multiset of exactly the words
    * whose symbol string contains `SEP l SEP SEP r SEP`, so the round
    * subtracts those words' old pairs, adds their merged forms'
    * pairs, and re-aggregates — per-round SHUFFLE cost is
    * O(affected words + pair-table size), not O(all words): the full
    * recount ([[trainBpeRecount]], retained as the differential
    * reference) re-explodes every pair of every word each round,
    * which at production vocab sizes (32k merges over 10⁸⁻⁹ distinct
    * words) is 32k corpus-pair shuffles. Late merge rounds touch few
    * words (rare pairs), so per-round cost FALLS with round number.
    * Both trainers produce the IDENTICAL merge table: same top-1
    * selection (count desc, left, right — a bounded 1-row
    * TakeOrdered), same greedy non-overlapping left-to-right
    * replacement ("aaaa" + (a,a) → [aa, aa]), same early stop when
    * no pair remains. Output: (merge_idx, left, right, cnt).
    *
    * Per-round job shape: 1 TakeOrdered over the checkpointed pair
    * table, then ONE pass over the affected words (filter + a single
    * select that explodes the pre-merge pairs at −freq and the
    * post-merge pairs at +freq together), one union+re-aggregate
    * over (pairs + delta) rows. The pair table is
    * localCheckpointed EVERY round (its union-with-delta lineage
    * would otherwise chain; it is distinct-adjacent-pair-sized,
    * orders of magnitude below the word table), the word table every
    * `checkpointEvery` rounds (each affected-filter re-derives at
    * most that many map-only replace passes — the pageRankConverge
    * cadence discipline). The merge list accumulates on the driver:
    * `numMerges` rows, parameter-bounded.
    *
    * Bounded-sample contract: production tokenizer trainers
    * (SentencePiece, HF tokenizers) train on a FEW-GB SAMPLE of the
    * corpus, not the corpus — at 100 TB, sample first with
    * [[Selection.sampleWeightedK]] (deterministic salted-SHA
    * Efraimidis–Spirakis, reproducible across runs) and train on the
    * sample; the incremental loop here then bounds the per-round
    * cost, and the one corpus-sized pass is the sampler's. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 5,
      localWordThreshold: Long = LocalWordThreshold): DataFrame =
    trainBpeFromWords(bpeWordTable(df, textCol), numMerges,
      checkpointEvery, localWordThreshold)

  /** Byte-level BPE training (the GPT-family lineage): the word table
    * holds each word's UTF-8 BYTES as two-hex-digit symbols
    * (`lower(hex(encode(w, 'UTF-8')))` chunked in twos — engine- and
    * oracle-portable), so the base alphabet is the 256 bytes and NO
    * token is ever dropped or UNK'd by construction (the char-level
    * trainer must drop separator-carrying tokens; bytes can never
    * collide with the separator). Merge selection, incremental pair
    * maintenance, and greedy left-to-right replacement are the SAME
    * loop as [[trainBpe]] — symbols are just hex strings. Serve with
    * [[byteBpeEncode]]. Output: (merge_idx, left, right, cnt) with
    * left/right/merged tokens as lowercase hex byte runs. */
  def trainBpeBytes(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 5,
      localWordThreshold: Long = LocalWordThreshold): DataFrame =
    trainBpeFromWords(bpeByteWordTable(df, textCol), numMerges,
      checkpointEvery, localWordThreshold)

  /** Small-table tier threshold for the trainers (r15, guide §1.2):
    * like [[Dedup.connectedComponents]]'s `localEdgeThreshold`, when
    * the DISTINCT-WORD table — orders of magnitude below the corpus,
    * and sample-bounded by the production contract anyway — fits
    * comfortably on the driver, the merge loop runs in process:
    * microseconds per round instead of 2-3 Spark jobs per round
    * (profiled r15: the per-round TakeOrdered + delta + checkpoint
    * jobs were ~90% of trainer wall at bench SF). Same selections,
    * same tie-breaks (UTF8 binary string order — Spark's, not
    * UTF-16's), same output, spec-pinned against the distributed
    * loop. Past the threshold the distributed loop runs unchanged. */
  private val LocalWordThreshold = 2000000L

  /** Driver-safety byte cap + count-job short-circuit for the trainer
    * tier (r16, r15 ADVICE): the optimizer's size estimate of the
    * PRE-checkpoint word table is checked BEFORE the count() action —
    * at production scale the estimate exceeds the cap immediately, so
    * the >threshold path no longer pays one count job per trainer
    * call; and a byte-fat word table still under the row threshold
    * (few distinct words, very long ones) refuses driver collection.
    * Bench/dev inputs are MBs — far under the cap, row count decides
    * exactly as in r15. */
  private val LocalWordBytesCap = BigInt(256L << 20)

  /** Collect the materialized (localCheckpointed) 2-col word table
    * when the tier gate passes: size estimate (no job — false at
    * production scale) → exact row count → collect. None past it.
    * `preCheckpoint` is the same plan BEFORE localCheckpoint, where
    * the lineage still carries the file-scan size estimate. */
  private[graft] def wordsIfSmall(words: DataFrame, preCheckpoint: DataFrame,
      threshold: Long,
      bytesCap: BigInt = LocalWordBytesCap): Option[Array[(String, Long)]] = {
    if (preCheckpoint.queryExecution.optimizedPlan.stats.sizeInBytes >
        bytesCap) return None
    if (words.count() <= threshold)
      Some(words.collect().map(r => (r.getString(0), r.getLong(1))))
    else None
  }

  /** UTF8 binary comparison — the collation Spark's ORDER BY applies
    * to strings; Java's UTF-16 compareTo disagrees for supplementary-
    * plane characters (the [[Dedup.componentsLocal]] lesson). */
  private def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** Split a bracketed symbol string back into its symbols (the
    * inverse of the word tables' array_join). */
  private def splitSym(sym: String): Array[String] =
    sym.substring(1, sym.length - 1)
      .split(java.util.regex.Pattern.quote(BpeSep + BpeSep), -1)

  /** Driver-local BPE merge loop over a collected word table —
    * bit-identical to the distributed incremental loop: exact
    * freq-weighted adjacent-pair counts recomputed per round, top-1
    * by (count desc, left, right) in UTF8 order, greedy
    * non-overlapping left-to-right replacement (String.replace —
    * the same literal scan-and-skip as Spark's UTF8String.replace),
    * early stop when no pair remains. */
  private def trainBpeLocal(words0: Array[(String, Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    val sep = BpeSep
    var ws = words0
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      ws.foreach { case (sym, f) =>
        val s = splitSym(sym)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          pc(k) = pc.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        var bl: String = null; var br: String = null; var bc = 0L
        pc.foreach { case ((l, r), c) =>
          if (bl == null || c > bc ||
            (c == bc && (utf8Lt(l, bl) ||
              (l == bl && utf8Lt(r, br))))) {
            bl = l; br = r; bc = c
          }
        }
        merges += ((i, bl, br, bc))
        val pat = sep + bl + sep + sep + br + sep
        val rep = sep + bl + br + sep
        ws = ws.map { case (sym, f) =>
          (if (sym.contains(pat)) sym.replace(pat, rep) else sym, f)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  private def trainBpeFromWords(words0: DataFrame, numMerges: Int,
      checkpointEvery: Int, localWordThreshold: Long): DataFrame = {
    require(numMerges >= 1, "numMerges must be at least 1")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")
    val spark = words0.sparkSession
    val sep = BpeSep
    var words = words0.localCheckpoint()
    wordsIfSmall(words, words0, localWordThreshold).foreach { ws =>
      import spark.implicits._
      return trainBpeLocal(ws, numMerges)
        .toDF("merge_idx", "left", "right", "cnt")
    }
    var pairCounts = bpePairRows(words)
      .groupBy("l", "r").agg(sum("cnt").as("cnt"))
      .filter(col("cnt") > 0)
      .localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, l, r, c))
        val pat = sep + l + sep + sep + r + sep
        val rep = sep + l + r + sep
        // the round's delta in ONE pass over the affected words: both
        // the pre-merge (−freq) and post-merge (+freq) pair multisets
        // explode from the same staged row — no second scan, no
        // intermediate checkpoint
        def pairStructs(ls: Column, cnt: Column): Column =
          when(size(ls) >= 2,
            transform(sequence(lit(0), size(ls) - 2),
              j => struct(element_at(ls, j + 1).as("l"),
                element_at(ls, j + 2).as("r"), cnt.as("cnt"))))
            .otherwise(
              array().cast("array<struct<l:string,r:string,cnt:bigint>>"))
        def symArr(sym: Column): Column =
          split(sym.substr(lit(2), length(sym) - 2), sep + sep)
        val delta = words.filter(col("sym").contains(pat))
          .select(col("freq"), symArr(col("sym")).as("lsOld"),
            symArr(replace(col("sym"), lit(pat), lit(rep))).as("lsNew"))
          .select(explode(concat(
            pairStructs(col("lsOld"), -col("freq")),
            pairStructs(col("lsNew"), col("freq")))).as("p"))
          .select(col("p.l").as("l"), col("p.r").as("r"),
            col("p.cnt").as("cnt"))
        pairCounts = pairCounts.unionByName(delta)
          .groupBy("l", "r").agg(sum("cnt").as("cnt"))
          .filter(col("cnt") > 0)
          .localCheckpoint()
        words = words.select(
          replace(col("sym"), lit(pat), lit(rep)).as("sym"), col("freq"))
        if ((i + 1) % checkpointEvery == 0) words = words.localCheckpoint()
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "left", "right", "cnt")
  }

  /** Laplace-smoothed micro-unit unigram scores for a piece-count
    * table: score(p) = round(ln((cnt+1)/(total+|pieces|))·1e6) — the
    * q89/q137 integer-LM discipline (smoothing keeps zero-count
    * pieces finite through EM; rounding BEFORE any sum keeps every
    * later comparison engine-exact). HALF_UP via BigDecimal — the
    * same rule Spark's `round()` applies, so the DuckDB oracle's
    * `round()` replays it. */
  private def unigramScores(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = counts.map(_._2).sum
    val nv = counts.size
    counts.map { case (p, c) =>
      val x = math.log((c + 1.0) / (total + nv.toDouble)) * 1e6
      (p, java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact)
    }
  }

  /** One hard-EM E-step: Viterbi-segment every distinct word under
    * the current scores (map-only native expression) and aggregate
    * freq-weighted piece counts — ≤|vocab| rows back to the driver
    * (parameter-bounded, the BPE merge-table residency contract). */
  private def unigramCounts(words: DataFrame,
      scored: Seq[(String, Long)], maxPieceLen: Int): Map[String, Long] = {
    val b = org.apache.spark.sql.GraftColumnBridge
    val segCol = b.column(graft.expressions.UnigramSegmentExpr(
      b.expression(col("w")), scored, maxPieceLen))
    words.select(explode(segCol).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Unigram-LM tokenizer training (the SentencePiece family sibling
    * of [[trainBpe]]; Kudo 2018, arXiv:1804.10959) — deterministic
    * HARD-EM with exact integer micro-unit log-likelihoods:
    *
    *  1. SEED: every substring of length ≤ `maxPieceLen` of the
    *     distinct-word table, freq-weighted; ALL single characters
    *     are kept (coverage guarantee — every word stays
    *     segmentable) plus the top `seedSize` multi-character pieces
    *     by (count desc, piece). Scores are Laplace micro-log-probs
    *     ([[unigramScores]]).
    *  2. EM ×`emRounds`: E-step Viterbi-segments every word under
    *     the current scores (`graft_unigram_segment`, map-only;
    *     ties break to the longer piece — an exact integer total
    *     order, so the oracle's relational DP replays it bit for
    *     bit); M-step recounts pieces over the best segmentations
    *     and rescores. The vocabulary SET is fixed through EM.
    *  3. PRUNE by likelihood LOSS: for each multi-char piece x, the
    *     alternative is segmenting x's own string with the vocab
    *     MINUS x (the standard alternative-segmentation
    *     approximation); Δ(x) = cnt(x)·(alt(x) − score(x)) is the
    *     likelihood change if x is removed — the `pruneCount` pieces
    *     with the LARGEST Δ (least harm; tie: piece asc) drop.
    *     Single characters never drop.
    *  4. One final recount + rescore over the pruned vocabulary.
    *
    * Output: (piece, cnt, score_micro) ordered by piece — the
    * trained model; [[unigramEncode]] serves it.
    *
    * Scale shape: text crosses the wire once (the distinct-word
    * aggregate); the seed substring explode is one
    * map-side-combined aggregate (≤ maxPieceLen·len pieces per
    * word); each EM round is ONE map-only segmentation pass + a
    * bounded count aggregate; scoring and pruning run on the driver
    * over the parameter-bounded piece table (seedSize + alphabet
    * rows — the same residency contract as the BPE merge table).
    * Like [[trainBpe]], production trains on a bounded
    * `sampleWeightedK` sample.
    *
    * Driver residency is alphabet + seedSize rows; the alphabet is
    * fail-fast-guarded (`maxAlphabet`) BEFORE any driver collect —
    * a binary-garbage corpus would otherwise explode the "alphabet"
    * to millions of codepoint rows (the q135/q85 guard discipline).
    * The prune step scores each candidate against the SHARED score
    * map with its own key masked (remove / score / re-put), so the
    * prune is O(|vocab| · len · maxPieceLen) driver work — at a
    * production 1M-piece seed the per-piece map-copy formulation
    * would be 10¹² entry copies. */
  def trainUnigram(df: DataFrame, textCol: String, seedSize: Int = 16,
      maxPieceLen: Int = 3, emRounds: Int = 2,
      pruneCount: Int = 4, maxAlphabet: Int = 1 << 16,
      localWordThreshold: Long = LocalWordThreshold): DataFrame = {
    require(seedSize >= 1 && emRounds >= 0 && pruneCount >= 0,
      "seedSize must be positive; emRounds/pruneCount non-negative")
    require(maxPieceLen >= 2, "maxPieceLen must be at least 2")
    require(maxAlphabet >= 1, "maxAlphabet must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val words0 = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val words = words0.localCheckpoint()
    // r16 small-table tier (see [[LocalWordThreshold]]; the r15
    // verdict's top item): with the word table collected, the seed
    // enumeration and every EM/prune recount run IN PROCESS through
    // the same static Viterbi kernel the distributed E-step expression
    // calls (UnigramSegmentExpr.viterbi — no duplicated kernel), so
    // the 3 seed actions + one job per EM round + the final recount
    // collapse to zero jobs. Substring enumeration mirrors Spark's
    // substr/length CODE-POINT semantics (NOT Java char units — a
    // supplementary-plane symbol is one character to both), and the
    // seed top-k orders by (cnt desc, piece asc) in UTF8 binary order,
    // exactly as the distributed orderBy does; spec-pinned local ≡
    // distributed. The EM/prune/scoring tail below is SHARED between
    // tiers — only where the piece counts come from differs.
    val localWords = wordsIfSmall(words, words0, localWordThreshold)
    val (singles, multi) = localWords match {
      case Some(ws) =>
        val sc = scala.collection.mutable.HashMap.empty[String, Long]
        ws.foreach { case (word, f) =>
          val cp = word.codePoints.toArray
          val lMax = math.min(maxPieceLen, cp.length)
          var l = 1
          while (l <= lMax) {
            var st = 0
            while (st + l <= cp.length) {
              val piece = new String(cp, st, l)
              sc(piece) = sc.getOrElse(piece, 0L) + f
              st += 1
            }
            l += 1
          }
        }
        def cpLen(s: String): Int = s.codePointCount(0, s.length)
        val (sg, mu) = sc.toArray.partition { case (p, _) => cpLen(p) == 1 }
        require(sg.length <= maxAlphabet,
          s"trainUnigram: corpus alphabet holds ${sg.length} distinct " +
            s"characters (> maxAlphabet=$maxAlphabet) — the vocabulary is " +
            "driver-resident at alphabet+seedSize rows, so an unnormalized " +
            "(binary/mojibake) corpus would blow the driver; clean the " +
            "corpus or raise maxAlphabet explicitly")
        (sg, mu.sortWith { case ((pa, ca), (pb, cb)) =>
          ca > cb || (ca == cb && utf8Lt(pa, pb))
        }.take(seedSize))
      case None =>
        val w = col("w")
        val subs = flatten(transform(
          sequence(lit(1), least(lit(maxPieceLen), length(w))),
          l => transform(sequence(lit(1), length(w) - l + 1),
            st => w.substr(st, l))))
        val subCounts = words
          .select(explode(subs).as("piece"), col("freq"))
          .groupBy("piece").agg(sum("freq").as("cnt"))
          .localCheckpoint() // feeds both the singles and the multi cut
        val nSingles = subCounts.filter(length(col("piece")) === 1).count()
        require(nSingles <= maxAlphabet,
          s"trainUnigram: corpus alphabet holds $nSingles distinct " +
            s"characters (> maxAlphabet=$maxAlphabet) — the vocabulary is " +
            "driver-resident at alphabet+seedSize rows, so an unnormalized " +
            "(binary/mojibake) corpus would blow the driver; clean the " +
            "corpus or raise maxAlphabet explicitly")
        (subCounts.filter(length(col("piece")) === 1)
          .collect().map(r => (r.getString(0), r.getLong(1))),
          subCounts.filter(length(col("piece")) > 1)
            .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
            .collect().map(r => (r.getString(0), r.getLong(1))))
    }
    // piece counts under the current scores: in-process Viterbi over
    // the collected words on the local tier, the distributed map-only
    // segmentation pass past the gate — same kernel, same fold
    def countsUnder(scored: Seq[(String, Long)]): Map[String, Long] =
      localWords match {
        case Some(ws) =>
          val sm = new java.util.HashMap[String, java.lang.Long]()
          scored.foreach { case (p, s) => sm.put(p, s) }
          val acc = scala.collection.mutable.HashMap.empty[String, Long]
          ws.foreach { case (word, f) =>
            val segs = graft.expressions.UnigramSegmentExpr
              .viterbi(word, sm, maxPieceLen)
            if (segs != null) {
              val it = segs.iterator()
              while (it.hasNext) {
                val p = it.next()
                acc(p) = acc.getOrElse(p, 0L) + f
              }
            }
          }
          acc.toMap
        case None => unigramCounts(words, scored, maxPieceLen)
      }
    var vocab: Seq[(String, Long)] =
      (singles ++ multi).sortBy(_._1).toSeq
    var scored = unigramScores(vocab)
    for (_ <- 1 to emRounds) {
      val cnts = countsUnder(scored)
      vocab = vocab.map { case (p, _) => (p, cnts.getOrElse(p, 0L)) }
      scored = unigramScores(vocab)
    }
    if (pruneCount > 0) {
      val sm = new java.util.HashMap[String, java.lang.Long]()
      scored.foreach { case (p, s) => sm.put(p, s) }
      val scoreOf = scored.toMap
      // prune candidates are multi-CHARACTER pieces in Spark's
      // length() sense (code points): a single supplementary-plane
      // symbol is Java-length 2 but one character — it belongs to the
      // never-dropped alphabet (the coverage guarantee), and treating
      // it as prunable tripped the unsegmentable-without-itself
      // invariant (r16; latent before the local tier's parity spec)
      val deltas = vocab.filter { case (p, _) =>
        p.codePointCount(0, p.length) > 1
      }.map { case (p, c) =>
        // mask p in the SHARED map (remove / score / re-put) — a
        // fresh per-piece HashMap copy is O(|vocab|) each, O(|vocab|²)
        // total: 10¹² entry copies at a 1M-piece production seed
        val s0 = sm.remove(p)
        val alt = graft.expressions.UnigramSegmentExpr
          .viterbiScore(p, sm, maxPieceLen)
        sm.put(p, s0)
        require(alt.isDefined, // singles retained ⇒ always segmentable
          s"unreachable: piece '$p' unsegmentable without itself")
        (p, c * (alt.get - scoreOf(p)))
      }
      val drop = deltas.sortBy { case (p, d) => (-d, p) }
        .take(pruneCount).map(_._1).toSet
      vocab = vocab.filterNot { case (p, _) => drop.contains(p) }
      scored = unigramScores(vocab)
      val fin = countsUnder(scored)
      vocab = vocab.map { case (p, _) => (p, fin.getOrElse(p, 0L)) }
      scored = unigramScores(vocab)
    }
    vocab.zip(scored).map { case ((p, c), (_, s)) => (p, c, s) }
      .toDF("piece", "cnt", "score_micro").orderBy("piece")
  }

  /** Encode whitespace tokens with a TRAINED unigram model — the
    * serving-side sibling of [[trainUnigram]] (as [[bpeEncode]] is
    * to [[trainBpe]]): the flat array of Viterbi-best pieces per
    * document, in token order. `model` is the trainer's
    * (piece, score_micro) output collected to the driver
    * (parameter-bounded). Out-of-alphabet tokens contribute no
    * pieces (their segmentation is NULL and filters out) — the same
    * drop contract as the trainer's word table. Map-only. */
  def unigramEncode(text: Column, model: Seq[(String, Long)],
      maxPieceLen: Int = 3): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    flatten(filter(transform(
      filter(TextAnalysis.tokens(text), t => t =!= ""),
      t => b.column(graft.expressions.UnigramSegmentExpr(
        b.expression(t), model, maxPieceLen))),
      a => a.isNotNull))
  }

  /** FULL-RECOUNT BPE training — the straightforward formulation that
    * re-explodes ALL adjacent pairs of ALL words every merge round.
    * Retained as the differential REFERENCE for [[trainBpe]] (the
    * spec asserts both emit the identical merge table) and as the
    * honest cost yardstick: per-round cost ∝ distinct words, fine at
    * demo merge counts, a scale-killer at production vocab sizes —
    * use [[trainBpe]]. */
  def trainBpeRecount(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 5): DataFrame = {
    require(numMerges >= 1, "numMerges must be at least 1")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")
    val spark = df.sparkSession
    val sep = BpeSep
    var words = bpeWordTable(df, textCol).localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = bpePairRows(words)
        .groupBy("l", "r").agg(sum("cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, l, r, c))
        words = words.select(
          replace(col("sym"), lit(sep + l + sep + sep + r + sep),
            lit(sep + l + r + sep)).as("sym"), col("freq"))
        if ((i + 1) % checkpointEvery == 0) words = words.localCheckpoint()
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "left", "right", "cnt")
  }

  /** Encode whitespace tokens of `text` with a TRAINED merge table —
    * the serving-side sibling of [[trainBpe]]: returns the flat
    * array<string> of BPE symbols for the document, in token order.
    * `merges` is the trainer's output collected to the driver (rank
    * order = merge_idx order), which is parameter-bounded — a vocab's
    * worth of rows, the same driver-residency contract as
    * [[buildVocab]]'s id assignment. Tokens containing the internal
    * separator are dropped exactly as the trainer drops them, so a
    * document re-encoded against its own training run segments every
    * token the trainer saw. Map-only: the merge table rides inside
    * the native `graft_bpe_encode` expression (no shuffle, no
    * broadcast join), and each token is encoded in one
    * ranks-actually-present pass (see
    * [[graft.expressions.BpeEncodeExpr]]). */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    flatten(transform(
      filter(TextAnalysis.tokens(text),
        w => w =!= "" && !w.contains(BpeSep)),
      w => b.column(
        graft.expressions.BpeEncodeExpr(b.expression(w), merges))))
  }

  /** Serve a [[trainBpeBytes]] model: every token of every word
    * encodes — NO filter, NO UNK (any byte is in the base alphabet;
    * an input the training corpus never saw just stays as its
    * single-byte hex pieces). Output pieces are lowercase hex byte
    * runs, exactly the trainer's merge outputs. */
  def byteBpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    flatten(transform(
      filter(TextAnalysis.tokens(text), w => w =!= ""),
      w => b.column(graft.expressions.BpeEncodeExpr(
        b.expression(w), merges, byteLevel = true))))
  }

  /** The WordPiece working table — [[bpeWordTable]]'s positional
    * sibling: the first character of each word stays bare, every
    * continuation character carries the `##` marker (the published
    * BERT/HF convention — a piece's identity INCLUDES whether it may
    * start a word, so "a" and "##a" are distinct vocabulary items and
    * merges never cross the word-initial boundary). Words containing
    * `#` are dropped alongside the separator-carrying ones (the `##`
    * marker must stay unambiguous; oracle in lockstep). */
  private def wpWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(BpeSep) &&
        !col("w").contains("#"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(BpeSep),
        array_join(transform(
          regexp_extract_all(col("w"), lit("."), lit(0)),
          (c, i) => when(i === 0, c).otherwise(concat(lit("##"), c))),
          BpeSep + BpeSep), lit(BpeSep)).as("sym"), col("freq"))

  /** Freq-weighted symbol occurrence counts of a WordPiece word
    * table — the score denominators. */
  private def wpSymFreqs(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(split(
        col("sym").substr(lit(2), length(col("sym")) - 2),
        BpeSep + BpeSep)).as("s"))
      .groupBy("s").agg(sum("freq").as("f"))

  /** Merged WordPiece symbol: the right side always carries the `##`
    * continuation marker (it sits at position ≥ 2 of some word — the
    * invariant [[wpWordTable]] establishes and merges preserve), the
    * merged piece inherits the LEFT side's word-initial-ness. */
  private def wpMerged(l: String, r: String): String =
    l + r.stripPrefix("##")

  /** The nano-unit score scale. 10⁹ (not the repo's usual 10⁶ micro
    * units) keeps BOTH sides of the exact integer floor-division
    * inside BIGINT with headroom: cnt·SCALE needs cnt ≤ 9.2·10⁹ and
    * f_l·f_r needs f ≤ 3.0·10⁹ — hence the 3·10⁹ total-occurrence
    * guard in [[trainWordPiece]]. */
  private val WpScoreScale = 1000000000L

  /** WordPiece tokenizer training (the THIRD dominant tokenizer
    * family next to [[trainBpe]] and [[trainUnigram]]; Schuster &
    * Nakajima 2012, the BERT vocabulary algorithm as published in
    * Devlin et al. 2019 §A and the HF tokenizers `WordPieceTrainer`
    * docs): the BPE merge loop with LIKELIHOOD ranking — each round
    * merges the adjacent pair maximizing
    * `score = count(pair) / (freq(left) · freq(right))`, i.e. the
    * pair whose parts co-occur most exclusively, not most often
    * (a rare pair whose parts appear nowhere else beats a frequent
    * pair of frequent parts).
    *
    * Determinism contract: scores compare as EXACT integer
    * nano-units — `score_nano = (cnt · 10⁹) div (f_l · f_r)`, all
    * BIGINT arithmetic, so the DuckDB oracle replays the selection
    * bit for bit (the q96/q104 integer-cross-multiplication
    * discipline); ties break by (cnt desc, left, right). Output:
    * (merge_idx, left, right, cnt, score_nano).
    *
    * Scale shape: full-recount formulation (the [[trainBpeRecount]]
    * analog) — per round ONE pair-count aggregate + ONE symbol-freq
    * aggregate over the distinct-word table and a 1-row TakeOrdered;
    * text crosses the wire once into the word table. WordPiece
    * denominators change globally at every merge (freq(l) and
    * freq(r) shrink, the merged symbol appears), so the incremental
    * pair-DELTA trick of [[trainBpe]] would still recompute every
    * affected score — recount is the honest default at demo merge
    * counts. Like every trainer here, production trains on a bounded
    * [[Selection.sampleWeightedK]] sample — enforced by a fail-fast
    * guard: total symbol occurrences must stay ≤ 3·10⁹ so the exact
    * nano-unit arithmetic cannot overflow BIGINT. */
  def trainWordPiece(df: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 5,
      localWordThreshold: Long = LocalWordThreshold): DataFrame = {
    require(numMerges >= 1, "numMerges must be at least 1")
    require(checkpointEvery >= 1, "checkpointEvery must be at least 1")
    val spark = df.sparkSession
    val sep = BpeSep
    val words0 = wpWordTable(df, textCol)
    var words = words0.localCheckpoint()
    // small-table tier (see [[LocalWordThreshold]]): the whole
    // likelihood loop on the collected word table, same exact
    // nano-score selection, same guard, spec-pinned vs distributed
    wordsIfSmall(words, words0, localWordThreshold).foreach { ws =>
      import spark.implicits._
      return trainWordPieceLocal(ws, numMerges)
        .toDF("merge_idx", "left", "right", "cnt", "score_nano")
    }
    val totRow = wpSymFreqs(words).agg(sum("f")).collect()
    val total =
      if (totRow.isEmpty || totRow(0).isNullAt(0)) 0L
      else totRow(0).getLong(0)
    require(total <= 3000000000L,
      s"trainWordPiece: $total symbol occurrences exceed the 3e9 " +
        "exact-nano-score bound - train on a bounded sample " +
        "(Selection.sampleWeightedK), the production contract")
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val freqs = wpSymFreqs(words)
      val top = bpePairRows(words)
        .groupBy("l", "r").agg(sum("cnt").as("cnt"))
        .join(freqs.select(col("s").as("l"), col("f").as("fl")), Seq("l"))
        .join(freqs.select(col("s").as("r"), col("f").as("fr")), Seq("r"))
        .select(col("l"), col("r"), col("cnt"),
          expr(s"(cnt * CAST($WpScoreScale AS BIGINT)) div (fl * fr)")
            .as("score_nano"))
        .orderBy(col("score_nano").desc, col("cnt").desc,
          col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c, s) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getLong(3))
        merges += ((i, l, r, c, s))
        words = words.select(
          replace(col("sym"), lit(sep + l + sep + sep + r + sep),
            lit(sep + wpMerged(l, r) + sep)).as("sym"), col("freq"))
        if ((i + 1) % checkpointEvery == 0) words = words.localCheckpoint()
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "left", "right", "cnt", "score_nano")
  }

  /** Driver-local WordPiece likelihood loop over a collected word
    * table — bit-identical to the distributed loop: exact
    * freq-weighted pair counts and symbol freqs recomputed per
    * round, `score_nano = (cnt·10⁹) div (f_l·f_r)` in Long
    * arithmetic (positive operands — Java `/` IS Spark's `div`
    * here), top-1 by (score desc, cnt desc, left, right) in UTF8
    * order, the same 3·10⁹ total-occurrence guard. */
  private def trainWordPieceLocal(words0: Array[(String, Long)],
      numMerges: Int): Seq[(Int, String, String, Long, Long)] = {
    val sep = BpeSep
    var ws = words0
    val total = ws.iterator.map { case (sym, f) =>
      splitSym(sym).length.toLong * f
    }.sum
    require(total <= 3000000000L,
      s"trainWordPiece: $total symbol occurrences exceed the 3e9 " +
        "exact-nano-score bound - train on a bounded sample " +
        "(Selection.sampleWeightedK), the production contract")
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val freqs = scala.collection.mutable.HashMap.empty[String, Long]
      ws.foreach { case (sym, f) =>
        val s = splitSym(sym)
        var j = 0
        while (j < s.length) {
          freqs(s(j)) = freqs.getOrElse(s(j), 0L) + f
          if (j < s.length - 1) {
            val k = (s(j), s(j + 1))
            pc(k) = pc.getOrElse(k, 0L) + f
          }
          j += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        var bl: String = null; var br: String = null
        var bc = 0L; var bs = 0L
        pc.foreach { case ((l, r), c) =>
          val s = (c * WpScoreScale) / (freqs(l) * freqs(r))
          if (bl == null || s > bs || (s == bs && (c > bc ||
            (c == bc && (utf8Lt(l, bl) ||
              (l == bl && utf8Lt(r, br))))))) {
            bl = l; br = r; bc = c; bs = s
          }
        }
        merges += ((i, bl, br, bc, bs))
        val pat = sep + bl + sep + sep + br + sep
        val rep = sep + wpMerged(bl, br) + sep
        ws = ws.map { case (sym, f) =>
          (if (sym.contains(pat)) sym.replace(pat, rep) else sym, f)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** The trained WordPiece VOCABULARY: replay the merge table over
    * the word table and emit the surviving symbols with their
    * freq-weighted counts — alphabet pieces (bare first chars +
    * `##`-chars) plus every merge product still present. This is the
    * table [[wordpieceEncode]] serves from; merges is the trainer's
    * parameter-bounded output collected to the driver. */
  def wordPieceVocab(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val sep = BpeSep
    var words = wpWordTable(df, textCol)
    merges.foreach { case (l, r) =>
      words = words.select(
        replace(col("sym"), lit(sep + l + sep + sep + r + sep),
          lit(sep + wpMerged(l, r) + sep)).as("sym"), col("freq"))
    }
    wpSymFreqs(words).select(col("s").as("piece"), col("f").as("cnt"))
  }

  /** Encode whitespace tokens of `text` with a trained WordPiece
    * vocabulary — greedy longest-match-first with `##` continuation
    * pieces and the `[UNK]` arm (the published BERT tokenizer,
    * served exactly like [[bpeEncode]]: the vocab rides inside the
    * native `graft_wordpiece_encode` expression, map-only, no
    * shuffle). Tokens containing `#` or the internal separator are
    * dropped exactly as the trainer drops them. */
  def wordpieceEncode(text: Column, vocab: Seq[String],
      maxWordLen: Int = 100, unk: String = "[UNK]"): Column = {
    val b = org.apache.spark.sql.GraftColumnBridge
    flatten(transform(
      filter(TextAnalysis.tokens(text),
        w => w =!= "" && !w.contains(BpeSep) && !w.contains("#")),
      w => b.column(graft.expressions.WordPieceEncodeExpr(
        b.expression(w), vocab, maxWordLen, unk))))
  }

  /** EXACT 1-based global rank in `orderCols` order, appended as a
    * `rank` column — the scale-safe replacement for a global
    * `row_number()` window, which serializes the whole frame through
    * ONE task (Spark's own "No Partition Defined for Window" warning).
    * Here the range partitioner spreads the sort across every
    * partition and the offsets come from a per-partition COUNT pass
    * (two jobs over one shuffle lineage — the [[packByTokenBudget]]
    * prefix-sum discipline specialized to counting): ≤ 1 count per
    * partition to the driver, never a row. Ties in `orderCols` rank
    * arbitrarily — pass a unique tie-break key (the same contract a
    * window `row_number` has). Rows with NULLs in `orderCols` sort by
    * Spark's null ordering (nulls first ascending) — align the oracle
    * side explicitly if nulls can occur. */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    require(!df.columns.contains("rank"),
      "globalRank appends `rank` — input already has that column")
    val spark = df.sparkSession
    val nPart = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // NOTE (r16): zipWithIndex is INHERENTLY two passes — a
    // per-partition count job (fired eagerly at construction) plus
    // the indexed map at execution — so the caller's upstream runs
    // twice through the range shuffle. An internal gated
    // localCheckpoint of `staged` was A/B'd and REVERTED: for the
    // common cheap-upstream callers (snake shards over a projected
    // cost table — q228 measured ~1.1-1.2× with the cut) the eager
    // materialization job costs more than the re-run it saves.
    // Callers whose upstream IS expensive cut the lineage themselves
    // before calling (perplexityBuckets' gated score table, q231's
    // gated train table) — that keeps the double pass trivial here.
    val staged = df.repartitionByRange(nPart, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = staged.schema
    val ranked = staged.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema.add("rank", LongType,
      nullable = false))
  }

  /** Serpentine (snake-draft) balanced sharding: order rows by cost
    * DESC (id tie-break), deal them across `nShards` boustrophedon —
    * 0..n−1, then n−1..0, alternating — the sorted-greedy LPT
    * approximation that keeps per-shard total cost within one
    * max-item of even, with NO sequential state: the shard is pure
    * arithmetic on the global rank (cycle parity flips the deal
    * direction), so assignment stays fully distributed —
    * [[globalRank]]'s range-parallel rank, never an unpartitioned
    * window, never a driver loop. This is the data-parallel worker
    * assignment that keeps per-worker token counts level when
    * documents are not truncated to one length. Output:
    * (idCol, cost, shard). */
  def snakeShards(df: DataFrame, idCol: String, cost: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val base = df.select(col(idCol), cost.cast(LongType).as("cost"))
    val ranked = globalRank(base, Seq(col("cost").desc, col(idCol)))
    val cyc = expr(s"(rank - 1) div $nShards")
    val off = (col("rank") - 1L) % nShards
    ranked.select(col(idCol), col("cost"),
      when(cyc % 2 === 0, off).otherwise(lit(nShards) - 1L - off)
        .cast(IntegerType).as("shard"))
  }

  /** Length-bucketed batching ("sorted batching"): order documents by
    * token count (desc, doc-id tie-break), cut the global order into
    * fixed-size batches, and account the padding each batch wastes —
    * the batch plan that minimizes pad tokens for fixed-shape training
    * steps (every batch pads to ITS max, and sorting puts like lengths
    * together). Scale shape: the global order is [[globalRank]]'s
    * range-parallel rank (never an unpartitioned window), and the
    * per-batch max is a window over exactly `batchSize` rows. Output:
    * (doc_id, n_tokens, batch_id, batch_max, pad_tokens). */
  def lengthBatching(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("doc_id"),
      size(split(trim(col(textCol)), "\\s+")).as("n_tokens"))
    val ranked = globalRank(base,
      Seq(col("n_tokens").desc, col("doc_id")))
    val w = Window.partitionBy("batch_id")
    ranked
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
      .withColumn("batch_max", max(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"), col("batch_id"),
        col("batch_max"),
        (col("batch_max") - col("n_tokens")).as("pad_tokens"))
  }
  /** Pack CONCATENATION — the step between [[packByTokenBudget]] and
    * the tokenizer: each (shard, pack) becomes ONE training sequence,
    * its documents joined in pack order by the end-of-document
    * sentinel `sep`. Per-group state is bounded by the pack BUDGET
    * (the parameter — a pack holds ≤ budget tokens by construction,
    * +1 doc for the straddler), never by shard or corpus size; the
    * in-pack order is made deterministic under any shuffle by an
    * array_sort on (order, text) structs. Documents whose `tokens`
    * is NULL carry a null pack_id and are excluded (they cannot be
    * budgeted). Output: (shardCol, pack_id, n_docs, n_tokens,
    * sequence), one row per pack. */
  def exportPackedSequences(df: DataFrame, shardCol: String,
      orderCol: String, textCol: String, tokens: Column, budget: Long,
      sep: String = "<|endoftext|>"): DataFrame = {
    val packed = packByTokenBudget(df, shardCol, orderCol, tokens, budget)
    packed.filter(col("pack_id").isNotNull)
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast(LongType)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(orderCol).as("o"),
            col(textCol).as("t")))),
          _.getField("t")), sep).as("sequence"))
  }

  /** PROVENANCE map for packed training sequences — the attribution
    * table [[exportPackedSequences]] deliberately does not carry:
    * one row per packed document with its pack coordinates, so any
    * token position inside a training sequence maps back to its
    * source document (takedown response, contamination tracing,
    * loss-masking by provenance, per-source data cards). Output:
    * (shardCol, pack_id, orderCol, doc_seq, token_offset, n_tokens)
    * where `doc_seq` is the document's 0-based position in its pack
    * and `token_offset` is the 0-based index of its FIRST token in
    * the pack's concatenated sequence — preceding documents' tokens
    * plus `sepTokens` per separator joint (1 for a single-token EOD
    * sentinel, matching [[exportPackedSequences]]'s default).
    * Documents whose `tokens` is NULL (null pack_id) are excluded,
    * mirroring the export. A document LARGER than the budget is NOT
    * excluded — [[packByTokenBudget]]'s offset semantics assign it
    * (whole) to the pack where its running offset starts, and the
    * export concatenates it there; its provenance row simply reports
    * `n_tokens > budget`. Callers needing an oversize exclusion
    * policy filter on `tokens` BEFORE packing, so export and
    * provenance stay in lockstep by construction.
    *
    * Scale shape: pack assignment is the two-phase distributed
    * prefix sum of [[packByTokenBudget]]; the offsets then need one
    * window PER (shard, pack_id) — bounded by a pack's document
    * count (≤ budget tokens), never a shard-sized window. */
  def packProvenance(df: DataFrame, shardCol: String, orderCol: String,
      tokens: Column, budget: Long, sepTokens: Int = 1): DataFrame = {
    require(sepTokens >= 0, "sepTokens must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val packed = packByTokenBudget(df, shardCol, orderCol, tokens, budget)
      .filter(col("pack_id").isNotNull)
      .withColumn("_t", tokens.cast(LongType))
    val w = Window
      .partitionBy(col(shardCol), col("pack_id")).orderBy(col(orderCol))
    packed
      .withColumn("doc_seq", row_number().over(w) - 1)
      .withColumn("token_offset",
        coalesce(sum(col("_t")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
          col("doc_seq").cast(LongType) * sepTokens)
      .select(col(shardCol), col("pack_id"), col(orderCol),
        col("doc_seq"), col("token_offset"), col("_t").as("n_tokens"))
  }

  /** Prefix-LM split (the PrefixLM / UL2 S-denoiser objective):
    * split each document's tokens at a DETERMINISTIC uniform point
    * k ∈ [1, n−1] — prefix conditions, suffix is the target. The
    * split point is a salted-SHA uniform scaled by (n−1), so the
    * same doc always splits identically (rerun/engine-stable, like
    * every sampling op here). Documents with fewer than 2 tokens
    * drop (no non-empty split exists). Map-only. Output:
    * (idCol, n_tokens, split_at, prefix_text, target_text). */
  def prefixLmSplit(df: DataFrame, idCol: String, textCol: String,
      salt: String = "plm"): DataFrame = {
    val id = col(idCol)
    df.select(id, prefixLmStruct(id, col(textCol), salt).as("_p"))
      .filter(col("_p.n_tokens") >= 2)
      .select(id, col("_p.n_tokens").as("n_tokens"),
        col("_p.split_at").as("split_at"),
        col("_p.prefix_text").as("prefix_text"),
        col("_p.target_text").as("target_text"))
  }

  /** Column core of [[prefixLmSplit]]: the whole split computed
    * in-row as struct(n_tokens, split_at, prefix_text, target_text),
    * for single-scan compositions that dispatch a per-row objective
    * ([[ul2Mixture]]). Rows with n_tokens < 2 carry a degenerate
    * struct (split_at 1 of an under-2-token doc) — callers filter on
    * `n_tokens >= 2` exactly as [[prefixLmSplit]] does. Token array
    * and split point are let-bound (nested 1-element aggregates) so
    * each evaluates once per row. */
  def prefixLmStruct(id: Column, text: Column,
      salt: String = "plm"): Column = {
    val w = graft.llm.TextAnalysis.tokens(text)
    val u = conv(substring(sha2(concat(lit(salt), lit(":"),
      id.cast(StringType)), 256), 1, 13), 16, 10).cast(LongType)
      .cast(DoubleType) / lit(4503599627370496.0) // [0, 1)
    val outT = "struct<n_tokens:int,split_at:int," +
      "prefix_text:string,target_text:string>"
    aggregate(array(w), lit(null).cast(outT), (_, wv) =>
      aggregate(
        array(struct(size(wv).as("n"),
          (lit(1) + floor(u * (size(wv) - 1)).cast(IntegerType))
            .as("k"))),
        lit(null).cast(outT),
        (_, s) => struct(
          s.getField("n").as("n_tokens"),
          s.getField("k").as("split_at"),
          array_join(slice(wv, lit(1), s.getField("k")), " ")
            .as("prefix_text"),
          array_join(slice(wv, s.getField("k") + 1,
            s.getField("n") - s.getField("k")), " ")
            .as("target_text"))))
  }

  /** FIM — fill-in-the-middle (Bavarian et al. 2022,
    * arXiv:2207.14255), DETERMINISTIC: per document three salted-SHA
    * uniforms pick (a) the objective arm — PSM with probability
    * fimRate/2, SPM with fimRate/2, plain otherwise (the paper's
    * joint PSM+SPM training at FIM rate `fimRate`) — and (b) two cut
    * points c1, c2 = floor(u·(n+1)) ∈ [0, n] over the whitespace
    * tokens; sorted they split the document into prefix/middle/
    * suffix (empty segments legal, exactly as the paper's
    * character-level spans). PSM emits `<PRE> p <SUF> s <MID> m`,
    * SPM emits `<SUF> s <PRE> p <MID> m` (middle last in both, so
    * the LM learns to generate it conditioned on both sides); plain
    * emits the token-rejoined text. The template concatenation is
    * FIXED (single-space around sentinels, so empty segments produce
    * a double space) — that keeps the string bit-portable across
    * engines. Docs with n < 2 tokens stay plain: no informative cut
    * exists. Map-only, one scan; the token array and cuts are
    * let-bound via 1-element aggregates so each evaluates once per
    * row. */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
      fimRate: Double = 0.9, salt: String = "fim"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0, s"fimRate $fimRate")
    val id = col(idCol)
    df.select(id, fimStruct(id, col(textCol), fimRate, salt).as("_f"))
      .select(id, col("_f.n_tokens").as("n_tokens"),
        col("_f.arm").as("arm"), col("_f.cut_lo").as("cut_lo"),
        col("_f.cut_hi").as("cut_hi"), col("_f.fim_text").as("fim_text"))
  }

  /** Column core of [[fimSplit]], for single-scan compositions. */
  def fimStruct(id: Column, text: Column, fimRate: Double,
      salt: String = "fim"): Column = {
    val w = graft.llm.TextAnalysis.tokens(text)
    def u(tag: String) = conv(substring(sha2(concat(lit(salt), lit(":"),
      lit(tag), lit(":"), id.cast(StringType)), 256), 1, 13), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(4503599627370496.0) // [0,1)
    val u0 = u("a"); val u1 = u("c1"); val u2 = u("c2")
    val outT = "struct<n_tokens:int,arm:string,cut_lo:int,cut_hi:int," +
      "fim_text:string>"
    aggregate(array(w), lit(null).cast(outT), (_, wv) =>
      aggregate(
        array(struct(size(wv).as("n"),
          floor(u1 * (size(wv) + 1)).cast(IntegerType).as("c1"),
          floor(u2 * (size(wv) + 1)).cast(IntegerType).as("c2"))),
        lit(null).cast(outT),
        (_, s) => {
          val n = s.getField("n")
          val lo = least(s.getField("c1"), s.getField("c2"))
          val hi = greatest(s.getField("c1"), s.getField("c2"))
          val isPlain = (n < 2) || (u0 >= lit(fimRate))
          val pre = array_join(slice(wv, lit(1), lo), " ")
          val mid = array_join(slice(wv, lo + 1, hi - lo), " ")
          val suf = array_join(slice(wv, hi + 1, n - hi), " ")
          struct(
            n.as("n_tokens"),
            when(isPlain, lit("plain"))
              .when(u0 < lit(fimRate / 2), lit("psm"))
              .otherwise(lit("spm")).as("arm"),
            when(isPlain, lit(0)).otherwise(lo).as("cut_lo"),
            when(isPlain, lit(0)).otherwise(hi).as("cut_hi"),
            when(isPlain, array_join(wv, " "))
              .when(u0 < lit(fimRate / 2),
                concat(lit("<PRE> "), pre, lit(" <SUF> "), suf,
                  lit(" <MID> "), mid))
              .otherwise(
                concat(lit("<SUF> "), suf, lit(" <PRE> "), pre,
                  lit(" <MID> "), mid)).as("fim_text"))
        }))
  }

  /** T5-style SPAN CORRUPTION (Raffel et al. 2020, arXiv:1910.10683
    * §3.1.4), DETERMINISTIC: each whitespace token masks iff its
    * salted-SHA uniform < `maskRate`; consecutive masked tokens form
    * a span; span k is replaced by `<extra_id_k>` in the input and
    * emitted as `<extra_id_k> tokens…` in the target, which ends
    * with the closing sentinel `<extra_id_n>` — the standard
    * denoising-objective pair. Hash-determinism (vs the paper's RNG)
    * makes the corruption reproducible across reruns, partitionings,
    * and engines — the same corpus always yields the same pairs, so
    * checkpoint-resumed preprocessing never forks the dataset.
    *
    * ONE fold over the token array per row (map-only, no explode, no
    * shuffle): the (masked?, span-count, input, target) state carries
    * through an `aggregate` HOF; per-row cost ∝ document tokens.
    * Documents with no tokens (empty/blank text) drop. Output:
    * (idCol, n_spans, input_text, target_text). */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      maskRate: Double = 0.15, salt: String = "t5"): DataFrame = {
    val id = col(idCol)
    df.filter(trim(col(textCol)) =!= "")
      .select(id,
        spanCorruptStruct(id, col(textCol), maskRate, salt).as("_sc"))
      .select(id,
        col("_sc.n_spans").as("n_spans"),
        col("_sc.input_text").as("input_text"),
        col("_sc.target_text").as("target_text"))
  }

  /** Column core of [[spanCorrupt]]: the whole corruption computed
    * in-row as struct(n_spans, input_text, target_text), for
    * single-scan compositions that dispatch a per-row objective
    * ([[ul2Mixture]]). Callers exclude blank-text rows exactly as
    * [[spanCorrupt]] does. The fold state is let-bound (a 1-element
    * aggregate) so the HOF runs once per row however many fields the
    * caller reads. */
  def spanCorruptStruct(id: Column, text: Column,
      maskRate: Double = 0.15, salt: String = "t5"): Column = {
    require(maskRate > 0.0 && maskRate < 1.0,
      s"maskRate must be in (0, 1), got $maskRate")
    val rateMicro = math.round(maskRate * 4503599627370496.0) // ·2^52
    val w = graft.llm.TextAnalysis.tokens(text)
    // indexed tokens; the mask decision is a 52-bit salted hash per
    // (doc, position) — exact integer compare, engine-portable
    def masked(pos: Column): Column =
      conv(substring(sha2(concat(lit(salt), lit(":"),
        id.cast(StringType), lit(":"), pos.cast(StringType)), 256),
        1, 13), 16, 10).cast(LongType) < rateMicro
    val idx = transform(w, (t, i) => struct(t.as("t"), masked(i).as("m")))
    val zero = struct(lit(false).as("prev"), lit(0).as("k"),
      lit("").as("inp"), lit("").as("tgt"))
    val folded = aggregate(idx, zero, (acc, e) => {
      val sent = concat(lit("<extra_id_"), acc.getField("k").cast(StringType),
        lit(">"))
      struct(
        e.getField("m").as("prev"),
        when(e.getField("m") && !acc.getField("prev"),
          acc.getField("k") + 1).otherwise(acc.getField("k")).as("k"),
        when(e.getField("m") && !acc.getField("prev"),
            concat(acc.getField("inp"), lit(" "), sent))
          .when(e.getField("m"), acc.getField("inp"))
          .otherwise(concat(acc.getField("inp"), lit(" "), e.getField("t")))
          .as("inp"),
        when(e.getField("m") && !acc.getField("prev"),
            concat(acc.getField("tgt"), lit(" "), sent, lit(" "),
              e.getField("t")))
          .when(e.getField("m"),
            concat(acc.getField("tgt"), lit(" "), e.getField("t")))
          .otherwise(acc.getField("tgt"))
          .as("tgt"))
    })
    val outT = "struct<n_spans:int,input_text:string,target_text:string>"
    aggregate(array(folded), lit(null).cast(outT), (_, sc) =>
      struct(
        sc.getField("k").as("n_spans"),
        ltrim(sc.getField("inp")).as("input_text"),
        ltrim(concat(sc.getField("tgt"), lit(" <extra_id_"),
          sc.getField("k").cast(StringType), lit(">")))
          .as("target_text")))
  }

  /** SINGLE-SCAN UL2 mixture-of-denoisers (arXiv:2205.05131): every
    * doc deterministically draws an objective via [[splitAssign]]
    * (default R 50% / S 25% / X 25%), then ONE pass over the corpus
    * dispatches per row — R/X run [[spanCorruptStruct]] at their
    * rates, S runs [[prefixLmStruct]] — instead of filtering and
    * re-scanning the corpus once per arm (3 scans). The CASE
    * evaluates only the taken arm's fold per row, so the work is the
    * same as the per-arm formulation, minus two corpus scans. Arm
    * validity matches the standalone ops: R/X drop blank-text rows,
    * S drops docs under 2 tokens. Output:
    * (objective, idCol, input_text, target_text).
    *
    * The corpus is SPREAD across the session's shuffle parallelism
    * before the dispatch projection (the minhashCandidates BEFORE
    * exchange): collapsing three scans into one concentrated the
    * whole fold workload onto however many input splits the source
    * happens to have — a small parquet is ONE split, so the r9 bench
    * measured the "faster" single-scan form 1.4× SLOWER than three
    * arm-filtered scans (which at least ran as three parallel
    * stages). With the spread, the single scan is 1.6× faster than
    * the three-arm form and 2.1× faster than unspread
    * (graft.MicroBench ul2: 0.55 vs 0.85 vs 1.17 s min-of-5,
    * same host). At 100 TB the exchange ships (id, text) once —
    * noise against the per-row fold CPU it parallelizes, and the
    * shape no longer depends on the source's split geometry. */
  def ul2Mixture(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)] =
        Seq("r" -> 0.5, "s" -> 0.25, "x" -> 0.25),
      rRate: Double = 0.15, xRate: Double = 0.5,
      assignSalt: String = "ul2", rSalt: String = "t5r",
      sSalt: String = "plm", xSalt: String = "t5x",
      /** diagnostic knob: `false` reproduces the unspread baseline
        * (graft.MicroBench's A/B control) — production keeps the
        * spread. Output is identical either way. */
      spread: Boolean = true): DataFrame = {
    require(weights.map(_._1).sorted == Seq("r", "s", "x"),
      "weights must name exactly the objectives r, s, x")
    val id = col(idCol)
    val text = col(textCol)
    val base = df.select(id, text)
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val asg = splitAssign(if (spread) base.repartition(p) else base,
      idCol, weights, assignSalt)
    val pairT = "struct<input_text:string,target_text:string>"
    // uniform (input, target) pair per arm; the inner struct is
    // let-bound so each arm's fold runs once per row
    def pairOf(inner: Column, inField: String): Column =
      aggregate(array(inner), lit(null).cast(pairT), (_, p) =>
        struct(p.getField(inField).as("input_text"),
          p.getField("target_text").as("target_text")))
    asg
      .filter(when(col("split") === "s",
          size(graft.llm.TextAnalysis.tokens(text)) >= 2)
        .otherwise(trim(text) =!= ""))
      .select(col("split").as("objective"), id,
        when(col("split") === "r",
            pairOf(spanCorruptStruct(id, text, rRate, rSalt),
              "input_text"))
          .when(col("split") === "x",
            pairOf(spanCorruptStruct(id, text, xRate, xSalt),
              "input_text"))
          .otherwise(pairOf(prefixLmStruct(id, text, sSalt),
            "prefix_text"))
          .as("_p"))
      .select(col("objective"), id,
        col("_p.input_text").as("input_text"),
        col("_p.target_text").as("target_text"))
  }

  // ──────────────────────────────────────────────────────────────────
  // Tokenizer model persistence: the artifact a training run actually
  // ships. All three families train here and serve through native
  // expressions taking in-memory models; these tables are the durable
  // form — train once, read the model back in any later session (the
  // nightly loop, a serving job), encode identically. Layout:
  //   <prefix>_tok_rows(idx, a, b, num)  — family-shaped rows in idx
  //                                        order (merge order matters)
  //   <prefix>_tok_meta(family, n_rows, p1, s1) — written LAST, so a
  //     torn write leaves no valid meta and readers fail fast instead
  //     of serving a truncated model (write-then-record, the B2
  //     discipline); n_rows re-checked at read for the same reason.
  // Single-writer contract: tokenizer training is an offline op — a
  // concurrent writer to the same prefix is a pipeline bug, not a
  // race to fence (unlike the nightly signature/ANN stores).

  sealed trait TokenizerModel
  final case class BpeModel(merges: Seq[(String, String)])
    extends TokenizerModel
  final case class ByteBpeModel(merges: Seq[(String, String)])
    extends TokenizerModel
  final case class WordPieceModel(vocab: Seq[String],
    maxWordLen: Int = 100, unk: String = "[UNK]") extends TokenizerModel
  final case class UnigramModel(pieces: Seq[(String, Long)],
    maxPieceLen: Int = 3) extends TokenizerModel

  /** Encode with any family's model — the one serving entry point, so
    * pipeline code is family-agnostic after training. */
  def encodeWith(text: Column, model: TokenizerModel): Column =
    model match {
      case BpeModel(m) => bpeEncode(text, m)
      case ByteBpeModel(m) => byteBpeEncode(text, m)
      case WordPieceModel(v, maxLen, unk) =>
        wordpieceEncode(text, v, maxLen, unk)
      case UnigramModel(p, maxLen) => unigramEncode(text, p, maxLen)
    }

  def writeTokenizer(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, model: TokenizerModel): Unit = {
    import spark.implicits._
    val (family, rows, p1, s1) = model match {
      case BpeModel(m) =>
        ("bpe", m.zipWithIndex.map { case ((l, r), i) =>
          (i, l, Option(r), Option.empty[Long]) }, 0, "")
      case ByteBpeModel(m) =>
        ("bpe_bytes", m.zipWithIndex.map { case ((l, r), i) =>
          (i, l, Option(r), Option.empty[Long]) }, 0, "")
      case WordPieceModel(v, maxLen, unk) =>
        ("wordpiece", v.zipWithIndex.map { case (p, i) =>
          (i, p, Option.empty[String], Option.empty[Long]) }, maxLen, unk)
      case UnigramModel(p, maxLen) =>
        ("unigram", p.zipWithIndex.map { case ((pc, sc), i) =>
          (i, pc, Option.empty[String], Option(sc)) }, maxLen, "")
    }
    val rowsT = s"${tablePrefix}_tok_rows"
    val metaT = s"${tablePrefix}_tok_meta"
    // fresh write: meta dropped FIRST (no valid meta during the write),
    // rows second; then rows written, meta recorded last
    graft.io.Sinks.dropManagedTable(spark, metaT)
    graft.io.Sinks.dropManagedTable(spark, rowsT)
    rows.toDF("idx", "a", "b", "num").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(rowsT)
    Seq((family, rows.size, p1, s1)).toDF("family", "n_rows", "p1", "s1")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(metaT)
  }

  def readTokenizer(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): TokenizerModel = {
    val meta = spark.table(s"${tablePrefix}_tok_meta").head()
    val family = meta.getAs[String]("family")
    val nRows = meta.getAs[Int]("n_rows")
    val rows = spark.table(s"${tablePrefix}_tok_rows")
      .orderBy("idx").collect()
    require(rows.length == nRows,
      s"readTokenizer: $tablePrefix holds ${rows.length} rows but meta " +
        s"records $nRows — truncated or torn model store; retrain or " +
        "rewrite it")
    family match {
      case "bpe" => BpeModel(rows.map(r =>
        (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq)
      case "bpe_bytes" => ByteBpeModel(rows.map(r =>
        (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq)
      case "wordpiece" => WordPieceModel(
        rows.map(_.getAs[String]("a")).toSeq,
        meta.getAs[Int]("p1"), meta.getAs[String]("s1"))
      case "unigram" => UnigramModel(
        rows.map(r => (r.getAs[String]("a"), r.getAs[Long]("num"))).toSeq,
        meta.getAs[Int]("p1"))
      case other => throw new IllegalStateException(
        s"readTokenizer: unknown family '$other' in $tablePrefix")
    }
  }

  /** Render per-conversation chat-template training text — the SFT
    * data-assembly step: turns group by `convCol`, sort
    * DETERMINISTICALLY inside the aggregate by (`orderCol`,
    * `tieCol`) via `array_sort` over structs (never relying on
    * arrival order), and concatenate as
    * `<|role|>content<|end|>` per turn. NULL roles/contents render
    * as empty strings rather than nulling the whole conversation
    * (one damaged turn must not erase the transcript — it stays
    * auditable in place). Output: (conv id, n_turns, conversation).
    *
    * Scale shape: ONE hash aggregate; per-conversation state is the
    * turn list — bounded by the conversation length (the natural
    * unit a trainer consumes; a million-turn "conversation" is
    * upstream garbage this op should not paper over). For untrusted
    * conversation keys set `maxTurns`: a keys-only count aggregate
    * FAILS FAST naming the worst offender (the funnel / asofJoin
    * convention, ≤1 row ever collected) BEFORE any turn list is
    * buffered — split or drop such conversations upstream, or raise
    * the cap deliberately. */
  def renderChatTemplate(df: DataFrame, convCol: String,
      orderCol: String, tieCol: String, roleCol: String,
      contentCol: String, maxTurns: Option[Long] = None): DataFrame = {
    maxTurns.foreach { cap =>
      require(cap > 0, "maxTurns must be positive")
      val offender = df.groupBy(col(convCol))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > cap)
        .orderBy(col("_n").desc).limit(1).collect()
      offender.headOption.foreach { r =>
        throw new IllegalArgumentException(
          s"renderChatTemplate: conversation (${r.get(0)}) carries " +
            s"${r.getLong(1)} turns, above maxTurns=$cap — its whole " +
            "turn list would buffer in one aggregate state; split or " +
            "drop it upstream, or raise the cap deliberately")
      }
    }
    df.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(struct(
          col(orderCol).as("o"), col(tieCol).as("t"),
          concat(lit("<|"), coalesce(col(roleCol), lit("")),
            lit("|>"), coalesce(col(contentCol), lit("")),
            lit("<|end|>")).as("s")))).as("_turns"))
      .withColumn("conversation",
        concat_ws("", transform(col("_turns"), _.getField("s"))))
      .drop("_turns")
  }

  /** Loss-mask spans for [[renderChatTemplate]] output — the other
    * half of SFT data assembly: training masks the loss to the
    * ASSISTANT turns, so the trainer needs, per conversation, the
    * character offsets of each `lossRole` turn inside the rendered
    * string. Span contract: `[start_char, end_char)` 0-based
    * codepoint offsets covering the turn's CONTENT plus its
    * `<|end|>` marker (the usual "train on the reply and its stop
    * token" recipe) — the `<|role|>` prefix stays masked. Offsets are
    * exact integers over the SAME deterministic (order, tie) turn
    * sort as the renderer, so `substring(conversation, start+1,
    * end-start)` is the turn's `content<|end|>` verbatim (the spec
    * pins this parity).
    *
    * Scale shape: ONE hash aggregate (the renderer's), offsets folded
    * inside the aggregate by a single HOF pass over the sorted turn
    * list — no window over turns, no second shuffle, no join back to
    * the rendered string. Conversations with no `lossRole` turn emit
    * no rows (nothing to train on). Same `maxTurns` fail-fast as the
    * renderer.
    *
    * Output: (conv id, n_turns, span_idx, start_char, end_char). */
  def sftLossSpans(df: DataFrame, convCol: String, orderCol: String,
      tieCol: String, roleCol: String, contentCol: String,
      lossRole: String = "assistant",
      maxTurns: Option[Long] = None): DataFrame = {
    maxTurns.foreach { cap =>
      require(cap > 0, "maxTurns must be positive")
      val offender = df.groupBy(col(convCol))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > cap)
        .orderBy(col("_n").desc).limit(1).collect()
      offender.headOption.foreach { r =>
        throw new IllegalArgumentException(
          s"sftLossSpans: conversation (${r.get(0)}) carries " +
            s"${r.getLong(1)} turns, above maxTurns=$cap — its whole " +
            "turn list would buffer in one aggregate state; split or " +
            "drop it upstream, or raise the cap deliberately")
      }
    }
    // the struct's THIRD field is the rendered piece — the SAME
    // expression, in the SAME sort position, as renderChatTemplate's:
    // on (order, tie) ties the renderer orders turns by the rendered
    // string, and a spans-side sort on (role, content) instead can
    // DIVERGE there (e.g. roles "a"/"ab": 'b' sorts before '|'), which
    // would silently shift every later offset. Sorting on the piece
    // keeps the two folds in lockstep by construction; role/content
    // ride behind it for the offset arithmetic.
    val grouped = df.groupBy(col(convCol).as("conv_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(struct(
          col(orderCol).as("o"), col(tieCol).as("t"),
          concat(lit("<|"), coalesce(col(roleCol), lit("")),
            lit("|>"), coalesce(col(contentCol), lit("")),
            lit("<|end|>")).as("s"),
          coalesce(col(roleCol), lit("")).as("r"),
          coalesce(col(contentCol), lit("")).as("c")))).as("_turns"))
    // one fold over the sorted turns: accumulate the running offset
    // and the span list; piece = "<|" role "|>" content "<|end|>" →
    // pieceLen = len(role) + len(content) + 11, content starts at
    // off + len(role) + 4
    val spans = aggregate(col("_turns"),
      struct(lit(0L).as("off"),
        array().cast("array<struct<r:string,s:bigint,e:bigint>>")
          .as("sp")),
      (acc, tr) => {
        val rl = length(tr.getField("r")).cast(LongType)
        val cl = length(tr.getField("c")).cast(LongType)
        val pieceLen = rl + cl + lit(11L)
        struct((acc.getField("off") + pieceLen).as("off"),
          concat(acc.getField("sp"), array(struct(
            tr.getField("r").as("r"),
            (acc.getField("off") + rl + lit(4L)).as("s"),
            (acc.getField("off") + pieceLen).as("e")))).as("sp"))
      },
      acc => filter(acc.getField("sp"),
        x => x.getField("r") === lit(lossRole)))
    grouped
      .select(col("conv_id"), col("n_turns"),
        posexplode(spans).as(Seq("span_idx", "_sp")))
      .select(col("conv_id"), col("n_turns"), col("span_idx"),
        col("_sp").getField("s").as("start_char"),
        col("_sp").getField("e").as("end_char"))
  }

  /** Sliding-window CHUNKING with overlap — the embedding-pipeline
    * staple (RAG indexing, long-doc encoders): each document's
    * whitespace tokens cut into windows of `window` tokens starting
    * every `stride` tokens (stride < window ⇒ overlapping context,
    * the usual retrieval setting). Chunk starts are 0, stride,
    * 2·stride, … while start < n, so every token lands in at least
    * one chunk and the final chunk may be short — n_tokens carries
    * its true length. Empty documents produce no chunks. Map-only
    * generator: one explode over an in-row sequence, no shuffle —
    * at 100 TB this is a pure scan whose output is bounded by
    * n/stride rows per doc. Output: (idCol, chunk_idx, token_start,
    * n_tokens, chunk_text). */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val toks = graft.llm.TextAnalysis.tokens(col(textCol))
    df.select(col(idCol), toks.as("_w"),
        when(col(textCol).isNull || trim(col(textCol)) === "", 0)
          .otherwise(size(toks)).as("_n"))
      .filter(col("_n") > 0)
      .select(col(idCol), col("_w"), col("_n"),
        posexplode(sequence(lit(0),
          ((col("_n") - 1) / stride).cast("int") * stride,
          lit(stride))).as(Seq("chunk_idx", "token_start")))
      .select(col(idCol), col("chunk_idx").cast(LongType),
        col("token_start").cast(LongType),
        least(lit(window.toLong),
          (col("_n") - col("token_start")).cast(LongType))
          .as("n_tokens"),
        array_join(slice(col("_w"), col("token_start") + 1,
          lit(window)), " ").as("chunk_text"))
  }
}
