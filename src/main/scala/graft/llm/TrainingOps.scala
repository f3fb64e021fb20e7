package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Token-budget packing: assign each document to a pack of ~`budget`
    * tokens, filling packs in `orderCol` order WITHIN each `shardCol`
    * partition — `pack_id` is shard-local ((shard, pack_id) is the pack
    * key). A document is assigned to the pack where its running offset
    * starts: pack_id = floor((cumsum(tokens) − tokens) / budget).
    *
    * Sharding is load-bearing at 100 TB: a single global packing order
    * is a one-partition window (the whole corpus through one task).
    * Partitioning by a shard key keeps the window shuffle-parallel;
    * packs never cross shards, which is what training-shard layouts
    * want anyway. */
  def packByTokenBudget(df: DataFrame, shardCol: String, orderCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    df.withColumn("_toks", tokens)
      .withColumn("pack_id",
        floor((sum(col("_toks")).over(w) - col("_toks")) / budget))
      .drop("_toks")
  }

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
    val expected = math.max(1000L, probes
      .select(coalesce(sum(size(Dedup.shingles(col(textCol), shingleN))
        .cast("long")), lit(0L)))
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
}
