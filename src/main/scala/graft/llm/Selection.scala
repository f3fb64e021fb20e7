package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data SELECTION for training corpora ([EXT]): importance-weighted
  * scoring against a target distribution (DSIR, Xie et al. 2023,
  * arXiv:2302.03169), weighted sampling without replacement
  * (Efraimidis–Spirakis 2006), and mixture epoch planning
  * (up/down-sampling sources to a token budget, the "epoching" step
  * every LLM data recipe ends with).
  *
  * Determinism contract shared by every op here: randomness is a
  * salted SHA-256 hash of the row id mapped to a 52-bit uniform —
  * the q102/q90 convention — so any engine with sha256 reproduces
  * the exact sample, and re-runs are idempotent (a re-crawled corpus
  * re-selects the same docs). Real-valued scores are exact-rounded
  * to integer MICRO-units before any aggregation (the q89
  * convention), so sums are order-independent ⇒ hash-stable across
  * partitionings and engines.
  */
object Selection {

  /** 52-bit salted hash bucket of a term: 13 hex chars of SHA-256
    * fit a double-exact BIGINT; DuckDB replays it as
    * `('0x' || substr(sha256(salt || '|' || term), 1, 13))::BIGINT`. */
  private def shaBucket(term: Column, salt: String, numBuckets: Int): Column =
    conv(substring(sha2(concat(lit(salt), lit("|"), term), 256), 1, 13),
      16, 10).cast(LongType) % numBuckets

  /** 52-bit uniform in (0, 1]: (h + 1) / 2^52 never hits 0, so
    * ln(u) is finite without clamping. */
  private def shaUniform(id: Column, salt: String): Column =
    (conv(substring(sha2(concat(lit(salt), lit(":"), id.cast(StringType)),
      256), 1, 13), 16, 10).cast(LongType) + 1L)
      .cast(DoubleType) / lit(4503599627370496.0) // 2^52

  private def tokens(textCol: String): Column =
    split(trim(col(textCol)), "\\s+")

  /** DSIR importance scores: per-document log importance weight of a
    * hashed bag-of-words model of `target` vs one of `raw`
    * (log p_target(doc) − p_raw(doc) under unigram models over
    * `numBuckets` hashed term buckets, Laplace +1 smoothed). High
    * scores = "looks like the target domain"; feeding the scores to
    * [[sampleWeightedK]] (w = exp(score/τ)) is importance
    * RESAMPLING, topK is importance FILTERING.
    *
    * 100 TB shape: both models are `numBuckets`-row aggregates
    * (map-side-combined token counts — the only shuffles carrying
    * corpus-sized streams are bucket-keyed and collapse to ≤ B rows).
    * The per-bucket log-ratio table is built fully in-plan over
    * `range(B)` (no driver collect), broadcast back onto the scored
    * corpus's token stream, and summed per doc in exact micro-units
    * — order-independent, so the score is partitioning-invariant.
    * Nothing here is bounded by corpus size except the two token
    * scans themselves.
    *
    * Output: (id, n_tokens, score_micro) — score_micro is the sum of
    * per-token micro-rounded log-ratios; callers wanting a
    * length-normalized score divide by n_tokens.
    */
  def dsirScores(score: DataFrame, target: DataFrame, raw: DataFrame,
      idCol: String, textCol: String,
      numBuckets: Int = 4096, salt: String = "dsir"): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets must be in [1, 2^20], got $numBuckets")
    val spark = score.sparkSession

    def toks(df: DataFrame): DataFrame =
      df.select(explode(tokens(textCol)).as("_sel_term"))
        .filter(col("_sel_term") =!= "")
        .select(shaBucket(col("_sel_term"), salt, numBuckets).as("bucket"))

    // Bucket-count models: ≤ B rows each after a map-side-combined agg.
    // r16: localCheckpoint BOTH — each is consumed twice (the dense
    // model join AND its 1-row total), and without a lineage cut the
    // total branch RE-RAN the whole corpus-sized token scan + SHA
    // bucket pass (plan evidence: 10 scans / 5 token-hash passes for
    // 3 semantically needed). The materialization is ≤ numBuckets
    // rows — parameter-bounded, never corpus-sized — so it is safe
    // (and the win is largest) at 100 TB: two corpus passes replace
    // four.
    val tCnt = toks(target).groupBy("bucket").agg(count(lit(1)).as("t_cnt"))
      .localCheckpoint()
    val rCnt = toks(raw).groupBy("bucket").agg(count(lit(1)).as("r_cnt"))
      .localCheckpoint()
    // Totals as 1-row aggregates, broadcast-crossed — no driver action.
    val tTot = tCnt.agg(coalesce(sum("t_cnt"), lit(0L)).as("t_tot"))
    val rTot = rCnt.agg(coalesce(sum("r_cnt"), lit(0L)).as("r_tot"))

    // Dense B-row log-ratio table: every bucket 0..B−1 gets a row, so
    // the scoring join needs no driver-side default constant.
    val model = spark.range(numBuckets).toDF("bucket")
      .join(tCnt, Seq("bucket"), "left")
      .join(rCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        round((log((coalesce(col("t_cnt"), lit(0L)) + 1L).cast(DoubleType) /
                   (col("t_tot") + numBuckets).cast(DoubleType)) -
               log((coalesce(col("r_cnt"), lit(0L)) + 1L).cast(DoubleType) /
                   (col("r_tot") + numBuckets).cast(DoubleType))) * 1e6)
          .cast(LongType).as("ratio_micro"))

    score.select(col(idCol).as("_sel_id"), explode(tokens(textCol)).as("_sel_term"))
      .filter(col("_sel_term") =!= "")
      .select(col("_sel_id"), shaBucket(col("_sel_term"), salt, numBuckets).as("bucket"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy("_sel_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("ratio_micro").as("score_micro"))
      .withColumnRenamed("_sel_id", idCol)
  }

  /** Importance FILTERING: the k highest-scoring ids from a
    * [[dsirScores]] output — (score desc, id asc), a TakeOrdered
    * (per-partition heaps + driver merge of 32·k rows), never a
    * global sort. */
  def dsirTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("score_micro").desc, col(idCol)).limit(k)

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): each row draws key = ln(u)/w for a salted-SHA uniform
    * u ∈ (0,1]; the k largest keys are exactly a weighted sample
    * without replacement. One map-only pass + a TakeOrdered — no
    * global sort, no state: the classic reservoir formulation
    * collapses to top-k because u is a deterministic hash rather
    * than a stateful RNG. Rows with NULL or ≤ 0 weight are excluded
    * (they have zero selection probability; ln(u)/w would be NaN or
    * +inf).
    *
    * Keys are micro-rounded BEFORE the top-k compare (ties broken by
    * id asc), so the boundary row is engine-stable: ln() differs
    * across engines only in final ulps, which micro-rounding
    * absorbs — the q89 convention applied to ordering instead of
    * summing. Output: (id, weight, key_micro), key desc. */
  def sampleWeightedK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = col(weightCol).cast(DoubleType)
    df.filter(w.isNotNull && w > 0.0)
      .select(col(idCol).as("_sel_id"), w.as("weight"))
      .withColumn("key_micro",
        round(log(shaUniform(col("_sel_id"), salt)) / col("weight") * 1e6)
          .cast(LongType))
      .withColumnRenamed("_sel_id", idCol)
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }

  /** Per-GROUP weighted sampling without replacement: the
    * [[sampleWeightedK]] key (ln(u)/w, salted-SHA uniform,
    * micro-rounded) ranked inside each group — k rows per group, the
    * weighted sibling of `TrainingOps.sampleKPerGroup`. The
    * row_number-≤-k filter compiles to a WindowGroupLimit: each
    * task keeps a k-row heap per group through the rank, so a
    * billion-row group costs O(k) state, not a full-group buffer
    * (the same plan shape q132/q133 pinned in PlanQualitySpec).
    * Output: group cols + (id, weight, key_micro, rank). */
  def sampleWeightedKPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: String, k: Int,
      salt: String = "wskg"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "at least one group column required")
    val w = col(weightCol).cast(DoubleType)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("key_micro").desc, col(idCol))
    df.filter(w.isNotNull && w > 0.0)
      .select((groupCols.map(col) :+ col(idCol) :+ w.as("weight")): _*)
      .withColumn("key_micro",
        round(log(shaUniform(col(idCol), salt)) / col("weight") * 1e6)
          .cast(LongType))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
  }

  /** Classifier calibration sweep: confusion counts and
    * precision/recall at each threshold, in ONE pass over the data.
    * Not the textbook cross-join (T× the stream): each row lands in
    * a bucket = |{thresholds ≤ score}| (a map-only array op over the
    * parameter-bounded threshold list), buckets aggregate to ≤ T+1
    * rows, and each threshold's tp/fp are suffix sums over that
    * BOUNDED table (the q60/q65 convention: windows are fine when
    * the partition is provably parameter-sized). Precision/recall
    * are micro-rounded; a zero denominator yields NULL in both
    * engines by explicit guard.
    *
    * `labelCol` must be boolean; `scoreCol` integral (use micro
    * scores — [[dsirScores]]' score_micro, q89's logprob micro).
    * Output: (threshold, tp, fp, fn, tn, precision_micro,
    * recall_micro) — one row per threshold. */
  def calibrationSweep(df: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    require(thresholds.distinct.size == thresholds.size,
      "thresholds must be distinct")
    require(thresholds.size <= 10000,
      s"threshold list is a broadcast parameter; got ${thresholds.size}")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = thresholds.sorted
    val tArr = array(sorted.map(lit): _*)
    // bucket b = #thresholds ≤ score ⇒ score ≥ threshold_i ⟺ b ≥ i
    // (1-based i over the ascending-sorted list)
    // localCheckpoint: the bucket table is referenced three times
    // below (suffix sums, the threshold join, totals); without the
    // cut Spark would recompute the full scoring pass per reference.
    // ≤ T+1 rows — bounded by the parameter, never the data.
    // NULL scores/labels are excluded up front: a null score is
    // neither ≥ nor < any threshold (three-valued logic would count
    // it nowhere in a direct formulation but in bucket 0 here — the
    // filter makes both formulations agree and the contract explicit).
    val buckets = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(size(filter(tArr, t => t <= col(scoreCol))).as("b"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy("b")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("n_neg"))
      .localCheckpoint()
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("b").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val suffix = buckets
      .withColumn("tp_at", sum("n_pos").over(win))
      .withColumn("fp_at", sum("n_neg").over(win))
    val idx = sorted.zipWithIndex.map { case (t, i) => (t, i + 1L) }
      .toDF("threshold", "i")
    // threshold_i's counts sit at the SMALLEST bucket ≥ i present in
    // the data; left-join each i to min(b ≥ i) over the bounded table.
    broadcast(idx).join(suffix, col("b") >= col("i"), "left")
      .groupBy("threshold", "i")
      .agg(min(struct(col("b"), col("tp_at"), col("fp_at"))).as("s"))
      .select(col("threshold"),
        coalesce(col("s.tp_at"), lit(0L)).as("tp"),
        coalesce(col("s.fp_at"), lit(0L)).as("fp"))
      .crossJoin(broadcast(buckets.agg(
        coalesce(sum("n_pos"), lit(0L)).as("p_tot"),
        coalesce(sum("n_neg"), lit(0L)).as("n_tot"))))
      .select(col("threshold"), col("tp"), col("fp"),
        (col("p_tot") - col("tp")).as("fn"),
        (col("n_tot") - col("fp")).as("tn"),
        when(col("tp") + col("fp") === 0L, lit(null).cast(LongType))
          .otherwise(round(col("tp").cast(DoubleType) * 1e6 /
            (col("tp") + col("fp")).cast(DoubleType)).cast(LongType))
          .as("precision_micro"),
        when(col("p_tot") === 0L, lit(null).cast(LongType))
          .otherwise(round(col("tp").cast(DoubleType) * 1e6 /
            col("p_tot").cast(DoubleType)).cast(LongType))
          .as("recall_micro"))
  }

  /** Corpus drift monitor: KL divergence (both directions) and total
    * variation between two snapshots' hashed-token distributions —
    * the number a nightly admission pipeline alarms on when a crawl
    * update shifts the corpus (new spam campaign, a source gone
    * mojibake, a selector drifting). Same hashed bag-of-words space
    * as [[dsirScores]] (B SHA buckets, Laplace +1), so the metric is
    * stable under vocabulary growth.
    *
    * Contract: each bucket's contribution is micro-rounded BEFORE
    * the sum (integer sum over ≤ B terms — order-independent,
    * engine-exact); the metric is defined as that rounded sum, and
    * the oracle replays it bucket for bucket. Output: ONE row
    * (n_buckets, kl_ab_micro, kl_ba_micro, tv_micro).
    *
    * 100 TB shape: two token scans collapsing to ≤ B-row count
    * aggregates; everything after is arithmetic over the bounded
    * bucket table. */
  def distributionDrift(a: DataFrame, b: DataFrame, textCol: String,
      numBuckets: Int = 4096, salt: String = "drift"): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets must be in [1, 2^20], got $numBuckets")
    val spark = a.sparkSession

    def cnt(df: DataFrame, out: String): DataFrame =
      df.select(explode(tokens(textCol)).as("_sel_term"))
        .filter(col("_sel_term") =!= "")
        .select(shaBucket(col("_sel_term"), salt, numBuckets).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(out))

    val aCnt = cnt(a, "a_cnt")
    val bCnt = cnt(b, "b_cnt")
    val aTot = aCnt.agg(coalesce(sum("a_cnt"), lit(0L)).as("a_tot"))
    val bTot = bCnt.agg(coalesce(sum("b_cnt"), lit(0L)).as("b_tot"))
    val p = (coalesce(col("a_cnt"), lit(0L)) + 1L).cast(DoubleType) /
      (col("a_tot") + numBuckets).cast(DoubleType)
    val q = (coalesce(col("b_cnt"), lit(0L)) + 1L).cast(DoubleType) /
      (col("b_tot") + numBuckets).cast(DoubleType)
    spark.range(numBuckets).toDF("bucket")
      .join(aCnt, Seq("bucket"), "left")
      .join(bCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(aTot)).crossJoin(broadcast(bTot))
      .select(
        round(p * log(p / q) * 1e6).cast(LongType).as("kl_ab_c"),
        round(q * log(q / p) * 1e6).cast(LongType).as("kl_ba_c"),
        round(abs(p - q) / 2.0 * 1e6).cast(LongType).as("tv_c"))
      .agg(count(lit(1)).as("n_buckets"),
        sum("kl_ab_c").as("kl_ab_micro"),
        sum("kl_ba_c").as("kl_ba_micro"),
        sum("tv_c").as("tv_micro"))
  }

  /** [[distributionDrift]] per GROUP — "which source/language
    * drifted?", the triage step after the global alarm fires. Same
    * metric contract (per-bucket micro contributions, summed
    * exactly). The group domain is assumed model-sized (sources,
    * languages — the stratifiedSplit assumption): the dense
    * group×bucket table is |groups|·B rows, all bounded aggregates.
    * A group present on only one side scores against the uniform
    * (all-+1-smoothing) distribution, which is exactly what "this
    * source vanished" should alarm as. Output: one row per group. */
  def distributionDriftByGroup(a: DataFrame, b: DataFrame,
      groupCol: String, textCol: String, numBuckets: Int = 4096,
      salt: String = "drift"): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 20),
      s"numBuckets must be in [1, 2^20], got $numBuckets")
    val spark = a.sparkSession

    def cnt(df: DataFrame, out: String): DataFrame =
      df.select(col(groupCol).as("g"),
          explode(tokens(textCol)).as("_sel_term"))
        .filter(col("_sel_term") =!= "")
        .select(col("g"),
          shaBucket(col("_sel_term"), salt, numBuckets).as("bucket"))
        .groupBy("g", "bucket").agg(count(lit(1)).as(out))

    val aCnt = cnt(a, "a_cnt")
    val bCnt = cnt(b, "b_cnt")
    val aTot = aCnt.groupBy("g").agg(sum("a_cnt").as("a_tot"))
    val bTot = bCnt.groupBy("g").agg(sum("b_cnt").as("b_tot"))
    val groups = aCnt.select("g").union(bCnt.select("g")).distinct()
    val p = (coalesce(col("a_cnt"), lit(0L)) + 1L).cast(DoubleType) /
      (coalesce(col("a_tot"), lit(0L)) + numBuckets).cast(DoubleType)
    val q = (coalesce(col("b_cnt"), lit(0L)) + 1L).cast(DoubleType) /
      (coalesce(col("b_tot"), lit(0L)) + numBuckets).cast(DoubleType)
    groups.crossJoin(spark.range(numBuckets).toDF("bucket"))
      .join(aCnt, Seq("g", "bucket"), "left")
      .join(bCnt, Seq("g", "bucket"), "left")
      .join(broadcast(aTot), Seq("g"), "left")
      .join(broadcast(bTot), Seq("g"), "left")
      .select(col("g"),
        round(p * log(p / q) * 1e6).cast(LongType).as("kl_ab_c"),
        round(q * log(q / p) * 1e6).cast(LongType).as("kl_ba_c"),
        round(abs(p - q) / 2.0 * 1e6).cast(LongType).as("tv_c"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_buckets"),
        sum("kl_ab_c").as("kl_ab_micro"),
        sum("kl_ba_c").as("kl_ba_micro"),
        sum("tv_c").as("tv_micro"))
      .withColumnRenamed("g", groupCol)
  }

  /** Stratified split with EXACT per-stratum proportions: within
    * each stratum, rows rank by a salted SHA and the rank range
    * assigns the split — so every stratum lands `floor(n·cum_s)`
    * boundaries exactly (plain [[TrainingOps.splitAssign]] is
    * proportional only in expectation, which on a 100-row stratum
    * can misallocate a whole eval set). Boundaries are exact
    * integral arithmetic: `n · cum_micro div 10⁶`.
    *
    * 100 TB shape: the in-stratum rank is NOT a per-stratum window
    * (a hot stratum would sort through one task) — it derives from
    * ONE range-partitioned global rank over (stratum, hash) minus
    * the stratum's broadcast start offset; per-stratum counts are a
    * bounded aggregate. Strata count is assumed model-sized
    * (lang × source × band), not data-sized.
    *
    * Output: input columns + `split`. */
  def stratifiedSplit(df: DataFrame, strataCols: Seq[String],
      idCol: String, splits: Seq[(String, Double)],
      salt: String = "strat"): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column required")
    require(splits.nonEmpty, "at least one split required")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be distinct")
    val reserved = Seq("_ss_h", "_ss_off", "_ss_n", "rank", "split")
    require(!df.columns.exists(reserved.contains),
      "input must not carry the scratch or output columns " + reserved)
    val spark = df.sparkSession
    import spark.implicits._
    // exact cumulative per-mille-of-a-million boundaries. The LAST
    // boundary is pinned to exactly 1_000_000: weights like thirds
    // pass the 1e-9 sum check but their rounded cums end at 999_999,
    // and an unpinned final boundary would leave the last-ranked row
    // of every stratum matching no branch (a silent NULL split — the
    // row lost from every split).
    val cums0 = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * 1e6)
    }.tail
    val cums = cums0.init :+ 1000000L
    val named = splits.map(_._1).zip(cums)

    val hashed = df.withColumn("_ss_h",
      sha2(concat(lit(salt), lit(":"), col(idCol).cast(StringType)), 256))
    val ranked = TrainingOps.globalRank(hashed,
      strataCols.map(col) :+ col("_ss_h") :+ col(idCol))
    val offsets = ranked.groupBy(strataCols.map(col): _*)
      .agg((min("rank") - 1L).as("_ss_off"), count(lit(1)).as("_ss_n"))
    val inRank = col("rank") - col("_ss_off") // 1-based within stratum
    // split s ⟺ in_rank ≤ n·cum_micro div 1e6 and > previous bound
    val assign = named.foldRight(lit(null).cast(StringType)) {
      case ((name, cum), rest) =>
        when(inRank <= expr(s"(_ss_n * ${cum}L) div 1000000L"), lit(name))
          .otherwise(rest)
    }
    // reverse fold means the FIRST matching (smallest-cum) split wins
    ranked.join(broadcast(offsets), strataCols)
      .withColumn("split", assign)
      .drop("_ss_h", "rank", "_ss_off", "_ss_n")
  }

  /** Mixture epoch planning + deterministic up/down-sampling: given
    * per-row token counts, a target mixture weight per source, and a
    * total token budget, compute each source's repeat factor
    * f_s = budget·w_s / tokens_s and emit each row `floor(f_s)`
    * times plus one more with probability frac(f_s) — the standard
    * "epochs per source" step (Llama/GPT-style data recipes publish
    * exactly this table). The fractional copy is a salted-SHA
    * Bernoulli per ROW id, so the realized token count concentrates
    * on the target and the sample is reproducible.
    *
    * 100 TB shape: the per-source stats are a bounded aggregate
    * (≤ #sources rows) broadcast back — the corpus stream is touched
    * once, map-only, and the explode multiplies rows exactly as the
    * plan demands (that IS the upsampling; there is no cheaper
    * shape). Unknown sources (absent from `weights`) get f_s = 0 and
    * drop out. f_s is capped at `maxEpochs` — a fat-finger budget on
    * one tiny source must fail loudly, not emit 10⁹ copies/row. */
  /** Temperature-scaled mixture weights at α = 0.5 — the
    * multilingual sampling-exponent move (XLM-R / mBERT style:
    * sample language l with probability ∝ n_l^α so low-resource
    * languages upsample relative to their corpus share, α = 0.5 the
    * common production point). α = 0.5 specifically because √ is an
    * exact IEEE operation both engines compute identically, so the
    * whole table is oracle-replayable: per group
    * `sqrt_w_micro = floor(sqrt(n_docs) · 10⁶)` (bit-stable — sqrt
    * and one multiply are correctly-rounded IEEE ops), then pure
    * integer floor arithmetic: `share_micro` the normalized sampling
    * share, `prop_micro` the raw proportional share, and
    * `boost_micro = share/prop` — the per-group repeat factor a
    * sampler applies ([[upsampleToMixture]] consumes shares like
    * these as its `weights`). Other α values need `pow`, whose
    * cross-engine bit-stability is not guaranteed — callers wanting
    * them compute weights engine-locally and feed
    * [[upsampleToMixture]] directly.
    *
    * Scale shape: ONE count aggregate over the corpus, then
    * groups-sized arithmetic with the 1-row total broadcast — the
    * corpus is never reshuffled. Output: (groupCol, n_docs,
    * sqrt_w_micro, share_micro, prop_micro, boost_micro). */
  def temperatureMixture(df: DataFrame, groupCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val tot = stats.agg(
      sum(floor(sqrt(col("n_docs").cast(DoubleType)) * 1e6)
        .cast(LongType)).as("_wsum"),
      sum(col("n_docs")).as("_n"))
    stats
      .withColumn("sqrt_w_micro",
        floor(sqrt(col("n_docs").cast(DoubleType)) * 1e6).cast(LongType))
      .crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("sqrt_w_micro"),
        expr("(sqrt_w_micro * 1000000) div _wsum").as("share_micro"),
        expr("(n_docs * 1000000) div _n").as("prop_micro"))
      .withColumn("boost_micro",
        expr("(share_micro * 1000000) div greatest(prop_micro, 1)"))
  }

  def upsampleToMixture(df: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, weights: Map[String, Double], budgetTokens: Long,
      salt: String = "mix", maxEpochs: Int = 100): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ >= 0.0), "weights must be >= 0")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    val wTab = weights.toSeq.sortBy(_._1).toDF(sourceCol, "_w")
    val stats = df.groupBy(sourceCol)
      .agg(sum(col(tokensCol).cast(LongType)).as("_src_tokens"))
      .join(wTab, Seq(sourceCol))
      .select(col(sourceCol),
        (lit(budgetTokens.toDouble) * col("_w") /
          col("_src_tokens").cast(DoubleType)).as("_f"))
    // Fail loudly on runaway repeat factors — 1-row bounded action.
    val worst = stats.agg(coalesce(max("_f"), lit(0.0))).first().getDouble(0)
    require(worst <= maxEpochs,
      f"repeat factor $worst%.1f exceeds maxEpochs=$maxEpochs — " +
        "budget/weights imply runaway upsampling of a small source")

    df.select(col(idCol).as("_sel_id"), col(sourceCol))
      .join(broadcast(stats), Seq(sourceCol))
      .withColumn("_copies",
        floor(col("_f")).cast(IntegerType) +
          when(shaUniform(col("_sel_id"), salt) < (col("_f") - floor(col("_f"))),
            1).otherwise(0))
      .filter(col("_copies") > 0)
      .select(col("_sel_id").as(idCol), col(sourceCol),
        explode(sequence(lit(1), col("_copies"))).as("epoch"))
  }

  /** Quality-ANNEALED curriculum plan — the end-of-training data
    * schedule of modern pretraining runs (train the bulk of the
    * budget on the full mix, then anneal the final fraction on the
    * highest-quality slice), made deterministic and relational:
    * the best-quality documents whose running token mass fills
    * `annealFracMicro`/10⁶ of the corpus total form the `anneal`
    * phase (greedy best-first with an id tiebreak; the boundary
    * document whose mass STARTS inside the budget is included,
    * exactly [[TrainingOps.selectByTokenBudget]]'s contract);
    * everything else is `main`. `order_key` is a salted-SHA shuffle
    * key — training must not see a phase in quality-sorted order,
    * and a hash key makes the shuffle rerun/engine-stable.
    *
    * Scale shape: ONE 1-row total aggregate (driver boundary
    * arithmetic, BigInt so 100 TB token counts cannot overflow the
    * ×10⁶ product), then the q106 two-phase prefix sum over the
    * quality order — no global window anywhere. Null token counts
    * fail fast: a null would silently land every later document one
    * slot early. */
  def annealPlan(df: DataFrame, idCol: String, quality: Column,
      tokens: Column, annealFracMicro: Long,
      salt: String = "anl"): DataFrame = {
    require(annealFracMicro > 0 && annealFracMicro < 1000000L,
      s"annealFracMicro must be in (0, 1e6); got $annealFracMicro")
    val id = col(idCol)
    val base = df.select(id, quality.cast(LongType).as("quality_micro"),
      tokens.cast(LongType).as("n_tokens"))
    val agg = base.agg(
      sum("n_tokens").as("t"),
      count(lit(1)).as("n"),
      count(col("n_tokens")).as("nn")).head() // 1-row action
    require(agg.getLong(1) == agg.getLong(2),
      s"annealPlan: ${agg.getLong(1) - agg.getLong(2)} null token counts")
    val total = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    require(total > 0, "annealPlan: corpus has no tokens")
    val budget = ((BigInt(total) * annealFracMicro) / 1000000L)
      .max(1L).toLong
    TrainingOps.packByTokenBudget(
        base.withColumn("_ord",
            struct((-col("quality_micro")).as("q"), id.as("i")))
          .withColumn("_shard", lit(0)),
        "_shard", "_ord", col("n_tokens"), budget)
      .select(id, col("quality_micro"), col("n_tokens"),
        when(col("pack_id") === 0, lit("anneal")).otherwise(lit("main"))
          .as("phase"),
        conv(substring(sha2(concat(lit(salt), lit(":"),
          id.cast(StringType)), 256), 1, 13), 16, 10).cast(LongType)
          .as("order_key"))
  }

  /** Bradley–Terry preference ranking (the RLHF preference-data
    * artifact): fit per-item strengths from pairwise (winner, loser)
    * comparisons with the MM algorithm (Hunter 2004, minorization-
    * maximization), in EXACT integer micro-units so the fit is
    * engine-portable — every division is an integer floor, so DuckDB
    * replays the iterations verbatim with HUGEINT CTEs.
    *
    * Identifiability: add-one smoothing on every OBSERVED unordered
    * pair (both directions get +1) — an item that never lost still
    * gets a finite strength, and p stays strictly positive so the
    * p_i + p_j denominators never hit zero. Fixed `iters` parallel
    * MM rounds from p = 10⁶:
    *
    *   D_i  = Σ_j floor(n_ij · 10¹² / (p_i + p_j))
    *   p_i' = floor(W_i · 10¹² / D_i)
    *
    * (n_ij = smoothed games between i and j, W_i = smoothed wins of
    * i), then one final normalization to mean 10⁶. Output: (item,
    * wins, games, strength_micro) with RAW (unsmoothed) win/game
    * counts for interpretability.
    *
    * Scale shape: the UNBOUNDED side — the comparison stream — is
    * reduced distributively to one (i, j, wins) pair table bounded by
    * items² (one hash aggregate with map-side partials). Items are a
    * bounded vocabulary by construction (model variants, domains,
    * sources — fail-fast `maxItems` guard, the q135 discipline), so
    * the iterations run driver-side on BigInt exactly like the other
    * parameter-bounded fits (IVF centroids, BPE merge table): per
    * round O(pairs), zero shuffles, zero lineage growth. */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
      loserCol: String, iters: Int = 3, maxItems: Int = 10000,
      maxPairRows: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"iters must be at least 1, got $iters")
    require(maxItems >= 2, s"maxItems must be at least 2, got $maxItems")
    require(maxPairRows >= 1, "maxPairRows must be positive")
    val spark = comparisons.sparkSession
    import spark.implicits._
    // distributed reduction: comparison stream -> bounded pair table.
    // Cached: the guard pass and the collect below both consume it,
    // and without the cache each would recompute the full upstream
    // aggregation over the (unbounded) comparison stream.
    val raw = comparisons
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast(StringType).as("i"),
        col(loserCol).cast(StringType).as("j"))
      .agg(count(lit(1)).as("w"))
      .persist()
    // fail-fast BEFORE the collect: both guards must run in-plan —
    // an unbounded item vocabulary means an unbounded pair table,
    // and collecting it first would OOM the driver instead of
    // raising the intended error. ONE distributed aggregate over
    // the exploded pair keys (bounded output: a single row) yields
    // both the distinct-item count and the pair-row count (each
    // pair row contributes exactly 2 exploded rows). maxItems alone
    // is not enough: ≤maxItems items still admit up to maxItems²
    // DIRECTED pair rows (10⁸ at the default), so the collect is
    // additionally bounded by maxPairRows — dense comparison
    // matrices over large vocabularies must lower maxItems or
    // raise maxPairRows deliberately, not OOM by default.
    val pairs = try {
      val stats = raw
        .select(explode(array(col("i"), col("j"))).as("_it"))
        .agg(countDistinct(col("_it")).as("_ni"),
          count(lit(1)).as("_n2")).head()
      val nItems = stats.getLong(0)
      val nPairRows = stats.getLong(1) / 2
      require(nItems <= maxItems,
        s"bradleyTerry: $nItems items exceeds maxItems=$maxItems — " +
          "the item vocabulary must be bounded (models, domains, sources)")
      require(nPairRows <= maxPairRows,
        s"bradleyTerry: $nPairRows aggregated pair rows exceed " +
          s"maxPairRows=$maxPairRows — too dense to collect; lower " +
          "maxItems or raise maxPairRows deliberately")
      // pair table now provably ≤ maxPairRows rows — safe to collect
      raw.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    } finally raw.unpersist()
    val items = pairs.keysIterator.flatMap(k => Iterator(k._1, k._2))
      .toSeq.distinct.sorted
    if (items.isEmpty)
      return spark.emptyDataFrame
        .select(lit("").as("item"), lit(0L).as("wins"),
          lit(0L).as("games"), lit(0L).as("strength_micro")).limit(0)
    // add-one smoothing over observed unordered pairs, both directions
    val unordered = pairs.keysIterator
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val sm: Map[(String, String), Long] = unordered.iterator.flatMap {
      case (a, b) => Iterator(
        (a, b) -> (pairs.getOrElse((a, b), 0L) + 1L),
        (b, a) -> (pairs.getOrElse((b, a), 0L) + 1L))
    }.toMap
    val opponents: Map[String, Seq[String]] = sm.keysIterator.toSeq
      .groupBy(_._1).map { case (i, ks) => i -> ks.map(_._2).sorted }
    val winsSm: Map[String, Long] =
      sm.toSeq.groupBy(_._1._1).map { case (i, xs) => i -> xs.map(_._2).sum }
    val Scale = BigInt("1000000000000") // 10^12
    var p: Map[String, BigInt] = items.map(_ -> BigInt(1000000L)).toMap
    for (_ <- 1 to iters) {
      p = items.map { i =>
        val d = opponents(i).map { j =>
          val nij = sm((i, j)) + sm((j, i))
          (BigInt(nij) * Scale) / (p(i) + p(j))
        }.sum
        i -> (BigInt(winsSm(i)) * Scale) / d
      }.toMap
    }
    val sumP = items.map(p).sum
    val rawWins = pairs.toSeq.groupBy(_._1._1)
      .map { case (i, xs) => i -> xs.map(_._2).sum }
    val rawGames = items.map { i =>
      i -> (rawWins.getOrElse(i, 0L) +
        pairs.toSeq.filter(_._1._2 == i).map(_._2).sum)
    }.toMap
    items.map { i =>
      (i, rawWins.getOrElse(i, 0L), rawGames(i),
        ((p(i) * 1000000L * items.size) / sumP).toLong)
    }.toDF("item", "wins", "games", "strength_micro")
  }

  /** Inter-annotator agreement (Cohen's kappa) per group — the label-
    * quality gate a human- or model-annotated corpus needs before its
    * labels train anything: observed agreement corrected for the
    * agreement two independent annotators would reach by chance.
    *
    *   kappa = (p_o − p_e) / (1 − p_e)
    *         = (agree·n − Σ_k a_k·b_k) / (n² − Σ_k a_k·b_k)
    *
    * kept as ONE exact integer ratio in micro-units (both engines
    * truncate integer division toward zero, so even a negative kappa
    * — systematic disagreement — is bit-identical). Rows where either
    * annotator abstained (NULL) are excluded from n. The degenerate
    * p_e = 1 case (both annotators constant with identical marginals
    * — chance explains everything, kappa undefined) yields NULL, not
    * a division blow-up.
    *
    * Scale shape: three hash aggregates with map-side partials (per-
    * group totals, per-(group, label) marginals for each annotator)
    * and one join on the bounded (group, label) vocabulary — no
    * window, no per-row state. */
  def interAnnotatorKappa(df: DataFrame, groupCols: Seq[String],
      aCol: String, bCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val g = groupCols.map(col)
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select((g :+ col(aCol).cast(StringType).as("_a")
        :+ col(bCol).cast(StringType).as("_b")): _*)
    val tot = base.groupBy(g: _*).agg(count(lit(1)).as("n"),
      sum(when(col("_a") === col("_b"), 1L).otherwise(0L)).as("agree"))
    val aCnt = base.withColumn("_lbl", col("_a"))
      .groupBy((g :+ col("_lbl")): _*).agg(count(lit(1)).as("_ak"))
    val bCnt = base.withColumn("_lbl", col("_b"))
      .groupBy((g :+ col("_lbl")): _*).agg(count(lit(1)).as("_bk"))
    val pe = aCnt.join(bCnt, groupCols :+ "_lbl")
      .groupBy(g: _*).agg(sum(col("_ak") * col("_bk")).as("_pe_num"))
    tot.join(pe, groupCols)
      .select((g :+ col("n") :+ col("agree") :+
        when(col("n") * col("n") === col("_pe_num"),
            lit(null).cast(LongType))
          .otherwise(expr(
            "CAST((CAST(agree AS DECIMAL(38,0)) * n - _pe_num) " +
              "* 1000000 div " +
              "(CAST(n AS DECIMAL(38,0)) * n - _pe_num) AS BIGINT)"))
          .as("kappa_micro")): _*)
  }

  /** DPO preference-pair assembly (Rafailov et al. 2023,
    * arXiv:2305.18290 — direct preference optimization trains on
    * (prompt, chosen, rejected) triples): per prompt, chosen = the
    * highest-scored candidate, rejected = the lowest-scored, emitted
    * only when the score margin clears `minMarginMicro` — a pair
    * whose sides are not STRICTLY ordered is noise, so the floor is
    * ≥ 1 by contract (equal-scored candidates can never certify a
    * preference; with everything tied, "chosen" and "rejected" would
    * be the same row). Scores are integer micro-units by contract
    * (the q181 discipline), so both picks and the margin are
    * engine-exact. Ties break to the LOWER candidate id on both
    * sides; NULL-scored and NULL-prompt rows never pair.
    *
    * Scale shape: ONE hash aggregate over the candidate stream —
    * two bounded `min_by` picks per prompt (argmax = min_by of the
    * negated score), map-side combined; no window, no self-join, no
    * rank. Scores must sit in (Long.MinValue, Long.MaxValue) exclusive
    * of the minimum (the argmax negation of Long.MinValue overflows —
    * micro-unit scores are 10¹² orders away from that edge). Output:
    * (prompt_id, chosen_id, rejected_id, margin_micro,
    * n_candidates). */
  def dpoPairs(candidates: DataFrame, promptCol: String,
      candCol: String, scoreCol: String,
      minMarginMicro: Long = 1L): DataFrame = {
    require(minMarginMicro >= 1L,
      s"minMarginMicro must be >= 1 (a DPO pair needs a strict " +
        s"preference), got $minMarginMicro")
    val score = col(scoreCol).cast(LongType)
    candidates
      .filter(col(promptCol).isNotNull && col(candCol).isNotNull &&
        score.isNotNull)
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(
        min_by(struct(col(candCol).as("id"), score.as("s")),
          struct((-score).as("ns"), col(candCol).as("id"))).as("_ch"),
        min_by(struct(col(candCol).as("id"), score.as("s")),
          struct(score.as("s"), col(candCol).as("id"))).as("_rj"),
        count(lit(1)).as("n_candidates"))
      .select(col("prompt_id"),
        col("_ch.id").as("chosen_id"), col("_rj.id").as("rejected_id"),
        (col("_ch.s") - col("_rj.s")).as("margin_micro"),
        col("n_candidates"))
      .filter(col("n_candidates") >= 2 &&
        col("margin_micro") >= minMarginMicro)
  }

  /** Best-of-n selection / rejection-sampling fine-tuning (RFT —
    * the Yuan et al. 2023 / Llama-2 "rejection sampling" data move):
    * per prompt, keep the single highest-scored candidate, ACCEPTED
    * only when it clears an absolute quality floor
    * (`minScoreMicro`) and beats the runner-up by `minMarginMicro`
    * (a best barely ahead of its alternatives is noise under a
    * learned reward model, the same strictness argument as
    * [[dpoPairs]]). Singleton prompts have no runner-up: their
    * margin gate is vacuous (runner_score is NULL) and acceptance is
    * the score floor alone — documented rule, oracle-replayed. Ties
    * break to the LOWER candidate id everywhere; NULL-scored and
    * NULL-prompt rows never compete.
    *
    * Scale shape: TWO bounded hash aggregates (the best pick, then
    * the best-of-the-rest after one join that excludes the winner) —
    * never a per-prompt window or a collect of the candidate list,
    * so a prompt with 10⁶ candidates costs the same state as one
    * with 2. Output: (prompt_id, best_id, best_score, runner_score,
    * margin_micro, n_candidates, accepted). */
  def bestOfN(candidates: DataFrame, promptCol: String,
      candCol: String, scoreCol: String, minScoreMicro: Long,
      minMarginMicro: Long = 1L): DataFrame = {
    require(minMarginMicro >= 1L,
      s"minMarginMicro must be >= 1, got $minMarginMicro")
    val score = col(scoreCol).cast(LongType)
    val base = candidates
      .filter(col(promptCol).isNotNull && col(candCol).isNotNull &&
        score.isNotNull)
      .select(col(promptCol).as("prompt_id"),
        col(candCol).as("_cid"), score.as("_s"))
    val best = base.groupBy(col("prompt_id"))
      .agg(
        min_by(struct(col("_cid").as("id"), col("_s").as("s")),
          struct((-col("_s")).as("ns"), col("_cid").as("id"))).as("_b"),
        count(lit(1)).as("n_candidates"))
      .select(col("prompt_id"), col("_b.id").as("best_id"),
        col("_b.s").as("best_score"), col("n_candidates"))
    val runner = base.join(best, Seq("prompt_id"))
      .filter(col("_cid") =!= col("best_id"))
      .groupBy(col("prompt_id"))
      .agg(max(col("_s")).as("runner_score"))
    best.join(runner, Seq("prompt_id"), "left")
      .select(col("prompt_id"), col("best_id"), col("best_score"),
        col("runner_score"),
        (col("best_score") - col("runner_score")).as("margin_micro"),
        col("n_candidates"),
        (col("best_score") >= minScoreMicro &&
          (col("runner_score").isNull ||
            col("best_score") - col("runner_score") >= minMarginMicro))
          .as("accepted"))
  }

  /** Group-relative advantages (GRPO — Shao et al. 2024,
    * arXiv:2402.03300): per prompt group of scored candidates,
    * `advantage = reward − mean(group)` and the z-normalized form
    * `(reward − mean) / std(group)` — the reward-shaping step that
    * replaces a learned value baseline with the group statistic.
    * Works over micro-unit integer rewards (the engine's convention).
    *
    * Exactness: the centered advantage is `floor((n·r − Σr) / n)` —
    * the numerator is an exact long, and at the guarded magnitudes
    * (|n·r − Σr| < 2⁵³, n < 2⁵³) the double division is correctly
    *  rounded with a rational result, so `floor` can only be wrong if
    * the true quotient p/n lies within one ulp of an integer m while
    * p ≠ m·n — impossible for |m| ≤ ~10⁶, n ≤ 10⁵ (|p − mn| < n·ulp
    * < 1 forces p = mn) — i.e. adv_micro is engine-EXACT, not just
    * close. The z-form divides the same exact numerator by
    * sqrt(n·Σr² − (Σr)²), where the variance numerator is exact
    * 128-bit integer arithmetic and `sqrt` is IEEE-correctly-rounded
    * in both engines; the final floor carries the same measure-zero
    * exposure q89/q99 accept for `ln`. The algebra that removes the
    * mean/std intermediate floats entirely: with population variance
    * σ² = (n·Σr² − (Σr)²)/n², z = ((n·r − Σr)/n)/(√(n·Σr² − (Σr)²)/n)
    * = (n·r − Σr)/√(n·Σr² − (Σr)²) — one exact integer numerator,
    * one correctly-rounded sqrt of an exact integer, one division.
    * Zero-variance groups (all candidates equal) emit z = 0 by
    * definition.
    *
    * Scale shape: ONE hash aggregate for the group stats (n, Σr, Σr²
    * as exact decimals — map-side partials), joined back to the
    * candidates (AQE broadcasts the stats side: one row per prompt);
    * no window, no driver state, any group size. Groups with fewer
    * than `minGroup` candidates drop — a 1-candidate group has no
    * baseline (its advantage is identically 0 and trains nothing).
    *
    * Output: (prompt_id, cand_id, score_micro, adv_micro, z_milli). */
  def grpoAdvantages(candidates: DataFrame, promptCol: String,
      candCol: String, scoreCol: String,
      minGroup: Int = 2): DataFrame = {
    require(minGroup >= 2, s"minGroup must be >= 2, got $minGroup")
    val score = col(scoreCol).cast(LongType)
    val scored = candidates
      .filter(col(promptCol).isNotNull && col(candCol).isNotNull &&
        score.isNotNull)
      .select(col(promptCol).as("prompt_id"),
        col(candCol).as("cand_id"), score.as("score_micro"))
    val stats = scored.groupBy("prompt_id")
      .agg(count(lit(1)).as("n"),
        sum(col("score_micro")).as("sum_r"),
        sum(col("score_micro").cast(DecimalType(38, 0)) *
          col("score_micro").cast(DecimalType(38, 0))).as("sum_r2"))
      .filter(col("n") >= minGroup)
    scored.join(stats, Seq("prompt_id"))
      .withColumn("_num", col("n") * col("score_micro") - col("sum_r"))
      .withColumn("_var_num",
        col("n").cast(DecimalType(38, 0)) * col("sum_r2") -
          col("sum_r").cast(DecimalType(38, 0)) *
          col("sum_r").cast(DecimalType(38, 0)))
      .select(col("prompt_id"), col("cand_id"), col("score_micro"),
        floor(col("_num").cast(DoubleType) / col("n"))
          .cast(LongType).as("adv_micro"),
        when(col("_var_num") === 0, lit(0L)).otherwise(
          floor(lit(1000.0) * col("_num").cast(DoubleType) /
            sqrt(col("_var_num").cast(DoubleType))).cast(LongType))
          .as("z_milli"))
  }

  /** Per-group quantile normalization (the CCNet move, generalized:
    * CCNet thresholds per-LANGUAGE perplexity because one global
    * cutoff over-prunes low-resource languages — this maps every
    * score onto the GLOBAL distribution so one threshold works for
    * every group). Each row's within-group percentile
    * (`pr_micro` = ((rank−1)·10⁶) div (n−1), integer-exact; 0 for
    * singleton groups) indexes a (nQuantiles+1)-point global
    * quantile grid, and the row's `norm_score` is the global score
    * at that gridpoint — so a p90 document of ANY group normalizes
    * to the global p90 score. Every step is integer floor division:
    * both engines replay the exact same values, no rounding-mode
    * exposure. Scale shape: ONE partitioned window per group (rank +
    * count, never unpartitioned), ONE [[TrainingOps.globalRank]]
    * range-parallel global rank, grid extraction via a BROADCAST
    * (nQuantiles+1)-row join against the ranked corpus, and the
    * final lookup broadcasts the grid — corpus never shuffles for
    * the lookup. Output: (idCol, groupCol, score, pr_micro,
    * norm_score). */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, nQuantiles: Int = 1000): DataFrame = {
    require(nQuantiles >= 1, s"nQuantiles must be >= 1, got $nQuantiles")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(groupCol),
      col(scoreCol).cast(LongType).as("score"))
    val wg = Window.partitionBy(groupCol)
      .orderBy(col("score"), col(idCol))
    val wn = Window.partitionBy(groupCol)
    val p = base.select(col(idCol), col(groupCol), col("score"),
        row_number().over(wg).cast(LongType).as("rn"),
        count(lit(1)).over(wn).as("n"))
      .withColumn("pr_micro", when(col("n") === 1, 0L)
        .otherwise(expr("((rn - 1) * 1000000) div (n - 1)")))
    val spark = df.sparkSession
    val ranked = graft.llm.TrainingOps.globalRank(
      base.select(col("score"), col(idCol)),
      Seq(col("score"), col(idCol)))
    val ng = base.agg(count(lit(1)).as("ng"))
    val grid = spark.range(nQuantiles + 1L).toDF("k")
      .crossJoin(broadcast(ng))
      .select(col("k"), expr(s"(k * (ng - 1)) div $nQuantiles").as("idx"))
    val gq = ranked.join(broadcast(grid),
        ranked("rank") - 1L === grid("idx"))
      .select(col("k"), col("score").as("norm_score"))
    p.join(broadcast(gq),
        expr(s"k = (pr_micro * $nQuantiles) div 1000000"))
      .select(col(idCol), col(groupCol), col("score"),
        col("pr_micro"), col("norm_score"))
  }
}
