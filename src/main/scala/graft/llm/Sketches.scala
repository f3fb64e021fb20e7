package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge => bridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch aggregates ([EXT]): bounded-state summaries for questions a
  * full groupBy-count can't answer affordably at 100 TB. See the
  * expression classes for the guarantees each sketch makes. */
object Sketches {

  /** SpaceSaving heavy hitters of `c` per group — use inside
    * `groupBy(...).agg(...)`; returns `array<struct<item,cnt,err>>`
    * sorted by (cnt desc, item asc). Exact when the group's distinct
    * count ≤ capacity (err = 0); bounded-error estimate otherwise.
    * State per group is ≤ capacity entries at every point in the
    * partial/merge/final chain. */
  def heavyHitters(c: Column, capacity: Int): Column =
    bridge.column(graft.expressions.HeavyHittersAgg(
      bridge.expression(c), capacity).toAggregateExpression())

  /** Pre-join skew diagnosis: the top-k join-key values by frequency
    * with their share of the table — the number that decides between
    * a plain join, AQE skew splitting, and `saltedJoin` (this
    * engine's documented escalation ladder). One bounded-state
    * SpaceSaving aggregate over the whole table (state ≤ capacity
    * entries through partial/merge/final — never a groupBy of the
    * full key space, which for a URL/host key is corpus-sized).
    * Output: (key, cnt, err, share) sorted by cnt desc; `share` is
    * cnt / total rows (nulls in key columns participate — a
    * mostly-null join key IS a skew hazard). */
  def diagnoseSkew(df: DataFrame, keyCols: Seq[String], k: Int = 20,
      capacity: Int = 4096): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val key = concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    df.agg(heavyHitters(key, capacity).as("_hh"),
        count(lit(1)).as("_total"))
      .select(explode(col("_hh")).as("h"), col("_total"))
      .select(col("h.item").as("key"), col("h.cnt").as("cnt"),
        col("h.err").as("err"),
        (col("h.cnt").cast("double") / col("_total")).as("share"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
  }

  /** 15 hex chars of sha256 = 60 bits: fits a signed BIGINT exactly,
    * same trick as TrainingOps.splitAssign, reproducible in DuckDB SQL.
    * Shared by both KMV tiers so their hash spaces are identical. */
  private def kmvHash(valueCol: String): Column = expr(
    s"cast(conv(substr(sha2(cast(`$valueCol` as string), 256), 1, 15), " +
      "16, 10) as bigint)")

  /** The shared 60-bit hash, exposed for the streaming sketch tiers
    * (Streaming.cardinalityMonitorStream) so batch and stream agree
    * register for register. */
  private[graft] def hash60(valueCol: String): Column = kmvHash(valueCol)

  private val twoPow60 = 1152921504606846976L // 2^60, hash-space size

  /** Shared estimator: exact count when distinct < k (all hashes
    * retained), else the classic (k-1) / kth-min-normalized-hash
    * [Bar-Yossef et al. 2002]. One formula for both tiers so they are
    * bit-equal (the (k-1)·2^60 product is exact in double, then a
    * single division). */
  private def kmvEstimate(nKept: Column, kth: Column, k: Int): Column =
    when(nKept < k, nKept.cast(DoubleType))
      .otherwise(lit((k - 1).toDouble) * lit(twoPow60.toDouble) /
        kth.cast(DoubleType))

  /** KMV (k-minimum-values) distinct-count estimate per group —
    * PORTABLE, unlike HyperLogLog: the sketch is "the k smallest
    * SHA-256-derived 60-bit hashes of the values", so any engine with
    * sha256 reproduces it bit-for-bit (approx_count_distinct's HLL++ is
    * engine-private and can never hash-match an oracle).
    *
    * Output: one row per group with `exact_distinct` (for audit; drop
    * at scale), `kmv_est`, and `n_kept`. NOTE: `exact_distinct` counts
    * distinct 60-bit HASHES, not distinct values — a 60-bit collision
    * (birthday-expected past ~2^30 distinct values per group) makes it
    * an undercount; it is an audit column for the small-SF oracle, not
    * a guarantee.
    *
    * This relational tier is the executable oracle SPEC: plan is one
    * distinct-aggregate shuffle on (group, hash), then a per-group rank
    * over the distinct hashes — which lands a group's ENTIRE distinct
    * set in one task, so it does NOT survive a billion-distinct group.
    * The scale tier is [[kmvDistinctSketch]] (bounded state, identical
    * values); SketchesSpec parity-tests the two. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val h = kmvHash(valueCol)
    val g = groupCols.map(col)
    // NULL values are not distinct elements: the sketch tier's
    // update() skips nulls, so this spec tier must too — otherwise a
    // null in valueCol hashes to h=NULL, ranks first (NULLS FIRST in
    // the ascending window) and inflates exact_distinct/n_kept,
    // breaking the bit-equal-tiers invariant.
    val dist = df.select((g :+ h.as("h")): _*)
      .filter(col("h").isNotNull).distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    dist
      .withColumn("_rn", row_number().over(w))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("exact_distinct"),
        max(when(col("_rn") <= k, col("h"))).as("_kth"),
        sum(when(col("_rn") <= k, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kmv_est",
        // exact_distinct < k ⟺ n_kept < k here (below k every distinct
        // hash is retained); the sketch tier branches on n_kept, this
        // tier keeps exact_distinct so the audit column drives the SQL.
        kmvEstimate(col("exact_distinct"), col("_kth"), k))
      .drop("_kth")
  }

  /** KMV distinct-count, BOUNDED-STATE tier: same hash space, same
    * estimator, same output values as [[kmvDistinct]] (minus the
    * `exact_distinct` audit column, which by definition needs unbounded
    * state), but computed by [[graft.expressions.KmvDistinctAgg]] — a
    * TypedImperativeAggregate whose per-group state is k longs through
    * the whole partial/merge/final chain. The shuffle carries one
    * ≤(4+8k)-byte sketch per (group, map partition), never the distinct
    * hash set, so a billion-distinct group costs the same as a
    * 100-distinct one. This is the tier you run at 100 TB; the
    * relational tier is the oracle spec it is parity-tested against. */
  def kmvDistinctSketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val g = groupCols.map(col)
    val sk = bridge.column(graft.expressions.KmvDistinctAgg(
      bridge.expression(col("_kmv_h")), k).toAggregateExpression())
    df.select((g :+ kmvHash(valueCol).as("_kmv_h")): _*)
      // mirror of the relational tier's null filter: NULL values are
      // not distinct elements, and a group with ONLY nulls drops from
      // both tiers (the agg skips nulls anyway — this pre-filter keeps
      // group-existence semantics identical).
      .filter(col("_kmv_h").isNotNull)
      .groupBy(g: _*)
      .agg(sk.as("_sk"))
      .select((g ++ Seq(
        col("_sk.n_kept").as("n_kept"),
        kmvEstimate(col("_sk.n_kept"), col("_sk.kth"), k).as("kmv_est"))): _*)
  }

  /** HLL bias-correction constant α_m in micro-units (integer, so the
    * estimator is an exact integer division both engines replay). */
  private def hllAlphaMicro(m: Int): Long = m match {
    case 16 => 673000L
    case 32 => 697000L
    case 64 => 709000L
    case _ => math.round(0.7213 / (1.0 + 1.079 / m) * 1e6)
  }

  /** The estimator numerator α_micro·m²·2^S (S = 61−p) as an exact
    * integer — ≤ ~1.1e29 at p=16, inside DECIMAL(38,0)/HUGEINT. */
  private[graft] def hllNumerator(p: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(hllAlphaMicro(1 << p))
      .multiply(java.math.BigInteger.valueOf(1L << p))
      .multiply(java.math.BigInteger.valueOf(1L << p))
      .multiply(java.math.BigInteger.TWO.pow(61 - p))

  /** Shared HLL estimator: est_micro = α·m²/Z in micro-units, computed
    * as NUM // denom_scaled — one exact 128-bit integer division, so
    * both tiers (and the DuckDB oracle) are bit-equal. No small-range
    * linear-counting correction: that needs a cross-engine-identical
    * ln(), which IEEE does not give — `n_zero` is returned instead so
    * a caller (or auditor) can apply its own correction. */
  private def hllEstimate(denomScaled: Column, p: Int): Column =
    expr(s"CAST(CAST('${hllNumerator(p)}' AS DECIMAL(38,0)) div " +
      "denom_scaled AS BIGINT)")

  private def hllRegisters(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int): (Seq[Column], Int, Int, DataFrame) = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1 << p
    val s = 61 - p // max rho (the W-bit suffix is all zeros)
    val g = groupCols.map(col)
    val df2 = df.select((g :+ kmvHash(valueCol).as("_h")): _*)
      // NULL values are not distinct elements (kmv convention): an
      // all-null group drops from both tiers.
      .filter(col("_h").isNotNull)
    (g, m, s, df2)
  }

  /** HyperLogLog distinct-count per group, RELATIONAL tier — the
    * executable oracle spec of [[hllDistinctSketch]] (DuckDB replays it
    * verbatim; SketchesSpec parity-tests the two). Same SHA-derived
    * 60-bit hash space as the KMV tiers; the textbook register split
    * (index = h mod 2^p, rho = S − bitLength(h div 2^p), S = 61−p) as
    * plain relational ops: one (group, register) max-aggregate, then a
    * per-group sum. Output per group: `n_zero` (empty registers — the
    * linear-counting audit signal), `denom_scaled` (Σ 2^(S−M_j), the
    * harmonic denominator as an EXACT integer ≤ 2^61), `hll_est_micro`
    * (α·m²/Z in micro-units via exact integer division).
    *
    * Scale note: this tier's (group, register) aggregate is bounded at
    * m rows per group AFTER the shuffle, but the shuffle itself carries
    * every distinct (group, register, rho) triple — fine anywhere; the
    * sketch tier is still cheaper (one 2^p-byte state per group per map
    * partition, map-side combined). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 6): DataFrame = {
    val (g, m, s, withH) = hllRegisters(df, groupCols, valueCol, p)
    val w = expr(s"_h div $m")
    val rho = (lit(s) -
      when(w === 0L, 0).otherwise(length(bin(w)))).cast(IntegerType)
    withH
      .select((g ++ Seq((col("_h") % m).cast(IntegerType).as("_reg"),
        rho.as("_rho"))): _*)
      .groupBy((g :+ col("_reg")): _*)
      .agg(max(col("_rho")).as("_rmax"))
      .groupBy(g: _*)
      .agg(
        (lit(m) - count(lit(1))).cast(IntegerType).as("n_zero"),
        (sum(expr(s"shiftleft(1L, $s - _rmax)")) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << s))
          .cast(LongType).as("denom_scaled"))
      .withColumn("hll_est_micro", hllEstimate(col("denom_scaled"), p))
  }

  /** HyperLogLog distinct-count, BOUNDED-STATE tier: same hash space,
    * same registers, same output values as [[hllDistinct]], computed by
    * [[graft.expressions.HllSketchAgg]] — per-group state is 2^p bytes
    * (64 at the default p=6) through the whole partial/merge/final
    * chain, never growing with the distinct count. Where KMV's state is
    * 8k bytes and exact below k, HLL is the fixed-64-byte corpus-scale
    * answer; ~1.04/√m relative error (13% at p=6, 3.3% at p=10). */
  def hllDistinctSketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 6): DataFrame = {
    val (g, _, _, withH) = hllRegisters(df, groupCols, valueCol, p)
    val sk = bridge.column(graft.expressions.HllSketchAgg(
      bridge.expression(col("_h")), p).toAggregateExpression())
    withH
      .groupBy(g: _*)
      .agg(sk.as("_sk"))
      .select((g ++ Seq(
        col("_sk.n_zero").as("n_zero"),
        col("_sk.denom_scaled").as("denom_scaled"),
        hllEstimate(col("_sk.denom_scaled"), p).as("hll_est_micro"))): _*)
  }

  /** Per-SHARD HLL sketches in their PERSISTABLE form: one row per
    * group with the raw 2^p register bytes. This is the 100 TB sketch-
    * table idiom — write one sketch row per (day, source, partition)
    * at ingest time, then answer any coarser-grain cardinality
    * question later from the stored bytes via [[hllMergeShards]],
    * never re-scanning the data. Registers are a pure function of the
    * value set, so stored sketches are engine-reproducible and any
    * merge order gives identical bytes. */
  def hllShardSketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Int = 6): DataFrame = {
    val (g, _, _, withH) = hllRegisters(df, groupCols, valueCol, p)
    val sk = bridge.column(graft.expressions.HllRegsAgg(
      bridge.expression(col("_h")), p).toAggregateExpression())
    withH.groupBy(g: _*).agg(sk.as("hll_regs"))
  }

  /** Max-merge stored shard sketches ([[hllShardSketch]] rows) to a
    * coarser grain: same output columns and identical values as
    * running [[hllDistinctSketch]] directly at that grain — the
    * associativity contract SketchesSpec pins. */
  def hllMergeShards(df: DataFrame, groupCols: Seq[String],
      regsCol: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val g = groupCols.map(col)
    val mg = bridge.column(graft.expressions.HllMergeAgg(
      bridge.expression(col(regsCol)), p).toAggregateExpression())
    df.groupBy(g: _*).agg(mg.as("_sk"))
      .select((g ++ Seq(
        col("_sk.n_zero").as("n_zero"),
        col("_sk.denom_scaled").as("denom_scaled"),
        hllEstimate(col("_sk.denom_scaled"), p).as("hll_est_micro"))): _*)
  }

  /** The d salted 60-bit hashes a CMS row uses: hash_i =
    * sha256("cms<i>:" ++ value) truncated to 15 hex chars — same
    * engine-portable hash space as the KMV/HLL tiers, one salt per
    * matrix row so the d bucket choices are independent. A NULL value
    * salts to an all-NULL array (the aggregate skips those rows). */
  private[graft] def cmsHashes(c: Column, d: Int): Column =
    array((0 until d).map { i =>
      conv(substring(sha2(
        concat(lit(s"cms$i:"), c.cast(StringType)), 256), 1, 15), 16, 10)
        .cast(LongType)
    }: _*)

  /** Count-Min point-frequency estimates: build ONE d×w sketch over
    * `df`'s `valueCol` (bounded state — d·w longs through the whole
    * partial/merge/final chain, whatever the key cardinality), then
    * answer a frequency query for every row of `probes` as the min
    * over the d counters the probe hashes into. One-sided error by
    * construction: `cms_est ≥ true count`, overcount ≤ N/w per row
    * with high probability.
    *
    * Plan shape: one map-side-combined aggregate over the corpus to a
    * single 1-row sketch, broadcast onto the (small) probe side — the
    * corpus is never grouped by key, which is the point: a corpus-wide
    * per-key groupBy at 100 TB shuffles the key space, this shuffles
    * d·w longs. NULLs are not counted and NULL probes get no row,
    * matching the KMV/HLL convention. */
  def cmsFrequencies(df: DataFrame, valueCol: String, probes: DataFrame,
      probeCol: String, d: Int = 4, w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    val sk = bridge.column(graft.expressions.CmsSketchAgg(
      bridge.expression(col("_cms_h")), w).toAggregateExpression())
    val sketch = df.select(cmsHashes(col(valueCol), d).as("_cms_h"))
      .filter(!exists(col("_cms_h"), _.isNull))
      .agg(sk.as("_m"))
    probes
      .filter(col(probeCol).isNotNull)
      .crossJoin(broadcast(sketch))
      .withColumn("cms_est",
        // empty-corpus guard: an all-filtered corpus yields a 0-row
        // matrix; under ANSI the element_at would error, and the
        // correct point estimate for "nothing counted" is 0
        when(size(col("_m")) === 0, lit(0L)).otherwise(
          array_min(transform(
            cmsHashes(col(probeCol), d),
            (h, i) => element_at(element_at(col("_m"), i + 1),
              (h % w).cast(IntegerType) + 1)))))
      .drop("_m")
  }

  /** Histogram-sketch quantiles: per group, P-th percentile BRACKETS
    * from a fixed-width `buckets`-bin histogram over the observed
    * [lo, hi] span — the bounded-state quantile answer (an exact
    * per-group sort of a 100 TB column is the thing this avoids; a
    * group's state is ≤`buckets` counters however many rows it has).
    * Everything is exact integer arithmetic in micro-units:
    *
    *   bin(x)  = min(buckets−1, (x−lo)·buckets div (hi−lo))
    *   pick(p) = smallest bin with cum·100 ≥ p·n
    *
    * so the chosen bin and its nominal [lo + b·span div buckets,
    * lo + (b+1)·span div buckets) bounds are engine-exact; the TRUE
    * quantile lies inside the returned bracket by construction (the
    * sketch's honest contract — it brackets, it does not interpolate).
    * Span·buckets overflowing 63 bits fails fast (the zOrderKeys
    * guard). NULL values are not counted; a group that is ALL NULLs
    * emits nothing; lo = hi degenerates to the single bin 0.
    *
    * Two passes (span, then counts) + one per-group ≤`buckets`-row
    * window — never a per-row rank. Output: (group…, p, n, bin,
    * lo_micro, hi_micro). */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, buckets: Int = 64,
      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $ps")
    require(ps.distinct.size == ps.size, "percentiles must be distinct")
    val g = groupCols.map(col)
    val x = floor(col(valueCol) * 1000000d).cast(LongType)
    val base = df.filter(col(valueCol).isNotNull)
      .select((g :+ x.as("_x")): _*)
    // overflow guard IN-PLAN (the rangeJoin/intervalJoin convention):
    // a group whose span would overflow 63-bit bin scaling raises a
    // NAMED error inside the span aggregate itself — no driver-side
    // materialization of the group key space (group cardinality is
    // data-sized in general; collecting it would funnel millions of
    // rows through the driver on the happy path at 100× scale).
    val span = base.groupBy(g: _*)
      .agg(min("_x").as("_lo"), max("_x").as("_hiRaw"))
      .withColumn("_hi",
        when(col("_hiRaw") =!= col("_lo") &&
            (col("_hiRaw") - col("_lo")) > Long.MaxValue / buckets,
          raise_error(concat(
            lit("histogramQuantiles: group ("),
            concat_ws(", ", g.map(_.cast("string")): _*),
            lit(") span "), (col("_hiRaw") - col("_lo")).cast("string"),
            lit(s" overflows $buckets-bin scaling — fewer buckets or " +
              "pre-clamp the value"))).cast(LongType))
          .otherwise(col("_hiRaw")))
      .drop("_hiRaw")
    val binned = base.join(span, groupCols)
      .withColumn("_bin", when(col("_hi") === col("_lo"), lit(0L))
        .otherwise(least(lit(buckets - 1L),
          expr(s"((_x - _lo) * $buckets) div (_hi - _lo)"))))
      .groupBy((g :+ col("_lo") :+ col("_hi") :+ col("_bin")): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("_bin")
    val cum = binned
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(
        Window.partitionBy(groupCols.map(col): _*)))
    val exploded = cum.withColumn("p",
        explode(array(ps.map(lit(_)): _*)))
      .filter(col("_cum") * 100 >= col("p") * col("_n"))
      .groupBy((g :+ col("p")): _*)
      .agg(min_by(struct(col("_bin"), col("_lo"), col("_hi"),
        col("_n")), col("_bin")).as("_m"))
    exploded.select((g :+ col("p") :+ col("_m._n").as("n")
      :+ col("_m._bin").as("bin")
      :+ (col("_m._lo") + expr(
        "(_m._bin * (_m._hi - _m._lo)) div " + buckets)).as("lo_micro")
      :+ when(col("_m._bin") === (buckets - 1L), col("_m._hi"))
        .otherwise(col("_m._lo") + expr(
          s"((_m._bin + 1) * (_m._hi - _m._lo)) div $buckets"))
        .as("hi_micro")): _*)
  }
}
