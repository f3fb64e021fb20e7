package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan fan-out (optimization round r15; guide §2.5
  * "input skew: one huge unsplittable file ... repartition immediately
  * after the read").
  *
  * The problem it solves: a parquet file smaller than one row group
  * yields exactly ONE scan partition no matter how many cores the
  * session has — `spark.sql.files.maxPartitionBytes` splits by byte
  * range, but a row group is consumed whole by the split holding its
  * midpoint. Every expensive per-row pipeline fed by such a scan
  * (tokenizer encode, PII regex redaction, media decode, shingle
  * hashing) then runs on one core while the other N-1 idle — and the
  * mandatory total ORDER BY makes it WORSE, because RangePartitioning's
  * sampling pass executes the whole single-task child once more.
  * Profiled at sf0.1/local[32] (r15 baseline): 67 of 237 bench queries
  * executed at parallelism ≈ 1 for 114 s of the 205 s total.
  *
  * The fix is deliberately conditional, derived from the input's
  * estimated size rather than tuned to either local mode or a cluster:
  * fan out ONLY when the optimizer's size estimate says the input is
  * too small to feed every core from its natural file splits
  * (est < cores × maxPartitionBytes). At production scale the estimate
  * exceeds the threshold immediately and the input flows through
  * untouched — no payload shuffle is ever added on the 100 TB path
  * (the guide's §8 rule: never move heavy bytes an extra time).
  *
  * Determinism: repartitioning hash-distributes by `keys` (retry-stable,
  * skew-free for high-cardinality ids — never round-robin, which pays a
  * sort per SPARK-23207 and reshuffles nondeterministically under
  * retries). Every operator in this codebase is row-order independent
  * (deterministic salted-hash everywhere, no rand()/
  * monotonically_increasing_id/spark_partition_id), so placement
  * changes nothing a query computes.
  */
object Par {

  /** Hash-fan-out `df` across the session's default parallelism keyed
    * by `keys` — only when the optimizer's estimate of `df` is below
    * `cores × spark.sql.files.maxPartitionBytes` (i.e. the scan alone
    * cannot feed the machine). Call at the entry of an expensive
    * per-row pipeline, AFTER projecting to the columns it needs. */
  /** The fan-out gate, exposed for operators that pair the fan-out
    * with a second small-input-only decision (e.g. jaccardPairs'
    * one-shot shingle materialization): true iff BOTH hold —
    *
    *  1. the optimizer's estimate of `df` is below
    *     cores × maxPartitionBytes (at production scale this is
    *     immediately false — the cheap check, evaluated first), and
    *  2. the plan's ACTUAL partition count is below the core count —
    *     a generated in-memory input (range/parallelize, e.g. the
    *     MicroBench corpora) is small by bytes yet already spread
    *     across every core, and repartitioning it would be the exact
    *     payload shuffle this gate exists to avoid.
    *
    * CONTRACT (r16, r15 ADVICE): call this on the RAW post-scan
    * projection only — `df.rdd.getNumPartitions` forces physical
    * planning of `df` and, under AQE, reflects the INITIAL
    * pre-coalesce partitioning, so evaluating the gate on a derived
    * plan (post-join, post-aggregate) is both wasted planning work
    * and sensitive to when it runs relative to plan changes. At
    * production scale condition 1 short-circuits first, so the
    * `df.rdd` materialization never happens there. Every current
    * call site complies (scan-projection inputs).
    */
  def isSmall(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    if (cores <= 1) return false
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(cores.toLong) * maxSplit &&
      df.rdd.getNumPartitions < cores
  }

  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fanOut needs at least one hash key")
    if (isSmall(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism,
        keys: _*)
    else df
  }
}
