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

  /** KMV (k-minimum-values) distinct-count estimate per group —
    * PORTABLE, unlike HyperLogLog: the sketch is "the k smallest
    * SHA-256-derived 60-bit hashes of the values", so any engine with
    * sha256 reproduces it bit-for-bit (approx_count_distinct's HLL++ is
    * engine-private and can never hash-match an oracle). Estimator:
    * exact count when distinct < k (all hashes retained), else the
    * classic (k-1) / kth-min-normalized-hash [Bar-Yossef et al. 2002].
    *
    * Output: one row per group with `exact_distinct` (for audit; drop
    * at scale), `kmv_est`, and `n_kept`. Plan: one distinct-aggregate
    * shuffle on (group, hash) with map-side partial, then a per-group
    * rank over the DISTINCT hashes — state after dedup is the distinct
    * value set's hashes, and only k of them survive the rank filter
    * into the final agg. At 100 TB the same sketch drops into a
    * TypedImperativeAggregate (a k-slot bounded heap like
    * [[heavyHitters]]); the relational form here keeps the semantics
    * engine-independent and oracle-checkable. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k must be at least 2")
    // 15 hex chars = 60 bits: fits a signed BIGINT exactly, same trick
    // as TrainingOps.splitAssign, reproducible in DuckDB SQL.
    val h = expr(
      s"cast(conv(substr(sha2(cast(`$valueCol` as string), 256), 1, 15), " +
        "16, 10) as bigint)")
    val twoPow60 = 1152921504606846976L // 2^60, hash-space size
    val g = groupCols.map(col)
    val dist = df.select((g :+ h.as("h")): _*).distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    dist
      .withColumn("_rn", row_number().over(w))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("exact_distinct"),
        max(when(col("_rn") <= k, col("h"))).as("_kth"),
        sum(when(col("_rn") <= k, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kmv_est",
        when(col("exact_distinct") < k, col("exact_distinct").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) * lit(twoPow60.toDouble) /
            col("_kth").cast(DoubleType)))
      .drop("_kth")
  }
}
