package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks, composed from built-ins — tier (a)
  * of the custom-operator preference order (no custom plan nodes
  * needed).
  */
object relational {

  /** As-of (point-in-time) LEFT join: for every left row, attach the
    * right row with the LARGEST `rightTime` ≤ `leftTime` within the
    * same `on` keys; no candidate → right side null. Semantics match
    * DuckDB's `ASOF LEFT JOIN` (equal timestamps DO match).
    *
    * Formulation: union both sides, one window sorted by
    * (time, side-marker) per key, `last(right_payload, ignoreNulls)`
    * carries the latest right row forward onto each left row. Exactly
    * ONE shuffle (hash by `on`) + one per-partition sort — the shape
    * that scales: no range-join explosion, no per-row lookups, and the
    * sort is the same work a sort-merge join would do.
    *
    * Right rows must be unique per (on, rightTime) — pre-aggregate the
    * right side otherwise (ties would be nondeterministic).
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val lPayload = left.columns.filterNot(c => on.contains(c)).toSeq
    val rPayload = right.columns.filterNot(c => on.contains(c) || c == rightTime).toSeq
    val lStruct = struct(lPayload.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lStructType = org.apache.spark.sql.types.StructType(
      lPayload.map(c => left.schema(c)))
    val rStructType = org.apache.spark.sql.types.StructType(
      rPayload.map(c => right.schema(c)))

    val lU = left.select(
      (on.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side") :+
        lStruct.as("_l") :+ lit(null).cast(rStructType).as("_r")): _*)
    val rU = right.select(
      (on.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_side") :+
        lit(null).cast(lStructType).as("_l") :+ rStruct.as("_r")): _*)

    // right rows sort BEFORE left rows at equal time (_side 0 < 1), so
    // an exactly-equal right timestamp is visible to the left row.
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = lU.unionByName(rU)
      .withColumn("_rmatch", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val outCols =
      on.map(col) ++
        lPayload.map(c => col(s"_l.$c").as(c)) ++
        rPayload.map(c => col(s"_rmatch.$c").as(c))
    joined.select(outCols: _*)
  }

  /** Point-in-interval range join: INNER join of `points` rows against
    * `intervals` rows where `startCol ≤ pointCol ≤ endCol` (inclusive
    * both ends).
    *
    * A naive non-equi join plans as BroadcastNestedLoop — O(n·m)
    * comparisons and a broadcast of a whole side; the classic
    * bucketized formulation makes it an EQUI join: intervals explode to
    * one row per `bucketWidth`-wide bucket they overlap, points hash to
    * their single containing bucket, the join runs on the bucket key,
    * and the exact range predicate filters residually. Each matching
    * pair meets in EXACTLY one bucket (the point's), so no dedup pass
    * is needed. Cost: shuffle of |points| + Σ span/width interval
    * replicas — scale-tunable via `bucketWidth` (≈ median interval
    * span is the usual choice).
    *
    * Same fail-fast posture as the CIDR generator: an interval wider
    * than `maxBucketsPerInterval` buckets raises with the offending
    * span named, instead of silently exploding one dirty
    * [0, MAX_LONG] row into 10⁹ replicas. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bStart = floor(col(startCol) / bucketWidth).cast("long")
    val bEnd = floor(col(endCol) / bucketWidth).cast("long")
    val guarded = when(bEnd - bStart >= maxBucketsPerInterval,
      raise_error(concat(
        lit(s"rangeJoin: interval ["), col(startCol).cast("string"),
        lit(", "), col(endCol).cast("string"),
        lit(s"] spans >= $maxBucketsPerInterval buckets of width $bucketWidth; "
          + "raise bucketWidth or maxBucketsPerInterval explicitly")))
        .cast("long"))
      .otherwise(bEnd)
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_b", explode(sequence(bStart, guarded)))
    val pts = points.withColumn("_b", floor(col(pointCol) / bucketWidth).cast("long"))
    pts.join(iv, Seq("_b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_b")
  }

  /** Skew-salted INNER equi-join: the fact side's hot keys are spread
    * over `salts` sub-partitions by salting the join key; the dimension
    * side replicates each row once per salt so every (key, salt) pair
    * still meets. Results are identical to `fact.join(dim, on)` — only
    * the partitioning changes: a key holding 30% of the fact rows
    * occupies `salts` reducers instead of one.
    *
    * The salt is derived from the whole fact row (xxhash64), not
    * rand(): deterministic under reruns and retries (a rand() salt
    * re-rolls on task retry and can double-count with speculative
    * execution).
    *
    * Prefer AQE's skew-join split (on by default) when it applies — it
    * needs no dim replication. Manual salting is for the cases AQE
    * can't fix: skewed AGGREGATION feeding the join, joins inside
    * cached/checkpointed subtrees, or deterministic-layout requirements.
    * Replication cost: |dim| × salts rows — size `salts` to the skew
    * factor, not higher. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, on: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val factCols = fact.columns.toSeq
    val f = fact.withColumn("_salt",
      pmod(xxhash64(struct(factCols.map(col): _*)), lit(salts)).cast("int"))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, on :+ "_salt").drop("_salt")
  }
}
