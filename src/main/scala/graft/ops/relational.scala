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
    * same `on` keys (`direction = "backward"`, the default) — or, with
    * `direction = "forward"`, the SMALLEST `rightTime` ≥ `leftTime`
    * (next-quote-after-trade, next-restock-after-sale); no candidate →
    * right side null. Semantics match DuckDB's `ASOF LEFT JOIN` with
    * `>=` / `<=` respectively (equal timestamps DO match).
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
    *
    * Degenerate-key caveat: one KEY's merged history flows through one
    * window task (the standard as-of plan — fine for real as-of keys
    * like instrument/device, and the same locality a sort-merge join
    * needs). But a key holding half the table (one symbol = 50% of
    * ticks) serializes that half through a single task. For untrusted
    * key distributions set `maxRowsPerKey`: one bounded count
    * aggregate FAILS FAST naming the worst offender (the funnel /
    * rangeJoin / CIDR convention) instead of quietly stalling the
    * stage — split such keys upstream (e.g. sub-key by day) or raise
    * the cap deliberately. */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      maxRowsPerKey: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward" ||
      direction == "nearest",
      s"direction must be backward, forward, or nearest, got $direction")
    if (direction == "nearest")
      return asofNearest(left, right, on, leftTime, rightTime, maxRowsPerKey)
    val forward = direction == "forward"
    maxRowsPerKey.foreach { cap =>
      require(cap > 0, "maxRowsPerKey must be positive")
      // bounded state: per-key counts partial-aggregate map-side; the
      // collect is ≤1 row (worst offender via TakeOrdered)
      val keyed = left.select(on.map(col): _*)
        .unionByName(right.select(on.map(col): _*))
      val offender = keyed.groupBy(on.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") > cap)
        .orderBy(col("_n").desc).limit(1).collect()
      offender.headOption.foreach { r =>
        val key = on.indices.map(r.get).mkString(", ")
        throw new IllegalArgumentException(
          s"asofJoin: key ($key) carries ${r.getLong(on.length)} rows " +
            s"across both sides, above maxRowsPerKey=$cap — its whole " +
            "history would serialize through one window task; split the " +
            "key upstream or raise the cap")
      }
    }
    val lPayload = left.columns.filterNot(c => on.contains(c)).toSeq
    val rPayload = right.columns.filterNot(c => on.contains(c) || c == rightTime).toSeq
    // payload disjointness (the intervalJoin convention): shared
    // payload names would yield duplicate output columns that break
    // any downstream select-by-name ambiguously.
    val sharedPayload = lPayload.toSet intersect rPayload.toSet
    require(sharedPayload.isEmpty,
      s"asofJoin: left/right payload column names must be disjoint, " +
        s"shared: ${sharedPayload.toSeq.sorted.mkString(", ")} — rename " +
        "or prefix the right side's payload columns")
    val lStruct = struct(lPayload.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lStructType = org.apache.spark.sql.types.StructType(
      lPayload.map(c => left.schema(c)))
    val rStructType = org.apache.spark.sql.types.StructType(
      rPayload.map(c => right.schema(c)))

    // side markers order ties so an exactly-equal right timestamp is
    // visible to the left row: backward scans the preceding frame, so
    // right sorts BEFORE left at equal time; forward scans the
    // following frame, so right sorts AFTER left.
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val lU = left.select(
      (on.map(col) :+ col(leftTime).as("_t") :+ lit(lSide).as("_side") :+
        lStruct.as("_l") :+ lit(null).cast(rStructType).as("_r")): _*)
    val rU = right.select(
      (on.map(col) :+ col(rightTime).as("_t") :+ lit(rSide).as("_side") :+
        lit(null).cast(lStructType).as("_l") :+ rStruct.as("_r")): _*)

    // Tertiary sort on the right struct makes the pick DETERMINISTIC
    // when multiple right rows share one (key, rightTime): ordered
    // only by (_t, _side), last()/first() would choose an arbitrary
    // duplicate. Backward then resolves to the GREATEST right payload
    // among equal-time duplicates, forward to the SMALLEST — stable
    // across runs and partitionings. Skipped (documented
    // nondeterminism) only when the right payload is unorderable
    // (map-typed columns).
    val base0 = Window.partitionBy(on.map(col): _*)
    val base =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(rStructType))
        base0.orderBy(col("_t"), col("_side"), col("_r"))
      else base0.orderBy(col("_t"), col("_side"))
    val (frame, pick) =
      if (forward)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("_r"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("_r"), ignoreNulls = true))

    val joined = lU.unionByName(rU)
      .withColumn("_rmatch", pick.over(frame))
      .filter(col("_side") === lSide)

    val outCols =
      on.map(col) ++
        lPayload.map(c => col(s"_l.$c").as(c)) ++
        rPayload.map(c => col(s"_rmatch.$c").as(c))
    joined.select(outCols: _*)
  }

  /** `direction = "nearest"` arm of [[asofJoin]]: the right row with
    * the smallest |rightTime − leftTime| per key; exact ties prefer
    * the BACKWARD candidate (the pandas merge_asof convention).
    * SAME single-shuffle single-sort plan as the directional arms —
    * both candidates come from one window pass (last-preceding +
    * first-following over the same union), then a per-row delta
    * compare picks the winner; never two joins stitched back
    * together (which would need a unique left row id and a second
    * shuffle). */
  private def asofNearest(left: DataFrame, right: DataFrame,
      on: Seq[String], leftTime: String, rightTime: String,
      maxRowsPerKey: Option[Long]): DataFrame = {
    maxRowsPerKey.foreach { cap =>
      require(cap > 0, "maxRowsPerKey must be positive")
      val keyed = left.select(on.map(col): _*)
        .unionByName(right.select(on.map(col): _*))
      val offender = keyed.groupBy(on.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") > cap)
        .orderBy(col("_n").desc).limit(1).collect()
      offender.headOption.foreach { r =>
        val key = on.indices.map(r.get).mkString(", ")
        throw new IllegalArgumentException(
          s"asofJoin: key ($key) carries ${r.getLong(on.length)} rows " +
            s"across both sides, above maxRowsPerKey=$cap — its whole " +
            "history would serialize through one window task; split the " +
            "key upstream or raise the cap")
      }
    }
    val rtName = "_asof_rt"
    val scratch = Seq(rtName, "_t", "_side", "_l", "_r", "_b", "_f", "_rmatch")
    require(!(left.columns ++ right.columns).exists(scratch.contains),
      "asofJoin nearest: inputs must not carry the scratch columns " + scratch)
    val lPayload = left.columns.filterNot(on.contains).toSeq
    val rPayload = right.columns
      .filterNot(c => on.contains(c) || c == rightTime).toSeq
    val sharedPayload = lPayload.toSet intersect rPayload.toSet
    require(sharedPayload.isEmpty,
      s"asofJoin: left/right payload column names must be disjoint, " +
        s"shared: ${sharedPayload.toSeq.sorted.mkString(", ")} — rename " +
        "or prefix the right side's payload columns")
    val r2 = right.withColumn(rtName, col(rightTime))
    val lStruct = struct(lPayload.map(col): _*)
    val rStruct = struct((rPayload :+ rtName).map(col): _*)
    val lStructType = org.apache.spark.sql.types.StructType(
      lPayload.map(c => left.schema(c)))
    val rStructType = org.apache.spark.sql.types.StructType(
      (rPayload.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField(rtName,
          right.schema(rightTime).dataType, nullable = true)))
    // backward side order: right sorts BEFORE left at equal time, so
    // the preceding frame sees an exactly-equal right row (delta 0 —
    // it wins every tie anyway, which is why the following frame
    // excluding equal-time rights loses nothing)
    val lU = left.select(
      (on.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side") :+
        lStruct.as("_l") :+ lit(null).cast(rStructType).as("_r")): _*)
    val rU = r2.select(
      (on.map(col) :+ col(rtName).as("_t") :+ lit(0).as("_side") :+
        lit(null).cast(lStructType).as("_l") :+ rStruct.as("_r")): _*)
    // Same deterministic tertiary key as the directional arms: among
    // right duplicates at one (key, rightTime) the backward candidate
    // is the greatest right payload, the forward candidate the
    // smallest (both stable; without it the window order (_t, _side)
    // leaves last()/first() free to pick an arbitrary duplicate).
    val base0 = Window.partitionBy(on.map(col): _*)
    val base =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(rStructType))
        base0.orderBy(col("_t"), col("_side"), col("_r"))
      else base0.orderBy(col("_t"), col("_side"))
    val bwd = last(col("_r"), ignoreNulls = true).over(
      base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("_r"), ignoreNulls = true).over(
      base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val joined = lU.unionByName(rU)
      .withColumn("_b", bwd).withColumn("_f", fwd)
      .filter(col("_side") === 1)
      .withColumn("_rmatch",
        when(col("_f").isNull, col("_b"))
          .when(col("_b").isNull, col("_f"))
          .when(col("_t") - col(s"_b.$rtName") <=
            col(s"_f.$rtName") - col("_t"), col("_b"))
          .otherwise(col("_f")))
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

  /** Interval-OVERLAP join: INNER join of `a` rows against `b` rows
    * where `[aStart, aEnd]` and `[bStart, bEnd]` intersect (inclusive
    * ends) — sessions×incidents, downtime×orders, any two event-span
    * sets. Same bucketization as [[rangeJoin]] (an inequality θ-join
    * would be a broadcast nested loop): both sides replicate to the
    * fixed-width buckets their span covers and pairs meet on the
    * bucket equi-key. A pair overlapping across SEVERAL shared
    * buckets would duplicate — the standard EMIT-ONCE guard keeps
    * each pair exactly once: only the bucket containing
    * `greatest(aStart, bStart)` (the overlap's left edge, which
    * every overlapping pair shares) emits. No distinct pass needed —
    * dedup by construction, so output size is the answer size.
    * Same fail-fast as rangeJoin on spans wider than
    * `maxBucketsPerInterval` buckets. Column names across the two
    * inputs must be disjoint. */
  def intervalJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dup = a.columns.toSet & b.columns.toSet
    require(dup.isEmpty, s"inputs share column names: $dup")
    require(!(a.columns ++ b.columns).contains("_b"),
      "_b is a reserved scratch column")

    def buckets(df: DataFrame, s: String, e: String): DataFrame = {
      val bs = floor(col(s) / bucketWidth).cast("long")
      val be = floor(col(e) / bucketWidth).cast("long")
      val guarded = when(be - bs >= maxBucketsPerInterval,
        raise_error(concat(
          lit("intervalJoin: interval ["), col(s).cast("string"),
          lit(", "), col(e).cast("string"),
          lit(s"] spans >= $maxBucketsPerInterval buckets of width "
            + s"$bucketWidth; raise bucketWidth or maxBucketsPerInterval")))
          .cast("long"))
        .otherwise(be)
      df.filter(col(s) <= col(e))
        .withColumn("_b", explode(sequence(bs, guarded)))
    }

    buckets(a, aStart, aEnd).join(buckets(b, bStart, bEnd), Seq("_b"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        // emit-once: only the bucket holding the overlap's left edge
        col("_b") === floor(greatest(col(aStart), col(bStart)) / bucketWidth)
          .cast("long"))
      .drop("_b")
  }

  /** n-step event funnel: for every entity, find the step-0 events
    * from which the full chain `steps(0) → steps(1) → … → steps(n-1)`
    * completes, where step i+1 must occur STRICTLY AFTER the matched
    * step-i event and within `windowsMs(i)` of it. EXISTS semantics —
    * a chain counts if ANY valid assignment of events completes it,
    * not just the greedy-earliest one (greedy is wrong: picking the
    * earliest step-i event can start the step-i+1 window too early and
    * miss a completion a later step-i event would catch; FunnelSpec
    * pins this case).
    *
    * Output: one row per completing (id, step-0 event):
    * `(idCol, start_ms, end_ms)` with `end_ms` = earliest completing
    * last-step time. Events with null id/time are ignored.
    *
    * Plan shape: one equi join on id per subsequent step with the time
    * window as a residual predicate, deduplicated per step — the
    * intermediate is (id, start, step-i time) DISTINCT, so fan-out is
    * bounded by each entity's event count inside the window, never a
    * cross-entity blow-up. All joins share the id hash partitioning;
    * at 100 TB a bot entity with pathological event density makes the
    * per-step blow-up quadratic in ITS event count. Either filter bots
    * upstream, or set `maxEventsPerEntityStep`: the guard runs one
    * bounded count aggregate and FAILS FAST naming the worst offender
    * (the engine's rangeJoin/CIDR convention) instead of letting one
    * entity quietly dominate the stage. */
  def funnel(events: DataFrame, idCol: String, typeCol: String,
      timeCol: String, steps: Seq[String], windowsMs: Seq[Long],
      maxEventsPerEntityStep: Option[Int] = None): DataFrame = {
    require(steps.length >= 2, "a funnel needs at least 2 steps")
    require(windowsMs.length == steps.length - 1,
      s"need ${steps.length - 1} windows for ${steps.length} steps; got ${windowsMs.length}")
    require(windowsMs.forall(_ > 0), "windows must be positive")
    val reserved = Seq("start_ms", "end_ms", "_cur", "_nxt", "_ft", "_fms")
    require(!reserved.contains(idCol),
      s"funnel: idCol '$idCol' collides with the funnel's output/internal " +
        s"columns (${reserved.mkString(", ")}); rename it upstream")
    val base = events.select(col(idCol), col(typeCol).as("_ft"),
        col(timeCol).cast("long").as("_fms"))
      .filter(col(idCol).isNotNull && col("_fms").isNotNull)
    maxEventsPerEntityStep.foreach { cap =>
      require(cap > 0, "maxEventsPerEntityStep must be positive")
      // bounded state: groupBy count partial-aggregates map-side; the
      // collect is ≤1 row (the worst offender via TakeOrdered)
      val offender = base.filter(col("_ft").isin(steps: _*))
        .groupBy(col(idCol), col("_ft")).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > cap)
        .orderBy(col("_n").desc).limit(1).collect()
      offender.headOption.foreach { r =>
        throw new IllegalArgumentException(
          s"funnel: entity '${r.get(0)}' has ${r.getLong(2)} " +
            s"'${r.get(1)}' events, above maxEventsPerEntityStep=$cap — " +
            "filter it upstream or raise the cap")
      }
    }
    var cur = base.filter(col("_ft") === steps.head)
      .select(col(idCol), col("_fms").as("start_ms"), col("_fms").as("_cur"))
      .distinct()
    steps.tail.zip(windowsMs).foreach { case (tp, win) =>
      val nxt = base.filter(col("_ft") === tp)
        .select(col(idCol), col("_fms").as("_nxt"))
      cur = cur.join(nxt, Seq(idCol))
        .filter(col("_nxt") > col("_cur") && col("_nxt") <= col("_cur") + win)
        .select(col(idCol), col("start_ms"), col("_nxt").as("_cur"))
        .distinct()
    }
    cur.groupBy(col(idCol), col("start_ms"))
      .agg(min(col("_cur")).as("end_ms"))
  }

  /** Skew-salted INNER equi-join: the fact side's hot keys are spread
    * over `salts` sub-partitions by salting the join key; the dimension
    * side replicates each row once per salt so every (key, salt) pair
    * still meets. Results are identical to `fact.join(dim, on)` — only
    * the partitioning changes: a key holding 30% of the fact rows
    * occupies `salts` reducers instead of one.
    *
    * The salt is derived from the fact row's HASHABLE columns
    * (xxhash64), not rand(): deterministic under reruns and retries (a
    * rand() salt re-rolls on task retry and can double-count with
    * speculative execution). MapType columns are excluded from the
    * hash — xxhash64 rejects them at analysis time — and the join keys
    * are always included, so the salt stays well-defined for any fact
    * schema. The internal salt column name is collision-checked
    * against both inputs.
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
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = fact.schema.fields
      .filter(f => hashable(f.dataType)).map(_.name).toSeq
    require(hashCols.nonEmpty, "fact side has no hashable columns to salt on")
    val salt = Iterator.from(0)
      .map(i => if (i == 0) "_salt" else s"_salt$i")
      .find(n => !fact.columns.contains(n) && !dim.columns.contains(n)).get
    val f = fact.withColumn(salt,
      pmod(xxhash64(struct(hashCols.map(col): _*)), lit(salts)).cast("int"))
    val d = dim.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, on :+ salt).drop(salt)
  }

  /** Fuzzy record linkage (typo-tolerant key matching): for every
    * left row, the single best right match by Levenshtein edit
    * distance ≤ `maxDist` (ties → smallest right id), or no row if
    * nothing qualifies. The classic entity-resolution join a data
    * pipeline needs when keys arrive hand-typed.
    *
    * Candidate generation is PREFIX/SUFFIX BLOCKING, the standard
    * linkage trick that avoids the all-pairs cartesian: each side
    * emits two block keys — (first `blockLen` chars) and (last
    * `blockLen` chars) — via one map-only explode, and candidates
    * come from ONE hash join on the block key. Complete by
    * construction for any edit run that leaves the first OR the last
    * `blockLen` characters intact (a single typo on a key longer
    * than 2·blockLen always does); edits mangling BOTH ends are
    * outside the contract — documented, not silent.
    *
    * Scale shape: one equi-join on block keys (broadcast when the
    * probe side is small), per-pair codegen'd `levenshtein`, then
    * ONE `min_by` aggregate per left row — never a rank window, and
    * the distance cap prunes before the aggregate. Block-key skew
    * (every key sharing one prefix) is the operator's hazard — and
    * it FAILS FAST, not silently: the worst block's |left|·|right|
    * candidate product is checked against `maxBlockProduct` with one
    * keys-only aggregate pair before any Levenshtein runs (the
    * ScaleSmoke fuzzy_link scenario's first draft hit exactly this
    * with a shared "name " prefix — 2·10¹⁰ pairs). Raise the cap
    * deliberately, lengthen `blockLen`, or pre-salt; don't let one
    * block serialize the join.
    *
    * Output: (left_id, left_key, match_id, match_key, dist). */
  def fuzzyLinkJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String, rightId: String, rightKey: String,
      maxDist: Int, blockLen: Int = 3,
      maxBlockProduct: Long = 1000000000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(maxBlockProduct >= 1,
      s"maxBlockProduct must be >= 1, got $maxBlockProduct")
    def blocks(df: DataFrame, id: String, key: String, pfx: String) =
      df.filter(col(key).isNotNull)
        .select(col(id).as(s"${pfx}_id"), col(key).as(s"${pfx}_key"),
          explode(array(
            substring(col(key), 1, blockLen),
            substring(col(key), -blockLen, blockLen))).as("_blk"))
        .distinct() // a short key's two blocks can coincide
    val lb = blocks(left, leftId, leftKey, "l")
    val rb = blocks(right, rightId, rightKey, "r")
    // skew guard: keys-only per-block counts, worst product via one
    // TakeOrdered row — runs before any per-pair work
    val offender = lb.groupBy("_blk").agg(count(lit(1)).as("_ln"))
      .join(rb.groupBy("_blk").agg(count(lit(1)).as("_rn")), Seq("_blk"))
      .select(col("_blk"), (col("_ln") * col("_rn")).as("_prod"))
      .filter(col("_prod") > maxBlockProduct)
      .orderBy(col("_prod").desc).limit(1).collect()
    offender.headOption.foreach { r =>
      throw new IllegalArgumentException(
        s"fuzzyLinkJoin: block '${r.get(0)}' pairs ${r.getLong(1)} " +
          s"candidates, above maxBlockProduct=$maxBlockProduct — a " +
          "shared prefix/suffix is serializing the join; lengthen " +
          "blockLen, pre-salt the keys, or raise the cap deliberately")
    }
    val cand = lb.join(rb, Seq("_blk"))
      // a pair matching on BOTH prefix and suffix appears twice — the
      // groupBy below collapses it; no distinct exchange needed
      .withColumn("dist", levenshtein(col("l_key"), col("r_key")))
      .filter(col("dist") <= maxDist)
    cand.groupBy(col("l_id").as("left_id"), col("l_key").as("left_key"))
      .agg(
        min_by(struct(col("r_id"), col("r_key"), col("dist")),
          struct(col("dist"), col("r_id"))).as("_m"))
      .select(col("left_id"), col("left_key"),
        col("_m.r_id").as("match_id"), col("_m.r_key").as("match_key"),
        col("_m.dist").as("dist"))
  }

  /** Bloom-prefiltered INNER equi-join (the explicit cross-stage
    * runtime filter): build a Bloom filter over the dimension side's
    * join keys, probe it in the FACT SCAN's filter (so the probe sits
    * inside whole-stage codegen, before any exchange), then run the
    * exact join. Results are identical to `fact.join(dim, key)` — the
    * Bloom filter has false positives but never false negatives, so
    * it only lets a few extra fact rows reach the exact join, which
    * drops them.
    *
    * When it pays: the dim side is too big to broadcast (so the join
    * shuffles BOTH sides) but its key set still fits a few MB of
    * Bloom bits — the classic selective-dim × huge-fact shape. The
    * fact side then shuffles only ≈ |matching| + fpp·|fact| rows
    * instead of |fact|. Spark's own `spark.sql.optimizer.runtime.
    * bloomFilter.enabled` injects the same idea when it can; this
    * operator is for the cases the injected filter misses — joins
    * under cached/checkpointed subtrees, multi-stage pipelines where
    * the dim is computed once and reused, or when the filter must be
    * sized/fpp-tuned deliberately.
    *
    * Driver cost: ONE keys-only pass over dim (count + distributed
    * treeAggregate build) and O(filter bits) driver memory —
    * `BloomFilter.create(n, fpp)` at fpp=0.01 is ~1.2 bytes/key, so
    * cap `maxFilterBytes` (default 64 MB ≈ 50M keys) and FAIL FAST
    * past it rather than silently assembling a multi-GB plan
    * broadcast: at that size, bucket both sides or let the shuffle
    * happen instead.
    *
    * Keys must be integral (int/long/short/byte) — probes run through
    * the codegen'd [[graft.expressions.BloomContainsLong]] with no
    * per-row boxing or string round-trip. Null fact keys never match
    * an inner join and are dropped by the probe's null-safe eval. */
  def bloomPreJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fpp: Double = 0.01,
      maxFilterBytes: Long = 64L << 20): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def integral(df: DataFrame, k: String): Unit =
      df.schema(k).dataType match {
        case LongType | IntegerType | ShortType | ByteType => ()
        case dt => throw new IllegalArgumentException(
          s"bloomPreJoin: key '$k' is $dt — integral keys only " +
            "(string keys: build on BloomContains instead)")
      }
    integral(fact, factKey); integral(dim, dimKey)
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val keys = dim.select(col(dimKey).cast("long").as("k")).na.drop()
    // size from a cheap count of key ROWS (an upper bound on distinct
    // keys — oversizing only lowers the fpp); one bounded aggregate
    val n = math.max(1000L, keys.count())
    val bits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    require(bits / 8 <= maxFilterBytes,
      s"bloomPreJoin: $n dim keys at fpp=$fpp need ${bits / 8} filter " +
        s"bytes, above maxFilterBytes=$maxFilterBytes — bucket both " +
        "sides or let the plain shuffle join run instead")
    val bf = keys.rdd.map(_.getLong(0)).treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(n, fpp))(
      (f, k) => { f.putLong(k); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val b = org.apache.spark.sql.GraftColumnBridge
    val contains = b.column(graft.expressions.BloomContainsLong(
      b.expression(col(factKey).cast("long")), bos.toByteArray))
    fact.filter(contains)
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
