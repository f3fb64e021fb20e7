package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** ETL maintenance operators ([EXT]): the table-lifecycle ops a
  * production pipeline runs around the reference's load paths —
  * slowly-changing-dimension history, snapshot diffing, declarative
  * data-quality gates, and profile drift. All report in exact
  * integers (counts and micro-unit rates), so every result is
  * engine-replayable.
  */
object etl {

  /** Build SCD Type-2 history from a change log: per key, the value
    * timeline as (valid_from, valid_to, is_current) intervals — the
    * dimension-table shape every warehouse keeps.
    *
    * Semantics: within one (key, ts) the LAST writer wins
    * (deterministic via `max_by` on `tieCol` — never arrival order);
    * consecutive no-op updates (value unchanged vs the previous
    * timestamp) COLLAPSE into the open interval (null-safe equality,
    * so null→null is a no-op too); `valid_to` is the next change's
    * `valid_from` (half-open intervals, adjacent by construction);
    * the latest row per key has `valid_to` NULL and
    * `is_current` true.
    *
    * Scale shape: one hash aggregate (last-writer) + one per-key
    * window pass (lag to collapse, lead to close intervals) — windows
    * partition BY KEY, so parallelism is the key space, never a
    * global sort. */
  def scd2History(df: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], tieCol: String): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column required")
    val v = struct(valueCols.map(col): _*)
    val lastW = df
      .groupBy(col(keyCol), col(tsCol).as("valid_from"))
      .agg(max_by(v, col(tieCol)).as("_v"))
    val byKey = Window.partitionBy(keyCol).orderBy("valid_from")
    lastW
      .withColumn("_pv", lag(col("_v"), 1).over(byKey))
      // first row per key, or a REAL change (null-safe comparison)
      .filter(col("_pv").isNull || !(col("_v") <=> col("_pv")))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
      .select(Seq(col(keyCol)) ++
        valueCols.map(c => col(s"_v.$c").as(c)) ++ Seq(
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Incrementally apply a NEW change batch to an existing
    * [[scd2History]] table — the nightly path that must not replay
    * the full log. Semantics are pinned by the ALGEBRAIC parity
    * contract (spec-proven): for changes strictly later than each
    * key's open interval,
    *
    *   scd2Merge(scd2History(A), B) ≡ scd2History(A ∪ B)
    *
    * Per key, the current row becomes the ANCHOR; batch changes
    * reduce last-writer-wins per (key, ts), collapse no-ops against
    * the anchor chain (null-safe), close the anchor's interval at the
    * first surviving change, and open new intervals. Keys absent from
    * the history start fresh; keys without changes pass through.
    * Closed historical rows are never touched or shuffled — only the
    * current rows and the batch move.
    *
    * A change at-or-before a key's open interval fails fast (the
    * within-timestamp tie against the original batch's writers is no
    * longer decidable) — replay the full log for backfills. */
  def scd2Merge(history: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], tieCol: String): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column required")
    val v = struct(valueCols.map(col): _*)
    val cur = history.filter(col("is_current"))
      .select(col(keyCol), v.as("_v"), col("valid_from"))
    val minChg = changes.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("_minc"))
    val late = cur.join(minChg, Seq(keyCol))
      .filter(col("_minc") <= col("valid_from")).limit(1).collect()
    require(late.isEmpty,
      s"scd2Merge: change at/before the open interval of key " +
        s"${late.headOption.map(_.get(0))} — changes must be strictly " +
        "later; replay the full log for backfills")
    val chg = changes
      .groupBy(col(keyCol), col(tsCol).as("valid_from"))
      .agg(max_by(v, col(tieCol)).as("_v"))
    val anchored = cur.withColumn("_anchor", lit(true))
      .unionByName(chg.withColumn("_anchor", lit(false)))
    val byKey = Window.partitionBy(keyCol).orderBy("valid_from")
    val merged = anchored
      .withColumn("_pv", lag(col("_v"), 1).over(byKey))
      // anchors always survive; changes survive iff a REAL change
      // (equality chains, so comparing to the previous ROW is exact
      // even when that row itself collapsed)
      .filter(col("_anchor") || col("_pv").isNull ||
        !(col("_v") <=> col("_pv")))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
      .select(Seq(col(keyCol)) ++
        valueCols.map(c => col(s"_v.$c").as(c)) ++ Seq(
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
    history.filter(!col("is_current")).unionByName(merged)
  }

  /** Snapshot diff by key: FULL OUTER join `old` and `new` on
    * `keyCols`, classify every key as added / removed / changed /
    * unchanged (null-safe per-column comparison), and name the
    * changed columns. Returns only the non-`unchanged` rows — at
    * 100 TB the diff is the small output, the identity mass stays
    * unmaterialized. One equi-join, no window.
    *
    * `changed_cols` lists the differing `compareCols` in the given
    * order, comma-joined (empty for added/removed — the whole row is
    * the change). */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(compareCols.nonEmpty, "at least one compare column required")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_old", lit(true))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"_o_$c")) :+ col("_in_old"): _*)
    val nw = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_new", lit(true))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"_n_$c")) :+ col("_in_new"): _*)
    val joined = o.join(nw, keyCols, "full_outer")
    val diffs = compareCols.map(c =>
      when(!(col(s"_o_$c") <=> col(s"_n_$c")), lit(c)))
    joined
      .withColumn("status",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(diffs.map(_.isNotNull).reduce(_ || _), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .withColumn("changed_cols",
        when(col("status") === "changed",
          concat_ws(",", diffs: _*)).otherwise(lit("")))
      .select(keyCols.map(col) :+ col("status") :+ col("changed_cols"): _*)
  }

  /** Declarative data-quality gate: each rule is a (name, VIOLATION
    * predicate) pair; all rules evaluate in ONE map-side-combined
    * aggregate pass over the table (violations = rows where the
    * predicate is true; a NULL predicate result counts as a
    * violation — unknown is not a pass). Returns one row per rule:
    * (rule, violations, n_rows, pass). */
  def qualityChecks(df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = count(lit(1)).as("_n") +:
      rules.map { case (name, bad) =>
        sum(when(coalesce(bad, lit(true)), 1L).otherwise(0L))
          .as(s"_v_$name")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val r = row.head() // 1-row action
    val n = r.getAs[Long]("_n")
    rules.map { case (name, _) =>
      val viol = if (r.isNullAt(r.fieldIndex(s"_v_$name"))) 0L
        else r.getAs[Long](s"_v_$name")
      (name, viol, n, viol == 0L)
    }.toDF("rule", "violations", "n_rows", "pass")
  }

  /** Referential-integrity check in the [[qualityChecks]] report
    * shape: violations = child rows whose (non-NULL-complete) foreign
    * key finds no parent — one LEFT ANTI join, counted. Rows with any
    * NULL foreign-key column are skipped (a nullable FK is absence,
    * not corruption — gate NULLs separately with a not-null rule). */
  def referentialCheck(child: DataFrame, parent: DataFrame,
      fkCols: Seq[String], pkCols: Seq[String],
      ruleName: String): DataFrame = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size,
      "fkCols and pkCols must be non-empty and same-length")
    val fkNotNull = fkCols.map(col(_).isNotNull).reduce(_ && _)
    val p = parent.select(pkCols.map(col): _*).distinct()
      .toDF(fkCols: _*)
      .withColumn("_pk_hit", lit(true))
    // ONE job (r16): the previous shape paid two full child passes —
    // a bare count() plus the anti-join count. A LEFT join against
    // the DEDUPED parent keys preserves the child row count exactly
    // (≤1 match per row), so total rows and orphan rows fall out of
    // one aggregate over one join: n = every child row (NULL-keyed
    // rows join nothing but stay), violations = non-NULL-complete
    // keys with no parent — the same numbers as before, row-for-row.
    val r = child
      .select(fkCols.map(col) :+ fkNotNull.as("_fk_complete"): _*)
      .join(p, fkCols, "left")
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_fk_complete") && col("_pk_hit").isNull, 1L)
          .otherwise(0L)).as("_viol")).head()
    val n = r.getLong(0)
    val viol = if (r.isNullAt(1)) 0L else r.getLong(1)
    val spark = child.sparkSession
    import spark.implicits._
    Seq((ruleName, viol, n, viol == 0L))
      .toDF("rule", "violations", "n_rows", "pass")
  }

  /** Key-uniqueness check in the same report shape as
    * [[qualityChecks]]: violations = rows beyond the first per key
    * (`n − countDistinct(keys)`); rows with a NULL in any key column
    * are violations outright (a key must identify). */
  def uniqueCheck(df: DataFrame, keyCols: Seq[String],
      ruleName: String = "unique_key"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val spark = df.sparkSession
    import spark.implicits._
    val r = df.agg(
      count(lit(1)).as("_n"),
      sum(when(anyNull, 1L).otherwise(0L)).as("_nulls"),
      countDistinct(
        when(!anyNull, struct(keyCols.map(col): _*))).as("_d")).head()
    val n = r.getAs[Long]("_n")
    val nulls = if (r.isNullAt(1)) 0L else r.getAs[Long]("_nulls")
    val dups = (n - nulls) - r.getAs[Long]("_d")
    val viol = nulls + dups
    Seq((ruleName, viol, n, viol == 0L))
      .toDF("rule", "violations", "n_rows", "pass")
  }

  /** The [[qualityChecks]] + [[uniqueCheck]] report computed in ONE
    * aggregate pass (r16): a union chain of those operators scans the
    * table once PER CALL — three full passes for the typical gate
    * (rule block + two key checks). Here every violation sum, every
    * key-null count and every key countDistinct evaluate in a single
    * aggregate (Spark plans the distinct groups as one Expand over
    * one scan), so the table is read exactly once at any scale.
    * Output is row-for-row the union of `qualityChecks(df, rules)`
    * and one `uniqueCheck(df, keys, name)` per `uniqueKeys` entry —
    * same rule rows, same counts, same pass verdicts (spec-pinned). */
  def dqReport(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKeys: Seq[(Seq[String], String)]): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty,
      "at least one rule or key check required")
    val names = rules.map(_._1) ++ uniqueKeys.map(_._2)
    require(names.distinct.size == names.size, "rule names must be unique")
    uniqueKeys.foreach { case (ks, _) =>
      require(ks.nonEmpty, "at least one key column required") }
    val ruleAggs = rules.map { case (name, bad) =>
      sum(when(coalesce(bad, lit(true)), 1L).otherwise(0L)).as(s"_v_$name")
    }
    val uniqAggs = uniqueKeys.flatMap { case (ks, name) =>
      val anyNull = ks.map(col(_).isNull).reduce(_ || _)
      Seq(sum(when(anyNull, 1L).otherwise(0L)).as(s"_nulls_$name"),
        countDistinct(
          when(!anyNull, struct(ks.map(col): _*))).as(s"_d_$name"))
    }
    val aggs = count(lit(1)).as("_n") +: (ruleAggs ++ uniqAggs)
    val r = df.agg(aggs.head, aggs.tail: _*).head() // 1-row action
    val n = r.getAs[Long]("_n")
    val spark = df.sparkSession
    import spark.implicits._
    val ruleRows = rules.map { case (name, _) =>
      val viol = if (r.isNullAt(r.fieldIndex(s"_v_$name"))) 0L
        else r.getAs[Long](s"_v_$name")
      (name, viol, n, viol == 0L)
    }
    val uniqRows = uniqueKeys.map { case (_, name) =>
      val nulls = if (r.isNullAt(r.fieldIndex(s"_nulls_$name"))) 0L
        else r.getAs[Long](s"_nulls_$name")
      val dups = (n - nulls) - r.getAs[Long](s"_d_$name")
      val viol = nulls + dups
      (name, viol, n, viol == 0L)
    }
    (ruleRows ++ uniqRows).toDF("rule", "violations", "n_rows", "pass")
  }

  /** Per-group k·σ outlier gate with NO floating-point σ: flag row x
    * iff |x − μ| > k·σ, evaluated as the exact integer
    * cross-multiplication
    *
    *   (n·x − S)² · kDen² > kNum² · (n·Q − S²)
    *
    * over micro-unit values (S = Σx, Q = Σx², k = kNum/kDen) — the
    * square root never happens, so the verdict is engine-exact.
    * Sums ride DECIMAL(38,0) (micro² magnitudes overflow BIGINT).
    * NULL values are never outliers; a singleton group has zero
    * variance and flags nothing. Adds `x_micro` and `is_outlier`.
    *
    * Scale shape: one hash aggregate + one stats join — the stats
    * side is one row per GROUP, unbounded by any parameter, so the
    * join strategy is left to AQE (a forced broadcast would build a
    * group-cardinality-sized relation on the driver and every
    * executor regardless of size; AQE still picks BHJ whenever the
    * runtime stats side is actually small). The Decimal(38,0)
    * cross-multiplication carries a NAMED in-plan overflow guard
    * (the zOrderKeys convention): both sides are bounded by
    * (max(kNum, 2·kDen) · n · max|x|)², so a group where that base
    * reaches 10¹⁹ raises with the group named instead of tripping
    * Spark's generic ANSI Decimal overflow mid-multiply. */
  def outlierGate(df: DataFrame, groupCols: Seq[String],
      valueCol: String, kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(kNum > 0 && kDen > 0, s"k must be positive, got $kNum/$kDen")
    val g = groupCols.map(col)
    val dec = DecimalType(38, 0)
    val x = floor(col(valueCol) * 1000000d).cast(dec)
    // |dev| = |n·x − S| ≤ 2·n·max|x| and |n·Q − S²| ≤ n²·max|x|², so
    // every operand of the verdict is ≤ (kFactor·n·max|x|)² with
    // kFactor = max(kNum, 2·kDen); DECIMAL(38,0) holds < 10³⁸, hence
    // the base must stay under 10¹⁹. The guard product itself is
    // ≤ kFactor·n·max|x| — far inside 38 digits whenever data is sane
    // enough to be one named error away from usable.
    val kFactor = math.max(kNum, 2L * kDen)
    val lim = BigDecimal("10000000000000000000") // 10^19
    // try_sum/try_multiply keep the AGGREGATE itself from tripping
    // Spark's generic ANSI overflow before the named guard can run:
    // any overflow inside S, Q, or the guard product surfaces as
    // NULL, and NULL routes into the same named raise.
    val stats = df.filter(col(valueCol).isNotNull)
      .select((g :+ x.as("_x")): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).cast(dec).as("_nRaw"),
        try_sum(col("_x")).as("_s"),
        try_sum(try_multiply(col("_x"), col("_x"))).as("_q"),
        max(abs(col("_x"))).as("_ma"))
      .withColumn("_safe",
        coalesce(try_multiply(try_multiply(col("_nRaw"), col("_ma")),
          lit(kFactor)) < lit(lim), lit(false)) &&
          col("_s").isNotNull && col("_q").isNotNull)
      .withColumn("_n",
        when(!col("_safe"),
          raise_error(concat(
            lit("outlierGate: group ("),
            concat_ws(", ", g.map(_.cast("string")): _*),
            lit(") has n = "), col("_nRaw").cast("string"),
            lit(", max|x_micro| = "), col("_ma").cast("string"),
            lit(s" with k=$kNum/$kDen — the exact k-sigma " +
              "cross-multiplication would overflow DECIMAL(38,0); " +
              "pre-scale the value or split the group"))).cast(dec))
          .otherwise(col("_nRaw")))
      .drop("_nRaw", "_ma", "_safe")
    val dev = col("_n") * x - col("_s")
    df.join(stats, groupCols, "left")
      .withColumn("x_micro", x.cast(LongType))
      .withColumn("is_outlier", when(col(valueCol).isNull, lit(false))
        .otherwise(coalesce(
          dev * dev * lit(kDen * kDen) >
            lit(kNum * kNum) * (col("_n") * col("_q") -
              col("_s") * col("_s")),
          lit(false))))
      .drop("_n", "_s", "_q")
  }

  /** Profile drift between two snapshots of the same table: per
    * column — row counts, null counts, exact distinct counts, and the
    * null-rate delta in micro-units (exact integer arithmetic; 0 rows
    * ⇒ 0 rate). The schema-stability report a nightly pipeline diffs
    * before trusting a new generation. Cost: one aggregate pass per
    * side (count + conditional sums + one countDistinct per column —
    * for sketch-grade profiling at wider tables, swap in the HLL
    * tier; this op is the EXACT gate). */
  def profileDrift(a: DataFrame, b: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    def prof(df: DataFrame, side: String): DataFrame = {
      val aggs = count(lit(1)).as(s"n_$side") +: cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null_${c}"),
          countDistinct(col(c)).as(s"_dist_${c}"))
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long](s"n_$side")
      val spark = df.sparkSession
      import spark.implicits._
      cols.map { c =>
        val nulls = if (r.isNullAt(r.fieldIndex(s"_null_${c}"))) 0L
          else r.getAs[Long](s"_null_${c}")
        (c, n, nulls, r.getAs[Long](s"_dist_${c}"))
      }.toDF("column", s"n_$side", s"nulls_$side", s"distinct_$side")
    }
    val pa = prof(a, "a")
    val pb = prof(b, "b")
    pa.join(pb, Seq("column"))
      .withColumn("null_rate_a_micro",
        when(col("n_a") === 0L, 0L)
          .otherwise(expr("(nulls_a * 1000000) div n_a")))
      .withColumn("null_rate_b_micro",
        when(col("n_b") === 0L, 0L)
          .otherwise(expr("(nulls_b * 1000000) div n_b")))
      .withColumn("null_rate_delta_micro",
        col("null_rate_b_micro") - col("null_rate_a_micro"))
      .withColumn("distinct_delta",
        col("distinct_b") - col("distinct_a"))
      .select("column", "n_a", "n_b", "nulls_a", "nulls_b",
        "distinct_a", "distinct_b", "null_rate_a_micro",
        "null_rate_b_micro", "null_rate_delta_micro", "distinct_delta")
  }
}
