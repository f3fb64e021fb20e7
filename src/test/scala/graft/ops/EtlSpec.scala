package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class EtlSpec extends SparkSuite {
  import spark.implicits._

  test("scd2History: last-writer-wins, no-op collapse, adjacent intervals") {
    val log = Seq(
      // key 1: v=a@10 (two writers at ts 10 — tie 5 wins), noop a@20,
      // change b@30, back to a@40
      (1L, 10L, "a", 5L), (1L, 10L, "z", 3L),
      (1L, 20L, "a", 1L), (1L, 30L, "b", 1L), (1L, 40L, "a", 1L),
      // key 2: single row
      (2L, 15L, "x", 1L),
      // key 3: null value run collapses (null == null is a no-op)
      (3L, 1L, null, 1L), (3L, 2L, null, 1L), (3L, 3L, "y", 1L))
      .toDF("k", "ts", "v", "tie")
    val h = etl.scd2History(log, "k", "ts", Seq("v"), "tie")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(h.toSeq === Seq(
      (1L, "a", 10L, 30L, false), // the ts-20 noop collapsed in
      (1L, "b", 30L, 40L, false),
      (1L, "a", 40L, -1L, true),  // value can RECUR as a new interval
      (2L, "x", 15L, -1L, true),
      (3L, null, 1L, 3L, false),
      (3L, "y", 3L, -1L, true)))
    // intervals are adjacent: every valid_to equals the next
    // valid_from within its key (checked by the literals above)
  }

  test("scd2Merge: merge(history(A), B) == history(A ++ B); guards; new keys") {
    val a = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 1L), (1L, 30L, "b", 1L),
      (2L, 5L, "x", 1L),
      (3L, 1L, "p", 2L), (3L, 1L, "q", 1L)) // tie: p (tie 2) wins
    val b = Seq(
      (1L, 40L, "b", 1L),  // no-op vs the open interval -> collapses
      (1L, 50L, "c", 1L),  // real change
      (2L, 6L, "x", 1L),   // no-op
      (4L, 9L, "new", 1L)) // brand-new key
    def df(rows: Seq[(Long, Long, String, Long)]) =
      rows.toDF("k", "ts", "v", "tie")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k", "valid_from").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
        .toSeq
    val direct = etl.scd2History(df(a ++ b), "k", "ts", Seq("v"), "tie")
    val merged = etl.scd2Merge(
      etl.scd2History(df(a), "k", "ts", Seq("v"), "tie"),
      df(b), "k", "ts", Seq("v"), "tie")
    assert(norm(merged) === norm(direct))
    // a change AT the open interval's timestamp fails fast (the
    // within-ts tie against the original writers is undecidable)
    intercept[IllegalArgumentException] {
      etl.scd2Merge(etl.scd2History(df(a), "k", "ts", Seq("v"), "tie"),
        df(Seq((1L, 20L, "z", 9L))), "k", "ts", Seq("v"), "tie")
        .collect()
    }
  }

  test("referentialCheck: orphan counts; NULL FKs skipped") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val r = etl.referentialCheck(child, parent, Seq("fk"), Seq("pk"),
      "fk_check").head()
    // two orphan rows (9L twice); the NULL row is absence, not orphan
    assert(r.getString(0) === "fk_check" && r.getLong(1) === 2L &&
      r.getLong(2) === 5L && !r.getBoolean(3))
    val ok = etl.referentialCheck(child.filter(col("fk") < 5),
      parent, Seq("fk"), Seq("pk"), "ok").head()
    assert(ok.getLong(1) === 0L && ok.getBoolean(3))
  }

  test("tableDiff: added/removed/changed with named columns; null-safe") {
    val old = Seq((1L, "a", Some(10)), (2L, "b", Some(20)),
      (3L, "c", None), (4L, "d", Some(40)))
      .toDF("k", "s", "x")
    val nw = Seq((1L, "a", Some(10)),      // unchanged -> dropped
      (2L, "B", Some(21)),                 // both cols changed
      (3L, "c", Some(30)),                 // null -> value = changed
      (5L, "e", Some(50)))                 // added; 4 removed
      .toDF("k", "s", "x")
    val d = etl.tableDiff(old, nw, Seq("k"), Seq("s", "x"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(d.toSeq === Seq(
      (2L, "changed", "s,x"),
      (3L, "changed", "x"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("qualityChecks + uniqueCheck: one-pass counts, NULL is a violation") {
    val df = Seq((1L, Some(5)), (2L, Some(60)), (3L, None), (2L, Some(7)))
      .toDF("k", "q")
    val r = etl.qualityChecks(df, Seq(
        "q_max_50" -> (col("q") > 50),   // row 2 violates; NULL row too
        "k_positive" -> (col("k") <= 0)))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    // q > 50: true for 60, NULL for the None row -> 2 violations
    assert(r("q_max_50") === ((2L, 4L, false)))
    assert(r("k_positive") === ((0L, 4L, true)))
    val u = etl.uniqueCheck(df, Seq("k")).head()
    assert(u.getLong(1) === 1L && !u.getBoolean(3)) // dup k=2
    val un = etl.uniqueCheck(
      Seq((Some(1L), 1), (None, 2), (Some(3L), 3)).toDF("k", "v"),
      Seq("k")).head()
    assert(un.getLong(1) === 1L) // the NULL key is the violation
    intercept[IllegalArgumentException] {
      etl.qualityChecks(df, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("dqReport (r16): one-pass report ≡ qualityChecks ∪ uniqueCheck, row for row") {
    // nulls, dup keys, violations and a passing rule all planted; the
    // merged single-aggregate report must reproduce the unioned
    // operators exactly (q202's restructuring proof)
    val df = Seq((1L, Some(5)), (2L, Some(60)), (3L, None), (2L, Some(7)),
      (2L, Some(7))).toDF("k", "q")
    val rules = Seq(
      "q_max_50" -> (col("q") > 50),
      "k_positive" -> (col("k") <= 0))
    val uniq = Seq(Seq("k") -> "unique_k", Seq("k", "q") -> "unique_kq")
    def rows(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      d.orderBy("rule").collect().map(_.toSeq.toSeq).toSeq
    val merged = rows(etl.dqReport(df, rules, uniq))
    val unioned = rows(etl.qualityChecks(df, rules)
      .unionByName(etl.uniqueCheck(df, Seq("k"), "unique_k"))
      .unionByName(etl.uniqueCheck(df, Seq("k", "q"), "unique_kq")))
    assert(merged === unioned)
    // NULL-keyed rows are violations in the unique legs (matching
    // uniqueCheck): k=3 has q NULL -> one unique_kq null violation
    val m = merged.map(r => r.head -> r(1)).toMap
    assert(m("unique_k") === 2L)  // k=2 thrice -> 2 dup rows
    assert(m("unique_kq") === 2L) // one dup (2,7) + one NULL q row
    // empty frame: zero counts, all pass
    val empty = etl.dqReport(df.filter(lit(false)), rules, uniq)
      .collect()
    assert(empty.forall(r => r.getLong(1) === 0L && r.getLong(2) === 0L
      && r.getBoolean(3)))
    intercept[IllegalArgumentException] {
      etl.dqReport(df, Seq("a" -> lit(true)), Seq(Seq("k") -> "a"))
    }
  }

  test("outlierGate: hand case, exact k-sigma boundary NOT flagged, null/singleton safe") {
    def gate(rows: Seq[(String, Option[Double])], kNum: Long, kDen: Long) =
      etl.outlierGate(rows.toDF("g", "v"), Seq("g"), "v", kNum, kDen)
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getBoolean(3))).toSeq
    // [0,0,0,0,10]: mu=2, sigma=4 -> only the 10 exceeds 1 sigma
    val r = gate(Seq(("a", Some(0.0)), ("a", Some(0.0)), ("a", Some(0.0)),
      ("a", Some(0.0)), ("a", Some(10.0))), 1, 1)
    assert(r.count(_._3) === 1 && r.find(_._3).get._2 === Some(10.0))
    // EXACT boundary: [-1, 1], sigma=1 — |x-mu| = 1*sigma is strict >,
    // so neither row flags (the cross-multiplied integers are equal)
    assert(gate(Seq(("b", Some(-1.0)), ("b", Some(1.0))), 1, 1)
      .forall(!_._3))
    // ...but k = 99/100 flags both
    assert(gate(Seq(("b", Some(-1.0)), ("b", Some(1.0))), 99, 100)
      .forall(_._3))
    // singleton group: zero variance, nothing flags; NULL never flags
    assert(gate(Seq(("c", Some(5.0)), ("d", None)), 1, 1).forall(!_._3))
  }

  test("outlierGate: named Decimal(38) overflow guard; no forced broadcast hint") {
    // n·max|x_micro|·kFactor ≥ 10¹⁹ must raise NAMING the group, not
    // trip Spark's generic ANSI Decimal overflow mid-multiply:
    // n=2, max|x_micro| = 9·10¹⁸, kFactor = max(3, 2) = 3 → 5.4·10¹⁹
    val hot = Seq(("h", Some(9.0e12)), ("h", Some(9.0e12)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      etl.outlierGate(hot, Seq("g"), "v").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("outlierGate") && msgs(e).contains("(h)"),
      msgs(e).take(500))
    // the stats side is one row per GROUP — unbounded by any
    // parameter — so the join strategy must be AQE's call, never a
    // forced broadcast hint built on the driver regardless of size
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", Some(3.0)))
      .toDF("g", "v")
    val out = etl.outlierGate(df, Seq("g"), "v")
    assert(!out.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val joinHints = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.hint
    }
    assert(joinHints.nonEmpty && joinHints.forall(h =>
      h.leftHint.isEmpty && h.rightHint.isEmpty), joinHints.toString)
    // ...and with a genuinely small stats side AQE still lands on a
    // broadcast join at runtime (nothing lost by dropping the hint)
    out.collect()
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      out.queryExecution.executedPlan.toString.take(1200))
  }

  test("outlierGate: planted high-cardinality groups pass (one stats row per group, no driver relation)") {
    val df = (0 until 20000)
      .map(i => (s"g${i % 5000}", Some((i % 7).toDouble)))
      .toDF("g", "v")
    val out = etl.outlierGate(df, Seq("g"), "v", kNum = 1, kDen = 2)
    assert(out.count() === 20000L)
  }

  test("profileDrift: hand counts and micro rates; empty side safe") {
    val a = Seq((Some(1), "x"), (Some(2), "x"), (None, "y"), (Some(4), null))
      .toDF("n", "s")
    val b = Seq((Some(1), "x"), (None, null)).toDF("n", "s")
    val p = etl.profileDrift(a, b, Seq("n", "s"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // n: a has 4 rows 1 null 3 distinct; b has 2 rows 1 null 1 distinct
    assert(p("n") === Seq(4L, 2L, 1L, 1L, 3L, 1L,
      250000L, 500000L, 250000L, -2L))
    assert(p("s") === Seq(4L, 2L, 1L, 1L, 2L, 1L,
      250000L, 500000L, 250000L, -1L))
    val e = etl.profileDrift(a.filter(lit(false)), b, Seq("n"))
      .head()
    assert(e.getAs[Long]("n_a") === 0L &&
      e.getAs[Long]("null_rate_a_micro") === 0L)
  }
}
