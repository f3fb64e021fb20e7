package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("heavyHitters exact regime: distinct ≤ capacity ⇒ counts exact, err 0") {
    val df = (1 to 1000).map(i => (i % 3, s"item${i % 7}")).toDF("g", "x")
      .repartition(8) // force multi-partition partial/merge chain
    val got = df.groupBy("g")
      .agg(Sketches.heavyHitters(col("x"), capacity = 16).as("hh"))
      .select(col("g"), explode(col("hh")).as("h"))
      .select(col("g"), col("h.item"), col("h.cnt"), col("h.err"))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = df.groupBy("g", "x").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (cnt, err)) =>
      assert(cnt === want(k), k)
      assert(err === 0L, k)
    }
  }

  test("heavyHitters over capacity: state bounded, dominant item surfaces") {
    // one overwhelming item + a long tail of singletons
    val rows = Seq.fill(5000)("whale") ++ (1 to 500).map(i => s"tail$i")
    val got = rows.toDF("x").repartition(8)
      .agg(Sketches.heavyHitters(col("x"), capacity = 8).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.cnt"), col("h.err"))
      .collect()
    assert(got.length <= 8) // capacity bound holds through merges
    val top = got.head
    assert(top.getString(0) === "whale")
    // SpaceSaving may overestimate, never by more than the err bound
    assert(top.getLong(1) >= 5000L)
    assert(top.getLong(1) - top.getLong(2) <= 5000L)
  }

  test("heavyHitters ignores nulls, deterministic output order") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None).toDF("x")
    val out = df.agg(Sketches.heavyHitters(col("x"), 4).as("hh"))
      .select(explode(col("hh")).as("h")).select("h.item", "h.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a", 2L), ("b", 1L)))
  }

  test("kmv tier equality: bounded-state sketch ≡ relational oracle spec") {
    // both regimes in one frame: a group below k (exact path) and a
    // group far above k (estimator path), multi-partition so the
    // sketch's partial/merge/final chain actually exercises merges
    val rows: Seq[(String, Option[Long])] =
      (1 to 40).map(i => ("small", Option(i.toLong))) ++
      (1 to 5000).flatMap(i =>
        Seq(("big", Option(i.toLong)), ("big", Option(i.toLong)))) ++
      // null values must not count as distinct elements in EITHER tier,
      // and a group with only nulls must drop from both
      Seq(("small", None), ("small", None), ("allnull", None))
    val df = rows.toDF("g", "v").repartition(8)
    val rel = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .select("g", "n_kept", "kmv_est")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Double]("kmv_est"))).toMap
    val sk = Sketches.kmvDistinctSketch(df, Seq("g"), "v", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Double]("kmv_est"))).toMap
    // BIT-equal, not approximately equal: same hash space, same k-min
    // set, same estimator arithmetic — the tiers are interchangeable
    assert(sk === rel)
    assert(!sk.contains("allnull") && sk("small") === ((40L, 40.0)))
  }

  test("kmvDistinctSketch: nulls skipped, all-null group drops (both tiers)") {
    val df = Seq(("g1", Some(1L)), ("g1", Some(2L)), ("g1", None),
      ("g2", None)).toDF("g", "v")
    def run(out: org.apache.spark.sql.DataFrame) =
      out.select("g", "n_kept", "kmv_est")
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_kept"), r.getAs[Double]("kmv_est"))).toMap
    val sk = run(Sketches.kmvDistinctSketch(df, Seq("g"), "v", k = 8))
    val rel = run(Sketches.kmvDistinct(df, Seq("g"), "v", k = 8))
    assert(sk === Map("g1" -> ((2L, 2.0))))
    assert(rel === sk)
  }

  test("kmvDistinct: exact below k, bounded relative error above") {
    // group "small": 40 distinct < k=64 ⇒ exact path
    // group "big": 5000 distinct ⇒ estimator path
    val rows = (1 to 40).map(i => ("small", i.toLong)) ++
      (1 to 5000).flatMap(i => Seq(("big", i.toLong), ("big", i.toLong)))
    val out = Sketches.kmvDistinct(rows.toDF("g", "v"), Seq("g"), "v", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("kmv_est"))).toMap
    val (se, sk, sEst) = out("small")
    assert(se === 40L && sk === 40L && sEst === 40.0)
    val (be, bk, bEst) = out("big")
    assert(be === 5000L && bk === 64L)
    // KMV with k=64 has σ ≈ 1/√(k−2) ≈ 12.7%; 4σ bound
    assert(math.abs(bEst - 5000.0) / 5000.0 < 0.5, s"est=$bEst")
  }

  test("diagnoseSkew: hot keys surface with exact shares; nulls count") {
    import org.apache.spark.sql.functions.col
    // key 7 = 50% of rows, key 8 = 25%, null = 12.5%, rest unique-ish
    val rows = Seq.fill(400)(Option(7L)) ++ Seq.fill(200)(Option(8L)) ++
      Seq.fill(100)(Option.empty[Long]) ++ (100L to 199L).map(Option(_))
    val out = Sketches.diagnoseSkew(rows.toDF("k"), Seq("k"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(out.length === 3)
    assert(out(0) === (("7", 400L, 0.5)))
    assert(out(1) === (("8", 200L, 0.25)))
    assert(out(2)._2 === 100L) // the null bucket, sentinel-keyed
    // capacity 4096 >> 103 distinct keys: counts exact (err = 0)
    val errs = Sketches.diagnoseSkew(rows.toDF("k"), Seq("k"), k = 3)
      .collect().map(_.getLong(2))
    assert(errs.forall(_ === 0L))
  }

  test("hll tier equality: bounded-state sketch ≡ relational oracle spec") {
    // small group (most registers empty), big group (saturated), nulls
    // skipped, all-null group drops — multi-partition so the sketch's
    // partial/merge/final chain exercises real register merges
    val rows: Seq[(String, Option[Long])] =
      (1 to 7).map(i => ("small", Option(i.toLong))) ++
      (1 to 4000).flatMap(i =>
        Seq(("big", Option(i.toLong)), ("big", Option(i.toLong)))) ++
      Seq(("small", None), ("allnull", None))
    val df = rows.toDF("g", "v").repartition(8)
    def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
      ((r.getAs[Int]("n_zero"), r.getAs[Long]("denom_scaled"),
        r.getAs[Long]("hll_est_micro")))
    val rel = Sketches.hllDistinct(df, Seq("g"), "v", p = 6)
      .collect().map(key).toMap
    val sk = Sketches.hllDistinctSketch(df, Seq("g"), "v", p = 6)
      .collect().map(key).toMap
    // BIT-equal: same hash space, same registers, same exact-integer
    // estimator — the tiers are interchangeable
    assert(sk === rel)
    assert(!sk.contains("allnull"))
    // duplicates never move a register: the big group's sketch is a
    // pure function of its distinct set
    val dedup = Sketches.hllDistinctSketch(
      (1 to 4000).map(i => ("big", i.toLong)).toDF("g", "v"),
      Seq("g"), "v", p = 6).collect().map(key).toMap
    assert(dedup("big") === sk("big"))
  }

  test("hllDistinct: estimate within the 1.04/√m error envelope") {
    // n = 10000 distinct at p=8 (m=256): σ ≈ 6.5%, assert a 4σ bound —
    // deterministic (SHA hashes), so this can never flake
    val df = (1 to 10000).map(i => ("g", s"val$i")).toDF("g", "v")
    val out = Sketches.hllDistinct(df, Seq("g"), "v", p = 8).collect()
    assert(out.length === 1)
    val est = out.head.getAs[Long]("hll_est_micro").toDouble / 1e6
    assert(math.abs(est - 10000.0) / 10000.0 < 0.26, s"est=$est")
    // saturated regime: no empty registers at n >> m·ln(m)
    assert(out.head.getAs[Int]("n_zero") === 0)
  }

  test("hll state stays 2^p bytes: serialize of a saturated sketch") {
    // direct aggregate-buffer audit: 1M updates, state is exactly m
    // bytes — the property that makes this THE 100 TB cardinality op
    val agg = graft.expressions.HllSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), p = 6)
    val buf = agg.createAggregationBuffer()
    val rnd = new scala.util.Random(42)
    (1 to 1000000).foreach { _ =>
      val h = rnd.nextLong().abs % (1L << 60)
      val reg = (h % 64).toInt
      val w = h / 64
      val rho = 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    assert(agg.serialize(buf).length === 64)
  }

  test("hll shard sketches: merge of shards ≡ direct sketch; wrong-p blob fails fast") {
    // 3 groups × up-to-4 shards; values overlap across shards so the
    // merge must be idempotent, not just additive
    val rows = (1 to 3000).map { i =>
      (s"g${i % 3}", s"shard${i % 4}", s"v${i % 500}")
    }
    val df = rows.toDF("g", "shard", "v").repartition(8)
    val direct = Sketches.hllDistinctSketch(df, Seq("g"), "v", p = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Int]("n_zero"), r.getAs[Long]("denom_scaled"),
          r.getAs[Long]("hll_est_micro")))).toMap
    val shards = Sketches.hllShardSketch(df, Seq("g", "shard"), "v", p = 6)
    assert(shards.count() === 12) // one 64-byte blob per (g, shard)
    val merged = Sketches.hllMergeShards(shards, Seq("g"), "hll_regs",
        p = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Int]("n_zero"), r.getAs[Long]("denom_scaled"),
          r.getAs[Long]("hll_est_micro")))).toMap
    // register max is associative+idempotent ⇒ bit-equal summaries
    assert(merged === direct)
    // sketches from a different precision can never silently merge
    val e = intercept[Exception] {
      Sketches.hllMergeShards(shards, Seq("g"), "hll_regs", p = 8)
        .collect()
    }
    assert(e.getMessage.contains("does not match p")
      || Option(e.getCause).exists(_.getMessage.contains("does not match p")))
  }

  test("cmsFrequencies: one-sided error — est ≥ exact, bounded overcount") {
    // 200 distinct keys into w=32 buckets: collisions guaranteed, so
    // this exercises the estimation regime, not just exact counts.
    // Deterministic (SHA hashes) — the assertions can never flake.
    val rows = (1 to 200).flatMap(k => Seq.fill(k % 7 + 1)(s"key$k"))
    val df = rows.toDF("v").repartition(8)
    val probes = (1 to 200 by 9).map(k => s"key$k").toDF("pv")
    val out = Sketches.cmsFrequencies(df, "v", probes, "pv", d = 4, w = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    out.foreach { case (k, est) =>
      assert(est >= exact(k), s"undercount at $k")
      // CMS bound: overcount per row ~ N/w expected; min over d=4 rows
      // keeps it well under N/8 for this fixture
      assert(est - exact(k) <= n / 8, s"overcount ${est - exact(k)} at $k")
    }
  }

  test("cms merge chain ≡ single partition; nulls skipped; empty corpus") {
    val rows: Seq[Option[String]] =
      (1 to 500).map(i => Option(s"k${i % 40}")) ++ Seq(None, None)
    val probes = Seq("k0", "k7", "k39").toDF("pv")
    def run(parts: Int) = Sketches.cmsFrequencies(
        rows.toDF("v").repartition(parts), "v", probes, "pv", d = 3, w = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(8) === run(1)) // partial/merge/final chain is exact
    // null probe rows drop; empty corpus estimates 0 for every probe
    val empty = Sketches.cmsFrequencies(
      Seq.empty[Option[String]].toDF("v"), "v",
      (Seq(Some("k0"), None): Seq[Option[String]]).toDF("pv"), "pv",
      d = 3, w = 16).collect().map(r => r.getString(0) -> r.getLong(1))
    assert(empty.toSeq === Seq("k0" -> 0L))
  }

  test("histogramQuantiles: brackets contain the true quantile; degenerate and guard") {
    // deterministic skewed sample: x = (i*i mod 997) / 10.0
    val xs = (0 until 500).map(i => (i * i % 997) / 10.0)
    val df = xs.map(("g", _)).toDF("g", "v")
    val got = Sketches.histogramQuantiles(df, Seq("g"), "v",
        buckets = 32, ps = Seq(50, 90, 99))
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    val sorted = xs.sorted.map(x => math.floor(x * 1e6).toLong)
    for (p <- Seq(50, 90, 99)) {
      val (n, lo, hi) = got(p)
      assert(n === 500L)
      // the TRUE p-th percentile (smallest x with rank*100 >= p*n)
      val truth = sorted((math.ceil(p * 500 / 100.0) - 1).toInt)
      assert(truth >= lo && truth <= hi,
        s"p$p: truth $truth outside bracket [$lo, $hi]")
    }
    // constant column: single bin 0, bracket collapses to the value
    val const = Sketches.histogramQuantiles(
      Seq(("c", 7.0), ("c", 7.0)).toDF("g", "v"), Seq("g"), "v",
      buckets = 8, ps = Seq(50))
      .head()
    assert(const.getLong(3) === 0L &&
      const.getLong(4) === 7000000L && const.getLong(5) === 7000000L)
    // span overflow fails fast IN-PLAN with the group named — no
    // driver-side materialization of the group key space
    val e = intercept[Exception] {
      Sketches.histogramQuantiles(
        Seq(("o", 0.0), ("o", 9.0e12)).toDF("g", "v"), Seq("g"), "v",
        buckets = 65536, ps = Seq(50)).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("histogramQuantiles") && msgs(e).contains("(o)"))
  }

  test("histogramQuantiles: high-cardinality groups run without a driver collect of the key space") {
    // 10k distinct groups; correctness per-group plus plan hygiene:
    // the op's own lineage must contain no driver-side action before
    // the caller's — building the frame is action-free by construction
    // (the old guard collected one row per group right here).
    val df = (0 until 30000).map(i => (s"g${i % 10000}", (i / 10000).toDouble))
      .toDF("g", "v")
    val out = Sketches.histogramQuantiles(df, Seq("g"), "v",
      buckets = 8, ps = Seq(50))
    // frame construction ran zero Spark jobs; evaluate now
    val rows = out.collect()
    assert(rows.length === 10000)
    assert(rows.forall(_.getLong(2) === 3L)) // n = 3 per group
    // every group saw values {0,1,2} micro-scaled: p50 bracket must
    // contain 1_000_000
    assert(rows.forall(r => r.getLong(4) <= 1000000L &&
      r.getLong(5) >= 1000000L))
  }
}
