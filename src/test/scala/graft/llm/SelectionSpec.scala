package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SelectionSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join agg spark spark"),
    (2L, "le chat noir dort sur le tapis le"),
    (3L, "spark join window sort spark"),
    (4L, "chat chien oiseau le la les"),
    (5L, "spark spark spark join"),
    (6L, "")
  ).toDF("id", "text")

  test("dsirScores: target-like docs outscore off-target docs; partition-invariant") {
    val target = docs.filter(col("id").isin(1L, 3L, 5L)) // "spark" domain
    val scored = Selection.dsirScores(docs, target, docs, "id", "text",
      numBuckets = 64)
    val m = scored.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // empty doc drops out (no tokens)
    assert(!m.contains(6L))
    assert(m(1L)._1 === 6) // token counts
    // every spark-domain doc outscores every french doc (normalized)
    val avg = m.map { case (id, (n, s)) => id -> s.toDouble / n }
    for (t <- Seq(1L, 3L, 5L); o <- Seq(2L, 4L))
      assert(avg(t) > avg(o), s"doc $t should outscore $o")
    // exact micro sums are partitioning-invariant
    val re = Selection.dsirScores(docs.repartition(5), target.repartition(3),
      docs.repartition(2), "id", "text", numBuckets = 64)
    assert(scored.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      Selection.dsirScores(docs, target, docs, "id", "text", numBuckets = 0)
    }
  }

  test("dsirTopK: k highest scores, deterministic tie-break") {
    val scored = Seq((1L, 10L, 500L), (2L, 10L, 900L), (3L, 10L, 500L))
      .toDF("id", "n_tokens", "score_micro")
    val top = Selection.dsirTopK(scored, "id", 2).collect().map(_.getLong(0))
    assert(top.toSeq === Seq(2L, 1L)) // 900 first, then 500-tie → id 1
  }

  test("sampleWeightedK: without replacement, weight-sensitive, deterministic") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("w", when(col("id") < 100, 1000.0).otherwise(1.0))
    val got = Selection.sampleWeightedK(df, "id", "w", k = 50)
    val ids = got.collect().map(_.getLong(0))
    assert(ids.length === 50 && ids.distinct.length === 50)
    // heavy rows (100 of them at 1000× weight) dominate the sample
    assert(ids.count(_ < 100) > 40)
    // deterministic under repartition
    val re = Selection.sampleWeightedK(df.repartition(7), "id", "w", k = 50)
    assert(got.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
    // zero/negative/null weights excluded
    val bad = Seq((1L, 0.0), (2L, -3.0), (3L, 2.0)).toDF("id", "w")
    assert(Selection.sampleWeightedK(bad, "id", "w", k = 10)
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("upsampleToMixture: realized tokens track the target mixture") {
    val df = spark.range(0, 300).toDF("id")
      .withColumn("src", concat(lit("s"), pmod(col("id"), lit(3))))
      .withColumn("toks", lit(100L))
    val budget = 60000L // 2× the 30k corpus
    val up = Selection.upsampleToMixture(df, "id", "src", "toks",
      Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2), budget)
    val realized = up.join(df.select("id", "toks"), Seq("id")).groupBy("src")
      .agg(sum("toks").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each source's realized tokens within 15% of budget·w
    assert(math.abs(realized("s0") - 30000L) < 4500)
    assert(math.abs(realized("s1") - 18000L) < 2700)
    assert(math.abs(realized("s2") - 12000L) < 1800)
    // epochs are contiguous 1..n per id
    val e = up.filter(col("id") === 0L).select("epoch")
      .collect().map(_.getInt(0)).sorted
    assert(e.toSeq === (1 to e.length))
    // unknown source drops out
    val up2 = Selection.upsampleToMixture(df, "id", "src", "toks",
      Map("s0" -> 1.0), 20000L)
    assert(up2.select("src").distinct().collect().map(_.getString(0)).toSeq
      === Seq("s0"))
    // runaway repeat factor fails loudly
    intercept[IllegalArgumentException] {
      Selection.upsampleToMixture(df, "id", "src", "toks",
        Map("s0" -> 1.0), budgetTokens = 1000000000L)
        .count()
    }
  }
  test("sampleWeightedKPerGroup: k per group, same keys as the global sampler") {
    val df = spark.range(0, 200).toDF("id")
      .withColumn("g", pmod(col("id"), lit(4)).cast("string"))
      .withColumn("w", lit(1.0) + col("id").cast("double"))
    val got = Selection.sampleWeightedKPerGroup(df, Seq("g"), "id", "w",
      k = 5, salt = "t")
    val rows = got.collect()
    assert(rows.length === 20)
    val byG = rows.groupBy(_.getString(0))
    assert(byG.keySet === Set("0", "1", "2", "3"))
    byG.values.foreach { rs =>
      assert(rs.length === 5)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // ranks follow (key desc, id) within the group
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("key_micro"), r.getAs[Long]("id")))
      assert(sorted.toSeq === sorted.sortBy(t => (-t._1, t._2)).toSeq)
    }
    // deterministic under repartition
    val re = Selection.sampleWeightedKPerGroup(df.repartition(7), Seq("g"),
      "id", "w", k = 5, salt = "t")
    assert(got.orderBy("g", "rank").collect().toSeq ===
      re.orderBy("g", "rank").collect().toSeq)
  }

  test("calibrationSweep: confusion counts match a direct per-threshold count") {
    val df = Seq(
      (-100L, true), (-50L, false), (0L, true), (10L, true),
      (50L, false), (90L, true), (200L, false)
    ).toDF("score", "y")
    val ths = Seq(-60L, 0L, 100L)
    val got = Selection.calibrationSweep(df, "score", "y", ths)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val data = Seq((-100L, true), (-50L, false), (0L, true), (10L, true),
      (50L, false), (90L, true), (200L, false))
    for (t <- ths) {
      val tp = data.count { case (s, y) => y && s >= t }
      val fp = data.count { case (s, y) => !y && s >= t }
      val fn = data.count { case (s, y) => y && s < t }
      val tn = data.count { case (s, y) => !y && s < t }
      assert(got(t) === ((tp.toLong, fp.toLong, fn.toLong, tn.toLong)), s"t=$t")
    }
    // precision/recall micro at threshold 100: tp=1 (200 is false... 90<100)
    // scores ≥ 100: only 200L (y=false) → tp=0, fp=1 → precision 0
    val row = Selection.calibrationSweep(df, "score", "y", Seq(100L)).collect()(0)
    assert(row.getLong(5) === 0L)       // precision_micro = 0/1
    assert(row.getLong(6) === 0L)       // recall_micro 0/4 = 0
    // threshold above ALL scores: tp+fp = 0 → precision NULL
    val hi = Selection.calibrationSweep(df, "score", "y", Seq(1000L)).collect()(0)
    assert(hi.isNullAt(5))
    assert(hi.getLong(6) === 0L)
    intercept[IllegalArgumentException] {
      Selection.calibrationSweep(df, "score", "y", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Selection.calibrationSweep(df, "score", "y", Seq(1L, 1L))
    }
  }
  test("distributionDrift: zero on identical corpora, positive and asymmetric on drift") {
    val a = docs.filter(col("id") =!= 6L)
    val same = Selection.distributionDrift(a, a, "text", numBuckets = 64)
      .collect()(0)
    assert(same.getLong(0) === 64)
    assert(same.getLong(1) === 0L && same.getLong(2) === 0L &&
      same.getLong(3) === 0L)
    val b = docs.filter(col("id").isin(2L, 4L)) // french-only slice
    val drift = Selection.distributionDrift(a, b, "text", numBuckets = 64)
      .collect()(0)
    assert(drift.getLong(1) > 0L && drift.getLong(2) > 0L &&
      drift.getLong(3) > 0L)
    // partitioning-invariant (micro contributions sum exactly)
    val re = Selection.distributionDrift(a.repartition(5),
      b.repartition(3), "text", numBuckets = 64).collect()(0)
    assert(re.getLong(1) === drift.getLong(1) &&
      re.getLong(2) === drift.getLong(2) &&
      re.getLong(3) === drift.getLong(3))
  }

  test("stratifiedSplit: exact per-stratum proportions, deterministic") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("g", pmod(col("id"), lit(4)).cast("string"))
    val sp = Selection.stratifiedSplit(df, Seq("g"), "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val counts = sp.groupBy("g", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every stratum has exactly 250 rows -> 200/25/25, EXACT
    for (g <- Seq("0", "1", "2", "3")) {
      assert(counts((g, "train")) === 200L, s"stratum $g")
      assert(counts((g, "val")) === 25L, s"stratum $g")
      assert(counts((g, "test")) === 25L, s"stratum $g")
    }
    // deterministic under repartition; assignment independent of order
    val re = Selection.stratifiedSplit(df.repartition(7), Seq("g"), "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(sp.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
    // odd stratum size: floor boundaries still partition exhaustively
    val odd = Selection.stratifiedSplit(
      spark.range(0, 7).toDF("id").withColumn("g", lit("x")),
      Seq("g"), "id", Seq(("a", 0.5), ("b", 0.5)))
    val oc = odd.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oc("a") === 3L && oc("b") === 4L) // floor(7*0.5)=3, rest
    intercept[IllegalArgumentException] {
      Selection.stratifiedSplit(df, Seq("g"), "id",
        Seq(("a", 0.5), ("b", 0.4)))
    }
    // thirds regression: rounded cums end at 999_999, and without the
    // pinned final 1_000_000 boundary the LAST-ranked row of every
    // stratum would match no branch and silently get a NULL split
    val thirds = Selection.stratifiedSplit(df, Seq("g"), "id",
      Seq(("a", 1.0 / 3), ("b", 1.0 / 3), ("c", 1.0 / 3)))
    assert(thirds.filter(col("split").isNull).count() === 0L)
    assert(thirds.count() === 1000L)
    val tc = thirds.groupBy("g", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (g <- Seq("0", "1", "2", "3")) // 250 -> 83 / 83 / 84
      assert(tc((g, "a")) === 83L && tc((g, "b")) === 83L &&
        tc((g, "c")) === 84L, s"stratum $g")
  }
  test("distributionDriftByGroup: per-group triage, one-sided groups score high") {
    val a = Seq(("en", "spark join agg"), ("en", "spark sort"),
      ("fr", "le chat noir"), ("xx", "only in a")).toDF("g", "text")
    val b = Seq(("en", "spark join agg"), ("en", "spark sort"),
      ("fr", "chien loup ours")).toDF("g", "text")
    val got = Selection.distributionDriftByGroup(a, b, "g", "text",
      numBuckets = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(got.keySet === Set("en", "fr", "xx"))
    // identical en halves -> zero drift; disjoint fr tokens -> positive;
    // one-sided xx scores against uniform -> positive
    assert(got("en") === ((0L, 0L)))
    assert(got("fr")._1 > 0L && got("fr")._2 > 0L)
    assert(got("xx")._1 > 0L)
    // partitioning-invariant
    val re = Selection.distributionDriftByGroup(a.repartition(3),
      b.repartition(2), "g", "text", numBuckets = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(re === got)
  }
  test("calibrationSweep excludes null scores/labels; stratifiedSplit guards reserved names") {
    val df = Seq((Some(10L), Some(true)), (None, Some(true)),
      (Some(50L), None), (Some(-5L), Some(false)))
      .toDF("score", "y")
    val row = Selection.calibrationSweep(df, "score", "y", Seq(0L))
      .collect()(0)
    // only (10,true) and (-5,false) count: tp=1 fp=0 fn=0 tn=1
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) === ((1L, 0L, 0L, 1L)))
    intercept[IllegalArgumentException] {
      Selection.stratifiedSplit(
        Seq((1L, "a", "x")).toDF("id", "g", "split"),
        Seq("g"), "id", Seq(("a", 1.0)))
    }
  }

  test("annealPlan: anneal set is the greedy best-quality token prefix, boundary doc included") {
    import org.apache.spark.sql.functions._
    // quality descending: ids 1(q90,t40) 2(q80,t50) 3(q70,t10) 4(q10,t100)
    // total=200, frac=0.25 -> budget=50; starts: 0,40,90,100 ->
    // anneal = {1, 2} (doc 2 STARTS at 40 < 50 and straddles)
    val df = Seq((1L, 90L, 40L), (2L, 80L, 50L), (3L, 70L, 10L),
      (4L, 10L, 100L)).toDF("id", "q", "t")
    val got = Selection.annealPlan(df, "id", col("q"), col("t"),
        annealFracMicro = 250000L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === Map(1L -> "anneal", 2L -> "anneal",
      3L -> "main", 4L -> "main"))
    // deterministic under repartition, order_key engine-stable
    val a = Selection.annealPlan(df, "id", col("q"), col("t"), 250000L)
      .orderBy("id").collect().toSeq
    val b = Selection.annealPlan(df.repartition(3), "id", col("q"),
      col("t"), 250000L).orderBy("id").collect().toSeq
    assert(a === b)
    // quality ties break by id: equal quality, budget covers one doc
    val tied = Seq((7L, 50L, 10L), (5L, 50L, 10L), (6L, 50L, 10L))
      .toDF("id", "q", "t")
    val gt = Selection.annealPlan(tied, "id", col("q"), col("t"),
        333333L) // budget = floor(30*0.333333)=9 -> max(1,9)=9 -> doc 5 only
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(gt === Map(5L -> "anneal", 6L -> "main", 7L -> "main"))
    // null token counts fail fast
    intercept[IllegalArgumentException] {
      Selection.annealPlan(
        Seq((1L, 10L, Some(5L)), (2L, 20L, None))
          .toDF("id", "q", "t"), "id", col("q"), col("t"), 100000L)
    }
  }

  test("bradleyTerry: dominance ranks, never-loser finite, guard, determinism") {
    // A dominates B, B dominates C; A vs C unobserved — transitivity
    // must still rank A > B > C through the shared opponent
    val comp = (Seq.fill(8)(("A", "B")) ++ Seq.fill(2)(("B", "A")) ++
      Seq.fill(8)(("B", "C")) ++ Seq.fill(2)(("C", "B")))
      .toDF("winner", "loser")
    val r = Selection.bradleyTerry(comp, "winner", "loser", iters = 3)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("A")._3 > r("B")._3 && r("B")._3 > r("C")._3)
    // raw (unsmoothed) win/game bookkeeping
    assert(r("A")._1 === 8L && r("A")._2 === 10L)
    assert(r("B")._1 === 10L && r("B")._2 === 20L)
    assert(r("C")._1 === 2L && r("C")._2 === 10L)
    // strengths normalize to mean ~1e6 (floor rounding only)
    val s = r.values.map(_._3).sum
    assert(s <= 3000000L && s > 3000000L - 10L, s)

    // an item that NEVER lost stays finite (add-one smoothing), and
    // one that never won stays positive
    val oneSided = Seq.fill(5)(("W", "L")).toDF("winner", "loser")
    val os = Selection.bradleyTerry(oneSided, "winner", "loser")
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(os("W") > os("L") && os("L") > 0L)

    // deterministic across invocations (driver fit, sorted items)
    val again = Selection.bradleyTerry(comp, "winner", "loser", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(again === r.map { case (k, v) => k -> v._3 })

    // bounded-vocabulary guard fails fast
    intercept[IllegalArgumentException] {
      Selection.bradleyTerry(
        (0 until 40).map(i => (s"i$i", s"j$i")).toDF("winner", "loser"),
        "winner", "loser", maxItems = 10)
    }
    // dense-matrix guard: ≤maxItems items but too many DIRECTED pair
    // rows to collect — fails fast in-plan, naming the bound (6 items
    // all-pairs = 30 directed rows > maxPairRows=20)
    val dense = (for { i <- 0 until 6; j <- 0 until 6 if i != j }
      yield (s"m$i", s"m$j")).toDF("winner", "loser")
    val eDense = intercept[IllegalArgumentException] {
      Selection.bradleyTerry(dense, "winner", "loser", maxItems = 10,
        maxPairRows = 20L)
    }
    assert(eDense.getMessage.contains("maxPairRows") &&
      eDense.getMessage.contains("30"), eDense.getMessage)
    // and the same data fits when the bound admits it
    assert(Selection.bradleyTerry(dense, "winner", "loser",
      maxItems = 10, maxPairRows = 30L).count() === 6L)
    // self-comparisons and null sides are dropped, not fit
    val noisy = Seq(("A", "A"), ("A", "B"), (null, "B"), ("B", null))
      .toDF("winner", "loser")
    val nz = Selection.bradleyTerry(noisy, "winner", "loser")
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(nz === Map("A" -> 1L, "B" -> 1L))
  }

  test("interAnnotatorKappa: hand values, negative kappa, abstain, degenerate NULL") {
    def kap(rows: Seq[(String, String, String)]) =
      Selection.interAnnotatorKappa(
        rows.toDF("g", "a", "b"), Seq("g"), "a", "b")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // n=6, agree=4, marginals 3/3 each side: kappa = 6/18 = 1/3
    val r = kap(Seq(("g", "x", "x"), ("g", "x", "y"), ("g", "y", "y"),
      ("g", "y", "y"), ("g", "y", "x"), ("g", "x", "x")))
    assert(r("g") === ((6L, 4L, Some(333333L))))
    // perfect systematic disagreement: kappa = -1 exactly (truncation
    // toward zero matches on negatives)
    assert(kap(Seq(("n", "x", "y"), ("n", "y", "x")))("n")
      === ((2L, 0L, Some(-1000000L))))
    // abstentions (NULL either side) leave n
    val ab = kap(Seq(("a", "x", "x"), ("a", null, "y"), ("a", "y", null)))
    assert(ab("a")._1 === 1L)
    // both annotators constant and identical -> p_e = 1 -> NULL
    assert(kap(Seq(("d", "x", "x"), ("d", "x", "x")))("d")._3 === None)
  }

  test("dpoPairs: picks, strict margin, ties to lower id, null hygiene, singletons never pair") {
    import spark.implicits._
    val cand = Seq(
      // prompt A: clear order -> (a3 chosen, a1 rejected), margin 500
      ("A", "a1", 100L), ("A", "a2", 300L), ("A", "a3", 600L),
      // prompt B: all tied -> chosen == rejected impossible, margin 0 -> no row
      ("B", "b1", 400L), ("B", "b2", 400L),
      // prompt C: margin 5 below the 10 floor -> no row
      ("C", "c1", 100L), ("C", "c2", 105L),
      // prompt D: ties at BOTH ends -> lower id wins both picks
      ("D", "d4", 900L), ("D", "d2", 900L), ("D", "d9", 50L), ("D", "d7", 50L),
      // prompt E: singleton -> never pairs
      ("E", "e1", 999L),
      // null score / null prompt rows are excluded before grouping
      ("A", "a9", -1L), (null, "x1", 500L))
      .toDF("prompt", "cand", "score")
      .withColumn("score", when(col("cand") === "a9",
        lit(null).cast("long")).otherwise(col("score")))
    val r = graft.llm.Selection.dpoPairs(cand, "prompt", "cand",
        "score", minMarginMicro = 10L)
      .collect().map(x => x.getString(0) ->
        ((x.getString(1), x.getString(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r.keySet === Set("A", "D"))
    assert(r("A") === (("a3", "a1", 500L, 3L)))
    assert(r("D") === (("d2", "d7", 850L, 4L)))
    // the strict floor is a contract, not a default
    intercept[IllegalArgumentException] {
      graft.llm.Selection.dpoPairs(cand, "prompt", "cand", "score",
        minMarginMicro = 0L)
    }
    // determinism across invocations
    val again = graft.llm.Selection.dpoPairs(cand, "prompt", "cand",
        "score", minMarginMicro = 10L)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(again === r.map { case (k, v) => k -> v._1 })
  }

  test("grpoAdvantages: hand-computed, zero-variance z=0, singletons drop, null hygiene") {
    import spark.implicits._
    val cand = Seq(
      // group A: n=3, Σ=1000, Σr²=460000, var_num=380000
      ("A", "a1", 100L), ("A", "a2", 300L), ("A", "a3", 600L),
      // group B: all tied → adv 0, z 0 (never a divide-by-zero)
      ("B", "b1", 400L), ("B", "b2", 400L),
      // singleton: no baseline, drops
      ("E", "e1", 999L),
      // null prompt / null score rows are excluded before grouping
      ("A", "a9", -1L), (null, "x1", 500L))
      .toDF("prompt", "cand", "score")
      .withColumn("score", when(col("cand") === "a9",
        lit(null).cast("long")).otherwise(col("score")))
    val r = graft.llm.Selection.grpoAdvantages(cand, "prompt", "cand",
        "score")
      .collect().map(x => x.getString(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // floor((n·r − Σr)/n) and floor(1000·num/√var_num), by hand:
    // a1: num=-700 → adv=-234, z=floor(-700000/√380000)=-1136
    assert(r === Map(
      "a1" -> ((100L, -234L, -1136L)),
      "a2" -> ((300L, -34L, -163L)),
      "a3" -> ((600L, 266L, 1297L)),
      "b1" -> ((400L, 0L, 0L)),
      "b2" -> ((400L, 0L, 0L))))
    // partitioning-invariant
    val re = graft.llm.Selection.grpoAdvantages(cand.repartition(5),
        "prompt", "cand", "score")
      .collect().map(x => x.getString(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(re === r)
    intercept[IllegalArgumentException] {
      graft.llm.Selection.grpoAdvantages(cand, "prompt", "cand",
        "score", minGroup = 1)
    }
  }

  test("quantileNormalize: hand-exact grid lookup, singleton group, extremes") {
    // global sorted scores: 1,2,10,20,30,40,50,99 (N=8); Q=4 grid
    // idx_k = (k*7) div 4 = 0,1,3,5,7 -> gridpoints 1,2,20,40,99
    val rows = Seq(
      (1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 30L),
      (4L, "g1", 40L), (5L, "g1", 50L),
      (6L, "g2", 1L), (7L, "g2", 2L),
      (8L, "g3", 99L)) // singleton group
      .toDF("id", "grp", "s").repartition(3)
    val out = Selection.quantileNormalize(rows, "id", "grp", "s",
        nQuantiles = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // g1 (n=5): pr = 0, 250000, 500000, 750000, 1000000
    //           k  = 0, 1, 2, 3, 4 -> norm 1, 2, 20, 40, 99
    assert(out(1L) === ((0L, 1L)))
    assert(out(2L) === ((250000L, 2L)))
    assert(out(3L) === ((500000L, 20L)))
    assert(out(4L) === ((750000L, 40L)))
    assert(out(5L) === ((1000000L, 99L)))
    // g2 (n=2): extremes map to the global extremes
    assert(out(6L) === ((0L, 1L)))
    assert(out(7L) === ((1000000L, 99L)))
    // singleton group: pr_micro = 0 by rule -> global minimum
    assert(out(8L) === ((0L, 1L)))
  }

  test("temperatureMixture: sqrt weights boost low-resource groups, " +
      "exact integer arithmetic, shares near-normalized") {
    import spark.implicits._
    // 10000 vs 100 docs: raw shares 99% / 1%; sqrt shares 10:1
    val docs = ((1L to 10000L).map(i => (i, "big")) ++
        (1L to 100L).map(i => (i + 20000L, "small")))
      .toDF("doc_id", "lang").repartition(4)
    val out = Selection.temperatureMixture(docs, "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val (nB, wB, shB, prB, boB) = out("big")
    val (nS, wS, shS, prS, boS) = out("small")
    assert(nB === 10000L && nS === 100L)
    // sqrt_w_micro = floor(sqrt(n) * 1e6)
    assert(wB === 100000000L && wS === 10000000L)
    // shares: 10/11 and 1/11 in micro units (floor)
    assert(shB === 909090L && shS === 90909L)
    assert(prB === 990099L && prS === 9900L)
    // the low-resource group upsamples ~9.18x, the big one shrinks
    assert(boS === (90909L * 1000000L) / 9900L)
    assert(boB < 1000000L && boS > 9000000L)
    // shares sum to 1e6 within the two floors
    assert(shB + shS <= 1000000L && shB + shS >= 1000000L - 2L)
  }

  test("bestOfN: argmax with low-id ties, margin + floor gates, " +
      "singleton vacuous margin, null rows never compete") {
    import spark.implicits._
    val cand = Seq(
      // p1: clear winner by margin
      (1L, 10L, 900000L), (1L, 11L, 800000L), (1L, 12L, 100000L),
      // p2: margin too thin (500 < 1000) -> rejected
      (2L, 20L, 900000L), (2L, 21L, 899500L),
      // p3: tie at the top -> margin 0, lower id wins the pick
      (3L, 31L, 850000L), (3L, 30L, 850000L),
      // p4: singleton above the floor -> accepted, runner NULL
      (4L, 40L, 750000L),
      // p5: singleton below the floor -> rejected
      (5L, 50L, 100000L))
      .toDF("prompt", "cand", "score")
      .unionByName(Seq((6L, Option.empty[Long], Option(1L)),
        (6L, Option(60L), Option.empty[Long]))
        .toDF("prompt", "cand", "score"))
      .repartition(3)
    val out = Selection.bestOfN(cand, "prompt", "cand", "score",
        minScoreMicro = 700000L, minMarginMicro = 1000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(5),
        r.getBoolean(6)))).toMap
    assert(out(1L) === ((10L, 900000L, 800000L, 3L, true)))
    assert(out(2L) === ((20L, 900000L, 899500L, 2L, false)))
    assert(out(3L) === ((30L, 850000L, 850000L, 2L, false)))
    assert(out(4L) === ((40L, 750000L, -1L, 1L, true)))
    assert(out(5L) === ((50L, 100000L, -1L, 1L, false)))
    assert(!out.contains(6L), "null cand/score rows never compete")
    // strictness is the contract: margin floor below 1 is refused
    intercept[IllegalArgumentException] {
      Selection.bestOfN(cand, "prompt", "cand", "score",
        minScoreMicro = 0L, minMarginMicro = 0L)
    }
  }
}
