package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSuite

class RelationalSpec extends SparkSuite {
  import spark.implicits._

  test("asofJoin: latest at-or-before match, equal-time matches, no-candidate → null") {
    // mirrors the DuckDB ASOF LEFT JOIN reference case
    val left = Seq((1, 1, 100L), (2, 1, 250L), (3, 2, 50L), (4, 3, 500L))
      .toDF("id", "k", "t")
    val right = Seq((1, 100L, "a"), (1, 200L, "b"), (2, 60L, "c"))
      .toDF("k", "rt", "v")
    val got = relational.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy("id")
      .collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("v")))
      .toSeq
    assert(got === Seq(
      (1, "a"),   // exact-equal timestamp matches
      (2, "b"),   // latest ≤ 250 is 200/'b'
      (3, null),  // right exists but only later (60 > 50)
      (4, null))) // key absent on right
  }

  test("asofJoin: a left row between two right rows takes the earlier one") {
    val left = Seq((1, 1, 150L)).toDF("id", "k", "t")
    val right = Seq((1, 100L, "early"), (1, 200L, "late")).toDF("k", "rt", "v")
    val got = relational.asofJoin(left, right, Seq("k"), "t", "rt").collect()
    assert(got(0).getAs[String]("v") === "early")
  }

  test("asofJoin forward: earliest at-or-after, equal-time matches") {
    val left = Seq((1, 1, 100L), (2, 1, 150L), (3, 1, 250L), (4, 2, 50L),
      (5, 3, 10L)).toDF("id", "k", "t")
    val right = Seq((1, 100L, "a"), (1, 200L, "b"), (2, 20L, "c"))
      .toDF("k", "rt", "v")
    val got = relational.asofJoin(left, right, Seq("k"), "t", "rt",
        direction = "forward")
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("v"))).toSeq
    assert(got === Seq(
      (1, "a"),   // exact-equal timestamp matches
      (2, "b"),   // earliest >= 150 is 200/'b'
      (3, null),  // right exists but only earlier (200 < 250)
      (4, null),  // 20 < 50: nothing at-or-after
      (5, null))) // key absent on right
  }

  test("asofJoin: maxRowsPerKey fails fast naming the planted hot key") {
    // key 7 carries 600 of 700 rows across both sides — the shape that
    // would serialize one key's merged history through one window task
    val left = (1 to 500).map(i => (i, if (i <= 400) 7 else i, i * 10L))
      .toDF("id", "k", "t")
    val right = (1 to 200).map(i => (if (i <= 200) 7 else i, i * 5L, s"v$i"))
      .toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      relational.asofJoin(left, right, Seq("k"), "t", "rt",
        maxRowsPerKey = Some(100L))
    }
    assert(e.getMessage.contains("(7)") && e.getMessage.contains("600"))
    // under the cap: identical output to the unguarded call
    val a = relational.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy("id").collect().toSeq
    val b = relational.asofJoin(left, right, Seq("k"), "t", "rt",
      maxRowsPerKey = Some(1000L)).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("asofJoin: shared payload column names fail fast in every direction (intervalJoin convention)") {
    // both sides carry a payload column `v` — unguarded, the output
    // would hold two columns named `v` and break any select-by-name
    val left = Seq((1, 10L, "lv")).toDF("k", "t", "v")
    val right = Seq((1, 5L, "rv")).toDF("k", "rt", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val e = intercept[IllegalArgumentException] {
        relational.asofJoin(left, right, Seq("k"), "t", "rt",
          direction = dir)
      }
      assert(e.getMessage.contains("disjoint") && e.getMessage.contains("v"),
        s"$dir: ${e.getMessage}")
    }
    // the right TIME column may legally collide with a left payload
    // name (it is excluded from the right payload)
    val r2 = Seq((1, 5L, "rv")).toDF("k", "t", "rv")
    val ok = relational.asofJoin(left, r2, Seq("k"), "t", "t")
      .collect()
    assert(ok.length === 1 && ok.head.getString(3) === "rv")
  }

  test("rangeJoin matches a brute-force non-equi join exactly") {
    val rng = new scala.util.Random(7)
    val pts = (1 to 300).map(i => (i.toLong, rng.nextInt(2000).toLong - 500))
      .toDF("pid", "p")
    val ivs = (1 to 60).map { i =>
      val lo = rng.nextInt(1800).toLong - 600
      (i.toLong, lo, lo + rng.nextInt(200).toLong)
    }.toDF("iid", "lo", "hi")
    val got = relational.rangeJoin(pts, ivs, "p", "lo", "hi", bucketWidth = 64)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want) // incl. boundary-inclusive + negative domains
    assert(got.nonEmpty)
    // equi-join plan: no nested-loop / cartesian fallback
    val plan = relational.rangeJoin(pts, ivs, "p", "lo", "hi", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
  }

  test("rangeJoin fails fast on an interval wider than the bucket cap") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, Long.MaxValue / 2)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      relational.rangeJoin(pts, ivs, "p", "lo", "hi", bucketWidth = 1000).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msgs(t.getCause)
    assert(msgs(e).contains("rangeJoin"))
  }

  test("saltedJoin: identical rows to the plain join, salt never leaks") {
    // skewed fact: key 1 dominates
    val fact = ((1 to 500).map(i => (1L, s"f$i")) ++
      (1 to 20).map(i => (2L, s"g$i")) ++ Seq((3L, "h1")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val got = relational.saltedJoin(fact, dim, Seq("k"), salts = 8)
    assert(got.columns.toSeq === Seq("k", "payload", "name"))
    val want = fact.join(dim, Seq("k"))
    assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
    assert(got.count() === want.count()) // multiplicity preserved too
  }

  test("saltedJoin with salts=1 degenerates to the plain join") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "w")
    val got = relational.saltedJoin(fact, dim, Seq("k"), salts = 1).collect()
    assert(got.map(_.toSeq).toSet === Set(Seq(1L, "a", "x")))
  }

  test("saltedJoin tolerates MapType fact columns and _salt name clashes") {
    import org.apache.spark.sql.functions.{col, map, lit}
    // fact with a MapType column (unhashable by xxhash64) AND a
    // pre-existing "_salt" column on both sides
    val fact = Seq((1L, "a", 7), (1L, "b", 8), (2L, "c", 9))
      .toDF("k", "v", "_salt")
      .withColumn("m", map(lit("x"), col("v")))
    val dim = Seq((1L, "one", 7), (2L, "two", 9)).toDF("k", "name", "_salt")
    val got = relational.saltedJoin(fact.drop("_salt"), dim, Seq("k"), salts = 4)
    val want = fact.drop("_salt").join(dim, Seq("k"))
    assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
    // with the clash on BOTH inputs the user columns must survive intact
    val got2 = relational.saltedJoin(fact, dim, Seq("k", "_salt"), salts = 2)
    val want2 = fact.join(dim, Seq("k", "_salt"))
    assert(got2.collect().map(_.toSeq).toSet === want2.collect().map(_.toSeq).toSet)
  }

  private def funnelEvents(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("uid", "etype", "ms")

  test("funnel: 2-step matches the hand-built join formulation") {
    val ev = funnelEvents(
      (1L, "signup", 1000L), (1L, "purchase", 2000L),
      (2L, "signup", 1000L), (2L, "purchase", 5000L), // outside window
      (3L, "purchase", 500L), (3L, "signup", 1000L), // purchase BEFORE signup
      (4L, "signup", 0L), (4L, "signup", 100L), (4L, "purchase", 150L))
    val got = relational.funnel(ev, "uid", "etype", "ms",
        Seq("signup", "purchase"), Seq(1000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1000L, 2000L), (4L, 0L, 150L), (4L, 100L, 150L)))
  }

  test("funnel: EXISTS semantics — greedy-earliest would miss this chain") {
    // A@0; B@1 and B@50; C@55. Windows: B within 100 of A, C within 10
    // of B. Greedy picks B@1 → C window (1,11] → miss; the valid chain
    // goes through B@50 → C@55. EXISTS must find it.
    val ev = funnelEvents(
      (1L, "A", 0L), (1L, "B", 1L), (1L, "B", 50L), (1L, "C", 55L))
    val got = relational.funnel(ev, "uid", "etype", "ms",
        Seq("A", "B", "C"), Seq(100L, 10L)).collect()
    assert(got.length === 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2))
      === ((1L, 0L, 55L)))
  }

  test("funnel: 3-step chains, strict ordering, per-step windows") {
    val ev = funnelEvents(
      // completes: view@0 → cart@10 → buy@15
      (1L, "view", 0L), (1L, "cart", 10L), (1L, "buy", 15L),
      // step-2 event equals step-1 time → NOT strictly after → incomplete
      (2L, "view", 0L), (2L, "cart", 0L), (2L, "buy", 5L),
      // completes only for the SECOND view start
      (3L, "view", 0L), (3L, "view", 90L), (3L, "cart", 100L), (3L, "buy", 105L),
      // cart in window, buy outside its window
      (4L, "view", 0L), (4L, "cart", 10L), (4L, "buy", 500L))
    val got = relational.funnel(ev, "uid", "etype", "ms",
        Seq("view", "cart", "buy"), Seq(20L, 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 15L), (3L, 90L, 105L)))
  }

  test("funnel: plan is id-equi joins, never a nested loop") {
    val ev = funnelEvents((1L, "a", 0L), (1L, "b", 1L), (1L, "c", 2L))
    val p = relational.funnel(ev, "uid", "etype", "ms",
      Seq("a", "b", "c"), Seq(10L, 10L)).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("funnel: hot-entity guard raises naming the bot; off by default") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, when}
    // entity 666 is a bot: 100k step-0 events and one conversion;
    // entity 1 is an ordinary completing chain
    val bot = spark.range(100000L).select(
      lit(666L).as("uid"), lit("view").as("etype"), col("id").as("ms"))
    val rest = funnelEvents(
      (666L, "buy", 50L), (1L, "view", 0L), (1L, "buy", 5L))
    val ev = bot.unionByName(rest)
    // guard on: fail fast, offender named
    val e = intercept[IllegalArgumentException] {
      relational.funnel(ev, "uid", "etype", "ms", Seq("view", "buy"),
        Seq(100L), maxEventsPerEntityStep = Some(1000))
    }
    assert(e.getMessage.contains("666") && e.getMessage.contains("view"))
    // guard off (default): completes, results unchanged
    val got = relational.funnel(ev, "uid", "etype", "ms",
        Seq("view", "buy"), Seq(100L))
      .filter(col("uid") === 1L).collect()
    assert(got.length === 1 && got(0).getLong(2) === 5L)
    // cap above the hottest entity: no raise
    assert(relational.funnel(rest, "uid", "etype", "ms",
      Seq("view", "buy"), Seq(100L),
      maxEventsPerEntityStep = Some(1000)).count() === 1L)
  }

  test("funnel: reserved idCol name rejected with a clear message") {
    val ev = funnelEvents((1L, "a", 0L), (1L, "b", 1L))
      .withColumnRenamed("uid", "start_ms")
    val e = intercept[IllegalArgumentException] {
      relational.funnel(ev, "start_ms", "etype", "ms", Seq("a", "b"), Seq(10L))
    }
    assert(e.getMessage.contains("start_ms"))
  }
  test("asofJoin nearest: min |delta|, ties prefer backward, one-sided arms") {
    val left = Seq(
      (1, 1, 100L),  // equal-time right at 100 -> delta 0 backward
      (2, 1, 149L),  // 100 (d=49) vs 200 (d=51) -> backward 'a'
      (3, 1, 151L),  // 100 (d=51) vs 200 (d=49) -> forward 'b'
      (4, 1, 150L),  // exact tie d=50 -> backward 'a' (pandas convention)
      (5, 2, 10L),   // only a LATER right exists -> forward 'c'
      (6, 3, 10L)    // no right at all -> null
    ).toDF("id", "k", "t")
    val right = Seq((1, 100L, "a"), (1, 200L, "b"), (2, 60L, "c"))
      .toDF("k", "rt", "v")
    val got = relational.asofJoin(left, right, Seq("k"), "t", "rt",
        direction = "nearest")
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("v"))).toSeq
    assert(got === Seq((1, "a"), (2, "a"), (3, "b"), (4, "a"),
      (5, "c"), (6, null)))
    // scratch column must not leak into the output
    val cols = relational.asofJoin(left, right, Seq("k"), "t", "rt",
      direction = "nearest").columns.toSeq
    assert(cols === Seq("k", "id", "t", "v"))
    // cap guard works on the nearest arm too
    val hotLeft = Seq.tabulate(30)(i => (i, 9, i.toLong)).toDF("id", "k", "t")
    val ex = intercept[IllegalArgumentException] {
      relational.asofJoin(hotLeft, right, Seq("k"), "t", "rt",
        maxRowsPerKey = Some(10), direction = "nearest")
    }
    assert(ex.getMessage.contains("(9)"))
  }
  test("asofJoin: duplicate right rows at one (key, time) resolve deterministically") {
    // three right rows share (k=1, rt=100); without the tertiary
    // struct sort the window's last()/first() would pick an arbitrary
    // duplicate, varying across runs and partitionings
    val left = Seq((1, 1, 150L)).toDF("id", "k", "t")
    val right = Seq((1, 100L, "a"), (1, 100L, "c"), (1, 100L, "b"))
      .toDF("k", "rt", "v")
    def run(dir: String, parts: Int): String =
      relational.asofJoin(left, right.repartition(parts), Seq("k"),
        "t", "rt", direction = dir).collect()(0).getAs[String]("v")
    for (dir <- Seq("backward", "nearest")) {
      val picks = (1 to 4).map(p => run(dir, p)).distinct
      assert(picks === Seq("c"), // greatest right payload, every layout
        s"direction=$dir picked $picks")
    }
    // forward frame takes the SMALLEST duplicate — also stable
    val fl = Seq((1, 1, 50L)).toDF("id", "k", "t")
    val fwd = (1 to 4).map { p =>
      relational.asofJoin(fl, right.repartition(p), Seq("k"), "t", "rt",
        direction = "forward").collect()(0).getAs[String]("v")
    }.distinct
    assert(fwd === Seq("a"))
  }
  test("intervalJoin: brute-force parity, emit-once dedup, fail-fast guard") {
    val a = Seq((1, 0L, 100L), (2, 50L, 60L), (3, 500L, 600L),
      (4, 250L, 240L)) // inverted interval drops
      .toDF("a_id", "a_s", "a_e")
    val b = Seq((10, 90L, 200L), (11, 55L, 58L), (12, 700L, 800L),
      (13, 0L, 1000L))
      .toDF("b_id", "b_s", "b_e")
    val got = relational.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        bucketWidth = 16L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    // brute-force reference
    val want = (for {
      (ai, as_, ae) <- Seq((1, 0L, 100L), (2, 50L, 60L), (3, 500L, 600L))
      (bi, bs, be) <- Seq((10, 90L, 200L), (11, 55L, 58L), (12, 700L, 800L),
        (13, 0L, 1000L))
      if as_ <= be && bs <= ae
    } yield (ai, bi)).sorted
    assert(got === want)
    // emit-once: pair (1, 13) shares 7 buckets at width 16 — once only
    assert(got.count(_ == ((1, 13))) === 1)
    intercept[Exception] {
      relational.intervalJoin(
        Seq((1, 0L, 10000000L)).toDF("a_id", "a_s", "a_e"), b,
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 16L).collect()
    }
    intercept[IllegalArgumentException] {
      relational.intervalJoin(a, a.withColumnRenamed("a_id", "x"),
        "a_s", "a_e", "a_s", "a_e", bucketWidth = 16L)
    }
  }

  test("fuzzyLinkJoin: typo recovery, cap, id tie-break, blocking contract") {
    val catalog = Seq((1L, "goldenrod lavender"), (2L, "midnight chiffon"),
      (3L, "midnight chiffoX"), (4L, "spring green"))
      .toDF("rid", "name")
    val probes = Seq(
      (10L, "goldenrod lavender"), // exact -> dist 0
      (11L, "midnight chiffn"),    // 1 deletion: ties rids 2 and 3 at
                                   // dist 1/2? chiffon vs chiffn=1,
                                   // chiffoX vs chiffn=2 -> rid 2
      (12L, "spring greXXX"),      // dist 4 > cap -> dropped entirely
      (13L, "Xidnight chiffoY"))   // both ends edited: outside the
                                   // blocking contract? suffix block
                                   // "foY" misses, prefix "Xid" misses
      .toDF("pid", "key")
    val got = relational.fuzzyLinkJoin(probes, catalog,
        "pid", "key", "rid", "name", maxDist = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getInt(4)))).toMap
    assert(got === Map(10L -> ((1L, 0)), 11L -> ((2L, 1))))
    // equal-distance tie -> smallest right id
    val tied = relational.fuzzyLinkJoin(
        Seq((20L, "midnight chiffoZ")).toDF("pid", "key"),
        catalog, "pid", "key", "rid", "name", maxDist = 2)
      .collect()
    assert(tied.length === 1 && tied(0).getLong(2) === 2L &&
      tied(0).getInt(4) === 1)
    // null keys on either side are dropped, not matched
    val n = relational.fuzzyLinkJoin(
      Seq((30L, null: String)).toDF("pid", "key"),
      catalog, "pid", "key", "rid", "name", maxDist = 2)
    assert(n.count() === 0L)
    // blocking-skew guard: a shared prefix serializing the join
    // fails fast, naming the block
    val shared = (1L to 40L).map(i => (i, s"name $i")).toDF("rid", "name")
    val ex = intercept[IllegalArgumentException] {
      relational.fuzzyLinkJoin(
        shared.select(col("rid").as("pid"), col("name").as("key")),
        shared, "pid", "key", "rid", "name", maxDist = 2,
        maxBlockProduct = 100L)
    }
    assert(ex.getMessage.contains("nam") &&
      ex.getMessage.contains("maxBlockProduct"), ex.getMessage)
    // the same data passes with the cap raised deliberately
    assert(relational.fuzzyLinkJoin(
      shared.select(col("rid").as("pid"), col("name").as("key")),
      shared, "pid", "key", "rid", "name", maxDist = 2,
      maxBlockProduct = 10000L).count() === 40L)
  }

  test("bloomPreJoin: identical rows to the plain join, nulls dropped") {
    import spark.implicits._
    // most fact keys are absent from dim — the Bloom prefilter's
    // whole point — plus null keys on both sides (inner join drops
    // them; the probe's null-safe eval must not NPE)
    val fact = (1L to 400L).map(k => (k, s"f$k"))
      .toDF("fk", "payload")
      .unionByName(spark.range(1).select(
        org.apache.spark.sql.functions.lit(null).cast("long").as("fk"),
        org.apache.spark.sql.functions.lit("fnull").as("payload")))
    val dim = Seq((10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("dk", "attr")
      .unionByName(spark.range(1).select(
        org.apache.spark.sql.functions.lit(null).cast("long").as("dk"),
        org.apache.spark.sql.functions.lit("dnull").as("attr")))
    val got = relational.bloomPreJoin(fact, dim, "fk", "dk")
      .orderBy("fk").collect()
      .map(r => (r.getAs[Long]("fk"), r.getAs[String]("payload"),
        r.getAs[String]("attr"))).toSeq
    val want = fact.join(dim, col("fk") === col("dk"))
      .orderBy("fk").collect()
      .map(r => (r.getAs[Long]("fk"), r.getAs[String]("payload"),
        r.getAs[String]("attr"))).toSeq
    assert(got === want)
    assert(got === Seq((10L, "f10", "a"), (20L, "f20", "b"),
      (30L, "f30", "c")))
  }

  test("bloomPreJoin: no false negatives — every dim key survives") {
    import spark.implicits._
    // all 2000 fact keys ARE in dim: the filter may only pass-through
    // (FPs allowed, FNs never), so the join must keep all 2000
    val fact = (1L to 2000L).toDF("k").withColumn("v", col("k") * 2)
    val dim = (1L to 2000L).toDF("k2")
    assert(relational.bloomPreJoin(fact, dim, "k", "k2", fpp = 0.05)
      .count() === 2000L)
  }

  test("bloomPreJoin guards: integral keys only, filter size cap") {
    import spark.implicits._
    val fact = Seq((1L, "x")).toDF("k", "v")
    val sDim = Seq(("a", 1)).toDF("sk", "n")
    val exS = intercept[IllegalArgumentException] {
      relational.bloomPreJoin(fact, sDim, "k", "sk")
    }
    assert(exS.getMessage.contains("integral"), exS.getMessage)
    val dim = (1L to 100L).toDF("dk")
    val exCap = intercept[IllegalArgumentException] {
      relational.bloomPreJoin(fact, dim, "k", "dk", fpp = 0.01,
        maxFilterBytes = 16L)
    }
    assert(exCap.getMessage.contains("maxFilterBytes"), exCap.getMessage)
  }
}
