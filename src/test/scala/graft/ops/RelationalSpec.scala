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
}
