package graft.ops

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
}
