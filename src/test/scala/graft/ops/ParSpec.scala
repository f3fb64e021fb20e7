package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The r15 scale-adaptive fan-out gate: repartition only when the
  * input is BOTH small by estimated bytes AND under-partitioned
  * relative to the session's cores — never on an input that already
  * feeds every core (a generated in-memory corpus), never past the
  * size threshold (the production path). */
class ParSpec extends SparkSuite {
  import spark.implicits._

  private def parts(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("fanOut spreads a small single-partition input to every core") {
    val one = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "t")
      .coalesce(1)
    assert(parts(one) == 1)
    val fanned = Par.fanOut(one, col("id"))
    assert(parts(fanned) == spark.sparkContext.defaultParallelism)
    // rows unchanged
    assert(fanned.count() == 100)
  }

  test("fanOut is a no-op when the input already feeds every core") {
    val cores = spark.sparkContext.defaultParallelism
    val spread = spark.range(0, 1000, 1, cores)
      .select(col("id"), (col("id") * 2).as("v"))
    assert(parts(spread) == cores)
    val out = Par.fanOut(spread, col("id"))
    // same plan — no repartition node was added
    assert(out.queryExecution.optimizedPlan ===
      spread.queryExecution.optimizedPlan)
  }

  test("fanOut is a no-op past the size threshold (the production path)") {
    val one = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "t")
      .coalesce(1)
    // shrink the per-split size so cores × maxSplit falls below even
    // this tiny input's estimate — the production-scale condition
    val saved = spark.conf.get("spark.sql.files.maxPartitionBytes", null)
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      val out = Par.fanOut(one, col("id"))
      assert(out.queryExecution.optimizedPlan ===
        one.queryExecution.optimizedPlan)
    } finally {
      if (saved == null)
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
      else spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
    }
  }
}
