package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("mortonInterleave: hand-computed bit positions, SQL twin agrees") {
    // x=0b1100, y=0b1010 at 4 bits: x bit i -> pos 2i, y bit i -> 2i+1
    // x sets pos 4,6; y sets pos 3,7 -> z = 16+64+8+128 = 216
    val r = Seq((12L, 10L)).toDF("x", "y")
      .select(Layout.mortonInterleave(Seq(col("x"), col("y")), 4).as("z"),
        expr(Layout.mortonInterleaveSql(Seq("x", "y"), 4)).as("z2"))
      .head()
    assert(r.getLong(0) === 216L && r.getLong(1) === 216L)
    // 3 dims: each dim d's bit i lands at 3i+d
    val r3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.mortonInterleave(
        Seq(col("a"), col("b"), col("c")), 2).as("z")).head()
    assert(r3.getLong(0) === 7L) // bits 0,1,2
    intercept[IllegalArgumentException] {
      Layout.mortonInterleave(Seq(col("a"), col("b")), 32) // 64 > 62
    }
  }

  test("zOrderKeys: buckets bound BOTH dims; linear sort bounds one") {
    // full 16x16 grid; identity scaling (span 15 onto 4 bits)
    val grid = (for { x <- 0 to 15; y <- 0 to 15 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val spans = Layout.zOrderKeys(grid, Seq("x", "y"), bits = 4)
      .withColumn("bucket", shiftright(col("z_key"), 4))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length === 16 && spans.forall(_.getLong(1) === 16L))
    // every 16-row z bucket is a 4x4 block: both spans <= 3. The same
    // 16 consecutive rows under a LINEAR x-sort span the full y range.
    assert(spans.forall(r => r.getLong(2) <= 3L && r.getLong(3) <= 3L))
    // keys are a bijection on the grid (distinct, dense in [0, 256))
    val ks = Layout.zOrderKeys(grid, Seq("x", "y"), bits = 4)
      .select("z_key").collect().map(_.getLong(0)).sorted
    assert(ks === (0L until 256L).toArray)
  }

  test("zOrderKeys: degenerate dim, NULL propagation, guards") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "c")
    // constant dim contributes 0 bits -> key ordered purely by x
    val ks = Layout.zOrderKeys(df, Seq("x", "c"), bits = 4)
      .orderBy("x").select("z_key").collect().map(_.getLong(0))
    assert(ks sameElements ks.sorted)
    // NULL dim -> NULL key
    val n = Layout.zOrderKeys(
      Seq((Some(1L), Some(1L)), (None, Some(2L)), (Some(3L), Some(3L)))
        .toDF("x", "y"), Seq("x", "y"), bits = 4)
    assert(n.filter(col("z_key").isNull).count() === 1L)
    // span overflow fails fast instead of wrapping
    intercept[IllegalArgumentException] {
      Layout.zOrderKeys(
        Seq((0L, 0L), (Long.MaxValue - 1, 1L)).toDF("x", "y"),
        Seq("x", "y"), bits = 16)
    }
    // output column collision rejected
    intercept[IllegalArgumentException] {
      Layout.zOrderKeys(df.withColumnRenamed("c", "z_key"),
        Seq("x", "z_key"), bits = 4)
    }
  }
}
