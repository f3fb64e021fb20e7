package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data LAYOUT for scan pruning at 100 TB ([EXT]): multi-dimensional
  * Z-order (Morton) clustering — the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`. A table range-partitioned and sorted by a
  * linear key bounds ONE dimension's span per file; interleaving the
  * bits of several dimensions bounds EVERY dimension's span, so
  * min/max file statistics prune scans for predicates on any of them.
  *
  * Everything here is exact integer arithmetic — grid scaling is one
  * integer floor division per dim (overflow fail-fast-guarded), the
  * interleave is pure bit shuffling — so an external engine replays
  * the keys bit-identically.
  */
object Layout {

  /** Interleave the low `bits` bits of the already-grid-scaled
    * integer dims into one Morton key: dim j's bit i lands at
    * position i·D + j (dim 0 in the least-significant lane). Distinct
    * target positions ⇒ addition ≡ bitwise-OR, and `D·bits ≤ 62`
    * keeps the key a non-negative BIGINT. */
  def mortonInterleave(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"need at least 2 dims, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 62,
      s"dims*bits must be in [2, 62], got ${dims.size}*$bits")
    val d = dims.size
    val terms = for {
      i <- 0 until bits
      j <- dims.indices
    } yield shiftleft(
      shiftright(dims(j).cast(LongType), i).bitwiseAND(lit(1L)),
      i * d + j)
    terms.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL text over pre-scaled BIGINT
    * column names — the oracle-side twin of [[mortonInterleave]]
    * (both engines evaluate the identical shift/mask/add terms). */
  def mortonInterleaveSql(dimNames: Seq[String], bits: Int): String = {
    require(dimNames.size >= 2 && bits >= 1 && dimNames.size * bits <= 62)
    val d = dimNames.size
    (for {
      i <- 0 until bits
      j <- dimNames.indices
    } yield s"((((${dimNames(j)}) >> $i) & 1) << ${i * d + j})")
      .mkString(" + ")
  }

  /** Attach a Z-order key column: each dim is scaled onto the
    * [0, 2^bits) grid by exact integer floor division against its
    * observed [lo, hi] span — `(v − lo)·(2^bits − 1) div (hi − lo)` —
    * then Morton-interleaved. One min/max aggregate (a 1-row driver
    * action) fixes the spans; a span so wide that the scaling product
    * would overflow 63 bits fails fast rather than wrapping (at the
    * default 16 bits that allows spans up to 2^47 — wider spans want
    * fewer bits or pre-bucketed dims). A degenerate dim (hi = lo)
    * contributes constant 0 bits. NULL in any dim ⇒ NULL key.
    *
    * Scale shape: the aggregate is map-side-combined; the per-row key
    * is pure codegen arithmetic (no shuffle, no window). The key is
    * what `repartitionByRange(z).sortWithinPartitions(z)` wants —
    * this helper only ATTACHES the key, so callers compose layout
    * with their own partition count and write. */
  def zOrderKeys(df: DataFrame, dims: Seq[String], bits: Int = 16,
      out: String = "z_key"): DataFrame = {
    require(dims.size >= 2, s"need at least 2 dims, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 62,
      s"dims*bits must be in [2, 62], got ${dims.size}*$bits")
    require(!df.columns.contains(out), s"output column '$out' exists")
    val mask = (1L << bits) - 1
    val aggCols = dims.flatMap(c => Seq(min(col(c)).cast(LongType),
      max(col(c)).cast(LongType)))
    val agg = df.agg(aggCols.head, aggCols.tail: _*).head() // 1-row action
    val spans = dims.indices.map { j =>
      val lo = if (agg.isNullAt(2 * j)) 0L else agg.getLong(2 * j)
      val hi = if (agg.isNullAt(2 * j + 1)) 0L else agg.getLong(2 * j + 1)
      require(hi - lo >= 0 &&
        (hi == lo || (hi - lo) <= Long.MaxValue / mask),
        s"zOrderKeys: dim '${dims(j)}' span ${hi - lo} overflows the " +
          s"$bits-bit grid scaling — use fewer bits or pre-bucket")
      (lo, hi)
    }
    val scaled = dims.indices.map { j =>
      val (lo, hi) = spans(j)
      if (hi == lo) lit(0L)
      else expr(s"((CAST(`${dims(j)}` AS BIGINT) - (${lo}L)) * ${mask}L) " +
        s"div ${hi - lo}L")
    }
    df.withColumn(out, mortonInterleave(scaled, bits))
  }
}
