package graft.llm

import org.apache.spark.sql.{Column, GraftColumnBridge => bridge}

/** Sketch aggregates ([EXT]): bounded-state summaries for questions a
  * full groupBy-count can't answer affordably at 100 TB. See the
  * expression classes for the guarantees each sketch makes. */
object Sketches {

  /** SpaceSaving heavy hitters of `c` per group — use inside
    * `groupBy(...).agg(...)`; returns `array<struct<item,cnt,err>>`
    * sorted by (cnt desc, item asc). Exact when the group's distinct
    * count ≤ capacity (err = 0); bounded-error estimate otherwise.
    * State per group is ≤ capacity entries at every point in the
    * partial/merge/final chain. */
  def heavyHitters(c: Column, capacity: Int): Column =
    bridge.column(graft.expressions.HeavyHittersAgg(
      bridge.expression(c), capacity).toAggregateExpression())
}
