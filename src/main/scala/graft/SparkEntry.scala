package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{functions => F}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-module inventories
  * (graft.queries.*). Column names are identical between each Spark
  * query and its DuckDB oracle, and every query ends in a total
  * ORDER BY (the driver hash-compares sorted-by-name columns
  * row-by-row).
  */
object SparkEntry {

  /** Flagship: the reference's extract→transform pipeline shape over the
    * stream-shaped `events` table (SURVEY.md §7.5) — rename/cast,
    * booler, JSON extraction, ms-recast, ISO serialization.
    * Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    ev.select(
        col("event_id").as("id"),
        F.recastTimestamp(Tables.tsMillis(ev, "ts")).as("event_time"),
        F.uppercase(col("event_type")).as("kind"),
        F.boolerLax(
          when(col("event_type").isin("signup", "purchase"), "yes")
            .otherwise("no")).as("is_conversion"),
        col("value").cast("decimal(12,2)").as("amount"),
        F.jsonGet(col("props"), "$.k").cast("int").as("k"))
      .filter(col("amount") > 0)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.ExtQueries.queries

  /** For each key in queries, equivalent DuckDB SQL on the same parquet
    * tables. Omitted keys → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++ graft.queries.ExtQueries.oracleSql
}
