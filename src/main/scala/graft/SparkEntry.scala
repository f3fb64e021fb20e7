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

  /** Flagship (SURVEY.md §7.5): the reference's full staged pipeline —
    * extract (raw pass-through) → transform (declared-schema Model
    * compile: rename/cast/booler/JSON-extract/uppercase) → load (typed
    * result) — run through graft.pipeline with parquet interchange and
    * manifest commits, over the stream-shaped `events` table.
    * Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.model.{Field, Model}
    import graft.pipeline.{Manifest, Pipeline, Stage}
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)

    val enrichedEvent = Model("EnrichedEvent", Seq(
      Field("id", source = Some("event_id")),
      Field("event_time",
        computed = Some(F.recastTimestamp(Tables.tsMillis(ev, "ts")))),
      Field("kind", source = Some("event_type"), transform = F.uppercase),
      Field("is_conversion", computed = Some(F.boolerLax(
        when(col("event_type").isin("signup", "purchase"), "yes")
          .otherwise("no")))),
      Field("amount", source = Some("value"),
        cast = Some(org.apache.spark.sql.types.DecimalType(12, 2))),
      Field("k", computed = Some(F.jsonGet(col("props"), "$.k").cast("int")))))

    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val pipe = Pipeline("enriched_events", Seq(
      Stage("extract", identity),
      Stage("transform", enrichedEvent.compile,
        post = Seq(df => df.filter(col("amount") > 0)))), root)
    pipe.run(spark, ev, pkey = "events-sf0.001",
      manifest = Some(new Manifest(spark, s"$root/_manifest")))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.ExtQueries.queries ++
      graft.queries.R3Queries.queries ++ graft.queries.R4Queries.queries ++
      graft.queries.R5Queries.queries ++ graft.queries.R6Queries.queries ++
      graft.queries.R7Queries.queries ++
      graft.queries.R8Queries.queries ++
      graft.queries.R9Queries.queries ++
      graft.queries.R10Queries.queries ++
      graft.queries.R11Queries.queries ++
      graft.queries.R12Queries.queries ++
      graft.queries.R13Queries.queries ++
      graft.queries.R14Queries.queries

  /** For each key in queries, equivalent DuckDB SQL on the same parquet
    * tables. Omitted keys → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++ graft.queries.ExtQueries.oracleSql ++
      graft.queries.R3Queries.oracleSql ++ graft.queries.R4Queries.oracleSql ++
      graft.queries.R5Queries.oracleSql ++ graft.queries.R6Queries.oracleSql ++
      graft.queries.R7Queries.oracleSql ++
      graft.queries.R8Queries.oracleSql ++
      graft.queries.R9Queries.oracleSql ++
      graft.queries.R10Queries.oracleSql ++
      graft.queries.R12Queries.oracleSql ++
      graft.queries.R11Queries.oracleSql ++
      graft.queries.R13Queries.oracleSql ++
      graft.queries.R14Queries.oracleSql
}
