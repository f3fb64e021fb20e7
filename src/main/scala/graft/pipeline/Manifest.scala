package graft.pipeline

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lineage / state manifest — the reference's `__etl_data_objects`
  * control table (tables.py:90-236; SURVEY.md §3.3) as an append-only
  * parquet commit log with latest-wins reads.
  *
  * One row per (pkey, stage) completion event; current state = the
  * latest event per key (window dedup). Append-only writes make every
  * state change atomic via the file committer — no read-modify-write
  * races between concurrent stage jobs, and the full history stays
  * queryable (the reference keeps booleans only; we keep the log and
  * derive the booleans).
  */
final class Manifest(spark: SparkSession, dir: String,
    /** Compact the commit log once it accumulates this many files —
      * every `markDone` appends one tiny parquet file (that is what
      * makes it atomic), so a high-frequency streaming committer would
      * otherwise grow an unbounded small-file listing. 0 disables. */
    autoCompactFiles: Int = 256) {
  import spark.implicits._

  private val schemaDf = Seq.empty[(String, String, String, String, String, Long)]
    .toDF("pkey", "pipeline", "stage", "path", "version", "at")

  /** Record a stage completion for pkey (reference DataObject.upsert,
    * tables.py:139-157 — fired after the stage file commit). */
  def markDone(pkey: String, pipeline: String, stage: String, path: String,
      version: String = "v0"): Unit = {
    Seq((pkey, pipeline, stage, path, version, Instant.now().toEpochMilli))
      .toDF("pkey", "pipeline", "stage", "path", "version", "at")
      .write.mode(SaveMode.Append).parquet(dir)
    if (autoCompactFiles > 0 && dataFileCount() > autoCompactFiles) compact()
  }

  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFileCount(): Int =
    try fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))
    catch { case _: Exception => 0 }

  /** Rewrite the commit log as one parquet file. The manifest is
    * control-plane metadata (one row per (pkey, stage) event — KBs), so
    * a driver-side collect is the honest tool here, not a data-plane
    * violation. `keepHistory = false` additionally drops superseded
    * events (latest-wins snapshot). Single-writer: concurrent
    * `markDone`s during a compaction can be lost — compact from the
    * owner of the log, exactly like any checkpoint-log maintenance. */
  def compact(keepHistory: Boolean = true): Unit = {
    val src = if (keepHistory) log() else state()
    val rows = src.collect().toIndexedSeq
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices = 1), src.schema)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Current state, optionally scoped to ONE pipeline's events — two
    * pipelines sharing a manifest (e.g. a nightly loop and a backfill
    * loop) must not read each other's completions as their own. */
  private def stateOf(pipeline: Option[String]): DataFrame =
    pipeline.map(p => state().filter(col("pipeline") === p))
      .getOrElse(state())

  /** Pipeline version the pkey's most recent commit was recorded
    * under. Pass `pipeline` when the manifest is shared — an
    * unscoped read can resume against another pipeline's record. */
  def versionOf(pkey: String,
      pipeline: Option[String] = None): Option[String] = {
    val rows = stateOf(pipeline).filter(col("pkey") === pkey)
      .orderBy(col("at").desc).select("version").limit(1).collect()
    rows.headOption.map(_.getString(0))
  }

  /** Raw event log (empty frame when nothing recorded yet). */
  def log(): DataFrame =
    try spark.read.parquet(dir)
    catch { case _: Exception => schemaDf }

  /** Current per-(pkey, pipeline, stage) state: latest event wins.
    * `pipeline` is part of the identity — two pipelines sharing a
    * manifest each keep their own latest event per (pkey, stage), so a
    * newer pipeline's run never shadows (and `compact(keepHistory =
    * false)` never deletes) another pipeline's completions. */
  def state(): DataFrame = {
    val w = Window.partitionBy("pkey", "pipeline", "stage")
      .orderBy(col("at").desc)
    log().withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Stage booleans per pkey — the reference's
    * [uploaded, extracted, transformed, loaded] row shape. Scoped by
    * `pipeline` like every other reader: two pipelines sharing one
    * manifest must not read each other's completions as their own
    * (None = all pipelines, the cross-pipeline overview). */
  def stageFlags(stageOrder: Seq[String],
      pipeline: Option[String] = None): DataFrame = {
    val flags = stageOrder.map(s =>
      max(when(col("stage") === s, true).otherwise(false)).as(s"${s}_done"))
    stateOf(pipeline).groupBy("pkey").agg(flags.head, flags.tail: _*)
  }

  /** First incomplete stage for pkey (reference `_next`,
    * tables.py:124-137): the stage after the last completed one in
    * declared order; None when all declared stages are done. */
  def nextStage(pkey: String, stageOrder: Seq[String],
      pipeline: Option[String] = None): Option[String] = {
    val done = stateOf(pipeline).filter(col("pkey") === pkey)
      .select("stage").as[String].collect().toSet
    stageOrder.find(!done.contains(_))
  }

  /** Pkeys with at least one completed stage but not all — the restart
    * set for `restart_stalled_pipelines` (tasks.py:22-29), optionally
    * aged by `olderThanMillis` against each pkey's LAST activity. */
  def stalled(stageOrder: Seq[String], olderThanMillis: Long = 0,
      pipeline: Option[String] = None): DataFrame = {
    val cutoff = Instant.now().toEpochMilli - olderThanMillis
    stateOf(pipeline).groupBy("pkey")
      .agg(collect_set("stage").as("done"), max("at").as("last_at"))
      .filter(size(col("done")) < stageOrder.size && col("last_at") <= cutoff)
      .select("pkey", "done", "last_at")
  }
}
