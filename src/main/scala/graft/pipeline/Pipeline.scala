package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage graph — the reference's four-stage chain re-expressed as
  * composable `DataFrame => DataFrame` stages (SURVEY.md §7.4).
  *
  * Reference semantics preserved:
  *  - fixed stage order upload → extract → transform → load
  *    (utils.py:16 TASK_KEYS);
  *  - declared stages must be consecutive: transform requires extract,
  *    load requires transform unless load-only (pipeline.py:108-118) —
  *    enforced at construction (PipelineError analog);
  *  - per-stage pre/post hooks (§2.9): pre-hooks rewrite the stage
  *    input frame (the manifest-rewrite analog), post-hooks rewrite /
  *    filter rows (post_extract / post_transform semantics — a hook
  *    returning a filtered frame drops rows exactly like a None-returning
  *    reference post-processor);
  *  - stage-to-stage interchange is a file (parquet dir per stage), so
  *    every stage boundary is inspectable and restartable (§3.3).
  *
  * At scale each stage is one declarative Spark job; the orchestrator
  * never touches row data on the driver.
  */
object Stages {
  val Order: Seq[String] = Seq("upload", "extract", "transform", "load")
}

object Pipeline {
  /** Shared daemon pool for fire-and-forget commit hooks (the broker-
    * worker analog). Small and bounded: hooks are notifications, not
    * data-plane work. */
  private[pipeline] lazy val hookPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-commit-hooks")
      t.setDaemon(true)
      t
    })
}

final class PipelineDeclarationError(msg: String) extends IllegalArgumentException(msg)

/** Raised when a stage produces zero rows under `failOnEmpty` — the
  * reference's `PipelineDataError` (`_writer` refuses to hand an empty
  * payload to the loader, pipeline.py:811-816). The empty output is
  * NOT recorded in the manifest, so the object resumes from the stage
  * that emptied out. */
final class PipelineDataError(msg: String) extends IllegalStateException(msg)

/** Raised when resuming an object recorded under a different pipeline
  * version (reference `PipelineVersionError`, tables.py:191-192). */
final class PipelineVersionError(msg: String) extends IllegalStateException(msg)

final case class Stage(
    name: String,
    core: DataFrame => DataFrame,
    pre: Seq[DataFrame => DataFrame] = Seq.empty,
    post: Seq[DataFrame => DataFrame] = Seq.empty,
    /** Post-commit side-effects (reference `on_<stage>_commit` async
      * processors, §2.9): fired after the stage file commit + manifest
      * upsert, given (pkey, committedPath). Never part of the plan —
      * failures log, they cannot corrupt the committed stage. */
    onCommit: Seq[(String, String) => Unit] = Seq.empty,
    /** PRE-stage fire-and-forget side effects (reference
      * `asynchronous=True` pre-processors, decorators.py:297-355,
      * dispatched through the broker before the stage runs,
      * pipeline.py:504-507,532-534): given (pkey, stageName) when the
      * stage STARTS, on the shared hook pool. Unlike `pre`, they never
      * see or rewrite the frame — notification-plane only — and, like
      * the reference's exclusion of async processors from the pipeline
      * version hash (pipeline.py:184-186), they are observational:
      * adding one must not change what the pipeline computes. */
    asyncPre: Seq[(String, String) => Unit] = Seq.empty) {
  def apply(df: DataFrame): DataFrame = {
    val in = pre.foldLeft(df)((d, h) => h(d))
    val out = core(in)
    post.foldLeft(out)((d, h) => h(d))
  }
}

final case class Pipeline(
    name: String,
    stages: Seq[Stage],
    /** Root directory for inter-stage parquet interchange. */
    root: String,
    /** Pipeline version fingerprint (reference hashes stage source into
      * a version, pipeline.py:176-221; pass e.g. Model.versionHash).
      * Recorded on every manifest commit; `advance` refuses to resume
      * an object recorded under a different version. */
    version: String = "v0",
    /** Reference `PipelineDataError` semantics (pipeline.py:811-816):
      * refuse to commit a zero-row stage. Off by default — empty
      * partitions are routine in incremental runs; turn on where an
      * empty stage means upstream breakage. */
    failOnEmpty: Boolean = false,
    /** Run `onCommit` callbacks on a background daemon pool instead of
      * inline — the reference dispatches `on_<stage>_commit` through the
      * broker's `.delay` (fire-and-forget, decorators.py:297-355), so a
      * slow callback must not stall the stage chain. `awaitCommitHooks`
      * drains in-flight callbacks (tests / orderly shutdown). */
    asyncCommitHooks: Boolean = true) {

  {
    val declared = stages.map(_.name)
    val unknown = declared.filterNot(Stages.Order.contains)
    if (unknown.nonEmpty)
      throw new PipelineDeclarationError(s"unknown stages: ${unknown.mkString(",")}")
    if (declared.distinct.size != declared.size)
      throw new PipelineDeclarationError(s"duplicate stage declarations")
    // consecutive-stage rule (pipeline.py:108-118): declared stages must
    // form a contiguous run of the canonical order (load-only allowed).
    val idx = declared.map(Stages.Order.indexOf).sorted
    if (idx.nonEmpty && idx.zip(idx.tail).exists { case (a, b) => b != a + 1 })
      throw new PipelineDeclarationError(
        s"stages must be consecutive (${Stages.Order.mkString("→")}); got ${declared.mkString(",")}")
  }

  private val byName: Map[String, Stage] = stages.map(s => s.name -> s).toMap
  private val ordered: Seq[Stage] =
    Stages.Order.flatMap(n => stages.find(_.name == n))

  def stageDir(stage: String, pkey: String): String = s"$root/$stage/$name/$pkey"

  /** Run all stages from `from` (default: first declared) on `input`,
    * writing each stage's output to its interchange dir and upserting
    * the manifest after each commit (write-then-record, B2 order). */
  def run(spark: SparkSession, input: DataFrame, pkey: String,
      manifest: Option[Manifest] = None,
      from: Option[String] = None): DataFrame = {
    val start = from.getOrElse(ordered.head.name)
    val startIdx = ordered.indexWhere(_.name == start)
    if (startIdx < 0)
      throw new PipelineDeclarationError(s"stage $start not declared on $name")
    var df = input
    ordered.drop(startIdx).foreach { st =>
      // fire-and-forget PRE-stage notifications (decorators.py:297-355):
      // dispatched before the stage body, never awaited by the chain.
      st.asyncPre.foreach { cb =>
        val task: Runnable = () =>
          try cb(pkey, st.name)
          catch { case e: Exception =>
            System.err.println(s"[pipeline] async pre_${st.name} failed for $pkey: ${e.getMessage}")
          }
        if (asyncCommitHooks) inFlight.add(Pipeline.hookPool.submit(task))
        else task.run()
      }
      df = st(df)
      val dir = stageDir(st.name, pkey)
      df.write.mode("overwrite").parquet(dir)
      df = spark.read.parquet(dir) // next stage reads the committed file
      // empty-guard BEFORE the manifest record (write-then-record means
      // an unrecorded empty dir is simply overwritten on re-run); the
      // count is parquet footer metadata, not a data scan.
      if (failOnEmpty && df.isEmpty)
        throw new PipelineDataError(
          s"stage ${st.name} produced 0 rows for $pkey (pipeline $name)")
      manifest.foreach(_.markDone(pkey, name, st.name, dir, version))
      st.onCommit.foreach { cb =>
        val task: Runnable = () =>
          try cb(pkey, dir)
          catch { case e: Exception =>
            System.err.println(s"[pipeline] on_${st.name}_commit failed for $pkey: ${e.getMessage}")
          }
        if (asyncCommitHooks) inFlight.add(Pipeline.hookPool.submit(task))
        else task.run()
      }
    }
    df
  }

  private val inFlight = new java.util.concurrent.ConcurrentLinkedQueue[java.util.concurrent.Future[_]]()

  /** Block until every async callback (`onCommit` + `asyncPre`)
    * scheduled by this pipeline has finished (no-op when
    * `asyncCommitHooks = false`). */
  def awaitCommitHooks(timeoutMillis: Long = 60000): Unit = {
    val deadline = System.nanoTime() + timeoutMillis * 1000000L
    var f = inFlight.poll()
    while (f != null) {
      val left = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
      try f.get(left, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch { case _: java.util.concurrent.ExecutionException => () }
      f = inFlight.poll()
    }
  }

  /** Restart every stalled object (reference
    * `restart_stalled_pipelines`, tasks.py:22-29): advance each pkey
    * the manifest shows incomplete, skipping — exactly like the
    * reference's `except (StopPipeline, PipelineVersionError)` —
    * objects that are version-stale (they need a fresh `run`) or
    * already complete. The pkey listing is control-plane rows (KBs);
    * each advance is a distributed job. Returns the pkeys that
    * actually advanced. */
  def restartStalled(spark: SparkSession, manifest: Manifest,
      olderThanMillis: Long = 0): Seq[String] = {
    val stalledKeys = manifest.stalled(ordered.map(_.name),
        olderThanMillis, Some(name))
      .select("pkey").collect().map(_.getString(0)).toSeq.sorted
    stalledKeys.flatMap { pkey =>
      try advance(spark, pkey, manifest).map(_ => pkey)
      catch {
        case _: PipelineVersionError => None // stale: re-run from scratch
        case scala.util.control.NonFatal(e) =>
          // one broken pkey (e.g. recorded under from=Some(...) so its
          // first declared stage never ran, or a corrupt stage file)
          // must not abort the SWEEP — every other stalled pkey after
          // it would silently never restart. Log and continue; the
          // pkey stays stalled and shows up again next sweep.
          System.err.println(
            s"[pipeline:$name] restartStalled: advance($pkey) failed " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); skipping")
          None
      }
    }
  }

  /** Resume a pkey from its first incomplete stage (reference
    * `advance`, pipeline.py:456-485 + tables.py:159-196): reads the
    * previous stage's committed file and continues. Returns None when
    * the object is already complete. */
  def advance(spark: SparkSession, pkey: String, manifest: Manifest): Option[DataFrame] = {
    // version gate (tables.py:191-192): stale objects must be re-run
    // from scratch under the current pipeline, not resumed mid-stream.
    // Both reads are scoped to THIS pipeline's events: two pipelines
    // sharing one manifest must not resume against each other's rows.
    manifest.versionOf(pkey, Some(name)).foreach { recorded =>
      if (recorded != version)
        throw new PipelineVersionError(
          s"$pkey was recorded under pipeline version $recorded; current is $version")
    }
    manifest.nextStage(pkey, ordered.map(_.name), Some(name)) match {
      case None => None
      case Some(next) =>
        val i = ordered.indexWhere(_.name == next)
        val input =
          if (i == 0)
            throw new PipelineDeclarationError(
              s"$pkey has no completed stages; run() it instead")
          else spark.read.parquet(stageDir(ordered(i - 1).name, pkey))
        Some(run(spark, input, pkey, Some(manifest), Some(next)))
    }
  }
}
