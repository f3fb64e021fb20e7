package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed NIGHTLY LOOP: crawl → ingest → admit → gate → append
  * → scrub → pack → split → shard → release → provenance → ship as
  * ONE resumable driver over the [[Manifest]] commit log — the
  * end-to-end composition whose operators all existed separately
  * (q173 crawl cycle, q101/q112 WARC ingest, q114 store admission,
  * appendToSignatureStore, q167 pack export) but had no single entry
  * point with restart semantics.
  *
  * Same §3.3 discipline as [[Pipeline]] (write-then-record: each
  * stage commits its parquet output, THEN upserts the manifest;
  * reference pipeline.py:456-485 + tables.py:90-236) with the loop's
  * own stage order instead of the reference's fixed four. A killed
  * run resumes at the FIRST UNCOMMITTED stage: completed stages are
  * never recomputed (their by-name inputs are not even evaluated),
  * later stages read the committed interchange files, so the final
  * corpus is byte-identical to an uninterrupted run — every stage
  * core is deterministic and the one store MUTATION (append) is
  * idempotent by construction (bucketed anti-joins re-detect what
  * the store already holds), which is exactly what makes a kill
  * inside append's write-then-record gap safe to replay.
  *
  * Stage contracts (all inputs/outputs are DataFrames; columns in
  * parentheses):
  *  - crawl: tonight's candidate frontier (`url`) × robots registry
  *    (`host`, `allow`, `prefix`) → the admitted FETCH LIST
  *    (`url`, `host`, `path`): trap shapes out (urlTrapSignals),
  *    then RFC 9309 wildcard robots admission (robotsFilter). The
  *    fetcher itself is external (network IO is out of engine
  *    scope); the committed fetch list is its work order.
  *  - ingest: fetch results as WARC bytes (`warc_id`, `payload`) →
  *    documents (`id` = target URI, `text`): the warcRecords
  *    Generator keeps 2xx response records with non-empty bodies.
  *  - admit: documents → admitted documents (+`near_candidates`):
  *    intra-night self-dedup first (duplicate ids collapse; exact
  *    content dups keep the lowest id — the store probe only flags
  *    against the CORPUS), then the persisted signature store probe
  *    (exact hash tier + LSH band tier); exact dups always drop,
  *    near-candidates drop unless `admitNearCandidates`.
  *  - append: admitted documents → one-row receipt (`n_appended`):
  *    merges tonight's signatures into the store so TOMORROW's batch
  *    dedups against today's admissions. The store tracks the RAW
  *    admitted content — scrubbing comes after, so a re-fetch of the
  *    same raw page tomorrow still dedups.
  *  - scrub (v4): admitted documents → release-ready documents
  *    (`id`, `text`, `near_candidates`, + redaction/paragraph audit
  *    counters): PII redaction then paragraph-granularity exact
  *    dedup; docs scrubbed to empty drop. Everything the loop
  *    PUBLISHES from here on is built from scrubbed text.
  *  - pack: scrubbed documents → training sequences
  *    (`host`, `pack_id`, `n_docs`, `n_tokens`, `sequence`):
  *    per-host token-budget packing (exportPackedSequences).
  *  - split: scrubbed documents → leakage-safe train/val/test
  *    verdicts (`id`, `cluster_id`, `split`): the night's near-dup
  *    pairs (MinHash tier) → connected components → ONE salted-SHA
  *    verdict per CLUSTER, so no held-out document can have a
  *    train-side near-dup (leakageSafeSplit; Lee et al. 2022's leak
  *    closed by construction).
  *  - shard: the TRAIN split → snake-draft balanced shards
  *    (`id`, `cost`, `shard`): boustrophedon deal over descending
  *    token cost — the LPT approximation with no sequential state.
  *  - release: train docs → the published training sequences
  *    (`shard`, `pack_id`, `n_docs`, `n_tokens`, `sequence`):
  *    per-SHARD token-budget packing (the pack stage's layout is
  *    per-host for crawl ops; the release layout is per-shard for
  *    the trainer).
  *  - provenance: the release's attribution table (`shard`,
  *    `pack_id`, `id`, `doc_seq`, `token_offset`, `n_tokens`): any
  *    token position in a released sequence maps back to its source
  *    document — takedown, contamination tracing, and the per-doc
  *    loss-mask spans (a doc's tokens occupy exactly
  *    [token_offset, token_offset + n_tokens)).
  *  - ship (v5): the nightly EXTERNAL HANDOFF, inside the resumable
  *    manifest — the signature-store export loop that used to be a
  *    manual driver step. Night 1 of a chain epoch takes a full
  *    base snapshot ([[graft.llm.Dedup.exportSignatureStoreSnapshot]]);
  *    every later night exports a batch-sized DELTA of the night's
  *    appends against the chain so far
  *    ([[graft.llm.Dedup.exportSignatureStoreDelta]] — transfer
  *    volume ∝ the night, never the corpus). Store MAINTENANCE
  *    between nights (compaction/removal bumps the store version,
  *    which no append-only delta can express) re-bases automatically:
  *    the stage compares the live version against the chain's and
  *    opens a NEW chain epoch with a fresh base instead of failing
  *    the night. The committed stage output is a one-row receipt
  *    (`ship_kind` base|delta, `export_dir`, `store_version`,
  *    `head_append_seq`, `release_dir`, `provenance_dir`) naming
  *    everything a downstream consumer pulls: the chain entry plus
  *    the night's published release/provenance dirs. Kill/resume: a
  *    completed export whose receipt never recorded is REUSED by
  *    night name, a hard-killed partial (no `_export_meta`) is
  *    deleted and re-exported. One ship per night — re-running a
  *    night from scratch with CHANGED content requires clearing the
  *    night's chain entry first. (No ANN delta here: the loop has no
  *    embedding stage; ANN chains ship from whatever job appends
  *    embeddings, via [[graft.llm.Similarity.exportAnnIndexDelta]].)
  *
  * Scale shape: the driver touches only control-plane rows (manifest
  * events, the append receipt); every stage is one distributed job
  * whose plan is the already-audited operator plan. At 100 TB the
  * interchange dirs are the natural checkpoint boundary — a stage
  * retry re-reads the previous stage's committed parquet, never the
  * raw feeds. */
final case class NightlyLoop(
    root: String,
    storePrefix: String,
    name: String = "nightly",
    // v2: the quality gate landed between admit and append; v3: the
    // release chain (split → shard → release → provenance) landed
    // after pack; v4: the SCRUB stage (PII redaction + paragraph-
    // granularity dedup — the Dolma/Lee et al. release-time passes)
    // landed between append and the release chain, which now consumes
    // scrubbed text; v5: the SHIP stage (signature-store base/delta
    // export chain + release-dir receipt) landed after provenance (a
    // night recorded under an older stage order must re-run, not
    // resume)
    version: String = "v5",
    /** The gate's minimum admitted-batch size: a night below this
      * refuses to publish (the E3 empty-result-guard philosophy at
      * loop granularity). */
    minDocs: Long = 1L,
    admitNearCandidates: Boolean = false,
    /** Also near-dedup the night's batch against ITSELF (MinHash
      * pairs → connected components → keep the longest text per
      * cluster, ties to lowest id). The store probe only flags
      * near-dups against the CORPUS; without this, two near-identical
      * pages fetched the same night both pass. Off by default — at
      * streaming cadence [[graft.streaming.Streaming.streamNearSelfCheck]]
      * is the cheaper tier; turn this on for batch-only loops. */
    selfNearDedup: Boolean = false,
    selfNearThreshold: Double = 0.7,
    tokenBudget: Long = 4096L,
    maxBucket: Long = 1L << 20,
    /** Release-chain knobs: the leakage-safe split fractions and the
      * snake-draft shard count for the published train split. */
    releaseFractions: Seq[(String, Double)] =
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
    releaseShards: Int = 4,
    /** Round cap for the split stage's connected components — the
      * near-dup graph of a TEMPLATED night can chain (page k pairs
      * with page k+1), and CC rounds = chain diameter. */
    splitCcMaxIter: Int = 50,
    /** Scrub-stage knobs (v4): which release-time passes run. The
      * stage itself always runs (the stage ORDER is version-pinned);
      * a disabled pass is an identity with zeroed counters, so the
      * scrub output schema — and every downstream resume — is stable
      * across configurations. */
    scrubPii: Boolean = true,
    scrubParagraphDedup: Boolean = true,
    /** Test seam for the ship stage's torn-export window — forwarded
      * as `midExportHook` to the snapshot/delta export (runs after
      * the data copy, before the fence re-check). Production callers
      * omit it. */
    shipMidExportHook: () => Unit = () => ()) {

  def stageDir(stage: String, night: String): String =
    s"$root/$stage/$name/$night"

  private def readStage(spark: SparkSession, stage: String,
      night: String): DataFrame =
    spark.read.parquet(stageDir(stage, night))

  /** The loop's ONE host notion (crawl gate AND pack shard — they
    * must agree or packs shard by a different host than the robots
    * gate admitted): lowercase with userinfo and port stripped.
    * Hostnames are case-insensitive and robots registries key on the
    * bare host, so `https://H1.Example:443/private/x` must match
    * rules recorded for `h1.example` — an exact-equality join on the
    * raw authority would default such URLs to ALLOWED (robotsFilter's
    * no-match arm) and order a disallowed fetch. */
  private def hostOf(url: org.apache.spark.sql.Column) =
    lower(regexp_replace(regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1),
      "^[^/@]*@", ""), ":\\d+$", ""))

  private def pathOf(url: org.apache.spark.sql.Column) =
    coalesce(nullif(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1), lit("")),
      lit("/"))

  private def crawlStage(candidates: DataFrame,
      rules: DataFrame): DataFrame = {
    val safe = graft.llm.Crawl.urlTrapSignals(candidates, "url")
      .filter(!col("is_trap")).select("url")
    val parsed = safe.select(col("url"),
      hostOf(col("url")).as("host"), pathOf(col("url")).as("path"))
    // normalize the registry side with the same host notion
    val normRules = rules.withColumn("host", lower(col("host")))
    graft.llm.Crawl.robotsFilter(parsed, "url", "host", "path",
        normRules)
      .filter(col("allowed"))
      .select("url", "host", "path")
  }

  private def ingestStage(warc: DataFrame): DataFrame =
    warc.select(graft.ops.functions.warcRecords(col("payload"))
        .as(Seq("rec_idx", "warc_type", "target_uri", "warc_date",
          "content_type", "content_length", "http_status",
          "http_content_type", "body")))
      .filter(col("warc_type") === "response" &&
        col("http_status").between(200, 299) &&
        col("body").isNotNull)
      .select(col("target_uri").as("id"),
        col("body").cast("string").as("text"))
      .filter(trim(col("text")) =!= "")

  private def admitStage(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    // intra-night self-dedup FIRST: the store probe only flags
    // against the CORPUS, so two byte-identical documents fetched
    // the same night (a mirrored page, one URI in two WARC records)
    // would both pass it. Duplicate ids collapse DETERMINISTICALLY
    // (longest body wins, ties to the lexicographically greater —
    // dropDuplicates would keep an arbitrary partition's row and two
    // from-scratch runs of the same night could pack different text
    // for the same id), then exact content dedup keeps the lowest id
    // per hash. Content hashes TRIM first — the store's own exact
    // tier hashes sha2(trim(text)), and the intra-night tier must use
    // the same document-identity notion or a whitespace-variant pair
    // slips through both. (Intra-night NEAR dups are the streaming
    // tier's job — streamNearSelfCheck — or the selfNearDedup arm.)
    val uniqIds = docs.groupBy("id")
      .agg(max(struct(length(col("text")).as("l"), col("text").as("t")))
        .getField("t").as("text"))
    val keepIds = graft.llm.Dedup
      .exactDedupByContent(
        uniqIds.withColumn("_trimmed", trim(col("text"))), "_trimmed", "id")
      .select(col("keep_id").as("id"))
    val uniqExact = uniqIds.join(keepIds, Seq("id"), "left_semi")
    val uniq =
      if (!selfNearDedup) uniqExact
      else {
        // batch-vs-batch NEAR tier: MinHash pairs → components →
        // keep the longest text per cluster (ties to lowest id).
        // Cost ∝ the night's batch, never the corpus.
        val batch = uniqExact.localCheckpoint()
        val pairs = graft.llm.Dedup.nearDuplicatesMinhash(
          batch, "id", "text", threshold = selfNearThreshold)
        val resolved = graft.llm.Dedup.resolveNearDups(
          batch,
          pairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")),
          "id", length(col("text")))
        batch.join(resolved.filter(col("kept")).select("id"),
          Seq("id"), "left_semi")
      }
    val store = graft.llm.Dedup.readSignatureStore(spark, storePrefix)
    val verdicts = store.admit(uniq, "id", "text",
      maxBucket = maxBucket)
    val keep = uniq.join(verdicts, Seq("id"))
      .filter(!col("exact_dup"))
    (if (admitNearCandidates) keep
     else keep.filter(col("near_candidates") === 0))
      .select("id", "text", "near_candidates")
  }

  private def appendStage(spark: SparkSession,
      admitted: DataFrame): DataFrame = {
    import spark.implicits._
    graft.llm.Dedup.appendToSignatureStore(
      admitted.select(col("id"), col("text")), "id", "text",
      storePrefix, maxBucket = maxBucket)
    Seq(admitted.count()).toDF("n_appended")
  }

  /** The v4 SCRUB stage — the release-time cleaning passes between
    * the store mutation and the release chain (the Dolma / Lee et al.
    * 2022 lineage): (1) PII redaction (emails, IPv4, phones → typed
    * placeholders, [[graft.llm.TextAnalysis.piiRedact]]) and (2)
    * paragraph-granularity exact dedup (first occurrence corpus-wide
    * wins, [[graft.llm.Dedup.paragraphDedup]]). Runs AFTER append by
    * design: the signature store tracks the RAW admitted content (so
    * tomorrow's fetch of the same raw page still dedups), while
    * everything the release chain publishes — packs, split verdicts,
    * shards, provenance — is built from scrubbed text.
    *
    * Docs whose every paragraph lost (scrubbed to empty) DROP here —
    * an empty document packs zero tokens and pollutes provenance.
    * Output: (id, text, near_candidates, n_emails, n_ipv4, n_phones,
    * n_paras, n_kept) — counters are the audit trail (zeroed when a
    * pass is disabled; n_paras = n_kept = per-doc paragraph count
    * when only paragraph dedup is off). Scale shape: both passes are
    * the already-audited operator plans; the join-backs are
    * night-batch-sized, the corpus is never touched. */
  private def scrubStage(admitted: DataFrame): DataFrame = {
    val base = admitted.select(col("id"), col("text"),
      col("near_candidates"))
    val pii =
      if (scrubPii) {
        val r = graft.llm.TextAnalysis.piiRedact(
          base.select("id", "text"), "id", "text")
        base.drop("text").join(r, Seq("id"))
          .withColumnRenamed("redacted", "text")
      } else base
        .withColumn("n_emails", lit(0L))
        .withColumn("n_ipv4", lit(0L))
        .withColumn("n_phones", lit(0L))
    val scrubbed =
      if (scrubParagraphDedup) {
        val d = graft.llm.Dedup.paragraphDedup(
          pii.select("id", "text"), "id", "text")
        pii.drop("text").join(d, Seq("id"))
          .withColumnRenamed("dedup_text", "text")
      } else pii
        // same non-blank paragraph notion as the operator's n_paras:
        // split on Pattern.quote of the SHARED separator constant, so
        // the two paragraph notions cannot drift (paragraphDedup
        // quotes its sep; a raw "\n\n" here happens to behave
        // identically for this literal but not for any future sep)
        .withColumn("n_paras",
          size(filter(split(col("text"), java.util.regex.Pattern.quote(
              graft.llm.Dedup.DefaultParagraphSep)),
            p => trim(p) =!= "")).cast("long"))
        .withColumn("n_kept", col("n_paras"))
    scrubbed.filter(trim(col("text")) =!= "")
      .select("id", "text", "near_candidates", "n_emails", "n_ipv4",
        "n_phones", "n_paras", "n_kept")
  }

  private def packStage(admitted: DataFrame): DataFrame =
    graft.llm.TrainingOps.exportPackedSequences(
      admitted.withColumn("host", hostOf(col("id"))),
      "host", "id", "text",
      graft.llm.TextAnalysis.tokenCountWs(col("text")).cast("long"),
      tokenBudget)

  /** The RELEASE chain's first link: leakage-safe split verdicts for
    * the night's admitted batch. Pairs come from the MinHash near-dup
    * tier over the batch itself (cost ∝ the night, never the corpus)
    * — the same pair notion the selfNearDedup arm resolves with; here
    * the pairs CLUSTER the split instead of dropping rows, so both
    * members of a kept near-pair land in the SAME split. */
  private def splitStage(admitted: DataFrame): DataFrame = {
    val batch = admitted.select(col("id"), col("text")).localCheckpoint()
    val pairs = graft.llm.Dedup.nearDuplicatesMinhash(
        batch, "id", "text", threshold = selfNearThreshold)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    graft.llm.Dedup.leakageSafeSplit(batch, "id", pairs,
      releaseFractions, ccMaxIter = splitCcMaxIter)
  }

  /** Snake-draft shard assignment for the TRAIN split (release
    * balance by token cost; rank arithmetic, no sequential state). */
  private def shardStage(admitted: DataFrame,
      split: DataFrame): DataFrame = {
    val train = admitted.join(
      split.filter(col("split") === "train").select("id"), Seq("id"))
    graft.llm.TrainingOps.snakeShards(train, "id",
      graft.llm.TextAnalysis.tokenCountWs(col("text")).cast("long"),
      releaseShards)
  }

  private def trainWithShard(admitted: DataFrame,
      shard: DataFrame): DataFrame =
    admitted.join(shard.select(col("id"), col("shard")), Seq("id"))

  /** The published training sequences: per-shard token-budget packs. */
  private def releaseStage(admitted: DataFrame,
      shard: DataFrame): DataFrame =
    graft.llm.TrainingOps.exportPackedSequences(
      trainWithShard(admitted, shard), "shard", "id", "text",
      graft.llm.TextAnalysis.tokenCountWs(col("text")).cast("long"),
      tokenBudget)

  /** The release's attribution table — pack coordinates + first-token
    * offset per packed document; also the per-doc loss-mask span map
    * (see the class Scaladoc). Same packing arithmetic as
    * [[releaseStage]] by construction (both ride packByTokenBudget
    * with identical inputs), so export and provenance can never
    * disagree on pack membership. */
  private def provenanceStage(admitted: DataFrame,
      shard: DataFrame): DataFrame =
    graft.llm.TrainingOps.packProvenance(
      trainWithShard(admitted, shard), "shard", "id",
      graft.llm.TextAnalysis.tokenCountWs(col("text")).cast("long"),
      tokenBudget, sepTokens = 1)

  /** Where the ship stage's export chain lives — shared across
    * nights (dated night dirs and `_chain` coexist under
    * `ship/<name>/`). Entry names are `e<epoch>_base_<night>` and
    * `e<epoch>_d<idx>_<night>`, zero-padded so LEXICOGRAPHIC order
    * IS chain order. */
  def shipChainRoot: String = s"$root/ship/$name/_chain"

  /** The v5 SHIP stage — the nightly external handoff, resumable.
    * See the class Scaladoc for the full contract; mechanics:
    * (1) sweep hard-killed partials (an entry without
    * `_export_meta`; soft failures already delete their own),
    * (2) if THIS night already has a completed chain entry, reuse it
    * (the kill-in-the-write-then-record-gap replay),
    * (3) otherwise extend the newest epoch with a delta — or open a
    * new epoch with a fresh base when there is no chain yet or store
    * maintenance bumped the version out from under it. The receipt
    * derives from the entry's own `_export_meta`, so a resumed
    * re-run commits identical values. */
  private def shipStage(spark: SparkSession, night: String): DataFrame = {
    import spark.implicits._
    val chainRoot = new org.apache.hadoop.fs.Path(shipChainRoot)
    val fs = chainRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val entries: Seq[String] =
      if (fs.exists(chainRoot))
        fs.listStatus(chainRoot).map(_.getPath.getName).sorted.toSeq
      else Seq.empty
    val (complete, partial) = entries.partition(n => fs.exists(
      new org.apache.hadoop.fs.Path(chainRoot, s"$n/_export_meta")))
    partial.foreach(n => fs.delete(
      new org.apache.hadoop.fs.Path(chainRoot, n), true))
    def receipt(kind: String, entry: String): DataFrame = {
      val m = spark.read
        .parquet(s"$shipChainRoot/$entry/_export_meta").head()
      Seq((kind, s"$shipChainRoot/$entry", m.getAs[Int]("version"),
          m.getAs[Long]("append_seq"), stageDir("release", night),
          stageDir("provenance", night)))
        .toDF("ship_kind", "export_dir", "store_version",
          "head_append_seq", "release_dir", "provenance_dir")
    }
    complete.find(_.endsWith(s"_$night")) match {
      case Some(entry) =>
        receipt(if (entry.contains("_base_")) "base" else "delta",
          entry)
      case None =>
        val epochOf: String => Int = _.drop(1).takeWhile(_.isDigit).toInt
        val curEpoch = complete.lastOption.map(epochOf).getOrElse(0)
        val chain = complete.filter(epochOf(_) == curEpoch)
        val liveVersion =
          graft.llm.Dedup.signatureStoreVersion(spark, storePrefix)
        val chainVersion = chain.headOption.map(e => spark.read
          .parquet(s"$shipChainRoot/$e/_export_meta").head()
          .getAs[Int]("version"))
        if (chainVersion.contains(liveVersion)) {
          val entry = f"e$curEpoch%04d_d${chain.size}%05d_$night"
          graft.llm.Dedup.exportSignatureStoreDelta(spark, storePrefix,
            chain.map(e => s"$shipChainRoot/$e"),
            s"$shipChainRoot/$entry", midExportHook = shipMidExportHook)
          receipt("delta", entry)
        } else {
          // no chain yet, or maintenance rewrote the store (version
          // bump — rows may have been removed, which no append-only
          // delta can express): open a new epoch with a fresh base
          val entry = f"e${curEpoch + 1}%04d_base_$night"
          graft.llm.Dedup.exportSignatureStoreSnapshot(spark,
            storePrefix, s"$shipChainRoot/$entry",
            midExportHook = shipMidExportHook)
          receipt("base", entry)
        }
    }
  }

  /** The quality GATE between admit and the store mutation: the
    * night's admitted batch must pass its declarative rules BEFORE
    * append — a failed batch must never poison the signature store
    * or publish packs (the dbt-test discipline applied to the loop).
    * The committed stage output is the full rule report (an audit
    * artifact); ANY failing rule aborts the night with the failing
    * rules named, and because the manifest only records COMPLETED
    * stages, a fixed re-run resumes AT the gate, never re-crawling. */
  private def gateStage(spark: SparkSession,
      admitted: DataFrame): DataFrame = {
    // r16: dqReport computes the same rule + unique-key report in ONE
    // aggregate pass over the admitted batch (was two full scans)
    val report = graft.ops.etl.dqReport(admitted, Seq(
        "id_not_null" -> col("id").isNull,
        "text_not_empty" ->
          (col("text").isNull || trim(col("text")) === ""),
        "min_docs" -> lit(false)), // n_rows carries the count; see below
      Seq(Seq("id") -> "unique_id"))
    val rows = report.collect() // ≤4 rules — control-plane only
    val n = rows.head.getAs[Long]("n_rows")
    val failed = rows.filter(!_.getAs[Boolean]("pass")).map(_.getString(0)) ++
      (if (n < minDocs) Seq(s"min_docs(n=$n < $minDocs)") else Nil)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"nightly gate FAILED for rules [${failed.mkString(", ")}] — " +
          "refusing to append to the store or publish packs; fix the " +
          "batch and re-run (the loop resumes at the gate)")
    import spark.implicits._
    rows.map(r => (r.getString(0), r.getAs[Long]("violations"),
      r.getAs[Long]("n_rows"), r.getAs[Boolean]("pass")))
      .toSeq.toDF("rule", "violations", "n_rows", "pass")
  }

  /** Run (or RESUME) one night. `night` is the partition key; the
    * three feeds are BY-NAME so a resumed run whose remaining stages
    * do not need them never evaluates them. Returns the committed
    * pack output. `beforeRecord`/`afterStage` are test seams (throw
    * inside them to simulate a kill in the write-then-record gap /
    * between stages); production callers omit them. */
  def runNight(spark: SparkSession, night: String, manifest: Manifest,
      candidates: => DataFrame, rules: => DataFrame,
      warc: => DataFrame,
      beforeRecord: String => Unit = _ => (),
      afterStage: String => Unit = _ => ()): DataFrame = {
    // both reads scoped to THIS loop's events (two loops sharing one
    // manifest must not resume against each other's completions)
    manifest.versionOf(night, Some(name)).foreach { recorded =>
      if (recorded != version)
        throw new PipelineVersionError(
          s"$night was recorded under nightly version $recorded; " +
            s"current is $version — re-run from scratch")
    }
    val done = manifest.nextStage(night, NightlyLoop.StageOrder,
        Some(name)) match {
      case None => NightlyLoop.StageOrder.toSet
      case Some(next) =>
        NightlyLoop.StageOrder.takeWhile(_ != next).toSet
    }
    val cores: Seq[(String, () => DataFrame)] = Seq(
      "crawl" -> (() => crawlStage(candidates, rules)),
      "ingest" -> (() => ingestStage(warc)),
      "admit" -> (() => admitStage(spark, readStage(spark, "ingest", night))),
      "gate" -> (() => gateStage(spark, readStage(spark, "admit", night))),
      "append" -> (() => appendStage(spark, readStage(spark, "admit", night))),
      // v4: everything the loop PUBLISHES is built from scrubbed text
      "scrub" -> (() => scrubStage(readStage(spark, "admit", night))),
      "pack" -> (() => packStage(readStage(spark, "scrub", night))),
      "split" -> (() => splitStage(readStage(spark, "scrub", night))),
      "shard" -> (() => shardStage(readStage(spark, "scrub", night),
        readStage(spark, "split", night))),
      "release" -> (() => releaseStage(readStage(spark, "scrub", night),
        readStage(spark, "shard", night))),
      "provenance" -> (() => provenanceStage(
        readStage(spark, "scrub", night),
        readStage(spark, "shard", night))),
      // v5: the external handoff rides the same write-then-record
      // protocol — a crashed export is inside kill/resume now
      "ship" -> (() => shipStage(spark, night)))
    cores.foreach { case (st, mk) =>
      if (!done.contains(st)) {
        val dir = stageDir(st, night)
        mk().write.mode("overwrite").parquet(dir)
        beforeRecord(st)
        manifest.markDone(night, name, st, dir, version)
        afterStage(st)
      }
    }
    readStage(spark, "pack", night)
  }
}

object NightlyLoop {
  /** The loop's canonical stage order (its analog of
    * [[Stages.Order]]). v2 inserted `gate` BEFORE the store
    * mutation; v3 appended the release chain; v4 inserted `scrub`
    * between the store mutation and the release chain; v5 appended
    * `ship` (the store-export handoff) after `provenance` —
    * old-order manifests raise PipelineVersionError via the
    * recorded-version check rather than resuming against the wrong
    * order. */
  val StageOrder: Seq[String] =
    Seq("crawl", "ingest", "admit", "gate", "append", "scrub", "pack",
      "split", "shard", "release", "provenance", "ship")
}
