package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.llm.Dedup

class NightlyLoopSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-nl").toString

  private def dropStore(prefix: String): Unit =
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private val corpusText =
    "existing corpus document body standing in the store already tonight"

  private def freshStore(prefix: String): Unit = {
    dropStore(prefix)
    Dedup.writeSignatureStore(
      Seq(("corpus:1", corpusText)).toDF("id", "text"), "id", "text",
      prefix, buckets = 4)
  }

  private def warcResponse(uri: String, status: String,
      body: String): String = {
    val crlf = "\r\n"
    val block =
      s"HTTP/1.1 $status${crlf}Content-Type: text/html$crlf$crlf$body"
    s"WARC/1.0${crlf}WARC-Type: response${crlf}WARC-Target-URI: $uri" +
      s"${crlf}WARC-Date: 2024-01-01T00:00:00Z${crlf}Content-Type: " +
      s"application/http; msgtype=response${crlf}Content-Length: " +
      s"${block.getBytes("UTF-8").length}$crlf$crlf$block$crlf$crlf"
  }

  // candidate frontier: two good pages, one robots-disallowed, one
  // trap, and one disallowed page hiding behind host case + an
  // explicit port (the normalization the crawl gate must see through)
  private def candidates: DataFrame = Seq(
    "https://h1.example/p1",
    "https://h1.example/private/x",
    "https://H1.Example:443/private/y",
    "https://h1.example/t/x/x/x/x/x/x/x/x/x/e",
    "https://h2.example/p2").toDF("url")

  private def rules: DataFrame = Seq(
    ("h1.example", false, "/private/"),
    ("h1.example", true, "/")).toDF("host", "allow", "prefix")

  // fetch results: one fresh doc, one byte-copy of the corpus doc
  // (admit must drop it), one more fresh doc, one 404 (ingest
  // drops), and an INTRA-NIGHT byte-copy of the first doc under a
  // different URI (the self-dedup must keep only the lowest id —
  // the store probe alone cannot see it)
  private def warc: DataFrame = Seq(
    (1L, warcResponse("https://h1.example/p1", "200 OK",
      "fresh nightly document about alpha topics and spark engines")),
    (2L, warcResponse("https://h2.example/p2", "200 OK", corpusText)),
    (3L, warcResponse("https://h2.example/p3", "200 OK",
      "another wholly fresh body about beta matters and tokenizers")),
    (4L, warcResponse("https://h2.example/p4", "404 Not Found",
      "not found page body")),
    (5L, warcResponse("https://h2.example/pdup", "200 OK",
      "fresh nightly document about alpha topics and spark engines")))
    .map { case (i, s) => (i, s.getBytes("UTF-8")) }
    .toDF("warc_id", "payload")

  private def packRows(df: DataFrame): Seq[(String, Long, String)] =
    df.select("host", "pack_id", "sequence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("nightly loop end-to-end: crawl gate, ingest filter, store admit, idempotent append, pack") {
    val root = tmp()
    freshStore("nl_store_e2e")
    try {
      val loop = NightlyLoop(root, "nl_store_e2e")
      val m = new Manifest(spark, s"$root/_manifest")
      val out = loop.runNight(spark, "2026-08-14", m,
        candidates, rules, warc)
      // crawl: the trap and BOTH disallowed URLs are gone — including
      // the one hiding behind host case + an explicit port
      val fetch = spark.read.parquet(loop.stageDir("crawl", "2026-08-14"))
        .select("url").as[String].collect().sorted.toSeq
      assert(fetch === Seq("https://h1.example/p1", "https://h2.example/p2"))
      // ingest: 404 dropped; admit: the corpus byte-copy AND the
      // intra-night byte-copy dropped (lowest id kept)
      val admitted = spark.read
        .parquet(loop.stageDir("admit", "2026-08-14"))
        .select("id").as[String].collect().sorted.toSeq
      assert(admitted ===
        Seq("https://h1.example/p1", "https://h2.example/p3"))
      // pack: both survivors packed under their hosts
      val packs = packRows(out)
      assert(packs.map(_._1).distinct === Seq("h1.example", "h2.example"))
      assert(packs.count(_._3.contains("alpha topics")) === 1,
        "the intra-night dup must reach the packs exactly once")
      assert(!packs.exists(_._3.contains(corpusText)),
        "an exact corpus dup must never reach the training packs")
      // append: tomorrow's byte-copy of tonight's admission is flagged
      val probe = Dedup.readSignatureStore(spark, "nl_store_e2e")
        .admit(Seq(("probe:99",
          "fresh nightly document about alpha topics and spark engines"))
          .toDF("id", "text"), "id", "text").collect()
      assert(probe.head.getBoolean(1) === true,
        "append must make tonight's admissions visible to tomorrow")
      // release chain (v3): every admitted doc gets a leakage-safe
      // split verdict; the train subset deals into snake shards; the
      // released packs and the provenance table agree on membership
      val split = spark.read
        .parquet(loop.stageDir("split", "2026-08-14"))
      assert(split.select("id").as[String].collect().sorted.toSeq ===
        admitted)
      assert(split.select("split").as[String].collect()
        .forall(Set("train", "val", "test")))
      val trainIds = split.filter(col("split") === "train")
        .select("id").as[String].collect().sorted.toSeq
      val shard = spark.read
        .parquet(loop.stageDir("shard", "2026-08-14"))
      assert(shard.select("id").as[String].collect().sorted.toSeq ===
        trainIds)
      assert(shard.select("shard").as[Int].collect()
        .forall(s => s >= 0 && s < 4))
      val prov = spark.read
        .parquet(loop.stageDir("provenance", "2026-08-14"))
      assert(prov.select("id").as[String].collect().sorted.toSeq ===
        trainIds)
      // first doc of every pack starts at token offset 0
      assert(prov.filter(col("doc_seq") === 0)
        .select("token_offset").as[Long].collect().forall(_ == 0L))
      val release = spark.read
        .parquet(loop.stageDir("release", "2026-08-14"))
      assert(release.select("n_docs").as[Long].collect().sum ===
        trainIds.size.toLong)
      // manifest: the full stage list recorded exactly once
      val events = m.log().groupBy("stage").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(events === NightlyLoop.StageOrder.map(_ -> 1L).toMap)
    } finally dropStore("nl_store_e2e")
  }

  test("two consecutive nights: night 2 dedups against night 1's admissions through the composed driver alone") {
    val root = tmp()
    freshStore("nl_store_2n")
    try {
      val loop = NightlyLoop(root, "nl_store_2n")
      val m = new Manifest(spark, s"$root/_manifest")
      loop.runNight(spark, "2026-08-14", m, candidates, rules, warc)
      // night 2: one byte-copy of a night-1 ADMISSION (not a corpus
      // doc — only night 1's append can have made it visible) and one
      // genuinely new page (word set disjoint from every other doc)
      val warc2 = Seq(
        (1L, warcResponse("https://h2.example/n2a", "200 OK",
          "fresh nightly document about alpha topics and spark engines")),
        (2L, warcResponse("https://h2.example/n2b", "200 OK",
          "zeta omicron lambda kappa telescope granite harbor")))
        .map { case (i, s) => (i, s.getBytes("UTF-8")) }
        .toDF("warc_id", "payload")
      val out2 = loop.runNight(spark, "2026-08-15", m,
        candidates, rules, warc2)
      val admitted2 = spark.read
        .parquet(loop.stageDir("admit", "2026-08-15"))
        .select("id").as[String].collect().toSeq
      assert(admitted2 === Seq("https://h2.example/n2b"), admitted2)
      assert(packRows(out2).count(_._3.contains("telescope granite")) === 1)
      // each night's full stage list recorded independently per pkey
      val nStages = NightlyLoop.StageOrder.size.toLong
      val nights = m.log().groupBy("pkey").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(nights === Map("2026-08-14" -> nStages,
        "2026-08-15" -> nStages))
    } finally dropStore("nl_store_2n")
  }

  test("kill between stages: resume skips committed work, never re-evaluates the feeds, corpus byte-identical") {
    // golden: uninterrupted run in its own root + store
    val rootG = tmp()
    freshStore("nl_store_g")
    val golden =
      try packRows(NightlyLoop(rootG, "nl_store_g").runNight(spark,
        "2026-08-14", new Manifest(spark, s"$rootG/_manifest"),
        candidates, rules, warc))
      finally dropStore("nl_store_g")
    // interrupted run: die right after ingest commits
    val root = tmp()
    freshStore("nl_store_kr")
    try {
      val loop = NightlyLoop(root, "nl_store_kr")
      val m = new Manifest(spark, s"$root/_manifest")
      val boom = intercept[RuntimeException] {
        loop.runNight(spark, "2026-08-14", m, candidates, rules, warc,
          afterStage = st => if (st == "ingest") sys.error("killed"))
      }
      assert(boom.getMessage === "killed")
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder) ===
        Some("admit"))
      // resume: the feeds must NOT be re-evaluated — poison thunks
      def poison: DataFrame = sys.error("feed re-evaluated on resume")
      val out = loop.runNight(spark, "2026-08-14", m,
        poison, poison, poison)
      assert(packRows(out) === golden,
        "resumed corpus must be byte-identical to the uninterrupted run")
      // crawl/ingest each committed exactly once (no recompute)
      val events = m.log().groupBy("stage").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(events === NightlyLoop.StageOrder.map(_ -> 1L).toMap)
      // version gate: a changed pipeline version refuses to resume
      intercept[PipelineVersionError] {
        loop.copy(version = "v99").runNight(spark, "2026-08-14", m,
          poison, poison, poison)
      }
    } finally dropStore("nl_store_kr")
  }

  test("v4 scrub: PII redacted and boilerplate paragraphs deduped " +
      "BEFORE anything publishes; empty-after-scrub docs drop; kill " +
      "at scrub resumes; disabled passes are identity") {
    val boiler = "subscribe to our newsletter for daily updates today"
    def warcSc: DataFrame = Seq(
      (1L, warcResponse("https://h1.example/s1", "200 OK",
        "contact us at admin@example.com or 10.0.0.1 for support" +
          s"\n\n$boiler\n\nunique alpha body content entirely its own")),
      (2L, warcResponse("https://h1.example/s2", "200 OK",
        s"$boiler\n\nwholly different beta body content on its own")),
      // this doc IS the boilerplate — scrubbed to empty, must vanish
      (3L, warcResponse("https://h2.example/s3", "200 OK", boiler)))
      .map { case (i, s) => (i, s.getBytes("UTF-8")) }
      .toDF("warc_id", "payload")
    val root = tmp()
    freshStore("nl_store_sc")
    try {
      val loop = NightlyLoop(root, "nl_store_sc")
      val m = new Manifest(spark, s"$root/_manifest")
      // kill right after scrub commits, then resume with poison feeds
      val boom = intercept[RuntimeException] {
        loop.runNight(spark, "2026-08-14", m, candidates, rules, warcSc,
          afterStage = st => if (st == "scrub") sys.error("killed"))
      }
      assert(boom.getMessage === "killed")
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder) ===
        Some("pack"))
      def poison: DataFrame = sys.error("feed re-evaluated on resume")
      loop.runNight(spark, "2026-08-14", m, poison, poison, poison)
      val scrub = spark.read
        .parquet(loop.stageDir("scrub", "2026-08-14"))
      val byId = scrub.collect().map(r =>
        r.getAs[String]("id") -> r).toMap
      // the all-boilerplate doc scrubbed to empty and dropped
      assert(byId.keySet ===
        Set("https://h1.example/s1", "https://h1.example/s2"))
      val s1 = byId("https://h1.example/s1")
      val s2 = byId("https://h1.example/s2")
      // PII gone, typed placeholders + counters in
      assert(!s1.getAs[String]("text").contains("admin@example.com"))
      assert(s1.getAs[String]("text").contains("<EMAIL>") &&
        s1.getAs[String]("text").contains("<IP>"))
      assert(s1.getAs[Long]("n_emails") === 1L &&
        s1.getAs[Long]("n_ipv4") === 1L)
      // boilerplate kept at its FIRST occurrence only (lowest id)
      assert(s1.getAs[String]("text").contains(boiler))
      assert(!s2.getAs[String]("text").contains(boiler))
      assert(s2.getAs[String]("text") ===
        "wholly different beta body content on its own")
      assert(s2.getAs[Long]("n_paras") === 2L &&
        s2.getAs[Long]("n_kept") === 1L)
      // nothing the loop PUBLISHES carries raw PII or a second
      // boilerplate copy: packs are built from scrubbed text
      val packs = packRows(spark.read
        .parquet(loop.stageDir("pack", "2026-08-14")))
      assert(!packs.exists(_._3.contains("admin@example.com")))
      assert(packs.count(_._3.contains(boiler)) === 1)
      assert(!packs.exists(_._3.contains(
        "subscribe to our newsletter for daily updates today" +
          "\n\nwholly different")))
      // split (and so shard/release/provenance) cover exactly the
      // scrub survivors
      val split = spark.read
        .parquet(loop.stageDir("split", "2026-08-14"))
      assert(split.select("id").as[String].collect().sorted.toSeq ===
        byId.keySet.toSeq.sorted)
      // the full v4 stage list recorded exactly once
      val events = m.log().groupBy("stage").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(events === NightlyLoop.StageOrder.map(_ -> 1L).toMap)
      assert(NightlyLoop.StageOrder.contains("scrub"))
    } finally dropStore("nl_store_sc")
    // disabled passes: the scrub stage is an identity with zeroed /
    // structural counters — output text equals admit text
    val root2 = tmp()
    freshStore("nl_store_sc2")
    try {
      val loop2 = NightlyLoop(root2, "nl_store_sc2",
        scrubPii = false, scrubParagraphDedup = false)
      val m2 = new Manifest(spark, s"$root2/_manifest")
      loop2.runNight(spark, "2026-08-14", m2, candidates, rules, warcSc)
      val admitTxt = spark.read
        .parquet(loop2.stageDir("admit", "2026-08-14"))
        .select("id", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val scrubTxt = spark.read
        .parquet(loop2.stageDir("scrub", "2026-08-14"))
        .collect().map(r => r.getAs[String]("id") ->
          ((r.getAs[String]("text"), r.getAs[Long]("n_emails"),
            r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept")))).toMap
      assert(scrubTxt.keySet === admitTxt.keySet)
      scrubTxt.foreach { case (id, (txt, ne, np, nk)) =>
        assert(txt === admitTxt(id), id)
        assert(ne === 0L)
        assert(np === nk)
      }
    } finally dropStore("nl_store_sc2")
  }

  test("selfNearDedup: intra-night NEAR-copies resolve to one representative (longest text)") {
    val root = tmp()
    freshStore("nl_store_nd")
    try {
      val base = (1 to 30).map(i => s"near$i").mkString(" ")
      // two near-identical pages fetched the same night (one trailing
      // token apart — invisible to the exact tier AND the store
      // probe), plus one unrelated doc
      val warcNd = Seq(
        (1L, warcResponse("https://h1.example/a", "200 OK", base)),
        (2L, warcResponse("https://h1.example/b", "200 OK",
          base + " extratail")),
        (3L, warcResponse("https://h2.example/c", "200 OK",
          "wholly unrelated third document body standing apart here")))
        .map { case (i, s) => (i, s.getBytes("UTF-8")) }
        .toDF("warc_id", "payload")
      val cand = Seq("https://h1.example/a", "https://h1.example/b",
        "https://h2.example/c").toDF("url")
      val loop = NightlyLoop(root, "nl_store_nd", selfNearDedup = true)
      val m = new Manifest(spark, s"$root/_manifest")
      loop.runNight(spark, "2026-08-15", m, cand, rules, warcNd)
      val admitted = spark.read
        .parquet(loop.stageDir("admit", "2026-08-15"))
        .select("id").as[String].collect().sorted.toSeq
      // the LONGER near-twin (/b) wins its cluster; /c is a singleton
      assert(admitted ===
        Seq("https://h1.example/b", "https://h2.example/c"), admitted)
    } finally dropStore("nl_store_nd")
  }

  test("intra-night dedup: whitespace-variant dups share the store's trimmed hash notion; duplicate ids collapse deterministically to the longest body") {
    val root = tmp()
    freshStore("nl_store_tw")
    try {
      // /w1 and /w2 differ only by trailing SPACES (the exact class
      // SQL trim covers) — the store's exact tier hashes
      // sha2(trim(text)), so the intra-night tier must use the same
      // notion or both reach the packs; /w3 appears twice (a
      // re-fetch) with different bodies — the longer must win on
      // EVERY run, not whichever partition's row arrives first
      val wsWarc = Seq(
        (1L, warcResponse("https://h2.example/w1", "200 OK",
          "gamma corpus page body one")),
        (2L, warcResponse("https://h2.example/w2", "200 OK",
          "gamma corpus page body one   ")),
        (3L, warcResponse("https://h2.example/w3", "200 OK",
          "delta refetch body")),
        (4L, warcResponse("https://h2.example/w3", "200 OK",
          "delta refetch body grown longer after the server change")))
        .map { case (i, s) => (i, s.getBytes("UTF-8")) }
        .toDF("warc_id", "payload")
      val loop = NightlyLoop(root, "nl_store_tw")
      val m = new Manifest(spark, s"$root/_manifest")
      loop.runNight(spark, "2026-08-14", m, candidates, rules, wsWarc)
      val admitted = spark.read
        .parquet(loop.stageDir("admit", "2026-08-14"))
        .select("id", "text").as[(String, String)].collect()
        .sortBy(_._1).toSeq
      assert(admitted.map(_._1) ===
        Seq("https://h2.example/w1", "https://h2.example/w3"), admitted)
      assert(admitted(1)._2 ===
        "delta refetch body grown longer after the server change")
    } finally dropStore("nl_store_tw")
  }

  test("two loops sharing one manifest: resume state is scoped per pipeline name") {
    val root = tmp()
    freshStore("nl_store_sc")
    try {
      val m = new Manifest(spark, s"$root/_manifest")
      val loopA = NightlyLoop(root, "nl_store_sc")
      loopA.runNight(spark, "2026-08-14", m, candidates, rules, warc)
      // a SECOND loop (different name, same manifest + night) must
      // not read loop A's completions as its own: it runs ALL its
      // stages — its feeds ARE evaluated (poison thunks would throw).
      // Its own store, or A's append would dedup B's whole batch.
      freshStore("nl_store_sc2")
      val loopB = NightlyLoop(root, "nl_store_sc2", name = "backfill")
      val out = loopB.runNight(spark, "2026-08-14", m,
        candidates, rules, warc)
      assert(packRows(out).nonEmpty)
      // both pipelines recorded the full stage list, under their own
      // names (count derived from StageOrder — never hardcode it)
      val byPipeline = m.log().groupBy("pipeline").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byPipeline === Map(
        "nightly" -> NightlyLoop.StageOrder.size.toLong,
        "backfill" -> NightlyLoop.StageOrder.size.toLong))
      // and B's interchange landed under its own name-scoped dirs
      assert(spark.read.parquet(loopB.stageDir("ingest", "2026-08-14"))
        .count() > 0)
      // the SHADOWING direction: B's newer events for the same
      // (pkey, stage) must not hide A's (latest-wins must partition
      // by pipeline too) — a re-invoked A sees all five of its own
      // stages done and resumes as a no-op (poison feeds prove no
      // stage re-runs; a shadowed A would restart from crawl, admit
      // against a store that already holds tonight's docs, and
      // overwrite its committed packs with empty output).
      assert(m.versionOf("2026-08-14", Some("nightly")).nonEmpty)
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder,
        Some("nightly")) === None)
      def poison: DataFrame = sys.error("feed re-evaluated on resume")
      val outA = loopA.runNight(spark, "2026-08-14", m,
        poison, poison, poison)
      assert(packRows(outA).nonEmpty)
      // compact(keepHistory = false) keeps BOTH pipelines' snapshots
      m.compact(keepHistory = false)
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder,
        Some("nightly")) === None)
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder,
        Some("backfill")) === None)
    } finally {
      dropStore("nl_store_sc")
      dropStore("nl_store_sc2")
    }
  }

  test("kill inside append's write-then-record gap: replay is idempotent, store holds no duplicates") {
    val root = tmp()
    freshStore("nl_store_ap")
    try {
      val loop = NightlyLoop(root, "nl_store_ap")
      val m = new Manifest(spark, s"$root/_manifest")
      val boom = intercept[RuntimeException] {
        loop.runNight(spark, "2026-08-14", m, candidates, rules, warc,
          beforeRecord = st => if (st == "append") sys.error("killed"))
      }
      assert(boom.getMessage === "killed")
      // the store WAS mutated (append ran before the record) — the
      // crash window the idempotent anti-join design exists for
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder) ===
        Some("append"))
      val hashesAfterCrash =
        Dedup.readSignatureStore(spark, "nl_store_ap").hashes.count()
      def poison: DataFrame = sys.error("feed re-evaluated on resume")
      val out = loop.runNight(spark, "2026-08-14", m,
        poison, poison, poison)
      // replayed append added NOTHING the crashed one already wrote
      val hashesAfterReplay =
        Dedup.readSignatureStore(spark, "nl_store_ap").hashes.count()
      assert(hashesAfterReplay === hashesAfterCrash,
        "append replay must be a no-op on already-appended content")
      assert(packRows(out).nonEmpty)
    } finally dropStore("nl_store_ap")
  }

  test("quality gate: a failing night never mutates the store; fixed config resumes AT the gate") {
    val root = tmp()
    freshStore("nl_store_gt")
    try {
      // min_docs set above what the night admits -> the gate refuses
      val strict = NightlyLoop(root, "nl_store_gt", minDocs = 100L)
      val m = new Manifest(spark, s"$root/_manifest")
      val boom = intercept[IllegalStateException] {
        strict.runNight(spark, "2026-08-14", m, candidates, rules, warc)
      }
      assert(boom.getMessage.contains("min_docs"), boom.getMessage)
      // the store was NEVER touched beyond its seeded corpus row —
      // the gate sits before append
      val seeded = 1L // freshStore plants one corpus doc
      assert(Dedup.readSignatureStore(spark, "nl_store_gt")
        .hashes.count() === seeded)
      assert(m.nextStage("2026-08-14", NightlyLoop.StageOrder) ===
        Some("gate"))
      // fixed threshold: resume runs gate -> append -> pack without
      // re-evaluating any feed (crawl/ingest/admit stay committed)
      def poison: DataFrame = sys.error("feed re-evaluated on resume")
      val out = strict.copy(minDocs = 1L).runNight(spark, "2026-08-14",
        m, poison, poison, poison)
      assert(packRows(out).nonEmpty)
      assert(Dedup.readSignatureStore(spark, "nl_store_gt")
        .hashes.count() > seeded)
      // the committed gate report is an audit artifact
      val report = spark.read.parquet(strict.stageDir("gate", "2026-08-14"))
        .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
      assert(report.values.forall(identity), report)
      assert(report.keySet ===
        Set("id_not_null", "text_not_empty", "min_docs", "unique_id"))
    } finally dropStore("nl_store_gt")
  }

  test("v5 ship: night 1 bases the chain, later nights ship " +
      "night-sized deltas; chain ≡ live store; kill-in-gap resume " +
      "reuses the export; torn ship re-runs clean; compaction " +
      "re-bases in a new epoch") {
    val root = tmp()
    freshStore("nl_store_sh")
    // per-night DISTINCT bodies: shared tokens across nights would be
    // near-dup candidates and the admit stage would drop the night
    def warcN(n: Int): DataFrame = Seq(
      (1L, warcResponse(s"https://h1.example/a$n", "200 OK",
        s"unique body a$n " +
          Seq.tabulate(8)(i => s"tok${n}a$i").mkString(" "))),
      (2L, warcResponse(s"https://h2.example/b$n", "200 OK",
        s"unique body b$n " +
          Seq.tabulate(8)(i => s"tok${n}b$i").mkString(" "))))
      .map { case (i, s) => (i, s.getBytes("UTF-8")) }
      .toDF("warc_id", "payload")
    try {
      val loop = NightlyLoop(root, "nl_store_sh")
      val m = new Manifest(spark, s"$root/_manifest")
      def receipt(night: String) =
        spark.read.parquet(loop.stageDir("ship", night)).head()
      def chainEntries(): Seq[String] = {
        val p = new org.apache.hadoop.fs.Path(loop.shipChainRoot)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(p)) fs.listStatus(p).map(_.getPath.getName)
          .sorted.toSeq
        else Seq.empty
      }

      // night 1: no chain yet -> a full base snapshot opens epoch 1
      loop.runNight(spark, "2026-08-14", m, candidates, rules, warcN(1))
      val r1 = receipt("2026-08-14")
      assert(r1.getAs[String]("ship_kind") === "base")
      assert(r1.getAs[String]("export_dir").contains("e0001_base"))
      assert(r1.getAs[String]("release_dir") ===
        loop.stageDir("release", "2026-08-14"))

      // night 2: a delta sized to the NIGHT (2 docs), not the corpus
      loop.runNight(spark, "2026-08-15", m, candidates, rules, warcN(2))
      val r2 = receipt("2026-08-15")
      assert(r2.getAs[String]("ship_kind") === "delta")
      assert(r2.getAs[String]("export_dir").contains("e0001_d00001"))
      assert(spark.read
        .parquet(s"${r2.getAs[String]("export_dir")}/hashes")
        .count() === 2L)
      // base + delta ≡ the live store at the head
      val chain = Dedup.readExportedSignatureStoreChain(spark,
        Seq(r1.getAs[String]("export_dir"),
          r2.getAs[String]("export_dir")))
      def hashSet(df: DataFrame): Seq[String] = df
        .select("content_hash").collect().map(_.getString(0))
        .sorted.toSeq
      assert(hashSet(chain.hashes) === hashSet(
        Dedup.readSignatureStore(spark, "nl_store_sh").hashes))

      // night 3 killed in ship's write-then-record gap: the export
      // completed, the manifest never recorded — resume must REUSE
      // the completed entry, not duplicate it
      val boom = intercept[RuntimeException] {
        loop.runNight(spark, "2026-08-16", m, candidates, rules,
          warcN(3),
          beforeRecord = st => if (st == "ship") sys.error("kill@ship"))
      }
      assert(boom.getMessage === "kill@ship")
      assert(m.nextStage("2026-08-16", NightlyLoop.StageOrder) ===
        Some("ship"))
      def poison: DataFrame = sys.error("feed re-evaluated on resume")
      loop.runNight(spark, "2026-08-16", m, poison, poison, poison)
      assert(chainEntries().count(_.endsWith("_2026-08-16")) === 1)
      assert(receipt("2026-08-16").getAs[String]("ship_kind") ===
        "delta")

      // night 4 torn mid-export (an append lands inside the fence
      // window): fails by name, the partial delta is DELETED; the
      // re-run ships clean and its delta carries the night AND the
      // interloper
      var torn = false
      val loopT = loop.copy(shipMidExportHook = () => if (!torn) {
        torn = true
        Dedup.appendToSignatureStore(
          Seq(("interloper:1",
            "interloping append lands inside the export window"))
            .toDF("id", "text"), "id", "text", "nl_store_sh")
      })
      val eTorn = intercept[IllegalStateException] {
        loopT.runNight(spark, "2026-08-17", m, candidates, rules,
          warcN(4))
      }
      assert(eTorn.getMessage.contains("changed while exporting"),
        eTorn.getMessage)
      assert(!chainEntries().exists(_.endsWith("_2026-08-17")))
      loopT.runNight(spark, "2026-08-17", m, poison, poison, poison)
      val r4 = receipt("2026-08-17")
      assert(r4.getAs[String]("ship_kind") === "delta")
      assert(spark.read
        .parquet(s"${r4.getAs[String]("export_dir")}/hashes")
        .count() === 3L) // 2 night docs + the interloper

      // store MAINTENANCE between nights bumps the version a delta
      // cannot express: ship re-bases automatically in a NEW epoch...
      Dedup.compactSignatureStore(spark, "nl_store_sh")
      loop.runNight(spark, "2026-08-18", m, candidates, rules, warcN(5))
      val r5 = receipt("2026-08-18")
      assert(r5.getAs[String]("ship_kind") === "base")
      assert(r5.getAs[String]("export_dir").contains("e0002_base"))
      assert(r5.getAs[Int]("store_version") === 2)
      // ...and the next night extends the new epoch with a delta
      loop.runNight(spark, "2026-08-19", m, candidates, rules, warcN(6))
      val r6 = receipt("2026-08-19")
      assert(r6.getAs[String]("ship_kind") === "delta")
      assert(r6.getAs[String]("export_dir").contains("e0002_d00001"))
      // the new-epoch chain replays to the live store, too
      assert(hashSet(Dedup.readExportedSignatureStoreChain(spark,
        Seq(r5.getAs[String]("export_dir"),
          r6.getAs[String]("export_dir"))).hashes) ===
        hashSet(Dedup.readSignatureStore(spark, "nl_store_sh").hashes))
    } finally dropStore("nl_store_sh")
  }
}
