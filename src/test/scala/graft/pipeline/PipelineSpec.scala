package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.{functions => F}

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-pipe").toString

  private val extract = Stage("extract", identity)
  private val transform = Stage("transform",
    df => df.select(col("id"), F.uppercase(col("v")).as("v")),
    post = Seq(df => df.filter(col("id") > 0))) // post-hook row drop (E1)

  test("consecutive-stage validation (pipeline.py:108-118)") {
    Pipeline("p", Seq(extract, transform), tmp()) // ok
    Pipeline("loadonly", Seq(Stage("load", identity)), tmp()) // load-only ok
    val e = intercept[PipelineDeclarationError] {
      Pipeline("bad", Seq(Stage("extract", identity), Stage("load", identity)), tmp())
    }
    assert(e.getMessage.contains("consecutive"))
    intercept[PipelineDeclarationError] {
      Pipeline("bad2", Seq(Stage("weird", identity)), tmp())
    }
  }

  test("run: stage chain writes interchange files + manifest per commit") {
    val root = tmp()
    val p = Pipeline("users", Seq(extract, transform), root)
    val m = new Manifest(spark, s"$root/_manifest")
    val in = Seq((0L, "drop"), (1L, "ada"), (2L, "alan")).toDF("id", "v")

    val out = p.run(spark, in, pkey = "file1", manifest = Some(m))
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq === Seq("ADA", "ALAN"))
    // interchange files exist per stage (inspectability, §3.3)
    assert(spark.read.parquet(p.stageDir("extract", "file1")).count() === 3)
    assert(spark.read.parquet(p.stageDir("transform", "file1")).count() === 2)
    // manifest recorded both stages
    assert(m.nextStage("file1", Seq("extract", "transform")) === None)
    val flags = m.stageFlags(Seq("extract", "transform")).collect()(0)
    assert(flags.getAs[Boolean]("extract_done") && flags.getAs[Boolean]("transform_done"))
  }

  test("advance resumes from first incomplete stage (§3.3 recovery)") {
    val root = tmp()
    val p = Pipeline("users", Seq(extract, transform), root)
    val m = new Manifest(spark, s"$root/_manifest")
    val in = Seq((1L, "ada")).toDF("id", "v")

    // simulate a crash after extract: run only extract, record it
    val extracted = extract(in)
    extracted.write.mode("overwrite").parquet(p.stageDir("extract", "f2"))
    m.markDone("f2", "users", "extract", p.stageDir("extract", "f2"))
    assert(m.nextStage("f2", Seq("extract", "transform")) === Some("transform"))

    val resumed = p.advance(spark, "f2", m)
    assert(resumed.isDefined)
    assert(resumed.get.collect()(0).getString(1) === "ADA")
    assert(m.nextStage("f2", Seq("extract", "transform")) === None)
    assert(p.advance(spark, "f2", m) === None) // complete → nothing to do
  }

  test("full extract→transform→load with JDBC sink, replay-idempotent (B3-B5 + §3.3)") {
    val root = tmp()
    val url = "jdbc:derby:memory:graftpipe;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE TABLE users_out (id BIGINT, v VARCHAR(32))")
    conn.close()

    val load = Stage("load", { df =>
      graft.io.Sinks.jdbcUpsert(df, url, "users_out", Seq("id"))
      df
    })
    val p = Pipeline("users", Seq(extract, transform, load), root)
    val m = new Manifest(spark, s"$root/_manifest")
    val in = Seq((1L, "ada"), (2L, "alan")).toDF("id", "v")

    p.run(spark, in, "f3", Some(m))
    val props = new java.util.Properties()
    def table() = spark.read.jdbc(url, "users_out", props)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(table() === Seq((1L, "ADA"), (2L, "ALAN")))

    // crash-replay: re-advance from transform (simulating a lost load
    // commit) must not duplicate rows in the DB — the reference's
    // exactly-once answer is idempotent upsert + manifest booleans.
    p.run(spark, spark.read.parquet(p.stageDir("transform", "f3")), "f3",
      Some(m), from = Some("load"))
    assert(table() === Seq((1L, "ADA"), (2L, "ALAN")))
    assert(m.nextStage("f3", Seq("extract", "transform", "load")) === None)
  }

  test("stalled: incomplete objects surface for restart (tasks.py:22-29)") {
    val root = tmp()
    val m = new Manifest(spark, s"$root/_manifest")
    m.markDone("stuck", "users", "extract", "x")
    m.markDone("done", "users", "extract", "x")
    m.markDone("done", "users", "transform", "x")
    val stalled = m.stalled(Seq("extract", "transform"))
      .collect().map(_.getAs[String]("pkey")).toSeq
    assert(stalled === Seq("stuck"))
  }

  test("advance refuses a version-mismatched object (PipelineVersionError)") {
    val root = tmp()
    val m = new Manifest(spark, s"$root/_manifest")
    val pv1 = Pipeline("users", Seq(extract, transform), root, version = "hash-v1")
    val in = Seq((1L, "ada")).toDF("id", "v")
    extract(in).write.mode("overwrite").parquet(pv1.stageDir("extract", "f4"))
    m.markDone("f4", "users", "extract", pv1.stageDir("extract", "f4"), "hash-v1")

    val pv2 = pv1.copy(version = "hash-v2")
    val e = intercept[PipelineVersionError] { pv2.advance(spark, "f4", m) }
    assert(e.getMessage.contains("hash-v1"))
    assert(pv1.advance(spark, "f4", m).isDefined) // same version resumes fine
  }

  test("onCommit side-effects fire after commit, failures stay contained") {
    val root = tmp()
    val fired = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val st = Stage("extract", identity,
      onCommit = Seq(
        (pk, path) => fired += ((pk, path)),
        (_, _) => throw new RuntimeException("boom")))
    val p = Pipeline("cb", Seq(st), root)
    p.run(spark, Seq((1L, "x")).toDF("id", "v"), "f5")
    // hooks are ASYNC by design — await them or the assertion races
    // the background pool (observed flaky under host IO stalls)
    p.awaitCommitHooks()
    assert(fired.toSeq === Seq(("f5", p.stageDir("extract", "f5"))))
    // the failing hook did not abort the run; the stage file committed
    assert(spark.read.parquet(p.stageDir("extract", "f5")).count() === 1)
  }

  test("asyncPre fires before the stage without stalling or mutating it") {
    val root = tmp()
    val release = new java.util.concurrent.CountDownLatch(1)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val st = Stage("extract", identity,
      asyncPre = Seq(
        (pk, stage) => { seen.synchronized { seen += ((pk, stage)) }; release.await() },
        (_, _) => throw new RuntimeException("boom")))
    val p = Pipeline("apre", Seq(st), root)
    // the first pre-proc BLOCKS until released — run() must complete
    // anyway (fire-and-forget: the chain never awaits async pre-procs)
    val out = p.run(spark, Seq((1L, "x"), (2L, "y")).toDF("id", "v"), "f6")
    assert(out.count() === 2) // frame untouched by notification hooks
    release.countDown()
    p.awaitCommitHooks()
    assert(seen.synchronized(seen.toSeq) === Seq(("f6", "extract")))
    // the throwing pre-proc stayed contained; the stage file committed
    assert(spark.read.parquet(p.stageDir("extract", "f6")).count() === 2)
  }

  test("landing zone: admission rules + dated hashed layout (A1/A2)") {
    import graft.io.{Landing, LandingConfig, UploadRejectedException}
    val root = tmp()
    val src = java.nio.file.Files.createTempFile("users", ".jsonl")
    java.nio.file.Files.writeString(src, "{\"a\":1}\n")
    val landed = Landing.land(src, root, "users",
      now = java.time.Instant.parse("2024-03-05T10:00:00Z"))
    assert(landed.toString.contains("/users/2024/03/05/"))
    assert(landed.getFileName.toString.endsWith("_" + src.getFileName.toString.replaceAll("[^A-Za-z0-9._-]", "_")))
    intercept[UploadRejectedException] {
      Landing.land(src, root, "users", LandingConfig(acceptExtensions = Set("csv")))
    }
    intercept[UploadRejectedException] {
      Landing.land(src, root, "users", LandingConfig(active = false))
    }
    // ONLY the lowercased LAST extension gates (__init__.py:245): a
    // forbidden final extension cannot ride in behind an accepted one
    val exe = java.nio.file.Files.createTempFile("users", ".jsonl.exe")
    java.nio.file.Files.writeString(exe, "{\"a\":1}\n")
    intercept[UploadRejectedException] { Landing.land(exe, root, "users") }
    // ...and matching is case-insensitive, as the reference lowercases
    val up = java.nio.file.Files.createTempFile("users", ".CSV")
    java.nio.file.Files.writeString(up, "a\n1\n")
    Landing.land(up, root, "users",
      LandingConfig(acceptExtensions = Set("csv")))
    // ...in BOTH directions: an uppercase CONFIG entry must admit too
    // (the lowercased token can never match a verbatim "CSV" entry)
    Landing.land(up, root, "users",
      LandingConfig(acceptExtensions = Set("CSV")))
    // compressed uploads admit via their final "gz" token, as the
    // reference's accepted set does
    val gz = java.nio.file.Files.createTempFile("users", ".jsonl.gz")
    java.nio.file.Files.writeString(gz, "")
    Landing.land(gz, root, "users")
    // role gate (roles.py: readonly=1 < superuser=2 < admin=3)
    val gated = LandingConfig(requiredRole = 2)
    intercept[UploadRejectedException] {
      Landing.land(src, root, "users", gated, uploaderRole = Some(1))
    }
    Landing.land(src, root, "users", gated, uploaderRole = Some(2)) // ≥ is inclusive
    Landing.land(src, root, "users", gated, uploaderRole = Some(3))
    Landing.land(src, root, "users", gated) // roles-unimplemented: warn-and-allow
  }

  test("restartStalled advances incomplete objects, skips version-stale ones") {
    val root = tmp()
    val p = Pipeline("users", Seq(extract, transform), root, version = "v1")
    val m = new Manifest(spark, s"$root/_manifest")
    val in = Seq((1L, "ada"), (2L, "alan")).toDF("id", "v")
    // f1: complete; f2: extract only (stalled); f3: stalled under old version
    p.run(spark, in, "f1", Some(m))
    in.write.mode("overwrite").parquet(p.stageDir("extract", "f2"))
    m.markDone("f2", "users", "extract", p.stageDir("extract", "f2"), "v1")
    in.write.mode("overwrite").parquet(p.stageDir("extract", "f3"))
    m.markDone("f3", "users", "extract", p.stageDir("extract", "f3"), "v0")
    val advanced = p.restartStalled(spark, m)
    assert(advanced === Seq("f2")) // f1 complete, f3 version-stale → skipped
    assert(m.nextStage("f2", Seq("extract", "transform")) === None)
    assert(m.nextStage("f3", Seq("extract", "transform")) === Some("transform"))
  }

  test("restartStalled: one broken pkey does not abort the sweep") {
    val root = tmp()
    val p = Pipeline("users", Seq(extract, transform), root, version = "v1")
    val m = new Manifest(spark, s"$root/_manifest")
    val in = Seq((1L, "ada")).toDF("id", "v")
    // f0 sorts FIRST and is broken: only a LATER stage is recorded
    // (the legal from=Some(...) shape), so advance() throws
    // PipelineDeclarationError for it — f1, after it in the sweep,
    // must still restart
    m.markDone("f0", "users", "transform", s"$root/nowhere", "v1")
    in.write.mode("overwrite").parquet(p.stageDir("extract", "f1"))
    m.markDone("f1", "users", "extract", p.stageDir("extract", "f1"), "v1")
    val advanced = p.restartStalled(spark, m)
    assert(advanced === Seq("f1"))
    assert(m.nextStage("f1", Seq("extract", "transform")) === None)
  }

  test("stageFlags is pipeline-scoped: a shared manifest never reads " +
      "another pipeline's completions as its own") {
    val root = tmp()
    val m = new Manifest(spark, s"$root/_manifest")
    m.markDone("k1", "nightly", "extract", "/x", "v1")
    m.markDone("k1", "backfill", "transform", "/y", "v1")
    val nightly = m.stageFlags(Seq("extract", "transform"),
        Some("nightly")).collect()(0)
    assert(nightly.getAs[Boolean]("extract_done"))
    assert(!nightly.getAs[Boolean]("transform_done")) // backfill's, not ours
    val all = m.stageFlags(Seq("extract", "transform")).collect()(0)
    assert(all.getAs[Boolean]("transform_done")) // unscoped overview sees both
  }

  test("failOnEmpty: zero-row stage raises PipelineDataError, not recorded") {
    val root = tmp()
    val empties = Stage("transform", df => df.filter(col("id") < 0))
    val p = Pipeline("users", Seq(extract, empties), root, failOnEmpty = true)
    val m = new Manifest(spark, s"$root/_manifest")
    val in = Seq((1L, "ada")).toDF("id", "v")
    val e = intercept[PipelineDataError] {
      p.run(spark, in, pkey = "f9", manifest = Some(m))
    }
    assert(e.getMessage.contains("transform"))
    // extract committed, transform did NOT (resumable from transform)
    assert(m.nextStage("f9", Seq("extract", "transform")) === Some("transform"))
    // default (failOnEmpty = false) commits the empty stage as today
    val p2 = Pipeline("users2", Seq(extract, empties), tmp())
    assert(p2.run(spark, in, pkey = "f9").isEmpty)
  }

  test("onCommit hooks run off the hot path (broker .delay analog)") {
    val root = tmp()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fired = new java.util.concurrent.atomic.AtomicReference[String]("")
    val slowHook: (String, String) => Unit = (pk, dir) => {
      gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
      fired.set(s"$pk:$dir")
    }
    val st = Stage("extract", identity, onCommit = Seq(slowHook))
    val p = Pipeline("users", Seq(st), root)
    val in = Seq((1L, "ada")).toDF("id", "v")
    // run returns while the hook is still BLOCKED on the gate — inline
    // execution would deadlock-timeout here, so completion proves async
    p.run(spark, in, pkey = "f1")
    assert(fired.get() === "") // hook has not completed yet
    gate.countDown()
    p.awaitCommitHooks()
    assert(fired.get() === s"f1:${p.stageDir("extract", "f1")}")
  }

  test("manifest latest-wins on re-commit (tables.py upsert semantics)") {
    val root = tmp()
    val m = new Manifest(spark, s"$root/_manifest")
    m.markDone("k", "p", "extract", "path-v1")
    m.markDone("k", "p", "extract", "path-v2")
    val st = m.state().filter(col("pkey") === "k").collect()
    assert(st.length === 1)
    assert(st(0).getAs[String]("path") === "path-v2")
  }

  test("manifest compaction bounds the small-file log, preserves state") {
    val dir = s"${tmp()}/_manifest"
    def files(): Int = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // explicit compact: 8 commit files → 1, identical latest-wins state
    val m = new Manifest(spark, dir, autoCompactFiles = 0)
    (1 to 4).foreach(i => m.markDone(s"k$i", "p", "extract", s"path$i"))
    (1 to 4).foreach(i => m.markDone(s"k$i", "p", "extract", s"path$i-v2"))
    assert(files() === 8)
    val before = m.state().orderBy("pkey").collect().toSeq
    m.compact()
    assert(files() === 1)
    assert(m.state().orderBy("pkey").collect().toSeq === before)
    assert(m.log().count() === 8) // keepHistory default preserves the log
    m.compact(keepHistory = false)
    assert(m.log().count() === 4) // snapshot drops superseded events
    // auto-compaction: threshold 3 keeps the listing bounded
    val dir2 = s"${tmp()}/_manifest2"
    val m2 = new Manifest(spark, dir2, autoCompactFiles = 3)
    (1 to 10).foreach(i => m2.markDone(s"k$i", "p", "extract", s"path$i"))
    assert(new java.io.File(dir2).listFiles()
      .count(_.getName.endsWith(".parquet")) <= 4)
    assert(m2.state().count() === 10)
  }
}
