package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Times every SparkEntry query at the SF directory given by
  * SPARK_GRAFT_SF_DIR, forcing FULL evaluation of every output column via the
  * `noop` sink (a bare `count()` lets Catalyst eliminate projections/sorts, so
  * scalar-function queries would time as scan-only).
  *
  * Before the timed pass, each query runs once untimed at a small warmup SF
  * (SPARK_GRAFT_WARMUP_DIR, default sf0.001) so per-query codegen/JIT is warm
  * and an n=1 driver run measures steady state.
  *
  * Output: the FULL JSON `{"metric":"total",...}` (per-query seconds,
  * shuffle MB, per-query errors) is written to /tmp/graft_bench.json and
  * ./BENCH_FULL.json. The final stdout line is the full JSON when it fits a
  * 2000-char tail window, else a COMPACT JSON line (total, query/error
  * counts, path to the full file) — the driver tails stdout into a bounded
  * buffer, and a 5+ KB single line can never parse from its tail.
  *
  * Integrity: per-query failures are NOT swallowed — a query that throws
  * records its error message in the `errors` map (warmup errors count too:
  * a query that only breaks at the timed SF still surfaces). A bench whose
  * total went DOWN because queries crashed is indistinguishable from a
  * speedup unless errors are first-class in the artifact.
  *
  * Stall hardening (r12): this host has documented multi-minute IO-stall
  * bands, and the two timed passes of one query run far enough apart
  * (~minutes of other queries between them) that a stall can span BOTH —
  * min-of-2 then ships the stall as a measurement (r11 shipped
  * q109_pagerank at 40.27 s on code whose same-day re-runs took 0.25-1.3 s,
  * +17% on the headline total). Two fixes: (1) per-pass times are
  * first-class in the artifact (`passes`), so a stall is VISIBLE instead of
  * silently folded into a min; (2) any query whose min-of-2 exceeds the
  * [[BenchRetry.shouldRetry]] threshold against its prior per-query figure
  * (the min across committed BENCH_FULL.json — SPARK_GRAFT_PRIOR_BENCH
  * overrides the path — and the rolling-min BENCH_PRIOR.json, which a
  * stalled run can never poison upward) gets ONE targeted third pass at the
  * end of the second sweep — minutes away from the two passes that
  * straddled the stall, so it samples a different host window. Retried
  * query names ship in the artifact (`retried`).
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Force full evaluation by consuming the executed plan's RDD, then
    * read the plan's shuffle-write metric accumulators — per-query
    * shuffle volume is the number the 100 TB posture hangs on, so the
    * bench reports it next to wall time. (The noop sink evaluates just
    * as fully but hides its QueryExecution, so the metrics would be
    * unreachable.) */
  private def forceAndMeasureShuffle(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val qe = df.queryExecution
    qe.executedPlan.execute().foreachPartition(
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
        it.foreach(_ => ()))
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def sumShuffle(p: SparkPlan): Long = {
      // ReusedExchangeExec points back at an exchange that is also
      // reachable through its original parent — count each node once
      if (!seen.add(p)) return 0L
      val own = p.metrics.collect {
        case (k, m) if k == "shuffleBytesWritten"
          || m.name.exists(_.contains("shuffle bytes written")) => m.value
      }.sum
      // AQE wraps materialized stages in QueryStageExec whose
      // `children` is EMPTY — descend through the wrapped plan, or the
      // walk sees no exchange at all
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case other => other.children
      }
      own + kids.map(sumShuffle).sum
    }
    sumShuffle(qe.executedPlan)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-iteration subset (the driver never sets it): comma-separated
    // query names; A/B a targeted change without the full 200+ sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.Map[String, String]()
    def recordError(name: String, t: Throwable): Unit = {
      val msg = (s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}")
        .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
      // first error wins — a warmup failure isn't masked by a timed retry
      if (!errors.contains(name)) errors(name) = msg
    }
    // Untimed warmup: full pipeline per query at tiny SF so JVM + whole-stage
    // codegen + shuffle machinery are initialized before the timed pass.
    if (Files.isDirectory(Paths.get(warmDir))) {
      names.foreach { case (name, fn) =>
        try force(fn(spark, warmDir)) catch {
          case t: Throwable => recordError(name, t)
        }
      }
    }
    // two timed passes, per-query minimum: the driver measures n=1, and
    // single-run numbers at this scale carry ±15% JIT/GC/OS noise — the
    // min of two runs is the steady-state figure the plan actually earns
    val shuffleBytes = scala.collection.mutable.Map[String, Long]()
    def timedOne(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try shuffleBytes(name) = forceAndMeasureShuffle(fn(spark, sfDir))
      catch { case t: Throwable => recordError(name, t) }
      (System.nanoTime() - t0) / 1e9
    }
    def timedPass(): Map[String, Double] =
      names.map { case (name, fn) => name -> timedOne(name, fn) }.toMap
    val p1 = timedPass()
    val p2 = timedPass()
    // targeted third pass: a min-of-2 far above the prior figure is
    // more likely a host stall spanning both passes than a 3×+
    // regression of untouched code — re-measure it here (a different
    // host window than the two sweeps that straddled the stall) and
    // let the min (and the visible per-pass list) decide. A real
    // regression survives the third pass.
    val prior = BenchRetry.loadPrior()
    val passes = scala.collection.mutable.Map[String, List[Double]]()
    names.foreach { case (name, _) =>
      passes(name) = List(p1(name), p2(name))
    }
    val retried = names.filter { case (name, fn) =>
      val retry = !errors.contains(name) &&
        BenchRetry.shouldRetry(passes(name).min, prior.get(name))
      if (retry) passes(name) = passes(name) :+ timedOne(name, fn)
      retry
    }.map(_._1)
    val results = passes.map { case (k, vs) => k -> vs.min }.toMap
    // Only a FULL sweep updates the committed artifacts: a
    // SPARK_GRAFT_ONLY dev subset runs hot (fewer queries competing for
    // the JIT/GC budget) and an unrepresentatively fast figure would
    // permanently lower the rolling-min prior — a min only moves down —
    // making that query pay a spurious third pass on every future full
    // run. Dev runs still get /tmp/graft_bench.json below.
    val fullSweep = only.isEmpty
    if (fullSweep) BenchRetry.savePrior(results)
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val passJson = passes.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"\"" + k + "\":" + vs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val retriedJson = retried.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val sh = results.keys.toSeq.sorted.map { k =>
      s"\"" + k + "\":" + (shuffleBytes.getOrElse(k, 0L) / 1048576.0)
    }.mkString("{", ",", "}")
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val fullPath = "/tmp/graft_bench.json"
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"retried":$retriedJson,"shuffle_mb":$sh,"errors":$errJson,"sf":"$sfDir"}"""
    // BENCH_FULL.json is a committed artifact — dev subsets must not
    // overwrite it (same poisoning vector as the prior above)
    // r16 (additions-only): ALSO write the identical full JSON at a
    // CORE-COUNT-SCOPED path. At 237 queries the full JSON never fits
    // the driver's bounded stdout tail, and every full sweep —
    // including the driver's own lower-core scaling run — overwrites
    // BENCH_FULL.json, so the r15 PERF per-query/scaling comparison
    // came back empty. The scoped copies survive side by side
    // (BENCH_FULL_c32.json vs BENCH_FULL_c8.json) and the compact
    // stdout line points at the /tmp copy (`per_query_json`), so
    // per-query data is always recoverable from a totals-only capture.
    val scopedPath = s"/tmp/graft_bench_c$cpus.json"
    val outPaths =
      if (fullSweep)
        Seq(fullPath, scopedPath, "BENCH_FULL.json", s"BENCH_FULL_c$cpus.json")
      else Seq(fullPath, scopedPath)
    outPaths.foreach { p =>
      try Files.write(Paths.get(p), (json + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    }
    // Compact summary that survives ANY stdout tail window; same schema
    // contract (metric/value/unit/sf) plus integrity counts + pointer.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"full_json":"$fullPath","per_query_json":"$scopedPath","cpus":$cpus,"sf":"$sfDir"}"""
    spark.stop()
    // Printed after spark.stop so no executor log lines follow it. The
    // final line must parse from a 2000-char tail: print the full JSON
    // only when it fits, else the compact form (full file always written).
    if (json.length <= 1800) println(json) else println(compact)
  }
}

/** The bench's stall-retry rule and prior-figure loader, factored out
  * of the main so the rule is unit-testable with a planted stall
  * (BenchRetrySpec) — the r11 artifact shipped a 25× host-stall
  * figure precisely because no code path could question a min-of-2.
  */
object BenchRetry {

  /** A third targeted pass is warranted when the min-of-2 exceeds 3×
    * the prior committed figure AND the excess is over 1 second —
    * the absolute floor keeps sub-second queries from re-running on
    * ordinary jitter (0.02 s → 0.07 s is 3.5× and meaningless), while
    * any genuine stall is seconds by definition. No prior figure
    * (new query, first round, missing artifact) → never retry: there
    * is nothing to contradict. */
  def shouldRetry(minSec: Double, prior: Option[Double]): Boolean =
    prior.exists(p => minSec > 3.0 * p && minSec - p > 1.0)

  /** Extract the per-query seconds map from a committed bench
    * artifact: the flat `"queries":{"name":sec,...}` object. No JSON
    * library on purpose (names are \w+ and values plain doubles —
    * both by construction of the writer above); returns empty on any
    * malformed input rather than failing the bench. */
  def parseQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) return Map.empty
    val open = start + "\"queries\":".length
    val close = json.indexOf('}', open)
    if (close < 0) return Map.empty
    val body = json.substring(open + 1, close).trim
    if (body.isEmpty) return Map.empty
    body.split(",").iterator.flatMap { kv =>
      kv.split(":", 2) match {
        case Array(k, v) =>
          val name = k.trim.stripPrefix("\"").stripSuffix("\"")
          v.trim.toDoubleOption.map(name -> _)
        case _ => None
      }
    }.toMap
  }

  /** The prior per-query figures the retry rule compares against:
    * the per-query MIN across `BENCH_FULL.json` (the committed full
    * artifact — the driver's `BENCH_r{N}.json` wraps only the compact
    * stdout line, which has no per-query map; SPARK_GRAFT_PRIOR_BENCH
    * overrides the path) and the rolling-min `BENCH_PRIOR.json` this
    * bench maintains via [[savePrior]]. The rolling min is the
    * anti-self-poisoning half: BENCH_FULL.json is OVERWRITTEN by
    * every run, so a stall that ships in run 1 would otherwise become
    * run 2's "prior" and a repeat stall would never trip the rule —
    * a min can only move DOWN, so a stalled figure can never raise
    * the bar, while a lucky fast outlier at worst buys one cheap
    * extra pass. Missing/unreadable → empty map (no retries), never
    * an error. */
  def loadPrior(dir: java.nio.file.Path = java.nio.file.Paths.get(".")): Map[String, Double] = {
    def read(p: java.nio.file.Path): Map[String, Double] =
      try parseQueries(new String(
        java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => Map.empty }
    val full = read(sys.env.get("SPARK_GRAFT_PRIOR_BENCH")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(dir.resolve("BENCH_FULL.json")))
    val rolling = read(dir.resolve("BENCH_PRIOR.json"))
    (full.keySet ++ rolling.keySet).iterator.map { k =>
      k -> math.min(full.getOrElse(k, Double.MaxValue),
        rolling.getOrElse(k, Double.MaxValue))
    }.toMap
  }

  /** Fold this run's per-query minimums into the rolling-min
    * `BENCH_PRIOR.json` (see [[loadPrior]]). Write errors are
    * swallowed — the prior file is a guard input, never a gate. */
  def savePrior(results: Map[String, Double],
      dir: java.nio.file.Path = java.nio.file.Paths.get(".")): Unit = {
    val prior = try parseQueries(new String(
      java.nio.file.Files.readAllBytes(dir.resolve("BENCH_PRIOR.json")),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => Map.empty[String, Double] }
    val merged = (prior.keySet ++ results.keySet).toSeq.sorted.map { k =>
      k -> math.min(prior.getOrElse(k, Double.MaxValue),
        results.getOrElse(k, Double.MaxValue))
    }
    val qs = merged.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    try java.nio.file.Files.write(dir.resolve("BENCH_PRIOR.json"),
      (s"""{"queries":$qs}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
  }
}
