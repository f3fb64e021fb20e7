package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stall-retry rule, tested with the r11 incident planted:
  * q109_pagerank committed at 1.60 s in r10, then min-of-2 measured
  * 40.27 s on untouched code (a host IO stall spanning both timed
  * passes) and shipped as a figure. The rule must flag exactly that —
  * and NOT flag ordinary jitter, new queries, or real sub-3× drift.
  */
class BenchRetrySpec extends AnyFunSuite {

  test("shouldRetry: flags the planted r11 stall, not jitter or new queries") {
    // the r11 incident: prior 1.60, min-of-2 40.27 → retry
    assert(BenchRetry.shouldRetry(40.27, Some(1.60)))
    // a genuine 25× stall on a mid-sized query
    assert(BenchRetry.shouldRetry(9.09, Some(2.0)))
    // sub-second jitter: 3.5× prior but only 50 ms of excess — the
    // absolute floor keeps tiny queries from re-running on noise
    assert(!BenchRetry.shouldRetry(0.07, Some(0.02)))
    // real-but-moderate drift stays a measurement (< 3×)
    assert(!BenchRetry.shouldRetry(4.5, Some(1.6)))
    // boundary: exactly 3× does not retry (strict >)
    assert(!BenchRetry.shouldRetry(4.8, Some(1.6)))
    // just past both gates retries
    assert(BenchRetry.shouldRetry(4.81, Some(1.6)))
    // 3×+ but the excess is under a second → noise floor holds
    assert(!BenchRetry.shouldRetry(1.2, Some(0.3)))
    // no prior figure (new query / first round / missing artifact)
    assert(!BenchRetry.shouldRetry(40.0, None))
  }

  test("parseQueries: extracts the committed artifact's per-query map; malformed input → empty") {
    val json = """{"metric":"total","value":272.8,"unit":"sec","queries":{"q01_file_reader":0.5,"q109_pagerank":40.27021,"q97_dedup_resolve":3.71},"shuffle_mb":{"q01_file_reader":0.0},"sf":"/root/testdata/sf0.1"}"""
    val m = BenchRetry.parseQueries(json)
    assert(m === Map("q01_file_reader" -> 0.5,
      "q109_pagerank" -> 40.27021, "q97_dedup_resolve" -> 3.71))
    assert(BenchRetry.parseQueries("{}") === Map.empty)
    assert(BenchRetry.parseQueries("""{"queries":{}}""") === Map.empty)
    assert(BenchRetry.parseQueries("not json at all") === Map.empty)
  }

  test("parseQueries round-trips the real committed full artifact when present") {
    val p = java.nio.file.Paths.get("BENCH_FULL.json")
    assume(java.nio.file.Files.isReadable(p))
    val m = BenchRetry.parseQueries(new String(
      java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(m.size >= 200, s"expected 214+ queries, got ${m.size}")
    assert(m.values.forall(v => v >= 0.0 && v < 3600.0))
  }

  test("loadPrior: reads the committed full artifact; missing dir → empty, no error") {
    val dir = java.nio.file.Files.createTempDirectory("benchretry")
    java.nio.file.Files.write(dir.resolve("BENCH_FULL.json"),
      """{"metric":"total","queries":{"qa":10.0,"qb":0.25}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(BenchRetry.loadPrior(dir) === Map("qa" -> 10.0, "qb" -> 0.25))
    // empty dir → no priors, no retries, no error
    val empty = java.nio.file.Files.createTempDirectory("benchretry2")
    assert(BenchRetry.loadPrior(empty) === Map.empty)
  }

  test("rolling-min prior: a stalled run can never raise the bar " +
      "(the self-poisoning hole)") {
    val dir = java.nio.file.Files.createTempDirectory("benchprior")
    def write(name: String, json: String): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the r11 incident shape: the overwritten full artifact carries a
    // 40 s stall, the rolling prior still remembers the real 1.3 s
    write("BENCH_FULL.json", """{"queries":{"qa":40.27,"qb":0.25}}""")
    write("BENCH_PRIOR.json", """{"queries":{"qa":1.3,"qc":2.0}}""")
    val prior = BenchRetry.loadPrior(dir)
    assert(prior === Map("qa" -> 1.3, "qb" -> 0.25, "qc" -> 2.0))
    // so a REPEAT 40 s stall still trips the retry rule
    assert(BenchRetry.shouldRetry(40.0, prior.get("qa")))
    // savePrior folds mins: a stalled figure never rises, a faster
    // run lowers, new queries enter
    BenchRetry.savePrior(Map("qa" -> 40.0, "qd" -> 5.0), dir)
    val after = BenchRetry.loadPrior(dir)
    assert(after("qa") === 1.3 && after("qd") === 5.0)
    BenchRetry.savePrior(Map("qa" -> 0.9), dir)
    assert(BenchRetry.loadPrior(dir)("qa") === 0.9)
  }
}
