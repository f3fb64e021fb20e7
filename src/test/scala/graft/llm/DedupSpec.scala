package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DedupSpec extends SparkSuite {

  /** All catalog tables of one signature store (any version + meta). */
  private def storeTables(prefix: String): Seq[String] = {
    val pat = (java.util.regex.Pattern.quote(prefix) +
      "(_v\\d+)?_(hashes|banded|buckets|meta|applog)").r
    spark.catalog.listTables().collect().map(_.name)
      .filter(t => pat.matches(t)).toSeq
  }
  private def dropStore(prefix: String): Unit = {
    storeTables(prefix).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // a run that failed mid-write can leave UNREGISTERED directories
    // in the managed warehouse; clear them too or the next run's
    // CREATE hits LOCATION_ALREADY_EXISTS (also why every store test
    // calls dropStore at entry, not just in finally)
    val wh = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val pat = (java.util.regex.Pattern.quote(prefix) +
      "(_v\\d+)?_(hashes|banded|buckets|meta|applog)").r
    Option(wh.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => pat.matches(f.getName))
      .foreach(org.apache.commons.io.FileUtils.deleteDirectory)
  }
  private def hashesTable(prefix: String): String =
    Dedup.readStoreMeta(spark, prefix).hashesTable(prefix)
  private def bandedTable(prefix: String): String =
    Dedup.readStoreMeta(spark, prefix).bandedTable(prefix)
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely different content about spark shuffles and partitions here"),
    (5L, "another unrelated document mentioning catalyst optimizer rules only")
  ).toDF("id", "text")

  test("exactDedupByContent groups identical texts, keeps min id") {
    val r = Dedup.exactDedupByContent(docs, "text", "id")
      .orderBy("keep_id").collect()
    assert(r.length === 4)
    assert(r(0).getAs[Long]("keep_id") === 1L)
    assert(r(0).getAs[Long]("n_dupes") === 2L)
    assert(r.map(_.getAs[Long]("n_dupes")).sum === 5L)
  }

  test("shingles produce distinct word n-grams") {
    val sh = Seq("a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 2)).collect()(0).getSeq[String](0)
    assert(sh.toSet === Set("a b", "b c", "c d"))
    // short text falls back to whole-text shingle
    val short = Seq("hi").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).collect()(0).getSeq[String](0)
    assert(short === Seq("hi"))
  }

  test("jaccard exact values") {
    val j = Seq(1).toDF("x").select(Dedup.jaccard(
      array(lit("a"), lit("b"), lit("c")),
      array(lit("b"), lit("c"), lit("d")))).collect()(0).getDouble(0)
    assert(j === 0.5) // |∩|=2, |∪|=4
  }

  test("minhash signature: identical texts agree, est tracks exact jaccard") {
    val sigs = docs.select(col("id"),
      Dedup.minHashSignature(col("text"), 64, 3).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L)) // identical text → identical signature
    def agree(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    // near-dup (1,3): high agreement; unrelated (1,4): low
    assert(agree(sigs(1L), sigs(3L)) > 0.5)
    assert(agree(sigs(1L), sigs(4L)) < 0.2)
  }

  test("minhashCandidates finds planted near-dups via LSH banding only") {
    val pairs = Dedup.minhashCandidates(docs, "id", "text", bands = 8, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact dup always collides
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.contains((4L, 5L))) // unrelated must not pair
  }

  test("nearDuplicatesMinhash verifies with exact jaccard threshold") {
    val r = Dedup.nearDuplicatesMinhash(docs, "id", "text",
      threshold = 0.99, bands = 8, rowsPerBand = 4)
      .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    assert(r === Set((1L, 2L))) // only the exact dup survives jaccard ≥ .99
  }

  test("simHash64: identical text → equal hash; near dup → small hamming") {
    val sigs = docs.select(col("id"), Dedup.simHash64("text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
    assert(ham(sigs(1L), sigs(3L)) <= 16)
  }

  test("hammingPairs64: blocked join ≡ brute force, incl. bit-63 sigs and wider thresholds") {
    import spark.implicits._
    val sigs = Seq(
      (1L, 0x0123456789abcdefL),
      (2L, 0x0123456789abcdeeL),               // hamming 1 vs id 1
      (3L, 0x0123456789abcde0L),               // hamming 4 vs id 1
      (4L, 0x8000000000000000L),               // negative long (bit 63)
      (5L, 0x8000000000000003L),               // hamming 2 vs id 4
      (6L, 0x7fffffffffffffffL)                // far from everything
    ).toDF("id", "sig")
    def brute(h: Int): Set[(Long, Long, Int)] =
      sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          Dedup.hamming64(col("a.sig"), col("b.sig")).as("d"))
        .filter(col("d") <= h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (h <- Seq(0, 1, 3, 7)) { // 1, 2, 4, 8 chunks
      val blocked = Dedup.hammingPairs64(sigs, "id", "sig", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(blocked === brute(h), s"maxHamming=$h")
    }
    // emit-once: a pair agreeing on several chunks surfaces exactly
    // once (ids 1,2 agree on 7 of 8 chunks at h=7), with NO de-dup
    // aggregate in the plan — the first-agreeing-chunk filter does it
    val emitted = Dedup.hammingPairs64(sigs, "id", "sig", maxHamming = 7)
    val rows = emitted.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.distinct.size === rows.size, s"duplicate pairs: $rows")
    val plan = emitted.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), plan.take(1500))
  }

  test("simhashPairs blocks on 16-bit chunks and bounds hamming") {
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((4L, 5L)))
  }

  test("simhashPairs blockCols shard the bucket space (scale lever)") {
    val sharded = docs.withColumn("shard",
      when(col("id") <= 2, "a").otherwise("b"))
    // same-shard dup pair survives; forcing the dup pair into different
    // shards removes it (the documented cross-block recall trade)
    val sameShard = Dedup.simhashPairs(sharded, "id", "text",
        maxHamming = 3, blockCols = Seq("shard"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(sameShard.contains((1L, 2L)))
    val split = docs.withColumn("shard",
      when(col("id") === 1, "a").otherwise("b"))
    val crossShard = Dedup.simhashPairs(split, "id", "text",
        maxHamming = 3, blockCols = Seq("shard"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!crossShard.contains((1L, 2L)))
  }

  test("embeddingNearDup finds planted identical vectors") {
    val vecs = Seq(
      (1L, Seq.tabulate(8)(i => math.sin(i + 1).toFloat)),
      (2L, Seq.tabulate(8)(i => math.sin(i + 1).toFloat)), // identical
      (3L, Seq.tabulate(8)(i => math.cos(3 * i + 2).toFloat))
    ).toDF("id", "vec")
    val r = Dedup.embeddingNearDup(vecs, "id", "vec",
      threshold = 0.99, dim = 8, planes = 8)
      .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    assert(r === Set((1L, 2L)))
  }

  test("simHashSha: identical text agrees; near dup closer than unrelated") {
    val sigs = docs.select(col("id"), Dedup.simHashSha(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
    sigs.values.foreach(s => assert(s >= 0L)) // 60-bit: BIGINT-positive everywhere
  }

  test("native graft_minhash_sha matches the SQL formulation exactly") {
    val mixed = docs.union(Seq(
      (6L, "  leading and trailing  "),
      (7L, "single"),
      (8L, "a b")
    ).toDF("id", "text"))
    val bad = mixed.select(
        Dedup.minHashSignatureSha(col("text"), 8, 3).as("native"),
        Dedup.minHashSignatureShaSql(col("text"), 8, 3).as("sql"))
      .filter(col("native") =!= col("sql"))
    assert(bad.count() === 0)
  }

  test("native graft_simhash_sha is bit-identical to the SQL formulation") {
    val mixed = docs.union(Seq(
      (6L, "  leading and trailing  "),
      (7L, "single"),
      (8L, "tabs\tand\nnewlines stay significant")
    ).toDF("id", "text"))
    val bad = mixed.select(
        Dedup.simHashSha(col("text")).as("native"),
        Dedup.simHashShaSql("text").as("sql"))
      .filter(col("native") =!= col("sql"))
    assert(bad.count() === 0)
  }

  test("minhashCandidatesSha: planted dup pairs surface, est in [0,1]") {
    val pairs = Dedup.minhashCandidatesSha(docs, "id", "text",
        bands = 4, rowsPerBand = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) === 1.0) // identical docs agree on every perm
    assert(!pairs.keySet.contains((4L, 5L))) // unrelated must not bucket
    pairs.values.foreach(e => assert(e >= 0.0 && e <= 1.0))
  }

  test("jaccardPairs hot-shingle cap keeps exact jaccard for emitted pairs") {
    // "common common common" shingle appears in every doc (df=4 > cap=3);
    // docs 1/2 also share rare content, docs 3/4 share ONLY the hot
    // boilerplate shingle.
    val boiler = "common common common"
    val d = Seq(
      (1L, s"alpha beta gamma delta $boiler"),
      (2L, s"alpha beta gamma delta epsilon $boiler"),
      (3L, s"one two three $boiler"),
      (4L, s"four five six $boiler")
    ).toDF("id", "text")
    val capped = Dedup.jaccardPairs(d, "id", "text", shingleN = 3,
        threshold = 0.01, dfCap = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val uncapped = Dedup.jaccardPairs(d, "id", "text", shingleN = 3,
        threshold = 0.01, dfCap = 1000000)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    // pairs surfaced under the cap carry EXACT jaccard (hot contribution
    // added back via the per-doc hot sets)
    assert(capped.keySet.contains((1L, 2L)))
    capped.foreach { case (k, j) => assert(j === uncapped(k)) }
    // boilerplate-only pairs are the (documented) delta
    assert(!capped.keySet.contains((3L, 4L)))
    assert(uncapped.keySet.contains((3L, 4L)))
  }

  test("embeddingPairsExact: exact cosine within block, fail-fast over cap") {
    val vecs = Seq(
      (1L, "a", Seq.tabulate(8)(i => math.sin(i + 1).toFloat)),
      (2L, "a", Seq.tabulate(8)(i => math.sin(i + 1).toFloat)),
      (3L, "b", Seq.tabulate(8)(i => math.cos(3 * i + 2).toFloat))
    ).toDF("id", "block", "vec")
    val got = Dedup.embeddingPairsExact(vecs, "id", "vec", "block")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(got.keySet === Set((1L, 2L))) // cross-block pairs never form
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-12)
    val err = intercept[Exception] {
      Dedup.embeddingPairsExact(vecs, "id", "vec", "block", maxBlock = 1L)
        .collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + messages(t.getCause)
    assert(messages(err).contains("embeddingNearDup"))
  }

  test("dupShingleStats counts cross-doc shingle sharing, linear shape") {
    val r = Dedup.dupShingleStats(docs, "id", "text", shingleN = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_shared"),
          x.getAs[Double]("shared_frac"))).toMap
    // docs 1 and 2 are identical ⇒ every shingle shared
    assert(r(1L)._3 === 1.0 && r(2L)._3 === 1.0)
    // doc 3 differs by one word mid-text: shares all shingles not
    // covering the changed token
    assert(r(3L)._2 > 0 && r(3L)._3 < 1.0)
    // docs 4 and 5 share nothing
    assert(r(4L)._2 === 0L && r(5L)._2 === 0L)
  }

  test("connectedComponents: chains, triangles, singletons-in-pairs, empty") {
    // chain 1-2-3, triangle 10-11-12 (+ redundant edge), isolated pair 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // local union-find tier (default threshold)
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // distributed tier (threshold 0 forces the label-propagation loop)
    // must agree exactly
    val gotDist = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist === want)
    // a long path exercises multi-round propagation + the checkpoint arm
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(path, maxIter = 15,
        checkpointEvery = 3, localEdgeThreshold = 0L)
      .collect().map(_.getLong(1)).distinct
    assert(labels.toSeq === Seq(1L))
    // batched convergence probe (checkEvery > 1) converges identically,
    // including when the probe rounds don't divide maxIter
    val labelsBatched = Dedup.connectedComponents(path, maxIter = 15,
        checkpointEvery = 2, localEdgeThreshold = 0L, checkEvery = 3)
      .collect().map(_.getLong(1)).distinct
    assert(labelsBatched.toSeq === Seq(1L))
    // diameter beyond maxIter raises instead of returning wrong labels
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 2, localEdgeThreshold = 0L)
    }
    assert(e.getMessage.contains("not converged"))
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() === 0L)
    // non-numeric ids: both tiers must preserve the id type and agree
    // (URL/hash document ids are the common real-world case)
    val sPairs = Seq(("u/b", "u/a"), ("u/b", "u/c"), ("u/x", "u/y"))
      .toDF("doc_a", "doc_b")
    val sWant = Map("u/a" -> "u/a", "u/b" -> "u/a", "u/c" -> "u/a",
      "u/x" -> "u/x", "u/y" -> "u/x")
    val sLocal = Dedup.connectedComponents(sPairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val sDist = Dedup.connectedComponents(sPairs, localEdgeThreshold = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sLocal === sWant && sDist === sWant)
  }

  test("normalizedKeepBest: case/whitespace-insensitive, keeps best quality") {
    val df = Seq(
      (1L, "The Quick  Brown   Fox", 10),
      (2L, "the quick brown fox", 22),     // same after norm, higher quality
      (3L, "the quick brown fox", 22),     // tie ⇒ min id (2) wins
      (4L, "something else entirely", 5)
    ).toDF("id", "text", "q")
    val kept = Dedup.normalizedKeepBest(df, "id", "text", col("q"))
      .select("id", "n_dupes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept === Map(2L -> 3L, 4L -> 1L))
  }

  test("normalizedKeepBest: null quality loses to any value; all-null keeps min id") {
    val df = Seq(
      (1L, "dup text", Option(5)),
      (2L, "dup  TEXT", None),      // null quality ⇒ non-null row 1 wins
      (3L, "only nulls", None),
      (4L, "ONLY  nulls", None)     // all-null group ⇒ min id 3 wins
    ).toDF("id", "text", "q")
    val kept = Dedup.normalizedKeepBest(df, "id", "text", col("q"))
      .select("id", "n_dupes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept === Map(1L -> 2L, 3L -> 2L))
  }

  test("normalizedKeepBest: NaN ranks first (window DESC parity); " +
      "Long.MinValue cannot overflow-win") {
    // ORDER BY q DESC sorts NaN greatest ⇒ the NaN row is the window's
    // pick; plain negation would rank it last instead
    val nan = Seq((1L, "dup a", 99.0), (2L, "DUP  a", Double.NaN))
      .toDF("id", "text", "q")
    val keptNan = Dedup.normalizedKeepBest(nan, "id", "text", col("q"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptNan === Set(2L))
    // q * -1 on Long.MinValue overflows back to MinValue — the WORST
    // row would beat a genuinely good one
    val mv = Seq((1L, "dup b", Long.MinValue), (2L, "DUP  b", 7L))
      .toDF("id", "text", "q")
    val keptMv = Dedup.normalizedKeepBest(mv, "id", "text", col("q"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptMv === Set(2L))
  }

  test("resolveNearDups: best-quality representative, singletons kept") {
    val docs = Seq((1L, 10), (2L, 20), (3L, 20), (4L, 5))
      .toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.resolveNearDups(docs, pairs, "id", col("q"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // cluster {1,2,3} labeled by min id 1, size 3; quality tie 20/20
    // between 2 and 3 → min id 2 kept; 4 is a singleton, kept
    assert(out(1L) === ((1L, 3L, false)))
    assert(out(2L) === ((1L, 3L, true)))
    assert(out(3L) === ((1L, 3L, false)))
    assert(out(4L) === ((4L, 1L, true)))
  }

  test("lineDedup removes cross-doc boilerplate lines, keeps order") {
    val footer = "all rights reserved"
    val df = Seq(
      (1L, s"alpha one\n$footer\n  \nbeta two"),
      (2L, s"gamma\n$footer\ndelta"),
      (3L, s"$footer\nepsilon\nzeta"),
      (4L, "  all rights reserved  \nonly unique here"),
      (5L, "\n \n")   // no non-empty lines → no output row
    ).toDF("id", "text")
    val out = Dedup.lineDedup(df, "id", "text", minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // footer trims equal across 4 docs (df=4 ≥ 3) → removed everywhere,
    // incl. doc 4's padded variant; blank lines dropped; order kept
    assert(out(1L) === (("alpha one\nbeta two", 3L, 1L)))
    assert(out(2L) === (("gamma\ndelta", 3L, 1L)))
    assert(out(3L) === (("epsilon\nzeta", 3L, 1L)))
    assert(out(4L) === (("only unique here", 2L, 1L)))
    assert(!out.contains(5L))
  }

  test("dedupIncremental flags exact and near dups against a corpus") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, "completely different content about databases and engines"),
      (3L, "another unrelated document body entirely")).toDF("id", "text")
    val newb = Seq(
      (10L, base),                    // byte-identical → exact dup
      (11L, base + " tail"),          // one-token delta → near candidate
      (12L, "wholly novel text that matches nothing at all in there"))
      .toDF("id", "text")
    val out = Dedup.dedupIncremental(newb, corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    assert(out.keySet === Set(10L, 11L, 12L)) // one row per new doc
    assert(out(10L)._1 === true)
    assert(out(10L)._2 >= 1L) // identical signature shares every band
    assert(out(11L) === ((false, 1L))) // 29/31 shingles shared → banded
    assert(out(12L) === ((false, 0L)))
  }

  test("dedupIncremental fail-fasts on a mass-dup corpus bucket") {
    val page = "the exact same boilerplate page body all over the corpus"
    val corpus = (1L to 5L).map(i => (i, page)).toDF("id", "text")
    val newb = Seq((10L, page)).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupIncremental(newb, corpus, "id", "text", maxBucket = 3).count()
    }
    assert(e.getMessage.contains("maxBucket=3"))
    assert(e.getMessage.contains("5 docs"))
    // 0 disables the guard; the tiny case still answers exactly
    val out = Dedup.dedupIncremental(newb, corpus, "id", "text", maxBucket = 0)
      .collect()
    assert(out.length === 1 && out.head.getBoolean(1) === true
      && out.head.getLong(2) === 5L)
  }

  test("dedupUnitsWithinDoc: first occurrence stays, blanks stay") {
    val df = Seq(
      (1L, "alpha\npromo\nbeta\npromo\n\npromo \ngamma"),
      (2L, "one\ntwo"),
      (3L, "same\nsame\nsame")
    ).toDF("id", "text")
    val out = Dedup.dedupUnitsWithinDoc(df, "id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // trimmed-identical "promo " drops too; the blank unit survives
    assert(out(1L) === (("alpha\npromo\nbeta\n\ngamma", 7L, 2L)))
    assert(out(2L) === (("one\ntwo", 2L, 0L)))
    assert(out(3L) === (("same", 3L, 2L)))
  }

  test("dedupUnitsWithinDoc fail-fasts on a degenerate unit count") {
    val big = (1 to 50).map(i => s"line $i").mkString("\n")
    val df = Seq((7L, big)).toDF("id", "text")
    val e = intercept[Exception] {
      Dedup.dedupUnitsWithinDoc(df, "id", "text", maxUnits = 10).count()
    }
    assert(e.getMessage.contains("maxUnits=10")
      || e.getCause != null && e.getCause.getMessage.contains("maxUnits=10"),
      e.getMessage)
    // 0 disables; the 50-unit doc still answers
    val ok = Dedup.dedupUnitsWithinDoc(df, "id", "text", maxUnits = 0)
      .collect()(0)
    assert(ok.getLong(2) === 50L && ok.getLong(3) === 0L)
  }

  test("dedupIncremental guard also fires on a mass-dup BATCH bucket") {
    val page = "the same error page replicated through the whole crawl"
    val corpus = Seq((1L, "alpha doc one"), (2L, "beta doc two"),
      (3L, "gamma doc three")).toDF("id", "text")
    val newb = (10L to 14L).map(i => (i, page)).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupIncremental(newb, corpus, "id", "text", maxBucket = 3)
        .count()
    }
    assert(e.getMessage.contains("batch") &&
      e.getMessage.contains("bucket="), e.getMessage)
  }

  test("unitDedup with paragraph separator removes repeated blocks") {
    val promo = "sponsored content\nvisit our store" // multi-LINE paragraph
    val df = Seq(
      (1L, s"intro one\nstill intro\n\n$promo\n\nbody one"),
      (2L, s"intro two\n\n$promo\n\nbody two"),
      (3L, s"$promo\n\nbody three"),
      (4L, "no promo here\n\nsecond para")
    ).toDF("id", "text")
    val out = Dedup.unitDedup(df, "id", "text", minDf = 3, sep = "\n\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // the promo PARAGRAPH (df=3) is removed as a unit — its inner
    // newline never splits it; single-newline text stays one unit
    assert(out(1L) === (("intro one\nstill intro\n\nbody one", 3L, 1L)))
    assert(out(2L) === (("intro two\n\nbody two", 3L, 1L)))
    assert(out(3L) === (("body three", 2L, 1L)))
    assert(out(4L) === (("no promo here\n\nsecond para", 2L, 0L)))
  }

  test("signature store: admit matches the inline dedupIncremental") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, "completely different content about databases and engines"),
      (3L, "another unrelated document body entirely")).toDF("id", "text")
    val newb = Seq(
      (10L, base),
      (11L, base + " tail"),
      (12L, "wholly novel text that matches nothing at all in there"))
      .toDF("id", "text")
    val inline = Dedup.dedupIncremental(newb, corpus, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val store = Dedup.buildSignatureStore(corpus, "id", "text")
    val viaStore = store.admit(newb, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(viaStore === inline)
  }

  test("signature store: write/read roundtrip, exchange-free corpus probe") {
    val base = (1 to 30).map(i => s"v$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, "totally separate subject matter in this one"),
      (3L, "and a third body about something else again")).toDF("id", "text")
    val newb = Seq((10L, base), (11L, base + " tail"),
      (12L, "nothing shared with the corpus at all here")).toDF("id", "text")
    dropStore("sig_store_t")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_t", buckets = 4)
    try {
      val store = Dedup.readSignatureStore(spark, "sig_store_t")
      assert(store.bands === 4 && store.rowsPerBand === 2
        && store.shingleN === 3)
      val viaStore = store.admit(newb, "id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
      val inline = Dedup.dedupIncremental(newb, corpus, "id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(viaStore === inline)
      // the probe join against the bucketed hash table shuffles ONLY
      // the batch side: exactly one Exchange (the batch), zero on the
      // corpus scan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probe = newb
          .select(col("id"), sha2(trim(col("text")), 256).as("content_hash"))
          .join(spark.table(hashesTable("sig_store_t")), Seq("content_hash"))
        val plan = probe.queryExecution.executedPlan.toString
        val exchanges = "Exchange hashpartitioning".r
          .findAllIn(plan).length
        assert(exchanges <= 1, plan.take(1500))
        probe.count()
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally dropStore("sig_store_t")
  }

  test("writeSignatureStore fail-fasts on a mass-dup corpus bucket") {
    val page = "one boilerplate page body duplicated across the whole corpus"
    val corpus = (1L to 5L).map(i => (i, page)).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_hot",
        maxBucket = 3)
    }
    assert(e.getMessage.contains("corpus") &&
      e.getMessage.contains("maxBucket=3"), e.getMessage)
  }

  test("appendToSignatureStore: tomorrow's batch dedups against today's admits") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    val day1 = Seq(
      (10L, "gamma fresh document admitted on day one intact")).toDF("id", "text")
    val day2 = Seq(
      (20L, "gamma fresh document admitted on day one intact"), // dup of day1
      (21L, "delta genuinely new document on day two arriving")).toDF("id", "text")
    dropStore("sig_store_ap")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_ap",
      buckets = 4)
    try {
      val s1 = Dedup.readSignatureStore(spark, "sig_store_ap")
      // day 1: gamma is new against the corpus
      val a1 = s1.admit(day1, "id", "text").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(a1 === Map(10L -> false))
      Dedup.appendToSignatureStore(day1, "id", "text", "sig_store_ap")
      // day 2 probes the UPDATED store: the day-1 dup is caught
      val s2 = Dedup.readSignatureStore(spark, "sig_store_ap")
      val a2 = s2.admit(day2, "id", "text").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toList
        .sortBy(_._1)
      assert(a2.map(t => t._1 -> t._2) === List(20L -> true, 21L -> false))
      assert(a2.head._3 >= 1L, "day-1 doc must surface as a near candidate")
      // idempotent: re-appending day 1 adds nothing
      Dedup.appendToSignatureStore(day1, "id", "text", "sig_store_ap")
      val nHashes = spark.table(hashesTable("sig_store_ap")).count()
      Dedup.appendToSignatureStore(day1, "id", "text", "sig_store_ap")
      assert(spark.table(hashesTable("sig_store_ap")).count() === nHashes)
      // null-text rows have no content: they must not append a NULL
      // hash key (which a left_anti join can never dedupe — it would
      // re-append every run)
      val withNull = Seq((30L, null.asInstanceOf[String])).toDF("id", "text")
      Dedup.appendToSignatureStore(withNull, "id", "text", "sig_store_ap")
      Dedup.appendToSignatureStore(withNull, "id", "text", "sig_store_ap")
      assert(spark.table(hashesTable("sig_store_ap")).count() === nHashes)
      assert(spark.table(hashesTable("sig_store_ap"))
        .filter(col("content_hash").isNull).count() === 0L)
    } finally dropStore("sig_store_ap")
  }

  test("compactSignatureStore: appends fragment, compaction restores the layout, admit identical") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    dropStore("sig_store_cp")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_cp",
      buckets = 4)
    try {
      // three nightly appends fragment the bucketed tables
      for (d <- 1 to 3) {
        val day = Seq((100L + d,
          s"fresh nightly document number $d with its own words"))
          .toDF("id", "text")
        Dedup.appendToSignatureStore(day, "id", "text", "sig_store_cp")
      }
      val probe = Seq(
        (90L, "fresh nightly document number 2 with its own words"),
        (91L, "wholly unrelated probe document text here")).toDF("id", "text")
      def admitNow() = Dedup.readSignatureStore(spark, "sig_store_cp")
        .admit(probe, "id", "text").orderBy("id").collect()
        .map(_.toSeq).toSeq
      val before = admitNow()
      val filesBefore = spark.table(bandedTable("sig_store_cp")).inputFiles.length +
        spark.table(hashesTable("sig_store_cp")).inputFiles.length
      Dedup.compactSignatureStore(spark, "sig_store_cp")
      val bandedAfter = spark.table(bandedTable("sig_store_cp")).inputFiles.length
      val hashesAfter = spark.table(hashesTable("sig_store_cp")).inputFiles.length
      // ~one file per (non-empty) bucket, strictly fewer than the
      // fragmented layout
      assert(bandedAfter + hashesAfter < filesBefore,
        s"expected fewer files, got $bandedAfter + $hashesAfter vs $filesBefore")
      assert(bandedAfter <= 4 && hashesAfter <= 4)
      // admit results byte-identical pre/post compaction
      assert(admitNow() === before)
      // the bucketed layout survived the version flip: the hash
      // probe still runs with at most ONE exchange (the batch side)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = probe
          .select(col("id"), sha2(trim(col("text")), 256).as("content_hash"))
          .join(spark.table(hashesTable("sig_store_cp")), Seq("content_hash"))
        val plan = p.queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1,
          plan.take(1500))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally dropStore("sig_store_cp")
  }

  test("compaction fencing: an append landing mid-compaction is preserved, never discarded") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    dropStore("sig_store_fc")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_fc",
      buckets = 4)
    try {
      val late = Seq(
        (50L, "late append racing the compaction maintenance job"))
        .toDF("id", "text")
      val probe = Seq(
        (90L, "late append racing the compaction maintenance job"))
        .toDF("id", "text")
      def admitNow() = Dedup.readSignatureStore(spark, "sig_store_fc")
        .admit(probe, "id", "text").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      // the append commits in the window between the compaction's
      // snapshot writes and its version flip — the exact lost-write
      // hazard of a drop+rename swap. The fencing must ABORT the
      // compaction (clean error, nothing flipped) with the append
      // fully visible in the live store.
      val v0 = Dedup.readStoreMeta(spark, "sig_store_fc")
      val e = intercept[IllegalStateException] {
        Dedup.compactSignatureStoreHooked(spark, "sig_store_fc", () =>
          Dedup.appendToSignatureStore(late, "id", "text", "sig_store_fc"))
      }
      assert(e.getMessage.contains("re-run"), e.getMessage)
      val v1 = Dedup.readStoreMeta(spark, "sig_store_fc")
      assert(v1.hashesVersion === v0.hashesVersion &&
        v1.bandedVersion === v0.bandedVersion,
        "an aborted compaction must not flip the version")
      assert(v1.appendSeq === v0.appendSeq + 1)
      assert(admitNow() === Map(90L -> true),
        "the racing append must be fully visible after the abort")
      // the aborted attempt left no orphan next-version tables
      val orphan = storeTables("sig_store_fc")
        .filter(_.contains(s"_v${v0.maxVersion + 1}_"))
      assert(orphan.isEmpty, orphan.toString)
      // the re-run (no race this time) succeeds, keeps the append,
      // flips the version, and retires older generations (grace: the
      // just-superseded version may remain)
      Dedup.compactSignatureStore(spark, "sig_store_fc")
      val v2 = Dedup.readStoreMeta(spark, "sig_store_fc")
      assert(v2.maxVersion === v0.maxVersion + 1)
      assert(admitNow() === Map(90L -> true))
    } finally dropStore("sig_store_fc")
  }

  test("version flip continuity: reader resolved before a flip keeps working; old versions retire") {
    val corpus = Seq(
      (1L, "gamma corpus document body standing quite alone here"))
      .toDF("id", "text")
    dropStore("sig_store_vf")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_vf",
      buckets = 4)
    try {
      val probe = Seq(
        (90L, "gamma corpus document body standing quite alone here"))
        .toDF("id", "text")
      // a reader that resolved the store BEFORE the flip (the
      // in-flight-query case): its version's tables survive one
      // maintenance cycle as grace
      val early = Dedup.readSignatureStore(spark, "sig_store_vf")
      Dedup.compactSignatureStore(spark, "sig_store_vf")
      val got = early.admit(probe, "id", "text").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got === Map(90L -> true),
        "pre-flip reader must still resolve its grace tables")
      // after a SECOND cycle the v1 generation is gone, the current
      // and grace versions remain
      Dedup.compactSignatureStore(spark, "sig_store_vf")
      val names = storeTables("sig_store_vf")
      assert(!names.exists(_.contains("_v1_")), names.toString)
      assert(names.exists(_.contains("_v3_")), names.toString)
      val fresh = Dedup.readSignatureStore(spark, "sig_store_vf")
        .admit(probe, "id", "text").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(fresh === Map(90L -> true))
    } finally dropStore("sig_store_vf")
  }

  test("append crash between banded and bucket-index commits: the replay HEALS the index") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    dropStore("sig_store_bw")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_bw",
      buckets = 4)
    try {
      val day = Seq(
        (50L, "tonight's document crashing between its table commits"))
        .toDF("id", "text")
      // crash AFTER hashes+banded committed, BEFORE the bucket index:
      // the banded anti-join alone would see everything present on
      // replay and leave the index permanently missing the batch
      val boom = intercept[RuntimeException] {
        Dedup.appendToSignatureStoreHooked(day, "id", "text",
          "sig_store_bw", 1L << 20, () => (),
          betweenWrites = () => sys.error("killed"))
      }
      assert(boom.getMessage === "killed")
      def indexEntries(): Seq[(String, String, Long)] = {
        val bt = s"sig_store_bw_v1_buckets"
        spark.table(bt)
          .select(col("band"), col("bucket"), explode(col("ids")).as("id"))
          .collect()
          .map(r => (r.get(0).toString, r.get(1).toString,
            r.get(2).toString.toLong)).sorted.toSeq
      }
      assert(!indexEntries().exists(_._3 == 50L),
        "precondition: the crash left the index without the batch")
      // the replay refills EXACTLY the missing table — and is a
      // no-op on the ones the crashed run already wrote
      Dedup.appendToSignatureStore(day, "id", "text", "sig_store_bw")
      val entries = indexEntries()
      assert(entries.exists(_._3 == 50L),
        "replay must heal the bucket index")
      assert(entries === entries.distinct,
        "per-table deltas must never duplicate a (band, bucket, id) entry")
      val bandedCount = spark.table(bandedTable("sig_store_bw"))
        .filter(col("id") === 50L).count()
      val bandsPerDoc = spark.table(bandedTable("sig_store_bw"))
        .filter(col("id") === 1L).count()
      assert(bandedCount === bandsPerDoc,
        "replay must not duplicate the already-committed banded rows")
      // and the healed store admits/flags correctly
      val probe = Dedup.readSignatureStore(spark, "sig_store_bw")
        .admit(Seq((90L,
          "tonight's document crashing between its table commits"))
          .toDF("id", "text"), "id", "text").collect()
      assert(probe.head.getBoolean(1) === true)
    } finally dropStore("sig_store_bw")
  }

  test("fence log: an append landing INSIDE the check-to-flip window rolls the flip back") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    dropStore("sig_store_mf")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_mf",
      buckets = 4)
    try {
      val late = Seq(
        (50L, "append racing inside the residual flip window itself"))
        .toDF("id", "text")
      val probe = Seq(
        (90L, "append racing inside the residual flip window itself"))
        .toDF("id", "text")
      def admitNow() = Dedup.readSignatureStore(spark, "sig_store_mf")
        .admit(probe, "id", "text").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val v0 = Dedup.readStoreMeta(spark, "sig_store_mf")
      // the append commits BETWEEN the compaction's fencing re-check
      // and its meta flip — the r9 residual window where the flip
      // overwrites the append's seq bump, erasing the meta evidence.
      // The append-only fence log survives the overwrite; the
      // post-flip verify must detect it and ROLL THE FLIP BACK.
      val e = intercept[IllegalStateException] {
        Dedup.compactSignatureStoreHooked(spark, "sig_store_mf",
          () => (), midFlip = () =>
            Dedup.appendToSignatureStore(late, "id", "text",
              "sig_store_mf"))
      }
      assert(e.getMessage.contains("rolled back"), e.getMessage)
      val v1 = Dedup.readStoreMeta(spark, "sig_store_mf")
      assert(v1.hashesVersion === v0.hashesVersion &&
        v1.bandedVersion === v0.bandedVersion,
        "the rolled-back flip must re-point meta at the snapshot version")
      assert(admitNow() === Map(90L -> true),
        "the mid-window append must be fully visible after the rollback")
      // the re-run (no race) flips cleanly and keeps the append
      Dedup.compactSignatureStore(spark, "sig_store_mf")
      val v2 = Dedup.readStoreMeta(spark, "sig_store_mf")
      assert(v2.maxVersion === v0.maxVersion + 1)
      assert(admitNow() === Map(90L -> true))
    } finally dropStore("sig_store_mf")
  }

  test("append fencing: a flip landing mid-append aborts the APPEND and never reverts the flip") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    dropStore("sig_store_af")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_af",
      buckets = 4)
    try {
      val late = Seq(
        (60L, "nightly batch racing a compaction of the whole store"))
        .toDF("id", "text")
      val probe = Seq(
        (91L, "nightly batch racing a compaction of the whole store"))
        .toDF("id", "text")
      def admitNow() = Dedup.readSignatureStore(spark, "sig_store_af")
        .admit(probe, "id", "text").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val v0 = Dedup.readStoreMeta(spark, "sig_store_af")
      // a compaction runs START TO FINISH inside the append's
      // data-write → fence window (the ADVICE medium): the append's
      // old bump-back would have re-pointed meta at the superseded
      // tables and orphaned the new version. Now the append itself
      // aborts — and must NOT have touched the flipped meta.
      val e = intercept[IllegalStateException] {
        Dedup.appendToSignatureStoreHooked(late, "id", "text",
          "sig_store_af", 1L << 20, () =>
            Dedup.compactSignatureStore(spark, "sig_store_af"))
      }
      assert(e.getMessage.contains("re-run the append"), e.getMessage)
      val v1 = Dedup.readStoreMeta(spark, "sig_store_af")
      assert(v1.maxVersion === v0.maxVersion + 1,
        "the aborted append must leave the compaction's flip standing")
      // re-running the append is idempotent and lands in the CURRENT
      // version; the probe then flags the appended doc
      Dedup.appendToSignatureStore(late, "id", "text", "sig_store_af")
      assert(admitNow() === Map(91L -> true))
      val v2 = Dedup.readStoreMeta(spark, "sig_store_af")
      assert(v2.maxVersion === v1.maxVersion,
        "the re-run append must not move versions")
    } finally dropStore("sig_store_af")
  }

  test("readStoreMeta: transient empty meta (mid-flip window) is retried; persistent emptiness throws") {
    dropStore("sig_store_em")
    val metaDf = Seq((4, 2, 3, 4, 1, 1, 0L))
      .toDF("bands", "rows_per_band", "shingle_n", "buckets",
        "hashes_version", "banded_version", "append_seq")
    // persistent emptiness: schema present, no row — the retry loop
    // must exhaust and throw the corruption remedy, not NPE
    metaDf.filter(lit(false)).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable("sig_store_em_meta")
    try {
      val e = intercept[IllegalStateException] {
        Dedup.readStoreMeta(spark, "sig_store_em")
      }
      assert(e.getMessage.contains("writeSignatureStore"), e.getMessage)
      // transient emptiness: the row lands while the reader is inside
      // its retry backoff — the read must succeed, not throw
      val writer = new Thread(() => {
        Thread.sleep(400)
        metaDf.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .insertInto("sig_store_em_meta")
      })
      writer.start()
      try {
        val m = Dedup.readStoreMeta(spark, "sig_store_em")
        assert(m.bands === 4 && m.buckets === 4 &&
          m.hashesVersion === Some(1))
      } finally writer.join()
    } finally dropStore("sig_store_em")
  }

  test("rebuildSignatureStore: takedown-exact re-admission in one fenced call") {
    val kept = "a second corpus document body on other topics entirely"
    val gone = (1 to 30).map(i => s"td$i").mkString(" ")
    val corpus = Seq((1L, gone), (2L, kept)).toDF("id", "text")
    dropStore("sig_store_rb")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_rb",
      buckets = 4)
    try {
      val probe = Seq((90L, gone), (91L, kept)).toDF("id", "text")
      def admitNow() = Dedup.readSignatureStore(spark, "sig_store_rb")
        .admit(probe, "id", "text").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
      // takedown: near tier forgets id 1, but its hash stays — the
      // byte-identical copy is still refused (the documented default)
      Dedup.removeFromSignatureStore(Seq(1L).toDF("id"), "sig_store_rb")
      val after = admitNow()
      assert(after.head === ((90L, true, 0L)),
        s"removed doc's hash must still flag exact copies: $after")
      val v1 = Dedup.readStoreMeta(spark, "sig_store_rb")
      // one rebuild over the RETAINED corpus retires the hash: the
      // exact copy now admits cleanly, the kept doc still dedups
      Dedup.rebuildSignatureStore(corpus.filter(col("id") =!= 1L),
        "id", "text", "sig_store_rb")
      val rebuilt = admitNow()
      assert(rebuilt === Seq((90L, false, 0L), (91L, true, 1L)), rebuilt)
      // the rebuild reused the versioned flip discipline
      val v2 = Dedup.readStoreMeta(spark, "sig_store_rb")
      assert(v2.maxVersion === v1.maxVersion + 1)
      assert(v2.hashesVersion === v2.bandedVersion)
      // and appends still work against the rebuilt store
      Dedup.appendToSignatureStore(Seq((7L, gone)).toDF("id", "text"),
        "id", "text", "sig_store_rb")
      val reAdded = admitNow()
      assert(reAdded.head._2 === true,
        "re-admitted content must flag exact again after its append")
    } finally dropStore("sig_store_rb")
  }

  test("removeFromSignatureStore: near tier forgets removed ids, hash tier stays") {
    val base = (1 to 30).map(i => s"rm$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, "a second corpus document body on other topics")).toDF("id", "text")
    dropStore("sig_store_rm")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_rm",
      buckets = 4)
    try {
      val probe = Seq((10L, base + " tail"), (11L, base)).toDF("id", "text")
      def admitNow() = Dedup.readSignatureStore(spark, "sig_store_rm")
        .admit(probe, "id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      val before = admitNow()
      assert(before(10L)._2 >= 1L, "near-dup of doc 1 before removal")
      assert(before(11L)._1, "exact dup of doc 1 before removal")
      Dedup.removeFromSignatureStore(Seq(1L).toDF("id"), "sig_store_rm")
      val after = admitNow()
      // near candidates from the removed doc are gone
      assert(after(10L)._2 === 0L)
      // the hash tier is deliberately retained (no per-doc provenance):
      // byte-identical incoming copies still flag as exact dups
      assert(after(11L)._1)
      assert(spark.table(bandedTable("sig_store_rm"))
        .filter(col("id") === 1L).count() === 0L)
    } finally dropStore("sig_store_rm")
  }

  test("appendToSignatureStore fail-fasts before growing a hot bucket") {
    val corpus = Seq((1L, "one ordinary page body standing alone fine"))
      .toDF("id", "text")
    val page = "the same error page replicated through the whole batch"
    val hot = (10L to 14L).map(i => (i, page)).toDF("id", "text")
    dropStore("sig_store_gr")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_gr",
      buckets = 4)
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.appendToSignatureStore(hot, "id", "text", "sig_store_gr",
          maxBucket = 3)
      }
      assert(e.getMessage.contains("merged") &&
        e.getMessage.contains("maxBucket=3"), e.getMessage)
      // nothing was written: the store still holds only the corpus doc
      assert(spark.table(hashesTable("sig_store_gr")).count() === 1L)
    } finally dropStore("sig_store_gr")
  }

  test("buildSignatureStore validates the corpus side at build time") {
    // the in-session build->admit path must carry the same corpus
    // guard as the inline operator and the store write — an
    // unvalidated hot corpus bucket would make every later probe
    // quadratic with no error
    val page = "one boilerplate page body duplicated across the whole corpus"
    val corpus = (1L to 5L).map(i => (i, page)).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.buildSignatureStore(corpus, "id", "text",
        validateMaxBucket = 3)
    }
    assert(e.getMessage.contains("corpus") &&
      e.getMessage.contains("maxBucket=3"), e.getMessage)
    // validateMaxBucket = 0: lazy, unvalidated — builds without error
    val lazyStore = Dedup.buildSignatureStore(corpus, "id", "text",
      validateMaxBucket = 0)
    assert(lazyStore.banded.columns.toSeq === Seq("band", "bucket", "id"))
  }

  test("store admit guard fires on a mass-dup BATCH bucket") {
    val page = "the same error page replicated through the whole crawl"
    val corpus = Seq((1L, "alpha doc one"), (2L, "beta doc two"),
      (3L, "gamma doc three")).toDF("id", "text")
    val newb = (10L to 14L).map(i => (i, page)).toDF("id", "text")
    val store = Dedup.buildSignatureStore(corpus, "id", "text")
    val e = intercept[IllegalArgumentException] {
      store.admit(newb, "id", "text", maxBucket = 3).count()
    }
    assert(e.getMessage.contains("batch") &&
      e.getMessage.contains("bucket="), e.getMessage)
  }

  test("exactSubstrDedup erases cross-doc repeated passages, keeps order") {
    val d = Seq(
      (1L, "alpha beta gamma delta unique one tail"),
      (2L, "head alpha beta gamma delta other words"),
      (3L, "nothing shared with anybody at all here")
    ).toDF("id", "text")
    val r = Dedup.exactSubstrDedup(d, "id", "text", k = 4)
      .orderBy("id").collect()
    // "alpha beta gamma delta" occurs in docs 1 and 2 → its 4 tokens
    // go from both; surviving tokens keep original order
    assert(r(0).getAs[String]("clean_text") === "unique one tail")
    assert(r(0).getAs[Long]("n_tokens") === 7L)
    assert(r(0).getAs[Long]("n_removed") === 4L)
    assert(r(1).getAs[String]("clean_text") === "head other words")
    assert(r(1).getAs[Long]("n_removed") === 4L)
    assert(r(2).getAs[String]("clean_text") ===
      "nothing shared with anybody at all here")
    assert(r(2).getAs[Long]("n_removed") === 0L)
  }

  test("exactSubstrDedup: within-doc repeat, short docs, full coverage") {
    val d = Seq(
      // "x y z w" repeats INSIDE doc 10 → both occurrences erased
      (10L, "x y z w mid x y z w"),
      // shorter than k → no windows, untouched
      (11L, "too short"),
      // doc fully covered by a window shared with doc 13 → ""
      (12L, "p q r s"),
      (13L, "p q r s")
    ).toDF("id", "text")
    val r = Dedup.exactSubstrDedup(d, "id", "text", k = 4)
      .orderBy("id").collect()
    assert(r(0).getAs[String]("clean_text") === "mid")
    assert(r(0).getAs[Long]("n_removed") === 8L)
    assert(r(1).getAs[String]("clean_text") === "too short")
    assert(r(1).getAs[Long]("n_removed") === 0L)
    assert(r(2).getAs[String]("clean_text") === "")
    assert(r(2).getAs[Long]("n_removed") === 4L)
    assert(r(3).getAs[String]("clean_text") === "")
    // every input doc survives, even when fully erased
    assert(r.length === 4)
  }

  test("exactSubstrDedup: empty and whitespace-only docs report zero " +
      "tokens (not the phantom [''] split token)") {
    val d = Seq((1L, ""), (2L, "   \t  "), (3L, "a b c d e f g"))
      .toDF("id", "text")
    val r = Dedup.exactSubstrDedup(d, "id", "text", k = 4).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((0L, 0L, "")))
    assert(r(2L) === ((0L, 0L, "")))
    assert(r(3L) === ((7L, 0L, "a b c d e f g")))
  }

  test("exactSubstrDedup byHash tier matches exact-string tier") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val exact = Dedup.exactSubstrDedup(docs, "doc_id", "text", k = 6)
      .orderBy("doc_id").collect()
    val hashed = Dedup.exactSubstrDedup(docs, "doc_id", "text", k = 6,
        byHash = true)
      .orderBy("doc_id").collect()
    assert(exact.length === hashed.length && exact.length > 0)
    exact.zip(hashed).foreach { case (a, b) => assert(a === b) }
    // the pass is doing real work on this corpus (~9% of tokens)
    val removed = exact.map(_.getAs[Long]("n_removed")).sum
    val total = exact.map(_.getAs[Long]("n_tokens")).sum
    assert(removed > 0 && removed < total / 2,
      s"removed=$removed total=$total")
  }

  test("semanticDedup: planted near-dups drop within cells, cross-cell pairs unseen, guard fires, production arm") {
    import spark.implicits._
    val dim = 8; val nsub = 2
    // 4 clusters of 20 on ORTHOGONAL 2-coordinate blocks (cosine must
    // separate clusters here, so the pqCodebookLloyd sign-pattern
    // plant is wrong — its clusters 0/2 and 1/3 are PARALLEL
    // directions that cosine cannot tell apart). Measured margins at
    // jitter 0.25: same-cluster natural cos <= 0.99912, cross-cluster
    // <= 0.143, planted copies ~ 1.0 -> tau = 0.9995 cleanly
    // separates "same document re-embedded" from "same cluster".
    // ids 100+ are 1.0009-scaled copies of ids ending in 0.
    def mix(x0: Long): Long = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    def jit(i: Long, j: Int): Double =
      ((((mix(i * 31 + j) >>> 11) % 2003L) / 1001.5) - 1.0) * 0.25
    val centers = Array.tabulate(4, dim)((c, j) =>
      if (j / 2 == c) 3.0 else 0.0)
    val base = (0L until 80L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(j => centers(c)(j) + jit(i, j)))
    }
    val planted = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 100L, v.map(_ * 1.0009))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
      .repartition(4)

    val out = graft.llm.Dedup.semanticDedup(df, "vec_id", "embedding",
        dim, nsub, nlist = 4, tauMicro = 999500L, salt = "t")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2))))
      .toMap
    // every row reported exactly once
    assert(out.size === 88)
    // each planted copy shares its original's cell (same cluster,
    // jitter << margins) and drops — the original survives (lower id)
    planted.foreach { case (pid, _) =>
      val orig = pid - 100L
      assert(out(pid)._1 === out(orig)._1, s"cells of $pid vs $orig")
      assert(!out(pid)._2, s"planted $pid must drop")
      assert(out(orig)._2, s"original $orig must survive")
    }
    // nothing else drops (natural cosines are far below tau)
    assert(out.count(!_._2._2) === planted.size)

    // production arm: identical schema and the SAME verdicts on this
    // plant (farthest-seeded Lloyd cells also isolate the 4 clusters)
    val prod = graft.llm.Dedup.semanticDedup(df, "vec_id", "embedding",
        dim, nsub, nlist = 4, tauMicro = 999500L, production = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(prod === out.map { case (k, v) => k -> v._2 })

    // the quadratic guard names an over-full cell and routes to LSH
    val e = intercept[Exception] {
      graft.llm.Dedup.semanticDedup(df, "vec_id", "embedding",
        dim, nsub, nlist = 4, tauMicro = 999500L, salt = "t",
        maxCellRows = 5L).collect()
    }
    assert(e.getMessage.contains("maxBlock") ||
      Option(e.getCause).exists(_.getMessage.contains("maxBlock")),
      e.getMessage)

    // a zero-norm vector's cosine is NaN: it certifies nothing, so it
    // neither drops nor drags a neighbor down (without the explicit
    // NaN rule, the non-ANSI NaN→0 cast would decide the verdict)
    val withZero = (base ++ planted ++ Seq((500L, Array.fill(dim)(0.0))))
      .toDF("vec_id", "embedding")
    val z = graft.llm.Dedup.semanticDedup(withZero, "vec_id",
        "embedding", dim, nsub, nlist = 4, tauMicro = 999500L,
        salt = "t")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(z(500L), "zero-norm row must stay kept")
    assert(z.count(!_._2) === planted.size)
  }

  test("semanticDedup twoLevel: hierarchical quantizer arm — verdicts " +
      "identical to the flat production arm on planted clusters; " +
      "sampled-tier twoLevel fails by name") {
    import spark.implicits._
    val dim = 8; val nsub = 2
    // the q216 plant, scaled up so nlist=16 > 4 clusters exercises
    // real sub-cell splits: 4 orthogonal-block clusters of 60, plus
    // 1.0009-scaled copies of every 10th id. Near-identical pairs
    // land in the SAME cell under ANY centroid set (flat or
    // hierarchical argmin — only a cell boundary between two
    // ε-separated points could split them), so the verdict sets must
    // agree even though the cell PARTITIONS differ.
    def mix(x0: Long): Long = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    def jit(i: Long, j: Int): Double =
      ((((mix(i * 31 + j) >>> 11) % 2003L) / 1001.5) - 1.0) * 0.25
    val centers = Array.tabulate(4, dim)((c, j) =>
      if (j / 2 == c) 3.0 else 0.0)
    val base = (0L until 240L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(dim)(j => centers(c)(j) + jit(i, j)))
    }
    val planted = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 1000L, v.map(_ * 1.0009))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
      .repartition(4)
    def run(twoLevel: Boolean) =
      graft.llm.Dedup.semanticDedup(df, "vec_id", "embedding",
        dim, nsub, nlist = 16, tauMicro = 999900L,
        production = true, twoLevel = twoLevel)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val flat = run(twoLevel = false)
    val two = run(twoLevel = true)
    assert(two === flat, "twoLevel verdicts must equal flat production")
    // both find exactly the planted drops
    planted.foreach { case (pid, _) =>
      assert(!two(pid), s"planted $pid must drop")
      assert(two(pid - 1000L), s"original ${pid - 1000L} must survive")
    }
    assert(two.count(!_._2) === planted.size)
    // the sampled (oracle) tier stays flat by contract
    val e = intercept[IllegalArgumentException] {
      graft.llm.Dedup.semanticDedup(df, "vec_id", "embedding",
        dim, nsub, nlist = 16, tauMicro = 999900L, twoLevel = true)
    }
    assert(e.getMessage.contains("production-tier"), e.getMessage)
  }

  test("leakageSafeSplit: cluster members share one verdict; " +
      "singletons match plain splitAssign") {
    import spark.implicits._
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Dedup.leakageSafeSplit(docs, "doc_id", pairs, fr)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size === 10)
    // min-label clusters: {1,2,3} -> 1, {5,6} -> 5, rest singleton
    assert(Seq(1L, 2L, 3L).forall(out(_)._1 == 1L))
    assert(out(5L)._1 === 5L && out(6L)._1 === 5L)
    assert(Seq(4L, 7L, 8L, 9L, 10L).forall(i => out(i)._1 == i))
    // one verdict per cluster — the leakage guarantee
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size === 1)
    assert(out(5L)._2 === out(6L)._2)
    // singleton verdicts are exactly plain per-doc splitAssign
    val plain = TrainingOps.splitAssign(docs, "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(4L, 7L, 8L, 9L, 10L).forall(i => out(i)._2 == plain(i)))
  }

  test("exportSignatureStoreSnapshot: plain snapshot ≡ live read; " +
      "mid-export append fails by name and deletes the partial export") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text")).toDF("id", "text")
    val probe = Seq(
      (10L, "alpha subject matter entirely its own body here"), // exact dup
      (11L, "gamma entirely novel content nothing shared at all")).toDF("id", "text")
    dropStore("sig_store_ex")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_ex",
      buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-sigexp")
    val exp = dir.resolve("snap").toString
    try {
      val v = Dedup.exportSignatureStoreSnapshot(spark, "sig_store_ex", exp)
      assert(v === 1)
      // export ≡ live read at the same version: every table row-equal,
      // and an admission probe against the re-imported store agrees
      val live = Dedup.readSignatureStore(spark, "sig_store_ex")
      val snap = Dedup.readExportedSignatureStore(spark, exp)
      assert(snap.bands === live.bands && snap.rowsPerBand === live.rowsPerBand
        && snap.shingleN === live.shingleN)
      assert(snap.hashes.orderBy("content_hash").collect().toSeq ===
        live.hashes.orderBy("content_hash").collect().toSeq)
      assert(snap.banded.orderBy("band", "bucket", "id").collect().toSeq ===
        live.banded.orderBy("band", "bucket", "id").collect().toSeq)
      assert(snap.buckets.isDefined === live.buckets.isDefined)
      val viaSnap = snap.admit(probe, "id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
      val viaLive = live.admit(probe, "id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(viaSnap === viaLive)
      // the snapshot is readable with NO graft protocol: plain parquet
      assert(spark.read.parquet(s"$exp/hashes").count() ===
        live.hashes.count())
      // exports never overwrite a non-empty target
      val e0 = intercept[IllegalArgumentException] {
        Dedup.exportSignatureStoreSnapshot(spark, "sig_store_ex", exp)
      }
      assert(e0.getMessage.contains("non-empty"))
      // interleaving: an append landing inside the export window is
      // detected by the fence (applog count + meta seq re-check), the
      // partial export is deleted, and the live store keeps the append
      val exp2 = dir.resolve("snap2").toString
      val day1 = Seq((20L, "delta new document appended mid-export run"))
        .toDF("id", "text")
      val e = intercept[IllegalStateException] {
        Dedup.exportSignatureStoreSnapshot(spark, "sig_store_ex", exp2,
          midExportHook = () =>
            Dedup.appendToSignatureStore(day1, "id", "text", "sig_store_ex"))
      }
      assert(e.getMessage.contains("changed while exporting"), e.getMessage)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(exp2)),
        "partial export must be deleted")
      assert(spark.table(hashesTable("sig_store_ex")).count() === 3,
        "the live store keeps the mid-export append")
      // re-run after the append: clean export at the same version,
      // now INCLUDING the appended row
      val v2 = Dedup.exportSignatureStoreSnapshot(spark, "sig_store_ex", exp2)
      assert(v2 === 1)
      assert(spark.read.parquet(s"$exp2/hashes").count() === 3)
    } finally {
      dropStore("sig_store_ex")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("export failure cleanup: a CALLER-OWNED pre-existing (empty) " +
      "exportDir survives a failed export — only the partial children " +
      "the export created are deleted") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text"))
      .toDF("id", "text")
    dropStore("sig_store_own")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_own",
      buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ownroot")
    try {
      // the caller owns this directory (think: an empty mount point)
      val owned = java.nio.file.Files.createDirectory(
        dir.resolve("mount")).toString
      val day1 = Seq((20L, "delta new document appended mid-export"))
        .toDF("id", "text")
      intercept[IllegalStateException] {
        Dedup.exportSignatureStoreSnapshot(spark, "sig_store_own", owned,
          midExportHook = () => Dedup.appendToSignatureStore(
            day1, "id", "text", "sig_store_own"))
      }
      val ownedPath = java.nio.file.Paths.get(owned)
      assert(java.nio.file.Files.exists(ownedPath),
        "caller-owned root must survive the failed export")
      assert(!java.nio.file.Files.list(ownedPath).iterator().hasNext,
        "every partial child the export created must be deleted")
      // and the root created BY the export is deleted root-and-all
      val made = dir.resolve("made").toString
      intercept[IllegalStateException] {
        Dedup.exportSignatureStoreSnapshot(spark, "sig_store_own", made,
          midExportHook = () => Dedup.appendToSignatureStore(
            Seq((21L, "epsilon another mid-export append row here"))
              .toDF("id", "text"), "id", "text", "sig_store_own"))
      }
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(made)))
    } finally {
      dropStore("sig_store_own")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("exportSignatureStoreDelta: base + replayed deltas ≡ full " +
      "export at the head; torn delta fails by name; version mismatch " +
      "demands a fresh base; importSignatureStore restores an " +
      "exchange-free bucketed store") {
    val corpus = Seq(
      (1L, "alpha subject matter entirely its own body here"),
      (2L, "beta subject matter entirely different body text"))
      .toDF("id", "text")
    dropStore("sig_store_dx")
    dropStore("sig_store_imp")
    Dedup.writeSignatureStore(corpus, "id", "text", "sig_store_dx",
      buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-sigdelta")
    def p(n: String) = dir.resolve(n).toString
    try {
      Dedup.exportSignatureStoreSnapshot(spark, "sig_store_dx", p("base"))
      val day1 = Seq((20L, "delta one new document for day one run"))
        .toDF("id", "text")
      Dedup.appendToSignatureStore(day1, "id", "text", "sig_store_dx")
      val s1 = Dedup.exportSignatureStoreDelta(spark, "sig_store_dx",
        Seq(p("base")), p("d1"))
      assert(s1 === 1L)
      val day2 = Seq(
        (30L, "delta two another document for day two run"),
        (31L, "delta two second document also day two run"))
        .toDF("id", "text")
      Dedup.appendToSignatureStore(day2, "id", "text", "sig_store_dx")
      val s2 = Dedup.exportSignatureStoreDelta(spark, "sig_store_dx",
        Seq(p("base"), p("d1")), p("d2"))
      assert(s2 === 2L)
      // the deltas are batch-sized, never corpus re-copies
      assert(spark.read.parquet(s"${p("d1")}/hashes").count() === 1L)
      assert(spark.read.parquet(s"${p("d2")}/hashes").count() === 2L)
      // base + replayed deltas ≡ a full snapshot taken at the head
      Dedup.exportSignatureStoreSnapshot(spark, "sig_store_dx",
        p("full"))
      val chain = Dedup.readExportedSignatureStoreChain(spark,
        Seq(p("base"), p("d1"), p("d2")))
      val full = Dedup.readExportedSignatureStore(spark, p("full"))
      assert(chain.hashes.orderBy("content_hash").collect().toSeq ===
        full.hashes.orderBy("content_hash").collect().toSeq)
      assert(chain.banded.orderBy("band", "bucket", "id").collect()
        .toSeq ===
        full.banded.orderBy("band", "bucket", "id").collect().toSeq)
      def bucketRows(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(_.toSeq).toSet
      assert(bucketRows(chain.buckets.get) ===
        bucketRows(full.buckets.get))
      // an EMPTY delta (no appends since d2) is valid and chain-safe
      Dedup.exportSignatureStoreDelta(spark, "sig_store_dx",
        Seq(p("base"), p("d1"), p("d2")), p("d3"))
      assert(spark.read.parquet(s"${p("d3")}/hashes").count() === 0L)
      // torn delta: an append inside the export window fails by name
      // and the partial delta is deleted
      val day3 = Seq((40L, "torn append lands inside the delta window"))
        .toDF("id", "text")
      val e = intercept[IllegalStateException] {
        Dedup.exportSignatureStoreDelta(spark, "sig_store_dx",
          Seq(p("base"), p("d1"), p("d2"), p("d3")), p("dTorn"),
          midExportHook = () => Dedup.appendToSignatureStore(
            day3, "id", "text", "sig_store_dx"))
      }
      assert(e.getMessage.contains("changed while exporting"),
        e.getMessage)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(p("dTorn"))))
      // import the chain (head = seq 2 state, before day3): the
      // promoted store admits identically to the chain read...
      Dedup.importSignatureStore(spark,
        Seq(p("base"), p("d1"), p("d2")), "sig_store_imp")
      val probe = Seq(
        (90L, "delta two another document for day two run"), // dup
        (91L, "gamma wholly novel content nothing shared at all"))
        .toDF("id", "text")
      val viaImport = Dedup.readSignatureStore(spark, "sig_store_imp")
        .admit(probe, "id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
      val viaChain = chain.admit(probe, "id", "text")
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(viaImport === viaChain)
      assert(viaImport.nonEmpty)
      // ...and probes it exchange-free on the corpus side again (the
      // writeSignatureStore bucketed-layout pin)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probeJoin = probe
          .select(col("id"), sha2(trim(col("text")), 256)
            .as("content_hash"))
          .join(spark.table("sig_store_imp_v1_hashes"),
            Seq("content_hash"))
        val plan = probeJoin.queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1,
          plan.take(1500))
        probeJoin.count()
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // version mismatch: maintenance rewrote the store, so the next
      // delta cannot compose — fail by name demanding a fresh base
      Dedup.compactSignatureStore(spark, "sig_store_dx")
      val e2 = intercept[IllegalArgumentException] {
        Dedup.exportSignatureStoreDelta(spark, "sig_store_dx",
          Seq(p("base"), p("d1"), p("d2"), p("d3")), p("dStale"))
      }
      assert(e2.getMessage.contains("fresh"), e2.getMessage)
      // the chain READ re-validates what the exporter enforced — the
      // caller can assemble dirs the exporter never saw together:
      // out-of-order dirs fail by name...
      val eOrd = intercept[IllegalArgumentException] {
        Dedup.readExportedSignatureStoreChain(spark,
          Seq(p("base"), p("d2"), p("d1")))
      }
      assert(eOrd.getMessage.contains("append_seq regresses"),
        eOrd.getMessage)
      // ...and a delta taken against a DIFFERENT base (here the
      // post-compaction v2 store) refuses to union with the v1 base —
      // importSignatureStore would otherwise promote a silently
      // wrong store
      Dedup.exportSignatureStoreSnapshot(spark, "sig_store_dx",
        p("base2"))
      Dedup.appendToSignatureStore(
        Seq((50L, "post compaction append for the v2 chain"))
          .toDF("id", "text"), "id", "text", "sig_store_dx")
      Dedup.exportSignatureStoreDelta(spark, "sig_store_dx",
        Seq(p("base2")), p("d4"))
      val eVer = intercept[IllegalArgumentException] {
        Dedup.readExportedSignatureStoreChain(spark,
          Seq(p("base"), p("d4")))
      }
      assert(eVer.getMessage.contains("version"), eVer.getMessage)
    } finally {
      dropStore("sig_store_dx")
      dropStore("sig_store_imp")
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("paragraphDedup: first occurrence wins (doc id, then position); " +
      "docs reassemble in order; all-lost and empty-para docs keep rows") {
    val docs = Seq(
      (1L, "banner\n\nunique one\n\nfooter"),
      (2L, "banner\n\nunique two\n\nfooter"),
      // all three paragraphs are repeats of doc 1/2 content
      (3L, "banner\n\nfooter\n\nunique one"),
      // intra-doc repeat: the SECOND "twice" loses to the first
      (4L, "twice\n\ntwice"),
      // whitespace-only paragraph drops before dedup
      (5L, "   \n\nonly body")).toDF("doc_id", "text").repartition(3)
    val out = Dedup.paragraphDedup(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((3L, 3L, "banner\n\nunique one\n\nfooter")))
    assert(out(2L) === ((3L, 1L, "unique two")))
    assert(out(3L) === ((3L, 0L, "")))
    assert(out(4L) === ((2L, 1L, "twice")))
    assert(out(5L) === ((1L, 1L, "only body")))
  }

  test("dupClusterStats: size histogram covers every doc; " +
      "singletons reported as size 1; empty pair list = all singleton") {
    import spark.implicits._
    val docs = (1L to 10L).toDF("doc_id")
    // clusters {1,2,3} (path), {5,6}; 4,7,8,9,10 in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusterStats(docs, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((5L, 5L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 3L))))
    assert(out.values.map(_._2).sum === 10L) // every doc counted once
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val allSingle = Dedup.dupClusterStats(docs, "doc_id", empty)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(allSingle.toSeq === Seq((1L, 10L, 10L)))
  }
}
