package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TrainingOpsSpec extends SparkSuite {
  import spark.implicits._

  test("splitAssign: deterministic, exhaustive, roughly proportional") {
    val df = spark.range(0, 2000).toDF("id")
    val a = TrainingOps.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("train") < 1800) // ~1600
    assert(counts("val") > 100 && counts("val") < 320)
    // deterministic: same assignment on recompute and under repartition
    val b = TrainingOps.splitAssign(df.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
    // different salt → different assignment (not id-correlated)
    val c = TrainingOps.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "other")
    assert(a.orderBy("id").collect().toSeq !== c.orderBy("id").collect().toSeq)
    intercept[IllegalArgumentException] {
      TrainingOps.splitAssign(df, "id", Seq("train" -> 0.5, "val" -> 0.1))
    }
  }

  test("packByTokenBudget: packs fill in order within shard, never cross shards") {
    val docs = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 50L),
      (5L, "b", 600L), (6L, "b", 10L)
    ).toDF("id", "shard", "toks")
    val packed = TrainingOps.packByTokenBudget(docs, "shard", "id",
        col("toks"), budget = 512)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pack_id")).toMap
    // shard a offsets: 0, 300, 600, 900 → packs 0, 0, 1, 1
    assert(packed(1L) === 0L && packed(2L) === 0L)
    assert(packed(3L) === 1L && packed(4L) === 1L)
    // shard b restarts at 0 regardless of shard a's fill
    assert(packed(5L) === 0L && packed(6L) === 1L)
  }

  test("packProvenance: token_offset indexes each doc's first token in the exported sequence") {
    val docs = Seq(
      (1L, "a", "alpha one two"), (2L, "a", "bravo three"),
      (3L, "a", "charlie four five six"), (4L, "b", "delta seven"))
      .toDF("id", "shard", "text")
    val toks = TextAnalysis.tokenCountWs(col("text"))
    val prov = TrainingOps.packProvenance(docs, "shard", "id", toks,
        budget = 6, sepTokens = 1)
      .collect().map(r => (r.getAs[String]("shard"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("id"),
        r.getAs[Int]("doc_seq"), r.getAs[Long]("token_offset"),
        r.getAs[Long]("n_tokens"))).sortBy(t => (t._1, t._2, t._3))
    // shard a: pack = floor(preceding-cumsum / budget) — doc 3's
    // preceding 5 tokens keep it in pack 0 (offset 3+2 toks + 2
    // seps = 7); shard b restarts independently
    assert(prov === Seq(
      ("a", 0L, 1L, 0, 0L, 3L), ("a", 0L, 2L, 1, 4L, 2L),
      ("a", 0L, 3L, 2, 7L, 4L), ("b", 0L, 4L, 0, 0L, 2L)), prov.toSeq)
    // cross-check against the exported sequences: the word at each
    // token_offset IS the doc's first word
    val seqs = TrainingOps.exportPackedSequences(docs, "shard", "id",
        "text", toks, budget = 6, sep = " <eod> ")
      .collect().map(r => (r.getAs[String]("shard"),
        r.getAs[Long]("pack_id")) -> r.getAs[String]("sequence")).toMap
    val firstWord = Map(1L -> "alpha", 2L -> "bravo",
      3L -> "charlie", 4L -> "delta")
    prov.foreach { case (sh, pk, id, _, off, _) =>
      val words = seqs((sh, pk)).split("\\s+")
      assert(words(off.toInt) === firstWord(id),
        s"doc $id at offset $off in pack ($sh, $pk)")
    }
  }

  test("packByTokenBudget: two-phase prefix sum matches the window " +
      "formulation across partition boundaries, hot shards, nulls") {
    import org.apache.spark.sql.expressions.Window
    // one hot shard (60% of rows) + many tiny shards + null tokens;
    // few docs per range partition so hot shards MUST span partitions
    val docs = spark.range(0, 2000).select(
      col("id"),
      when(col("id") % 5 < 3, lit("hot"))
        .otherwise(concat(lit("s"), (col("id") % 37).cast("string")))
        .as("shard"),
      when(col("id") % 101 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 300 + 1).as("toks"))
    val got = TrainingOps.packByTokenBudget(docs, "shard", "id",
        col("toks"), budget = 1000, numPartitions = 16)
      .select("id", "pack_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val w = Window.partitionBy("shard").orderBy("id")
    val want = docs.withColumn("pack_id",
        floor((sum(col("toks")).over(w) - col("toks")) / 1000))
      .select("id", "pack_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got === want)
    // schema: original columns preserved + pack_id appended
    val out = TrainingOps.packByTokenBudget(docs, "shard", "id",
      col("toks"), budget = 1000)
    assert(out.columns.toSeq === Seq("id", "shard", "toks", "pack_id"))
  }

  test("decontaminate: containment catches quoted benchmark items") {
    val corpus = Seq(
      (1L, "lots of filler text and then the secret benchmark question appears here verbatim today"),
      (2L, "completely unrelated corpus document with its own words entirely")
    ).toDF("id", "text")
    val probes = Seq(
      (100L, "the secret benchmark question appears here")
    ).toDF("id", "text")
    val hits = TrainingOps.decontaminate(corpus, probes, "id", "id", "text",
        shingleN = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("probe_id")) ->
        r.getAs[Double]("containment")).toMap
    // doc 1 contains the full probe → every probe shingle present
    assert(hits((1L, 100L)) === 1.0)
    assert(!hits.keySet.exists(_._1 == 2L))
    // plan shape: the probe index must be on the broadcast side
    val plan = TrainingOps.decontaminate(corpus, probes, "id", "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("sampleKPerGroup: bounded-state tier ≡ relational rank spec") {
    import org.apache.spark.sql.expressions.Window
    // one hot group (5000 rows over 900 distinct ids) + one tiny group
    val rows = (1 to 5000).map(i => ("hot", (i % 900).toLong)) ++
      (1 to 3).map(i => ("tiny", i.toLong))
    val df = rows.toDF("g", "uid").repartition(8)
    val got = TrainingOps.sampleKPerGroup(df, Seq("g"), "uid", k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // relational spec: k smallest salted hashes per group over distinct ids
    val h = expr("cast(conv(substr(sha2(concat('smpl', cast(uid as string)), " +
      "256), 1, 15), 16, 10) as bigint)")
    val want = df.select(col("g"), col("uid").cast("string").as("uid"))
      .distinct()
      .withColumn("_h", h)
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("_h"), col("uid"))))
      .filter(col("rank") <= 10)
      .drop("_h")
      .collect().map(r => (r.getString(0), r.getInt(2), r.getString(1))).toSet
    assert(got === want)
    assert(got.count(_._1 == "hot") === 10) // exactly k from the hot stratum
    assert(got.count(_._1 == "tiny") === 3) // min(k, |group|) from the small one
    // determinism under a different partitioning
    val again = TrainingOps.sampleKPerGroup(df.repartition(3), Seq("g"), "uid", 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(again === got)
  }

  test("decontaminateBloom: exact parity with the broadcast tier") {
    // enough docs that the bloom filter actually prunes something, and
    // a threshold low enough to produce partial-containment rows
    val corpus = (1 to 60).map(i =>
      (i.toLong, s"filler number $i plus the shared secret benchmark phrase " +
        (if (i % 3 == 0) "appears here verbatim" else s"does not $i"))).toSeq
      .toDF("id", "text").repartition(4)
    val probes = Seq(
      (100L, "the shared secret benchmark phrase appears here verbatim"),
      (200L, "totally absent probe content nothing matches this"))
      .toDF("id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("corpus_id"),
        r.getAs[Long]("probe_id"), r.getAs[Double]("containment"))).toSet
    val exact = rows(TrainingOps.decontaminate(corpus, probes,
      "id", "id", "text", shingleN = 3, threshold = 0.2))
    val bloom = rows(TrainingOps.decontaminateBloom(corpus, probes,
      "id", "id", "text", shingleN = 3, threshold = 0.2))
    assert(exact.nonEmpty) // fixture sanity: parity of ∅ proves nothing
    assert(bloom === exact)
  }

  test("chunkByTokens: coverage, overlap, ragged tail, single-chunk docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "short doc")                               // < window
    ).toDF("id", "text")
    val out = TrainingOps.chunkByTokens(docs, "id", "text",
        window = 4, overlap = 2)
      .orderBy("id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = out.filter(_._1 == 1L)
    // stride 2 ⇒ ceil((10-2)/2) = 4 chunks
    assert(d1.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(d1(0)._3 === "t1 t2 t3 t4")
    assert(d1(1)._3 === "t3 t4 t5 t6") // 2-token overlap
    assert(d1(3)._3 === "t7 t8 t9 t10")
    assert(d1.forall(_._4 === 4))
    // every token appears in at least one chunk
    assert(d1.flatMap(_._3.split(" ")).toSet === (1 to 10).map(i => s"t$i").toSet)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0, "short doc", 2)))
  }

  test("sampleByDomain: exact zero/one rates, determinism, default keep") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val kept = TrainingOps.sampleByDomain(docs, "id", "source",
      Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"))          // rate 0 drops all
    assert(bySrc("src1") === 100L)           // rate 1 keeps all
    assert(bySrc("src3") === 100L)           // unlisted source keeps all
    assert(bySrc("src2") > 20L && bySrc("src2") < 80L) // ~half
    // deterministic: same rows on re-evaluation and repartitioning
    val again = TrainingOps.sampleByDomain(docs.repartition(7), "id", "source",
      Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5))
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // non-dyadic rate: 0.3 * 10000 = 2999.999... in IEEE double — the
    // threshold must ROUND to 3000 (a truncating cast keeps one bucket
    // fewer than engines that round on cast, silently desyncing them).
    // Deterministic: compute the salted bucket in-process and PLANT an
    // id that lands exactly on bucket 2999 — the bucket a truncating
    // implementation drops.
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$id:graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    val edgeId = (1L to 100000L).find(bucketOf(_) == 2999L).get
    val planted = Seq((edgeId, "src0")).toDF("id", "source")
    val keptEdge = TrainingOps.sampleByDomain(planted, "id", "source",
      Map("src0" -> 0.3)).count()
    assert(keptEdge === 1L, s"bucket-2999 id $edgeId must survive rate 0.3")
  }

  test("sampleGlobalK: deterministic top-k by salted hash, never a sort") {
    val docs = (1L to 1000L).map(i => (i, s"d$i")).toDF("id", "v")
    val got = TrainingOps.sampleGlobalK(docs, "id", k = 25, salt = "t")
    assert(got.columns.toSeq === Seq("id", "v")) // helper column dropped
    val ids = got.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.length === 25)
    // the pick is exactly the 25 smallest salted SHA-256 values,
    // recomputed in-process — engine-stable, not rand()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = (1L to 1000L).sortBy(i =>
      md.digest(s"t:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(25).sorted
    assert(ids === expect)
    // partitioning-invariant
    val again = TrainingOps.sampleGlobalK(docs.repartition(13), "id", 25, "t")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again === ids)
    // plan shape: per-partition top-k + driver merge, no global sort
    val plan = TrainingOps.sampleGlobalK(docs, "id", 25, "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("packByTokenBudget: binary shard keys group by value, not identity") {
    // every Row.get returns a FRESH Array[Byte]: identity equals would
    // treat each row as its own run and zero every offset
    val df = (1L to 6L).map(i => (Array[Byte](1, 2), i, 10))
      .toDF("shard", "id", "toks")
    val out = TrainingOps.packByTokenBudget(df, "shard", "id",
        col("toks").cast("long"), budget = 25)
      .select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // starts 0,10,20,30,40,50 -> packs 0,0,0,1,1,2
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 2L))
  }

  test("packByTokenBudget: re-packing replaces pack_id, no duplicate") {
    val df = Seq(("a", 1L, 10)).toDF("shard", "id", "toks")
    val once = TrainingOps.packByTokenBudget(df, "shard", "id",
      col("toks").cast("long"), budget = 25)
    val twice = TrainingOps.packByTokenBudget(once, "shard", "id",
      col("toks").cast("long"), budget = 5)
    assert(twice.columns.count(_ == "pack_id") === 1)
    assert(twice.select("pack_id").collect()(0).getLong(0) === 0L)
  }

  test("sampleGlobalK: null keys excluded, never crowding the pick") {
    val df = ((1L to 10L).map(Option(_)) ++ Seq.fill(30)(Option.empty[Long]))
      .toDF("id")
    val got = TrainingOps.sampleGlobalK(df, "id", k = 20, salt = "n")
    assert(got.count() === 10)
    assert(got.filter(col("id").isNull).count() === 0)
  }

  test("mixByTemperature: exact floor quotas from micropoint pow weights") {
    val df = ((1L to 8L).map(i => (i, "a")) ++ Seq((9L, "b")))
      .toDF("id", "source")
    // alpha=0.5: w_a = round(1e6·√8) = 2828427, w_b = 1e6,
    // Σw = 3828427; T=6 ⇒ target_a = ⌊6·w_a/Σw⌋ = 4, target_b = 1
    val r = TrainingOps.mixByTemperature(df, "id", "source",
      totalDocs = 6, alpha = 0.5, salt = "tm").collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Int]("rank")))
      .sorted.toSeq
    assert(r === Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 1)))
    // alpha=1 is proportional: targets 5 and 0 — domain b disappears
    val p = TrainingOps.mixByTemperature(df, "id", "source",
      totalDocs = 6, alpha = 1.0, salt = "tm").collect()
    assert(p.forall(_.getAs[String]("source") == "a") && p.length === 5)
  }

  test("selectByTokenBudget: greedy best-first fill, boundary doc kept") {
    val df = Seq(
      (1L, 90L, 10),  // q=90: starts at 0   — kept
      (2L, 80L, 12),  // q=80: starts at 10  — kept
      (3L, 70L, 20),  // q=70: starts at 22  — kept (straddles budget 25)
      (4L, 60L, 5),   // q=60: starts at 42  — dropped
      (5L, 90L, 8)    // q=90, id tiebreak after 1: starts at 10? no —
                      // (90,1) then (90,5): 5 starts at 10, shifts 2..4
    ).toDF("id", "q", "toks")
    // order: (90,1)@0, (90,5)@10, (80,2)@18, (70,3)@30, (60,4)@50
    val kept = TrainingOps.selectByTokenBudget(df,
      orderBy = struct((-col("q")).as("a"), col("id").as("b")),
      tokens = col("toks"), budget = 25L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 2L, 5L)) // id 3 starts at 30 ≥ 25
    assert(TrainingOps.selectByTokenBudget(df,
      orderBy = struct((-col("q")).as("a"), col("id").as("b")),
      tokens = col("toks"), budget = 1000L).count() === 5)
  }

  test("mixByTemperature: bounded domain list and zero-quota fail-fasts") {
    val many = (1L to 30L).map(i => (i, s"s$i")).toDF("id", "source")
    val e1 = intercept[IllegalArgumentException] {
      TrainingOps.mixByTemperature(many, "id", "source",
        totalDocs = 10, alpha = 0.5, maxDomains = 20)
    }
    assert(e1.getMessage.contains("maxDomains=20"))
    // 30 equal-weight domains, T=10 ⇒ every quota floors to 0
    val e2 = intercept[IllegalArgumentException] {
      TrainingOps.mixByTemperature(many, "id", "source",
        totalDocs = 10, alpha = 0.5)
    }
    assert(e2.getMessage.contains("floored to 0"))
  }

  test("buildVocab: contiguous ids by (count desc, term), size cut") {
    import spark.implicits._
    val df = Seq("b b b a a c", "a d d", "c a").toDF("text")
    val v = TrainingOps.buildVocab(df, "text", size = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // counts: a=4, b=3, d=2, c=2 -> cut at 3, tie c vs d broken by term
    assert(v === Seq((0, "a", 4L), (1, "b", 3L), (2, "c", 2L)))
  }

  test("bpePairCounts: occurrence-weighted adjacent pairs, 1-char tokens skip") {
    import spark.implicits._
    val df = Seq("abab ab", "x ab").toDF("text")
    val p = TrainingOps.bpePairCounts(df, "text", topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // 'abab' -> ab,ba,ab; 'ab' x2 -> ab,ab; 'x' -> none
    // totals: ab=4, ba=1
    assert(p === Seq(("ab", 4L), ("ba", 1L)))
  }

  test("trainBpe: hand-computed merge sequence, greedy merge order, early stop") {
    import spark.implicits._
    // words: aaab x2, ab x3
    val df = Seq("aaab ab ab", "aaab ab").toDF("text")
    // round 0: pairs (a,a): 2*2=4, (a,b): 2+3=5      -> merge (a,b) 5
    //   aaab -> [a,a,ab]; ab -> [ab]
    // round 1: (a,a): 2, (a,ab): 2 — count tie, (a,a) < (a,ab) by
    //   right symbol -> merge (a,a) 2;  aaab -> [aa,ab]
    // round 2: (aa,ab): 2 -> merge;     aaab -> [aaab]
    // round 3: no pairs left -> early stop with 3 of 4 merges
    val m = TrainingOps.trainBpe(df, "text", numMerges = 4)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(m === Seq((0, "a", "b", 5L), (1, "a", "a", 2L),
      (2, "aa", "ab", 2L)))
  }

  test("trainBpe: greedy left-to-right within a word — aaaa counts 3 but merges 2") {
    import spark.implicits._
    val df = Seq("aaaa").toDF("text")
    val m = TrainingOps.trainBpe(df, "text", numMerges = 2)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // round 0: (a,a) at 3 adjacent positions (Sennrich-style count);
    //   the greedy merge yields [aa, aa] — NOT [aa, a, a]
    // round 1: (aa,aa) x1
    assert(m === Seq((0, "a", "a", 3L), (1, "aa", "aa", 1L)))
  }

  test("trainBpe: checkpoint cadence does not change the merge table") {
    import spark.implicits._
    val df = Seq("abcabc abc ab", "bc bc abcabc").toDF("text")
    val a = TrainingOps.trainBpe(df, "text", numMerges = 5,
      checkpointEvery = 1).collect().map(_.toSeq).toSeq
    val b = TrainingOps.trainBpe(df, "text", numMerges = 5,
      checkpointEvery = 3).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("trainBpe incremental ≡ trainBpeRecount: identical merge tables") {
    import spark.implicits._
    // rich planted corpus: tie-breaks, merges that create new winning
    // pairs (th+e -> the), repeated-letter greedy runs, early stop —
    // every (merge_idx, left, right, cnt) row must match the full
    // recount reference exactly, including the reported counts
    val df = Seq(
      "the theme theater then the thee",
      "theme theory the there order other",
      "order border ordering the theme reorder",
      "aaaa aaab ab ba abab bab",
      "xyz xy yz zzz xyzzy").toDF("text")
    for (n <- Seq(1, 4, 15, 60)) {
      val inc = TrainingOps.trainBpe(df, "text", numMerges = n)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      val rec = TrainingOps.trainBpeRecount(df, "text", numMerges = n)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      assert(inc === rec, s"numMerges=$n")
    }
  }

  test("trainBpe/-Bytes/WordPiece: driver-local tier ≡ distributed loop (r15)") {
    import spark.implicits._
    // the r15 small-word-table tier (localWordThreshold) must produce
    // the BIT-IDENTICAL merge table the distributed loop produces —
    // same selections, counts, scores, tie-breaks, early stop.
    // threshold=0 forces the distributed loop; default takes the local
    // tier at this size.
    val df = Seq(
      "the theme theater then the thee",
      "theme theory the there order other",
      "aaaa aaab ab ba abab bab",
      "xyz xy yz zzz xyzzy").toDF("text")
    for (n <- Seq(1, 5, 40)) {
      val lb = TrainingOps.trainBpe(df, "text", numMerges = n)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      val db = TrainingOps.trainBpe(df, "text", numMerges = n,
        localWordThreshold = 0L)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      assert(lb === db, s"trainBpe numMerges=$n")
      val lby = TrainingOps.trainBpeBytes(df, "text", numMerges = n)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      val dby = TrainingOps.trainBpeBytes(df, "text", numMerges = n,
        localWordThreshold = 0L)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      assert(lby === dby, s"trainBpeBytes numMerges=$n")
      val lw = TrainingOps.trainWordPiece(df, "text", numMerges = n)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      val dw = TrainingOps.trainWordPiece(df, "text", numMerges = n,
        localWordThreshold = 0L)
        .orderBy("merge_idx").collect().map(_.toSeq).toSeq
      assert(lw === dw, s"trainWordPiece numMerges=$n")
    }
  }

  test("trainUnigram: driver-local tier ≡ distributed EM loop (r16)") {
    import spark.implicits._
    // the r16 small-word-table tier must produce the BIT-IDENTICAL
    // (piece, cnt, score_micro) model: same code-point substring
    // seed, same UTF8-ordered top-k, same Viterbi E-steps (the SAME
    // static kernel), same prune deltas. threshold=0 forces the
    // distributed loop; default takes the local tier at this size.
    // The corpus plants: shared substrings, a supplementary-plane
    // symbol (😀 = one Spark character, two Java chars — code-point
    // vs char-unit substring enumeration diverges if mishandled),
    // and a U+E000/U+1F600 pair whose UTF-16 vs UTF8 order differs.
    val df = Seq(
      "abab abc bc aab caba",
      "xyz zyx yzx xzy zzz",
      "😀a a😀 😀😀 a",
      "x x x x x x").toDF("text")
    for ((em, prune) <- Seq((0, 0), (2, 3), (3, 5))) {
      val l = TrainingOps.trainUnigram(df, "text", seedSize = 8,
        maxPieceLen = 3, emRounds = em, pruneCount = prune)
        .collect().map(_.toSeq).toSeq
      val d = TrainingOps.trainUnigram(df, "text", seedSize = 8,
        maxPieceLen = 3, emRounds = em, pruneCount = prune,
        localWordThreshold = 0L)
        .collect().map(_.toSeq).toSeq
      assert(l === d, s"emRounds=$em pruneCount=$prune")
      assert(l.nonEmpty)
    }
    // alphabet fail-fast guard fires identically on the local tier
    val e = intercept[IllegalArgumentException] {
      TrainingOps.trainUnigram(df, "text", maxAlphabet = 2)
    }
    assert(e.getMessage.contains("maxAlphabet"), e.getMessage)
  }

  test("trainer local-tier gate (r16): over-bytes/under-rows takes the distributed arm") {
    import spark.implicits._
    val w0 = Seq(("alpha", 3L), ("beta", 2L)).toDF("w", "freq")
    val w = w0.localCheckpoint()
    assert(TrainingOps.wordsIfSmall(w, w0, 2000000L).isDefined)
    // a 1-byte cap refuses collection at 2 rows — the fat-word-table
    // guard; at production scale the same estimate comparison
    // short-circuits BEFORE the count() job
    assert(TrainingOps.wordsIfSmall(w, w0, 2000000L,
      bytesCap = BigInt(1)).isEmpty)
    assert(TrainingOps.wordsIfSmall(w, w0, 1L).isEmpty)
  }

  test("trainBpe local tier: tie-breaks compare in UTF8 binary order, not UTF-16") {
    import spark.implicits._
    // U+E000 (BMP private use) vs U+1F600 (supplementary): a UTF-16
    // code-unit compare puts the surrogate pair FIRST, UTF8 binary
    // order puts U+E000 first — Spark's ORDER BY is UTF8 binary, so
    // the local tier must match it (the componentsLocal lesson).
    // Plant equal-count pairs differing only in those symbols.
    val hi = "😀" // U+1F600
    val pu = ""
    val df = Seq(s"x$hi x$pu").toDF("text")
    // pairs: (x, hi) cnt 1, (x, pu) cnt 1 — tie on cnt and left;
    // right tie-break must pick U+E000 (smaller in UTF8)
    val l = TrainingOps.trainBpe(df, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val d = TrainingOps.trainBpe(df, "text", numMerges = 1,
      localWordThreshold = 0L)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(l === d)
    assert(l === Seq(("x", pu)))
  }

  test("graft_unigram_segment: hand-computed Viterbi, tie to longer piece, null off-alphabet") {
    import spark.implicits._
    val b = org.apache.spark.sql.GraftColumnBridge
    val model = Seq("a" -> -100L, "b" -> -100L, "c" -> -100L,
      "ab" -> -150L, "abc" -> -250L)
    def seg(word: String): Option[Seq[String]] = {
      val r = Seq(word).toDF("w").select(b.column(
        graft.expressions.UnigramSegmentExpr(
          b.expression(col("w")), model, 3)).as("s")).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getSeq[String](0))
    }
    // ab+c = -250 ties abc = -250 -> LONGER last piece wins
    assert(seg("abc") === Some(Seq("abc")))
    // ab (-150) beats a+b (-200)
    assert(seg("ab") === Some(Seq("ab")))
    assert(seg("ba") === Some(Seq("b", "a")))
    // abcab: abc+ab = -400 vs ab+c+ab = -400 tie at pos 3 decided
    // before: best(3)=abc(-250); -250+ab(-150) = -400; candidates at
    // 5: l=2 best(3)+ab=-400, l=1 best(4)+b: best(4)=abc+a=-350 ->
    // -450; so abc+ab wins
    assert(seg("abcab") === Some(Seq("abc", "ab")))
    // off-alphabet -> null, empty -> empty
    assert(seg("az") === None)
    assert(seg("") === Some(Seq()))
  }

  test("trainUnigram: coverage, prune arithmetic, score consistency, determinism") {
    import spark.implicits._
    val df = Seq("abab abc cab abab", "abc abc bc abab cab",
      "cab bc abab abcabc").toDF("text")
    val out = TrainingOps.trainUnigram(df, "text", seedSize = 6,
      maxPieceLen = 3, emRounds = 2, pruneCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = out.map(_._1)
    // all corpus single chars retained; nothing over maxPieceLen;
    // exactly seedSize - pruneCount multi pieces survive
    assert(Set("a", "b", "c").subsetOf(pieces.toSet))
    assert(pieces.forall(_.length <= 3))
    assert(pieces.count(_.length > 1) === 4)
    assert(pieces.sorted.toSeq === pieces.toSeq) // ordered by piece
    // published scores are exactly the Laplace micro-log of the
    // published counts (the trainer's own invariant)
    val total = out.map(_._2).sum
    val nv = out.length
    out.foreach { case (p, c, s) =>
      val exp = java.math.BigDecimal.valueOf(
          math.log((c + 1.0) / (total + nv.toDouble)) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
      assert(s === exp, s"piece $p")
    }
    // deterministic under repartition
    val re = TrainingOps.trainUnigram(df.repartition(5), "text",
      seedSize = 6, maxPieceLen = 3, emRounds = 2, pruneCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(re.toSeq === out.toSeq)
  }

  test("trainUnigram: maxAlphabet fail-fast names the blown guard") {
    import spark.implicits._
    val df = Seq("abcdef ghijkl", "mnopqr stuvwx").toDF("text")
    val e = intercept[IllegalArgumentException] {
      TrainingOps.trainUnigram(df, "text", seedSize = 4,
        maxPieceLen = 3, emRounds = 1, pruneCount = 0, maxAlphabet = 8)
    }
    assert(e.getMessage.contains("maxAlphabet=8"))
    assert(e.getMessage.contains("distinct"))
    // the same corpus trains fine when the cap admits its alphabet
    val ok = TrainingOps.trainUnigram(df, "text", seedSize = 4,
      maxPieceLen = 3, emRounds = 1, pruneCount = 0, maxAlphabet = 64)
    assert(ok.count() > 0)
  }

  test("unigramEncode: trained model round-trips corpus tokens; off-alphabet drops") {
    import spark.implicits._
    val df = Seq("abab abc cab", "abc bc abab").toDF("text")
    val model = TrainingOps.trainUnigram(df, "text", seedSize = 4,
      maxPieceLen = 3, emRounds = 1, pruneCount = 1)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    val enc = Seq("abab zq abc").toDF("t")
      .select(TrainingOps.unigramEncode(col("t"), model).as("s"))
      .collect()(0).getSeq[String](0)
    // zq is off-alphabet -> its segmentation drops; the others join up
    assert(enc.mkString("") === "abababc")
    assert(enc.forall(p => model.exists(_._1 == p)))
  }

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(TrainingOps.bpeEncode(col("t"), merges).as("s"))
      .collect()(0).getSeq[String](0)
  }

  test("bpeEncode: hand vectors — greedy l-to-r, rank order, multi-token") {
    val m = Seq(("a", "b"), ("ab", "c"))
    assert(enc("abc", m) === Seq("abc"))
    assert(enc("cab", m) === Seq("c", "ab"))
    assert(enc("aabb", m) === Seq("a", "ab", "b"))
    // greedy left-to-right within one rank: aaaa -> [aa, aa]
    assert(enc("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    // untrained chars pass through as single-char symbols
    assert(enc("xaby", m) === Seq("x", "ab", "y"))
    // multiple tokens flatten in document order
    assert(enc("ab c abc", m) === Seq("ab", "c", "abc"))
  }

  test("bpeEncode: sequential rank semantics — a later merge cannot re-arm an earlier rank") {
    // rank 0 wants (a, bc) but bc only exists AFTER rank 1 runs;
    // Sennrich-sequential leaves [a, bc] (a priority-queue encoder
    // would produce [abc]) — divergence documented on BpeEncodeExpr
    assert(enc("abc", Seq(("a", "bc"), ("b", "c"))) === Seq("a", "bc"))
    // …but a pair created by an EARLIER rank is picked up by a later
    // one on the same pass
    assert(enc("abc", Seq(("b", "c"), ("a", "bc"))) === Seq("abc"))
  }

  test("bpeEncode round-trips trainBpe: corpus re-encodes to the trainer's segmentation") {
    import spark.implicits._
    val df = Seq("abcabc abc ab abab", "bc bc abcabc aaab aaab").toDF("text")
    val merges = TrainingOps.trainBpe(df, "text", numMerges = 4)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // replay the trainer's own representation: sequential separator
    // replaces over each distinct word must equal bpeEncode's output
    val sep = "\u001f"
    def replay(w: String): Seq[String] = {
      var s = sep + w.map(c => s"$c").mkString(sep + sep) + sep
      merges.foreach { case (l, r) =>
        s = s.replace(sep + l + sep + sep + r + sep, sep + l + r + sep)
      }
      s.stripPrefix(sep).stripSuffix(sep).split(sep + sep).toSeq
    }
    val words = df.as[String].collect().flatMap(_.split("\\s+")).distinct
    words.foreach { w =>
      assert(enc(w, merges) === replay(w), s"word '$w'")
    }
  }

  test("trainWordPiece: hand-computed likelihood ranking — rare-exclusive pair beats frequent pairs, cnt then lexicographic tie-breaks") {
    import spark.implicits._
    // words: hug x3, pug, pun, bun, hugs
    // syms:  hug=[h,##u,##g] pug=[p,##u,##g] pun=[p,##u,##n]
    //        bun=[b,##u,##n] hugs=[h,##u,##g,##s]
    // freqs: h:4 p:2 b:1 ##u:7 ##g:5 ##n:2 ##s:1
    // round 0: every ##u pair scores 1e9/7 = 142857142 (floor), but
    //   (##g,##s) = 1·1e9/(5·1) = 200000000 — the rare-but-EXCLUSIVE
    //   pair wins over (##u,##g) cnt=5. BPE would pick (##u,##g).
    // round 1: hugs=[h,##u,##gs]; ##g:4 ##gs:1. ALL six pairs now
    //   floor to 142857142 — cnt desc ties (h,##u)=4 with
    //   (##u,##g)=4, left asc: "##u" < "h" → (##u,##g) 4.
    // round 2: hug/pug=[·,##ug]; ##u:3. (##u,##n)=2·1e9/(3·2) and
    //   (b,##u)=(##u,##gs)=1e9/3 all floor to 333333333 —
    //   cnt desc → (##u,##n) 2.
    val df = Seq("hug hug hug pug", "pun bun hugs").toDF("text")
    val m = TrainingOps.trainWordPiece(df, "text", numMerges = 3)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(m === Seq(
      (0, "##g", "##s", 1L, 200000000L),
      (1, "##u", "##g", 4L, 142857142L),
      (2, "##u", "##n", 2L, 333333333L)))
  }

  test("trainWordPiece: checkpoint cadence does not change the merge table; early stop when fully merged") {
    import spark.implicits._
    val df = Seq("hug hug hug pug", "pun bun hugs").toDF("text")
    val a = TrainingOps.trainWordPiece(df, "text", numMerges = 4,
      checkpointEvery = 1).collect().map(_.toSeq).toSeq
    val b = TrainingOps.trainWordPiece(df, "text", numMerges = 4,
      checkpointEvery = 3).collect().map(_.toSeq).toSeq
    assert(a === b)
    // a single word fully merges in len-1 rounds, then stops early
    val m = TrainingOps.trainWordPiece(Seq("abc").toDF("text"), "text",
      numMerges = 5).collect()
    assert(m.length === 2)
  }

  test("wordPieceVocab + wordpieceEncode: greedy longest-match, ## continuations, [UNK] arms, maxWordLen") {
    import spark.implicits._
    val df = Seq("hug hug hug pug", "pun bun hugs").toDF("text")
    val merges = TrainingOps.trainWordPiece(df, "text", numMerges = 3)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocabDf = TrainingOps.wordPieceVocab(df, "text", merges)
    val vocab = vocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // surviving symbols with freq-weighted counts
    assert(vocab === Map("h" -> 4L, "p" -> 2L, "b" -> 1L, "##u" -> 1L,
      "##ug" -> 4L, "##un" -> 2L, "##gs" -> 1L))
    def enc(text: String, maxWordLen: Int = 100): Seq[String] =
      Seq(text).toDF("t")
        .select(TrainingOps.wordpieceEncode(col("t"),
          vocab.keys.toSeq, maxWordLen).as("p"))
        .collect()(0).getSeq[String](0)
    // greedy longest-match with ## continuations
    assert(enc("hug pug bun") ===
      Seq("h", "##ug", "p", "##ug", "b", "##un"))
    // authentic BERT greedy non-coverage: "hugs" trained, but greedy
    // takes ##ug and then ##s no longer exists (merged into ##gs)
    assert(enc("hugs") === Seq("[UNK]"))
    // off-alphabet word and word-initial-only mismatch → [UNK]
    // ("ug" starts a word but only ##ug / ##u exist)
    assert(enc("xyz ug") === Seq("[UNK]", "[UNK]"))
    // maxWordLen: too-long words collapse to [UNK] without matching
    assert(enc("hug", maxWordLen = 2) === Seq("[UNK]"))
    // tokens containing '#' are dropped exactly as the trainer drops
    // them; empties vanish
    assert(enc("hug #x  hug") === Seq("h", "##ug", "h", "##ug"))
  }

  test("globalRank: exact 1-based ranks in order, desc keys, collision guard") {
    val d = (1L to 97L).map(i => (i, (i * 37) % 101)).toDF("id", "v")
    // ascending (v, id): rank must equal the orderBy position
    val asc = TrainingOps.globalRank(d, Seq(col("v"), col("id")),
        numPartitions = 7)
      .orderBy("rank").collect()
    val expectAsc = d.orderBy("v", "id").collect()
    assert(asc.length === 97)
    asc.zip(expectAsc).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.getAs[Long]("rank") === i + 1L)
      assert(got.getAs[Long]("id") === want.getAs[Long]("id"))
    }
    // descending first key
    val desc = TrainingOps.globalRank(d, Seq(col("v").desc, col("id")),
        numPartitions = 7)
      .orderBy("rank").collect()
    assert(desc.head.getAs[Long]("v") ===
      d.agg(max("v")).collect()(0).getLong(0))
    assert(desc.map(_.getAs[Long]("rank")).toSeq === (1L to 97L))
    val e = intercept[IllegalArgumentException] {
      TrainingOps.globalRank(d.withColumnRenamed("v", "rank"),
        Seq(col("id")))
    }
    assert(e.getMessage.contains("rank"), e.getMessage)
  }
  test("spanCorrupt: reconstruction, contiguous sentinels, determinism") {
    val df = Seq.tabulate(50)(i =>
      (i.toLong, (0 until 40).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("id", "text") :: Nil
    val corrupted = TrainingOps.spanCorrupt(df.head, "id", "text",
      maskRate = 0.3, salt = "sc")
    val rows = corrupted.collect()
    assert(rows.length === 50)
    var sawSpan = false
    rows.foreach { r =>
      val (n, inp, tgt) = (r.getInt(1), r.getString(2), r.getString(3))
      if (n > 0) sawSpan = true
      // target ends with the closing sentinel
      assert(tgt.endsWith(s"<extra_id_$n>"), tgt)
      // sentinels appear contiguously 0..n-1 in BOTH input and target
      val sentsIn = "<extra_id_(\\d+)>".r.findAllMatchIn(inp)
        .map(_.group(1).toInt).toSeq
      assert(sentsIn === (0 until n), s"input sentinels: $sentsIn")
      val sentsT = "<extra_id_(\\d+)>".r.findAllMatchIn(tgt)
        .map(_.group(1).toInt).toSeq
      assert(sentsT === (0 to n), s"target sentinels: $sentsT")
      // splicing each span back into the input reconstructs the text
      val spans = tgt.split("<extra_id_\\d+>").map(_.trim)
        .filter(_.nonEmpty)
      assert(spans.length === n)
      var rebuilt = inp
      (0 until n).foreach { k =>
        rebuilt = rebuilt.replace(s"<extra_id_$k>", spans(k))
      }
      val orig = r.getLong(0)
      assert(rebuilt.replaceAll("\\s+", " ").trim ===
        (0 until 40).map(j => s"w${orig}_$j").mkString(" "))
    }
    assert(sawSpan) // rate 0.3 over 2000 tokens must mask something
    // deterministic under repartition and rerun
    val re = TrainingOps.spanCorrupt(df.head.repartition(7), "id", "text",
      maskRate = 0.3, salt = "sc")
    assert(corrupted.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
    // blank docs drop; rate bounds enforced
    val blank = Seq((1L, "  ")).toDF("id", "text")
    assert(TrainingOps.spanCorrupt(blank, "id", "text").count() === 0)
    intercept[IllegalArgumentException] {
      TrainingOps.spanCorrupt(df.head, "id", "text", maskRate = 1.0)
    }
  }
  test("exportPackedSequences: in-order concatenation, budget-bounded packs") {
    val docs = Seq(
      (1L, "a", "one two three", 3L), (2L, "a", "four five", 2L),
      (3L, "a", "six", 1L), (4L, "b", "solo doc", 2L),
      (5L, "a", "seven eight nine ten", 4L)
    ).toDF("id", "shard", "text", "toks")
    val got = TrainingOps.exportPackedSequences(docs, "shard", "id",
        "text", col("toks"), budget = 5L, sep = " | ")
      .orderBy("shard", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    // shard a offsets before each doc: 0,3,5,6 -> pack ids 0,0,1,1
    assert(got === Seq(
      ("a", 0L, 2L, 5L, "one two three | four five"),
      ("a", 1L, 2L, 5L, "six | seven eight nine ten"),
      ("b", 0L, 1L, 2L, "solo doc")))
    // deterministic under repartition
    val re = TrainingOps.exportPackedSequences(docs.repartition(5),
        "shard", "id", "text", col("toks"), budget = 5L, sep = " | ")
      .orderBy("shard", "pack_id").collect().toSeq
    assert(re === TrainingOps.exportPackedSequences(docs, "shard", "id",
        "text", col("toks"), budget = 5L, sep = " | ")
      .orderBy("shard", "pack_id").collect().toSeq)
  }
  test("prefixLmSplit: prefix+suffix reconstruct, k in [1, n-1], deterministic") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "x y"), (3L, "solo"), (4L, ""), (5L, "  ")
    ).toDF("id", "text")
    val got = TrainingOps.prefixLmSplit(df, "id", "text")
    val rows = got.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getString(3), r.getString(4)))).toMap
    // short/empty/blank docs drop
    assert(rows.keySet === Set(1L, 2L))
    rows.foreach { case (_, (n, k, pre, tgt)) =>
      assert(k >= 1 && k <= n - 1)
      assert(pre.split(" ").length === k)
      assert((pre + " " + tgt).split(" ").length === n)
    }
    // doc 2 has n=2 -> k must be exactly 1
    assert(rows(2L)._2 === 1)
    assert(rows(2L)._3 === "x" && rows(2L)._4 === "y")
    // deterministic under repartition
    val re = TrainingOps.prefixLmSplit(df.repartition(3), "id", "text")
    assert(got.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
  }

  test("fimSplit: segments reconstruct, arms dispatch at the declared rates, deterministic") {
    val df = spark.range(0, 400)
      .selectExpr("id", "concat('tok', id % 7, ' a b c d e f g h') AS text")
    val got = TrainingOps.fimSplit(df, "id", "text", fimRate = 0.9,
      salt = "fimspec")
    val rows = got.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getInt(3), r.getInt(4), r.getString(5)))
    assert(rows.length === 400)
    val armCounts = rows.groupBy(_._3).view.mapValues(_.length).toMap
    // 0.45/0.45/0.1 over 400 docs — allow wide slack, but all three
    // arms must appear and plain must be the clear minority
    assert(armCounts.keySet === Set("psm", "spm", "plain"))
    assert(armCounts("plain") < armCounts("psm"))
    assert(armCounts("plain") < armCounts("spm"))
    rows.foreach { case (id, n, arm, lo, hi, out) =>
      assert(n === 9)
      val orig = s"tok${id % 7} a b c d e f g h"
      arm match {
        case "plain" =>
          assert(lo === 0 && hi === 0 && out === orig)
        case "psm" =>
          val m = "(?s)^<PRE> (.*) <SUF> (.*) <MID> (.*)$".r
          val m(p, sfx, mid) = out
          assert(Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ") === orig)
          assert(p.split(" ").count(_.nonEmpty) === lo)
          assert(mid.split(" ").count(_.nonEmpty) === hi - lo)
        case "spm" =>
          val m = "(?s)^<SUF> (.*) <PRE> (.*) <MID> (.*)$".r
          val m(sfx, p, mid) = out
          assert(Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ") === orig)
          assert(0 <= lo && lo <= hi && hi <= n)
      }
    }
    // short docs stay plain regardless of the arm uniform
    val short = TrainingOps.fimSplit(
      Seq((1L, "solo"), (2L, "")).toDF("id", "text"), "id", "text")
    short.collect().foreach(r => assert(r.getString(2) === "plain"))
    // deterministic under repartition
    val re = TrainingOps.fimSplit(df.repartition(7), "id", "text",
      fimRate = 0.9, salt = "fimspec")
    assert(got.orderBy("id").collect().toSeq ===
      re.orderBy("id").collect().toSeq)
  }

  test("q215 tokenizer evaluation: cross-family invariants hold " +
      "(q179's checks, carried to its four-family successor)") {
    val rows = graft.SparkEntry.queries("q215_tokenizer_eval4")(
        spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("bpe", "byte_bpe", "unigram", "wordpiece"))
    val nDocs = rows.head.getLong(1)
    assert(nDocs > 0)
    rows.foreach { r =>
      assert(r.getLong(1) === nDocs)            // same corpus per family
      assert(r.getLong(2) === nDocs * 3)        // 3 planted words per doc
      assert(r.getLong(3) >= r.getLong(2))      // pieces >= words
      assert(r.getLong(4) > 0)                  // some vocab utilized
      // fertility_micro = floor(total_pieces*1e6 / total_words), >= 1 word
      assert(r.getLong(6) === r.getLong(3) * 1000000L / r.getLong(2))
      assert(r.getLong(6) >= 1000000L)
    }
    val byFam = rows.map(r => r.getString(0) -> r).toMap
    // BPE, byte-BPE and unigram cover every word by construction
    // (single chars / the 256-byte alphabet stay in vocab); only
    // greedy WordPiece may emit [UNK]
    assert(byFam("bpe").getLong(5) === 0L)
    assert(byFam("byte_bpe").getLong(5) === 0L)
    assert(byFam("unigram").getLong(5) === 0L)
    val wp = byFam("wordpiece")
    // a word that collapses to [UNK] contributes exactly 1 piece, so
    // unk occurrences can never exceed total words
    assert(wp.getLong(5) >= 0L && wp.getLong(5) <= wp.getLong(2))
    // byte-BPE's hex seeding doubles symbols per word pre-merge: at
    // equal merge budget its fertility is >= char-BPE's
    assert(byFam("byte_bpe").getLong(6) >= byFam("bpe").getLong(6))
  }

  test("lengthBatching: sorted batches, per-batch max padding, Scala mirror") {
    import spark.implicits._
    // 10 docs with token counts 1..10 (doc i has i words), batch 3
    val docs = (1 to 10).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(4)
    val got = TrainingOps.lengthBatching(docs, "doc_id", "text",
        batchSize = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    // mirror: order by (tokens desc, id) → ranks; batch = (rank-1)/3
    val order = (1 to 10).map(i => (i.toLong, i))
      .sortBy { case (id, n) => (-n, id) }
    val want = order.zipWithIndex.map { case ((id, n), idx) =>
      val b = idx / 3
      val bmax = order.slice(b * 3, b * 3 + 3).map(_._2).max
      id -> ((n, b.toLong, bmax, bmax - n))
    }.toMap
    assert(got === want)
    // sorted batching wastes less than naive id-order batching
    val sortedWaste = got.values.map(_._4).sum
    val naive = (1 to 10).grouped(3).flatMap { g =>
      val m = g.max; g.map(m - _)
    }.sum
    assert(sortedWaste <= naive)
  }

  test("tokenizer store: every family round-trips and serves identically") {
    import spark.implicits._
    val corpus = (Seq.fill(8)("aba bab abab") ++ Seq.fill(4)("bc abc"))
      .toDF("text")
    val probe = Seq("ababab", "abc", "zzz").toDF("text")
    def served(m: TrainingOps.TokenizerModel): Seq[Seq[String]] =
      probe.select(TrainingOps.encodeWith(col("text"), m).as("p"))
        .collect().map(_.getSeq[String](0).toSeq).toSeq

    val bpe = TrainingOps.BpeModel(
      TrainingOps.trainBpe(corpus, "text", numMerges = 3)
        .orderBy("merge_idx").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)
    val wpMerges = TrainingOps.trainWordPiece(corpus, "text", numMerges = 3)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val wp = TrainingOps.WordPieceModel(
      TrainingOps.wordPieceVocab(corpus, "text", wpMerges)
        .collect().map(_.getString(0)).toSeq)
    val uni = TrainingOps.UnigramModel(
      TrainingOps.trainUnigram(corpus, "text", seedSize = 8)
        .collect().map(r => (r.getString(0), r.getLong(2))).toSeq)

    for ((m, pfx) <- Seq(bpe -> "tokst_b", wp -> "tokst_w", uni -> "tokst_u")) {
      TrainingOps.writeTokenizer(spark, pfx, m)
      val back = TrainingOps.readTokenizer(spark, pfx)
      assert(back === m, pfx) // params AND row order survive
      assert(served(back) === served(m), pfx) // byte-identical serving
    }
    // truncation fails fast: rewrite the rows table minus one row
    // behind the meta's back (parquet tables have no DELETE)
    val schema = spark.table("tokst_b_tok_rows").schema
    val keep = spark.table("tokst_b_tok_rows")
      .filter(col("idx") > 0).collect().toSeq
    spark.createDataFrame(
        spark.sparkContext.parallelize(keep), schema)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable("tokst_b_tok_rows")
    val e = intercept[IllegalArgumentException] {
      TrainingOps.readTokenizer(spark, "tokst_b")
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("byte-level BPE: hand merges, UNK provably impossible on arbitrary input, store round-trip") {
    import spark.implicits._
    // "aa"×2 + "ab"×1: bytes 61/62. Pairs: (61,61)=2, (61,62)=1 →
    // merge 0 = (61,61); after it only "ab" has a pair → (61,62)
    val corpus = Seq("aa aa ab").toDF("text")
    val merges = TrainingOps.trainBpeBytes(corpus, "text", numMerges = 5)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges === Seq((0, "61", "61", 2L), (1, "61", "62", 1L)))
    val m = merges.map(x => (x._2, x._3))

    // serving: trained words segment per the merges; ARBITRARY input
    // (emoji, CJK, control bytes, words never seen) encodes with the
    // pieces re-concatenating to the exact UTF-8 hex — no UNK, no
    // drop, by construction
    def hexOf(s: String): String =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    val probes = Seq("aa", "ab", "aab", "z", "é", "日本語", "😊ok",
      "ab", "")
    val got = probes.toDF("text")
      .select(col("text"),
        TrainingOps.byteBpeEncode(col("text"), m).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("aa") === Seq("6161"))
    assert(got("ab") === Seq("6162"))
    assert(got("aab") === Seq("6161", "62")) // greedy left-to-right
    probes.foreach { w =>
      assert(got(w).mkString("") === hexOf(w),
        s"'$w': pieces must re-concatenate to the exact UTF-8 hex")
      assert(got(w).forall(_.nonEmpty), s"'$w': no empty piece")
    }
    // the char-level trainer's separator drop does NOT exist here:
    // a separator-carrying token still encodes (as its byte)
    assert(got("") === Seq("1f"))

    // store round-trip serves byte-identically through encodeWith
    val model = TrainingOps.ByteBpeModel(m)
    TrainingOps.writeTokenizer(spark, "tokst_bb", model)
    val back = TrainingOps.readTokenizer(spark, "tokst_bb")
    assert(back === model)
    val viaBack = probes.toDF("text")
      .select(col("text"),
        TrainingOps.encodeWith(col("text"), back).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaBack === got)
  }

  test("renderChatTemplate: in-aggregate ordering, null turns render empty") {
    import spark.implicits._
    val turns = Seq(
      (1L, 20L, 2L, "assistant", "hi there"),
      (1L, 10L, 1L, "user", "hello"),
      (1L, 20L, 1L, "user", "also-at-20"), // ts tie -> event_id order
      (2L, 5L, 1L, null, null))
      .toDF("conv", "ts", "eid", "role", "content")
    def render(df: org.apache.spark.sql.DataFrame) =
      TrainingOps.renderChatTemplate(df, "conv", "ts", "eid",
        "role", "content")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2)))).toMap
    val r = render(turns)
    assert(r(1L) === ((3L,
      "<|user|>hello<|end|><|user|>also-at-20<|end|>" +
        "<|assistant|>hi there<|end|>")))
    // a damaged turn renders empty, never nulls the transcript
    assert(r(2L) === ((1L, "<||><|end|>")))
    // arrival order is irrelevant: sort happens inside the aggregate
    assert(render(turns.repartition(7)) === r)

    // planted hot conversation: maxTurns fails fast NAMING it (keys-
    // only count, before any turn list buffers)
    val hot = (1 to 50).map(i => (9L, i.toLong, i.toLong, "user", s"m$i"))
      .toDF("conv", "ts", "eid", "role", "content")
      .union(turns)
    val e = intercept[IllegalArgumentException] {
      TrainingOps.renderChatTemplate(hot, "conv", "ts", "eid",
        "role", "content", maxTurns = Some(10L))
    }
    assert(e.getMessage.contains("(9)") && e.getMessage.contains("50"),
      e.getMessage)
    // under the cap: identical output to the unguarded call
    val capped = TrainingOps.renderChatTemplate(turns, "conv", "ts",
        "eid", "role", "content", maxTurns = Some(10L))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getString(2)))).toMap
    assert(capped === r)
  }

  test("sftLossSpans: render parity, prefix masked, no-loss convs drop, guard") {
    import spark.implicits._
    val turns = Seq(
      (1L, 20L, 2L, "assistant", "hi there"),
      (1L, 10L, 1L, "user", "hello"),
      (1L, 20L, 1L, "user", "also-at-20"),
      (1L, 30L, 1L, "assistant", "bye"),
      (2L, 5L, 1L, "user", "never answered"), // no assistant → no rows
      (3L, 1L, 1L, "assistant", null)) // damaged content → empty span body
      .toDF("conv", "ts", "eid", "role", "content")
    val rendered = TrainingOps.renderChatTemplate(turns, "conv", "ts",
        "eid", "role", "content")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val spans = TrainingOps.sftLossSpans(turns, "conv", "ts", "eid",
        "role", "content")
      .orderBy("conv_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    // THE contract: substring(conversation, start, end) is the
    // assistant turn's content + <|end|>, and the char before the
    // span is the '>' of the masked <|role|> prefix
    for ((conv, _, s, e) <- spans) {
      val sub = rendered(conv).substring(s.toInt, e.toInt)
      assert(sub.endsWith("<|end|>"), sub)
      assert(rendered(conv).charAt(s.toInt - 1) === '>')
    }
    assert(spans.map(t => (t._1, t._2)).toSeq ===
      Seq((1L, 0), (1L, 1), (3L, 0)))
    val conv1 = rendered(1L)
    assert(conv1.substring(spans(0)._3.toInt, spans(0)._4.toInt) ===
      "hi there<|end|>")
    assert(conv1.substring(spans(1)._3.toInt, spans(1)._4.toInt) ===
      "bye<|end|>")
    // damaged content: span is exactly "<|end|>"
    assert(rendered(3L).substring(spans(2)._3.toInt, spans(2)._4.toInt)
      === "<|end|>")
    // conv 2 emitted nothing
    assert(!spans.exists(_._1 == 2L))
    // partitioning-invariant (offsets fold inside the aggregate)
    val re = TrainingOps.sftLossSpans(turns.repartition(5), "conv",
        "ts", "eid", "role", "content")
      .orderBy("conv_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(re.toSeq === spans.toSeq)
    // same fail-fast as the renderer
    val hot = (1 to 50).map(i => (9L, i.toLong, i.toLong, "user", s"m$i"))
      .toDF("conv", "ts", "eid", "role", "content").union(turns)
    val e = intercept[IllegalArgumentException] {
      TrainingOps.sftLossSpans(hot, "conv", "ts", "eid", "role",
        "content", maxTurns = Some(10L))
    }
    assert(e.getMessage.contains("(9)") && e.getMessage.contains("50"),
      e.getMessage)
  }

  test("sftLossSpans: full (order, tie) ties sort by the RENDERED piece, " +
      "matching the renderer") {
    import spark.implicits._
    // roles "a"/"ab" on a full (ts, eid) tie: a (role, content) sort
    // would put "a" first, but the renderer compares rendered pieces
    // where 'b' (0x62) < '|' (0x7C) puts "<|ab|>…" first — the spans
    // fold must follow the renderer or every later offset shifts
    val turns = Seq(
      (1L, 10L, 1L, "a", "x"),
      (1L, 10L, 1L, "ab", ""))
      .toDF("conv", "ts", "eid", "role", "content")
    val rendered = TrainingOps.renderChatTemplate(turns, "conv", "ts",
        "eid", "role", "content")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rendered(1L) === "<|ab|><|end|><|a|>x<|end|>")
    val spans = TrainingOps.sftLossSpans(turns, "conv", "ts", "eid",
        "role", "content", lossRole = "a")
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(spans.length === 1)
    assert(rendered(1L).substring(spans(0)._1.toInt,
      spans(0)._2.toInt) === "x<|end|>")
  }

  test("snakeShards: serpentine deal over sorted costs, exact balance") {
    // costs 8..1 over 2 shards: snake order 0,1,1,0,0,1,1,0 —
    // shard 0 gets 8+5+4+1 = 18, shard 1 gets 7+6+3+2 = 18
    val df = (1 to 8).map(i => (i.toLong, (9 - i).toLong))
      .toDF("id", "c").repartition(3)
    val out = TrainingOps.snakeShards(df, "id", col("c"), nShards = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1L) === ((8L, 0)) && out(2L) === ((7L, 1)))
    assert(out(3L) === ((6L, 1)) && out(4L) === ((5L, 0)))
    assert(out(5L) === ((4L, 0)) && out(6L) === ((3L, 1)))
    assert(out(7L) === ((2L, 1)) && out(8L) === ((1L, 0)))
    val totals = out.values.groupBy(_._2).view
      .mapValues(_.map(_._1).sum).toMap
    assert(totals(0) === totals(1))
  }

  test("chunkWindows: overlapping starts, short final chunk, full coverage, empty docs drop") {
    import spark.implicits._
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, "a b c"), (3L, ""), (4L, "   "),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .repartition(2)
    val out = TrainingOps.chunkWindows(docs, "doc_id", "text",
        window = 24, stride = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2))
    // doc 1 (40 tokens): starts 0, 16, 32 — lengths 24, 24, 8
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((0L, 0L, 24L), (1L, 16L, 24L), (2L, 32L, 8L)))
    assert(d1(0)._5.startsWith("w1 w2 ") && d1(0)._5.endsWith(" w24"))
    assert(d1(1)._5.startsWith("w17 ") && d1(1)._5.endsWith(" w40"))
    assert(d1(2)._5 === (33 to 40).map(i => s"w$i").mkString(" "))
    // overlap: tokens 17-24 appear in chunks 0 AND 1 (stride < window)
    assert(d1(0)._5.contains("w17") && d1(1)._5.contains("w17"))
    // short doc: one short chunk; empty/blank/null docs produce none
    assert(out.filter(_._1 == 2L).toSeq ===
      Seq((2L, 0L, 0L, 3L, "a b c")))
    assert(!out.exists(t => t._1 >= 3L))
  }
}
