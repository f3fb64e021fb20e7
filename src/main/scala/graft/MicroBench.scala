package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted A/B micro-bench harness: runs named plan variants of one
  * operator back-to-back on the SAME JVM/host (alternating, min of N)
  * so formulation comparisons are free of the cross-round host-IO
  * variance that clouds BENCH_r{N} diffs. Used for the r10 q172
  * root-cause (single-scan when-dispatch vs the r8 three-arm
  * filter+union) — keep scenarios additive, they are cheap evidence.
  *
  * `runMain graft.MicroBench <scenario> [iters]`, scenario ∈
  * {ul2, pq_encode, q97, ivfadc, semdedup, semdedup2l,
  * semdedup_recall, paradedup, storeexport, bytebpe, scd2buckets,
  * saltedjoin, bloomjoin, lcp, snakeshards, clustersplit, qnorm,
  * kcore}. Reads `SPARK_GRAFT_SF_DIR` (default sf0.1).
  */
object MicroBench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeIt(mk: () => DataFrame): Double = {
    val t0 = System.nanoTime()
    force(mk())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val scenario = args.headOption.getOrElse("ul2")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.TrainingOps

    // Synthetic-corpus row count for the generated-data scenarios
    // (semdedup, lcp, snakeshards, clustersplit, qnorm, kcore) — the
    // knob behind SCALE.md's 1M vs 10M sub-linearity rows. Parameters
    // that must scale WITH the corpus to keep the documented cost
    // shape (semdedup's nlist: cells sized ~490 rows at any N) derive
    // from it below.
    val nRows = sys.env.get("SPARK_GRAFT_N").map(_.toLong)
      .getOrElse(1000000L)

    val variants: Seq[(String, () => DataFrame)] = scenario match {
      case "ul2" =>
        def docs = spark.read
          .parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        // the r9 baseline: ONE corpus scan, per-row when-dispatch,
        // WITHOUT the pre-spread exchange (spread=false reproduces
        // it — ul2Mixture gained the spread as the r10 fix)
        val single = () => TrainingOps.ul2Mixture(docs, "doc_id",
          "text", rSalt = "t5r8", sSalt = "plmu8", xSalt = "t5x8",
          spread = false)
          .orderBy("objective", "doc_id")
        // r8 shape: three arm-filtered scans + union
        val threeArm = () => {
          val asg = TrainingOps.splitAssign(docs, "doc_id",
            Seq("r" -> 0.5, "s" -> 0.25, "x" -> 0.25), salt = "ul2")
          def corrupt(obj: String, rate: Double, salt: String) =
            TrainingOps.spanCorrupt(
                asg.filter(col("split") === obj), "doc_id", "text",
                rate, salt)
              .select(lit(obj).as("objective"), col("doc_id"),
                col("input_text"), col("target_text"))
          val sArm = TrainingOps.prefixLmSplit(
              asg.filter(col("split") === "s"), "doc_id", "text",
              "plmu8")
            .select(lit("s").as("objective"), col("doc_id"),
              col("prefix_text").as("input_text"), col("target_text"))
          corrupt("r", 0.15, "t5r8").union(corrupt("x", 0.5, "t5x8"))
            .union(sArm).orderBy("objective", "doc_id")
        }
        // the shipped r10 shape: single scan with the CPU-bound fold
        // pass spread across cores first (the minhashCandidates
        // pre-exchange discipline — a small parquet is ONE input
        // split, so the per-row folds otherwise run on one task)
        val spread = () => TrainingOps.ul2Mixture(docs, "doc_id",
          "text", rSalt = "t5r8", sSalt = "plmu8", xSalt = "t5x8")
          .orderBy("objective", "doc_id")
        Seq("single_unspread" -> single, "three_arm" -> threeArm,
          "single_spread" -> spread)
      case "pq_encode" =>
        // 1M synthetic 64-d vectors (the ScaleSmoke pq corpus), the
        // same hash-rank codebook: native graft_pq_encode kernel vs
        // the relational array_min-over-structs form it replaced
        val vecs = spark.range(nRows).select(col("id"),
          expr("transform(sequence(0, 63), " +
            "j -> cast(sin(id * 64 + j) as float))").as("embedding"))
          .repartition(32).cache()
        vecs.count()
        val cb = graft.llm.Similarity.pqCodebook(vecs, "id",
          "embedding", 64, 8, 16, salt = "smoke")
        val native = () => graft.llm.Similarity.pqEncode(
          vecs, "id", "embedding", cb, 64, 8, 16)
        val relational = () => graft.llm.Similarity.pqEncodeRelational(
          vecs, "id", "embedding", cb, 64, 8, 16)
        Seq("native" -> native, "relational" -> relational)
      case "q97" =>
        // the full q97 plan (jaccardPairs → connectedComponents →
        // representative) exactly as the bench runs it — the job-count
        // probe for the many-small-jobs profile the r10 verdict flagged
        val run = () => graft.SparkEntry
          .queries("q97_dedup_resolve")(spark, sfDir)
        Seq("q97" -> run)
      case "ivfadc" =>
        // the production IVFADC tier at 1M×64d (Lloyd arms + native
        // cell kernel + in-aggregate pruning) vs the flat bounded-
        // state ADC scan over the SAME Lloyd codebook — the value
        // of the coarse pruning at scale (nprobe/nlist = 8/64: each
        // query scans ~1/8 of the corpus's codes). The SAMPLED tier
        // is deliberately absent here: its interpreted fold is the
        // oracle-replay arm, already exercised at bench scale (q214).
        graft.expressions.NativeFunctions.register(spark)
        val vecs = spark.range(nRows).select(col("id"),
          expr("transform(sequence(0, 63), " +
            "j -> cast(sin(id * 64 + j) as float))").as("embedding"))
          .repartition(32).cache()
        vecs.count()
        def queriesOf(n: Long) =
          vecs.filter(col("id") % (nRows / n) === 0).cache()
        val cbLloyd = graft.llm.Similarity.pqCodebookLloyd(vecs, "id",
          "embedding", 64, 8, 16)
        def ivf(qs: org.apache.spark.sql.DataFrame) = () =>
          graft.llm.Similarity.topKIvfAdc(qs, vecs,
            "id", "id", "embedding", dim = 64, nsub = 8, ncent = 16,
            nlist = 64, nprobe = 8, k = 100, production = true)
        def flat(qs: org.apache.spark.sql.DataFrame) = () =>
          graft.llm.Similarity.pqAdcTopK(qs, vecs,
            "id", "id", "embedding", cbLloyd, 64, 8, 16, k = 100)
        val q100 = queriesOf(100L); q100.count()
        val q1k = queriesOf(1000L); q1k.count()
        Seq("ivfadc_production_100q" -> ivf(q100),
          "flat_adc_100q" -> flat(q100),
          "ivfadc_production_1000q" -> ivf(q1k),
          "flat_adc_1000q" -> flat(q1k))
      case "semdedup" | "semdedup2l" | "semdedup_recall" =>
        // semanticDedup at 1M×64d, production arm: nlist controls the
        // per-cell quadratic (1M/2048 ≈ 490 rows/cell → ~120k pairs/
        // cell → ~245M in-cell cosines corpus-wide, vs the 5·10¹¹ of
        // all-pairs). The driver-side Lloyd is the other knob: cost ∝
        // sample·nlist·dim·iters, so the scenario trains on a
        // 4-per-cell sample at 4 iterations (the honest trade SCALE.md
        // documents — past ~10⁴ cells, train hierarchically). Every
        // 10th vector is a planted 1.0009-scaled near-dup of its
        // predecessor, so the drop count is known and asserted.
        // maxCellRows rides at 12k: UNIFORM random vectors are
        // Lloyd's worst case (no cluster structure), so cells skew
        // ~10x around the 488-row mean — the first run's 5k cap
        // fail-fasted on a 5213-row cell, which is the guard doing
        // its job; real embedding corpora cluster far tighter.
        graft.expressions.NativeFunctions.register(spark)
        // hash-derived components, NOT sin(i·64+j): sinusoidal ids
        // have near-parallel pairs at every Δ with 64Δ ≈ 0 (mod 2π),
        // which would plant unknown extra near-dups; hash components
        // make cos > 0.999 between distinct ids astronomically
        // unlikely at dim 64
        // nRows·2048/1M, not nRows/488: the latter rounds 1M to 2049,
        // silently drifting off the committed SCALE.md 1M baseline
        // (65.3 s, measured at nlist=2048) — this form reproduces
        // 2048 at the 1M default exactly and scales the same way
        val sdNlist = math.max(64, (nRows * 2048L / 1000000L).toInt)
        val vecs = spark.range(nRows).select(col("id"),
          expr("""transform(sequence(0, 63), j -> cast(
            (pmod(xxhash64((CASE WHEN id % 10 = 9 THEN id - 1
                            ELSE id END) * 64 + j, 7L), 2003)
              / 1001.5 - 1.0)
            * (CASE WHEN id % 10 = 9 THEN 1.0009 ELSE 1.0 END)
            as float))""").as("embedding"))
          .repartition(32).cache()
        vecs.count()
        // nlist scales WITH the corpus (n·2048/1M: 1M → exactly 2048)
        // so cell size — and with it the per-cell quadratic — stays
        // CONSTANT as N grows: the cell-bounded claim under test
        // semdedup2l runs the TWO-LEVEL hierarchical quantizer arm —
        // the r13 remedy for the flat tier's n·nlist·dim assignment
        // wall (65 s @1M → 3416 s @10M flat; two-level assigns in
        // ≈2√nlist·dim and trains each level on bounded samples).
        // semdedup_recall runs BOTH arms at 1M and reports drop-set
        // agreement (the SCALE.md recall row).
        val twoLevel = scenario == "semdedup2l"
        // the hierarchical arm rides samplePerCell 16 (vs the flat
        // tier's 4) and a higher cell cap. Both follow from the same
        // physics: the flat trainer costs nlist²·spc·dim·iters, which
        // is what forced spc=4 past 2k cells — the two-level trainer
        // is nlist^1.5·spc, so spc=16 is STILL ~11× (1M) to ~36×
        // (10M) cheaper than the flat trainer it replaces, and the
        // extra sample is what keeps sub-cells balanced: at spc=4 the
        // per-super Lloyd saw ~4 points per sub-cell on UNIFORM
        // random vectors (no cluster structure — Lloyd's worst case)
        // and produced cells skewed far past the flat tier's ~10×,
        // blowing the in-cell quadratic up ~10× (measured: the first
        // 1M run sat in DotProduct for 8+ min vs flat's 65 s total).
        // Driver bound: the 10M sample is 20480·16 = 327k vectors
        // ≈ 170 MB — inside the 1 GiB maxResultSize with margin.
        def sd(two: Boolean) = graft.llm.Dedup.semanticDedup(vecs, "id",
          "embedding", dim = 64, nsub = 8, nlist = sdNlist,
          tauMicro = 999000L, production = true, maxIter = 4,
          samplePerCell = if (two) 16 else 4,
          maxCellRows = if (two) 24000L else 12000L, twoLevel = two)
        val run = () => sd(twoLevel)
        val check = () => {
          val dropped = sd(twoLevel).filter(!col("kept")).count()
          // planted copies drop iff they share their original's cell;
          // planted pairs are near-identical points, so co-location
          // is near-certain — demand the bulk of the plant found
          require(dropped >= (nRows / 10L) * 9L / 10L &&
              dropped <= nRows / 10L + 1000L,
            s"expected ~${nRows / 10L} planted drops, got $dropped")
          spark.range(1).toDF("ok")
        }
        val recall = () => {
          // drop-set agreement flat vs two-level on the SAME corpus:
          // near-identical planted pairs co-locate under either
          // quantizer, so both arms should find (nearly) the same set
          val flatD = sd(false).filter(!col("kept")).select("vec_id")
            .cache()
          val twoD = sd(true).filter(!col("kept")).select("vec_id")
            .cache()
          val nf = flatD.count(); val nt = twoD.count()
          val agree = flatD.intersect(twoD).count()
          println(s"""{"metric":"semdedup_recall","flat_drops":$nf,""" +
            s""""two_drops":$nt,"agree":$agree}""")
          require(agree * 100L >= nf * 99L && nt <= nf + nf / 100L + 10L,
            s"two-level drop set diverges: flat=$nf two=$nt agree=$agree")
          spark.range(1).toDF("ok")
        }
        val tag = if (twoLevel) "semdedup2l" else "semdedup"
        // past 1M a single flat execution runs ~an hour (assignment is
        // n·nlist·dim work and Lloyd is sample·nlist·dim·iters — both
        // grow with the corpus-scaled nlist), so the scale run emits
        // ONLY the checked variant (it both times the full pipeline
        // and asserts the planted drops) — pair it with
        // SPARK_GRAFT_NOWARMUP=1 for one execution total: at
        // hour-scale, JIT warmup is noise
        if (scenario == "semdedup_recall")
          Seq(s"semdedup_recall_${nRows / 1000000L}m" -> recall)
        else if (nRows > 1000000L)
          Seq(s"${tag}_${nRows / 1000000L}m_checked" -> check)
        else
          Seq(s"${tag}_${nRows / 1000000L}m" -> run,
            s"${tag}_${nRows / 1000000L}m_checked" -> check)
      case "paradedup" =>
        // paragraphDedup at N docs (the r14 keys-only plan: winner
        // election and per-doc kept-index lists carry (hash, id, idx)
        // keys, document text crosses the wire ONCE in the by-id join
        // back). Planted structure: every doc = a banner shared by
        // its id%64 source group + a hash-distinct 20-word body + a
        // footer shared by its id%16 group — so distinct paragraphs
        // corpus-wide = N bodies + 64 banners + 16 footers, and the
        // checked variant asserts exactly that (plus n_paras = 3 on
        // every doc). Text volume ~160 B/doc: at 10M the one
        // text-carrying exchange moves ~1.6 GB; the election
        // exchanges move 32-byte hashes + ids only.
        val docs = spark.range(nRows).select(col("id"),
          concat(
            lit("shared banner for source "),
            pmod(col("id"), lit(64)).cast("string"),
            lit(" subscribe to updates today\n\n"),
            concat_ws(" ", (0 until 20).map(i =>
              concat(lit("w"), pmod(xxhash64(col("id"), lit(i * 7919L)),
                lit(100000)).cast("string"))): _*),
            lit("\n\nlicense footer variant "),
            pmod(col("id"), lit(16)).cast("string")).as("text"))
          .repartition(32).cache()
        docs.count()
        def pd() = graft.llm.Dedup.paragraphDedup(docs, "id", "text")
        val run = () => pd()
        val check = () => {
          val a = pd().agg(
            sum(col("n_kept")).as("k"),
            sum(when(col("n_paras") === 3, 1L).otherwise(0L)).as("p3"))
            .head()
          require(a.getLong(0) == nRows + 64L + 16L,
            s"expected ${nRows + 80L} kept paragraphs, got ${a.getLong(0)}")
          require(a.getLong(1) == nRows,
            s"expected n_paras=3 on every doc, got ${a.getLong(1)}")
          spark.range(1).toDF("ok")
        }
        if (nRows > 1000000L)
          Seq(s"paradedup_${nRows / 1000000L}m_checked" -> check)
        else
          Seq(s"paradedup_${nRows / 1000000L}m" -> run,
            s"paradedup_${nRows / 1000000L}m_checked" -> check)
      case "storeexport" =>
        // the r14 export surface measured: FULL snapshot export vs
        // DELTA export of one night's appends (nRows/10) against an
        // nRows-doc signature store. The claim under test is the
        // handoff-volume one: the delta anti-join READS corpus-sized
        // keys but WRITES only the night — so the delta should track
        // the batch, the full export the corpus, and re-running the
        // full export every night is the cost the delta surface
        // removes. The checked variant asserts delta row counts =
        // the night's appends exactly and base ∪ delta ≡ a fresh
        // full snapshot (the spec contract, re-checked at scale).
        import graft.llm.Dedup
        spark.catalog.listTables().collect().map(_.name)
          .filter(_.startsWith("msx_store"))
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
        val corpus = spark.range(nRows).select(col("id"),
          concat_ws(" ", (0 until 20).map(i =>
            concat(lit("w"), pmod(xxhash64(col("id"), lit(i * 7919L)),
              lit(100000)).cast("string"))): _*).as("text"))
          .repartition(32).cache()
        corpus.count()
        Dedup.writeSignatureStore(corpus, "id", "text", "msx_store",
          buckets = 32)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-msx").toString
        Dedup.exportSignatureStoreSnapshot(spark, "msx_store",
          s"$tmp/base")
        val night = spark.range(nRows, nRows + nRows / 10)
          .select(col("id"), concat_ws(" ", (0 until 20).map(i =>
            concat(lit("f"), pmod(xxhash64(col("id"), lit(i * 7919L)),
              lit(100000)).cast("string"))): _*).as("text"))
          .repartition(32).cache()
        night.count()
        Dedup.appendToSignatureStore(night, "id", "text", "msx_store")
        val fullN = new java.util.concurrent.atomic.AtomicInteger
        val deltaN = new java.util.concurrent.atomic.AtomicInteger
        val full = () => {
          Dedup.exportSignatureStoreSnapshot(spark, "msx_store",
            s"$tmp/full${fullN.incrementAndGet()}")
          spark.range(1).toDF("ok")
        }
        val delta = () => {
          Dedup.exportSignatureStoreDelta(spark, "msx_store",
            Seq(s"$tmp/base"), s"$tmp/delta${deltaN.incrementAndGet()}")
          spark.range(1).toDF("ok")
        }
        val check = () => {
          val dh = spark.read.parquet(s"$tmp/delta1/hashes").count()
          require(dh == nRows / 10,
            s"delta hashes: expected ${nRows / 10}, got $dh")
          val chain = Dedup.readExportedSignatureStoreChain(spark,
            Seq(s"$tmp/base", s"$tmp/delta1"))
          val fullSnap = Dedup.readExportedSignatureStore(spark,
            s"$tmp/full1")
          require(chain.hashes.count() == fullSnap.hashes.count() &&
            chain.banded.count() == fullSnap.banded.count(),
            "base + delta must equal the full snapshot at the head")
          spark.range(1).toDF("ok")
        }
        Seq("export_full" -> full, "export_delta" -> delta,
          "export_chain_check" -> check)
      case "bytebpe" =>
        // byte-BPE vs char-BPE training cost at 1M docs, 6 merge
        // rounds each (the SCALE.md measurement the r11 verdict
        // asked for): the hex table seeds ~2× the symbols per word,
        // so the per-round delta aggregates fold longer symbol
        // strings — measure what that actually costs. Training cost
        // is incurred INSIDE the call (driver-looped incremental
        // rounds, each an action); the returned merge table is tiny.
        val docs = graft.ScaleSmoke.syntheticDocs(spark, 1000000L)
          .select(col("text")).repartition(32).cache()
        docs.count()
        val charBpe = () => TrainingOps.trainBpe(docs, "text",
          numMerges = 6)
        val byteBpe = () => TrainingOps.trainBpeBytes(docs, "text",
          numMerges = 6)
        Seq("char_bpe" -> charBpe, "byte_bpe" -> byteBpe)
      case "scd2buckets" =>
        // the bucketed scd2 table at 1M keys / 64 buckets: a 10-key
        // micro-batch must rewrite ONLY the ≤10 buckets its keys
        // hash into (asserted below on the committed layout), vs the
        // r10 whole-table rewrite shape retained here as the A/B arm
        // (read every current bucket + merge + write the full
        // table). Table seeded once, untimed; each timed call folds
        // a FRESH 10-key batch (monotone batch ids — replays are
        // no-ops by contract and would time nothing).
        val dir = java.nio.file.Files
          .createTempDirectory("mb_scd2").toString
        val table = s"$dir/table"
        // table size via SPARK_GRAFT_SCD2_KEYS (default 1M): the
        // sub-linearity claim is the 1M → 4M pair — the fold's cost
        // is O(dirty buckets), the rewrite's O(table)
        val nKeys = sys.env.getOrElse("SPARK_GRAFT_SCD2_KEYS",
          "1000000").toLong
        def batchDf(ids: Long*)(ts: Long) = {
          import spark.implicits._
          ids.map(i => (s"k$i", ts, s"v$ts")).toDF("k", "ts", "v")
        }
        val seed = spark.range(nKeys).select(
          concat(lit("k"), col("id")).as("k"), lit(0L).as("ts"),
          lit("v0").as("v"))
        require(graft.streaming.Streaming.applyScd2Batch(
          seed, 0L, "k", "ts", Seq("v"), "ts", table, nBuckets = 64))
        var nextBatch = 1L
        var nextTs = 1L
        val fold10 = () => {
          val b = nextBatch; nextBatch += 1
          val t = nextTs; nextTs += 1
          val touched = graft.streaming.Streaming.applyScd2Batch(
            batchDf(1L, 99L, 1234L, 7777L, 31337L, 400000L, 555555L,
              650000L, 810000L, 999999L)(t),
            b, "k", "ts", Seq("v"), "ts", table, nBuckets = 64)
          require(touched, s"batch $b must fold")
          // layout assertion: the just-committed version directory
          // holds ≤ 10 bucket partitions — the whole point
          val fs = new org.apache.hadoop.fs.Path(table)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val vers = fs.listStatus(new org.apache.hadoop.fs.Path(table))
            .filter(s => s.isDirectory &&
              s.getPath.getName.startsWith("v"))
            .map(s => s.getPath.getName.drop(1).toInt).max
          val nDirty = fs.listStatus(new org.apache.hadoop.fs.Path(
              table, s"v$vers"))
            .count(_.getPath.getName.startsWith("_bucket="))
          require(nDirty <= 10,
            s"10-key batch rewrote $nDirty buckets")
          spark.range(1).toDF("ok")
        }
        val wholeRewrite = () => {
          val t = nextTs; nextTs += 1
          val current = graft.streaming.Streaming
            .readScd2Table(spark, table)
          graft.ops.etl.scd2Merge(current,
              batchDf(1L, 99L, 1234L, 7777L, 31337L, 400000L, 555555L,
                650000L, 810000L, 999999L)(t),
              "k", "ts", Seq("v"), "ts")
            .write.mode("overwrite").parquet(s"$dir/whole_$t")
          spark.range(1).toDF("ok")
        }
        Seq("fold_dirty_buckets" -> fold10,
          "whole_table_rewrite" -> wholeRewrite)
      case "lcp" =>
        // 1M docs over 64 template sites, each with a planted ~55-char
        // chrome prefix followed by a unique body: groupBoilerplate's
        // sorted-extremes identity makes the cost ONE (min,max,count)
        // aggregate + a 64-row LCP scan — there is no per-pair arm to
        // A/B because pairwise LCP at 15.6k docs/site would be ~1.2e8
        // string compares per site; the measurement IS the claim that
        // the aggregate formulation stays corpus-linear
        val docs = spark.range(nRows).select(
          concat(lit("site"), (col("id") % 64).cast("string"))
            .as("site"),
          concat(lit("Breaking News Network site"),
            (col("id") % 64).cast("string"),
            lit(" | Home | Politics | Sports | "),
            sha2(col("id").cast("string"), 256)).as("text"))
          .repartition(32).cache()
        docs.count()
        val sortedExtremes = () => graft.llm.TextAnalysis
          .groupBoilerplate(docs, "site", "text")
        Seq(s"sorted_extremes_${nRows / 1000000L}m_64sites" -> sortedExtremes)
      case "snakeshards" =>
        // 1M rows into 64 shards: globalRank's range-parallel rank vs
        // the unpartitioned-window formulation every SQL cookbook
        // reaches for (ONE task sorts and numbers all rows) — same
        // output, spec-identical arithmetic, different scalability
        val rows = spark.range(nRows).select(col("id"),
            (expr("cast(conv(substr(sha2(cast(id as string), 256), " +
              "1, 8), 16, 10) as bigint)") % 4000 + 10).as("cost"))
          .repartition(32).cache()
        rows.count()
        val ranked = () => TrainingOps.snakeShards(
          rows, "id", col("cost"), 64)
        val window = () => {
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col("cost").desc, col("id"))
          rows.select(col("id"), col("cost").cast("long").as("cost"),
              (row_number().over(w).cast("long") - 1L).as("pos"))
            .select(col("id"), col("cost"),
              when(expr("(pos div 64) % 2 = 0"), col("pos") % 64)
                .otherwise(lit(63L) - col("pos") % 64)
                .cast("int").as("shard"))
        }
        Seq("global_rank" -> ranked,
          "single_partition_window" -> window)
      case "clustersplit" =>
        // 1M docs, 50k planted near-dup pairs: CC runs on the 50k-edge
        // list (local union-find tier), so the corpus-side cost under
        // measurement is ONE left join against the pair-participant
        // label table + the map-only cluster-id hash
        val docs = spark.range(nRows).select(col("id").as("doc_id"))
          .repartition(32).cache()
        docs.count()
        val pairs = spark.range(nRows / 20L).select(
          (col("id") * 3).as("doc_a"), (col("id") * 3 + 1).as("doc_b"))
          .cache()
        pairs.count()
        val run = () => graft.llm.Dedup.leakageSafeSplit(docs, "doc_id",
          pairs, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        Seq(s"split_${nRows / 1000000L}m_docs_${nRows / 20000L}k_pairs" -> run)
      case "qnorm" =>
        // 1M scored docs over 64 language groups, 1001-point global
        // grid: cost = one partitioned window pass (rank+count per
        // lang) + globalRank + two broadcast grid joins — the corpus
        // shuffles once for the window and once for the range rank,
        // never for the lookup
        val rows = spark.range(nRows).select(col("id"),
            concat(lit("lang"), (col("id") % 64).cast("string"))
              .as("grp"),
            (expr("cast(conv(substr(sha2(cast(id as string), 256), " +
              "1, 8), 16, 10) as bigint)") % 100000).as("score"))
          .repartition(32).cache()
        rows.count()
        val run = () => graft.llm.Selection.quantileNormalize(
          rows, "id", "grp", "score", nQuantiles = 1000)
        Seq(s"qnorm_${nRows / 1000000L}m_64langs" -> run)
      case "kcore" =>
        // 1M nodes in the q230 per-group shape (triangle + 3-edge
        // tail per 6 ids, ~1.17M edges, peel depth exactly 3): the
        // claim under measurement is that per-round cost FALLS with
        // the shrinking live edge list and the whole peel stays
        // seconds-scale at 1M nodes
        val ids = spark.range(nRows).select(col("id"))
          .repartition(32)
        val m6 = pmod(col("id"), lit(6))
        val edges = ids.filter(m6.isin(0, 2, 3, 4))
            .select(col("id").as("src"), (col("id") + 1).as("dst"))
          .unionByName(ids.filter(m6 === 0)
            .select(col("id").as("src"), (col("id") + 2).as("dst")))
          .unionByName(ids.filter(m6 === 0)
            .select((col("id") + 1).as("src"), (col("id") + 2).as("dst")))
          .filter(col("dst") < nRows).cache()
        edges.count()
        val run = () => graft.llm.Crawl.kCore(edges, k = 2,
          maxIter = 10)
        Seq(s"kcore_${nRows / 1000000L}m_nodes" -> run)
      case "saltedjoin" =>
        // planted skew: 70% of 20M fact rows on ONE key, 1000-key dim.
        // Broadcast is disabled for BOTH arms — a broadcast join has
        // no skew problem; saltedJoin exists for the shuffle-join
        // regime (dim too big / plan cached). AQE stays ON as shipped:
        // the skewed partition (~160 MB of longs) sits under AQE's
        // 256 MB skew-split threshold, which is exactly the gap the
        // manual salt covers.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        def skewFact = spark.range(20000000L).select(
          when(col("id") % 10 < 7, lit(0L))
            .otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
        def dim1k = spark.range(1000L).select(col("id").as("k"),
          (col("id") % 7).as("tier"))
        val plain = () => skewFact.join(dim1k, Seq("k"))
          .groupBy("tier").agg(count(lit(1)).as("n"), sum("v").as("s"))
        val salted = () => graft.ops.relational
          .saltedJoin(skewFact, dim1k, Seq("k"), salts = 32)
          .groupBy("tier").agg(count(lit(1)).as("n"), sum("v").as("s"))
        Seq("plain_smj" -> plain, "salted32" -> salted)
      case "bloomjoin" =>
        // selective-dim × huge-fact with broadcast disabled (the
        // beyond-broadcast regime bloomPreJoin targets): 20M fact
        // rows with an INCOMPRESSIBLE ~128-byte payload (sha2 hex —
        // a constant-padded payload lz4-compressed 150× in the
        // shuffle and hid the exchange entirely), 10M-key space, dim
        // keeps every 50th key (2%), so the Bloom probe drops ~98%
        // of the fact bytes before the exchange. Narrow 16-byte rows
        // would NOT show a win here (first cut measured 1.12 vs
        // 0.77 s: the probe+build cost more than shuffling longs);
        // the operator pays off when shuffled bytes dominate, which
        // is what the payload models. The probe ALSO sits below the
        // payload projection (filters push past projects), the same
        // way it would sit inside a parquet scan's filter.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        def bigFact = spark.range(20000000L).select(
          (col("id") % 10000000L).as("fk"), col("id").as("v"),
          concat(sha2(col("id").cast("string"), 256),
            sha2(concat(lit("x"), col("id").cast("string")), 256))
            .as("payload"))
        // dim keys are HASH-SCATTERED over the key space, not a
        // modulo filter: a predicate-expressible dim (`id % 50 = 0`)
        // let InferFiltersFromConstraints transfer the predicate
        // onto the fact's join key and prefilter the fact for free —
        // real dimension key sets have no such predicate, and that
        // gap is precisely what the Bloom filter carries across
        def selDim = spark.range(200000L)
          .select(pmod(xxhash64(col("id")), lit(10000000L)).as("dk"),
            (col("id") % 97).as("attr"))
        // consume the payload AFTER the join — otherwise column
        // pruning drops it before the exchange and the arms would
        // both shuffle narrow rows again
        val plainJ = () => bigFact.join(selDim,
            col("fk") === col("dk"))
          .groupBy("attr").agg(count(lit(1)).as("n"), sum("v").as("s"),
            sum(length(col("payload"))).as("pb"))
        val bloomJ = () => graft.ops.relational
          .bloomPreJoin(bigFact, selDim, "fk", "dk", fpp = 0.01)
          .groupBy("attr").agg(count(lit(1)).as("n"), sum("v").as("s"),
            sum(length(col("payload"))).as("pb"))
        Seq("plain_smj" -> plainJ, "bloom_prefilter" -> bloomJ)
      case other =>
        throw new IllegalArgumentException(s"unknown scenario: $other")
    }

    // job counter: AQE runs one job per materialized query stage, so
    // the per-call job count is the scheduler-latency exposure the
    // q97 profile measures (listener events are async; the short
    // settle sleep after each run is enough at these job sizes)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    // shuffle WRITE bytes: the quantity that matters at cluster scale
    // — a local[32] tmpfs shuffle is nearly free, so a plan that cuts
    // exchanged volume 25× can still time even with its alternative
    // here while being decisively better on a real network
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def settledJobs(): Long = { Thread.sleep(200); jobs.get() }
    def settledShuffle(): Long = { Thread.sleep(200); shuffleBytes.get() }

    // one untimed warmup each, then ALTERNATE the variants so JIT/GC
    // drift hits both equally; report per-variant min + all samples.
    // SPARK_GRAFT_NOWARMUP=1 skips the warmup for hour-scale single
    // executions (the 10M semdedup row), where JIT warmup is noise
    // and a second full execution costs another hour
    if (!sys.env.contains("SPARK_GRAFT_NOWARMUP"))
      variants.foreach { case (_, mk) => force(mk()) }
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val jobCounts = scala.collection.mutable.Map[String, Vector[Long]]()
      .withDefaultValue(Vector.empty)
    val shuffleMb = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to iters; (name, mk) <- variants) {
      val j0 = settledJobs()
      val s0 = settledShuffle()
      samples(name) = samples(name) :+ timeIt(mk)
      jobCounts(name) = jobCounts(name) :+ (settledJobs() - j0)
      shuffleMb(name) = shuffleMb(name) :+
        math.round((settledShuffle() - s0) / 1e4) / 100.0
    }
    val js = variants.map { case (name, _) =>
      val xs = samples(name)
      val jc = jobCounts(name)
      val sm = shuffleMb(name)
      s"""\"$name\":{"min":${xs.min},"samples":[${xs.mkString(",")}],""" +
        s""""jobs":[${jc.mkString(",")}],""" +
        s""""shuffle_mb":[${sm.mkString(",")}]}"""
    }.mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"micro_$scenario","variants":$js}""")
  }
}
