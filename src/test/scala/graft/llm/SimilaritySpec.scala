package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  test("topKLshSha: self-match ranks first, deterministic planes") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val r = Similarity.topKLshSha(q, vecs, "vec_id", "vec_id", "embedding",
      k = 3).collect()
    val rank1 = r.filter(_.getAs[Int]("rank") == 1)
      .map(x => x.getAs[Long]("query_id") -> x.getAs[Long]("neighbor_id"))
    // the query itself always shares every bucket with itself
    assert(rank1.toSeq.sorted === Seq(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(r.forall(x => math.abs(x.getAs[Double]("cosine")) <= 1.0 + 1e-12))
    // derivation is pure: identical output across invocations
    val again = Similarity.topKLshSha(q, vecs, "vec_id", "vec_id",
      "embedding", k = 3).collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("LloydKernel: converges on separated blobs; bounded k; empty-cell safe") {
    val blobA = Array.tabulate(50)(i => Array(0.0 + i * 0.001, 0.0))
    val blobB = Array.tabulate(50)(i => Array(10.0 + i * 0.001, 10.0))
    val cents = LloydKernel.fit(scala.util.Random.shuffle((blobA ++ blobB).toSeq)
      .toArray, k = 2, maxIter = 10)
    assert(cents.length === 2)
    // one centroid lands in each blob
    val xs = cents.map(_(0)).sorted
    assert(math.abs(xs(0) - 0.025) < 0.5 && math.abs(xs(1) - 10.025) < 0.5)
    // k > points: clamps, never throws
    assert(LloydKernel.fit(blobA.take(3), k = 16, maxIter = 4).length === 3)
    assert(LloydKernel.fit(Array.empty, k = 4, maxIter = 4).isEmpty)
    // determinism: same input → same centroids
    val again = LloydKernel.fit(blobA ++ blobB, 2, 10)
    assert(LloydKernel.fit(blobA ++ blobB, 2, 10).map(_.toSeq).toSeq
      === again.map(_.toSeq).toSeq)
  }
  import spark.implicits._

  test("cosine of known vectors") {
    val r = Seq(1).toDF("x").select(
      Similarity.cosine(array(lit(1.0f), lit(0.0f)), array(lit(1.0f), lit(1.0f))),
      Similarity.cosine(array(lit(1.0f), lit(0.0f)), array(lit(0.0f), lit(1.0f))),
      Similarity.cosine(array(lit(2.0f), lit(0.0f)), array(lit(5.0f), lit(0.0f))))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - math.sqrt(0.5)) < 1e-12)
    assert(r.getDouble(1) === 0.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  private val corpus = {
    val rng = new scala.util.Random(7)
    val base = Seq.fill(16)(rng.nextGaussian().toFloat)
    // vec 100 ≈ vec 0 (planted neighbor); rest random
    val rows = (0L, base) +: (100L, base.map(x => (x * 1.001f))) +:
      Seq.tabulate(60) { i => (i + 1L, Seq.fill(16)(rng.nextGaussian().toFloat)) }
    rows.toDF("vec_id", "embedding")
  }

  test("topKBruteForce: self is rank 1, planted neighbor rank 2") {
    val r = Similarity.topKBruteForce(
      corpus.filter(col("vec_id") === 0), corpus, "vec_id", "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(r(0).getAs[Long]("neighbor_id") === 0L)
    assert(math.abs(r(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(r(1).getAs[Long]("neighbor_id") === 100L)
    assert(r(1).getAs[Double]("cosine") > 0.999)
  }

  test("topKLsh recovers the planted neighbor (high-recall config)") {
    val r = Similarity.topKLsh(
      corpus.filter(col("vec_id") === 0), corpus, "vec_id", "vec_id",
      "embedding", k = 3, bands = 6, bitsPerBand = 4, dim = 16)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(r.contains(0L) && r.contains(100L))
  }

  test("topKIvf: self + planted neighbor recovered through probed cells") {
    val r = Similarity.topKIvf(
      corpus.filter(col("vec_id") === 0), corpus, "vec_id", "vec_id",
      "embedding", k = 3, nlist = 4, nprobe = 2)
      .orderBy("rank").collect()
    assert(r.nonEmpty)
    assert(r(0).getAs[Long]("neighbor_id") === 0L) // identical cell ⇒ self found
    assert(r.map(_.getAs[Long]("neighbor_id")).contains(100L)) // planted
  }

  test("AnnIndex: persisted probe ≡ inline topKLshSha; append idempotent; degenerate guard fires") {
    import spark.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    Similarity.writeAnnIndex(vecs, "vec_id", "embedding",
      "annix_spec", bands = 4, bitsPerBand = 8, dim = 64, buckets = 4)
    // probe parity with the inline tier, bit for bit
    val viaIndex = Similarity.probeAnnIndex(queries, "vec_id",
        "embedding", "annix_spec", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val inline = Similarity.topKLshSha(queries, vecs, "vec_id",
        "vec_id", "embedding", k = 5, bands = 4, bitsPerBand = 8)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(viaIndex === inline)
    // append new vectors; replaying the same batch is a no-op
    val batch = (100L until 110L).map { i =>
      (i, Array.tabulate(64)(j => math.cos(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    Similarity.appendToAnnIndex(batch, "vec_id", "embedding", "annix_spec")
    val n1 = spark.table("annix_spec_ann_v1_vecs").count()
    val s1 = spark.table("annix_spec_ann_v1_sigs").count()
    Similarity.appendToAnnIndex(batch, "vec_id", "embedding", "annix_spec")
    assert(spark.table("annix_spec_ann_v1_vecs").count() === n1)
    assert(spark.table("annix_spec_ann_v1_sigs").count() === s1)
    assert(n1 === 70L)
    // an appended vector is findable: probe with its own embedding
    val self = Similarity.probeAnnIndex(
        batch.filter(col("vec_id") === 100L), "vec_id", "embedding",
        "annix_spec", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(self.toSeq === Seq((100L, 100L)))
    // constant vectors collapse into one bucket -> guard names it
    val degen = (0L until 50L).map(i =>
      (i, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.writeAnnIndex(degen, "vec_id", "embedding",
        "annix_degen", maxBucket = 10L)
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("AnnIndex maintenance: remove excludes ids, compact is data-identical, fence preserves an in-window append") {
    import spark.implicits._
    val pfx = "annix_mnt"
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(vecs, "vec_id", "embedding", pfx,
      bands = 4, bitsPerBand = 8, dim = 64, buckets = 4)

    // takedown: removed ids stop matching immediately (vectors ARE the
    // index — no retained-hash caveat), survivors still probe exact
    Similarity.removeFromAnnIndex(Seq(5L, 6L).toDF("vec_id"), "vec_id", pfx)
    assert(Similarity.readAnnMeta(spark, pfx).version === Some(2))
    val probeRemoved = Similarity.probeAnnIndex(
        vecs.filter(col("vec_id") === 5L), "vec_id", "embedding", pfx, k = 3)
      .collect().map(_.getLong(2)).toSet
    assert(!probeRemoved.contains(5L) && !probeRemoved.contains(6L))
    val survivor = Similarity.probeAnnIndex(
        vecs.filter(col("vec_id") === 7L), "vec_id", "embedding", pfx, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(survivor.toSeq === Seq((7L, 7L)))

    // appends land in the flipped version and stay findable
    val batch = (200L until 205L).map { i =>
      (i, Array.tabulate(64)(j => math.cos(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    Similarity.appendToAnnIndex(batch, "vec_id", "embedding", pfx)
    assert(spark.table(s"${pfx}_ann_v2_vecs").count() === 43L)

    // compaction: one version bump, byte-identical contents
    def snap() = (
      spark.table(Similarity.readAnnMeta(spark, pfx).sigsTable(pfx))
        .collect().map(_.toSeq).toSet,
      spark.table(Similarity.readAnnMeta(spark, pfx).vecsTable(pfx))
        .collect().map(_.toSeq).toSet)
    val before = snap()
    Similarity.compactAnnIndex(spark, pfx)
    assert(Similarity.readAnnMeta(spark, pfx).version === Some(3))
    assert(snap() === before)

    // FENCE: an append landing inside the compaction's check-to-flip
    // window must survive — the flip rolls back, the maintenance
    // throws, and the live index holds the append
    val batch2 = (300L until 303L).map { i =>
      (i, Array.tabulate(64)(j => math.cos(i * 64 + 7 * j).toFloat))
    }.toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      Similarity.compactAnnIndexHooked(spark, pfx, () =>
        Similarity.appendToAnnIndex(batch2, "vec_id", "embedding", pfx))
    }
    assert(e.getMessage.contains("rolled back"))
    assert(Similarity.readAnnMeta(spark, pfx).version === Some(3))
    val found = Similarity.probeAnnIndex(
        batch2.filter(col("vec_id") === 300L), "vec_id", "embedding",
        pfx, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(found.toSeq === Seq((300L, 300L)))
    // the aborted maintenance is re-runnable and keeps the append
    Similarity.compactAnnIndex(spark, pfx)
    assert(Similarity.readAnnMeta(spark, pfx).version === Some(4))
    assert(spark.table(s"${pfx}_ann_v4_vecs").count() === 46L)
  }

  test("exportAnnIndexSnapshot: plain snapshot ≡ live read; " +
      "mid-export append fails by name and deletes the partial export") {
    import spark.implicits._
    val pfx = "annix_exp"
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(vecs, "vec_id", "embedding", pfx,
      bands = 4, bitsPerBand = 8, dim = 64, buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-annexp")
    val exp = dir.resolve("snap").toString
    try {
      val v = Similarity.exportAnnIndexSnapshot(spark, pfx, exp)
      assert(v === 1)
      val live = Similarity.readAnnIndex(spark, pfx)
      val snap = Similarity.readExportedAnnIndex(spark, exp)
      assert(snap.bands === live.bands &&
        snap.bitsPerBand === live.bitsPerBand && snap.dim === live.dim)
      assert(snap.sigs.orderBy("band", "bucket", "neighbor_id")
        .collect().map(_.toSeq).toSeq ===
        live.sigs.orderBy("band", "bucket", "neighbor_id")
          .collect().map(_.toSeq).toSeq)
      assert(snap.vecs.select("neighbor_id").orderBy("neighbor_id")
        .collect().toSeq ===
        live.vecs.select("neighbor_id").orderBy("neighbor_id")
          .collect().toSeq)
      // no-protocol read: any parquet reader sees the vectors
      assert(spark.read.parquet(s"$exp/vecs").count() === 30L)
      // interleaving: append inside the export window → fail by name,
      // partial export deleted, live index keeps the append
      val exp2 = dir.resolve("snap2").toString
      val batch = (200L until 203L).map { i =>
        (i, Array.tabulate(64)(j => math.cos(i * 64 + j).toFloat))
      }.toDF("vec_id", "embedding")
      val e = intercept[IllegalStateException] {
        Similarity.exportAnnIndexSnapshot(spark, pfx, exp2,
          midExportHook = () =>
            Similarity.appendToAnnIndex(batch, "vec_id", "embedding", pfx))
      }
      assert(e.getMessage.contains("changed while exporting"), e.getMessage)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(exp2)))
      assert(spark.table(s"${pfx}_ann_v1_vecs").count() === 33L)
      // clean re-run includes the append
      Similarity.exportAnnIndexSnapshot(spark, pfx, exp2)
      assert(spark.read.parquet(s"$exp2/vecs").count() === 33L)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("exportAnnIndexDelta: base + replayed deltas ≡ full export at " +
      "the head; torn delta fails by name; importAnnIndex restores an " +
      "exchange-free bucketed index") {
    import spark.implicits._
    val pfx = "annix_dx"
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat))
    }.toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(vecs, "vec_id", "embedding", pfx,
      bands = 4, bitsPerBand = 8, dim = 64, buckets = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-anndelta")
    def p(n: String) = dir.resolve(n).toString
    try {
      Similarity.exportAnnIndexSnapshot(spark, pfx, p("base"))
      val day1 = (100L until 104L).map { i =>
        (i, Array.tabulate(64)(j => math.cos(i * 64 + j).toFloat))
      }.toDF("vec_id", "embedding")
      Similarity.appendToAnnIndex(day1, "vec_id", "embedding", pfx)
      val s1 = Similarity.exportAnnIndexDelta(spark, pfx,
        Seq(p("base")), p("d1"))
      assert(s1 === 1L)
      val day2 = (200L until 202L).map { i =>
        (i, Array.tabulate(64)(j => math.cos(i * 64 + j + 7).toFloat))
      }.toDF("vec_id", "embedding")
      Similarity.appendToAnnIndex(day2, "vec_id", "embedding", pfx)
      Similarity.exportAnnIndexDelta(spark, pfx,
        Seq(p("base"), p("d1")), p("d2"))
      // deltas are batch-sized
      assert(spark.read.parquet(s"${p("d1")}/vecs").count() === 4L)
      assert(spark.read.parquet(s"${p("d2")}/vecs").count() === 2L)
      // base + deltas ≡ a full snapshot at the head
      Similarity.exportAnnIndexSnapshot(spark, pfx, p("full"))
      val chain = Similarity.readExportedAnnIndexChain(spark,
        Seq(p("base"), p("d1"), p("d2")))
      val full = Similarity.readExportedAnnIndex(spark, p("full"))
      assert(chain.sigs.orderBy("band", "bucket", "neighbor_id")
        .collect().map(_.toSeq).toSeq ===
        full.sigs.orderBy("band", "bucket", "neighbor_id")
          .collect().map(_.toSeq).toSeq)
      assert(chain.vecs.orderBy("neighbor_id").collect()
        .map(_.toSeq).toSeq ===
        full.vecs.orderBy("neighbor_id").collect().map(_.toSeq).toSeq)
      // torn delta: append inside the window → named failure, partial
      // deleted, live index keeps the append
      val day3 = (300L until 302L).map { i =>
        (i, Array.tabulate(64)(j => math.cos(i * 64 + j + 13).toFloat))
      }.toDF("vec_id", "embedding")
      val e = intercept[IllegalStateException] {
        Similarity.exportAnnIndexDelta(spark, pfx,
          Seq(p("base"), p("d1"), p("d2")), p("dTorn"),
          midExportHook = () => Similarity.appendToAnnIndex(
            day3, "vec_id", "embedding", pfx))
      }
      assert(e.getMessage.contains("changed while exporting"),
        e.getMessage)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(p("dTorn"))))
      assert(spark.table(s"${pfx}_ann_v1_vecs").count() === 38L)
      // import the chain: probes equal the chain state (head before
      // day3), and the corpus side is exchange-free again
      Similarity.importAnnIndex(spark, Seq(p("base"), p("d1"), p("d2")),
        "annix_imp")
      val queries = day1.filter(col("vec_id") === 100L)
      val viaImport = Similarity.probeAnnIndex(queries, "vec_id",
          "embedding", "annix_imp", k = 3)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      assert(viaImport.nonEmpty)
      assert(viaImport.head(2) === 100L) // its own appended vector
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val probeJoin = spark.table("annix_imp_ann_v1_vecs")
          .join(spark.range(3).select(col("id").as("neighbor_id")),
            Seq("neighbor_id"))
        val plan = probeJoin.queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1,
          plan.take(1500))
        probeJoin.count()
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // the chain READ re-validates the exporter's discipline:
      // out-of-order dirs fail by name...
      val eOrd = intercept[IllegalArgumentException] {
        Similarity.readExportedAnnIndexChain(spark,
          Seq(p("base"), p("d2"), p("d1")))
      }
      assert(eOrd.getMessage.contains("append_seq regresses"),
        eOrd.getMessage)
      // ...and a delta taken against a different (post-compaction v2)
      // base refuses to union with the v1 base
      Similarity.compactAnnIndex(spark, pfx)
      Similarity.exportAnnIndexSnapshot(spark, pfx, p("base2"))
      val day4 = Seq((400L,
        Array.tabulate(64)(j => math.cos(400 * 64 + j + 29).toFloat)))
        .toDF("vec_id", "embedding")
      Similarity.appendToAnnIndex(day4, "vec_id", "embedding", pfx)
      Similarity.exportAnnIndexDelta(spark, pfx, Seq(p("base2")),
        p("d4"))
      val eVer = intercept[IllegalArgumentException] {
        Similarity.readExportedAnnIndexChain(spark,
          Seq(p("base"), p("d4")))
      }
      assert(eVer.getMessage.contains("version"), eVer.getMessage)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("hyperplane signature: equal vectors share buckets, deterministic") {
    val planes = Similarity.randomPlanes(4, 8, seed = 42L)
    assert(planes === Similarity.randomPlanes(4, 8, seed = 42L))
    val sigs = Seq(
      (1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f, 3f, 4f)),
      (3L, Seq(-1f, -2f, -3f, -4f)))
      .toDF("id", "v")
      .select(col("id"), Similarity.hyperplaneSignature(col("v"), planes).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L)) // antipodal vector flips every bit
  }

  test("pqEncode/pqAdcTopK ≡ independent Scala mirror (full differential)") {
    import spark.implicits._
    val dim = 8; val nsub = 4; val ncent = 4; val dsub = dim / nsub
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * dim + j).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(4)

    // ── Scala mirror, written independently of the Column code ──
    def rank(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"pq:t:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val sample = vecs.sortBy(v => (rank(v._1), v._1)).take(ncent)
    // codebook(s)(c) = subvector s of sample row c, as doubles
    val cbm = Array.tabulate(nsub, ncent)((s, c) =>
      sample(c)._2.slice(s * dsub, (s + 1) * dsub).map(_.toDouble))
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < a.length) { acc += (a(j) - b(j)) * (a(j) - b(j)); j += 1 }
      acc
    }
    def enc(v: Array[Float]): Array[Int] = Array.tabulate(nsub) { s =>
      val sub = v.slice(s * dsub, (s + 1) * dsub).map(_.toDouble)
      val ds = cbm(s).map(sq(sub, _))
      ds.indexOf(ds.min)
    }
    val wantCodes = vecs.map { case (id, v) => id -> enc(v).toSeq }.toMap

    val cb = Similarity.pqCodebook(df, "vec_id", "embedding", dim, nsub,
      ncent, salt = "t")
    val gotCodes = Similarity.pqEncode(df, "vec_id", "embedding", cb,
        dim, nsub, ncent)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(gotCodes === wantCodes)

    // ADC: integer micro LUT, min-distance ranking, id tiebreak
    val queries = vecs.take(2)
    val wantAdc = queries.flatMap { case (qid, qv) =>
      val lut = Array.tabulate(nsub, ncent)((s, c) => math.floor(
        sq(qv.slice(s * dsub, (s + 1) * dsub).map(_.toDouble),
          cbm(s)(c)) * 1e6).toLong)
      vecs.map { case (nid, _) =>
        val codes = wantCodes(nid)
        (qid, nid, codes.zipWithIndex.map { case (c, s) => lut(s)(c) }.sum)
      }.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((q, n, a), i) => (q, i + 1, n, a) }
    }.toSet
    val gotAdc = Similarity.pqAdcTopK(df.filter(col("vec_id") < 2), df,
        "vec_id", "vec_id", "embedding", cb, dim, nsub, ncent, k = 3)
      .select("query_id", "rank", "neighbor_id", "adc_micro")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotAdc === wantAdc)
  }

  test("pqCodebookLloyd: planted clusters — recovered centroids, lower MSE than the sampled tier, same pipeline") {
    import spark.implicits._
    val dim = 8; val nsub = 2; val ncent = 4; val dsub = dim / nsub
    // 4 well-separated full-vector cluster centers; every slot sees 4
    // distinct sub-centers. Jitter is deterministic (murmur mix).
    def mix(x0: Long): Long = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    def jit(i: Long, j: Int): Float =
      ((((mix(i * 31 + j) >>> 11) % 2003L) / 1001.5f) - 1.0f) * 0.02f
    val centers = Array.tabulate(4, dim)((c, j) =>
      (if ((j / dsub + c) % 2 == 0) 1.0f else -1.0f) * (c + 1).toFloat)
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, c, Array.tabulate(dim)(j => centers(c)(j) + jit(i, j)))
    }
    val df = vecs.map(v => (v._1, v._3)).toDF("vec_id", "embedding")
      .repartition(4)

    val lloyd = Similarity.pqCodebookLloyd(df, "vec_id", "embedding",
      dim, nsub, ncent, samplePerCent = 40)
    val sampled = Similarity.pqCodebook(df, "vec_id", "embedding",
      dim, nsub, ncent, salt = "lp")
    // schema + cardinality: drops into the identical pipeline
    assert(lloyd.columns.toSeq === Seq("slot", "code", "cvec"))
    assert(lloyd.count() === (nsub * ncent).toLong)

    def mse(cb: org.apache.spark.sql.DataFrame): Double = {
      val cbm = cb.collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb,
          dim, nsub, ncent)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.map { case (id, _, v) =>
        (0 until nsub).map { s =>
          val cv = cbm((s, codes(id)(s)))
          (0 until dsub).map { j =>
            val d = v(s * dsub + j) - cv(j); d * d
          }.sum
        }.sum
      }.sum / (vecs.size * dim)
    }
    val mseL = mse(lloyd)
    val mseS = mse(sampled)
    // Lloyd converges to the cluster MEANS (error ≈ jitter variance);
    // the hash-rank sample quantizes against 4 arbitrary corpus ROWS
    assert(mseL <= mseS, s"lloyd $mseL vs sampled $mseS")
    assert(mseL < 0.01, s"lloyd MSE should be jitter-level, got $mseL")

    // cluster recall through the UNCHANGED ADC pipeline: with the
    // Lloyd codebook every top-5 neighbor of a query shares the
    // query's planted cluster (50 per cluster, margins >> jitter)
    val cluster = vecs.map(v => v._1 -> v._2).toMap
    val got = Similarity.pqAdcTopK(df.filter(col("vec_id") < 8), df,
        "vec_id", "vec_id", "embedding", lloyd, dim, nsub, ncent, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length === 40)
    assert(got.forall { case (q, n) => cluster(q) === cluster(n) },
      got.filterNot { case (q, n) => cluster(q) === cluster(n) }
        .take(5).toSeq.toString)
  }

  test("topKIvfAdc: full-probe ≡ pqAdcTopK exactly; pruned probe stays inside probed cells") {
    import spark.implicits._
    val dim = 8; val nsub = 2; val ncent = 4
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(dim)(j => math.sin(i * dim + j).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(4)
    val q = df.filter(col("vec_id") < 3)

    // nprobe = nlist probes EVERY cell: the candidate set is the full
    // corpus, so the ranking must equal the flat ADC scan bit for bit
    val full = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
        "embedding", dim, nsub, ncent, nlist = 4, nprobe = 4, k = 5,
        salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val flat = Similarity.pqAdcTopK(q, df, "vec_id", "vec_id",
        "embedding",
        Similarity.pqCodebook(df, "vec_id", "embedding", dim, nsub,
          ncent, salt = "t"),
        dim, nsub, ncent, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(full === flat)

    // pruned probe: every returned neighbor's cell is one the query
    // probed (the approximation contract — candidates outside probed
    // cells are unseen by construction)
    val pruned = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
        "embedding", dim, nsub, ncent, nlist = 4, nprobe = 2, k = 5,
        salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // each query still gets rows, and rank 1 is the query itself:
    // the query's own cell is by definition its nearest probed cell,
    // and its own codes achieve the per-slot LUT minima (fixed
    // deterministic data, so the id tiebreak is stable)
    assert(pruned.map(_._1).distinct.sorted === Seq(0L, 1L, 2L))
    Seq(0L, 1L, 2L).foreach { qi =>
      assert(pruned.contains((qi, 1, qi)), s"query $qi self rank-1")
    }
    // pruning returns at most k rows per query, ranked densely
    pruned.groupBy(_._1).foreach { case (qi, rows) =>
      assert(rows.map(_._2).sorted === (1 to rows.length).toSeq, s"q$qi")
    }
  }

  test("pqCodebookLloyd: named fail-fast when a slot cannot seed ncent distinct centroids") {
    import spark.implicits._
    // every vector identical → 1 distinct subvector per slot
    val df = (0L until 20L).map(i => (i, Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqCodebookLloyd(df, "vec_id", "embedding",
        dim = 4, nsub = 2, ncent = 4)
    }
    assert(e.getMessage.contains("slot 0") &&
      e.getMessage.contains("distinct"), e.getMessage)
  }

  test("contrastiveTriplets: arms selected per label; incomplete anchors drop") {
    import spark.implicits._
    // labels: 0 → {0,2}, 1 → {1,3}, singleton 2 → {4}, null → {5}
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.9f, 0.1f, 0.0f)),
      (1L, 1, Array(0.0f, 1.0f, 0.0f)),
      (3L, 1, Array(0.1f, 0.9f, 0.0f)),
      (4L, 2, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
      .union(Seq((5L, Option.empty[Int], Array(0.5f, 0.5f, 0.0f)))
        .toDF("vec_id", "label", "embedding"))
    val r = Similarity.contrastiveTriplets(vecs, vecs, "vec_id", "vec_id",
      "embedding", "label").collect()
      .map(x => x.getAs[Long]("anchor_id") ->
        ((x.getAs[Long]("pos_id"), x.getAs[Long]("neg_id"),
          x.getAs[Long]("margin_micro")))).toMap
    // singleton-label 4 has no positive; null-label 5 joins neither arm
    assert(r.keySet === Set(0L, 1L, 2L, 3L))
    // anchor 0: positive is its label-0 sibling 2; hard negative is the
    // most-aligned cross-label vector (3: cos≈0.110 beats 1: cos=0 and
    // 4: cos=0)
    assert(r(0L)._1 === 2L && r(0L)._2 === 3L)
    assert(r(1L)._1 === 3L && r(1L)._2 === 2L)
    // margins positive (positives closer than negatives) and micro-exact
    assert(r.values.forall(_._3 > 0L))
  }

  test("guards: pqCodebookLloyd sample-product overflow; topKIvfAdc corpus smaller than nlist") {
    import spark.implicits._
    val df = (0L until 10L).map(i =>
      (i, Array.tabulate(4)(j => (i * 4 + j).toFloat)))
      .toDF("vec_id", "embedding")
    // ncent·samplePerCent overflows Int: named require, not a garbage
    // negative limit surfacing as an unrelated Spark error
    val eOv = intercept[IllegalArgumentException] {
      Similarity.pqCodebookLloyd(df, "vec_id", "embedding", dim = 4,
        nsub = 2, ncent = 65536, samplePerCent = 40000)
    }
    assert(eOv.getMessage.contains("overflows"), eOv.getMessage)
    // 10 corpus rows cannot seed nlist=16 coarse cells: named require
    // instead of phantom cells with null distances degenerating the
    // pruning (or INVALID_ARRAY_INDEX under ANSI)
    val eNl = intercept[IllegalArgumentException] {
      Similarity.topKIvfAdc(df.limit(2), df, "vec_id", "vec_id",
        "embedding", dim = 4, nsub = 2, ncent = 4, nlist = 16,
        nprobe = 2, k = 3)
    }
    assert(eNl.getMessage.contains("nlist=16") &&
      eNl.getMessage.contains("only 10"), eNl.getMessage)
  }

  test("topKIvfAdc production tier: Lloyd arms, identical shape, full-probe ≡ flat Lloyd ADC, planted recall ≥ sampled") {
    import spark.implicits._
    val dim = 8; val nsub = 2; val ncent = 4; val dsub = dim / nsub
    // the pqCodebookLloyd planted fixture: 4 separated clusters of 50,
    // deterministic jitter far below inter-center margins
    def mix(x0: Long): Long = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    def jit(i: Long, j: Int): Float =
      ((((mix(i * 31 + j) >>> 11) % 2003L) / 1001.5f) - 1.0f) * 0.02f
    val centers = Array.tabulate(4, dim)((c, j) =>
      (if ((j / dsub + c) % 2 == 0) 1.0f else -1.0f) * (c + 1).toFloat)
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, c, Array.tabulate(dim)(j => centers(c)(j) + jit(i, j)))
    }
    val df = vecs.map(v => (v._1, v._3)).toDF("vec_id", "embedding")
      .repartition(4)
    val q = df.filter(col("vec_id") < 8)

    // output shape identical to the sampled (oracle) arm
    val prod = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
      "embedding", dim, nsub, ncent, nlist = 4, nprobe = 1, k = 5,
      production = true)
    val samp = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
      "embedding", dim, nsub, ncent, nlist = 4, nprobe = 1, k = 5,
      salt = "pr")
    assert(prod.schema === samp.schema)

    // nprobe = nlist probes every cell: the production composition
    // must equal the flat ADC scan over the SAME Lloyd codebook bit
    // for bit (coarse pruning disabled, so only the PQ arm decides)
    val fullProd = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
        "embedding", dim, nsub, ncent, nlist = 4, nprobe = 4, k = 5,
        production = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val flatLloyd = Similarity.pqAdcTopK(q, df, "vec_id", "vec_id",
        "embedding",
        Similarity.pqCodebookLloyd(df, "vec_id", "embedding", dim,
          nsub, ncent),
        dim, nsub, ncent, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fullProd === flatLloyd)

    // planted-cluster recall at nprobe=1: with farthest-seeded Lloyd
    // coarse cells each planted cluster owns a cell, so every top-5
    // neighbor shares its query's cluster — recall 1.0 — and the
    // production arm is never worse than the hash-rank sampled arm
    // (whose 4 arbitrary coarse rows can merge two clusters into one
    // cell and leak cross-cluster candidates into the shortlist)
    val cluster = vecs.map(v => v._1 -> v._2).toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val ok = rows.count(r => cluster(r.getLong(0)) ===
        cluster(r.getLong(2)))
      ok.toDouble / rows.length
    }
    val rProd = recall(prod.collect())
    val rSamp = recall(samp.collect())
    assert(rProd === 1.0, s"production recall $rProd")
    assert(rProd >= rSamp, s"production $rProd < sampled $rSamp")
  }

  test("topKIvfAdc twoLevel: hierarchical quantizer arm — full probe ≡ " +
      "flat Lloyd ADC; pruned probe keeps planted recall; " +
      "sampled-tier twoLevel fails by name") {
    import spark.implicits._
    val dim = 8; val nsub = 2; val ncent = 4; val dsub = dim / nsub
    // the production-tier fixture: 4 separated clusters of 50
    def mix(x0: Long): Long = {
      var x = x0
      x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    def jit(i: Long, j: Int): Float =
      ((((mix(i * 31 + j) >>> 11) % 2003L) / 1001.5f) - 1.0f) * 0.02f
    val centers = Array.tabulate(4, dim)((c, j) =>
      (if ((j / dsub + c) % 2 == 0) 1.0f else -1.0f) * (c + 1).toFloat)
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, c, Array.tabulate(dim)(j => centers(c)(j) + jit(i, j)))
    }
    val df = vecs.map(v => (v._1, v._3)).toDF("vec_id", "embedding")
      .repartition(4)
    val q = df.filter(col("vec_id") < 8)
    val nlist = 8
    // precondition the full-probe pin relies on: nprobe = nlist can
    // cover every hierarchical cell (training is deterministic, so
    // this trainer call sees exactly the quantizer the operator does)
    val tlc = Similarity.coarseCentroidsTwoLevel(df, "vec_id",
      "embedding", dim, nlist, seed = 42L, maxIter = 8,
      samplePerCell = 50)
    assert(tlc.totalCells <= nlist && tlc.totalCells > tlc.nSuper,
      s"fixture drift: totalCells=${tlc.totalCells} nSuper=${tlc.nSuper}")
    // full probe disables the coarse pruning, so only the PQ arm
    // decides — must equal the flat Lloyd ADC scan bit for bit, which
    // ALSO equals the flat-production full probe (the prior test's
    // pin): the hierarchical quantizer changes which cells rows live
    // in, never how probed candidates rank
    val fullTwo = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
        "embedding", dim, nsub, ncent, nlist = nlist, nprobe = nlist,
        k = 5, production = true, twoLevel = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val flatLloyd = Similarity.pqAdcTopK(q, df, "vec_id", "vec_id",
        "embedding",
        Similarity.pqCodebookLloyd(df, "vec_id", "embedding", dim,
          nsub, ncent),
        dim, nsub, ncent, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fullTwo === flatLloyd)
    // pruned hierarchical probe: every query's top-5 stays inside its
    // own planted cluster (nprobe=2 of ~8 cells — the coarse pruning
    // live), and the query itself is in its own top-5 (not pinned at
    // rank 1: the Lloyd PQ codebook codes cluster members identically,
    // so ADC ties resolve to the LOWEST same-cluster id)
    val cluster = vecs.map(v => v._1 -> v._2).toMap
    val pruned = Similarity.topKIvfAdc(q, df, "vec_id", "vec_id",
        "embedding", dim, nsub, ncent, nlist = nlist, nprobe = 2,
        k = 5, production = true, twoLevel = true).collect()
    assert(pruned.nonEmpty)
    pruned.foreach { r =>
      assert(cluster(r.getLong(0)) === cluster(r.getLong(2)),
        s"query ${r.getLong(0)} leaked ${r.getLong(2)}")
    }
    (0L until 8L).foreach { qi =>
      assert(pruned.exists(r => r.getLong(0) == qi &&
        r.getLong(2) == qi), s"query $qi must see itself in top-5")
    }
    val e = intercept[IllegalArgumentException] {
      Similarity.topKIvfAdc(q, df, "vec_id", "vec_id", "embedding",
        dim, nsub, ncent, nlist = nlist, nprobe = 2, twoLevel = true)
    }
    assert(e.getMessage.contains("production-tier"), e.getMessage)
  }

  test("CellAssign2Expr: global-id arithmetic — super argmin then " +
      "sub argmin, ties to the lower index, empty slice refused") {
    import spark.implicits._
    // 2 supers on the x-axis at ±10; super 0 owns subs {(-11),(-9)},
    // super 1 owns subs {(9),(11),(13)} → global ids 0,1 | 2,3,4
    val superFlat = Array(-10.0, 0.0, 10.0, 0.0)
    val subFlat = Array(-11.0, 0.0, -9.0, 0.0,
      9.0, 0.0, 11.0, 0.0, 13.0, 0.0)
    val offsets = Array(0, 2, 5)
    def assign(x: Double, y: Double): Int = {
      val df = Seq((x, y)).toDF("x", "y")
        .select(array(col("x"), col("y")).as("v"))
      df.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.CellAssign2Expr(
          org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
          superFlat, 2, subFlat, offsets, 2)).as("c"))
        .head().getInt(0)
    }
    assert(assign(-11.5, 0.0) === 0)
    assert(assign(-8.0, 0.0) === 1)
    assert(assign(9.4, 0.0) === 2)
    assert(assign(11.1, 0.0) === 3)
    assert(assign(14.0, 0.0) === 4)
    // equidistant between subs 2 and 3 (x=10): tie keeps the lower
    // GLOBAL id; equidistant between supers (x=0): lower super wins,
    // so the search stays in super 0's slice
    assert(assign(10.0, 0.0) === 2)
    assert(assign(0.0, 0.0) === 1) // super 0 wins tie; nearest sub -9
    val e = intercept[IllegalArgumentException] {
      graft.expressions.CellAssign2Expr(
        org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
        superFlat, 2, Array(1.0, 0.0), Array(0, 1, 1), 2)
    }
    assert(e.getMessage.contains("at least one sub-centroid"))
  }

  test("CellAssign2Expr ≡ independent Scala mirror (differential fuzz: " +
      "random hierarchies, random vectors, boundary ties)") {
    import spark.implicits._
    val rng = new scala.util.Random(20260816L)
    (0 until 8).foreach { trial =>
      val dim = 1 + rng.nextInt(6)
      val nSuper = 1 + rng.nextInt(5)
      // 1..4 subs per super, values on a coarse grid so exact ties
      // between centroids actually occur and exercise the tie rule
      def grid(): Double = (rng.nextInt(9) - 4) * 0.5
      val subCounts = Array.fill(nSuper)(1 + rng.nextInt(4))
      val offsets = subCounts.scanLeft(0)(_ + _)
      val superFlat = Array.fill(nSuper * dim)(grid())
      val subFlat = Array.fill(offsets.last * dim)(grid())
      // independent mirror: super argmin (strict <, lower wins), then
      // argmin over that super's slice (strict <, lower GLOBAL wins)
      def mirror(v: Array[Double]): Int = {
        def d2(flat: Array[Double], i: Int): Double =
          (0 until dim).map(j => (v(j) - flat(i * dim + j)) *
            (v(j) - flat(i * dim + j))).sum
        val s = (0 until nSuper).minBy(s => (d2(superFlat, s), s))
        (offsets(s) until offsets(s + 1)).minBy(g => (d2(subFlat, g), g))
      }
      val vecs = (0 until 200).map(i =>
        (i.toLong, Array.fill(dim)(grid())))
      val got = vecs.toDF("id", "v")
        .select(col("id"), org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.CellAssign2Expr(
            org.apache.spark.sql.GraftColumnBridge.expression(
              Similarity.asDouble(col("v"))),
            superFlat, nSuper, subFlat, offsets, dim)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      vecs.foreach { case (id, v) =>
        assert(got(id) === mirror(v),
          s"trial $trial id $id dim $dim nSuper $nSuper " +
            s"offsets ${offsets.mkString(",")}")
      }
    }
  }

  test("mmrRerank: greedy diversification, negative-sim bonus, ties, shortlist guard") {
    import spark.implicits._
    // dim 4, nsub 2; rel in micro-ish units. a and b are near-dups,
    // c is orthogonal, d points AWAY from a.
    val cand = Seq(
      ("q1", 1L, 900000L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // a
      ("q1", 2L, 890000L, Array(1.0f, 0.01f, 0.0f, 0.0f)),  // b ~ a
      ("q1", 3L, 500000L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // c ⊥ a
      ("q2", 7L, 100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      ("q2", 8L, 100L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("q", "id", "rel", "vec")
    val r = Similarity.mmrRerank(cand, "q", "id", "vec", "rel",
        dim = 4, nsub = 2, k = 3, lambdaMicro = 500000L)
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(2),
        x.getLong(3)))
    val q1 = r.filter(_._1 == "q1").sortBy(_._2).map(_._3).toSeq
    // rank 1 = max rel (a); rank 2 = the ORTHOGONAL c, not the
    // higher-rel near-dup b (redundancy penalty); b last
    assert(q1 === Seq(1L, 3L, 2L))
    // q2: rel tie at rank 1 → lower id; both orthogonal
    val q2 = r.filter(_._1 == "q2").sortBy(_._2).map(_._3).toSeq
    assert(q2 === Seq(7L, 8L))
    // rank-1 score is exactly λ·rel
    assert(r.find(x => x._1 == "q1" && x._2 == 1).get._4 ===
      500000L * 900000L)

    // anti-similar candidate earns the diversity BONUS: after a, the
    // opposite vector outranks a moderate orthogonal one
    val anti = Seq(
      ("g", 1L, 900000L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      ("g", 2L, 100L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // cos = -1
      ("g", 3L, 800000L, Array(0.0f, 0.0f, 1.0f, 0.0f))) // cos = 0
      .toDF("q", "id", "rel", "vec")
    val ra = Similarity.mmrRerank(anti, "q", "id", "vec", "rel",
        dim = 4, nsub = 2, k = 2, lambdaMicro = 500000L)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    // score(2) = .5·100 + .5·1e6 > score(3) = .5·8e5 + 0
    assert(ra === Seq(1L, 2L))

    // shortlist guard names the over-full query
    val e = intercept[Exception] {
      Similarity.mmrRerank(cand, "q", "id", "vec", "rel",
        dim = 4, nsub = 2, k = 2, maxCandidates = 2).collect()
    }
    assert(e.getMessage.contains("q1") &&
      e.getMessage.contains("maxCandidates"), e.getMessage)
    // non-numeric candidate ids fail by name at plan build
    val eId = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(
        cand.withColumn("id", col("id").cast("string")),
        "q", "id", "vec", "rel", dim = 4, nsub = 2, k = 2)
    }
    assert(eId.getMessage.contains("numeric"), eId.getMessage)
    // ... and so does a non-numeric relevance column (it would cast
    // to NULL per row and the aggregate would skip every candidate —
    // silently empty output)
    val eRel = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(
        cand.withColumn("rel", col("rel").cast("string")),
        "q", "id", "vec", "rel", dim = 4, nsub = 2, k = 2)
    }
    assert(eRel.getMessage.contains("relevance") &&
      eRel.getMessage.contains("numeric"), eRel.getMessage)
    // out-of-contract relevance magnitude fails by name instead of
    // silently wrapping the score ordering
    val big = Seq(("g", 1L, 10000000000000L,
      Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("q", "id", "rel", "vec")
    val eBig = intercept[Exception] {
      Similarity.mmrRerank(big, "q", "id", "vec", "rel",
        dim = 4, nsub = 2, k = 1).collect()
    }
    assert(eBig.getMessage.contains("9e12"), eBig.getMessage)
  }

  test("topKIvfAdc / pqAdcTopK: NULL query id or vector fails by name, not NPE") {
    import spark.implicits._
    val corpus = (0L until 32L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val nullId = Seq((Some(1L), Array.fill(8)(0.5f)),
        (None, Array.fill(8)(0.25f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.topKIvfAdc(nullId, corpus, "vec_id", "vec_id",
        "embedding", dim = 8, nsub = 2, ncent = 4, nlist = 4,
        nprobe = 2, k = 3, salt = "t")
    }
    assert(e1.getMessage.contains("NULL id or NULL/incomplete"),
      e1.getMessage)
    val nullVec = Seq((1L, Some(Array.fill(8)(0.5f))),
        (2L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      val cb = Similarity.pqCodebook(corpus, "vec_id", "embedding",
        8, 2, 4, salt = "t")
      Similarity.pqAdcTopK(nullVec, corpus, "vec_id", "vec_id",
        "embedding", cb, dim = 8, nsub = 2, ncent = 4, k = 3)
    }
    assert(e2.getMessage.contains("NULL id or NULL/incomplete"),
      e2.getMessage)
  }
}
