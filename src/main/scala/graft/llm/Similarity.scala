package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns ([EXT] — SURVEY.md §2.7):
  * brute-force cosine top-k as the exact baseline, hyperplane-LSH
  * bucketing as the scale path.
  *
  * Scale design: the query side is always the small side — broadcast
  * it, so brute force is a map-only pass over the corpus (no corpus
  * shuffle; per-executor top-k via window partial aggregation). The
  * LSH path buckets both sides on deterministic seeded hyperplane
  * signatures so only same-bucket vectors meet. All vector math is
  * higher-order-function expressions in double precision — codegen'd,
  * no UDFs, no driver-side collect.
  */
object Similarity {

  /** Cast a float-array embedding to double for exact, engine-stable
    * arithmetic (float accumulation is order-sensitive noise). */
  def asDouble(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Sequential-sum dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two (float or double) array columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact brute-force top-k: for each query vector, the k most cosine-
    * similar corpus vectors. `queries` must be small (it is broadcast);
    * the corpus is streamed map-side, then a single shuffle on query id
    * ranks per-query candidates. Output: (query_id, rank, neighbor_id,
    * cosine). */
  def topKBruteForce(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms precomputed per ROW (2n sqrt) not per PAIR (2·n·m); the
    // pair-level hot loop is the native graft_dot primitive.
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    val q = queries.select(col(qId).as("query_id"),
      asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), norm(asDouble(col(vecCol))).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Deterministic seeded random hyperplanes (rows of a planes×dim
    * matrix), generated driver-side and inlined as a literal — tiny,
    * broadcast with the plan. */
  def randomPlanes(dim: Int, n: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Hyperplane-LSH signature: bit i = sign(vec · plane_i), folded into
    * a long bucket id. Vectors with high cosine land in equal buckets
    * with high probability (random-hyperplane LSH). */
  def hyperplaneSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val v = asDouble(vec)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(v, plane) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k via IVF (inverted-file index): k-means cluster
    * the corpus into `nlist` cells, search only the `nprobe` cells
    * whose centroids are nearest each query. The classic FAISS-style
    * scale path: per-query work drops from O(corpus) to
    * O(corpus × nprobe / nlist); the centroid table is tiny and
    * broadcast. Returns exact cosine ranks within the probed cells.
    *
    * The coarse quantizer trains on a BOUNDED sample (nlist ×
    * `samplePerCell` vectors, hash-spread for determinism) with an
    * in-process Lloyd kernel — exactly how FAISS trains coarse
    * quantizers, and the 100 TB shape: the collect is O(nlist), never
    * O(corpus), and training launches zero cluster jobs (Spark ML
    * KMeans ran one full distributed pass per iteration; measured, it
    * dominated this operator's bench time). Cell ASSIGNMENT stays
    * in-plan and map-only: argmin over ≤nlist dot products per row. */
  def topKIvf(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 4, seed: Long = 42L, maxIter: Int = 8,
      samplePerCell: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.NativeFunctions.register(corpus.sparkSession)

    val corpusVec = corpus.select(col(cId).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    // deterministic hash-spread sample (TakeOrdered over a hash, not
    // sample(): same rows on any partitioning/rerun)
    val samplePts = corpusVec
      .select(col("cv"), xxhash64(col("neighbor_id"), lit(seed)).as("h"))
      .orderBy("h").limit(nlist * samplePerCell)
      .collect().map(_.getSeq[Double](0).toArray)
    val centroids = LloydKernel.fit(samplePts, nlist, maxIter)

    // in-plan cell assignment: argmin ||v−c||² = argmin(|c|² − 2·c·v);
    // array_min on struct(score, cell) is argmin with cell tiebreak,
    // all inside codegen, no join, no row blow-up.
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        (lit(cn2) - lit(2.0) *
          call_function("graft_dot", col("cv"), typedlit(c.toSeq))).as("d"),
        lit(i).as("cell"))
    }: _*)
    val assigned = corpusVec
      .withColumn("cell", array_min(scored).getField("cell"))
      .withColumn("cn", norm(col("cv")))
      .select("neighbor_id", "cv", "cell", "cn")

    // nprobe nearest centroids per query, by cosine against the tiny
    // centroid table (driver-side literals, no shuffle).
    val centDf = corpus.sparkSession.createDataFrame(
        centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("cell", "centroid")
    val q = queries.select(col(qId).as("query_id"),
      asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centDf))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"),
        (expr("graft_dot(qv, centroid)") /
          (col("qn") * sqrt(expr("graft_dot(centroid, centroid)")))).as("csim"))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select("query_id", "qv", "qn", "cell")

    val rankW = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Portable hyperplane components: plane (band b, bit j, dim i) is
    * ±1 from the parity of the first byte of SHA-256("b:j:i") — the
    * same engine-independent derivation trick as the MinHash/SimHash
    * SHA tiers, so any engine reproduces the exact planes (seeded-RNG
    * planes are engine-local). ±1 components also make the projection
    * arithmetically exact: each term is a sign flip of the input
    * double, so the only rounding is the sequential sum, identical in
    * any engine that sums left-to-right. */
  def shaPlanes(bands: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    Array.tabulate(bands, bits, dim) { (b, j, i) =>
      md.reset()
      val h = md.digest(s"$b:$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** [[topKLsh]] with SHA-derived planes instead of seeded-RNG ones —
    * the ORACLE-CHECKABLE tier (q75): DuckDB rebuilds the identical
    * planes, buckets, candidate set, and ranking. Same plan shape as
    * the native tier: map-only signatures (bands×bits dot products per
    * row against ±1 literal planes), key-only bucket join, exact
    * cosine ranking of distinct candidates. */
  def topKLshSha(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, k: Int = 5, bands: Int = 4,
      bitsPerBand: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    val planes = shaPlanes(bands, bitsPerBand, dim)
    val q = shaBandSignatures(queries, qId, "query_id", vecCol, planes)
    val c = shaBandSignatures(corpus, cId, "neighbor_id", vecCol, planes)
    val candidates = c.join(broadcast(q), Seq("band", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    val qVec = queries.select(col(qId).as("query_id"),
      asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val cVec = corpus.select(col(cId).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), norm(asDouble(col(vecCol))).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(qVec), Seq("query_id"))
      .join(cVec, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Approximate top-k via multi-band hyperplane LSH: `bands`
    * independent signatures of `bitsPerBand` bits; query and corpus
    * join on any matching (band, bucket); candidates are ranked
    * exactly. Recall rises with bands, cost with bitsPerBand⁻¹.
    * Falls back to fewer than k rows for queries whose buckets are
    * sparse — callers wanting guaranteed k use [[topKBruteForce]]. */
  def topKLsh(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, k: Int = 5, bands: Int = 4,
      bitsPerBand: Int = 8, seed: Long = 42L, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    def banded(df: DataFrame, id: String, outId: String): DataFrame = {
      // native signature expression: same planes (same seeded RNG) as
      // hyperplaneSignature, without an nPlanes×dim literal expression
      // tree per band. Computed over the double-cast column "v".
      val sigs = (0 until bands).map { b =>
        expr(s"graft_hplane_sig(v, $dim, $bitsPerBand, ${seed + b})").as(s"b$b")
      }
      df.select(col(id).as(outId), asDouble(col(vecCol)).as("v"))
        .select((col(outId) +: col("v") +: sigs): _*)
        .select(col(outId), col("v"),
          posexplode(array((0 until bands).map(b => col(s"b$b")): _*))
            .as(Seq("band", "bucket")))
    }
    // Bucket join carries ids + bucket keys ONLY (the same sig-pruning
    // shape as Dedup.minhashCandidates: dragging vectors through the
    // banded exchange is the measured scale-killer). Vectors re-attach
    // for the distinct candidate pairs, where the pair-level math runs
    // on the native graft_dot with norms computed once per row.
    val q = banded(queries, qId, "query_id").drop("v")
    val c = banded(corpus, cId, "neighbor_id").drop("v")
    val candidates = c.join(broadcast(q), Seq("band", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    val qVec = queries.select(col(qId).as("query_id"),
      asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val cVec = corpus.select(col(cId).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), norm(asDouble(col(vecCol))).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(qVec), Seq("query_id"))
      .join(cVec, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** SHA-plane band signatures of `df[vecCol]` as exploded
    * (outId, band, bucket) rows — the shared map-only front of
    * [[topKLshSha]], [[writeAnnIndex]], and [[probeAnnIndex]]. */
  private def shaBandSignatures(df: DataFrame, id: String, outId: String,
      vecCol: String, planes: Array[Array[Array[Double]]]): DataFrame = {
    graft.expressions.NativeFunctions.register(df.sparkSession)
    val bands = planes.length
    val bitsPerBand = planes(0).length
    val buckets = (0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        when(call_function("graft_dot", col("v"),
          typedlit(planes(b)(j).toSeq)) >= 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _).cast(IntegerType).as(s"b$b")
    }
    df.select(col(id).as(outId), asDouble(col(vecCol)).as("v"))
      .select((col(outId) +: buckets): _*)
      .select(col(outId),
        posexplode(array((0 until bands).map(b => col(s"b$b")): _*))
          .as(Seq("band", "bucket")))
  }

  /** A persisted ANN index's handles + banding parameters. */
  final case class AnnIndex(sigs: DataFrame, vecs: DataFrame,
    bands: Int, bitsPerBand: Int, dim: Int, buckets: Int)

  /** Persistent ANN INDEX — the embedding sibling of the signature
    * store: band signatures and vectors land in BUCKETED catalog
    * tables ONCE, so every later probe (tonight's queries,
    * tomorrow's trickle) joins exchange-free against the stored
    * layout instead of re-signaturing the corpus. Planes are the
    * SHA tier ([[shaPlanes]]) — engine-portable, oracle-checkable.
    *
    * Layout: `${prefix}_ann_sigs(band, bucket, neighbor_id)`
    * bucketed by (band, bucket) — KEYS ONLY, candidate joins never
    * carry vectors; `${prefix}_ann_vecs(neighbor_id, cv, cn)`
    * bucketed by neighbor_id — exact ranking reads vectors only for
    * candidates, and norms are precomputed once at index time;
    * `${prefix}_ann_meta` one row of banding parameters (a probe can
    * never run mismatched planes).
    *
    * `maxBucket` fails fast on degenerate embedding sets (constant
    * or near-constant vectors collapse every row into one bucket —
    * the probe join would go quadratic there), naming the offending
    * (band, bucket). 0 disables. */
  def writeAnnIndex(corpus: DataFrame, idCol: String, vecCol: String,
      tablePrefix: String, bands: Int = 4, bitsPerBand: Int = 8,
      dim: Int = 64, buckets: Int = 32,
      maxBucket: Long = 1L << 20): Unit = {
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 24,
      s"bands=$bands bitsPerBand=$bitsPerBand")
    val spark = corpus.sparkSession
    val planes = shaPlanes(bands, bitsPerBand, dim)
    val sigs = shaBandSignatures(corpus, idCol, "neighbor_id", vecCol,
      planes).localCheckpoint()
    if (maxBucket > 0) {
      val hot = sigs.groupBy("band", "bucket")
        .agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
        .orderBy(col("n").desc).limit(1).collect()
      require(hot.isEmpty, {
        val r = hot(0)
        s"writeAnnIndex: bucket (band=${r.getInt(0)}, " +
          s"bucket=${r.getInt(1)}) holds ${r.getLong(2)} vectors " +
          s"(> $maxBucket) — the embedding set is degenerate for " +
          "these planes; raise bitsPerBand or fix the embeddings"
      })
    }
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), norm(asDouble(col(vecCol))).as("cn"))
    // a re-write is a fresh index; also clears locations a previous
    // session's in-memory catalog left behind (see dropManagedTable)
    Seq("_ann_sigs", "_ann_vecs", "_ann_meta").foreach(sfx =>
      graft.io.Sinks.dropManagedTable(spark, tablePrefix + sfx))
    graft.io.Sinks.writeBucketed(sigs, s"${tablePrefix}_ann_sigs",
      Seq("band", "bucket"), buckets)
    graft.io.Sinks.writeBucketed(vecs, s"${tablePrefix}_ann_vecs",
      Seq("neighbor_id"), buckets)
    spark.createDataFrame(Seq((bands, bitsPerBand, dim, buckets)))
      .toDF("bands", "bits_per_band", "dim", "buckets")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${tablePrefix}_ann_meta")
  }

  def readAnnIndex(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): AnnIndex = {
    val m = spark.table(s"${tablePrefix}_ann_meta").head()
    AnnIndex(spark.table(s"${tablePrefix}_ann_sigs"),
      spark.table(s"${tablePrefix}_ann_vecs"),
      m.getAs[Int]("bands"), m.getAs[Int]("bits_per_band"),
      m.getAs[Int]("dim"), m.getAs[Int]("buckets"))
  }

  /** Append a batch to a persisted ANN index, idempotently: banding
    * parameters come from the meta row (never from the caller), only
    * ids not already present append (re-running a day is a no-op),
    * and the writes use the index's own bucket count so the
    * exchange-free layout survives. The merged-bucket guard checks
    * the TOUCHED buckets' post-append sizes before writing. */
  def appendToAnnIndex(batch: DataFrame, idCol: String, vecCol: String,
      tablePrefix: String, maxBucket: Long = 1L << 20): Unit = {
    val spark = batch.sparkSession
    val ix = readAnnIndex(spark, tablePrefix)
    val planes = shaPlanes(ix.bands, ix.bitsPerBand, ix.dim)
    // fresh = ids not in the stored vec table (idempotent replays)
    val fresh = batch
      .join(ix.vecs.select(col("neighbor_id").as(idCol)),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    val sigs = shaBandSignatures(fresh, idCol, "neighbor_id", vecCol,
      planes).localCheckpoint()
    if (maxBucket > 0) {
      val merged = sigs.groupBy("band", "bucket")
        .agg(count(lit(1)).as("bn"))
        .join(ix.sigs.groupBy("band", "bucket")
          .agg(count(lit(1)).as("sn")), Seq("band", "bucket"), "left")
        .filter(col("bn") + coalesce(col("sn"), lit(0L)) > maxBucket)
        .orderBy((col("bn") + coalesce(col("sn"), lit(0L))).desc)
        .limit(1).collect()
      require(merged.isEmpty, {
        val r = merged(0)
        s"appendToAnnIndex: bucket (band=${r.getInt(0)}, " +
          s"bucket=${r.getInt(1)}) would exceed $maxBucket after " +
          "this append — degenerate batch for these planes"
      })
    }
    graft.io.Sinks.writeBucketed(sigs, s"${tablePrefix}_ann_sigs",
      Seq("band", "bucket"), ix.buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
    graft.io.Sinks.writeBucketed(
      fresh.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"),
        norm(asDouble(col(vecCol))).as("cn")),
      s"${tablePrefix}_ann_vecs", Seq("neighbor_id"), ix.buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
  }

  /** Probe a persisted ANN index: signature the queries under the
    * index's OWN banding parameters (map-only, broadcast), candidate
    * join against the bucketed sigs table — keys only, exchange-free
    * on the index side — then exact cosine ranking against the
    * bucketed vec table, top-k per query as a WindowGroupLimit.
    * Same math as [[topKLshSha]] run inline, which is exactly the
    * point: the index trades one write for every probe's corpus
    * re-signature. */
  // ──────────────────────────────────────────────────────────────────
  // Product quantization: the 100 TB embedding-compression path. A
  // 64-float vector (256 B) compresses to nsub one-byte codes (8 B at
  // nsub=8) against a per-slot codebook; search then runs over codes
  // with one distance-lookup table per query (ADC — asymmetric
  // distance computation), so the corpus scan is table lookups, not
  // float multiplies, and the working set shrinks 32×.
  //
  // The codebook here is a DETERMINISTIC hash-rank sample of the
  // corpus (the ncent rows with the smallest sha256("pq:<salt>:<id>"),
  // their subvectors forming each slot's centroids) rather than a
  // Lloyd-trained one: hash-spread sampling is the same bounded,
  // engine-portable discipline as topKIvf's coarse sampler, and it
  // makes every code and every ADC distance replayable in the DuckDB
  // oracle (a k-means codebook would be rows-only-checkable, the q44
  // caveat). Swap in Lloyd centroids for production recall; the
  // pipeline shape is identical.

  /** Deterministic PQ codebook: (slot, code, cvec) — ncent centroids
    * per slot, centroid c of slot s = subvector s of the corpus row
    * with hash-rank c. Bounded: the sample is a TakeOrdered of ncent
    * rows; the only window runs over those ncent rows. */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nsub: Int, ncent: Int, salt: String = ""): DataFrame = {
    require(dim % nsub == 0, s"dim $dim not divisible by nsub $nsub")
    val dsub = dim / nsub
    import org.apache.spark.sql.expressions.Window
    val ranked = corpus.select(col(idCol).as("_id"),
      asDouble(col(vecCol)).as("_v"),
      expr(s"cast(conv(substr(sha2(concat('pq:$salt:', " +
        s"cast(`$idCol` as string)), 256), 1, 15), 16, 10) as bigint)")
        .as("_rk"))
    // TakeOrdered (sort+limit fuses — never a full sort); the
    // unpartitioned window below ranks only these ncent rows.
    val samp = ranked.orderBy(col("_rk"), col("_id")).limit(ncent)
      .withColumn("code",
        (row_number().over(Window.orderBy(col("_rk"), col("_id"))) - 1)
          .cast(IntegerType))
    samp.select(col("code"), col("_v"),
        explode(sequence(lit(0), lit(nsub - 1))).as("slot"))
      .select(col("slot"), col("code"),
        slice(col("_v"), col("slot") * dsub + 1, lit(dsub)).as("cvec"))
  }

  /** The codebook collected to ONE slot-major, code-ascending array —
    * the broadcastable form both [[pqEncode]] and [[pqAdcTopK]] join
    * against (nsub·ncent structs; parameter-bounded). */
  private def codebookArray(codebook: DataFrame): DataFrame =
    codebook.agg(sort_array(collect_list(
      struct(col("slot"), col("code"), col("cvec")))).as("_cb"))

  /** Exact double squared-L2 between a dsub-slice of `v` starting at
    * element `base+1` and codebook entry `e.cvec` — sequential sum, so
    * the oracle replays it bit-for-bit. */
  private def sqDist(e: Column, v: Column, base: Column, dsub: Int): Column =
    aggregate(sequence(lit(1), lit(dsub)), lit(0.0),
      (acc, j) => acc + (element_at(v, (base + j).cast(IntegerType)) -
        element_at(e.getField("cvec"), j.cast(IntegerType))) *
        (element_at(v, (base + j).cast(IntegerType)) -
          element_at(e.getField("cvec"), j.cast(IntegerType))))

  /** PQ-encode the corpus: (id, codes array<int>) — code s = argmin
    * over slot-s centroids of exact squared-L2, ties to the lowest
    * code. Map-only: the codebook rides as one broadcast array; no
    * shuffle touches the corpus. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, dim: Int, nsub: Int, ncent: Int): DataFrame = {
    val dsub = dim / nsub
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("_v"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("id"), transform(sequence(lit(0), lit(nsub - 1)), s => {
        val entries = slice(col("_cb"), s * ncent + 1, lit(ncent))
        val dists = transform(entries,
          e => sqDist(e, col("_v"), s * dsub, dsub))
        (array_position(dists, array_min(dists)) - 1).cast(IntegerType)
      }).as("codes"))
  }

  /** ADC top-k over PQ codes: per query, one lookup table of exact
    * micro-unit distances to every (slot, code) centroid — integer, so
    * the per-candidate sum is order-free and engine-exact — then the
    * corpus scan is nsub table lookups per candidate. Same broadcast-
    * the-small-side shape as [[topKBruteForce]]; the per-pair cost
    * drops from dim multiplies to nsub lookups. Output: (query_id,
    * rank, neighbor_id, adc_micro), ranked ascending (ADC is a
    * distance), ties to the lower neighbor id. */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, codebook: DataFrame, dim: Int,
      nsub: Int, ncent: Int, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dsub = dim / nsub
    val codes = pqEncode(corpus, cId, vecCol, codebook, dim, nsub, ncent)
      .withColumnRenamed("id", "neighbor_id")
    val qlut = queries
      .select(col(qId).as("query_id"), asDouble(col(vecCol)).as("_qv"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("query_id"), transform(col("_cb"), e =>
        floor(sqDist(e, col("_qv"), e.getField("slot") * dsub, dsub) *
          lit(1e6)).cast(LongType)).as("_lut"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_micro"), col("neighbor_id"))
    codes.crossJoin(broadcast(qlut))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(nsub - 1)), lit(0L),
          (acc, s) => acc + element_at(col("_lut"),
            (s * ncent + element_at(col("codes"),
              s.cast(IntegerType) + 1) + 1).cast(IntegerType)))
          .as("adc_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def probeAnnIndex(queries: DataFrame, qId: String, vecCol: String,
      tablePrefix: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    val ix = readAnnIndex(spark, tablePrefix)
    val planes = shaPlanes(ix.bands, ix.bitsPerBand, ix.dim)
    val qSigs = shaBandSignatures(queries, qId, "query_id", vecCol, planes)
    val candidates = ix.sigs.join(broadcast(qSigs), Seq("band", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    val qVec = queries.select(col(qId).as("query_id"),
      asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(qVec), Seq("query_id"))
      .join(ix.vecs, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
