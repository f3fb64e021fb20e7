package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge => bridge}
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

  /** Deterministic hash-spread sample of k vectors, collected
    * SCALE-SAFELY. The obvious form — `orderBy(hash).limit(k)` over
    * rows CARRYING the vector — breaks at corpus scale: TakeOrdered's
    * driver merge holds numPartitions × k candidate rows, so at
    * 10M×64d / k=82k the driver receives >1 GiB of vectors and dies
    * on spark.driver.maxResultSize (caught by the r13 10M
    * measurement run). Here the TakeOrdered runs over NARROW
    * (hash, id) rows; the k winners' vectors then fetch via a
    * broadcast semi-join (k-row build side) and re-sort driver-side
    * by the same (hash, UTF-8-byte id) key — same sample set, same
    * order, so Lloyd's order-sensitive farthest-point seeding yields
    * bit-identical centroids to the old wide collect ON UNIQUE-ID
    * corpora (the documented precondition of every consumer). With
    * duplicate ids — or distinct ids that collide after the string
    * cast — the semi-join fetches EVERY matching row and equal
    * (hash, id-bytes) sort keys tie over different vectors, so
    * take(k) may pick a different multiset than the old limit(k)
    * did — and ties resolve by collect() partition order, so the
    * pick is not even run-stable. Deduplicate ids upstream. */
  private[llm] def hashSampleVecs(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, seed: Long): Array[Array[Double]] = {
    val ids = corpus
      .select(xxhash64(col(idCol), lit(seed)).as("_h"),
        col(idCol).cast(StringType).as("_id"))
      .orderBy(col("_h"), col("_id")).limit(k)
    val rows = corpus
      .select(col(idCol).cast(StringType).as("_id"),
        xxhash64(col(idCol), lit(seed)).as("_h"),
        asDouble(col(vecCol)).as("_v"))
      .join(broadcast(ids.select("_id")), Seq("_id"), "left_semi")
      .collect()
      .map(r => (r.getLong(1), r.getString(0).getBytes("UTF-8"),
        r.getSeq[Double](2).toArray))
    // UTF-8 byte order on the id tie-break = Spark's UTF8String
    // binary order (Scala's String compareTo is UTF-16 and diverges
    // on non-BMP ids)
    java.util.Arrays.sort(rows,
      (a: (Long, Array[Byte], Array[Double]),
       b: (Long, Array[Byte], Array[Double])) => {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else java.util.Arrays.compareUnsigned(a._2, b._2)
      })
    rows.take(k).map(_._3)
  }

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
    // sample(): same rows on any partitioning/rerun); collected
    // through the narrow-key path — see [[hashSampleVecs]]
    val samplePts = hashSampleVecs(corpusVec, "neighbor_id", "cv",
      nlist * samplePerCell, seed)
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

  /** Resolved ANN-index metadata — the embedding sibling of
    * [[Dedup.StoreMeta]]: banding parameters, the current data-table
    * version (None ⇒ a legacy unversioned layout from an older
    * session — still readable; the first maintenance op migrates it),
    * and the append fencing sequence. Same discipline as the
    * signature store: readers resolve the current version from the
    * ONE-ROW meta table, maintenance writes a complete new version
    * and flips that row, and an append-only `_ann_applog` fence log
    * makes append-vs-maintenance lost writes impossible in any
    * interleaving (see Dedup.fencedVersionFlip's proof — the ANN flip
    * is the same three-arm argument). */
  private[llm] final case class AnnMeta(bands: Int, bitsPerBand: Int,
      dim: Int, buckets: Int, version: Option[Int], appendSeq: Long) {
    def sigsTable(p: String): String =
      version.map(v => s"${p}_ann_v${v}_sigs").getOrElse(s"${p}_ann_sigs")
    def vecsTable(p: String): String =
      version.map(v => s"${p}_ann_v${v}_vecs").getOrElse(s"${p}_ann_vecs")
  }

  private[llm] def readAnnMeta(
      spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): AnnMeta = {
    val t = s"${tablePrefix}_ann_meta"
    // same mid-flip read-window retry as Dedup.readStoreMeta: the
    // INSERT OVERWRITE flip can transiently expose an empty table or
    // a missing-file scan to a racing reader
    val maxAttempts = 6
    var attempt = 0
    var found: Option[(Array[String], org.apache.spark.sql.Row)] = None
    while (found.isEmpty && attempt < maxAttempts) {
      if (attempt > 0) {
        Thread.sleep(100L << (attempt - 1))
        spark.catalog.refreshTable(t)
      }
      try {
        val df = spark.table(t)
        val h = df.head(1)
        if (h.nonEmpty) found = Some((df.columns, h(0)))
      } catch {
        case e: Exception
            if attempt < maxAttempts - 1 &&
              Option(e.getMessage).exists(_.contains("does not exist")) =>
          () // mid-flip file-listing race — retry (final attempt rethrows)
      }
      attempt += 1
    }
    val (cols, m) = found.getOrElse(throw new IllegalStateException(
      s"readAnnMeta: $t still empty after $attempt attempts — a flip " +
        "exposes an empty table only for its commit window; rebuild " +
        "with writeAnnIndex or host the meta on an atomic-commit format"))
    AnnMeta(m.getAs[Int]("bands"), m.getAs[Int]("bits_per_band"),
      m.getAs[Int]("dim"), m.getAs[Int]("buckets"),
      if (cols.contains("version")) Some(m.getAs[Int]("version")) else None,
      if (cols.contains("append_seq")) m.getAs[Long]("append_seq") else 0L)
  }

  /** One-row meta write — INSERT OVERWRITE when the schema matches,
    * so a mid-flip reader sees old row or new row, never an absent
    * table (Dedup.writeStoreMeta's contract). */
  private def writeAnnMeta(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, m: AnnMeta): Unit = {
    import spark.implicits._
    require(m.version.isDefined, "writeAnnMeta: version must be resolved")
    val df = Seq((m.bands, m.bitsPerBand, m.dim, m.buckets,
        m.version.get, m.appendSeq))
      .toDF("bands", "bits_per_band", "dim", "buckets", "version",
        "append_seq")
    val t = s"${tablePrefix}_ann_meta"
    if (spark.catalog.tableExists(t) &&
        spark.table(t).columns.sameElements(df.columns))
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).insertInto(t)
    else
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(t)
  }

  private def annApplogCount(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): Long = {
    val t = s"${tablePrefix}_ann_applog"
    if (spark.catalog.tableExists(t)) spark.table(t).count() else 0L
  }

  private def annApplogAppend(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, seq: Long): Unit = {
    import spark.implicits._
    Seq(seq).toDF("seq").write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .format("parquet").saveAsTable(s"${tablePrefix}_ann_applog")
  }

  /** Drop every ANN data table of `tablePrefix` (any `_vN_` version or
    * the legacy unversioned names) not in `keep`. */
  private def dropSupersededAnnTables(
      spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, keep: Set[String]): Unit = {
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(tablePrefix) +
        "_ann(_v\\d+)?_(sigs|vecs)")
    spark.catalog.listTables().collect().map(_.name)
      .filter(t => pat.matcher(t).matches() && !keep.contains(t))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** ANN maintenance COMMIT — fencing re-check → meta flip →
    * post-flip verify (with rollback) → grace drop; the exact
    * [[Dedup.fencedVersionFlip]] argument with (sigs, vecs) in place
    * of (hashes, banded, buckets). `midFlipHook` is the test seam in
    * the residual check-to-flip window. */
  private def annFencedFlip(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, m0: AnnMeta, applog0: Long,
      newTables: Seq[String], flipTo: AnnMeta => AnnMeta,
      keep: Set[String], op: String,
      midFlipHook: () => Unit = () => ()): Unit = {
    val m1 = readAnnMeta(spark, tablePrefix)
    if (m1.appendSeq != m0.appendSeq || m1.version != m0.version ||
        annApplogCount(spark, tablePrefix) != applog0) {
      newTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      throw new IllegalStateException(
        s"$op: index $tablePrefix changed while rewriting " +
          s"(append_seq ${m0.appendSeq} -> ${m1.appendSeq}) — the " +
          "concurrent append is preserved in the live index and this " +
          "maintenance wrote nothing; re-run it")
    }
    midFlipHook()
    writeAnnMeta(spark, tablePrefix, flipTo(m1))
    if (m0.version.isDefined &&
        annApplogCount(spark, tablePrefix) != applog0) {
      val mR = readAnnMeta(spark, tablePrefix)
      writeAnnMeta(spark, tablePrefix, mR.copy(version = m0.version))
      throw new IllegalStateException(
        s"$op: an append landed inside $tablePrefix's flip window — " +
          "the flip was rolled back (meta re-points at the snapshot " +
          "version, which holds the append); re-run the maintenance")
    }
    dropSupersededAnnTables(spark, tablePrefix,
      keep + m0.sigsTable(tablePrefix) + m0.vecsTable(tablePrefix))
  }

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
    // a re-write is a fresh index: clear every version's tables, the
    // fence log, and any locations a previous session's in-memory
    // catalog left behind (see dropManagedTable)
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(tablePrefix) +
        "_ann(_v\\d+)?_(sigs|vecs|meta|applog)")
    spark.catalog.listTables().collect().map(_.name)
      .filter(pat.matcher(_).matches())
      .foreach(graft.io.Sinks.dropManagedTable(spark, _))
    Seq("_ann_v1_sigs", "_ann_v1_vecs", "_ann_meta", "_ann_applog")
      .foreach(sfx => graft.io.Sinks.dropManagedTable(spark, tablePrefix + sfx))
    graft.io.Sinks.writeBucketed(sigs, s"${tablePrefix}_ann_v1_sigs",
      Seq("band", "bucket"), buckets)
    graft.io.Sinks.writeBucketed(vecs, s"${tablePrefix}_ann_v1_vecs",
      Seq("neighbor_id"), buckets)
    writeAnnMeta(spark, tablePrefix,
      AnnMeta(bands, bitsPerBand, dim, buckets, Some(1), 0L))
  }

  def readAnnIndex(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): AnnIndex = {
    val m = readAnnMeta(spark, tablePrefix)
    AnnIndex(spark.table(m.sigsTable(tablePrefix)),
      spark.table(m.vecsTable(tablePrefix)),
      m.bands, m.bitsPerBand, m.dim, m.buckets)
  }

  /** Export the CURRENT ANN-index version as a plain self-describing
    * parquet snapshot readable without the meta-flip protocol —
    * `exportDir/{_export_meta,sigs,vecs}` — under the same fence
    * discipline as [[Dedup.exportSignatureStoreSnapshot]]: meta +
    * append-log snapshotted before the copy, re-checked after; any
    * append/flip inside the window deletes the partial export and
    * fails by name (an append could land ids in `vecs` between the
    * two table copies — a torn snapshot). Residual window as
    * documented at [[Dedup.exportSignatureStoreSnapshot]]: an append
    * whose data rows land mid-copy but whose applog/meta bookkeeping
    * lands only after the re-check escapes detection — airtight under
    * the single-writer NightlyLoop contract, advisory under true
    * multi-driver concurrency. Returns the exported
    * version. Re-import via [[readExportedAnnIndex]] is
    * correctness-equivalent but unbucketed (probes against it shuffle
    * the corpus side; the live bucketed tables stay exchange-free). */
  def exportAnnIndexSnapshot(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, exportDir: String,
      midExportHook: () => Unit = () => ()): Int = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(exportDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val createdRoot = !fs.exists(root)
    require(createdRoot || fs.listStatus(root).isEmpty,
      s"exportAnnIndexSnapshot: exportDir '$exportDir' exists and is " +
        "non-empty — exports never overwrite; point at a fresh dir")
    val m0 = readAnnMeta(spark, tablePrefix)
    val applog0 = annApplogCount(spark, tablePrefix)
    try {
      spark.table(m0.sigsTable(tablePrefix))
        .write.parquet(s"$exportDir/sigs")
      spark.table(m0.vecsTable(tablePrefix))
        .write.parquet(s"$exportDir/vecs")
      Seq(("ann_index", m0.version.getOrElse(0), m0.bands,
          m0.bitsPerBand, m0.dim, m0.buckets, m0.appendSeq))
        .toDF("store", "version", "bands", "bits_per_band", "dim",
          "bucket_count", "append_seq")
        .coalesce(1).write.parquet(s"$exportDir/_export_meta")
      midExportHook()
      val m1 = readAnnMeta(spark, tablePrefix)
      if (m1.appendSeq != m0.appendSeq || m1.version != m0.version ||
          annApplogCount(spark, tablePrefix) != applog0)
        throw new IllegalStateException(
          s"exportAnnIndexSnapshot: index $tablePrefix changed while " +
            s"exporting (append_seq ${m0.appendSeq} -> ${m1.appendSeq})" +
            " — the snapshot could be torn so it was deleted; the live" +
            " index is untouched. Re-run the export")
      m0.version.getOrElse(0)
    } catch {
      case t: Throwable =>
        // only delete what this export created (the signature-store
        // export rule): caller-owned pre-existing roots survive
        if (createdRoot) fs.delete(root, true)
        else Seq("sigs", "vecs", "_export_meta").foreach(c =>
          fs.delete(new org.apache.hadoop.fs.Path(root, c), true))
        throw t
    }
  }

  /** Re-import an [[exportAnnIndexSnapshot]] directory as a
    * probe-ready [[AnnIndex]] (spec-pinned equal to the live read at
    * the exported version). */
  def readExportedAnnIndex(spark: org.apache.spark.sql.SparkSession,
      exportDir: String): AnnIndex = {
    val m = spark.read.parquet(s"$exportDir/_export_meta").head()
    require(m.getAs[String]("store") == "ann_index",
      s"'$exportDir' is a ${m.getAs[String]("store")} snapshot, not an " +
        "ann_index one")
    AnnIndex(spark.read.parquet(s"$exportDir/sigs"),
      spark.read.parquet(s"$exportDir/vecs"),
      m.getAs[Int]("bands"), m.getAs[Int]("bits_per_band"),
      m.getAs[Int]("dim"), m.getAs[Int]("bucket_count"))
  }

  /** DELTA export for the ANN index — rows appended since the prior
    * export chain (base [[exportAnnIndexSnapshot]] first, then every
    * delta so far, in order): the
    * [[graft.llm.Dedup.exportSignatureStoreDelta]] discipline with
    * (sigs, vecs) in place of (hashes, banded, buckets). Each table's
    * delta is an anti-join of the live table against the chain's
    * union — append-only within a version, so base ∪ deltas ≡ live
    * (spec-pinned); transfer volume is the night's appends. A version
    * mismatch (maintenance rewrote/removed rows) fails by name
    * demanding a fresh base. Same fence + residual window + created-
    * children-only failure cleanup as the snapshot export. Returns
    * the head `append_seq`. */
  def exportAnnIndexDelta(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, priorDirs: Seq[String], deltaDir: String,
      midExportHook: () => Unit = () => ()): Long = {
    import spark.implicits._
    require(priorDirs.nonEmpty,
      "exportAnnIndexDelta: need the prior export chain (base " +
        "snapshot first) — for a first export use exportAnnIndexSnapshot")
    val root = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val createdRoot = !fs.exists(root)
    require(createdRoot || fs.listStatus(root).isEmpty,
      s"exportAnnIndexDelta: deltaDir '$deltaDir' exists and is " +
        "non-empty — exports never overwrite; point at a fresh dir")
    val priors = priorDirs.map(d =>
      (d, spark.read.parquet(s"$d/_export_meta").head()))
    priors.zipWithIndex.foreach { case ((d, m), i) =>
      val st = m.getAs[String]("store")
      require(if (i == 0) st == "ann_index" else st == "ann_index_delta",
        s"exportAnnIndexDelta: '$d' is a $st export — the chain is " +
          "one ann_index base followed by ann_index_delta dirs, in order")
    }
    val baseVersion = priors.head._2.getAs[Int]("version")
    priors.foreach { case (d, m) =>
      require(m.getAs[Int]("version") == baseVersion,
        s"exportAnnIndexDelta: '$d' was exported at version " +
          s"${m.getAs[Int]("version")}, chain base is $baseVersion")
    }
    val m0 = readAnnMeta(spark, tablePrefix)
    val applog0 = annApplogCount(spark, tablePrefix)
    require(m0.version.getOrElse(0) == baseVersion,
      s"exportAnnIndexDelta: index $tablePrefix is at version " +
        s"${m0.version.getOrElse(0)} but the chain was exported at " +
        s"$baseVersion — maintenance rewrote the tables; take a fresh " +
        "exportAnnIndexSnapshot base")
    def unionOf(sub: String): DataFrame = priorDirs
      .map(d => spark.read.parquet(s"$d/$sub"))
      .reduce(_.unionByName(_))
    try {
      spark.table(m0.sigsTable(tablePrefix))
        .join(unionOf("sigs"), Seq("band", "bucket", "neighbor_id"),
          "left_anti")
        .write.parquet(s"$deltaDir/sigs")
      spark.table(m0.vecsTable(tablePrefix))
        .join(unionOf("vecs").select("neighbor_id"),
          Seq("neighbor_id"), "left_anti")
        .write.parquet(s"$deltaDir/vecs")
      Seq(("ann_index_delta", m0.version.getOrElse(0), m0.bands,
          m0.bitsPerBand, m0.dim, m0.buckets, m0.appendSeq))
        .toDF("store", "version", "bands", "bits_per_band", "dim",
          "bucket_count", "append_seq")
        .coalesce(1).write.parquet(s"$deltaDir/_export_meta")
      midExportHook()
      val m1 = readAnnMeta(spark, tablePrefix)
      if (m1.appendSeq != m0.appendSeq || m1.version != m0.version ||
          annApplogCount(spark, tablePrefix) != applog0)
        throw new IllegalStateException(
          s"exportAnnIndexDelta: index $tablePrefix changed while " +
            s"exporting (append_seq ${m0.appendSeq} -> ${m1.appendSeq})" +
            " — the delta could be torn so it was deleted; the live " +
            "index is untouched. Re-run the export")
      m0.appendSeq
    } catch {
      case t: Throwable =>
        if (createdRoot) fs.delete(root, true)
        else Seq("sigs", "vecs", "_export_meta").foreach(c =>
          fs.delete(new org.apache.hadoop.fs.Path(root, c), true))
        throw t
    }
  }

  /** Read a base-plus-deltas ANN export chain as one probe-ready
    * [[AnnIndex]] — row-equal to the live index at the last delta's
    * head (spec-pinned). Unbucketed like [[readExportedAnnIndex]];
    * [[importAnnIndex]] promotes a chain back to a live bucketed
    * index. Re-validates the exporter's chain discipline (the caller
    * may assemble dirs the exporter never saw together): every delta's
    * store version must equal the BASE's (a delta taken against a
    * different base unions into a silently wrong index) and
    * `append_seq` must be non-decreasing along the chain — both fail
    * by name, mirroring [[exportAnnIndexDelta]]'s write-time checks. */
  def readExportedAnnIndexChain(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): AnnIndex = {
    require(dirs.nonEmpty, "readExportedAnnIndexChain: no dirs")
    val metas = dirs.map(d =>
      (d, spark.read.parquet(s"$d/_export_meta").head()))
    metas.zipWithIndex.foreach { case ((d, m), i) =>
      val st = m.getAs[String]("store")
      require(if (i == 0) st == "ann_index" else st == "ann_index_delta",
        s"readExportedAnnIndexChain: '$d' is a $st export — expected " +
          "one ann_index base, then ann_index_delta dirs")
    }
    val baseVersion = metas.head._2.getAs[Int]("version")
    metas.tail.foreach { case (d, m) =>
      require(m.getAs[Int]("version") == baseVersion,
        s"readExportedAnnIndexChain: '$d' was exported at index " +
          s"version ${m.getAs[Int]("version")}, chain base is " +
          s"$baseVersion — a delta only composes with the base it was " +
          "taken against; re-export from a fresh base snapshot")
    }
    metas.map { case (d, m) => (d, m.getAs[Long]("append_seq")) }
      .sliding(2).foreach {
        case Seq((d0, s0), (d1, s1)) =>
          require(s1 >= s0,
            s"readExportedAnnIndexChain: append_seq regresses along " +
              s"the chain ('$d1' at $s1 after '$d0' at $s0) — dirs " +
              "are out of order or a delta is missing")
        case _ => ()
      }
    val base = metas.head._2
    def unionOf(sub: String): DataFrame = dirs
      .map(d => spark.read.parquet(s"$d/$sub"))
      .reduce(_.unionByName(_))
    AnnIndex(unionOf("sigs"), unionOf("vecs"),
      base.getAs[Int]("bands"), base.getAs[Int]("bits_per_band"),
      base.getAs[Int]("dim"), base.getAs[Int]("bucket_count"))
  }

  /** Promote an ANN export (base snapshot or base-plus-deltas chain)
    * back to a LIVE bucketed index at `tablePrefix` — fresh v1
    * tables, fresh meta with `append_seq = 0`, stale versions and
    * fence log cleared (the [[writeAnnIndex]] rewrite semantics).
    * After import, probes run exchange-free on the corpus side again
    * (spec-pinned, and probe results identical to the source
    * index's).
    *
    * SINGLE-OWNER contract: this DROPS the old tables first and
    * rebuilds them unfenced — a concurrent reader of a live index at
    * the same prefix can catch missing or half-written v1 tables
    * mid-import. Import targets must have no concurrent readers or
    * writers for the duration of the call (fresh prefix, or a DR /
    * migration target whose readers are held off until it returns);
    * the one-owner-per-prefix NightlyLoop deployment shape. */
  def importAnnIndex(spark: org.apache.spark.sql.SparkSession,
      exportDirs: Seq[String], tablePrefix: String): Unit = {
    val chain = readExportedAnnIndexChain(spark, exportDirs)
    val buckets = math.max(1, chain.buckets)
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(tablePrefix) +
        "_ann(_v\\d+)?_(sigs|vecs|meta|applog)")
    spark.catalog.listTables().collect().map(_.name)
      .filter(pat.matcher(_).matches())
      .foreach(graft.io.Sinks.dropManagedTable(spark, _))
    Seq("_ann_v1_sigs", "_ann_v1_vecs", "_ann_meta", "_ann_applog")
      .foreach(sfx =>
        graft.io.Sinks.dropManagedTable(spark, tablePrefix + sfx))
    graft.io.Sinks.writeBucketed(chain.sigs,
      s"${tablePrefix}_ann_v1_sigs", Seq("band", "bucket"), buckets)
    graft.io.Sinks.writeBucketed(chain.vecs,
      s"${tablePrefix}_ann_v1_vecs", Seq("neighbor_id"), buckets)
    writeAnnMeta(spark, tablePrefix, AnnMeta(chain.bands,
      chain.bitsPerBand, chain.dim, buckets, Some(1), 0L))
  }

  /** Append a batch to a persisted ANN index, idempotently: banding
    * parameters come from the meta row (never from the caller), only
    * ids not already present append (re-running a day is a no-op),
    * and the writes use the index's own bucket count so the
    * exchange-free layout survives. The merged-bucket guard checks
    * the TOUCHED buckets' post-append sizes before writing. */
  def appendToAnnIndex(batch: DataFrame, idCol: String, vecCol: String,
      tablePrefix: String, maxBucket: Long = 1L << 20): Unit =
    appendToAnnIndexHooked(batch, idCol, vecCol, tablePrefix, maxBucket)

  /** Append with a test seam (`midAppendHook` runs after the data
    * writes land and before the fence-log row — the window the fence
    * argument reasons about). */
  private[graft] def appendToAnnIndexHooked(batch: DataFrame,
      idCol: String, vecCol: String, tablePrefix: String,
      maxBucket: Long = 1L << 20,
      midAppendHook: () => Unit = () => ()): Unit = {
    val spark = batch.sparkSession
    val m0 = readAnnMeta(spark, tablePrefix)
    val ix = AnnIndex(spark.table(m0.sigsTable(tablePrefix)),
      spark.table(m0.vecsTable(tablePrefix)),
      m0.bands, m0.bitsPerBand, m0.dim, m0.buckets)
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
    graft.io.Sinks.writeBucketed(sigs, m0.sigsTable(tablePrefix),
      Seq("band", "bucket"), ix.buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
    graft.io.Sinks.writeBucketed(
      fresh.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"),
        norm(asDouble(col(vecCol))).as("cn")),
      m0.vecsTable(tablePrefix), Seq("neighbor_id"), ix.buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
    // FENCE (legacy unversioned indexes skip — migrate via a
    // maintenance op first): land the append-only log row, then
    // re-check the version; a maintenance flip that landed while this
    // append was writing means the rows went into superseded tables —
    // abort and re-run (idempotent against the current version).
    if (m0.version.isDefined) {
      midAppendHook()
      annApplogAppend(spark, tablePrefix, m0.appendSeq + 1)
      val m1 = readAnnMeta(spark, tablePrefix)
      if (m1.version != m0.version)
        throw new IllegalStateException(
          s"appendToAnnIndex: index $tablePrefix was rewritten by a " +
            "maintenance op during this append — the rows landed in a " +
            "superseded version; re-run the append (idempotent) " +
            "against the current version")
      writeAnnMeta(spark, tablePrefix,
        m1.copy(appendSeq = m1.appendSeq + 1))
    }
  }

  /** Remove ids from a persisted ANN index — the embedding takedown
    * path, mirroring [[Dedup.removeFromSignatureStore]]: a complete
    * new version of both data tables is written WITHOUT the removed
    * ids while the current version stays live, then the one-row meta
    * flips under the fence (see [[annFencedFlip]]). Unlike the
    * signature store there is no retained-hash caveat: the vectors
    * ARE the index, so a removed id stops matching immediately. Also
    * the legacy-layout migration path: maintaining an unversioned
    * index rewrites it as v1. */
  def removeFromAnnIndex(ids: DataFrame, idCol: String,
      tablePrefix: String): Unit =
    rewriteAnnIndex(ids.sparkSession, tablePrefix,
      "removeFromAnnIndex", () => ()) { (sigs, vecs) =>
      val rm = ids.select(col(idCol).as("neighbor_id")).distinct()
        .localCheckpoint()
      (sigs.join(rm, Seq("neighbor_id"), "left_anti"),
        vecs.join(rm, Seq("neighbor_id"), "left_anti"))
    }

  /** Compact a persisted ANN index: rewrite the current version's
    * tables (collapsing the one-file-set-per-append accumulation back
    * to one bucketed write) into version N+1 and flip. Data-identical
    * by construction; the point is file-count hygiene after a season
    * of nightly appends. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String): Unit =
    compactAnnIndexHooked(spark, tablePrefix)

  private[graft] def compactAnnIndexHooked(
      spark: org.apache.spark.sql.SparkSession, tablePrefix: String,
      midFlipHook: () => Unit = () => ()): Unit =
    rewriteAnnIndex(spark, tablePrefix, "compactAnnIndex",
      midFlipHook)((sigs, vecs) => (sigs, vecs))

  /** Shared maintenance body: snapshot meta + fence log, write the
    * transformed tables as version N+1, commit via [[annFencedFlip]]. */
  private def rewriteAnnIndex(spark: org.apache.spark.sql.SparkSession,
      tablePrefix: String, op: String, midFlipHook: () => Unit)(
      transform: (DataFrame, DataFrame) => (DataFrame, DataFrame)): Unit = {
    val m0 = readAnnMeta(spark, tablePrefix)
    val applog0 = annApplogCount(spark, tablePrefix)
    val vN = m0.version.getOrElse(0) + 1
    val (newSigs, newVecs) = transform(
      spark.table(m0.sigsTable(tablePrefix)),
      spark.table(m0.vecsTable(tablePrefix)))
    val sigsT = s"${tablePrefix}_ann_v${vN}_sigs"
    val vecsT = s"${tablePrefix}_ann_v${vN}_vecs"
    // rewrites DROP their target first — table AND location: a
    // previous aborted/rolled-back maintenance leaves vN tables as
    // reader grace, and a previous SESSION's in-memory catalog leaves
    // orphan warehouse directories no DROP TABLE can see
    Seq(sigsT, vecsT).foreach(graft.io.Sinks.dropManagedTable(spark, _))
    graft.io.Sinks.writeBucketed(newSigs.localCheckpoint(), sigsT,
      Seq("band", "bucket"), m0.buckets)
    graft.io.Sinks.writeBucketed(newVecs.localCheckpoint(), vecsT,
      Seq("neighbor_id"), m0.buckets)
    annFencedFlip(spark, tablePrefix, m0, applog0, Seq(sigsT, vecsT),
      _.copy(version = Some(vN)), Set(sigsT, vecsT), op, midFlipHook)
  }

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
  // caveat). [[pqCodebookLloyd]] is the production-recall arm: same
  // output schema, Lloyd-trained centroids, drops into the identical
  // encode/ADC pipeline.

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

  /** Production PQ codebook: per-slot Lloyd-trained centroids over a
    * BOUNDED hash-spread sample — the recall path real embedding
    * compression needs (the hash-rank sample above exists for oracle
    * replayability; its centroids are arbitrary corpus rows, so cells
    * are unbalanced and quantization error is whatever the draw
    * gives). Same output schema (slot, code, cvec) and the SAME
    * bounded discipline as [[topKIvf]]'s coarse trainer: the sample
    * is a TakeOrdered of ncent·samplePerCent rows (never O(corpus)),
    * training runs in-process via [[LloydKernel]] with zero cluster
    * jobs, and the result drops into [[pqEncode]]/[[pqAdcTopK]]
    * unchanged. Deterministic: xxhash64-spread sample with id
    * tiebreak, deterministic seeding and tie-break inside the kernel.
    * Fails fast (named slot) if the sample cannot seed ncent distinct
    * centroids — lower ncent or raise samplePerCent. */
  def pqCodebookLloyd(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nsub: Int, ncent: Int, seed: Long = 42L,
      maxIter: Int = 8, samplePerCent: Int = 50): DataFrame = {
    require(dim % nsub == 0, s"dim $dim not divisible by nsub $nsub")
    require(ncent >= 1 && ncent <= 65536,
      s"ncent must be in [1, 65536], got $ncent")
    require(samplePerCent >= 1, "samplePerCent must be positive")
    // the sample limit is ncent·samplePerCent as an Int: guard the
    // product (ncent may be 65536 and samplePerCent is caller-chosen,
    // so Int arithmetic can silently overflow into a negative limit
    // and surface as an unrelated Spark error)
    require(ncent.toLong * samplePerCent <= Int.MaxValue,
      s"pqCodebookLloyd: ncent*samplePerCent = " +
        s"${ncent.toLong * samplePerCent} overflows Int — lower " +
        "samplePerCent or ncent")
    val dsub = dim / nsub
    val spark = corpus.sparkSession
    import spark.implicits._
    val samplePts = hashSampleVecs(corpus, idCol, vecCol,
      ncent * samplePerCent, seed)
    require(samplePts.nonEmpty, "pqCodebookLloyd: empty corpus")
    samplePts.foreach(v => require(v.length == dim,
      s"pqCodebookLloyd: vector of ${v.length} dims, expected $dim"))
    val rows = (0 until nsub).flatMap { s =>
      val sub = samplePts.map(v =>
        java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val cents = LloydKernel.fit(sub, ncent, maxIter,
        farthestSeeding = true)
      require(cents.length == ncent,
        s"pqCodebookLloyd: slot $s has only ${cents.length} distinct " +
          s"sample subvectors for ncent=$ncent — lower ncent or raise " +
          "samplePerCent")
      cents.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }
    rows.toDF("slot", "code", "cvec")
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
    * code. Map-only through the NATIVE `graft_pq_encode` kernel
    * (bit-identical to the relational array_min-over-structs form it
    * replaced — sequential double accumulation, strict-`<` argmin;
    * the HOF form allocated ncent structs and boxed every element
    * per slot per row). The codebook collects to ONE parameter-
    * bounded flat array (nsub·ncent·dsub doubles — the BPE-merge-
    * table convention) riding inside the expression: no join, no
    * broadcast variable, no shuffle touches the corpus. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, dim: Int, nsub: Int, ncent: Int): DataFrame =
    corpus.select(col(idCol).as("id"),
      pqCodesColumn(codebook, dim, nsub, ncent)(col(vecCol)).as("codes"))

  /** The native PQ-encode kernel as a reusable Column (the codebook
    * collected once — parameter-bounded — and riding inside the
    * expression), so composed operators ([[topKIvfAdc]]) can encode
    * in the SAME pass that computes other per-row columns. */
  private def pqCodesColumn(codebook: DataFrame, dim: Int, nsub: Int,
      ncent: Int)(vec: Column): Column = {
    val dsub = dim / nsub
    val rows = codebook.select(col("slot"), col("code"), col("cvec"))
      .collect() // parameter-bounded: nsub*ncent rows
    require(rows.length == nsub * ncent,
      s"codebook has ${rows.length} entries, expected ${nsub * ncent}")
    val flat = new Array[Double](nsub * ncent * dsub)
    rows.foreach { r =>
      val s = r.getInt(0)
      val c = r.getInt(1)
      val cv = r.getSeq[Double](2)
      require(cv.length == dsub,
        s"codebook (slot=$s, code=$c) has ${cv.length} dims, " +
          s"expected $dsub")
      var j = 0
      while (j < dsub) {
        flat((s * ncent + c) * dsub + j) = cv(j)
        j += 1
      }
    }
    bridge.column(graft.expressions.PqEncodeExpr(
      bridge.expression(asDouble(vec)), flat, nsub, ncent, dsub))
  }

  /** Diagnostic arm: the pre-native relational formulation of
    * [[pqEncode]] (array_min over (dist, code) structs per slot) —
    * retained for the MicroBench A/B so the native kernel's win
    * stays measurable on this host; output bit-identical. */
  def pqEncodeRelational(corpus: DataFrame, idCol: String,
      vecCol: String, codebook: DataFrame, dim: Int, nsub: Int,
      ncent: Int): DataFrame = {
    val dsub = dim / nsub
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("_v"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("id"), transform(sequence(lit(0), lit(nsub - 1)), s => {
        val entries = slice(col("_cb"), s * ncent + 1, lit(ncent))
        array_min(transform(entries, e =>
          struct(sqDist(e, col("_v"), s * dsub, dsub).as("d"),
            e.getField("code").as("code"))))
          .getField("code").cast(IntegerType)
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
    // ids ride the aggregate as longs — a non-numeric id would cast
    // to NULL (query rows would NPE at the collect, corpus rows would
    // be silently skipped by every heap): fail by name at plan build
    requireNumeric("pqAdcTopK", queries, qId, "id")
    requireNumeric("pqAdcTopK", corpus, cId, "id")
    val dsub = dim / nsub
    val codes = pqEncode(corpus, cId, vecCol, codebook, dim, nsub, ncent)
    // per-query integer LUTs — a bounded driver collect (queries are
    // the broadcast-small side by this operator's contract; ids must
    // be numeric). The scan itself is ONE bounded-state aggregate:
    // nq·k (adc, id) pairs of state, the corpus traversed once —
    // never the |corpus|·|queries| crossJoin+rank materialization
    // (measured 10:1 row machinery over arithmetic once the per-row
    // kernel went native). Rows with NULL codes are excluded (the
    // old window form let a NULL adc sort first under asc-nulls-
    // first — a candidate with no vector must never outrank one
    // with a distance).
    val qlutRows = queries
      .select(col(qId).cast(LongType).as("query_id"),
        asDouble(col(vecCol)).as("_qv"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("query_id"), transform(col("_cb"), e =>
        floor(sqDist(e, col("_qv"), e.getField("slot") * dsub, dsub) *
          lit(1e6)).cast(LongType)).as("_lut"))
      .collect()
    require(qlutRows.nonEmpty && qlutRows.length <= 65536,
      s"pqAdcTopK: need 1..65536 queries, got ${qlutRows.length}")
    // numeric TYPE admits NULL VALUES, and a NULL/short embedding
    // nulls LUT ELEMENTS that would silently unbox to 0 (an all-zero
    // LUT scores everything at distance 0) — fail by name (the
    // topKIvfAdc rule)
    qlutRows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) &&
        !r.getSeq[Any](1).contains(null),
        "pqAdcTopK: queries contain a NULL id or NULL/incomplete " +
          "vector — drop or repair such query rows upstream (every " +
          "query must carry an id and a dim-length embedding)")
    }
    val luts = qlutRows.map(_.getSeq[Long](1).toArray)
    val spark = corpus.sparkSession
    import spark.implicits._
    val qidx = spark.createDataset(
      qlutRows.toSeq.zipWithIndex.map { case (r, i) => (i, r.getLong(0)) })
      .toDF("q_idx", "query_id")
    val agg = graft.expressions.PqAdcTopKAgg(
      bridge.expression(col("id").cast(LongType)),
      bridge.expression(col("codes")), luts, k, ncent)
    codes.agg(bridge.column(agg.toAggregateExpression()).as("_tk"))
      .select(explode(col("_tk")).as("r"))
      .select(col("r.q_idx").as("q_idx"), col("r.rank").as("rank"),
        col("r.neighbor_id").as("neighbor_id"),
        col("r.adc_micro").as("adc_micro"))
      .join(broadcast(qidx), Seq("q_idx"))
      .select("query_id", "rank", "neighbor_id", "adc_micro")
  }

  /** Hard-negative mining for contrastive training: per anchor, the k
    * most-cosine-similar corpus vectors with a DIFFERENT label — close
    * in embedding space but the wrong class, the negatives that
    * actually move a contrastive loss. Same broadcast-the-queries
    * map-only shape as [[topKBruteForce]] (swap the corpus side for
    * [[pqAdcTopK]]'s compressed scan at 100 TB); NULL-labeled rows are
    * never mined and NULL-labeled anchors get no rows (an unlabeled
    * vector cannot certify "different class"). Output: (query_id,
    * rank, neighbor_id, n_label, cosine). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, labelCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    val q = queries.select(col(qId).as("query_id"),
      col(labelCol).as("q_label"), asDouble(col(vecCol)).as("qv"),
      norm(asDouble(col(vecCol))).as("qn"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      col(labelCol).as("n_label"), asDouble(col(vecCol)).as("cv"),
      norm(asDouble(col(vecCol))).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("n_label") =!= col("q_label")) // NULL labels drop
      .select(col("query_id"), col("neighbor_id"), col("n_label"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "n_label", "cosine")
  }

  /** Contrastive training TRIPLETS — the artifact an embedding-model
    * trainer consumes: per anchor, the nearest SAME-label vector
    * (excluding self) as the positive and the nearest DIFFERENT-label
    * vector as the hard negative ([[hardNegatives]]' rank-1), with the
    * anchor–positive vs anchor–negative cosine margin in micro-units.
    * A small (≤0) margin marks the triplets that actually teach the
    * model. One map-only scored pass (anchors broadcast), then ONE
    * per-anchor max_by aggregate per arm — never a rank window over
    * the corpus. NULL-labeled rows take part in neither arm; anchors
    * missing either arm (singleton label, or a single-label corpus)
    * drop — a triplet needs all three vertices. Output: (anchor_id,
    * pos_id, neg_id, pos_cosine, neg_cosine, margin_micro). */
  def contrastiveTriplets(anchors: DataFrame, corpus: DataFrame,
      aId: String, cId: String, vecCol: String,
      labelCol: String): DataFrame = {
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    val a = anchors.select(col(aId).as("anchor_id"),
      col(labelCol).as("a_label"), asDouble(col(vecCol)).as("qv"),
      norm(asDouble(col(vecCol))).as("qn"))
    val c = corpus.select(col(cId).as("neighbor_id"),
      col(labelCol).as("n_label"), asDouble(col(vecCol)).as("cv"),
      norm(asDouble(col(vecCol))).as("cn"))
    val scored = c.crossJoin(broadcast(a))
      .filter(col("n_label").isNotNull && col("a_label").isNotNull)
      .select(col("anchor_id"), col("a_label"), col("neighbor_id"),
        col("n_label"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
    // best-by-(cosine desc, id asc) via max_by on (cosine, -id): one
    // bounded-state aggregate per arm, no window
    def best(pred: Column) = max_by(
      struct(col("neighbor_id"), col("cosine")),
      when(pred, struct(col("cosine"), -col("neighbor_id"))))
    scored
      .filter(col("neighbor_id") =!= col("anchor_id"))
      .groupBy("anchor_id")
      .agg(
        best(col("n_label") === col("a_label")).as("_pos"),
        best(col("n_label") =!= col("a_label")).as("_neg"))
      .filter(col("_pos").isNotNull && col("_neg").isNotNull)
      .select(col("anchor_id"),
        col("_pos.neighbor_id").as("pos_id"),
        col("_neg.neighbor_id").as("neg_id"),
        col("_pos.cosine").as("pos_cosine"),
        col("_neg.cosine").as("neg_cosine"),
        floor((col("_pos.cosine") - col("_neg.cosine")) * lit(1e6))
          .cast(LongType).as("margin_micro"))
  }

  /** Two-stage compressed-domain retrieval — the production ANN
    * pipeline shape (FAISS IVF-PQ + refine): (1) LSH band signatures
    * generate candidates (keys only), (2) ADC over PQ codes ranks
    * them cheaply and keeps a shortlist of m, (3) exact cosine
    * re-ranks only those m. The corpus is touched map-only (signature
    * pass + code scan); every join broadcasts the query-derived small
    * side; stage-2 cost is nsub lookups per candidate and stage-3
    * cost is m exact dots per query. Every stage is deterministic, so
    * the DuckDB oracle replays candidates, shortlist, and final ranks
    * bit for bit. */
  def twoStageRetrieve(queries: DataFrame, corpus: DataFrame,
      qId: String, cId: String, vecCol: String, codebook: DataFrame,
      dim: Int, nsub: Int, ncent: Int, bands: Int = 4,
      bitsPerBand: Int = 8, m: Int = 20, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.NativeFunctions.register(corpus.sparkSession)
    val dsub = dim / nsub
    val planes = shaPlanes(bands, bitsPerBand, dim)
    val qSigs = shaBandSignatures(queries, qId, "query_id", vecCol, planes)
    val cSigs = shaBandSignatures(corpus, cId, "neighbor_id", vecCol,
      planes)
    val candidates = cSigs.join(broadcast(qSigs), Seq("band", "bucket"))
      .select("query_id", "neighbor_id").distinct()
    val codes = pqEncode(corpus, cId, vecCol, codebook, dim, nsub, ncent)
      .withColumnRenamed("id", "neighbor_id")
    val qlut = queries
      .select(col(qId).as("query_id"), asDouble(col(vecCol)).as("_qv"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("query_id"), transform(col("_cb"), e =>
        floor(sqDist(e, col("_qv"), e.getField("slot") * dsub, dsub) *
          lit(1e6)).cast(LongType)).as("_lut"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_micro"), col("neighbor_id"))
    val shortlist = codes
      .join(broadcast(candidates), Seq("neighbor_id"))
      .join(broadcast(qlut), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        bridge.column(graft.expressions.PqAdcExpr(
          bridge.expression(col("codes")),
          bridge.expression(col("_lut")), ncent)).as("adc_micro"))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= m)
      .select("query_id", "neighbor_id")
    val qVec = queries.select(col(qId).as("query_id"),
      asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val cVec = corpus.select(col(cId).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), norm(asDouble(col(vecCol))).as("cn"))
    val wK = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cVec.join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** The coarse quantizer both composed operators share
    * ([[topKIvfAdc]], [[graft.llm.Dedup.semanticDedup]]): either
    * tier is a parameter-bounded collect — never O(corpus). Cell id
    * = hash-rank order (ties to the lower id, the pqCodebook rule)
    * in the SAMPLED oracle tier; Lloyd output order (deterministic
    * farthest-point seeding over a bounded hash-spread sample of
    * nlist·samplePerCell rows, the [[topKIvf]] discipline) in the
    * PRODUCTION tier. Fails fast by name when the corpus (or the
    * sample's distinct points) cannot fill nlist cells — phantom
    * cells would read past the centroid literal: null distances
    * that sort FIRST in the struct ordering, silently degenerating
    * the pruning (or INVALID_ARRAY_INDEX under ANSI). */
  private[llm] def coarseCentroids(corpus: DataFrame, cId: String,
      vecCol: String, dim: Int, nlist: Int, production: Boolean,
      seed: Long, maxIter: Int, samplePerCell: Int,
      salt: String): Array[Seq[Double]] =
    if (production) {
      require(samplePerCell >= 1 &&
        nlist.toLong * samplePerCell <= Int.MaxValue,
        s"coarseCentroids: nlist*samplePerCell = " +
          s"${nlist.toLong * samplePerCell} not in [1, Int.MaxValue]")
      val pts = hashSampleVecs(corpus, cId, vecCol,
        nlist * samplePerCell, seed)
      require(pts.nonEmpty, "coarseCentroids: empty corpus")
      pts.foreach(c => require(c.length == dim,
        s"coarseCentroids: vector of ${c.length} dims, expected $dim"))
      val cs = LloydKernel.fit(pts, nlist, maxIter,
        farthestSeeding = true)
      require(cs.length == nlist,
        s"coarseCentroids: sample seeds only ${cs.length} distinct " +
          s"coarse centroids for nlist=$nlist — lower nlist or raise " +
          "samplePerCell")
      cs.map(_.toSeq)
    } else {
      val cs = corpus.select(asDouble(col(vecCol)).as("_v"),
          expr(s"cast(conv(substr(sha2(concat('ivf:$salt:', " +
            s"cast(`$cId` as string)), 256), 1, 15), 16, 10) as bigint)")
            .as("_rk"),
          col(cId).cast(StringType).as("_id"))
        .orderBy(col("_rk"), col("_id")).limit(nlist)
        .collect().map(_.getSeq[Double](0))
      require(cs.length == nlist,
        s"coarseCentroids: corpus has only ${cs.length} rows for " +
          s"nlist=$nlist — lower nlist")
      cs.foreach(c => require(c.length == dim,
        s"coarseCentroids: vector of ${c.length} dims, expected $dim"))
      cs
    }

  /** A trained two-level coarse quantizer: `nSuper` super-centroids,
    * and per super-cell a slice of the concatenated sub-centroid
    * table (`subOffsets`, length nSuper+1, also the global-cell-id
    * bases — the [[graft.expressions.CellAssign2Expr]] layout).
    * `totalCells` ≈ the requested nlist (proportional per-super
    * allocation rounds, and degenerate sample regions collapse). */
  private[llm] case class TwoLevelCentroids(superFlat: Array[Double],
      nSuper: Int, subFlat: Array[Double], subOffsets: Array[Int],
      dim: Int) {
    def totalCells: Int = subOffsets(nSuper)
  }

  /** Train the TWO-LEVEL coarse quantizer — the hierarchical remedy
    * for the flat tier's assignment wall (SCALE.md r13: at constant
    * cell size nlist tracks n, so flat assignment is n·nlist·dim =
    * quadratic in n — semanticDedup 65 s @1M → 3416 s @10M; flat
    * stays the ≤~10⁴-cell workhorse AND the oracle arm).
    *
    * Every stage is bounded and deterministic:
    * 1. ONE hash-spread sample of nlist·samplePerCell vectors (the
    *    [[hashSampleVecs]] discipline — the flat tier's sample size).
    * 2. √nlist super-centroids Lloyd-trained on the sample's PREFIX
    *    (nSuper·samplePerCell points — the same hash order, so the
    *    prefix IS the smaller hash-spread sample): nSuper²·spc·dim·
    *    iters = nlist·spc·dim·iters flops, the flat trainer's cost
    *    divided by nlist.
    * 3. Sample points partition by nearest super (ties to the lower
    *    index, sample order preserved — Lloyd's order-sensitive
    *    seeding stays deterministic).
    * 4. Per super: k_s ∝ its sample share (so cell granularity tracks
    *    density, Σk_s ≈ nlist), Lloyd on ITS points only — balanced
    *    cost nlist^1.5·spc·dim·iters vs the flat trainer's nlist²
    *    (measured 52× at 10M, the r13 wall). A super-cell with no
    *    sample points keeps itself as its only sub-centroid (the
    *    kernel's non-empty-slice contract).
    *
    * Pick `samplePerCell` for BALANCE, not just cost: each super's
    * sub-Lloyd sees only ~√nlist·samplePerCell points, and with <~16
    * points per sub-cell on weakly-clustered data the sub-centroids
    * are noisy enough to skew cell sizes — which blows up the
    * consumer's per-cell quadratic (measured at 1M uniform: spc=4
    * two-level cells ran the in-cell pass ~10× the flat tier's).
    * The trainer is nlist^1.5·spc (vs flat's nlist²·spc), so a 4×
    * LARGER spc here still costs √nlist/4 of the flat trainer it
    * replaces; the binding limit is the driver sample collect
    * (nlist·spc vectors through [[hashSampleVecs]]).
    *
    * The quantizer is for the PRODUCTION tier only: like the flat
    * Lloyd arm it is rows-only-checkable (the q44 caveat); verdict
    * equivalence with the flat arm is spec-pinned on planted
    * clusters. */
  private[llm] def coarseCentroidsTwoLevel(corpus: DataFrame,
      cId: String, vecCol: String, dim: Int, nlist: Int, seed: Long,
      maxIter: Int, samplePerCell: Int): TwoLevelCentroids = {
    require(nlist >= 4, s"coarseCentroidsTwoLevel: nlist $nlist < 4 — " +
      "use the flat tier for tiny cell counts")
    require(samplePerCell >= 1 &&
      nlist.toLong * samplePerCell <= Int.MaxValue,
      s"coarseCentroidsTwoLevel: nlist*samplePerCell = " +
        s"${nlist.toLong * samplePerCell} not in [1, Int.MaxValue]")
    val nSuper = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val sample = hashSampleVecs(corpus, cId, vecCol,
      nlist * samplePerCell, seed)
    require(sample.nonEmpty, "coarseCentroidsTwoLevel: empty corpus")
    sample.foreach(c => require(c.length == dim,
      s"coarseCentroidsTwoLevel: vector of ${c.length} dims, " +
        s"expected $dim"))
    val superCents = LloydKernel.fit(
      sample.take(nSuper * samplePerCell), nSuper, maxIter,
      farthestSeeding = true)
    require(superCents.length == nSuper,
      s"coarseCentroidsTwoLevel: sample seeds only " +
        s"${superCents.length} distinct super-centroids for " +
        s"nSuper=$nSuper — lower nlist or raise samplePerCell")
    // partition the FULL sample by nearest super (ties → lower index)
    val groups = Array.fill(nSuper)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    sample.foreach { p =>
      var bestS = 0
      var bestD = Double.PositiveInfinity
      var s = 0
      while (s < nSuper) {
        var d = 0.0
        var j = 0
        while (j < dim) {
          val diff = p(j) - superCents(s)(j); d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; bestS = s }
        s += 1
      }
      groups(bestS) += p
    }
    // per-super sub-training stays SERIAL by measurement, not
    // oversight: it is embarrassingly parallel on paper (each super
    // trains on its points only, output independent of scheduling),
    // but a 31-thread pool measured consistently SLOWER end-to-end
    // at 10M/nlist=20480 (228-273 s vs 173 s serial, 3-vs-1 checked
    // executions, identical shuffle/jobs) — the phase is memory-
    // bandwidth-bound, not flop-bound, and Σ m_s·k_s·dim·iters ≈
    // sample·√nlist·dim·iters ≈ 1.2·10¹⁰ flops is seconds serial
    val subs: Array[Array[Array[Double]]] =
      Array.tabulate(nSuper) { s =>
        val pts = groups(s)
        if (pts.isEmpty) Array(superCents(s).clone())
        else {
          val kS = math.max(1, math.round(
            nlist.toDouble * pts.length / sample.length).toInt)
          LloydKernel.fit(pts.toArray, math.min(kS, pts.length),
            maxIter, farthestSeeding = true)
        }
      }
    val subOffsets = subs.scanLeft(0)(_ + _.length)
    val superFlat = new Array[Double](nSuper * dim)
    superCents.zipWithIndex.foreach { case (c, s) =>
      System.arraycopy(c, 0, superFlat, s * dim, dim) }
    val subFlat = new Array[Double](subOffsets.last * dim)
    subs.flatten.zipWithIndex.foreach { case (c, g) =>
      System.arraycopy(c, 0, subFlat, g * dim, dim) }
    TwoLevelCentroids(superFlat, nSuper, subFlat, subOffsets, dim)
  }

  /** The two-level corpus assignment column — one fused native
    * kernel per row ([[graft.expressions.CellAssign2Expr]]):
    * nSuper·dim + subCount·dim ≈ 2√nlist·dim primitive ops, the
    * n·nlist·dim flat pass's scale fix. */
  private[llm] def cellAssign2Column(tl: TwoLevelCentroids)(
      vec: Column): Column =
    bridge.column(graft.expressions.CellAssign2Expr(
      bridge.expression(asDouble(vec)), tl.superFlat, tl.nSuper,
      tl.subFlat, tl.subOffsets, tl.dim))

  /** Driver-side two-level probe for the BOUNDED query side of
    * [[topKIvfAdc]]: nearest supers first (ties → lower index),
    * gathering supers until their sub-cells cover `nprobe` plus one
    * boundary-slack super, then the `nprobe` nearest of the gathered
    * sub-cells by exact squared-L2 (ties → lower global id).
    * Deterministic; cost per query ≈ 2√nlist·dim + a slack super. */
  private[llm] def probeCellsTwoLevel(tl: TwoLevelCentroids,
      qv: Array[Double], nprobe: Int): Array[Int] = {
    val dim = tl.dim
    def d2(flat: Array[Double], i: Int): Double = {
      var d = 0.0; var j = 0
      while (j < dim) {
        val diff = qv(j) - flat(i * dim + j); d += diff * diff; j += 1
      }
      d
    }
    val superOrder = Array.range(0, tl.nSuper)
      .map(s => (d2(tl.superFlat, s), s)).sortBy(identity).map(_._2)
    val want = math.min(nprobe, tl.totalCells)
    val gathered = scala.collection.mutable.ArrayBuffer.empty[Int]
    var si = 0
    var slack = false
    while (si < tl.nSuper && (gathered.length < want || !slack)) {
      if (gathered.length >= want) slack = true // one extra super
      val s = superOrder(si)
      gathered ++= (tl.subOffsets(s) until tl.subOffsets(s + 1))
      si += 1
    }
    gathered.map(g => (d2(tl.subFlat, g), g)).sortBy(identity)
      .take(want).map(_._2).toArray
  }

  /** Exact squared-L2 to every centroid as (d, cell) structs —
    * `array_min` over the result is argmin with the cell tiebreak.
    * The sum nests as nsub sequential slot-sums of dsub sequential
    * terms: the SAME value as one flat sum mathematically, but the
    * GROUPING the oracle parity is proven for (q186 pinned list_sum
    * ≡ Spark's sequential aggregate on dsub-length lists; a flat
    * dim-length list_sum's summation order is not pinned anywhere).
    * Shape: ONE transform over a single centroid-matrix literal with
    * a single-pass struct-accumulator fold (running slot partial,
    * flushed at each slot boundary — bit-identical rounding to the
    * nested aggregates it replaces); the first formulation copied
    * the whole nested-HOF tree once PER CELL and re-evaluated the
    * squared-diff array once per slot, which made q214 the bench's
    * slowest query on plan size alone. */
  private[llm] def cellDistStructs(cents: Array[Seq[Double]],
      nlist: Int, dsub: Int)(v: Column): Column = {
    val centLit = typedlit(cents.map(_.toSeq))
    transform(sequence(lit(0), lit(nlist - 1)), ci => {
      val sq = zip_with(v, element_at(centLit, ci + 1),
        (a, b) => (a - b) * (a - b))
      val fold = aggregate(sq,
        struct(lit(0.0).as("d"), lit(0.0).as("p"), lit(0).as("i")),
        (st, x) => {
          val p2 = st.getField("p") + x
          val i2 = st.getField("i") + lit(1)
          struct(
            when(i2 % dsub === 0, st.getField("d") + p2)
              .otherwise(st.getField("d")).as("d"),
            when(i2 % dsub === 0, lit(0.0)).otherwise(p2).as("p"),
            i2.as("i"))
        },
        st => st.getField("d"))
      struct(fold.as("d"), ci.cast(IntegerType).as("cell"))
    })
  }

  /** The PRODUCTION-tier cell scorer: argmin ||v−c||² = argmin
    * (|c|² − 2·c·v) over native `graft_dot` — one codegen'd dot per
    * cell instead of [[cellDistStructs]]' interpreted per-element
    * fold. Same argmin (dropping the row-constant |v|² preserves
    * per-row ordering), NOT the same `d` values — which is exactly
    * the tier split: the sampled tier keeps the oracle-replayable
    * sequential sums, the production tier keeps the 100 TB-shaped
    * arithmetic (measured: the interpreted fold runs ~1M
    * element-lambdas per 250 rows at nlist=64 — hours at 1M rows;
    * the native form is minutes of dot products). Requires
    * `NativeFunctions.register`. */
  private[llm] def nativeCellStructs(cents: Array[Seq[Double]])(
      v: Column): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      val cn2 = c.map(x => x * x).sum
      struct(
        (lit(cn2) - lit(2.0) *
          call_function("graft_dot", v, typedlit(c))).as("d"),
        lit(i).cast(IntegerType).as("cell"))
    }: _*)

  /** The production-tier CORPUS cell assignment as one native kernel
    * ([[graft.expressions.CellAssignExpr]]): reads the vector once,
    * nlist·dim fused primitive ops — the per-cell relational forms
    * (fold or native-dot array) re-evaluate their input expression
    * once PER CELL under CollapseProject, which at 1M×64d, nlist=64
    * meant 64 cast-transforms per row (~13 s of the corpus pass). */
  private[llm] def cellAssignColumn(cents: Array[Seq[Double]],
      dim: Int)(vec: Column): Column = {
    val flat = new Array[Double](cents.length * dim)
    cents.zipWithIndex.foreach { case (c, i) =>
      var j = 0
      while (j < dim) { flat(i * dim + j) = c(j); j += 1 }
    }
    bridge.column(graft.expressions.CellAssignExpr(
      bridge.expression(asDouble(vec)), flat, cents.length, dim))
  }

  /** IVF-ADC composed search (the FAISS IVFADC shape): coarse-
    * quantize the corpus into `nlist` cells, PQ-compress it, and
    * answer each query by scanning ONLY its `nprobe` nearest cells'
    * CODES with the per-query ADC lookup table — BOTH prunings of
    * the 100 TB search problem in one plan: per-query candidate rows
    * drop O(corpus) → O(corpus·nprobe/nlist), and per-candidate
    * arithmetic drops dim multiplies → nsub native LUT lookups
    * (`graft_pq_adc`).
    *
    * Quantizer tiers: with `production = false` (the default, the
    * q214 oracle tier) BOTH quantizers are the hash-rank-SAMPLED
    * forms (coarse cells = the nlist corpus rows with the smallest
    * sha256("ivf:salt:id"), PQ codebook = [[pqCodebook]]), so every
    * cell assignment, code, LUT entry, and rank is replayable in the
    * DuckDB oracle — the q186/q187 discipline. `production = true`
    * swaps BOTH arms to their Lloyd-trained forms — coarse cells
    * from [[LloydKernel]] with deterministic farthest-point seeding
    * over a bounded hash-spread sample (nlist·samplePerCell rows,
    * the [[topKIvf]] discipline), codebook from [[pqCodebookLloyd]]
    * — through the IDENTICAL pipeline shape: sampled centroids are
    * arbitrary corpus rows, so cells are unbalanced and same-mode
    * clusters merge (the defect PqRecallProbe quantified for
    * codebooks: Lloyd recall@100 1.000 vs sampled 0.970); the
    * production arm is rows-only-checkable (the q44 caveat) but is
    * the recall real embedding search needs. Cell distances are
    * exact sequential-sum squared-L2 (the
    * `list_sum(list_transform(...))` parity form q186 pinned); ADC
    * sums are integer micro-units; ties to the lower cell /
    * neighbor id. The whole search is ONE bounded-state aggregate
    * over a single corpus pass
    * ([[graft.expressions.PqAdcCellTopKAgg]]): each row's codes are
    * scored against only the queries probing the row's cell, with
    * k (adc, id) heap pairs of state per query — never a rank window
    * over candidates (SURVEY Part 7.5) and never a cell-key join
    * (measured: expanding rows by matching probes cost 12× more
    * than the pruning saved at 1M×100q). Queries are the bounded
    * side by contract: 1..65536 rows, numeric ids, one bounded
    * collect for the LUTs and probe lists (the [[pqAdcTopK]] rule).
    * Approximation contract: candidates OUTSIDE the probed cells
    * are unseen by construction (that is the pruning), and ranking
    * inside them is ADC distance, not exact distance — re-rank a
    * shortlist exactly where recall matters (the
    * [[twoStageRetrieve]] pattern). Neighbor ids must be numeric
    * (castable to long — the [[pqAdcTopK]] contract). Output:
    * (query_id, rank, neighbor_id, adc_micro). */
  def topKIvfAdc(queries: DataFrame, corpus: DataFrame, qId: String,
      cId: String, vecCol: String, dim: Int, nsub: Int, ncent: Int,
      nlist: Int, nprobe: Int, k: Int = 5, salt: String = "",
      production: Boolean = false, seed: Long = 42L, maxIter: Int = 8,
      samplePerCell: Int = 50, samplePerCent: Int = 50,
      twoLevel: Boolean = false): DataFrame = {
    require(dim % nsub == 0, s"dim $dim not divisible by nsub $nsub")
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
      s"need 1 <= nprobe <= nlist, got nprobe=$nprobe nlist=$nlist")
    require(k >= 1, "k must be positive")
    // twoLevel swaps the coarse quantizer for the hierarchical one
    // (the >10⁴-cell scale arm — assignment ≈2√nlist·dim per corpus
    // row instead of nlist·dim; Lloyd at both levels, so it is
    // production-tier by construction, rows-only-checkable like the
    // flat Lloyd arm). Probe semantics stay "nprobe nearest cells",
    // found hierarchically per query driver-side
    // ([[probeCellsTwoLevel]] — queries are the bounded side).
    require(!twoLevel || production,
      "topKIvfAdc: twoLevel is a production-tier arm; the sampled " +
        "oracle tier stays flat")
    // ids ride the aggregate as longs: a non-numeric id would cast to
    // NULL and be SILENTLY skipped by every heap (corpus side) or NPE
    // at the collect (query side) — fail by name at plan build
    // instead (the pqAdcTopK contract, enforced on both sides)
    requireNumeric("topKIvfAdc", corpus, cId, "id")
    requireNumeric("topKIvfAdc", queries, qId, "id")
    val dsub = dim / nsub
    val tl: Option[TwoLevelCentroids] =
      if (twoLevel) Some(coarseCentroidsTwoLevel(corpus, cId, vecCol,
        dim, nlist, seed, maxIter, samplePerCell))
      else None
    lazy val cents = coarseCentroids(corpus, cId, vecCol, dim, nlist,
      production, seed, maxIter, samplePerCell, salt)
    // tier-split cell scorer: oracle-replayable interpreted fold in
    // the sampled tier, native-dot argmin in production (identical
    // argmin, 100 TB arithmetic — see nativeCellStructs)
    if (production)
      graft.expressions.NativeFunctions.register(corpus.sparkSession)
    def cellStructs(v: Column): Column =
      if (production) nativeCellStructs(cents)(v)
      else cellDistStructs(cents, nlist, dsub)(v)
    val codebook =
      if (production) pqCodebookLloyd(corpus, cId, vecCol, dim, nsub,
        ncent, seed, maxIter, samplePerCent)
      else pqCodebook(corpus, cId, vecCol, dim, nsub, ncent, salt)
    // ONE corpus pass: cell assignment + native PQ codes. Production
    // assigns through the native CellAssignExpr kernel (vector read
    // once, fused loops); the sampled tier keeps the relational fold
    // whose nested sums ARE the oracle replay.
    val cellCol: Column =
      if (twoLevel) cellAssign2Column(tl.get)(col(vecCol))
      else if (production) cellAssignColumn(cents, dim)(col(vecCol))
      else array_min(cellStructs(asDouble(col(vecCol))))
        .getField("cell")
    val coded = corpus
      .select(col(cId).as("neighbor_id"),
        pqCodesColumn(codebook, dim, nsub, ncent)(col(vecCol))
          .as("codes"),
        cellCol.as("cell"))
    // queries are the bounded side by this operator's contract (the
    // pqAdcTopK rule: numeric ids, 1..65536 rows): ONE bounded
    // collect yields each query's integer ADC LUT and its nprobe
    // probed cells, computed IN-PLAN by the same expressions as the
    // LUT/probe columns always were — the sampled tier's oracle
    // replay is value-identical.
    // twoLevel collects the raw query vector instead of in-plan probe
    // cells: probes come from the driver-side hierarchical search
    // (bounded — ≤65536 queries × ~2√nlist·dim flops each); the flat
    // tiers keep the in-plan probe expression the oracle replays
    val probeCol: Column =
      if (twoLevel) col("_qv")
      else transform(slice(array_sort(cellStructs(col("_qv"))), 1,
        nprobe), s => s.getField("cell"))
    val qRows = queries
      .select(col(qId).cast(LongType).as("query_id"),
        asDouble(col(vecCol)).as("_qv"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("query_id"),
        transform(col("_cb"), e =>
          floor(sqDist(e, col("_qv"), e.getField("slot") * dsub, dsub) *
            lit(1e6)).cast(LongType)).as("_lut"),
        probeCol.as("_cells"))
      .collect()
    require(qRows.nonEmpty && qRows.length <= 65536,
      s"topKIvfAdc: need 1..65536 queries, got ${qRows.length}")
    // the type check above admits numeric columns holding NULL VALUES,
    // and a NULL or short embedding nulls LUT/probe ELEMENTS — those
    // would silently UNBOX TO ZERO downstream (unboxToLong(null) = 0:
    // an all-zero LUT scores every candidate at distance 0) or NPE at
    // the driver; fail by name instead
    qRows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) &&
        !r.getSeq[Any](1).contains(null) &&
        !r.getSeq[Any](2).contains(null),
        "topKIvfAdc: queries contain a NULL id or NULL/incomplete " +
          "vector — drop or repair such query rows upstream (every " +
          "query must carry an id and a dim-length embedding)")
    }
    val luts = qRows.map(_.getSeq[Long](1).toArray)
    val nCells = tl.map(_.totalCells).getOrElse(nlist)
    val probesOf: org.apache.spark.sql.Row => Seq[Int] = tl match {
      case Some(t) => r =>
        probeCellsTwoLevel(t, r.getSeq[Double](2).toArray, nprobe).toSeq
      case None => r => r.getSeq[Int](2)
    }
    val cellQueries: Array[Array[Int]] = {
      val m = Array.fill(nCells)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      qRows.zipWithIndex.foreach { case (r, qi) =>
        probesOf(r).foreach(c => m(c) += qi)
      }
      m.map(_.toArray)
    }
    // final stage: BOTH prunings inside ONE bounded-state aggregate —
    // a single corpus pass scores each row's codes against only the
    // queries probing its cell (nq·k heap pairs of state; the first
    // formulation joined the probes onto the corpus by cell key,
    // which expanded every row ~nq·nprobe/nlist times with array
    // payloads — measured 13.0 s at 1M×100q vs 1.07 s for the
    // UNPRUNED flat aggregate: row machinery over arithmetic, the
    // r10 lesson — the in-aggregate pruning keeps the lookup savings
    // without the expansion)
    val spark = corpus.sparkSession
    import spark.implicits._
    val qidx = spark.createDataset(
      qRows.toSeq.zipWithIndex.map { case (r, i) => (i, r.getLong(0)) })
      .toDF("q_idx", "query_id")
    val agg = graft.expressions.PqAdcCellTopKAgg(
      bridge.expression(col("neighbor_id").cast(LongType)),
      bridge.expression(col("codes")),
      bridge.expression(col("cell")), luts, cellQueries, k, ncent)
    coded.agg(bridge.column(agg.toAggregateExpression()).as("_tk"))
      .select(explode(col("_tk")).as("r"))
      .select(col("r.q_idx").as("q_idx"), col("r.rank").as("rank"),
        col("r.neighbor_id").as("neighbor_id"),
        col("r.adc_micro").as("adc_micro"))
      .join(broadcast(qidx), Seq("q_idx"))
      .select("query_id", "rank", "neighbor_id", "adc_micro")
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein 1998): per
    * query, greedily pick k candidates maximizing
    * λ·rel − (1−λ)·maxSim(c, already-picked) — the rerank stage that
    * keeps near-duplicate hits from crowding a retrieval shortlist
    * (λ=1 is plain relevance ranking; λ→0 is pure diversity). ONE
    * grouped bounded-state aggregate
    * ([[graft.expressions.MmrTopKAgg]]): the greedy needs the whole
    * shortlist per query before its first pick, so this is a RERANK
    * operator by contract — its input is a prior retrieval's top-N
    * ([[pqAdcTopK]]/[[topKIvfAdc]]/[[probeAnnIndex]] output joined
    * back to vectors), and an in-plan guard fails by name when any
    * query exceeds `maxCandidates` (the embeddingPairsExact
    * discipline) BEFORE anything buffers. Relevance is integer
    * micro-units by contract; sims are floor(cos·10⁶) over the
    * nested nsub×dsub sequential dot (the q186 oracle grouping), so
    * every pick and score is engine-exact; ties to the lower id.
    * Candidate ids must be numeric. Output: (query_id, rank,
    * cand_id, mmr_micro) — mmr_micro is the score at selection
    * time. */
  def mmrRerank(candidates: DataFrame, qId: String, cId: String,
      vecCol: String, relCol: String, dim: Int, nsub: Int,
      k: Int = 5, lambdaMicro: Long = 700000L,
      maxCandidates: Int = 2000): DataFrame = {
    require(dim >= 1 && nsub >= 1 && dim % nsub == 0,
      s"dim $dim not divisible by nsub $nsub")
    require(maxCandidates >= 1, "maxCandidates must be positive")
    requireNumeric("mmrRerank", candidates, cId, "candidate id")
    // same rule for relevance: a non-numeric relCol would cast to
    // NULL per row and the aggregate would silently skip EVERY
    // candidate — empty rerank output instead of an error
    requireNumeric("mmrRerank", candidates, relCol, "relevance")
    val base = candidates.select(col(qId).as("query_id"),
      col(cId).cast(LongType).as("_id"),
      col(relCol).cast(LongType).as("_rel"),
      asDouble(col(vecCol)).as("_v"))
    // shortlist guard, in-plan: per-query counts are bounded by the
    // query count; an over-full query poisons its own rows by name
    val counts = base.groupBy("query_id")
      .agg(count(lit(1)).as("_qn"))
    val guarded = base.join(broadcast(counts), Seq("query_id"))
      .withColumn("_id",
        when(col("_qn") > maxCandidates,
          raise_error(concat(lit("mmrRerank: query '"),
            col("query_id").cast(StringType),
            lit(s"' has "), col("_qn").cast(StringType),
            lit(s" candidates, over maxCandidates=$maxCandidates — "
              + "rerank a bounded retrieval shortlist, not a corpus")))
            .cast(LongType))
          .otherwise(col("_id")))
      .drop("_qn")
    val agg = graft.expressions.MmrTopKAgg(
      bridge.expression(col("_id")), bridge.expression(col("_rel")),
      bridge.expression(col("_v")), k, lambdaMicro, nsub)
    guarded.groupBy("query_id")
      .agg(bridge.column(agg.toAggregateExpression()).as("_mm"))
      .select(col("query_id"), explode(col("_mm")).as("r"))
      .select(col("query_id"), col("r.rank").as("rank"),
        col("r.id").as("cand_id"), col("r.mmr_micro").as("mmr_micro"))
  }

  private def corpus2Numeric(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]

  /** One numeric-column rule for every aggregate-heap operator: a
    * non-numeric column casts to NULL per row and the heaps silently
    * skip (or the driver collect NPEs) — fail by name at plan build.
    * Shared so the rule changes in ONE place. */
  private def requireNumeric(op: String, df: DataFrame, c: String,
      what: String): Unit =
    require(corpus2Numeric(df, c),
      s"$op: $what column `$c` must be numeric (castable to long), " +
        s"got ${df.schema(c).dataType}")

  /** Probe a persisted ANN index: signature the queries under the
    * index's OWN banding parameters (map-only, broadcast), candidate
    * join against the bucketed sigs table — keys only, exchange-free
    * on the index side — then exact cosine ranking against the
    * bucketed vec table, top-k per query as a WindowGroupLimit.
    * Same math as [[topKLshSha]] run inline, which is exactly the
    * point: the index trades one write for every probe's corpus
    * re-signature. */
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
