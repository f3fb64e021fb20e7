package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operator pack ([EXT] — SURVEY.md §2.7): exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-duplicate detection,
  * designed shuffle-first for 100 TB corpora:
  *
  *  - exact dedup = hash-partitioned aggregate on a content hash (one
  *    shuffle of (hash, id), never of full text);
  *  - MinHash/LSH = per-row signature (map-only, codegen'd) → explode
  *    `bands` rows/doc → self-join on (band, bandHash) so only
  *    same-bucket docs ever meet — the classic way to avoid the O(n²)
  *    pair explosion;
  *  - SimHash = 64-bit per-row signature; candidate blocking on 16-bit
  *    chunks (hamming ≤ 3 ⟹ some chunk equal, pigeonhole);
  *  - verification joins carry doc ids + shingle sets only, not texts.
  */
object Dedup {

  /** Exact duplicate removal on explicit key columns. */
  def exactDedup(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact content dedup: group by SHA-256 of the text, keep the lowest
    * id per group. Returns (content_hash, keep_id, n_dupes) — join back
    * on keep_id to materialize survivors. Partial aggregation makes the
    * shuffle carry one row per distinct hash per map partition. */
  def exactDedupByContent(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Distinct word `n`-gram shingles of a text column. */
  def shingles(c: Column, n: Int = 3): Column = {
    val w = TextAnalysis.tokens(c)
    val starts = sequence(lit(1), greatest(size(w) - (n - 1), lit(1)))
    array_distinct(transform(starts, i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  /** Distinct shingles hashed to 64-bit — set operations on longs are
    * several times cheaper than on strings, and Jaccard over the hashed
    * sets equals Jaccard over the string sets absent 64-bit collisions
    * (P ≈ n²/2⁶⁴ per pair — negligible). Preferred at scale. */
  def shingleHashes(c: Column, n: Int = 3): Column =
    transform(shingles(c, n), s => xxhash64(s))

  /** Exact Jaccard similarity of two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - inter)
  }

  /** MinHash signature, fast path: each shingle is xxhash64'd ONCE,
    * then `numHashes` permutations are derived by integer mixing
    * (xor-multiply with per-permutation constants) — the standard
    * one-pass minwise scheme without re-hashing strings per
    * permutation. Array<long> of length `numHashes`. */
  def minHashSignature(c: Column, numHashes: Int = 32, shingleN: Int = 3): Column = {
    // XOR + re-hash mixing (no multiply: ANSI mode forbids wrap-around
    // overflow); hashing a fixed 8-byte long is cheap.
    val hs = transform(shingles(c, shingleN), s => xxhash64(s))
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(hs,
        h => xxhash64(h.bitwiseXOR(j * lit(2654435761L))))))
  }

  /** MinHash signature, portable path: SHA-256(shingle ++ "|" ++ perm)
    * lexicographic minima — engine-independent (DuckDB-oracle-able),
    * ~4× slower than the xxhash64 path; use for cross-engine parity
    * checks, not production scale. Array<string>. */
  def minHashSignatureSha(c: Column, numHashes: Int = 8, shingleN: Int = 3): Column = {
    val sh = shingles(c, shingleN)
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(sh,
        s => sha2(concat(s, lit("|"), j.cast(StringType)), 256))))
  }

  /** Candidate near-duplicate pairs via MinHash + LSH banding.
    * Signature length = bands × rowsPerBand. Output: (id_a, id_b,
    * est_jaccard) with id_a < id_b, est_jaccard = signature agreement
    * fraction. The only shuffle is the band-bucket self-join; bucket
    * keys are 64-bit hashes, so skew only arises from genuinely
    * identical content (AQE skew-join handles the rest). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rowsPerBand: Int = 4, shingleN: Int = 3): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = df.select(
      col(idCol).as("id"),
      minHashSignature(col(textCol), numHashes, shingleN).as("sig"))
    // One row per (doc, band); band bucket = numeric fold of the band's
    // signature slice. The repartition forces an exchange that (a) stops
    // CollapseProject from re-inlining the signature computation into
    // every downstream consumer and (b) is REUSED by both sides of the
    // self-join (ReusedExchange) — signatures are computed exactly once
    // per document, then read from shuffle files.
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => aggregate(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            lit(1125899906842597L), (acc, x) => xxhash64(acc.bitwiseXOR(x)))))
          .as(Seq("band", "bh")))
      .select("id", "sig", "band", "bh")
      .repartition(col("band"), col("bh"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        (aggregate(zip_with(col("l.sig"), col("r.sig"),
          (a, b) => when(a === b, 1.0).otherwise(0.0)),
          lit(0.0), (acc, x) => acc + x) / (bands * rowsPerBand))
          .as("est_jaccard"))
      .distinct()
  }

  /** Near-duplicates = LSH candidates verified with exact shingle
    * Jaccard ≥ `threshold`. Joins candidate ids back to shingle sets so
    * the verify join moves shingle arrays only for candidate rows. */
  def nearDuplicatesMinhash(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, bands: Int = 8, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, bands, rowsPerBand, shingleN)
    val sh = df.select(col(idCol).as("sid"), shingles(col(textCol), shingleN).as("sh"))
    cand
      .join(sh, col("id_a") === col("sid")).withColumnRenamed("sh", "sh_a").drop("sid")
      .join(sh, col("id_b") === col("sid")).withColumnRenamed("sh", "sh_b").drop("sid")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** 64-bit SimHash of a text column: per-token xxhash64, each bit
    * votes ±1, sign of each bit-sum forms the signature. Built as a SQL
    * expression (shiftleft/shiftright need expression bit counts). */
  def simHash64(textColName: String): Column = {
    val toks = s"split(trim(`$textColName`), '\\\\s+')"
    // acc: 64-long vote vector; per token t, bit i gets +1 if set else -1
    val votes =
      s"""aggregate($toks,
         |  array_repeat(0L, 64),
         |  (acc, t) -> zip_with(acc,
         |    transform(sequence(0, 63),
         |      i -> CASE WHEN (shiftright(xxhash64(t), i) & 1L) = 1L
         |                THEN 1L ELSE -1L END),
         |    (a, v) -> a + v))""".stripMargin
    // fold votes into a 64-bit long: set bit i when votes[i] > 0
    expr(
      s"""aggregate(
         |  zip_with($votes, sequence(0, 63),
         |    (v, i) -> CASE WHEN v > 0L THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate candidate pairs with hamming ≤ maxHamming.
    * Blocking: split each signature into four 16-bit chunks — pairs
    * within hamming ≤ 3 share at least one exact chunk (pigeonhole), so
    * the self-join runs per chunk bucket, never all-pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash64(textCol).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(expr("transform(sequence(0,3), c -> shiftright(sig, c*16) & 65535L)"))
        .as(Seq("chunk", "ck")))
    val l = chunked.as("l")
    val r = chunked.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.ck") === col("r.ck") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.sig"), col("r.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-duplicates: pairs with cosine ≥ threshold,
    * blocked by hyperplane-LSH buckets (see [[Similarity]]). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, dim: Int = 64, planes: Int = 16,
      seed: Long = 42L): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.hyperplaneSignature(col(vecCol), Similarity.randomPlanes(
        dim = dim, n = planes, seed = seed)).as("bucket"))
    val l = withSig.as("l")
    val r = withSig.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.cosine(col("l.vec"), col("r.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
