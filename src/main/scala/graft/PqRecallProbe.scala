package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-cluster recall probe for the two PQ codebook tiers:
  * hash-rank sampled (the oracle-replayable tier, q186/q187) vs
  * Lloyd-trained ([[graft.llm.Similarity.pqCodebookLloyd]], the
  * production-recall arm). Prints ONE JSON line:
  *
  *   recall@100 — fraction of exact-L2 top-10 neighbors (per query)
  *   that appear in the codebook's ADC top-100 (the standard PQ
  *   shortlist metric: ADC is a coarse ranker, a re-rank pass reads
  *   the shortlist);
  *   mse — mean squared reconstruction error over a bounded
  *   hash-spread 5k sample.
  *
  * Corpus: n 64-d vectors in 64 planted clusters (xxhash64-mixed
  * centers and jitter — fully deterministic, no Date/rand).
  * Cluster size should sit INSIDE the shortlist (clusters ≥ n/kAdc):
  * PQ collapses same-code candidates to one ADC distance, so with
  * whole-shortlist-sized clusters recall measures whether the CODES
  * separate clusters — the thing a codebook controls — rather than
  * id-order tie luck inside one giant cell.
  * Usage: runMain graft.PqRecallProbe [n] [clusters]
  * (default 100000, 2000)
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val nClusters = args.lift(1).map(_.toInt).getOrElse(2000)
    val dim = 64; val nsub = 8; val ncent = 16
    val nq = 100; val kTrue = 10
    val kAdc = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.NativeFunctions.register(spark)
    import graft.llm.Similarity

    // Per-slot MULTIMODAL plant — the regime PQ is built for: each
    // slot's subvectors come from exactly `ncent` modes (mode of
    // cluster cl in slot s = hash(cl, s) mod ncent; mode center
    // values hash to [-4, 4]); jitter ±0.3 keeps within-mode spread
    // far under mode spacing. A perfect codebook recovers the modes
    // (codes = mode ids, ADC ranks clusters exactly); a codebook
    // that spends two centroids on one mode and none on another
    // merges modes and leaks cross-cluster candidates into the
    // shortlist.
    val dsubGen = dim / nsub
    val vecs = spark.range(n)
      .withColumn("cl", pmod(col("id"), lit(nClusters.toLong)))
      .select(col("id"), col("cl"),
        expr(s"""transform(sequence(0, ${dim - 1}), j -> cast(
          (pmod(xxhash64(
             pmod(xxhash64(cl, CAST(j div $dsubGen AS BIGINT)), $ncent)
               * $dim + j, 13L), 2003) / 250.4 - 4.0) +
          (pmod(xxhash64(id, j, 7L), 2003) / 3338.3 - 0.3)
          as float))""").as("embedding"))
      .cache()
    vecs.count()

    val queries = vecs.filter(pmod(col("id"), lit(n / nq)) === 0)
      .limit(nq).cache()
    queries.count()

    // exact L2 top-kTrue per query (self excluded) — the ground truth
    val q = queries.select(col("id").as("query_id"),
      Similarity.asDouble(col("embedding")).as("qv"))
    val c = vecs.select(col("id").as("neighbor_id"),
      Similarity.asDouble(col("embedding")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    val truth = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (call_function("graft_dot", col("qv"), col("qv")) +
          call_function("graft_dot", col("cv"), col("cv")) -
          lit(2.0) * call_function("graft_dot", col("qv"), col("cv")))
          .as("d2"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= kTrue)
      .select("query_id", "neighbor_id")
      .cache()
    val truthN = truth.count()

    def evalCodebook(cb: DataFrame): (Double, Double) = {
      val adc = Similarity.pqAdcTopK(queries, vecs, "id", "id",
          "embedding", cb, dim, nsub, ncent, k = kAdc)
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
      val hits = truth.join(adc, Seq("query_id", "neighbor_id"),
        "left_semi").count()
      // reconstruction MSE over a bounded hash-spread 5k sample
      val cbm = cb.collect().map(r =>
        (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      val dsub = dim / nsub
      val samp = vecs.select(col("id"), col("embedding"),
          xxhash64(col("id"), lit(99L)).as("h"))
        .orderBy("h").limit(5000)
      val enc = Similarity.pqEncode(samp, "id", "embedding", cb,
          dim, nsub, ncent)
        .join(samp.select(col("id"), col("embedding")), Seq("id"))
        .collect()
      val mse = enc.map { r =>
        val codes = r.getSeq[Int](1)
        val v = r.getSeq[Float](2)
        (0 until nsub).map { s =>
          val cv = cbm((s, codes(s)))
          (0 until dsub).map { j =>
            val d = v(s * dsub + j).toDouble - cv(j); d * d
          }.sum
        }.sum
      }.sum / (enc.length * dim)
      (hits.toDouble / truthN, mse)
    }

    val cbSampled = Similarity.pqCodebook(vecs, "id", "embedding",
      dim, nsub, ncent, salt = "probe")
    val cbLloyd = Similarity.pqCodebookLloyd(vecs, "id", "embedding",
      dim, nsub, ncent)
    val (rS, mS) = evalCodebook(cbSampled)
    val (rL, mL) = evalCodebook(cbLloyd)

    // end-to-end IVFADC (coarse pruning AND codebook in one
    // composition, q214's shape): shortlist recall of the sampled
    // oracle tier vs the production (Lloyd both arms) tier at the
    // same nlist/nprobe — the number that says what turning on
    // `production = true` buys a real search
    val nlist = 64; val nprobe = 8
    def evalIvfAdc(production: Boolean): Double = {
      val got = Similarity.topKIvfAdc(queries, vecs, "id", "id",
          "embedding", dim, nsub, ncent, nlist, nprobe, k = kAdc,
          salt = "probe", production = production)
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
      truth.join(got, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / truthN
    }
    val ivfS = evalIvfAdc(production = false)
    val ivfL = evalIvfAdc(production = true)
    println(s"""{"metric":"pq_recall","n":$n,"dim":$dim,"nsub":$nsub,""" +
      s""""ncent":$ncent,"clusters":$nClusters,""" +
      s""""recall100_of_top10_sampled":$rS,"recall100_of_top10_lloyd":$rL,""" +
      s""""mse_sampled":$mS,"mse_lloyd":$mL,""" +
      s""""nlist":$nlist,"nprobe":$nprobe,""" +
      s""""ivfadc_recall_sampled":$ivfS,"ivfadc_recall_lloyd":$ivfL}""")
    spark.stop()
  }
}
