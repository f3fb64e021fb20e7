package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.llm.Dedup

class MinHashSigSpec extends SparkSuite {
  import spark.implicits._

  test("native expression is bit-identical to the HOF formulation") {
    NativeFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three four five",
      "single",
      "a b a b a b repeated shingles dedup irrelevant for minima")
      .toDF("t")
    val both = docs.select(
      Dedup.minHashSignature(col("t"), 16, 3).as("hof"),
      expr("graft_minhash64(t, 16, 3)").as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("SparkSessionExtensions route registers the function") {
    val s2 = spark.newSession()
    new GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions() {})
    // extension object applies cleanly; live-session registration:
    NativeFunctions.register(s2)
    import s2.implicits._
    val sig = Seq("hello world of spark").toDF("t")
      .select(expr("graft_minhash64(t, 8, 2)")).collect()(0).getSeq[Long](0)
    assert(sig.length === 8)
    assert(sig.forall(_ != Long.MaxValue))
  }

  test("graft_dot is bit-identical to the HOF dot and handles edge shapes") {
    NativeFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0), Seq(0.0)),
      (Seq(-1.5, 2.5), Seq(2.0, 4.0))).toDF("a", "b")
    val both = df.select(
      graft.llm.Similarity.dot(col("a"), col("b")).as("hof"),
      expr("graft_dot(a, b)").as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.collect()(0).getDouble(1) === 32.0)
  }

  test("graft_simhash64 is bit-identical to the SQL formulation") {
    NativeFunctions.register(spark)
    val docs = Seq("the quick brown fox", "single", "a b a b repeated")
      .toDF("text")
    val both = docs.select(
      Dedup.simHash64("text").as("hof"),
      expr("graft_simhash64(text)").as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("graft_hplane_sig buckets identically to hyperplaneSignature") {
    NativeFunctions.register(spark)
    val vecs = Seq(
      Seq(1.0, -2.0, 0.5, 3.0), Seq(-1.0, 2.0, -0.5, -3.0),
      Seq(0.1, 0.1, 0.1, 0.1)).toDF("v")
    val planes = graft.llm.Similarity.randomPlanes(4, 8, seed = 99L)
    val both = vecs.select(
      graft.llm.Similarity.hyperplaneSignature(col("v"), planes).as("hof"),
      expr("graft_hplane_sig(v, 4, 8, 99)").as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("graft_shingle_hashes equals the HOF shingle hashes as a set") {
    NativeFunctions.register(spark)
    val docs = Seq("the quick brown fox jumps", "a b a b a b", "single")
      .toDF("text")
    val both = docs.select(
      array_sort(Dedup.shingleHashes(col("text"), 3)).as("hof"),
      array_sort(expr("graft_shingle_hashes(text, 3)")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("graft_band_fold is bit-identical to the SQL xxhash64 fold chain") {
    NativeFunctions.register(spark)
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "a b a b a b", "single").toDF("text")
    val sigs = docs.select(expr("graft_minhash64(text, 32, 3)").as("sig"))
    val both = sigs.select(
      expr("graft_band_fold(sig, 8, 4)").as("native"),
      transform(sequence(lit(0), lit(7)),
        b => aggregate(slice(col("sig"), b * 4 + 1, lit(4)),
          lit(1125899906842597L),
          (acc, x) => xxhash64(acc.bitwiseXOR(x)))).as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() === 0)
  }

  test("bad arity fails with a clear message") {
    NativeFunctions.register(spark)
    val e = intercept[Exception] {
      Seq("x").toDF("t").select(expr("graft_minhash64(t)")).collect()
    }
    assert(e.getMessage.contains("graft_minhash64"))
  }
}
