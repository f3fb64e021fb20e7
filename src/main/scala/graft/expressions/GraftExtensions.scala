package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Registration for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  *    at session build time (the SparkSessionExtensions route);
  *  - `NativeFunctions.register(spark)` on a live session (used
  *    internally by operators that accept any caller session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_minhash64"),
      MinHashSig.info, MinHashSig.builder))
    e.injectFunction((FunctionIdentifier("graft_dot"),
      DotProduct.info, DotProduct.builder))
    e.injectFunction((FunctionIdentifier("graft_hplane_sig"),
      HyperplaneSig.info, HyperplaneSig.builder))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      SimHash64.info, SimHash64.builder))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      ShingleHashes.info, ShingleHashes.builder))
    e.injectFunction((FunctionIdentifier("graft_ip_to_int"),
      IpToInt.info, IpToInt.builder))
    e.injectFunction((FunctionIdentifier("graft_ip_to_int_big"),
      IpToIntBig.info, IpToIntBig.builder))
    e.injectFunction((FunctionIdentifier("graft_recast_ip"),
      IpRecast.info, IpRecast.builder))
    e.injectFunction((FunctionIdentifier("graft_cidr_hosts"),
      CidrHostsGen.info, CidrHostsGen.builder))
    e.injectFunction((FunctionIdentifier("graft_titlecase"),
      TitleCase.info, TitleCase.builder))
    e.injectFunction((FunctionIdentifier("graft_simhash_sha"),
      SimHashSha.info, SimHashSha.builder))
    e.injectFunction((FunctionIdentifier("graft_minhash_sha"),
      MinHashShaSig.info, MinHashShaSig.builder))
    e.injectFunction((FunctionIdentifier("graft_heavy_hitters"),
      HeavyHittersAgg.info, HeavyHittersAgg.builder))
    e.injectFunction((FunctionIdentifier("graft_band_fold"),
      BandFold.info, BandFold.builder))
    e.injectFunction((FunctionIdentifier("graft_sig_agreement"),
      SigAgreement.info, SigAgreement.builder))
    e.injectFunction((FunctionIdentifier("graft_camel_to_snake"),
      CamelToSnakeRef.info, CamelToSnakeRef.builder))
    e.injectFunction((FunctionIdentifier("graft_kmv"),
      KmvDistinctAgg.info, KmvDistinctAgg.builder))
    e.injectFunction((FunctionIdentifier("graft_media_header"),
      MediaHeaderExpr.info, MediaHeaderExpr.builder))
    e.injectFunction((FunctionIdentifier("graft_nfc"),
      NfcNormalize.info, NfcNormalize.builder))
    e.injectFunction((FunctionIdentifier("graft_ksample"),
      KSampleAgg.info, KSampleAgg.builder))
  }
}

object NativeFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash64", MinHashSig.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", DotProduct.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hplane_sig", HyperplaneSig.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", SimHash64.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes", ShingleHashes.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ip_to_int", IpToInt.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ip_to_int_big", IpToIntBig.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_recast_ip", IpRecast.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cidr_hosts", CidrHostsGen.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_titlecase", TitleCase.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash_sha", SimHashSha.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sha", MinHashShaSig.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters", HeavyHittersAgg.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_band_fold", BandFold.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sig_agreement", SigAgreement.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_camel_to_snake", CamelToSnakeRef.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv", KmvDistinctAgg.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_media_header", MediaHeaderExpr.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", NfcNormalize.builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ksample", KSampleAgg.builder, "built-in")
  }
}
