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
  }
}
