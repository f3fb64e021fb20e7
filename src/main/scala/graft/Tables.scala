package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access for the driver harness: one parquet file per table
  * under `/root/testdata/sf{0.001,0.01,0.1}` (TESTDATA.md). Plain parquet scans so
  * Catalyst's column pruning / predicate pushdown reach the format.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as a nanos long
    // and normalize via tsMillis. Set here (not only in the mains) so
    // the tables read correctly under any driver-built session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Normalize `events.ts` to epoch milliseconds (bigint) regardless
    * of how the parquet stores it and the reader surfaces it: driver
    * generations have shipped both `timestamp[ns]` (surfaced as a raw
    * nanos long under `spark.sql.legacy.parquet.nanosAsLong`) and
    * `timestamp[us]` (surfaced as TimestampType/NTZ) — every consumer
    * goes through this one type switch instead of assuming either.
    * UTC session TZ makes the NTZ→timestamp cast an identity. */
  def tsMillis(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` = exact integral division; a double `/` would lose
        // precision (epoch-ns ≈ 1.7e18 > 2^53).
        expr(s"`$name` div 1000000L")
      case _ =>
        unix_millis(col(name).cast(org.apache.spark.sql.types.TimestampType))
    }
}
