package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers — the reference's `_reader` surface (pipeline.py:703-749;
  * SURVEY.md §2.1 A3/A6): JSONL (optionally .gz — codec inferred from
  * extension), CSV via DictReader semantics (header row, every column a
  * string, no inference), parquet for inter-stage interchange.
  *
  * Multi-path reads union at the source listing (manifest union, A6) —
  * one distributed scan, per-file lineage available via
  * `input_file_name()`.
  */
object Sources {

  /** JSON Lines reader. PERMISSIVE mode + corrupt-record column keeps
    * the reference's "never drop undecodable input" posture
    * (surrogateescape analog, data_pipes/__init__.py:96-97). */
  def jsonl(spark: SparkSession, paths: Seq[String],
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema.map(s => r.schema(s)).getOrElse(r).json(paths: _*)
  }

  /** CSV with csv.DictReader semantics (pipeline.py:728-732): header
    * row names the columns, every value stays a string. */
  def csv(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(paths: _*)

  /** Parquet — preferred inter-stage interchange format (columnar +
    * statistics; the engine's upgrade over the reference's JSONL). */
  def parquet(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** Auto-dispatch on extension, mirroring `_reader`'s ext sniffing
    * (pipeline.py:721-735): '.csv[.gz]' → CSV, '.parquet' → parquet,
    * else JSONL. */
  def auto(spark: SparkSession, paths: Seq[String],
      schema: Option[StructType] = None): DataFrame = {
    val stripped = paths.head.stripSuffix(".gz")
    if (stripped.endsWith(".csv")) csv(spark, paths)
    else if (stripped.endsWith(".parquet")) parquet(spark, paths)
    else jsonl(spark, paths, schema)
  }
}
