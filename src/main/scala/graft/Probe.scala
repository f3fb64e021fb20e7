package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${e.count()}")
    e.show(5, false)
    // round-trip the flagship result through the JSONL sink/source pair
    val out = java.nio.file.Files.createTempDirectory("graft-probe").toString
    graft.io.Sinks.jsonl(e, s"$out/jsonl")
    val back = graft.io.Sources.jsonl(spark, Seq(s"$out/jsonl"))
    println(s"JSONL_ROUNDTRIP_ROWS=${back.count()}")
    spark.stop()
  }
}
