package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: no args → entry smoke + JSONL round-trip; with args →
  * `runMain graft.Probe <queryName> [sfDir] [explain]` times one query
  * and optionally prints its formatted physical plan. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.isEmpty) {
      val e = SparkEntry.entry(spark)
      println(s"ENTRY_ROWS=${e.count()}")
      e.show(5, false)
      val out = java.nio.file.Files.createTempDirectory("graft-probe").toString
      graft.io.Sinks.jsonl(e, s"$out/jsonl")
      val back = graft.io.Sources.jsonl(spark, Seq(s"$out/jsonl"))
      println(s"JSONL_ROUNDTRIP_ROWS=${back.count()}")
    } else {
      val name = args(0)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (args.contains("explain")) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"QUERY=$name ROWS=$n SECS=${(System.nanoTime() - t0) / 1e9}%.2f")
      // second run shows steady-state (warm code cache, no codegen compile)
      val t1 = System.nanoTime()
      df.count()
      println(f"WARM_SECS=${(System.nanoTime() - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
