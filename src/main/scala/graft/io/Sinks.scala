package graft.io

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.{functions => F}

/** Writers — the reference's sink surface (SURVEY.md §2.2):
  * JSONL(.gz) streaming writer (B1), dated partition layout (B6),
  * JDBC bulk append / batched upsert load (B3-B5).
  *
  * Atomic commit (B2's temp→rename) is Spark's FileOutputCommitter —
  * already the same protocol. The JDBC paths are distributed
  * (per-partition connections), unlike the reference's
  * whole-file-in-memory executemany (pipeline.py:639).
  */
object Sinks {

  /** JSONL writer, gzip on by default (DATA_COMPRESSION=True,
    * data_pipes/__init__.py:95). Timestamps serialize ISO+Z like
    * ext/serializers.py:12-14. */
  def jsonl(df: DataFrame, dir: String, compress: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    (if (compress) w.option("compression", "gzip") else w).json(dir)
  }

  /** Dated partitioned layout `<root>/<dir>/year=YYYY/month=MM/day=DD`
    * derived from `tsCol` — the engine's form of the reference's
    * `<stage>/<dir>/YYYY/MM/DD/<file>` path scheme (pipeline.py:786-792).
    * Partition values survive as directory structure → partition
    * pruning on read. */
  def datedPartitioned(df: DataFrame, root: String, dirName: String,
      tsCol: String, format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite): Unit =
    F.datedPartitions(df, tsCol)
      .write.mode(mode)
      .partitionBy("year", "month", "day")
      .format(format)
      .save(s"$root/$dirName")

  /** Multiplexed per-model sink (B7, pipeline.py:757-809): one stage can
    * emit rows for several models; routing on the discriminator column
    * via `partitionBy` lands each model in its own directory in ONE
    * distributed write (no per-model jobs, no driver loop). */
  def perModelFanOut(df: DataFrame, modelCol: String, root: String,
      format: String = "parquet", mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(modelCol).format(format).save(root)

  /** Training-shard export: pack documents into ~`budget`-token packs
    * (the two-phase prefix sum of `TrainingOps.packByTokenBudget` —
    * never a per-shard window) and land one directory per
    * (shard, pack) in ONE distributed write: `partitionBy` routes
    * rows to `<shardCol>=<v>/pack_id=<n>/` dynamically, no per-pack
    * jobs, no driver loop. The standard last step of a curation
    * pipeline — "emit the corpus as ~N-token training shards" — as a
    * single action whose output a trainer can stream directory by
    * directory. */
  def writePackedShards(df: DataFrame, shardCol: String, orderCol: String,
      tokens: org.apache.spark.sql.Column, budget: Long, outDir: String,
      format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite): Unit =
    graft.llm.TrainingOps.packByTokenBudget(df, shardCol, orderCol,
        tokens, budget)
      .write.mode(mode)
      .partitionBy(shardCol, "pack_id")
      .format(format)
      .save(outDir)

  /** Deterministically SHUFFLED shard export: a reproducible global
    * permutation of the corpus for training order — shard =
    * salted-SHA bucket of the key (`shard=<n>/` directories via
    * dynamic partitionBy), rows within each shard sorted by the full
    * hash. Rerunning produces byte-identical shard contents and order
    * (`rand()`/`orderBy(rand())` shuffles produce a different corpus
    * order every run and cannot be audited), and no stage ever global-
    * sorts: the permutation is the hash itself, the one exchange is
    * the dynamic-partition write, and the in-shard sort is
    * per-partition. Training epochs that want different orders vary
    * `salt`. */
  def writeShuffledShards(df: DataFrame, keyCol: String, outDir: String,
      numShards: Int, salt: String = "shuf",
      format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numShards >= 1, "numShards must be at least 1")
    // withColumn REPLACES an existing column silently — an input that
    // already carries `shard` (or the `_h` scratch name) would have
    // its data overwritten in the exported corpus
    require(!df.columns.contains("shard") && !df.columns.contains("_h"),
      "input must not already have 'shard' or '_h' columns — " +
        "rename them before the shuffled-shard export")
    val h = sha2(concat(lit(salt + ":"),
      df(keyCol).cast(org.apache.spark.sql.types.StringType)), 256)
    df.withColumn("_h", h)
      .withColumn("shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10), lit(numShards))
          .cast(org.apache.spark.sql.types.IntegerType))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "_h")
      .drop("_h")
      .write.mode(mode)
      .partitionBy("shard")
      .format(format)
      .save(outDir)
  }

  /** Bucketed table writer — the co-located-join layout for tables
    * that are JOINED REPEATEDLY on the same key at 100 TB: rows are
    * hash-bucketed (and bucket-sorted) on the join key at WRITE time,
    * so every subsequent join/aggregation on that key runs with NO
    * shuffle exchange on either pre-bucketed side — the shuffle is
    * paid once at layout time instead of once per query. Catalog
    * tables only (bucket metadata lives in the catalog), hence
    * `saveAsTable`. See SinksSpec for the plan-level no-Exchange
    * guarantee this buys. */
  /** Drop `table` from the catalog AND delete its default warehouse
    * location if a previous session left files behind: an in-memory
    * catalog forgets its tables at session end while their files
    * persist, so a later CREATE at the same name fails with
    * LOCATION_ALREADY_EXISTS. Call before re-creating a managed
    * table that must be re-writable across sessions. (On a
    * persistent metastore the DROP alone covers it.) */
  def dropManagedTable(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, format: String = "parquet",
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .format(format)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Bulk DB load (B3) — distributed `df.write.jdbc` append with
    * executemany batching (`batchsize`, B5's `batches=n`). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      batchSize: Int = 10000, props: Properties = new Properties()): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** Row-wise upsert load (B4, decorators.py:273-294 merge pattern):
    * per-partition connections, DELETE+INSERT keyed on `keyCols` per
    * batch — idempotent (safe to replay a stage, the reference's
    * exactly-once answer, SURVEY.md §7 hard part (d)). ANSI SQL only,
    * so it runs on any JDBC target.
    *
    * One row PER KEY lands per call: the input is key-deduplicated
    * first (DELETE+INSERT is only idempotent for key-unique,
    * key-partitioned input — a batch carrying key k twice would
    * otherwise land BOTH inserts, and the same key split across two
    * partitions would race two connections' DELETEs before either
    * INSERT commits). Which duplicate survives is arbitrary: when a
    * micro-batch carries several versions of one key and the winner
    * matters, collapse upstream with your own ordering before
    * calling. */
  def jdbcUpsert(df0: DataFrame, url: String, table: String,
      keyCols: Seq[String], batchSize: Int = 1000): Unit = {
    // the aggregate shuffles by key, so unique keys ALSO end up
    // key-partitioned — both duplicate modes die in one pass
    val df = df0.dropDuplicates(keyCols)
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    val insertSql = s"INSERT INTO $table (${cols.mkString(",")}) VALUES (${cols.map(_ => "?").mkString(",")})"
    val deleteSql = s"DELETE FROM $table WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"
    val keyIdx = keyCols.map(schema.fieldIndex)
    df.foreachPartition { rows: Iterator[Row] =>
      val conn = DriverManager.getConnection(url)
      conn.setAutoCommit(false)
      try {
        val del = conn.prepareStatement(deleteSql)
        val ins = conn.prepareStatement(insertSql)
        var n = 0
        rows.foreach { r =>
          keyIdx.zipWithIndex.foreach { case (ki, pi) =>
            del.setObject(pi + 1, r.get(ki)) }
          del.addBatch()
          cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
          ins.addBatch()
          n += 1
          if (n % batchSize == 0) {
            del.executeBatch(); ins.executeBatch(); conn.commit()
          }
        }
        del.executeBatch(); ins.executeBatch(); conn.commit()
      } finally conn.close()
    }
  }
}
