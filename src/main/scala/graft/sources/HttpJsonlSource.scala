package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{HttpSource, HttpSourceConfig}

/** DataSource V2 batch source for paginated JSONL HTTP APIs —
  * `spark.read.format("graft-http-jsonl")`.
  *
  * The reference's `APIClient` (ext/clients.py:70-448) fetches pages
  * serially on one node and stages them to disk before the engine sees
  * a row. Here each page is an `InputPartition`, so a 1000-page API
  * pull fans out across the cluster's executors, with the same
  * retry/backoff discipline per page ([[graft.io.HttpSource.fetch]]:
  * urllib3-Retry-style force-list + exponential backoff).
  *
  * The source deliberately emits RAW LINES (`page`, `line`, `value`),
  * not parsed JSON: parsing stays declarative via `from_json` in the
  * query plan (codegen'd, prunable) instead of a per-source parser, and
  * schema evolution is the query's concern, not the connector's.
  * Column pruning IS pushed into the reader — a `count()` never
  * materializes line strings.
  *
  * Options:
  *  - `url` (required): page URL template; `{page}` substitutes the
  *    0-based page index.
  *  - `pages` (default 1): page count = partition count.
  *  - `header.<Name>`: static request headers (e.g. a bearer token the
  *    driver obtained via [[graft.io.HttpSource.login]]).
  *  - `maxRetries`, `connectTimeoutMs`, `readTimeoutMs`: per-page fetch
  *    discipline (defaults follow the reference: 5 retries, 5.01 s
  *    connect, 32 s read).
  */
final class HttpJsonlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http-jsonl"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpJsonlSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpJsonlTable(properties.asScala.toMap)
}

object HttpJsonlSource {
  val Schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("line", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

private[sources] final class HttpJsonlTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"http_jsonl(${props.getOrElse("url", "<missing url>")})"
  override def schema(): StructType = HttpJsonlSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpJsonlScanBuilder(props ++ options.asScala)
}

private[sources] final class HttpJsonlScanBuilder(opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = HttpJsonlSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val url = opts.getOrElse("url",
      throw new IllegalArgumentException(
        "graft-http-jsonl requires the 'url' option (use {page} for the page index)"))
    val pages = opts.getOrElse("pages", "1").toInt
    require(pages >= 1, s"pages must be >= 1, got $pages")
    val headers = opts.collect {
      case (k, v) if k.toLowerCase.startsWith("header.") =>
        k.substring("header.".length) -> v
    }
    new HttpJsonlScan(url, pages, headers, required,
      maxRetries = opts.getOrElse("maxretries", "5").toInt,
      connectTimeoutMs = opts.getOrElse("connecttimeoutms", "5010").toLong,
      readTimeoutMs = opts.getOrElse("readtimeoutms", "32000").toLong,
      pagesUrl = opts.get("pagesurl"))
  }
}

private[sources] final class HttpJsonlScan(
    url: String, pages: Int, headers: Map[String, String],
    required: StructType, maxRetries: Int, connectTimeoutMs: Long,
    readTimeoutMs: Long, pagesUrl: Option[String] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-http-jsonl $url [$pages pages]"
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(HttpJsonlPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new HttpJsonlReaderFactory(url, headers, required.fieldNames,
      maxRetries, connectTimeoutMs, readTimeoutMs)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new HttpJsonlMicroBatchStream(url, pages, headers, required.fieldNames,
      maxRetries, connectTimeoutMs, readTimeoutMs).withPagesUrl(pagesUrl)
}

/** Offset = number of pages fully consumed. JSON form is the bare
  * count, so checkpoints are human-readable. */
private[sources] final case class HttpJsonlOffset(pages: Int) extends Offset {
  override def json(): String = pages.toString
}

/** Incremental page consumption as a micro-batch stream — the
  * Spark-first re-expression of the reference's SCHEDULED re-runs
  * (celery-beat `pipeline_task` re-dispatch, tasks.py): instead of a
  * cron re-pulling everything and deduping downstream, the stream's
  * offset is the consumed-page count, each micro-batch reads only
  * pages [start, end), and the checkpoint makes delivery exactly-once
  * into transactional sinks.
  *
  * The page horizon comes from `latestOffset()`: a GET of the
  * `pagesUrl` option (a cheap metadata endpoint returning the current
  * page count as an integer body — APIs expose this as a count/total
  * field; adapt with a template). Without `pagesUrl` the horizon is the
  * static `pages` option (AvailableNow semantics: drain, then stop). */
private[sources] final class HttpJsonlMicroBatchStream(
    url: String, staticPages: Int, headers: Map[String, String],
    fields: Array[String], maxRetries: Int, connectTimeoutMs: Long,
    readTimeoutMs: Long) extends MicroBatchStream {
  private var pagesUrl: Option[String] = None
  private[sources] def withPagesUrl(u: Option[String]): this.type = {
    pagesUrl = u; this
  }

  override def initialOffset(): Offset = HttpJsonlOffset(0)
  override def deserializeOffset(json: String): Offset =
    HttpJsonlOffset(json.trim.toInt)
  override def latestOffset(): Offset = HttpJsonlOffset(pagesUrl match {
    case Some(u) =>
      val cfg = HttpSourceConfig(connectTimeoutMillis = connectTimeoutMs,
        readTimeoutMillis = readTimeoutMs, maxRetries = maxRetries,
        headers = headers)
      HttpSource.fetch(u, cfg).trim.toInt
    case None => staticPages
  })
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HttpJsonlOffset].pages
    val e = end.asInstanceOf[HttpJsonlOffset].pages
    (s until e).map(HttpJsonlPartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new HttpJsonlReaderFactory(url, headers, fields,
      maxRetries, connectTimeoutMs, readTimeoutMs)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class HttpJsonlPartition(page: Int)
    extends InputPartition

private[sources] final class HttpJsonlReaderFactory(
    url: String, headers: Map[String, String], fields: Array[String],
    maxRetries: Int, connectTimeoutMs: Long, readTimeoutMs: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[HttpJsonlPartition].page
    new HttpJsonlReader(page, url.replace("{page}", page.toString),
      headers, fields, maxRetries, connectTimeoutMs, readTimeoutMs)
  }
}

private[sources] final class HttpJsonlReader(
    page: Int, pageUrl: String, headers: Map[String, String],
    fields: Array[String], maxRetries: Int, connectTimeoutMs: Long,
    readTimeoutMs: Long) extends PartitionReader[InternalRow] {
  // one fetch per partition, on first advance — planning never
  // touches the network
  private var lines: Iterator[String] = _
  private var lineNo = -1L
  private var current: String = _

  override def next(): Boolean = {
    if (lines == null) {
      val cfg = HttpSourceConfig(
        connectTimeoutMillis = connectTimeoutMs,
        readTimeoutMillis = readTimeoutMs,
        maxRetries = maxRetries,
        headers = headers)
      lines = HttpSource.fetch(pageUrl, cfg).linesIterator
        .filter(_.nonEmpty)
    }
    if (lines.hasNext) { current = lines.next(); lineNo += 1; true }
    else false
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "page" => page
      case "line" => lineNo
      case "value" => UTF8String.fromString(current)
    })

  override def close(): Unit = ()
}
