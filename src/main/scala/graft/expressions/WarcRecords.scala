package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.WarcKernel

/** `graft_warc_records(payload)` — explode one WARC file (binary,
  * plain or gzipped) into its records:
  * `(rec_idx, warc_type, target_uri, warc_date, content_type,
  * content_length, http_status, http_content_type, body)`.
  *
  * A Generator (same class as `graft_cidr_hosts`) rather than an RDD
  * seam: the explode stays inside the plan, so a downstream filter on
  * e.g. `http_status = 200 AND http_content_type LIKE 'text/%'` —
  * the first thing every web-corpus ingest does — composes with scan
  * pruning and never deserializes through a function boundary.
  * Corrupt/truncated payloads yield the records that parse cleanly
  * (possibly zero rows), never a throw — one bad file must not fail
  * a 100 TB ingest task (see [[graft.llm.WarcKernel]]).
  */
case class WarcRecordsGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = WarcRecordsGen.schema
  override def prettyName: String = "graft_warc_records"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val recs = WarcKernel.parse(v.asInstanceOf[Array[Byte]])
    recs.iterator.zipWithIndex.map { case (r, i) =>
      InternalRow(
        i,
        UTF8String.fromString(r.recType),
        UTF8String.fromString(r.targetUri),
        UTF8String.fromString(r.date),
        UTF8String.fromString(r.contentType),
        r.contentLength,
        if (r.httpStatus < 0) null else r.httpStatus,
        if (r.httpContentType == null) null
        else UTF8String.fromString(r.httpContentType),
        r.body)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WarcRecordsGen =
    copy(child = newChild)
}

object WarcRecordsGen {
  /** UTF8String.fromString(null) is null, so absent headers surface
    * as SQL NULLs without special-casing. */
  val schema: StructType = StructType(Seq(
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("body", BinaryType)))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WarcRecordsGen].getName, "graft_warc_records")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_warc_records expects (payload); got ${exprs.length} args")
    WarcRecordsGen(exprs.head)
  }
}
