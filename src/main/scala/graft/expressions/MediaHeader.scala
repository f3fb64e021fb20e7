package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.MediaHeaderKernel

/** `graft_media_header(payload)` — container-header metadata as a
  * native expression: binary → struct<format, width, height, channels,
  * sample_rate, bits_per_sample>, evaluated by the pure byte-level
  * [[graft.llm.MediaHeaderKernel]] (PNG/GIF/BMP/WAV/JPEG, no codec
  * library).
  *
  * This is the columnar/codegen tier of multimodal metadata: header
  * parse is a pure bytes→struct function with no per-partition init,
  * so it belongs in the expression pack (same profile as the IP and
  * signature expressions) — an RDD `mapPartitions` seam here would
  * deserialize every row, break whole-stage codegen, and hide the scan
  * from Catalyst (filter pushdown on e.g. format/width would die at the
  * seam). Unknown/truncated payloads parse as format "unknown" with
  * null fields — never a throw (one corrupt file must not fail a
  * 100 TB ingest task); a NULL payload yields a NULL struct.
  */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaHeaderExpr.schema
  override def prettyName: String = "graft_media_header"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMediaHeader", this,
      classOf[MediaHeaderExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(bytes: Array[Byte]): InternalRow = {
    val h = MediaHeaderKernel.parse(bytes)
    def n(v: Int): Any = if (v < 0) null else v
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(h.format), n(h.width), n(h.height),
      n(h.channels), n(h.sampleRate), n(h.bitsPerSample),
      if (h.durationMs < 0) null else h.durationMs,
      n(h.frameCount),
      if (h.codec == null) null else UTF8String.fromString(h.codec)))
  }

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderExpr =
    copy(child = newChild)
}

object MediaHeaderExpr {
  /** Kernel fields use -1 for "absent"; the expression maps -1 → null. */
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", LongType),
    StructField("frame_count", IntegerType),
    StructField("codec", StringType)))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MediaHeaderExpr].getName, "graft_media_header")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_media_header expects (payload); got ${exprs.length} args")
    MediaHeaderExpr(exprs.head)
  }
}
