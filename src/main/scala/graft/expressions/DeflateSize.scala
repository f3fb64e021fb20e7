package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_deflate_size(str)` — DEFLATE-compressed byte count of the
  * UTF-8 text at a pinned level (6, raw/nowrap), the input to the
  * compression-ratio quality signal (Gopher's repetitiousness filter:
  * highly compressible text is boilerplate/template/degenerate
  * repetition; incompressible text at the other extreme is often
  * encoded junk). Ratio = deflate_size / octet_length.
  *
  * Deliberately NOT oracle-checked: DEFLATE output length is
  * implementation-defined (zlib version, strategy details), so the
  * signal is deterministic within a JVM/JDK but not engine-portable —
  * the spec pins ordering properties (repetitive < prose < random) and
  * same-session determinism, never exact byte counts. Map-only,
  * codegen'd; per-task Deflater and buffer reuse via ThreadLocal (a
  * per-row Deflater allocation would dominate the compression
  * itself). */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_size"

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDeflate", this, classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = DeflateSize.deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateSize.buffer.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  // one Deflater + scratch buffer per task thread, reset per row
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val buffer = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DeflateSize].getName, "graft_deflate_size")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"graft_deflate_size expects (str); got ${exprs.length} args")
    DeflateSize(exprs.head)
  }
}
