package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains_long(key)` — the integral-key sibling of
  * [[BloomContains]]: membership probe against a pre-serialized Spark
  * `BloomFilter` carried inside the expression. The filter bytes ship
  * once per task via the serialized plan, deserialize once per
  * executor (transient lazy), and the probe runs inside whole-stage
  * codegen via `mightContainLong` — no per-row string materialization
  * for the bigint join keys a runtime pre-filter usually guards.
  *
  * False positives only, never false negatives — callers use it as a
  * PRE-filter in front of an exact join
  * ([[graft.ops.relational.bloomPreJoin]]), so FPs cost a little
  * wasted shuffle and the final answer stays exact.
  */
case class BloomContainsLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains_long"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomL", this,
      classOf[BloomContainsLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(k: Long): Boolean = filter.mightContainLong(k)

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

object BloomContainsLong {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomContainsLong].getName, "graft_bloom_contains_long")
}
