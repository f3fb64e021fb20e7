package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(str)` — membership probe against a
  * pre-serialized Spark `BloomFilter` carried INSIDE the expression
  * (the plane-matrix trick of [[HyperplaneSig]]): the filter bytes ship
  * once per task via the serialized plan, deserialize once per
  * executor (transient lazy), and the probe runs inside whole-stage
  * codegen.
  *
  * Probes with `mightContainBinary` over the UTF-8 bytes — the same
  * encoding `Dataset.stat.bloomFilter` uses to INSERT string columns,
  * so a filter built by Spark's distributed treeAggregate is probed
  * consistently (TrainingOpsSpec pins exact-tier parity end-to-end).
  *
  * False positives only, never false negatives — callers use it as a
  * PRE-filter in front of an exact join, so FPs cost a little wasted
  * shuffle and the final answer stays exact.
  */
case class BloomContains(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  def compute(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomContains].getName, "graft_bloom_contains")
}
