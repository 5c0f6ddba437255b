package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a DRIVER-BUILT bloom
  * sketch — the codegen'd replacement for the one closure UDF that
  * remained in a hot path ([[graft.ops.TextOps.bloomContamination]]).
  * Spark's own `BloomFilterMightContain` is reserved for runtime join
  * filters and expects an xxhash64 long child; this expression probes
  * the exact `putString` hashing the sketch was built with, taking the
  * UTF-8 bytes straight from the column (no String materialization per
  * row).
  *
  * The serialized sketch is a CONSTRUCTOR FIELD, not a literal child
  * (same convention as [[PqEncode]]'s codebooks): a ~120 KB binary
  * literal would render as full hex in every plan string and ship a
  * second copy beside the codegen reference. Here the expression
  * itself is the single shipped copy — codegen references `this` and
  * calls [[probe]], so the sketch deserializes lazily ONCE per
  * (driver, executor) and rows see a field access. The field is a
  * `Seq[Byte]` rather than `Array[Byte]` so the case class keeps
  * STRUCTURAL equality (an array field compares by reference, and
  * two semantically identical probes would then never canonicalize /
  * common-subexpression-eliminate — the same convention PqEncode's
  * codebooks follow); the hot path materializes the array once,
  * lazily, beside the deserialized filter. Semantics identical
  * to `udf(fp => bloom.mightContainString(fp))` because
  * `mightContainString` is defined as `mightContainBinary(utf8 bytes)`
  * (parity spec-pinned). */
case class BloomMightContain(child: Expression, sketch: Seq[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // string probes a putString-built sketch, long a putLong-built one
    // (the two builder paths `stat.bloomFilter` exposes); mixing key
    // types silently probes the wrong hash family, so anything else
    // fails analysis rather than returning all-false
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or bigint column, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(sketch.toArray))

  /** Row probes — called from both interpreted eval and generated code. */
  def probe(fp: UTF8String): Boolean = bloom.mightContainBinary(fp.getBytes)
  def probeLong(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(fp: Any): Any = child.dataType match {
    case StringType => probe(fp.asInstanceOf[UTF8String])
    case LongType   => probeLong(fp.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    val method = if (child.dataType == LongType) "probeLong" else "probe"
    nullSafeCodeGen(ctx, ev, fp => s"${ev.value} = $ref.$method($fp);")
  }

  // keep plan strings compact: never render the sketch bytes
  override def toString: String = s"bloommightcontain($child, sketch[${sketch.length}B])"
  override def sql: String = s"bloommightcontain(${child.sql})"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
