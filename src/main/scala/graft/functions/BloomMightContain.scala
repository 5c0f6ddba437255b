package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a DRIVER-BUILT bloom
  * sketch carried as a binary literal — the codegen'd replacement for
  * the one closure UDF that remained in a hot path
  * ([[graft.ops.TextOps.bloomContamination]]). Spark's own
  * `BloomFilterMightContain` is reserved for runtime join filters and
  * expects an xxhash64 long child; this expression probes the exact
  * `putString` hashing the sketch was built with, taking the UTF-8
  * bytes straight from the column (no String materialization per row).
  *
  * The sketch deserializes ONCE per (driver, executor) via a transient
  * lazy val / codegen reference object — never per row. Rows: ~100 ns
  * per probe against a broadcast-sized sketch; semantics identical to
  * `udf(fp => bloom.mightContainString(fp))` because
  * `mightContainString` is defined as `mightContainBinary(utf8 bytes)`
  * (parity spec-pinned). */
case class BloomMightContain(child: Expression, sketch: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = sketch

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.simpleString}")
    else if (sketch.dataType != BinaryType || !sketch.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary sketch argument")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter = {
    val bytes = sketch.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(fp: Any, sketchBytes: Any): Any =
    bloom.mightContainBinary(fp.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one deserialized sketch per generated class instance, shipped as
    // a codegen reference object — the row loop sees a field access
    val ref = ctx.addReferenceObj("bloomSketch", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (fp, _) =>
      s"${ev.value} = $ref.mightContainBinary($fp.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, sketch = newRight)
}
