package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two `array<double>` columns.
  *
  * The composed form `aggregate(zip_with(a, b, *), 0d, +)` is
  * semantically identical but both higher-order functions are
  * CodegenFallback — every row pays interpreted lambda dispatch plus
  * an intermediate array allocation. This expression generates a tight
  * primitive loop inside whole-stage codegen, which matters when the
  * dot product sits inside an O(pairs) similarity join.
  *
  * Accumulation is left-to-right in double, exactly like the composed
  * form, so results are bit-identical and oracle comparisons are
  * unaffected; mismatched array lengths yield null, also matching the
  * composed form (zip_with pads with nulls, nullifying the sum). Null
  * *elements* are not expected (embedding vectors); a null array
  * yields null via the standard binary null contract.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]
  // in Spark 4), so validate explicitly; callers cast to
  // array<double> themselves.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths → null, matching the composed form exactly
    // (zip_with pads with nulls, which nullify the whole sum)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int ${ev.value}_n = $a.numElements();
         |  double ${ev.value}_s = 0.0;
         |  for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |    ${ev.value}_s += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |  }
         |  ${ev.value} = ${ev.value}_s;
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
