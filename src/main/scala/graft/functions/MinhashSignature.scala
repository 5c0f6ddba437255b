package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature of a hashed-shingle array.
  *
  * For each of `n` universal hashes h_i(x) = (a_i·(x mod p) + b_i)
  * mod p over the Mersenne prime p = 2^31−1, returns the minimum over
  * the input set — the composed form (`n` separate
  * `array_min(transform(...))` passes) traverses the array `n` times
  * through interpreted lambdas; this expression is a single traversal
  * with all `n` lanes updated in a tight codegen'd loop.
  *
  * Coefficients are derived from a fixed seed so signatures are
  * identical across executors, runs, and cluster sizes (the property
  * LSH banding correctness depends on). Operands stay below 2^62, so
  * ANSI overflow checking never trips.
  */
case class MinhashSignature(child: Expression, n: Int)
  extends UnaryExpression {

  private val P = UniversalHash.Prime

  private lazy val coeffs: Array[(Long, Long)] = UniversalHash.coefficients(n)
  private lazy val as: Array[Long] = coeffs.map(_._1)
  private lazy val bs: Array[Long] = coeffs.map(_._2)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val m = xs.numElements()
    val mins = Array.fill(n)(P)
    var j = 0
    while (j < m) {
      val h = ((xs.getLong(j) % P) + P) % P
      var i = 0
      while (i < n) {
        val v = (as(i) * h + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, xs => {
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, ${P}L);
         |int ${j}_m = $xs.numElements();
         |for (int $j = 0; $j < ${j}_m; $j++) {
         |  long $h = (($xs.getLong($j) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}
