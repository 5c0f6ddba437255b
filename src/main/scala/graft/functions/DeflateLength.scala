package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string column's UTF-8 bytes — the
  * compression-ratio quality signal (raw_bytes / deflate_bytes) used
  * by large-corpus curation as a cheap, language-agnostic repetition
  * detector: boilerplate and template spam compress far better than
  * natural prose, so a high ratio flags low-entropy documents without
  * tokenizing (complements [[graft.ops.TextOps.repetitionStats]],
  * which counts explicit n-gram repeats).
  *
  * Level is a constructor field (fixed at plan build); `nowrap` raw
  * deflate avoids the 6-byte zlib envelope so tiny documents don't
  * read as "compressible" from header overhead alone. A fixed level
  * over fixed bytes makes the java.util.zip output deterministic on a
  * given JVM — same value on every executor, every layout (the spec
  * pins parity against a direct Deflater fold over the same rows).
  * One Deflater per (thread, expression) via ThreadLocal, reset per
  * row: codegen'd rows see a field access + native deflate, never a
  * per-row native-handle allocation. */
case class DeflateLength(child: Expression, level: Int)
  extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val local: ThreadLocal[Deflater] =
    new ThreadLocal[Deflater] {
      override def initialValue(): Deflater = new Deflater(level, true)
    }

  /** Row measurement — called from interpreted eval and generated code. */
  def measure(s: UTF8String): Long = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override def nullSafeEval(s: Any): Any = measure(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateExpr", this,
      classOf[DeflateLength].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.measure($s);")
  }

  override def toString: String = s"deflatelength($child, $level)"
  override def sql: String = s"deflatelength(${child.sql}, $level)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
