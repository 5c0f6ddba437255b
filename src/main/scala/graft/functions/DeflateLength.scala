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
  * ONE Deflater (+ scratch buffer) per JVM THREAD, shared by every
  * DeflateLength instance via a companion ThreadLocal (setLevel +
  * reset per row): native-handle count is bounded by the executor's
  * thread pool — it does not grow with expression instances or
  * queries — and rows see a field access + native deflate with zero
  * per-row allocation. */
case class DeflateLength(child: Expression, level: Int)
  extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  /** Row measurement — called from interpreted eval and generated code. */
  def measure(s: UTF8String): Long = {
    val (d, buf) = DeflateLength.local.get()
    // per javadoc, a new level takes effect at the next reset
    d.setLevel(level)
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
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

object DeflateLength {
  /** JVM-wide per-thread deflate state: one raw (nowrap) Deflater and
    * one scratch buffer per thread, regardless of how many expression
    * instances exist. Level is reapplied per row (cheap — one native
    * field set), so instances at different levels share safely.
    * Deliberately never end()'d: the handle count equals the live
    * thread count, and the JDK Cleaner reclaims native state when a
    * pool thread dies. */
  private val local: ThreadLocal[(Deflater, Array[Byte])] =
    new ThreadLocal[(Deflater, Array[Byte])] {
      override def initialValue(): (Deflater, Array[Byte]) =
        (new Deflater(Deflater.DEFAULT_COMPRESSION, true), new Array[Byte](8192))
    }
}
