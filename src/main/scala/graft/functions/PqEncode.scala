package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization / coarse-cell encoder: for each subspace s of
  * the input vector (subspace widths come from the codebook shapes,
  * laid end-to-end), ranks that subspace's centers by
  * ⟨v_s,c⟩·(−2) + ‖c‖² (squared distance minus the per-row-constant
  * ‖v_s‖² — the same algebra the composed form uses) and emits the
  * `nAssign` nearest center indices in (distance, index) order.
  * Output length is Σ_s min(nAssign, |books(s)|).
  *
  * One expression instance covers all three quantizer call sites:
  * coarse cell assignment (one subspace of full width, nAssign=1),
  * IVF multi-assignment blocking (one subspace, nAssign=k), and PQ
  * code assignment (S subspaces, nAssign=1).
  *
  * Exists because the composed form — per subspace, an
  * `array_min`/`array_sort` over |books| structs each holding a
  * `slice` + dot expression — evaluates hundreds of interpreted
  * expression nodes per row (~0.5 ms/row measured at 64 dims,
  * 8×16 codebooks); this is a single tight loop over the same
  * arithmetic in the same order, asserted bit-identical to the
  * composed form (PqEncodeSpec). Codebooks are `Seq`s so the case
  * class keeps structural equality for plan canonicalization; the
  * hot loop reads pre-materialized arrays. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]],
                    nAssign: Int)
  extends UnaryExpression {

  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  // ‖c‖² computed exactly as the composed form's driver-side
  // c.map(x => x * x).sum literal, so the per-center distance is the
  // same IEEE double in both paths
  @transient private lazy val c2Arr: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Public eval core — also the target the generated code calls (a
    * single virtual call per row into this compiled loop; inlining
    * the loop into Janino source would buy nothing measurable over
    * it). */
  def encodeRow(xs: ArrayData): ArrayData = {
    val bs = booksArr
    val out = new Array[Int](totalOut)
    var outI = 0
    var off = 0
    var s = 0
    while (s < bs.length) {
      val book = bs(s)
      val n = book.length
      val w = book(0).length
      val c2s = c2Arr(s)
      val ds = new Array[Double](n)
      var c = 0
      while (c < n) {
        val cen = book(c)
        var d = 0.0
        var j = 0
        while (j < w) { d += xs.getDouble(off + j) * cen(j); j += 1 }
        ds(c) = d * -2.0 + c2s(c)
        c += 1
      }
      // nAssign smallest by (distance, index) — matches the composed
      // struct ordering (lower index wins exact ties; NaN sorts last
      // via Double.compare, same as Catalyst's double ordering)
      val k = math.min(nAssign, n)
      val used = new Array[Boolean](n)
      var t = 0
      while (t < k) {
        var best = -1
        var c2i = 0
        while (c2i < n) {
          if (!used(c2i) &&
            (best < 0 || java.lang.Double.compare(ds(c2i), ds(best)) < 0))
            best = c2i
          c2i += 1
        }
        used(best) = true
        out(outI) = best
        outI += 1
        t += 1
      }
      off += w
      s += 1
    }
    new GenericArrayData(out)
  }

  @transient private lazy val totalOut: Int =
    booksArr.map(b => math.min(nAssign, b.length)).sum

  override def nullSafeEval(input: Any): Any =
    encodeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, xs => s"${ev.value} = $ref.encodeRow($xs);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}
