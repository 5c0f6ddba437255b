package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native `graft_pq_encode` must be bit-identical to the composed
  * argmin form for every call shape it replaces (the repo invariant
  * for all native expressions): coarse cell (1 subspace, nAssign=1),
  * IVF multi-assignment (1 subspace, nAssign=k), PQ codes (S
  * subspaces, nAssign=1) — over the real corpus and adversarial
  * vectors (exact ties from duplicated centers, nAssign > |book|). */
class PqEncodeSpec extends SparkTestBase {

  // the composed form, spelled out independently of VectorOps'
  // private helpers so the pin cannot drift with the implementation
  private def composed(v: Column, books: Array[Array[Double]],
                       nAssign: Int): Column = {
    val ds = books.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct((call_function("graft_dot", v,
        array(c.toIndexedSeq.map(lit): _*)) * lit(-2.0) + lit(c2)).as("d"),
        lit(i).as("cell"))
    }
    transform(slice(array_sort(array(ds.toIndexedSeq: _*)), 1, nAssign),
      s => s.getField("cell"))
  }

  private def native(v: Column, books: Array[Array[Array[Double]]],
                     nAssign: Int): Column =
    call_function("graft_pq_encode", v,
      typedLit(books.map(_.map(_.toSeq).toSeq).toSeq), lit(nAssign))

  private def vecs = {
    import spark.implicits._
    graft.queries.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
  }

  private val rng = new scala.util.Random(7)
  private def randCenters(n: Int, w: Int): Array[Array[Double]] =
    Array.fill(n)(Array.fill(w)(rng.nextDouble() * 2 - 1))

  private def assertParity(label: String, nativeCol: Column,
                           composedCol: Column): Unit = {
    val bad = vecs.select(col("vec_id"), nativeCol.as("a"), composedCol.as("b"))
      .where(not(col("a") <=> col("b")))
    assert(bad.count() == 0, s"$label diverges: ${bad.take(3).mkString(";")}")
  }

  test("coarse cell, multi-assignment and PQ codes match the composed form exactly") {
    val coarse = randCenters(16, 64)
    assertParity("cell", native(col("v"), Array(coarse), 1),
      composed(col("v"), coarse, 1))
    assertParity("multi-assign", native(col("v"), Array(coarse), 4),
      composed(col("v"), coarse, 4))
    val books = Array.tabulate(8)(_ => randCenters(16, 8))
    val composedCodes = concat(books.zipWithIndex.map { case (b, s) =>
      composed(slice(col("v"), s * 8 + 1, 8), b, 1)
    }.toIndexedSeq: _*)
    assertParity("codes", native(col("v"), books, 1), composedCodes)
  }

  test("exact ties break to the lower index, like the composed struct order") {
    val c = randCenters(1, 64)(0)
    // three identical centers + one distinct: ties must resolve 0,1,2
    val dup = Array(c, c.clone(), c.clone(), randCenters(1, 64)(0))
    assertParity("ties", native(col("v"), Array(dup), 3),
      composed(col("v"), dup, 3))
    val first = vecs.select(native(col("v"), Array(dup), 3).as("a"))
      .collect()(0).getSeq[Int](0)
    assert(first.take(2) == Seq(0, 1), s"tie order: $first")
  }

  test("nAssign larger than the codebook emits every center once") {
    val small = randCenters(3, 64)
    assertParity("overask", native(col("v"), Array(small), 10),
      composed(col("v"), small, 10))
    val out = vecs.select(native(col("v"), Array(small), 10).as("a"))
      .collect()(0).getSeq[Int](0)
    assert(out.sorted == Seq(0, 1, 2))
  }
}
