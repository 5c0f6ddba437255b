package graft.functions

import graft.SparkTestBase
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Native one-pass signature must equal the composed per-lane form. */
class MinhashSignatureSpec extends SparkTestBase {

  test("graft_minhash equals the composed transform/array_min form") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(100)(Seq.fill(40)(rnd.nextLong()))
    val df = spark.createDataset(rows).toDF("hashes")
    val p = 2147483647L
    val coeffs = { // same fixed-seed derivation
      val r = new scala.util.Random(42)
      Seq.fill(16)((r.nextInt(Int.MaxValue - 1).toLong + 1L, r.nextInt(Int.MaxValue).toLong))
    }
    val composed = array(coeffs.map { case (a, b) =>
      array_min(transform(transform(col("hashes"), h => pmod(h, lit(p))),
        h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
    val both = df.select(
      call_function("graft_minhash", col("hashes"), lit(16)).as("native"),
      composed.as("composed")).collect()
    both.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("native") ==
        r.getAs[scala.collection.Seq[Long]]("composed"))
    }
  }

  test("signatures are stable across partitionings") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"doc $i word${i % 7} shared tokens here", "s", "en"))
    val d1 = spark.createDataFrame(docs).toDF("doc_id", "text", "source", "lang")
    def sigs(parts: Int) =
      d1.repartition(parts)
        .select(col("doc_id"),
          TextOps.minhashSignatureFromHashes(TextOps.wordHashSet(col("text")), 8).as("sig"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[scala.collection.Seq[Long]]("sig")).toMap
    assert(sigs(1) == sigs(5))
  }

  test("empty and null shingle sets: native and composed branches agree") {
    import spark.implicits._
    val p = 2147483647L
    val coeffs = {
      val r = new scala.util.Random(42)
      Seq.fill(4)((r.nextInt(Int.MaxValue - 1).toLong + 1L, r.nextInt(Int.MaxValue).toLong))
    }
    // the composed fallback, constructed directly (SparkTestBase
    // installs the extensions, so TextOps would route to the native fn)
    def composedSig(hashes: org.apache.spark.sql.Column) = {
      val base = transform(hashes, h => pmod(h, lit(p)))
      val sig = array(coeffs.map { case (a, b) =>
        coalesce(array_min(transform(base, h => pmod(h * lit(a) + lit(b), lit(p)))), lit(p))
      }: _*)
      when(hashes.isNotNull, sig)
    }
    val df = Seq(Some(Seq.empty[Long]), Some(Seq(7L, 8L)), None).toDF("hashes")
    val rows = df.select(
      call_function("graft_minhash", col("hashes"), lit(4)).as("native"),
      composedSig(col("hashes")).as("composed")).collect()
    rows.foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getAs[scala.collection.Seq[Long]](0).toSeq
      val c = if (r.isNullAt(1)) null else r.getAs[scala.collection.Seq[Long]](1).toSeq
      assert(n == c, s"native=$n composed=$c")
    }
    assert(rows(0).getAs[scala.collection.Seq[Long]](0).toSeq == Seq.fill(4)(p))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }
}
