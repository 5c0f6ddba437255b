package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native expression must be bit-identical to the composed
  * higher-order form (same left-to-right double accumulation) and
  * must resolve through the injected function registry. */
class DotProductSpec extends SparkTestBase {

  test("graft_dot equals aggregate(zip_with) bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val df = spark.createDataset(rows).toDF("a", "b")
    val both = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("composed"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array and mismatched lengths yield null (composed-form parity)") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))).toDF("a", "b")
    val out = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("composed")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // ragged → null both
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getDouble(0) == 11.0 && out(2).getDouble(1) == 11.0)
  }

  test("type check rejects non-double arrays") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<double>"))
  }

  test("similarity queries keep whole-stage codegen with the native dot") {
    val df = graft.SparkEntry.queries("q62_embedding_neardup")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan.take(2000))
    assert(plan.contains("*("), plan.take(2000))
  }
}
