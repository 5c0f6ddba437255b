package graft

import org.apache.spark.sql.functions._

/** Registration-layer contracts for the native expressions: wrong
  * arity raises a clear usage error (not IndexOutOfBounds — ADVICE
  * r2), and non-literal config args keep their dedicated message. */
class GraftExtensionsSpec extends SparkTestBase {

  private def analysisMessage(body: => Any): String =
    intercept[Exception] { body }.getMessage

  test("wrong arity yields the usage message, not IndexOutOfBounds") {
    import spark.implicits._
    val df = Seq("x").toDF("t")
    val m1 = analysisMessage(
      df.select(call_function("graft_winnow", col("t"))).collect())
    assert(m1.contains("graft_winnow(text, k, w) takes 3 arguments, got 1"))
    val m2 = analysisMessage(
      df.select(call_function("graft_dot", col("t"))).collect())
    assert(m2.contains("graft_dot(a, b) takes 2 arguments, got 1"))
    val m3 = analysisMessage(
      df.select(call_function("graft_isect", col("t"), col("t"), col("t"))).collect())
    assert(m3.contains("graft_isect(a, b) takes 2 arguments, got 3"))
    val m4 = analysisMessage(
      df.select(call_function("graft_minhash", col("t"))).collect())
    assert(m4.contains("graft_minhash(hashes, n) takes 2 arguments, got 1"))
    val m5 = analysisMessage(
      df.select(call_function("graft_simhash", col("t"), col("t"))).collect())
    assert(m5.contains("graft_simhash(words) takes 1 arguments, got 2"))
  }

  test("non-literal k/w/n still raise the literal-argument message") {
    import spark.implicits._
    val df = Seq(("x", 3)).toDF("t", "k")
    val m = analysisMessage(
      df.select(call_function("graft_winnow", col("t"), col("k"), col("k"))).collect())
    assert(m.contains("must be integer literals"))
  }
}
