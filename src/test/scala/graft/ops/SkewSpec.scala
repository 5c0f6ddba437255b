package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join equals the plain join on a 95%-skewed key") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 5000 rows, 95% on key 1
    val left = spark.createDataset(
      (0 until 5000).map(i => (if (rnd.nextDouble() < 0.95) 1L else (i % 50).toLong, i)))
      .toDF("k", "payload")
    val right = spark.createDataset((0L until 50L).map(k => (k, s"dim$k")))
      .toDF("rk", "label")

    val plain = left.join(right, col("k") === col("rk"))
      .select(col("payload"), col("label"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", "rk", factor = 8)
      .select(col("payload"), col("label"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("the salt actually spreads the hot key across buckets") {
    import spark.implicits._
    val left = spark.createDataset((0 until 1000).map(i => (1L, i))).toDF("k", "payload")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8L)))
      .select(col("__salt")).distinct().count()
    assert(salts >= 6, s"only $salts distinct salts for the hot key")
  }
}
