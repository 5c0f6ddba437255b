package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-heap top-k-per-group aggregator: equivalence to the window
  * form, merge associativity at any parallelism, and tie handling. */
class TopKAggSpec extends SparkTestBase {

  test("aggregator top-k equals window row_number top-k, any parallelism") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 2000).map(i =>
      (i % 37L, i.toLong, math.floor(rnd.nextDouble() * 100) / 4)) // forced ties
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataset(rows).toDF("k", "id", "score")
        .repartition(parts)
      val viaAgg = df.select(col("k"), struct(col("id"), col("score")).as("e"))
        .as[(Long, (Long, Double))]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new TopKByScore(5).toColumn.name("top"))
        .flatMap { case (k, top) => top.map { case (id, s) => (k, id, s) } }
        .collect().toSet
      val w = Window.partitionBy(col("k"))
        .orderBy(col("score").desc, col("id"))
      val viaWindow = df
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("k"), col("id"), col("score"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaAgg == viaWindow, s"parts=$parts")
    }
  }

  test("reduce skips non-placing candidates; ties break by lower id") {
    val agg = new TopKByScore(2)
    val full = agg.merge(agg.reduce(agg.reduce(agg.zero, (1L, 9.0)), (2L, 8.0)),
      agg.reduce(agg.zero, (3L, 1.0)))
    assert(full == Seq((1L, 9.0), (2L, 8.0)))
    // equal scores: lower id wins placement
    val tied = agg.reduce(agg.reduce(agg.reduce(agg.zero, (5L, 7.0)), (4L, 7.0)), (6L, 7.0))
    assert(tied == Seq((4L, 7.0), (5L, 7.0)))
  }
}
