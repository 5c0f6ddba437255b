package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SortedIntersectSizeSpec extends SparkTestBase {

  test("graft_isect equals size(array_intersect) on sorted distinct sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)((
      rnd.shuffle((0L until 100L).toList).take(rnd.nextInt(50) + 1).distinct.sorted,
      rnd.shuffle((0L until 100L).toList).take(rnd.nextInt(50) + 1).distinct.sorted))
    val df = spark.createDataset(rows).toDF("a", "b")
    val both = df.select(
      call_function("graft_isect", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("bigint").as("composed"))
      .collect()
    both.foreach { r => assert(r.getLong(0) == r.getLong(1)) }
  }

  test("empty and disjoint sets") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val out = df.select(call_function("graft_isect", col("a"), col("b"))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 0L, 3L))
  }
}
