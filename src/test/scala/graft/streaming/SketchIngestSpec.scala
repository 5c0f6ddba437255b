package graft.streaming

import graft.SparkTestBase
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sketch-store growth: micro-batches land as shard
  * partitions, and the merged distinct estimate equals a single
  * whole-data sketch — the mergeability that makes the store correct
  * under any arrival order. */
class SketchIngestSpec extends SparkTestBase {

  test("micro-batches append as shards; merged estimate equals the one-shot sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = graft.TempRoots.path("hll_stream")
    val b1 = (0L until 400L).map(i => (i % 97, s"g${i % 3}"))
    val b2 = (0L until 400L).map(i => ((i * 7) % 211, s"g${i % 3}"))
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.sketchIngest(
      mem.toDF().toDF("uid", "grp"), dir, col("grp"), col("uid"))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // one shard per non-empty batch
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
    assert(shards == Seq("shard=batch-000000", "shard=batch-000001"), shards)
    val got = Sketches.mergedDistinct(spark, dir).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_distinct_est"),
        r.getAs[Long]("n_rows"))).sortBy(_._1).toSeq
    // one-shot sketch over everything that arrived
    val all = spark.createDataFrame(b1 ++ b2).toDF("uid", "grp")
    val want = all.groupBy(col("grp"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("uid"), lit(12))).as("e"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("e"),
        r.getAs[Long]("n"))).sortBy(_._1).toSeq
    assert(got == want)
    // and at this cardinality the estimate is exact
    val exact = all.groupBy(col("grp"))
      .agg(countDistinct(col("uid")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (g, est, _) => assert(est == exact(g), s"$g") }
  }
}
