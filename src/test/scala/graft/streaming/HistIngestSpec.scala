package graft.streaming

import graft.SparkTestBase
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming histogram-store growth: micro-batches land as shard
  * partitions of exact bin counts; additivity makes the merged
  * quantile estimates equal the one-shot batch histogram over
  * everything that arrived, under any batch split. */
class HistIngestSpec extends SparkTestBase {

  test("micro-batches append as shards; merged quantiles equal the one-shot histogram") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = graft.TempRoots.path("hist_stream")
    val (lo, hi, nBins) = (0.0, 1000.0, 40)
    // two batches with different value ranges — arrival order must
    // not matter because bin counts add
    val b1 = (0 until 500).map(i => (i.toLong, (i % 997).toDouble))
    val b2 = (0 until 300).map(i => (i.toLong, ((i * 13) % 640 + 0.5)))
    val mem = MemoryStream[(Long, Double)]
    val q = EventStreams.histIngest(
      mem.toDF().toDF("id", "v"), dir, col("v"), lo, hi, nBins)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
    assert(shards == Seq("shard=batch-000000", "shard=batch-000001"), shards)

    val ps = Seq(0.25, 0.5, 0.95)
    def quantiles(d: String): Seq[(Double, Double)] =
      Sketches.histQuantiles(spark, d, lo, hi, nBins, ps).collect()
        .map(r => (r.getAs[Double]("p"), r.getAs[Double]("est"))).toSeq

    // one-shot batch histogram over the union, single shard
    val oneDir = graft.TempRoots.path("hist_stream_oneshot")
    Sketches.writeHistShards(
      spark.createDataFrame(b1 ++ b2).toDF("id", "v"), oneDir,
      col("v"), lit("all"), lo, hi, nBins)
    assert(quantiles(dir) == quantiles(oneDir))

    // exact counts survived the split: bin totals equal row count
    val tot = spark.read.parquet(dir).agg(sum(col("c"))).head().getLong(0)
    assert(tot == (b1.size + b2.size).toLong)
  }

  test("checkpointed restart resumes batch ids — no shard duplicated, no shard lost") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = graft.TempRoots.path("hist_stream_restart")
    val ckpt = graft.TempRoots.path("hist_stream_restart_ckpt")
    val (lo, hi, nBins) = (0.0, 100.0, 10)
    val mem = MemoryStream[(Long, Double)]
    def start() = EventStreams.histIngest(
      mem.toDF().toDF("id", "v"), dir, col("v"), lo, hi, nBins,
      checkpointDir = Some(ckpt))

    val q1 = start()
    try {
      mem.addData((0 until 200).map(i => (i.toLong, (i % 97).toDouble)): _*)
      q1.processAllAvailable()
    } finally q1.stop()

    // a NEW query over the SAME checkpoint must continue at batch 1,
    // not restart at 0 (which would silently overwrite shard 0) —
    // this is what the shard-per-batchId idempotence design rests on
    val q2 = start()
    try {
      mem.addData((0 until 300).map(i => (i.toLong, ((i * 7) % 83).toDouble)): _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted.toSeq
    assert(shards == Seq("shard=batch-000000", "shard=batch-000001"),
      s"restart mishandled batch ids: $shards")
    val tot = spark.read.parquet(dir).agg(sum(col("c"))).head().getLong(0)
    assert(tot == 500L, s"rows lost or duplicated across restart: $tot")
  }
}
