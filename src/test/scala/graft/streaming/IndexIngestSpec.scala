package graft.streaming

import graft.SparkTestBase
import graft.ops.InvertedIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming inverted-index growth: each micro-batch becomes an LSM
  * segment; search over the stream-built index equals a from-scratch
  * build over everything ingested. */
class IndexIngestSpec extends SparkTestBase {

  test("micro-batches append as segments and search equals the batch rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = graft.TempRoots.path("invidx_stream")
    val base = (0L until 10L).map(i => (i, s"alpha beta doc$i"))
    val b1 = (10L until 15L).map(i => (i, s"beta gamma doc$i"))
    val b2 = (15L until 20L).map(i => (i, s"alpha gamma doc$i"))
    InvertedIndex.build(
      spark.createDataFrame(base).toDF("doc_id", "text"), dir, nBuckets = 4)
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.indexIngest(mem.toDF().toDF("doc_id", "text"), dir)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val rebuilt = graft.TempRoots.path("invidx_stream_rebuilt")
    InvertedIndex.build(
      spark.createDataFrame(base ++ b1 ++ b2).toDF("doc_id", "text"),
      rebuilt, nBuckets = 4)
    for (terms <- Seq(Seq("alpha"), Seq("beta"), Seq("alpha", "gamma"))) {
      def res(d: String) = InvertedIndex.searchAll(spark, d, terms)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(res(dir) == res(rebuilt), s"diverged on $terms")
      assert(res(dir).nonEmpty)
    }
    // the stream wrote one segment per non-empty batch beyond seg 0
    val segs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("seg=")).map(_.getName).sorted.toSeq
    assert(segs == Seq("seg=0", "seg=1", "seg=2"), segs)
  }
}
