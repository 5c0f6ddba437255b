package graft.streaming

import graft.SparkTestBase
import graft.ops.VectorOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming ANN-index serving loop: per micro-batch, near-dups of
  * STORED vectors are flagged and only novel vectors append — and a
  * re-sent vector never double-inserts. */
class VectorIndexIngestSpec extends SparkTestBase {

  private def vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(55)
    (0L until 60L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
  }

  test("micro-batches flag near-dups against the stored index and append only novel vectors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = graft.TempRoots.path("ivfidx_stream")
    VectorOps.buildIvfIndex(
      spark.createDataFrame(vecs).toDF("vec_id", "embedding"), idx, nCells = 8)
    def storedIds = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq

    val rnd = new scala.util.Random(77)
    val novelA = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val novelB = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val mem = MemoryStream[(Long, Seq[Float])]
    // threshold 0.98: only (near-)exact copies count as duplicates, so
    // fresh gaussian vectors are reliably novel
    val q = EventStreams.vectorIndexIngest(
      mem.toDF().toDF("vec_id", "embedding"), idx,
      threshold = 0.98, nAssign = 8)
    try {
      // batch 1: an exact copy of stored vec 0 (suppressed) + a novel
      // vector (appended)
      mem.addData((100L, vecs(0)._2), (101L, novelA))
      q.processAllAvailable()
      assert(storedIds == ((0L until 60L) :+ 101L).sorted.toSeq,
        s"batch 1: $storedIds")
      // batch 2: a re-send of 101 (now a stored near-dup of itself),
      // a copy of it under a new id (near-dup), and one more novel
      mem.addData((101L, novelA), (102L, novelA), (103L, novelB))
      q.processAllAvailable()
      assert(storedIds == ((0L until 60L) ++ Seq(101L, 103L)).sorted.toSeq,
        s"batch 2: $storedIds")
    } finally q.stop()
  }
}
