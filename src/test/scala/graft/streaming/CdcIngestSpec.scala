package graft.streaming

import graft.SparkTestBase
import graft.ops.Sharding
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming lake-maintenance loop: micro-batches of CDC rows
  * merge into the bucketed document store, batch-proportional writes,
  * replay-safe. */
class CdcIngestSpec extends SparkTestBase {

  test("micro-batches upsert/insert/delete serially and a conflicting batch fails fast") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = graft.TempRoots.path("cdc_stream_store")
    val base = (0L until 20L).map(i => (i, s"doc $i", "en", "a", 6L))
    Sharding.initDocStore(
      spark.createDataFrame(base).toDF("doc_id", "text", "lang", "source", "n_chars"),
      store, 4)
    def content = spark.read.parquet(store)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val mem = MemoryStream[(Long, String, String, String, Long, String)]
    val q = EventStreams.cdcIngest(
      mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars", "op"),
      store, 4)
    try {
      // batch 1: update doc 3, insert doc 100, delete doc 7
      mem.addData((3L, "updated 3", "en", "a", 9L, "upsert"),
        (100L, "fresh 100", "en", "a", 9L, "upsert"),
        (7L, null.asInstanceOf[String], "en", "a", 0L, "delete"))
      q.processAllAvailable()
      val c1 = content
      assert(c1(3L) == "updated 3" && c1(100L) == "fresh 100")
      assert(!c1.contains(7L) && c1.size == 20)
      // batch 2: later batch overrides batch 1's insert (serial order)
      mem.addData((100L, "fresh 100 v2", "en", "a", 12L, "upsert"))
      q.processAllAvailable()
      assert(content(100L) == "fresh 100 v2")
    } finally q.stop()

    // conflicting rows for one id in a single batch must fail fast,
    // not silently duplicate the doc in the store
    val bad = spark.createDataFrame(Seq(
      (5L, "a", "en", "a", 1L, "upsert"),
      (5L, "b", "en", "a", 1L, "upsert")))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "op")
    val err = intercept[IllegalArgumentException] {
      Sharding.mergeCdc(spark, store, bad, 4)
    }
    assert(err.getMessage.contains("one change per id"))
    // and the failed merge left no staging behind
    assert(!new java.io.File(s"$store/_staging").exists())
  }
}
