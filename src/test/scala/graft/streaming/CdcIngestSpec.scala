package graft.streaming

import graft.SparkTestBase
import graft.ops.Sharding
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming lake-maintenance loop: micro-batches of CDC rows
  * merge into the bucketed document store, batch-proportional writes,
  * replay-safe. */
class CdcIngestSpec extends SparkTestBase {

  test("a delete that EMPTIES a bucket removes its dir; a crashed merge rolls forward") {
    import spark.implicits._
    val store = graft.TempRoots.path("cdc_emptied")
    val docs = spark.createDataFrame(
      (0L until 24L).map(i => (i, s"t$i", "en", "a", i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Sharding.initDocStore(docs, store, nBuckets = 4)
    def byBucket = spark.read.parquet(store)
      .select(col("doc_id"), col("bucket")).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    val (b, ids) = byBucket.head
    // delete EVERY doc of one bucket, no upserts hashing there: a
    // dynamic overwrite cannot truncate a zero-output partition — the
    // merge must REMOVE the dir (review r12: these rows previously
    // survived silently while the audit reported the deletes applied)
    val eraser = spark.createDataFrame(ids.toSeq.map(i =>
        (i, null.asInstanceOf[String], "en", "a", 0L, "delete")))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "op")
    Sharding.mergeCdc(spark, store, eraser, 4)
    val after = spark.read.parquet(store)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(after.intersect(ids).isEmpty, "emptied bucket's rows survived")
    assert(!new java.io.File(s"$store/bucket=$b").exists)
    assert(!new java.io.File(s"$store/_cdc_pending").exists)
    assert(!new java.io.File(s"$store/_staging").exists)

    // CRASH state: staged post-merge content + committed marker, with
    // one touched bucket wiped (Spark's per-partition delete-then-
    // rename died between the two) — the next merge entry must
    // restore the bucket FROM STAGING, completing the crashed delete
    val (b2, ids2) = byBucket.filter(_._2.size >= 2).head
    val dead2 = ids2.min
    spark.read.parquet(store)
      .where(col("bucket") === b2 && col("doc_id") =!= dead2)
      .write.parquet(s"$store/_staging/out")
    spark.createDataFrame(Seq(Tuple1(-1))).toDF("bucket")
      .coalesce(1).write.parquet(s"$store/_cdc_pending/emptied")
    graft.ops.Fs.delete(spark, s"$store/bucket=$b2") // the torn commit
    Sharding.mergeCdc(spark, store, eraser.where(lit(false)), 4)
    val healed = spark.read.parquet(store)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!healed.contains(dead2), "the crashed delete must complete")
    assert((ids2 - dead2).subsetOf(healed),
      "the torn bucket's survivors must be restored from staging")
    assert(!new java.io.File(s"$store/_cdc_pending").exists)
    assert(!new java.io.File(s"$store/_staging").exists)
  }

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
