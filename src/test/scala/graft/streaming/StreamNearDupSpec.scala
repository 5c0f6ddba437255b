package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming near-dup suppression semantics with MemoryStream: a
  * paraphrased (not byte-identical, not token-set-identical) late
  * duplicate is dropped, state is watermark-bounded, and the stream
  * agrees with the batch twin on identical input order. */
class StreamNearDupSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  // docA and docB: B drops one word from A — different token-set
  // fingerprint (exact dedup would MISS it) but high Jaccard, so bands
  // collide; docC is disjoint
  private val docA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val docB = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
  private val docC = "one two three four five six seven eight nine ten"
  // band-disjoint fillers used to advance the watermark without
  // touching A/B/C's band keys
  private val docC2 = "red orange yellow green blue indigo violet white black grey"
  private val docB2 = "north south east west upward downward leftward rightward forward backward"

  test("precondition: A/B share a band but not the fingerprint; C is band-disjoint") {
    import spark.implicits._
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val bands = graft.ops.TextOps.minhashBands(docs, 12, 3).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("band"), r.getAs[Int]("band_key"))))
    def of(id: Long) = bands.filter(_._1 == id).map(_._2).toSet
    assert(of(1L).intersect(of(2L)).nonEmpty, "A and B must share a band")
    assert(of(1L).intersect(of(3L)).isEmpty && of(2L).intersect(of(3L)).isEmpty,
      "C must be band-disjoint from A and B")
    val fps = docs.select(
      graft.ops.TextOps.tokenSetFingerprint(col("text")).as("fp")).collect()
      .map(_.getString(0))
    assert(fps.distinct.length == 3, "fingerprints must all differ")
  }

  test("paraphrased late duplicate is dropped; state is watermark-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.nearDupIngest(docs, nSig = 12, bands = 3,
        lateness = "10 minutes", window_ = "10 minutes")
      .writeStream.format("memory").queryName("neardup_ingest")
      .outputMode("append").start()
    try {
      // window [10:00,10:10): A claims its bands; B (paraphrase, later
      // in the same window, different fingerprint) collides on >=1 band
      // -> suppressed; C is novel
      mem.addData((ts(1), 1L, docA), (ts(5), 2L, docB), (ts(7), 3L, docC))
      q.processAllAvailable()
      // disjoint doc at 10:35 advances the watermark to 10:25 AFTER
      // this batch: window 1 closes (emits A and C, not B) and the
      // batch-1 band claims (expiry = event ts + 10 min <= 10:17) are
      // evicted from the dedup state
      mem.addData((ts(35), 4L, docC2))
      q.processAllAvailable()
      val first = spark.table("neardup_ingest")
        .where(col("is_kept") === 1).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(first == Seq(1L, 3L), s"window 1 kept $first")
      // the suppressed doc does NOT vanish: it emits an audit row with
      // its lost-band count — the stream-side lineage the batch twin
      // always reported
      val suppressed = spark.table("neardup_ingest")
        .where(col("is_kept") === 0).collect()
      assert(suppressed.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
      val lost = suppressed(0).getAs[Long]("n_lost_bands")
      assert(lost >= 1L && lost <= 3L, s"doc 2 lost $lost bands")
      // doc 5 re-uses C's exact text at 10:40, past the eviction: its
      // bands must be re-claimable — the observable proof that near-dup
      // state is bounded by the watermark, not an ever-growing archive
      mem.addData((ts(40), 5L, docC))
      q.processAllAvailable()
      // flush: advance the watermark past 10:50 to close every window
      mem.addData((ts(80), 6L, docB2))
      q.processAllAvailable()
      val all = spark.table("neardup_ingest")
        .where(col("is_kept") === 1).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(all == Seq(1L, 3L, 4L, 5L),
        s"evicted band state must re-admit doc 5: $all")
    } finally q.stop()
  }

  test("stream decisions equal the batch twin on identical arrival order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a corpus slice fed in doc_id order, ONE DOC PER MICRO-BATCH, all
    // inside one watermark era. Per-batch feeding matters for the pin:
    // within a single micro-batch dropDuplicatesWithinWatermark keeps
    // an arbitrary same-key row (post-shuffle merge order is not
    // contracted to follow doc_id), so only cross-batch arrival order
    // is the stream-side analogue of the batch twin's doc_id ranking
    val rows = graft.queries.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
      .orderBy(col("doc_id")).limit(60).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.nearDupIngest(docs, nSig = 12, bands = 3,
        lateness = "2 hours", window_ = "4 hours")
      .writeStream.format("memory").queryName("neardup_bridge")
      .outputMode("append").start()
    try {
      rows.zipWithIndex.foreach { case ((id, text), i) =>
        mem.addData((ts(i % 50), id, text))
        q.processAllAvailable()
      }
      // flush: advance the watermark far enough to close the window
      mem.addData((ts(600), 999999L, "flush marker doc"))
      q.processAllAvailable()
      // FULL audit parity, not just the kept set: per doc, the stream's
      // (n_lost_bands, is_kept) lineage must equal the batch twin's on
      // identical (per-batch) arrival order
      val streamAudit = spark.table("neardup_bridge")
        .where(col("doc_id") =!= 999999L).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lost_bands"),
          r.getAs[Long]("is_kept"))).sortBy(_._1).toSeq
      val batchAudit = graft.ops.TextOps.nearDupSuppress(
          spark.createDataFrame(rows.toSeq).toDF("doc_id", "text"), 12, 3)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lost_bands"),
          r.getAs[Long]("is_kept"))).sortBy(_._1).toSeq
      assert(streamAudit == batchAudit,
        s"stream-only=${streamAudit.toSet -- batchAudit.toSet} " +
          s"batch-only=${batchAudit.toSet -- streamAudit.toSet}")
    } finally q.stop()
  }
}
