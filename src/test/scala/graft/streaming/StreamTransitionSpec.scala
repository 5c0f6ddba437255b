package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming transition pair stream vs its batch twin (q180's lead()
  * pre-aggregation): identical (user, ts, event_id, from, to) pairs
  * over the real corpus, watermark-gated emission, and out-of-order
  * arrival within the lateness window reordering nothing (ordering
  * comes from the seal-time sort, not arrival). */
class StreamTransitionSpec extends SparkTestBase {

  private def batchPairs = {
    val seq0 = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    graft.queries.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(seq0).as("to_type"),
        lead(col("ts"), 1).over(seq0).as("to_ts"),
        lead(col("event_id"), 1).over(seq0).as("to_id"))
      .where(col("to_type").isNotNull)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("to_ts").getTime, r.getAs[Long]("to_id"),
        r.getAs[String]("from_type"), r.getAs[String]("to_type")))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
  }

  private def runStream(arrival: Seq[(Long, Timestamp, Long, String)],
                        name: String, lateness: String = "2 hours")
      : (Long, Seq[(Long, Long, Long, String, String)]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val ds = mem.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .as[EventStreams.TypedUserTs]
    val q = EventStreams.transitionIngest(spark, ds, lateness = lateness)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (first, rest) = arrival.splitAt(arrival.size / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      val mid = spark.table(name).count()
      mem.addData(rest: _*)
      q.processAllAvailable()
      // flush: push the watermark past every real event; the flush
      // user's own singleton seals but emits no pair
      val flushTs = new Timestamp(
        arrival.map(_._2.getTime).max + 365L * 24 * 3600 * 1000)
      mem.addData((999999999L, flushTs, -1L, "flush"))
      q.processAllAvailable()
      val streamed = spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("ts").getTime, r.getAs[Long]("event_id"),
          r.getAs[String]("from_type"), r.getAs[String]("to_type")))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      (mid, streamed)
    } finally q.stop()
  }

  test("stream == batch q180 pairs over the real corpus on ordered arrival") {
    val events = graft.queries.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .sortBy(e => (e._2.getTime, e._3)).toSeq
    val (mid, streamed) = runStream(events, "transition_ingest_ordered")
    val expected = batchPairs
    assert(expected.nonEmpty)
    assert(streamed.size == expected.size,
      s"stream=${streamed.size} batch=${expected.size}")
    assert(streamed == expected)
    // the watermark really gated: mid-stream drain had sealed a prefix
    assert(mid < expected.size)
  }

  test("out-of-order arrival within lateness yields the same pairs") {
    val events = graft.queries.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .sortBy(e => (e._2.getTime, e._3)).toSeq
    // scramble arrival within 64-event blocks; a generous lateness
    // keeps every straggler inside the watermark (the property under
    // test is seal-time ORDERING, not late-drop policy)
    val scrambled = events.grouped(64).flatMap { block =>
      val rnd = new scala.util.Random(block.head._3)
      rnd.shuffle(block)
    }.toSeq
    val (_, streamed) =
      runStream(scrambled, "transition_ingest_scrambled", "30 days")
    assert(streamed == batchPairs)
  }
}
