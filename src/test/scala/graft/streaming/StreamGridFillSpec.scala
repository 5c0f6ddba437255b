package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming grid fill vs its batch twin (q162): identical rows over
  * the real corpus on ordered arrival — same hourly grid, same
  * (ts, event_id) hour-close tiebreak, same carried doubles, same
  * staleness counters — and watermark-driven emission (open hours and
  * their pending gaps never emit). */
class StreamGridFillSpec extends SparkTestBase {

  test("stream == batch q162 over the real corpus on ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.queries.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .sortBy(e => (e._2.getTime, e._3))
      .toSeq
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val ds = mem.toDF().toDF("user_id", "ts", "event_id", "value")
      .as[EventStreams.UserTs]
    val q = EventStreams.gridFillIngest(spark, ds, lateness = "2 hours")
      .writeStream.format("memory").queryName("grid_fill_ingest")
      .outputMode("append").start()
    try {
      val (first, rest) = events.splitAt(events.size / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      val mid = spark.table("grid_fill_ingest").count()
      mem.addData(rest: _*)
      q.processAllAvailable()
      // flush: a single far-future event pushes the watermark past
      // every real hour; its own hour stays open so it never emits
      val flushTs = new Timestamp(
        events.map(_._2.getTime).max + 365L * 24 * 3600 * 1000)
      mem.addData((999999999L, flushTs, -1L, 0.0))
      q.processAllAvailable()

      def key(u: Long, h: Timestamp, n: Long, o: Long, f: Double, s: Long) =
        (u, h.getTime, n, o, f, s)
      val streamed = spark.table("grid_fill_ingest").collect()
        .map(r => key(r.getAs[Long]("user_id"), r.getAs[Timestamp]("h"),
          r.getAs[Long]("n_events"), r.getAs[Long]("is_observed"),
          r.getAs[Double]("filled_close"), r.getAs[Long]("hours_stale")))
        .sortBy(t => (t._1, t._2)).toSeq
      val expected = graft.SparkEntry
        .queries("q162_time_grid_fill")(spark, sfDir).collect()
        .map(r => key(r.getAs[Long]("user_id"), r.getAs[Timestamp]("h"),
          r.getAs[Long]("n_events"), r.getAs[Long]("is_observed"),
          r.getAs[Double]("filled_close"), r.getAs[Long]("hours_stale")))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(expected.nonEmpty)
      assert(streamed.size == expected.size,
        s"row count: stream=${streamed.size} batch=${expected.size}")
      assert(streamed == expected)
      // watermark really gated emission: the mid-stream drain had
      // closed only a prefix
      assert(mid < expected.size)
      assert(expected.exists(_._4 == 0L), "corpus must contain gap hours")
    } finally q.stop()
  }
}
