package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming throughput monitor vs its batch twin: identical rows on
  * ordered arrival (same integer moments, same IEEE ladder, same
  * rounding), zero-variance suppression on both sides, and
  * watermark-driven emission (the open hour never emits). */
class StreamAnomalySpec extends SparkTestBase {

  private val baseMs = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def at(hour: Int, i: Int): Timestamp =
    new Timestamp(baseMs + hour * 3600L * 1000L + i * 1000L)

  // deterministic hourly counts with a spike at hour 27
  private def clickCount(h: Int): Int = if (h == 27) 200 else 5 + (h * 7) % 13

  private def allEvents: Seq[(Timestamp, String)] = {
    val clicks = for {
      h <- 0 until 30
      i <- 0 until clickCount(h)
    } yield (at(h, i), "click")
    // constant-rate type: sigma == 0 -> suppressed on both sides
    val views = for (h <- 0 until 30; i <- 0 until 4) yield (at(h, i), "view")
    (clicks ++ views).sortBy(_._1.getTime)
  }

  test("stream == batch on ordered arrival; spike flagged; flat type suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val ds = mem.toDF().toDF("ts", "event_type")
      .select(col("event_type"), col("ts")).as[EventStreams.TypedTs]
    val q = EventStreams.anomalyIngest(spark, ds, lateness = "2 hours")
      .writeStream.format("memory").queryName("anomaly_ingest")
      .outputMode("append").start()
    try {
      val (first, rest) = allEvents.splitAt(allEvents.size / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(rest: _*)
      q.processAllAvailable()
      // flush far in the future: watermark passes every real hour
      mem.addData((at(48, 0), "flush"))
      q.processAllAvailable()

      val streamed = spark.table("anomaly_ingest")
        .orderBy(col("event_type"), col("hr")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("hr"),
          r.getAs[Long]("cnt"), r.getAs[Double]("mu"),
          r.getAs[Double]("sigma"), r.getAs[Double]("z"),
          r.getAs[Long]("is_anomaly"))).toSeq

      val batchDf = allEvents.toDF("ts", "event_type")
      val expected = EventStreams.hourlyAnomalies(batchDf)
        .orderBy(col("event_type"), col("hr")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("hr"),
          r.getAs[Long]("cnt"), r.getAs[Double]("mu"),
          r.getAs[Double]("sigma"), r.getAs[Double]("z"),
          r.getAs[Long]("is_anomaly"))).toSeq

      assert(expected.nonEmpty, "batch twin must emit scored hours")
      assert(streamed == expected,
        s"stream/batch divergence:\nstream=${streamed.mkString("\n")}\nbatch=${expected.mkString("\n")}")
      // hours 24..29 of the varying type emit; 27 is the spike
      assert(streamed.map(_._1).distinct.toSeq == Seq("click"),
        "flat type must be variance-suppressed")
      assert(streamed.length == 6)
      val spike = streamed.find(_._2 == at(27, 0)).get
      assert(spike._7 == 1L, s"spike not flagged: $spike")
      assert(streamed.count(_._7 == 1L) == 1, "only the spike flags")
    } finally q.stop()
  }
}
