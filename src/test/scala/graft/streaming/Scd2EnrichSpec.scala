package graft.streaming

import graft.SparkTestBase
import graft.ops.Sharding
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming point-in-time enrichment: every event picks the
  * dimension version valid AT ITS EVENT TIME — equal to the batch
  * temporal join over the same rows, events before the first version
  * or for unknown keys keep NULL attributes, and events on either
  * side of a version boundary pick different attributes. */
class Scd2EnrichSpec extends SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream enrichment equals the batch temporal join; boundary and unknown keys behave") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // dimension history: key 1 changes segment on 2024-06-01, key 2
    // never changes
    val dim0 = Seq((1L, "OLD"), (2L, "STABLE"))
      .toDF("k", "seg")
      .withColumn("valid_from", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val hist = Sharding.scd2Apply(dim0,
      Seq((1L, "NEW")).toDF("k", "seg"), "k", Seq("seg"),
      lit("2024-06-01 00:00:00").cast("timestamp"))
    val dimDir = graft.TempRoots.path("scd2_enrich_dim")
    hist.write.mode("overwrite").parquet(dimDir)

    // events straddling the version boundary, plus an unknown key (9)
    // and a pre-history event
    val b1 = Seq((10L, 1L, t("2024-03-01 12:00:00")),
      (11L, 1L, t("2024-06-01 00:00:00")), // boundary: NEW from here
      (12L, 9L, t("2024-07-01 00:00:00"))) // unknown key
    val b2 = Seq((13L, 1L, t("2024-05-31 23:59:59")),
      (14L, 2L, t("2024-08-01 00:00:00")),
      (15L, 2L, t("2023-12-31 23:59:59"))) // before first version
    val outDir = graft.TempRoots.path("scd2_enrich_out")
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStreams.scd2Enrich(
      mem.toDF().toDF("event_id", "k", "ts"), dimDir, "k", "ts", outDir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(outDir)
      .select(col("event_id"), col("seg")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      10L -> Some("OLD"), 11L -> Some("NEW"), 12L -> None,
      13L -> Some("OLD"), 14L -> Some("STABLE"), 15L -> None))

    // batch twin: the q156-style temporal join over the same events
    val all = spark.createDataFrame(b1 ++ b2)
      .toDF("event_id", "k", "ts")
    val batch = all.join(spark.read.parquet(dimDir).as("d"),
        all("k") === col("d.k") && all("ts") >= col("d.valid_from") &&
          (col("d.valid_to").isNull || all("ts") < col("d.valid_to")),
        "left")
      .select(col("event_id"), col("seg")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == batch, "stream enrichment diverged from the batch temporal join")
  }

  test("column-collision guards fail fast at start(): event 'batch', dim 'batch', shared attributes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dimDir = graft.TempRoots.path("scd2_guard_dim")
    Seq((1L, "A")).toDF("k", "seg")
      .withColumn("valid_from", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .write.mode("overwrite").parquet(dimDir)
    val out = graft.TempRoots.path("scd2_guard_out")
    def streamWith(cols: Seq[String]) = {
      val mem = MemoryStream[(Long, Long, Timestamp)]
      EventStreams.scd2Enrich(mem.toDF().toDF(cols: _*), dimDir, "k", "ts", out)
    }
    // event-side 'batch' collides with the output partition column
    assert(intercept[IllegalArgumentException] {
      streamWith(Seq("batch", "k", "ts"))
    }.getMessage.contains("batch"))
    // shared non-key attribute makes the join ambiguous
    assert(intercept[IllegalArgumentException] {
      streamWith(Seq("seg", "k", "ts"))
    }.getMessage.contains("seg"))
    // dim-side 'batch' would be silently overwritten by the batch id
    val dimDir2 = graft.TempRoots.path("scd2_guard_dim2")
    Seq((1L, "A", "keep")).toDF("k", "seg", "batch")
      .withColumn("valid_from", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .write.mode("overwrite").parquet(dimDir2)
    val mem = MemoryStream[(Long, Long, Timestamp)]
    assert(intercept[IllegalArgumentException] {
      EventStreams.scd2Enrich(mem.toDF().toDF("event_id", "k", "ts"),
        dimDir2, "k", "ts", out)
    }.getMessage.contains("dimension"))
  }
}
