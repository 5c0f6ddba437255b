package graft.queries

import graft.SparkTestBase

/** Guards for the events-timestamp normalization (ADVICE r2, reworked
  * when the driver testdata moved from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS, NTZ)): whatever physical layout `events.ts`
  * ships in, `Tables` must hand every query a microsecond TIMESTAMP;
  * and because the session-global `nanosAsLong` flag makes any
  * TIMESTAMP(NANOS) column silently read as bigint, this spec pins
  * that no OTHER table in the corpus carries one. */
class TablesSpec extends SparkTestBase {

  /** Discovered from the directory, not hardcoded, so a table added to
    * the corpus later is automatically covered by the guard below
    * (ADVICE r3). */
  private def allTables: Seq[String] =
    new java.io.File(sfDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).toSeq.sorted

  test("the corpus contains at least the 10 known tables") {
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    assert(known.subsetOf(allTables.toSet),
      s"missing tables: ${known -- allTables.toSet}")
  }

  test("every table except events reads cleanly WITHOUT the nanos flag") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    allTables.filterNot(_ == "events").foreach { t =>
      // a TIMESTAMP(NANOS) column would throw PARQUET_TYPE_ILLEGAL here
      assert(ns.read.parquet(s"$sfDir/$t.parquet").limit(1).count() >= 0,
        s"table $t failed to read without the nanos flag")
    }
  }

  test("Tables('events') yields microsecond timestamps in a fresh session") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val df = Tables(ns, sfDir, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("legacy nanos-as-long layout still converts (floor, not toward-zero)") {
    // Spark cannot WRITE TIMESTAMP(NANOS), so synthesize the post-flag
    // view of that layout — a bigint ts column — which is exactly what
    // Tables' LongType branch consumes. Includes a pre-epoch value
    // whose ns->us division must floor (-1500ns -> -2us), the case
    // where `div` alone would diverge from DuckDB.
    val dir = graft.TempRoots.path("legacy_events")
    val rows = Seq(
      (1L, -1500L, 7L, "click", 1.0, "{}"),
      (2L, 1999L, 8L, "view", 2.0, "{}"),
      (3L, 1_000_000_000L, 9L, "purchase", 3.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val us = got.selectExpr("event_id", "unix_micros(ts) AS us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(us == Map(1L -> -2L, 2L -> 1L, 3L -> 1_000_000L))
  }
}
