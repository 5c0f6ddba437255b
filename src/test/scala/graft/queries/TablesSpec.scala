package graft.queries

import graft.SparkTestBase

/** Guards for the session-global `nanosAsLong` trade-off (ADVICE r2):
  * the flag makes any TIMESTAMP(NANOS) column silently read as bigint,
  * so this spec pins that `events` is — and stays — the ONLY table in
  * the corpus that needs it. A new NANOS column in any other table
  * fails here instead of silently degrading to bigint in production. */
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

  test("events genuinely needs the flag (the guard detects NANOS columns)") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = intercept[Exception] {
      ns.read.parquet(s"$sfDir/events.parquet").limit(1).count()
    }
    // proves the first test would actually flag a new NANOS column
    assert(e.getMessage.contains("Parquet") || e.getMessage.contains("PARQUET"),
      s"expected a parquet type error, got: ${e.getMessage}")
  }

  test("Tables('events') converts ts to microsecond timestamps in a fresh session") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val df = Tables(ns, sfDir, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
