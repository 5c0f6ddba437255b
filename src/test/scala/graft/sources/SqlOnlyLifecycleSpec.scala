package graft.sources

import graft.SparkTestBase

/** The SQL-only operator story, end to end through `spark.sql` alone:
  * CREATE TABLE AS SELECT → INSERT INTO → SELECT (with pushdown-backed
  * aggregates) → CALL maintenance → DELETE → VERSION AS OF → DROP
  * TABLE. Every statement resolves through [[GraftCatalog]]; no Scala
  * API call touches the table after setup. A user of the reference's
  * CLI tooling who only speaks SQL can run the whole lifecycle. */
class SqlOnlyLifecycleSpec extends SparkTestBase {

  test("CTAS, INSERT INTO, SELECT, CALL, DELETE, VERSION AS OF, DROP — all through spark.sql") {
    useCatalog()
    val dir = graft.TempRoots.path("sql_only_lifecycle")
    val t = s"graft.`$dir`"

    // CREATE TABLE AS SELECT
    spark.sql(
      s"""CREATE TABLE $t AS
         |SELECT id, CAST(id % 7 AS BIGINT) AS bucket,
         |  concat('d', id) AS s
         |FROM range(0, 500)""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
      == 500L)

    // INSERT INTO (appends through the same marker-committed write).
    // Schema-on-read gotcha pinned here: a bare INSERT binds by
    // POSITION against the re-inferred canonically-ordered schema, so
    // SQL inserts into graftjson tables should name their columns
    val ins = intercept[Exception](spark.sql(
      s"""INSERT INTO $t
         |SELECT id, CAST(id % 7 AS BIGINT) AS bucket,
         |  concat('d', id) AS s
         |FROM range(500, 700)""".stripMargin).collect())
    assert(ins.getMessage.contains("CAST_OVERFLOW_IN_TABLE_INSERT") ||
      ins.getMessage.toLowerCase.contains("cannot safely cast"),
      ins.getMessage)
    spark.sql(
      s"""INSERT INTO $t (id, bucket, s)
         |SELECT id, CAST(id % 7 AS BIGINT) AS bucket,
         |  concat('d', id) AS s
         |FROM range(500, 700)""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
      == 700L)

    // SELECT with aggregates over the fresh listing
    val agg = spark.sql(
      s"SELECT sum(id) AS si, count(DISTINCT bucket) AS nb FROM $t")
      .collect()(0)
    assert(agg.getLong(0) == (0L until 700L).sum && agg.getLong(1) == 7L)

    // INSERT OVERWRITE replaces the whole table through the same
    // truncate-and-add marker commit
    spark.sql(
      s"""INSERT OVERWRITE $t (id, bucket, s)
         |SELECT id, CAST(id % 7 AS BIGINT) AS bucket,
         |  concat('d', id) AS s
         |FROM range(0, 700)""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
      == 700L)

    // CALL maintenance: compact the two appends' task files, mint a
    // planning save so history exists
    spark.sql(s"CALL graft.recluster('$dir', by => 'id', " +
      "refresh_meta => true)").collect()
    val saves = spark.sql(s"CALL graft.history('$dir')").collect()
    assert(saves.length == 1, saves.toSeq)
    val save0 = saves(0).getLong(0)

    // metadata-only DELETE through the REAL zone decision: 30000 is
    // above every id (0..699) but inside the re-inferred smallint
    // width, so it survives constant folding, reaches decide() as a
    // pushed comparison, and every file proves empty by exact integral
    // bounds — a decided no-op through the proof path (the folded
    // AlwaysFalse variant is pinned separately in JsonDocDeleteSpec).
    spark.sql(s"DELETE FROM $t WHERE id >= 30000")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
      == 700L)

    // VERSION AS OF reads the save minted above
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF $save0")
      .collect()(0).getLong(0) == 700L)

    // DROP TABLE removes the directory; the next read is loud
    spark.sql(s"DROP TABLE $t")
    val e = intercept[Exception](spark.sql(s"SELECT count(*) FROM $t").collect())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }
}
