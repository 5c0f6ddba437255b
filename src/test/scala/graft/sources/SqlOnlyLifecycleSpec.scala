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

  test("UPDATE and MERGE INTO refuse with NAMED errors pointing at the supported alternatives (r16, VERDICT r15 #7)") {
    useCatalog()
    val dir = graft.TempRoots.path("sql_only_update")
    val t = s"graft.`$dir`"
    spark.sql(
      s"""CREATE TABLE $t AS
         |SELECT id, concat('d', id) AS s FROM range(0, 20)""".stripMargin)
    def msgs(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).toSeq
    // UPDATE: the named refusal, not Spark's generic unsupported error
    val eu = intercept[Exception](
      spark.sql(s"UPDATE $t SET s = 'x' WHERE id = 1"))
    assert(msgs(eu).exists(m => m.contains("UPDATE is deliberately") &&
      m.contains("merge_cdc")), eu.getMessage)
    // MERGE INTO: same, pointing at the bucketed CDC store
    spark.range(5).selectExpr("id", "'u' AS s")
      .createOrReplaceTempView("upd_src")
    val em = intercept[Exception](spark.sql(
      s"""MERGE INTO $t tgt USING upd_src src ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET s = src.s""".stripMargin))
    assert(msgs(em).exists(m => m.contains("MERGE INTO is deliberately") &&
      m.contains("merge_cdc")), em.getMessage)
    // the refusals mutated nothing; DELETE keeps its metadata-only path
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE s = 'x'")
      .collect()(0).getLong(0) == 0L)
    spark.sql(s"DELETE FROM $t WHERE id >= 30000")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0)
      == 20L)
  }

  test("CDC upsert is SQL-addressable: CALL init_doc_store + merge_cdc (r15, VERDICT r14 #2)") {
    useCatalog()
    val store = graft.TempRoots.path("sql_only_cdc_store")

    // the corpus and the change batch are temp views — the SQL-only
    // user's staging surface
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cdc_docs AS
        |SELECT id AS doc_id, concat('text ', id) AS text,
        |  CAST(id % 100 AS BIGINT) AS n_chars
        |FROM range(0, 200)""".stripMargin)
    val init = spark.sql(
      s"CALL graft.init_doc_store('$store', 'cdc_docs', 4)").collect()(0)
    assert(init.getAs[Long]("n_rows") == 200L &&
      init.getAs[Int]("n_buckets") == 4, init)

    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cdc_changes AS
        |SELECT doc_id, concat(text, ' v2') AS text, n_chars, 'upsert' AS op
        |FROM cdc_docs WHERE doc_id % 10 = 0
        |UNION ALL
        |SELECT doc_id + 1000, concat('new ', text), n_chars, 'upsert'
        |FROM cdc_docs WHERE doc_id % 50 = 1
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS STRING), CAST(NULL AS BIGINT), 'delete'
        |FROM cdc_docs WHERE doc_id % 10 = 3""".stripMargin)
    val rep = spark.sql(
      s"CALL graft.merge_cdc('$store', 'cdc_changes', 4)").collect()(0)
    assert(rep.getAs[Long]("n_upserts") == 24L &&
      rep.getAs[Long]("n_deletes") == 20L, rep)

    // merged content: 200 − 20 deletes + 4 inserts; updates in place
    val m = spark.sql(
      s"""SELECT count(*) AS n,
         |  sum(CASE WHEN text LIKE '% v2' THEN 1 ELSE 0 END) AS upd,
         |  sum(CASE WHEN doc_id >= 1000 THEN 1 ELSE 0 END) AS ins,
         |  sum(CASE WHEN doc_id % 10 = 3 AND doc_id < 1000
         |    THEN 1 ELSE 0 END) AS del_left
         |FROM parquet.`$store`""".stripMargin).collect()(0)
    assert(m.getAs[Long]("n") == 184L, m)
    assert(m.getAs[Long]("upd") == 20L && m.getAs[Long]("ins") == 4L &&
      m.getAs[Long]("del_left") == 0L, m)

    // replay the SAME batch: upserts are by-id overwrites, deletes of
    // absent ids are no-ops — content unchanged (the mergeCdc contract,
    // now through the CALL surface)
    spark.sql(s"CALL graft.merge_cdc('$store', 'cdc_changes', 4)").collect()
    assert(spark.sql(s"SELECT count(*) FROM parquet.`$store`")
      .collect()(0).getLong(0) == 184L)

    // a conflicting batch (two rows for one doc_id) fails with the
    // op's own named message — the procedure layer adds no laundering
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cdc_conflict AS
        |SELECT CAST(5 AS BIGINT) AS doc_id, 'a' AS text,
        |  CAST(1 AS BIGINT) AS n_chars, 'upsert' AS op
        |UNION ALL
        |SELECT CAST(5 AS BIGINT), 'b', CAST(2 AS BIGINT), 'delete'"""
        .stripMargin)
    val e = intercept[Exception](spark.sql(
      s"CALL graft.merge_cdc('$store', 'cdc_conflict', 4)").collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("conflicting rows for the same doc_id"))), e.getMessage)

    // an unknown source view is loud at resolution, not a silent no-op
    val e2 = intercept[Exception](spark.sql(
      s"CALL graft.merge_cdc('$store', 'no_such_view_xyz', 4)").collect())
    assert(e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e2.getMessage.toLowerCase.contains("not found"), e2.getMessage)

    // re-INIT from a smaller source under a session-wide DYNAMIC
    // overwrite default must truncate the whole store (the r12
    // full-replacement rule, now reachable from foreign sessions via
    // CALL — self-review r15: a dynamic default used to keep stale
    // bucket dirs whose doc_ids hash elsewhere)
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(
        """CREATE OR REPLACE TEMP VIEW cdc_small AS
          |SELECT CAST(0 AS BIGINT) AS doc_id, 'only' AS text,
          |  CAST(4 AS BIGINT) AS n_chars""".stripMargin)
      spark.sql(s"CALL graft.init_doc_store('$store', 'cdc_small', 4)")
        .collect()
      assert(spark.sql(s"SELECT count(*) FROM parquet.`$store`")
        .collect()(0).getLong(0) == 1L,
        "re-init under a dynamic session default kept stale buckets")
    } finally prevMode match {
      case Some(m) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
