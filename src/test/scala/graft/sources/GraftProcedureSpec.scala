package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SQL-callable maintenance ([[GraftProcedures]], SPARK-44167): every
  * verb must resolve through `CALL graft.<verb>(...)`, run the SAME
  * lease-held op as the Scala API, and hand its summary report back as
  * the statement's result rows. */
class GraftProcedureSpec extends SparkTestBase {


  private def writeBatch(dir: String, from: Long, until: Long,
                         refreshMeta: Boolean = true): Unit =
    spark.range(from, until)
      .select(col("id"), concat(lit("d"), col("id")).as("s"))
      .coalesce(1)
      .write.format("graftjson").mode("append")
      .option("refreshMeta", refreshMeta.toString).save(dir)

  test("SHOW PROCEDURES lists the maintenance verbs") {
    useCatalog()
    val names = spark.sql("SHOW PROCEDURES IN graft")
      .collect().map(_.toString().toLowerCase)
    for (p <- Seq("compact", "recluster", "zorder", "vacuum", "save",
      "history", "changes", "init_doc_store", "merge_cdc"))
      assert(names.exists(_.contains(p)), s"$p missing in ${names.toSeq}")
  }

  test("CALL changes lists per-save file adds AND deletes since a save — the SQL side-batch of the change feed (r16)") {
    useCatalog()
    val dir = graft.TempRoots.path("proc_changes")
    writeBatch(dir, 0, 5) // save 1 (refreshMeta=true mints it)
    val s1 = graft.sources.JsonMeta.saves(spark, dir).last
    writeBatch(dir, 5, 9) // save 2: an add
    // save 3: a metadata-only SQL DELETE removes the FIRST batch's
    // file whole (ids 0-4 all match id <= 4) and mints the tombstone
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id <= 4")
    val rows = spark.sql(s"CALL graft.changes('$dir', $s1)").collect()
    val dels = rows.filter(_.getAs[String]("change_type") == "delete")
    val ins = rows.filter(_.getAs[String]("change_type") == "insert")
    assert(dels.length == 1 && ins.length == 1, rows.mkString(";"))
    assert(dels.head.getAs[Long]("save_id") > ins.head.getAs[Long]("save_id"))
    assert(dels.head.isNullAt(dels.head.fieldIndex("len")))
    // the insert carries the live fingerprint; the delete names the
    // dead file — applying both over the held save-1 state mirrors
    // the live table (one file, ids 5-8)
    assert(ins.head.getAs[Long]("len") > 0L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir`")
      .collect()(0).getLong(0) == 4L)
    // a since at the head is an empty feed, not an error
    val head = graft.sources.JsonMeta.saves(spark, dir).last
    assert(spark.sql(s"CALL graft.changes('$dir', $head)").collect().isEmpty)
    // below the squash/retention horizon: the resolver's own named error
    spark.sql(s"CALL graft.vacuum('$dir', 1)")
    val e = intercept[Exception](
      spark.sql(s"CALL graft.changes('$dir', $s1)").collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("vacuum retention") ||
          m.contains("no longer reconstructible"))), e.getMessage)
  }

  test("CALL save mints a time-travel point from SQL; unchanged tables mint nothing (r15)") {
    useCatalog()
    val dir = graft.TempRoots.path("proc_save")
    writeBatch(dir, 0, 10, refreshMeta = false)
    val r1 = spark.sql(s"CALL graft.save('$dir')").collect()(0)
    assert(r1.getAs[Long]("save_id") > 0 &&
      r1.getAs[Int]("total_files") >= 1 &&
      r1.getAs[Int]("written") >= 1, r1)
    // the SQL-only history loop closes: the minted save serves
    // VERSION AS OF immediately
    val asOf = spark.sql(
      s"SELECT count(*) FROM graft.`$dir` VERSION AS OF " +
        r1.getAs[Long]("save_id")).collect()(0).getLong(0)
    assert(asOf == 10L)
    // an unchanged table is a no-op save: ∝-diff, no new save id
    val r2 = spark.sql(s"CALL graft.save('$dir')").collect()(0)
    assert(r2.getAs[Long]("save_id") == -1L &&
      r2.getAs[Int]("written") == 0, r2)
    // a real diff mints the next id
    writeBatch(dir, 10, 15, refreshMeta = false)
    val r3 = spark.sql(s"CALL graft.save('$dir')").collect()(0)
    assert(r3.getAs[Long]("save_id") == r1.getAs[Long]("save_id") + 1 &&
      r3.getAs[Int]("written") >= 1, r3)
  }

  test("CALL compact merges small files under defaulted params and returns its report row") {
    useCatalog()
    val dir = graft.TempRoots.path("proc_compact")
    writeBatch(dir, 0, 10); writeBatch(dir, 10, 20); writeBatch(dir, 20, 30)
    val before = JsonDocSource.listFiles(spark, Seq(dir)).size
    assert(before >= 3)
    // positional dir only — target_bytes and refresh_meta come from
    // the declared defaults
    val row = spark.sql(s"CALL graft.compact('$dir')").collect()
    assert(row.length == 1, row.toSeq)
    val merged = row(0).getAs[Int]("merged_files")
    val into = row(0).getAs[Int]("merged_into")
    assert(merged == before && into == 1, row(0).toString)
    // content survives the rewrite verbatim
    val back = spark.read.format("graftjson").load(dir)
    assert(back.count() == 30L)
    assert(JsonDocSource.listFiles(spark, Seq(dir)).size == 1)
  }

  test("CALL zorder with named args rewrites the layout and keeps the unit multiset") {
    useCatalog()
    val dir = graft.TempRoots.path("proc_zorder")
    writeBatch(dir, 0, 50); writeBatch(dir, 50, 100)
    val row = spark.sql(
      s"CALL graft.zorder('$dir', by_a => 'id', by_b => 's', " +
        "target_bytes => 512, refresh_meta => true)").collect()
    assert(row.length == 1)
    assert(row(0).getAs[Int]("written_files") >= 2, row(0).toString)
    val back = spark.read.format("graftjson").load(dir)
    assert(back.count() == 100L)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0) == 4950L)
  }

  test("CALL history lists save ids; CALL vacuum prunes below a NAMED horizon") {
    useCatalog()
    val dir = graft.TempRoots.path("proc_vacuum")
    writeBatch(dir, 0, 5); writeBatch(dir, 5, 10); writeBatch(dir, 10, 15)
    val saves = JsonMeta.saves(spark, dir)
    assert(saves.size == 3)
    val hist = spark.sql(s"CALL graft.history('$dir')")
      .collect().map(_.getLong(0)).toSeq
    assert(hist == saves, s"$hist vs $saves")
    val v = spark.sql(s"CALL graft.vacuum('$dir', retain_saves => 1)")
      .collect()(0)
    assert(v.getAs[Long]("horizon") == saves.last)
    assert(v.getAs[Int]("retained_saves") == 1)
    // the pruned save fails with the retention message, not wrong rows
    val e = intercept[Exception](
      spark.read.format("graftjson")
        .option("asOfSave", saves.head.toString).load(dir).count())
    assert(e.getMessage.contains("vacuum retention"), e.getMessage)
    // the horizon save still reads
    assert(spark.read.format("graftjson")
      .option("asOfSave", saves.last.toString).load(dir).count() == 15L)
  }

  test("DESCRIBE PROCEDURE surfaces the verb's description") {
    useCatalog()
    val d = spark.sql("DESCRIBE PROCEDURE graft.vacuum")
      .collect().map(_.toString()).mkString("\n")
    assert(d.contains("vacuum"), d)
    assert(d.toLowerCase.contains("retain"), d)
  }

  test("CALL against a table whose writer lease is held fails loudly, mutating nothing") {
    useCatalog()
    val dir = graft.TempRoots.path("proc_leased")
    writeBatch(dir, 0, 20)
    val before = JsonDocSource.listFiles(spark, Seq(dir))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val held = JsonLease.acquire(fs, root, "spec-holder")
    try {
      val e = intercept[Exception](spark.sql(s"CALL graft.compact('$dir')"))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("lease") || msgs.contains("spec-holder"), msgs)
      assert(JsonDocSource.listFiles(spark, Seq(dir)) == before)
    } finally held.release()
    // released → the same CALL succeeds
    assert(spark.sql(s"CALL graft.compact('$dir')").collect().length == 1)
  }

  test("unknown procedures and namespaced lookups fail loudly") {
    useCatalog()
    // the engine wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE;
    // the catalog's named message rides the cause chain
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e1 = intercept[Exception](spark.sql("CALL graft.optimize('/tmp/x')"))
    assert(messages(e1).contains("unknown procedure"), messages(e1))
    val e2 = intercept[Exception](spark.sql("CALL graft.sys.compact('/tmp/x')"))
    assert(messages(e2).contains("no procedure namespace"), messages(e2))
    // the LISTING surface agrees with the lookup surface: a namespaced
    // SHOW PROCEDURES is loud, never an empty "no verbs here" result
    val e3 = intercept[Exception](
      spark.sql("SHOW PROCEDURES IN graft.sys").collect())
    // NoSuchNamespaceException renders as the engine's SCHEMA_NOT_FOUND
    assert(messages(e3).toLowerCase.contains("schema `sys` cannot be found"),
      messages(e3))
  }
}
