package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Metadata-only SQL DELETE ([[JsonDocDelete]]): whole-file removals
  * under zone proofs, loud refusal on anything undecided, marker
  * atomicity, lease participation, and history tombstones. */
class JsonDocDeleteSpec extends SparkTestBase {


  /** Files split by an id range rule so range predicates are decidable:
    * f000 holds ids 0-9, f001 ids 10-19, f002 ids 20-29. */
  private def rangedTable(name: String): String = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs()
    (0 until 3).foreach { f =>
      val w = new java.io.PrintWriter(new java.io.File(dir, f"f$f%03d.json"))
      (0 until 10).foreach(j =>
        w.println(s"""{"id": ${f * 10 + j}, "s": "v${f * 10 + j}"}"""))
      w.close()
    }
    dir.toString
  }

  test("DELETE removes exactly the provably-all-match files; rows and marker protocol intact") {
    useCatalog()
    val dir = rangedTable("jd_delete_basic")
    JsonMeta.save(spark, dir) // history: the delete must mint tombstones
    val savesBefore = JsonMeta.saves(spark, dir)
    val n = spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10")
    n.collect() // execute
    val ids = spark.read.format("graftjson").option("refresh", "true")
      .load(dir).select(col("id")).collect()
      .map(_.getAs[Number](0).longValue).sorted.toSeq
    assert(ids == (10L until 30L), s"wrong survivors: $ids")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.getName).sorted.toSeq
    assert(files == Seq("f001.json", "f002.json"), files)
    // no marker, no lease left behind
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(JsonCompact.readMarker(fs, root).isEmpty)
    assert(!fs.exists(JsonLease.leasePath(root)))
    // the removal is HISTORY: a new save id exists, and the pre-delete
    // save fails with the named bytes-gone error, never wrong rows
    val savesAfter = JsonMeta.saves(spark, dir)
    assert(savesAfter.size == savesBefore.size + 1, s"$savesBefore -> $savesAfter")
    val e = intercept[IllegalStateException](
      spark.read.format("graftjson")
        .option("asOfSave", savesBefore.last.toString).load(dir).count())
    assert(e.getMessage.contains("physically removed"), e.getMessage)
    // as-of the post-delete save resolves the survivors
    assert(spark.read.format("graftjson")
      .option("asOfSave", savesAfter.last.toString).load(dir)
      .count() == 20L)
  }

  test("an undecidable predicate fails LOUDLY and removes nothing; boundary predicates decide correctly") {
    useCatalog()
    val dir = rangedTable("jd_delete_undecided")
    // 'id < 15' splits f001 — one undecided file fails the statement
    val e = intercept[Exception](
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 15").collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("PROVABLY decided") ||
      m.toLowerCase.contains("cannot delete")), chain(e).mkString(" | "))
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 30L, "a refused DELETE removed rows")
    // an exact boundary decides: every file is all-match or empty
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 20").collect()
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 20L)
    // equality on the id-set proof: f001 holds exactly ids 10..19 —
    // IN over a superset is all-match there, empty elsewhere
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id IN (${(10 to 19).mkString(",")})").collect()
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).select(col("id")).collect()
      .map(_.getAs[Number](0).longValue).sorted.toSeq == (0L until 10L))
  }

  test("DELETE respects the writer lease and refuses snapshots and whole mode") {
    useCatalog()
    val dir = rangedTable("jd_delete_lease")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val h = JsonLease.acquire(fs, root, "maintenance")
    val e = intercept[Exception](
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10").collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("locked by a concurrent")),
      chain(e).mkString(" | "))
    h.release()
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 30L,
      "a lease-refused DELETE removed rows")
    // and after the lease clears, the same statement succeeds
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10").collect()
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 20L)
  }

  test("constant-folded WHERE legs: FALSE is a decided no-op, TRUE-only refuses (bare truncate)") {
    useCatalog()
    val dir = rangedTable("jd_delete_folded")
    // the engine folds an out-of-range literal over the narrow inferred
    // type (id: 0..29 ⇒ tinyint/smallint) to FALSE before translating —
    // the statement provably matches nothing and must succeed unchanged
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id >= 1000000").collect()
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 30L)
    import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue}
    assert(JsonDocDelete.decide(spark, dir, Seq(new AlwaysFalse))
      .contains(Seq.empty))
    // a conjunction of only TRUE legs is the bare truncate — refuse,
    // overwrite owns that verb
    assert(JsonDocDelete.decide(spark, dir, Seq(new AlwaysTrue)).isEmpty)
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 30L)
  }
}
