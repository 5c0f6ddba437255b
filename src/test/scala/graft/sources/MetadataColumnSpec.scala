package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The `_file` metadata column (r15): row provenance through Spark's
  * DSv2 SupportsMetadataColumns — hidden until selected, appended as a
  * per-partition constant (the data reader untouched, so every
  * pruning/pushdown contract holds), shadowed by a data field of the
  * same name, available on batch, whole-mode, streaming, and SQL
  * catalog reads. */
class MetadataColumnSpec extends SparkTestBase {

  private def mkDir(name: String): java.io.File = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs(); dir
  }
  private def put(dir: java.io.File, file: String, text: String): Unit = {
    val w = new java.io.FileWriter(new java.io.File(dir, file))
    w.write(text); w.close()
  }

  test("_file attributes every row to its source file; hidden from SELECT *") {
    val dir = mkDir("metacol_basic")
    put(dir, "a.json", """{"id": 1}""" + "\n" + """{"id": 2}""" + "\n")
    put(dir, "b.json", """{"id": 3}""" + "\n")
    val t = spark.read.format("graftjson").load(dir.toString)
    // hidden until selected
    assert(t.columns.toSeq == Seq("id"))
    val got = t.select(col("id"), col("_file"))
      .collect().map(r => r.getAs[Number]("id").longValue ->
        r.getAs[String]("_file").split('/').last).toMap
    assert(got == Map(1L -> "a.json", 2L -> "a.json", 3L -> "b.json"), got)
    // provenance-only projection (data columns fully pruned away)
    val perFile = t.select(col("_file")).groupBy(col("_file")).count()
      .collect().map(r => r.getString(0).split('/').last -> r.getLong(1))
      .toMap
    assert(perFile == Map("a.json" -> 2L, "b.json" -> 1L), perFile)
    // engine-side residual filter over the metadata value
    assert(t.select(col("id"), col("_file"))
      .where(col("_file").endsWith("b.json")).count() == 1L)
  }

  test("_file on whole-mode and split reads: one name per document; every split of a big file agrees") {
    val dirW = mkDir("metacol_whole")
    put(dirW, "d1.json", """{"id": 1, "tags": ["x"]}""")
    put(dirW, "d2.json", """{"id": 2, "tags": []}""")
    val w = spark.read.format("graftjson").option("whole", "true")
      .load(dirW.toString)
    val names = w.select(col("_file")).collect()
      .map(_.getString(0).split('/').last).sorted.toSeq
    assert(names == Seq("d1.json", "d2.json"), names)

    val dirB = mkDir("metacol_split")
    val line = s"""{"id": 1, "s": "${"x" * 100}"}\n"""
    val big = new java.io.FileWriter(new java.io.File(dirB, "big.json"))
    (1 to 30000).foreach(_ => big.write(line)); big.close()
    val b = spark.read.format("graftjson")
      .option("maxSplitBytes", (1L << 20).toString).load(dirB.toString)
    val attributed = b.select(col("_file")).distinct().collect()
      .map(_.getString(0).split('/').last).toSeq
    assert(attributed == Seq("big.json"), attributed)
    assert(b.count() == 30000L)
  }

  test("a DATA field named _file shadows the metadata column") {
    val dir = mkDir("metacol_shadow")
    put(dir, "a.json", """{"id": 1, "_file": "payload"}""" + "\n")
    val t = spark.read.format("graftjson").load(dir.toString)
    // the data column is part of the schema and serves its own value
    assert(t.columns.toSeq.contains("_file"))
    assert(t.select(col("_file")).collect().map(_.getString(0)).toSeq
      == Seq("payload"))
  }

  test("_file over time travel: provenance of a pinned snapshot") {
    val dir = mkDir("metacol_asof")
    put(dir, "e0.json", """{"id": 1}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e1.json", """{"id": 2}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    val saves = JsonMeta.saves(spark, dir.toString)
    val got = spark.read.format("graftjson")
      .option("asOfSave", saves.head.toString).load(dir.toString)
      .select(col("id"), col("_file")).collect()
      .map(r => r.getAs[Number]("id").longValue ->
        r.getAs[String]("_file").split('/').last).toMap
    // the snapshot's population only — attributed to its own file
    assert(got == Map(1L -> "e0.json"), got)
  }

  test("_file through SQL catalog reads and the streaming source") {
    useCatalog()
    val dir = mkDir("metacol_sql")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    val rows = spark.sql(
      s"SELECT _file, count(*) AS n FROM graft.`$dir` GROUP BY _file " +
        "ORDER BY _file")
      .collect().map(r => r.getString(0).split('/').last -> r.getLong(1))
      .toSeq
    assert(rows == Seq("e0.json" -> 1L, "e1.json" -> 1L), rows)

    val q = spark.readStream.format("graftjson").load(dir.toString)
      .select(col("id"), col("_file"))
      .writeStream.format("memory").queryName("metacol_stream")
      .option("checkpointLocation", graft.TempRoots.path("metacol_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("metacol_stream").collect()
        .map(r => r.getAs[Number]("id").longValue ->
          r.getAs[String]("_file").split('/').last).toMap
      assert(got == Map(1L -> "e0.json", 2L -> "e1.json"), got)
    } finally q.stop()
  }
}
