package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native DSv2 write path (`df.write.format("graftjson")` and the
  * streaming sink): value round-trips under the reference's
  * schema-on-read classifier, marker-protocol atomicity for batch
  * commits, deterministic epoch republication for streaming, and the
  * planning-time rejection gates. */
class JsonDocWriteSpec extends SparkTestBase {

  private def mkDirPath(name: String): String = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs(); dir.toString
  }
  private def freshPath(name: String): String =
    graft.TempRoots.path(name) // NOT created — the write must cope
  private def visible(dir: String): Seq[String] =
    JsonDocSource.listFiles(spark, Seq(dir)).map(_._1)
  private def readBack(dir: String) =
    spark.read.format("graftjson").load(dir)

  test("batch write to a not-yet-existing dir; values round-trip re-inference") {
    import spark.implicits._
    val dir = freshPath("jw_roundtrip")
    val df = Seq(
      (1000000007L, "alpha", true, BigDecimal("123.450"),
        Seq(1, 2, 3), ("x", 42L),
        Array[Byte](0x00, 0x7f, -1),
        java.sql.Timestamp.valueOf("2024-03-05 10:11:12"),
        java.sql.Date.valueOf("2024-03-05"),
        Map("k1" -> 7, "k2" -> 9)),
      (2000000011L, "beta", false, BigDecimal("-0.125"),
        Seq(4), ("y", 43L),
        Array[Byte](0x10, 0x20),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59"),
        java.sql.Date.valueOf("1999-12-31"),
        Map("k1" -> 8))
    ).toDF("id", "s", "b", "dec", "arr", "st", "bin", "ts", "dt", "m")
    df.write.format("graftjson").mode("append").save(dir)

    val back = readBack(dir)
    // ids are 10-digit longs → re-infer bigint; array elements are
    // small → byte; struct/map become structs; decimal re-infers with
    // value-derived precision; binary/timestamp re-infer through the
    // classifier's string shapes
    val got = back.select(
      col("id").cast("long"), col("s"), col("b"),
      col("dec").cast("decimal(10,3)"),
      col("arr").cast("array<int>"),
      col("st._1").cast("string"), col("st._2").cast("long"),
      hex(col("bin")).as("binhex"),
      col("ts"), col("dt").cast("string"),
      col("m.k1").cast("int"), col("m.k2").cast("int"))
      .collect().map(r => r.toSeq.map {
        case s: Seq[_] => s.toList
        case v => v
      }).sortBy(_.head.toString)
    assert(got === Array(
      Seq(1000000007L, "alpha", true, new java.math.BigDecimal("123.450"),
        List(1, 2, 3), "x", 42L, "007FFF",
        java.sql.Timestamp.valueOf("2024-03-05 10:11:12"), "2024-03-05",
        7, 9),
      Seq(2000000011L, "beta", false, new java.math.BigDecimal("-0.125"),
        List(4), "y", 43L, "1020",
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59"), "1999-12-31",
        8, null)).sortBy(_.head.toString))
    // the struct field names survive (st.a / st.b), map keys become
    // struct fields — both asserted by the selects above resolving
  }

  test("null fields are omitted; array nulls kept; rendering is canonical") {
    import spark.implicits._
    val dir = freshPath("jw_nulls")
    val df = Seq(
      (1L, Option("x"), Seq(Option(1), None, Option(3))),
      (2L, None: Option[String], Seq(Option(4)))
    ).toDF("id", "s", "arr")
    df.coalesce(1).write.format("graftjson").mode("append").save(dir)
    val files = visible(dir)
    assert(files.size == 1)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(files.head).getPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = text.split("\n").toSeq.sortBy(_.length)
    assert(lines == Seq(
      """{"id":2,"arr":[4]}""",
      """{"id":1,"s":"x","arr":[1,null,3]}""").sortBy(_.length))
  }

  test("append accumulates; overwrite truncates atomically (gz decoys too)") {
    import spark.implicits._
    val dir = mkDirPath("jw_modes")
    // a pre-existing .gz data file — overwrite must remove it as well
    val gzf = new java.io.File(dir, "old.json.gz")
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gzf))
    gz.write("""{"id": 900, "s": "gz"}""".getBytes("UTF-8")); gz.close()

    Seq((1L, "a")).toDF("id", "s")
      .write.format("graftjson").mode("append").save(dir)
    Seq((2L, "b")).toDF("id", "s")
      .write.format("graftjson").mode("append").save(dir)
    assert(readBack(dir).select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 900L))

    Seq((10L, "z"), (11L, "y")).toDF("id", "s")
      .write.format("graftjson").mode("overwrite").save(dir)
    assert(readBack(dir).select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))
    assert(!gzf.exists, "overwrite must remove pre-existing data files")
    // a clean commit leaves no marker and no staging debris
    assert(!new java.io.File(dir, "_compaction/commit").exists)
    val stage = new java.io.File(dir, "_compaction")
    assert(!stage.exists || stage.listFiles().isEmpty)
  }

  test("batch crash window: rows visible from the marker alone; roll-forward idempotent") {
    val dir = mkDirPath("jw_crash")
    val put = (f: String, s: String) => {
      val w = new java.io.FileWriter(new java.io.File(dir, f))
      w.write(s); w.close()
    }
    put("orig.json", """{"id": 1, "s": "old"}""" + "\n")
    // stage a write-task file by hand (the writer class the real path
    // uses), then write the marker — the commit's crash point AFTER
    // the marker rename but BEFORE roll-forward
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val conf = spark.sparkContext.hadoopConfiguration
    val w = new NdjsonDataWriter(new Path(dir, "_compaction").toString,
      "write-test-p00000-t0.json", 0, schema, conf)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
      .createSerializer()
    w.write(enc(Row(2L, "new")).copy())
    w.commit()
    val fs = new Path(dir).getFileSystem(conf)
    JsonCompact.writeMarker(fs, new Path(dir), JsonCompact.Marker(
      Seq("write-test-p00000-t0.json" -> "part-test-p00000.json"),
      Seq("orig.json")))
    // reader applies the pending marker: new row visible, old hidden
    def ids() = readBack(dir).select(col("id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids() == Seq(2L))
    assert(JsonCompact.rollForward(spark, dir))
    assert(ids() == Seq(2L))
    assert(!JsonCompact.rollForward(spark, dir)) // idempotent, no marker
    assert(new java.io.File(dir, "part-test-p00000.json").exists)
    assert(!new java.io.File(dir, "orig.json").exists)
  }

  test("speculative loser staged files are swept by commit; winner published") {
    val dir = mkDirPath("jw_spec")
    val schema = StructType(Seq(StructField("id", LongType)))
    val conf = spark.sparkContext.hadoopConfiguration
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
      .createSerializer()
    val stage = new Path(dir, "_compaction").toString
    def attempt(tid: Long, v: Long): StagedNdjsonFile = {
      val w = new NdjsonDataWriter(stage,
        JsonDocWrite.stagedBatchName("tag0", 0, tid), 0, schema, conf)
      w.write(enc(Row(v)).copy())
      w.commit().asInstanceOf[StagedNdjsonFile]
    }
    val winner = attempt(0L, 1L)
    attempt(1L, 999L) // speculative twin — never reaches the driver
    new JsonDocBatchWrite(dir, schema, "tag0", overwrite = false,
      refreshMeta = false).commit(Array(winner))
    assert(readBack(dir).select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    val stageDir = new java.io.File(dir, "_compaction")
    assert(!stageDir.exists || stageDir.listFiles().isEmpty,
      "losing attempt's staged file must be swept")
  }

  test("streaming sink: exactly-once across restart; epoch replay owns its namespace") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = freshPath("jw_sink")
    val ckpt = graft.TempRoots.path("jw_sink_ckpt")
    val ms = MemoryStream[(Long, String)]
    def drain(): Unit = {
      val q = ms.toDF().toDF("id", "s").writeStream
        .format("graftjson")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ms.addData((1L, "a"), (2L, "b"))
    drain()
    ms.addData((3L, "c"))
    drain() // cold restart against the same checkpoint
    assert(readBack(dir).select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))

    // epoch replay: a second commit of the SAME epoch must sweep the
    // first publication's files (partitioning drift included)
    val schema = StructType(Seq(StructField("id", LongType)))
    val conf = spark.sparkContext.hadoopConfiguration
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
      .createSerializer()
    val stage = new Path(dir, "_compaction").toString
    val sw = new JsonDocStreamingWrite(dir, schema, "tagS",
      refreshMeta = false)
    def stagedMsg(epoch: Long, pid: Int, vs: Seq[Long]): StagedNdjsonFile = {
      val w = new NdjsonDataWriter(stage,
        JsonDocWrite.stagedStreamName("tagS", epoch, pid, 0L), pid, schema,
        conf)
      vs.foreach(v => w.write(enc(Row(v)).copy()))
      w.commit().asInstanceOf[StagedNdjsonFile]
    }
    // first attempt: two partitions
    sw.commit(77L, Array(stagedMsg(77L, 0, Seq(100L)),
      stagedMsg(77L, 1, Seq(101L))))
    // replay of epoch 77 with ONE partition — the two old files go
    sw.commit(77L, Array(stagedMsg(77L, 0, Seq(100L, 101L))))
    val e77 = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("epoch-000077-s")).toSeq
    assert(e77 == Seq("epoch-000077-s00000.json"))
    assert(readBack(dir).select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 100L, 101L))

    // content-identical replay KEEPS the published bytes (r14): an
    // overwrite would bump the mtime and drift the file out of every
    // historical save's fingerprint. Age the file so a rewrite is
    // mtime-visible even on coarse clocks.
    val pub = new java.io.File(dir, "epoch-000077-s00000.json")
    assert(pub.setLastModified(System.currentTimeMillis() - 60000))
    val aged = pub.lastModified()
    sw.commit(77L, Array(stagedMsg(77L, 0, Seq(100L, 101L))))
    assert(pub.lastModified() == aged,
      "identical sink replay rewrote the published epoch file")
    // changed content still REPLACES (and the rows update)
    sw.commit(77L, Array(stagedMsg(77L, 0, Seq(100L, 102L))))
    assert(pub.lastModified() != aged,
      "changed-content sink replay kept stale bytes")
    assert(readBack(dir).select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 100L, 102L))
  }

  test("planning-time rejections: whole tables, globs, non-renderable schemas, read-after-mismatch") {
    import spark.implicits._
    val dir = mkDirPath("jw_reject")
    Seq((1L, "a")).toDF("id", "s")
      .write.format("graftjson").mode("append").save(dir)

    val whole = intercept[Exception] {
      Seq((2L, "b")).toDF("id", "s").write.format("graftjson")
        .option("whole", "true").mode("append").save(dir)
    }
    assert(whole.getMessage.contains("whole"))

    val glob = intercept[Exception] {
      Seq((2L, "b")).toDF("id", "s").write.format("graftjson")
        .mode("append").save(graft.TempRoots.path("jw_rej_*"))
    }
    assert(glob.getMessage.contains("glob"))

    val badSchema = intercept[Exception] {
      Seq((1L, new java.math.BigDecimal(1))).toDF("id", "d")
        .select(col("id"), lit(null).cast("interval day").as("iv"))
        .write.format("graftjson").mode("append").save(dir)
    }
    assert(badSchema.getMessage.contains("non-JSON-renderable"))

    // a mismatched user READ schema still raises the strict message
    val mismatch = intercept[Exception] {
      spark.read.format("graftjson")
        .schema(StructType(Seq(StructField("nope", LongType))))
        .load(dir).collect()
    }
    assert(mismatch.getMessage.contains("must match the inferred schema"))
  }

  test("refreshMeta=true makes the next fresh-JVM-equivalent load walk-free") {
    import spark.implicits._
    val dir = freshPath("jw_meta")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graftjson").mode("append")
      .option("refreshMeta", "true").save(dir)
    assert(new java.io.File(dir, JsonMeta.MetaDirName).exists)
    JsonDocSource.clearInferCache()
    val before = JsonDocSource.filesWalked.get
    assert(readBack(dir).count() == 2)
    assert(JsonDocSource.filesWalked.get == before,
      "durable meta must serve planning without a walk")
  }

  test("refreshMeta captures planning stats AT WRITE TIME: zero read-back, walk parity") {
    import spark.implicits._
    val dir = freshPath("jw_capture")
    // exercise the capture across value classes the walkers care
    // about: integrals, plain strings, decimals, nulls (omitted
    // fields), and a nested struct
    val df = Seq(
      (1L, "alpha", Some(BigDecimal("2.75")), Some(("x", 5L))),
      (2L, "beta", None, None),
      (900L, "gamma", Some(BigDecimal("0.25")), Some(("y", 7L))))
      .toDF("id", "s", "dec", "meta")
    val walked0 = JsonDocSource.filesWalked.get
    df.repartition(2).write.format("graftjson").mode("append")
      .option("refreshMeta", "true").save(dir)
    // the commit's meta refresh was fed by the writers' own folds —
    // NOT a read-back walk of the files just written
    assert(JsonDocSource.filesWalked.get == walked0,
      "refreshMeta write must not re-read what it just wrote")
    // parity: the captured entries must be byte-identical to a forced
    // re-walk (same HType, doc counts, and zones per file)
    val (fromCapture, _) = JsonDocSource.inferPerFile(
      Seq(dir), whole = false, refresh = false, zonemaps = true)
    assert(JsonDocSource.filesWalked.get == walked0) // still no walk
    val (reWalked, _) = JsonDocSource.inferPerFile(
      Seq(dir), whole = false, refresh = true, zonemaps = true)
    assert(JsonDocSource.filesWalked.get > walked0) // the control DID walk
    assert(fromCapture.toMap == reWalked.toMap,
      s"write-time capture diverged from the walk:\n" +
        s"  captured: $fromCapture\n  walked:   $reWalked")
    // and a fresh-JVM-equivalent load still plans walk-free
    JsonDocSource.clearInferCache()
    val before = JsonDocSource.filesWalked.get
    assert(readBack(dir).count() == 3)
    assert(JsonDocSource.filesWalked.get == before)
  }

  test("clusterBy write: engine-planned range exchange makes zones selective from birth") {
    import spark.implicits._
    val dir = freshPath("jw_cluster")
    // ids shuffled across partitions — an unclustered write would give
    // every file the full key range (nothing prunable)
    val df = spark.createDataset(scala.util.Random.shuffle((1 to 400).toList))
      .toDF("id").repartition(4)
    df.write.format("graftjson").mode("append")
      .option("clusterBy", "id")
      .option("clusterPartitions", "4") // exact ranges (AQE would coalesce KBs)
      .save(dir)
    val files = visible(dir)
    assert(files.size > 1, s"need several files to prove clustering: $files")
    // each file covers a tight range: a point probe must skip all but one
    val z = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir)
    val before = JsonDocSource.zoneSkippedFiles.get
    assert(z.where(col("id") === 5).count() == 1L)
    val skipped = JsonDocSource.zoneSkippedFiles.get - before
    // planInputPartitions can run more than once per query (AQE
    // re-plan) — each planning pass must skip all but one file
    assert(skipped >= files.size - 1 && skipped % (files.size - 1) == 0,
      s"a clustered point probe must read exactly one file (skips=$skipped)")
    // values survived the exchange + sort intact
    assert(z.agg(sum(col("id").cast("bigint"))).collect()(0).getLong(0) ==
      (1 to 400).map(_.toLong).sum)
  }

  test("empty partitions stage nothing; empty overwrite truncates to empty") {
    import spark.implicits._
    val dir = freshPath("jw_empty")
    Seq((1L, "a")).toDF("id", "s").repartition(8)
      .write.format("graftjson").mode("append").save(dir)
    assert(visible(dir).size == 1, "7 empty partitions must stage no files")
    spark.emptyDataset[(Long, String)].toDF("id", "s")
      .write.format("graftjson").mode("overwrite").save(dir)
    assert(visible(dir).isEmpty)
  }
}
