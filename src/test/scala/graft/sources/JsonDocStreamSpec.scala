package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `spark.readStream.format("graftjson")` — the native micro-batch
  * source: stream == batch row parity, incremental pickup, diff-grain
  * offset logs, admission control, restart recovery from the orphan-
  * log crash window, and fail-loud append-only violations. */
class JsonDocStreamSpec extends SparkTestBase {

  private def mkDir(name: String): java.io.File = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs(); dir
  }
  private def put(dir: java.io.File, file: String, text: String): Unit = {
    val w = new java.io.FileWriter(new java.io.File(dir, file))
    w.write(text); w.close()
  }

  test("stream == batch; late files arrive incrementally, each row exactly once") {
    val dir = mkDir("gjs_basic")
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n" +
      """{"id": 2, "s": "y"}""" + "\n")
    put(dir, "b.json", """{"id": 3, "s": "z"}""" + "\n")
    val q = spark.readStream.format("graftjson").load(dir.toString)
      .writeStream.format("memory").queryName("gjs_basic")
      .option("checkpointLocation", graft.TempRoots.path("gjs_basic_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      def got = spark.table("gjs_basic").collect()
        .map(_.toString).sorted.toSeq
      val batch = spark.read.format("graftjson").load(dir.toString)
        .collect().map(_.toString).sorted.toSeq
      assert(got == batch && got.length == 3)
      // late file with the same shape: picked up, nothing re-emitted
      put(dir, "c.json", """{"id": 4, "s": "w"}""" + "\n")
      q.processAllAvailable()
      assert(got.length == 4 && got.count(_.contains("4")) == 1)
    } finally q.stop()
  }

  test("admission control: maxFilesPerTrigger caps each batch; logs are per-batch diffs") {
    val dir = mkDir("gjs_admit")
    (1 to 5).foreach(i =>
      put(dir, f"p$i%02d.json", s"""{"id": $i, "s": "v$i"}\n"""))
    val ckpt = graft.TempRoots.path("gjs_admit_ckpt")
    val q = spark.readStream.format("graftjson")
      .option("maxFilesPerTrigger", "2").load(dir.toString)
      .writeStream.format("memory").queryName("gjs_admit")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    assert(spark.table("gjs_admit").count() == 5L)
    // the source's own log: one immutable file per batch, each naming
    // ONLY that batch's admitted files (2,2,1) — checkpoint cost rides
    // the diff, never the table
    val logDir = new Path(s"$ckpt/sources/0",
      JsonDocMicroBatchStream.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = JsonDocMicroBatchStream.logIds(fs, logDir)
    assert(ids == Seq(0L, 1L, 2L))
    val sizes = ids.map(id =>
      JsonDocMicroBatchStream.readLog(fs, logDir, id).size)
    assert(sizes == Seq(2, 2, 1))
  }

  test("restart with the same checkpoint resumes; replay emits nothing twice") {
    val dir = mkDir("gjs_restart")
    val sink = graft.TempRoots.path("gjs_restart_sink")
    val ckpt = graft.TempRoots.path("gjs_restart_ckpt")
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n")
    put(dir, "b.json", """{"id": 2, "s": "y"}""" + "\n")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graftjson").load(dir.toString)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 2L)
    put(dir, "c.json", """{"id": 3, "s": "z"}""" + "\n")
    runOnce()
    val rows = spark.read.parquet(sink).select(col("id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L), s"each row exactly once, got $rows")
  }

  test("orphan batch log (crash between log write and WAL commit) replays, never loses") {
    val dir = mkDir("gjs_orphan")
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n")
    val ckpt = graft.TempRoots.path("gjs_orphan_ckpt")
    def stream() = new JsonDocMicroBatchStream(spark, ckpt,
      Seq(dir.toString), whole = false,
      JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1,
      spark.read.format("graftjson").load(dir.toString).schema,
      spark.read.format("graftjson").load(dir.toString).schema,
      Array.empty, None, None, None)
    val s1 = stream()
    // the crash: latestOffset writes batch log 0 and updates memory,
    // but the engine never commits the offset to its WAL
    val off = s1.latestOffset(s1.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(off.json == "0")
    // restart: a fresh stream rebuilds from the logs; the orphan id is
    // simply the latest offset again — the engine then plans (−1, 0]
    // from the SAME immutable log, so the batch replays byte-identical
    val s2 = stream()
    val off2 = s2.latestOffset(s2.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(off2.json == "0")
    val parts = s2.planInputPartitions(s2.initialOffset(), off2)
    assert(parts.length == 1 &&
      parts(0).asInstanceOf[JsonDocPartition].path.endsWith("a.json"))
  }

  test("big plain NDJSON files split by byte range inside a streaming batch") {
    val dir = mkDir("gjs_split")
    val line = s"""{"id": 1, "s": "${"x" * 120}"}\n"""
    val big = new java.io.FileWriter(new java.io.File(dir, "big.json"))
    (1 to 20000).foreach(_ => big.write(line)); big.close()
    val ckpt = graft.TempRoots.path("gjs_split_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = spark.read.format("graftjson").load(dir.toString).schema
    val s = new JsonDocMicroBatchStream(spark, ckpt, Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty,
      Some(1L << 20), None, None)
    val off = s.latestOffset(s.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    val parts = s.planInputPartitions(s.initialOffset(), off)
      .map(_.asInstanceOf[JsonDocPartition])
    assert(parts.length > 1, "a >1MB NDJSON file must fan out")
    val len = new java.io.File(dir, "big.json").length
    assert(parts.map(_.length).sum == len &&
      parts.map(_.start).min == 0L &&
      parts.map(p => p.start + p.length).max == len)
  }

  test("append-only violations fail loudly: in-place growth and maintenance swaps") {
    val dir = mkDir("gjs_mutate")
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n")
    val ckpt = graft.TempRoots.path("gjs_mutate_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = spark.read.format("graftjson").load(dir.toString).schema
    val s = new JsonDocMicroBatchStream(spark, ckpt, Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty, None, None, None)
    val all = org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    s.latestOffset(s.initialOffset(), all)
    // in-place append to a consumed file: its tail would be lost
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n" +
      """{"id": 9, "s": "late"}""" + "\n")
    val e1 = intercept[IllegalStateException] {
      s.latestOffset(s.initialOffset(), all)
    }
    assert(e1.getMessage.contains("append-only"))
    // a compaction-style swap: consumed file gone, merged file new —
    // rows already emitted would be re-read
    assert(new java.io.File(dir, "a.json").delete())
    put(dir, "compact-000.json", """{"id": 1, "s": "x"}""" + "\n")
    val e2 = intercept[IllegalStateException] {
      s.latestOffset(s.initialOffset(), all)
    }
    assert(e2.getMessage.contains("disappeared"))
  }

  test("append-only guard: a SAME-LENGTH in-place rewrite fails loudly via mtime") {
    val dir = mkDir("gjs_rewrite")
    val line = """{"id": 1, "s": "aa"}""" + "\n"
    put(dir, "a.json", line)
    val ckpt = graft.TempRoots.path("gjs_rewrite_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = spark.read.format("graftjson").load(dir.toString).schema
    val s = new JsonDocMicroBatchStream(spark, ckpt, Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty, None, None, None)
    val all = org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
    s.latestOffset(s.initialOffset(), all)
    // rewrite with DIFFERENT content of IDENTICAL byte length — the
    // length check alone would pass and planned partitions from the
    // old log would silently read the new bytes; mtime must catch it
    val swapped = """{"id": 7, "s": "zz"}""" + "\n"
    assert(swapped.length == line.length)
    put(dir, "a.json", swapped)
    val f = new java.io.File(dir, "a.json")
    assert(f.setLastModified(f.lastModified() + 5000),
      "could not bump mtime for the rewrite simulation")
    val e = intercept[IllegalStateException] {
      s.latestOffset(s.initialOffset(), all)
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
  }

  test("change-feed start: startingSave swallows the baseline, replays per-save deltas, then tails") {
    val dir = mkDir("gjs_cdc")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n" +
      """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e1.json", """{"id": 3, "s": "c"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e2.json", """{"id": 4, "s": "d"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    val saves = JsonMeta.saves(spark, dir.toString)
    assert(saves.size == 3, saves)
    val ckpt = graft.TempRoots.path("gjs_cdc_ckpt")
    val q = spark.readStream.format("graftjson")
      .option("startingSave", saves.head.toString).load(dir.toString)
      .writeStream.format("memory").queryName("gjs_cdc")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      def ids = spark.table("gjs_cdc").select(col("id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
      // the consumer holds save 1 (e0) — only the later saves replay
      assert(ids == Seq(3L, 4L), ids)
      // per-save batch grain: one log per replayed save, never mixed
      val logDir = new Path(s"$ckpt/sources/0",
        JsonDocMicroBatchStream.LogDirName)
      val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val logs = JsonDocMicroBatchStream.logIds(fs, logDir)
      assert(logs == Seq(0L, 1L), logs)
      assert(JsonDocMicroBatchStream.readLog(fs, logDir, 0L)
        .map(_.path).forall(_.endsWith("e1.json")))
      assert(JsonDocMicroBatchStream.readLog(fs, logDir, 1L)
        .map(_.path).forall(_.endsWith("e2.json")))
      // catch-up completion is durable
      assert(fs.exists(new Path(logDir,
        JsonDocMicroBatchStream.CdcDoneName)))
      // live-tail hand-off: a post-save file arrives like any tailed one
      put(dir, "live.json", """{"id": 5, "s": "e"}""" + "\n")
      q.processAllAvailable()
      assert(ids == Seq(3L, 4L, 5L), ids)
    } finally q.stop()

    // startingSave == the newest save: everything saved is baseline —
    // only the unsaved live file is emitted
    val q2 = spark.readStream.format("graftjson")
      .option("startingSave", saves.last.toString).load(dir.toString)
      .writeStream.format("memory").queryName("gjs_cdc_hi")
      .option("checkpointLocation", graft.TempRoots.path("gjs_cdc_hi_ckpt"))
      .start()
    try {
      q2.processAllAvailable()
      val ids2 = spark.table("gjs_cdc_hi").select(col("id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids2 == Seq(5L), ids2)
    } finally q2.stop()

    // batch reads do not take the streaming option
    val eb = intercept[Exception](spark.read.format("graftjson")
      .option("startingSave", saves.head.toString).load(dir.toString)
      .collect())
    assert(Iterator.iterate(eb: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("streaming option"))), eb.getMessage)
    // ...and the AGGREGATE PUSHDOWN path cannot bypass the rejection
    // by answering count(*) from live zone metadata (self-review r15:
    // a completed pushdown short-circuits into a JsonDocMetaScan that
    // never reaches toBatch's require)
    val ec = intercept[Exception](spark.read.format("graftjson")
      .option("zonemaps", "true")
      .option("startingSave", saves.head.toString).load(dir.toString)
      .count())
    assert(Iterator.iterate(ec: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("streaming option"))), ec.getMessage)
  }

  test("change-feed restart: mid-catch-up continues exactly once; completion survives vacuum; a vacuumed fresh start is loud") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkDir("gjs_cdc_restart")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e2.json", """{"id": 3, "s": "c"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    val saves = JsonMeta.saves(spark, dir.toString)
    val ckpt = graft.TempRoots.path("gjs_cdc_restart_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = spark.read.format("graftjson").load(dir.toString).schema
    def stream() = new JsonDocMicroBatchStream(spark, ckpt,
      Seq(dir.toString), whole = false, t, sch, sch, Array.empty,
      None, None, None, Some(saves.head))
    val one = ReadLimit.maxFiles(1)
    val s1 = stream()
    val off0 = s1.latestOffset(s1.initialOffset(), one)
    assert(off0.json == "0")
    // CRASH mid-catch-up: a fresh stream on the same checkpoint
    // re-resolves, filters what the logs already admitted, continues
    val s2 = stream()
    val off1 = s2.latestOffset(s2.deserializeOffset(off0.json), one)
    assert(off1.json == "1")
    val logDir = new Path(ckpt, JsonDocMicroBatchStream.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val admitted = JsonDocMicroBatchStream.logIds(fs, logDir)
      .flatMap(id => JsonDocMicroBatchStream.readLog(fs, logDir, id))
      .map(_.path.split('/').last).sorted
    assert(admitted == Seq("e1.json", "e2.json"), admitted)
    assert(fs.exists(new Path(logDir, JsonDocMicroBatchStream.CdcDoneName)))
    // nothing further to admit
    val off2 = s2.latestOffset(s2.deserializeOffset(off1.json), one)
    assert(off2.json == off1.json)

    // vacuum away the starting save — a COMPLETED stream must keep
    // running (cdc-done skips resolution), only a FRESH checkpoint
    // fails, with the named retention message
    JsonMeta.vacuum(spark, dir.toString, retainSaves = 1)
    val s3 = stream()
    val off3 = s3.latestOffset(s3.deserializeOffset(off1.json),
      ReadLimit.allAvailable())
    assert(off3.json == off1.json)
    val e = intercept[IllegalStateException] {
      new JsonDocMicroBatchStream(spark,
        graft.TempRoots.path("gjs_cdc_fresh_ckpt"), Seq(dir.toString),
        whole = false, t, sch, sch, Array.empty, None, None, None,
        Some(saves.head))
    }
    assert(e.getMessage.contains("vacuum retention"), e.getMessage)
  }

  test("change-feed start through the catalog identifier: readStream.table + startingSave (r15)") {
    useCatalog()
    val dir = mkDir("gjs_cdc_cat")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    val saves = JsonMeta.saves(spark, dir.toString)
    val q = spark.readStream
      .option("startingSave", saves.head.toString)
      .table(s"graft.`$dir`")
      .writeStream.format("memory").queryName("gjs_cdc_cat")
      .option("checkpointLocation", graft.TempRoots.path("gjs_cdc_cat_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("gjs_cdc_cat").select(col("id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
      // the save-1 baseline (e0) is swallowed through the catalog
      // resolution path exactly like the path-addressed one
      assert(ids == Seq(2L), ids)
    } finally q.stop()
  }

  test("whole-mode streaming: one row per arriving file") {
    val dir = mkDir("gjs_whole")
    put(dir, "a.json", """{"id": 1, "tags": ["p", "q"]}""")
    val q = spark.readStream.format("graftjson")
      .option("whole", "true").load(dir.toString)
      .writeStream.format("memory").queryName("gjs_whole")
      .option("checkpointLocation", graft.TempRoots.path("gjs_whole_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gjs_whole").count() == 1L)
      put(dir, "b.json", """{"id": 2, "tags": []}""")
      q.processAllAvailable()
      assert(spark.table("gjs_whole").count() == 2L)
      val batch = spark.read.format("graftjson").option("whole", "true")
        .load(dir.toString).collect().map(_.toString).sorted.toSeq
      assert(spark.table("gjs_whole").collect()
        .map(_.toString).sorted.toSeq == batch)
    } finally q.stop()
  }

  test("cdcDeletes: per-save retractions precede inserts, a mirror replay lands on the live table") {
    val dir = mkDir("gjs_cdcdel")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 1: the consumer position
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 2: add e1 (v1)
    val start = JsonMeta.saves(spark, dir.toString).head
    // history past the consumer: rewrite e1 (retract+insert), delete
    // e0 (retract), add e2 (insert)
    put(dir, "e1.json",
      """{"id": 5, "s": "B"}""" + "\n" + """{"id": 6, "s": "C"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 3
    assert(new java.io.File(dir, "e0.json").delete())
    new java.io.File(dir, ".e0.json.crc").delete()
    JsonMeta.save(spark, dir.toString) // save 4: e0 tombstone
    put(dir, "e2.json", """{"id": 4, "s": "d"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 5
    val ckpt = graft.TempRoots.path("gjs_cdcdel_ckpt")
    val q = spark.readStream.format("graftjson")
      .option("startingSave", start.toString)
      .option("cdcDeletes", "true").load(dir.toString)
      .writeStream.format("memory").queryName("gjs_cdcdel")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("gjs_cdcdel").collect()
      def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
      val dels = rows.filter(_.getAs[String]("_change_type") == "delete")
      val ins = rows.filter(_.getAs[String]("_change_type") == "insert")
      // retractions: e1's v1 died at save 3, e0 died at save 4 —
      // and their data columns are NULL (no bytes exist to read)
      assert(dels.map(r => base(r.getAs[String]("_file"))).sorted.toSeq ==
        Seq("e0.json", "e1.json"), dels.mkString(";"))
      assert(dels.forall(r => r.isNullAt(r.fieldIndex("id")) &&
        r.isNullAt(r.fieldIndex("s"))), dels.mkString(";"))
      // inserts: e1's FINAL form only (never the dead v1) plus e2
      assert(ins.map(_.getAs[Number]("id").longValue).sorted.toSeq ==
        Seq(4L, 5L, 6L), ins.mkString(";"))
      assert(ins.forall(r => Seq("e1.json", "e2.json")
        .contains(base(r.getAs[String]("_file")))))
      // mirror replay: consumer holds save-1 content (e0's row);
      // retract-by-file then insert must land exactly on the live table
      var mirror = Map("e0.json" -> Set(1L))
      dels.foreach(r => mirror -= base(r.getAs[String]("_file")))
      ins.foreach { r =>
        val f = base(r.getAs[String]("_file"))
        mirror += f -> (mirror.getOrElse(f, Set.empty) +
          r.getAs[Number]("id").longValue)
      }
      val liveIds = spark.read.format("graftjson")
        .option("refresh", "true").load(dir.toString)
        .select(col("id").cast("long")).collect().map(_.getLong(0)).toSet
      assert(mirror.values.flatten.toSet == liveIds,
        s"mirror ${mirror.values.flatten.toSet} vs live $liveIds")
      // per-save batch logs: the save-3 log carries the retraction
      // (len<0 sentinel, mtime = save id) BEFORE its insert
      val logDir = new Path(s"$ckpt/sources/0",
        JsonDocMicroBatchStream.LogDirName)
      val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val log0 = JsonDocMicroBatchStream.readLog(fs, logDir, 0L)
      assert(log0.map(e => (base(e.path), e.len < 0L)) ==
        Seq(("e1.json", true), ("e1.json", false)), log0)
    } finally q.stop()
  }

  test("cdcDeletes restart mid-catch-up: retractions are exactly-once across restarts") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkDir("gjs_cdcdel_restart")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 1
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 2
    assert(new java.io.File(dir, "e0.json").delete())
    new java.io.File(dir, ".e0.json.crc").delete()
    JsonMeta.save(spark, dir.toString) // save 3: e0 tombstone
    put(dir, "e2.json", """{"id": 3, "s": "c"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 4
    val saves = JsonMeta.saves(spark, dir.toString)
    val ckpt = graft.TempRoots.path("gjs_cdcdel_restart_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val dataSch = JsonDocSource.sparkSchemaOf(t)
    def stream() = new JsonDocMicroBatchStream(spark, ckpt,
      Seq(dir.toString), whole = false, t, dataSch, dataSch, Array.empty,
      None, None, None, Some(saves.head), appendFilePath = false,
      cdcDeletes = true)
    val one = ReadLimit.maxFiles(1)
    // one entry per trigger, a FRESH stream object between triggers —
    // the hardest restart cadence
    var off = stream().latestOffset(stream().initialOffset(), one)
    (0 until 6).foreach { _ =>
      val st = stream()
      off = st.latestOffset(off, one)
    }
    val logDir = new Path(ckpt, JsonDocMicroBatchStream.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = JsonDocMicroBatchStream.logIds(fs, logDir).flatMap(id =>
      JsonDocMicroBatchStream.readLog(fs, logDir, id))
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val keyed = entries.map(e => (base(e.path), e.len < 0L, e.mtime))
    assert(keyed.size == keyed.toSet.size,
      s"an entry was admitted twice: $keyed")
    // owed: removal of e0 at save 3, adds of e1 and e2 (still current)
    assert(entries.count(_.len < 0L) == 1)
    assert(entries.filter(_.len < 0L).map(e => base(e.path)) ==
      Seq("e0.json"))
    assert(entries.filter(_.len >= 0L).map(e => base(e.path)).sorted ==
      Seq("e1.json", "e2.json"))
  }

  test("catch-up admission drift guard: a file rewritten between resolution and its batch fails LOUDLY, never reads the new bytes") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkDir("gjs_cdc_drift")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 1
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 2
    put(dir, "e2.json", """{"id": 3, "s": "c"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 3
    val saves = JsonMeta.saves(spark, dir.toString)
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = JsonDocSource.sparkSchemaOf(t)
    val st = new JsonDocMicroBatchStream(spark,
      graft.TempRoots.path("gjs_cdc_drift_ckpt"), Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty, None, None, None,
      Some(saves.head))
    // admit save 2's delta only; save 3's e2 stays RESOLVED-not-admitted
    val off = st.latestOffset(st.initialOffset(), ReadLimit.maxFiles(1))
    assert(off.json.toLong == 0L)
    // maintenance rewrites e2 in place before its batch lands
    put(dir, "e2.json", """{"id": 99, "s": "XX"}""" + "\n")
    val f = new java.io.File(dir, "e2.json")
    assert(f.setLastModified(f.lastModified() + 5000))
    val e = intercept[IllegalStateException] {
      st.latestOffset(off, ReadLimit.maxFiles(1))
    }
    assert(e.getMessage.contains("drifted from its save-time"),
      e.getMessage)
  }

  test("cdcDeletes restart after an upstream delete of a SERVED file: the queued retraction supersedes the admission — no wedge, exactly-once") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkDir("gjs_cdcdel_served")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 1
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 2
    put(dir, "e2.json", """{"id": 3, "s": "c"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 3
    val start = JsonMeta.saves(spark, dir.toString).head
    val ckpt = graft.TempRoots.path("gjs_cdcdel_served_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = JsonDocSource.sparkSchemaOf(t)
    def stream() = new JsonDocMicroBatchStream(spark, ckpt,
      Seq(dir.toString), whole = false, t, sch, sch, Array.empty,
      None, None, None, Some(start), appendFilePath = false,
      cdcDeletes = true)
    // serve ONLY e1 (save 2's delta) — save 3 stays pending, so
    // catch-up is genuinely incomplete (cdc-done not committed; a
    // post-completion delete is the documented LOUD end instead)
    val off0 = stream().latestOffset(stream().initialOffset(),
      ReadLimit.maxFiles(1))
    // upstream: a committed DELETE of the served file
    assert(new java.io.File(dir, "e1.json").delete())
    new java.io.File(dir, ".e1.json.crc").delete()
    JsonMeta.save(spark, dir.toString) // save 4: e1 tombstone
    // restart: the re-resolution queues e1's retraction — the
    // disappeared-file guard must yield to it instead of wedging
    var st = stream()
    var off = st.latestOffset(off0, ReadLimit.allAvailable())
    var prev = ""
    var spins = 0
    while (off.json != prev && spins < 10) {
      prev = off.json; off = st.latestOffset(off, ReadLimit.allAvailable())
      spins += 1
    }
    val logDir = new Path(ckpt, JsonDocMicroBatchStream.LogDirName)
    val lfs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = JsonDocMicroBatchStream.logIds(lfs, logDir).flatMap(id =>
      JsonDocMicroBatchStream.readLog(lfs, logDir, id))
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    // e1 admitted once, retracted once; e2 admitted once — and the
    // mirror fold (baseline e0 held) lands on the live table
    assert(entries.count(e => e.len >= 0 && base(e.path) == "e1.json") == 1)
    assert(entries.count(e => e.len < 0 && base(e.path) == "e1.json") == 1)
    assert(entries.count(e => e.len >= 0 && base(e.path) == "e2.json") == 1)
    var mirror = Set("e0.json")
    entries.foreach(e =>
      if (e.len < 0) mirror -= base(e.path) else mirror += base(e.path))
    assert(mirror == Set("e0.json", "e2.json"), mirror)
  }

  test("cdcDeletes restart after an upstream REWRITE of a served file: retract + re-admit the new form (fingerprint-filtered)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkDir("gjs_cdcdel_rewrite")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 1
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 2
    put(dir, "e2.json", """{"id": 3, "s": "c"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 3 (keeps catch-up open)
    val start = JsonMeta.saves(spark, dir.toString).head
    val ckpt = graft.TempRoots.path("gjs_cdcdel_rewrite_ckpt")
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = JsonDocSource.sparkSchemaOf(t)
    def stream() = new JsonDocMicroBatchStream(spark, ckpt,
      Seq(dir.toString), whole = false, t, sch, sch, Array.empty,
      None, None, None, Some(start), appendFilePath = false,
      cdcDeletes = true)
    val off0 = stream().latestOffset(stream().initialOffset(),
      ReadLimit.maxFiles(1)) // serves e1 v1 only; save 3 stays pending
    // committed in-place rewrite while the stream is down
    put(dir, "e1.json",
      """{"id": 7, "s": "B"}""" + "\n" + """{"id": 8, "s": "C"}""" + "\n")
    JsonMeta.save(spark, dir.toString) // save 4
    var st = stream()
    var off = st.latestOffset(off0, ReadLimit.allAvailable())
    var prev = ""
    var spins = 0
    while (off.json != prev && spins < 10) {
      prev = off.json; off = st.latestOffset(off, ReadLimit.allAvailable())
      spins += 1
    }
    val logDir = new Path(ckpt, JsonDocMicroBatchStream.LogDirName)
    val lfs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = JsonDocMicroBatchStream.logIds(lfs, logDir).flatMap(id =>
      JsonDocMicroBatchStream.readLog(lfs, logDir, id))
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    val e1 = entries.filter(e => base(e.path) == "e1.json")
    // v1 admitted, retracted, v2 re-admitted with the NEW fingerprint
    assert(e1.count(_.len >= 0) == 2 && e1.count(_.len < 0) == 1,
      e1.toString)
    val fps = e1.filter(_.len >= 0).map(e => (e.len, e.mtime))
    assert(fps.distinct.size == 2, s"same fingerprint re-admitted: $fps")
  }

  test("cdcDeletes mode is durable checkpoint state: resuming in the other mode fails with a NAMED error") {
    val dir = mkDir("gjs_cdcdel_mode")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    val start = JsonMeta.saves(spark, dir.toString).head
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = JsonDocSource.sparkSchemaOf(t)
    // built WITH cdcDeletes, resumed without → named
    val ckptA = graft.TempRoots.path("gjs_cdcdel_mode_a")
    new JsonDocMicroBatchStream(spark, ckptA, Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty, None, None, None,
      Some(start), appendFilePath = false, cdcDeletes = true)
    val ea = intercept[IllegalStateException](
      new JsonDocMicroBatchStream(spark, ckptA, Seq(dir.toString),
        whole = false, t, sch, sch, Array.empty, None, None, None,
        Some(start)))
    assert(ea.getMessage.contains("was built with cdcDeletes=true"),
      ea.getMessage)
    // built WITHOUT, resumed with → named
    val ckptB = graft.TempRoots.path("gjs_cdcdel_mode_b")
    new JsonDocMicroBatchStream(spark, ckptB, Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty, None, None, None,
      Some(start))
    val eb = intercept[IllegalStateException](
      new JsonDocMicroBatchStream(spark, ckptB, Seq(dir.toString),
        whole = false, t, sch, sch, Array.empty, None, None, None,
        Some(start), appendFilePath = false, cdcDeletes = true))
    assert(eb.getMessage.contains("was built WITHOUT cdcDeletes"),
      eb.getMessage)
  }

  test("a FAILED fresh cdcDeletes resolution does not poison the checkpoint (ADVICE r16): the mode marker lands only after cdcResolve succeeds") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = mkDir("gjs_cdcdel_poison")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    put(dir, "e1.json", """{"id": 2, "s": "b"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    val saves = JsonMeta.saves(spark, dir.toString)
    JsonMeta.vacuum(spark, dir.toString, retainSaves = 1)
    val t = JsonDocSource.inferCached(Seq(dir.toString), whole = false)._1
    val sch = JsonDocSource.sparkSchemaOf(t)
    val ckpt = graft.TempRoots.path("gjs_cdcdel_poison_ckpt")
    def mk(cdc: Boolean, sv: Option[Long]) =
      new JsonDocMicroBatchStream(spark, ckpt, Seq(dir.toString),
        whole = false, t, sch, sch, Array.empty, None, None, None,
        sv, appendFilePath = false, cdcDeletes = cdc)
    // fresh checkpoint, cdcDeletes, vacuumed-away startingSave: the
    // NAMED retention error fires during resolution
    val e = intercept[IllegalStateException](mk(cdc = true,
      Some(saves.head)))
    assert(e.getMessage.contains("vacuum retention"), e.getMessage)
    // the checkpoint stays CLEAN: no mode marker was written, so a
    // retry WITHOUT the option starts normally instead of failing with
    // the misleading "was built with cdcDeletes=true" message
    val fs = new Path(ckpt).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(
      new Path(ckpt, JsonDocMicroBatchStream.LogDirName),
      JsonDocMicroBatchStream.CdcModeName)),
      "the failed resolution left a mode marker behind")
    val plain = mk(cdc = false, None)
    val off = plain.latestOffset(plain.initialOffset(),
      ReadLimit.allAvailable())
    assert(off.json == "0") // both files admitted — the tail works
    // and a cdcDeletes start at a RETAINED save commits the marker
    val ckpt2 = graft.TempRoots.path("gjs_cdcdel_poison_ckpt2")
    new JsonDocMicroBatchStream(spark, ckpt2, Seq(dir.toString),
      whole = false, t, sch, sch, Array.empty, None, None, None,
      Some(saves.last), appendFilePath = false, cdcDeletes = true)
    assert(fs.exists(new Path(
      new Path(ckpt2, JsonDocMicroBatchStream.LogDirName),
      JsonDocMicroBatchStream.CdcModeName)),
      "a successful resolution must still commit the durable mode marker")
  }

  test("cdcDeletes guards: streaming-only, needs startingSave, read-only table, name collision is loud") {
    val dir = mkDir("gjs_cdcdel_guards")
    put(dir, "e0.json", """{"id": 1, "s": "a"}""" + "\n")
    JsonMeta.save(spark, dir.toString)
    def rootMsgs(e: Throwable) =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).toSeq
    // batch read: loud
    val eb = intercept[Exception](spark.read.format("graftjson")
      .option("cdcDeletes", "true").load(dir.toString).collect())
    assert(rootMsgs(eb).exists(_.contains("streaming option")),
      eb.getMessage)
    // stream without startingSave: loud at stream construction
    val es = intercept[Exception] {
      val q = spark.readStream.format("graftjson")
        .option("cdcDeletes", "true").load(dir.toString)
        .writeStream.format("memory").queryName("gjs_cdcdel_nostart")
        .option("checkpointLocation",
          graft.TempRoots.path("gjs_cdcdel_nostart_ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(rootMsgs(es).exists(_.contains("needs startingSave")),
      es.getMessage)
    // the widened table is read-only
    val ew = intercept[Exception](
      spark.range(1).selectExpr("id", "'x' AS s").write
        .format("graftjson").option("cdcDeletes", "true").mode("append")
        .save(dir.toString))
    assert(rootMsgs(ew).exists(_.contains("read-only")), ew.getMessage)
    // a data field named _file blocks the widening loudly (never a
    // silently shadowed or doubled column)
    val dir2 = mkDir("gjs_cdcdel_clash")
    put(dir2, "e0.json", """{"id": 1, "_file": "z"}""" + "\n")
    JsonMeta.save(spark, dir2.toString)
    val ec = intercept[Exception](spark.readStream.format("graftjson")
      .option("cdcDeletes", "true")
      .option("startingSave", "1").load(dir2.toString))
    assert(rootMsgs(ec).exists(_.contains("free")), ec.getMessage)
    // the catalog identifier cannot carry the option (loadTable never
    // sees read options; the schema would stay unwidened) — loud,
    // never a silently insert-only feed
    useCatalog()
    val ecat = intercept[Exception] {
      val q = spark.readStream
        .option("cdcDeletes", "true").option("startingSave", "1")
        .table(s"graft.`$dir`")
        .writeStream.format("memory").queryName("gjs_cdcdel_cat")
        .option("checkpointLocation",
          graft.TempRoots.path("gjs_cdcdel_cat_ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(rootMsgs(ecat).exists(_.contains("catalog identifier")),
      ecat.getMessage)
  }
}
