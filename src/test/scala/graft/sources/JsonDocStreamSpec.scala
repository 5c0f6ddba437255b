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
}
