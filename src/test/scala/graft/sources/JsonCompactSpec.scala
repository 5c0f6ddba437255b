package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Compaction of graftjson NDJSON tables: row-identical results,
  * fewer files, untouched-file immutability, line-boundary edge
  * preservation, and exactly-once visibility at every crash point of
  * the marker protocol. */
class JsonCompactSpec extends SparkTestBase {

  private def mkDir(name: String): java.io.File = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs(); dir
  }
  private def put(dir: java.io.File, file: String, text: String): Unit = {
    val w = new java.io.FileWriter(new java.io.File(dir, file))
    w.write(text); w.close()
  }
  private def rows(dir: java.io.File): Seq[(Any, Any)] =
    spark.read.format("graftjson").load(dir.toString)
      .select(col("id"), col("s")).collect()
      .map(r => (r.get(0), r.get(1))).sortBy(_.toString).toSeq
  private def visibleFiles(dir: java.io.File): Seq[String] =
    JsonDocSource.listFiles(spark, Seq(dir.toString)).map(_._1)

  test("compaction merges small files; rows and schema identical; scan still splits") {
    val dir = mkDir("jc_basic")
    (1 to 8).foreach(i =>
      put(dir, f"part-$i%03d.json", s"""{"id": $i, "s": "v$i"}\n"""))
    val before = rows(dir)
    val schemaBefore = spark.read.format("graftjson").load(dir.toString).schema
    val rep = JsonCompact.compact(spark, dir.toString, targetBytes = 1L << 20)
    assert(rep.mergedFiles == 8 && rep.mergedInto == 1 && !rep.rolledForward)
    assert(visibleFiles(dir).size == 1)
    assert(!new java.io.File(dir, "_compaction").exists,
      "staging dir must be gone after a clean compact")
    assert(rows(dir) == before)
    assert(spark.read.format("graftjson").load(dir.toString).schema ==
      schemaBefore)
    // the merged file is plain NDJSON — byte-range splitting applies
    val split = spark.read.format("graftjson")
      .option("maxSplitBytes", "32").load(dir.toString)
    assert(split.select(col("id")).collect().map(_.getAs[Number](0).longValue)
      .sorted.toSeq == (1L to 8L))
  }

  test("large files, .gz files, and hidden files are never rewritten (mtime-pinned)") {
    val dir = mkDir("jc_pin")
    put(dir, "big.json", (1 to 50).map(i => s"""{"id": $i, "s": "big"}""")
      .mkString("", "\n", "\n"))
    val gzf = new java.io.File(dir, "z.json.gz")
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gzf))
    gz.write("""{"id": 900, "s": "gz"}""".getBytes("UTF-8")); gz.close()
    put(dir, "s1.json", """{"id": 1, "s": "a"}""" + "\n")
    put(dir, "s2.json", """{"id": 2, "s": "b"}""" + "\n")
    val big = new java.io.File(dir, "big.json")
    big.setLastModified(1700000000000L); gzf.setLastModified(1700000000000L)
    val before = rows(dir)
    // big.json exceeds target; s1+s2 merge; gz ignored
    val rep = JsonCompact.compact(spark, dir.toString,
      targetBytes = big.length - 1)
    assert(rep.mergedFiles == 2 && rep.mergedInto == 1)
    assert(big.lastModified == 1700000000000L &&
      gzf.lastModified == 1700000000000L)
    assert(rows(dir) == before)
  }

  test("line-boundary edges survive byte concatenation") {
    val dir = mkDir("jc_edges")
    // no trailing newline; trailing bare CR; leading blank line;
    // a blank line unit; an empty file; a corrupt line
    put(dir, "a.json", """{"id": 1, "s": "x"}""") // no trailing \n
    put(dir, "b.json", "{\"id\": 2, \"s\": \"y\"}\r") // bare-CR end
    put(dir, "c.json", "\n{\"id\": 3, \"s\": \"z\"}\n\n")
    put(dir, "d.json", "")
    put(dir, "e.json", "{\"id\": 4, \"s\": " + "\n" + """{"id": 5, "s": "w"}""" + "\n")
    val plainBefore = spark.read.format("graftjson").load(dir.toString)
    val before = plainBefore.collect().map(_.toString).sorted.toSeq
    val cntBefore = plainBefore.count()
    JsonCompact.compact(spark, dir.toString, targetBytes = 1L << 20)
    assert(visibleFiles(dir).size == 1)
    val after = spark.read.format("graftjson").load(dir.toString)
    assert(after.collect().map(_.toString).sorted.toSeq == before)
    assert(after.count() == cntBefore)
  }

  test("crash window: a committed marker is exactly-once visible; replay converges") {
    val dir = mkDir("jc_crash")
    (1 to 4).foreach(i =>
      put(dir, f"p$i.json", s"""{"id": $i, "s": "v$i"}\n"""))
    put(dir, "keep.json", """{"id": 99, "s": "keep"}""" + "\n")
    val before = rows(dir)
    // Simulate the crash AFTER the marker commit and BEFORE any
    // roll-forward, using the production writer path: stage the
    // merged bytes and the marker by hand, exactly as compact() does
    // up to its commit point.
    val stage = new java.io.File(dir, "_compaction"); stage.mkdirs()
    put(stage, "compact-test0001.json",
      (1 to 4).map(i => s"""{"id": $i, "s": "v$i"}""").mkString("", "\n", "\n"))
    put(stage, "commit.tmp",
      "add\tcompact-test0001.json\tcompact-test0001.json\n" +
        (1 to 4).map(i => s"rm\tp$i.json\n").mkString)
    assert(new java.io.File(stage, "commit.tmp")
      .renameTo(new java.io.File(stage, "commit")))
    // marker-aware reads: originals hidden, staged surfaced — no
    // duplicates, no loss, while the originals still physically exist
    assert((1 to 4).forall(i => new java.io.File(dir, s"p$i.json").exists))
    assert(rows(dir) == before)
    val vis = visibleFiles(dir)
    assert(vis.exists(_.contains("_compaction/compact-test0001.json")))
    assert(!vis.exists(_.contains("p1.json")))
    // replay (the next maintenance call) rolls forward idempotently
    val rep = JsonCompact.compact(spark, dir.toString, targetBytes = 4L)
    assert(rep.rolledForward)
    assert(!new java.io.File(stage, "commit").exists)
    assert((1 to 4).forall(i => !new java.io.File(dir, s"p$i.json").exists))
    assert(new java.io.File(dir, "compact-test0001.json").exists)
    assert(rows(dir) == before)
    // a HALF-rolled state (staged already renamed, originals partly
    // deleted, marker still present) also reads exactly-once
    val dir2 = mkDir("jc_crash2")
    put(dir2, "q1.json", """{"id": 1, "s": "a"}""" + "\n")
    put(dir2, "q2.json", """{"id": 2, "s": "b"}""" + "\n")
    val st2 = new java.io.File(dir2, "_compaction"); st2.mkdirs()
    put(dir2, "compact-test0002.json",
      "{\"id\": 1, \"s\": \"a\"}\n{\"id\": 2, \"s\": \"b\"}\n")
    put(st2, "commit",
      "add\tcompact-test0002.json\tcompact-test0002.json\n" +
        "rm\tq1.json\nrm\tq2.json\n")
    assert(new java.io.File(dir2, "q2.json").delete()) // partly deleted
    assert(rows(dir2) == Seq((1L, "a"), (2L, "b")).map {
      case (a, b) => (a: Any, b: Any) })
    assert(JsonCompact.rollForward(spark, dir2.toString))
    assert(rows(dir2) == Seq((1L, "a"), (2L, "b")).map {
      case (a, b) => (a: Any, b: Any) })
  }

  test("multi-bin compaction distributes the merge: one Spark task per bin") {
    val dir = mkDir("jc_dist")
    val pad = "x" * 40
    (1 to 6).foreach(i =>
      put(dir, f"p$i.json", s"""{"id": $i, "s": "$pad"}""" + "\n"))
    val before = rows(dir)
    // compact() runs exactly one Spark job (listing and marker I/O are
    // driver-side), so every task seen between the listener's install
    // and the job's end is a bin-merge task — one per bin
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // each file is 58 bytes: target 120 packs pairs → 3 bins of 2
      val rep = JsonCompact.compact(spark, dir.toString, targetBytes = 120L)
      assert(rep.mergedFiles == 6 && rep.mergedInto == 3)
      // listener events are posted asynchronously — poll briefly
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (tasks.get < 3 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(tasks.get >= 3,
        s"expected one merge task per bin (3), saw ${tasks.get}")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(rows(dir) == before)
    assert(visibleFiles(dir).size == 3)
  }

  test("compact is a no-op on an already-compact table; zero bins on lone files") {
    val dir = mkDir("jc_noop")
    put(dir, "one.json", """{"id": 1, "s": "x"}""" + "\n")
    val rep = JsonCompact.compact(spark, dir.toString)
    assert(rep.mergedFiles == 0 && rep.mergedInto == 0 && rep.untouched == 1)
    val m1 = new java.io.File(dir, "one.json").lastModified
    val rep2 = JsonCompact.compact(spark, dir.toString)
    assert(rep2.mergedFiles == 0 &&
      new java.io.File(dir, "one.json").lastModified == m1)
  }

  test("recluster: ingest-interleaved keys become range-clustered files; zone skipping turns on") {
    val dir = mkDir("jc_recluster")
    // round-robin ingest layout: every file's id range spans the whole
    // domain, so a range predicate can never prune anything
    (0 until 4).foreach { f =>
      put(dir, s"epoch$f.json",
        (1 to 40).filter(_ % 4 == f % 4)
          .map(i => s"""{"id": $i, "s": "v$i"}""").mkString("", "\n", "\n"))
    }
    val before = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString)
    val beforeRows = before.collect().map(_.toString).sorted.toSeq
    val skipsBefore = JsonDocSource.zoneSkippedFiles.get()
    assert(before.where(col("id") >= 31).count() == 10L)
    assert(JsonDocSource.zoneSkippedFiles.get() == skipsBefore,
      "interleaved layout must have nothing provably empty")
    val rep = JsonCompact.recluster(spark, dir.toString, "id",
      targetBytes = 120L)
    assert(rep.rewrittenFiles == 4 && rep.writtenFiles >= 2)
    assert(!new java.io.File(dir, "_compaction").exists,
      "staging dir must be gone after a clean recluster")
    val after = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString)
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows)
    // the filtered COUNT(*) now answers from metadata alone (every
    // clustered file is decided all-match or empty) — zero scan
    val metaCount = after.where(col("id") >= 31).agg(count(lit(1)).as("c"))
    assert(metaCount.collect()(0).getLong(0) == 10L)
    assert(metaCount.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      "clustered files decide the filtered count from zones")
    // a query that must SCAN prunes the out-of-range files
    val skipsMid = JsonDocSource.zoneSkippedFiles.get()
    assert(after.where(col("id") >= 31).select(col("s")).collect().length == 10)
    assert(JsonDocSource.zoneSkippedFiles.get() > skipsMid,
      "clustered layout must prune at least one file on a range probe")
  }

  test("zorderRecluster: files become rectangles — point/range probes on EITHER key prune") {
    val dir = mkDir("jc_zorder")
    // 16×16 grid (x integral, y string with an order-preserving
    // rendering), round-robin interleaved over 8 files: every file
    // spans both full domains, nothing can prune
    // scatter by (x+y)%8 so every file holds all 16 values of BOTH
    // keys (a plain index stride would accidentally cluster y: the
    // grid width is a multiple of the file count)
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield ((x + y) % 8, s"""{"x": $x, "y": "${f"k$y%02d"}", "s": "r$x-$y"}"""))
    (0 until 8).foreach { f =>
      put(dir, f"epoch$f.json",
        grid.filter(_._1 == f).map(_._2).mkString("", "\n", "\n"))
    }
    val before = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString)
    val beforeRows = before.collect().map(_.toString).sorted.toSeq
    val skips0 = JsonDocSource.zoneSkippedFiles.get()
    assert(before.where(col("x") === 3).count() == 16L)
    assert(before.where(col("y") === "k07").select(col("s")).count() == 16L)
    assert(JsonDocSource.zoneSkippedFiles.get() == skips0,
      "interleaved layout must have nothing provably empty")
    val rep = JsonCompact.zorderRecluster(spark, dir.toString, "x", "y",
      targetBytes = 600L)
    assert(rep.rewrittenFiles == 8 && rep.writtenFiles >= 8,
      s"want a multi-file clustered layout, got $rep")
    assert(!new java.io.File(dir, "_compaction").exists,
      "staging dir must be gone after a clean zorderRecluster")
    val after = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString)
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows,
      "zorder rewrite must preserve the row multiset verbatim")
    val files = rep.writtenFiles
    // point probe on X prunes (a SCAN query — project the unprobed col)
    val skipsX = JsonDocSource.zoneSkippedFiles.get()
    assert(after.where(col("x") === 3).select(col("s"))
      .collect().length == 16)
    val prunedX = JsonDocSource.zoneSkippedFiles.get() - skipsX
    assert(prunedX >= files / 2,
      s"x probe pruned only $prunedX of $files files")
    // point probe on Y prunes TOO — the lexicographic counter-case
    val skipsY = JsonDocSource.zoneSkippedFiles.get()
    assert(after.where(col("y") === "k07").select(col("s"))
      .collect().length == 16)
    val prunedY = JsonDocSource.zoneSkippedFiles.get() - skipsY
    assert(prunedY >= files / 2,
      s"y probe pruned only $prunedY of $files files")
    // range probes prune on both dims as well
    val skipsR = JsonDocSource.zoneSkippedFiles.get()
    assert(after.where(col("x") >= 12).select(col("s"))
      .collect().length == 64)
    assert(after.where(col("y") >= "k12").select(col("s"))
      .collect().length == 64)
    assert(JsonDocSource.zoneSkippedFiles.get() - skipsR >= files / 2,
      "range probes pruned too little")
  }

  test("zorderRecluster: null keys and edge lines survive; same-path rejected") {
    val dir = mkDir("jc_zorder_nulls")
    put(dir, "a.json",
      """{"x": 1, "y": 5}""" + "\n" +
        """{"x": 2}""" + "\n" + // missing y → null proxy
        "corrupt {line\n" +
        "\n")
    put(dir, "b.json", """{"x": 3, "y": 1}""")
    val plain = spark.read.format("graftjson").load(dir.toString)
    val beforeRows = plain.collect().map(_.toString).sorted.toSeq
    intercept[IllegalArgumentException](
      JsonCompact.zorderRecluster(spark, dir.toString, "x", "x"))
    val rep = JsonCompact.zorderRecluster(spark, dir.toString, "x", "y",
      targetBytes = 1L << 20)
    assert(rep.rewrittenFiles == 2)
    val after = spark.read.format("graftjson").load(dir.toString)
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows)
  }

  test("recluster: nested dotted key; line edge cases and null keys survive verbatim") {
    val dir = mkDir("jc_recluster_nested")
    put(dir, "a.json",
      """{"id": 1, "meta": {"n": 30}}""" + "\n" +
        """{"id": 2, "meta": {"n": 10}}""" + "\n" +
        "not json at all\n" + // corrupt → null key
        "\n") // blank line unit → null key
    put(dir, "b.json",
      """{"id": 3, "meta": {"n": 20}}""" + "\r\n" + // CRLF
        """{"id": 4}""") // missing meta → null key; no trailing \n
    val plain = spark.read.format("graftjson").load(dir.toString)
    val beforeRows = plain.collect().map(_.toString).sorted.toSeq
    val cnt = plain.count()
    val rep = JsonCompact.recluster(spark, dir.toString, "meta.n",
      targetBytes = 1L << 20)
    assert(rep.rewrittenFiles == 2 && rep.writtenFiles == 1)
    val after = spark.read.format("graftjson").load(dir.toString)
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows)
    assert(after.count() == cnt)
  }

  test("recluster: ineligible or unknown paths fail fast; .gz files are never rewritten") {
    val dir = mkDir("jc_recluster_guard")
    put(dir, "a.json", """{"id": 1, "f": true, "s": "x"}""" + "\n")
    val gzf = new java.io.File(dir, "z.json.gz")
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gzf))
    gz.write("""{"id": 900, "f": false, "s": "gz"}""".getBytes("UTF-8"))
    gz.close()
    gzf.setLastModified(1700000000000L)
    // a boolean leaf: zones can never prune it, so clustering by it is
    // rejected up front
    val e1 = intercept[IllegalArgumentException] {
      JsonCompact.recluster(spark, dir.toString, "f")
    }
    assert(e1.getMessage.contains("cannot prune"))
    val e2 = intercept[IllegalArgumentException] {
      JsonCompact.recluster(spark, dir.toString, "nope")
    }
    assert(e2.getMessage.contains("eligible"))
    val before = rows(dir)
    val rep = JsonCompact.recluster(spark, dir.toString, "id")
    assert(rep.rewrittenFiles == 1)
    assert(gzf.lastModified == 1700000000000L, "gz bytes never rewrite")
    assert(rows(dir) == before)
  }

  test("recluster: stale pre-commit staging debris is cleared by the next maintenance call") {
    val dir = mkDir("jc_recluster_stale")
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n")
    val stage = new java.io.File(dir, "_compaction"); stage.mkdirs()
    // a crashed run's staged file, never committed by any marker:
    // invisible to readers, deleted by the next maintenance call
    put(stage, "recluster-dead-00000.json", """{"id": 666, "s": "ghost"}""" + "\n")
    assert(rows(dir) == Seq((1L: Any, "x": Any)))
    JsonCompact.recluster(spark, dir.toString, "id")
    assert(!new java.io.File(stage, "recluster-dead-00000.json").exists)
    assert(rows(dir) == Seq((1L: Any, "x": Any)))
  }

  test("compact: stale pre-commit staging debris is cleared too") {
    val dir = mkDir("jc_compact_stale")
    put(dir, "a.json", """{"id": 1, "s": "x"}""" + "\n")
    val stage = new java.io.File(dir, "_compaction"); stage.mkdirs()
    // a crashed batch write's staged file (its tag's sweep never ran):
    // compact() — the primary maintenance entry — must remove it, or
    // a compact-only table leaks the crashed job's whole output
    put(stage, "write-deadbeef-p00000-t1.json",
      """{"id": 666, "s": "ghost"}""" + "\n")
    JsonCompact.compact(spark, dir.toString)
    assert(!new java.io.File(stage, "write-deadbeef-p00000-t1.json").exists,
      "compact() must clear pre-commit staging debris")
    assert(rows(dir) == Seq((1L: Any, "x": Any)))
  }

  test("recluster(refreshMeta=true): a fresh planning pass is walk-free") {
    val dir = mkDir("jc_recluster_meta")
    (0 until 3).foreach { f =>
      put(dir, s"e$f.json",
        (1 to 30).filter(_ % 3 == f).map(i => s"""{"id": $i, "s": "v$i"}""")
          .mkString("", "\n", "\n"))
    }
    JsonCompact.recluster(spark, dir.toString, "id",
      targetBytes = 200L, refreshMeta = true)
    JsonDocSource.clearInferCache()
    val walked = JsonDocSource.filesWalked.get()
    val df = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString)
    assert(df.count() == 30L)
    assert(JsonDocSource.filesWalked.get() == walked,
      "post-recluster planning must come from the refreshed durable meta")
  }

  test("COUNT(*) metadata pushdown declines across a compaction (fingerprint drift)") {
    val dir = mkDir("jc_count")
    (1 to 3).foreach(i =>
      put(dir, f"p$i.json", s"""{"id": $i, "s": "v$i"}\n"""))
    val zdf = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString)
    val q0 = zdf.agg(count(lit(1)).as("c"))
    assert(q0.collect()(0).getLong(0) == 3L)
    assert(q0.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    JsonCompact.compact(spark, dir.toString)
    // the load-time fingerprint no longer matches → declines, rescans
    val q1 = zdf.agg(count(lit(1)).as("c"))
    assert(q1.collect()(0).getLong(0) == 3L)
    assert(!q1.queryExecution.executedPlan.toString.contains("PushedAggregation"))
  }

  test("readMarker: a marker that vanishes between exists() and the read is 'already rolled forward'") {
    // the race a streaming tail loses to a concurrent batch commit
    // (suite-context find, r14): exists() sees the marker, the
    // writer's roll-forward deletes it, the read throws FNF — the
    // reader must serve the consistent no-marker answer, never die
    val dir = new java.io.File(graft.TempRoots.path("marker_toctou"))
    dir.mkdirs()
    val root = new org.apache.hadoop.fs.Path(dir.toString)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    JsonCompact.writeMarker(fs, root, JsonCompact.Marker(Seq.empty, Seq("x.json")))
    // a view of the filesystem where the marker is visible to exists()
    // but its bytes are gone by open() — the in-between state
    val racing = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def open(p: org.apache.hadoop.fs.Path,
                        bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
        if (p.getName == "commit")
          throw new java.io.FileNotFoundException(p.toString)
        else super.open(p, bufferSize)
    }
    assert(JsonCompact.readMarker(racing, root).isEmpty)
    // the intact marker still reads through the plain filesystem
    assert(JsonCompact.readMarker(fs, root).exists(_.removes == Seq("x.json")))
    assert(JsonCompact.rollForward(spark, dir.toString))
  }
}
