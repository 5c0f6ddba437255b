package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.streaming.ReadLimit

import scala.util.Random

/** Differential fuzz harness for the change-feed STREAMING source
  * (r15 — the [[JsonMetaFuzzSpec]] tradition applied to
  * `startingSave`): random append/save/vacuum lifecycles interleaved
  * with randomly rate-limited triggers and RESTARTS at arbitrary
  * points, against a locally tracked model that never consults the
  * engine's resolution.
  *
  * The model (files are immutable here — appends only, so name ⇒
  * fingerprint): the baseline is pinned at the FIRST successful
  * resolution (the files live at `startingSave`), and the stream owes
  * exactly `everWritten − baseline`, each file EXACTLY ONCE across
  * every restart, with catch-up batches never mixing saves. A vacuum
  * that prunes the starting save may kill a stream that has not yet
  * durably completed catch-up — but only LOUDLY with the named
  * retention/squash classes, and only at a fresh resolution (a
  * cdc-done stream must keep running); whatever was emitted before
  * the loud end must still be exactly-once.
  *
  * Checks are file-level against the stream's own batch logs (the
  * replay source of truth): row-level parity is the batch reader's
  * contract, pinned elsewhere — what THIS surface owns is admission
  * exactly-once under restart, baseline durability, and completion
  * monotonicity. */
class CdcStreamFuzzSpec extends SparkTestBase {

  // widened one-off audits (the r15 convention): GRAFT_CDC_FUZZ_TRIALS=N
  private val Trials =
    sys.env.getOrElse("GRAFT_CDC_FUZZ_TRIALS", "40").toInt

  private def runTrial(t: Int): (Int, Boolean, Boolean) = {
    val dirF = new java.io.File(graft.TempRoots.path(s"cdc_fuzz_$t"))
    dirF.mkdirs()
    val dir = dirF.toString
    val ckpt = graft.TempRoots.path(s"cdc_fuzz_ckpt_$t")
    val r = new Random(9100 + t)
    var nFiles = 0
    var clock = System.currentTimeMillis() - 3600L * 1000L
    def writeFile(): String = {
      nFiles += 1
      val name = f"f$nFiles%03d.json"
      val w = new java.io.PrintWriter(new java.io.File(dirF, name))
      (0 until (1 + r.nextInt(3))).foreach(i =>
        w.println(s"""{"id": ${(nFiles % 90) + 1}, "s": "v$nFiles-$i"}"""))
      w.close()
      clock += 1000
      assert(new java.io.File(dirF, name).setLastModified(clock))
      name
    }
    def liveNames(): Set[String] =
      Option(dirF.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(_.getName).toSet

    // initial history: 2-4 saved batches; start from the OLDEST save
    // half the time so catch-up has real work (a startFrom at head
    // completes at construction and the vacuum interplay never fires)
    (0 until (2 + r.nextInt(3))).foreach { _ =>
      writeFile(); JsonMeta.save(spark, dir)
    }
    val saves0 = JsonMeta.saves(spark, dir)
    val startFrom =
      if (r.nextBoolean()) saves0.head else saves0(r.nextInt(saves0.size))
    // model: immutable files ⇒ the baseline is exactly the files live
    // at the chosen save (reconstruct from the engine-independent
    // fact that files f001..fK existed at the K-th save — each save
    // here follows exactly one write)
    // (save ids are 1-based and minted one per changed state)
    val baseline: Set[String] =
      (1 to startFrom.toInt).map(i => f"f$i%03d.json").toSet

    val (ht, _, _) = JsonDocSource.inferCached(Seq(dir), whole = false)
    val sch = JsonDocSource.sparkSchemaOf(ht)
    def mkStream() = new JsonDocMicroBatchStream(spark, ckpt, Seq(dir),
      whole = false, ht, sch, sch, Array.empty, None, None, None,
      Some(startFrom))

    val logDir = new Path(ckpt, JsonDocMicroBatchStream.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def admittedByLog(): Seq[Seq[String]] =
      JsonDocMicroBatchStream.logIds(fs, logDir).map(id =>
        JsonDocMicroBatchStream.readLog(fs, logDir, id)
          .map(e => e.path.substring(e.path.lastIndexOf('/') + 1)))

    // biased to ONE file per trigger: slow catch-up is what leaves
    // the restart×vacuum window open
    def randomLimit(): ReadLimit = r.nextInt(4) match {
      case 0 => ReadLimit.allAvailable()
      case 1 | 2 => ReadLimit.maxFiles(1)
      case _ => ReadLimit.maxBytes(1L + r.nextInt(64))
    }

    var endedLoud = false
    // either verb can legitimately prune the starting save: explicit
    // vacuum, or the MaxSegments auto-squash a long save history hits
    var vacuumed = false
    var sawSquash = false
    var st =
      try mkStream()
      catch {
        case e: IllegalStateException
            if e.getMessage.contains("vacuum retention") ||
              e.getMessage.contains("no longer reconstructible") =>
          endedLoud = true; null
      }
    var off = if (st == null) null else st.initialOffset()
    var steps = 0
    while (!endedLoud && steps < 25) {
      steps += 1
      r.nextInt(10) match {
        case 0 | 1 | 2 =>
          off = st.latestOffset(off, randomLimit())
        case 3 | 4 =>
          writeFile()
          if (r.nextBoolean()) {
            val rep = JsonMeta.save(spark, dir)
            sawSquash = sawSquash || rep.compacted
          }
        case 5 | 6 | 7 =>
          // RESTART at an arbitrary point: logs + baseline + cdc-done
          // are the only durable state
          try { st = mkStream(); off = st.initialOffset() }
          catch {
            case e: IllegalStateException
                if e.getMessage.contains("vacuum retention") ||
                  e.getMessage.contains("no longer reconstructible") =>
              // only legal when the starting save is really gone
              // (vacuum horizon or auto-squash) AND catch-up had not
              // durably completed
              assert(vacuumed || sawSquash,
                s"trial $t: loud resolution with history intact")
              assert(!fs.exists(new Path(logDir,
                JsonDocMicroBatchStream.CdcDoneName)),
                s"trial $t: a COMPLETED stream re-resolved and died: " +
                  e.getMessage)
              endedLoud = true
          }
        case 8 | 9 =>
          if (JsonMeta.saves(spark, dir).nonEmpty) {
            val rep = JsonMeta.vacuum(spark, dir,
              retainSaves = 1 + r.nextInt(2))
            vacuumed = vacuumed || rep.horizon > startFrom
          }
      }
    }
    if (!endedLoud) {
      // drain: everything owed must admit with no further writes
      var prev = ""
      var spins = 0
      while (off.json != prev && spins < 40) {
        prev = off.json
        off = st.latestOffset(off, ReadLimit.allAvailable())
        spins += 1
      }
      assert(fs.exists(new Path(logDir,
        JsonDocMicroBatchStream.CdcDoneName)),
        s"trial $t: drained stream never committed cdc-done")
    }
    // EXACTLY-ONCE across all restarts: the union of batch logs —
    // duplicate admission anywhere in the lifecycle is a failure even
    // for a loudly-ended stream
    val batches = admittedByLog()
    val admitted = batches.flatten
    assert(admitted.size == admitted.toSet.size,
      s"trial $t: a file was admitted twice: " +
        admitted.groupBy(identity).filter(_._2.size > 1).keys.take(3))
    assert((admitted.toSet & baseline).isEmpty,
      s"trial $t: baseline leaked into the feed: " +
        (admitted.toSet & baseline).take(3))
    val owed = liveNames() -- baseline
    if (!endedLoud)
      assert(admitted.toSet == owed,
        s"trial $t: admitted ${admitted.size} vs owed ${owed.size} " +
          s"(missing ${(owed -- admitted.toSet).take(3)}, " +
          s"extra ${(admitted.toSet -- owed).take(3)})")
    else
      assert(admitted.toSet.subsetOf(owed),
        s"trial $t: loud-ended stream admitted outside the owed set")
    // the durable baseline file records exactly the model's baseline
    val bp = new Path(logDir, JsonDocMicroBatchStream.CdcBaselineName)
    if (fs.exists(bp)) {
      val recorded = JsonDocMicroBatchStream.readEntriesFile(fs, bp)
        .map(e => e.path.substring(e.path.lastIndexOf('/') + 1)).toSet
      assert(recorded == baseline,
        s"trial $t: baseline file $recorded vs model $baseline")
    }
    (batches.size, endedLoud, !endedLoud)
  }

  test("40 randomized startingSave lifecycles with arbitrary restarts: exactly-once admission, pinned baseline, loud-only endings") {
    var batches = 0; var loud = 0; var drained = 0
    (0 until Trials).foreach { t =>
      val (b, l, d) = runTrial(t)
      batches += b
      if (l) loud += 1
      if (d) drained += 1
    }
    info(s"cdc stream fuzz: $Trials trials, $batches batches, " +
      s"$loud loud endings, $drained drained")
    // non-vacuous BOTH ways: the sweep must both drain cleanly and
    // hit the vacuumed-mid-catch-up loud ending
    assert(drained >= 10, s"only $drained trials drained")
    assert(loud >= 1, s"the vacuum x restart window never fired")
    assert(batches >= 80, s"only $batches batches admitted")
  }

  // ---------------------------------------------------------------
  // MUTATING sweep (r16 — VERDICT r15 #3): the first sweep's model
  // assumes immutable files; this one races deletes, in-place
  // rewrites, and COMPACTION (the maintenance rewrite) against a
  // cdcDeletes catch-up stream with arbitrary restarts. The tracked
  // contract: every ending is either a CLEAN drain whose batch-log
  // mirror replay (baseline ∪ retract/apply in log order) equals the
  // live table's fingerprints exactly, or a LOUD end in a NAMED
  // reader-vs-maintenance class — a stale-fingerprint admission that
  // silently reads rewritten bytes would surface as a mirror diff or
  // a duplicated (path, len, mtime) admission.
  // ---------------------------------------------------------------

  /** Loud classes a MUTATING lifecycle may legitimately end with.
    * The last entry is reachable only from the OPERATOR sweep below:
    * `CdcMirror.init` seeds with an `asOfSave` read, whose named
    * failure when a rewrite reused a historical name is part of the
    * asOf fail-loud contract (JsonMeta.asOfListing). */
  private val mutLoud = Seq(
    "vacuum retention", "no longer reconstructible", "cannot be resolved",
    "physically removed", "drifted from its save-time",
    "tailed directories are append-only",
    "must not run on a tailed directory", "has no save",
    "name was reused after the historical bytes")

  private def loudClass(e: Throwable): Option[String] =
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(x => Option(x.getMessage))
      .flatMap(m => mutLoud.filter(m.contains)).toSeq.headOption

  private def runMutTrial(t: Int): (Int, Option[String], Int) = {
    val dirF = new java.io.File(graft.TempRoots.path(s"cdc_mfuzz_$t"))
    dirF.mkdirs()
    val dir = dirF.toString
    val ckpt = graft.TempRoots.path(s"cdc_mfuzz_ckpt_$t")
    val r = new Random(9400 + t)
    var nFiles = 0
    var rowId = 0
    var clock = System.currentTimeMillis() - 3600L * 1000L
    def writeName(name: String): Unit = {
      new java.io.File(dirF, s".$name.crc").delete()
      val w = new java.io.PrintWriter(new java.io.File(dirF, name))
      (0 until (1 + r.nextInt(3))).foreach { _ =>
        rowId += 1
        w.println(s"""{"id": $rowId, "s": "m$rowId"}""")
      }
      w.close()
      clock += 1000
      assert(new java.io.File(dirF, name).setLastModified(clock))
    }
    def addFile(): Unit = { nFiles += 1; writeName(f"f$nFiles%03d.json") }
    def liveEntries(): Map[String, (Long, Long)] =
      Option(dirF.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    def deleteOne(): Unit = {
      val live = liveEntries().keys.toSeq.sorted
      if (live.size > 1) {
        val victim = live(r.nextInt(live.size))
        assert(new java.io.File(dirF, victim).delete())
        new java.io.File(dirF, s".$victim.crc").delete()
        JsonMeta.save(spark, dir)
        ()
      }
    }
    def rewriteOne(save: Boolean): Unit = {
      val live = liveEntries().keys.toSeq.sorted
      writeName(live(r.nextInt(live.size)))
      if (save) JsonMeta.save(spark, dir)
      ()
    }
    addFile(); JsonMeta.save(spark, dir)
    // COMMITTED pre-stream history: the mutations catch-up must replay
    // cleanly (deletes → retractions, rewrites/compaction → the
    // newest-form adds)
    (0 until (2 + r.nextInt(5))).foreach { _ =>
      r.nextInt(6) match {
        case 0 | 1 | 2 => addFile(); JsonMeta.save(spark, dir)
        case 3 => deleteOne()
        case 4 => rewriteOne(save = true)
        case 5 => JsonCompact.compact(spark, dir,
          targetBytes = 4L << 10, refreshMeta = true)
      }
    }
    val saves0 = JsonMeta.saves(spark, dir)
    val startFrom =
      if (r.nextBoolean()) saves0.head else saves0(r.nextInt(saves0.size))
    // half the trials run CHAOS (mutations racing the live stream —
    // loud-prone by design); the rest mutate only before the stream,
    // so the drain must land the mirror equation exactly
    val chaos = r.nextBoolean()
    val (ht, _, _) = JsonDocSource.inferCached(Seq(dir), whole = false)
    val sch = JsonDocSource.sparkSchemaOf(ht)
    def mkStream() = new JsonDocMicroBatchStream(spark, ckpt, Seq(dir),
      whole = false, ht, sch, sch, Array.empty, None, None, None,
      Some(startFrom), appendFilePath = false, cdcDeletes = true)
    def randomLimit(): ReadLimit = r.nextInt(4) match {
      case 0 => ReadLimit.allAvailable()
      case 1 | 2 => ReadLimit.maxFiles(1)
      case _ => ReadLimit.maxBytes(1L + r.nextInt(64))
    }
    var endedLoud: Option[String] = None
    def loudly[A](body: => A): Option[A] =
      try Some(body) catch {
        case e: Exception if endedLoud.isEmpty =>
          loudClass(e) match {
            case Some(k) => endedLoud = Some(k); None
            case None => throw e
          }
      }
    var st = loudly(mkStream()).orNull
    var off = if (st == null) null else st.initialOffset()
    var steps = 0
    while (endedLoud.isEmpty && steps < 25) {
      steps += 1
      r.nextInt(12) match {
        case 0 | 1 | 2 | 3 | 4 =>
          loudly { off = st.latestOffset(off, randomLimit()) }
        case 5 | 6 =>
          addFile()
          if (r.nextBoolean()) JsonMeta.save(spark, dir)
        case 7 => // delete racing the stream (chaos only): a consumed
          // file disappearing must end LOUDLY, never lose rows
          if (chaos) deleteOne()
        case 8 => // rewrite racing the stream (chaos only); save on a
          // coin — an UNSAVED rewrite is the raw drift the admission
          // guard must catch
          if (chaos) rewriteOne(save = r.nextBoolean())
        case 9 => // compaction: the MAINTENANCE rewrite mid-replay
          if (chaos) loudly { JsonCompact.compact(spark, dir,
            targetBytes = 4L << 10, refreshMeta = true) }
        case 10 =>
          if (chaos) loudly { JsonMeta.vacuum(spark, dir,
            retainSaves = 1 + r.nextInt(2)) }
        case 11 => // restart at an arbitrary point
          loudly { st = mkStream(); off = st.initialOffset() }
      }
    }
    if (endedLoud.isEmpty) {
      var prev = ""
      var spins = 0
      while (endedLoud.isEmpty && off.json != prev && spins < 40) {
        prev = off.json
        loudly { off = st.latestOffset(off, ReadLimit.allAvailable()) }
        spins += 1
      }
    }
    // ---- invariants, loud or clean ----
    val logDir = new Path(ckpt, JsonDocMicroBatchStream.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = JsonDocMicroBatchStream.logIds(fs, logDir).flatMap(id =>
      JsonDocMicroBatchStream.readLog(fs, logDir, id))
    val addKeys = entries.filter(_.len >= 0L)
      .map(e => (e.path, e.len, e.mtime))
    assert(addKeys.size == addKeys.toSet.size,
      s"trial $t: duplicated admission " +
        addKeys.groupBy(identity).filter(_._2.size > 1).keys.take(3))
    val rmKeys = entries.filter(_.len < 0L).map(e => (e.mtime, e.path))
    assert(rmKeys.size == rmKeys.toSet.size,
      s"trial $t: duplicated retraction " +
        rmKeys.groupBy(identity).filter(_._2.size > 1).keys.take(3))
    val bp = new Path(logDir, JsonDocMicroBatchStream.CdcBaselineName)
    val baseline =
      if (fs.exists(bp)) JsonDocMicroBatchStream.readEntriesFile(fs, bp)
      else Seq.empty
    // no fingerprint-level baseline leak: what the consumer already
    // holds is never re-admitted in the same form
    val baseKeys = baseline.map(e => (e.path, e.len, e.mtime)).toSet
    assert(addKeys.forall(k => !baseKeys.contains(k)),
      s"trial $t: baseline fingerprint re-admitted")
    // ---- clean drain: the batch-log mirror replay equals live ----
    if (endedLoud.isEmpty) {
      def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
      var state: Map[String, (Long, Long)] =
        baseline.map(e => base(e.path) -> ((e.len, e.mtime))).toMap
      entries.foreach { e =>
        if (e.len < 0L) state -= base(e.path)
        else state += base(e.path) -> ((e.len, e.mtime))
      }
      val live = liveEntries()
      assert(state == live,
        s"trial $t: mirror replay diverged from live " +
          s"(missing ${(live.keySet -- state.keySet).take(3)}, " +
          s"extra ${(state.keySet -- live.keySet).take(3)}, " +
          s"drifted ${live.keySet.filter(k =>
            state.get(k).exists(_ != live(k))).take(3)})")
    }
    (entries.count(_.len < 0L), endedLoud,
      JsonDocMicroBatchStream.logIds(fs, logDir).size)
  }

  test("40 randomized lifecycles with deletes/rewrites/compaction racing catch-up: clean mirror replay or a NAMED loud end") {
    var retractions = 0; var batches = 0; var clean = 0
    val loudByClass = scala.collection.mutable.Map.empty[String, Int]
    (0 until Trials).foreach { t =>
      val (rm, loud, b) = runMutTrial(t)
      retractions += rm; batches += b
      loud match {
        case Some(k) => loudByClass(k) = loudByClass.getOrElse(k, 0) + 1
        case None => clean += 1
      }
    }
    info(s"cdc mutation fuzz: $Trials trials, $batches batches, " +
      s"$retractions retractions, $clean clean, loud=$loudByClass")
    // non-vacuous in every direction that matters: clean drains whose
    // mirror equation actually ran, real retractions emitted, and the
    // rewrite-drift family actually fired
    assert(clean >= 5, s"only $clean trials drained cleanly")
    assert(retractions >= 10, s"only $retractions retractions emitted")
    assert(loudByClass.nonEmpty, "no loud endings — the race never raced")
  }

  // ---------------------------------------------------------------
  // OPERATOR sweep (r17 — VERDICT r16 #3): the mutating sweep above
  // replays the batch LOGS; this one drives the real consumer —
  // [[graft.ops.CdcMirror.apply]] through an actual foreachBatch
  // streaming query — across random lifecycles with committed
  // deletes/rewrites/compaction, PARTIAL drains (the query is stopped
  // mid-catch-up, so restarts replay batches against the parquet
  // mirror — the foreachBatch idempotence contract under real
  // interruption), and chaos-mode mutations between cycles. After
  // every clean drain the mirror's ROWS must equal an
  // ENGINE-INDEPENDENT ground truth: the table's NDJSON bytes parsed
  // directly with Jackson (never the engine's own reader).
  // ---------------------------------------------------------------

  private val MirrorTrials =
    sys.env.getOrElse("GRAFT_CDC_MIRROR_FUZZ_TRIALS", "10").toInt

  /** Every (id, s) row currently on disk, parsed straight from the
    * NDJSON bytes — the ground truth the mirror must land on. */
  private def parsedRows(dirF: java.io.File): Seq[(Long, String)] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    Option(dirF.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().filter(_.trim.nonEmpty).map { ln =>
          val n = om.readTree(ln)
          (n.get("id").asLong, n.get("s").asText)
        }.toVector finally src.close()
      }.toSeq.sorted
  }

  private def mirrorRows(mirror: String): Seq[(Long, String)] = {
    import org.apache.spark.sql.functions.col
    val df = graft.ops.CdcMirror.read(spark, mirror)
    if (!df.schema.fieldNames.contains("id")) Seq.empty
    else df.select(col("id").cast("long"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  /** @return (loud class if any, retraction entries applied, whether a
    *         partial — interrupted — drain happened) */
  private def runMirrorTrial(t: Int): (Option[String], Int, Boolean) = {
    val dirF = new java.io.File(graft.TempRoots.path(s"cdc_opfuzz_$t"))
    dirF.mkdirs()
    val dir = dirF.toString
    val mirror = graft.TempRoots.path(s"cdc_opfuzz_mirror_$t")
    val ckpt = graft.TempRoots.path(s"cdc_opfuzz_ckpt_$t")
    val r = new Random(9700 + t)
    var nFiles = 0
    var rowId = 0
    var clock = System.currentTimeMillis() - 3600L * 1000L
    def writeName(name: String): Unit = {
      new java.io.File(dirF, s".$name.crc").delete()
      val w = new java.io.PrintWriter(new java.io.File(dirF, name))
      (0 until (1 + r.nextInt(3))).foreach { _ =>
        rowId += 1
        w.println(s"""{"id": $rowId, "s": "m$rowId"}""")
      }
      w.close()
      clock += 1000
      assert(new java.io.File(dirF, name).setLastModified(clock))
    }
    def addFile(): Unit = { nFiles += 1; writeName(f"f$nFiles%03d.json") }
    def liveNames(): Seq[String] =
      Option(dirF.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(_.getName).toSeq.sorted
    def deleteOne(): Unit = {
      val live = liveNames()
      if (live.size > 1) {
        val victim = live(r.nextInt(live.size))
        assert(new java.io.File(dirF, victim).delete())
        new java.io.File(dirF, s".$victim.crc").delete()
        JsonMeta.save(spark, dir)
        ()
      }
    }
    def rewriteOne(save: Boolean): Unit = {
      val live = liveNames()
      writeName(live(r.nextInt(live.size)))
      if (save) JsonMeta.save(spark, dir)
      ()
    }
    // base table, appends only — the mirror seeds at its LATEST save
    // (the real operator's contract: init needs the save's bytes
    // LIVE, and graftjson reclaims replaced bytes eagerly, so a
    // mirror always seeds at — or near — the head; first harness
    // draft learned this by dying at init 5 trials out of 10)
    // few enough saves that the MaxSegments auto-squash stays a rare
    // chaos-path ending instead of the dominant one
    (0 until (2 + r.nextInt(2))).foreach { _ =>
      addFile(); JsonMeta.save(spark, dir)
    }
    val startFrom = JsonMeta.saves(spark, dir).last
    val chaos = r.nextBoolean()
    var endedLoud: Option[String] = None
    def loudly[A](body: => A): Option[A] =
      try Some(body) catch {
        case e: Exception if endedLoud.isEmpty =>
          loudClass(e) match {
            case Some(k) => endedLoud = Some(k); None
            case None => throw e
          }
      }
    loudly(graft.ops.CdcMirror.init(spark, dir, mirror, startFrom))
    // committed history ABOVE the seed — the catch-up's replay
    // material, with at least one delete and one rewrite so real
    // retractions always flow through the operator
    deleteOne(); rewriteOne(save = true)
    (0 until r.nextInt(3)).foreach { _ =>
      r.nextInt(6) match {
        case 0 | 1 | 2 => addFile(); JsonMeta.save(spark, dir)
        case 3 => deleteOne()
        case 4 => rewriteOne(save = true)
        case 5 => JsonCompact.compact(spark, dir,
          targetBytes = 4L << 10, refreshMeta = true)
      }
    }
    var partials = 0
    // one sync cycle = one real AvailableNow streaming query feeding
    // CdcMirror.apply; a PARTIAL cycle stops the query mid-drain —
    // the restart's batch replay against the half-applied mirror is
    // exactly the exactly-once-by-idempotence contract under test
    def sync(full: Boolean, quick: Boolean = false): Unit = {
      val q = spark.readStream.format("graftjson")
        .option("startingSave", startFrom.toString)
        .option("cdcDeletes", "true")
        .option("maxFilesPerTrigger", (1 + r.nextInt(2)).toString)
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.ops.CdcMirror.apply(b, mirror))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        if (full) q.awaitTermination()
        // a QUICK cycle waits far less than query startup + one batch
        // costs on any host, so the interrupted>=1 tally cannot go
        // vacuous on a fast machine (self-review r17)
        else if (!q.awaitTermination(
          if (quick) 60 else 250 + r.nextInt(500))) partials += 1
      } catch {
        case e: Exception if Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).exists(x => Option(x.getMessage)
            .exists(_.contains("should be empty on batch 0"))) =>
          // Spark's own guard against an AMBIGUOUS empty checkpoint
          // (STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY): a stop that
          // interrupts the FIRST offset write leaves only tmp debris
          // in offsets/, and every restart then refuses with this
          // named error — full-suite-load find, r17. The recovery is
          // the message's own instruction: clean the location. Batch
          // 0 never committed (the guard fires only when no VALID
          // offset exists), so removing the offsets debris loses
          // nothing; the cdc baseline and batch logs live in their
          // own directory.
          val od = new java.io.File(ckpt, "offsets")
          Option(od.listFiles()).getOrElse(Array.empty)
            .foreach(f => { f.delete(); () })
          od.delete()
          ()
      } finally {
        // stop() on an already-failed query can rethrow its exception;
        // a swallowed failure here re-fires at the next cycle (the
        // drift guards run per trigger) or fails the final comparison
        try q.stop() catch { case _: Throwable => () }
      }
    }
    var steps = 0
    while (endedLoud.isEmpty && steps < 5) {
      steps += 1
      r.nextInt(6) match {
        case 0 | 1 =>
          addFile()
          if (r.nextBoolean()) { JsonMeta.save(spark, dir); () }
        case 2 => if (chaos) deleteOne()
        case 3 => if (chaos) rewriteOne(save = r.nextBoolean())
        case 4 => if (chaos) loudly { JsonCompact.compact(spark, dir,
          targetBytes = 4L << 10, refreshMeta = true) }
        case 5 => ()
      }
      loudly(sync(full = steps > 1 && r.nextInt(3) == 0,
        quick = steps == 1))
    }
    if (endedLoud.isEmpty) loudly(sync(full = true))
    if (endedLoud.isEmpty) {
      val truth = parsedRows(dirF)
      val got = mirrorRows(mirror)
      assert(got == truth,
        s"trial $t: mirror diverged from the parsed table " +
          s"(mirror ${got.size} rows vs truth ${truth.size}; " +
          s"missing ${(truth.toSet -- got.toSet).take(3)}, " +
          s"extra ${(got.toSet -- truth.toSet).take(3)})")
    }
    // a REAL query nests the source's checkpoint under sources/0
    // (Spark's per-source slot) — unlike the directly-constructed
    // streams of the two harnesses above
    val logDir = new Path(new Path(ckpt, "sources/0"),
      JsonDocMicroBatchStream.LogDirName)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retractions =
      try JsonDocMicroBatchStream.logIds(fs, logDir)
        .flatMap(id => JsonDocMicroBatchStream.readLog(fs, logDir, id))
        .count(_.len < 0L)
      catch { case _: Throwable => 0 }
    (endedLoud, retractions, partials > 0)
  }

  test("operator fuzz: the REAL CdcMirror.apply under random lifecycles, partial drains, and chaos mutations lands the parsed-bytes ground truth or ends loudly") {
    var clean = 0; var retractions = 0; var interrupted = 0
    val loudByClass = scala.collection.mutable.Map.empty[String, Int]
    (0 until MirrorTrials).foreach { t =>
      val (loud, rm, part) = runMirrorTrial(t)
      retractions += rm
      if (part) interrupted += 1
      loud match {
        case Some(k) => loudByClass(k) = loudByClass.getOrElse(k, 0) + 1
        case None => clean += 1
      }
    }
    info(s"cdc mirror operator fuzz: $MirrorTrials trials, $clean clean, " +
      s"$retractions retractions, $interrupted interrupted, " +
      s"loud=$loudByClass")
    // non-vacuous both ways (the JsonMetaFuzzSpec convention): real
    // ground-truth comparisons ran, real retractions flowed through
    // the operator, real interrupted drains forced batch replays, and
    // the chaos branch actually ended loudly at least once
    assert(clean >= 3, s"only $clean trials compared the mirror")
    assert(retractions >= 5, s"only $retractions retractions applied")
    assert(interrupted >= 1, "no partial drain ever interrupted a query")
    assert(loudByClass.nonEmpty, "chaos never produced a loud ending")
  }
}
