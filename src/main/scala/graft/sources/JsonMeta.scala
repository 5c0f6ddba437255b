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
  private case class SegBlob(version: Int, entries: Map[String, Entry])
      extends Serializable
  private val Version = 2

  private[sources] case class SegRef(name: String, count: Int,
                                     minKey: String, maxKey: String)

  /** What one save did — `written` is the diff actually serialized
    * (the ∝-diff contract the spec pins), `total` the table's live
    * entry count, `segments` the post-save segment count. */
  final case class SaveReport(total: Int, written: Int, segments: Int,
                              compacted: Boolean)

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
    scala.collection.mutable.HashMap.empty[String, (Long, Long, Option[Seq[SegRef]])]
  private val segments =
    scala.collection.mutable.HashMap.empty[String, Option[Map[String, Entry]]]

  private def readManifest(fs: FileSystem, root: Path): Option[Seq[SegRef]] = {
    val mp = manifestPath(root)
    val st = try fs.getFileStatus(mp)
    catch { case _: java.io.FileNotFoundException => return None }
    manifests.synchronized {
      manifests.get(mp.toString) match {
        case Some((l, m, refs)) if l == st.getLen &&
          m == st.getModificationTime => refs
        case _ =>
          val refs =
            try {
              val text = graft.ops.Fs.readFullyUtf8(fs, mp)
              val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
              val node = mapper.readTree(text)
              if (node.get("version").asInt() != Version) None
              else {
                val segs = Vector.newBuilder[SegRef]
                node.get("segments").elements().forEachRemaining { s =>
                  segs += SegRef(s.get("name").asText(),
                    s.get("count").asInt(),
                    s.get("min").asText(), s.get("max").asText())
                }
                Some(segs.result())
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          manifests.put(mp.toString,
            (st.getLen, st.getModificationTime, refs))
          refs
      }
    }
  }

  private def writeManifest(fs: FileSystem, root: Path,
                            refs: Seq[SegRef]): Unit = {
    val mp = manifestPath(root)
    fs.mkdirs(mp.getParent)
    val tmp = new Path(mp.getParent, ManifestName + ".tmp")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("version", Version)
    val arr = rootNode.putArray("segments")
    refs.foreach { r =>
      val o = arr.addObject()
      o.put("name", r.name); o.put("count", r.count)
      o.put("min", r.minKey); o.put("max", r.maxKey)
    }
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(rootNode)) finally out.close()
    if (!fs.rename(tmp, mp)) {
      // rename-over-existing fails on some local FS implementations:
      // replace destructively — readers re-parse on fingerprint change
      fs.delete(mp, false)
      if (!fs.rename(tmp, mp))
        throw new IllegalStateException(s"could not publish manifest $mp")
    }
    manifests.synchronized { manifests.remove(mp.toString) }
  }

  private def readSegment(fs: FileSystem, root: Path,
                          name: String): Option[Map[String, Entry]] = {
    val sp = new Path(metaDir(root), name)
    segments.synchronized {
      segments.getOrElseUpdate(sp.toString,
        try {
          val in = new SafeObjectInputStream(fs.open(sp))
          try in.readObject() match {
            case b: SegBlob if b.version == Version => Some(b.entries)
            case _ => None
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => None })
    }
  }

  private def writeSegment(fs: FileSystem, root: Path,
                           entries: Map[String, Entry]): SegRef = {
    val name = s"seg-${java.util.UUID.randomUUID().toString.take(12)}.bin"
    val sp = new Path(metaDir(root), name)
    fs.mkdirs(sp.getParent)
    // no tmp dance needed: the file is invisible until a manifest
    // references it, and names are never reused
    val out = new java.io.ObjectOutputStream(fs.create(sp, true))
    try out.writeObject(SegBlob(Version, entries)) finally out.close()
    val keys = entries.keys
    SegRef(name, entries.size, keys.min, keys.max)
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
      readManifest(fs, root).foreach { refs =>
        // rel key → original FileKey, for the misses under this root
        var wanted: Map[String, JsonDocSource.FileKey] = miss.iterator
          .filter(k => !k.whole && k.path.startsWith(prefix))
          .map(k => k.path.substring(prefix.length) -> k).toMap
        refs.reverseIterator.foreach { ref =>
          if (wanted.nonEmpty &&
            wanted.keysIterator.exists(k =>
              ref.minKey <= k && k <= ref.maxKey)) {
            readSegment(fs, root, ref.name).foreach { entries =>
              wanted.foreach { case (rel, k) =>
                entries.get(rel).foreach { e =>
                  if (e.len == k.len && e.mtime == k.mtime)
                    found += k -> e.result
                  // served OR superseded-stale: either way this key's
                  // answer came from the newest segment holding it —
                  // older segments must not resurrect an older entry
                  wanted -= rel
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
    val refs = readManifest(fs, root).getOrElse(Seq.empty)
    // union of live segments, later wins — only fingerprints matter
    // for the diff, so stale entries compare unequal and re-serialize
    val persisted: Map[String, Entry] = refs.iterator
      .flatMap(ref => readSegment(fs, root, ref.name).iterator)
      .foldLeft(Map.empty[String, Entry])(_ ++ _)
    val diff = current.filter { case (k, e) =>
      !persisted.get(k).exists(p => p.len == e.len && p.mtime == e.mtime)
    }
    // drop the pre-segmentation blob if one lingers (format v1)
    val legacy = new Path(metaDir(root), "cache")
    if (fs.exists(legacy)) fs.delete(legacy, false)
    if (diff.isEmpty && refs.nonEmpty && refs.size <= MaxSegments)
      return SaveReport(current.size, 0, refs.size, compacted = false)
    val compacting = refs.size >= MaxSegments
    val (newRefs, written) =
      if (compacting || refs.isEmpty) {
        // one segment holding exactly the live table (drops deleted
        // files' entries and every superseded duplicate)
        if (current.isEmpty) (Seq.empty[SegRef], 0)
        else (Seq(writeSegment(fs, root, current)), current.size)
      } else
        (refs :+ writeSegment(fs, root, diff), diff.size)
    writeManifest(fs, root, newRefs)
    if (compacting) {
      // unreferenced segments die AFTER the manifest commit — a
      // reader on the old manifest degrades to a walk, never fails.
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
      compacted = compacting)
  }

  /** Test hook: drop parsed memos (simulates a fresh JVM). */
  private[graft] def clearParsed(): Unit = {
    manifests.synchronized { manifests.clear() }
    segments.synchronized { segments.clear() }
  }
}
