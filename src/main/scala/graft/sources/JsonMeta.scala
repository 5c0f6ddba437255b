package graft.sources

import graft.types.HType
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Durable planning metadata for graftjson tables — the catalog idea.
  *
  * The in-memory per-file cache makes planning incremental WITHIN a
  * JVM; at 100 TB the table outlives any one cluster, and a fresh
  * driver would re-walk every byte of a 100k-file corpus on first
  * load. `JsonMeta.save(dir)` persists the per-file planning results
  * — (relative path, length, mtime) → (HType, doc count, zone) — as
  * ONE java-serialized blob under `<dir>/_graftjson_meta/cache`
  * (hidden, tmp+rename atomic), and every load consults it for files
  * the memory cache misses. Entries are fingerprinted exactly like
  * the in-memory layer, so stale entries simply miss and only the
  * DIFF since the last save walks: new cluster, same O(changed files)
  * planning cost.
  *
  * Contract notes:
  *   - maintenance writes, readers only read (same division as
  *     compaction markers and `pending_removes`);
  *   - entries are saved with zones, so one save serves both plain
  *     and `zonemaps=true` loads; NDJSON (whole=false) only — whole
  *     mode re-walks (its per-file grain is the file anyway);
  *   - keys are DIR-RELATIVE paths, so a relocated or remounted table
  *     whose files keep (length, mtime) still hits;
  *   - an unreadable/stale-format blob (e.g. the serialized class
  *     shape evolved) is treated as absent — planning falls back to
  *     walking, never to failing;
  *   - `refresh=true` bypasses this layer like every other cache.
  * serialVersionUIDs are deliberately NOT pinned anywhere in the
  * chain (envelope or payload — HType, FieldZone): evolving any of
  * them invalidates old blobs wholesale, which is the safe
  * direction for a cache. */
object JsonMeta {

  private[sources] val MetaDirName = "_graftjson_meta"
  private[sources] val MetaFileName = "cache"

  private case class Entry(len: Long, mtime: Long,
                           result: JsonDocSource.FileResult)
      extends Serializable
  private case class Blob(version: Int, entries: Map[String, Entry])
      extends Serializable
  private val Version = 1

  private def metaPath(root: Path): Path =
    new Path(new Path(root, MetaDirName), MetaFileName)

  // one parse per meta-file fingerprint per JVM: path → (len, mtime,
  // parsed blob or None for unreadable)
  private val parsed =
    scala.collection.mutable.HashMap.empty[String, (Long, Long, Option[Blob])]

  private def readBlob(fs: FileSystem, root: Path): Option[Blob] = {
    val mp = metaPath(root)
    val st = try fs.getFileStatus(mp)
    catch { case _: java.io.FileNotFoundException => return None }
    parsed.synchronized {
      parsed.get(mp.toString) match {
        case Some((l, m, blob)) if l == st.getLen &&
          m == st.getModificationTime => blob
        case _ =>
          val blob =
            try {
              val in = new java.io.ObjectInputStream(fs.open(mp))
              try in.readObject() match {
                case b: Blob if b.version == Version => Some(b)
                case _ => None
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => None }
          parsed.put(mp.toString,
            (st.getLen, st.getModificationTime, blob))
          blob
      }
    }
  }

  /** Serve memory-missed keys from the durable metas of the load
    * roots. Only directory roots can carry a meta; files under a
    * root match by dir-relative path + (len, mtime); whole-mode keys
    * never match (entries are NDJSON-walked). */
  private[sources] def lookup(spark: SparkSession, roots: Seq[String],
                              miss: Seq[JsonDocSource.FileKey])
      : Map[JsonDocSource.FileKey, JsonDocSource.FileResult] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val found = Map.newBuilder[JsonDocSource.FileKey, JsonDocSource.FileResult]
    roots.foreach { r =>
      val root = new Path(r)
      val fs = root.getFileSystem(conf)
      // qualify the root exactly as FileStatus renders file paths so
      // prefix-relativization is rendering-stable
      val q = fs.makeQualified(root).toString
      val prefix = if (q.endsWith("/")) q else q + "/"
      readBlob(fs, fs.makeQualified(root)).foreach { blob =>
        miss.foreach { k =>
          if (!k.whole && k.path.startsWith(prefix)) {
            val rel = k.path.substring(prefix.length)
            blob.entries.get(rel).foreach { e =>
              if (e.len == k.len && e.mtime == k.mtime)
                found += k -> e.result
            }
          }
        }
      }
    }
    found.result()
  }

  /** Walk (or cache-serve) every file under `dir` and persist the
    * per-file planning results. Returns the number of entries saved.
    * Call after ingest/compaction batches; concurrent loads keep
    * reading the previous blob until the atomic rename. */
  def save(spark: SparkSession, dir: String): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(root).toString
    val prefix = if (q.endsWith("/")) q else q + "/"
    val (all, _) = JsonDocSource.inferPerFile(Seq(dir), whole = false,
      refresh = false, zonemaps = true)
    val entries = all.flatMap { case (k, r) =>
      // files outside the root (impossible for a dir load, defensive)
      // or missing zones (cannot happen with zonemaps=true) are
      // dropped rather than saved half-usable
      if (k.path.startsWith(prefix) && r.zone.isDefined)
        Some(k.path.substring(prefix.length) -> Entry(k.len, k.mtime, r))
      else None
    }.toMap
    val mp = metaPath(fs.makeQualified(root))
    fs.mkdirs(mp.getParent)
    val tmp = new Path(mp.getParent, MetaFileName + ".tmp")
    val out = new java.io.ObjectOutputStream(fs.create(tmp, true))
    try out.writeObject(Blob(Version, entries)) finally out.close()
    if (!fs.rename(tmp, mp)) {
      // rename-over-existing fails on some local FS implementations:
      // replace destructively — readers re-parse on fingerprint change
      fs.delete(mp, false)
      if (!fs.rename(tmp, mp))
        throw new IllegalStateException(s"could not publish meta $mp")
    }
    parsed.synchronized { parsed.remove(mp.toString) }
    entries.size
  }

  /** Test hook: drop parsed-blob memos (simulates a fresh JVM). */
  private[sources] def clearParsed(): Unit =
    parsed.synchronized { parsed.clear() }
}
