package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Single-writer ENFORCEMENT for graftjson tables (VERDICT r12 #2).
  *
  * The store-wide contract has always been "one writer; maintenance
  * must not run concurrently" ([[JsonDocWrite]] scaladoc) — but until
  * now nothing enforced it, and two concurrent writers (or a write
  * racing a compact) corrupt silently: they share the one
  * `_compaction/commit` marker slot, and [[JsonCompact.clearStaleStage]]
  * legitimately sweeps staging debris that a concurrent writer still
  * references. That is the one crash class the marker protocols cannot
  * see, because both participants follow their own protocol correctly.
  *
  * The lease is a file at `_compaction/lease` holding an owner token;
  * its MTIME is the heartbeat. Every mutating entry point —
  * `df.write.format("graftjson")` (staging through commit), the
  * streaming sink's epoch commits, [[JsonCompact.compact]],
  * [[JsonCompact.recluster]], and
  * [[graft.streaming.EventStreams.ingestEpoch]] — acquires it first
  * and fails LOUDLY (with the holder's token in the message) when
  * another owner holds it fresh. A holder that crashed leaves a lease
  * whose mtime goes stale; the next acquirer takes over once the TTL
  * passes (the crashed run's committed work was already protected by
  * the marker protocol; its pre-commit staging is debris the next
  * maintenance sweeps).
  *
  * This is advisory locking on filesystem primitives: `create(path,
  * overwrite=false)` is the atomic claim (HDFS/object-store rename
  * semantics), a read-back verifies the claim, and [[Handle
  * .verifyHeld]] re-checks at the commit point so a post-TTL usurper
  * makes the original owner ABORT instead of double-committing. It
  * turns silent corruption into a loud error — the strongest guarantee
  * buildable without a coordination service, and the standard
  * lakehouse answer (Delta/Iceberg on S3 make the same trade).
  *
  * Readers never touch the lease (reads stay lock-free through the
  * marker protocol, exactly as before). */
private[graft] object JsonLease {

  private[sources] val LeaseFileName = "lease"

  /** All lease-file I/O goes through the RAW filesystem: a local
    * `ChecksumFileSystem` keeps a `.crc` sidecar that is NOT updated
    * atomically with the file, and the lease is the one file that is
    * legitimately created/deleted by RACING processes — an interleaved
    * create/delete leaves a stale sidecar, every later read throws
    * ChecksumException (an IOException), release() then reads "not
    * mine" and LEAKS the lease, wedging the table until the TTL
    * (found by JsonLeaseRaceSpec, r14). Distributed stores (HDFS,
    * object stores) have no client-side sidecar and are unaffected;
    * bypassing checksums on a <100-byte advisory file loses nothing —
    * the read-back and verifyHeld token compares are the integrity
    * check. */
  private[sources] def rawFs(fs: FileSystem): FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  /** Default staleness TTL: long enough that a real maintenance cycle
    * heartbeats before expiry, short enough that a crashed writer does
    * not wedge the table for long. */
  val DefaultTtlMs: Long = 15L * 60L * 1000L

  private[sources] def leasePath(root: Path): Path =
    new Path(new Path(root, JsonCompact.MarkerDirName), LeaseFileName)

  /** A held lease. Not thread-safe; the acquiring driver thread owns
    * it. `fs` is already the raw filesystem (see [[rawFs]]). */
  final class Handle private[JsonLease] (fs: FileSystem, root: Path,
                                         val owner: String) {
    private var released = false

    /** Heartbeat: bump the lease mtime so a long cycle never goes
      * stale mid-run. Call at phase boundaries (post-job, pre-commit). */
    def touch(): Unit = if (!released) {
      val lp = leasePath(root)
      try fs.setTimes(lp, System.currentTimeMillis(), -1)
      catch { case _: java.io.IOException => () } // verifyHeld decides
    }

    /** Commit-point check: the lease file must still carry OUR token.
      * If a post-TTL takeover replaced it, the takeover believed us
      * dead — aborting here (loudly) is what keeps two live owners
      * from both publishing. */
    def verifyHeld(): Unit = {
      require(!released, "lease already released")
      val lp = leasePath(root)
      val current =
        try graft.ops.Fs.readFullyUtf8(fs, lp)
        catch { case _: java.io.IOException => "" }
      if (current != owner) throw new IllegalStateException(
        s"graftjson: lost the writer lease on $root (now held by " +
          s"'${if (current.isEmpty) "<gone>" else current}'); aborting " +
          "before commit — this run exceeded the lease TTL and another " +
          "writer took over")
    }

    /** Drop the lease (ours only — a usurped lease is left alone).
      * A clean cycle leaves `_compaction/` holding nothing but the
      * lease; remove the dir too then — the spec-pinned "staging gone
      * after a clean run" invariant predates the lease and holds. */
    def release(): Unit = if (!released) {
      released = true
      val lp = leasePath(root)
      val current =
        try graft.ops.Fs.readFullyUtf8(fs, lp)
        catch { case _: java.io.IOException => "" }
      if (current == owner) {
        fs.delete(lp, false)
        val stage = lp.getParent
        try
          if (Option(fs.listStatus(stage)).forall(_.isEmpty))
            fs.delete(stage, false)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Acquire the table's writer lease or throw. `what` names the
    * operation in the token (and thus in the conflict message the
    * loser sees).
    *
    * `retrySameLabel`: a claimant whose `what` EXACTLY matches the
    * fresh holder's label takes the slot over immediately instead of
    * waiting out the TTL. Safe ONLY for operations that are serial
    * retries of one logical op by construction — the streaming sink's
    * epoch commits and ingestEpoch, whose labels carry the epoch id
    * and whose deterministic-replay contract already makes a re-run
    * idempotent: a crashed epoch commit would otherwise wedge the
    * restarted stream for the whole TTL (review r13). Batch
    * writes/compact/recluster keep the strict rule — two "write"s are
    * different users, not a retry. */
  def acquire(fs: FileSystem, root: Path, what: String,
              ttlMs: Long = DefaultTtlMs,
              retrySameLabel: Boolean = false): Handle = {
    require(ttlMs > 0, "ttlMs must be positive")
    val rfs = rawFs(fs)
    val lp = leasePath(root)
    rfs.mkdirs(lp.getParent)
    val existing =
      try Some(rfs.getFileStatus(lp))
      catch { case _: java.io.FileNotFoundException => None }
    existing.foreach { st =>
      val age = System.currentTimeMillis() - st.getModificationTime
      val holder =
        try graft.ops.Fs.readFullyUtf8(rfs, lp)
        catch { case _: java.io.IOException => "<unreadable>" }
      val sameLabel = retrySameLabel &&
        holder.takeWhile(_ != '@') == what
      if (age < ttlMs && !sameLabel) {
        throw new IllegalStateException(
          s"graftjson: $root is locked by a concurrent writer/maintenance " +
            s"run ('$holder', lease ${age / 1000}s old, TTL ${ttlMs / 1000}s) " +
            "— the store is single-writer; retry after it finishes, or " +
            "after the TTL if it crashed")
      }
      // stale (or the serial retry of the same logical op): the
      // holder is presumed dead — take the slot over
      rfs.delete(lp, false)
    }
    val uuid = java.util.UUID.randomUUID().toString
    val owner =
      s"$what@${java.net.InetAddress.getLocalHost.getHostName}:$uuid"
    // the claim: write the token to a claimer-unique tmp, then RENAME
    // onto the lease path. A bare create(overwrite=false) is
    // check-then-act on local filesystems — two racing claimers can
    // interleave bytes into a TORN token owned by nobody, which no one
    // can release and which wedges the table until the TTL (found by
    // JsonLeaseRaceSpec, r14). Rename replaces the whole file
    // atomically, so racing claims resolve to final-writer-wins with
    // intact tokens; the read-back below then picks the unique winner.
    val tmp = new Path(lp.getParent, s"$LeaseFileName.$uuid.tmp")
    try {
      val out = rfs.create(tmp, false)
      try out.write(owner.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!rfs.rename(tmp, lp)) {
        rfs.delete(tmp, false)
        throw new IllegalStateException(
          s"graftjson: lost the lease race on $root — another writer " +
            "claimed it concurrently")
      }
    } catch {
      case e: java.io.IOException =>
        try rfs.delete(tmp, false)
        catch { case _: java.io.IOException => () }
        throw new IllegalStateException(
          s"graftjson: lost the lease race on $root — another writer " +
            s"claimed it concurrently (${e.getMessage})")
    }
    // read-back resolves concurrent claims: exactly the last renamer
    // sees its own token; every other claimer aborts loudly here. The
    // settle-and-re-read narrows the remaining window (a racer whose
    // existence check predated our rename but whose own rename lands
    // after our first read-back): any claim in flight within the
    // settle lands before the second read and makes US the aborter.
    // Advisory locking on rename primitives cannot close this window
    // completely (no compare-and-swap on a filesystem) — the residual
    // is one claimer proceeding briefly until a verifyHeld or a
    // staged-file publish fails LOUDLY, never a silent double-commit
    // (scaladoc above; JsonLeaseRaceSpec hammers this).
    def readBack(): String =
      try graft.ops.Fs.readFullyUtf8(rfs, lp)
      catch { case _: java.io.IOException => "" }
    if (readBack() != owner) throw new IllegalStateException(
      s"graftjson: lost the lease race on $root — read-back shows " +
        "another claimant")
    Thread.sleep(20)
    val back = readBack()
    if (back != owner) throw new IllegalStateException(
      s"graftjson: lost the lease race on $root — read-back shows " +
        s"'$back'")
    new Handle(rfs, root, owner)
  }

  /** Run `body` under the lease, releasing on every exit path. */
  def withLease[A](fs: FileSystem, root: Path, what: String,
                   ttlMs: Long = DefaultTtlMs,
                   retrySameLabel: Boolean = false)(body: Handle => A): A = {
    val h = acquire(fs, root, what, ttlMs, retrySameLabel)
    try body(h) finally h.release()
  }
}
