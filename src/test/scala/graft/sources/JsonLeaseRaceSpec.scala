package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.util.concurrent.{ConcurrentLinkedQueue, CyclicBarrier}
import java.util.concurrent.atomic.AtomicLong

/** REAL-THREAD concurrency harness for the lease-guarded write path
  * (VERDICT r13 #1): the protocol specs in [[JsonLeaseSpec]] sequence
  * interleavings on one thread; this spec races live JVM threads —
  * barrier-started batch writes, ingest epochs, compactions, and
  * vacuums against ONE table for 100 randomized rounds — and asserts
  * the lease's whole contract at once:
  *
  *   - every racer either commits or fails LOUDLY with a lease/guard
  *     rejection (any other failure class fails the spec);
  *   - the final table equals a sequential replay of exactly the
  *     committed ops (append row-sets are order-independent, compact
  *     and vacuum are row-preserving), so a lost update, a swept live
  *     staging file, a torn marker slot, or a double-publish all
  *     surface as a row-multiset diff — with ONE modeled exception:
  *     an op that loses its lease at the auxiliary meta-refresh
  *     verify AFTER its data commit landed reports loudly though its
  *     rows are durable (at-least-once; the caller's replay is
  *     idempotent by contract), so such groups are tracked as
  *     all-or-nothing MAYBES. This harness found a real r16 bug this
  *     way: the shared `_ingest_tmp` let a residual-window
  *     double-claimant publish the OTHER epoch's part files under its
  *     own epoch names (see ingestEpoch's claim-unique staging);
  *   - the table is left healthy: no lingering lease, no pending
  *     marker, and a fresh meta save + read round-trips.
  *
  * Ops are intentionally tiny (1-3 rows) — the point is interleaving
  * coverage, not volume: with 2-3 racers per round the acquire /
  * read-back / verifyHeld windows are hit hundreds of times. */
class JsonLeaseRaceSpec extends SparkTestBase {

  private val benign = Seq(
    "locked by a concurrent", // fresh-lease rejection at acquire
    "lost the lease race", // create/read-back race loser
    "lost the writer lease", // verifyHeld abort after takeover
    "streaming epoch", // live-epoch staging guard in maintenance
    "planning-metadata manifest", // vacuum before any save exists
    // the residual advisory-locking window (acquire scaladoc): a
    // claimer that lost exclusivity AFTER its read-back aborts loudly
    // when its staged files were swept by the usurper — nothing was
    // published (the marker/rename is the commit point), retry
    // converges
    "could not publish")

  /** Broad I/O substrings count as benign ONLY when the message names
    * a path under the raced table (ADVICE r15: an unscoped "does not
    * exist" could classify an unrelated bug as a benign trade). The
    * documented trade behind them: the write path resolves the TABLE
    * (schema inference — a lock-free READER, by design) before it
    * acquires the lease; a concurrent maintenance commit eagerly
    * deletes replaced files, so the in-flight inference scan can fail
    * LOUDLY mid-read, strictly PRE-COMMIT; a retry converges. */
  private val benignScoped = Seq("FAILED_READ_FILE", "does not exist")

  private def chain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq

  private def benignKind(msgs: Seq[String], dirToken: String): Option[String] =
    msgs.flatMap { m =>
      benign.filter(m.contains) ++
        benignScoped.filter(s => m.contains(s) && m.contains(dirToken))
    }.headOption

  // validation knob (VERDICT r15 #1 done-criteria): one-off widened
  // runs via GRAFT_LEASE_RACE_ROUNDS=N; the gate default stays 100
  private val rounds =
    sys.env.getOrElse("GRAFT_LEASE_RACE_ROUNDS", "100").toInt

  test("100 randomized rounds of racing writers/ingest/compact/vacuum: loud rejections or serialized commits only; final table == sequential replay") {
    val dir = graft.TempRoots.path("lease_race")
    val dirToken = new java.io.File(dir).getName
    new java.io.File(dir).mkdirs()
    spark.range(1).select(lit(0L).as("id"), lit("seed").as("s"))
      .write.format("graftjson").mode("overwrite").save(dir)
    val committed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    committed.add(0L)
    // PUBLISH-then-lease-loss ops (at-least-once): an op whose data
    // commit landed (marker rolled / epoch renamed) can still lose its
    // lease at the AUXILIARY meta-refresh verify and report loudly —
    // its rows are legitimately present though un-acknowledged (the
    // caller's replay is idempotent by contract). The model tracks
    // those id-GROUPS as maybes: each must appear all-or-nothing.
    val maybeGroups = new ConcurrentLinkedQueue[Seq[Long]]()
    val rnd = new scala.util.Random(20260815L)
    val nextId = new AtomicLong(1L)
    val nextBatch = new AtomicLong(0L)
    val commits = new AtomicLong(0L)
    val rejections = new AtomicLong(0L)
    val rejectKinds = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    (1 to rounds).foreach { round =>
      val k = 2 + rnd.nextInt(2)
      val ops: Seq[(Seq[Long], () => Seq[Long])] = (0 until k).map { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => // batch append (DSv2 staging→marker commit)
            val base = nextId.getAndAdd(3L)
            (Seq(base, base + 1, base + 2), () => {
              spark.range(3).select((col("id") + base).as("id"),
                  lit("w").as("s"))
                .write.format("graftjson").mode("append").save(dir)
              Seq(base, base + 1, base + 2)
            })
          case 2 => // ingest epoch (sweep-then-publish, optional meta)
            val base = nextId.getAndAdd(2L)
            val bid = nextBatch.getAndIncrement()
            val refresh = rnd.nextBoolean()
            (Seq(base, base + 1), () => {
              graft.streaming.EventStreams.ingestEpoch(
                spark.range(2).select((col("id") + base).as("id"),
                  lit("e").as("s")),
                dir, batchId = bid, refreshMeta = refresh,
                opId = s"race$bid")
              Seq(base, base + 1)
            })
          case 3 => // maintenance: compact (row-preserving)
            (Seq.empty[Long],
              () => { JsonCompact.compact(spark, dir, targetBytes = 1L << 20)
                Seq.empty })
          case 4 => // maintenance: vacuum (row-preserving, meta-only)
            (Seq.empty[Long],
              () => { JsonMeta.vacuum(spark, dir, retainSaves = 2)
                Seq.empty })
        }
      }
      val barrier = new CyclicBarrier(k)
      val hardFailures = new ConcurrentLinkedQueue[Throwable]()
      val results = new ConcurrentLinkedQueue[Seq[Long]]()
      val threads = ops.map { case (opIds, op) =>
        val t = new Thread(() => {
          barrier.await()
          try { results.add(op()); commits.incrementAndGet() }
          catch {
            case t: Throwable =>
              benignKind(chain(t), dirToken) match {
                case Some(kind) =>
                  rejections.incrementAndGet()
                  rejectKinds.merge(kind, 1, (a, b) => a + b)
                  // the one loud class that can FOLLOW a completed
                  // data commit (the meta-refresh verify): its rows
                  // may be present — maybe, all-or-nothing
                  if (kind == "lost the writer lease" && opIds.nonEmpty)
                    maybeGroups.add(opIds)
                case None => hardFailures.add(t)
              }
          }
        })
        t.start(); t
      }
      threads.foreach(_.join(120000))
      assert(threads.forall(!_.isAlive), s"round $round: a racer hung")
      assert(hardFailures.isEmpty,
        s"round $round: non-lease failure class: ${hardFailures.peek()}")
      results.forEach(ids => ids.foreach(committed.add(_)))
      // with every racer joined, no lease may survive the round — a
      // leak here wedges every later round until the TTL
      val lp = JsonLease.leasePath(new org.apache.hadoop.fs.Path(dir))
      val lfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (lfs.exists(lp)) {
        val holder = graft.ops.Fs.readFullyUtf8(lfs, lp)
        fail(s"round $round: lease leaked by '$holder'")
      }
    }
    // at least some of both outcomes actually happened — a harness
    // where everything serialized by accident proves nothing
    assert(commits.get() >= rounds,
      s"only ${commits.get()} commits; rejections by kind: $rejectKinds")
    assert(rejections.get() >= rounds / 5,
      s"only ${rejections.get()} rejections — the race never raced")
    // the final fold equals a sequential replay of the committed ops,
    // plus each publish-then-lease-loss group ALL-OR-NOTHING: acked
    // rows must all be present, nothing outside acked ∪ maybes may
    // exist, and a maybe group half-present is torn either way
    import scala.jdk.CollectionConverters._
    val got = spark.read.format("graftjson").option("refresh", "true")
      .load(dir).select(col("id")).collect()
      .map(_.getAs[Number](0).longValue).toSet
    val acked = committed.asScala.toSet
    val maybes = maybeGroups.asScala.toSeq
    assert((acked -- got).isEmpty,
      s"acknowledged rows missing: ${(acked -- got).take(5)}")
    val allowed = acked ++ maybes.flatten
    assert((got -- allowed).isEmpty,
      s"rows from no acknowledged or maybe op: ${(got -- allowed).take(5)}")
    maybes.foreach { g =>
      val present = g.count(got.contains)
      assert(present == 0 || present == g.size,
        s"a publish-then-lease-loss op is TORN: $g, present $present")
    }
    // table left healthy: no lease, no pending marker, meta round-trips
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(JsonLease.leasePath(root)), "a lease survived")
    assert(JsonCompact.readMarker(fs, root).isEmpty, "a marker survived")
    JsonMeta.save(spark, dir)
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == got.size.toLong)
  }
}
