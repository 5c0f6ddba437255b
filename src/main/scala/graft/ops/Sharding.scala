package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard export — the terminal step of a training-data
  * pipeline: spread documents across `nShards` shards by a
  * position-independent hash of the stable doc key, shuffle ONCE on
  * the shard id, and write one directory per shard with bounded file
  * sizes (`maxRecordsPerFile` keeps any single output file readable by
  * a single loader worker). Rows inside a shard are ordered by
  * md5(doc_id) — an engine-independent uniform permutation — so the
  * export IS the "deterministically shuffled training order": two runs
  * over the same corpus produce byte-identical shard contents, and no
  * driver-side randomness or global sort is involved.
  *
  * The shard function is a Lehmer/MINSTD LCG step (public-domain
  * constant 48271 modulo the Mersenne prime 2^31−1) computed in plain
  * bigint arithmetic — deliberately NOT Spark's murmur `hash()`, whose
  * value an external engine cannot reproduce; any SQL oracle can
  * recompute `((key * 48271) % 2147483647) % nShards` verbatim. */
object Sharding {

  /** ((key · 48271) mod 2^31−1) mod nShards, non-negative. Exact while
    * key < 2^63 / 48271 ≈ 1.9e14 — beyond any corpus's doc count; for
    * synthetic wider keys pre-fold the key with pmod(key, 2^31−1). */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(pmod(key * lit(48271L), lit(2147483647L)), lit(nShards.toLong))
      .cast("int")

  /** One hash-partitioned write: shard assignment is a per-row
    * expression, `repartition(nShards, shard)` is the single shuffle,
    * and the partitioned sink writes each shard directory from exactly
    * the executors holding it — nothing funnels through the driver.
    *
    * Returns the write-audit counters a production export publishes:
    * rows written and the shard-id spread, collected through
    * `observe`/CollectMetrics — the metrics ride the write job itself,
    * so the audit costs ZERO extra scans (a count-after-write re-reads
    * the sink; at 100 TB that second scan is real money). The observed
    * metrics surface only on the QueryExecution that actually RAN (the
    * write command plans its own), so they are harvested through a
    * QueryExecutionListener — the production pattern — matched by
    * observation name, with a bounded wait for the async listener bus.
    * A missed harvest degrades to WriteAudit(-1, -1, -1); it never
    * fails a completed write. */
  def writeShards(docs: DataFrame, outDir: String, nShards: Int,
                  maxRecordsPerFile: Long = 1000000L): WriteAudit = {
    val spark = docs.sparkSession
    // unique observation name: concurrent writeShards calls on one
    // session must not harvest each other's metrics
    val obsName = s"write_audit_${java.util.UUID.randomUUID().toString.take(8)}"
    val result = new java.util.concurrent.atomic.AtomicReference(
      WriteAudit(-1L, -1, -1))
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(obsName).foreach { r =>
          // min/max over ZERO rows observe as null — unboxing them
          // would NPE on the listener thread, swallow the event, and
          // stall the latch for the full timeout on every empty export
          def intOr(field: String, dflt: Int): Int = {
            val i = r.fieldIndex(field)
            if (r.isNullAt(i)) dflt else r.getInt(i)
          }
          result.set(WriteAudit(r.getAs[Long]("n_rows"),
            intOr("min_shard", -1), intOr("max_shard", -1)))
          latch.countDown()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      docs.withColumn("shard", shardOf(col("doc_id"), nShards))
        .observe(obsName, count(lit(1)).as("n_rows"),
          min(col("shard")).as("min_shard"), max(col("shard")).as("max_shard"))
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"),
          md5(col("doc_id").cast("string")), col("doc_id"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy("shard")
        .parquet(outDir)
      // the listener bus is async; bound the wait so a dropped event
      // can never wedge the export — and SAY when it degrades, so a
      // stalled harvest is visible instead of silently absorbed into
      // bench timings
      val harvested =
        latch.await(30, java.util.concurrent.TimeUnit.SECONDS)
      if (!harvested)
        System.err.println(
          s"graft: write audit for $outDir not harvested within 30s; " +
            "degrading to WriteAudit(-1, -1, -1)")
    } finally spark.listenerManager.unregister(listener)
    result.get
  }

  /** Counters observed during the shard write (no extra scan). */
  case class WriteAudit(n_rows: Long, min_shard: Int, max_shard: Int)
}
