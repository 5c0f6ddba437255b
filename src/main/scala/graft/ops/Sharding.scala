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
    * the executors holding it — nothing funnels through the driver. */
  def writeShards(docs: DataFrame, outDir: String, nShards: Int,
                  maxRecordsPerFile: Long = 1000000L): Unit =
    docs.withColumn("shard", shardOf(col("doc_id"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"),
        md5(col("doc_id").cast("string")), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
}
