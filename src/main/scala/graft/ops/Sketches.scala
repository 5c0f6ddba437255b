package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch store — "keep the sketch, drop the data", the
  * pattern that makes corpus-wide distinct statistics affordable at
  * 100 TB. Raw events are sketched ONCE, shard by shard, into a
  * parquet store of DataSketches HLL blobs (Spark 3.5+ `hll_*`
  * built-ins — codegen'd Tungsten aggregates, no UDF, no UDAF); every
  * later "how many distinct X per group?" question is answered from
  * the store alone in milliseconds, because HLL register merge is the
  * whole query. New data appends as its own shard partition (cost ∝
  * batch, dynamic overwrite, replay-idempotent — the LSM discipline
  * of [[InvertedIndex]] applied to statistics), and the merged
  * estimate is register-max over shards, which is mathematically
  * order- and partition-independent: sketch-of-union ==
  * union-of-sketches, pinned in SketchesSpec.
  *
  * The store is ~lgK KB per (shard, group) row regardless of row
  * count — at 100 TB the sketches of a trillion-row table fit in one
  * executor, while the exact distinct would be a trillion-row
  * shuffle. */
object Sketches {

  /** Sketch one shard batch (or a whole table of shards) into the
    * store: one hash-aggregate pass over the rows, one (shard, group)
    * HLL blob + exact row count out, written under `shard=` partition
    * dirs. Dynamic overwrite means re-running a shard (replay,
    * backfill) rewrites exactly that shard's partitions to identical
    * content and never touches the rest. */
  def writeHllShards(df: DataFrame, dir: String, shard: Column,
                     group: Column, id: Column, lgK: Int = 12): Unit =
    df.groupBy(shard.as("shard"), group.as("grp"))
      .agg(hll_sketch_agg(id, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))
      .repartition(col("shard"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(dir)

  /** Per-group distinct-count estimate from the STORED sketches alone
    * — the raw table is never rescanned. Register-max union across
    * shards, then the estimator; `n_rows` sums exactly alongside so
    * the consumer sees both scales. */
  def mergedDistinct(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("grp"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("n_distinct_est"),
        sum(col("n_rows")).as("n_rows"))

  /** Pairwise distinct-overlap estimates between group sketches, from
    * the store alone: HLL has no native intersection, but
    * inclusion–exclusion over the union sketch gives
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) (clamped at 0), and with it a
    * Jaccard estimate — the "how much do these two sources/shards
    * share?" question answered in milliseconds without touching raw
    * data. Error compounds across the three estimates (≈ √3× a single
    * sketch's relative error against the UNION size, so small
    * overlaps of large sets drown first — SketchesSpec pins the
    * envelope); groups are few by construction, so the pair self-join
    * is a broadcast over a group-count-sized table. */
  def overlapEstimate(spark: SparkSession, dir: String): DataFrame = {
    val g = spark.read.parquet(dir)
      .groupBy(col("grp"))
      .agg(hll_union_agg(col("sketch")).as("sk"))
    val pairs = g.select(col("grp").as("grp_a"), col("sk").as("sk_a"))
      .join(broadcast(g.select(col("grp").as("grp_b"),
        col("sk").as("sk_b"))), col("grp_a") < col("grp_b"))
    pairs.select(col("grp_a"), col("grp_b"),
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("est_union"))
      // estimates are bigint (the hll_sketch_estimate return type, as
      // in mergedDistinct); the overlap stays in exact integer
      // arithmetic, only the Jaccard ratio is floating
      .withColumn("est_overlap",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("jaccard_est",
        round(col("est_overlap").cast("double") / col("est_union"), 4))
  }
}
