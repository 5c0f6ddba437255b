package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological key distributions.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles moderate skew by splitting oversized shuffle
  * partitions, and is the first line of defense — none of the engine's
  * own queries need more. Explicit salting is for the pathological
  * case AQE can't fix: a single join key whose rows exceed what one
  * task should own (the web-scale "null key" / "default value"
  * problem at 100 TB).
  */
object Skew {

  /** Salted equi-join: every left row gets a deterministic salt in
    * [0, factor) derived from its full row hash (no `rand()` — results
    * and partitioning are stable across retries and runs); the right
    * side is replicated once per salt. The hot key's rows spread
    * across `factor` shuffle partitions at the cost of a
    * `factor`-times larger right side — use with a dimension-sized
    * right input. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(factor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
