package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet star-schema table loader for the driver testdata layout
  * (TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst
  * keeps predicate pushdown / column pruning / partition parallelism —
  * the same call shape works against a 100 TB table directory.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * reader rejects outright; it is read as raw nanos via the legacy
  * long mapping and floor-divided to microseconds — the identical
  * truncation DuckDB applies converting TIMESTAMP_NS to its
  * microsecond TIMESTAMP, so oracle comparisons agree. */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else s.read.parquet(s"$dir/$name.parquet")
}
