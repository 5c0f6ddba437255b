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
      // scoped conf flip: the legacy mapping is consulted when the
      // reader converts the footer schema (at read time); restore the
      // previous value so unrelated later reads fail fast on
      // TIMESTAMP(NANOS) instead of silently yielding bigint
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try
        s.read.parquet(s"$dir/$name.parquet")
          // floor division (not `div`, which truncates toward zero and
          // would diverge from DuckDB's ns->us floor on pre-epoch
          // values): subtract the positive remainder first
          .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    } else s.read.parquet(s"$dir/$name.parquet")
}
