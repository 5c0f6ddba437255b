package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration only — the driver always passes exactly two)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // session bootstrap, not read-time side effect (ADVICE r2): the
      // events table carries TIMESTAMP(NANOS); TablesSpec guards that
      // no OTHER table silently reads nanos as bigint under this flag
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE coalescing floor — set per query by SparkEntry's
      // withCoalesceFloor wrapper (see SparkEntry.denseCoalesce)
      //
      // raw local FS (no CRC sidecars) — same rationale as Bench:
      // ChecksumFileSystem's client-side CRC emulation is a local-mode
      // artifact production file systems don't have; kept identical
      // here so the correctness gate runs the exact bench I/O stack
      .config("spark.hadoop.fs.file.impl", sys.env.getOrElse(
        "SPARK_GRAFT_FS_IMPL", "org.apache.hadoop.fs.RawLocalFileSystem"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // java.io.File by contract: outDir is the driver's LOCAL dump
    // directory (the correctness gate reads it with DuckDB on this
    // host) — the Fs invariant covers STORE paths, not this artifact
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free blocks pinned by eager checkpoints inside the query just
      // written — dead now, but the context cleaner only reclaims them
      // after a driver GC (see Bench for the measured effect).
      // clearCache FIRST: the r10 persist() sweep registers query
      // caches in the CacheManager, which a bare RDD unpersist does
      // not deregister — stale entries then plan-match later queries
      // and force recompute-into-cache churn
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
