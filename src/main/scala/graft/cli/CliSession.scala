package graft.cli

import graft.GraftExtensions
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared CLI plumbing: session construction and document reading
  * (both CLIs mirror the reference launchers' file handling —
  * JsonSchemaFinder.java:233-238 / JsonShredder.java:95-100). */
private[cli] object CliSession {

  def build(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .appName(appName)
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Per-input progress lines on stderr, reference parity
    * (JsonSchemaFinder.java:231-232 prints one line as it opens each
    * file). The distributed scan opens files on executors in
    * arbitrary order, so the honest driver-side equivalent is the
    * resolved input list before the job launches. */
  def announceInputs(spark: SparkSession, ds: Dataset[_]): Unit = {
    // byte-exact line format: "Reading " + file, flushed per line
    // (JsonSchemaFinder.java:231-232 uses printlnErr + flush)
    ds.inputFiles.sorted.foreach(f => System.err.println(s"Reading $f"))
    System.err.flush()
  }

  /** NDJSON lines by default; `whole` reads each file as one unit for
    * documents spanning lines (parallelism across files only). */
  def readDocs(spark: SparkSession, files: Seq[String],
               whole: Boolean): Dataset[String] = {
    val ds =
      if (whole) {
        import spark.implicits._
        spark.read.option("wholetext", "true").text(files: _*)
          .select(col("value")).as[String]
      } else spark.read.textFile(files: _*)
    announceInputs(spark, ds)
    ds
  }
}
