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

  /** NDJSON lines by default; `whole` reads each file as one unit for
    * documents spanning lines (parallelism across files only). */
  def readDocs(spark: SparkSession, files: Seq[String],
               whole: Boolean): Dataset[String] =
    if (whole) {
      import spark.implicits._
      spark.read.option("wholetext", "true").text(files: _*)
        .select(col("value")).as[String]
    } else spark.read.textFile(files: _*)
}
