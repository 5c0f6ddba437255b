package graft.cli

import graft.GraftExtensions
import graft.shred.Shredder
import org.apache.spark.sql.SparkSession

/** Distributed equivalent of the reference's `shred-json` CLI
  * (reference `bin/shred-json:24-25` → `JsonShredder.main`,
  * JsonShredder.java:89-111).
  *
  * Usage: ShredJson [--whole] <outDir> <json file or glob>...
  * (`--whole` reads each file as one unit for documents spanning
  * lines, like FindJsonSchema.)
  *
  * Writes one directory per dotted column path under `outDir`
  * (`path=root.a.b/part-*.txt`), the scale-out version of the
  * reference's one-file-per-column layout (JsonShredder.java:52-62).
  */
object ShredJson {
  def main(args: Array[String]): Unit = {
    val whole = args.contains("--whole")
    val rest = args.filterNot(_ == "--whole")
    require(rest.length >= 2,
      "usage: ShredJson [--whole] <outDir> <json file or glob>...")
    val outDir = rest.head
    val files = rest.tail

    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .appName("graft-shred-json")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs =
      if (whole) {
        import spark.implicits._
        spark.read.option("wholetext", "true").text(files: _*)
          .select(org.apache.spark.sql.functions.col("value")).as[String]
      } else spark.read.textFile(files: _*)
    // document count, not row/file count (a whole-file row or a line
    // with concatenated docs carries several)
    val count = {
      import spark.implicits._
      docs.map(Shredder.countDocs).reduce(_ + _)
    }
    Shredder.writeShredded(docs, outDir)
    println(s"$count records read")
    println()
    spark.stop()
  }
}
