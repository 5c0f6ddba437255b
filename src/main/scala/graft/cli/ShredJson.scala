package graft.cli

import graft.GraftExtensions
import graft.shred.Shredder
import org.apache.spark.sql.SparkSession

/** Distributed equivalent of the reference's `shred-json` CLI
  * (reference `bin/shred-json:24-25` → `JsonShredder.main`,
  * JsonShredder.java:89-111).
  *
  * Usage: ShredJson <outDir> <json file or glob>...
  *
  * Writes one directory per dotted column path under `outDir`
  * (`path=root.a.b/part-*.txt`), the scale-out version of the
  * reference's one-file-per-column layout (JsonShredder.java:52-62).
  */
object ShredJson {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShredJson <outDir> <json file or glob>...")
    val outDir = args.head
    val files = args.tail

    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .appName("graft-shred-json")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.textFile(files: _*)
    val count = docs.count()
    Shredder.writeShredded(docs, outDir)
    println(s"$count records read")
    println()
    spark.stop()
  }
}
