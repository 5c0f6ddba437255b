package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the parquet star schema
  * (SURVEY §2.2 scans/sinks line): csv, json and orc round-trips
  * preserve the data; the json path also exercises schema-on-read. */
class SourcesSpec extends SparkTestBase {

  private def sample = Tables(spark, sfDir, "nation")

  private def assertSame(a: Array[(Int, String)], b: Array[(Int, String)]): Unit =
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)

  private def keyName(df: org.apache.spark.sql.DataFrame): Array[(Int, String)] =
    df.select(col("n_nationkey").cast("int"), col("n_name"))
      .collect().map(r => (r.getInt(0), r.getString(1)))

  test("csv sink/source round-trips with header and explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    sample.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)
    assertSame(keyName(sample), keyName(back))
  }

  test("json sink/source round-trips under schema-on-read inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    sample.write.mode(SaveMode.Overwrite).json(dir)
    val back = spark.read.json(dir) // inferred schema
    assertSame(keyName(sample), keyName(back))
  }

  test("orc sink/source round-trips with full schema fidelity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    sample.write.mode(SaveMode.Overwrite).orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assertSame(keyName(sample), keyName(back))
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode(SaveMode.Overwrite).partitionBy("status").parquet(dir)
    val one = spark.read.parquet(dir).where(col("status") === "F")
    one.collect()
    val scan = one.queryExecution.executedPlan.toString
    // partition filter must prune at the source, not post-filter rows
    assert(scan.contains("PartitionFilters") &&
      scan.contains("status"), scan)
    assert(one.select(countDistinct(col("status"))).head().getLong(0) == 1L)
  }
}
