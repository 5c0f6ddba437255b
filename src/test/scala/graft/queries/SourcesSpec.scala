package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Source/sink coverage (SURVEY §2.2 row 1): parquet, JSON (plain and
  * gz), CSV with header/schema, text, and partitioned writes all round
  * trip through the engine. */
class SourcesSpec extends SparkTestBase {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  private def sample = Tables(spark, sfDir, "nation")

  test("parquet round trip") {
    sample.write.mode(SaveMode.Overwrite).parquet(s"$tmp/nation_pq")
    val back = spark.read.parquet(s"$tmp/nation_pq")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round trip (plain and gzip)") {
    sample.write.mode(SaveMode.Overwrite).json(s"$tmp/nation_json")
    sample.write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(s"$tmp/nation_json_gz")
    for (dir <- Seq(s"$tmp/nation_json", s"$tmp/nation_json_gz")) {
      val back = spark.read.json(dir)
      assert(back.count() == sample.count())
      assert(back.columns.sorted.toSeq == sample.columns.sorted.toSeq)
    }
  }

  test("csv round trip with header and explicit schema") {
    sample.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read
      .option("header", "true").schema(sample.schema).csv(s"$tmp/nation_csv")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    Tables(spark, sfDir, "orders")
      .withColumn("y", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("y").parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part").where(col("y") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(y"), plan)
    val expect = Tables(spark, sfDir, "orders")
      .where(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() == expect)
  }

  test("orc round trip with full schema fidelity") {
    sample.write.mode(SaveMode.Overwrite).orc(s"$tmp/nation_orc")
    val back = spark.read.orc(s"$tmp/nation_orc")
    assert(back.schema == sample.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("text source feeds inference; gz text decodes transparently") {
    import spark.implicits._
    val docs = Seq("""{"a": 1}""", """{"a": 2000, "b": "x"}""")
    spark.createDataset(docs).toDF("value").coalesce(1)
      .write.mode(SaveMode.Overwrite).option("compression", "gzip")
      .text(s"$tmp/docs_gz")
    val inferred = spark.read.textFile(s"$tmp/docs_gz")
      .select(new graft.infer.InferSchemaAgg().toColumn).head()
    assert(inferred.toString == "struct<a:smallint,b:string>")
  }
}
