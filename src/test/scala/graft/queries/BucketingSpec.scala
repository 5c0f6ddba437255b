package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: when both sides are bucketed by the
  * join key into the same bucket count, the sort-merge join needs NO
  * shuffle — at 100 TB this is the difference between re-shuffling the
  * fact table on every join and reading it pre-partitioned. */
class BucketingSpec extends SparkTestBase {

  test("bucketed-by-key tables join without an Exchange") {
    // external-table paths; warehouse.dir is a static conf and stays default
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

    try {
      Tables(spark, sfDir, "orders")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables(spark, sfDir, "lineitem")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (the single
      // Exchange allowed is the one under the final aggregation)
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"join sides were shuffled:\n$plan")

      // and the result is right
      val expect = Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
