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

  test("snapshot diff over doc_id-bucketed snapshots joins without an Exchange") {
    // the scaladoc claim on TextOps.snapshotDiff: with both crawl
    // snapshots bucketed by doc_id on disk, the full-outer diff of two
    // 100 TB snapshots runs with ZERO shuffles
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-diff").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables(spark, sfDir, "documents")
      docs.where(col("doc_id") % 5 =!= 4)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(4, "doc_id").sortBy("doc_id")
        .option("path", s"$wh/snap_old").saveAsTable("snap_old")
      docs.where(col("doc_id") % 7 =!= 6)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(4, "doc_id").sortBy("doc_id")
        .option("path", s"$wh/snap_new").saveAsTable("snap_new")
      val diff = graft.ops.TextOps.snapshotDiff(
        spark.table("snap_old"), spark.table("snap_new"))
      diff.collect()
      val plan = diff.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed diff shuffled a snapshot:\n$plan")
      // and the decisions equal the unbucketed computation
      val viaBuckets = diff.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"))).toSet
      val direct = graft.ops.TextOps.snapshotDiff(
          docs.where(col("doc_id") % 5 =!= 4),
          docs.where(col("doc_id") % 7 =!= 6)).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"))).toSet
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS snap_old")
      spark.sql("DROP TABLE IF EXISTS snap_new")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
