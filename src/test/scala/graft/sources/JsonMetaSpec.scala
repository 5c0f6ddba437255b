package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Durable planning metadata ([[JsonMeta]]): a fresh "JVM" (caches
  * cleared) plans a saved table with ZERO files walked, stale entries
  * re-walk exactly the diff, zones ride the meta (file skipping works
  * without any walk), corruption degrades to a full walk, and
  * compaction interacts by fingerprint. */
class JsonMetaSpec extends SparkTestBase {

  private def mkTable(name: String, n: Int): java.io.File = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs()
    (1 to n).foreach { i =>
      val w = new java.io.PrintWriter(new java.io.File(dir, f"p$i%02d.json"))
      w.println(s"""{"id": ${i * 10}, "src": "s${i % 3}"}""")
      w.close()
    }
    dir
  }

  private def freshJvm(): Unit = {
    JsonDocSource.clearInferCache()
    JsonMeta.clearParsed()
  }

  private def walked[A](body: => A): (A, Long) = {
    val before = JsonDocSource.filesWalked.get()
    val r = body
    (r, JsonDocSource.filesWalked.get() - before)
  }

  test("a saved table plans walk-free in a fresh JVM; rows and schema intact") {
    val dir = mkTable("jm_basic", 6)
    assert(JsonMeta.save(spark, dir.toString) == 6)
    freshJvm()
    val (rows, w) = walked {
      spark.read.format("graftjson").load(dir.toString)
        .select(col("id")).collect().map(_.getAs[Number](0).longValue).sorted
    }
    assert(w == 0L, s"saved table still walked $w files")
    assert(rows.toSeq == (1 to 6).map(_ * 10L))
  }

  test("zones ride the meta: zonemaps load skips files without any walk") {
    val dir = mkTable("jm_zones", 5)
    JsonMeta.save(spark, dir.toString)
    freshJvm()
    val (got, w) = walked {
      spark.read.format("graftjson").option("zonemaps", "true")
        .load(dir.toString)
        .where(col("id") === 30).select(col("src")).collect()
    }
    assert(w == 0L, s"zonemaps load walked $w files despite saved zones")
    assert(got.map(_.getString(0)).toSeq == Seq("s0"))
    // the equality filter plans a single partition: the other files
    // were zone-pruned from metadata that never touched the data
    val q = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir.toString).where(col("id") === 30)
    q.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case other => other.children.flatMap(scans)
    }
    assert(scans(q.queryExecution.executedPlan).head.partitions.size == 1)
  }

  test("stale entries re-walk exactly the diff; a re-save refreshes them") {
    val dir = mkTable("jm_stale", 4)
    JsonMeta.save(spark, dir.toString)
    // rewrite one file with different length (fingerprint-visible)
    val w1 = new java.io.PrintWriter(new java.io.File(dir, "p02.json"))
    w1.println("""{"id": 99999, "src": "rewritten"}"""); w1.close()
    freshJvm()
    val (rows, w) = walked {
      spark.read.format("graftjson").load(dir.toString)
        .select(col("id")).collect().map(_.getAs[Number](0).longValue).sorted
    }
    assert(w == 1L, s"expected only the rewritten file to walk, got $w")
    assert(rows.toSeq == Seq(10L, 30L, 40L, 99999L))
    // re-save: now walk-free again in another fresh JVM
    JsonMeta.save(spark, dir.toString)
    freshJvm()
    val (_, w2) = walked {
      spark.read.format("graftjson").load(dir.toString).count()
    }
    assert(w2 == 0L)
  }

  test("a corrupt meta blob degrades to a full walk, never a failure") {
    val dir = mkTable("jm_corrupt", 3)
    JsonMeta.save(spark, dir.toString)
    val mp = new java.io.File(new java.io.File(dir, "_graftjson_meta"), "cache")
    val w0 = new java.io.FileOutputStream(mp)
    w0.write("not a java object stream".getBytes("UTF-8")); w0.close()
    freshJvm()
    val (rows, w) = walked {
      spark.read.format("graftjson").load(dir.toString)
        .select(col("id")).collect().map(_.getAs[Number](0).longValue).sorted
    }
    assert(w == 3L, "corrupt meta should force a full walk")
    assert(rows.toSeq == Seq(10L, 20L, 30L))
  }

  test("compaction then save: merged file is the only walk; whole-mode never hits meta") {
    val dir = mkTable("jm_compact", 4)
    JsonMeta.save(spark, dir.toString)
    JsonCompact.compact(spark, dir.toString, targetBytes = 1L << 20)
    freshJvm()
    val (cnt, w) = walked {
      spark.read.format("graftjson").load(dir.toString).count()
    }
    assert(cnt == 4L)
    assert(w == 1L, s"only the merged file should walk, got $w")
    // whole-mode keys never match NDJSON-walked entries
    JsonMeta.save(spark, dir.toString)
    freshJvm()
    val (_, ww) = walked {
      spark.read.format("graftjson").option("whole", "true")
        .load(dir.toString).count()
    }
    assert(ww >= 1L, "whole-mode load must not be served by NDJSON meta")
  }
}
