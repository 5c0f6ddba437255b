package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The path-addressed catalog ([[GraftCatalog]]) and WRITE-TIME
  * two-key Z-order (VERDICT r13 #5): `clusterBy=a,b` declares the
  * Morton-curve ordering as a V2 function transform, the engine
  * resolves it through the catalog's FunctionCatalog and plans the
  * range exchange itself, and the written files are rectangles — point
  * probes on EITHER key prune at first scan, no recluster rewrite. */
class GraftCatalogSpec extends SparkTestBase {


  test("morton matches the reference bit-interleave on proxy values") {
    // same reference ladder as ShardingSpec's, over the proxy ints
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 32)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z ^ java.lang.Long.MIN_VALUE
    }
    val vals: Seq[Any] = Seq(0L, 1L, 63L, -7L, 3.5d, "abc", "")
    for (a <- vals; b <- vals)
      assert(GraftCatalog.morton(a, b) ==
        ref(GraftCatalog.proxy32(a), GraftCatalog.proxy32(b)))
    // proxy is order-preserving over mixed numerics and over strings
    val nums = Seq[Any](-1000L, -1.5d, 0L, 1L, 2L, 3.25d, 1000L)
    assert(nums.map(GraftCatalog.proxy32) == nums.map(GraftCatalog.proxy32).sorted)
    val strs = Seq[Any]("", "a", "ab", "b", "ba")
    assert(strs.map(GraftCatalog.proxy32) == strs.map(GraftCatalog.proxy32).sorted)
  }

  test("catalog round trip: create-as-select, read back by identifier, drop") {
    useCatalog()
    val dir = graft.TempRoots.path("catalog_roundtrip")
    val df = spark.range(20).select(col("id"),
      concat(lit("r"), col("id")).as("s"))
    df.writeTo(s"graft.`$dir`").create()
    val back = spark.table(s"graft.`$dir`")
    assert(back.count() == 20L)
    assert(back.select(col("s")).collect().map(_.getString(0)).sorted.head == "r0")
    // a missing table is a loud NoSuchTable, not an empty frame
    val e = intercept[Exception](
      spark.table(s"graft.`${dir}_missing`").count())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("repeated catalog reads see appends: no provider-memo staleness") {
    // review r14: a catalog-lived JsonDocSource would serve the FIRST
    // read's listing to every later spark.table of the identifier
    useCatalog()
    val dir = graft.TempRoots.path("catalog_fresh_reads")
    spark.range(5).select(col("id"), lit("a").as("s"))
      .writeTo(s"graft.`$dir`").create()
    assert(spark.table(s"graft.`$dir`").count() == 5L)
    // append through the PATH api (any write path must be visible)
    spark.range(3).select((col("id") + 100L).as("id"), lit("b").as("s"))
      .write.format("graftjson").mode("append").save(dir)
    assert(spark.table(s"graft.`$dir`").count() == 8L,
      "catalog read served a stale listing after an append")
  }

  test("write-time two-key Z-order: clustered CREATE yields rectangles; point probes on EITHER key prune") {
    useCatalog()
    val dir = graft.TempRoots.path("catalog_zorder_write")
    // 64×64 grid, hash-scattered input order (nothing pre-clustered)
    val grid = spark.range(4096)
      .select((col("id") % 64).as("a"), expr("id div 64").as("b"),
        concat(lit("p"), col("id")).as("s"))
      .repartition(8) // interleave: every input partition spans both domains
    grid.writeTo(s"graft.`$dir`")
      .option("clusterBy", "a,b")
      .option("clusterPartitions", "16")
      .create()
    val files = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(files == 16, s"expected 16 clustered files, got $files")
    val t = spark.read.format("graftjson").option("zonemaps", "true")
      .load(dir)
    // row fidelity first: the exchange+render lost nothing
    assert(t.count() == 4096L)
    // point probe on A prunes most files
    val skipsA = JsonDocSource.zoneSkippedFiles.get()
    assert(t.where(col("a") === 7).select(col("s")).collect().length == 64)
    val prunedA = JsonDocSource.zoneSkippedFiles.get() - skipsA
    assert(prunedA >= files / 2,
      s"a probe pruned only $prunedA of $files files")
    // point probe on B prunes too — the thing a lexicographic
    // (a, b) sort cannot do
    val skipsB = JsonDocSource.zoneSkippedFiles.get()
    assert(t.where(col("b") === 13).select(col("s")).collect().length == 64)
    val prunedB = JsonDocSource.zoneSkippedFiles.get() - skipsB
    assert(prunedB >= files / 2,
      s"b probe pruned only $prunedB of $files files")
    // and the values are right under the pruning
    assert(t.where(col("a") === 7 && col("b") === 13)
      .select(col("s")).collect().map(_.getString(0)).toSeq ==
      Seq("p" + (13 * 64 + 7)))
  }

  test("SQL VERSION AS OF resolves save-id history; TIMESTAMP AS OF and junk versions are loud") {
    useCatalog()
    val dir = graft.TempRoots.path("catalog_version_asof")
    new java.io.File(dir).mkdirs()
    import spark.implicits._
    graft.streaming.EventStreams.ingestEpoch(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir, batchId = 0L)
    graft.streaming.EventStreams.ingestEpoch(
      Seq((3L, "c")).toDF("id", "s"), dir, batchId = 1L)
    val saves = JsonMeta.saves(spark, dir)
    assert(saves.size == 2)
    def idsAt(v: Long): Seq[Long] = spark.sql(
      s"SELECT id FROM graft.`$dir` VERSION AS OF $v")
      .collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    assert(idsAt(saves.head) == Seq(1L, 2L))
    assert(idsAt(saves.last) == Seq(1L, 2L, 3L))
    // the version surface shares the pinned-snapshot guards: a
    // nonexistent save is the resolver's own loud error
    val e = intercept[Exception](idsAt(99L))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("has no save 99")), chain(e).mkString("|"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT id FROM graft.`$dir` VERSION AS OF 'junk'").collect())
    assert(chain(e2).exists(_.contains("save id")), chain(e2).mkString("|"))
    val e3 = intercept[Exception](spark.sql(
      s"SELECT id FROM graft.`$dir` TIMESTAMP AS OF '2026-01-01'").collect())
    assert(chain(e3).exists(_.contains("TIMESTAMP AS OF is unsupported")),
      chain(e3).mkString("|"))
  }

  test("streaming through catalog identifiers: writeStream.toTable publishes epochs, readStream.table tails incrementally") {
    useCatalog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = graft.TempRoots.path("catalog_streaming")
    val t = s"graft.`$dir`"
    // the path-addressed catalog keeps no metadata store, so toTable
    // requires the directory to exist — seed it the way a real
    // pipeline would, then stream into it
    spark.sql(s"CREATE TABLE $t AS SELECT CAST(0 AS BIGINT) AS id, 'seed' AS s")
    // sink: memory stream → toTable resolves the SAME deterministic-
    // epoch streaming write the path API uses
    val ms = MemoryStream[(Long, String)]
    val sink = ms.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", graft.TempRoots.path("cat_stream_ck1"))
      .toTable(t)
    try {
      ms.addData((1L, "a"), (2L, "b"))
      sink.processAllAvailable()
      assert(spark.table(t).count() == 3L)
      // source: readStream.table tails the identifier; a later SQL
      // INSERT INTO is picked up incrementally (append-only contract)
      val tail = spark.readStream.table(t)
        .writeStream.format("memory").queryName("cat_stream_tail")
        .option("checkpointLocation", graft.TempRoots.path("cat_stream_ck2"))
        .start()
      try {
        tail.processAllAvailable()
        assert(spark.table("cat_stream_tail").count() == 3L)
        spark.sql(s"INSERT INTO $t (id, s) VALUES (3, 'c')")
        tail.processAllAvailable()
        val got = spark.table("cat_stream_tail").collect()
          .map(_.getAs[Number]("id").longValue).sorted.toSeq
        assert(got == Seq(0L, 1L, 2L, 3L), got)
      } finally tail.stop()
    } finally sink.stop()
  }

  test("two-key clusterBy through the PATH writer fails at planning (no function catalog), one-key still works") {
    val dir = graft.TempRoots.path("catalog_zorder_pathapi")
    val df = spark.range(100).select((col("id") % 10).as("a"),
      (col("id") / 10).as("b"))
    val e = intercept[Exception] {
      df.write.format("graftjson")
        .option("clusterBy", "a,b").mode("overwrite").save(dir)
    }
    // the engine's own unresolved-function error names the transform —
    // the documented pointer to the catalog route
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains(GraftCatalog.MortonName) ||
      m.toLowerCase.contains("function")), chain(e).mkString(" | "))
    df.write.format("graftjson")
      .option("clusterBy", "a").mode("overwrite").save(dir)
    assert(spark.read.format("graftjson").option("refresh", "true")
      .load(dir).count() == 100L)
  }
}
