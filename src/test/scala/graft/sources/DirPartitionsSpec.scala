package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hive-style partition-directory reading (`dirPartitions=true`,
  * r17 — VERDICT r16 #5): a single `<col>=<value>/` directory level
  * becomes a derived partition column, and predicates on it prune the
  * LISTING (the never-statted pin lives in PlanQualitySpec). */
class DirPartitionsSpec extends SparkTestBase {

  private def mkTree(name: String,
                     parts: Seq[(String, Seq[String])]): String = {
    val root = new java.io.File(graft.TempRoots.path(name))
    root.mkdirs()
    parts.foreach { case (dirName, lines) =>
      val d = new java.io.File(root, dirName)
      d.mkdirs()
      val w = new java.io.PrintWriter(new java.io.File(d, "part-0.json"))
      lines.foreach(w.println)
      w.close()
    }
    root.toString
  }

  private def load(dir: String) =
    spark.read.format("graftjson").option("dirPartitions", "true").load(dir)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a bigint partition column derives from the directory names, appends per row, and equality/range/IN predicates prune the listing") {
    val dir = mkTree("dirpart_long", Seq(
      "y=2024" -> Seq("""{"id": 1, "v": "a"}""", """{"id": 2, "v": "b"}"""),
      "y=2025" -> Seq("""{"id": 3, "v": "c"}"""),
      "y=2026" -> Seq("""{"id": 4, "v": "d"}""", """{"id": 5, "v": "e"}""")))
    val df = load(dir)
    assert(df.schema.fields.last.name == "y")
    assert(df.schema.fields.last.dataType == LongType)
    // unfiltered: every row carries its directory's value
    val all = df.select(col("id").cast("long"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(all == Seq((1L, 2024L), (2L, 2024L), (3L, 2025L),
      (4L, 2026L), (5L, 2026L)))
    // equality prunes to one directory
    val eq = df.filter(col("y") === 2025)
    assert(planOf(eq).contains("DirPartitions: y kept 1/3"), planOf(eq))
    assert(eq.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    // range prunes (bigint ordering is unambiguous)
    val ge = df.filter(col("y") >= 2025)
    assert(planOf(ge).contains("DirPartitions: y kept 2/3"), planOf(ge))
    assert(ge.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L))
    // IN prunes
    val in = df.filter(col("y").isin(2024, 2026))
    assert(planOf(in).contains("DirPartitions: y kept 2/3"), planOf(in))
    assert(in.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    // a predicate matching nothing keeps zero directories, zero rows
    val none = df.filter(col("y") === 1999)
    assert(planOf(none).contains("DirPartitions: y kept 0/3"), planOf(none))
    assert(none.count() == 0L)
    // pruning applies even when the partition column is NOT projected
    val proj = df.filter(col("y") === 2025).select(col("id").cast("long"))
    assert(planOf(proj).contains("DirPartitions: y kept 1/3"))
    assert(proj.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("a string partition column unescapes Hive path encoding, reads the null sentinel as SQL NULL, and negation respects three-valued logic") {
    val dir = mkTree("dirpart_str", Seq(
      "cat=a b" -> Seq("""{"id": 1}"""),
      "cat=x%3Dy" -> Seq("""{"id": 2}"""), // unescapes to x=y
      "cat=__HIVE_DEFAULT_PARTITION__" -> Seq("""{"id": 3}""")))
    val df = load(dir)
    assert(df.schema.fields.last.dataType == StringType)
    val vals = df.select(col("id").cast("long"), col("cat")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(vals == Seq((1L, Some("a b")), (2L, Some("x=y")),
      (3L, None)))
    val eq = df.filter(col("cat") === "x=y")
    assert(planOf(eq).contains("DirPartitions: cat kept 1/3"), planOf(eq))
    assert(eq.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // IS NULL keeps exactly the sentinel directory
    val nul = df.filter(col("cat").isNull)
    assert(planOf(nul).contains("DirPartitions: cat kept 1/3"))
    assert(nul.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    // cat != 'a b' must DROP the null partition (NOT(NULL) is NULL)
    val ne = df.filter(col("cat") =!= "a b")
    assert(planOf(ne).contains("DirPartitions: cat kept 1/3"), planOf(ne))
    assert(ne.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // prefix match prunes (byte-order-free semantics)
    val pre = df.filter(col("cat").startsWith("a"))
    assert(planOf(pre).contains("DirPartitions: cat kept 1/3"))
    assert(pre.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("non-canonical integers stay STRING — month=07 must not surprise as 7") {
    val dir = mkTree("dirpart_lead0", Seq(
      "m=07" -> Seq("""{"id": 1}"""),
      "m=7" -> Seq("""{"id": 2}""")))
    val df = load(dir)
    assert(df.schema.fields.last.dataType == StringType)
    assert(df.filter(col("m") === "07").select(col("id").cast("long"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("layout violations and column collisions fail loudly at load") {
    // a loose data file at the root
    val loose = mkTree("dirpart_loose", Seq("y=1" -> Seq("""{"id": 1}""")))
    val w = new java.io.PrintWriter(new java.io.File(loose, "stray.json"))
    w.println("""{"id": 9}"""); w.close()
    val e1 = intercept[IllegalArgumentException](load(loose).count())
    assert(e1.getMessage.contains("stray.json"), e1.getMessage)
    // two different partition keys
    val mixed = mkTree("dirpart_mixed", Seq(
      "a=1" -> Seq("""{"id": 1}"""), "b=2" -> Seq("""{"id": 2}""")))
    val e2 = intercept[IllegalArgumentException](load(mixed).count())
    assert(e2.getMessage.contains("exactly ONE partition column"),
      e2.getMessage)
    // the derived column name collides with a data field
    val clash = mkTree("dirpart_clash", Seq(
      "v=1" -> Seq("""{"id": 1, "v": "x"}""")))
    val e3 = intercept[IllegalArgumentException](load(clash).count())
    assert(e3.getMessage.contains("carries a field of that name"),
      e3.getMessage)
  }

  test("dirPartitions is read-side only: writes, streaming, time travel, and option combos reject with named errors") {
    val dir = mkTree("dirpart_ro", Seq(
      "y=1" -> Seq("""{"id": 1}"""), "y=2" -> Seq("""{"id": 2}""")))
    // write
    val e1 = intercept[Exception] {
      spark.range(1).selectExpr("id", "'x' as v")
        .write.format("graftjson").option("dirPartitions", "true")
        .mode("append").save(dir)
    }
    assert(exists(e1, "read-side only"), e1.getMessage)
    // time travel combo
    val e2 = intercept[Exception](
      spark.read.format("graftjson").option("dirPartitions", "true")
        .option("asOfSave", "1").load(dir).count())
    assert(exists(e2, "incompatible with asOfSave"), e2.getMessage)
    // whole combo
    val e3 = intercept[Exception](
      spark.read.format("graftjson").option("dirPartitions", "true")
        .option("whole", "true").load(dir).count())
    assert(exists(e3, "does not support whole=true"), e3.getMessage)
    // streaming
    val e4 = intercept[Exception] {
      val q = spark.readStream.format("graftjson")
        .option("dirPartitions", "true").load(dir)
        .writeStream.format("noop")
        .option("checkpointLocation",
          graft.TempRoots.path("dirpart_ro_ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(exists(e4, "batch read option"), e4.getMessage)
  }

  private def exists(e: Throwable, needle: String): Boolean =
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains(needle)))

  test("unsupported predicate shapes stay residual (correct, unpruned) and zone maps still skip within kept directories") {
    val dir = mkTree("dirpart_residual", Seq(
      "cat=aa" -> Seq("""{"id": 1, "n": 5}""", """{"id": 2, "n": 50}"""),
      "cat=ab" -> Seq("""{"id": 3, "n": 500}"""),
      "cat=bb" -> Seq("""{"id": 4, "n": 5000}""")))
    val df = spark.read.format("graftjson")
      .option("dirPartitions", "true").option("zonemaps", "true").load(dir)
    // endsWith is not a consumable shape: residual evaluation, no
    // pruning (kept reads 3/3 — partKept never set)
    val ew = df.filter(col("cat").endsWith("b"))
    assert(planOf(ew).contains("DirPartitions: cat kept 3/3"), planOf(ew))
    assert(ew.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // partition predicate + data predicate: directories prune AND the
    // zone map skips the non-matching file within the kept dirs
    val both = df.filter(col("cat").startsWith("a") && col("n") > 100)
    assert(planOf(both).contains("DirPartitions: cat kept 2/3"))
    assert(both.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L))
  }

  test("metadata answering SCOPES to the kept directories under a consumed partition predicate, and declines for undecidable shapes") {
    // v lands in the BIGINT bucket so SUM pushes as a bare reference
    val dir = mkTree("dirpart_agg", Seq(
      "y=1" -> Seq("""{"id": 1, "v": 10000000001}""",
        """{"id": 2, "v": 10000000002}"""),
      "y=2" -> Seq("""{"id": 3, "v": 10000000003}""")))
    val df = spark.read.format("graftjson")
      .option("dirPartitions", "true").option("zonemaps", "true").load(dir)
    // a CONSUMED partition predicate: the classic partition-count
    // query answers from zone metadata over exactly the kept
    // directories' files — zero bytes read
    val filtered = df.filter(col("y") === 1).agg(count(lit(1)).as("c"))
    assert(filtered.collect()(0).getLong(0) == 2L)
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      filtered.queryExecution.executedPlan.toString)
    // SUM over the kept directories answers too
    val summed = df.filter(col("y") === 2).agg(sum(col("v")).as("s"))
    assert(summed.collect()(0).getLong(0) == 10000000003L)
    assert(summed.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      summed.queryExecution.executedPlan.toString)
    // an UNDECIDABLE partition shape keeps a residual Filter, so the
    // push is never attempted — correct through the ordinary scan
    val residual = df.filter(col("y").cast("string").endsWith("1"))
      .agg(count(lit(1)).as("c"))
    assert(residual.collect()(0).getLong(0) == 2L)
    assert(!residual.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      residual.queryExecution.executedPlan.toString)
    // without any predicate the whole-table answer stays available
    val whole = df.agg(count(lit(1)).as("c"))
    assert(whole.collect()(0).getLong(0) == 3L)
    assert(whole.queryExecution.executedPlan.toString
      .contains("PushedAggregation"),
      whole.queryExecution.executedPlan.toString)
    // grouping BY the partition column: correct through the scan (the
    // column lives in directory names, zones cannot decide it)
    val grouped = df.groupBy("y").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(grouped == Seq((1L, 2L), (2L, 1L)))
  }

  test("post-load tree changes (self-review r17): a NEW partition directory is visible to pruned scans; foreign-key or type-breaking directories fail loudly on any scan") {
    val dir = mkTree("dirpart_live", Seq(
      "y=1" -> Seq("""{"id": 1}"""), "y=2" -> Seq("""{"id": 2}""")))
    val df = load(dir)
    // a directory added AFTER load: the pruned scan re-lists live, so
    // it must see it exactly like the unfiltered scan does
    val d3 = new java.io.File(dir, "y=3"); d3.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(d3, "part-0.json"))
    w.println("""{"id": 3}"""); w.close()
    assert(df.count() == 3L)
    assert(df.filter(col("y") >= 2).select(col("id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // a FOREIGN key directory: loud on every scan (a silent mislabel
    // — or silent inclusion — was the review find)
    val dz = new java.io.File(dir, "z=9"); dz.mkdirs()
    val wz = new java.io.PrintWriter(new java.io.File(dz, "part-0.json"))
    wz.println("""{"id": 99}"""); wz.close()
    val e1 = intercept[Exception](df.count())
    assert(exists(e1, "the tree changed after load"), e1.getMessage)
    val e2 = intercept[Exception](df.filter(col("y") === 2).count())
    assert(exists(e2, "the tree changed after load"), e2.getMessage)
    assert(dz.listFiles().forall(_.delete()) && dz.delete())
    // a value that breaks the load-time BIGINT derivation: loud too
    val da = new java.io.File(dir, "y=abc"); da.mkdirs()
    val wa = new java.io.PrintWriter(new java.io.File(da, "part-0.json"))
    wa.println("""{"id": 98}"""); wa.close()
    val e3 = intercept[Exception](df.filter(col("y") === 2).count())
    assert(exists(e3, "not a canonical BIGINT"), e3.getMessage)
  }

  test("runtime (DPP) filters on the partition column prune consumably and the join stays correct") {
    val dir = mkTree("dirpart_dpp", Seq(
      "y=1" -> Seq("""{"id": 1}"""),
      "y=2" -> Seq("""{"id": 2}"""),
      "y=3" -> Seq("""{"id": 3}""")))
    val fact = load(dir)
    import spark.implicits._
    val dim = Seq((2L, "two")).toDF("y", "name")
    val joined = fact.join(org.apache.spark.sql.functions.broadcast(dim),
      "y")
    assert(joined.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // the mechanism itself: a runtime In conjunction keeps exactly
    // the admitted directories
    val spec = DirPartitions.derive(spark, dir)
    val kept = DirPartitions.keptOf(spec.dirs,
      Seq(org.apache.spark.sql.sources.In("y",
        Array(2L: java.lang.Long))), isLong = true)
    assert(kept == Seq("y=2"), kept)
  }

  test("the _file metadata column and the partition column compose") {
    val dir = mkTree("dirpart_file", Seq(
      "y=1" -> Seq("""{"id": 1}"""), "y=2" -> Seq("""{"id": 2}""")))
    val rows = load(dir).select(col("id").cast("long"), col("y"),
      col("_file")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(rows.map(t => (t._1, t._2)) == Seq((1L, 1L), (2L, 2L)))
    assert(rows.forall { case (_, y, f) => f.contains(s"y=$y/") },
      rows.mkString(", "))
  }
}
