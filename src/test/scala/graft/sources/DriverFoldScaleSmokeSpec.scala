package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.LessThan

/** Driver-fold scale smoke ([[graft.ops.ScaleSmokeSpec]]'s sibling in
  * the sources package — VERDICT r14 #6): the newest DRIVER-SIDE
  * metadata folds are O(files) with small constants — the
  * metadata-only DELETE decision (a per-file zone proof over the
  * listing), vacuum's manifest fold (segment entries ∝ files), and
  * catalog/planning resolution from durable meta. A 100 TB table has
  * 10⁵–10⁶ files; a quadratic fold looks fine at one scale and only
  * betrays itself in the GROWTH rate, so this suite fabricates 1× and
  * 10× file populations and pins t(10×) ≲ linear alongside exactness
  * of the decisions themselves. Tagged Slow like every scale smoke. */
class DriverFoldScaleSmokeSpec extends SparkTestBase {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** t(10×) within 20× of t(1×), floored: driver folds are ms-scale,
    * so the floor absorbs JIT/host noise while a quadratic fold
    * (~100× at 10× files) still fails loudly. */
  private def assertLinear(what: String, t1: Double, t10: Double): Unit =
    assert(t10 <= 20.0 * math.max(t1, 0.25),
      s"$what: ${t10}s at 10x files vs ${t1}s at 1x - super-linear fold")

  /** `n` single-part NDJSON files (5 rows each, id-clustered so every
    * file is zone-decidable), with durable planning meta saved. */
  private def mkTable(name: String, n: Int): String = {
    val dir = new java.io.File(graft.TempRoots.path(name))
    dir.mkdirs()
    for (k <- 0 until n) {
      val w = new java.io.PrintWriter(
        new java.io.File(dir, f"p$k%05d.json"))
      for (i <- 0 until 5) w.println(s"""{"id": ${k * 10 + i}, "part": $k}""")
      w.close()
    }
    JsonMeta.save(spark, dir.toString)
    dir.toString
  }

  test("decide/vacuum/catalog driver folds at 10x files: linear growth, exact decisions", graft.Slow) {
    val d1 = mkTable("fold_scale_1x", 120)
    val d10 = mkTable("fold_scale_10x", 1200)
    // warm the in-memory planning layer on both (the folds under test
    // run on the DRIVER over already-resolved per-file results — a
    // cold walk would time the Spark job, not the fold)
    spark.read.format("graftjson").option("zonemaps", "true")
      .load(d1).count()
    spark.read.format("graftjson").option("zonemaps", "true")
      .load(d10).count()

    // 1. metadata-only DELETE decision: one zone proof per file. The
    // predicate removes exactly the first 5 files WHOLE on both
    // tables (ids < 50 ⇔ file k <= 4), every other file provably
    // empty — so the fold visits ALL files and the decision is exact.
    def decideBoth(dir: String) =
      JsonDocDelete.decide(spark, dir, Seq(LessThan("id", 50)))
    decideBoth(d1) // warmup (JIT)
    val (r1, t1) = timed(decideBoth(d1))
    val (r10, t10) = timed(decideBoth(d10))
    assertLinear("JsonDocDelete.decide", t1, t10)
    assert(r1.exists(_.size == 5), s"1x decision: $r1")
    assert(r10.exists(_.size == 5), s"10x decision: $r10")

    // 2. vacuum's manifest fold: mint a second save (one appended
    // file) so there is history, then vacuum to one retained save —
    // the fold deserializes and merges segment entries ∝ files.
    def appendAndVacuum(dir: String, n: Int): JsonMeta.VacuumReport = {
      val w = new java.io.PrintWriter(
        new java.io.File(dir, f"p$n%05d.json"))
      w.println(s"""{"id": ${n * 10}, "part": $n}"""); w.close()
      JsonMeta.save(spark, dir)
      JsonMeta.vacuum(spark, dir, retainSaves = 1)
    }
    val (v1, vt1) = timed(appendAndVacuum(d1, 120))
    val (v10, vt10) = timed(appendAndVacuum(d10, 1200))
    assertLinear("JsonMeta.vacuum fold", vt1, vt10)
    assert(v1.retainedSaves.size == 1 && v10.retainedSaves.size == 1)

    // 3. catalog/planning resolution: schema resolution through the
    // durable meta after a fresh-JVM-style cache drop — the driver
    // looks up every file's entry in the manifest's segments (the
    // loadTable path's cost at 10⁶ files). listFiles is the shared
    // listing both the catalog and the reader resolve through.
    useCatalog()
    def resolve(dir: String): Int = {
      JsonDocSource.clearInferCache()
      JsonMeta.clearParsed()
      spark.sql(s"DESCRIBE TABLE graft.`$dir`").collect().length
    }
    resolve(d1) // warmup
    val (c1, ct1) = timed(resolve(d1))
    val (c10, ct10) = timed(resolve(d10))
    assertLinear("catalog resolve from durable meta", ct1, ct10)
    assert(c1 >= 2 && c10 >= 2) // id + part resolved on both
    // meta served the resolution: no file re-walk happened
    val walked = JsonDocSource.filesWalked.get()
    resolve(d10)
    assert(JsonDocSource.filesWalked.get() == walked,
      "catalog resolution re-walked files despite durable meta")
  }
}
