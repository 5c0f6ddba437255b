package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mergeable HLL sketch store: union-of-sketches equals
  * sketch-of-union, estimates stay inside the HLL error envelope,
  * and shard appends touch only their own partitions. */
class SketchesSpec extends SparkTestBase {

  private lazy val orders = graft.queries.Tables(spark, sfDir, "orders")
  private def shardCol =
    date_format(col("o_orderdate").cast("date"), "yyyy-MM")

  private def merged(dir: String): Seq[(String, Long, Long)] =
    Sketches.mergedDistinct(spark, dir).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_distinct_est"),
        r.getAs[Long]("n_rows"))).sortBy(_._1).toSeq

  test("merged shard sketches equal one global sketch; estimates inside the lgK=12 envelope; exact row counts") {
    val store = graft.TempRoots.path("hll_spec_store")
    Sketches.writeHllShards(orders, store, shardCol,
      col("o_orderpriority"), col("o_custkey"))
    val got = merged(store)
    // union-of-sketches == sketch-of-union: merging the per-month
    // partials must land on the SAME registers a single whole-table
    // sketch builds — same estimate, bit for bit
    val global = orders.groupBy(col("o_orderpriority").as("grp"))
      .agg(hll_sketch_estimate(
          hll_sketch_agg(col("o_custkey"), lit(12))).as("est"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("est"),
        r.getAs[Long]("n"))).sortBy(_._1).toSeq
    assert(got == global)
    // lgK=12 relative standard error ≈ 1.04/√4096 ≈ 1.6%; 3σ ≈ 4.9%
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("d")).toMap
    got.foreach { case (g, est, _) =>
      val ex = exact(g).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"$g: est $est vs exact $ex")
    }
    assert(got.map(_._1).toSet == exact.keySet)
  }

  test("shard append touches only its partition, matches the full build, replays idempotently") {
    val inc = graft.TempRoots.path("hll_spec_inc")
    val full = graft.TempRoots.path("hll_spec_full")
    val maxMonth = orders.select(max(shardCol)).collect()(0).getString(0)
    Sketches.writeHllShards(orders.where(shardCol =!= maxMonth), inc,
      shardCol, col("o_orderpriority"), col("o_custkey"))
    def oldShardFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      new java.io.File(inc).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("shard=") &&
          f.getName != s"shard=$maxMonth")
        .flatMap(walk).map(f => s"${f.getPath}:${f.lastModified}").toSet
    }
    val before = oldShardFiles()
    assert(before.nonEmpty)
    Sketches.writeHllShards(orders.where(shardCol === maxMonth), inc,
      shardCol, col("o_orderpriority"), col("o_custkey"))
    assert(oldShardFiles() == before, "append rewrote existing shards")
    Sketches.writeHllShards(orders, full,
      shardCol, col("o_orderpriority"), col("o_custkey"))
    val appended = merged(inc)
    assert(appended == merged(full))
    // replay the same batch: dynamic overwrite → identical store
    Sketches.writeHllShards(orders.where(shardCol === maxMonth), inc,
      shardCol, col("o_orderpriority"), col("o_custkey"))
    assert(merged(inc) == appended)
  }

  test("pairwise overlap estimates stay inside the compounded envelope") {
    val store = graft.TempRoots.path("hll_overlap_spec")
    Sketches.writeHllShards(orders, store, shardCol,
      col("o_orderpriority"), col("o_custkey"))
    val got = Sketches.overlapEstimate(spark, store).collect()
      .map(r => (r.getAs[String]("grp_a"), r.getAs[String]("grp_b")) ->
        (r.getAs[Long]("est_overlap").toDouble,
          r.getAs[Long]("est_union").toDouble))
      .toMap
    val ids = orders.select(col("o_orderpriority").as("g"),
        col("o_custkey").as("id")).distinct()
      .collect().map(r => r.getString(0) -> r.getAs[Long]("id"))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val groups = ids.keys.toSeq.sorted
    assert(got.keySet ==
      (for (a <- groups; b <- groups if a < b) yield (a, b)).toSet)
    for (((a, b), (ov, un)) <- got) {
      val exOv = (ids(a) & ids(b)).size.toDouble
      val exUn = (ids(a) | ids(b)).size.toDouble
      // inclusion–exclusion compounds three lgK=12 estimates; each is
      // ~1.6% rse of its SET size, and the overlap error scales with
      // the UNION size: allow 3σ·√3 ≈ 8.5% of the exact union
      assert(math.abs(ov - exOv) <= 0.085 * exUn,
        s"($a,$b): est_overlap=$ov exact=$exOv union=$exUn")
      assert(math.abs(un - exUn) <= 0.049 * exUn,
        s"($a,$b): est_union=$un exact=$exUn")
    }
  }

  test("cmsJoinSize: never undercounts, width=1 closed form, collision-free equality, layout-independent") {
    import spark.implicits._
    def exactJoinSize(a: Seq[Long], b: Seq[Long]): Long = {
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      a.map(k => cb.getOrElse(k, 0L)).sum
    }
    val rnd = new scala.util.Random(7)
    val aKeys = Seq.fill(500)(rnd.nextInt(80).toLong)
    val bKeys = Seq.fill(800)(rnd.nextInt(120).toLong)
    val a = aKeys.toDF("k"); val b = bKeys.toDF("k")
    val exact = exactJoinSize(aKeys, bKeys)

    def est(width: Int, af: org.apache.spark.sql.DataFrame = a,
            bf: org.apache.spark.sql.DataFrame = b): Long =
      Sketches.cmsJoinSize(
          Sketches.cmsTable(af, col("k"), depth = 4, width = width),
          Sketches.cmsTable(bf, col("k"), depth = 4, width = width))
        .collect()(0).getDecimal(0).longValueExact()

    // narrow sketch collides heavily but NEVER undercounts
    val narrow = est(16)
    assert(narrow >= exact, s"narrow=$narrow exact=$exact")
    // width=1 degenerates to the closed form |A|·|B|
    assert(est(1) == aKeys.size.toLong * bKeys.size)
    // wide sketch over few keys: w.h.p. no bucket shares two live
    // keys in EVERY hash row, so the min over rows is exact (seeded
    // data — deterministic once green)
    assert(est(1 << 16) == exact)
    // layout independence: same sketch, same estimate, any partitioning
    assert(est(16, a.repartition(7), b.repartition(5)) == narrow)
  }

  test("histogram store: estimates within one bin width of exact quantiles; shard layout independent; counts exact") {
    val li = graft.queries.Tables(spark, sfDir, "lineitem")
    val mm = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi")).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val nBins = 64
    val w = (hi - lo) / nBins
    val ps = Seq(0.5, 0.9, 0.99)

    val store = graft.TempRoots.path("hist_spec_store")
    Sketches.writeHistShards(li, store, col("l_extendedprice"),
      pmod(col("l_orderkey"), lit(8L)), lo, hi, nBins)
    def quantiles(dir: String): Map[Double, Double] =
      Sketches.histQuantiles(spark, dir, lo, hi, nBins, ps).collect()
        .map(r => r.getAs[Double]("p") -> r.getAs[Double]("est")).toMap
    val got = quantiles(store)

    // the exact p-quantile element lives in the first bin whose
    // cumulative count reaches p·N — the same bin the estimator
    // interpolates inside — so the error bound is ONE bin width
    val exact = li.stat.approxQuantile("l_extendedprice",
      ps.toArray, 0.0)
    ps.zip(exact).foreach { case (p, ex) =>
      assert(math.abs(got(p) - ex) <= w + 1e-9,
        s"p=$p est=${got(p)} exact=$ex binWidth=$w") }

    // additivity: a different shard key AND input partitioning merge
    // to the same histogram, hence identical estimates (bit for bit)
    val store2 = graft.TempRoots.path("hist_spec_store2")
    Sketches.writeHistShards(li.repartition(13), store2,
      col("l_extendedprice"), pmod(col("l_partkey"), lit(3L)),
      lo, hi, nBins)
    assert(quantiles(store2) == got)

    // merged counts are exact — no row lost to clamping
    val tot = spark.read.parquet(store)
      .agg(sum(col("c"))).head().getLong(0)
    assert(tot == li.count())
  }

  test("degenerate frame (constant column): the one-ulp widening degrades to a one-bin histogram, quantiles read back the constant") {
    // the q190 guard (ADVICE r9): hi == lo would trip writeHistShards'
    // contract; widening hi by one ulp puts every value in bin 0 and
    // every quantile estimate within one (sub-ulp) bin of the constant
    val const = spark.range(0, 100)
      .select(col("id").as("k"), lit(42.5).as("v"))
    val lo = 42.5
    val hi = Math.nextUp(lo)
    val dir = graft.TempRoots.path("hist_spec_degenerate")
    Sketches.writeHistShards(const, dir, col("v"),
      pmod(col("k"), lit(4L)), lo, hi, nBins = 64)
    val got = Sketches.histQuantiles(spark, dir, lo, hi, nBins = 64,
      ps = Seq(0.5, 0.99)).collect()
      .map(r => r.getAs[Double]("p") -> r.getAs[Double]("est")).toMap
    got.values.foreach(v => assert(math.abs(v - 42.5) <= 1e-9, got))
    // and no row was lost on the way in
    assert(spark.read.parquet(dir).agg(sum(col("c"))).head().getLong(0) == 100L)
  }
}
