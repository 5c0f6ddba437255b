package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Similarity-search correctness against a locally computed oracle. */
class VectorOpsSpec extends SparkTestBase {

  private def vecs: Seq[(Long, Seq[Float], Int)] = {
    val rnd = new scala.util.Random(123)
    (0L until 60L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat), (i % 4).toInt))
  }

  private def df = spark.createDataFrame(vecs).toDF("vec_id", "embedding", "label")

  private def localCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("brute-force cosine top-k matches the local oracle") {
    val k = 3
    val got = VectorOps.cosineTopK(df, df.where(col("vec_id") < 2), k)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id")))
    val byId = vecs.map(v => v._1 -> v._2).toMap
    for (q <- Seq(0L, 1L)) {
      val expect = vecs.filter(_._1 != q)
        .map(v => (v._1, BigDecimal(localCosine(byId(q), v._2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      val mine = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(mine == expect, s"query $q")
    }
  }

  test("LSH ANN returns only true bucket-mates ranked by cosine") {
    val out = VectorOps.annTopK(df, df.where(col("vec_id") < 5), 3, bits = 4, dim = 16)
      .collect()
    assert(out.nonEmpty)
    // ranks are contiguous from 1 per query
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length).toSeq)
    }
  }

  test("IVF ANN probes cells and achieves reasonable recall vs brute force") {
    val k = 5
    val queries = df.where(col("vec_id") < 4)
    val exact = VectorOps.cosineTopK(df, queries, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = VectorOps.ivfTopK(df, queries, k, nCells = 4, nProbe = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(ivf.nonEmpty)
    // probing half the cells of a random corpus should recover a
    // meaningful share of the true top-k
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall, ivf=$ivf, exact=$exact")
  }

  test("IVF+PQ: exhaustive settings reproduce the exact top-k; reported scores are always exact") {
    val k = 4
    val queries = df.where(col("vec_id") < 4)
    val exact = VectorOps.cosineTopK(df, queries, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"))).toSet
    // probe every cell with an unbounded shortlist: the approximation
    // vanishes and the PQ pipeline must reproduce the exact result —
    // pins the encode/ADC/re-rank plumbing end-to-end
    val full = VectorOps.pqTopK(df, queries, k, nCells = 4, nProbe = 4,
      subs = 4, rerank = 1000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"))).toSet
    assert(full == exact, s"missing=${exact -- full} extra=${full -- exact}")
    // approximate settings: recall floor (same convention as IVF), and
    // every reported score must still be the EXACT cosine — only
    // membership is approximate, never the values
    val byId = vecs.map(v => v._1 -> v._2).toMap
    val approx = VectorOps.pqTopK(df, queries, k, nCells = 4, nProbe = 2,
      subs = 4, rerank = 16).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos")))
    assert(approx.nonEmpty)
    approx.foreach { case (q, v, c) =>
      val expect = BigDecimal(localCosine(byId(q), byId(v)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c == expect, s"($q,$v): reported $c, exact $expect")
    }
    val ids = approx.map(t => (t._1, t._2)).toSet
    val recall = exact.count(e => ids.contains((e._1, e._2))).toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("executor-side probe assignment is identical to the driver path (IVF and PQ)") {
    // same queries through both probe paths: driverProbeLimit large →
    // collect+broadcast, 0 → distributed expression probing; the paths
    // must agree row-for-row (cells from the same quantizer, ADC tables
    // from the same left-to-right dot sequence)
    val queries = df
    def run(limit: Int) = VectorOps.ivfTopK(df, queries, 3,
      nCells = 4, nProbe = 2, driverProbeLimit = limit).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    assert(run(100000) == run(0))
    def runPq(limit: Int) = VectorOps.pqTopK(df, queries, 3,
      nCells = 4, nProbe = 2, subs = 4, rerank = 16,
      driverProbeLimit = limit).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    assert(runPq(100000) == runPq(0))
  }

  test("a 100k-query batch runs through the distributed probe path") {
    // 100k synthetic queries (the 60-vector corpus replicated with
    // fresh ids) — far past any driver-collect comfort zone. The
    // result must agree with the driver path on a common subset (per
    // query, results depend only on that query and the corpus) and
    // cover every query id.
    val nRep = 100000 / 60 + 1
    val queries = df.crossJoin(spark.range(nRep).toDF("rep"))
      .select((col("vec_id") + col("rep") * 100 + 1000).as("vec_id"),
        col("embedding"))
      .limit(100000)
    val big = VectorOps.ivfTopK(df, queries, 3, nCells = 4, nProbe = 2,
      driverProbeLimit = 1024)
    val got = big.groupBy().agg(
        countDistinct(col("query_id")).as("nq"),
        count(lit(1)).as("n")).collect()(0)
    assert(got.getAs[Long]("nq") == 100000L, s"queries covered: $got")
    assert(got.getAs[Long]("n") == 300000L, s"rows: $got")
    // common subset: the first replica (rep=0 → ids 1000..1059) is the
    // corpus itself under shifted ids; the driver path over just those
    // 60 queries must produce the same neighbors and scores
    val subset = queries.where(col("vec_id") < 1100)
    val viaDriver = VectorOps.ivfTopK(df, subset, 3, nCells = 4,
      nProbe = 2, driverProbeLimit = 1024).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    val fromBig = big.where(col("query_id") < 1100).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    assert(fromBig == viaDriver)
  }

  test("IVF-cell near-dup: exhaustive assignment equals brute force; defaults keep recall") {
    val emb = graft.queries.Tables(spark, sfDir, "embeddings")
    val brute = VectorOps.embeddingNearDup(emb.withColumn("label", lit(0)), 0.4)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nAssign == nCells: every vector in every cell — the cell
    // blocking degenerates to (deduplicated) all-pairs, so the result
    // must equal brute force EXACTLY
    val full = VectorOps.embeddingNearDupIvf(emb, 0.4, nCells = 8, nAssign = 8)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, s"missing=${brute -- full} extra=${full -- brute}")
    // default multi-assignment on the near-random corpus (the hardest
    // case for cell blocking: cos 0.4 pairs are barely correlated, so
    // their cells genuinely differ): measured 54/66 at nAssign=2,
    // 66/66 at nAssign=4 (sf0.001) — pin the default's floor
    val dflt = VectorOps.embeddingNearDupIvf(emb, 0.4)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt.subsetOf(brute), "IVF path invented a pair")
    val recall = dflt.size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall")
  }

  test("IVF+PQ survives a corpus smaller than the codebook") {
    val tiny = spark.createDataFrame(vecs.take(5)).toDF("vec_id", "embedding", "label")
    val out = VectorOps.pqTopK(tiny, tiny.where(col("vec_id") === 0), 2, subs = 4)
      .collect()
    assert(out.length == 2)
  }

  test("kmeansRefine: monotone inertia, layout independence, full parity with a local reference") {
    def collectStats(d: org.apache.spark.sql.DataFrame, iters: Int) =
      VectorOps.kmeansRefine(d, nCells = 4, iters = iters).collect()
        .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("n_rows"),
          r.getAs[Double]("rss"), r.getAs[Double]("mean_dist")))
        .sortBy(_._1).toSeq
    // refinement helps: total RSS is non-increasing in iteration count
    val rssByIters = Seq(0, 1, 3, 6).map(i => collectStats(df, i).map(_._3).sum)
    rssByIters.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"rss rose: $rssByIters")
      case _ => ()
    }
    val stats = collectStats(df, 3)
    assert(stats.map(_._2).sum == 60L) // sizes cover the corpus
    // layout independence: exact decimal sums → identical output on a
    // different partitioning
    assert(collectStats(df.repartition(7), 3) == stats)

    // full local reference: same sample order (via the engine's own
    // hash expression), same init, 5 local Lloyd iters in double, then
    // 3 refinement rounds with decimal(30,12)-rounded sums — HALF_UP
    // at 12 dp, exact accumulation, doubleValue/n centers — and final
    // stats under the final centers. Bit-for-bit comparison.
    val ordered = df
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000000007L)), col("vec_id"))
      .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray)
    val n = ordered.length
    var centers = Array.tabulate(4)(i => ordered((i.toLong * n / 4).toInt).clone())
    def nearest(p: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (i <- cs.indices) {
        var dot = 0.0; var c2 = 0.0; var j = 0
        while (j < p.length) { dot += p(j) * cs(i)(j); c2 += cs(i)(j) * cs(i)(j); j += 1 }
        val d = -2.0 * dot + c2
        if (d < bestD) { bestD = d; best = i }
      }
      best
    }
    // init: plain-double Lloyd over the sample (= whole corpus here),
    // empty cells keep their center, ties to lower cell — localKMeans
    // uses ‖p−c‖² but argmin ties behave identically on this data
    for (_ <- 0 until 5) {
      val groups = ordered.groupBy(p => nearest(p, centers))
      centers = centers.indices.map(i => groups.get(i) match {
        case Some(ps) =>
          val s = new Array[Double](16)
          ps.foreach(p => for (j <- 0 until 16) s(j) += p(j))
          s.map(_ / ps.length)
        case None => centers(i)
      }).toArray
    }
    // same fixed-point 1e-12 term quantization as the engine
    def dec(x: Double) = java.math.BigDecimal
      .valueOf(VectorOps.quantize12(x), 12)
    def refStats(cs: Array[Array[Double]]) =
      ordered.groupBy(p => nearest(p, cs)).map { case (cell, ps) =>
        val sx = Array.fill(16)(java.math.BigDecimal.ZERO)
        var sxx = java.math.BigDecimal.ZERO
        ps.foreach { p =>
          for (j <- 0 until 16) sx(j) = sx(j).add(dec(p(j)))
          p.foreach(x => sxx = sxx.add(dec(x * x)))
        }
        cell -> ((ps.length.toLong, sx.map(_.doubleValue), sxx.doubleValue))
      }
    for (_ <- 0 until 3) {
      val st = refStats(centers)
      centers = centers.indices.map(i => st.get(i) match {
        case Some((m, sx, _)) => sx.map(_ / m)
        case None => centers(i)
      }).toArray
    }
    val want = refStats(centers).toSeq.sortBy(_._1).map { case (cell, (m, sx, sxx)) =>
      val c = centers(cell)
      var dot = 0.0; var c2 = 0.0; var j = 0
      while (j < 16) { dot += sx(j) * c(j); c2 += c(j) * c(j); j += 1 }
      val rss = math.max(0.0, sxx - 2.0 * dot + m * c2)
      (cell, m, math.rint(rss * 10000) / 10000,
        math.rint(math.sqrt(rss / m) * 10000) / 10000)
    }
    assert(stats == want)
  }

  test("pcaBasis solves the exact covariance; pcaProject is centered, variance-ordered, layout-independent") {
    val dim = 16
    val (n, mean, evals, basis) = VectorOps.pcaBasis(df, 3, dim)
    assert(n == 60L)
    // local EXACT covariance: same fixed-point 1e-12 term quantization
    // (quantize12), exact integer sums
    def dec(x: Double) = java.math.BigDecimal
      .valueOf(VectorOps.quantize12(x), 12)
    val pts = vecs.map(_._2.map(_.toDouble).toArray)
    val sums = Array.fill(dim)(java.math.BigDecimal.ZERO)
    val prods = Array.fill(dim, dim)(java.math.BigDecimal.ZERO)
    pts.foreach { p =>
      for (i <- 0 until dim) {
        sums(i) = sums(i).add(dec(p(i)))
        for (j <- i until dim) prods(i)(j) = prods(i)(j).add(dec(p(i) * p(j)))
      }
    }
    val m = sums.map(_.doubleValue / 60)
    assert(mean.zip(m).forall { case (a, b) => a == b },
      "mean must match the exact-decimal local computation bit-for-bit")
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      prods(a)(b).doubleValue / 60 - m(i) * m(j)
    }
    // eigen residual: ‖C e − λ e‖ small for every returned component
    basis.zip(evals).foreach { case (e, l) =>
      val r = (0 until dim).map(i =>
        (0 until dim).map(j => cov(i)(j) * e(j)).sum - l * e(i))
      assert(math.sqrt(r.map(x => x * x).sum) < 1e-9, s"residual for λ=$l")
    }
    // orthonormal, variance-ordered, all eigenvalues of a covariance ≥ ~0
    basis.indices.foreach { a =>
      basis.indices.foreach { b =>
        val dot = basis(a).zip(basis(b)).map { case (x, y) => x * y }.sum
        assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
      }
    }
    assert(evals.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(evals.forall(_ > -1e-10))
    assert(evals.length == dim)
    // projection: centered (mean ≈ 0 per component), empirical variance
    // tracks the eigenvalue, layout-independent
    val proj = VectorOps.pcaProject(df, 3, dim).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pc1"),
        r.getAs[Double]("pc2"), r.getAs[Double]("pc3"))).toSeq
    assert(proj.size == 60)
    val cols = Seq(proj.map(_._2), proj.map(_._3), proj.map(_._4))
    cols.zip(evals.take(3)).foreach { case (c, l) =>
      val mu = c.sum / c.size
      assert(math.abs(mu) < 1e-3, s"projection not centered: $mu")
      val varc = c.map(x => (x - mu) * (x - mu)).sum / c.size
      assert(math.abs(varc - l) / l < 0.01, s"var $varc vs λ $l")
    }
    val proj2 = VectorOps.pcaProject(df.repartition(7), 3, dim).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("pc1"),
        r.getAs[Double]("pc2"), r.getAs[Double]("pc3"))).toSeq
    assert(proj2 == proj)
  }

  test("labelCentroids matches the locally computed per-label means") {
    val out = VectorOps.labelCentroids(df).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("pos")) ->
        (r.getAs[Double]("mean_val"), r.getAs[Long]("n_vectors"))).toMap
    assert(out.size == 4 * 16) // 4 labels × 16 dims
    val grouped = vecs.groupBy(_._3)
    for (label <- 0 to 3; pos <- 1 to 16) {
      val members = grouped(label)
      val expect = members.map(_._2(pos - 1).toDouble).sum / members.size
      val (got, n) = out((label, pos.toLong))
      assert(n == members.size)
      assert(math.abs(got - expect) < 1e-3, s"label $label pos $pos")
    }
  }

  test("annRecall reports hits/n_exact in [0,1] for every query") {
    val out = VectorOps.annRecall(df, df.where(col("vec_id") < 3), 3,
      bits = 4, dim = 16).collect()
    assert(out.map(_.getAs[Long]("query_id")).toSet == Set(0L, 1L, 2L))
    out.foreach { r =>
      // k is the REQUESTED parameter; n_exact the actual denominator
      assert(r.getAs[Long]("k") == 3L)
      val nExact = r.getAs[Long]("n_exact")
      assert(nExact >= 1L && nExact <= 3L)
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      // recall is exported rounded to 4 decimals (1/3 → 0.3333)
      assert(math.abs(recall -
        r.getAs[Long]("n_hits").toDouble / nExact) < 1e-4)
    }
  }

  test("quantizeEmbeddings: int8 error bounded by scale/2, nothing clipped") {
    val out = VectorOps.quantizeEmbeddings(df).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val maxAbs = r.getAs[Double]("max_abs")
      val scale = maxAbs / 127.0
      // round-to-nearest quantization error is at most half a step
      // (+ rounding slack from the 6-decimal export)
      assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-6,
        s"pos ${r.getAs[Long]("pos")}")
      // |q| = |round(v/scale)| ≤ round(127) → clamp never engages
      assert(r.getAs[Long]("n_clipped") == 0L)
      assert(r.getAs[Long]("n_values") == vecs.size.toLong)
    }
  }

  test("embedding near-dup respects the label blocking and threshold") {
    val pairs = VectorOps.embeddingNearDup(df, 0.5).collect()
    val byId = vecs.map(v => v._1 -> v._2).toMap
    val labels = vecs.map(v => v._1 -> v._3).toMap
    pairs.foreach { r =>
      val a = r.getAs[Long]("vec_a"); val b = r.getAs[Long]("vec_b")
      assert(labels(a) == labels(b))
      assert(localCosine(byId(a), byId(b)) >= 0.5 - 1e-9)
    }
    // completeness within blocks
    val expect = (for {
      x <- vecs; y <- vecs
      if x._1 < y._1 && x._3 == y._3 && localCosine(x._2, y._2) >= 0.5
    } yield (x._1, y._1)).toSet
    assert(pairs.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet == expect)
  }

  test("diversitySample: exact per-cell quota, full coverage at large quota, layout-independent") {
    val perCell = 3
    val out = VectorOps.diversitySample(df, perCell, nCells = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("sample_rank")))
    // quota: each cell contributes at most perCell rows with ranks 1..n
    out.groupBy(_._2).foreach { case (cell, rows) =>
      assert(rows.length <= perCell, s"cell $cell over quota")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a vec_id appears at most once (nearest-cell assignment is unique)
    assert(out.map(_._1).distinct.length == out.length)
    // large quota covers the whole corpus exactly once
    val all = VectorOps.diversitySample(df, perCell = 1000, nCells = 4)
      .collect().map(_.getAs[Long]("vec_id")).sorted
    assert(all.toSeq == (0L until 60L).toSeq)
    // layout independence: same rows under any partitioning
    val re = VectorOps.diversitySample(df.repartition(7), perCell, nCells = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("sample_rank"))).toSet
    assert(re == out.toSet)
  }

  test("mmrGreedy: near-dup of the top pick defers below a diverse candidate") {
    val cands = Seq(
      (1L, 0.9, Seq(1.0, 0.0)),   // top relevance
      (2L, 0.89, Seq(1.0, 0.0)),  // exact duplicate direction of 1
      (3L, 0.5, Seq(0.0, 1.0)))   // orthogonal, lower relevance
    val picks = VectorOps.mmrGreedy(cands, k = 3, lambda = 0.7)
    // hand-computed: 1 first (0.63); then 3 (0.35) beats 2 (0.623-0.3=0.323)
    assert(picks.map(_.vec_id) == Seq(1L, 3L, 2L))
    assert(picks.map(_.position) == Seq(1, 2, 3))
    assert(picks.map(_.mmr_score) == Seq(0.63, 0.35, 0.323))
    // plain relevance ranking WOULD have kept the duplicate second —
    // the deferral is the whole point of the operator
    assert(cands.sortBy(-_._2).map(_._1).take(2) == Seq(1L, 2L))
  }

  test("mmrRerank equals the greedy loop over the collected shortlist") {
    val queries = df.where(col("vec_id") < 2)
    val out = VectorOps.mmrRerank(df, queries, k = 5, shortlist = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("position"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("relevance"),
        r.getAs[Double]("mmr_score")))
    val byId = vecs.map(v => v._1 -> v._2).toMap
    def unit(v: Seq[Float]): Seq[Double] = {
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      d.map(_ / n)
    }
    val short = VectorOps.cosineTopK(df, queries, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    for (q <- Seq(0L, 1L)) {
      val cs = short.filter(_._1 == q).sortBy(_._2)
        .map(c => (c._3, c._4, unit(byId(c._3)))).toSeq
      val expect = VectorOps.mmrGreedy(cs, 5, 0.7)
        .map(p => (q, p.position, p.vec_id, p.relevance, p.mmr_score))
      assert(out.filter(_._1 == q).toSeq == expect, s"query $q")
    }
    // layout independence: identical picks under any partitioning
    val re = VectorOps.mmrRerank(df.repartition(7), queries, k = 5,
        shortlist = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("position"),
        r.getAs[Long]("vec_id")))
    assert(re.toSeq == out.map(t => (t._1, t._2, t._3)).toSeq)
  }

  test("randomProject matches a local matvec; jlRecall keeps neighbor structure") {
    val projected = VectorOps.randomProject(df, outDim = 8, inDim = 16)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    // local reference: same seed, same N(0, 1/outDim) draw order
    val rnd = new scala.util.Random(42L)
    val scale = 1.0 / math.sqrt(8.0)
    val planes = Seq.fill(8)(Array.fill(16)(rnd.nextGaussian() * scale))
    val byId = vecs.map(v => v._1 -> v._2.map(_.toDouble)).toMap
    for ((id, v) <- byId) {
      val expect = planes.map(p => p.zip(v).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _))
      val got = projected(id)
      expect.zip(got).foreach { case (e, g) =>
        assert(math.abs(e - g) < 1e-12, s"vec $id") }
    }
    // layout independence: bit-identical projection under repartition
    val re = VectorOps.randomProject(df.repartition(7), 8, 16).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    assert(re == projected)
    // an 8-dim squeeze of random 16-dim vectors keeps coarse
    // neighbor structure: mean recall@5 well above chance (5/59)
    val rec = VectorOps.jlRecall(df, df.where(col("vec_id") < 5), k = 5,
        outDim = 8, inDim = 16).collect()
    assert(rec.length == 5)
    val mean = rec.map(_.getAs[Double]("recall")).sum / rec.length
    assert(mean > 0.2, s"mean recall $mean")
    rec.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      assert(r.getAs[Long]("n_hits") <= 5L)
    }
  }
}
