package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for [[Retrieval.hybridTopK]] (stored BM25 × stored IVF, RRF):
  * exhaustive probing equals a locally recomputed fusion of the two
  * brute-force lists (what makes q252 fully oracle-able), pruned
  * probing keeps a top-k capture floor (the 100 TB serving economics),
  * and the parameter guard is loud. */
class RetrievalSpec extends SparkTestBase {

  private val nDocs = 80

  // doc i's text mentions 'merge' when i%3==0 (i/3+1 times via repeat)
  // and 'slow' when i%5==0 — deterministic tf/df structure so BM25
  // actually discriminates; filler varies length
  private def docs: DataFrame = {
    val rows = (0 until nDocs).map { i =>
      val m = if (i % 3 == 0) ("merge " * (i / 20 + 1)).trim else ""
      val sl = if (i % 5 == 0) "slow" else ""
      val fill = (s"w$i " * (i % 7 + 1)).trim
      (i.toLong, s"$m $sl $fill".trim)
    }
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  // embeddings clustered in 4 Gaussian families so IVF cells are
  // meaningful; vec_id == doc_id (the corpus convention)
  private def vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(123)
    (0 until nDocs).map { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(16)(d =>
        (c * 2.0 + rnd.nextGaussian() * 0.3 +
          (if (d % 4 == c) 3.0 else 0.0)).toFloat))
    }
  }

  private def embeddings: DataFrame =
    spark.createDataFrame(vecs).toDF("vec_id", "embedding")

  private lazy val invDir = {
    val d = graft.TempRoots.path("retrieval_spec_inv")
    InvertedIndex.build(docs, d, nBuckets = 8)
    d
  }
  private lazy val ivfDir = {
    val d = graft.TempRoots.path("retrieval_spec_ivf")
    VectorOps.buildIvfIndex(embeddings, d, nCells = 4)
    d
  }

  private def query = embeddings.where(col("vec_id") === 0)

  private def collectFused(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("rank_text"), r.getAs[Long]("rank_vec"),
      r.getAs[Double]("rrf"))).toSeq

  test("exhaustive probing reproduces the locally recomputed RRF fusion of the two brute-force lists") {
    val pool = 30
    val got = collectFused(Retrieval.hybridTopK(spark, invDir, ivfDir,
      Seq("merge", "slow"), query, k = 15, pool = pool, nProbe = 4))

    // brute-force text leg: the stored index's own BM25 list IS the
    // reference (its relational parity vs raw text is pinned in
    // InvertedIndexSpec/q134); rank by (score desc, doc_id)
    val bm = InvertedIndex.searchBm25(spark, invDir,
        Seq("merge", "slow"), pool)
      .orderBy(col("score").desc, col("doc_id")).collect()
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1L) }
      .toMap
    // brute-force vector leg: exact cosine, self excluded, round 4,
    // (cos desc, vec_id) tiebreak — cellProbeTopK's exact contract
    val byId = vecs.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val vecRank = (1L until nDocs.toLong)
      .map(i => i -> cos(byId(0L), byId(i)))
      .sortBy { case (id, c) => (-c, id) }
      .take(pool).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fusedRef = (bm.keySet ++ vecRank.keySet).toSeq.map { id =>
      val rt = bm.getOrElse(id, 0L); val rv = vecRank.getOrElse(id, 0L)
      val rrf = (if (rt > 0) 1.0 / (60 + rt) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      (id, rt, rv, rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(15)
    assert(got == fusedRef)
  }

  test("pruned probing keeps a top-k capture floor and never returns extra rows") {
    val exhaustive = collectFused(Retrieval.hybridTopK(spark, invDir,
      ivfDir, Seq("merge", "slow"), query, k = 15, pool = 30, nProbe = 4))
      .map(_._1).toSet
    // half the cells probed — the pruned serving economics shape; the
    // text leg is probe-independent and the query's own family cell
    // carries its nearest vectors, so pruned fusion keeps a
    // deterministic floor of the exhaustive top-15 (fixture-seeded:
    // nProbe=2 captures 14/15, nProbe=1 still 9/15)
    val pruned = collectFused(Retrieval.hybridTopK(spark, invDir,
      ivfDir, Seq("merge", "slow"), query, k = 15, pool = 30, nProbe = 2))
    assert(pruned.size <= 15)
    val overlap = pruned.map(_._1).count(exhaustive.contains)
    assert(overlap >= 12, s"pruned overlap $overlap of ${pruned.size}")
    val pruned1 = collectFused(Retrieval.hybridTopK(spark, invDir,
      ivfDir, Seq("merge", "slow"), query, k = 15, pool = 30, nProbe = 1))
    val overlap1 = pruned1.map(_._1).count(exhaustive.contains)
    assert(overlap1 >= 8, s"nProbe=1 overlap $overlap1 of ${pruned1.size}")
  }

  test("parameter guards: pool must hold k; zero probes fail loudly instead of degrading to text-only") {
    val e = intercept[IllegalArgumentException](Retrieval.hybridTopK(
      spark, invDir, ivfDir, Seq("merge"), query, k = 10, pool = 5))
    assert(e.getMessage.contains("pool >= k"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](Retrieval.hybridTopK(
      spark, invDir, ivfDir, Seq("merge"), query, k = 5, nProbe = 0))
    assert(e2.getMessage.contains("nProbe"), e2.getMessage)
  }

  // ---- the BATCH form (r16 — VERDICT r15 #4) ----

  private val batchTerms: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("merge", "slow"), 3L -> Seq("merge"),
    7L -> Seq("slow", "w7"), 11L -> Seq("w11"))

  private def batchQt: DataFrame =
    spark.createDataFrame(
      batchTerms.flatMap { case (q, ts) => ts.map(t => (q, t)) })
      .toDF("query_id", "term")

  private def batchVecs: DataFrame =
    embeddings.where(col("vec_id").isin(batchTerms.map(_._1): _*))

  test("hybridTopKBatch equals a per-query hybridTopK loop (exhaustive probing), every query served") {
    val got = Retrieval.hybridTopKBatch(spark, invDir, ivfDir,
        batchQt, batchVecs, k = 12, pool = 30, nProbe = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank_text"), r.getAs[Long]("rank_vec"),
        r.getAs[Double]("rrf"), r.getAs[Long]("rank")))
      .toSeq
    assert(got.map(_._1).distinct.sorted == batchTerms.map(_._1),
      "a query of the batch was not served")
    val looped = batchTerms.flatMap { case (qid, terms) =>
      Retrieval.hybridTopK(spark, invDir, ivfDir, terms,
          embeddings.where(col("vec_id") === qid),
          k = 12, pool = 30, nProbe = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, r.getAs[Long]("doc_id"),
          r.getAs[Long]("rank_text"), r.getAs[Long]("rank_vec"),
          r.getAs[Double]("rrf"), i + 1L) }
    }
    assert(got == looped,
      s"batch diverged from the per-query loop: " +
        s"${got.diff(looped).take(3)} vs ${looped.diff(got).take(3)}")
  }

  test("batch pruned probing keeps the capture floor per query; guards stay loud") {
    val exhaustive = Retrieval.hybridTopKBatch(spark, invDir, ivfDir,
        batchQt, batchVecs, k = 12, pool = 30, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id"))).toSet
    val pruned = Retrieval.hybridTopKBatch(spark, invDir, ivfDir,
        batchQt, batchVecs, k = 12, pool = 30, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id")))
    // per-query row cap holds and the pruned fusion keeps a floor of
    // the exhaustive capture (fixture-seeded, same economics as the
    // single-query pin)
    assert(pruned.groupBy(_._1).values.forall(_.size <= 12))
    val overlap = pruned.count(exhaustive.contains)
    assert(overlap >= (pruned.length * 3) / 4,
      s"pruned batch overlap $overlap of ${pruned.length}")
    val e = intercept[IllegalArgumentException](
      Retrieval.hybridTopKBatch(spark, invDir, ivfDir, batchQt,
        batchVecs, k = 10, pool = 5))
    assert(e.getMessage.contains("pool >= k"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Retrieval.hybridTopKBatch(spark, invDir, ivfDir, batchQt,
        batchVecs, k = 5, nProbe = 0))
    assert(e2.getMessage.contains("nProbe"), e2.getMessage)
  }

  test("driver-sized contract is ENFORCED (r17 — VERDICT r16 #1): loud past the cap, identical results under it") {
    // the fixture batch has 6 distinct (query_id, term) rows: a cap of
    // 5 must fail with the NAMED message (and the probe collects at
    // most cap+1 rows — never the whole frame)
    val e = intercept[IllegalArgumentException](
      Retrieval.hybridTopKBatch(spark, invDir, ivfDir, batchQt,
        batchVecs, k = 12, pool = 30, nProbe = 4, maxBatchRows = 5))
    assert(e.getMessage.contains("driver-sized contract"), e.getMessage)
    assert(e.getMessage.contains("shard the request frame"), e.getMessage)
    // a cap that exactly holds the batch changes NOTHING vs the default
    def run(cap: Int) = Retrieval.hybridTopKBatch(spark, invDir, ivfDir,
        batchQt, batchVecs, k = 12, pool = 30, nProbe = 4,
        maxBatchRows = cap)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("rrf"))).toSeq
    assert(run(6) == run(InvertedIndex.DefaultMaxBatchRows))
    // the raw batch search enforces the same bound
    val e2 = intercept[IllegalArgumentException](
      InvertedIndex.searchBm25Batch(spark, invDir, batchQt, k = 5,
        maxBatchRows = 3))
    assert(e2.getMessage.contains("driver-sized contract"), e2.getMessage)
  }
}
