package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for the persisted-IVF incremental near-dup path (q112):
  * exhaustive probing equals the brute-force cross product, the stored
  * index is deterministic (rebuild == reuse), incremental never
  * retrains, and default probing keeps a recall floor. */
class IvfIndexSpec extends SparkTestBase {

  private def vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(77)
    (0L until 80L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
  }

  private def all = spark.createDataFrame(vecs).toDF("vec_id", "embedding")
  private def corpus = all.where(col("vec_id") < 60)
  private def batch = all.where(col("vec_id") >= 60)

  private def localCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  private val threshold = 0.3

  private def bruteForce: Set[(Long, Long)] = {
    val byId = vecs.toMap
    (for {
      b <- 60L until 80L; c <- 0L until 60L
      if localCosine(byId(b), byId(c)) >= threshold
    } yield (b, c)).toSet
  }

  private def run(idx: String, nAssign: Int): Seq[(Long, Long, Double)] =
    VectorOps.incrementalNearDupIvf(spark, idx, batch, threshold, nAssign)
      .collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("cos"))).toSeq.sorted

  test("exhaustive probing equals the brute-force batch x corpus cross product") {
    val idx = graft.TempRoots.path("ivfidx_spec_a")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    val got = run(idx, nAssign = 8)
    assert(got.map(t => (t._1, t._2)).toSet == bruteForce)
    // and every reported score is the exact cosine, rounded to 4
    val byId = vecs.toMap
    got.foreach { case (b, c, cos) =>
      val expect = BigDecimal(localCosine(byId(b), byId(c)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cos == expect, s"($b,$c): $cos vs $expect")
    }
  }

  test("a rebuilt index over the same corpus yields identical results (stored == retrained)") {
    val idx1 = graft.TempRoots.path("ivfidx_spec_b1")
    val idx2 = graft.TempRoots.path("ivfidx_spec_b2")
    VectorOps.buildIvfIndex(corpus, idx1, nCells = 8)
    VectorOps.buildIvfIndex(corpus, idx2, nCells = 8)
    // centroids are bit-identical (deterministic sample + Lloyd's)
    def cents(p: String) = spark.read.parquet(s"$p/centroids")
      .orderBy(col("cell")).collect()
      .map(r => (r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Double]]("center").toSeq)).toSeq
    assert(cents(idx1) == cents(idx2))
    assert(run(idx1, 4) == run(idx2, 4))
  }

  test("incremental probing reuses the stored quantizer without retraining") {
    // a batch with a wildly different distribution (scaled 50x) must be
    // assigned under the CORPUS-trained centroids: centroid files are
    // untouched and the scaled batch (cosine-invariant scaling) finds
    // exactly the pairs the unscaled batch finds
    val idx = graft.TempRoots.path("ivfidx_spec_c")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    val before = spark.read.parquet(s"$idx/centroids").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("center").toSeq).toSet
    val scaled = batch.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(50.0f)).as("embedding"))
    val got = VectorOps.incrementalNearDupIvf(spark, idx, scaled, threshold, 8)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(got == bruteForce)
    val after = spark.read.parquet(s"$idx/centroids").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("center").toSeq).toSet
    assert(before == after)
  }

  test("append grows the index under the stored quantizer: probe equals brute force over the union") {
    val idx = graft.TempRoots.path("ivfidx_spec_e")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    val centsBefore = spark.read.parquet(s"$idx/centroids").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("center").toSeq).toSet
    // append docs 60..69; probe with docs 70..79
    val b1 = all.where(col("vec_id") >= 60 && col("vec_id") < 70)
    val b2 = all.where(col("vec_id") >= 70)
    VectorOps.appendToIvfIndex(spark, idx, b1)
    // the stored corpus is exactly C ∪ B1, each id once, and the
    // quantizer is untouched
    val ids = spark.read.parquet(s"$idx/corpus").select(col("vec_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 70L).toSeq, s"stored ids: $ids")
    assert(spark.read.parquet(s"$idx/centroids").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("center").toSeq).toSet == centsBefore)
    // exhaustive probe of B2 against the grown index == brute force
    // B2 x (C ∪ B1)
    val byId = vecs.toMap
    val expect = (for {
      b <- 70L until 80L; c <- 0L until 70L
      if localCosine(byId(b), byId(c)) >= threshold
    } yield (b, c)).toSet
    val got = VectorOps.incrementalNearDupIvf(spark, idx, b2, threshold, 8)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("stored-index top-k: exhaustive probing equals brute-force cosineTopK; both probe paths agree") {
    val idx = graft.TempRoots.path("ivfidx_spec_f")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    val queries = batch
    def run(limit: Int) = VectorOps.storedIndexTopK(spark, idx, queries, 3,
      nProbe = 8, driverProbeLimit = limit).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    val exact = VectorOps.cosineTopK(corpus, queries, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    assert(run(100000) == exact)
    assert(run(0) == exact) // distributed probe path, same result
  }

  test("append is idempotent: replaying the same batch leaves the index unchanged") {
    val idx = graft.TempRoots.path("ivfidx_spec_g")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    val b1 = all.where(col("vec_id") >= 60 && col("vec_id") < 70)
    VectorOps.appendToIvfIndex(spark, idx, b1)
    def snapshot() = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).sorted.toSeq
    val once = snapshot()
    assert(once.map(_._1) == (0L until 70L).toSeq)
    // a replayed epoch (foreachBatch retry) must be a no-op, not a
    // duplicate-id insertion
    VectorOps.appendToIvfIndex(spark, idx, b1)
    assert(snapshot() == once)
  }

  test("delete removes ids (including whole cells) and composes with append as an upsert") {
    import spark.implicits._
    val idx = graft.TempRoots.path("ivfidx_spec_h")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    def stored() = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).sortBy(_._1).toSeq
    // wipe one ENTIRE cell (dynamic overwrite alone cannot express an
    // emptied partition — the explicit dir removal must kick in) plus
    // a couple of ids from other cells
    val byCell = stored().groupBy(_._2)
    val (wipeCell, wipeRows) = byCell.minBy(_._2.length)
    val extra = stored().filter(_._2 != wipeCell).take(2).map(_._1)
    val toDelete = wipeRows.map(_._1) ++ extra
    VectorOps.deleteFromIvfIndex(spark, idx,
      toDelete.toSeq.toDF("vec_id"))
    val after = stored()
    assert(after.map(_._1) == (0L until 60L).filterNot(toDelete.toSet).toSeq)
    assert(!after.exists(_._2 == wipeCell), "emptied cell dir must be gone")
    // deleting ids that are not stored is a no-op
    VectorOps.deleteFromIvfIndex(spark, idx, Seq(99999L).toDF("vec_id"))
    assert(stored() == after)
    // upsert: delete + append under the same id — the id lands in
    // exactly one cell with the NEW embedding, and probes see it
    val newVec = vecs.find(_._1 == extra.head).get._2.map(x => -x)
    VectorOps.deleteFromIvfIndex(spark, idx, Seq(extra.head).toDF("vec_id"))
    VectorOps.appendToIvfIndex(spark, idx,
      spark.createDataFrame(Seq((extra.head, newVec))).toDF("vec_id", "embedding"))
    val rows = spark.read.parquet(s"$idx/corpus")
      .where(col("vec_id") === extra.head).collect()
    assert(rows.length == 1, s"upserted id must live in exactly one cell")
    val storedV = rows(0).getAs[scala.collection.Seq[Double]]("v").toSeq
    assert(storedV == newVec.map(_.toDouble).toSeq, "embedding must be the NEW one")
  }

  test("appending an empty batch is a no-op") {
    val idx = graft.TempRoots.path("ivfidx_spec_empty")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    def snapshot() = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"))).sorted.toSeq
    val before = snapshot()
    VectorOps.appendToIvfIndex(spark, idx, all.where(lit(false)))
    assert(snapshot() == before)
  }

  test("delete is layout-agnostic (works on the PQ index) and refuses to empty an index") {
    import spark.implicits._
    // PQ layout: the codes-only schema must survive a delete verbatim
    val pqIdx = graft.TempRoots.path("ivfpq_spec_del")
    VectorOps.buildIvfPqIndex(corpus, pqIdx, nCells = 8, subs = 4)
    VectorOps.deleteFromIvfIndex(spark, pqIdx, Seq(0L, 1L, 2L).toDF("vec_id"))
    val after = spark.read.parquet(s"$pqIdx/corpus")
    assert(after.columns.toSet == Set("vec_id", "codes", "n", "gen", "cell"))
    assert(after.select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
      == (3L until 60L).toSeq)
    // deleting EVERY remaining id would leave a file-less unreadable
    // directory — the delete must refuse with a clear error instead
    val err = intercept[IllegalArgumentException] {
      VectorOps.deleteFromIvfIndex(spark, pqIdx,
        (3L until 60L).toDF("vec_id"))
    }
    assert(err.getMessage.contains("rebuild"))
    // and the refused call must not have clobbered anything
    assert(spark.read.parquet(s"$pqIdx/corpus").count() == 57L)
  }

  test("stored PQ index: codes-only on disk, equals fresh pqTopK, exhaustive equals exact") {
    val idx = graft.TempRoots.path("ivfpq_spec")
    VectorOps.buildIvfPqIndex(corpus, idx, nCells = 8, subs = 4)
    // the storage claim: the stored corpus carries codes + norm (+ the
    // tiny generation marker), never the raw vectors
    val cols = spark.read.parquet(s"$idx/corpus").columns.toSet
    assert(cols == Set("vec_id", "codes", "n", "gen", "cell"), s"stored: $cols")
    def fmt(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    // stored == freshly trained (identical deterministic training;
    // books/centroids round-trip parquet doubles exactly)
    val stored = fmt(VectorOps.storedPqIndexTopK(spark, idx, corpus, batch,
      4, nProbe = 2, rerank = 16))
    val fresh = fmt(VectorOps.pqTopK(corpus, batch, 4, nCells = 8,
      nProbe = 2, subs = 4, rerank = 16))
    assert(stored == fresh)
    // exhaustive settings: the approximation vanishes, the stored path
    // must reproduce the exact brute-force top-k
    val full = fmt(VectorOps.storedPqIndexTopK(spark, idx, corpus, batch,
      4, nProbe = 8, rerank = 1000))
    val exact = fmt(VectorOps.cosineTopK(corpus, batch, 4))
    assert(full == exact, s"missing=${exact.toSet -- full.toSet}")
  }

  test("default probing keeps a recall floor against brute force") {
    val idx = graft.TempRoots.path("ivfidx_spec_d")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    val got = run(idx, nAssign = 4).map(t => (t._1, t._2)).toSet
    val exact = bruteForce
    assert(got.subsetOf(exact), "incremental must never invent pairs")
    val recall = exact.count(got.contains).toDouble / math.max(1, exact.size)
    assert(recall >= 0.5, s"recall $recall over ${exact.size} true pairs")
  }

  private def stagingGone(idx: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$idx/_staging")
    !p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  test("maintenance stages durably under _staging and removes it on every exit") {
    import spark.implicits._
    val idx = graft.TempRoots.path("ivfidx_spec_stage")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 8)
    // append: the staged batch+carried rows round-trip into the index
    VectorOps.appendToIvfIndex(spark, idx,
      all.where(col("vec_id") >= 60 && col("vec_id") < 70))
    assert(spark.read.parquet(s"$idx/corpus").select(col("vec_id"))
      .collect().map(_.getLong(0)).sorted.toSeq == (0L until 70L).toSeq)
    assert(stagingGone(idx), "append must remove _staging")
    // delete: same discipline
    VectorOps.deleteFromIvfIndex(spark, idx, Seq(5L, 6L).toDF("vec_id"))
    assert(stagingGone(idx), "delete must remove _staging")
    // no-op paths (empty batch / unknown ids) clean up too
    VectorOps.appendToIvfIndex(spark, idx, all.where(lit(false)))
    assert(stagingGone(idx), "empty append must remove _staging")
    VectorOps.deleteFromIvfIndex(spark, idx, Seq(424242L).toDF("vec_id"))
    assert(stagingGone(idx), "no-op delete must remove _staging")
    // the refused delete-everything path cleans up through the throw
    intercept[IllegalArgumentException] {
      VectorOps.deleteFromIvfIndex(spark, idx,
        spark.read.parquet(s"$idx/corpus").select(col("vec_id")))
    }
    assert(stagingGone(idx), "refused delete must remove _staging")
  }

  test("PQ append: encodes under STORED books, composes, replays as a no-op, equals exact when exhaustive") {
    import spark.implicits._
    val b1 = all.where(col("vec_id") >= 60 && col("vec_id") < 70)
    val b2 = all.where(col("vec_id") >= 70)
    // one-shot vs two-batch append composition must store identical rows
    val idxA = graft.TempRoots.path("ivfpq_spec_app_a")
    val idxB = graft.TempRoots.path("ivfpq_spec_app_b")
    VectorOps.buildIvfPqIndex(corpus, idxA, nCells = 8, subs = 4)
    VectorOps.buildIvfPqIndex(corpus, idxB, nCells = 8, subs = 4)
    VectorOps.appendToIvfPqIndex(spark, idxA, b1.unionByName(b2))
    VectorOps.appendToIvfPqIndex(spark, idxB, b1)
    VectorOps.appendToIvfPqIndex(spark, idxB, b2)
    def snapshot(idx: String) = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("cell"), col("codes"), col("n")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq, r.getAs[Double]("n")))
      .sortBy(_._1).toSeq
    assert(snapshot(idxA) == snapshot(idxB))
    assert(snapshot(idxA).map(_._1) == (0L until 80L).toSeq)
    // replayed batch: a no-op (foreachBatch retry safety)
    val once = snapshot(idxB)
    VectorOps.appendToIvfPqIndex(spark, idxB, b2)
    assert(snapshot(idxB) == once)
    assert(stagingGone(idxB))
    // centroids/books untouched by appends (never retrained)
    val idxRef = graft.TempRoots.path("ivfpq_spec_app_ref")
    VectorOps.buildIvfPqIndex(corpus, idxRef, nCells = 8, subs = 4)
    def books(idx: String) = spark.read.parquet(s"$idx/books")
      .orderBy(col("sub"), col("code")).collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getAs[scala.collection.Seq[Double]]("center").toSeq)).toSeq
    assert(books(idxA) == books(idxRef))
    // exhaustive probing of the appended store == exact brute force
    // over the grown union (the codes only shape the shortlist; with
    // every cell probed and an unbounded rerank the approximation
    // vanishes and the exact rerank decides everything)
    val queries = all.where(col("vec_id") < 10)
    def fmt(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq.sorted
    val grown = fmt(VectorOps.storedPqIndexTopK(spark, idxA, all, queries,
      3, nProbe = 8, rerank = 1000))
    val exact = fmt(VectorOps.cosineTopK(all, queries, 3))
    assert(grown == exact, s"missing=${exact.toSet -- grown.toSet}")
  }

  test("append forms fail fast on the wrong layout; PQ upsert composes via delete+append") {
    import spark.implicits._
    val pqIdx = graft.TempRoots.path("ivfpq_spec_layout")
    val rawIdx = graft.TempRoots.path("ivfraw_spec_layout")
    VectorOps.buildIvfPqIndex(corpus, pqIdx, nCells = 8, subs = 4)
    VectorOps.buildIvfIndex(corpus, rawIdx, nCells = 8)
    val b1 = all.where(col("vec_id") >= 60 && col("vec_id") < 70)
    val rawOnPq = intercept[IllegalArgumentException] {
      VectorOps.appendToIvfIndex(spark, pqIdx, b1)
    }
    assert(rawOnPq.getMessage.contains("appendToIvfPqIndex"))
    val pqOnRaw = intercept[IllegalArgumentException] {
      VectorOps.appendToIvfPqIndex(spark, rawIdx, b1)
    }
    assert(pqOnRaw.getMessage.contains("appendToIvfIndex"))
    // upsert on the codes-only layout: delete + PQ append re-encodes
    // the id under the stored books — present once, with NEW codes
    val before = spark.read.parquet(s"$pqIdx/corpus")
      .where(col("vec_id") === 3L).collect()
    VectorOps.deleteFromIvfIndex(spark, pqIdx, Seq(3L).toDF("vec_id"))
    val newVec = vecs.find(_._1 == 3L).get._2.map(x => -x)
    VectorOps.appendToIvfPqIndex(spark, pqIdx,
      spark.createDataFrame(Seq((3L, newVec))).toDF("vec_id", "embedding"))
    val rows = spark.read.parquet(s"$pqIdx/corpus")
      .where(col("vec_id") === 3L).collect()
    assert(rows.length == 1, "upserted id must live in exactly one cell")
    assert(rows(0).getAs[scala.collection.Seq[Int]]("codes").toSeq
      != before(0).getAs[scala.collection.Seq[Int]]("codes").toSeq ||
      rows(0).getAs[Int]("cell") != before(0).getAs[Int]("cell"),
      "negated vector must re-encode differently")
  }

  test("auto-sized nCells derives ~sqrt(n) centroids; explicit nCells overrides") {
    val rnd = new scala.util.Random(11)
    def corpusOf(n: Int) = spark.createDataFrame(
      (0L until n.toLong).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    def centroidCount(idx: String) =
      spark.read.parquet(s"$idx/centroids").count()
    val idx400 = graft.TempRoots.path("ivfidx_auto_400")
    VectorOps.buildIvfIndex(corpusOf(400), idx400)
    assert(centroidCount(idx400) == 20L) // sqrt(400)
    val idx2500 = graft.TempRoots.path("ivfidx_auto_2500")
    VectorOps.buildIvfIndex(corpusOf(2500), idx2500)
    assert(centroidCount(idx2500) == 50L) // sqrt(2500)
    // floor clamp: a tiny corpus still gets 16 cells (capped by n)
    val idx50 = graft.TempRoots.path("ivfidx_auto_50")
    VectorOps.buildIvfIndex(corpusOf(50), idx50)
    assert(centroidCount(idx50) == 16L)
    // explicit override unchanged
    val idxExp = graft.TempRoots.path("ivfidx_auto_exp")
    VectorOps.buildIvfIndex(corpusOf(400), idxExp, nCells = 8)
    assert(centroidCount(idxExp) == 8L)
  }

  test("indexDrift flags a drifted append against the built population") {
    import spark.implicits._
    val idx = graft.TempRoots.path("ivfidx_spec_drift")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    // synthetically drifted batch: every dimension shifted by +3 —
    // far from every trained centroid
    val drifted = batch.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
    VectorOps.appendToIvfIndex(spark, idx, drifted)
    val rows = VectorOps.indexDrift(spark, idx).collect()
    assert(rows.map(_.getAs[Long]("n_built")).sum == 60L)
    assert(rows.map(_.getAs[Long]("n_appended")).sum == 20L)
    val appendedCells = rows.filter(_.getAs[Long]("n_appended") > 0)
    assert(appendedCells.nonEmpty)
    // every cell holding appended rows must read as drifted
    appendedCells.foreach { r =>
      assert(r.getAs[Double]("drift_ratio") > 1.5,
        s"cell ${r.getAs[Long]("cell")}: ${r.getAs[Double]("drift_ratio")}")
    }
    // built-only cells carry no appended metrics (null, not 0)
    rows.filter(_.getAs[Long]("n_appended") == 0).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("mean_dist_appended")))
      assert(r.isNullAt(r.fieldIndex("drift_ratio")))
    }
  }

  test("a crashed delete (marker written, emptied-cell dir not removed) cannot resurrect rows; maintenance completes it") {
    import java.nio.file.{Files, Paths}
    val idx = graft.TempRoots.path("ivfidx_spec_crash")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    // pick one whole cell to delete — the case whose dynamic
    // overwrite writes nothing and relies on the dir removal
    val byCell = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("cell")).collect()
      .groupBy(_.getAs[Int]("cell")).view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet)
    val (cellGone, goneIds) = byCell.toSeq.minBy(_._1)
    // SIMULATE the crash window: the marker is durably written (what
    // deleteFromIvfIndex does before the overwrite) but the process
    // died before removing the cell directory — its rows still sit in
    // the corpus files
    spark.createDataFrame(Seq(Tuple1(cellGone))).toDF("cell")
      .coalesce(1).write.parquet(s"$idx/_maintenance/pending_removes")
    assert(Files.exists(Paths.get(s"$idx/corpus/cell=$cellGone")))
    // 1. search correctness: no reader may serve the deleted rows
    val probed = VectorOps.incrementalNearDupIvf(spark, idx, batch,
        threshold = -1.0, nAssign = 4) // threshold -1: every probed pair reports
      .select(col("corpus_id")).collect().map(_.getLong(0)).toSet
    assert(probed.nonEmpty)
    assert(probed.intersect(goneIds).isEmpty,
      s"resurrected rows of crashed-deleted cell $cellGone")
    val drift = VectorOps.indexDrift(spark, idx).collect()
    assert(!drift.exists(_.getAs[Long]("cell") == cellGone.toLong))
    // 2. idempotent completion: the next maintenance entry rolls the
    // removal forward — dir gone, marker gone, and the append applied
    VectorOps.appendToIvfIndex(spark, idx, batch)
    assert(!Files.exists(Paths.get(s"$idx/corpus/cell=$cellGone")) ||
      // the append may legitimately re-create the cell with NEW rows;
      // if so, none of the deleted ids may be among them
      spark.read.parquet(s"$idx/corpus")
        .where(col("cell") === cellGone)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        .intersect(goneIds).isEmpty)
    assert(!Files.exists(Paths.get(s"$idx/_maintenance/pending_removes")))
    val afterIds = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(afterIds.intersect(goneIds).isEmpty)
    // batch landed (all 20 novel ids present)
    assert((60L until 80L).forall(afterIds.contains))
    // completing twice is a no-op: a second maintenance call succeeds
    VectorOps.deleteFromIvfIndex(spark, idx,
      spark.createDataFrame(Seq(Tuple1(-1L))).toDF("vec_id"))
    assert(!Files.exists(Paths.get(s"$idx/_maintenance/pending_removes")))

    // the EARLIER crash window: death DURING the marker write leaves a
    // fileless directory — readers must treat it as "no pending
    // removals" (explicit schema, not inference) and maintenance must
    // clear the husk rather than throw forever
    Files.createDirectories(Paths.get(s"$idx/_maintenance/pending_removes"))
    assert(VectorOps.indexDrift(spark, idx).count() > 0) // readable
    VectorOps.appendToIvfIndex(spark, idx,
      spark.createDataFrame(Seq((900L, Seq.fill(16)(0.5f))))
        .toDF("vec_id", "embedding"))
    assert(!Files.exists(Paths.get(s"$idx/_maintenance")))
  }

  test("a delete crashed BEFORE its survivor overwrite rolls the WHOLE delete forward") {
    import java.nio.file.{Files, Paths}
    val idx = graft.TempRoots.path("ivfidx_spec_crash2")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    val rows = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("cell")).collect()
    val byCell = rows.groupBy(_.getAs[Int]("cell"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val cells = byCell.keys.toSeq.sorted
    assert(cells.size >= 2 && byCell(cells.last).size >= 2)
    val emptiedCell = cells.head // whole cell deleted
    val partialCell = cells.last // one id deleted, others survive
    val partialGone = byCell(partialCell).head
    val deadIds = byCell(emptiedCell) + partialGone
    // SIMULATE the crash state deleteFromIvfIndex leaves when it dies
    // between the marker write and the survivor overwrite: staged
    // survivors durable, marker durable, corpus fully PRE-delete
    val touched = Seq(emptiedCell, partialCell)
    spark.read.parquet(s"$idx/corpus")
      .where(col("cell").isin(touched.map(Int.box): _*) &&
        !col("vec_id").isin(deadIds.toSeq.map(Long.box): _*))
      .write.parquet(s"$idx/_staging/carried")
    spark.createDataFrame(Seq(Tuple1(emptiedCell))).toDF("cell")
      .coalesce(1).write.parquet(s"$idx/_maintenance/pending_removes")
    // any maintenance entry must now finish the ENTIRE delete: the
    // survivor rewrite from the staged copy, the emptied dir, the
    // marker, the staging — not just the emptied half
    VectorOps.deleteFromIvfIndex(spark, idx,
      spark.createDataFrame(Seq(Tuple1(-1L))).toDF("vec_id"))
    val after = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(after.intersect(deadIds).isEmpty,
      s"partially-touched cell kept deleted rows: ${after.intersect(deadIds)}")
    assert(after == rows.map(_.getAs[Long]("vec_id")).toSet -- deadIds,
      "survivors must be intact")
    assert(!Files.exists(Paths.get(s"$idx/corpus/cell=$emptiedCell")))
    assert(!Files.exists(Paths.get(s"$idx/_maintenance")))
    assert(!Files.exists(Paths.get(s"$idx/_staging")))
  }

  test("diff-driven maintenance: store follows the new snapshot exactly, replays as a no-op, serves brute-force-equal top-k") {
    val idx = graft.TempRoots.path("ivfidx_spec_diffmaint")
    // old snapshot = ids 0..59; new snapshot drops %7==2, perturbs
    // %5==0 (in DOUBLE), and gains 60..79 — all four statuses occur
    val newSnap = all.where(col("vec_id") % 7 =!= 2)
      .select(col("vec_id"),
        when(col("vec_id") % 5 === 0,
          transform(col("embedding").cast("array<double>"), x => x + lit(0.3d)))
          .otherwise(col("embedding").cast("array<double>")).as("embedding"))
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    val diff = VectorOps.vectorSnapshotDiff(corpus, newSnap)
    val byStatus = diff.groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(byStatus.keySet), byStatus)
    VectorOps.maintainIvfIndex(spark, idx, newSnap, diff)

    def storedContent = spark.read.parquet(s"$idx/corpus")
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("v").toSeq).toMap
    val expect = newSnap.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("embedding").toSeq).toMap
    val got1 = storedContent
    assert(got1 == expect,
      s"missing=${expect.keySet -- got1.keySet} extra=${got1.keySet -- expect.keySet}")

    // replaying the same maintenance converges to identical content
    // (delete re-matches the changed ids' NEW rows, append restores)
    VectorOps.maintainIvfIndex(spark, idx, newSnap, diff)
    assert(storedContent == expect)

    // exhaustive-probe serving off the maintained store == brute
    // force over the new snapshot (the q206 oracle's claim)
    val byId = expect
    val queries = all.where(col("vec_id") % 7 === 2)
    val qIds = queries.collect().map(_.getLong(0))
    val qVecs = queries.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq)
      .toMap
    def cosD(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = qIds.flatMap { q =>
      byId.toSeq.map { case (id, v) => (q, id, r4(cosD(qVecs(q), v))) }
        .sortBy { case (_, id, c) => (-c, id) }.take(3)
        .zipWithIndex.map { case ((qq, id, c), i) => (qq, id, c, i + 1) }
    }.toSet
    val got = VectorOps.storedIndexTopK(spark, idx, queries, k = 3,
        nProbe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"), r.getAs[Int]("rank"))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("indexDrift on a codes-only PQ store: reconstruction-space ratio flags drift, stays ~1 in-distribution") {
    // drifted append: every dimension shifted by +3 (the raw-layout
    // test's synthetic drift) — appended cells must read well above 1
    val pqIdx = graft.TempRoots.path("ivfpq_spec_drift")
    VectorOps.buildIvfPqIndex(corpus, pqIdx, nCells = 4, subs = 4)
    val drifted = batch.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
    VectorOps.appendToIvfPqIndex(spark, pqIdx, drifted)
    val rows = VectorOps.indexDrift(spark, pqIdx).collect()
    assert(rows.map(_.getAs[Long]("n_built")).sum == 60L)
    assert(rows.map(_.getAs[Long]("n_appended")).sum == 20L)
    val appendedCells = rows.filter(_.getAs[Long]("n_appended") > 0)
    assert(appendedCells.nonEmpty)
    appendedCells.foreach { r =>
      assert(r.getAs[Double]("drift_ratio") > 1.2,
        s"cell ${r.getAs[Long]("cell")}: ${r.getAs[Double]("drift_ratio")}")
    }
    // in-distribution append: same generator as the build corpus —
    // the ratio must sit near 1 (loose envelope: per-cell means over
    // a handful of rows)
    val pqIdx2 = graft.TempRoots.path("ivfpq_spec_nodrift")
    VectorOps.buildIvfPqIndex(corpus, pqIdx2, nCells = 4, subs = 4)
    VectorOps.appendToIvfPqIndex(spark, pqIdx2, batch)
    val inDist = VectorOps.indexDrift(spark, pqIdx2).collect()
      .filter(_.getAs[Long]("n_appended") > 0)
      .map(_.getAs[Double]("drift_ratio"))
    assert(inDist.nonEmpty)
    inDist.foreach(r =>
      assert(r > 0.5 && r < 1.5, s"in-distribution ratio $r"))
    // built-only cells carry no appended metrics on the PQ path either
    rows.filter(_.getAs[Long]("n_appended") == 0).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("drift_ratio")))
    }
  }

  test("compactCells: fewer files, byte-identical search, untouched compact cells, idempotent, honors a crashed delete's marker") {
    val idx = graft.TempRoots.path("ivfidx_spec_compact")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    // three appends fragment the touched cells (each rewrite fans the
    // cell's rows across several write tasks)
    for (lo <- Seq(60L, 67L, 74L))
      VectorOps.appendToIvfIndex(spark, idx,
        all.where(col("vec_id") >= lo && col("vec_id") < lo + 7)
          .repartition(8))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def cellFiles: Map[String, Seq[(String, Long)]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/corpus")).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .map { st =>
          st.getPath.getName -> fs.listStatus(st.getPath).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith("."))
            .map(f => (f.getPath.getName, f.getModificationTime)).sorted
        }.toMap
    val before = cellFiles
    assert(before.values.exists(_.size > 1), "fixture failed to fragment")
    val searchBefore = VectorOps.storedIndexTopK(spark, idx, batch, 3,
      nProbe = 4).collect().map(_.toString).sorted.toSeq
    VectorOps.compactCells(spark, idx)
    val after = cellFiles
    // every cell now holds exactly one data file...
    after.foreach { case (c, fl) => assert(fl.size == 1, s"$c: $fl") }
    // ...already-compact cells were not rewritten (same file, same mtime)
    before.filter(_._2.size == 1).foreach { case (c, fl) =>
      assert(after(c) == fl, s"compact cell $c was touched")
    }
    // content (gen markers included) and search results are identical
    assert(VectorOps.storedIndexTopK(spark, idx, batch, 3, nProbe = 4)
      .collect().map(_.toString).sorted.toSeq == searchBefore)
    // idempotent: a second call changes nothing (mtimes included)
    VectorOps.compactCells(spark, idx)
    assert(cellFiles == after)
    // a crashed delete's marker is rolled forward FIRST: simulate by
    // writing a pending_removes marker for one populated cell — after
    // compaction that cell is gone and the marker is retired
    val victim = after.keys.head.stripPrefix("cell=").toInt
    spark.createDataFrame(Seq(Tuple1(victim))).toDF("cell")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$idx/_maintenance/pending_removes")
    VectorOps.compactCells(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/corpus/cell=$victim")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/_maintenance")))
  }

  test("compactCells on the codes-only PQ layout: fewer files, identical search") {
    val idx = graft.TempRoots.path("ivfidx_spec_compact_pq")
    VectorOps.buildIvfPqIndex(corpus, idx, nCells = 4, subs = 4)
    for (lo <- Seq(60L, 70L))
      VectorOps.appendToIvfPqIndex(spark, idx,
        all.where(col("vec_id") >= lo && col("vec_id") < lo + 10)
          .repartition(8))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files: Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/corpus")).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .map(st => fs.listStatus(st.getPath)
          .count(f => f.isFile && !f.getPath.getName.startsWith("_")
            && !f.getPath.getName.startsWith("."))).sum
    val before = files
    val q = all.where(col("vec_id") % 20 === 0)
    def search = VectorOps.storedPqIndexTopK(spark, idx, all, q, k = 3,
      nProbe = 4, rerank = 10, driverProbeLimit = 0)
      .collect().map(_.toString).sorted.toSeq
    val searchBefore = search
    VectorOps.compactCells(spark, idx)
    assert(files < before, s"no reduction: $before -> $files")
    assert(search == searchBefore)
  }

  test("maintainIvfIndex: a full-replacement diff (every stored id dead) rebuilds instead of refusing") {
    val idx = graft.TempRoots.path("ivfidx_spec_fullupsert")
    val oldSnap = corpus
    VectorOps.buildIvfIndex(oldSnap, idx, nCells = 4)
    // new snapshot: every old id re-embedded (changed) + the batch ids
    // added — the diff marks ALL stored vectors dead, the case the
    // delete's refuse-to-empty guard would reject mid-maintenance
    val newSnap = all.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(-1.0f)).as("embedding"))
    val diff = VectorOps.vectorSnapshotDiff(oldSnap, newSnap)
    assert(diff.where(col("status").isin("removed", "changed")).count() == 60L)
    VectorOps.maintainIvfIndex(spark, idx, newSnap, diff)
    // the store now serves the NEW snapshot exactly: content equality…
    val stored = spark.read.parquet(s"$idx/corpus").select(col("vec_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(stored == (0L until 80L).toSeq, s"stored: $stored")
    // …and search parity with a brute-force scan of the new snapshot
    val q = newSnap.where(col("vec_id") < 5)
    val got = VectorOps.storedIndexTopK(spark, idx, q, 3, nProbe = 4)
      .collect().map(_.toString).sorted.toSeq
    val exact = VectorOps.cosineTopK(newSnap, q, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got == exact)
  }

  test("an interrupted REBUILD (marker present) fails every reader fast; rerunning the build heals") {
    val idx = graft.TempRoots.path("ivfidx_spec_rebuild_crash")
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    // simulate the crash window: centroids overwritten, corpus not —
    // the durable in-flight marker is still present
    graft.ops.Fs.touch(spark, s"$idx/_maintenance/rebuild_pending")
    val e1 = intercept[IllegalStateException] {
      VectorOps.storedIndexTopK(spark, idx,
        corpus.where(col("vec_id") < 3), 3, nProbe = 4).collect()
    }
    assert(e1.getMessage.contains("interrupted"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      VectorOps.appendToIvfIndex(spark, idx, corpus.where(col("vec_id") < 2))
    }
    assert(e2.getMessage.contains("interrupted"), e2.getMessage)
    // a completed rebuild clears the marker and serves exactly again
    VectorOps.buildIvfIndex(corpus, idx, nCells = 4)
    assert(!graft.ops.Fs.exists(spark, s"$idx/_maintenance/rebuild_pending"))
    val q = corpus.where(col("vec_id") < 3)
    val got = VectorOps.storedIndexTopK(spark, idx, q, 3,
        nProbe = 4).collect().map(_.toString).sorted.toSeq
    val exact = VectorOps.cosineTopK(corpus, q, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got == exact)
    // and a normal completed build leaves NO marker behind
    val idx2 = graft.TempRoots.path("ivfidx_spec_rebuild_clean")
    VectorOps.buildIvfPqIndex(corpus, idx2, nCells = 4, subs = 4)
    assert(!graft.ops.Fs.exists(spark, s"$idx2/_maintenance/rebuild_pending"))
  }

  test("the marker-TOCTOU catch's error condition is what Spark actually raises for a vanished path") {
    // pendingRemovedCells tolerates a racing roll-forward by matching
    // AnalysisException.getCondition == "PATH_NOT_FOUND" (ADVICE r14:
    // condition, not message text). Pin that a schema'd parquet read
    // of a nonexistent path raises exactly that condition — a Spark
    // upgrade that renames it must fail HERE, not re-open the race.
    val gone = graft.TempRoots.path("ivfidx_spec_no_such_marker")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.schema("cell INT").parquet(gone).collect()
    }
    assert(e.getCondition == "PATH_NOT_FOUND", s"condition=${e.getCondition}")
  }
}
