package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized invariants of the round-6 pipeline operators, sampled
  * with explicit seeds (same offline-classpath convention as
  * HTypePropertiesSpec): packing conserves and tiles the token
  * stream for ANY corpus shape, and sharding partitions the id space
  * for ANY shard count. */
class PipelinePropertiesSpec extends SparkTestBase {

  private val genCorpus: Gen[List[(Long, Int, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      words <- Gen.choose(0, 600) // includes empty docs
      src <- Gen.oneOf("a", "b", "c")
    } yield (words, src))
  } yield rows.zipWithIndex.map { case ((w, s), i) => (i.toLong, w, s) }

  private def corpora(count: Int): Seq[List[(Long, Int, String)]] =
    (1 to count).flatMap(i =>
      genCorpus(Gen.Parameters.default, Seed(i.toLong)))

  test("nearDupSuppress invariants: lowest doc always kept, exact copies always suppressed, kept set is claim-consistent") {
    val genTexts: Gen[List[String]] = for {
      n <- Gen.choose(2, 30)
      texts <- Gen.listOfN(n, for {
        // small vocabulary → plenty of token-set collisions
        w <- Gen.choose(1, 12)
        ws <- Gen.listOfN(w, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
      } yield ws.mkString(" "))
    } yield texts
    for (seed <- 1 to 10; texts <- genTexts(Gen.Parameters.default, Seed(seed.toLong))) {
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = spark.createDataFrame(rows).toDF("doc_id", "text")
      val out = TextOps.nearDupSuppress(docs, 12, 3).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lost_bands"),
          r.getAs[Long]("is_kept"))).sortBy(_._1)
      // every doc gets exactly one row; the lowest doc_id claims all
      // its bands first and is always kept
      assert(out.map(_._1).toSeq == rows.map(_._1))
      assert(out.head._3 == 1L, s"doc 0 must be kept: ${out.head}")
      // kept <-> zero lost bands, by definition
      out.foreach { case (id, lost, kept) =>
        assert((kept == 1L) == (lost == 0L), s"doc $id: lost=$lost kept=$kept")
      }
      // an exact token-set copy of an earlier doc collides on EVERY
      // band and can never be kept
      val fps = rows.map { case (id, t) =>
        (id, t.split(" ").distinct.sorted.toSeq) }
      val keptById = out.map(o => o._1 -> o._3).toMap
      for ((id, fp) <- fps; (pid, pfp) <- fps if pid < id && pfp == fp)
        assert(keptById(id) == 0L, s"doc $id duplicates $pid but was kept")
    }
  }

  test("snapshotDiff invariants: statuses partition the id union, fingerprint algebra holds") {
    val genIds: Gen[(Set[Long], Set[Long], Set[Long])] = for {
      olds <- Gen.listOf(Gen.choose(0L, 40L)).map(_.toSet)
      news <- Gen.listOf(Gen.choose(0L, 40L)).map(_.toSet)
      changed <- Gen.listOf(Gen.choose(0L, 40L)).map(_.toSet)
    } yield (olds, news, changed)
    for (seed <- 1 to 10; (olds, news, changed) <- genIds(Gen.Parameters.default, Seed(seed.toLong))) {
      val oldDf = spark.createDataFrame(
        olds.toSeq.map(i => (i, s"text $i"))).toDF("doc_id", "text")
      val newDf = spark.createDataFrame(
        news.toSeq.map(i =>
          (i, if (changed(i)) s"text $i changed" else s"text $i")))
        .toDF("doc_id", "text")
      val got = TextOps.snapshotDiff(oldDf, newDf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
      assert(got.keySet == olds ++ news, "statuses must cover the id union")
      for (id <- olds ++ news) {
        val expect =
          if (!olds(id)) "added"
          else if (!news(id)) "removed"
          else if (changed(id)) "changed"
          else "unchanged"
        assert(got(id) == expect, s"doc $id: ${got(id)} vs $expect")
      }
    }
  }

  test("contextPacking conserves words and tiles exactly, for any corpus") {
    for (rows <- corpora(12)) {
      val docs = spark.createDataFrame(rows.map { case (id, w, s) =>
        (id, List.fill(w)("x").mkString(" "), s)
      }).toDF("doc_id", "text", "source")
      val packed = TextOps.contextPacking(docs, budget = 64).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("window_id"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_words")))
      // conservation: window words sum to the stream length per source
      // (an empty text still splits to one empty token, matching the
      // oracle's len(string_split(...)) — so every doc counts ≥ 1)
      val streamLen = rows.groupBy(_._3)
        .view.mapValues(_.map(r => math.max(r._2, 1).toLong).sum).toMap
      val packedLen = packed.groupBy(_._1)
        .view.mapValues(_.map(_._4).sum).toMap
      assert(packedLen == streamLen, s"lost words: $packedLen vs $streamLen")
      // tiling: per source, window ids are contiguous from 0 and every
      // non-tail window holds exactly the budget
      for ((src, ws) <- packed.groupBy(_._1)) {
        val sorted = ws.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
          s"$src windows not contiguous")
        sorted.dropRight(1).foreach { w =>
          assert(w._4 == 64L, s"$src non-tail window $w misses budget")
        }
        assert(sorted.last._4 <= 64L)
        // n_docs never exceeds the docs that could touch the window
        sorted.foreach(w => assert(w._3 >= 1L))
      }
    }
  }

  test("shardOf partitions every id into [0, n) stably, for any shard count") {
    val ids = spark.range(0, 5000).toDF("doc_id")
    for (n <- Seq(1, 2, 7, 32, 1024)) {
      val shards = ids.select(Sharding.shardOf(col("doc_id"), n).as("s"))
        .groupBy(col("s")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(shards.keys.forall(s => s >= 0 && s < n), s"n=$n out of range")
      assert(shards.values.sum == 5000L)
      if (n <= 32) {
        // the Lehmer step spreads sequential ids near-uniformly: no
        // shard more than 2× the ideal share
        val ideal = 5000.0 / n
        assert(shards.values.max <= ideal * 2,
          s"n=$n skew: ${shards.values.max} vs ideal $ideal")
      }
    }
    // stability: the id→shard MAPPING (not just the histogram) is a
    // pure function of the id, independent of layout
    def mapping(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("doc_id"), Sharding.shardOf(col("doc_id"), 16).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mapping(ids) == mapping(ids.repartition(7)))
  }
}
