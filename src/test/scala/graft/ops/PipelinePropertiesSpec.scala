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
