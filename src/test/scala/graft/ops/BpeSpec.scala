package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Distributed BPE training/encoding pinned against an independent
  * single-node reference implementation of the published algorithm
  * (count pairs over word frequencies, merge the global argmax,
  * leftmost-first within a word, ties broken lexicographically). */
class BpeSpec extends SparkTestBase {

  /** Reference trainer: plain Scala collections, no Spark. */
  private def refTrain(tokens: Seq[String],
                       nMerges: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = tokens
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector :+ Bpe.Eow) -> g.size.toLong
      }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < nMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), n) = pairs.minBy { case ((l, r), n) => (-n, l, r) }
        if (n < 2L) done = true
        else {
          out += ((rank, l, r, n))
          vocab = vocab.map { case (syms, c) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            b.result() -> c
          // identical post-merge sequences from different words must
          // re-aggregate their counts (the reference keys on the word,
          // which stays unique — but keep the fold safe anyway)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          rank += 1
        }
      }
    }
    out.result()
  }

  private def corpusTokens: Seq[String] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .collect().map(_.getString(0)).toSeq
  }

  test("train matches the single-node reference merge-for-merge on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Bpe.train(docs, 30)
      .map(m => (m.rank, m.left, m.right, m.n_occurrences))
    val want = refTrain(corpusTokens, 30)
    assert(want.size == 30, s"reference stopped early at ${want.size}")
    assert(got == want, s"first divergence: ${
      got.zip(want).indexWhere { case (a, b) => a != b }}")
  }

  test("distributed merge loop equals the driver fast path on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaDriver = Bpe.train(docs, 12)
    val viaCluster = Bpe.train(docs, 12, driverVocabLimit = 0L)
    assert(viaDriver.size == 12)
    assert(viaCluster == viaDriver)
  }

  test("train is deterministic and stops when no pair repeats") {
    val docs = spark.createDataFrame(Seq(
      (0L, "ab ab cd", "a", "en"))).toDF("doc_id", "text", "source", "lang")
    val m1 = Bpe.train(docs, 50)
    val m2 = Bpe.train(docs, 50)
    assert(m1 == m2)
    // "ab ab cd": (a,b) occurs twice, (ab,</w>) twice after merging;
    // everything else is unique → training exhausts well before 50
    assert(m1.nonEmpty && m1.size < 50)
    assert(m1.head.left == "a" && m1.head.right == "b" &&
      m1.head.n_occurrences == 2L)
  }

  test("encodeWord applies lowest-rank merges first and round-trips the word") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Bpe.train(docs, 30)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank.toInt).toMap
    val words = corpusTokens.distinct.take(200)
    for (w <- words) {
      val syms = Bpe.encodeWord(w, ranks)
      assert(syms.mkString("") == w + Bpe.Eow, s"round-trip broke for '$w'")
      // no adjacent pair in the final encoding is still mergeable
      syms.sliding(2).foreach {
        case Seq(a, b) =>
          assert(!ranks.contains((a, b)), s"'$w' left mergeable pair ($a,$b)")
        case _ => ()
      }
    }
  }

  test("encodeStats equals per-doc reference encoding lengths") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Bpe.train(docs, 30)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank.toInt).toMap
    val got = Bpe.encodeStats(docs, merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
    val want = docs.select(col("doc_id"),
        split(coalesce(col("text"), lit("")), " ").as("ws"))
      .collect().map { r =>
        val ws = r.getAs[scala.collection.Seq[String]]("ws")
        r.getAs[Long]("doc_id") ->
          ((ws.size.toLong, ws.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum))
      }.toMap
    assert(got == want)
  }
}
