package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming Misra–Gries state: every sufficiently-frequent token is
  * guaranteed present (the N/(k+1) bound), estimates never exceed the
  * truth, totals are exact — and with enough counters the state IS
  * the exact count table. All assertions are arrival-order-free (the
  * MG guarantees are), so they hold under any micro-batch split. */
class HeavyHitterIngestSpec extends SparkTestBase {

  private val nBuckets = 8

  private def runStream(batches: Seq[Seq[String]], nCounters: Int)
      : (Map[(Int, String), Long], Map[Int, Long]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val name = s"hh_$nCounters"
    val q = EventStreams.heavyHitterIngest(spark, mem.toDS(),
      nBuckets = nBuckets, nCounters = nCounters)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[String]("w"),
        r.getAs[Long]("est"), r.getAs[Long]("n_bucket")))
    // latest emission per bucket = the rows carrying its max n_bucket
    val latestN = rows.groupBy(_._1).map { case (b, rs) =>
      b -> rs.map(_._4).max }
    val latest = rows.filter(r => r._4 == latestN(r._1))
    (latest.map(r => (r._1, r._2) -> r._3).toMap, latestN)
  }

  // skewed corpus: one dominant token, a mid tier, a long tail
  private def corpus: Seq[String] =
    Seq.fill(400)("hot") ++
      (0 until 8).flatMap(i => Seq.fill(60)(s"mid$i")) ++
      (0 until 300).map(i => s"tail$i")

  private def bucketOf(w: String): Int =
    math.floorMod(w.hashCode, nBuckets)

  test("compressed state: superset guarantee, never-overcount, undercount bound, exact totals") {
    val (b1, b2) = corpus.splitAt(corpus.size / 3)
    val (counters, totals) = runStream(Seq(b1, b2), nCounters = 4)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exactBucketTotals = corpus.groupBy(bucketOf).view
      .mapValues(_.size.toLong).toMap
    // token totals per bucket are EXACT regardless of compression
    exactBucketTotals.foreach { case (b, n) =>
      assert(totals(b) == n, s"bucket $b total") }
    // every token above its bucket's N/(k+1) bound must be present
    exact.foreach { case (w, c) =>
      val bound = exactBucketTotals(bucketOf(w)).toDouble / (4 + 1)
      if (c > bound)
        assert(counters.contains((bucketOf(w), w)),
          s"'$w' (count $c > bound $bound) evicted — MG guarantee broken")
    }
    // estimates: never above the truth, within the bound below it
    counters.foreach { case ((b, w), est) =>
      val c = exact(w)
      assert(est <= c, s"'$w' overcounted: est $est > true $c")
      assert(est >= c - exactBucketTotals(b).toDouble / (4 + 1),
        s"'$w' undercounted past the bound: est $est, true $c")
    }
  }

  test("uncompressed state (counters >= distinct per bucket) is the exact count table") {
    val (b1, b2) = corpus.splitAt(corpus.size / 2)
    val (counters, _) = runStream(Seq(b1, b2), nCounters = 1024)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(counters.size == exact.size)
    exact.foreach { case (w, c) =>
      assert(counters((bucketOf(w), w)) == c, s"'$w'") }
  }
}
