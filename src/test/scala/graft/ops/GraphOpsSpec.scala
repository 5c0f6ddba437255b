package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PageRank: bit parity with a local reference iteration, layout
  * independence, and conservation of probability mass. */
class GraphOpsSpec extends SparkTestBase {

  // a small deterministic digraph with asymmetric degrees: a hub
  // (0) pointed at by everyone, a chain, and a 2-cycle; every node
  // has outdegree >= 1
  private def edgeSeq: Seq[(Long, Long)] = Seq(
    (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L),
    (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (5L, 6L), (6L, 5L))

  private def edges = spark.createDataFrame(edgeSeq).toDF("src", "dst")

  test("pageRank matches a local reference bit-for-bit and is layout-independent") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      GraphOps.pageRank(df, iters = 8).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank"))
        .sortBy(_._1).toSeq
    val got = collect(edges)
    assert(collect(edges.repartition(5)) == got)
    // three-path contract: driver-local (default on this tiny graph),
    // broadcast, and shuffle paths produce the SAME bits
    def forcedPr(nodeLimit: Long) =
      GraphOps.pageRank(edges, iters = 8, broadcastNodeLimit = nodeLimit,
        driverPairLimit = 0L).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank"))
        .sortBy(_._1).toSeq
    assert(forcedPr(1000000L) == got, "broadcast path diverged")
    assert(forcedPr(0L) == got, "shuffle path diverged")

    // OUT-OF-CONTRACT input (directed, not symmetrized): both paths
    // must degrade identically — drop the rank-less src's edges, no
    // crash (the driver mirror once threw here)
    val directed = spark.createDataFrame(Seq((1L, 2L), (2L, 3L)))
      .toDF("src", "dst")
    def degraded(pairLimit: Long) =
      GraphOps.pageRank(directed, iters = 3, driverPairLimit = pairLimit)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank"))
        .sortBy(_._1).toSeq
    assert(degraded(1000000L) == degraded(0L),
      "out-of-contract degradation diverged between paths")

    // local mirror: same init, same contribution arithmetic
    // (rank/deg in double → ×1e12 → HALF_UP to integer micro-units,
    // the exact sequence of Spark's round(x·1e12).cast(long) →
    // exact long sum → base + d·(sum/1e12) in double), same rounding
    def micro(x: Double): Long = java.math.BigDecimal.valueOf(x * 1e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length.toDouble
    val deg = edgeSeq.groupBy(_._1).map { case (s, es) => s -> es.length }
    val base = (1.0 - 0.85) / n
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until 8) {
      val sums = scala.collection.mutable.Map[Long, Long]()
      edgeSeq.foreach { case (s, d) =>
        val c = micro(rank(s) / deg(s))
        sums(d) = sums.getOrElse(d, 0L) + c
      }
      rank = nodes.map(nd => nd -> (base + 0.85 *
        (sums.getOrElse(nd, 0L).toDouble / 1e12))).toMap
    }
    val want = nodes.map(nd => nd ->
      BigDecimal(rank(nd)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(got == want, s"got $got want $want")

    // probability mass conserved (no dangling nodes by construction)
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-3)
    // the hub out-ranks every chain node
    val byNode = got.toMap
    assert(nodes.filter(_ != 0L).forall(nd => byNode(0L) > byNode(nd)))
  }

  private def sym(es: Seq[(Long, Long)]): Seq[(Long, Long)] =
    es ++ es.map(e => (e._2, e._1))

  test("label propagation finds disjoint components as separate communities, layout-independent") {
    // two disjoint triangles: each converges to its min id in one
    // synchronous round (all neighbor labels tie at count 1 → min)
    val es = sym(Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L)))
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.labelPropagation(df, iters = 5).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label"))
        .sortBy(_._1).toSeq
    val edges = spark.createDataFrame(es).toDF("src", "dst")
    val got = run(edges)
    assert(got == Seq(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(run(edges.repartition(7)) == got)
    // distributed path (forced via pair limit 0) matches the driver
    // fast path bit for bit
    assert(GraphOps.labelPropagation(edges, iters = 5,
      driverPairLimit = 0L).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label"))
      .sortBy(_._1).toSeq == got, "distributed LPA diverged")
  }

  test("BFS hop distances on a chain: exact levels, maxHops truncation, disjoint absent") {
    // chain 0-1-2-3-4-5-6 plus a disjoint pair 100-101
    val chain = sym((0L to 5L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
    val edges = spark.createDataFrame(chain).toDF("src", "dst")
    val seeds = spark.createDataFrame(Seq(Tuple1(0L))).toDF("node")
    def run(maxHops: Int) =
      GraphOps.shortestHops(edges, seeds, maxHops).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist"))
        .sortBy(_._1).toSeq
    assert(run(4) == Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // full depth reaches the chain end; the disjoint pair never appears
    assert(run(10) == Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 4L, 5L -> 5L, 6L -> 6L))
    assert(run(10) ==
      GraphOps.shortestHops(edges.repartition(5), seeds, 10).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist"))
        .sortBy(_._1).toSeq)
    // distributed path (forced via pair limit 0) matches the driver
    // fast path bit for bit
    assert(GraphOps.shortestHops(edges, seeds, 10, driverPairLimit = 0L)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist"))
      .sortBy(_._1).toSeq == run(10), "distributed BFS diverged")
  }

  test("the self-vote damps the bipartite 2-cycle oscillation") {
    // a 4-cycle is bipartite: neighbor-only synchronous LPA swaps the
    // two sides' labels forever; with the hold-back self-vote the
    // labels must be STABLE across consecutive iteration counts
    val square = spark.createDataFrame(sym(Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))).toDF("src", "dst")
    def labelsAt(k: Int) =
      GraphOps.labelPropagation(square, iters = k).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label"))
        .sortBy(_._1).toSeq
    assert(labelsAt(4) == labelsAt(5),
      "labels must have converged, not oscillate with iteration parity")
  }

  test("HITS matches a local micro-unit reference bit-for-bit and is layout-independent") {
    // bipartite: hub 2 endorses three authorities, hub 4 endorses one
    // — a1(=11) must outrank a2/a3, hub 2 must outrank hub 4
    val hitsEdges = Seq((2L, 11L), (2L, 13L), (2L, 15L), (4L, 11L))
    val df = spark.createDataFrame(hitsEdges).toDF("src", "dst")
    def collectScores(d: org.apache.spark.sql.DataFrame) =
      GraphOps.hits(d, iters = 6).collect()
        .map(r => (r.getAs[String]("kind"), r.getAs[Long]("id"),
          r.getAs[Double]("score"))).sortBy(t => (t._1, t._2)).toSeq
    val got = collectScores(df)
    assert(collectScores(df.repartition(5)) == got)
    // the three-path contract: driver-local (default on this tiny
    // graph), broadcast-score, and shuffle paths — SAME bits
    def forced(nodeLimit: Long, pairLimit: Long) =
      GraphOps.hits(df, iters = 6, broadcastNodeLimit = nodeLimit,
        driverPairLimit = pairLimit)
        .collect().map(r => (r.getAs[String]("kind"), r.getAs[Long]("id"),
          r.getAs[Double]("score"))).sortBy(t => (t._1, t._2)).toSeq
    assert(forced(1000000L, 0L) == got, "broadcast path diverged")
    assert(forced(0L, 0L) == got, "shuffle path diverged")

    // local mirror of the exact arithmetic: micro-quantize (HALF_UP
    // long), exact long totals, double division c/t per score
    def micro(x: Double): Long = java.math.BigDecimal.valueOf(x * 1e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var h = hitsEdges.map(_._1).distinct.map(_ -> 0.5).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 0 until 6) {
      def sweep(contrib: Map[Long, Double],
                pick: ((Long, Long)) => (Long, Long)): Map[Long, Double] = {
        val raw = hitsEdges.map(pick).groupBy(_._2)
          .map { case (id, es) => id -> es.map(e => micro(contrib(e._1))).sum }
        val tot = raw.values.sum
        raw.map { case (id, c) => id -> c.toDouble / tot.toDouble }
      }
      a = sweep(h, identity)
      h = sweep(a, { case (s, d) => (d, s) })
    }
    val want = (h.map { case (id, s) => ("hub", id, r6(s)) } ++
      a.map { case (id, s) => ("authority", id, r6(s)) })
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == want, s"got=$got want=$want")
    // the structural ordering the fixpoint must produce
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("authority", 11L)) > m(("authority", 13L)))
    assert(m(("authority", 13L)) == m(("authority", 15L)))
    assert(m(("hub", 2L)) > m(("hub", 4L)))
  }
}
