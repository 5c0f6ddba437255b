package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure (no Spark) algebraic properties of the bounded-heap top-k
  * state: any reduce/merge split over any input must equal the global
  * sort — the property that makes partial aggregation sound. Seeded
  * ScalaCheck sampling, same style as HTypePropertiesSpec. */
class TopKAggPropertiesSpec extends AnyFunSuite {

  private val entryGen = for {
    id <- Gen.chooseNum(0L, 50L)
    score <- Gen.chooseNum(0, 20).map(_ / 4.0) // coarse grid → many ties
  } yield (id, score)

  private val caseGen = for {
    xs <- Gen.listOf(entryGen)
    k <- Gen.chooseNum(1, 6)
    cut <- Gen.chooseNum(0, 100)
  } yield (xs.distinct, k, cut)

  private def oracle(xs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.sortBy { case (id, s) => (-s, id) }.take(k)

  test("any reduce/merge split equals the global sorted top-k") {
    for (i <- 0 until 300) {
      val (xs, k, cut) = caseGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse((Nil, 1, 0))
      val agg = new TopKByScore(k)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == oracle(xs, k), s"seed=$i k=$k xs=$xs")
      // merge is commutative
      val swapped = agg.merge(
        r.foldLeft(agg.zero)(agg.reduce),
        l.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(swapped) == oracle(xs, k), s"seed=$i (swapped)")
    }
  }
}
