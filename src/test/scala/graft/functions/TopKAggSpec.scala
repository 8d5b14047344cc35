package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws for the mergeable top-k buffer: any partitioning of
  * the input into partial buffers must finish to the same top-k as a
  * global sort-take — the property that makes map-side combine safe.
  */
class TopKAggSpec extends AnyFunSuite {

  private val k = 3
  private val agg = new TopK(k)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def reference(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.sortBy { case (v, t) => (-v, t) }.take(k)

  private def viaAgg(parts: Seq[Seq[(Long, Long)]]): Seq[(Long, Long)] =
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge).toSeq

  test("any partitioning merges to the global sort-take top-k") {
    val gen = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 1000L)))
    for (seed <- 1L to 20L) {
      val xs = sample(gen, seed)
      val expected = reference(xs)
      // split points vary per seed
      val cut1 = (seed * 7 % 200).toInt
      val cut2 = (cut1 + (seed * 13 % (200 - cut1).max(1))).toInt
      val parts = Seq(xs.take(cut1), xs.slice(cut1, cut2), xs.drop(cut2))
      assert(viaAgg(parts) == expected, s"seed=$seed")
      assert(viaAgg(parts.reverse) == expected, s"seed=$seed reversed")
    }
  }

  test("duplicate values break ties by the ascending tiebreak") {
    val xs = Seq((5L, 9L), (5L, 1L), (5L, 4L), (3L, 0L))
    assert(viaAgg(Seq(xs)) == Seq((5L, 1L), (5L, 4L), (5L, 9L)))
  }

  test("fewer than k inputs return them all, ordered") {
    assert(viaAgg(Seq(Seq((1L, 2L)))) == Seq((1L, 2L)))
    assert(viaAgg(Seq(Seq.empty)) == Seq.empty)
  }
}
