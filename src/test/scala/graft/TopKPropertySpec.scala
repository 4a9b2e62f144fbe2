package graft

import graft.operators.TopKAggregator
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bounded-heap top-k aggregator: for random
  * inputs, any reduce order and any merge tree must equal the reference
  * semantics `sortBy(score DESC, id ASC).take(k)`, and no intermediate
  * buffer may ever exceed k entries. Generators run with a fixed seed
  * for reproducibility (DslPropertySpec's pattern).
  */
class TopKPropertySpec extends AnyFunSuite {

  private val genEntries: Gen[List[(Double, Long)]] =
    Gen.listOfN(
      30,
      for {
        // small score domain forces plenty of ties
        s <- Gen.chooseNum(0, 5)
        id <- Gen.chooseNum(0L, 20L)
      } yield (s.toDouble, id))

  private def samples(n: Int): Seq[List[(Double, Long)]] = {
    val params = Gen.Parameters.default
    var seed = Seed(1234L)
    (1 to n).map { _ =>
      val xs = genEntries.pureApply(params, seed)
      seed = seed.next
      xs
    }
  }

  private def reference(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  test("random inputs: fold == merge tree == sorted take-k; buffers stay bounded") {
    for {
      xs <- samples(200)
      k <- Seq(1, 3, 7)
    } {
      val agg = new TopKAggregator(k)
      val expected = reference(xs, k)

      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      assert(folded.entries.length <= k)
      assert(agg.finish(folded) == expected, s"fold k=$k xs=$xs")

      // arbitrary 3-way merge tree
      val (a, rest) = xs.splitAt(xs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        agg.merge(b.foldLeft(agg.zero)(agg.reduce), c.foldLeft(agg.zero)(agg.reduce)))
      assert(merged.entries.length <= k)
      assert(agg.finish(merged) == expected, s"merge-tree k=$k xs=$xs")

      // merging with zero is identity
      assert(agg.finish(agg.merge(folded, agg.zero)) == expected)
      assert(agg.finish(agg.merge(agg.zero, folded)) == expected)
    }
  }
}
