package graft

import graft.functions.JaroWinklerImpl
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Jaro–Winkler kernel against an independent
  * straight-from-the-definition reference implementation, plus the
  * soundness bound the optimizer rule
  * ([[graft.plans.JaroWinklerLengthPruning]]) relies on. Fixed seed,
  * same pattern as TopKPropertySpec.
  */
class JaroWinklerPropertySpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Definition-first reference: O(n·m) matched-flag arrays, integer
    * transposition halving, boost above 0.7 with prefix ≤ 4, p = 0.1 —
    * written independently of the production kernel's loop structure.
    */
  private def reference(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val w = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val usedB = Array.fill(b.length)(false)
    val matchedA = scala.collection.mutable.ArrayBuffer.empty[Char]
    val matchedBIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- a.indices) {
      val candidates = (math.max(0, i - w) until math.min(i + w + 1, b.length))
        .filter(j => !usedB(j) && b(j) == a(i))
      candidates.headOption.foreach { j =>
        usedB(j) = true; matchedA += a(i); matchedBIdx += j
      }
    }
    val m = matchedA.length
    if (m == 0) return 0.0
    val matchedB = matchedBIdx.sorted.map(b(_))
    val halfT = matchedA.zip(matchedB).count { case (x, y) => x != y }
    val t = halfT / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length + (m.toDouble - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val prefix = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }

  private val genStr: Gen[String] = for {
    n <- Gen.chooseNum(0, 14)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')) // tiny alphabet: many matches/transpositions
  } yield cs.mkString

  private def samples(n: Int): Seq[(String, String)] = {
    val params = Gen.Parameters.default
    var seed = Seed(20260813L)
    (1 to n).map { _ =>
      val a = genStr.pureApply(params, seed); seed = seed.next
      val b = genStr.pureApply(params, seed); seed = seed.next
      (a, b)
    }
  }

  test("kernel equals the definition-first reference on 2000 random pairs") {
    for ((a, b) <- samples(2000)) {
      val got = jw(a, b)
      val want = reference(a, b)
      assert(math.abs(got - want) < 1e-12, s"jw($a, $b): got $got want $want")
    }
  }

  test("range, symmetry, identity") {
    for ((a, b) <- samples(500)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range for ($a, $b)")
      assert(s === jw(b, a), s"symmetry for ($a, $b)")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }

  test("pruning bound is sound: jw >= t implies min/max length ratio >= 5t - 4") {
    for ((a, b) <- samples(2000) if a.nonEmpty && b.nonEmpty) {
      val s = jw(a, b)
      val ratio = math.min(a.length, b.length).toDouble / math.max(a.length, b.length)
      for (t <- Seq(0.81, 0.85, 0.9, 0.95) if s >= t) {
        assert(ratio >= 5 * t - 4 - 1e-12,
          s"guard would wrongly prune ($a, $b): jw $s, ratio $ratio, t $t")
      }
    }
  }
}
