package graft

import graft.operators.KCore
import graft.similarity.Mmr
import scala.util.Random

/** Unit specs for the round-7 graph/diversity kernels, on fixtures with
  * KNOWN answers (the driver gate pins cross-engine hashes; these pin
  * the algorithms' semantics on graphs/sets small enough to reason
  * about by hand).
  */
class KCoreMmrSpec extends SparkSpec {

  test("2-core of a triangle with a tail path peels down to the triangle") {
    import spark.implicits._
    // 1-2-3 triangle, tail 3-4-5: node 5 (deg 1) peels in round 1,
    // node 4 (deg 2 -> 1) peels in round 2, the triangle is the fixpoint
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val trace = KCore.peelRounds(edges, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(trace(0) === ((1L, 4L, 4L)), s"round 1: ${trace.toSeq}") // node 5 dropped
    assert(trace(1) === ((2L, 3L, 3L)), s"round 2: ${trace.toSeq}") // node 4 dropped
    assert(trace(2) === ((3L, 3L, 3L)), "round 3 must be the fixpoint")
    assert(trace(3) === ((4L, 3L, 3L)), "fixpoint must be stable")
  }

  test("peel trace is monotone nonincreasing on a random graph") {
    import spark.implicits._
    val rnd = new Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    val trace = KCore.peelRounds(edges, k = 5, rounds = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    trace.sliding(2).foreach { case Array((n0, e0), (n1, e1)) =>
      assert(n1 <= n0 && e1 <= e0, s"trace must not grow: ${trace.toSeq}")
    }
  }

  test("MMR breaks up a redundant candidate set; pure top-k does not") {
    val rnd = new Random(23)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat)
    }
    val c0 = unit(Array.fill(16)(rnd.nextGaussian()))
    val c1 = unit(Array.fill(16)(rnd.nextGaussian()))
    def near(c: Array[Float]): Array[Float] =
      unit(c.map(x => x + 0.05 * rnd.nextGaussian()))
    // candidates: ids 0-9 are near-identical members of cluster 0 with
    // the TOP relevance; ids 10-14 are cluster-1 members slightly less
    // relevant. Pure top-5 = all cluster 0; MMR must mix in cluster 1.
    val cands =
      (0 until 10).map(i => (i.toLong, 0.95 - 0.001 * i, near(c0))) ++
        (10 until 15).map(i => (i.toLong, 0.80 - 0.001 * i, near(c1)))
    val mmr = Mmr.select(cands, k = 5, lambda = 0.7).map(_._1)
    val topk = cands.sortBy { case (id, rel, _) => (-rel, id) }.take(5).map(_._1)
    assert(topk.forall(_ < 10), s"fixture broken: pure top-5 must be cluster 0, got $topk")
    assert(mmr.exists(_ >= 10), s"MMR must pick from the second cluster, got $mmr")
    assert(mmr.head === topk.head, "first MMR pick is pure relevance")
    assert(mmr.distinct.size === 5, s"no repeats: $mmr")
  }

  test("MMR is deterministic and tie-breaks on the lower id") {
    val emb = Array.fill(16)(0.25f)
    // identical rel, identical embeddings: every tie must resolve to
    // ascending ids via the (score, -id) max rule
    val cands = Seq(7L, 3L, 9L, 1L).map(id => (id, 0.5, emb))
    val picks = Mmr.select(cands, k = 3).map(_._1)
    assert(picks === Seq(1L, 3L, 7L), s"tie-break must choose lower ids: $picks")
    assert(Mmr.select(cands.reverse, k = 3).map(_._1) === picks, "input order must not matter")
  }
}
