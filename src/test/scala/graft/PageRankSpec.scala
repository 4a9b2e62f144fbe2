package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long, Long)], iters: Int = 10): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst", "w"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("symmetric ring converges to the uniform fixed point") {
    val n = 6L
    val ring = (0L until n).map(i => (i, (i + 1) % n, 1L))
    val r = ranksOf(ring)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12))
  }

  test("ranks sum to 1 when every node has out-edges") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L), (2L, 1L, 5L))
    val r = ranksOf(edges)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("hub of an in-star outranks the leaves; dangling hub leaks mass") {
    // leaves 1..5 all point at node 0; node 0 has no out-edges (dangling)
    val edges = (1L to 5L).map(i => (i, 0L, 1L))
    val r = ranksOf(edges)
    assert(r(0L) > r(1L) * 3, "hub collects the leaves' mass")
    assert((1L to 5L).map(r).toSet.size === 1, "leaves are symmetric")
    assert(r.values.sum < 1.0, "dangling hub leaks mass (documented sink semantics)")
  }

  test("edge weights steer proportional mass") {
    // node 0 splits 90/10 between 1 and 2; 1 and 2 cycle back
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
    val r = ranksOf(edges, iters = 30)
    assert(r(1L) > r(2L) * 4, s"weighted split should favor node 1: $r")
  }

  test("unrolledSql and the Column loop agree through Spark SQL itself") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L))
    edges.toDF("src", "dst", "w").createOrReplaceTempView("pr_edges")
    // 1e-9 tolerance: aggregation order may differ between the two
    // plans; the arithmetic itself is all-DOUBLE in both forms.
    val viaSql = spark.sql(
      PageRank.unrolledSql("SELECT src, dst, w FROM pr_edges"))
      .select(col("node"), col("rank").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaLoop = ranksOf(edges)
    viaLoop.foreach { case (k, v) => assert(math.abs(viaSql(k) - v) < 1e-9) }
  }
}
