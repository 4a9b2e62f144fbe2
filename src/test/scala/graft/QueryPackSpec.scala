package graft

import org.apache.spark.sql.functions._

/** Checks on driver-gate queries that the DuckDB oracle can't express —
  * sketch error bounds against exact ground truth at small SF.
  */
class QueryPackSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_approx_sketch: HLL distinct in bound; exact companion matches countDistinct") {
    val out = queries.Relational.qApproxSketch
      .run(spark, dir)
      .select("l_returnflag", "exact_parts", "parts_in_bound")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(out.keySet == exact.keySet)
    for ((flag, ex) <- exact) {
      val (gotExact, inBound) = out(flag)
      assert(gotExact == ex, s"flag=$flag two-stage exact=$gotExact countDistinct=$ex")
      assert(inBound == 1L, s"flag=$flag HLL estimate out of its 10% bound")
    }
  }

  test("Observation API: pipeline metrics ride along with the action, no second pass") {
    import org.apache.spark.sql.Observation
    val obs = Observation("lineitem_stats")
    val out = Tables.load(spark, dir, "lineitem")
      .observe(obs, count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("total_qty"))
      .filter(col("l_quantity") > 25)
      .count()
    val metrics = obs.get
    // observed metrics cover the PRE-filter frame: the scan is counted
    // exactly once even though the query only returns the filtered rows
    assert(metrics("n_rows").asInstanceOf[Long] > out)
    assert(metrics("total_qty").asInstanceOf[Double] > 0.0)
  }

  test("q_approx_sketch: quantile estimates straddle their target percentile") {
    val out = queries.Relational.qApproxSketch.run(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("p50_in_bound") == 1L, s"flag=$flag p50 fraction out of [0.45, 0.55]")
      assert(r.getAs[Long]("p95_in_bound") == 1L, s"flag=$flag p95 fraction out of [0.92, 0.98]")
    }
  }
}
