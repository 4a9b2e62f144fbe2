package graft

import org.apache.spark.sql.functions._

/** Checks on driver-gate queries that the DuckDB oracle can't express —
  * sketch error bounds against exact ground truth at small SF.
  */
class QueryPackSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_approx_sketch: HLL distinct within its 2% rsd bound of exact") {
    val sketch = queries.Relational.qApproxSketch
      .run(spark, dir)
      .select("l_returnflag", "approx_parts")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(sketch.keySet == exact.keySet)
    for ((flag, ex) <- exact) {
      val ap = sketch(flag)
      // rsd 0.02 → allow 5 sigma plus slack for tiny groups
      assert(math.abs(ap - ex).toDouble <= math.max(5.0, ex * 0.10),
        s"flag=$flag approx=$ap exact=$ex")
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

  test("q_approx_sketch: approximate median within 5% of exact median") {
    val sketch = queries.Relational.qApproxSketch
      .run(spark, dir)
      .select("l_returnflag", "p50_qty")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    for ((flag, ex) <- exact)
      assert(math.abs(sketch(flag) - ex) <= math.max(1.0, ex * 0.05),
        s"flag=$flag approx=${sketch(flag)} exact=$ex")
  }
}
