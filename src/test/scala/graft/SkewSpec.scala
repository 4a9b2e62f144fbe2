package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals direct groupBy sum on skewed data") {
    // one heavy-hitter key (90% of rows) + a long tail
    val skewed = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))).toDF("k", "v")
    val direct = skewed.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", "total", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6, k) }
  }

  test("saltedCount equals direct count") {
    val skewed = ((1 to 5000).map(_ => "hot") ++ (1 to 500).map(i => s"k${i % 10}"))
      .toDF("k")
    val direct = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }

  test("saltedJoin equals plain inner join row-for-row on skewed keys") {
    val probe = ((1 to 8000).map(i => ("hot", i)) ++
      (1 to 800).map(i => (s"k${i % 40}", i))).toDF("k", "pv")
    val build = (Seq("hot") ++ (0 until 40).map(i => s"k$i")).zipWithIndex
      .toDF("k", "bv")
    val direct = probe.join(build, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    val salted = Skew.saltedJoin(probe, build, Seq("k"), saltBuckets = 8).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    assert(salted.toSeq === direct.toSeq)
  }
}
