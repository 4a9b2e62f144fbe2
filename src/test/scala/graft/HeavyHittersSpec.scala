package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(Long, String, Long)] =
    df.groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1L, r.getString(0), r.getLong(1)) }.toSeq

  test("collectTopKFrequent equals the naive full GROUP BY on Zipf-ish skewed data") {
    // value i appears ~ 30000/i times: classic heavy-tail
    val rows = (1 to 200).flatMap(i => Seq.fill(30000 / i)(s"w$i"))
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 16).toDF("value")
    val got = HeavyHitters.collectTopKFrequent(df, col("value"), k = 15, capacity = 256)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === naive(df, 15))
  }

  test("survives small capacity while the k-th item clears the N/(cap+1) floor") {
    // 10 heavy values (1000 each) + 5000 singletons spread over 8 partitions.
    // N = 15000, capacity 63 -> floor ~ 234: heavies survive, noise evicts.
    val rows = (1 to 10).flatMap(i => Seq.fill(1000)(f"heavy$i%02d")) ++
      (1 to 5000).map(i => s"noise$i")
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 8).toDF("value")
    val got = HeavyHitters.collectTopKFrequent(df, col("value"), k = 10, capacity = 63)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === naive(df, 10))
    assert(got.forall(_._3 === 1000L))
  }

  test("below the certification floor the sketch falls back and stays exact") {
    // near-uniform: 2000 distinct values x ~7 each; capacity 63 evicts
    // constantly and the 10th count (7) is far below N/(cap+1) ~ 218.
    // The old fixed-trust form silently returned whichever values
    // happened to survive; the certified form must detect the failed
    // precondition and return the exact naive answer.
    val rows = (1 to 2000).flatMap(i => Seq.fill(7)(f"v$i%04d"))
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 8).toDF("value")
    val got = HeavyHitters.collectTopKFrequent(df, col("value"), k = 10, capacity = 63)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === naive(df, 10))
  }

  test("deterministic tie-break: equal counts rank by value ascending") {
    val rows = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(3)("c")
    val df = spark.sparkContext.parallelize(rows, 3).toDF("value")
    val got = HeavyHitters.collectTopKFrequent(df, col("value"), k = 3, capacity = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "a", 5L), (2L, "b", 5L), (3L, "c", 3L)))
  }

  test("null values are ignored, not counted") {
    val df = Seq(Some("x"), None, Some("x"), Some("y"), None).toDF("value")
    val got = HeavyHitters.collectTopKFrequent(df, col("value"), k = 5, capacity = 8)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("x", 2L), ("y", 1L)))
  }
}
