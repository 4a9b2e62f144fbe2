package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semiFiltered equals the plain left-semi join exactly") {
    val fact = (1L to 5000L).map(i => (i, i % 997)).toDF("id", "k")
    val dim = Seq(3L, 11L, 500L, 996L, 42L).toDF("k")
    val got = BloomJoin.semiFiltered(fact, dim, "k", "k", expectedKeys = 16)
      .select("id", "k").orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = fact.join(dim, Seq("k"), "left_semi")
      .select("id", "k").orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("bloom pre-filter never drops a true match and prunes most non-matches") {
    val dim = Seq(3L, 11L, 500L).toDF("k")
    val bloom = dim.stat.bloomFilter("k", 16, 0.01)
    val keys = (1L to 2000L).toDF("k")
    val kept = keys.filter(BloomJoin.mightContain(bloom, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert(Set(3L, 11L, 500L).subsetOf(kept), "no false negatives — ever")
    // At fpp 1% over 2000 probes, expect ~20 false positives; 200 is 10x margin.
    assert(kept.size <= 3 + 200, s"pre-filter should prune aggressively, kept ${kept.size}")
  }

  test("MightContainBloom codegen and interpreted eval agree, incl. int keys and nulls") {
    val dim = Seq(7L, 9L).toDF("k")
    val bloom = dim.stat.bloomFilter("k", 8, 0.01)
    val probe = Seq[(java.lang.Long, java.lang.Integer)]((7L, 7), (8L, 8), (null, null))
      .toDF("kl", "ki")
    def run(codegen: Boolean): Seq[(Any, Any)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try probe.select(
        BloomJoin.mightContain(bloom, col("kl")).as("a"),
        BloomJoin.mightContain(bloom, col("ki")).as("b"))
        .collect().map(r => (r.get(0), r.get(1))).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val on = run(codegen = true)
    val off = run(codegen = false)
    assert(on === off)
    assert(on.head === ((true, true)))
    assert(on(2) === ((null, null)))
  }
}
