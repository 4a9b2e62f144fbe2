package graft

import graft.functions.StringSimilarityFunctions.jaroWinkler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The injectOptimizerRule path: [[graft.plans.JaroWinklerLengthPruning]]
  * adds a length-ratio guard ahead of JW-threshold filters.
  */
class LengthPruningSpec extends SparkSpec {
  import spark.implicits._

  // RDD-backed (not a LocalRelation): ConvertToLocalRelation would
  // otherwise evaluate the filter at optimization time and hide the plan.
  private lazy val pairs: DataFrame = spark.sparkContext.parallelize(Seq(
    ("martha", "marhta"),                    // jw 0.961 — survives
    ("goldenrod", "goldenrod"),              // identical — survives
    ("ab", "abcdefghijklmnopqrstuvwxyz"),    // 2 vs 26 chars — guard prunes
    ("x", "completely different"),           // guard prunes
    ("linen", "lace")), 2)                   // similar length, low jw
    .toDF("a", "b")

  test("optimizer injects the length guard into the plan") {
    val plan = pairs.filter(jaroWinkler(col("a"), col("b")) >= 0.9)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("greatest") || plan.contains("Greatest"),
      s"expected a greatest/least length guard in:\n$plan")
    assert(plan.contains("jaro_winkler"), "original predicate must remain")
  }

  test("rule is idempotent: guard appears exactly once") {
    val plan = pairs.filter(jaroWinkler(col("a"), col("b")) >= 0.9)
      .queryExecution.optimizedPlan.toString
    val hits = "(?i)greatest".r.findAllIn(plan).length
    assert(hits === 1, s"guard duplicated under the fixpoint optimizer:\n$plan")
  }

  test("results are unchanged by the guard (soundness)") {
    // Compute expected set with the kernel directly — no optimizer involved.
    val raw = pairs.collect().map { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      (a, b, graft.functions.JaroWinklerImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)))
    }
    for (t <- Seq(0.81, 0.9, 0.95)) {
      val want = raw.filter(_._3 >= t).map(x => (x._1, x._2)).toSet
      val got = pairs.filter(jaroWinkler(col("a"), col("b")) >= t)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === want, s"threshold $t")
    }
  }

  test("guard never produces a false negative across random-ish strings") {
    val words = Seq("a", "ab", "abc", "abcd", "abcdabcd", "zzzz",
      "abcdefghijklmnop", "ponmlkjihgfedcba", "abcabcabcabc", "")
    val df = (for (a <- words; b <- words) yield (a, b)).toDF("a", "b")
    val t = 0.85
    val viaPlan = df.filter(jaroWinkler(col("a"), col("b")) >= t)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val direct = (for (a <- words; b <- words) yield (a, b)).filter { case (a, b) =>
      graft.functions.JaroWinklerImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) >= t
    }.toSet
    assert(viaPlan === direct)
  }

  test("below the 0.8 threshold the rule stays out of the way") {
    val plan = pairs.filter(jaroWinkler(col("a"), col("b")) >= 0.5)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("greatest"),
      s"no sound bound exists at t = 0.5, plan must be untouched:\n$plan")
  }
}
