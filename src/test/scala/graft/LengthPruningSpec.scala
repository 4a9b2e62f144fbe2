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

  test("threshold under an OR is NOT guarded (disjunct is not restrictive)") {
    // `jw >= 0.9 OR a = 'x'` admits rows failing the threshold: a guard
    // derived from the disjunct would wrongly drop ("x", "completely
    // different"). The rule must only look at top-level conjuncts.
    val cond = jaroWinkler(col("a"), col("b")) >= 0.9 || col("a") === "x"
    val plan = pairs.filter(cond).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("greatest"),
      s"guard must not be derived from a disjunct:\n$plan")
    val got = pairs.filter(cond)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("x", "completely different")),
      "row satisfying the non-JW disjunct must survive")
    assert(got.contains(("martha", "marhta")))
  }

  test("negated threshold is NOT guarded") {
    val cond = !(jaroWinkler(col("a"), col("b")) >= 0.9)
    val plan = pairs.filter(cond).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("greatest"),
      s"guard must not be derived under Not:\n$plan")
    val got = pairs.filter(cond)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("ab", "abcdefghijklmnopqrstuvwxyz")),
      "length-mismatched pair passes the negated threshold")
  }

  test("threshold conjunct next to other predicates IS guarded") {
    val cond = jaroWinkler(col("a"), col("b")) >= 0.9 && length(col("a")) > 1
    val plan = pairs.filter(cond).queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("greatest"),
      s"conjunctive threshold must still be guarded:\n$plan")
  }

  test("the round(jw*1e6)/1e6 ulp-stabilised form is guarded") {
    val jw = round(jaroWinkler(col("a"), col("b")) * 1e6) / 1e6
    val plan = pairs.filter(jw >= 0.82).queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("greatest"),
      s"rounded-comparison shape must trigger the guard:\n$plan")
    // and soundness: same rows as the kernel on the rounded value
    val want = pairs.collect().map { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      (a, b, math.round(graft.functions.JaroWinklerImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)) * 1e6) / 1e6)
    }.filter(_._3 >= 0.82).map(x => (x._1, x._2)).toSet
    val got = pairs.filter(jw >= 0.82)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === want)
  }

  test("guard is sound for supplementary-plane strings (code-point units)") {
    // 𝕒 (U+1D552) is 2 UTF-16 units but 1 code point; both the kernel
    // and Catalyst length() count code points, so near-identical astral
    // strings must survive the guard.
    val astral = "𝕒𝕓𝕔𝕕𝕖𝕗"
    val swapped = "𝕒𝕓𝕔𝕕𝕗𝕖"
    val df = spark.sparkContext.parallelize(Seq((astral, swapped)), 1).toDF("a", "b")
    val direct = graft.functions.JaroWinklerImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(astral),
      org.apache.spark.unsafe.types.UTF8String.fromString(swapped))
    assert(direct >= 0.9, s"fixture should clear the threshold, got $direct")
    val got = df.filter(jaroWinkler(col("a"), col("b")) >= 0.9).count()
    assert(got === 1L, "guard must not prune the astral pair")
  }
}
