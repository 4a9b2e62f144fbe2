package graft.plans

import graft.functions.JaroWinkler
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: derive a cheap length-ratio guard from a Jaro–Winkler
  * threshold filter, so the O(len²)-ish kernel never runs on pairs a
  * length check already rules out — the expression-level knowledge
  * Catalyst cannot infer on its own (to the optimizer, [[JaroWinkler]]
  * is an opaque scalar).
  *
  * Soundness: with m ≤ min(|a|,|b|) matches,
  * jaro ≤ (min/|a| + min/|b| + 1)/3 ≤ (min/max + 2)/3, and the Winkler
  * boost is bounded by jw ≤ 0.6·jaro + 0.4 (prefix ≤ 4, p = 0.1).
  * So jw ≥ t ⟹ jaro ≥ (t − 0.4)/0.6 ⟹ min/max ≥ 5t − 4 — a usable
  * bound whenever t > 0.8, exactly the range fuzzy-dedup thresholds
  * live in. The guard `max_len · (5t − 4) ≤ min_len` is a pure length
  * comparison that whole-stage codegen evaluates before the kernel
  * (And short-circuits), and at 100 TB it is the difference between
  * scoring every blocked pair and skipping the length-mismatched bulk.
  *
  * Idempotent: guards already present (semantically) are not re-added,
  * so the rule converges under the optimizer's fixpoint batches.
  */
object JaroWinklerLengthPruning extends Rule[LogicalPlan] {

  private def guardFor(a: Expression, b: Expression, t: Double): Expression = {
    val la = Cast(Length(a), LongType)
    val lb = Cast(Length(b), LongType)
    val ratio = Literal(5.0 * t - 4.0, DoubleType)
    LessThanOrEqual(
      Multiply(Cast(Greatest(Seq(la, lb)), DoubleType), ratio),
      Cast(Least(Seq(la, lb)), DoubleType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val guards = cond.collect {
        case GreaterThanOrEqual(JaroWinkler(a, b), Literal(t: Double, DoubleType))
            if t > 0.8 => guardFor(a, b, t)
        case LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinkler(a, b))
            if t > 0.8 => guardFor(a, b, t)
        case GreaterThan(JaroWinkler(a, b), Literal(t: Double, DoubleType))
            if t >= 0.8 => guardFor(a, b, t)
      }.filterNot(g => cond.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter(guards.foldLeft(cond)((acc, g) => And(g, acc)), child)
  }
}
