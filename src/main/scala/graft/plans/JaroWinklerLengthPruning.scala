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
  * Length units: both the kernel ([[graft.functions.JaroWinklerImpl]])
  * and Catalyst `Length` count Unicode CODE POINTS, so the bound holds
  * for supplementary-plane strings too.
  *
  * A guard is derived ONLY from a predicate in conjunctive position
  * (a top-level conjunct of the Filter condition). A threshold buried
  * under Or / Not / CaseWhen does NOT restrict the filter's output rows
  * on its own — e.g. `jw(a,b) ≥ 0.9 OR exact_id_match` admits rows that
  * fail the threshold — so deriving from it would wrongly drop rows.
  *
  * Matched conjunct shapes (t the literal threshold):
  *   - `jaro_winkler(a,b) ≥ t` / `t ≤ jaro_winkler(a,b)` / `jw > t`
  *   - `round(jaro_winkler(a,b) · s) / s ≥ t` — the ulp-stabilised form
  *     hash-gated queries use (q_jaro_fuzzy). `round(x·s)/s ≥ t` implies
  *     `x ≥ t − 1/(2s)`, so the guard uses the slightly relaxed
  *     threshold `t − 1/(2s)`.
  *
  * Idempotent: guards already present (semantically) are not re-added,
  * so the rule converges under the optimizer's fixpoint batches.
  */
object JaroWinklerLengthPruning extends Rule[LogicalPlan] with PredicateHelper {

  /** `jaro_winkler(a,b)` bare, or wrapped in the `round(jw·s)/s`
    * ulp-stabiliser; `adj` is the threshold slack the wrapper implies.
    */
  private object JwValue {
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case JaroWinkler(a, b) => Some((a, b, 0.0))
      case Divide(
            Round(Multiply(JaroWinkler(a, b), Literal(s1: Double, DoubleType), _),
              Literal(0, _), _),
            Literal(s2: Double, DoubleType), _)
          if s1 == s2 && s1 > 0 =>
        Some((a, b, 0.5 / s1))
      case _ => None
    }
  }

  /** A whole conjunct that lower-bounds the JW score: yields the pair of
    * string expressions and the effective (slack-adjusted) threshold.
    */
  private object JwThreshold {
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case GreaterThanOrEqual(JwValue(a, b, adj), Literal(t: Double, DoubleType)) =>
        Some((a, b, t - adj))
      case LessThanOrEqual(Literal(t: Double, DoubleType), JwValue(a, b, adj)) =>
        Some((a, b, t - adj))
      case GreaterThan(JwValue(a, b, adj), Literal(t: Double, DoubleType)) =>
        Some((a, b, t - adj))
      case _ => None
    }
  }

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
      val guards = splitConjunctivePredicates(cond).collect {
        case JwThreshold(a, b, t) if t > 0.8 => guardFor(a, b, t)
      }.filterNot(g => cond.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter(guards.foldLeft(cond)((acc, g) => And(g, acc)), child)
  }
}
