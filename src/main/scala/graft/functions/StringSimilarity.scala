package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst expression.
  *
  * Fuzzy-dedup blocking pipelines (block on a cheap key, score candidate
  * pairs, keep pairs above a threshold) put the pair-scoring function on
  * the hot path: at 100 TB a blocked self-join still scores billions of
  * pairs, so the kernel must live inside whole-stage codegen, not a Scala
  * UDF with per-row serialization.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the driver oracle)
  * exactly, verified against probe cases:
  *   - match window = max(|a|,|b|)/2 - 1 (floor, min 0)
  *   - transpositions = (#mismatched matched-position pairs) / 2,
  *     INTEGER division ('abcxxxxx' vs 'bcaxxxxx' -> 0.95833…)
  *   - Winkler boost (prefix ≤ 4, p = 0.1) applied only when jaro > 0.7
  *     ('abcdqqqqqq' vs 'abcdzzzzzz' stays 0.6)
  *   - either side empty -> 0.0; equal strings -> 1.0
  */
object JaroWinklerImpl {
  /** Static kernel shared by interpreted eval and generated code.
    *
    * Symbol unit = Unicode CODE POINT (not UTF-16 code unit): the
    * strings are decoded to code-point arrays up front, so a
    * supplementary-plane character counts as ONE symbol — the same unit
    * Catalyst `Length` reports, which is what makes the
    * [[graft.plans.JaroWinklerLengthPruning]] guard sound for astral
    * strings. For BMP/ASCII data (the oracle-gated surface) the result
    * is bit-identical to a char-based implementation.
    */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0

    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a(i)
      var j = math.max(0, i - window)
      val hi = math.min(i + window + 1, lb)
      var found = false
      while (j < hi && !found) {
        if (!bMatch(j) && ca == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    var halfT = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2 // integer halving, as the oracle does
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro

    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // NullType is accepted (a NULL literal argument, e.g. from SQL): the
  // null-safe eval path returns NULL before the kernel ever runs.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == StringType || e.dataType == org.apache.spark.sql.types.NullType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  // The kernel is a static call from generated code — the expression stays
  // inside the whole-stage-codegen span (no interpreted-eval fallback row
  // path), which is what keeps a blocked fuzzy self-join scan-bound.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringSimilarityFunctions {
  /** Jaro–Winkler similarity of two string columns, in [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
