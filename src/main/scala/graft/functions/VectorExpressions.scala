package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product.
  *
  * The composable form (`zip_with` + `aggregate`) is correct but
  * higher-order functions evaluate interpreted, one lambda call per
  * element — the profiled hot path of every similarity query. This
  * expression generates a tight primitive loop inside whole-stage codegen
  * (and its interpreted fallback matches bit-for-bit: same left-to-right
  * double accumulation, so DuckDB oracles are unaffected).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs(i).toDouble * ys(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $xs[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over float vectors — the k-means / k-center
  * assignment hot path. Same design as [[FloatVecDot]]: tight primitive
  * loop under whole-stage codegen; interpreted fallback accumulates in
  * the identical left-to-right order, so oracle parity is unaffected.
  */
case class FloatVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def prettyName: String = "float_vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toFloatArray()
    val ys = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = xs(i).toDouble - ys(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs"); val ys = ctx.freshName("ys")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $xs[$i] - (double) $ys[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecSqDist =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two `array<float>` columns, accumulated in double. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Squared L2 distance of two `array<float>` columns. */
  def vecSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
