package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.ColumnBridge

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL callers. Wire with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (cluster) or
  * [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.functions.FloatVecDot].getName, name),
        builder))
    }
    // Expression-level optimizations Catalyst can't infer for opaque
    // scalars (see each rule's soundness note).
    ext.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPruning)
  }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_vec_dot" -> ((exprs: Seq[Expression]) =>
      graft.functions.FloatVecDot(exprs(0), exprs(1))),
    "float_vec_sqdist" -> ((exprs: Seq[Expression]) =>
      graft.functions.FloatVecSqDist(exprs(0), exprs(1))),
    "jaro_winkler" -> ((exprs: Seq[Expression]) =>
      graft.functions.JaroWinkler(exprs(0), exprs(1))))

  /** Register on an already-built session (temp functions). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      ColumnBridge.registerTempFunction(spark, name, builder)
    }
}
