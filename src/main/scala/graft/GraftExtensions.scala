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
    GraftExtensions.registrations.foreach { case (name, implClass, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(implClass, name),
        builder))
    }
    // Expression-level optimizations Catalyst can't infer for opaque
    // scalars (see each rule's soundness note).
    ext.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPruning)
  }
}

object GraftExtensions {
  /** (SQL name, implementing class for DESCRIBE FUNCTION, builder). */
  val registrations: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot", classOf[graft.functions.FloatVecDot].getName,
      (exprs: Seq[Expression]) => graft.functions.FloatVecDot(exprs(0), exprs(1))),
    ("float_vec_sqdist", classOf[graft.functions.FloatVecSqDist].getName,
      (exprs: Seq[Expression]) => graft.functions.FloatVecSqDist(exprs(0), exprs(1))),
    ("jaro_winkler", classOf[graft.functions.JaroWinkler].getName,
      (exprs: Seq[Expression]) => graft.functions.JaroWinkler(exprs(0), exprs(1))),
    ("minhash_sigs", classOf[graft.functions.MinhashSigs].getName,
      (exprs: Seq[Expression]) => graft.functions.MinhashSigs(exprs(0))),
    ("simhash16", classOf[graft.functions.Simhash16].getName,
      (exprs: Seq[Expression]) => graft.functions.Simhash16(exprs(0))))

  val functions: Seq[(String, Seq[Expression] => Expression)] =
    registrations.map { case (name, _, builder) => (name, builder) }

  /** Register on an already-built session (temp functions). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      ColumnBridge.registerTempFunction(spark, name, builder)
    }
}
