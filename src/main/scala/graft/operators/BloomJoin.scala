package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime-filter (bloom) semi join.
  *
  * The classic 100 TB shape: a fact table joins a dim side that a
  * selective predicate has already cut to a sliver, but the fact scan
  * still reads and shuffles EVERY row before the join drops 99% of
  * them. The fix every warehouse engine ships (and Spark itself applies
  * under `spark.sql.optimizer.runtime.bloomFilter.enabled` when stats
  * allow) is to collapse the dim keys into a compact Bloom sketch,
  * broadcast it, and drop non-matching fact rows AT THE SCAN, before
  * the shuffle.
  *
  * This operator makes that plan shape explicit and composable:
  *   1. build a [[BloomFilter]] over the dim keys (`stat.bloomFilter` —
  *      one pass over the already-filtered dim side, merged on the
  *      driver; sized by `expectedKeys`/`fpp`, ~1.2 MB per million keys
  *      at 1% fpp, well under broadcast budget);
  *   2. pre-filter the fact side with [[MightContainBloom]] — a native
  *      codegen'd expression (the sketch rides along as a codegen
  *      reference object, deserialized once per executor, NOT per row);
  *   3. finish with the exact semi join, so bloom false positives are
  *      removed and the result is EXACT — the sketch only changes how
  *      many rows reach the shuffle, never the answer.
  */
object BloomJoin {

  /** `fact` rows whose `factKey` appears in `dim.dimKey` (exact left-semi
    * semantics), with a bloom pre-filter ahead of the shuffle.
    */
  def semiFiltered(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    fact
      .filter(mightContain(bloom, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }

  def mightContain(bloom: BloomFilter, key: Column): Column =
    ColumnBridge.column(MightContainBloom(ColumnBridge.expression(key), bloom))
}

/** `bloom.mightContain(child)` as a native expression. Long/int keys use
  * the sketch's long path (matching `stat.bloomFilter`'s put side, which
  * hashes integral columns as longs).
  */
case class MightContainBloom(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports int/long keys, got ${other.simpleString}")
  }

  override def nullSafeEval(k: Any): Any = k match {
    case i: Int => bloom.mightContainLong(i.toLong)
    case l: Long => bloom.mightContainLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The filter object is registered once as a codegen reference — each
    // generated-class instance holds it; no per-row deserialization.
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = $bloomRef.mightContainLong((long) $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainBloom =
    copy(child = newChild)
}
