package graft.operators

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement at corpus scale
  * (Efraimidis–Spirakis, "Weighted random sampling with a reservoir",
  * IPL 2006): every row draws a uniform u ∈ (0,1] and competes with the
  * key u^(1/w) — the k largest keys are a weighted sample without
  * replacement, exactly as if rows had been drawn sequentially with
  * probability ∝ w.
  *
  * Two deliberate choices make this production-shaped rather than
  * textbook-shaped:
  *
  *   - u is DERIVED (md5 of a salt + the row id), not drawn from
  *     rand(): the sample is reproducible across engines, retries, and
  *     speculative re-execution — rand()-based sampling silently breaks
  *     exactly-once semantics under task retry.
  *   - keys compare as ln(u)/w (monotone in u^(1/w), numerically safe
  *     for large w), and selection is a global top-k, which Spark plans
  *     as `TakeOrderedAndProject`: per-partition bounded heaps, k rows
  *     to the driver, no global sort, no shuffle. That IS the
  *     distributed reservoir.
  */
object WeightedSample {

  /** Key column: ln(u)/w with u = md5-uniform of `salt + id`. */
  def esKey(id: Column, weight: Column, salt: String): Column =
    log((md5Hash32(concat(lit(salt), id.cast("string"))) + lit(1.0)) / lit(4294967296.0)) /
      weight

  /** The k rows with the largest ES keys, ranked. Ties (impossible in
    * practice for distinct ids) break on the id for determinism.
    */
  def topK(df: DataFrame, id: Column, weight: Column, k: Int, salt: String): DataFrame = {
    val keyed = df.withColumn("__es_key", esKey(id, weight, salt))
      .orderBy(col("__es_key").desc, id)
      .limit(k)
    // the rank window sees only the k selected rows — bounded domain
    keyed.withColumn("rank",
      row_number().over(Window.orderBy(col("__es_key").desc, id)).cast("long"))
  }
}
