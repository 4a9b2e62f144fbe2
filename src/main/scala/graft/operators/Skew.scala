package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys: two-phase salted aggregation.
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB a single skewed key stalls the stage. Salting
  * splits each key into `saltBuckets` sub-keys for a parallel partial
  * aggregate, then re-aggregates the per-salt partials — for algebraic
  * aggregates (sum/count/min/max) the result is identical. AQE's skew
  * handling covers joins; this covers aggregations.
  */
object Skew {

  /** Σ/count per key via salted two-phase aggregation. `aggs` maps output
    * column name → (partial agg of the value column, final re-agg of the
    * partial). E.g. sum → (sum, sum); count → (count, sum).
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int)(
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(saltBuckets > 0)
    val salted = df.withColumn(
      "__salt", (rand(seed = 42) * saltBuckets).cast("int"))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Convenience: salted equivalent of
    * `groupBy(keys).agg(sum(valueCol) as outName)`.
    */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      outName: String,
      saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, saltBuckets)(
      Seq(sum(col(valueCol)).as("__partial")),
      Seq(sum(col("__partial")).as(outName)))

  /** Salted count per key. */
  def saltedCount(
      df: DataFrame,
      keyCols: Seq[String],
      outName: String = "n",
      saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, saltBuckets)(
      Seq(count(lit(1)).as("__partial")),
      Seq(sum(col("__partial")).as(outName)))

  /** Skew-resistant equi-join: salt the (large, skewed) probe side and
    * replicate every build row across all salt buckets, so a hot key's
    * probe rows spread over `saltBuckets` reducers instead of stalling
    * one. Build-side cost is ×saltBuckets — use when the build side is
    * too big to broadcast but far smaller than the probe side (else AQE
    * skew-join or a plain broadcast already wins). Result equals
    * `probe.join(build, keys, "inner")` row-for-row.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val saltedProbe = probe.withColumn(
      "__salt", (rand(seed = 43) * saltBuckets).cast("int"))
    val replicatedBuild = build.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe
      .join(replicatedBuild, keyCols :+ "__salt")
      .drop("__salt")
  }
}
