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

  /** Content-derived salt: `pmod(hash(cols), buckets)`. Unlike
    * `rand(seed)` — which is deterministic per PARTITION but reshuffles
    * whenever the input is split differently — this routes a row by its
    * own bytes, so a restarted or incrementally re-run pipeline salts
    * identically no matter how the input was repartitioned. Pass
    * secondary columns (not the hot key itself: hashing only the hot
    * key maps all its rows to ONE bucket, defeating the salt).
    */
  def contentSalt(saltBuckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(saltBuckets))

  /** Σ/count per key via salted two-phase aggregation. `aggs` maps output
    * column name → (partial agg of the value column, final re-agg of the
    * partial). E.g. sum → (sum, sum); count → (count, sum).
    *
    * `saltBy` picks the routing: default `rand(seed)` is cheapest and
    * fine for one-shot algebraic aggregates (any salt assignment yields
    * identical finals); pass [[contentSalt]] over secondary columns for
    * replayable routing in restartable/incremental pipelines.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      saltBy: Option[Column] = None)(
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(saltBuckets > 0)
    val salt = saltBy.getOrElse((rand(seed = 42) * saltBuckets).cast("int"))
    val salted = df.withColumn("__salt", salt)
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
      saltBuckets: Int,
      saltBy: Option[Column] = None): DataFrame = {
    require(saltBuckets > 0)
    val saltedProbe = probe.withColumn(
      "__salt", saltBy.getOrElse((rand(seed = 43) * saltBuckets).cast("int")))
    val replicatedBuild = build.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe
      .join(replicatedBuild, keyCols :+ "__salt")
      .drop("__salt")
  }

  /** Keys holding at least `minShare` of `df`'s rows — the detection
    * pass for [[saltedJoinSkewOnly]]. One hash aggregation (the hot
    * key's count is itself map-side combined, so detection can't
    * straggle) plus a broadcast scalar total; stays fully in-plan, and
    * the total is computed FROM the counts frame, so the counts
    * exchange is reused for both branches (SkewBalanceSpec asserts the
    * ReusedExchange) — detection costs one scan + one shuffle of df,
    * never two scans. At 100 TB, pass the pipeline's already-cached /
    * checkpointed probe frame as `df` and even that scan comes from
    * memory; detection never needs a cold re-read of the input.
    */
  def hotKeys(df: DataFrame, keyCols: Seq[String], minShare: Double): DataFrame = {
    require(minShare > 0 && minShare < 1)
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
    // total from the (key-cardinality-sized) counts frame, NOT a second
    // full scan of df; Spark reuses the aggregation exchange for both
    val total = counts.agg(sum(col("__n")).as("__tot"))
    counts.crossJoin(broadcast(total))
      .filter(col("__n") >= col("__tot") * minShare)
      .select(keyCols.map(col): _*)
  }

  /** Skew join that salts ONLY the hot keys: [[saltedJoin]] replicates
    * the ENTIRE build side ×saltBuckets, which at a 2M-row build and 16
    * buckets is 30M+ wasted rows for the ~1 key that actually needed
    * spreading. Here every probe/build row is tagged hot via a BROADCAST
    * semi-lookup of `hotKeys` (a small frame by definition — keys above
    * a row-share threshold; there can be at most 1/minShare of them);
    * hot probe rows salt across `saltBuckets`, cold rows salt 0, and
    * build rows replicate only when hot. One equi-join on
    * (keys, salt) — no union of a hot and cold path, so the plan stays
    * a single exchange per side. Result equals
    * `probe.join(build, keyCols)` row-for-row.
    *
    * This is the manual spelling of AQE's skew-join split for the
    * shapes AQE can't reach (skewed output feeding an aggregation, a
    * pre-shuffled cache, or a non-AQE engine).
    */
  def saltedJoinSkewOnly(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      hotKeys: DataFrame,
      saltBy: Option[Column] = None): DataFrame = {
    require(saltBuckets > 0)
    val hot = broadcast(
      hotKeys.select(keyCols.map(col): _*).distinct().withColumn("__hot", lit(1)))
    val salt = saltBy.getOrElse((rand(seed = 44) * saltBuckets).cast("int"))
    val p = probe.join(hot, keyCols, "left")
      .withColumn("__salt", when(col("__hot") === 1, salt).otherwise(lit(0)))
      .drop("__hot")
    val b = build.join(hot, keyCols, "left")
      .withColumn(
        "__salt",
        explode(sequence(
          lit(0), when(col("__hot") === 1, lit(saltBuckets - 1)).otherwise(lit(0)))))
      .drop("__hot")
    p.join(b, keyCols :+ "__salt").drop("__salt")
  }
}
