package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional layout trick
  * behind Delta/Iceberg `ZORDER BY`: interleave the bits of two bucket
  * ids so that rows close in BOTH dimensions land close in ONE sort
  * key. Writing a 100 TB table `repartitionByRange(zorder)` +
  * `sortWithinPartitions(zorder)` makes every parquet file's min/max
  * footer stats tight in both dimensions at once, so a scan filtered on
  * EITHER dimension prunes most files — a plain lexicographic sort only
  * gives that for its leading column.
  *
  * Composed from built-in bitwise ops (shift/AND/OR), so the whole
  * computation stays inside whole-stage codegen and constant-folds where
  * possible — no custom expression needed (SURVEY preference (a)).
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (odd positions) and `y` (even
    * positions) into a single Morton code. Inputs must already be
    * non-negative bucket ids below 2^bits (mask upstream).
    */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val ybit = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
      xbit.bitwiseOR(ybit)
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (for oracles / SQL callers). */
  def interleave2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i + 1}) | ((($y >> $i) & 1) << ${2 * i})"
    }.mkString("(", ") | (", ")")

  /** Cluster `df` for 2-D data skipping: range-partition + in-partition
    * sort on the Morton code of the two bucket columns. `numPartitions`
    * sets the output file grain.
    */
  def cluster2(
      df: DataFrame,
      x: Column,
      y: Column,
      bits: Int,
      numPartitions: Int): DataFrame = {
    val z = interleave2(x, y, bits).as("__zorder")
    df.withColumn("__zorder", z)
      .repartitionByRange(numPartitions, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
  }
}
