package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every primary key as added / removed /
  * changed between two versions of a table. The companion to the
  * order-independent checksum (q_table_checksum): the checksum says THAT
  * two snapshots differ, the diff says WHERE.
  *
  * One full outer join on the key: each side's non-key payload travels
  * as a single struct, presence is detected with sentinel null checks,
  * and change with a null-safe struct comparison (`<=>`), so the plan is
  * a single hash join regardless of column count — never a column-wise
  * join per attribute.
  */
object TableDiff {

  /** @param before   old snapshot
    * @param after    new snapshot (same schema)
    * @param keys     primary-key column names
    * @return (status, keys..., before: struct, after: struct) — status ∈
    *         {'added', 'removed', 'changed'}; unchanged rows are
    *         dropped; the absent side's struct is NULL.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val payloadCols = before.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, tag: String): DataFrame =
      df.select(
        keys.map(col) :+
          struct(payloadCols.map(col): _*).as(s"__p_$tag") :+
          lit(1).as(s"__has_$tag"): _*)
    pack(before, "b")
      .join(pack(after, "a"), keys, "full_outer")
      .withColumn(
        "status",
        when(col("__has_b").isNull, "added")
          .when(col("__has_a").isNull, "removed")
          .when(!(col("__p_b") <=> col("__p_a")), "changed"))
      .filter(col("status").isNotNull)
      .select(
        col("status") +:
          keys.map(col) :+
          col("__p_b").as("before") :+
          col("__p_a").as("after"): _*)
  }
}
