package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality snapshot every warehouse runs
  * before trusting a new drop: per column, null count, exact distinct
  * count, and lexical min/max (values compared AS STRINGS so one output
  * schema covers heterogeneous column types).
  *
  * Scale shape: ONE aggregation over ONE scan computes every metric for
  * every column (the per-column rows are unpivoted from the single
  * result row afterwards — row count 1, free). The exact
  * `count(DISTINCT)`s make Catalyst plan an Expand (input × k columns
  * before the partial agg) — the documented cost of exactness; swap in
  * `approx_count_distinct` when profiling at the 100 TB grain and the
  * ±2% HLL error is acceptable.
  */
object Profile {

  /** One row per profiled column:
    * (col_name, n_rows, n_nulls, n_distinct, min_s, max_s).
    */
  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__nd"),
        min(col(c).cast("string")).as(s"__${c}__min"),
        max(col(c).cast("string")).as(s"__${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__${c}__nulls").cast("long").as("n_nulls"),
        col(s"__${c}__nd").cast("long").as("n_distinct"),
        col(s"__${c}__min").as("min_s"),
        col(s"__${c}__max").as("max_s"))
    }: _*)
    one.select(explode(perCol).as("p")).select(col("p.*"))
  }
}
