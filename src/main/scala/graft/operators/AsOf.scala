package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row of the
  * same key with `rightTs <= leftTs` (inclusive). Spark has no built-in
  * as-of join; the naive range join explodes. This composition is the
  * scalable form: union both sides tagged, one shuffle on the key, then
  * `last(_, ignoreNulls)` over the event-time order carries each right
  * payload forward to the left rows it matches. Wall cost is one
  * shuffle + one in-partition sort regardless of match fan-out.
  */
object AsOf {

  /** @param left      probe side
    * @param right     reference side (its `payloadCols` are carried to matches)
    * @param key       equi-join key column name (both sides)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payloadCols columns of `right` to attach (renamed as given)
    * @return `left` columns + nullable payload columns (null = no prior right row)
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(payloadCols.map(c => s"__p_$c" -> lit(null)).toMap)
    val rTagged = right
      .select((col(key) +: col(rightTs).as("__ts") +:
        payloadCols.map(c => col(c).as(s"__p_$c"))): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal timestamps → inclusive match
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col(s"__m_$c").as(c)): _*)
  }

  /** Forward as-of join — for each left row, the earliest right row of
    * the same key with `rightTs >= leftTs` (inclusive). Same
    * one-shuffle union-and-carry shape as [[joinBackward]], mirrored:
    * left rows sort before right rows at equal timestamps and each right
    * payload is carried backward with `first(_, ignoreNulls)` over the
    * current-to-following frame.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(payloadCols.map(c => s"__p_$c" -> lit(null)).toMap)
    val rTagged = right
      .select((col(key) +: col(rightTs).as("__ts") +:
        payloadCols.map(c => col(c).as(s"__p_$c"))): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // left rows (side 1) sort before right rows (side 0) at equal
    // timestamps → the current-row-to-following frame sees the equal-ts
    // right row → inclusive match
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side").desc)
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__m_$c", first(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col(s"__m_$c").as(c)): _*)
  }
}
