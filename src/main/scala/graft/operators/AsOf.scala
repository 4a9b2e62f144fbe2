package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row of the
  * same key with `rightTs <= leftTs` (inclusive). Spark has no built-in
  * as-of join; the naive range join explodes. This composition is the
  * scalable form: union both sides tagged, one shuffle on the key, then
  * `last(_, ignoreNulls)` over the event-time order carries each right
  * payload forward to the left rows it matches. Wall cost is one
  * shuffle + one in-partition sort regardless of match fan-out.
  *
  * The right payload travels as ONE struct column, so a match is always
  * a single right row (never a column-wise mix of rows), and when
  * several right rows tie on (key, ts) the winner is deterministic:
  * the row with the greatest payload tuple (struct ordering), in both
  * directions.
  *
  * Precondition: because the payload struct participates in the window
  * ORDER BY (for the deterministic tie-break), every payload column
  * must be of an orderable type — atomics, structs/arrays of atomics.
  * Map-typed payloads are rejected by the analyzer; wrap them
  * (`map_entries`) or add a surrogate orderable column first.
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
      payloadCols: Seq[String]): DataFrame =
    joinAsOf(left, right, key, leftTs, rightTs, payloadCols, forward = false)

  /** Forward as-of join — for each left row, the earliest right row of
    * the same key with `rightTs >= leftTs` (inclusive). Same
    * one-shuffle union-and-carry shape as [[joinBackward]], mirrored:
    * each right payload is carried backward with `first(_, ignoreNulls)`
    * over the current-to-following frame.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame =
    joinAsOf(left, right, key, leftTs, rightTs, payloadCols, forward = true)

  private def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val rTagged = right
      .select(
        col(key),
        col(rightTs).as("__ts"),
        struct(payloadCols.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    // left rows carry no __p column: allowMissingColumns fills a null
    // STRUCT (not a struct of nulls), which `ignoreNulls` skips whole.
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val carried =
      if (!forward) {
        // right rows (side 0) sort before left rows at equal timestamps →
        // inclusive match; among right ties on __ts, ascending __p order
        // makes last() pick the greatest payload tuple.
        val w = Window.partitionBy(col(key))
          .orderBy(col("__ts"), col("__side"), col("__p"))
          .rowsBetween(Window.unboundedPreceding, 0)
        unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      } else {
        // left rows (side 1) sort before right rows (side 0) at equal
        // timestamps → the current-to-following frame sees the equal-ts
        // right row; among right ties, descending __p order makes first()
        // pick the greatest payload tuple.
        val w = Window.partitionBy(col(key))
          .orderBy(col("__ts"), col("__side").desc, col("__p").desc)
          .rowsBetween(0, Window.unboundedFollowing)
        unioned.withColumn("__m", first(col("__p"), ignoreNulls = true).over(w))
      }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
