package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join: latest right at-or-before each left, else null") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 25L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (3L, 1L, 999.0))
      .toDF("k", "rt", "v")
    val got = AsOf.joinBackward(left, right, key = "k", leftTs = "t", rightTs = "rt",
      payloadCols = Seq("v"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      (1L, 5L, "a", None),          // before any right row
      (1L, 10L, "b", Some(100.0)),  // inclusive: right at equal ts matches
      (1L, 25L, "c", Some(200.0)),  // latest at-or-before
      (2L, 7L, "d", None)))         // key with no right rows at all
  }

  test("forward as-of join: earliest right at-or-after each left, else null") {
    val left = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 25L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (3L, 1L, 999.0))
      .toDF("k", "rt", "v")
    val got = AsOf.joinForward(left, right, key = "k", leftTs = "t", rightTs = "rt",
      payloadCols = Seq("v"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      (1L, 5L, "a", Some(100.0)),   // earliest at-or-after
      (1L, 10L, "b", Some(100.0)),  // inclusive: right at equal ts matches
      (1L, 25L, "c", None),         // after the last right row
      (2L, 7L, "d", None)))         // key with no right rows at all
  }
}
