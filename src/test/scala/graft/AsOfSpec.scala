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

  test("both directions agree with brute force on seeded random data (incl. ts ties)") {
    val rnd = new scala.util.Random(12345)
    // small key/ts domains force heavy collisions: many same-key rows,
    // duplicate timestamps on both sides
    val left = (1 to 400).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, i.toLong))
    val right = (1 to 300).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong,
      rnd.nextInt(5) + 100.0))
    val leftDf = left.toDF("k", "t", "row_id")
    val rightDf = right.toDF("k", "rt", "v")

    // payload v collides on purpose (5 distinct values): at equal (k, ts)
    // the matched v is tie-broken arbitrarily, so compare against the SET
    // of admissible values at the boundary timestamp
    def admissible(k: Long, t: Long, dir: String): Set[Option[Double]] = {
      val cand = dir match {
        case "b" => right.filter(r => r._1 == k && r._2 <= t)
        case _   => right.filter(r => r._1 == k && r._2 >= t)
      }
      if (cand.isEmpty) Set(None)
      else {
        val boundary = if (dir == "b") cand.map(_._2).max else cand.map(_._2).min
        cand.filter(_._2 == boundary).map(r => Option(r._3)).toSet
      }
    }

    val gotB = graft.operators.AsOf.joinBackward(leftDf, rightDf, "k", "t", "rt", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val gotF = graft.operators.AsOf.joinForward(leftDf, rightDf, "k", "t", "rt", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq

    assert(gotB.size === left.size)
    assert(gotF.size === left.size)
    gotB.foreach { case (k, t, _, v) =>
      assert(admissible(k, t, "b").contains(v), s"backward k=$k t=$t got $v")
    }
    gotF.foreach { case (k, t, _, v) =>
      assert(admissible(k, t, "f").contains(v), s"forward k=$k t=$t got $v")
    }
  }
}
