package graft

import graft.operators.DataChecks
import graft.operators.DataChecks.{Holds, RefersTo, Unique}
import org.apache.spark.sql.functions._

class DataChecksSpec extends SparkSpec {
  import spark.implicits._

  test("counts duplicate keys, orphan FKs, predicate failures — nulls fail Holds") {
    val facts = Seq(
      (1L, Some(10L), 5.0),
      (1L, Some(10L), -2.0),   // dup key 1 (2 rows) + negative value
      (2L, Some(99L), 1.0),    // orphan fk 99
      (3L, None, 3.0),         // null fk is NOT an orphan (skipped)
      (4L, Some(20L), Double.NaN)) // Spark orders NaN above all values: NaN >= 0 HOLDS
      .toDF("k", "fk", "v")
    val dim = Seq(10L, 20L).toDF("id")
    val got = DataChecks.run(Seq(
      Unique("uniq", facts, Seq("k")),
      RefersTo("fk", facts, "fk", dim, "id"),
      Holds("nonneg", facts, col("v") >= 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("uniq") === 2L, "both rows of a duplicated key count")
    assert(got("fk") === 1L)
    assert(got("nonneg") === 1L,
      "only the -2.0 violates — Spark's NaN sorts above every value, so NaN >= 0 holds")
  }

  test("null predicate results count as violations (coalesce false)") {
    val df = Seq(Some(1.0), None, Some(-1.0)).toDF("v")
    val got = DataChecks.run(Seq(Holds("nonneg", df, col("v") >= 0)))
      .collect().head.getLong(1)
    assert(got === 2L, "NULL >= 0 is unknown -> violation, plus the -1")
  }

  test("a clean table reports zero violations for every rule") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val got = DataChecks.run(Seq(
      Unique("u", df, Seq("k")),
      Holds("h", df, col("s").isin("a", "b")),
      RefersTo("r", df, "k", df.select(col("k")), "k")))
      .collect().map(_.getLong(1))
    assert(got.forall(_ === 0L))
  }

  test("composite-key uniqueness") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a")).toDF("k1", "k2")
    val got = DataChecks.run(Seq(Unique("u", df, Seq("k1", "k2"))))
      .collect().head.getLong(1)
    assert(got === 2L, "only the (1, a) pair is duplicated")
  }
}
