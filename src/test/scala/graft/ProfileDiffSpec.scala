package graft

import graft.operators.{Profile, TableDiff}
import org.apache.spark.sql.functions._

class ProfileDiffSpec extends SparkSpec {
  import spark.implicits._

  test("Profile counts nulls, distincts, and string min/max per column") {
    val df = Seq(
      (Some(3L), Some("b")),
      (None, Some("a")),
      (Some(3L), None),
      (Some(7L), Some("a")))
      .toDF("k", "s")
    val rows = Profile.table(df, Seq("k", "s"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(rows("k") === ((4L, 1L, 2L, "3", "7")))
    assert(rows("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("Profile runs as one melted scan, never a per-column UNION") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val plan = Profile.table(df, Seq("k", "s")).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "per-column UNION would rescan the table per column")
    assert(plan.contains("Generate"), "metrics should aggregate over the melted (col, value) rows")
  }

  test("TableDiff classifies added / removed / changed and drops unchanged") {
    val before = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0)).toDF("k", "s", "v")
    val after = Seq((2L, "y", 20.0), (3L, "z", 99.0), (4L, "w", 40.0)).toDF("k", "s", "v")
    val got = TableDiff.diff(before, after, Seq("k"))
      .select("status", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("removed", 1L), ("changed", 3L), ("added", 4L)))
  }

  test("TableDiff change detection is null-safe in both directions") {
    val before = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("z")))
      .toDF("k", "s")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("z")))
      .toDF("k", "s")
    val got = TableDiff.diff(before, after, Seq("k"))
      .select("status", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // 1: x -> null is a change; 2: null == null is unchanged; 3: unchanged
    assert(got === Set(("changed", 1L)))
  }

  test("TableDiff exposes both payload structs for changed keys") {
    val before = Seq((1L, 10.0)).toDF("k", "v")
    val after = Seq((1L, 11.0)).toDF("k", "v")
    val row = TableDiff.diff(before, after, Seq("k"))
      .select(col("before.v").as("vb"), col("after.v").as("va"))
      .collect().head
    assert(row.getDouble(0) === 10.0 && row.getDouble(1) === 11.0)
  }
}
