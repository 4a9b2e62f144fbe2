package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: ORC round-trip with
  * predicate pushdown, CSV with explicit schema, JSON lines — the
  * formats a mixed-estate 100 TB ingest actually encounters.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/data"

  test("ORC round-trip preserves schema and pushes filters to the scan") {
    val dir = tmp("graft-orc")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "tag", "v")
    df.write.orc(dir)
    val back = spark.read.orc(dir)
    // ORC relaxes nullability on read; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) === df.schema.map(f => (f.name, f.dataType)))
    val filtered = back.filter(col("id") > 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1"), plan)
    assert(filtered.count() === 2)
  }

  test("CSV with explicit schema round-trips typed columns (S4 shape)") {
    val dir = tmp("graft-csv")
    val df = Seq((1L, 6.5, "x y"), (2L, 7.0, "z,w")).toDF("nshm_id", "magnitude", "note")
    df.write.option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("nshm_id LONG, magnitude DOUBLE, note STRING")
      .csv(dir)
    assert(back.schema.map(_.dataType) === df.schema.map(_.dataType))
    assert(back.orderBy("nshm_id").collect().map(_.getString(2)).toSeq === Seq("x y", "z,w"))
  }

  test("compaction shrinks a fragmented parquet dir, preserves data, rolls up sizes") {
    import spark.implicits._
    val dir = s"/tmp/graft-compact-${System.nanoTime()}"
    // 20 tiny files
    (1 to 2000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
      .repartition(20).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val expected = before.orderBy("id").collect().toSeq
    val (nBefore, nAfter) = graft.sources.Maintenance.compact(spark, dir, targetBytes = 1L << 20)
    assert(nBefore == 20)
    assert(nAfter < nBefore, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(dir)
    assert(after.orderBy("id").collect().toSeq == expected)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".compact-tmp")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".compact-bak")))
  }

  test("JSON lines round-trip nested structs") {
    val dir = tmp("graft-json")
    val df = Seq((1L, ("a", 2.0)), (2L, ("b", 3.0))).toDF("id", "payload")
    df.write.json(dir)
    val back = spark.read.json(dir).select("id", "payload._1", "payload._2")
    assert(back.count() === 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq === Seq("a", "b"))
  }
}
