package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave2 is a bijection from the 32x32 grid onto 0..1023") {
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val codes = grid.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 5).as("z"))
      .collect().map(_.getLong(0))
    assert(codes.toSet === (0L until 1024L).toSet)
  }

  test("aligned code ranges bound both dimensions (the data-skipping property)") {
    // Fixing the high bits of the Morton code (z >> 6) pins x >> 3 and
    // y >> 3: every 64-code-aligned bucket is exactly an 8x8 tile.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val spans = grid.toDF("x", "y")
      .withColumn("z", ZOrder.interleave2(col("x"), col("y"), 6))
      .groupBy(shiftright(col("z"), 6).as("tile"))
      .agg(
        (max("x") - min("x")).as("xspan"),
        (max("y") - min("y")).as("yspan"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length === 64)
    spans.foreach { r =>
      assert(r.getAs[Long]("xspan") <= 7 && r.getAs[Long]("yspan") <= 7)
      assert(r.getAs[Long]("n") === 64)
    }
  }

  test("interleave2Sql agrees with the Column form") {
    val df = Seq((3L, 5L), (1023L, 0L), (512L, 511L), (0L, 0L)).toDF("x", "y")
    val got = df.select(
      ZOrder.interleave2(col("x"), col("y"), 10).as("a"),
      expr(ZOrder.interleave2Sql("x", "y", 10)).as("b"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("cluster2 range-partitions so each partition covers a tight z-range") {
    val rows = for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)
    val clustered = ZOrder.cluster2(
      rows.toDF("x", "y"), col("x"), col("y"), bits = 7, numPartitions = 8)
    // Recompute the code per row and check partition-level z-ranges are
    // (nearly) disjoint — the property that makes file-level pruning work.
    val withPart = clustered
      .withColumn("z", ZOrder.interleave2(col("x"), col("y"), 7))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .orderBy("lo")
      .collect()
    assert(withPart.length >= 4, "range partitioner should actually split")
    val ranges = withPart.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "z-ranges must not overlap")
      case _ =>
    }
  }
}
