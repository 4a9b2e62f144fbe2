package graft

import graft.operators.EquiDepth
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Fuzzes the two-phase equi-depth histogram against the literal window
  * ntile formulation: for random multisets (heavy duplicates, skew,
  * tiny N < n, constant columns) both must produce identical
  * (bucket, n, lo, hi) rows. This is the window-free rewrite's safety
  * net beyond the single hash-gated shape in q_histogram_depth.
  */
class EquiDepthPropertySpec extends SparkSpec {
  import spark.implicits._

  private def viaNtile(values: Seq[Double], n: Int) = {
    val df = values.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val w = Window.orderBy(col("v"), col("id"))
    df.select(col("v"), ntile(n).over(w).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
  }

  private def viaTwoPhase(values: Seq[Double], n: Int) = {
    // parallelized input so the operator actually runs distributed paths
    val df = spark.sparkContext.parallelize(values, 4).toDF("v")
    EquiDepth.histogram(df, col("v"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
  }

  test("two-phase equi-depth equals window ntile on random multisets") {
    val rnd = new Random(7)
    for (trial <- 1 to 12) {
      val size = 1 + rnd.nextInt(400)
      val domain = 1 + rnd.nextInt(30) // small domain => heavy duplicates
      val values = Seq.fill(size)((rnd.nextInt(domain) * 10 + rnd.nextInt(3)).toDouble)
      val n = Seq(2, 4, 8)(rnd.nextInt(3))
      val got = viaTwoPhase(values, n)
      val want = viaNtile(values, n)
      assert(got === want, s"trial $trial: size=$size domain=$domain n=$n")
    }
  }

  test("edge cases: constant column, N < n, single row") {
    assert(viaTwoPhase(Seq.fill(37)(5.0), 8) === viaNtile(Seq.fill(37)(5.0), 8))
    assert(viaTwoPhase(Seq(3.0, 1.0, 2.0), 8) === viaNtile(Seq(3.0, 1.0, 2.0), 8))
    assert(viaTwoPhase(Seq(42.0), 4) === viaNtile(Seq(42.0), 4))
  }
}
