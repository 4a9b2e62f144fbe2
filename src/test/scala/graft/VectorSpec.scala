package graft

import graft.functions.VectorFunctions
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
    (Array(0.5f, -0.25f, 8.0f), Array(1.5f, 0.0f, -2.0f)),
    (Array(0.0f, 0.0f, 1.0f), Array(0.0f, 1.0f, 0.0f))).toDF("a", "b")

  test("FloatVecDot matches the higher-order-function formulation bit-for-bit") {
    val rows = pairs.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("fast"),
      Similarity.dot(Similarity.toDoubleArr(col("a")), Similarity.toDoubleArr(col("b"))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq === Seq(10.0, -15.25, 0.0))
  }

  test("FloatVecDot survives whole-stage codegen and interpreted eval identically") {
    // codegen on (default) vs forced-off must agree
    val expr = VectorFunctions.vecDot(col("a"), col("b"))
    val on = pairs.select(expr).collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = pairs.select(expr).collect().map(_.getDouble(0)).toSeq
      assert(on === off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("FloatVecSqDist matches the HOF formulation and codegen on/off agree") {
    def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    val rows = pairs.select(
      VectorFunctions.vecSqDist(col("a"), col("b")).as("fast"),
      hofSq(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq === Seq(8.0, 101.0625, 2.0))
    val expr = VectorFunctions.vecSqDist(col("a"), col("b"))
    val on = pairs.select(expr).collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = pairs.select(expr).collect().map(_.getDouble(0)).toSeq
      assert(on === off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vecCosine on real embeddings equals the double-array HOF cosine") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(20).cache()
    val a = e.select(col("vec_id"), col("embedding"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("emb2"))
    val joined = a.crossJoin(b).filter(col("vec_id") < col("id2"))
    val rows = joined.select(
      round(VectorFunctions.vecCosine(col("embedding"), col("emb2")), 10).as("fast"),
      round(Similarity.cosine(
        Similarity.toDoubleArr(col("embedding")), Similarity.toDoubleArr(col("emb2"))), 10).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
