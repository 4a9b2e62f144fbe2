package graft

import graft.operators.LogisticRegression
import org.apache.spark.sql.functions._

class LogisticRegressionSpec extends SparkSpec {
  import spark.implicits._

  // Linearly separable: y = 1 iff x > 3 (bias + one feature)
  private lazy val separable = (0 until 200).map { i =>
    val x = (i % 7).toDouble
    (x, if (x > 3) 1.0 else 0.0)
  }.toDF("x", "y").cache()

  test("learns a separating boundary on separable data") {
    val feats = Seq(lit(1.0), col("x"))
    val beta = LogisticRegression.train(separable, feats, col("y"), lr = 0.5, iterations = 50)
    val acc = separable
      .withColumn("p", LogisticRegression.predict(feats, beta))
      .filter((col("p") > 0.5) === (col("y") === 1.0))
      .count().toDouble / 200
    assert(acc === 1.0, s"separable data should classify perfectly, got $acc (beta ${beta.toSeq})")
    assert(beta(1) > 0, "slope must be positive for y increasing in x")
  }

  private def logLoss(beta: Array[Double]): Double =
    separable
      .withColumn("p", LogisticRegression.predict(Seq(lit(1.0), col("x")), beta))
      .select(avg(
        -(col("y") * log(col("p")) + (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))))
      .collect().head.getDouble(0)

  test("more sweeps reduce training log-loss") {
    val l1 = logLoss(LogisticRegression.train(
      separable, Seq(lit(1.0), col("x")), col("y"), lr = 0.5, iterations = 1))
    val l10 = logLoss(LogisticRegression.train(
      separable, Seq(lit(1.0), col("x")), col("y"), lr = 0.5, iterations = 10))
    assert(l10 < l1, s"loss after 10 sweeps ($l10) should beat 1 sweep ($l1)")
  }

  test("balanced labels with a useless feature fit ~zero slope, p ~ base rate") {
    val df = (0 until 100).map(i => (1.0, if (i % 2 == 0) 1.0 else 0.0)).toDF("x", "y")
    val beta = LogisticRegression.train(df, Seq(lit(1.0), col("x")), col("y"), iterations = 20)
    val p = df.withColumn("p", LogisticRegression.predict(Seq(lit(1.0), col("x")), beta))
      .select(avg(col("p"))).collect().head.getDouble(0)
    assert(math.abs(p - 0.5) < 1e-6, s"balanced labels should predict the 0.5 base rate, got $p")
  }

  test("unrolledSql replays the Column loop through Spark SQL") {
    separable.createOrReplaceTempView("lr_data")
    val viaSql = spark.sql(LogisticRegression.unrolledSql(
      "SELECT CAST(1.0 AS DOUBLE) AS x0, CAST(x AS DOUBLE) AS x1, CAST(y AS DOUBLE) AS y FROM lr_data",
      p = 2, lr = 0.5, iterations = 5))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val viaLoop = LogisticRegression.train(
      separable, Seq(lit(1.0), col("x")), col("y"), lr = 0.5, iterations = 5)
    viaLoop.zipWithIndex.foreach { case (b, j) =>
      assert(math.abs(viaSql(j) - b) < 1e-9, s"coefficient $j")
    }
  }
}
