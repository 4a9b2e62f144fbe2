package graft

class ExtensionsSpec extends SparkSpec {

  test("float_vec_dot callable from SQL after install") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      """SELECT float_vec_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |                     CAST(array(3.0, 2.0, 1.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(got === 10.0)
  }

  test("config-wired session exposes every registered function in SQL") {
    // SparkSpec builds the session with spark.sql.extensions =
    // graft.GraftExtensions — the cluster wiring, not install().
    val row = spark.sql(
      """SELECT jaro_winkler('martha', 'marhta') AS jw,
        |       float_vec_sqdist(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                        CAST(array(4.0, 6.0) AS ARRAY<FLOAT>)) AS d2""".stripMargin)
      .collect()(0)
    assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(row.getDouble(1) === 25.0)
  }

  test("extension class wires the function into SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder is callable
    val expr = GraftExtensions.functions.head._2(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    assert(expr.isInstanceOf[graft.functions.FloatVecDot])
  }
}
