package graft

import graft.functions.{JaroWinklerImpl, StringSimilarityFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler matches DuckDB jaro_winkler_similarity on probed cases") {
    // Expected values probed from DuckDB 1.0.0 (the driver's oracle engine).
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // classic: 2-pos transposition
      ("DWAYNE", "DUANE", 0.8400000000000001),    // prefix boost of 1
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),                              // DuckDB: empty-empty is 0, not 1
      ("abcdqqqqqq", "abcdzzzzzz", 0.6),          // jaro ≤ 0.7 → NO Winkler boost
      ("ab", "abcdefghij", 0.7866666666666667),   // boost above the 0.7 threshold
      ("a", "", 0.0),
      ("a", "a", 1.0),
      ("aaaaa", "aaaab", 0.9200000000000000),
      ("CRATE", "TRACE", 0.7333333333333333),     // matches out of prefix → no boost
      ("abcd", "badc", 0.8333333333333333),       // 4 mismatched slots → t = 2
      ("x", "y", 0.0),
      ("abcxxxxx", "bcaxxxxx", 0.9583333333333334), // 3 mismatched slots → t = 3/2 = 1 (INTEGER)
      ("abcyy", "bcayy", 0.8666666666666667),
      ("abcdefg", "gabcdef", 0.9047619047619048),
      ("appel", "apple", 0.9533333333333333))
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("JaroWinkler invariants: symmetric, in [0,1], 1 iff equal non-empty") {
    val words = Seq("goldenrod", "lavender", "spring", "chiffon", "midnight",
      "linen", "lace", "lemon", "", "a", "ab", "ba", "abab", "baba")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === jw(b, a), s"symmetry for ($a, $b)")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }

  test("JaroWinkler codegen and interpreted eval agree on real part names") {
    val df = Seq(
      ("goldenrod lavender spring chiffon midnight", "goldenrod lavender spring chiffon linen"),
      ("slate pink powder green navy", "slate pink powder navy green"),
      ("x", "completely different string altogether"))
      .toDF("a", "b")
    val expr = StringSimilarityFunctions.jaroWinkler(col("a"), col("b")).as("s")
    val on = withCodegen(true) { df.select(expr).collect().map(_.getDouble(0)).toSeq }
    val off = withCodegen(false) { df.select(expr).collect().map(_.getDouble(0)).toSeq }
    assert(on === off)
    // and both equal the kernel directly
    val direct = df.collect().map(r => jw(r.getString(0), r.getString(1))).toSeq
    assert(on === direct)
  }

  test("jaro_winkler is SQL-callable through GraftExtensions") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
      .collect().head.getDouble(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
    assert(spark.sql("SELECT jaro_winkler(NULL, 'x') AS s").collect().head.isNullAt(0))
  }

  private def withCodegen[T](on: Boolean)(body: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try body finally spark.conf.set(key, prev)
  }
}
