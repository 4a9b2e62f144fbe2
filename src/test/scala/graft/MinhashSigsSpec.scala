package graft

import graft.functions.MinhashFunctions.minhashSigsNative
import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

/** Parity contract for the native one-pass MinHash kernel: bit-identical
  * signatures to the composable pipeline (explode 3-grams → md5Hash32 →
  * groupBy min×k) it replaced — the property every LSH oracle's
  * hash-match now rests on.
  */
class MinhashSigsSpec extends SparkSpec {
  import spark.implicits._

  private def pipelineSigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
    val sh = df.filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), md5Hash32(col("s")).as("h"))
    val aggs = minhashSigs(col("h"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
  }

  private def nativeSigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.filter(length(col("text")) >= 3)
      .select(col("doc_id"), minhashSigsNative(col("text")).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("native kernel equals the exploded pipeline on the corpus") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assert(nativeSigs(d) === pipelineSigs(d))
  }

  test("edge cases: short text null, repeats, unicode, astral plane") {
    val df = spark.sparkContext.parallelize(Seq(
      (1L, "ab"),                  // shorter than one shingle
      (2L, "abc"),                 // exactly one
      (3L, "aaaaaaa"),             // all-duplicate shingles
      (4L, "héllo wörld héllo"),   // BMP non-ascii
      (5L, "𝕒𝕓𝕔𝕕𝕖")           // supplementary-plane code points
    ), 2).toDF("doc_id", "text")
    assert(nativeSigs(df) === pipelineSigs(df))
    // below-3-chars text yields NULL from the expression (no row in the
    // pipeline form)
    val nulls = df.select(col("doc_id"), minhashSigsNative(col("text")).as("s"))
      .filter(col("s").isNull).collect().map(_.getLong(0)).toSet
    assert(nulls === Set(1L))
  }

  test("native simhash16 equals the exploded ±1 bit-sum pipeline") {
    def pipeline(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val h = df.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .select(col("doc_id"), md5Hash32(col("w")).as("h"))
      val aggs = simhashBitAggs(col("h"))
      h.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .select(col("doc_id"), simhashFromBits().as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    def native(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("doc_id"),
        graft.functions.MinhashFunctions.simhash16Native(col("text")).as("s"))
        .filter(col("s").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assert(native(corpus) === pipeline(corpus))

    val edge = spark.sparkContext.parallelize(Seq(
      (1L, ""), (2L, "   "),              // no tokens -> null / no row
      (3L, "one"), (4L, "a  b   c"),      // collapsed multi-space gaps
      (5L, "héllo wörld 𝕒𝕓𝕔 héllo")   // multibyte tokens, repeats
    ), 2).toDF("doc_id", "text")
    assert(native(edge) === pipeline(edge))
    val nulls = edge.select(col("doc_id"),
      graft.functions.MinhashFunctions.simhash16Native(col("text")).as("s"))
      .filter(col("s").isNull).collect().map(_.getLong(0)).toSet
    assert(nulls === Set(1L, 2L))
  }

  test("codegen and interpreted eval agree; SQL-callable via extensions") {
    val df = spark.sparkContext.parallelize(
      Seq((1L, "the quick brown fox jumps")), 1).toDF("doc_id", "text")
    val viaCol = df.select(minhashSigsNative(col("text"))).head.getSeq[Long](0)
    GraftExtensions.install(spark)
    df.createOrReplaceTempView("mh_t")
    val viaSql = spark.sql("SELECT minhash_sigs(text) FROM mh_t").head.getSeq[Long](0)
    assert(viaCol === viaSql)
    val direct = graft.functions.MinhashSigsImpl
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox jumps"))
      .toLongArray().toSeq
    assert(viaCol === direct)
  }
}
