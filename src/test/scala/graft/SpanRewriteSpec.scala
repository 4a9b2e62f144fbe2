package graft

import org.apache.spark.sql.functions._

/** Invariants tying the substring-dedup REWRITE (q_span_rewrite) to
  * the ACCOUNTING pass (q_span_dedup) it shares its island table with:
  * the rewrite must retain exactly the token count the accounting
  * predicted, and untouched docs must round-trip verbatim.
  */
class SpanRewriteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val accounting =
    queries.Dedup.qSpanDedup.run(spark, dir)
      .select("doc_id", "n_tokens", "n_covered", "n_retained").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  private lazy val rewrite =
    queries.Dedup.qSpanRewrite.run(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_retained"), r.getAs[String]("rewrite_md5")))).toMap

  test("rewrite covers every doc and retains exactly what the accounting predicted") {
    assert(rewrite.keySet == accounting.keySet)
    for ((id, (ret, _)) <- rewrite) {
      val (_, _, accRet) = accounting(id)
      assert(ret == accRet, s"doc $id: rewrite retained $ret, accounting said $accRet")
    }
    // the corpus actually exercises both branches
    assert(accounting.values.exists { case (_, cov, _) => cov > 0 })
    assert(accounting.values.exists { case (_, cov, _) => cov == 0 })
  }

  test("docs with no duplicated spans round-trip their full token stream verbatim") {
    val untouched = accounting.collect { case (id, (_, 0L, _)) => id }.toSet
    assert(untouched.nonEmpty)
    val expected = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(untouched.toSeq.map(Long.box): _*))
      .select(col("doc_id"),
        md5(array_join(
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)), " ")).as("full_md5"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, full) <- expected)
      assert(rewrite(id)._2 == full, s"doc $id: untouched doc was rewritten")
  }
}
