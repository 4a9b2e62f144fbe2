package graft

import org.apache.spark.sql.functions._

/** Sanity contract for the persisted LSH near-dup index: probing the
  * index with its own corpus must match every doc to itself at
  * Jaccard 1.0 (a doc always shares all its buckets and shingles with
  * itself) — and the best-match tie-break must prefer it over any
  * merely-similar neighbor of higher id.
  */
class LshIndexSpec extends SparkSpec {

  test("self-probe matches every doc to itself at jaccard 1.0") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 3)
    val path = java.nio.file.Files.createTempDirectory("lsh_self").resolve("idx").toString
    queries.Dedup.writeLshIndex(corpus, path)
    val got = queries.Dedup.probeLshIndex(spark, path, corpus, corpus, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ids = corpus.select(col("doc_id")).collect().map(_.getLong(0))
    ids.foreach { id =>
      val (dupOf, jacc) = got.getOrElse(id, fail(s"doc $id missing from self-probe"))
      // exact self-duplicate always present; equal-content docs with a
      // lower id may canonically win the tie, but the score must be 1.0
      assert(jacc === 1.0, s"doc $id best jaccard $jacc")
      assert(dupOf <= id, s"doc $id matched $dupOf — tie-break must take the lowest id")
    }
  }
}
