package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over an `Array[Float]` embedding column — built from
  * higher-order functions (`zip_with` + `aggregate`), computed in double
  * precision with a deterministic left-fold, so results are reproducible
  * and cross-engine comparable.
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH variant
  * (deterministic signed random projections) is the 100 TB path: bucket
  * first (narrow shuffle on short keys), then score only within-bucket
  * candidates instead of the full cross product.
  */
object Similarity {

  def toDoubleArr(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector. The query side
    * is broadcast (k queries ≪ corpus); ties broken by ascending
    * candidate id after rounding so the result is total-order
    * deterministic.
    */
  def bruteForceTopK(
      corpus: DataFrame,  // (vec_id, embedding)
      queries: DataFrame, // (q_id, q_emb)
      k: Int,
      roundDigits: Int = 4): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn(
        "cos",
        round(graft.functions.VectorFunctions.vecCosine(col("q_emb"), col("embedding")), roundDigits))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Deterministic signed-random-projection LSH: hyperplane j weights
    * w(j,d) = ((j·31 + d·17) mod 7) − 3 (pseudo-random, engine-portable,
    * no RNG state). Bucket = bit-packed signs of the nPlanes projections.
    */
  def lshBucket(emb: Column, nPlanes: Int = 8): Column =
    (0 until nPlanes)
      .map { j =>
        val proj = aggregate(
          zip_with(
            emb,
            transform(sequence(lit(0), size(emb) - 1), d => (lit(j) * 31 + d * 17) % 7 - lit(3)),
            (x, w) => x.cast("double") * w),
          lit(0.0),
          (acc, x) => acc + x)
        when(proj > 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** ANN via LSH buckets: score only pairs that share a bucket. Recall is
    * tunable with nPlanes/multi-probe; this is the plan shape that
    * survives 100 TB (no cross join, shuffle keyed on short bucket ids).
    */
  def lshTopK(
      corpus: DataFrame,  // (vec_id, embedding)
      queries: DataFrame, // (q_id, q_emb)
      k: Int,
      nPlanes: Int = 8): DataFrame = {
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), nPlanes))
    val qBucketed = queries.withColumn("bucket", lshBucket(col("q_emb"), nPlanes))
    val scored = bucketed
      .join(broadcast(qBucketed), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn(
        "cos",
        round(graft.functions.VectorFunctions.vecCosine(col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }
}
