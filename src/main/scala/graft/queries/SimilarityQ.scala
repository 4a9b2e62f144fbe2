package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search extension pack over `embeddings` (Array[Float],
  * 64-dim): vector norms, brute-force cosine top-k (correctness
  * baseline, exact DuckDB oracle in explicit double arithmetic), and the
  * LSH-bucketed ANN variant (the scale path; rows-only check since the
  * bucketing is engine-internal).
  */
object SimilarityQ extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.loadDistributed(s, dir, "embeddings", "vec_id")

  private def sqNormSql(c: String): String =
    s"list_sum([CAST(list_extract($c, i) AS DOUBLE) * CAST(list_extract($c, i) AS DOUBLE) FOR i IN range(1, len($c) + 1)])"

  /** Vector norms — exercises the higher-order-function math path. */
  val qEmbedNorms: Q = Q(
    "q_embed_norms",
    Some(s"""SELECT vec_id, label, round(sqrt(${sqNormSql("embedding")}), 4) AS norm
             FROM embeddings ORDER BY vec_id"""),
    (s, dir) =>
      emb(s, dir)
        .select(
          col("vec_id"),
          col("label"),
          round(Similarity.norm(Similarity.toDoubleArr(col("embedding"))), 4).as("norm"))
        .orderBy(col("vec_id")))

  /** Brute-force cosine top-5 neighbors for query vectors vec_id < 5. */
  val qCosineTopk: Q = Q(
    "q_cosine_topk", {
      val dotSql =
        "list_sum([CAST(list_extract(q.q_emb, i) AS DOUBLE) * CAST(list_extract(e.embedding, i) AS DOUBLE) FOR i IN range(1, len(e.embedding) + 1)])"
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
               scored AS (
                 SELECT q.q_id, e.vec_id,
                        round($dotSql / (sqrt(${sqNormSql("q.q_emb")}) * sqrt(${sqNormSql("e.embedding")})), 4) AS cos
                 FROM embeddings e, q WHERE e.vec_id <> q.q_id),
               ranked AS (
                 SELECT q_id, vec_id, cos,
                        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
                 FROM scored)
               SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= 5
               ORDER BY q_id, rank""")
    },
    (s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.bruteForceTopK(e.select(col("vec_id"), col("embedding")), queries, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("q_id"), col("rank"))
    })

  /** ANN via deterministic signed-random-projection LSH buckets — the
    * plan shape that replaces the cross join at scale. No SQL oracle
    * (bucketing is engine-internal); driver records a rows-only check.
    */
  val qLshAnn: Q = Q(
    "q_lsh_ann",
    None,
    (s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.lshTopK(e.select(col("vec_id"), col("embedding")), queries, k = 5, nPlanes = 6)
        .orderBy(col("q_id"), col("rank"))
    })

  /** ANN via IVF cells (k-means partition + probe-nearest-cells) — the
    * second scale path next to LSH. Rows-only check (centroid build is
    * engine-internal); recall is asserted against brute force in
    * SimilaritySpec.
    */
  val qIvfAnn: Q = Q(
    "q_ivf_ann",
    None,
    (s, dir) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      Similarity.ivfTopK(
        e.select(col("vec_id"), col("embedding")), queries,
        k = 5, nCells = 8, nProbe = 3)
        .orderBy(col("q_id"), col("rank"))
    })

  /** Per-label centroids (mean-pooled embeddings), computed relationally:
    * posexplode to (label, dim, value), one hash aggregation over
    * (label, dim) — the distributed form of vector mean-pooling, no
    * vector fits-in-memory assumption, ~numLabels×64 output rows. Sums
    * are dimension-local so ordering noise is absorbed by rounding.
    */
  val qEmbedCentroids: Q = Q(
    "q_embed_centroids",
    Some("""SELECT label, CAST(t.dim AS BIGINT) AS dim,
                   round(avg(t.v), 5) AS centroid_v,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM (SELECT label,
                    unnest([{'dim': i, 'v': CAST(embedding[i] AS DOUBLE)}
                            FOR i IN range(1, len(embedding) + 1)],
                           recursive := true)
                  FROM embeddings) AS t(label, dim, v)
            GROUP BY label, t.dim
            ORDER BY label, dim"""),
    (s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          col("col").cast("double").as("v"))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("v")), 5).as("centroid_v"), count(lit(1)).as("n_vecs"))
        .orderBy(col("label"), col("dim")))

  override def queries: Seq[Q] = Seq(qEmbedNorms, qCosineTopk, qLshAnn, qIvfAnn, qEmbedCentroids)
}
