package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs register here; each entry is a Spark pipeline plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same tables.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.queries.Relational,
    graft.queries.Reshape,
    graft.queries.TextOps,
    graft.queries.Analytics,
    graft.queries.MediaQ,
    graft.queries.Dedup,
    graft.queries.SimilarityQ,
    graft.queries.TrainOps,
    graft.queries.Advanced,
    graft.queries.Extras,
    graft.queries.Corpus,
    graft.queries.PipelineQ,
    graft.queries.SkewQ,
    graft.queries.StreamQ)

  private lazy val allQueries: Seq[Q] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.qDslTopk.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
