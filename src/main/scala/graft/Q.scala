package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark pipeline plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between `run` and `oracle`.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

trait QueryPack {
  def queries: Seq[Q]
}
