package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata tables
  * (see /root/repo/TESTDATA.md). One parquet file per table.
  *
  * At cluster scale these would be partitioned/bucketed catalog tables;
  * here the contract is a directory of parquet files, so loading stays a
  * plain `spark.read.parquet` and every downstream query relies on
  * Catalyst pushdown (filters + column pruning reach the scan).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
