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

  /** Load and hash-repartition on `keyCol` to the session default
    * parallelism. Use before per-row-heavy pipelines (shingling, hashing,
    * vector math): the testdata parquet is a single row-group per table,
    * so a bare scan is ONE partition and compute-bound stages would
    * otherwise serialize on 1 core regardless of cluster size. At 100 TB
    * the same principle holds — compute parallelism must come from an
    * explicit distribution key, not the accident of file layout.
    */
  def loadDistributed(spark: SparkSession, dir: String, name: String, keyCol: String): DataFrame = {
    val df = load(spark, dir, name)
    df.repartition(spark.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col(keyCol))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark rejects
    * outright (PARQUET_TYPE_ILLEGAL). Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session
    * construction by every entry point (Bench/Verify/PlanAudit/SparkSpec)
    * — load paths never mutate session conf. Converts with integer
    * division — `ts / 1000` through double would lose precision at
    * 1.7e18 ns (> 2^53).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
