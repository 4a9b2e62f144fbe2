package graft.nshm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Storage abstraction ≙ the reference's single SQLite file
  * (`/root/reference/nshmdb/nshmdb.py:104-123`). Two implementations:
  * in-memory DataFrames (tests / scratch) and a parquet directory per
  * table (the scale path — on a cluster these would be catalog tables,
  * `rupture`/`fault` partitioned by `fault_system`).
  */
trait NshmStore {
  def spark: SparkSession
  def table(name: String): DataFrame
  /** Append rows (any column order; cast to the table schema). */
  def append(name: String, rows: DataFrame): Unit

  protected def conform(name: String, rows: DataFrame): DataFrame = {
    val schema = Schemas.all(name)
    rows.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }
}

final class InMemoryNshmStore(val spark: SparkSession) extends NshmStore {
  private val tables = scala.collection.mutable.Map[String, DataFrame](
    Schemas.all.keys.map(n => n -> Schemas.empty(spark, n)).toSeq: _*)
  def table(name: String): DataFrame = tables(name)
  def append(name: String, rows: DataFrame): Unit =
    tables(name) = tables(name).unionByName(conform(name, rows))
}

/** One parquet directory per table under `dir` (create-if-not-exists ≙
  * `executescript(schema.sql)`, nshmdb.py:104-117).
  */
final class ParquetNshmStore(val spark: SparkSession, dir: String) extends NshmStore {
  def create(): Unit = Schemas.all.keys.foreach { n =>
    if (!new java.io.File(s"$dir/$n").exists())
      Schemas.empty(spark, n).write.mode(SaveMode.Overwrite).parquet(s"$dir/$n")
  }
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name")
  def append(name: String, rows: DataFrame): Unit =
    conform(name, rows).write.mode(SaveMode.Append).parquet(s"$dir/$name")
}
