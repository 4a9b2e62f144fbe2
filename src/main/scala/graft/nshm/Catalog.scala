package graft.nshm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-table layout for cluster scale (SURVEY §1.4): the fact-side
  * tables are bucketed on their join key so the hot joins
  * (fault_plane ⋈ rupture_faults ⋈ fault on fault_id) are co-located —
  * no Exchange on the bucketed sides — and `rupture`/`fault` are
  * partitioned by `fault_system`, replacing the reference's
  * `UNIQUE(fault_system, nshm_id)` lookup locality
  * (`/root/reference/nshmdb/schema/schema.sql:12,47`) with partition
  * pruning.
  */
object Catalog {

  /** (partition columns, bucket column) per table. */
  val layout: Map[String, (Seq[String], Option[String])] = Map(
    "parent_fault" -> (Seq.empty, None),
    "fault" -> (Seq("fault_system"), Some("fault_id")),
    "fault_plane" -> (Seq.empty, Some("fault_id")),
    "rupture" -> (Seq("fault_system"), None),
    "rupture_faults" -> (Seq.empty, Some("fault_id")),
    "magnitude_frequency_distribution" -> (Seq.empty, Some("fault_id")))

  def tableName(base: String, prefix: String = "graft_"): String = s"$prefix$base"

  /** Persist a store's tables as catalog tables with the scale layout. */
  def save(store: NshmStore, buckets: Int = 8, prefix: String = "graft_"): Unit =
    Schemas.all.keys.foreach { name =>
      val (partCols, bucketCol) = layout(name)
      var w = store.table(name).write
        .mode(SaveMode.Overwrite)
        .format("parquet")
      if (partCols.nonEmpty) w = w.partitionBy(partCols: _*)
      bucketCol.foreach(c => w = w.bucketBy(buckets, c).sortBy(c))
      w.saveAsTable(tableName(name, prefix))
    }

  /** A store view over the catalog tables (joins on the bucketed key are
    * then shuffle-free on those sides; appends go through the catalog).
    */
  def open(spark: SparkSession, prefix: String = "graft_"): NshmStore =
    new CatalogNshmStore(spark, prefix)
}

final class CatalogNshmStore(val spark: SparkSession, prefix: String) extends NshmStore {
  def table(name: String): DataFrame = spark.table(Catalog.tableName(name, prefix))
  def append(name: String, rows: DataFrame): Unit =
    conform(name, rows).write.mode(SaveMode.Append)
      .saveAsTable(Catalog.tableName(name, prefix))
  // merge() materializes df first, so overwriting the source table is safe;
  // insertInto(overwrite) keeps the table's bucketing metadata intact
  protected def replace(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).insertInto(Catalog.tableName(name, prefix))
}
