package graft.nshm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Explicit StructTypes for the six relations, mirroring
  * `/root/reference/nshmdb/schema/schema.sql:1-66` (INTEGER→LongType for
  * ids / IntegerType for enums, REAL→DoubleType, TEXT→StringType;
  * nullability mirrored: rupture.{area,magnitude,len,rate} and
  * fault.tect_type are nullable).
  */
object Schemas {

  val parentFault: StructType = StructType(Seq(
    StructField("parent_id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  val fault: StructType = StructType(Seq(
    StructField("fault_id", LongType, nullable = false),
    StructField("fault_system", IntegerType, nullable = true),
    StructField("nshm_id", LongType, nullable = true),
    StructField("rake", DoubleType, nullable = true),
    StructField("tect_type", IntegerType, nullable = true),
    StructField("parent_id", LongType, nullable = true)))

  val faultPlane: StructType = StructType(Seq(
    StructField("plane_id", LongType, nullable = false),
    StructField("top_left_lat", DoubleType, nullable = true),
    StructField("top_left_lon", DoubleType, nullable = true),
    StructField("top_right_lat", DoubleType, nullable = true),
    StructField("top_right_lon", DoubleType, nullable = true),
    StructField("bottom_right_lat", DoubleType, nullable = true),
    StructField("bottom_right_lon", DoubleType, nullable = true),
    StructField("bottom_left_lat", DoubleType, nullable = true),
    StructField("bottom_left_lon", DoubleType, nullable = true),
    StructField("top_depth", DoubleType, nullable = true),
    StructField("bottom_depth", DoubleType, nullable = true),
    StructField("fault_id", LongType, nullable = true)))

  val rupture: StructType = StructType(Seq(
    StructField("rupture_id", LongType, nullable = false),
    StructField("fault_system", IntegerType, nullable = true),
    StructField("nshm_id", LongType, nullable = true),
    StructField("area", DoubleType, nullable = true),
    StructField("magnitude", DoubleType, nullable = true),
    StructField("len", DoubleType, nullable = true),
    StructField("rate", DoubleType, nullable = true)))

  val ruptureFaults: StructType = StructType(Seq(
    StructField("rupture_fault_id", LongType, nullable = false),
    StructField("rupture_id", LongType, nullable = true),
    StructField("fault_id", LongType, nullable = true)))

  val mfd: StructType = StructType(Seq(
    StructField("entry_id", LongType, nullable = false),
    StructField("fault_id", LongType, nullable = true),
    StructField("magnitude", DoubleType, nullable = true),
    StructField("rate", DoubleType, nullable = true)))

  val all: Map[String, StructType] = Map(
    "parent_fault" -> parentFault,
    "fault" -> fault,
    "fault_plane" -> faultPlane,
    "rupture" -> rupture,
    "rupture_faults" -> ruptureFaults,
    "magnitude_frequency_distribution" -> mfd)

  def empty(spark: SparkSession, name: String): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[Row](), all(name))
}
