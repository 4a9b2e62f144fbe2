package graft.nshm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed re-expression of the reference's single-process ETL
  * (`/root/reference/nshmdb/api.py`). The network fetch (GraphQL/zip,
  * api.py:41-176) stays a driver-side shim out of engine scope; everything
  * from raw file content onward is a DataFrame transform.
  *
  * Scale notes: the reference streams one branch at a time purely to bound
  * memory (comments at api.py:498-505); the union-all + groupBy-sum here
  * gets the same bound from Catalyst partial aggregation and distributes.
  */
object Ingest {

  /** U2 (api.py:314-320): wide MFD table (one column per magnitude bin) →
    * long (nshm_id, magnitude, rate), keeping positive rates. The
    * magnitude arrives as a *column name* string → cast to double.
    */
  def meltMfds(wide: DataFrame, faultSystem: Int, idCol: String = "Section Index"): DataFrame = {
    val magCols = wide.columns.filterNot(_ == idCol)
    wide
      .withColumnRenamed(idCol, "nshm_id")
      .unpivot(
        Array(col("nshm_id")),
        magCols.map(c => col(s"`$c`")),
        "magnitude",
        "rate")
      .withColumn("magnitude", col("magnitude").cast("double"))
      .filter(col("rate") > 0)
      .withColumn("fault_system", lit(faultSystem))
  }

  /** S5/U3 (api.py:362-398): ragged indices CSV — rows of
    * `rupture_id, n, f1..fn` — to one (rupture_id, fault_id) row per pair.
    * The reference's np.repeat of ids by counts ≡ `explode` of the sliced
    * per-row fault-id array. Input: a single-column DataFrame of raw lines
    * (e.g. `spark.read.text`); the header row is dropped by the numeric
    * guard.
    */
  def parseRaggedIndices(lines: DataFrame, faultSystem: Int): DataFrame = {
    val parts = split(col(lines.columns.head), ",")
    lines
      .select(parts.as("parts"))
      .filter(col("parts").getItem(0).rlike("^[0-9]+$"))
      .select(
        col("parts").getItem(0).cast("long").as("rupture_id"),
        slice(col("parts"), lit(3), col("parts").getItem(1).cast("int")).as("fault_ids"))
      .select(col("rupture_id"), explode(col("fault_ids")).as("fault_id"))
      .select(col("rupture_id"), col("fault_id").cast("long").as("fault_id"))
      .withColumn("fault_system", lit(faultSystem))
  }

  /** J10 (api.py:336-360): rupture properties ⋈ annual rates on the
    * rupture index, renamed to storage names.
    */
  def extractRuptures(
      properties: DataFrame,
      rates: DataFrame,
      faultSystem: Int,
      indexCol: String = "Rupture Index"): DataFrame =
    properties
      .join(rates, Seq(indexCol), "left")
      .select(
        col(s"`$indexCol`").cast("long").as("nshm_id"),
        col("`Magnitude`").cast("double").as("magnitude"),
        col("`Area (m^2)`").cast("double").as("area"),
        col("`Length (m)`").cast("double").as("len"),
        col("`Annual Rate`").cast("double").as("rate"))
      .withColumn("fault_system", lit(faultSystem))

  /** A8 (api.py:492-515): weighted logic-tree branch merge. The reference
    * accumulates `rate += wᵢ·rateᵢ` sequentially (memory-streaming
    * artifact); semantically it is union-all of weight-tagged branches →
    * groupBy keys → Σ(w·rate), which distributes with map-side partial
    * aggregation.
    */
  def mergeBranchRates(
      branches: Seq[(Double, DataFrame)],
      keyCols: Seq[String],
      rateCol: String = "rate"): DataFrame = {
    require(branches.nonEmpty, "No branches to merge.")
    branches
      .map { case (w, df) =>
        df.select(keyCols.map(col) :+ (col(rateCol) * lit(w)).as("__wrate"): _*)
      }
      .reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__wrate")).as(rateCol))
  }

  /** A8 full-row variant: branch-invariant columns (magnitude/area/len…)
    * come from the first branch (≙ api.py:481-485 parse-once comment),
    * merged rates from all branches.
    */
  def mergeBranches(
      branches: Seq[(Double, DataFrame)],
      keyCols: Seq[String],
      rateCol: String = "rate"): DataFrame = {
    val merged = mergeBranchRates(branches, keyCols, rateCol)
    val first = branches.head._2.drop(rateCol)
    first.join(merged, keyCols)
  }

  /** U1 (api.py:546-562): vertical concat of per-system solutions. */
  def stackSystems(solutions: Seq[DataFrame]): DataFrame = {
    require(solutions.nonEmpty, "No solutions to stack.")
    solutions.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** U5 (api.py:96-109): first-seen dedup on a natural key. */
  def dedupFirstSeen(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /** One logic-tree branch solution parsed from its archive members
    * (≙ NSHMSolution, api.py:432-452).
    */
  final case class Solution(
      faults: Seq[FaultInfo],
      ruptureProperties: DataFrame,
      ruptureJoinTable: DataFrame,
      mfds: Option[DataFrame],
      faultSystem: Int)

  /** Zip-member names inside a branch solution archive
    * (≙ api.py:31-35).
    */
  val FaultInformationPath = "ruptures/fault_sections.geojson"
  val RuptureFaultJoinPath = "ruptures/indices.csv"
  val RuptureRatesPath = "solution/rates.csv"
  val RupturePropertiesPath = "ruptures/properties.csv"
  val MfdsPath = "ruptures/sub_seismo_on_fault_mfds.csv"

  private def readZipMembers(path: String, wanted: Set[String]): Map[String, String] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      zf.entries().asScala
        .filter(e => wanted.contains(e.getName))
        .map { e =>
          val bytes = zf.getInputStream(e).readAllBytes()
          e.getName -> new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        }
        .toMap
    } finally zf.close()
  }

  private def csvDf(spark: SparkSession, content: String): DataFrame = {
    import spark.implicits._
    spark.read.option("header", true).option("inferSchema", true)
      .csv(spark.createDataset(content.linesIterator.toSeq))
  }

  /** Parse one branch zip: GeoJSON faults (S6/F3-F5), ragged join table
    * (S5/U3), properties ⋈ rates (S4/J10), melted MFDs (U2/P6)
    * (≙ the first-branch parse, api.py:472-485). Hikurangi/Puysegur
    * archives carry no MFD member → None, as in the reference.
    */
  def loadSolutionZip(spark: SparkSession, path: String): Solution = {
    import spark.implicits._
    val members = readZipMembers(
      path,
      Set(FaultInformationPath, RuptureFaultJoinPath, RuptureRatesPath,
        RupturePropertiesPath, MfdsPath))
    val geo = members(FaultInformationPath)
    val faults = parseFaultSectionsJson(spark, geo)
    val faultSystem =
      if (faults.isEmpty) FaultSystem.Crustal else faults.head.faultSystem
    val joinTable = parseRaggedIndices(
      spark.createDataset(members(RuptureFaultJoinPath).linesIterator.toSeq).toDF("value"),
      faultSystem)
    val props = extractRuptures(
      csvDf(spark, members(RupturePropertiesPath)),
      csvDf(spark, members(RuptureRatesPath)),
      faultSystem)
    val mfds = members.get(MfdsPath).map(m => meltMfds(csvDf(spark, m), faultSystem))
    Solution(faults, props, joinTable, mfds, faultSystem)
  }

  /** Weighted merge of branch archives of ONE fault system
    * (≙ _merge_branches, api.py:455-529): faults and the join table are
    * branch-invariant and parsed once from the first branch; rupture
    * rates and MFD rates are Σ(wᵢ·rateᵢ) across branches via the
    * distributed union-all merge.
    */
  def mergeSolutionZips(spark: SparkSession, branches: Seq[(Double, String)]): Solution = {
    require(branches.nonEmpty, "No branches to merge.")
    val parsed = branches.map { case (w, p) => (w, loadSolutionZip(spark, p)) }
    val (firstW @ _, first) = parsed.head
    val mergedProps = mergeBranches(
      parsed.map { case (w, s) => (w, s.ruptureProperties) },
      keyCols = Seq("nshm_id", "fault_system"))
    val mergedMfds = first.mfds.map { _ =>
      mergeBranchRates(
        parsed.map { case (w, s) =>
          (w, s.mfds.getOrElse(throw new IllegalArgumentException(
            "Expected MFDs for the solution but got None")))
        },
        keyCols = Seq("nshm_id", "magnitude", "fault_system"))
    }
    first.copy(ruptureProperties = mergedProps, mfds = mergedMfds)
  }

  /** Stack per-system solutions and load them into a database
    * (≙ download_composite_solution minus the network fetch,
    * api.py:595-622 + nshm_db_generator.py:81-94).
    */
  def loadComposite(
      db: NshmDb,
      systems: Seq[Solution],
      skipFaults: Boolean = false,
      skipRuptures: Boolean = false,
      skipMfds: Boolean = false): Unit = {
    require(systems.nonEmpty, "No solutions to stack.")
    systems.foreach { s =>
      if (!skipFaults) db.insertManyFaults(s.faults)
      if (!skipRuptures)
        db.insertManyRuptures(
          s.ruptureProperties.select("nshm_id", "magnitude", "area", "len", "rate", "fault_system"),
          s.ruptureJoinTable.select(
            col("rupture_id"), col("fault_id"), col("fault_system")))
      if (!skipMfds)
        s.mfds.foreach(m => db.insertMfds(m.select("nshm_id", "fault_system", "magnitude", "rate")))
    }
  }

  /** Fault-system inference from the parent name of the first feature
    * (≙ infer_fault_system, api.py:178-198; the marker names are data
    * constants from the public NSHM 2022 fault-section catalogue).
    */
  val HikurangiName =
    "Hikurangi, Kermadec to Louisville ridge, 30km - with slip deficit smoothed near East Cape and locked near trench."
  val PuysegurName = "Puysegur, 15km, 50% coupling, corrected dip direction"

  def inferFaultSystem(firstParentName: String): Int = firstParentName match {
    case HikurangiName => FaultSystem.Hikurangi
    case PuysegurName => FaultSystem.Puysegur
    case _ => FaultSystem.Crustal
  }

  /** S6 (api.py:244-277,475-476): fault_sections.geojson
    * FeatureCollection → FaultInfo list with plane geometry. Parsed with
    * `spark.read.json(multiLine)` + explode (distributed); the result is
    * collected at the API boundary exactly like the reference returns a
    * Python list. Coordinates arrive (lon, lat); dip direction falls back
    * to the trace azimuth + 90 when `DipDir` is absent (F3), consecutive
    * duplicate trace points are dropped (F4), and planes are constructed
    * per trace segment (F5) with dip_dir forced to 0 at dip == 90.
    */
  def parseFaultSections(spark: SparkSession, path: String): Seq[FaultInfo] =
    parseFeatureFrame(spark.read.option("multiLine", true).json(path))

  /** Same, from an in-memory GeoJSON string (zip-member ingestion). */
  def parseFaultSectionsJson(spark: SparkSession, json: String): Seq[FaultInfo] = {
    import spark.implicits._
    parseFeatureFrame(spark.read.json(spark.createDataset(Seq(json))))
  }

  private def parseFeatureFrame(raw: DataFrame): Seq[FaultInfo] = {
    val spark = raw.sparkSession
    import spark.implicits._
    // F3-F5 are pure per-row trig — they run distributed inside the map;
    // only the finished corner arrays cross the .collect() API boundary
    // (the reference returns a Python list, api.py:244-277).
    val built = raw
      .select(explode(col("features")).as("f"))
      .select(
        col("f.properties.FaultID").cast("long").as("fault_id"),
        col("f.properties.ParentName").as("name"),
        col("f.properties.UpDepth").cast("double").as("top_km"),
        col("f.properties.LowDepth").cast("double").as("bottom_km"),
        col("f.properties.DipDir").cast("double").as("dip_dir"),
        col("f.properties.DipDeg").cast("double").as("dip"),
        col("f.properties.Rake").cast("double").as("rake"),
        col("f.geometry.coordinates").as("coords"))
      .map { r =>
        val lonLat = r.getSeq[scala.collection.Seq[Double]](7).map(p => (p(0), p(1)))
        val trace = removeRepeatedPoints(lonLat).map { case (lon, lat) => (lat, lon) }
        val dipDir =
          if (!r.isNullAt(4)) r.getDouble(4)
          else inferDipDirection(lonLat(0)._1, lonLat(0)._2, lonLat(1)._1, lonLat(1)._2)
        val planes = planesFromTrace(trace, r.getDouble(2), r.getDouble(3), r.getDouble(5), dipDir)
        (r.getLong(0), r.getString(1), r.getDouble(6), planes.map(_.corners.map(_.toSeq).toSeq))
      }
      .collect()
    if (built.isEmpty) return Seq.empty
    val faultSystem = inferFaultSystem(built.head._2)
    built.toSeq.map { case (id, name, rake, corners) =>
      FaultInfo(
        faultSystem = faultSystem,
        faultNshmId = id,
        name = name,
        rake = rake,
        tectType = None,
        fault = Some(Fault(corners.map(c => Plane(c.map(_.toVector).toVector)).toVector)))
    }
  }

  /** F3 (api.py:201-220): forward azimuth start→end + 90°, in [0, 360).
    * Spherical great-circle azimuth (the reference uses an ellipsoidal
    * geodesic; difference is negligible at trace-segment scale).
    * Inputs/outputs in degrees; points are (lon, lat) like the reference.
    */
  def inferDipDirection(startLon: Double, startLat: Double, endLon: Double, endLat: Double): Double = {
    val phi1 = math.toRadians(startLat)
    val phi2 = math.toRadians(endLat)
    val dLon = math.toRadians(endLon - startLon)
    val azimuth = math.toDegrees(math.atan2(
      math.sin(dLon) * math.cos(phi2),
      math.cos(phi1) * math.sin(phi2) - math.sin(phi1) * math.cos(phi2) * math.cos(dLon)))
    ((azimuth + 90) % 360 + 360) % 360
  }

  /** F4 (api.py:250-263): drop consecutive duplicate trace points. */
  def removeRepeatedPoints(trace: Seq[(Double, Double)]): Seq[(Double, Double)] =
    trace.foldLeft(Vector.empty[(Double, Double)]) { (acc, p) =>
      if (acc.nonEmpty && acc.last == p) acc else acc :+ p
    }

  /** F5 (api.py:268-277): build depth-aligned planes from consecutive
    * WGS trace points. Top edge follows the trace at `topKm`; the bottom
    * edge is offset horizontally by (bottom−top)/tan(dip) km in the dip
    * direction (dip direction forced to 0 when dip == 90, ≙ api.py:276).
    * Returns WGS-corner planes (storage space).
    */
  def planesFromTrace(
      trace: Seq[(Double, Double)], // (lat, lon)
      topKm: Double,
      bottomKm: Double,
      dipDeg: Double,
      dipDirDeg: Double): Vector[Plane] = {
    val effDipDir = if (dipDeg == 90.0) 0.0 else dipDirDeg
    val widthKm =
      if (dipDeg == 90.0) 0.0 else (bottomKm - topKm) / math.tan(math.toRadians(dipDeg))
    val dirRad = math.toRadians(effDipDir)
    // offset in metres: north component cos(dir), east component sin(dir)
    val dN = widthKm * 1000.0 * math.cos(dirRad)
    val dE = widthKm * 1000.0 * math.sin(dirRad)
    trace.sliding(2).collect { case Seq((lat1, lon1), (lat2, lon2)) =>
      val (n1, e1) = Nztm.wgsToNztm(lat1, lon1)
      val (n2, e2) = Nztm.wgsToNztm(lat2, lon2)
      val (bl1Lat, bl1Lon) = Nztm.nztmToWgs(n1 + dN, e1 + dE)
      val (bl2Lat, bl2Lon) = Nztm.nztmToWgs(n2 + dN, e2 + dE)
      Plane(Vector(
        Vector(lat1, lon1, topKm * 1000),
        Vector(lat2, lon2, topKm * 1000),
        Vector(bl2Lat, bl2Lon, bottomKm * 1000),
        Vector(bl1Lat, bl1Lon, bottomKm * 1000)))
    }.toVector
  }
}
