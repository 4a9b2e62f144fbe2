package graft

import graft.nshm.{FaultSystem, Ingest}
import java.nio.file.{Files, Paths}

class GeoJsonSpec extends SparkSpec {

  private def writeGeoJson(): String = {
    val json =
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature",
        |   "properties": {"FaultID": 1, "ParentName": "Alpine Fault", "UpDepth": 0.0,
        |                  "LowDepth": 10.0, "DipDeg": 90.0, "Rake": 180.0, "DipDir": null},
        |   "geometry": {"type": "LineString",
        |                "coordinates": [[172.0, -42.0], [172.0, -42.0], [173.0, -42.5], [174.0, -43.0]]}},
        |  {"type": "Feature",
        |   "properties": {"FaultID": 2, "ParentName": "Kakapo", "UpDepth": 2.0,
        |                  "LowDepth": 12.0, "DipDeg": 45.0, "Rake": 90.0, "DipDir": 135.0},
        |   "geometry": {"type": "LineString",
        |                "coordinates": [[171.0, -44.0], [171.5, -44.2]]}}
        |]}""".stripMargin
    val p = Paths.get(s"/tmp/fault_sections_${System.nanoTime()}.geojson")
    Files.writeString(p, json)
    p.toString
  }

  test("parseFaultSections: GeoJSON → FaultInfo with planes (S6/F3-F5, api.py:244-277)") {
    val faults = Ingest.parseFaultSections(spark, writeGeoJson())
    assert(faults.map(_.name) === Seq("Alpine Fault", "Kakapo"))
    assert(faults.forall(_.faultSystem === FaultSystem.Crustal))

    val alpine = faults.head
    // repeated first point dropped (F4): 3 distinct points → 2 planes
    assert(alpine.fault.get.planes.length === 2)
    val p = alpine.fault.get.planes.head
    assert(p.topDepth === 0.0 && p.bottomDepth === 10000.0)
    // dip 90: bottom corners directly under top corners (F5 dip_dir → 0)
    assert(math.abs(p.corners(3)(0) - p.corners(0)(0)) < 1e-9)
    assert(math.abs(p.corners(3)(1) - p.corners(0)(1)) < 1e-9)
    // trace stored (lat, lon) from (lon, lat) input
    assert(p.corners(0)(0) === -42.0 && p.corners(0)(1) === 172.0)

    val kakapo = faults(1)
    assert(kakapo.fault.get.planes.length === 1)
    assert(kakapo.rake === 90.0)
    // declared DipDir honored; 45° dip offsets the bottom edge southeast
    val k = kakapo.fault.get.planes.head
    assert(k.corners(3)(0) < k.corners(0)(0)) // south → smaller latitude
    assert(k.corners(3)(1) > k.corners(0)(1)) // east → larger longitude
  }

  test("fault system inference from the catalogue marker names (api.py:178-198)") {
    assert(Ingest.inferFaultSystem(Ingest.HikurangiName) === FaultSystem.Hikurangi)
    assert(Ingest.inferFaultSystem(Ingest.PuysegurName) === FaultSystem.Puysegur)
    assert(Ingest.inferFaultSystem("Alpine Fault") === FaultSystem.Crustal)
  }

  test("registerViews exposes the tables to spark.sql (S2)") {
    import spark.implicits._
    val db = graft.nshm.NshmDb.inMemory(spark)
    db.store.append("parent_fault", Seq((1L, "Alpine Fault")).toDF("parent_id", "name"))
    db.store.append(
      "fault",
      Seq((1L, 3, 1L, 90.0, Option.empty[Int], 1L))
        .toDF("fault_id", "fault_system", "nshm_id", "rake", "tect_type", "parent_id"))
    db.registerViews("v_")
    val got = spark.sql(
      "SELECT p.name FROM v_fault f JOIN v_parent_fault p ON f.parent_id = p.parent_id")
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("Alpine Fault"))
  }
}
