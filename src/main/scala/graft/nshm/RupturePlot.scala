package graft.nshm

import java.nio.file.{Files, Path}

/** S10 — the rupture plot sink
  * (≙ `/root/reference/nshmdb/plotting/rupture.py:18-49`).
  *
  * The reference renders each fault plane of a rupture as a closed red
  * polygon on a PyGMT region figure. The raster step needs PyGMT's native
  * GMT stack, which this engine deliberately does not carry (SURVEY §2.1
  * scopes S10 as driver-side viz after `collect()`). Everything the
  * reference COMPUTES before handing off to the renderer, however, is
  * engine-computable and lives here:
  *
  *   - the padded region window (`rupture.py:31-36`: lon ±0.5, lat ±0.25
  *     around the stacked corner extent);
  *   - per-plane ring closure (`rupture.py:41-45`: the first corner is
  *     re-appended so the polygon closes);
  *   - the polygon features themselves, with the reference's styling
  *     (`pen="1p"`, `fill="red"`) carried as properties.
  *
  * The output is a GeoJSON FeatureCollection (RFC 7946) — the lingua
  * franca any map stack (QGIS, kepler.gl, PyGMT itself via
  * `fig.plot(data=...)`) renders without further computation, and the
  * exact format the reference's own fault-section inputs use, so
  * [[Ingest.parseFaultSectionsJson]]-style readers round-trip it. The
  * raster call is the one deliberate stub: [[plotRupture]] writes the
  * `.geojson` plot model next to the requested output path and stops
  * where the rendering library would start.
  */
object RupturePlot {

  /** Padded map window, reference order (lonMin, lonMax, latMin, latMax)
    * — `rupture.py:31-36` pads the stacked corner extent by 0.5° in lon
    * and 0.25° in lat.
    */
  final case class Region(lonMin: Double, lonMax: Double, latMin: Double, latMax: Double)

  def region(faults: Iterable[Fault]): Region = {
    val corners = faults.iterator.flatMap(_.corners).toVector
    require(corners.nonEmpty, "region of an empty rupture")
    // corners are [lat, lon, depth] (Model.scala storage convention);
    // the reference indexes [:, 1] = lon and [:, 0] = lat
    Region(
      corners.map(_(1)).min - 0.5, corners.map(_(1)).max + 0.5,
      corners.map(_(0)).min - 0.25, corners.map(_(0)).max + 0.25)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def num(d: Double): String = {
    // Bare NaN/Infinity are not JSON — a non-finite corner coordinate
    // or depth would make every downstream GeoJSON reader reject the
    // whole document. Geometry with non-finite values is a caller bug;
    // fail loud here rather than emit an unparseable file.
    require(java.lang.Double.isFinite(d), s"non-finite value in GeoJSON output: $d")
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
  }

  /** One closed GeoJSON Polygon per plane: corners TL,TR,BR,BL as
    * (lon, lat) positions with the first re-appended (ring closure ≙
    * `rupture.py:43-44`'s `+ [corners[0]]`), styling carried as
    * simplestyle properties.
    */
  private def planeFeature(faultName: String, planeIdx: Int, p: Plane): String = {
    val ring = (p.corners :+ p.corners.head)
      .map(c => s"[${num(c(1))},${num(c(0))}]").mkString("[", ",", "]")
    s"""{"type":"Feature","properties":{"fault":${jsonStr(faultName)},"plane":$planeIdx,"top_depth_m":${num(p.topDepth)},"bottom_depth_m":${num(p.bottomDepth)},"stroke-width":"1p","fill":"red"},"geometry":{"type":"Polygon","coordinates":[$ring]}}"""
  }

  /** The full plot model: title, padded region (as both a property and
    * the RFC 7946 `bbox` [w, s, e, n]), and every plane polygon.
    */
  def featureCollection(title: String, faults: Map[String, Fault]): String = {
    val r = region(faults.values)
    val feats = faults.toSeq.sortBy(_._1).flatMap { case (name, fault) =>
      fault.planes.zipWithIndex.map { case (p, i) => planeFeature(name, i, p) }
    }
    s"""{"type":"FeatureCollection","title":${jsonStr(title)},"bbox":[${num(r.lonMin)},${num(r.latMin)},${num(r.lonMax)},${num(r.latMax)}],"region":{"lon_min":${num(r.lonMin)},"lon_max":${num(r.lonMax)},"lat_min":${num(r.latMin)},"lat_max":${num(r.latMax)}},"features":${feats.mkString("[", ",", "]")}}"""
  }

  /** ≙ `plot_rupture(title, faults, output_filepath)`. Computes the plot
    * model and writes it as GeoJSON next to the requested output path
    * (`foo.png` → `foo.geojson`). The raster render itself is the
    * documented stub: this container carries no PyGMT/GMT, and SURVEY
    * §2.1 scopes the pixels out of the engine — feed the `.geojson` to
    * any GIS renderer to obtain the reference's figure.
    */
  def plotRupture(title: String, faults: Map[String, Fault], outputFilepath: Path): Path = {
    val name = outputFilepath.getFileName.toString
    val base = if (name.contains('.')) name.substring(0, name.lastIndexOf('.')) else name
    val parent = Option(outputFilepath.getParent)
    val target = parent.map(_.resolve(s"$base.geojson"))
      .getOrElse(java.nio.file.Paths.get(s"$base.geojson"))
    Files.writeString(target, featureCollection(title, faults))
    target
  }
}
