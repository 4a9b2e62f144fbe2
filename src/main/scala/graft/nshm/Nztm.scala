package graft.nshm

/** NZTM2000 (New Zealand Transverse Mercator) projection, implemented from
  * the public LINZ definition: GRS80 ellipsoid, central meridian 173°E,
  * origin latitude 0, scale factor 0.9996, false easting 1,600,000 m,
  * false northing 10,000,000 m — using the Krüger series (4th order in the
  * third flattening), accurate to well under a millimetre over New Zealand.
  *
  * ≙ the external `qcore.coordinates.wgs_depth_to_nztm` /
  * `nztm_to_wgs_depth` the reference relies on
  * (`/root/reference/nshmdb/nshmdb.py:414,564`); reimplemented from the
  * public map-projection formulas since no such dependency exists here.
  */
object Nztm {
  private val a = 6378137.0
  private val f = 1.0 / 298.257222101
  private val k0 = 0.9996
  private val lon0 = math.toRadians(173.0)
  private val falseEasting = 1600000.0
  private val falseNorthing = 10000000.0

  private val n = f / (2.0 - f)
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val bigA = a / (1 + n) * (1 + n2 / 4 + n4 / 64)
  private val e = math.sqrt(f * (2 - f))

  private val alpha = Array(
    n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180,
    13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440,
    61 * n3 / 240 - 103 * n4 / 140,
    49561 * n4 / 161280)
  private val beta = Array(
    n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360,
    n2 / 48 + n3 / 15 - 437 * n4 / 1440,
    17 * n3 / 480 - 37 * n4 / 840,
    4397 * n4 / 161280)

  /** (lat, lon) degrees → (northing, easting) metres. */
  def wgsToNztm(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val dLon = math.toRadians(lonDeg) - lon0
    val sinPhi = math.sin(phi)
    val t = math.sinh(atanh(sinPhi) - e * atanh(e * sinPhi))
    val xiP = math.atan2(t, math.cos(dLon))
    val etaP = atanh(math.sin(dLon) / math.sqrt(1 + t * t))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 4) {
      xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    (falseNorthing + k0 * bigA * xi, falseEasting + k0 * bigA * eta)
  }

  /** (northing, easting) metres → (lat, lon) degrees. */
  def nztmToWgs(northing: Double, easting: Double): (Double, Double) = {
    val xi = (northing - falseNorthing) / (k0 * bigA)
    val eta = (easting - falseEasting) / (k0 * bigA)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 4) {
      xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val tau = math.sin(xiP) / math.sqrt(
      math.sinh(etaP) * math.sinh(etaP) + math.cos(xiP) * math.cos(xiP))
    // invert tau = sinh(asinh(tan phi) - e*atanh(e*sin phi)) by fixed point
    var phi = math.atan(tau)
    var k = 0
    while (k < 8) {
      phi = math.atan(math.sinh(asinh(tau) + e * atanh(e * math.sin(phi))))
      k += 1
    }
    val lon = lon0 + math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(phi), math.toDegrees(lon))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))
}
