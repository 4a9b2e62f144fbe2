package graft

import graft.nshm.Nztm
import org.scalatest.funsuite.AnyFunSuite

class NztmSpec extends AnyFunSuite {

  test("projection anchors: origin maps to false easting/northing") {
    val (n, e) = Nztm.wgsToNztm(0.0, 173.0)
    assert(math.abs(e - 1600000.0) < 1e-6)
    assert(math.abs(n - 10000000.0) < 1e-6)
  }

  test("points on the central meridian keep E = 1,600,000") {
    for (lat <- Seq(-34.0, -41.0, -47.0)) {
      val (_, e) = Nztm.wgsToNztm(lat, 173.0)
      assert(math.abs(e - 1600000.0) < 1e-6, s"lat=$lat e=$e")
    }
  }

  test("east of the central meridian has larger easting") {
    val (_, e1) = Nztm.wgsToNztm(-41.0, 172.0)
    val (_, e2) = Nztm.wgsToNztm(-41.0, 174.0)
    assert(e1 < 1600000.0 && e2 > 1600000.0)
  }

  test("round trip over the NZ bounding box is exact to ~1e-9 degrees") {
    for (lat <- Seq(-34.0, -38.5, -42.0, -45.5, -47.0); lon <- Seq(166.0, 170.0, 173.0, 176.0, 179.0)) {
      val (n, e) = Nztm.wgsToNztm(lat, lon)
      val (lat2, lon2) = Nztm.nztmToWgs(n, e)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
    }
  }

  test("NZ coordinates land in the plausible NZTM range") {
    val (n, e) = Nztm.wgsToNztm(-41.2889, 174.7772) // Wellington
    assert(e > 1700000 && e < 1800000, s"e=$e")
    assert(n > 5350000 && n < 5500000, s"n=$n")
  }
}
