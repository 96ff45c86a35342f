package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Canonical GeodSolve test vectors (reference src/tests/geodtest.c:43-122,
  * originally from GeographicLib's published test set). Columns:
  * lat1 lon1 azi1 lat2 lon2 azi2 s12 (unused: a12 m12 M12 M21 S12). */
class GeodesicSpec extends AnyFunSuite {
  val cases: Seq[Array[Double]] = Seq(
    Array(35.60777, -139.44815, 111.098748429560326,
      -11.17491, -69.95921, 129.289270889708762, 8935244.5604818305),
    Array(55.52454, 106.05087, 22.020059880982801,
      77.03196, 197.18234, 109.112041110671519, 4105086.1713924406),
    Array(-21.97856, 142.59065, -32.44456876433189,
      41.84138, 98.56635, -41.84359951440466, 8394328.894657671),
    Array(-66.99028, 112.2363, 173.73491240878403,
      -12.70631, 285.90344, 2.512956620913668, 11150344.2312080241),
    Array(-17.42761, 173.34268, -159.033557661192928,
      -15.84784, 5.93557, -20.787484651536988, 16076603.1631180673),
    Array(32.84994, 48.28919, 150.492927788121982,
      -56.28556, 202.29132, 48.113449399816759, 16727068.9438164461),
    Array(6.96833, 52.74123, 92.581585386317712,
      -7.39675, 206.17291, 90.721692165923907, 17102477.2496958388),
    Array(-50.56724, -16.30485, -105.439679907590164,
      -33.56571, -94.97412, -47.348547835650331, 6455670.5118668696),
    Array(-58.93002, -8.90775, 140.965397902500679,
      -8.91104, 133.13503, 19.255429433416599, 11756066.0219864627),
    Array(-68.82867, -74.28391, 93.774347763114881,
      -50.63005, -8.36685, 34.65564085411343, 3956936.926063544),
    Array(-10.62672, -32.0898, -86.426713286747751,
      5.883, -134.31681, -80.473780971034875, 11470869.3864563009),
    Array(-21.76221, 166.90563, 29.319421206936428,
      48.72884, 213.97627, 43.508671946410168, 9098627.3986554915)
  )

  val g = Geodesic.WGS84

  test("inverse matches GeodSolve to sub-mm / 1e-11 deg azimuth") {
    for (c <- cases) {
      val (s12, azi1, azi2) = g.inverse(c(0), c(1), c(3), c(4))
      assert(math.abs(s12 - c(6)) < 1e-6, s"s12 for ${c.mkString(",")}")
      assert(math.abs(azi1 - c(2)) < 1e-11, s"azi1: got $azi1 want ${c(2)}")
      assert(math.abs(azi2 - c(5)) < 1e-11, s"azi2: got $azi2 want ${c(5)}")
    }
  }

  test("direct matches GeodSolve endpoints") {
    for (c <- cases) {
      val (lat2, lon2, azi2) = g.direct(c(0), c(1), c(2), c(6))
      assert(math.abs(lat2 - c(3)) < 1e-11, s"lat2: got $lat2 want ${c(3)}")
      val dlon = Geodesic.angDiff(lon2, Geodesic.angNormalize(c(4)))._1
      assert(math.abs(dlon) < 1e-11, s"lon2: got $lon2 want ${c(4)}")
      assert(math.abs(azi2 - c(5)) < 1e-11, s"azi2: got $azi2 want ${c(5)}")
    }
  }

  test("tiny separations are metrically linear (gie tolerance metric regime)") {
    // 1e-9 deg of latitude ~ 0.11 mm on WGS84
    val d = g.distance(55, 12, 55 + 1e-9, 12)
    assert(d > 1.0e-4 && d < 1.3e-4, s"d=$d")
    assert(g.distance(55, 12, 55, 12) == 0.0)
  }

  test("near-antipodal converges") {
    val (s12, _, _) = g.inverse(0.0, 0.0, 0.5, 179.5)
    assert(s12 > 19900000.0 && s12 < 20010000.0, s"s12=$s12")
  }

  test("equatorial and meridional special cases") {
    val (se, a1e, _) = g.inverse(0, 0, 0, 10)
    assert(math.abs(a1e - 90) < 1e-12)
    assert(math.abs(se - 1113194.90793) < 1e-4) // 10 deg of equator on WGS84
    val (sm, a1m, _) = g.inverse(0, 0, 10, 0)
    assert(math.abs(a1m) < 1e-12)
    assert(math.abs(sm - 1105854.83323437) < 1e-4) // 10 deg of meridian arc
  }

  // ---- planimeter: published GeographicLib/geodtest values ----
  // (reference src/tests/geodtest.c Planimeter0/5/12/13/15)

  private def plan(pts: Seq[(Double, Double)]): (Double, Double) =
    PolygonArea.compute(Geodesic.WGS84, pts)

  test("planimeter: pole-encircling polygons (Planimeter0)") {
    val (pA, aA) = plan(Seq((89, 0.0), (89, 90.0), (89, 180.0), (89, 270.0)))
    assert(math.abs(pA - 631819.8745) < 1e-4, s"perimeter $pA")
    assert(math.abs(aA - 24952305678.0) < 1, s"area $aA")
    val (pB, aB) = plan(Seq((-89, 0.0), (-89, 90.0), (-89, 180.0), (-89, 270.0)))
    assert(math.abs(pB - 631819.8745) < 1e-4)
    assert(math.abs(aB + 24952305678.0) < 1, s"area $aB")
    val (pC, aC) = plan(Seq((0, -1.0), (-1, 0.0), (0, 1.0), (1, 0.0)))
    assert(math.abs(pC - 627598.2731) < 1e-4)
    assert(math.abs(aC - 24619419146.0) < 1, s"area $aC")
    val (pD, aD) = plan(Seq((90, 0.0), (0, 0.0), (0, 90.0)))
    assert(math.abs(pD - 30022685) < 1)
    assert(math.abs(aD - 63758202715511.0) < 1, s"area $aD")
  }

  test("planimeter: pole crossing (Planimeter5)") {
    val (p, a) = plan(Seq((89, 0.1), (89, 90.1), (89, -179.9)))
    assert(math.abs(p - 539297) < 1)
    assert(math.abs(a - 12476152838.5) < 1, s"area $a")
  }

  test("planimeter: lon rounding at the arctic circle (Planimeter12)") {
    val (p, a) = plan(Seq((66.562222222, 0.0), (66.562222222, 180.0), (66.562222222, 360.0)))
    assert(math.abs(p - 10465729) < 1)
    assert(math.abs(a) < 1, s"area $a")
  }

  test("planimeter: encircling the pole twice (Planimeter13)") {
    val (p, a) = plan(Seq((89, -360.0), (89, -240.0), (89, -120.0), (89, 0.0), (89, 120.0), (89, 240.0)))
    assert(math.abs(p - 1160741) < 1)
    assert(math.abs(a - 32415230256.0) < 1, s"area $a")
  }

  test("planimeter: small mid-lat triangle (Planimeter15)") {
    val (_, a) = plan(Seq((2, 1.0), (1, 2.0), (3, 3.0)))
    assert(math.abs(a - 18454562325.45119) < 0.5, s"area $a")
  }

  test("planimeter: degenerate inputs") {
    assert(plan(Seq()) == (0.0, 0.0))
    assert(plan(Seq((1, 1.0))) == (0.0, 0.0))
  }
}
