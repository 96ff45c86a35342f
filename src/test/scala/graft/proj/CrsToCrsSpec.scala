package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord

/** Mini crs-to-crs planner: pair resolution, axis flags, kinematic datum
  * hop direction. (The epsg_no_grid gie corpus is the hard gate; this locks
  * the planner surface itself.) */
class CrsToCrsSpec extends AnyFunSuite {

  test("unknown codes and unsupported hops resolve to None") {
    assert(CrsToCrs.pipeline("EPSG:99999", "EPSG:4978").isEmpty)
    assert(CrsToCrs.pipeline("EPSG:4258", "nonsense").isEmpty)
    // no published hop registered between KKJ and WGS84 here
    assert(CrsToCrs.pipeline("EPSG:4123", "EPSG:4978").isEmpty)
    // projected source is out of the supported shape
    assert(CrsToCrs.pipeline("EPSG:25832", "EPSG:4258").isEmpty)
  }

  test("lat-lon / northing-easting destination flags") {
    assert(CrsToCrs.pipeline("EPSG:4979", "EPSG:4978").exists(!_._2)) // geocentric
    assert(CrsToCrs.pipeline("EPSG:7843", "EPSG:7912").exists(_._2)) // geographic
    assert(CrsToCrs.pipeline("EPSG:4123", "EPSG:2393").exists(_._2)) // YKJ N,E
    assert(CrsToCrs.pipeline("EPSG:4258", "EPSG:25832").exists(!_._2)) // UTM E,N
  }

  private def gisTrans(src: String, dst: String, lon: Double, lat: Double): (Double, Double) = {
    val pj = Proj.create(CrsToCrs.pipelineGis(src, dst).get)
    val c = new Coord
    c.set(lon, lat, 0.0, Double.PositiveInfinity)
    Dispatch.trans(pj, forward = true, c)
    (c.x, c.y)
  }

  test("generic GIS planner: Lambert-93 matches the published IGN value") {
    // Paris (2.3522 E, 48.8566 N) in RGF93 / Lambert-93 — the well-known
    // reference conversion is (652469.02, 6862035.26)
    val (x, y) = gisTrans("EPSG:4326", "EPSG:2154", 2.3522, 48.8566)
    assert(math.abs(x - 652469.02) < 0.5, s"x=$x")
    assert(math.abs(y - 6862035.26) < 0.5, s"y=$y")
  }

  test("generic GIS planner: UTM central meridian hits the false easting exactly") {
    val (x, _) = gisTrans("EPSG:4326", "EPSG:25832", 9.0, 52.0)
    assert(math.abs(x - 500000.0) < 1e-6, s"x=$x")
  }

  test("generic GIS planner: BNG applies the 7-parameter OSGB36 datum hop") {
    // with the towgs84 hop the easting shifts ~100 m vs an ellipsoid-only
    // projection of the same lonlat; lock the value to the engine's own
    // independently-oracled figure (driver geo_epsg leg, DuckDB-verified)
    val (e, n) = gisTrans("EPSG:4326", "EPSG:27700", -0.1276, 51.5074)
    assert(math.abs(e - 530042.626) < 0.01, s"e=$e")
    assert(math.abs(n - 180380.449) < 0.01, s"n=$n")
    // and the pair round-trips through the reverse plan
    val back = Proj.create(CrsToCrs.pipelineGis("EPSG:27700", "EPSG:4326").get)
    val c = new Coord
    c.set(e, n, 0.0, Double.PositiveInfinity)
    Dispatch.trans(back, forward = true, c)
    // ~1e-8 deg residual: the 2D round trip re-enters with h=0 while the
    // datum hop had placed the point ~49 m off the airy ellipsoid
    assert(math.abs(c.x - (-0.1276)) < 1e-7 && math.abs(c.y - 51.5074) < 1e-7)
  }

  test("generic GIS planner: unknown codes or prime-meridian CRSs yield None") {
    assert(CrsToCrs.pipelineGis("EPSG:99999", "EPSG:4326").isEmpty)
    // EPSG:4807 (NTF Paris) carries pm=paris in the init table
    assert(CrsToCrs.pipelineGis("EPSG:4326", "EPSG:4807").isEmpty)
  }

  test("GDA2020 -> ITRF2014 round-trips through the inverse pair") {
    val fwd = Proj.create(CrsToCrs.pipeline("EPSG:7843", "EPSG:7912").get._1)
    val c = new Coord
    c.set(-33.8623, 151.2077, 0.0, 2026.0) // lat, lon authority order
    Dispatch.trans(fwd, forward = true, c)
    // plate motion over 6 years is decimetre-scale, not zero
    assert(math.abs(c.x - (-33.8623)) > 1e-7 && math.abs(c.x - (-33.8623)) < 1e-5)
    Dispatch.trans(fwd, forward = false, c)
    assert(math.abs(c.x - (-33.8623)) < 1e-11 && math.abs(c.y - 151.2077) < 1e-11)
  }
}
