package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Coord, ProjError}

/** EPSG:xxxx alias front-end. */
class EpsgSpec extends AnyFunSuite {

  private def trans(str: String, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val pj = Proj.create(str)
    val c = new Coord
    c.set(math.toRadians(lonDeg), math.toRadians(latDeg), 0, 0)
    Dispatch.trans(pj, forward = true, c)
    (c.x, c.y)
  }

  test("EPSG UTM codes match the explicit proj-string, both hemispheres") {
    val (x1, y1) = trans("EPSG:32633", 15.3, 52.1)
    val (x2, y2) = trans("proj=utm zone=33 datum=WGS84 units=m no_defs", 15.3, 52.1)
    assert(x1 == x2 && y1 == y2)
    val (xs, ys) = trans("EPSG:32733", 15.3, -52.1)
    val (xe, ye) = trans("proj=utm zone=33 south datum=WGS84", 15.3, -52.1)
    assert(xs == xe && ys == ye)
    assert(ys > 4e6, "south false northing applied")
  }

  test("EPSG:4326 is lon/lat passthrough in degrees-out") {
    val pj = Proj.create("epsg:4326")
    assert(pj.angularInput(true) || pj.degreeInput(true))
  }

  test("EPSG:3857 equals webmerc; EPSG:27700 reproduces a BNG value") {
    val (x, _) = trans("EPSG:3857", 1.0, 0.0)
    assert(math.abs(x - 6378137.0 * math.toRadians(1.0)) < 1e-6)
    // OSGB36 British National Grid: tower of london-ish easting/northing
    // magnitudes (sanity: x_0=400000, y_0=-100000 applied)
    val (e, n) = trans("EPSG:27700", -0.1276, 51.5072)
    assert(e > 500000 && e < 540000, s"easting $e")
    assert(n > 170000 && n < 190000, s"northing $n")
  }

  test("unknown EPSG code raises a proj error") {
    intercept[ProjError] { Proj.create("EPSG:99999") }
  }
}
