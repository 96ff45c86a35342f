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
