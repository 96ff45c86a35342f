package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Coord, GeoMath}
import GeoMath.DEG2RAD

/** Golden-vector tests against the reference gie corpus values
  * (file:line cited per case; see FIXTURES.md §3). */
class KernelSpec extends AnyFunSuite {

  /** Run a proj-string forward on (x,y,z,t); degrees are converted to
    * radians iff the operation's input is angular, mirroring gie
    * (reference src/apps/gie.cpp:1109-1121). */
  def fwd(op: String, x: Double, y: Double, z: Double = 0, t: Double = 0): Coord = {
    val P = Proj.create(op)
    val c = new Coord
    val angIn = P.left == IOUnits.RADIANS
    c.set(if (angIn) x * DEG2RAD else x, if (angIn) y * DEG2RAD else y, z, t)
    Dispatch.trans(P, forward = true, c)
    c
  }

  def inv(op: String, x: Double, y: Double, z: Double = 0, t: Double = 0): Coord = {
    val P = Proj.create(op)
    val c = new Coord
    c.set(x, y, z, t)
    Dispatch.trans(P, forward = false, c)
    val angOut = P.left == IOUnits.RADIANS
    if (angOut) { c.x /= DEG2RAD; c.y /= DEG2RAD }
    c
  }

  def near(got: Double, want: Double, tol: Double, what: String = ""): Unit =
    assert(math.abs(got - want) <= tol, s"$what: got $got want $want (tol $tol)")

  test("tmerc exact fwd (builtins.gie:7093-7099, tol 50 nm)") {
    val c = fwd("proj=tmerc ellps=GRS80", 2, 1)
    near(c.x, 222650.796797586, 5e-8, "x")
    near(c.y, 110642.229411933, 5e-8, "y")
  }

  test("tmerc exact inv roundtrip") {
    val c = inv("proj=tmerc ellps=GRS80", 222650.796797586, 110642.229411933)
    near(c.x, 2, 1e-10, "lon")
    near(c.y, 1, 1e-10, "lat")
  }

  test("etmerc far from meridian (builtins.gie:1929-1945)") {
    val c = fwd("proj=etmerc ellps=GRS80", 44.69, 35.37)
    near(c.x, 4168136.489446198, 1e-6, "x")
    near(c.y, 4985511.302287407, 1e-6, "y")
  }

  test("tmerc approx (evenden_snyder) near meridian (builtins.gie:7439-7445, tol 0.1mm)") {
    val c = fwd("proj=tmerc ellps=GRS80 algo=evenden_snyder", 2.9, 0)
    near(c.x, 322965.3802, 1e-4, "x")
    near(c.y, 0.0, 1e-4, "y")
  }

  test("utm zone 32 with 4D passthrough (builtins.gie:7765-7773, tol 1 um)") {
    val c = fwd("proj=utm zone=32", 12, 56, 0, 2000)
    near(c.x, 687071.43910944, 1e-6, "x")
    near(c.y, 6210141.32674801, 1e-6, "y")
    near(c.z, 0.0, 1e-9, "z")
    near(c.t, 2000.0, 1e-9, "t")
  }

  test("utm inverse") {
    val c = inv("proj=utm zone=32", 687071.43910944, 6210141.32674801)
    near(c.x, 12, 1e-9, "lon")
    near(c.y, 56, 1e-9, "lat")
  }

  test("utm zone inference from lon_0") {
    // zone from lon_0=9 → zone 32, same result as explicit zone
    val a = fwd("proj=utm lon_0=9", 12, 56)
    val b = fwd("proj=utm zone=32", 12, 56)
    near(a.x, b.x, 1e-9); near(a.y, b.y, 1e-9)
  }

  test("lcc 2SP (builtins.gie:3750-3754, tol 0.1 mm)") {
    val c = fwd("proj=lcc ellps=GRS80 lat_1=0.5 lat_2=2", 2, 1)
    near(c.x, 222588.439735968, 1e-4, "x")
    near(c.y, 110660.533870800, 1e-4, "y")
  }

  test("lcc inverse roundtrips") {
    val c = inv("proj=lcc ellps=GRS80 lat_1=0.5 lat_2=2",
      222588.439735968, 110660.533870800)
    near(c.x, 2, 1e-9, "lon")
    near(c.y, 1, 1e-9, "lat")
  }

  test("merc ellipsoidal (builtins.gie merc block, tol 0.1 mm)") {
    // gie: proj=merc ellps=GRS80; accept 2 1 → expect 222638.981586547 110579.965218250
    val c = fwd("proj=merc ellps=GRS80", 2, 1)
    near(c.x, 222638.981586547, 1e-4, "x")
    near(c.y, 110579.965218250, 1e-4, "y")
    val r = inv("proj=merc ellps=GRS80", c.x, c.y)
    near(r.x, 2, 1e-9); near(r.y, 1, 1e-9)
  }

  test("helmert 7-param coordinate_frame (GDA.gie:28-37, tol 75 um)") {
    val c = fwd(
      "proj=helmert convention=coordinate_frame x=0.06155 rx=-0.0394924 " +
        "y=-0.01087 ry=-0.0327221 z=-0.04019 rz=-0.0328979 s=-0.009994",
      -4052051.7643, 4212836.2017, -2545106.0245)
    near(c.x, -4052052.7379, 75e-6, "x")
    near(c.y, 4212835.9897, 75e-6, "y")
    near(c.z, -2545104.5898, 75e-6, "z")
  }

  test("helmert 14-param kinematic position_vector (more_builtins.gie:368-380, tol 0.03 mm)") {
    val c = fwd(
      "proj=helmert convention=position_vector " +
        "x=0.0127 dx=-0.0029 rx=-0.00039 drx=-0.00011 " +
        "y=0.0065 dy=-0.0002 ry=0.00080 dry=-0.00019 " +
        "z=-0.0209 dz=-0.0006 rz=-0.00114 drz=0.00007 " +
        "s=0.00195 ds=0.00001 t_epoch=1988.0",
      3370658.37800, 711877.31400, 5349787.08600, 2017.0)
    near(c.x, 3370658.18890, 3e-5, "x")
    near(c.y, 711877.42370, 3e-5, "y")
    near(c.z, 5349787.12430, 3e-5, "z")
  }

  test("GDA94→GDA2020 full datum pipeline (GDA.gie:44-56, tol 2 mm)") {
    val op = "proj=pipeline ellps=GRS80 step proj=cart step proj=helmert " +
      "convention=coordinate_frame x=0.06155 rx=-0.0394924 y=-0.01087 " +
      "ry=-0.0327221 z=-0.04019 rz=-0.0328979 s=-0.009994 step proj=cart inv"
    val P = Proj.create(op)
    val c = new Coord
    c.set(133.88551329 * DEG2RAD, -23.67012389 * DEG2RAD, 603.3466, 0)
    Dispatch.trans(P, forward = true, c)
    // compare as degrees with a generous angular tolerance equivalent (2mm ~ 1.8e-8 deg)
    near(c.x / DEG2RAD, 133.8855216, 2e-8, "lon")
    near(c.y / DEG2RAD, -23.67011014, 2e-8, "lat")
    near(c.z, 603.2489, 2e-3, "h")
  }

  test("cart roundtrip preserves height") {
    val P = Proj.create("proj=cart ellps=GRS80")
    val c = new Coord
    c.set(12 * DEG2RAD, 55 * DEG2RAD, 123.456, 0)
    Dispatch.trans(P, forward = true, c)
    Dispatch.trans(P, forward = false, c)
    near(c.x / DEG2RAD, 12, 1e-12, "lon")
    near(c.y / DEG2RAD, 55, 1e-12, "lat")
    near(c.z, 123.456, 1e-8, "h")
  }

  test("axisswap order=2,1 (builtins.gie axisswap block)") {
    val c = fwd("proj=axisswap order=2,1", 1, 2, 3, 4)
    assert(c.x == 2 && c.y == 1 && c.z == 3 && c.t == 4)
    val c2 = fwd("proj=axisswap order=1,2,-3,4", 1, 2, 3, 4)
    assert(c2.x == 1 && c2.y == 2 && c2.z == -3 && c2.t == 4)
  }

  test("unitconvert linear + time units") {
    val c = fwd("proj=unitconvert xy_in=km xy_out=m", 1, 2)
    assert(c.x == 1000.0 && c.y == 2000.0)
    val t = fwd("proj=unitconvert t_in=decimalyear t_out=gps_week", 0, 0, 0, 2017.0)
    // 2017.0 decimalyear = MJD 57754; GPS week = (57754-44244)/7 = 1930.0
    near(t.t, 1930.0, 1e-9, "t")
  }

  test("unitconvert deg/rad tagging") {
    val P = Proj.create("proj=unitconvert xy_in=deg xy_out=rad")
    assert(P.left == IOUnits.DEGREES && P.right == IOUnits.RADIANS)
    val c = new Coord; c.set(180, 0, 0, 0)
    Dispatch.trans(P, forward = true, c)
    near(c.x, math.Pi, 1e-15)
  }

  test("pipeline with push/pop preserves ellipsoidal height through 2D leg") {
    // 2D utm leg must not destroy z when wrapped with push/pop v_3
    val op = "proj=pipeline step proj=push v_3 step proj=utm zone=32 ellps=GRS80 " +
      "step proj=pop v_3"
    val P = Proj.create(op)
    val c = new Coord
    c.set(12 * DEG2RAD, 56 * DEG2RAD, 42.0, 0)
    Dispatch.trans(P, forward = true, c)
    near(c.x, 687071.43910944, 1e-6, "x")
    near(c.z, 42.0, 0.0, "z preserved")
  }

  test("expected failures map to errnos (builtins.gie:85-92)") {
    import graft.core.{ProjErr, ProjError}
    val e = intercept[ProjError](Proj.create("proj=lcc ellps=GRS80 lat_1=900"))
    assert(e.errno == ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE)
    // domain failure: tmerc approx at |lam| > 90
    val c = fwd("proj=tmerc approx ellps=GRS80 lon_0=0", 100, 10)
    assert(c.isError)
    assert(c.err == ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
  }

  test("geoc geodetic <-> geocentric latitude") {
    val c = fwd("proj=geoc ellps=GRS80", 12, 55)
    // geocentric latitude < geodetic in northern hemisphere
    assert(c.y / DEG2RAD < 55 && c.y / DEG2RAD > 54.5)
    val r = inv("proj=geoc ellps=GRS80", c.x, c.y)
    near(r.y, 55, 1e-12)
  }
}
