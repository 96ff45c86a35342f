package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord

/** ESRI authority resolution: deprecated ESRI codes alias onto their EPSG
  * replacements (reference deprecation table), ESRI-only CRSs resolve with
  * inline projection bodies from the registry sidecar, and WKT1-ESRI names
  * resolve through the alias index. Numeric checks are against independent
  * closed-form projection math written here (spherical web-Mercator,
  * Snyder LCC-2SP), not the engine's own kernels. */
class EsriSpec extends AnyFunSuite {

  private def db = EpsgDb.db

  test("ESRI:102100 aliases onto EPSG:3857 (deprecation replacement)") {
    val r = OpFactory.resolveCode("ESRI:102100").get
    assert(r.code == "EPSG:3857")
    assert(r.name == "WGS 84 / Pseudo-Mercator")
  }

  test("WKT1-ESRI names resolve through the alias index") {
    assert(OpFactory.resolve("WGS_1984_Web_Mercator_Auxiliary_Sphere")
      .map(_.code).contains("EPSG:3857"))
    assert(OpFactory.resolve("NAD_1927_UTM_Zone_15N")
      .map(_.code).contains("EPSG:26715"))
    assert(OpFactory.resolve("GCS_North_American_1983")
      .map(_.code).contains("EPSG:4269"))
  }

  test("ESRI:102100 forward matches closed-form spherical web-Mercator") {
    val r = OpFactory.resolveCode("ESRI:102100").get
    val pj = Proj.create(r.projBody.get)
    val (lon, lat) = (2.0, 49.0)
    val out = new Coord
    out.set(math.toRadians(lon), math.toRadians(lat), 0.0,
      Double.PositiveInfinity)
    Dispatch.fwd4d(pj, out)
    val a = 6378137.0
    val ex = a * math.toRadians(lon)
    val ey = a * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
    assert(math.abs(out.x - ex) < 1e-6, s"${out.x} vs $ex")
    assert(math.abs(out.y - ey) < 1e-6, s"${out.y} vs $ey")
  }

  test("ESRI:103668 (ESRI-only LCC) matches independent Snyder LCC-2SP") {
    val r = OpFactory.resolveCode("ESRI:103668").get
    assert(r.name == "NAD_1983_HARN_Adj_MN_Ramsey_Meters")
    val body = r.projBody.get
    assert(body.contains("proj=lcc"))
    val pj = Proj.create(body)
    val (lonDeg, latDeg) = (-93.1, 45.0)
    val out = new Coord
    out.set(math.toRadians(lonDeg), math.toRadians(latDeg), 0.0,
      Double.PositiveInfinity)
    Dispatch.fwd4d(pj, out)

    // independent Snyder ellipsoidal LCC-2SP using the body's parameters
    val ps = body.split("\\s+").iterator.filter(_.contains("="))
      .map { t => val i = t.indexOf('='); t.take(i) -> t.drop(i + 1) }.toMap
    val aAx = ps("a").toDouble; val rf = ps("rf").toDouble
    val e2 = 2 / rf - 1 / (rf * rf); val e = math.sqrt(e2)
    def mFn(phi: Double) =
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    def tFn(phi: Double) =
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    val phi1 = math.toRadians(ps("lat_1").toDouble)
    val phi2 = math.toRadians(ps("lat_2").toDouble)
    val phi0 = math.toRadians(ps("lat_0").toDouble)
    val lam0 = math.toRadians(ps("lon_0").toDouble)
    val n = math.log(mFn(phi1) / mFn(phi2)) / math.log(tFn(phi1) / tFn(phi2))
    val fCap = mFn(phi1) / (n * math.pow(tFn(phi1), n))
    def rho(phi: Double) = aAx * fCap * math.pow(tFn(phi), n)
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val theta = n * (lam - lam0)
    val ex = ps("x_0").toDouble + rho(phi) * math.sin(theta)
    val ey = ps("y_0").toDouble + rho(phi0) - rho(phi) * math.cos(theta)
    assert(math.abs(out.x - ex) < 1e-4, s"${out.x} vs $ex")
    assert(math.abs(out.y - ey) < 1e-4, s"${out.y} vs $ey")
  }

  test("ESRI geodetic CRSs carry their own datums") {
    val r = OpFactory.resolveCode("ESRI:104715").get
    assert(r.name == "GCS_NAD_1983_HARN_Adj_MN_Cook_South")
    assert(r.geod.datum == "ESRI:106715")
  }
}
