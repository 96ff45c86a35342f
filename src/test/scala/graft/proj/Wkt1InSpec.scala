package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord
import graft.proj.wkt.{Wkt, WktCrsDef, WktMap}

/** WKT1 *input* (GDAL and ESRI dialects): parsing the WKT1 this engine
  * emits — and ESRI's own text definitions from the registry — must land
  * on the same projection as the registry body, verified numerically by
  * forward-projecting a common point. */
class Wkt1InSpec extends AnyFunSuite {

  private def fwd(body: String, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val pj = Proj.create(body)
    val c = new Coord
    c.set(math.toRadians(lonDeg), math.toRadians(latDeg), 0, 0)
    Dispatch.fwd4d(pj, c)
    assert(!c.isError, body)
    (c.x, c.y)
  }

  private def parse(wkt: String): WktCrsDef =
    WktMap.toObject(Wkt.parse(wkt)) match {
      case c: WktCrsDef => c
      case other => fail(s"parsed to $other")
    }

  private def emitted(code: String, fmt: String): String = {
    val r = graft.cli.CliProjinfo.run(Seq("-o", fmt, "-q", code),
      "", "projinfo", Map.empty)
    assert(r.exit == 0, r.stderr)
    r.stdout.trim
  }

  private def agreeWithRegistry(wkt: String, code: String,
                                lon: Double, lat: Double): Unit = {
    val parsed = parse(wkt)
    assert(!parsed.isGeographic)
    val (x1, y1) = fwd(parsed.projString, lon, lat)
    val (x2, y2) = fwd(OpFactory.projBodyOf(code).get, lon, lat)
    assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6,
      s"($x1,$y1) vs ($x2,$y2) from ${parsed.projString}")
  }

  test("our GDAL WKT1 of EPSG:32631 parses back to the same projection") {
    agreeWithRegistry(emitted("EPSG:32631", "WKT1_GDAL"), "EPSG:32631", 5.2, 49.7)
  }

  test("our ESRI WKT1 of EPSG:2154 parses back to the same projection") {
    agreeWithRegistry(emitted("EPSG:2154", "WKT1_ESRI"), "EPSG:2154", 2.35, 48.85)
  }

  test("ESRI's own 102100 text definition lands on web-Mercator") {
    // the registry's text_definition for WGS_1984_Web_Mercator_Auxiliary_Sphere
    val wkt = """PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Mercator_Auxiliary_Sphere"],PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",0.0],PARAMETER["Standard_Parallel_1",0.0],PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]"""
    agreeWithRegistry(wkt, "EPSG:3857", 2.0, 49.0)
  }

  test("GDAL WKT1 of EPSG:3031 round-trips as Polar Stereographic variant B") {
    // scale_factor absent and latitude_of_origin=-71: must become
    // stere lat_0=-90 lat_ts=-71, not an oblique stereographic at -71
    val wkt = emitted("EPSG:3031", "WKT1_GDAL")
    assert(wkt.contains("Polar_Stereographic"))
    assert(!wkt.contains("scale_factor"))
    val parsed = parse(wkt)
    assert(parsed.projString.contains("lat_0=-90"), parsed.projString)
    assert(parsed.projString.contains("lat_ts=-71"), parsed.projString)
    agreeWithRegistry(wkt, "EPSG:3031", -110.0, -74.0)
  }

  test("Polar_Stereographic variant A (UPS north, scale_factor 0.994) round-trips") {
    agreeWithRegistry(emitted("EPSG:5041", "WKT1_GDAL"), "EPSG:5041", 10.0, 80.0)
  }

  test("Mercator_1SP with non-zero latitude_of_origin takes the GDAL 3026 hack") {
    // Mercator variant B (EPSG:3752) as GDAL pre-ticket-3026 WKT1
    val wkt = """PROJCS["WGS 84 / Mercator 41",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_1SP"],PARAMETER["latitude_of_origin",-41],PARAMETER["central_meridian",100],PARAMETER["scale_factor",1],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val parsed = parse(wkt)
    assert(parsed.projString.contains("lat_ts=-41"), parsed.projString)
    val (x1, y1) = fwd(parsed.projString, 174.0, -41.0)
    val (x2, y2) = fwd("proj=merc lat_ts=-41 lon_0=100 x_0=0 y_0=0 " +
      "a=6378137 rf=298.257223563 units=m", 174.0, -41.0)
    assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6,
      s"($x1,$y1) vs ($x2,$y2)")
  }

  test("NTF (Paris) / Lambert zone I WKT1 carries grad unit and Paris meridian") {
    val wkt = emitted("EPSG:27571", "WKT1_GDAL")
    assert(wkt.contains("""UNIT["grad""""), wkt)
    assert(!wkt.contains("""UNIT["degree",0.015"""), wkt)
    // the registry body uses pm=paris (the DMS table's 2°20'14.025");
    // the WKT path keeps EPSG's 2.5969213 grad — the two differ by
    // 3.3e-9 deg in the reference as well, so compare at 1e-3 m
    val parsed = parse(wkt)
    val (x1, y1) = fwd(parsed.projString, 2.35, 48.85)
    val (x2, y2) = fwd(OpFactory.projBodyOf("EPSG:27571").get, 2.35, 48.85)
    assert(math.abs(x1 - x2) < 1e-3 && math.abs(y1 - y2) < 1e-3,
      s"($x1,$y1) vs ($x2,$y2) from ${parsed.projString}")
  }

  test("PRIMEM Paris in decimal degrees under a grad unit is corrected") {
    // GDAL/ESRI departure: Paris printed as 2.33722917 (its degree value)
    // inside a grad-unit GEOGCS still means 2.5969213 grad
    val wkt = """GEOGCS["NTF (Paris)",DATUM["Nouvelle_Triangulation_Francaise_Paris",SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936261]],PRIMEM["Paris",2.33722917],UNIT["grad",0.0157079632679489]]"""
    val c = parse(wkt)
    val pm = "pm=([0-9.]+)".r.findFirstMatchIn(c.projString).map(_.group(1).toDouble)
    assert(pm.exists(v => math.abs(v - 2.33722917) < 1e-6), c.projString)
  }

  test("WKT1 GEOGCS parses as a lon-lat geographic CRS") {
    val c = parse(emitted("EPSG:4326", "WKT1_GDAL"))
    assert(c.isGeographic && !c.latFirst)
    assert(c.projString.contains("proj=longlat"))
    assert(c.projString.contains("a=6378137"))
  }
}
