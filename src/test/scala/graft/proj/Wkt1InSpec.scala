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

  test("WKT1 GEOGCS parses as a lon-lat geographic CRS") {
    val c = parse(emitted("EPSG:4326", "WKT1_GDAL"))
    assert(c.isGeographic && !c.latFirst)
    assert(c.projString.contains("proj=longlat"))
    assert(c.projString.contains("a=6378137"))
  }
}
