package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord
import graft.proj.wkt.{Wkt, WktCrsDef, WktMap, WktOpDef}

/** WKT2 front-end: parser shapes, CRS/operation mapping, and
  * transform-level equivalence against the proj-string definitions the
  * gie corpus already locks. */
class WktSpec extends AnyFunSuite {

  private def fwd(p: PJ, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val c = new Coord
    c.set(math.toRadians(lonDeg), math.toRadians(latDeg), 0, 0)
    Dispatch.fwd4d(p, c)
    assert(!c.isError)
    (c.x, c.y)
  }

  test("parser: nesting, quoted escapes, bare enums, () brackets") {
    val n = Wkt.parse("A[\"x \"\"y\"\"\", 1.5, B(2, c), NORTH]")
    assert(n.keyword == "A")
    assert(n.strings == Vector("x \"y\""))
    assert(n.numbers == Vector(1.5))
    assert(n.child("B").get.numbers == Vector(2.0))
    assert(n.children("NORTH").nonEmpty)
  }

  test("GEOGCRS maps to longlat with the right ellipsoid and axis order") {
    val wkt = """GEOGCRS["WGS 84",
      DATUM["World Geodetic System 1984",
        ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
      PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],
      CS[ellipsoidal,2],
        AXIS["geodetic latitude (Lat)",north,ORDER[1],ANGLEUNIT["degree",0.0174532925199433]],
        AXIS["geodetic longitude (Lon)",east,ORDER[2],ANGLEUNIT["degree",0.0174532925199433]]]"""
    val c = WktMap.toObject(Wkt.parse(wkt)).asInstanceOf[WktCrsDef]
    assert(c.isGeographic && c.latFirst && !c.is3D)
    val p = Proj.create(c.projString)
    assert(math.abs(p.a - 6378137.0) < 1e-6)
    assert(math.abs(1 / p.f - 298.257223563) < 1e-9)
  }

  test("PROJCRS (UTM 31N as Transverse Mercator) matches the proj-string kernel") {
    val wkt = """PROJCRS["WGS 84 / UTM zone 31N",
      BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
          ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
      CONVERSION["UTM zone 31N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",3,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],
        PARAMETER["False easting",500000,LENGTHUNIT["metre",1],ID["EPSG",8806]],
        PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]],
      CS[Cartesian,2],
        AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
        AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]"""
    val viaWkt = Proj.create(wkt)
    val viaStr = Proj.create("proj=utm zone=31 ellps=WGS84")
    val (x1, y1) = fwd(viaWkt, 2.0, 49.0)
    val (x2, y2) = fwd(viaStr, 2.0, 49.0)
    assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6)
  }

  test("PROJCRS on a non-metre cartesian unit carries to_meter") {
    val wkt = """PROJCRS["ft grid",
      BASEGEOGCRS["d",DATUM["d",ELLIPSOID["GRS 1980",6378137,298.257222101]]],
      CONVERSION["c",METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",-87,ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9999,ID["EPSG",8805]],
        PARAMETER["False easting",1640416.666666667,LENGTHUNIT["US survey foot",0.304800609601219],ID["EPSG",8806]],
        PARAMETER["False northing",0,ID["EPSG",8807]]],
      CS[Cartesian,2],
        AXIS["(E)",east,ORDER[1],LENGTHUNIT["US survey foot",0.304800609601219]],
        AXIS["(N)",north,ORDER[2],LENGTHUNIT["US survey foot",0.304800609601219]]]"""
    val viaWkt = Proj.create(wkt)
    val viaStr = Proj.create(
      "proj=tmerc lat_0=0 lon_0=-87 k=0.9999 x_0=500000.00001016 y_0=0 ellps=GRS80 units=us-ft")
    val (x1, y1) = fwd(viaWkt, -86.0, 40.0)
    val (x2, y2) = fwd(viaStr, -86.0, 40.0)
    assert(math.abs(x1 - x2) < 2e-4, s"$x1 vs $x2")
    assert(math.abs(y1 - y2) < 2e-4, s"$y1 vs $y2")
  }

  test("geocentric GEODCRS maps to geocent") {
    val wkt = """GEODCRS["ITRF2014",
      DATUM["International Terrestrial Reference Frame 2014",
        ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]],
      CS[Cartesian,3],
        AXIS["(X)",geocentricX,ORDER[1],LENGTHUNIT["metre",1]],
        AXIS["(Y)",geocentricY,ORDER[2],LENGTHUNIT["metre",1]],
        AXIS["(Z)",geocentricZ,ORDER[3],LENGTHUNIT["metre",1]]]"""
    val c = WktMap.toObject(Wkt.parse(wkt)).asInstanceOf[WktCrsDef]
    assert(c.isGeocentric && c.is3D)
    assert(c.projString.startsWith("proj=geocent"))
  }

  test("COORDINATEOPERATION with per-year rate units matches the arcsec/yr helmert") {
    // same op expressed two ways: WKT with SI-per-second rate factors vs a
    // plain proj string in arcsec/yr (the ITRF2014->ETRF2014 values)
    val wkt = """COORDINATEOPERATION["ITRF2014 to ETRF2014 (1)",
      METHOD["Time-dependent Position Vector tfm (geocentric)",ID["EPSG",1053]],
      PARAMETER["X-axis translation",0,LENGTHUNIT["millimetre",0.001],ID["EPSG",8605]],
      PARAMETER["Y-axis translation",0,LENGTHUNIT["millimetre",0.001],ID["EPSG",8606]],
      PARAMETER["Z-axis translation",0,LENGTHUNIT["millimetre",0.001],ID["EPSG",8607]],
      PARAMETER["X-axis rotation",0,ANGLEUNIT["milliarc-second",4.84813681109536E-09],ID["EPSG",8608]],
      PARAMETER["Y-axis rotation",0,ANGLEUNIT["milliarc-second",4.84813681109536E-09],ID["EPSG",8609]],
      PARAMETER["Z-axis rotation",0,ANGLEUNIT["milliarc-second",4.84813681109536E-09],ID["EPSG",8610]],
      PARAMETER["Scale difference",0,SCALEUNIT["parts per billion",1E-09],ID["EPSG",8611]],
      PARAMETER["Rate of change of X-axis rotation",0.085,ANGLEUNIT["milliarc-seconds per year",1.53631468932076E-16],ID["EPSG",1043]],
      PARAMETER["Rate of change of Y-axis rotation",0.531,ANGLEUNIT["milliarc-seconds per year",1.53631468932076E-16],ID["EPSG",1044]],
      PARAMETER["Rate of change of Z-axis rotation",-0.77,ANGLEUNIT["milliarc-seconds per year",1.53631468932076E-16],ID["EPSG",1045]],
      PARAMETER["Parameter reference epoch",1989,TIMEUNIT["year",31556925.445],ID["EPSG",1047]]]"""
    val op = WktMap.toObject(Wkt.parse(wkt)).asInstanceOf[WktOpDef]
    val viaWkt = Proj.create(op.projString)
    val viaStr = Proj.create("proj=helmert convention=position_vector " +
      "drx=8.5e-05 dry=0.000531 drz=-0.00077 t_epoch=1989")
    val (c1, c2) = (new Coord, new Coord)
    c1.set(3541657.3778, 948984.2343, 5201383.5231, 2020.5)
    c2.set(3541657.3778, 948984.2343, 5201383.5231, 2020.5)
    Dispatch.fwd4d(viaWkt, c1)
    Dispatch.fwd4d(viaStr, c2)
    assert(math.abs(c1.x - c2.x) < 1e-6 && math.abs(c1.y - c2.y) < 1e-6 &&
      math.abs(c1.z - c2.z) < 1e-6)
  }

  test("PROJJSON ProjectedCRS maps through the same path as WKT") {
    val json = """{
      "type": "ProjectedCRS",
      "name": "WGS 84 / UTM zone 31N",
      "base_crs": {
        "name": "WGS 84",
        "datum": {
          "type": "GeodeticReferenceFrame",
          "name": "World Geodetic System 1984",
          "ellipsoid": {"name": "WGS 84", "semi_major_axis": 6378137,
                        "inverse_flattening": 298.257223563}}},
      "conversion": {
        "name": "UTM zone 31N",
        "method": {"name": "Transverse Mercator", "id": {"authority": "EPSG", "code": 9807}},
        "parameters": [
          {"name": "Latitude of natural origin", "value": 0, "unit": "degree", "id": {"authority": "EPSG", "code": 8801}},
          {"name": "Longitude of natural origin", "value": 3, "unit": "degree", "id": {"authority": "EPSG", "code": 8802}},
          {"name": "Scale factor at natural origin", "value": 0.9996, "unit": "unity", "id": {"authority": "EPSG", "code": 8805}},
          {"name": "False easting", "value": 500000, "unit": "metre", "id": {"authority": "EPSG", "code": 8806}},
          {"name": "False northing", "value": 0, "unit": "metre", "id": {"authority": "EPSG", "code": 8807}}]},
      "coordinate_system": {
        "subtype": "Cartesian",
        "axis": [
          {"name": "Easting", "abbreviation": "E", "direction": "east", "unit": "metre"},
          {"name": "Northing", "abbreviation": "N", "direction": "north", "unit": "metre"}]}}"""
    val viaJson = Proj.create(json)
    val viaStr = Proj.create("proj=utm zone=31 ellps=WGS84")
    val (x1, y1) = fwd(viaJson, 2.0, 49.0)
    val (x2, y2) = fwd(viaStr, 2.0, 49.0)
    assert(math.abs(x1 - x2) < 1e-6 && math.abs(y1 - y2) < 1e-6)
  }

  test("PROJJSON Transformation with rate units matches the WKT operation") {
    val json = """{
      "type": "Transformation",
      "name": "ITRF2014 to ETRF2014 (1)",
      "method": {"name": "Time-dependent Position Vector tfm (geocentric)", "id": {"authority": "EPSG", "code": 1053}},
      "parameters": [
        {"name": "X-axis translation", "value": 0, "unit": {"type": "LinearUnit", "name": "millimetre", "conversion_factor": 0.001}, "id": {"authority": "EPSG", "code": 8605}},
        {"name": "Rate of change of X-axis rotation", "value": 0.085,
         "unit": {"type": "AngularUnit", "name": "milliarc-seconds per year", "conversion_factor": 1.53631468932076e-16},
         "id": {"authority": "EPSG", "code": 1043}},
        {"name": "Rate of change of Y-axis rotation", "value": 0.531,
         "unit": {"type": "AngularUnit", "name": "milliarc-seconds per year", "conversion_factor": 1.53631468932076e-16},
         "id": {"authority": "EPSG", "code": 1044}},
        {"name": "Rate of change of Z-axis rotation", "value": -0.77,
         "unit": {"type": "AngularUnit", "name": "milliarc-seconds per year", "conversion_factor": 1.53631468932076e-16},
         "id": {"authority": "EPSG", "code": 1045}},
        {"name": "Parameter reference epoch", "value": 1989,
         "unit": {"type": "TimeUnit", "name": "year", "conversion_factor": 31556925.445},
         "id": {"authority": "EPSG", "code": 1047}}]}"""
    val viaJson = Proj.create(json)
    val viaStr = Proj.create("proj=helmert convention=position_vector " +
      "drx=8.5e-05 dry=0.000531 drz=-0.00077 t_epoch=1989")
    val (c1, c2) = (new Coord, new Coord)
    c1.set(3541657.3778, 948984.2343, 5201383.5231, 2020.5)
    c2.set(3541657.3778, 948984.2343, 5201383.5231, 2020.5)
    Dispatch.fwd4d(viaJson, c1)
    Dispatch.fwd4d(viaStr, c2)
    assert(math.abs(c1.x - c2.x) < 1e-6 && math.abs(c1.y - c2.y) < 1e-6 &&
      math.abs(c1.z - c2.z) < 1e-6)
  }
}
