package graft.proj

import org.scalatest.funsuite.AnyFunSuite

/** WKT1:GDAL output for projected CRSs, pinned against GDAL's well-known
  * rendering of EPSG:32631 (the form GDAL < 3 importFromEPSG produced and
  * the reference reproduces). */
class Wkt1ProjSpec extends AnyFunSuite {

  test("EPSG:32631 renders GDAL's canonical WKT1") {
    val r = graft.cli.CliProjinfo.run(
      Seq("-o", "WKT1_GDAL", "-q", "EPSG:32631"), "", "projinfo", Map.empty)
    assert(r.exit == 0, r.stderr)
    val expected =
      """PROJCS["WGS 84 / UTM zone 31N",
        |    GEOGCS["WGS 84",
        |        DATUM["WGS_1984",
        |            SPHEROID["WGS 84",6378137,298.257223563,
        |                AUTHORITY["EPSG","7030"]],
        |            AUTHORITY["EPSG","6326"]],
        |        PRIMEM["Greenwich",0,
        |            AUTHORITY["EPSG","8901"]],
        |        UNIT["degree",0.0174532925199433,
        |            AUTHORITY["EPSG","9122"]],
        |        AUTHORITY["EPSG","4326"]],
        |    PROJECTION["Transverse_Mercator"],
        |    PARAMETER["latitude_of_origin",0],
        |    PARAMETER["central_meridian",3],
        |    PARAMETER["scale_factor",0.9996],
        |    PARAMETER["false_easting",500000],
        |    PARAMETER["false_northing",0],
        |    UNIT["metre",1,
        |        AUTHORITY["EPSG","9001"]],
        |    AXIS["Easting",EAST],
        |    AXIS["Northing",NORTH],
        |    AUTHORITY["EPSG","32631"]]
        |""".stripMargin
    assert(r.stdout == expected + "\n", r.stdout)
  }

  test("a 2SP Lambert projected CRS maps its parameter set") {
    val r = graft.cli.CliProjinfo.run(
      Seq("-o", "WKT1_GDAL", "-q", "EPSG:2154"), "", "projinfo", Map.empty)
    assert(r.exit == 0, r.stderr)
    assert(r.stdout.contains("PROJECTION[\"Lambert_Conformal_Conic_2SP\"]"))
    assert(r.stdout.contains("PARAMETER[\"standard_parallel_1\",49]"))
    assert(r.stdout.contains("PARAMETER[\"standard_parallel_2\",44]"))
    assert(r.stdout.contains("PARAMETER[\"latitude_of_origin\",46.5]"))
  }

  test("EPSG:32631 renders the canonical ESRI WKT1 single-line") {
    val r = graft.cli.CliProjinfo.run(
      Seq("-o", "WKT1_ESRI", "-q", "EPSG:32631"), "", "projinfo", Map.empty)
    assert(r.exit == 0, r.stderr)
    assert(r.stdout ==
      """PROJCS["WGS_1984_UTM_Zone_31N",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",3.0],PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]""" +
      "\n\n", r.stdout)
  }

  test("EPSG:2154 renders ESRI's Lambert_Conformal_Conic form") {
    val r = graft.cli.CliProjinfo.run(
      Seq("-o", "WKT1_ESRI", "-q", "EPSG:2154"), "", "projinfo", Map.empty)
    assert(r.stdout.startsWith("PROJCS[\"RGF_1993_Lambert_93\""))
    assert(r.stdout.contains("PARAMETER[\"Latitude_Of_Origin\",46.5]"))
  }
}
