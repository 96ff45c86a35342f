package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.CliCs2cs

/** ESRI authority resolution: deprecated ESRI codes map to their EPSG
  * replacements through the registry's deprecation records, and ESRI WKT1
  * object names alias the same EPSG objects — so `cs2cs ESRI:102100 ...`
  * and name-based lookups behave as the reference's database does
  * (reference data/sql/esri.sql deprecation + name rows). */
class EsriAliasSpec extends AnyFunSuite {

  test("ESRI:102100 resolves to the EPSG Pseudo-Mercator CRS") {
    val r = OpFactory.resolveCode("ESRI:102100")
    assert(r.map(_.code).contains("EPSG:3857"))
    assert(r.exists(_.name == "WGS 84 / Pseudo-Mercator"))
  }

  test("ESRI WKT1 names alias their EPSG objects") {
    val byName = OpFactory.resolve("WGS_1984_Web_Mercator_Auxiliary_Sphere")
    assert(byName.map(_.code).contains("EPSG:3857"))
    // the classic geographic name keeps working through the alias table
    assert(OpFactory.resolve("GCS_WGS_1984").map(_.code).contains("EPSG:4326"))
  }

  test("cs2cs through an ESRI code matches the EPSG code and the closed form") {
    def run(src: String): String =
      CliCs2cs.run(Seq("-d", "4", src, "EPSG:4326"), "1113194.9079 6800125.4543\n",
        "cs2cs", Map.empty, Map.empty).stdout
    val esri = run("ESRI:102100")
    val epsg = run("EPSG:3857")
    assert(esri == epsg)
    // closed form: x = R*lon, so lon = 1113194.9079.../R = 10 degrees
    assert(esri.contains("10.0000"))
  }

  test("the alias table only remaps codes with an EPSG replacement") {
    // a live EPSG code is untouched by the alias pass
    assert(OpFactory.resolveCode("EPSG:3857").map(_.code).contains("EPSG:3857"))
    assert(EpsgDb.db.codeAlias.size > 900)
    assert(EpsgDb.db.codeAlias.forall(_._2.startsWith("EPSG:")))
  }
}
