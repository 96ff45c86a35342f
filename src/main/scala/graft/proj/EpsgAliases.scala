package graft.proj

/** Thin `EPSG:xxxx` front-end: the ~30 best-known codes carry hand-written
  * proj-string definitions (the same public definitions the legacy proj4
  * epsg init file carried); everything else falls through to the generated
  * ~7k-code EPSG init table (src/main/resources/graft/epsg, derived from
  * the reference's public EPSG SQL data), so any geographic/geocentric CRS
  * and any projected CRS on a supported conversion method resolves. This is
  * NOT the reference's iso19111 CRS database — axis order is GIS-friendly
  * lon/lat throughout, and unknown codes fall through to the normal
  * proj-string parser (which errors with INVALID_OP_WRONG_SYNTAX).
  */
object EpsgAliases {

  private val fixed: Map[Int, String] = Map(
    // geographic
    4326 -> "proj=longlat datum=WGS84 no_defs",
    4258 -> "proj=longlat ellps=GRS80 no_defs", // ETRS89
    4269 -> "proj=longlat datum=NAD83 no_defs",
    // NAD27: the datum key implies the grid-based shift (nadgrids
    // @conus,...); without those grids present no datum shift is applied
    4267 -> "proj=longlat datum=NAD27 no_defs",
    // OSGB36 with the published 7-parameter transformation (EPSG:1314) —
    // an ellipsoid-only alias would silently skip a ~100 m datum shift
    4277 -> ("proj=longlat ellps=airy " +
      "towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 no_defs"),
    // geocentric
    4978 -> "proj=geocent datum=WGS84 no_defs",
    // global projected
    3857 -> "proj=webmerc datum=WGS84 units=m no_defs", // web mercator
    3395 -> "proj=merc datum=WGS84 units=m no_defs", // world mercator
    // continental equal-area / conformal
    3035 -> ("proj=laea lat_0=52 lon_0=10 x_0=4321000 y_0=3210000 " +
      "ellps=GRS80 units=m no_defs"), // ETRS89-LAEA Europe
    6933 -> "proj=cea lat_ts=30 lon_0=0 x_0=0 y_0=0 datum=WGS84 units=m no_defs", // EASE-Grid 2.0
    2154 -> ("proj=lcc lat_1=49 lat_2=44 lat_0=46.5 lon_0=3 x_0=700000 " +
      "y_0=6600000 ellps=GRS80 units=m no_defs"), // RGF93 / Lambert-93
    27700 -> ("proj=tmerc lat_0=49 lon_0=-2 k=0.9996012717 x_0=400000 " +
      "y_0=-100000 ellps=airy units=m no_defs"), // OSGB36 / British National Grid
    5070 -> ("proj=aea lat_1=29.5 lat_2=45.5 lat_0=23 lon_0=-96 x_0=0 y_0=0 " +
      "datum=NAD83 units=m no_defs"), // NAD83 / Conus Albers
    // polar stereographic
    3413 -> ("proj=stere lat_0=90 lat_ts=70 lon_0=-45 x_0=0 y_0=0 " +
      "datum=WGS84 units=m no_defs"), // NSIDC Sea Ice North
    3031 -> ("proj=stere lat_0=-90 lat_ts=-71 lon_0=0 x_0=0 y_0=0 " +
      "datum=WGS84 units=m no_defs"), // Antarctic Polar Stereographic
    3576 -> ("proj=laea lat_0=90 lon_0=-150 x_0=0 y_0=0 " +
      "datum=WGS84 units=m no_defs"), // EASE North
    // ETRS89 UTM (same definitions as the epsg init table)
    25832 -> "proj=utm zone=32 ellps=GRS80 towgs84=0,0,0 units=m no_defs",
    25833 -> "proj=utm zone=33 ellps=GRS80 towgs84=0,0,0 units=m no_defs")

  /** Some("expanded proj string") for EPSG:xxxx / epsg:xxxx, None otherwise.
    * WGS84 UTM (326xx / 327xx) and NAD83 UTM (269xx) resolve by range. */
  def resolve(s: String): Option[String] = {
    if (s.length < 6 || !(s.regionMatches(true, 0, "EPSG:", 0, 5))) return None
    val codeStr = s.substring(5).trim
    if (codeStr.isEmpty || codeStr.length > 9 || !codeStr.forall(_.isDigit)) return None
    val code = codeStr.toInt
    fixed.get(code).orElse {
      if (code >= 32601 && code <= 32660)
        Some(s"proj=utm zone=${code - 32600} datum=WGS84 units=m no_defs")
      else if (code >= 32701 && code <= 32760)
        Some(s"proj=utm zone=${code - 32700} south datum=WGS84 units=m no_defs")
      else if (code >= 26901 && code <= 26923)
        Some(s"proj=utm zone=${code - 26900} datum=NAD83 units=m no_defs")
      else Proj.epsgInitLookup(codeStr) // generated ~7k-code table
    }
  }
}
