package graft.proj

/** Minimal CRS-to-CRS planner for the well-known code pairs the reference's
  * epsg_no_grid corpus exercises — NOT the iso19111 database (reference
  * src/iso19111/factory.cpp createOperations), but the same public
  * definitions expressed as proj pipelines: authority axis order handled
  * with axisswap, degrees with unitconvert, datum hops through
  * cart ∘ helmert ∘ cart⁻¹ using published transformation parameters
  * (e.g. EPSG:8049 ITRF2014→GDA2020 time-dependent coordinate-frame
  * rotation from the GDA2020 technical manual). Unknown codes return None.
  */
object CrsToCrs {

  private final val GEOG2D = 0
  private final val GEOG3D = 1
  private final val GEOCENTRIC = 2
  private final val PROJECTED = 3

  /** kind, ellipsoid, datum key, projection step (projected only),
    * northing-easting axis order (projected only). */
  private final case class CrsDef(kind: Int, ellps: String, datum: String,
                                  projStep: String = "", neAxis: Boolean = false)

  private val defs: Map[Int, CrsDef] = Map(
    4258 -> CrsDef(GEOG2D, "GRS80", "ETRS89"), // ETRS89
    4326 -> CrsDef(GEOG2D, "WGS84", "WGS84"),
    4979 -> CrsDef(GEOG3D, "WGS84", "WGS84"), // WGS 84 3D
    4978 -> CrsDef(GEOCENTRIC, "WGS84", "WGS84"),
    7843 -> CrsDef(GEOG3D, "GRS80", "GDA2020"),
    7844 -> CrsDef(GEOG2D, "GRS80", "GDA2020"),
    7912 -> CrsDef(GEOG3D, "GRS80", "ITRF2014"),
    4123 -> CrsDef(GEOG2D, "intl", "KKJ"), // KKJ geographic
    25832 -> CrsDef(PROJECTED, "GRS80", "ETRS89",
      projStep = "proj=utm zone=32 ellps=GRS80"),
    25833 -> CrsDef(PROJECTED, "GRS80", "ETRS89",
      projStep = "proj=utm zone=33 ellps=GRS80"),
    // KKJ / Finland Uniform Coordinate System (YKJ): zone 3, FE 3500000,
    // axis order Northing, Easting
    2393 -> CrsDef(PROJECTED, "intl", "KKJ",
      projStep = "proj=tmerc lat_0=0 lon_0=27 k=1 x_0=3500000 y_0=0 ellps=intl",
      neAxis = true))

  /** datum hops over geographic radians: published Helmert parameters.
    * EPSG:8049 "ITRF2014 to GDA2020 (1)": zero offsets at epoch 2020.0 with
    * coordinate-frame rotation rates (mas/yr): 1.50379, 1.18346, 1.20716. */
  private val itrf2014ToGda2020 =
    "proj=helmert convention=coordinate_frame " +
      "drx=0.00150379 dry=0.00118346 drz=0.00120716 t_epoch=2020"

  private def hop(src: CrsDef, dst: CrsDef): Option[String] = {
    if (src.datum == dst.datum) return Some("")
    (src.datum, dst.datum) match {
      case ("GDA2020", "ITRF2014") => Some(
        s" step proj=cart ellps=${src.ellps}" +
          s" step $itrf2014ToGda2020 inv" +
          s" step proj=cart inv ellps=${dst.ellps}")
      case ("ITRF2014", "GDA2020") => Some(
        s" step proj=cart ellps=${src.ellps}" +
          s" step $itrf2014ToGda2020" +
          s" step proj=cart inv ellps=${dst.ellps}")
      // ETRS89/WGS84/GDA-free pairs with published zero transformation
      case ("ETRS89", "WGS84") | ("WGS84", "ETRS89") => Some("")
      case _ => None
    }
  }

  private def code(s: String): Option[Int] = {
    val t = s.trim
    if (t.length > 5 && t.length <= 14 && t.regionMatches(true, 0, "EPSG:", 0, 5) &&
        t.substring(5).forall(_.isDigit)) Some(t.substring(5).toInt)
    else None
  }

  /** (proj pipeline for src->dst in authority axis order and degrees,
    * dst-is-lat-lon-or-northing-easting flag for gie's comparison swap), or
    * None when either code or the datum hop is unknown. Source must be a
    * geographic CRS (the corpus shape); destinations may be geographic,
    * geocentric, or projected. */
  def pipeline(srcCode: String, dstCode: String): Option[(String, Boolean)] = {
    for {
      sc <- code(srcCode)
      dc <- code(dstCode)
      src <- defs.get(sc)
      dst <- defs.get(dc)
      if src.kind == GEOG2D || src.kind == GEOG3D
      h <- hop(src, dst)
    } yield {
      val sb = new StringBuilder("proj=pipeline")
      // authority geographic order is lat,lon degrees -> lon,lat radians
      sb ++= " step proj=axisswap order=2,1"
      sb ++= " step proj=unitconvert xy_in=deg xy_out=rad"
      sb ++= h
      val latLonOrYX = dst.kind match {
        case GEOG2D | GEOG3D =>
          sb ++= " step proj=unitconvert xy_in=rad xy_out=deg"
          sb ++= " step proj=axisswap order=2,1"
          true
        case GEOCENTRIC =>
          sb ++= s" step proj=cart ellps=${dst.ellps}"
          false
        case _ =>
          sb ++= s" step ${dst.projStep}"
          if (dst.neAxis) sb ++= " step proj=axisswap order=2,1"
          dst.neAxis
      }
      (sb.toString, latLonOrYX)
    }
  }
}
