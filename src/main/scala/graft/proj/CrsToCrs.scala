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

  // --------------------------------------------------- generic GIS-order path

  /** CRS definition derived from the generated EPSG init table: kind,
    * pipeline-ready body (towgs84/no_defs stripped), ellipsoid tokens for
    * cart steps, and the datum shift (explicit towgs84, or implied by a
    * legacy datum key). */
  private final case class GenDef(kind: Int, body: String,
                                  ellTokens: String, towgs84: Option[Seq[Double]])

  private val ellKeys = Set("a", "b", "rf", "f", "es", "ellps", "datum", "R")

  private def genDef(c: Int): Option[GenDef] = Proj.epsgInitLookup(c.toString).flatMap { raw =>
    val toks = raw.split("\\s+").filter(_.nonEmpty).map(_.stripPrefix("+")).toSeq
    def valOf(k: String): Option[String] =
      toks.collectFirst { case t if t.startsWith(k + "=") => t.substring(k.length + 1) }
    // non-greenwich prime meridians need per-kind handling we don't do here
    if (valOf("pm").isDefined) None
    else valOf("proj").map { projName =>
      val kind = projName match {
        case "longlat" | "latlong" | "latlon" | "lonlat" => GEOG2D
        case "geocent" => GEOCENTRIC
        case _ => PROJECTED
      }
      val towgs = valOf("towgs84").map(_.split(",").toSeq.map(_.toDouble))
        .orElse(valOf("datum").flatMap(d => Datums.toDefn.get(d).collect {
          case ("towgs84", v) => v.split(",").toSeq.map(_.toDouble)
        }))
      val body = toks.filterNot(t =>
        t.startsWith("towgs84=") || t == "no_defs").mkString(" ")
      val ell = toks.filter(t => ellKeys.contains(t.takeWhile(_ != '='))
        && !t.startsWith("datum=")).mkString(" ") match {
        // datum implies its ellipsoid; cart must not see towgs84-bearing keys
        case "" => valOf("datum").map(d => "ellps=" +
          Datums.toEllps.getOrElse(d, d)).getOrElse("")
        case s => s
      }
      GenDef(kind, body, ell, towgs)
    }
  }

  /** registry-grade src→dst pipeline in GIS axis order (lon,lat degrees on
    * geographic ends): the best instantiable non-ballpark candidate from
    * the EPSG coordinate-operation sidecar (OpFactory — real datum
    * operations, grids when resolvable, compound codes, CRS names). None
    * when either spec does not resolve or no instantiable candidate
    * exists. */
  def pipelineRegistry(srcSpec: String, dstSpec: String): Option[String] =
    for {
      s <- OpFactory.resolve(srcSpec)
      d <- OpFactory.resolve(dstSpec)
      c <- OpFactory.createList(s, d, OpFactory.Options())
        .filter(c => c.instantiable && !c.ballpark)
        // plan-time pick mirrors the runtime's accuracy preference
        // (pj_get_suggested_operation): best known accuracy wins; the sorted
        // order breaks ties
        .minByOption(c => if (c.accuracy >= 0) c.accuracy else Double.MaxValue)
    } yield {
      val steps =
        if (c.pipeline == "proj=noop") ""
        else if (c.pipeline.startsWith("proj=pipeline"))
          " " + c.pipeline.stripPrefix("proj=pipeline").trim
        else " step " + c.pipeline // bare whole-CRS op (similarity/affine)
      val pre =
        if (s.isLongLat) " step proj=unitconvert xy_in=deg xy_out=rad" else ""
      val post =
        if (d.isLongLat) " step proj=unitconvert xy_in=rad xy_out=deg" else ""
      if (pre.isEmpty && post.isEmpty && steps.isEmpty) "proj=noop"
      else "proj=pipeline" + pre + steps + post
    }

  private def helmStep(t: Seq[Double], inv: Boolean): String =
    if (t.forall(_ == 0.0)) ""
    else {
      val p = t.padTo(7, 0.0)
      s" step proj=helmert x=${p(0)} y=${p(1)} z=${p(2)}" +
        s" rx=${p(3)} ry=${p(4)} rz=${p(5)} s=${p(6)}" +
        " convention=position_vector" + (if (inv) " inv" else "")
    }

  /** cs2cs-style src→dst pipeline in GIS axis order (lon,lat degrees for
    * geographic ends, x,y metres/units for projected ends) for ANY pair of
    * codes resolvable in the EPSG init table (~7k). Datum semantics mirror
    * the legacy cs2cs path: shifts hop through geocentric WGS84 using each
    * side's towgs84 (position-vector convention); a side without datum
    * information contributes no shift; the geocentric hop also runs when
    * only the ellipsoids differ. None for unknown codes or non-greenwich
    * prime meridians. */
  def pipelineGis(srcCode: String, dstCode: String): Option[String] = for {
    sc <- code(srcCode)
    dc <- code(dstCode)
    src <- genDef(sc)
    dst <- genDef(dc)
  } yield {
    val sb = new StringBuilder("proj=pipeline")
    src.kind match {
      case GEOG2D => sb ++= " step proj=unitconvert xy_in=deg xy_out=rad"
      case GEOCENTRIC => sb ++= s" step proj=cart ${src.ellTokens} inv"
      case _ => sb ++= s" step ${src.body} inv"
    }
    val sameDatum = src.ellTokens == dst.ellTokens && src.towgs84 == dst.towgs84
    if (!sameDatum) {
      sb ++= s" step proj=cart ${src.ellTokens}"
      src.towgs84.foreach(t => sb ++= helmStep(t, inv = false))
      dst.towgs84.foreach(t => sb ++= helmStep(t, inv = true))
      sb ++= s" step proj=cart inv ${dst.ellTokens}"
    }
    dst.kind match {
      case GEOG2D => sb ++= " step proj=unitconvert xy_in=rad xy_out=deg"
      case GEOCENTRIC => sb ++= s" step proj=cart ${dst.ellTokens}"
      case _ => sb ++= s" step ${dst.body}"
    }
    sb.toString
  }
}
