package graft.proj.wkt

import graft.core.{GeoMath, ProjErr, ProjError}

/** WKT2 object → proj-string mapping for the shapes real inputs carry:
  * geographic / geocentric CRSs, projected CRSs on the common conversion
  * methods, and Helmert-family coordinate operations. The method and
  * parameter EPSG codes mirror the same public export rules the generated
  * EPSG init table uses (reference
  * src/iso19111/operation/parammappings.cpp); the iso19111 object model
  * itself stays out of scope — this maps straight to the engine's
  * proj-string front-end.
  */
sealed trait WktObject
final case class WktCrsDef(projString: String, isGeographic: Boolean,
                           isGeocentric: Boolean, latFirst: Boolean,
                           angularUnitToRad: Double, is3D: Boolean,
                           name: String) extends WktObject
final case class WktOpDef(projString: String, name: String) extends WktObject

object WktMap {

  private def fail(msg: String): Nothing =
    throw ProjError(ProjErr.INVALID_OP_WRONG_SYNTAX, s"wkt: $msg")

  def toObject(node: WktNode): WktObject = node.keyword match {
    case "GEOGCRS" | "GEOGRAPHICCRS" | "GEODCRS" | "GEODETICCRS" =>
      geodetic(node)
    case "PROJCRS" | "PROJECTEDCRS" => projected(node)
    case "GEOGCS" => geodeticWkt1(node)
    case "PROJCS" => projectedWkt1(node)
    case "BOUNDCRS" =>
      // source CRS with the abridged transformation folded in as towgs84
      val src = node.child("SOURCECRS").flatMap(_.args.collectFirst { case n: WktNode => n })
        .getOrElse(fail("BOUNDCRS without SOURCECRS"))
      val tr = node.child("ABRIDGEDTRANSFORMATION")
      val base = toObject(src) match {
        case c: WktCrsDef => c
        case _ => fail("BOUNDCRS source is not a CRS")
      }
      tr match {
        case Some(t) =>
          val p = paramsOf(t)
          def v(code: Int, d: Double) = p.get(code).map(_._1).getOrElse(d)
          // abridged transformation parameters are already m / arcsec / ppm
          val tow = Seq(v(8605, 0), v(8606, 0), v(8607, 0), v(8608, 0),
            v(8609, 0), v(8610, 0), v(8611, 0)).mkString(",")
          base.copy(projString = s"${base.projString} towgs84=$tow")
        case None => base
      }
    case "COORDINATEOPERATION" => operation(node)
    case other => fail(s"unsupported object $other")
  }

  // ---------------------------------------------------------------- pieces

  /** "+a=... +rf=..." (or +b) from ELLIPSOID/SPHEROID[name, a, invf, unit]. */
  private def ellipsoidTokens(crs: WktNode): String = {
    val datum = crs.child("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE",
      "DATUMENSEMBLE").getOrElse(fail("CRS without datum"))
    val ell = datum.child("ELLIPSOID", "SPHEROID")
      .orElse(datum.children("MEMBER").headOption.flatMap(_.child("ELLIPSOID")))
      .getOrElse(fail("datum without ellipsoid"))
    val nums = ell.numbers
    if (nums.length < 2) fail("ellipsoid needs a and 1/f")
    val unitFactor = ell.child("LENGTHUNIT", "UNIT").flatMap(_.numbers.headOption).getOrElse(1.0)
    val a = nums(0) * unitFactor
    val rf = nums(1)
    if (rf == 0.0) s"a=$a b=$a" else s"a=$a rf=$rf"
  }

  /** well-known prime meridians whose WKT1 value may be the DD.MMSSsss
    * or decimal-degree form regardless of the declared angular unit
    * (reference io.cpp:2183-2219). */
  private val primeMeridiansDMS: Seq[(String, Int, Int, Double)] = Seq(
    ("Lisbon", -9, 7, 54.862), ("Bogota", -74, 4, 51.3),
    ("Madrid", -3, 41, 14.55), ("Rome", 12, 27, 8.4),
    ("Bern", 7, 26, 22.5), ("Jakarta", 106, 48, 27.79),
    ("Ferro", -17, 40, 0), ("Brussels", 4, 22, 4.71),
    ("Stockholm", 18, 3, 29.8), ("Athens", 23, 42, 58.815),
    ("Oslo", 10, 43, 22.5), ("Paris RGS", 2, 20, 13.95),
    ("Paris_RGS", 2, 20, 13.95))

  private val GRAD2RAD = math.Pi / 200.0

  /** prime meridian longitude in degrees (0 when absent/greenwich).
    * A PRIMEM without an inline unit inherits the enclosing CRS's angular
    * unit (reference buildPrimeMeridian, io.cpp:2158); the GDAL/ESRI WKT1
    * departures — Paris given as its decimal-degree value under a grad
    * unit, and known meridians given in DD.MMSSsss or decimal degrees
    * whatever the unit says — are corrected the way io.cpp:2177-2219
    * does. */
  private def pmDegrees(crs: WktNode,
                        defaultToRad: Double = GeoMath.DEG2RAD): Double =
    crs.child("PRIMEM", "PRIMEMERIDIAN").map { pm =>
      var v = pm.numbers.headOption.getOrElse(0.0)
      var toRad = pm.child("ANGLEUNIT", "UNIT").flatMap(_.numbers.headOption)
        .getOrElse(defaultToRad)
      val name = pm.args.collectFirst { case s: String => s }.getOrElse("")
      if (name == "Paris" && math.abs(v - 2.33722917) < 1e-8 &&
          math.abs(toRad - GRAD2RAD) < 1e-12) {
        v = 2.5969213
      } else primeMeridiansDMS.find(_._1 == name).foreach {
        case (_, d, m, s) =>
          val sign = if (d >= 0) 1 else -1
          val asDecimal = sign * (math.abs(d) + m / 100.0 + s / 10000.0)
          val asDegrees = sign * (math.abs(d) + m / 60.0 + s / 3600.0)
          if (math.abs(v - asDecimal) < 1e-8 || math.abs(v - asDegrees) < 1e-8) {
            v = asDegrees
            toRad = GeoMath.DEG2RAD
          }
      }
      v * toRad * GeoMath.RAD2DEG
    }.getOrElse(0.0)

  private final case class CsInfo(kind: String, dims: Int, latFirst: Boolean,
                                  geocentric: Boolean, angToRad: Double,
                                  lengthToM: Double)

  private def csInfo(crs: WktNode): CsInfo = {
    val cs = crs.child("CS")
    val kind = cs.flatMap(_.args.collectFirst { case n: WktNode => n.keyword })
      .getOrElse("ELLIPSOIDAL")
    val dims = cs.flatMap(_.numbers.headOption).map(_.toInt).getOrElse(2)
    val axes = crs.children("AXIS")
    def orientationOf(ax: WktNode): String =
      ax.args.collectFirst { case n: WktNode if n.args.isEmpty => n.keyword }.getOrElse("")
    val ordered = axes.sortBy(ax =>
      ax.child("ORDER").flatMap(_.numbers.headOption).getOrElse(0.0))
    val first = ordered.headOption.map(orientationOf).getOrElse("EAST")
    val geocentric = ordered.exists(ax =>
      ax.strings.exists(s => s.contains("geocentricX") || s.contains("(X)"))) &&
      kind.equalsIgnoreCase("CARTESIAN") && dims == 3
    // unit may sit on each axis or once at CS level (a sibling node)
    def unitOf(kw: String*): Option[Double] =
      ordered.headOption.flatMap(_.child(kw: _*)).flatMap(_.numbers.headOption)
        .orElse(crs.child(kw: _*).flatMap(_.numbers.headOption))
    CsInfo(kind.toUpperCase, dims,
      latFirst = first == "NORTH" || first == "SOUTH",
      geocentric = geocentric,
      angToRad = unitOf("ANGLEUNIT").getOrElse(GeoMath.DEG2RAD),
      lengthToM = unitOf("LENGTHUNIT").getOrElse(1.0))
  }

  private def geodetic(crs: WktNode): WktCrsDef = {
    val ell = ellipsoidTokens(crs)
    val pmDeg = pmDegrees(crs)
    val pmTok = if (pmDeg != 0.0) s" pm=$pmDeg" else ""
    val cs = csInfo(crs)
    if (cs.geocentric || (cs.kind == "CARTESIAN" && cs.dims == 3))
      WktCrsDef(s"proj=geocent $ell$pmTok units=m no_defs",
        isGeographic = false, isGeocentric = true, latFirst = false,
        angularUnitToRad = GeoMath.DEG2RAD, is3D = true,
        name = crs.name.getOrElse(""))
    else
      WktCrsDef(s"proj=longlat $ell$pmTok no_defs",
        isGeographic = true, isGeocentric = false, latFirst = cs.latFirst,
        angularUnitToRad = cs.angToRad, is3D = cs.dims == 3,
        name = crs.name.getOrElse(""))
  }

  // -------------------------------------------------- conversion parameters

  /** EPSG parameter-name fallbacks for PARAMETER nodes without ID. */
  private val paramNameToCode: Map[String, Int] = Map(
    "latitude of natural origin" -> 8801,
    "longitude of natural origin" -> 8802,
    "scale factor at natural origin" -> 8805,
    "false easting" -> 8806, "false northing" -> 8807,
    "latitude of false origin" -> 8821, "longitude of false origin" -> 8822,
    "latitude of 1st standard parallel" -> 8823,
    "latitude of 2nd standard parallel" -> 8824,
    "easting at false origin" -> 8826, "northing at false origin" -> 8827,
    "latitude of standard parallel" -> 8832,
    "longitude of origin" -> 8833,
    "x-axis translation" -> 8605, "y-axis translation" -> 8606,
    "z-axis translation" -> 8607,
    "x-axis rotation" -> 8608, "y-axis rotation" -> 8609,
    "z-axis rotation" -> 8610, "scale difference" -> 8611,
    "rate of change of x-axis translation" -> 1040,
    "rate of change of y-axis translation" -> 1041,
    "rate of change of z-axis translation" -> 1042,
    "rate of change of x-axis rotation" -> 1043,
    "rate of change of y-axis rotation" -> 1044,
    "rate of change of z-axis rotation" -> 1045,
    "rate of change of scale difference" -> 1046,
    "parameter reference epoch" -> 1047)

  /** code → (value, unit-factor-to-SI, unit-kind) for every PARAMETER. */
  private def paramsOf(conv: WktNode): Map[Int, (Double, Double)] =
    conv.children("PARAMETER").flatMap { p =>
      val code = p.child("ID").flatMap(_.numbers.headOption).map(_.toInt)
        .orElse(p.name.flatMap(n => paramNameToCode.get(n.toLowerCase)))
      val value = p.numbers.headOption
      val unit = p.child("LENGTHUNIT", "ANGLEUNIT", "SCALEUNIT", "TIMEUNIT", "UNIT")
        .flatMap(_.numbers.headOption)
      (code, value) match {
        case (Some(c), Some(v)) => Some(c -> (v, unit.getOrElse(Double.NaN)))
        case _ => None
      }
    }.toMap

  private final class P(m: Map[Int, (Double, Double)]) {
    def angleDeg(code: Int, d: Double = Double.NaN): Double = m.get(code) match {
      case Some((v, u)) =>
        val toRad = if (u.isNaN) GeoMath.DEG2RAD else u
        v * toRad * GeoMath.RAD2DEG
      case None => if (d.isNaN) fail(s"missing parameter $code") else d
    }
    def lengthM(code: Int, d: Double = Double.NaN): Double = m.get(code) match {
      case Some((v, u)) => v * (if (u.isNaN) 1.0 else u)
      case None => if (d.isNaN) fail(s"missing parameter $code") else d
    }
    def scaleK(code: Int, d: Double = Double.NaN): Double = m.get(code) match {
      case Some((v, u)) => v * (if (u.isNaN) 1.0 else u)
      case None => if (d.isNaN) fail(s"missing parameter $code") else d
    }
    def arcsec(code: Int, d: Double = 0.0): Double = m.get(code) match {
      case Some((v, u)) =>
        val rad = v * (if (u.isNaN) GeoMath.DEG2RAD / 3600.0 else u)
        rad / (GeoMath.DEG2RAD / 3600.0)
      case None => d
    }
    def ppm(code: Int, d: Double = 0.0): Double = m.get(code) match {
      case Some((v, u)) => v * (if (u.isNaN) 1e-6 else u) / 1e-6
      case None => d
    }
    def years(code: Int, d: Double = Double.NaN): Double = m.get(code) match {
      // TIMEUNIT["year", seconds-per-year] — the value is already in years
      case Some((v, _)) => v
      case None => if (d.isNaN) fail(s"missing parameter $code") else d
    }
    // kinematic rates: WKT "per year" unit factors are SI-per-second
    // (e.g. ANGLEUNIT["milliarc-seconds per year", 1.536e-16 rad/s]);
    // helmert wants per-YEAR values
    private val SPY = 31556925.445
    def rateM(code: Int, d: Double = 0.0): Double = m.get(code) match {
      case Some((v, u)) => v * (if (u.isNaN) 1.0 else u * SPY)
      case None => d
    }
    def rateArcsec(code: Int, d: Double = 0.0): Double = m.get(code) match {
      case Some((v, u)) =>
        val radPerYear = v * (if (u.isNaN) GeoMath.DEG2RAD / 3600.0 else u * SPY)
        radPerYear / (GeoMath.DEG2RAD / 3600.0)
      case None => d
    }
    def ratePpm(code: Int, d: Double = 0.0): Double = m.get(code) match {
      case Some((v, u)) => v * (if (u.isNaN) 1e-6 else u * SPY) / 1e-6
      case None => d
    }
    def has(code: Int): Boolean = m.contains(code)
  }

  private val methodNameToCode: Map[String, Int] = Map(
    "transverse mercator" -> 9807,
    "lambert conic conformal (1sp)" -> 9801,
    "lambert conic conformal (2sp)" -> 9802,
    "mercator (variant a)" -> 9804, "mercator (variant b)" -> 9805,
    "oblique stereographic" -> 9809,
    "polar stereographic (variant a)" -> 9810,
    "polar stereographic (variant b)" -> 9829,
    "lambert azimuthal equal area" -> 9820,
    "albers equal area" -> 9822,
    "cassini-soldner" -> 9806,
    "american polyconic" -> 9818,
    "popular visualisation pseudo mercator" -> 1024,
    "geocentric translations (geocentric domain)" -> 1031,
    "position vector transformation (geocentric domain)" -> 1033,
    "coordinate frame rotation (geocentric domain)" -> 1032,
    "time-dependent position vector tfm (geocentric)" -> 1053,
    "time-dependent coordinate frame rotation (geocen)" -> 1056,
    "position vector transformation (geog2d domain)" -> 9606,
    "coordinate frame rotation (geog2d domain)" -> 9607)

  private def methodCode(conv: WktNode): Int = {
    val m = conv.child("METHOD", "PROJECTION").getOrElse(fail("missing METHOD"))
    m.child("ID").flatMap(_.numbers.headOption).map(_.toInt)
      .orElse(m.name.flatMap(n => methodNameToCode.get(n.toLowerCase)))
      .getOrElse(fail(s"unsupported method ${m.name.getOrElse("?")}"))
  }

  private def projected(crs: WktNode): WktCrsDef = {
    val base = crs.child("BASEGEOGCRS", "BASEGEODCRS")
      .getOrElse(fail("PROJCRS without base CRS"))
    val ell = ellipsoidTokens(base)
    val pmDeg = pmDegrees(base)
    val pmTok = if (pmDeg != 0.0) s" pm=$pmDeg" else ""
    val conv = crs.child("CONVERSION").getOrElse(fail("PROJCRS without CONVERSION"))
    val p = new P(paramsOf(conv))
    val code = methodCode(conv)
    val core = code match {
      case 9807 =>
        s"proj=tmerc lat_0=${p.angleDeg(8801)} lon_0=${p.angleDeg(8802)} " +
          s"k=${p.scaleK(8805, 1.0)} x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9801 =>
        val la = p.angleDeg(8801)
        s"proj=lcc lat_1=$la lat_0=$la lon_0=${p.angleDeg(8802)} " +
          s"k_0=${p.scaleK(8805, 1.0)} x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9802 | 9803 =>
        s"proj=lcc lat_0=${p.angleDeg(8821)} lon_0=${p.angleDeg(8822)} " +
          s"lat_1=${p.angleDeg(8823)} lat_2=${p.angleDeg(8824)} " +
          s"x_0=${p.lengthM(8826, 0.0)} y_0=${p.lengthM(8827, 0.0)}"
      case 9804 =>
        s"proj=merc lon_0=${p.angleDeg(8802)} k=${p.scaleK(8805, 1.0)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9805 =>
        s"proj=merc lat_ts=${p.angleDeg(8823)} lon_0=${p.angleDeg(8802)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9809 =>
        s"proj=sterea lat_0=${p.angleDeg(8801)} lon_0=${p.angleDeg(8802)} " +
          s"k=${p.scaleK(8805, 1.0)} x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9810 =>
        s"proj=stere lat_0=${p.angleDeg(8801)} lon_0=${p.angleDeg(8802)} " +
          s"k=${p.scaleK(8805, 1.0)} x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9829 =>
        val ts = p.angleDeg(8832)
        val pole = if (ts >= 0) 90 else -90
        s"proj=stere lat_0=$pole lat_ts=$ts lon_0=${p.angleDeg(8833)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9820 =>
        s"proj=laea lat_0=${p.angleDeg(8801)} lon_0=${p.angleDeg(8802)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9822 =>
        s"proj=aea lat_0=${p.angleDeg(8821)} lon_0=${p.angleDeg(8822)} " +
          s"lat_1=${p.angleDeg(8823)} lat_2=${p.angleDeg(8824)} " +
          s"x_0=${p.lengthM(8826, 0.0)} y_0=${p.lengthM(8827, 0.0)}"
      case 9806 =>
        s"proj=cass lat_0=${p.angleDeg(8801)} lon_0=${p.angleDeg(8802)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 9818 =>
        s"proj=poly lat_0=${p.angleDeg(8801)} lon_0=${p.angleDeg(8802)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case 1024 =>
        s"proj=webmerc lat_0=${p.angleDeg(8801, 0.0)} lon_0=${p.angleDeg(8802, 0.0)} " +
          s"x_0=${p.lengthM(8806, 0.0)} y_0=${p.lengthM(8807, 0.0)}"
      case other => fail(s"unsupported conversion method $other")
    }
    val cs = csInfo(crs)
    val unitTok =
      if (cs.lengthToM == 1.0) " units=m"
      else s" to_meter=${cs.lengthToM}"
    WktCrsDef(s"$core $ell$pmTok$unitTok no_defs",
      isGeographic = false, isGeocentric = false, latFirst = cs.latFirst,
      angularUnitToRad = GeoMath.DEG2RAD, is3D = cs.dims == 3,
      name = crs.name.getOrElse(""))
  }

  // --------------------------------------------------------- WKT1 dialects

  /** WKT1 GEOGCS (GDAL/ESRI): DATUM/SPHEROID + PRIMEM + angular UNIT.
    * Axis order is lon-lat unless explicit AXIS nodes lead with latitude
    * (the reference's parsed non-registry WKT1 objects are lon-first). */
  private def geodeticWkt1(crs: WktNode): WktCrsDef = {
    val ell = ellipsoidTokens(crs)
    val unitToRad = crs.child("UNIT").flatMap(_.numbers.headOption)
      .getOrElse(GeoMath.DEG2RAD)
    val pmDeg = pmDegrees(crs, unitToRad)
    val pmTok = if (pmDeg != 0.0) s" pm=$pmDeg" else ""
    val latFirst = crs.children("AXIS").headOption
      .flatMap(_.args.collectFirst { case s: String => s })
      .exists(_.toLowerCase.startsWith("lat"))
    WktCrsDef(s"proj=longlat $ell$pmTok no_defs",
      isGeographic = true, isGeocentric = false, latFirst = latFirst,
      angularUnitToRad = unitToRad, is3D = false,
      name = crs.name.getOrElse(""))
  }

  /** WKT1 PROJCS: the GDAL / ESRI projection and parameter naming mapped
    * onto the same projection cores as the WKT2 path. Angular parameters
    * are in degrees (the OGR convention), linear ones in the PROJCS
    * linear unit. */
  private def projectedWkt1(crs: WktNode): WktCrsDef = {
    val geogcs = crs.child("GEOGCS").getOrElse(fail("PROJCS without GEOGCS"))
    val ell = ellipsoidTokens(geogcs)
    val geogUnitToRad = geogcs.child("UNIT").flatMap(_.numbers.headOption)
      .getOrElse(GeoMath.DEG2RAD)
    val pmDeg = pmDegrees(geogcs, geogUnitToRad)
    val pmTok = if (pmDeg != 0.0) s" pm=$pmDeg" else ""
    val projName = crs.child("PROJECTION")
      .flatMap(_.args.collectFirst { case s: String => s })
      .getOrElse(fail("PROJCS without PROJECTION")).toLowerCase
    val unitToM = crs.child("UNIT").flatMap(_.numbers.headOption).getOrElse(1.0)
    val params: Map[String, Double] = crs.children("PARAMETER").flatMap { p =>
      for {
        n <- p.args.collectFirst { case s: String => s }
        v <- p.numbers.headOption
      } yield n.toLowerCase -> v
    }.toMap
    def a(keys: String*): Double =
      keys.iterator.flatMap(params.get).nextOption().getOrElse(0.0)
    def k(d: Double): Double =
      params.getOrElse("scale_factor", d)
    def l(key: String): Double = params.getOrElse(key, 0.0) * unitToM
    val xy = s"x_0=${l("false_easting")} y_0=${l("false_northing")}"
    val latO = a("latitude_of_origin", "latitude_of_center")
    val lonO = a("central_meridian", "longitude_of_center")
    val core = projName match {
      case "transverse_mercator" | "transverse_mercator_complex" |
           "gauss_kruger" =>
        s"proj=tmerc lat_0=$latO lon_0=$lonO k=${k(1.0)} $xy"
      case "lambert_conformal_conic_1sp" =>
        s"proj=lcc lat_1=$latO lat_0=$latO lon_0=$lonO k_0=${k(1.0)} $xy"
      case "lambert_conformal_conic_2sp" =>
        s"proj=lcc lat_0=$latO lon_0=$lonO " +
          s"lat_1=${a("standard_parallel_1")} lat_2=${a("standard_parallel_2")} $xy"
      case "lambert_conformal_conic" =>
        // ESRI uses one name for both: a scale factor without a second
        // parallel marks the 1SP form
        if (params.contains("standard_parallel_2"))
          s"proj=lcc lat_0=$latO lon_0=$lonO " +
            s"lat_1=${a("standard_parallel_1")} lat_2=${a("standard_parallel_2")} $xy"
        else
          s"proj=lcc lat_1=${a("standard_parallel_1", "latitude_of_origin")} " +
            s"lat_0=$latO lon_0=$lonO k_0=${k(1.0)} $xy"
      case "mercator_1sp" =>
        // GDAL ticket-3026 hack (reference io.cpp:4215-4242): a non-zero
        // latitude_of_origin on Mercator_1SP is really Mercator_2SP with
        // that latitude as the standard parallel
        if (params.get("latitude_of_origin").exists(_ != 0.0))
          s"proj=merc lat_ts=$latO lon_0=$lonO $xy"
        else s"proj=merc lon_0=$lonO k=${k(1.0)} $xy"
      case "mercator_2sp" | "mercator" =>
        s"proj=merc lat_ts=${a("standard_parallel_1")} lon_0=$lonO $xy"
      case "mercator_auxiliary_sphere" =>
        s"proj=webmerc lat_0=$latO lon_0=$lonO $xy"
      case "oblique_stereographic" | "double_stereographic" =>
        s"proj=sterea lat_0=$latO lon_0=$lonO k=${k(1.0)} $xy"
      case "polar_stereographic" =>
        // reference io.cpp:4244-4296: scale_factor absent or 1 selects
        // variant B (lat_ts = latitude_of_origin, pole from its sign);
        // variant A (k at the pole) only when |lat_0| == 90
        if (k(1.0) == 1.0) {
          val pole = if (latO >= 0) 90 else -90
          s"proj=stere lat_0=$pole lat_ts=$latO lon_0=$lonO $xy"
        } else if (math.abs(math.abs(latO) - 90) < 1e-10)
          s"proj=stere lat_0=$latO lon_0=$lonO k=${k(1.0)} $xy"
        else fail("Polar_Stereographic with scale_factor != 1 needs lat_0=±90")
      case "stereographic" =>
        // ESRI: polar at the poles, double stereographic elsewhere
        if (math.abs(math.abs(latO) - 90) < 1e-9)
          s"proj=stere lat_0=$latO lon_0=$lonO k=${k(1.0)} $xy"
        else s"proj=sterea lat_0=$latO lon_0=$lonO k=${k(1.0)} $xy"
      case "stereographic_north_pole" =>
        s"proj=stere lat_0=90 lat_ts=${a("standard_parallel_1")} lon_0=$lonO $xy"
      case "stereographic_south_pole" =>
        s"proj=stere lat_0=-90 lat_ts=${a("standard_parallel_1")} lon_0=$lonO $xy"
      case "lambert_azimuthal_equal_area" =>
        s"proj=laea lat_0=$latO lon_0=$lonO $xy"
      case "albers_conic_equal_area" | "albers" =>
        s"proj=aea lat_0=$latO lon_0=$lonO " +
          s"lat_1=${a("standard_parallel_1")} lat_2=${a("standard_parallel_2")} $xy"
      case "cassini_soldner" | "cassini" =>
        s"proj=cass lat_0=$latO lon_0=$lonO $xy"
      case "polyconic" =>
        s"proj=poly lat_0=$latO lon_0=$lonO $xy"
      case "equirectangular" | "equidistant_cylindrical" | "plate_carree" =>
        s"proj=eqc lat_ts=${a("standard_parallel_1")} lon_0=$lonO $xy"
      case "sinusoidal" => s"proj=sinu lon_0=$lonO $xy"
      case "mollweide" => s"proj=moll lon_0=$lonO $xy"
      case "robinson" => s"proj=robin lon_0=$lonO $xy"
      case other => fail(s"unsupported WKT1 projection $other")
    }
    val unitTok = if (unitToM == 1.0) " units=m" else s" to_meter=$unitToM"
    WktCrsDef(s"$core $ell$pmTok$unitTok no_defs",
      isGeographic = false, isGeocentric = false, latFirst = false,
      angularUnitToRad = GeoMath.DEG2RAD, is3D = false,
      name = crs.name.getOrElse(""))
  }

  private def operation(op: WktNode): WktOpDef = {
    val p = new P(paramsOf(op))
    val code = methodCode(op)
    // geocentric-domain methods only: a lone helmert expects cartesian
    // coordinates (the geog2D-domain variants need cart hops and are out
    // of this mapper's scope)
    val conventions = Map(
      1031 -> "position_vector", // translations only; convention irrelevant
      1033 -> "position_vector", 1032 -> "coordinate_frame",
      1053 -> "position_vector", 1056 -> "coordinate_frame")
    val conv = conventions.getOrElse(code, fail(s"unsupported operation method $code"))
    val statics = s"x=${p.lengthM(8605, 0.0)} y=${p.lengthM(8606, 0.0)} " +
      s"z=${p.lengthM(8607, 0.0)} rx=${p.arcsec(8608)} ry=${p.arcsec(8609)} " +
      s"rz=${p.arcsec(8610)} s=${p.ppm(8611)}"
    val kinematic =
      if (code == 1053 || code == 1056)
        s" dx=${p.rateM(1040)} dy=${p.rateM(1041)} dz=${p.rateM(1042)}" +
          s" drx=${p.rateArcsec(1043)} dry=${p.rateArcsec(1044)} drz=${p.rateArcsec(1045)}" +
          s" ds=${p.ratePpm(1046)} t_epoch=${p.years(1047)}"
      else ""
    WktOpDef(s"proj=helmert $statics convention=$conv$kinematic",
      name = op.name.getOrElse(""))
  }
}
