package graft.proj.wkt

import graft.proj.{EpsgDb, EpsgMeta}
import graft.proj.wkt.WktOut.{Child, Node, Q, Raw}

/** WKT1 output dialects (GDAL and ESRI) for geographic CRSs.
  *
  * Behavioral provenance (no code copied): reference
  * src/iso19111/datum.cpp:1356-1483 (datum/ellipsoid WKT1 naming — ESRI
  * alias morphing, the GDAL "emulate importFromEPSG" underscore rule and
  * its World_Geodetic_System_1984 -> WGS_1984 remap),
  * src/iso19111/io.cpp:848 (morphNameToESRI), src/iso19111/crs.cpp (ESRI
  * GCS naming).
  */
object Wkt1Out {

  private def db = EpsgDb.db
  private def meta = EpsgMeta.meta

  /** reference WKTFormatter::morphNameToESRI: keep [A-Za-z0-9+-], collapse
    * every other run to a single underscore, none at the ends. */
  def morphNameToESRI(name: String): String = {
    for (suffix <- Seq("(m)", "(ftUS)", "(E-N)", "(N-E)"))
      if (name.endsWith(suffix))
        return morphNameToESRI(name.dropRight(suffix.length)) + suffix
    val sb = new StringBuilder
    var pendingUnderscore = false
    for (ch <- name) {
      if (ch == '+' || ch == '-' || ch.isLetterOrDigit && ch < 128) {
        if (pendingUnderscore && sb.nonEmpty) sb += '_'
        sb += ch
        pendingUnderscore = false
      } else pendingUnderscore = true
    }
    sb.toString
  }

  private def auth(key: String): Child = {
    val i = key.indexOf(':')
    Child(Node("AUTHORITY", Seq(Q(key.substring(0, i)), Q(key.substring(i + 1)))))
  }

  /** the non-ensemble datum name: an ensemble drops its " ensemble"
    * suffix (reference DatumEnsemble::asDatum /
    * ensembleNameToNonEnsembleName). */
  private def plainDatumName(datumKey: String): String = {
    val d = db.datums(datumKey)
    if (db.ensembleMembers.contains(datumKey)) d.name.stripSuffix(" ensemble")
    else d.name
  }

  private def gdalDatumName(datumKey: String): String = {
    var n = morphNameToESRI(plainDatumName(datumKey))
    if (n == "World_Geodetic_System_1984") n = "WGS_1984"
    n
  }

  /** angular unit of the CRS's coordinate system: (name, factor text,
    * uom key). */
  private def angularUnit(code: String): (String, String, String) = {
    val cm = meta.crs(code)
    val uomKey = meta.css.get(cm.csKey).flatMap(_.axes.headOption)
      .map(_.uomKey).getOrElse("EPSG:9122")
    val u = meta.uoms.get(uomKey)
    // reference factory.cpp:4638 — EPSG:9122's registered name maps to
    // the plain "degree"
    val name = u.map(_.name).getOrElse("degree") match {
      case "degree (supplier to define representation)" => "degree"
      case n => n
    }
    (name, WktOut.num(u.map(_.factor)
      .getOrElse(0.0174532925199433)), uomKey)
  }

  /** WKT1 (GDAL and ESRI) prints the prime meridian longitude in degrees
    * whatever its registered unit (reference io.cpp:388,397
    * primeMeridianInDegree); sexagesimal DMS values decode first. */
  private def pmLonDegreesText(pm: EpsgMeta.Pm): String = {
    val raw = if (pm.lonText.isEmpty) 0.0 else pm.lonText.toDouble
    val deg = meta.uoms.get(pm.uomKey) match {
      case Some(u) if u.name.startsWith("sexagesimal") =>
        val sign = if (raw < 0) -1.0 else 1.0
        val v = math.abs(raw)
        val d = math.floor(v)
        val mm = math.floor((v - d) * 100 + 1e-9)
        val ss = (v - d - mm / 100.0) * 10000.0
        sign * (d + mm / 60.0 + ss / 3600.0)
      case Some(u) if u.typ == "angle" =>
        if (math.abs(u.factor - 0.017453292519943295) < 1e-12) raw
        else raw * u.factor * 180.0 / math.Pi
      case _ => raw
    }
    WktOut.num(deg)
  }

  /** reference common.cpp:211-218 — ESRI WKT1 capitalizes the common
    * angular/linear unit names. */
  private def esriUnitName(name: String): String = name.toLowerCase match {
    case "degree" => "Degree"
    case "grad" => "Grad"
    case "metre" => "Meter"
    case _ => name
  }

  /** WKT1:GDAL node for a geographic CRS code; None for other kinds. */
  def gdalGeogNode(code: String): Option[Node] = {
    val g = db.geodetic.get(code).getOrElse(return None)
    if (g.kind == EpsgDb.Geocentric) return None
    val dm = meta.datums(g.datum)
    val ell = meta.ells(dm.ellKey)
    val pm = meta.pms(dm.pmKey)
    val (uName, uFactor, uKey) = angularUnit(code)
    val spheroid = Node("SPHEROID", Seq(Q(ell.name), Raw(ell.aText),
      Raw(if (ell.rfText.nonEmpty) ell.rfText else "0"), auth(dm.ellKey)))
    val datum = Node("DATUM", Seq(Q(gdalDatumName(g.datum)), Child(spheroid),
      auth(g.datum)))
    val primem = Node("PRIMEM", Seq(Q(pm.name), Raw(pmLonDegreesText(pm)),
      auth(dm.pmKey)))
    val unit = Node("UNIT", Seq(Q(uName), Raw(uFactor), auth(uKey)))
    Some(Node("GEOGCS", Seq(Q(g.name), Child(datum), Child(primem),
      Child(unit), auth(code))))
  }

  /** numeric value normalized to degree / metre / unity (WKT1 drops the
    * registration unit; sexagesimal and grad encodings convert). */
  private def paramValue(vtext: String, uomKey: String): Double = {
    val raw = if (vtext.isEmpty) 0.0 else vtext.toDouble
    meta.uoms.get(uomKey) match {
      case Some(u) if u.name.startsWith("sexagesimal") =>
        val sign = if (raw < 0) -1.0 else 1.0
        val v = math.abs(raw)
        val d = math.floor(v)
        val mm = math.floor((v - d) * 100 + 1e-9)
        val ss = (v - d - mm / 100.0) * 10000.0
        sign * (d + mm / 60.0 + ss / 3600.0)
      case Some(u) if u.typ == "angle" => raw * u.factor * 180.0 / math.Pi
      case Some(u) => raw * u.factor
      case None => raw
    }
  }

  /** ESRI WKT1 projection names and their canonical parameter order per
    * EPSG method code (reference esriparammappings.cpp — public data).
    * Each parameter is (ESRI name, candidate EPSG codes, default). */
  private type EsriParams = Seq[(String, Seq[Int], Double)]
  private val FE = ("False_Easting", Seq(8806, 8826), 0.0)
  private val FN = ("False_Northing", Seq(8807, 8827), 0.0)
  private val CM = ("Central_Meridian", Seq(8802, 8822), 0.0)
  private val SF = ("Scale_Factor", Seq(8805, 8815), 1.0)
  private val LO = ("Latitude_Of_Origin", Seq(8801, 8821), 0.0)
  private val SP1 = ("Standard_Parallel_1", Seq(8823), 0.0)
  private val SP2 = ("Standard_Parallel_2", Seq(8824), 0.0)
  private val esriMethods: Map[String, (String, EsriParams)] = Map(
    "9807" -> ("Transverse_Mercator", Seq(FE, FN, CM, SF, LO)),
    "9801" -> ("Lambert_Conformal_Conic",
      Seq(FE, FN, CM, ("Standard_Parallel_1", Seq(8801), 0.0), SF, LO)),
    "9802" -> ("Lambert_Conformal_Conic", Seq(FE, FN, CM, SP1, SP2, LO)),
    "9805" -> ("Mercator", Seq(FE, FN, CM, SP1)),
    "1024" -> ("Mercator_Auxiliary_Sphere",
      Seq(FE, FN, CM, SP1, ("Auxiliary_Sphere_Type", Seq(), 0.0))),
    "9810" -> ("Stereographic", Seq(FE, FN, CM, SF, LO)),
    "9820" -> ("Lambert_Azimuthal_Equal_Area", Seq(FE, FN, CM, LO)),
    "9822" -> ("Albers", Seq(FE, FN, CM, SP1, SP2, LO)),
    "9806" -> ("Cassini", Seq(FE, FN, CM, SF, LO)),
    "1028" -> ("Equidistant_Cylindrical", Seq(FE, FN, CM, SP1)),
    "1029" -> ("Equidistant_Cylindrical", Seq(FE, FN, CM, SP1)))

  /** WKT1:ESRI single-line string for a projected CRS code; None when the
    * CRS has no ESRI name or its method is unmapped. */
  def esriProjString(code: String): Option[String] = {
    val p = db.projected.get(code).getOrElse(return None)
    val name = meta.esriNames.getOrElse(code, return None)
    val (convKey, _) = EpsgMeta.projConv.getOrElse(code, ("", ""))
    val conv = meta.convs.get(convKey).getOrElse(return None)
    val methodCode = conv.methodKey.drop(conv.methodKey.indexOf(':') + 1)
    val (projName, spec) = esriMethods.get(methodCode).getOrElse(return None)
    val geog = esriGeogString(p.baseGeog).getOrElse(return None)
    def dec(v: Double): String = {
      val s = WktOut.num(v)
      if (s.contains('.') || s.contains('e') || s.contains('E')) s else s + ".0"
    }
    val byCode = conv.params.map(x => x._1 -> x).toMap
    val params = spec.map { case (en, codes, default) =>
      val v = codes.iterator.flatMap(byCode.get)
        .map(x => paramValue(x._2, x._3)).nextOption().getOrElse(default)
      s"""PARAMETER["$en",${dec(v)}]"""
    }
    val cm = meta.crs(code)
    val uomKey = meta.css.get(cm.csKey).flatMap(_.axes.headOption)
      .map(_.uomKey).getOrElse("EPSG:9001")
    val u = meta.uoms.get(uomKey)
    val unitName0 = u.map(_.name).getOrElse("metre") match {
      case "metre" => "Meter"
      case "foot" => "Foot"
      case "US survey foot" => "Foot_US"
      case other => morphNameToESRI(other.capitalize)
    }
    Some(s"""PROJCS["$name",$geog,PROJECTION["$projName"],""" +
      params.mkString(",") +
      s""",UNIT["$unitName0",${dec(u.map(_.factor).getOrElse(1.0))}]]""")
  }

  /** GDAL WKT1 projection names per EPSG method code (reference io.cpp /
    * esriparammappings — public mapping data). */
  private val gdalMethodNames: Map[String, String] = Map(
    "9807" -> "Transverse_Mercator",
    "9808" -> "Transverse_Mercator_South_Orientated",
    "9801" -> "Lambert_Conformal_Conic_1SP",
    "9802" -> "Lambert_Conformal_Conic_2SP",
    "9804" -> "Mercator_1SP", "9805" -> "Mercator_2SP",
    "9809" -> "Oblique_Stereographic", "9810" -> "Polar_Stereographic",
    "9829" -> "Polar_Stereographic",
    "9820" -> "Lambert_Azimuthal_Equal_Area",
    "9822" -> "Albers_Conic_Equal_Area",
    "9806" -> "Cassini_Soldner",
    "1028" -> "Equirectangular", "1029" -> "Equirectangular",
    "9818" -> "Polyconic",
    "9812" -> "Hotine_Oblique_Mercator",
    "9815" -> "Hotine_Oblique_Mercator_Azimuth_Center",
    "9819" -> "Krovak",
    "9834" -> "Cylindrical_Equal_Area", "9835" -> "Cylindrical_Equal_Area")

  /** GDAL WKT1 parameter names per EPSG parameter code. */
  private val gdalParamNames: Map[Int, String] = Map(
    8801 -> "latitude_of_origin", 8802 -> "central_meridian",
    8805 -> "scale_factor", 8806 -> "false_easting",
    8807 -> "false_northing", 8821 -> "latitude_of_origin",
    8822 -> "central_meridian", 8823 -> "standard_parallel_1",
    8824 -> "standard_parallel_2", 8826 -> "false_easting",
    8827 -> "false_northing", 8811 -> "latitude_of_center",
    8812 -> "longitude_of_center", 8813 -> "azimuth",
    8814 -> "rectified_grid_angle", 8815 -> "scale_factor",
    // Polar Stereographic variant B: the standard parallel prints as
    // latitude_of_origin with no scale_factor (GDAL convention; the
    // importer's k==1 rule round-trips it to variant B)
    8832 -> "latitude_of_origin", 8833 -> "central_meridian")

  /** WKT1:GDAL node for a projected CRS code with a mapped conversion
    * method; falls back to None (section omitted) otherwise. */
  def gdalProjNode(code: String): Option[Node] = {
    val p = db.projected.get(code).getOrElse(return None)
    val (convKey, _) = EpsgMeta.projConv.getOrElse(code, ("", ""))
    val conv = meta.convs.get(convKey).getOrElse(return None)
    val methodCode = conv.methodKey.drop(conv.methodKey.indexOf(':') + 1)
    val projName = gdalMethodNames.get(methodCode).getOrElse(return None)
    val geog = gdalGeogNode(p.baseGeog).getOrElse(return None)
    // WKT1 prints parameter values normalized to degree / metre / unity
    // (unlike WKT2, which keeps the registration unit alongside)
    def paramValue(vtext: String, uomKey: String): String = {
      val raw = if (vtext.isEmpty) 0.0 else vtext.toDouble
      meta.uoms.get(uomKey) match {
        case Some(u) if u.name.startsWith("sexagesimal") =>
          val sign = if (raw < 0) -1.0 else 1.0
          val v = math.abs(raw)
          val d = math.floor(v)
          val mm = math.floor((v - d) * 100 + 1e-9)
          val ss = (v - d - mm / 100.0) * 10000.0
          WktOut.num(sign * (d + mm / 60.0 + ss / 3600.0))
        case Some(u) if u.typ == "angle" =>
          WktOut.num(raw * u.factor * 180.0 / math.Pi)
        case Some(u) => WktOut.num(raw * u.factor)
        case None => WktOut.num(raw)
      }
    }
    val params = conv.params.flatMap { case (pcode, vtext, uomKey) =>
      gdalParamNames.get(pcode).map(n =>
        Child(Node("PARAMETER", Seq(Q(n), Raw(paramValue(vtext, uomKey))))))
    }
    val cm = meta.crs(code)
    val axes = meta.css.get(cm.csKey).map(_.axes).getOrElse(Nil)
    val uomKey = axes.headOption.map(_.uomKey).getOrElse("EPSG:9001")
    val u = meta.uoms.get(uomKey)
    val unit = Node("UNIT", Seq(Q(u.map(_.name).getOrElse("metre")),
      Raw(WktOut.num(u.map(_.factor).getOrElse(1.0))), auth(uomKey)))
    // WKT1 only knows the seven bare direction enums; "North along 90°E"
    // style polar directions collapse to OTHER (reference
    // coordinatesystem.cpp:404-410)
    val wkt1Dirs = Set("NORTH", "SOUTH", "EAST", "WEST", "UP", "DOWN", "OTHER")
    val axisNodes = axes.map { a =>
      val dir0 = a.orientation.toUpperCase
      val dir = if (wkt1Dirs(dir0)) dir0 else "OTHER"
      Child(Node("AXIS", Seq(Q(a.name), Raw(dir))))
    }
    Some(Node("PROJCS", Seq(Q(p.name), Child(geog),
      Child(Node("PROJECTION", Seq(Q(projName))))) ++ params ++
      Seq(Child(unit)) ++ axisNodes ++ Seq(auth(code))))
  }

  /** WKT1:ESRI single-line string for a geographic CRS code. */
  def esriGeogString(code: String): Option[String] = {
    val g = db.geodetic.get(code).getOrElse(return None)
    if (g.kind == EpsgDb.Geocentric) return None
    val dm = meta.datums(g.datum)
    val ell = meta.ells(dm.ellKey)
    val pm = meta.pms(dm.pmKey)
    val (uName, uFactor, _) = angularUnit(code)
    val datumName0 = plainDatumName(g.datum)
    val datumName = meta.esriNames.getOrElse(g.datum,
      if (datumName0 == "World Geodetic System 1984") "D_WGS_1984"
      else "D_" + morphNameToESRI(datumName0))
    val ellName = meta.esriNames.getOrElse(dm.ellKey,
      if (ell.name == "WGS 84") "WGS_1984" else morphNameToESRI(ell.name))
    val gcsName = meta.esriNames.getOrElse(code,
      "GCS_" + datumName.stripPrefix("D_"))
    def dec(v: String): String = if (v.contains('.')) v else v + ".0"
    Some(s"""GEOGCS["$gcsName",DATUM["$datumName",SPHEROID["$ellName",""" +
      s"""${dec(ell.aText)},${if (ell.rfText.nonEmpty) ell.rfText else "0.0"}]],""" +
      s"""PRIMEM["${pm.name}",${dec(pmLonDegreesText(pm))}],""" +
      s"""UNIT["${esriUnitName(uName)}",$uFactor]]""")
  }
}
