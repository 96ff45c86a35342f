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
    (u.map(_.name).getOrElse("degree"), WktOut.num(u.map(_.factor)
      .getOrElse(0.0174532925199433)), uomKey)
  }

  /** WKT1:GDAL node for a geographic CRS code; None for other kinds. */
  def gdalGeogNode(code: String): Option[Node] = {
    val g = db.geodetic.get(code).getOrElse(return None)
    if (g.kind == EpsgDb.Geocentric) return None
    val dm = meta.datums(g.datum)
    val ell = meta.ells(dm.ellKey)
    val pm = meta.pms(dm.pmKey)
    val (_, uFactor, uKey) = angularUnit(code)
    val spheroid = Node("SPHEROID", Seq(Q(ell.name), Raw(ell.aText),
      Raw(if (ell.rfText.nonEmpty) ell.rfText else "0"), auth(dm.ellKey)))
    val datum = Node("DATUM", Seq(Q(gdalDatumName(g.datum)), Child(spheroid),
      auth(g.datum)))
    val primem = Node("PRIMEM", Seq(Q(pm.name), Raw(WktOut.num(pm.lonText)),
      auth(dm.pmKey)))
    val unit = Node("UNIT", Seq(Q("degree"), Raw(uFactor), auth(uKey)))
    Some(Node("GEOGCS", Seq(Q(g.name), Child(datum), Child(primem),
      Child(unit), auth(code))))
  }

  /** WKT1:ESRI single-line string for a geographic CRS code. */
  def esriGeogString(code: String): Option[String] = {
    val g = db.geodetic.get(code).getOrElse(return None)
    if (g.kind == EpsgDb.Geocentric) return None
    val dm = meta.datums(g.datum)
    val ell = meta.ells(dm.ellKey)
    val pm = meta.pms(dm.pmKey)
    val (_, uFactor, _) = angularUnit(code)
    val datumName0 = plainDatumName(g.datum)
    val datumName =
      if (datumName0 == "World Geodetic System 1984") "D_WGS_1984"
      else "D_" + morphNameToESRI(datumName0)
    val ellName =
      if (ell.name == "WGS 84") "WGS_1984" else morphNameToESRI(ell.name)
    val gcsName = "GCS_" + datumName.stripPrefix("D_")
    def dec(v: String): String = if (v.contains('.')) v else v + ".0"
    Some(s"""GEOGCS["$gcsName",DATUM["$datumName",SPHEROID["$ellName",""" +
      s"""${dec(ell.aText)},${if (ell.rfText.nonEmpty) ell.rfText else "0.0"}]],""" +
      s"""PRIMEM["${pm.name}",${dec(WktOut.num(pm.lonText))}],""" +
      s"""UNIT["Degree",$uFactor]]""")
  }
}
