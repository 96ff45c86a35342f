package graft.proj.wkt

import graft.proj.{EpsgDb, EpsgMeta}

/** `-o SQL` export: proj.db INSERT statements for a CRS under a private
  * authority/code (`--output-id HOBU:MY_CRS`).
  *
  * Behavioral provenance (no code copied): reference
  * src/iso19111/factory.cpp DatabaseContext exportAsSQL paths — the
  * GEODETIC_CRS_/CONVERSION_/USAGE_ derived code naming, PROJ
  * EXTENT_UNKNOWN/SCOPE_UNKNOWN usages for unregistered objects, the
  * EPSG-referencing vs fully-materialized (--authority) variants, and the
  * column layouts of data/sql/proj_db_table_defs.sql.
  */
object SqlOut {

  private def db = EpsgDb.db
  private def meta = EpsgMeta.meta

  private def q(s: String) = "'" + s.replace("'", "''") + "'"
  private def ref(key: String): String = {
    val i = key.indexOf(':')
    q(key.substring(0, i)) + "," + q(key.substring(i + 1))
  }
  private def unknownUsage(auth: String, table: String, code: String): String = {
    // derived codes already embed the table prefix; the usage code does
    // not repeat it (USAGE_GEODETIC_CRS_MY_CRS, USAGE_PROJECTED_CRS_MY_CRS)
    val tu = table.toUpperCase
    val usageCode =
      if (code.startsWith(tu + "_")) "USAGE_" + code
      else "USAGE_" + tu + "_" + code
    s"INSERT INTO usage VALUES(${q(auth)},${q(usageCode)}," +
      s"${q(table)},${q(auth)},${q(code)},'PROJ','EXTENT_UNKNOWN','PROJ','SCOPE_UNKNOWN');"
  }

  /** a registry geodetic CRS re-registered under a private id (the
    * `--dump-db-structure --output-id HOBU:XXXX EPSG:4326` shape). */
  def registryGeodetic(code: String, outAuth: String,
                       outCode: String): Option[Seq[String]] = {
    val g = db.geodetic.get(code).getOrElse(return None)
    val cm = meta.crs.get(code).getOrElse(return None)
    val kindText = g.kind match {
      case EpsgDb.Geog2D => "geographic 2D"
      case EpsgDb.Geog3D => "geographic 3D"
      case _ => "geocentric"
    }
    val extentKey = meta.extents.values.find(_.name == cm.areaName).map(_.code)
      .getOrElse(return None)
    val scopeKey = meta.scopeByText.get(cm.scope).getOrElse(return None)
    Some(Seq(
      s"INSERT INTO geodetic_crs VALUES(${q(outAuth)},${q(outCode)}," +
        s"${q(g.name)},''," + s"${q(kindText)},${ref(cm.csKey)}," +
        s"${ref(g.datum)},NULL,0);",
      s"INSERT INTO usage VALUES(${q(outAuth)}," +
        s"${q("USAGE_GEODETIC_CRS_" + outCode)},'geodetic_crs'," +
        s"${q(outAuth)},${q(outCode)},${ref(extentKey)},${ref(scopeKey)});"))
  }

  /** a PROJ-string projected CRS (`+proj=merc ... +datum=WGS84 +type=crs`)
    * registered under a private id; `materialize` additionally clones the
    * ellipsoid / prime meridian / datum under the private authority (the
    * reference's behavior when --authority excludes EPSG). */
  def projStringProjected(projStr: String, outAuth: String, outCode: String,
                          materialize: Boolean): Option[Seq[String]] = {
    val kv = scala.collection.mutable.Map.empty[String, String]
    var projName = ""
    for (tok <- projStr.trim.split("\\s+").map(_.stripPrefix("+"))) {
      val i = tok.indexOf('=')
      val (k, v) = if (i < 0) (tok, "") else (tok.substring(0, i), tok.substring(i + 1))
      if (k == "proj") projName = v else kv(k) = v
    }
    if (kv.get("datum") != Some("WGS84")) return None
    def p(k: String) = kv.getOrElse(k, "0")
    def n(k: String) = WktOut.num(p(k))
    // (method key, method name, params as (code, name, value, uom key))
    val method: (String, String, Seq[(Int, String, String, String)]) =
      projName match {
        case "merc" if kv.contains("lat_ts") =>
          ("EPSG:9805", "Mercator (variant B)", Seq(
            (8823, "Latitude of 1st standard parallel", n("lat_ts"), "EPSG:9122"),
            (8802, "Longitude of natural origin", n("lon_0"), "EPSG:9122"),
            (8806, "False easting", n("x_0"), "EPSG:9001"),
            (8807, "False northing", n("y_0"), "EPSG:9001")))
        case "merc" =>
          ("EPSG:9804", "Mercator (variant A)", Seq(
            (8801, "Latitude of natural origin", n("lat_0"), "EPSG:9122"),
            (8802, "Longitude of natural origin", n("lon_0"), "EPSG:9122"),
            (8805, "Scale factor at natural origin",
              WktOut.num(kv.getOrElse("k", kv.getOrElse("k_0", "1"))), "EPSG:9201"),
            (8806, "False easting", n("x_0"), "EPSG:9001"),
            (8807, "False northing", n("y_0"), "EPSG:9001")))
        case "tmerc" =>
          ("EPSG:9807", "Transverse Mercator", Seq(
            (8801, "Latitude of natural origin", n("lat_0"), "EPSG:9122"),
            (8802, "Longitude of natural origin", n("lon_0"), "EPSG:9122"),
            (8805, "Scale factor at natural origin",
              WktOut.num(kv.getOrElse("k", kv.getOrElse("k_0", "1"))), "EPSG:9201"),
            (8806, "False easting", n("x_0"), "EPSG:9001"),
            (8807, "False northing", n("y_0"), "EPSG:9001")))
        case _ => return None
      }

    val geodCode = "GEODETIC_CRS_" + outCode
    val convCode = "CONVERSION_" + outCode
    val out = Vector.newBuilder[String]

    val datumRef =
      if (!materialize) "'EPSG','6326'"
      else {
        val datumCode = "GEODETIC_DATUM_" + geodCode
        val ellCode = "ELLPS_" + datumCode
        val pmCode = "PM_" + datumCode
        out += s"INSERT INTO ellipsoid VALUES(${q(outAuth)},${q(ellCode)}," +
          "'WGS 84','','IAU_2015','399',6378137,'EPSG','9001'," +
          "298.257223563,NULL,0);"
        out += s"INSERT INTO prime_meridian VALUES(${q(outAuth)},${q(pmCode)}," +
          "'Greenwich',0,'EPSG','9122',0);"
        out += s"INSERT INTO geodetic_datum VALUES(${q(outAuth)},${q(datumCode)}," +
          s"'World Geodetic System 1984','',${q(outAuth)},${q(ellCode)}," +
          s"${q(outAuth)},${q(pmCode)},NULL,NULL,NULL,NULL,NULL,0);"
        out += unknownUsage(outAuth, "geodetic_datum", datumCode)
        s"${q(outAuth)},${q(datumCode)}"
      }

    // a proj-string geographic base is lon-lat ordered (cs EPSG:6424)
    out += s"INSERT INTO geodetic_crs VALUES(${q(outAuth)},${q(geodCode)}," +
      s"'unknown','','geographic 2D','EPSG','6424',$datumRef,NULL,0);"
    out += unknownUsage(outAuth, "geodetic_crs", geodCode)

    val (methodKey, methodName, params) = method
    val paramSql = params.map { case (pc, pn, pv, uom) =>
      s"'EPSG',${q(pc.toString)},${q(pn)},$pv,${ref(uom)}"
    }
    val nullSlots = Seq.fill(7 - params.length)("NULL,NULL,NULL,NULL,NULL,NULL")
    out += s"INSERT INTO conversion VALUES(${q(outAuth)},${q(convCode)}," +
      s"'unknown',''," + s"${ref(methodKey)},${q(methodName)}," +
      (paramSql ++ nullSlots).mkString(",") + ",0);"
    out += unknownUsage(outAuth, "conversion", convCode)

    out += s"INSERT INTO projected_crs VALUES(${q(outAuth)},${q(outCode)}," +
      s"'unknown','','EPSG','4400',${q(outAuth)},${q(geodCode)}," +
      s"${q(outAuth)},${q(convCode)},NULL,0);"
    out += unknownUsage(outAuth, "projected_crs", outCode)
    Some(out.result())
  }
}
