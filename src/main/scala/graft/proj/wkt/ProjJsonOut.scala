package graft.proj.wkt

import graft.proj.{EpsgDb, EpsgMeta}

/** PROJJSON *output* for geographic/geodetic CRSs (schema v0.7 — the
  * structure the reference's JSONFormatter emits for projinfo -o PROJJSON).
  *
  * Behavioral provenance (no code copied): reference
  * src/iso19111/crs.cpp / datum.cpp _exportToJSON — member lists with ids,
  * inline ellipsoid, string-typed ensemble accuracy, simple-unit axes,
  * scope/area/bbox usage tail.
  */
object ProjJsonOut {

  private def db = EpsgDb.db
  private def meta = EpsgMeta.meta

  private final class W {
    private val sb = new StringBuilder
    private var indent = 0
    private var firstInScope = List(true)
    def open(brace: Char): this.type = { sb += brace; indent += 1
      firstInScope = true :: firstInScope; this }
    def close(brace: Char): this.type = { indent -= 1
      firstInScope = firstInScope.tail
      sb += '\n'; sb ++= "  " * indent; sb += brace; this }
    private def sep(): Unit = {
      if (!firstInScope.head) sb += ','
      firstInScope = false :: firstInScope.tail
      sb += '\n'; sb ++= "  " * indent
    }
    def key(k: String): this.type = { sep(); sb ++= "\"" + k + "\": "; this }
    def item(): this.type = { sep(); this }
    def str(v: String): this.type = {
      sb ++= "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""; this }
    def raw(v: String): this.type = { sb ++= v; this }
    override def toString: String = sb.toString
  }

  private def idFields(w: W, key: String): Unit = {
    val i = key.indexOf(':')
    w.key("id").open('{')
    w.key("authority").str(key.substring(0, i))
    w.key("code").raw(key.substring(i + 1))
    w.close('}')
  }

  private def ellipsoidFields(w: W, ellKey: String): Unit = {
    val ell = meta.ells(ellKey)
    w.key("ellipsoid").open('{')
    w.key("name").str(ell.name)
    w.key("semi_major_axis").raw(ell.aText)
    if (ell.rfText.nonEmpty) w.key("inverse_flattening").raw(ell.rfText)
    else if (ell.bText.nonEmpty) w.key("semi_minor_axis").raw(ell.bText)
    w.close('}')
  }

  /** simple unit name when the uom is one of the schema's well-known units
    * (reference JSONFormatter simple-string unit). */
  private def unitName(uomKey: String): String = {
    val n = meta.uoms.get(uomKey).map(_.name).getOrElse("degree")
    // "degree (supplier to define representation)" prints as plain degree
    val i = n.indexOf(" (")
    if (i > 0) n.substring(0, i) else n
  }

  private def datumFields(w: W, datumKey: String): Unit = {
    val dm = meta.datums(datumKey)
    val members = db.ensembleMembers.getOrElse(datumKey, Nil)
    if (members.nonEmpty) {
      val d = db.datums(datumKey)
      w.key("datum_ensemble").open('{')
      w.key("name").str(d.name)
      w.key("members").open('[')
      for (m <- members) {
        w.item().open('{')
        w.key("name").str(db.datums.get(m).map(_.name).getOrElse(m))
        idFields(w, m)
        w.close('}')
      }
      w.close(']')
      ellipsoidFields(w, dm.ellKey)
      if (dm.accText.nonEmpty && dm.accText != "-")
        w.key("accuracy").str(dm.accText)
      idFields(w, datumKey)
      w.close('}')
    } else {
      val d = db.datums(datumKey)
      w.key("datum").open('{')
      w.key("type").str(
        if (d.frameEpoch.isDefined) "DynamicGeodeticReferenceFrame"
        else "GeodeticReferenceFrame")
      w.key("name").str(d.name)
      d.frameEpoch.foreach(fe => w.key("frame_reference_epoch")
        .raw(WktOut.num(fe)))
      ellipsoidFields(w, dm.ellKey)
      w.close('}')
    }
  }

  private def csFields(w: W, csKey: String): Unit = {
    w.key("coordinate_system").open('{')
    w.key("subtype").str(meta.css.get(csKey).map(_.typ).getOrElse("ellipsoidal"))
    w.key("axis").open('[')
    for (a <- meta.css.get(csKey).map(_.axes).getOrElse(Nil)) {
      w.item().open('{')
      w.key("name").str(a.name)
      w.key("abbreviation").str(a.abbrev)
      w.key("direction").str(a.orientation)
      w.key("unit").str(unitName(a.uomKey))
      w.close('}')
    }
    w.close(']')
    w.close('}')
  }

  private def usageFields(w: W, scope: String, areaName: String,
                          bbox: Option[EpsgDb.Bbox]): Unit = {
    if (scope.nonEmpty) w.key("scope").str(scope)
    meta.descOfArea(areaName).foreach(d => w.key("area").str(d))
    bbox.foreach { b =>
      w.key("bbox").open('{')
      w.key("south_latitude").raw(WktOut.num(b.south))
      w.key("west_longitude").raw(WktOut.num(b.west))
      w.key("north_latitude").raw(WktOut.num(b.north))
      w.key("east_longitude").raw(WktOut.num(b.east))
      w.close('}')
    }
  }

  /** PROJJSON text for a geographic (2D/3D) or geocentric CRS code. */
  def geodCrs(code: String): Option[String] = {
    val g = db.geodetic.get(code).getOrElse(return None)
    val cm = meta.crs(code)
    val w = new W
    w.open('{')
    w.key("$schema").str("https://proj.org/schemas/v0.7/projjson.schema.json")
    w.key("type").str(
      if (g.kind == EpsgDb.Geocentric) "GeodeticCRS" else "GeographicCRS")
    w.key("name").str(g.name)

    datumFields(w, g.datum)
    csFields(w, cm.csKey)
    usageFields(w, cm.scope, cm.areaName, g.bbox)
    idFields(w, code)
    w.close('}')
    Some(w.toString)
  }

  /** PROJJSON text for a projected CRS code. */
  def projCrs(code: String): Option[String] = {
    val p = db.projected.get(code).getOrElse(return None)
    val cm = meta.crs.get(code).getOrElse(return None)
    val base = db.geodetic.get(p.baseGeog).getOrElse(return None)
    val baseCm = meta.crs.get(p.baseGeog).getOrElse(return None)
    val (convKey, _) = EpsgMeta.projConv.getOrElse(code, ("", ""))
    val conv = meta.convs.get(convKey).getOrElse(return None)
    val w = new W
    w.open('{')
    w.key("$schema").str("https://proj.org/schemas/v0.7/projjson.schema.json")
    w.key("type").str("ProjectedCRS")
    w.key("name").str(p.name)
    w.key("base_crs").open('{')
    w.key("type").str(
      if (base.kind == EpsgDb.Geocentric) "GeodeticCRS" else "GeographicCRS")
    w.key("name").str(base.name)
    datumFields(w, base.datum)
    csFields(w, baseCm.csKey)
    idFields(w, p.baseGeog)
    w.close('}')
    w.key("conversion").open('{')
    w.key("name").str(conv.name)
    w.key("method").open('{')
    w.key("name").str(conv.methodName)
    if (conv.methodKey.nonEmpty) idFields(w, conv.methodKey)
    w.close('}')
    w.key("parameters").open('[')
    for ((pcode, vtext, uomKey) <- conv.params) {
      w.item().open('{')
      w.key("name").str(meta.paramNames.getOrElse(pcode, s"parameter $pcode"))
      w.key("value").raw(WktOut.num(vtext))
      w.key("unit").str(unitName(uomKey))
      idFields(w, s"EPSG:$pcode")
      w.close('}')
    }
    w.close(']')
    w.close('}')
    csFields(w, cm.csKey)
    usageFields(w, cm.scope, cm.areaName, p.bbox)
    idFields(w, code)
    w.close('}')
    Some(w.toString)
  }

  /** PROJJSON text for a vertical CRS code. */
  def vertCrs(code: String): Option[String] = {
    val v = db.vertical.get(code).getOrElse(return None)
    val cm = meta.crs.get(code).getOrElse(return None)
    val w = new W
    w.open('{')
    w.key("$schema").str("https://proj.org/schemas/v0.7/projjson.schema.json")
    w.key("type").str("VerticalCRS")
    w.key("name").str(v.name)
    w.key("datum").open('{')
    val vd = meta.vdatums.get(v.datum)
    w.key("type").str(
      if (vd.exists(_.frameEpoch.nonEmpty)) "DynamicVerticalReferenceFrame"
      else "VerticalReferenceFrame")
    w.key("name").str(vd.map(_.name).getOrElse(v.datum))
    vd.map(_.frameEpoch).filter(_.nonEmpty).foreach(fe =>
      w.key("frame_reference_epoch").raw(WktOut.num(fe)))
    w.close('}')
    csFields(w, cm.csKey)
    usageFields(w, cm.scope, cm.areaName, v.bbox)
    idFields(w, code)
    w.close('}')
    Some(w.toString)
  }

  /** PROJJSON text for any CRS code: geodetic, projected, vertical,
    * compound. */
  def crs(code: String): Option[String] = {
    if (db.geodetic.contains(code)) geodCrs(code)
    else if (db.projected.contains(code)) projCrs(code)
    else if (db.vertical.contains(code)) vertCrs(code)
    else db.compound.get(code).flatMap { x =>
      for {
        h <- crs(x.horiz)
        v <- crs(x.vert)
      } yield {
        val w = new W
        w.open('{')
        w.key("$schema")
          .str("https://proj.org/schemas/v0.7/projjson.schema.json")
        w.key("type").str("CompoundCRS")
        w.key("name").str(x.name)
        // components re-indent the standalone texts (their own $schema
        // dropped), two levels deep
        def stripSchema(t: String): String = t.linesIterator
          .filterNot(_.contains("$schema")).mkString("\n")
        def indent(t: String): String = t.linesIterator.zipWithIndex
          .map { case (l, i) => if (i == 0) l else "    " + l }
          .mkString("\n")
        w.key("components").open('[')
        w.item().raw(indent(stripSchema(h)))
        w.item().raw(indent(stripSchema(v)))
        w.close(']')
        idFields(w, code)
        w.close('}')
        w.toString
      }
    }
  }
}
