package graft.proj.wkt

import graft.proj.{EpsgDb, EpsgMeta}
import graft.proj.EpsgDb.Bbox
import graft.proj.EpsgMeta.{Meta => EMeta}

/** WKT2 *output* formatting (the reverse of Wkt.scala's parser): renders
  * CRSs, datums, ellipsoids and coordinate operations from the generated
  * EPSG sidecar back out as WKT2:2019 / WKT2:2015 text, matching the
  * reference's WKTFormatter byte-for-byte on the projinfo corpus.
  *
  * Behavioral provenance (no code copied): reference src/iso19111/io.cpp
  * WKTFormatter (indentation = 4, children on new lines, ID suppression
  * below a node that already printed one), internal.cpp toString (%.15g
  * with a %.14g retry on repeating-9 artifacts), coordinatesystem.cpp
  * axis-name lowering rules.
  */
object WktOut {

  // ------------------------------------------------------------- AST
  sealed trait Part
  /** quoted string (embedded quotes double) */
  final case class Q(s: String) extends Part
  /** bare token: number text, keyword (north/east), DB-verbatim text */
  final case class Raw(s: String) extends Part
  /** nested node; bump adds extra indent levels (CS's AXIS siblings) */
  final case class Child(n: Node) extends Part
  final case class Node(kw: String, parts: Seq[Part], bump: Int = 0)

  def node(kw: String, parts: Part*): Node = Node(kw, parts.toSeq)

  def render(n: Node, multiline: Boolean): String = {
    val sb = new StringBuilder
    def emit(n: Node, level: Int): Unit = {
      sb ++= n.kw; sb += '['
      var first = true
      for (p <- n.parts) {
        if (!first) sb += ','
        p match {
          case Child(c) =>
            if (multiline) { sb += '\n'; sb ++= " " * (4 * (level + 1 + c.bump)) }
            emit(c, level + 1 + c.bump)
          case Q(s) => sb += '"'; sb ++= s.replace("\"", "\"\""); sb += '"'
          case Raw(s) => sb ++= s
        }
        first = false
      }
      sb += ']'
    }
    emit(n, 0)
    sb.toString
  }

  /** the reference's number-to-WKT text: %.15g, retry %.14g when the text
    * carries a repeating-9 artifact, e->E, exact zero -> "0". */
  def num(d: Double): String = {
    if (d == 0.0) return "0"
    var s = graft.cli.CFormat.format("%.15g", d)
    if (s.contains("9999999999")) s = graft.cli.CFormat.format("%.14g", d)
    s.replace("e", "E")
  }
  def num(text: String): String = if (text.isEmpty) "0" else num(text.toDouble)

  // --------------------------------------------------------- helpers
  private def db = EpsgDb.db
  private def meta: EMeta = EpsgMeta.meta

  private def codeOf(key: String): String = key.substring(key.indexOf(':') + 1)
  private def authOf(key: String): String = key.substring(0, key.indexOf(':'))

  def idNode(key: String): Node = {
    val code = codeOf(key)
    // numeric codes print bare, alphanumeric ones quoted (WKTFormatter
    // add(int) vs addQuotedString)
    val codePart = if (code.nonEmpty && code.forall(_.isDigit)) Raw(code) else Q(code)
    Node("ID", Seq(Q(authOf(key)), codePart))
  }

  /** unit node; the reference normalizes the EPSG axis-degree variants to
    * plain "degree" (common.cpp UnitOfMeasure::DEGREE). */
  def unitNode(uomKey: String, ids: Boolean): Node = {
    val u = meta.uoms(uomKey)
    val code = codeOf(uomKey)
    val (name, factor) = code match {
      case "9102" | "9122" => ("degree", 0.017453292519943295)
      case _ => (u.name, u.factor)
    }
    val kw = u.typ match {
      case "angle" => "ANGLEUNIT"
      case "length" => "LENGTHUNIT"
      case "scale" => "SCALEUNIT"
      case "time" => "TIMEUNIT"
      case _ => "UNIT"
    }
    val idPart = if (ids) Seq(Child(idNode(uomKey))) else Nil
    Node(kw, Seq(Q(name), Raw(num(factor))) ++ idPart)
  }

  def ellipsoidNode(ellKey: String, ids: Boolean, selfId: Boolean): Node = {
    val e = meta.ells(ellKey)
    val unit = unitNode(e.uomKey, ids = false)
    val idPart = if (selfId) Seq(Child(idNode(ellKey))) else Nil
    Node("ELLIPSOID", Seq(Q(e.name), Raw(num(e.aText)),
      Raw(if (e.rfText.isEmpty) "0" else num(e.rfText)),
      Child(unit)) ++ idPart)
  }

  def primemNode(pmKey: String, ids: Boolean): Node = {
    val p = meta.pms(pmKey)
    val u = meta.uoms(p.uomKey)
    // sexagesimal D.MS longitudes convert to decimal degrees (the
    // reference normalizes prime meridians to degree on load)
    val (value, uKey) =
      if (u.name.startsWith("sexagesimal")) {
        val raw = if (p.lonText.isEmpty) 0.0 else p.lonText.toDouble
        val sign = if (raw < 0) -1.0 else 1.0
        val v = math.abs(raw)
        val d = math.floor(v)
        val mm = math.floor((v - d) * 100 + 1e-9)
        val ss = (v - d - mm / 100.0) * 10000.0
        (num(sign * (d + mm / 60.0 + ss / 3600.0)), "EPSG:9102")
      } else (num(p.lonText), p.uomKey)
    Node("PRIMEM", Seq(Q(p.name), Raw(value), Child(unitNode(uKey, ids = false))))
  }

  /** WKT2:2019 datum or ensemble; 2015 flattens ensembles to DATUM.
    * `ids`: may this subtree emit IDs (no ancestor printed one)?
    * `selfId`: print this node's own ID (standalone -k output). */
  def datumNode(datumKey: String, v2019: Boolean, ids: Boolean,
                selfId: Boolean, forceDatum: Boolean = false): Node = {
    val d = db.datums(datumKey)
    val dm = meta.datums(datumKey)
    val members = db.ensembleMembers.getOrElse(datumKey, Nil)
    if (v2019 && members.nonEmpty && !forceDatum) {
      // ENSEMBLE carries no implicit id for suppression purposes
      // (reference datum.cpp exports it with hasId=false and appends ID)
      val memberNodes = members.map { m =>
        val mn = db.datums.get(m).map(_.name).getOrElse(m)
        val idPart = if (ids) Seq(Child(idNode(m))) else Nil
        Child(Node("MEMBER", Seq(Q(mn)) ++ idPart))
      }
      val acc = if (dm.accText.nonEmpty && dm.accText != "-")
        Seq(Child(Node("ENSEMBLEACCURACY", Seq(Raw(dm.accText))))) else Nil
      val idPart = if (selfId && ids) Seq(Child(idNode(datumKey))) else Nil
      Node("ENSEMBLE", Seq(Q(d.name)) ++ memberNodes ++
        Seq(Child(ellipsoidNode(dm.ellKey, ids, selfId = ids))) ++ acc ++ idPart)
    } else {
      val name =
        if (members.nonEmpty) d.name.stripSuffix(" ensemble") else d.name
      val anchor = if (dm.anchor.nonEmpty)
        Seq(Child(Node("ANCHOR", Seq(Q(dm.anchor))))) else Nil
      val anchorEpoch = if (dm.anchorEpoch.nonEmpty && v2019)
        Seq(Child(Node("ANCHOREPOCH", Seq(Raw(dm.anchorEpoch))))) else Nil
      val idPart = if (selfId && ids) Seq(Child(idNode(datumKey))) else Nil
      Node("DATUM", Seq(Q(name),
        Child(ellipsoidNode(dm.ellKey, ids = false, selfId = false))) ++
        anchor ++ anchorEpoch ++ idPart)
    }
  }

  /** axis designation per the reference's WKT2 rules: name lowered at the
    * first letter plus " (abbrev)"; bare latitude/longitude names drop the
    * abbreviation; Easting/Northing in order and geocentric X/Y/Z collapse
    * to the parenthesized abbreviation. */
  private def axisDesignation(a: EpsgMeta.Axis, order: Int): String = {
    val lowered =
      if (a.name.isEmpty) ""
      else a.name.substring(0, 1).toLowerCase + a.name.substring(1)
    val paren = s"(${a.abbrev})"
    if (a.orientation.startsWith("geocentric")) paren
    else if (order == 1 && a.name == "Easting" && a.abbrev == "E") paren
    else if (order == 2 && a.name == "Northing" && a.abbrev == "N") paren
    else if (a.name == "Latitude" || a.name == "Longitude") lowered
    else if (a.abbrev.isEmpty) lowered
    else s"$lowered $paren"
  }

  private def axisDirection(a: EpsgMeta.Axis): String = a.orientation match {
    case "geocentricX" => "geocentricX"
    case "geocentricY" => "geocentricY"
    case "geocentricZ" => "geocentricZ"
    case o => o
  }

  /** CS node plus AXIS siblings (rendered one level deeper, as the
    * reference does). Returns the parts to splice into the CRS node. */
  def csParts(csKey: String, ids: Boolean): Seq[Part] = {
    val cs = meta.css(csKey)
    csPartsFrom(cs.typ, cs.axes, ids)
  }

  def csPartsFrom(typ: String, axesIn: Seq[EpsgMeta.Axis],
                  ids: Boolean): Seq[Part] = {
    val n = axesIn.length
    val csNode = Node("CS", Seq(Raw(typ), Raw(n.toString)))
    val axes = axesIn.zipWithIndex.map { case (a, i) =>
      val order = i + 1
      val orderPart =
        if (n > 1) Seq(Child(Node("ORDER", Seq(Raw(order.toString))))) else Nil
      Child(Node("AXIS", Seq(Q(axisDesignation(a, order)),
        Raw(axisDirection(a))) ++ orderPart ++
        Seq(Child(unitNode(a.uomKey, ids))), bump = 1))
    }
    Child(csNode) +: axes
  }

  /** a projected CRS promoted to 3D (projinfo --3d): 3D base, appended
    * ellipsoidal-height axis, unknown scope, a promotion remark, no own
    * id — so nested identifiers print (reference promoteTo3D). */
  def promotedProjCrsNode(code: String): Option[Node] = {
    val p = db.projected(code)
    val cm = meta.crs(code)
    val base = db.geodetic(p.baseGeog)
    val base3d = db.geodetic.values.find(g => g.datum == base.datum &&
      g.kind == EpsgDb.Geog3D && g.name == base.name)
    val (convKey, _) = EpsgMeta.projConv.getOrElse(code, ("", ""))
    base3d.map { b3 =>
      val baseNode = geodCrsNode(b3.code, v2019 = true, ids = true,
        withUsage = false, withCs = false, withRemark = false)
        .copy(kw = "BASEGEOGCRS")
      val conv = if (convKey.nonEmpty && meta.convs.contains(convKey))
        Seq(Child(conversionNode(convKey, ids = true))) else Nil
      val axes3d = meta.css(cm.csKey).axes :+
        EpsgMeta.Axis("Ellipsoidal height", "h", "up", "EPSG:9001")
      val cs = csPartsFrom(meta.css(cm.csKey).typ, axes3d, ids = true)
      val usage = usageParts("unknown", cm.areaName, p.bbox, v2019 = true)
      val remark = Seq(Child(Node("REMARK",
        Seq(Q(s"Promoted to 3D from $code")))))
      Node("PROJCRS", Seq(Q(p.name), Child(baseNode)) ++ conv ++ cs ++
        usage ++ remark)
    }
  }

  /** USAGE (2019) or SCOPE/AREA/BBOX (2015) parts for a DB object. */
  def usageParts(scope: String, areaName: String, bbox: Option[Bbox],
                 v2019: Boolean): Seq[Part] = {
    val scopeN = Node("SCOPE", Seq(Q(if (scope.isEmpty) "unknown" else scope)))
    val areaDesc = meta.descOfArea(areaName)
    val areaN = areaDesc.map(d => Node("AREA", Seq(Q(d))))
    val bboxN = bbox.map(b => Node("BBOX", Seq(Raw(num(b.south)),
      Raw(num(b.west)), Raw(num(b.north)), Raw(num(b.east)))))
    val inner = Seq(Child(scopeN)) ++ areaN.map(Child(_)) ++ bboxN.map(Child(_))
    if (v2019) Seq(Child(Node("USAGE", inner)))
    else inner
  }

  private def remarkPart(remark: String): Seq[Part] =
    if (remark.isEmpty) Nil else Seq(Child(Node("REMARK", Seq(Q(remark)))))

  // ------------------------------------------------------------- CRSs

  /** geographic / geocentric CRS node.
    * `withUsage`: false inside SOURCECRS/TARGETCRS and BASEGEOGCRS. */
  def geodCrsNode(code: String, v2019: Boolean, ids: Boolean,
                  withUsage: Boolean = true, withCs: Boolean = true,
                  withRemark: Boolean = true): Node = {
    val g = db.geodetic(code)
    val cm = meta.crs(code)
    val kw =
      if (!v2019) "GEODCRS"
      else if (g.kind == EpsgDb.Geocentric) "GEODCRS" else "GEOGCRS"
    // this node prints its own ID when allowed, so the subtree below it
    // suppresses IDs (reference WKTFormatter stackHasId)
    val dynamic =
      if (v2019) db.datums(g.datum).frameEpoch.map(fe =>
        Child(Node("DYNAMIC", Seq(Child(Node("FRAMEEPOCH", Seq(Raw(num(fe))))))))).toSeq
      else Nil
    val datum = datumNode(g.datum, v2019, ids = false, selfId = false)
    val pm = primemNode(meta.datums(g.datum).pmKey, ids = false)
    val cs = if (withCs) csParts(cm.csKey, ids = false) else Nil
    val usage =
      if (withUsage) usageParts(cm.scope, cm.areaName, g.bbox, v2019) else Nil
    val idPart = if (ids) Seq(Child(idNode(code))) else Nil
    val remark = if (withRemark && withUsage) remarkPart(cm.remark) else Nil
    Node(kw, Seq(Q(g.name)) ++ dynamic ++ Seq(Child(datum), Child(pm)) ++
      cs ++ usage ++ idPart ++ remark)
  }

  /** CONVERSION node from the sidecar's K record. */
  def conversionNode(convKey: String, ids: Boolean,
                     methodIds: Boolean = true): Node = {
    val k = meta.convs(convKey)
    // METHOD and PARAMETER print their IDs even below identified parents
    // (reference WKTFormatter startNode's METHOD/PARAMETER exception)
    val method = Node("METHOD", Seq(Q(k.methodName)) ++
      (if (methodIds && k.methodKey.nonEmpty) Seq(Child(idNode(k.methodKey))) else Nil))
    val params = k.params.map { case (pcode, vtext, uomKey) =>
      val pname = meta.paramNames.getOrElse(pcode, s"parameter $pcode")
      Child(Node("PARAMETER", Seq(Q(pname), Raw(num(vtext)),
        Child(unitNode(uomKey, ids = false))) ++
        (if (methodIds) Seq(Child(idNode(s"EPSG:$pcode"))) else Nil)))
    }
    val idPart = if (ids) Seq(Child(idNode(convKey))) else Nil
    Node("CONVERSION", Seq(Q(k.name), Child(method)) ++ params ++ idPart)
  }

  /** projected CRS node. */
  def projCrsNode(code: String, v2019: Boolean, ids: Boolean,
                  withUsage: Boolean = true): Node = {
    val p = db.projected(code)
    val cm = meta.crs(code)
    val base = db.geodetic(p.baseGeog)
    // the base CRS prints its own id even under an identified parent
    // (reference crs.cpp exports it like SOURCECRS: hasId faked to false)
    val baseNode0 = geodCrsNode(p.baseGeog, v2019, ids = true,
      withUsage = false, withCs = false, withRemark = false)
    val baseNode = baseNode0.copy(kw = if (v2019) "BASEGEOGCRS" else "BASEGEODCRS")
    val (convKey, _) = EpsgMeta.projConv.getOrElse(code, ("", ""))
    val conv = if (convKey.nonEmpty && meta.convs.contains(convKey))
      Seq(Child(conversionNode(convKey, ids = false))) else Nil
    val cs = csParts(cm.csKey, ids = false)
    val usage =
      if (withUsage) usageParts(cm.scope, cm.areaName, p.bbox, v2019) else Nil
    val idPart = if (ids) Seq(Child(idNode(code))) else Nil
    val remark = if (withUsage) remarkPart(cm.remark) else Nil
    Node("PROJCRS", Seq(Q(p.name), Child(baseNode)) ++ conv ++ cs ++ usage ++
      idPart ++ remark)
  }

  /** vertical CRS node. */
  def vertCrsNode(code: String, v2019: Boolean, ids: Boolean,
                  withUsage: Boolean = true): Node = {
    val v = db.vertical(code)
    val cm = meta.crs(code)
    val vd = meta.vdatums.get(v.datum)
    val dynamic = vd.map(_.frameEpoch).filter(_.nonEmpty).map(fe =>
      Child(Node("DYNAMIC", Seq(Child(Node("FRAMEEPOCH", Seq(Raw(num(fe))))))))).toSeq
    val datum = Node("VDATUM", Seq(Q(vd.map(_.name).getOrElse(v.datum))))
    val cs = csParts(cm.csKey, ids = false)
    val usage =
      if (withUsage) usageParts(cm.scope, cm.areaName, v.bbox, v2019) else Nil
    val idPart = if (ids) Seq(Child(idNode(code))) else Nil
    val remark = if (withUsage) remarkPart(cm.remark) else Nil
    Node("VERTCRS", Seq(Q(v.name)) ++ dynamic ++ Seq(Child(datum)) ++ cs ++
      usage ++ idPart ++ remark)
  }

  /** any CRS by code: geodetic, projected, vertical, compound. */
  def crsNode(code: String, v2019: Boolean, ids: Boolean,
              withUsage: Boolean = true): Option[Node] = {
    if (db.geodetic.contains(code))
      Some(geodCrsNode(code, v2019, ids, withUsage))
    else if (db.projected.contains(code))
      Some(projCrsNode(code, v2019, ids, withUsage))
    else if (db.vertical.contains(code))
      Some(vertCrsNode(code, v2019, ids, withUsage))
    else db.compound.get(code).flatMap { x =>
      val cm = meta.crs(code)
      for {
        h <- crsNode(x.horiz, v2019, ids, withUsage = false)
        v <- crsNode(x.vert, v2019, ids, withUsage = false)
      } yield {
        val usage = if (withUsage)
          usageParts(cm.scope, cm.areaName, None, v2019) else Nil
        val idPart = if (ids) Seq(Child(idNode(code))) else Nil
        Node("COMPOUNDCRS", Seq(Q(x.name), Child(h), Child(v)) ++ usage ++
          idPart ++ remarkPart(cm.remark))
      }
    }
  }

  /** standalone VDATUM (projinfo of a bare vertical-datum name). */
  def vdatumNode(key: String, ids: Boolean): Node = {
    val vd = meta.vdatums(key)
    Node("VDATUM", Seq(Q(vd.name)) ++
      (if (ids) Seq(Child(idNode(key))) else Nil))
  }
}
