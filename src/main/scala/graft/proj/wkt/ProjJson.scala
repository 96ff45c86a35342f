package graft.proj.wkt

import graft.core.{GeoMath, ProjErr, ProjError}
import graft.proj.ops.TinshiftOps.{JArr, JNum, JObj, JStr, JVal, Json}

/** PROJJSON front-end (the schema the reference ships at
  * data/projjson.schema.json): a thin adapter that synthesizes the
  * equivalent WKT node tree, so the WktMap CRS/operation mapping is reused
  * wholesale — one mapper, two text formats.
  */
object ProjJson {

  def looksLikeProjJson(s: String): Boolean = {
    val t = s.dropWhile(_.isWhitespace)
    t.startsWith("{") && t.contains("\"type\"")
  }

  private def fail(msg: String): Nothing =
    throw ProjError(ProjErr.INVALID_OP_WRONG_SYNTAX, s"projjson: $msg")

  def toObject(text: String): WktObject =
    WktMap.toObject(toWkt(Json.parse(text) match {
      case o: JObj => o
      case _ => fail("not a JSON object")
    }))

  // ------------------------------------------------------------ small json
  private def str(o: JObj, k: String): Option[String] =
    o.fields.get(k).collect { case JStr(v) => v }
  private def num(o: JObj, k: String): Option[Double] =
    o.fields.get(k).collect { case JNum(v, _) => v }
  private def obj(o: JObj, k: String): Option[JObj] =
    o.fields.get(k).collect { case v: JObj => v }
  private def arr(o: JObj, k: String): Vector[JObj] =
    o.fields.get(k) match {
      case Some(JArr(items)) => items.collect { case v: JObj => v }
      case _ => Vector.empty
    }

  /** unit (a name string or a unit object) → the WKT unit node. */
  private def unitNode(v: JVal): WktNode = v match {
    case JStr(name) => name match {
      case "degree" => WktNode("ANGLEUNIT", Vector("degree", GeoMath.DEG2RAD))
      case "grad" => WktNode("ANGLEUNIT", Vector("grad", math.Pi / 200))
      case "radian" => WktNode("ANGLEUNIT", Vector("radian", 1.0))
      case "metre" => WktNode("LENGTHUNIT", Vector("metre", 1.0))
      case "unity" => WktNode("SCALEUNIT", Vector("unity", 1.0))
      case "year" => WktNode("TIMEUNIT", Vector("year", 31556925.445))
      case other => fail(s"unknown unit name $other")
    }
    case o: JObj =>
      val factor = num(o, "conversion_factor").getOrElse(fail("unit without factor"))
      val name = str(o, "name").getOrElse("unit")
      val kw = str(o, "type").getOrElse("") match {
        case "AngularUnit" => "ANGLEUNIT"
        case "LinearUnit" => "LENGTHUNIT"
        case "ScaleUnit" => "SCALEUNIT"
        case "TimeUnit" => "TIMEUNIT"
        case other => fail(s"unknown unit type $other")
      }
      WktNode(kw, Vector(name, factor))
    case _ => fail("bad unit")
  }

  private def idNode(o: JObj): Vector[WktNode] = obj(o, "id") match {
    case Some(id) =>
      Vector(WktNode("ID", Vector(str(id, "authority").getOrElse("EPSG"),
        num(id, "code").getOrElse(0.0))))
    case None => Vector.empty
  }

  private def ellipsoidNode(e: JObj): WktNode = {
    val a = num(e, "semi_major_axis").orElse(num(e, "radius"))
      .getOrElse(fail("ellipsoid without semi_major_axis"))
    val rf = num(e, "inverse_flattening").getOrElse {
      num(e, "semi_minor_axis") match {
        case Some(b) if b != a => a / (a - b)
        case _ => 0.0 // sphere
      }
    }
    WktNode("ELLIPSOID", Vector(str(e, "name").getOrElse(""), a, rf))
  }

  private def datumNodes(crs: JObj): Vector[WktNode] = {
    val datum = obj(crs, "datum").orElse(obj(crs, "datum_ensemble"))
      .getOrElse(fail("CRS without datum"))
    val ell = obj(datum, "ellipsoid").getOrElse(fail("datum without ellipsoid"))
    val d = WktNode("DATUM", Vector(str(datum, "name").getOrElse(""),
      ellipsoidNode(ell)))
    val pm = obj(crs, "prime_meridian").orElse(obj(datum, "prime_meridian")).map { p =>
      val (lonDeg: Double, unit: WktNode) = p.fields.get("longitude") match {
        case Some(JNum(v, _)) => (v, unitNode(JStr("degree")))
        case Some(o: JObj) =>
          val u = o.fields.get("unit").map(unitNode).getOrElse(unitNode(JStr("degree")))
          (num(o, "value").getOrElse(0.0), u)
        case _ => (0.0, unitNode(JStr("degree")))
      }
      WktNode("PRIMEM", Vector(str(p, "name").getOrElse(""), lonDeg, unit))
    }
    Vector(d) ++ pm.toVector
  }

  private def csNodes(crs: JObj): Vector[Any] = obj(crs, "coordinate_system") match {
    case None => Vector.empty
    case Some(cs) =>
      val subtype = str(cs, "subtype").getOrElse("ellipsoidal")
      val axes = arr(cs, "axis")
      val csNode = WktNode("CS",
        Vector(WktNode(subtype.toUpperCase, Vector.empty), axes.length.toDouble))
      val axisNodes = axes.zipWithIndex.map { case (ax, i) =>
        val dir = str(ax, "direction").getOrElse("east")
        WktNode("AXIS", Vector(
          s"${str(ax, "name").getOrElse("")} (${str(ax, "abbreviation").getOrElse("")})",
          WktNode(dir.toUpperCase, Vector.empty),
          WktNode("ORDER", Vector((i + 1).toDouble)),
          ax.fields.get("unit").map(unitNode).getOrElse(unitNode(JStr("metre")))))
      }
      (csNode +: axisNodes).toVector
  }

  private def parameterNodes(op: JObj): Vector[WktNode] =
    arr(op, "parameters").map { p =>
      WktNode("PARAMETER", Vector[Any](
        str(p, "name").getOrElse(""),
        num(p, "value").getOrElse(fail("parameter without value"))) ++
        p.fields.get("unit").map(unitNode).toVector ++ idNode(p))
    }

  private def methodNode(op: JObj): WktNode = {
    val m = obj(op, "method").getOrElse(fail("operation without method"))
    WktNode("METHOD", Vector[Any](str(m, "name").getOrElse("")) ++ idNode(m))
  }

  /** PROJJSON object → the WKT node WktMap consumes. */
  def toWkt(o: JObj): WktNode = str(o, "type").getOrElse(fail("missing type")) match {
    case "GeographicCRS" =>
      WktNode("GEOGCRS", Vector[Any](str(o, "name").getOrElse("")) ++
        datumNodes(o) ++ csNodes(o))
    case "GeodeticCRS" =>
      WktNode("GEODCRS", Vector[Any](str(o, "name").getOrElse("")) ++
        datumNodes(o) ++ csNodes(o))
    case "ProjectedCRS" =>
      val base = obj(o, "base_crs").getOrElse(fail("ProjectedCRS without base_crs"))
      val conv = obj(o, "conversion").getOrElse(fail("ProjectedCRS without conversion"))
      val convNode = WktNode("CONVERSION", Vector[Any](
        str(conv, "name").getOrElse("")) ++
        Vector(methodNode(conv)) ++ parameterNodes(conv))
      WktNode("PROJCRS", Vector[Any](str(o, "name").getOrElse(""),
        WktNode("BASEGEOGCRS", Vector[Any](str(base, "name").getOrElse("")) ++
          datumNodes(base))) ++ Vector(convNode) ++ csNodes(o))
    case "Transformation" | "ConcatenatedOperation" | "CoordinateOperation" |
         "SingleOperation" =>
      WktNode("COORDINATEOPERATION", Vector[Any](str(o, "name").getOrElse("")) ++
        Vector(methodNode(o)) ++ parameterNodes(o))
    case "BoundCRS" =>
      val src = obj(o, "source_crs").getOrElse(fail("BoundCRS without source_crs"))
      val tr = obj(o, "transformation").getOrElse(fail("BoundCRS without transformation"))
      WktNode("BOUNDCRS", Vector(
        WktNode("SOURCECRS", Vector(toWkt(src))),
        WktNode("ABRIDGEDTRANSFORMATION", Vector[Any](
          str(tr, "name").getOrElse("")) ++
          Vector(methodNode(tr)) ++ parameterNodes(tr))))
    case other => fail(s"unsupported PROJJSON type $other")
  }
}
