package graft.proj

import graft.proj.EpsgDb.Bbox

/** WKT-grade metadata view of the generated coordinate-operation sidecar —
  * the fields the describe-objects-back-out surface (projinfo, WKT2 output)
  * needs and the execution path (EpsgDb) deliberately ignores: extents with
  * names and descriptions, units of measure, ellipsoid/prime-meridian
  * original-unit values, coordinate-system axes, conversions with
  * parameters, vertical datums, scopes/remarks/versions, and the
  * operation-parameter name dictionary.
  *
  * Loaded lazily and only by the description surface, so the per-executor
  * hot path never pays for it. Re-reads the same `/graft/epsg_ops` resource
  * (one pass, a few ms) rather than widening EpsgDb's case classes.
  *
  * Field positions mirror devtools/epsg_ops_gen.py (behavioral provenance:
  * the reference's data/sql SQL scripts — public EPSG data).
  */
object EpsgMeta {

  final case class Extent(code: String, bbox: Option[Bbox], name: String,
                          desc: String)
  final case class Uom(code: String, name: String, factor: Double, typ: String)
  final case class Ell(code: String, name: String, aText: String,
                       rfText: String, bText: String, uomKey: String)
  final case class Pm(code: String, name: String, lonText: String, uomKey: String)
  final case class Axis(name: String, abbrev: String, orientation: String,
                        uomKey: String)
  final case class Cs(code: String, typ: String, axes: Seq[Axis])
  final case class Conv(code: String, name: String, methodKey: String,
                        methodName: String,
                        /** (epsg param code, value text, uom key) */
                        params: Seq[(Int, String, String)],
                        areaName: String, scope: String)
  final case class VDatum(code: String, name: String, frameEpoch: String)
  final case class CrsMeta(areaName: String, scope: String, csKey: String,
                           deprecated: Boolean, remark: String)
  final case class DatumMeta(ellKey: String, pmKey: String, accText: String,
                             anchor: String, anchorEpoch: String)
  final case class OpMeta(scope: String, remark: String, methodName: String,
                          version: String)

  final class Meta(
      val extents: Map[String, Extent],
      val uoms: Map[String, Uom],
      val ells: Map[String, Ell],
      val pms: Map[String, Pm],
      val css: Map[String, Cs],
      val convs: Map[String, Conv],
      val vdatums: Map[String, VDatum],
      val crs: Map[String, CrsMeta],
      val datums: Map[String, DatumMeta],
      val opMeta: Map[String, OpMeta],
      val paramNames: Map[Int, String],
      /** deprecated object -> replacement codes (deprecation table) */
      val replacements: Map[String, Seq[String]],
      /** scope code -> text (usage scope references for SQL export) */
      val scopes: Map[String, String],
      /** registry metadata (EPSG.VERSION, PROJ_DATA.VERSION, layout) */
      val metadata: Map[String, String],
      /** EPSG object -> its ESRI display name (WKT1-ESRI export) */
      val esriNames: Map[String, String]) {

    /** scope text -> smallest-coded scope key (SQL-export reverse lookup) */
    lazy val scopeByText: Map[String, String] =
      scopes.toSeq.sortBy { case (k, _) =>
        k.substring(k.indexOf(':') + 1).toIntOption.getOrElse(Int.MaxValue) }
        .foldLeft(Map.empty[String, String]) { case (m, (k, t)) =>
          if (m.contains(t)) m else m + (t -> k)
        }


    /** extent description for an extent *name* as carried on ops/CRSs
      * (EPSG extent names are unique in practice; first wins). */
    lazy val descByExtentName: Map[String, String] =
      extents.values.foldLeft(Map.empty[String, String]) { (m, e) =>
        if (m.contains(e.name)) m else m + (e.name -> e.desc)
      }

    def descOfArea(areaName: String): Option[String] =
      descByExtentName.get(areaName)

    /** case-insensitive area-of-use name search (reference
      * listAreaOfUseFromName): exact first, then substring. */
    def areasByName(name: String, approx: Boolean): Seq[Extent] = {
      val lower = name.toLowerCase
      val all = extents.values.toSeq.sortBy(e =>
        (e.code.substring(0, e.code.indexOf(':')),
          e.code.substring(e.code.indexOf(':') + 1).toIntOption.getOrElse(0)))
      if (!approx) all.filter(_.name.toLowerCase == lower)
      else all.filter(_.name.toLowerCase.contains(lower))
    }
  }

  lazy val meta: Meta = load()

  private def b64d(s: String): String =
    if (s.isEmpty) "" else new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private def load(): Meta = {
    val in = getClass.getResourceAsStream("/graft/epsg_ops")
    require(in != null, "missing /graft/epsg_ops sidecar")
    val extents = Map.newBuilder[String, Extent]
    val uoms = Map.newBuilder[String, Uom]
    val ells = Map.newBuilder[String, Ell]
    val pms = Map.newBuilder[String, Pm]
    val css = Map.newBuilder[String, Cs]
    val convs = Map.newBuilder[String, Conv]
    val vdatums = Map.newBuilder[String, VDatum]
    val crs = Map.newBuilder[String, CrsMeta]
    val datums = Map.newBuilder[String, DatumMeta]
    val ops = Map.newBuilder[String, OpMeta]
    val pnames = Map.newBuilder[Int, String]
    val scopes = Map.newBuilder[String, String]
    val metadataKv = Map.newBuilder[String, String]
    val esriNames = Map.newBuilder[String, String]
    val esriNameSeen = scala.collection.mutable.Set.empty[String]
    val repl = scala.collection.mutable.Map.empty[String, Vector[String]]

    def bbox(w: String, s: String, e: String, n: String): Option[Bbox] =
      if (w.isEmpty || s.isEmpty || e.isEmpty || n.isEmpty) None
      else Some(Bbox(w.toDouble, s.toDouble, e.toDouble, n.toDouble))
    def at(f: Array[String], i: Int): String = if (i < f.length) f(i) else ""

    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8"), 1 << 20)
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.nonEmpty && line.charAt(0) != '#') {
          val f = line.split("\\|", -1)
          f(0) match {
            case "F" =>
              scopes += f(1) -> b64d(at(f, 2))
            case "G" =>
              metadataKv += f(1) -> at(f, 2)
            case "B" =>
              if (!esriNameSeen.contains(f(1))) {
                esriNameSeen += f(1)
                esriNames += f(1) -> at(f, 2)
              }
            case "E" =>
              extents += f(1) -> Extent(f(1), bbox(f(2), f(3), f(4), f(5)),
                f(6), at(f, 7))
            case "Q" =>
              uoms += f(1) -> Uom(f(1), f(2),
                if (f(3).isEmpty) 0.0 else f(3).toDouble, f(4))
            case "L" =>
              ells += f(1) -> Ell(f(1), f(2), f(3), f(4), f(5), f(6))
            case "R" =>
              pms += f(1) -> Pm(f(1), f(2), f(3), f(4))
            case "S" =>
              val axes = f(3).split(';').iterator.filter(_.nonEmpty).map { a =>
                val p = a.split('~')
                Axis(p(0), at(p, 1), at(p, 2), at(p, 3))
              }.toSeq
              css += f(1) -> Cs(f(1), f(2), axes)
            case "K" =>
              val params = f(5).split(';').iterator.filter(_.nonEmpty).map { p =>
                val q = p.split('~')
                (q(0).toInt, q(1), at(q, 2))
              }.toSeq
              convs += f(1) -> Conv(f(1), f(2), f(3), f(4), params, f(6),
                b64d(at(f, 7)))
            case "W" =>
              vdatums += f(1) -> VDatum(f(1), f(2),
                if (f(3) == "-") "" else f(3))
            case "T" =>
              pnames += f(1).toInt -> f(2)
            case "Y" =>
              repl(f(1)) = repl.getOrElse(f(1), Vector.empty) :+ f(2)
            case "C" =>
              crs += f(1) -> CrsMeta(at(f, 12), b64d(at(f, 13)), at(f, 14),
                at(f, 15) == "1", b64d(at(f, 16)))
            case "P" =>
              crs += f(1) -> CrsMeta(at(f, 9), b64d(at(f, 10)), at(f, 13),
                at(f, 14) == "1", b64d(at(f, 15)))
            case "V" =>
              crs += f(1) -> CrsMeta(at(f, 8), b64d(at(f, 9)), at(f, 10),
                at(f, 11) == "1", b64d(at(f, 12)))
            case "X" =>
              crs += f(1) -> CrsMeta(at(f, 5), b64d(at(f, 6)), "",
                at(f, 11) == "1", b64d(at(f, 12)))
            case "D" =>
              datums += f(1) -> DatumMeta(at(f, 5), at(f, 6), f(3),
                b64d(at(f, 7)), at(f, 8))
            case "O" =>
              ops += f(1) -> OpMeta(b64d(at(f, 15)), b64d(at(f, 16)),
                at(f, 17), at(f, 18))
            case _ => ()
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()

    new Meta(extents.result(), uoms.result(), ells.result(), pms.result(),
      css.result(), convs.result(), vdatums.result(), crs.result(),
      datums.result(), ops.result(), pnames.result(),
      repl.view.mapValues(_.toSeq).toMap, scopes.result(),
      metadataKv.result(), esriNames.result())
  }

  /** projected-CRS extras not in EpsgDb.ProjCrs: conversion key and name.
    * Positional re-read of P records is avoided by keying through the K
    * records: EpsgDb.projected carries the conv key via this map. */
  lazy val projConv: Map[String, (String, String)] = {
    val in = getClass.getResourceAsStream("/graft/epsg_ops")
    require(in != null)
    val b = Map.newBuilder[String, (String, String)]
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8"), 1 << 20)
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("P|")) {
          val f = line.split("\\|", -1)
          if (f.length > 12) b += f(1) -> (f(11), f(12))
        }
        line = reader.readLine()
      }
    } finally reader.close()
    b.result()
  }
}
