package graft.cli

import graft.proj.{CrsInventory, EpsgDb, EpsgMeta}
import graft.proj.EpsgDb.Bbox
import graft.proj.OpFactory
import graft.proj.OpFactory.{Candidate, GridMode, Options, Resolved}
import graft.proj.wkt.WktOut
import graft.proj.wkt.WktOut.{Child, Node, Q, Raw}

/** The projinfo app: describe CRSs/datums/ellipsoids back out (WKT2, PROJ
  * strings) and query candidate coordinate operations between CRS pairs,
  * replaying the reference's test_projinfo.yaml byte-for-byte on the
  * supported subset.
  *
  * Behavioral provenance (no code copied): reference
  * src/apps/projinfo_lib.cpp — argument grammar, output section order and
  * headers, candidate summaries, the spatial-criterion note, and the
  * area-of-use search protocol.
  */
object CliProjinfo {

  private def db = EpsgDb.db
  private def meta = EpsgMeta.meta

  private final class Opt {
    var sourceCrs = ""
    var targetCrs = ""
    var outPROJ = false
    var outWkt2019 = false
    var outWkt2015 = false
    var outWkt1Gdal = false
    var outWkt1Esri = false
    var outProjjson = false
    var outSql = false
    var outputId = ""
    var dumpDb = false
    var outSpecified = false
    var quiet = false
    var singleLine = false
    var summary = false
    var kind = ""
    var bboxStr = ""
    var area = ""
    var spatialExplicit = false
    var spatialIntersects = false
    var crsExtentUse = "smallest"
    var gridCheck = ""
    var hideBallpark = false
    var accuracy = -1.0
    var authority = ""
    var showSuperseded = false
    var promote3D = false
    var normalizeAxisOrder = false
    var listCrs = false
    var listCrsFilter = ""
    var sEpoch = ""
    var tEpoch = ""
    var positional = Vector.empty[String]
  }

  def run(args: Seq[String], stdin: String, prog: String,
          files: Map[String, String],
          env: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    val code = try {
      if (args.length >= 2 && args.head == "completion")
        completion(args.drop(2), io)
      else execute(args, io, env)
    }
    catch {
      case e: CliExit =>
        io.err(e.message + "\n"); e.code
      case e: Throwable =>
        io.err(s"projinfo: ${e.getMessage}\n"); 1
    }
    CliResult(io.stdout, io.stderr, io.combined, code)
  }

  private def usage(io: CliOut): Int = {
    io.err("usage: projinfo [-o formats] [-k kind] [--summary] [-q] " +
      "[-s crs] [-t crs] [--bbox w,s,e,n] [--area name_or_code] " +
      "[--spatial-test contains|intersects] [--crs-extent-use mode] " +
      "[--grid-check mode] [--accuracy a] [--hide-ballpark] [--3d] " +
      "[--single-line] object_or_crs\n")
    1
  }

  // ------------------------------------------------------------ parse

  private def execute(args: Seq[String], io: CliOut,
                      env: Map[String, String]): Int = {
    val o = new Opt
    var i = 0
    def next(): String = { i += 1; if (i < args.length) args(i) else "" }
    while (i < args.length) {
      val a = args(i)
      a match {
        case "-o" =>
          o.outSpecified = true
          for (f <- next().split(',')) f.toUpperCase.replace('-', '_')
            .replace(':', '_') match {
            case "ALL" =>
              o.outPROJ = true; o.outWkt2019 = true; o.outWkt2015 = true
              o.outWkt1Gdal = true; o.outWkt1Esri = true; o.outProjjson = true
            case "DEFAULT" => o.outPROJ = true; o.outWkt2019 = true
            case "PROJ" => o.outPROJ = true
            case "WKT2_2019" | "WKT2_2018" => o.outWkt2019 = true
            case "WKT2_2015" => o.outWkt2015 = true
            case "WKT1_GDAL" => o.outWkt1Gdal = true
            case "WKT1_ESRI" => o.outWkt1Esri = true
            case "PROJJSON" => o.outProjjson = true
            case "SQL" => o.outSql = true
            case other =>
              io.err(s"Unrecognized value for option -o: $f\n")
              return usage(io)
          }
        case "-s" | "--source-crs" => o.sourceCrs = next()
        case "-t" | "--target-crs" => o.targetCrs = next()
        case "-k" =>
          next().toLowerCase match {
            case "crs" | "srs" => o.kind = "crs"
            case "operation" => o.kind = "operation"
            case "ellipsoid" => o.kind = "ellipsoid"
            case "datum" => o.kind = "datum"
            case "ensemble" => o.kind = "ensemble"
            case other =>
              io.err(s"Unrecognized value for option -k: $other\n")
              return usage(io)
          }
        case "-q" | "--quiet" => o.quiet = true
        case "--single-line" => o.singleLine = true
        case "--summary" => o.summary = true
        case "--bbox" => o.bboxStr = next()
        case "--area" => o.area = next()
        case "--accuracy" => o.accuracy = next().toDouble
        case "--spatial-test" =>
          o.spatialExplicit = true
          next().toLowerCase match {
            case "contains" => o.spatialIntersects = false
            case "intersects" => o.spatialIntersects = true
            case other =>
              io.err(s"Unrecognized value for option --spatial-test: $other\n")
              return usage(io)
          }
        case "--crs-extent-use" => o.crsExtentUse = next().toLowerCase
        case "--grid-check" => o.gridCheck = next().toLowerCase
        case "--hide-ballpark" => o.hideBallpark = true
        case "--3d" => o.promote3D = true
        case "--normalize-axis-order" => o.normalizeAxisOrder = true
        case "--authority" => o.authority = next()
        case "--show-superseded" => o.showSuperseded = true
        case "--pivot-crs" => next()
        case "--s_epoch" => o.sEpoch = next()
        case "--t_epoch" => o.tEpoch = next()
        case "--output-id" => o.outputId = next()
        case "--dump-db-structure" => o.dumpDb = true
        case "--list-crs" =>
          o.listCrs = true
          if (i + 1 < args.length && !args(i + 1).startsWith("-"))
            o.listCrsFilter = next()
        case _ if a.startsWith("-") && a.length > 1 =>
          io.err(s"Unrecognized option: $a\n")
          return usage(io)
        case _ => o.positional :+= a
      }
      i += 1
    }

    var userString = ""
    if (o.sourceCrs.isEmpty && o.targetCrs.isEmpty && o.positional.length == 2) {
      o.sourceCrs = o.positional(0); o.targetCrs = o.positional(1)
      o.positional = Vector.empty
    } else if (o.positional.length == 1) {
      userString = o.positional.head
    } else if (o.positional.length > 1) {
      io.err(s"Too many parameters: ${o.positional(1)}\n")
      return usage(io)
    }
    // --dump-db-structure with an object implies quiet SQL output
    // (reference projinfo_lib.cpp:1906)
    if (o.dumpDb && userString.nonEmpty && !o.outSpecified) {
      o.outSpecified = true; o.outSql = true; o.quiet = true
    }
    if (o.bboxStr.nonEmpty && o.area.nonEmpty) {
      io.err("ERROR: --bbox and --area are exclusive\n")
      return 1
    }
    if (o.dumpDb) {
      val in = getClass.getResourceAsStream("/graft/epsg_db_structure")
      require(in != null, "missing /graft/epsg_db_structure sidecar")
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      io.out(text)
    }
    if (o.listCrs) {
      val rc = runListCrs(o, io)
      if (rc != 0) return rc
    }
    if (o.sourceCrs.nonEmpty && o.targetCrs.isEmpty) {
      io.err("Source CRS specified, but missing target CRS\n")
      return usage(io)
    }
    if (o.sourceCrs.isEmpty && o.targetCrs.nonEmpty) {
      io.err("Target CRS specified, but missing source CRS\n")
      return usage(io)
    }
    if (userString.isEmpty && o.sourceCrs.isEmpty) {
      if (o.listCrs || o.dumpDb) return 0
      io.err("Missing user string\n")
      return usage(io)
    }
    if (!o.outSpecified) { o.outPROJ = true; o.outWkt2019 = true }

    if (userString.nonEmpty) outputSingleObject(userString, o, io)
    else outputOperations(o, io)
  }

  // --------------------------------------------------- single objects

  private def resolveDatum(s: String): Option[String] = {
    val byCode = if (s.contains(":")) Some(normKey(s)).filter(db.datums.contains)
      else None
    byCode.orElse(db.byName(s, "D").headOption.map(_._2))
  }

  private def normKey(s: String): String = {
    val i = s.indexOf(':')
    if (i < 0) "EPSG:" + s else s.substring(0, i).toUpperCase + s.substring(i)
  }

  /** lenient WKT1 GEOGCS input: the strict-grammar diagnostics (bison-style
    * unexpected/expecting message with a caret snippet, reference
    * src/wkt_parser.cpp pj_wkt_error) plus recoverable-warning recovery,
    * then the parsed — non-registry — object described back out. */
  private def outputWkt1Geogcs(s: String, o: Opt, io: CliOut): Int = {
    import graft.proj.wkt.{Wkt, WktNode}
    val root =
      try Wkt.parse(s)
      catch { case _: Throwable =>
        io.err("buildObject failed: object not found\n"); return 1 }

    // direct children of the GEOGCS node with their source offsets
    val kids = {
      val out = Vector.newBuilder[(String, Int)]
      var depth = 0; var i = 0; var inStr = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { if (c == '"') inStr = false }
        else c match {
          case '"' => inStr = true
          case '[' => depth += 1
          case ']' => depth -= 1
          case ch if depth == 1 && ch.isLetter &&
            (i == 0 || !s.charAt(i - 1).isLetter) =>
            out += ((s.substring(i).takeWhile(_.isLetter).toUpperCase, i))
          case _ => ()
        }
        i += 1
      }
      out.result()
    }

    // recoverable warnings + the strict grammar's first complaint: after
    // DATUM the WKT1 grammar expects PRIMEM
    if (!kids.exists(_._1 == "PRIMEM"))
      io.err("Warning: GEOGCS should have a PRIMEM node\n")
    val di = kids.indexWhere(_._1 == "DATUM")
    if (di >= 0 && di + 1 < kids.length && kids(di + 1)._1 != "PRIMEM") {
      val (tok, n) = kids(di + 1)
      val start0 = math.max(0, n - 40)
      val snippet = s.substring(start0, math.min(s.length, n + 40))
      io.err("Grammar error: Parsing error : syntax error, unexpected " +
        tok + ", expecting PRIMEM. Error occurred around:\n" + snippet +
        "\n" + (" " * (n - start0)) + "^\n")
    }

    def nodeChild(n: WktNode, kw: String): Option[WktNode] =
      n.args.collectFirst { case c: WktNode if c.keyword == kw => c }
    def strArg(n: WktNode, i: Int): String = n.args.lift(i) match {
      case Some(v: String) => v
      case Some(v) => v.toString
      case None => ""
    }
    val crsName = strArg(root, 0)
    val datumN = nodeChild(root, "DATUM").getOrElse {
      io.err("buildObject failed: object not found\n"); return 1
    }
    val sph = nodeChild(datumN, "SPHEROID")
      .orElse(nodeChild(datumN, "ELLIPSOID")).getOrElse {
      io.err("buildObject failed: object not found\n"); return 1
    }
    val datumName0 = strArg(datumN, 0)
    // identify the datum by name (WKT1 names match via underscore-blind
    // equivalence; ESRI D_-prefixed aliases as fallback)
    val datumKey = db.byName(datumName0, "D").headOption
      .orElse(db.byName(datumName0.replace('_', ' '), "D").headOption)
      .orElse(db.byName("D_" + datumName0, "D").headOption)
      .map(_._2)
    val datumName = datumKey.map(k =>
      db.datums(k).name.stripSuffix(" ensemble")).getOrElse(datumName0)

    val sections = Vector.newBuilder[(String, String)]
    if (o.outPROJ) {
      val legacy = datumKey.flatMap(projDatumByCode.get)
      val ellToken = legacy.map(d => s"+datum=$d").getOrElse(
        s"+a=${strArg(sph, 1)} +rf=${strArg(sph, 2)}")
      sections += (("PROJ.4 string:",
        s"+proj=longlat $ellToken +no_defs +type=crs"))
    }
    if (o.outWkt2019) {
      val degKey = "EPSG:9122"
      val ell = Node("ELLIPSOID", Seq(Q(strArg(sph, 0)),
        Raw(WktOut.num(strArg(sph, 1))), Raw(WktOut.num(strArg(sph, 2))),
        Child(WktOut.unitNode("EPSG:9001", ids = true))))
      val datum = Node("DATUM", Seq(Q(datumName), Child(ell)))
      val pm = Node("PRIMEM", Seq(Q("Greenwich"), Raw("0"),
        Child(WktOut.unitNode(degKey, ids = false)),
        Child(WktOut.idNode("EPSG:8901"))))
      val axes = Seq(
        EpsgMeta.Axis("Longitude", "lon", "east", degKey),
        EpsgMeta.Axis("Latitude", "lat", "north", degKey))
      val cs = WktOut.csPartsFrom("ellipsoidal", axes, ids = false)
      val node = Node("GEOGCRS", Seq(Q(crsName), Child(datum), Child(pm)) ++ cs)
      sections += (("WKT2:2019 string:", WktOut.render(node, !o.singleLine)))
    }
    emitSections(sections.result(), o, io)
    0
  }

  private def outputSingleObject(s: String, o: Opt, io: CliOut): Int = {
    val sections = Vector.newBuilder[(String, String)]
    def wktOf(n: Node): String = WktOut.render(n, !o.singleLine)

    if (s.trim.startsWith("GEOGCS[")) return outputWkt1Geogcs(s.trim, o, io)

    if (s.trim.startsWith("PROJCS[")) {
      // WKT1 projected input (GDAL/ESRI dialects): describe the parsed
      // object's PROJ string back out
      return try {
        val obj = graft.proj.wkt.WktMap.toObject(graft.proj.wkt.Wkt.parse(s.trim))
        obj match {
          case c: graft.proj.wkt.WktCrsDef =>
            val body = ProjOut.parse(c.projString)
            emitSections(Vector(("PROJ.4 string:",
              ProjOut.render(body, multiline = false) + " +type=crs")), o, io)
            0
          case _ =>
            io.err("buildObject failed: object not found\n"); 1
        }
      } catch {
        case e: graft.core.ProjError =>
          io.err(s"buildObject failed: ${e.getMessage}\n"); 1
      }
    }

    if (o.outSql && o.outputId.nonEmpty && s.trim.startsWith("+proj=")) {
      val i = o.outputId.indexOf(':')
      return graft.proj.wkt.SqlOut.projStringProjected(s,
        o.outputId.substring(0, i), o.outputId.substring(i + 1),
        materialize = o.authority.nonEmpty) match {
        case Some(lines) =>
          emitSections(Vector(("SQL:", lines.mkString("\n"))), o, io); 0
        case None =>
          io.err("SQL export not supported for this object\n"); 1
      }
    }

    o.kind match {
      case "ellipsoid" =>
        val key = (if (s.contains(":")) Some(normKey(s)).filter(meta.ells.contains)
          else None).orElse(db.byName(s, "B").headOption.map(_._2))
          .getOrElse { io.err("buildObject failed: ellipsoid not found\n"); return 1 }
        if (o.outPROJ) {
          val e = meta.ells(key)
          projEllps(e).foreach(p => sections += (("PROJ string:", p)))
        }
        if (o.outWkt2019)
          sections += (("WKT2:2019 string:",
            wktOf(WktOut.ellipsoidNode(key, ids = true, selfId = true))))
      case "datum" =>
        val key = resolveDatum(s).getOrElse {
          io.err("buildObject failed: datum not found\n"); return 1 }
        if (o.outWkt2019)
          sections += (("WKT2:2019 string:",
            wktOf(WktOut.datumNode(key, v2019 = true, ids = true,
              selfId = true, forceDatum = true))))
      case "ensemble" =>
        val key = resolveDatum(s).filter(db.ensembleMembers.contains).getOrElse {
          io.err("buildObject failed: ensemble not found\n"); return 1 }
        if (o.outWkt2019)
          sections += (("WKT2:2019 string:",
            wktOf(WktOut.datumNode(key, v2019 = true, ids = true, selfId = true))))
      case "operation" =>
        val key = normKey(s)
        val cand = OpFactory.operationByCode(key).getOrElse {
          io.err("buildObject failed: cannot instantiate operation\n"); return 1 }
        if (o.outPROJ)
          sections += (("PROJ string:",
            ProjOut.candidateProj(cand._1, cand._2, cand._3, !o.singleLine)))
        if (o.outWkt2019)
          operationWkt(cand._1, cand._2, cand._3).foreach(n =>
            sections += (("WKT2:2019 string:", WktOut.render(n, !o.singleLine))))
      case _ =>
        // CRS (by code or name), falling back through datum/ensemble,
        // vertical datum, ellipsoid for bare names — the reference's
        // createFromUserInput object search order
        // a vertical CRS by code or (for -k crs) by "<name> height"
        val asVertCode: Option[String] =
          (if (s.contains(":")) Some(normKey(s)).filter(db.vertical.contains)
           else None)
            .orElse(if (o.kind == "crs")
              db.byName(s + " height", "V").headOption.map(_._2)
                .orElse(db.byName(s, "V").headOption.map(_._2))
            else None)
        asVertCode match {
          case Some(vc) => return outputVertCrs(vc, o, io, sections)
          case None => ()
        }
        val asCrs: Option[Resolved] = OpFactory.resolve(s)
        asCrs match {
          case Some(r) if o.kind == "crs" || s.contains(":") ||
            db.byName(s, "CPX").nonEmpty =>
            return outputCrs(r, o, io, sections)
          case _ =>
            // bare names: datum/ensemble, then vertical datum, then ellipsoid
            resolveDatum(s) match {
              case Some(dk) =>
                if (o.outWkt2019)
                  sections += (("WKT2:2019 string:",
                    wktOf(WktOut.datumNode(dk, v2019 = true, ids = true,
                      selfId = true))))
              case None =>
                db.byName(s, "W").headOption match {
                  case Some((_, vk)) =>
                    if (o.outWkt2019)
                      sections += (("WKT2:2019 string:",
                        wktOf(WktOut.vdatumNode(vk, ids = true))))
                  case None =>
                    asCrs match {
                      case Some(r) => return outputCrs(r, o, io, sections)
                      case None =>
                        io.err("buildObject failed: object not found\n")
                        return 1
                    }
                }
            }
        }
    }
    emitSections(sections.result(), o, io)
    0
  }

  /** standalone vertical CRS output: legacy +geoidgrids string plus the
    * VERTCRS WKT. */
  private def outputVertCrs(code: String, o: Opt, io: CliOut,
                            sections: scala.collection.mutable.Builder[(String, String), Vector[(String, String)]]): Int = {
    if (o.outPROJ) {
      // the geoid grid of the operation binding this height to WGS 84
      val v = db.vertical(code)
      val geoidOp = db.ops.find(op => op.kind == 'G' && !op.deprecated &&
        (op.dstCrs == code || op.srcCrs == code) &&
        op.extras.get("grid").exists(g => db.gridAlias.contains(g)))
      geoidOp.foreach { op =>
        val grid = db.gridAlias(op.extras("grid")).proj
        sections += (("PROJ.4 string:",
          s"+geoidgrids=$grid +geoid_crs=WGS84 +vunits=m +no_defs +type=crs"))
      }
    }
    if (o.outWkt2019)
      sections += (("WKT2:2019 string:",
        WktOut.render(WktOut.vertCrsNode(code, v2019 = true, ids = true),
          !o.singleLine)))
    emitSections(sections.result(), o, io)
    0
  }

  /** vertical CRS for a -k crs lookup of a datum-ish name */
  private def outputCrs(r: Resolved, o: Opt, io: CliOut,
                        sections: scala.collection.mutable.Builder[(String, String), Vector[(String, String)]]): Int = {
    val code = r.projCode.getOrElse(r.geod.code)
    val cm = meta.crs.get(code)
    if (!o.quiet && cm.exists(_.deprecated)) {
      io.out("Warning: object is deprecated\n")
      // alternative non-deprecated CRSs share the name minus "(deprecated)"
      nonDeprecatedAlternatives(code).foreach { alts =>
        io.out("Alternative non-deprecated CRS:\n")
        alts.foreach(a => io.out(s"  $a\n"))
      }
      io.out("\n")
    }
    if (o.outPROJ)
      crsProjString(code).foreach(p => sections += (("PROJ.4 string:", p)))
    if (o.outWkt2015)
      WktOut.crsNode(code, v2019 = false, ids = true).foreach(n =>
        sections += (("WKT2:2015 string:", WktOut.render(n, !o.singleLine))))
    if (o.outWkt2019) {
      val node =
        if (o.promote3D && db.projected.contains(code))
          WktOut.promotedProjCrsNode(code)
            .orElse(WktOut.crsNode(code, v2019 = true, ids = true))
        else WktOut.crsNode(code, v2019 = true, ids = true)
      node.foreach(n =>
        sections += (("WKT2:2019 string:", WktOut.render(n, !o.singleLine))))
    }
    // WKT1 bodies carry a trailing blank line (the reference prints them
    // with an extra newline)
    if (o.outWkt1Gdal)
      graft.proj.wkt.Wkt1Out.gdalGeogNode(code)
        .orElse(graft.proj.wkt.Wkt1Out.gdalProjNode(code)).foreach(n =>
        sections += (("WKT1:GDAL string:",
          WktOut.render(n, !o.singleLine) + "\n")))
    if (o.outWkt1Esri)
      graft.proj.wkt.Wkt1Out.esriGeogString(code)
        .orElse(graft.proj.wkt.Wkt1Out.esriProjString(code)).foreach(s =>
        sections += (("WKT1:ESRI string:", s + "\n")))
    if (o.outProjjson)
      graft.proj.wkt.ProjJsonOut.crs(code).foreach(j =>
        sections += (("PROJJSON:", j)))
    if (o.outSql && o.outputId.nonEmpty) {
      val i = o.outputId.indexOf(':')
      graft.proj.wkt.SqlOut.registryGeodetic(code,
        o.outputId.substring(0, i), o.outputId.substring(i + 1))
        .foreach(lines => sections += (("SQL:", lines.mkString("\n"))))
    }
    emitSections(sections.result(), o, io)
    0
  }

  private def nonDeprecatedAlternatives(code: String): Option[Seq[String]] =
    meta.replacements.get(code).filter(_.nonEmpty)

  /** EPSG datum code -> legacy PROJ datum id (reference src/datums.cpp
    * pj_datums; the PROJ.4 CRS export folds a matching datum+towgs84 back
    * into +datum=). */
  private val projDatumByCode = Map(
    "EPSG:6326" -> "WGS84", "EPSG:6269" -> "NAD83", "EPSG:6267" -> "NAD27",
    "EPSG:6314" -> "potsdam", "EPSG:6223" -> "carthage",
    "EPSG:6312" -> "hermannskogel", "EPSG:6299" -> "ire65",
    "EPSG:6272" -> "nzgd49", "EPSG:6277" -> "OSGB36")

  /** legacy PROJ.4 string of a CRS, as the reference's bound-CRS export
    * prints it: numbers re-derived, named ellipsoids folded, UTM recognized,
    * +towgs84 widened to seven terms, +datum= where the CRS's datum is one
    * of the legacy named datums, +units/+pm kept, +type=crs appended. */
  private def crsProjString(code: String): Option[String] = {
    if (!code.startsWith("EPSG:")) return None
    val num = code.substring(5)
    val datumName = db.geodetic.get(code).orElse(
      db.projected.get(code).flatMap(p => db.geodetic.get(p.baseGeog)))
      .flatMap(g => projDatumByCode.get(g.datum))
    graft.proj.Proj.epsgInitLookup(num).map { raw =>
      val step0 = ProjOut.parse(raw.split("\\s+").iterator.filter(_.nonEmpty)
        .map(_.stripPrefix("+"))
        .filterNot(t => t == "no_defs")
        .mkString(" ")).head
      var step = ProjOut.rewriteCrsStep(step0, datumName)
      if (datumName.isEmpty && !step.params.exists(_._1 == "towgs84")) {
        // the reference's createBoundCRSToWGS84IfPossible appends the best
        // single-Helmert transformation as +towgs84
        towgs84Of(code).foreach { t =>
          val at = step.params.indexWhere(_._1 == "ellps") + 1
          if (at > 0)
            step = step.copy(params = (step.params.take(at) :+
              ("towgs84", t)) ++ step.params.drop(at))
        }
      }
      val sb = new StringBuilder("+proj=" + step.name)
      for ((k, v) <- step.params) {
        sb += ' '; sb += '+'; sb ++= k
        if (v.nonEmpty) { sb += '='; sb ++= v }
      }
      sb ++= " +no_defs +type=crs"
      sb.toString
    }
  }

  /** x,y,z,rx,ry,rz,s of the best single-Helmert operation from the CRS's
    * geodetic base to WGS 84, in towgs84's position-vector convention. */
  private def towgs84Of(code: String): Option[String] = {
    val geodCode = db.projected.get(code).map(_.baseGeog).getOrElse(code)
    for {
      g <- OpFactory.resolveCode(geodCode)
      w <- OpFactory.resolveCode("EPSG:4326")
      crsBox = db.projected.get(code).flatMap(_.bbox)
        .orElse(db.geodetic.get(geodCode).flatMap(_.bbox))
      list = OpFactory.createListForDisplay(g, w,
        Options(allowBallpark = false), GridMode.Discard)
        .filter(c => !c.ballpark && !c.ballparkVertical &&
          c.dispHops.length == 1 && c.dispHops.head._1.kind == 'H' &&
          !c.dispHops.head._2)
      // the reference binds to WGS 84 with the CRS's own extent as the
      // area of interest: among operations covering it, best accuracy wins
      c <- crsBox.flatMap { box =>
        val containing = list.filter(c => candContains(c.boxes, box))
        val pool = if (containing.nonEmpty) containing
          else list.filter(c => candIntersects(c.boxes, box))
        pool.sortBy(c => if (c.accuracy < 0) Double.MaxValue else c.accuracy)
          .headOption
      }.orElse(list.headOption)
    } yield {
      val x = c.dispHops.head._1.extras
      // position-vector methods per the factory's convention table; the
      // coordinate-frame family flips rotation signs into towgs84 form
      val m = c.dispHops.head._1.method
      val pv = Set("9606", "1033", "1037", "1053", "1054", "1055", "1063",
        "1061", "1065").contains(m)
      def v(k: String) = x.getOrElse(k, "0")
      def rot(k: String) = {
        val t = v(k)
        if (pv || t == "0") t
        else if (t.startsWith("-")) t.substring(1) else "-" + t
      }
      Seq(v("x"), v("y"), v("z"), rot("rx"), rot("ry"), rot("rz"), v("s"))
        .mkString(",")
    }
  }

  private def projEllps(e: EpsgMeta.Ell): Option[String] = {
    // named-ellipsoid reverse lookup through the PROJ table
    val a = e.aText; val rf = e.rfText
    graft.proj.Ellipsoids.table.collectFirst {
      case (n, (aDef, shapeDef))
        if aDef.stripPrefix("a=").toDouble == a.toDouble &&
          shapeDef.startsWith("rf=") && rf.nonEmpty &&
          shapeDef.stripPrefix("rf=").toDouble == rf.toDouble =>
        s"+ellps=$n"
    }
  }

  private def emitSections(sections: Seq[(String, String)], o: Opt,
                           io: CliOut): Unit = {
    var first = true
    for ((header, body) <- sections) {
      if (!first) io.out("\n")
      first = false
      if (!o.quiet) io.out(header + "\n")
      io.out(body + "\n")
    }
  }

  // ----------------------------------------------------- operations

  private def boxContains(outer: Bbox, inner: Bbox): Boolean =
    outer.west <= inner.west && outer.east >= inner.east &&
      outer.south <= inner.south && outer.north >= inner.north

  private def boxIntersects(a: Bbox, b: Bbox): Boolean =
    math.max(a.west, b.west) <= math.min(a.east, b.east) &&
      math.max(a.south, b.south) <= math.min(a.north, b.north)

  /** antimeridian split (west > east wraps) */
  private def splitBox(b: Bbox): Seq[Bbox] =
    if (b.west > b.east) Seq(Bbox(b.west, b.south, 180, b.north),
      Bbox(-180, b.south, b.east, b.north))
    else Seq(b)

  private def candIntersects(candBoxes: Seq[Bbox], aoi: Bbox): Boolean =
    splitBox(aoi).exists(ab => candBoxes.exists(cb => boxIntersects(cb, ab)))

  private def candContains(candBoxes: Seq[Bbox], aoi: Bbox): Boolean =
    splitBox(aoi).forall(ab => candBoxes.exists(cb => boxContains(cb, ab)))

  private def pseudoArea(b: Bbox): Double = {
    val w = b.east - b.west
    (if (w < 0) w + 360 else w) * (b.north - b.south)
  }

  /** a bare vertical CRS on one side adopts the other side's horizontal
    * (the reference promotes it against the context CRS). */
  private def resolveVerticalSide(spec: String,
                                  other: Resolved): Option[Resolved] = {
    val byCode = if (spec.contains(":")) Some(normKey(spec))
      .filter(db.vertical.contains) else None
    byCode.orElse(db.byName(spec, "V").headOption.map(_._2)).map { vc =>
      val v = db.vertical(vc)
      other.copy(vert = Some(v), name = v.name, code = vc,
        projBody = None, projCode = None)
    }
  }

  /** the CRS extent used for the area of interest: a bare vertical side
    * keeps its own extent; a compound CRS intersects its components'
    * (reference getExtentPossiblySynthetized). */
  private def sideBbox(r: Resolved): Option[Bbox] =
    if (db.vertical.contains(r.code)) db.vertical(r.code).bbox
    else r.vert.flatMap(_.bbox) match {
      case Some(vb) => r.bbox match {
        case Some(hb) =>
          val w = math.max(hb.west, vb.west); val e = math.min(hb.east, vb.east)
          val s = math.max(hb.south, vb.south); val n = math.min(hb.north, vb.north)
          if (w <= e && s <= n) Some(Bbox(w, s, e, n)) else None
        case None => Some(vb)
      }
      case None => r.bbox
    }

  /** engineering-CRS sides: a plane grid with no geodetic base, reachable
    * only through registered whole-CRS operations (Cartesian Grid Offsets,
    * reference createOperations on EngineeringCRS — e.g. Christmas Island
    * Grid 1985 to GDA94 / MGA zone 48). */
  private def resolveEngineering(spec: String): Option[String] = {
    val byCode =
      if (spec.contains(":") && !spec.contains(" "))
        Some(normKey(spec)).filter(db.engineering.contains)
      else None
    byCode.orElse(db.byName(spec, "J").headOption.map(_._2))
  }

  private def outputEngineering(engS: Option[String], engD: Option[String],
                                o: Opt, io: CliOut): Int = {
    val pipe: Option[String] =
      if (engS.isDefined && engS == engD) Some("proj=noop")
      else {
        val eng = engS.orElse(engD).get
        val otherSpec = if (engS.isDefined) o.targetCrs else o.sourceCrs
        val other = resolveEngineering(otherSpec).orElse(
          OpFactory.resolve(otherSpec).map(r => r.projCode.getOrElse(r.code)))
        other.flatMap { oc =>
          db.ops.find(op => !op.deprecated && op.method == "9656" &&
            ((op.srcCrs == eng && op.dstCrs == oc) ||
              (op.srcCrs == oc && op.dstCrs == eng))).map { op =>
            val inv = (op.srcCrs == eng) != engS.isDefined
            val x = op.extras.getOrElse("p8728", "0")
            val y = op.extras.getOrElse("p8729", "0")
            if (inv) s"proj=pipeline step proj=affine xoff=$x yoff=$y inv"
            else s"proj=affine xoff=$x yoff=$y"
          }
        }
      }
    pipe match {
      case Some(p) =>
        val rendered = ProjOut.render(ProjOut.parse(p), !o.singleLine)
        if (o.quiet) io.out(rendered + "\n")
        else io.out("PROJ string:\n" + rendered + "\n")
        0
      case None =>
        io.err("No operation found\n"); 1
    }
  }

  private def outputOperations(o: Opt, io: CliOut): Int = {
    val engS = resolveEngineering(o.sourceCrs)
    val engD = resolveEngineering(o.targetCrs)
    if (engS.isDefined || engD.isDefined)
      return outputEngineering(engS, engD, o, io)
    // a PROJ-string source CRS with +geoidgrids binds heights through the
    // named geoid model (reference BoundCRS with a geoid model)
    if (o.sourceCrs.trim.startsWith("+proj=") &&
      o.sourceCrs.contains("geoidgrids=")) {
      val grid = o.sourceCrs.split("\\s+").map(_.stripPrefix("+"))
        .find(_.startsWith("geoidgrids=")).map(_.substring(11)).getOrElse("")
      OpFactory.resolve(o.targetCrs) match {
        case Some(dst) if o.quiet && o.outPROJ =>
          val pre = Vector(ProjOut.Step(inv = false, "unitconvert",
            Vector(("xy_in", "deg"), ("xy_out", "rad"))))
          val core = Vector(ProjOut.Step(inv = false, "vgridshift",
            Vector(("grids", grid), ("multiplier", "1"))))
          val post = ProjOut.ioSteps(dst, out = true, wholeCrs = false)
          io.out(ProjOut.render(pre ++ core ++ post, !o.singleLine) + "\n")
          return 0
        case _ =>
          io.err("crs not found: " + o.targetCrs + "\n"); return 1
      }
    }
    val src0 = OpFactory.resolve(o.sourceCrs)
    val dst0 = OpFactory.resolve(o.targetCrs)
    val (srcOpt, dstOpt) = (src0, dst0) match {
      case (Some(s), Some(d)) => (Some(s), Some(d))
      case (Some(s), None) => (Some(s), resolveVerticalSide(o.targetCrs, s))
      case (None, Some(d)) => (resolveVerticalSide(o.sourceCrs, d), Some(d))
      case _ =>
        // two bare vertical CRSs: both adopt a common horizontal
        val w = OpFactory.resolveCode("EPSG:4326")
        (w.flatMap(x => resolveVerticalSide(o.sourceCrs, x)),
          w.flatMap(x => resolveVerticalSide(o.targetCrs, x)))
    }
    // --3d promotes a bare geographic 2D side to the geographic 3D CRS of
    // the same datum and name (reference promoteTo3D with dbContext lookup)
    def promote(r: Resolved): Resolved =
      if (!o.promote3D || r.kind != EpsgDb.Geog2D || r.vert.isDefined) r
      else if (r.projCode.isDefined)
        // a projected CRS promotes in place: its 2D base gains the height
        // axis (reference promoteTo3D on ProjectedCRS)
        r.copy(kind = EpsgDb.Geog3D)
      else db.geodetic.values
        .filter(g => g.kind == EpsgDb.Geog3D && g.datum == r.geod.datum &&
          g.name == r.geod.name)
        .toSeq.sortBy(g => g.code.drop(g.code.indexOf(':') + 1)
          .toIntOption.getOrElse(Int.MaxValue))
        .headOption
        .map(g => r.copy(geod = g, kind = EpsgDb.Geog3D, code = g.code))
        .getOrElse(r)

    val src = promote(srcOpt.getOrElse {
      io.err("crs not found: " + o.sourceCrs + "\n"); return 1 })
    val dst = promote(dstOpt.getOrElse {
      io.err("crs not found: " + o.targetCrs + "\n"); return 1 })

    // same CRS at two coordinate epochs: a point-motion operation on the
    // 3D realization of the datum, wrapped in 2D<->3D null offsets
    // (reference getPointMotionOperationsFor + cloneWithEpochs naming)
    if (src.code == dst.code && src.vert.isEmpty && src.projCode.isEmpty &&
      o.sEpoch.nonEmpty && o.tEpoch.nonEmpty && o.sEpoch != o.tEpoch) {
      val pmo = db.ops.find(op => !op.deprecated &&
        !db.superseded.contains(op.code) && op.srcCrs == op.dstCrs &&
        db.geodetic.get(op.srcCrs).exists(_.datum == src.geod.datum))
      pmo.foreach { op =>
        val nm = src.geod.name
        val k2 = kindStr(src)
        val name = s"Null geographic offset from $nm ($k2) to $nm (geog3D) + " +
          s"${op.name} from epoch ${o.sEpoch} to epoch ${o.tEpoch} + " +
          s"Null geographic offset from $nm (geog3D) to $nm ($k2)"
        val desc = meta.descOfArea(op.areaName).getOrElse(op.areaName)
        io.out("Candidate operations found: 1\n")
        io.out(s"unknown id, $name, ${WktOut.num(op.accuracy)} m, $desc\n")
        return 0
      }
    }

    // area of interest
    var aoi: Option[Bbox] = None
    var aoiDesc: Option[String] = None
    if (o.bboxStr.nonEmpty) {
      val p = o.bboxStr.split(',')
      if (p.length != 4) {
        io.err(s"Incorrect number of values for option --bbox: ${o.bboxStr}\n")
        return usage(io)
      }
      aoi = Some(Bbox(p(0).toDouble, p(1).toDouble, p(2).toDouble, p(3).toDouble))
    } else if (o.area.nonEmpty) {
      areaFilter(o.area, io) match {
        case Left(rc) => return rc
        case Right(e) => aoi = e.bbox; aoiDesc = Some(e.desc).filter(_.nonEmpty)
      }
    } else o.crsExtentUse match {
      case "none" => aoi = None
      case "intersection" =>
        aoi = (sideBbox(src), sideBbox(dst)) match {
          case (Some(a), Some(b)) if boxIntersects(a, b) =>
            Some(Bbox(math.max(a.west, b.west), math.max(a.south, b.south),
              math.min(a.east, b.east), math.min(a.north, b.north)))
          case _ => None
        }
      case _ => // smallest (default) and both
        aoi = (sideBbox(src), sideBbox(dst)) match {
          case (Some(a), Some(b)) =>
            Some(if (pseudoArea(a) <= pseudoArea(b)) a else b)
          case (a, b) => a.orElse(b)
        }
    }

    val gridMode = o.gridCheck match {
      case "none" => GridMode.Ignore
      case "discard_missing" => GridMode.Discard
      case "known_available" => GridMode.Known
      case _ => GridMode.Sort
    }
    val opts = Options(
      authority = if (o.authority.nonEmpty) Some(o.authority) else None,
      accuracy = o.accuracy,
      allowBallpark = !o.hideBallpark)
    // the synthesized ballpark's domain is the shared CRS extent when the
    // pair's extents are equivalent, else World (reference
    // createBallparkGeographicOffset)
    def effBoxes(c: Candidate): Seq[Bbox] =
      if (c.ballpark && c.dispHops.isEmpty &&
        (crsAreaName(src) != crsAreaName(dst) || crsAreaName(src).isEmpty))
        Seq(Bbox(-180, -90, 180, 90))
      else c.boxes

    val all0 = OpFactory.createListForDisplay(src, dst, opts, gridMode)
    // the reference sorts by the candidate extent clipped to the area of
    // interest (or to the CRS extents when none)
    val e1 = sideBbox(src); val e2 = sideBbox(dst)
    def clippedArea(c: Candidate): Double = {
      def inter(a: Bbox, b: Bbox): Option[Bbox] = {
        val w = math.max(a.west, b.west); val e = math.min(a.east, b.east)
        val s = math.max(a.south, b.south); val n = math.min(a.north, b.north)
        if (w <= e && s <= n) Some(Bbox(w, s, e, n)) else None
      }
      def clipTo(filter: Bbox): Double =
        effBoxes(c).flatMap(cb => splitBox(filter).flatMap(fb => inter(cb, fb)))
          .map(OpFactory.pseudoAreaOf).sum
      aoi match {
        case Some(box) => clipTo(box)
        case None => (e1, e2) match {
          case (Some(a), Some(b)) =>
            val x = clipTo(a); val y = clipTo(b)
            val xy = inter(a, b).map(clipTo).getOrElse(0.0)
            x + y - xy
          case (Some(a), None) => clipTo(a)
          case (None, Some(b)) => clipTo(b)
          case _ => effBoxes(c).map(OpFactory.pseudoAreaOf).sum
        }
      }
    }
    // time-specific Helmert methods have no pipeline expression
    // (reference: isPROJExportable sorts them last)
    def exportable(c: Candidate): Boolean =
      !c.dispHops.exists(h => h._1.method == "1065" || h._1.method == "1066")
    val allSorted = OpFactory.sort(all0, knownAsAvailable = gridMode == GridMode.Known,
      areaOf = clippedArea, exportableOf = exportable)
    // reference removeUninterestingOps: for the same extent, drop a
    // candidate with similar-or-worse accuracy than the previously kept
    // one that takes strictly more transformation steps; an operation with
    // a registry identifier counts as a single step, so one identified
    // concatenated op never eliminates another (reference
    // coordinateoperationfactory.cpp:1627 "If a concatenated operation has
    // an identifier, consider it as a single step")
    val all = {
      def effSteps(c: Candidate): Int =
        if (c.identOp.isDefined) 1 else c.stepCount
      val out = Vector.newBuilder[Candidate]
      var last = Option.empty[Candidate]
      for (c <- allSorted) {
        val drop = last.exists { l =>
          val accWorse = (c.accuracy >= l.accuracy && l.accuracy >= 0) ||
            (c.accuracy < 0 && l.accuracy >= 0)
          accWorse && c.boxes == l.boxes && effSteps(c) > effSteps(l)
        }
        if (!drop) { out += c; last = Some(c) }
      }
      out.result()
    }

    def candDesc(c: Candidate): Option[String] =
      meta.descOfArea(c.areaName).orElse(
        if (c.ballpark) Some("World") else None)

    // a plain geographic source against a bare vertical target lists only
    // real geoid candidates (the reference synthesizes no ballpark vertical
    // leg on this shape)
    val bareVertTarget = db.vertical.contains(dst.code) && src.vert.isEmpty
    def filtered(intersects: Boolean): Vector[Candidate] = {
      var list = all
      if (bareVertTarget)
        list = list.filterNot(c => c.ballparkVertical ||
          c.name.contains(" using "))
      // geocentric-to-geocentric pairs use geocentric-domain methods only
      // (the reference never routes them through the geog2D/3D variants)
      if (src.isGeocentric && dst.isGeocentric) {
        val geogDomain = Set("9603", "9606", "9607", "9636", "1035", "1037",
          "1038", "1039", "1063", "1133")
        list = list.filterNot(c =>
          c.dispHops.exists(h => geogDomain.contains(h._1.method)))
      }
      // --area with a described extent: if any candidate's own extent has
      // exactly that description, restrict to those (reference filterOut
      // foundExtentWithExpectedDescription)
      aoiDesc.foreach { d =>
        if (list.exists(c => candDesc(c).contains(d)))
          list = list.filter(c => candDesc(c).contains(d))
      }
      aoi.foreach { box =>
        list = list.filter { c =>
          if (intersects) candIntersects(effBoxes(c), box)
          else candContains(effBoxes(c), box)
        }
      }
      // drop a trailing synthesized ballpark/null op when a gridless real
      // candidate covers the area of interest (reference
      // removeSyntheticNullTransforms)
      val coveredByGridless = aoi.exists(box => all.exists(c =>
        !c.ballpark && !c.ballparkVertical && c.grids.isEmpty &&
          candContains(effBoxes(c), box)))
      if (coveredByGridless && list.length > 1 &&
        (list.last.ballpark || list.last.name.startsWith("Null ")))
        list = list.init
      list
    }

    val list = filtered(o.spatialIntersects)
    var note = ""
    if (!o.spatialExplicit && !o.spatialIntersects) {
      val list2 = filtered(intersects = true)
      if (list2.length > list.length)
        note = s"Note: using '--spatial-test intersects' would bring more results (${list2.length})"
      else if (list2.length == 1 && list.length == 1 &&
        list2.head.name != list.head.name)
        note = "Note: using '--spatial-test intersects' would bring more relevant results."
    }

    if (o.quiet) {
      if (list.nonEmpty) {
        val sections = Vector.newBuilder[(String, String)]
        if (o.outPROJ)
          sections += (("PROJ string:",
            ProjOut.candidateProj(src, dst, list.head, !o.singleLine,
              o.normalizeAxisOrder)))
        if (o.outWkt2019)
          operationWkt(src, dst, list.head).foreach(n =>
            sections += (("WKT2:2019 string:", WktOut.render(n, !o.singleLine))))
        emitSections(sections.result(), o, io)
      }
      return 0
    }

    io.out(s"Candidate operations found: ${list.length}\n")
    if (note.nonEmpty) io.out(note + "\n")
    if (o.summary) {
      list.foreach(c => io.out(summaryLine(src, dst, c) + "\n"))
    } else {
      var first = true
      for ((c, idx) <- list.zipWithIndex) {
        if (!first) io.out("\n")
        first = false
        io.out("-------------------------------------\n")
        io.out(s"Operation No. ${idx + 1}:\n\n")
        io.out(summaryLine(src, dst, c) + "\n\n")
        val sections = Vector.newBuilder[(String, String)]
        if (o.outPROJ)
          sections += (("PROJ string:",
            ProjOut.candidateProj(src, dst, c, !o.singleLine)))
        if (o.outWkt2019)
          operationWkt(src, dst, c).foreach(n =>
            sections += (("WKT2:2019 string:", WktOut.render(n, !o.singleLine))))
        emitSections(sections.result(), o, io)
      }
    }
    0
  }

  private def areaFilter(area: String, io: CliOut): Either[Int, EpsgMeta.Extent] = {
    if (!area.contains(' ') && area.contains(':')) {
      val key = normKey(area)
      return meta.extents.get(key).toRight {
        io.err("Area of use retrieval failed: extent not found\n"); 1
      }
    }
    val exact = meta.areasByName(area, approx = false)
    val found = if (exact.nonEmpty) exact else meta.areasByName(area, approx = true)
    found match {
      case Seq() =>
        io.err("No area of use matching provided name\n"); Left(1)
      case Seq(one) => Right(one)
      case several =>
        io.err("Several candidates area of use matching provided name :\n")
        several.foreach(e => io.err(s"  ${e.code} : ${e.desc}\n"))
        Left(1)
    }
  }

  // ------------------------------------------------ candidate display

  /** conversion legs implied by projected ends (empty when the candidate
    * operates in projected space directly). */
  private def convLegs(src: Resolved, dst: Resolved,
                       c: Candidate): (Option[String], Option[String]) = {
    if (c.wholeCrs) (None, None)
    else {
      def convName(code: String): Option[String] =
        EpsgMeta.projConv.get(code).map(_._2).filter(_.nonEmpty)
      (src.projCode.flatMap(convName), dst.projCode.flatMap(convName))
    }
  }

  private def hopName(op: EpsgDb.Op, inv: Boolean): String =
    if (inv) "Inverse of " + op.name else op.name

  /** candidate identity for display: the single op's code (with
    * INVERSE/DERIVED_FROM wrappers), or unknown. */
  /** a vertical component reached through a compound CRS makes the shown
    * operation a synthesized concatenation (unknown id); a bare vertical
    * CRS side keeps the operation's own identity. */
  private def compoundSide(r: Resolved): Boolean =
    r.vert.isDefined && !db.vertical.contains(r.code)

  private def displayId(src: Resolved, dst: Resolved, c: Candidate): String = {
    val (lc, rc) = convLegs(src, dst, c)
    if (compoundSide(src) || compoundSide(dst)) return "unknown id"
    if (c.ballpark || c.ballparkVertical) "unknown id"
    else if (c.dispHops.isEmpty && lc.isEmpty && rc.isDefined &&
      dst.projCode.isDefined) {
      // bare conversion: geographic -> its own projected CRS
      EpsgMeta.projConv.get(dst.projCode.get).map(_._1)
        .filter(meta.convs.contains).map(k => k.replace(":", ":"))
        .map(k => s"${k.substring(0, k.indexOf(':'))}:${k.substring(k.indexOf(':') + 1)}")
        .getOrElse("unknown id")
    } else if ((c.identOp.isDefined || c.dispHops.length == 1) &&
      lc.isEmpty && rc.isEmpty) {
      val (op, inv) = c.identOp.getOrElse(c.dispHops.head)
      val derived = op.kind == 'G' &&
        db.gridAlias.get(op.extras.getOrElse("grid", ""))
          .exists(a => a.proj.nonEmpty && a.proj != op.extras("grid"))
      var auth = op.auth
      if (derived) auth = s"DERIVED_FROM($auth)"
      if (inv) auth = s"INVERSE($auth)"
      s"$auth:${op.code.substring(op.code.indexOf(':') + 1)}"
    } else "unknown id"
  }

  private def kindStr(r: Resolved): String =
    if (r.kind == EpsgDb.Geog3D) "geog3D" else "geog2D"

  private def displayName(src: Resolved, dst: Resolved, c: Candidate): String = {
    val (lc, rc) = convLegs(src, dst, c)
    val parts = Vector.newBuilder[String]
    lc.foreach(n => parts += s"Inverse of $n")
    // hops registered between geocentric CRSs reached from geographic ends
    // go through synthesized geographic<->geocentric conversions, which the
    // reference names explicitly
    if (c.dispHops.nonEmpty && src.projCode.isEmpty && !src.isGeocentric) {
      val (op0, inv0) = c.dispHops.head
      val firstEnd = if (inv0) op0.dstCrs else op0.srcCrs
      if (db.geodetic.get(firstEnd).exists(_.kind == EpsgDb.Geocentric))
        parts += s"Conversion from ${src.geod.name} (${kindStr(src)}) to ${src.geod.name} (geocentric)"
    }
    if (c.name.nonEmpty && !(c.dispHops.isEmpty && !c.ballpark &&
      !c.ballparkVertical && src.vert.isEmpty && dst.vert.isEmpty &&
      (lc.isDefined || rc.isDefined))) {
      // a concatenation shown without its registry identity lists its step
      // names (the reference synthesizes it in-memory)
      if (c.identOp.isEmpty && c.dispHops.length > 1 && !c.name.contains(" + "))
        parts += c.dispHops.map(h => hopName(h._1, h._2)).mkString(" + ")
      else parts += c.name
    }
    if (c.dispHops.nonEmpty && dst.projCode.isEmpty && !dst.isGeocentric) {
      val (opN, invN) = c.dispHops.last
      val lastEnd = if (invN) opN.srcCrs else opN.dstCrs
      if (db.geodetic.get(lastEnd).exists(_.kind == EpsgDb.Geocentric))
        parts += s"Conversion from ${dst.geod.name} (geocentric) to ${dst.geod.name} (${kindStr(dst)})"
    }
    rc.foreach(n => parts += n)
    val v = parts.result()
    if (v.isEmpty) c.name else v.mkString(" + ")
  }

  /** accuracy text: DB-verbatim for identified single ops, computed sums
    * formatted as the reference's toString for compositions. */
  private def displayAccuracy(src: Resolved, dst: Resolved, c: Candidate): String = {
    val (lc, rc) = convLegs(src, dst, c)
    if (c.ballpark || c.ballparkVertical || c.accuracy < 0) "unknown accuracy"
    else if (c.dispHops.isEmpty) "0 m"
    else if ((c.identOp.isDefined || c.dispHops.length == 1) &&
      lc.isEmpty && rc.isEmpty &&
      !compoundSide(src) && !compoundSide(dst)) {
      val acc = opAccText(c.identOp.getOrElse(c.dispHops.head)._1)
      if (acc.isEmpty) "unknown accuracy" else acc + " m"
    } else WktOut.num(c.accuracy) + " m"
  }

  private def opAccText(op: EpsgDb.Op): String =
    if (op.accuracy < 0) "" else {
      // the sidecar keeps the database's text form in the op record via
      // the parse; reconstruct minimal text when it was numeric
      opAccRaw.getOrElse(op.code, WktOut.num(op.accuracy))
    }

  /** DB-verbatim accuracy strings (field 7 of O records). */
  private lazy val opAccRaw: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/epsg_ops")
    val b = Map.newBuilder[String, String]
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8"), 1 << 20)
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("O|")) {
          val f = line.split("\\|", -1)
          if (f(6).nonEmpty) b += f(1) -> f(6)
        }
        line = reader.readLine()
      }
    } finally reader.close()
    b.result()
  }

  /** domain-of-validity text: intersection with the containment shortcut
    * that preserves the contained extent's description. */
  private def displayArea(src: Resolved, dst: Resolved, c: Candidate): String = {
    if (c.ballparkVertical && c.dispHops.isEmpty) {
      // the synthesized vertical ballpark keeps the vertical CRS's own
      // extent only when it equals the paired geodetic CRS's extent
      // (reference createBallparkGeographicOffset sameExtent rule:
      // "World." for EGM2008 height vs WGS 84, the in-memory World
      // extent otherwise)
      val v = src.vert.orElse(dst.vert)
      val otherGeod = if (src.vert.isDefined) dst.geod else src.geod
      val sameExtent = (v.flatMap(_.bbox), otherGeod.bbox) match {
        case (Some(a), Some(b)) => a == b
        case _ => false
      }
      return if (sameExtent)
        v.map(_.code).flatMap(meta.crs.get).map(_.areaName)
          .flatMap(meta.descOfArea).getOrElse("World")
      else "World"
    }
    if (c.ballpark && c.dispHops.isEmpty) {
      // synthesized geographic ballpark: the CRS pair's shared extent keeps
      // its description, otherwise the in-memory World extent
      val sa = crsAreaName(src); val da = crsAreaName(dst)
      return if (sa.nonEmpty && sa == da)
        meta.descOfArea(sa).getOrElse("World")
      else "World"
    }
    val (lc, rc) = convLegs(src, dst, c)
    var acc: Option[(Bbox, Option[String])] = None
    def add(bbox: Option[Bbox], areaName: String): Unit = {
      val b = bbox.getOrElse(Bbox(-180, -90, 180, 90))
      val desc = meta.descOfArea(areaName)
      acc match {
        case None => acc = Some((b, desc))
        case Some((cur, curDesc)) =>
          if (boxContains(cur, b)) acc = Some((b, desc))
          else if (boxContains(b, cur)) () // keep current
          else acc = Some((Bbox(math.max(cur.west, b.west),
            math.max(cur.south, b.south), math.min(cur.east, b.east),
            math.min(cur.north, b.north)), None))
      }
    }
    // a registered concatenated operation keeps its own area of use
    c.identOp.foreach { case (op, _) =>
      return meta.descOfArea(op.areaName).getOrElse(
        if (op.bbox.contains(Bbox(-180, -90, 180, 90))) "World"
        else "unknown domain of validity")
    }
    // conversion legs count as world extent in the reference's getExtent
    // (conversionExtentIsWorld) and so never narrow the intersection
    for ((op, _) <- c.dispHops) add(op.bbox, op.areaName)
    if (c.dispHops.isEmpty && c.areaName.nonEmpty)
      return meta.descOfArea(c.areaName).getOrElse(c.areaName)
    if (c.dispHops.isEmpty && (lc.isDefined || rc.isDefined)) {
      // bare conversion: its own extent
      val code = dst.projCode.orElse(src.projCode).get
      val convKey = EpsgMeta.projConv.get(code).map(_._1).getOrElse("")
      meta.convs.get(convKey).foreach(k =>
        acc = Some((Bbox(0, 0, 0, 0), meta.descOfArea(k.areaName))))
    }
    if (c.dispHops.length > 1 &&
      acc.exists(_._1 == Bbox(-180, -90, 180, 90))) return "World"
    acc.flatMap(_._2).getOrElse(
      if (acc.exists(_._1 == Bbox(-180, -90, 180, 90))) "World"
      else "unknown domain of validity")
  }

  private def crsAreaName(r: Resolved): String = {
    val code = if (db.vertical.contains(r.code)) r.code
      else r.projCode.getOrElse(r.geod.code)
    meta.crs.get(code).map(_.areaName).getOrElse("")
  }

  private def summaryLine(src: Resolved, dst: Resolved, c: Candidate): String = {
    val sb = new StringBuilder
    sb ++= displayId(src, dst, c)
    sb ++= ", "
    sb ++= displayName(src, dst, c)
    sb ++= ", "
    sb ++= displayAccuracy(src, dst, c)
    sb ++= ", "
    sb ++= displayArea(src, dst, c)
    if (c.ballpark || c.ballparkVertical) sb ++= ", has ballpark transformation"
    // time-dependent = has parameter rates; time-specific Helmerts carry an
    // epoch but take no per-coordinate time
    if (c.dispHops.exists(h => h._1.extras.contains("dx") ||
      h._1.extras.contains("drx")))
      sb ++= ", time-dependent operation"
    sb.toString
  }

  // --------------------------------------------------- operation WKT

  /** WKT2:2019 of a candidate: CONVERSION for bare conversions,
    * COORDINATEOPERATION for single ops and ballparks. */
  private def operationWkt(src: Resolved, dst: Resolved,
                           c: Candidate): Option[Node] = {
    val (lc, rc) = convLegs(src, dst, c)
    if (c.ballpark) return Some(ballparkWkt(src, dst, c))
    if (c.ballparkVertical && c.dispHops.isEmpty && lc.isEmpty && rc.isEmpty)
      return Some(ballparkVerticalWkt(src, dst, c))
    if (c.dispHops.isEmpty && lc.isEmpty && rc.isDefined) {
      val convKey = EpsgMeta.projConv.get(dst.projCode.get).map(_._1)
        .getOrElse("")
      return meta.convs.get(convKey).map(_ =>
        WktOut.conversionNode(convKey, ids = true))
    }
    if (c.dispHops.length == 1 && lc.isEmpty && rc.isEmpty)
      return Some(singleOpWkt(src, dst, c))
    None
  }

  private def crsRefNode(r: Resolved): Option[Node] = {
    if (db.vertical.contains(r.code))
      return WktOut.crsNode(r.code, v2019 = true, ids = true, withUsage = false)
    val code = r.projCode.getOrElse(r.geod.code)
    val full = r.vert.map(v => db.compound.find(_._2.horiz == code)
      .map(_._1)).flatten
    WktOut.crsNode(full.getOrElse(code), v2019 = true, ids = true,
      withUsage = false)
  }

  private def singleOpWkt(src: Resolved, dst: Resolved, c: Candidate): Node = {
    val (op, inv) = c.dispHops.head
    val om = meta.opMeta.getOrElse(op.code, EpsgMeta.OpMeta("", "", "", ""))
    val name = hopName(op, inv)
    val derivedOp = op.extras.get("grid").flatMap(db.gridAlias.get).exists(a =>
      a.proj.nonEmpty && a.proj != op.extras("grid"))
    // the PROJ-alternative-grid derivative keeps the name and id but not
    // the registry's operation version
    val version = if (om.version.nonEmpty && !derivedOp)
      Seq(Child(Node("VERSION", Seq(Q(om.version))))) else Nil
    val srcN = crsRefNode(src).map(n => Child(Node("SOURCECRS", Seq(Child(n)))))
    val dstN = crsRefNode(dst).map(n => Child(Node("TARGETCRS", Seq(Child(n)))))
    val derivedAlias = op.extras.get("grid").flatMap(db.gridAlias.get)
    // inverse single operations print "Inverse of"-wrapped method names and
    // INVERSE(...)-wrapped authorities (reference InverseTransformation)
    def methodNode(mname: String, mkey: String): Node = {
      val nm = if (inv) "Inverse of " + mname else mname
      val key = if (inv) s"INVERSE(${mkey.substring(0, mkey.indexOf(':'))}):" +
        mkey.substring(mkey.indexOf(':') + 1) else mkey
      Node("METHOD", Seq(Q(nm), Child(WktOut.idNode(key))))
    }
    val (methodParts, paramParts) = op.kind match {
      case 'G' =>
        val file = c.grids.headOption.map(_._1)
          .getOrElse(op.extras.getOrElse("grid", ""))
        val substituted = derivedAlias.exists(a =>
          a.proj.nonEmpty && a.proj != op.extras("grid"))
        val aliasMethod = derivedAlias.map(_.method).getOrElse("hgridshift")
        // only the horizontal-shift formats change METHOD on substitution;
        // geoid models keep their EPSG method identity
        val m =
          if (substituted && (aliasMethod == "hgridshift" || aliasMethod == "gridshift")) {
            val kw = if (aliasMethod == "gridshift") "GENERAL_SHIFT_GTIFF"
              else "HORIZONTAL_SHIFT_GTIFF"
            Node("METHOD", Seq(Q(kw)))
          } else methodNode(om.methodName, s"EPSG:${op.method}")
        val pfileName =
          if (aliasMethod == "geoid_like" || aliasMethod == "vgridshift")
            "Geoid (height correction) model file"
          else "Latitude and longitude difference file"
        (Seq(Child(m)),
          Seq(Child(Node("PARAMETERFILE", Seq(Q(pfileName), Q(file))))))
      case _ =>
        (Seq(Child(methodNode(om.methodName, s"EPSG:${op.method}"))), Nil)
    }
    val acc = opAccText(op)
    val accN = if (acc.nonEmpty)
      Seq(Child(Node("OPERATIONACCURACY", Seq(Raw(acc))))) else Nil
    val usage = WktOut.usageParts(om.scope, op.areaName, op.bbox, v2019 = true)
    val idAuth = {
      val derived = op.extras.get("grid").flatMap(db.gridAlias.get).exists(a =>
        a.proj.nonEmpty && a.proj != op.extras("grid"))
      val base = if (derived) s"DERIVED_FROM(${op.auth})" else op.auth
      if (inv) s"INVERSE($base)" else base
    }
    val idN = Seq(Child(WktOut.idNode(
      s"$idAuth:${op.code.substring(op.code.indexOf(':') + 1)}")))
    val remark = if (om.remark.nonEmpty)
      Seq(Child(Node("REMARK", Seq(Q(om.remark))))) else Nil
    Node("COORDINATEOPERATION", Seq(Q(name)) ++ version ++
      srcN.toSeq ++ dstN.toSeq ++ methodParts ++ paramParts ++ accN ++
      usage ++ idN ++ remark)
  }

  private def ballparkVerticalWkt(src: Resolved, dst: Resolved,
                                  c: Candidate): Node = {
    val srcN = crsRefNode(src).map(n => Child(Node("SOURCECRS", Seq(Child(n)))))
    val dstN = crsRefNode(dst).map(n => Child(Node("TARGETCRS", Seq(Child(n)))))
    val method = Node("METHOD", Seq(Q("Change of Vertical Unit"),
      Child(WktOut.idNode("EPSG:1069"))))
    val param = Child(Node("PARAMETER", Seq(Q("Unit conversion scalar"), Raw("1"),
      Child(WktOut.unitNode("EPSG:9201", ids = false)),
      Child(WktOut.idNode("EPSG:1051")))))
    val usage = Seq(Child(Node("USAGE", Seq(
      Child(Node("SCOPE", Seq(Q("unknown")))),
      Child(Node("AREA", Seq(Q("World")))),
      Child(Node("BBOX", Seq(Raw("-90"), Raw("-180"), Raw("90"), Raw("180"))))))))
    Node("COORDINATEOPERATION", Seq(Q(c.name)) ++ srcN.toSeq ++ dstN.toSeq ++
      Seq(Child(method), param) ++ usage)
  }

  private def ballparkWkt(src: Resolved, dst: Resolved, c: Candidate): Node = {
    val srcN = crsRefNode(src).map(n => Child(Node("SOURCECRS", Seq(Child(n)))))
    val dstN = crsRefNode(dst).map(n => Child(Node("TARGETCRS", Seq(Child(n)))))
    val method = Node("METHOD", Seq(Q("Geographic2D offsets"),
      Child(WktOut.idNode("EPSG:9619"))))
    def offset(pname: String, pcode: Int) =
      Child(Node("PARAMETER", Seq(Q(pname), Raw("0"),
        Child(WktOut.unitNode("EPSG:9102", ids = false)),
        Child(WktOut.idNode(s"EPSG:$pcode")))))
    val usage = Seq(Child(Node("USAGE", Seq(
      Child(Node("SCOPE", Seq(Q("unknown")))),
      Child(Node("AREA", Seq(Q("World")))),
      Child(Node("BBOX", Seq(Raw("-90"), Raw("-180"), Raw("90"), Raw("180"))))))))
    Node("COORDINATEOPERATION", Seq(Q(c.name)) ++ srcN.toSeq ++ dstN.toSeq ++
      Seq(Child(method), offset("Latitude offset", 8601),
        offset("Longitude offset", 8602)) ++ usage)
  }

  // --------------------------------------------------------- --list-crs

  /** enumerate the registry, reference projinfo_lib.cpp:1954 — the
    * getCRSInfoList sweep with type / deprecation / bbox / area filters. */
  private def runListCrs(o: Opt, io: CliOut): Int = {
    var allowDeprecated = false
    var types = Set.empty[String]
    val tokens =
      if (o.listCrsFilter.isEmpty) Nil else o.listCrsFilter.split(',').toList
    for (t <- tokens) t.toLowerCase match {
      case "allow_deprecated" => allowDeprecated = true
      case "geodetic" => types ++= Set("g2", "g3", "gc")
      case "geocentric" => types += "gc"
      case "geographic" => types ++= Set("g2", "g3")
      case "geographic_2d" => types += "g2"
      case "geographic_3d" => types += "g3"
      case "vertical" => types += "vt"
      case "projected" => types += "pj"
      case "compound" => types += "cp"
      case "engineering" => types += "en"
      case other =>
        io.err(s"Unrecognized value for option --list-crs: $other\n")
        return usage(io)
    }

    // area-of-interest filter (reference makeBboxFilter with
    // errorIfSeveralAreaMatches=false: several matches fall back to a
    // substring filter on each CRS's own area description)
    var bboxFilter: Option[Bbox] = None
    if (o.bboxStr.nonEmpty) {
      val p = o.bboxStr.split(',')
      if (p.length != 4) {
        io.err(s"Incorrect number of values for option --bbox: ${o.bboxStr}\n")
        return usage(io)
      }
      bboxFilter = Some(Bbox(p(0).toDouble, p(1).toDouble, p(2).toDouble,
        p(3).toDouble))
    } else if (o.area.nonEmpty) {
      if (!o.area.contains(' ') && o.area.contains(':')) {
        val e = meta.extents.get(normKey(o.area)).getOrElse {
          io.err("Area of use retrieval failed: extent not found\n"); return 1
        }
        bboxFilter = e.bbox
      } else {
        val exact = meta.areasByName(o.area, approx = false)
        if (exact.length == 1) bboxFilter = exact.head.bbox
        else {
          val approx = meta.areasByName(o.area, approx = true)
          if (approx.length == 1) bboxFilter = approx.head.bbox
          else if (approx.isEmpty) {
            io.err("No area of use matching provided name\n"); return 1
          } // several matches: substring filter below
        }
      }
    }
    val areaLower = o.area.toLowerCase

    val allowed =
      if (o.authority.isEmpty) Seq("") else o.authority.split(',').toSeq
    for (auth <- allowed; info <- CrsInventory.inv.forAuthority(auth)) {
      val keep = (allowDeprecated || !info.deprecated) &&
        (types.isEmpty || types.contains(info.typ)) &&
        (bboxFilter match {
          case Some(f) => info.bbox.exists { b =>
            val parts = splitBox(b)
            if (o.spatialIntersects) parts.exists(p => boxIntersects(f, p))
            else parts.forall(p => boxContains(f, p))
          }
          case None =>
            o.area.isEmpty || info.areaName.toLowerCase.contains(areaLower)
        })
      if (keep)
        io.out(s"${info.auth}:${info.code} \"${info.name}\"" +
          (if (info.deprecated) " [deprecated]" else "") + "\n")
    }
    0
  }

  // --------------------------------------------------------- completion

  /** shell-completion word suggestions, reference
    * projinfo_lib.cpp:1182 (suggestCompletion). */
  private def completion(args: Seq[String], io: CliOut): Int = {
    if (args.exists(_.isEmpty)) return 0
    val auths = CrsInventory.inv.authorities
    var first = true
    def printSp(s: String): Unit = {
      if (!first) io.out(" "); first = false; io.out(s)
    }
    if (args.isEmpty) {
      auths.foreach(a => printSp(a + ":")); io.out("\n"); return 0
    }
    if (args.length == 1 && args.head.head != '-' && !args.head.contains(':'))
      auths.filter(_.startsWith(args.head)).foreach(a => printSp(a + ":"))

    def isOption(opt: String) = args.last == opt ||
      (args.length >= 2 && args(args.length - 2) == opt)

    if (isOption("-k")) { io.out("crs operation datum ensemble ellipsoid\n"); return 0 }
    if (isOption("-o")) {
      if (args.last.startsWith("WKT1:")) io.out("GDAL ESRI\n")
      else if (args.last.startsWith("WKT2:")) io.out("2019 2015\n")
      else io.out("all PROJ WKT2:2019 WKT2:2015 WKT1:GDAL WKT1:ESRI PROJJSON SQL\n")
      return 0
    }
    if (isOption("--spatial-test")) { io.out("contains intersects\n"); return 0 }
    if (isOption("--crs-extent-use")) { io.out("none both intersection smallest\n"); return 0 }
    if (isOption("--grid-check")) { io.out("none discard_missing sort known_available\n"); return 0 }
    if (isOption("--pivot-crs")) {
      if (args.last.last == ':') return 0
      io.out("always if_no_direct_transformation never")
      auths.foreach(a => io.out(" " + a + ":"))
      io.out("\n")
      return 0
    }
    if (args.last.head == '-') {
      val knownOptions = Seq("-o", "-k", "--summary", "-q", "--area",
        "--bbox", "--spatial-test", "--crs-extent-use", "--grid-check",
        "--pivot-crs", "--show-superseded", "--hide-ballpark", "--accuracy",
        "--allow-ellipsoidal-height-as-vertical-crs", "--boundcrs-to-wgs84",
        "--authority", "--main-db-path", "--aux-db-path", "--identify",
        "--3d", "--output-id", "--c-ify", "--single-line", "--searchpaths",
        "--remote-data", "--list-crs", "--dump-db-structure", "-s",
        "--s_epoch", "-t", "--t_epoch")
      if (knownOptions.contains(args.last)) return 0
      knownOptions.foreach(printSp)
      io.out("\n")
      return 0
    }

    // reconstruct a quoted multi-word CRS name from the word list
    var lastArg = args.last
    var j = args.length
    var stop = false
    while (!stop && j >= 1) {
      j -= 1
      val a = args(j)
      if (a.length >= 2 && a.last == '"') stop = true
      else if (a.length >= 2 && a.head == '"') {
        val sb = new StringBuilder(a.substring(1))
        for (k <- j + 1 until args.length) { sb.append(' ').append(args(k)) }
        lastArg = sb.toString
        stop = true
      }
    }

    val inv = CrsInventory.inv
    def esc(s: String): String = s.replace(" ", "\\ ")

    val columnPos = args.last.indexOf(':')
    if (columnPos >= 0) {
      val authName = args.last.substring(0, columnPos)
      val codeStart = args.last.substring(columnPos + 1)
      val matches = inv.forAuthority(authName).filter(i =>
        !i.deprecated && (codeStart.isEmpty || i.code.startsWith(codeStart)))
      val res =
        if (matches.length == 1) matches.map(_.code)
        else matches.map(i => s"${i.code} -- ${i.name}")
      res.foreach(v => printSp(esc(v)))
      io.out("\n")
      return 0
    }

    var matched = false
    for (authName <- Seq("EPSG", ""); if !matched) {
      val hits = inv.forAuthority(authName).filter(i =>
        !i.deprecated && i.name.startsWith(lastArg))
      for (i <- hits) {
        var v = i.name
        if (args.last == "+" || args.last == "/") {
          val pos = v.indexOf(args.last.head)
          if (pos >= 0 && pos + 1 < v.length && v.charAt(pos + 1) == ' ')
            v = v.substring(pos + 2)
        }
        printSp(esc(v))
      }
      if (!first) { io.out("\n"); matched = true }
    }

    // `<horizontal CRS name> +` suggests vertical CRSs sharing the
    // horizontal CRS's area of use (or World ones as a fallback)
    val posSpacePlus = lastArg.indexOf(" +")
    if (!matched && posSpacePlus >= 0) {
      val horizName = lastArg.substring(0, posSpacePlus)
      val horizTypes = Set("g2", "pj", "en")
      val cand = inv.all.find(i => horizTypes.contains(i.typ) &&
        i.name.equalsIgnoreCase(horizName))
      cand.foreach { h =>
        // single domain of validity only (multiple usage rows → skip)
        val sameCrs = inv.all.count(i => i.auth == h.auth && i.code == h.code)
        if (sameCrs == 1 && h.bbox.isDefined) {
          def trimArea(s: String): String = {
            val d = s.indexOf(" -"); if (d >= 0) s.substring(0, d) else s
          }
          val horizArea = trimArea(h.areaName)
          val vlist = inv.forAuthority(h.auth).filter(i =>
            !i.deprecated && i.bbox.isDefined && i.typ == "vt" &&
              !i.name.startsWith("EPSG example"))
          var attempt = 0
          while (first && attempt < 2) {
            for (v <- vlist) {
              val vArea = trimArea(v.areaName)
              val ok =
                if (attempt == 0) horizArea.nonEmpty && horizArea == vArea
                else vArea == "World."
              if (ok) printSp(esc(v.name))
            }
            if (!first) io.out("\n")
            attempt += 1
          }
        }
      }
    }
    0
  }
}
