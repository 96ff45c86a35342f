package graft.cli

import graft.core.{Coord, GeoMath, ProjError}
import graft.proj.{Dispatch, IOUnits, ParamList, PJ, Proj}

/** The `cs2cs` application (reference src/apps/cs2cs.cpp), re-expressed
  * over the engine's PJ layer. Source and target are proj-strings (or
  * `+init=` / `EPSG:` aliases resolving through the generated init table);
  * the transformation is the legacy hub composition the reference's
  * proj4-init-rules path produces: src⁻¹ → WGS84 geodetic hub → dst, with
  * the towgs84/nadgrids/geoidgrids hops already wired into each PJ by
  * Proj.create's cs2cs-emulation setup (Dispatch fwd-prepare/inv-finalize).
  *
  * Ballpark rule (reference createOperations: a side without datum
  * information yields a ballpark transformation): the horizontal datum hop
  * runs only when BOTH sides carry datum info; the vertical (geoidgrids)
  * hop only when the source is 3D (geocentric, a known 3D geographic code,
  * or promoted via --3d).
  */
object CliCs2cs {
  import CliIo._

  private final case class Side(P: PJ, str: String, isLongLat: Boolean,
                                isGeocent: Boolean, hasDatum: Boolean,
                                is3D: Boolean, isGeoc: Boolean,
                                latFirst: Boolean, toRad: Double,
                                cartBridge: PJ = null,
                                /** +geoidgrids makes the side a compound
                                  * CRS — cs2cs then formats it as non-
                                  * longlat (decimal %.2f default) even
                                  * though the values are degrees. */
                                compoundVertical: Boolean = false)

  /** geographic-3D codes the corpus exercises (the generated init table
    * carries no dimensionality; iso19111 is out of scope). */
  private val geog3dCodes = Set("4979", "4327", "4329", "7912", "7843")

  // authority axis order/unit comes from the generated epsg_axis sidecar
  // (Proj.epsgAxisFirst): lat/north-first and grad-unit codes are data,
  // not a heuristic

  /** the handful of CRS names the corpus uses that map 1:1 to codes
    * (general name lookup needs the iso19111 database). */
  private val nameAliases = Map(
    "NAD27" -> "EPSG:4267", "NAD83" -> "EPSG:4269")

  private def makeSide(toks0: Seq[String]): Side = {
    val toks = toks0.map(_.stripPrefix("+"))
    // WKT: map to a proj string, keeping the authority metadata
    val joined = toks.mkString(" ")
    if (graft.proj.wkt.Wkt.looksLikeWkt(joined)) {
      try {
        graft.proj.wkt.WktMap.toObject(graft.proj.wkt.Wkt.parse(joined)) match {
          case c: graft.proj.wkt.WktCrsDef =>
            val base = makeSide(c.projString.split(" ").toSeq)
            return base.copy(latFirst = c.latFirst, toRad = c.angularUnitToRad,
              is3D = base.is3D || c.is3D)
          case _: graft.proj.wkt.WktOpDef =>
            throw new CliExit(1, "cannot instantiate coordinate system: WKT object is an operation, not a CRS")
        }
      } catch {
        case e: ProjError =>
          throw new CliExit(1, s"cannot instantiate coordinate system: ${e.getMessage}")
      }
    }
    // a lone token with no '=' is a CRS code or name, not a proj string
    val single = toks.size == 1 && !toks.head.contains('=')
    val str = if (single) nameAliases.getOrElse(toks.head.trim, toks.head)
      else toks.mkString(" ")
    val P =
      try {
        if (single) Proj.create(str)
        else Proj.create(new ParamList(toks.toVector.map { t =>
          val eq = t.indexOf('=')
          if (eq < 0) (t, "")
          // dequote values so +nadgrids="dir with space/x" survives
          else (t.substring(0, eq),
            t.substring(eq + 1).stripPrefix("\"").stripSuffix("\""))
        }))
      } catch {
        case e: ProjError =>
          throw new CliExit(1, s"cannot instantiate coordinate system: ${e.getMessage}")
      }
    val params = P.params
    val hasDatum = params.has("towgs84") || params.has("nadgrids")
    val initCode = params.s("init").collect {
      case s if s.startsWith("epsg:") => s.substring(5)
    }
    val epsgCode = {
      val t = str.trim
      if (t.length > 5 && t.regionMatches(true, 0, "EPSG:", 0, 5)) Some(t.substring(5).trim)
      else None
    }
    val is3D = P.isGeocent ||
      initCode.exists(geog3dCodes) || epsgCode.exists(geog3dCodes)
    // ob_tran with an angular o_proj is a rotated-pole geographic CRS
    // (reference #1525): treat it as long/lat in degrees
    val obTranAngular = P.shortName == "ob_tran" &&
      params.s("o_proj").exists(Set("longlat", "latlong", "latlon", "lonlat"))
    // a bare EPSG code uses authority axis order, from the generated
    // sidecar: north/south-first codes swap, NTF(Paris) family is in grads
    val axisFirst = epsgCode.flatMap(Proj.epsgAxisFirst.get)
    val latFirst = axisFirst.exists(a => a._1 == "north" || a._1 == "south")
    val toRad =
      if (axisFirst.exists(_._2 == "grad")) math.Pi / 200.0 else GeoMath.DEG2RAD
    // +geoc is handled at the app level (geocentric latitude is a property
    // of the CRS axis, not of the hub hop) — neutralize the PJ flag
    val isGeoc = P.geoc
    P.geoc = false
    // ops with a true 3D kernel (sch, geocent, topocentric) carry the
    // height through the transformation; plain 2D projections do not
    val op3D = P.isGeocent || P.left == IOUnits.CARTESIAN ||
      (P.hasCap(graft.proj.OpKernel.FWD3) && !P.isLatlong)
    // the datum-shift hub emulation built by Proj.create uses helmert
    // +exact; the crs_to_crs path the cs2cs app mirrors uses the
    // small-angle position-vector step (EPSG geog2D-domain method), which
    // differs at the mm level for large rotations (MGI) — rebuild without
    // exact
    if (P.emuHelmert != null) {
      params.s("towgs84").foreach { tw =>
        val q = Proj.create(new ParamList(Vector(
          "break_cs2cs_recursion" -> "", "proj" -> "helmert",
          "towgs84" -> tw, "convention" -> "position_vector")))
        q.skipFwdPrepare = true; q.skipFwdFinalize = true
        q.skipInvPrepare = true; q.skipInvFinalize = true
        P.emuHelmert = q
      }
    }
    // an op whose geographic-facing side is geocentric cartesian
    // (topocentric) needs a cart hop to reach the geodetic hub
    val cartBridge =
      if (P.left == IOUnits.CARTESIAN && !P.isGeocent) {
        val q = Proj.create(new ParamList(Vector(
          "break_cs2cs_recursion" -> "", "proj" -> "cart",
          "a" -> P.a.toString, "es" -> P.es.toString)))
        q.skipFwdPrepare = true; q.skipFwdFinalize = true
        q.skipInvPrepare = true; q.skipInvFinalize = true
        q
      } else null
    Side(P, str, isLongLat = P.isLatlong || obTranAngular, isGeocent = P.isGeocent,
      hasDatum = hasDatum, is3D = is3D || op3D, isGeoc = isGeoc,
      latFirst = latFirst, toRad = toRad, cartBridge = cartBridge,
      compoundVertical = params.s("geoidgrids").exists(_.nonEmpty))
  }

  def run(args: Seq[String], stdin: String, progName: String = "cs2cs",
          files: Map[String, String] = Map.empty,
          env: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    try {
      runInner(args, stdin, progName, io, files, env)
      CliResult(io.stdout, io.stderr, io.combined, 0)
    } catch {
      case ex: CliExit =>
        // emess fatal shape (reference src/apps/emess.cpp)
        io.err(s"\n${ex.message}\nprogram abnormally terminated\n")
        CliResult(io.stdout, io.stderr, io.combined, ex.code)
    }
  }

  private def runInner(args: Seq[String], stdin: String, progName: String,
                       io: CliOut, files: Map[String, String],
                       env: Map[String, String]): Unit = {
    var echoin = false
    var inverse = progName.startsWith("inv")
    var reversein = false
    var reverseout = false
    var promoteTo3D = false
    var noBallpark = false
    var accuracySet = false
    var accuracy: Option[Double] = None
    var authority: Option[String] = None
    var onlyBest: Option[Boolean] = None
    var sEpoch: Option[Double] = None
    var tEpoch: Option[Double] = None
    var area: Option[graft.proj.EpsgDb.Bbox] = None
    var oform: Option[String] = None
    var oterr = "*\t*"
    var tag = '#'
    val rtodms = new Rtodms()
    var fromToks = Vector.empty[String]
    var toToks = Vector.empty[String]
    var haveTo = false
    val eargs = scala.collection.mutable.ArrayBuffer.empty[String]

    val isProj4Style = args.exists(_.startsWith("+"))

    var i = 0
    def nextArg(flag: String): String = {
      i += 1
      if (i >= args.length) throw new CliExit(1, s"missing argument for $flag")
      args(i)
    }
    while (i < args.length) {
      val arg = args(i)
      if (arg.startsWith("--")) {
        arg match {
          case "--3d" => promoteTo3D = true
          case "--no-ballpark" => noBallpark = true
          case "--only-best" | "--only-best=yes" => onlyBest = Some(true)
          case "--only-best=no" => onlyBest = Some(false)
          case "--accuracy" =>
            val v = nextArg(arg); accuracySet = true
            accuracy = v.toDoubleOption
          case "--authority" => authority = Some(nextArg(arg))
          case "--s_epoch" => sEpoch = nextArg(arg).toDoubleOption
          case "--t_epoch" => tEpoch = nextArg(arg).toDoubleOption
          case "--area" =>
            val v = nextArg(arg)
            area = graft.proj.OpFactory.areaBboxByName(v)
            if (area.isEmpty)
              throw new CliExit(1, s"Invalid value for option --area: $v")
          case "--bbox" =>
            val v = nextArg(arg).split(',')
            if (v.length == 4)
              area = Some(graft.proj.EpsgDb.Bbox(
                v(0).toDouble, v(1).toDouble, v(2).toDouble, v(3).toDouble))
          case other => throw new CliExit(1, s"invalid option: $other")
        }
      } else if (arg.length > 1 && arg.charAt(0) == '-') {
        var j = 1
        var done = false
        while (j < arg.length && !done) {
          arg.charAt(j) match {
            case 'I' => inverse = true
            case 'E' => echoin = true
            case 'r' => reversein = true
            case 's' => reverseout = true
            case 'v' => ()
            case 'e' => oterr = nextArg("-e"); done = true
            case 'f' => oform = Some(nextArg("-f")); done = true
            case 'd' =>
              val d = nextArg("-d"); done = true
              oform = Some(s"%.${d.toIntOption.getOrElse(0)}f")
            case 'D' => nextArg("-D"); done = true
            case 't' =>
              if (j + 1 < arg.length) { tag = arg.charAt(j + 1); j += 1 }
              else throw new CliExit(1, "missing -t col. 1 tag")
            case c @ ('w' | 'W') =>
              if (j + 1 < arg.length && arg.charAt(j + 1).isDigit &&
                  arg.charAt(j + 1) <= '8' &&
                  (j + 2 >= arg.length || !arg.charAt(j + 2).isDigit)) {
                rtodms.set(arg.charAt(j + 1) - '0', c == 'W'); j += 1
              } else throw new CliExit(1, "-W argument missing or not in range [0,8]")
            case other => throw new CliExit(1, s"invalid option: -$other")
          }
          j += 1
        }
      } else if (!isProj4Style) {
        if (fromToks.isEmpty) fromToks = Vector(arg)
        else if (toToks.isEmpty) toToks = Vector(arg)
        else eargs += arg
      } else if (arg == "+to") haveTo = true
      else if (arg.startsWith("+")) {
        if (haveTo) toToks :+= arg
        else fromToks :+= arg
      } else if (!haveTo) fromToks = Vector(arg)
      else if (toToks.isEmpty) toToks = Vector(arg)
      else eargs += arg

      i += 1
    }

    oform.foreach { f =>
      if (CFormat.parse(f).isEmpty) throw new CliExit(1, "invalid format string")
    }
    if (inverse) { val t = fromToks; fromToks = toToks; toToks = t }
    if (fromToks.isEmpty && toToks.isEmpty)
      throw new CliExit(1, "missing source and target coordinate systems")

    // ---- database path: both sides are CRS codes/names the EPSG sidecar
    // resolves (reference: proj_create_crs_to_crs over the iso19111
    // database). Proj-string / WKT / missing sides keep the legacy hub path.
    // a real WKT string (GEOGCRS["..."]) never resolves as a CRS name, so
    // the DB attempt safely precedes the WKT/proj-string path — names like
    // "NAD83(HARN)" would otherwise be mistaken for WKT syntax
    def dbSpecOf(toks: Vector[String]): Option[String] = {
      val c = toks.map(_.stripPrefix("+"))
      if (c.size != 1) None
      else if (!c.head.contains('=')) Some(c.head)
      // +init=IGNF:CODE resolves through the sidecar (the legacy IGNF init
      // file was retired upstream; its registry lives in the database)
      else if (c.head.startsWith("init=IGNF:")) Some(c.head.substring(5))
      else None
    }
    val dbFrom = dbSpecOf(fromToks)
    val dbTo = dbSpecOf(toToks)
    if (fromToks.nonEmpty && toToks.nonEmpty && dbFrom.isDefined && dbTo.isDefined &&
        (!isProj4Style || dbFrom.exists(_.startsWith("IGNF:")) ||
          dbTo.exists(_.startsWith("IGNF:")))) {
      val pair = for {
        s <- graft.proj.OpFactory.resolve(dbFrom.get)
        d <- graft.proj.OpFactory.resolve(dbTo.get)
      } yield (s, d)
      pair match {
        case Some((srcR, dstR)) =>
          val inputText0 =
            if (eargs.isEmpty) stdin
            else CliIo.concatInputs(eargs.toSeq, stdin, files)
          runDb(srcR, dstR, io, files, env, inputText0, DbFlags(
            echoin = echoin, reversein = reversein, reverseout = reverseout,
            promoteTo3D = promoteTo3D, noBallpark = noBallpark,
            accuracy = if (accuracySet) accuracy.orElse(Some(0.0)) else None,
            authority = authority, onlyBest = onlyBest,
            sEpoch = sEpoch, tEpoch = tEpoch, area = area,
            oform = oform, oterr = oterr, tag = tag, rtodms = rtodms))
          return
        case None => ()
      }
    }

    // ---- GH-3607 / GH-3613 fallback: proj-string sides naming a +datum=
    // whose grids are ALL unavailable route through the EPSG registry
    // operations for the named datums (the reference resolves proj strings
    // through createFromUserInput and createOperations, which falls back to
    // e.g. "NAD27 to WGS 84 (6)" when @conus cannot be found)
    if (isProj4Style && fromToks.nonEmpty && toToks.nonEmpty) {
      import graft.proj.{Datums, OpFactory}
      val datumCrs = Map(
        "WGS84" -> "EPSG:4326", "NAD83" -> "EPSG:4269", "NAD27" -> "EPSG:4267",
        "GGRS87" -> "EPSG:4121", "potsdam" -> "EPSG:4314",
        "carthage" -> "EPSG:4223", "hermannskogel" -> "EPSG:4312",
        "militargeographische_institut" -> "EPSG:4312",
        "ire65" -> "EPSG:4299", "nzgd49" -> "EPSG:4272",
        "OSGB36" -> "EPSG:4277", "ch1903" -> "EPSG:4149")
      def datumOf(toks: Vector[String]): Option[String] =
        toks.map(_.stripPrefix("+")).collectFirst {
          case t if t.startsWith("datum=") => t.substring(6) }
      def sideResolved(toks: Vector[String]): Option[OpFactory.Resolved] =
        for {
          dn <- datumOf(toks)
          code <- datumCrs.get(dn)
          base <- OpFactory.resolveCode(code)
          ell <- Datums.toEllps.get(dn)
        } yield {
          val clean = toks.map(_.stripPrefix("+"))
          val projName = clean.collectFirst {
            case t if t.startsWith("proj=") => t.substring(5) }
          val isLL = projName.exists(p => p == "latlong" || p == "longlat" ||
            p == "latlon" || p == "lonlat")
          val body =
            if (isLL) None
            else Some((clean.filterNot(t => t.startsWith("datum=") ||
              t == "no_defs") :+ s"ellps=$ell").mkString(" "))
          base.copy(projBody = body, projCode = None, code = "PROJ4:" + dn)
        }
      val scoped = gridScope(files, env)
      def gridsAllMissing(toks: Vector[String]): Boolean =
        datumOf(toks).flatMap(Datums.toDefn.get) match {
          case Some(("nadgrids", list)) =>
            def avail(n: String): Boolean = scoped match {
              case Some((_, s)) => s.fetch(n).isDefined
              case None => graft.proj.ops.GridShiftOps.gridSource.fetch(n).isDefined
            }
            !list.split(',').map(_.stripPrefix("@")).exists(avail)
          case _ => false
        }
      if (gridsAllMissing(fromToks) || gridsAllMissing(toToks)) {
        (sideResolved(fromToks), sideResolved(toToks)) match {
          case (Some(srcR), Some(dstR)) =>
            val inputText0 =
              if (eargs.isEmpty) stdin
              else CliIo.concatInputs(eargs.toSeq, stdin, files)
            runDb(srcR, dstR, io, files, env, inputText0, DbFlags(
              echoin = echoin, reversein = reversein, reverseout = reverseout,
              promoteTo3D = promoteTo3D, noBallpark = noBallpark,
              accuracy = if (accuracySet) accuracy.orElse(Some(0.0)) else None,
              authority = authority, onlyBest = onlyBest,
              sEpoch = sEpoch, tEpoch = tEpoch, area = area,
              oform = oform, oterr = oterr, tag = tag, rtodms = rtodms))
            return
          case _ => ()
        }
      }
    }

    // ---- mixed proj-string <-> non-EPSG registry code (IAU_2015:...,
    // IGNF:...): the reference resolves both sides through
    // createFromUserInput. A datum-less proj-string side joins the code
    // side's datum when the ellipsoids are within a 0.59% relative size
    // difference (the reference's same-body heuristic), giving a null
    // datum hop; otherwise only a ballpark connects them.
    if (isProj4Style && fromToks.nonEmpty && toToks.nonEmpty) {
      import graft.proj.{EpsgDb, OpFactory}
      def codeSide(toks: Vector[String]): Option[OpFactory.Resolved] = {
        val c = toks.map(_.stripPrefix("+"))
        if (c.size == 1 && !c.head.contains('=') && c.head.contains(':') &&
            !c.head.regionMatches(true, 0, "EPSG:", 0, 5))
          OpFactory.resolve(c.head)
        else None
      }
      def strSide(toks: Vector[String],
                  other: OpFactory.Resolved): Option[OpFactory.Resolved] = {
        val clean = toks.map(_.stripPrefix("+"))
        val hasDatumInfo = clean.exists(t => t.startsWith("towgs84=") ||
          t.startsWith("nadgrids=") || t.startsWith("datum=") ||
          t.startsWith("init=") || t.startsWith("geoidgrids="))
        if (hasDatumInfo || !clean.exists(_.startsWith("proj="))) return None
        val body = clean.filterNot(_ == "no_defs").mkString(" ")
        val P = try graft.proj.Proj.create(new graft.proj.ParamList(
          graft.proj.ParamList.parse(body).entries :+ ("break_cs2cs_recursion" -> "")))
        catch { case _: graft.core.ProjError => return None }
        val rf = if (P.f == 0.0) 0.0 else 1.0 / P.f
        // same celestial body, close enough ellipsoid -> same datum (null
        // hop); else an anonymous datum only a ballpark can bridge
        val datum =
          if (math.abs(P.a - other.geod.a) / other.geod.a <= 0.0059)
            other.geod.datum
          else "PROJ4:anon-datum"
        val kind =
          if (P.isGeocent) EpsgDb.Geocentric else EpsgDb.Geog2D
        val geod = EpsgDb.GeodCrs("PROJ4:anon", kind, datum, P.a, rf,
          math.toDegrees(P.fromGreenwich), None, "unnamed")
        Some(OpFactory.Resolved(geod, kind,
          projBody = if (P.isLatlong || P.isGeocent) None else Some(body),
          projCode = None, vert = None, name = "unnamed", code = "PROJ4:anon"))
      }
      val mixed: Option[(OpFactory.Resolved, OpFactory.Resolved)] =
        (codeSide(fromToks), codeSide(toToks)) match {
          case (Some(f), None) => strSide(toToks, f).map(t => (f, t))
          case (None, Some(t)) => strSide(fromToks, t).map(f => (f, t))
          case _ => None
        }
      mixed match {
        case Some((srcR, dstR)) =>
          val inputText0 =
            if (eargs.isEmpty) stdin
            else CliIo.concatInputs(eargs.toSeq, stdin, files)
          runDb(srcR, dstR, io, files, env, inputText0, DbFlags(
            echoin = echoin, reversein = reversein, reverseout = reverseout,
            promoteTo3D = promoteTo3D, noBallpark = noBallpark,
            accuracy = if (accuracySet) accuracy.orElse(Some(0.0)) else None,
            authority = authority, onlyBest = onlyBest,
            sEpoch = sEpoch, tEpoch = tEpoch, area = area,
            oform = oform, oterr = oterr, tag = tag, rtodms = rtodms))
          return
        case None => ()
      }
    }

    // a missing side resolves to the other side's geographic base
    // (cs2cs.cpp get_geog_crs_proj_string_from_proj_crs)
    def geogBase(of: Side, missing: String): Side = {
      if (of.isLongLat || of.isGeocent)
        throw new CliExit(1, s"missing $missing CRS and the other CRS is not a projected CRS")
      val keep = Set("a", "b", "rf", "f", "es", "ellps", "R", "pm", "over")
      val geog = "proj=longlat " + of.P.params.entries.collect {
        case (k, v) if keep(k) => if (v.isEmpty) k else s"$k=$v"
      }.mkString(" ")
      makeSide((geog + " break_cs2cs_recursion").split(" ").toSeq)
    }
    val srcOpt = if (fromToks.nonEmpty) Some(makeSide(fromToks)) else None
    val dstOpt = if (toToks.nonEmpty) Some(makeSide(toToks)) else None
    val src = srcOpt.getOrElse(geogBase(dstOpt.get, "source"))
    val dst = dstOpt.getOrElse(geogBase(src, "target"))

    // ballpark rule: horizontal datum hop only when both sides carry datum
    // information (reference proj_create_crs_to_crs on a datum-less side);
    // a ballpark-only candidate fails under --no-ballpark, and under
    // --accuracy since a ballpark op carries unknown accuracy
    if (!(src.hasDatum && dst.hasDatum)) {
      if (noBallpark || accuracySet)
        throw new CliExit(3, "cannot initialize transformation\ncause: (null)")
      for (p <- Seq(src.P, dst.P)) {
        p.emuHgrid = null; p.emuHelmert = null; p.emuCart = null; p.emuCartWgs84 = null
      }
    }
    // vertical hop needs a 3D source (a 2D geographic z is not an
    // ellipsoidal height; cs2cs gets -45.06 only from 3D/promoted sources)
    if (!(src.is3D || promoteTo3D)) {
      for (p <- Seq(src.P, dst.P)) p.emuVgrid = null
    }

    // a compound (geoidgrids) side instantiates as a CompoundCRS, which
    // cs2cs does not treat as long/lat for I/O formatting
    val dstLL = dst.isLongLat && !dst.compoundVertical
    val srcDms = src.isLongLat && !src.compoundVertical &&
      math.abs(src.toRad - GeoMath.DEG2RAD) < 1e-10
    val informat: (String, Int) => (Double, Int) =
      if (srcDms) dmstorTok else strtodTok
    val effOform = if (!dstLL && oform.isEmpty) Some("%.2f") else oform
    // vertical participates only for geocentric/3D/promoted pipelines; a 2D
    // geographic z is no ellipsoidal height (geog2D-domain hub methods use
    // h=0 and drop the output height), so z passes through
    val vertical = src.isGeocent || dst.isGeocent || src.is3D || dst.is3D || promoteTo3D

    val inputText =
      if (eargs.isEmpty) stdin
      else CliIo.concatInputs(eargs.toSeq, stdin, files)
    for (line <- lines(inputText)) {
      if (line.nonEmpty && line.charAt(0) == tag) io.out(line + "\n")
      else {
        var pos = 0
        var u = 0.0
        var v = 0.0
        if (reversein) {
          val (a, p1) = informat(line, 0); v = a
          val (b, p2) = informat(line, p1); u = b; pos = p2
        } else {
          val (a, p1) = informat(line, 0); u = a
          val (b, p2) = informat(line, p1); v = b; pos = p2
        }
        var z = { val (zv, p) = strtodTok(line, pos); if (p != pos) { val r = zv; pos = p; r } else 0.0 }
        // C reads a possible t and rewinds so it is echoed verbatim
        val beforeTime = pos
        val t = { val (tv, p) = strtodTok(line, pos); if (p != pos) tv else HUGE }
        pos = beforeTime

        if (v == HUGE) u = HUGE
        if (echoin) { io.out(line.substring(0, math.min(pos, line.length))); io.out("\t") }

        var x = u
        var y = v
        if (u != HUGE) {
          if (src.latFirst) { val tmp = x; x = y; y = tmp }
          if (src.isLongLat && !srcDms) { x *= src.toRad; y *= src.toRad }
          val c = new Coord
          c.set(x, y, z, t)
          if (src.isGeoc) graft.proj.GeocentricLatitude.convert(src.P, forward = false, c)
          Dispatch.inv4d(src.P, c)
          if (!c.isError && src.cartBridge != null)
            Dispatch.trans(src.cartBridge, forward = false, c)
          if (!c.isError && dst.cartBridge != null)
            Dispatch.trans(dst.cartBridge, forward = true, c)
          if (!c.isError) Dispatch.fwd4d(dst.P, c)
          if (!c.isError && dst.isGeoc)
            graft.proj.GeocentricLatitude.convert(dst.P, forward = true, c)
          if (c.isError || c.x == HUGE) { x = HUGE; y = HUGE; z = HUGE }
          else {
            x = c.x; y = c.y
            // 2D pipelines pass z through with only the vertical unit
            // conversion (vto_meter) applied
            z = if (vertical) c.z else z * src.P.vtoMeter * dst.P.vfrMeter
          }
        } else x = HUGE

        if (x == HUGE) io.out(oterr)
        else if (dstLL && effOform.isEmpty) {
          // authority lat-first destinations print N/S first (cs2cs.cpp
          // destIsLatLong branch)
          val latF = dst.latFirst ^ reverseout
          if (latF) {
            io.out(rtodms.format(y, 'N', 'S')); io.out("\t")
            io.out(rtodms.format(x, 'E', 'W'))
          } else {
            io.out(rtodms.format(x, 'E', 'W')); io.out("\t")
            io.out(rtodms.format(y, 'N', 'S'))
          }
        } else {
          var ox = x
          var oy = y
          if (dst.isLongLat) { ox *= GeoMath.RAD2DEG; oy *= GeoMath.RAD2DEG }
          if (dst.latFirst ^ reverseout) { val tmp = ox; ox = oy; oy = tmp }
          val f = effOform.getOrElse("%.2f")
          io.out(CFormat.format(f, ox)); io.out("\t"); io.out(CFormat.format(f, oy))
        }

        io.out(" ")
        io.out(effOform match {
          case Some(f) => CFormat.format(f, z)
          case None => CFormat.format("%.3f", z)
        })
        io.out(line.substring(math.min(pos, line.length)))
        io.out("\n")
      }
    }
  }

  // ------------------------------------------------------- database path

  private final case class DbFlags(
      echoin: Boolean, reversein: Boolean, reverseout: Boolean,
      promoteTo3D: Boolean, noBallpark: Boolean,
      accuracy: Option[Double], authority: Option[String],
      onlyBest: Option[Boolean], sEpoch: Option[Double], tEpoch: Option[Double],
      area: Option[graft.proj.EpsgDb.Bbox],
      oform: Option[String], oterr: String, tag: Char, rtodms: Rtodms)

  /** Transform with a candidate-operation list from the EPSG sidecar —
    * the reference's proj_create_crs_to_crs + per-point proj_trans
    * selection, driven by the same cs2cs I/O conventions as the legacy hub
    * path. */
  private def runDb(src: graft.proj.OpFactory.Resolved,
                    dst: graft.proj.OpFactory.Resolved,
                    io: CliOut, files: Map[String, String],
                    env: Map[String, String], inputText: String,
                    flags: DbFlags): Unit = {
    import CliIo._
    import graft.proj.{EpsgDb, OpFactory, OpRuntime}
    import graft.proj.ops.GridShiftOps

    val debug = env.get("PROJ_DEBUG").exists(v =>
      v == "2" || v == "3" || v.equalsIgnoreCase("on"))

    val scoped = gridScope(files, env)
    val scopedSource: Option[GridShiftOps.GridSource] = scoped.map(_._2)

    // only-best default: flag > PROJ_ONLY_BEST_DEFAULT env > proj.ini
    // only_best_default; otherwise the reference's warn-mode default
    val iniOnlyBest: Option[Boolean] =
      (if (scoped.isDefined) files.get("proj.ini") else None).flatMap(
        _.split('\n').collectFirst {
          case l if l.trim.startsWith("only_best_default") =>
            val v = l.substring(l.indexOf('=') + 1).trim
            v.equalsIgnoreCase("on") || v.equalsIgnoreCase("yes")
        })
    val envOnlyBest = env.get("PROJ_ONLY_BEST_DEFAULT").filter(_.nonEmpty)
      .map(v => v.equalsIgnoreCase("yes") || v.equalsIgnoreCase("true") ||
        v.equalsIgnoreCase("on") || v == "1")
    val effOnlyBest = flags.onlyBest.orElse(envOnlyBest).orElse(iniOnlyBest)
    val onlyBestError = effOnlyBest.getOrElse(false)
    val onlyBestWarn = effOnlyBest.isEmpty

    def body(): Unit = {
      val opts = OpFactory.Options(
        authority = flags.authority,
        accuracy = flags.accuracy.getOrElse(-1.0),
        allowBallpark = !flags.noBallpark,
        onlyBestError = onlyBestError,
        onlyBestWarn = onlyBestWarn,
        epoch = flags.sEpoch.orElse(flags.tEpoch),
        area = flags.area)

      val prepared = OpFactory.prepare(src, dst, opts)
      val cands = prepared.cands
      if (cands.isEmpty)
        throw new CliExit(3, "cannot initialize transformation\ncause: (null)")
      val rt0 = new OpRuntime(cands, onlyBestError, onlyBestWarn,
        s => io.err(s + "\n"), _ => ())
      prepared.initFail.foreach { c =>
        io.err(rt0.missingGridMessage(c) + "\n")
        throw new CliExit(3,
          "cannot initialize transformation\ncause: File not found or invalid")
      }
      prepared.initWarn.foreach { c =>
        // warn-mode single-op protocol: the message (with the future-error
        // notice) is emitted at creation time, at debug level
        if (debug) io.err(rt0.missingGridMessage(c) +
          " This might become an error in a future PROJ major release. " +
          "Set the ONLY_BEST option to YES or NO. " +
          "This warning will no longer be emitted (for the current " +
          "transformation instance).\n")
      }

      val runtime = new OpRuntime(cands, onlyBestError, onlyBestWarn,
        s => io.err(s + "\n"),
        s => if (debug) io.err(s + "\n"),
        startSkipNonInstantiable = prepared.initWarn.isDefined)

      val srcDynamic = flags.sEpoch.isEmpty && EpsgDb.db.isDynamicDatum(src.geod.datum)
      val dstDynamic = flags.tEpoch.isEmpty && EpsgDb.db.isDynamicDatum(dst.geod.datum)

      def axisOf(r: OpFactory.Resolved): (Boolean, Double) = {
        val num = r.code.substring(r.code.indexOf(':') + 1)
        val ax = if (r.code.startsWith("EPSG:")) graft.proj.Proj.epsgAxisFirst.get(num)
          else None
        val latFirst = ax.exists(a => a._1 == "north" || a._1 == "south")
        val toRad = if (ax.exists(_._2 == "grad")) math.Pi / 200.0
          else graft.core.GeoMath.DEG2RAD
        (latFirst, toRad)
      }
      val (srcLatFirst, srcToRad) = axisOf(src)
      val (dstLatFirst, _) = axisOf(dst)

      val srcBase: Option[graft.proj.PJ] =
        src.projBody.map(b => graft.proj.Proj.create(b))
      val srcCart: Option[graft.proj.PJ] =
        if (src.isGeocentric)
          Some(graft.proj.Proj.create("proj=cart " + src.geod.ellTokens))
        else None

      val srcIsLL = src.isLongLat
      val dstLL = dst.isLongLat && dst.vert.isEmpty
      val srcDms = srcIsLL && src.vert.isEmpty &&
        math.abs(srcToRad - graft.core.GeoMath.DEG2RAD) < 1e-10
      val informat: (String, Int) => (Double, Int) =
        if (srcDms) dmstorTok else strtodTok
      val effOform = if (!dstLL && flags.oform.isEmpty) Some("%.2f") else flags.oform

      for (line <- lines(inputText)) {
        if (line.nonEmpty && line.charAt(0) == flags.tag) io.out(line + "\n")
        else {
          var pos = 0
          var u = 0.0
          var v = 0.0
          if (flags.reversein) {
            val (a, p1) = informat(line, 0); v = a
            val (b, p2) = informat(line, p1); u = b; pos = p2
          } else {
            val (a, p1) = informat(line, 0); u = a
            val (b, p2) = informat(line, p1); v = b; pos = p2
          }
          var z = { val (zv, p) = strtodTok(line, pos); if (p != pos) { val r = zv; pos = p; r } else 0.0 }
          val beforeTime = pos
          val (tv, tEnd) = strtodTok(line, pos)
          val hasT = tEnd != pos
          val t = if (hasT) tv else HUGE
          if (!hasT) {
            if (srcDynamic)
              io.err("Input coordinates lack a coordinate epoch, whereas the " +
                "source CRS is dynamic. Results might be inaccurate.\n")
            else if (dstDynamic)
              io.err("Input coordinates lack a coordinate epoch, " +
                "whereas the destination CRS is dynamic. " +
                "Results might be inaccurate.\n")
          }
          pos = beforeTime

          if (v == HUGE) u = HUGE
          if (flags.echoin) { io.out(line.substring(0, math.min(pos, line.length))); io.out("\t") }

          var x = u
          var y = v
          if (u != HUGE) {
            if (srcLatFirst) { val tmp = x; x = y; y = tmp }
            if (srcIsLL && !srcDms) { x *= srcToRad; y *= srcToRad }
            // the point in source geographic degrees, for extent checks
            var lonDeg = 0.0
            var latDeg = 0.0
            if (srcIsLL) {
              lonDeg = x * graft.core.GeoMath.RAD2DEG
              latDeg = y * graft.core.GeoMath.RAD2DEG
            } else {
              val c2 = new graft.core.Coord
              c2.set(x, y, z, t)
              srcBase.foreach(pj => graft.proj.Dispatch.trans(pj, forward = false, c2))
              srcCart.foreach(pj => graft.proj.Dispatch.trans(pj, forward = false, c2))
              if (!c2.isError) {
                lonDeg = c2.x * graft.core.GeoMath.RAD2DEG
                latDeg = c2.y * graft.core.GeoMath.RAD2DEG
              }
            }
            val c = new graft.core.Coord
            c.set(x, y, z, opts.epoch.getOrElse(t))
            val ok = runtime.trans(c, lonDeg, latDeg)
            if (!ok) { x = HUGE; y = HUGE; z = HUGE }
            else { x = c.x; y = c.y; z = c.z }
          } else x = HUGE

          if (x == HUGE) io.out(flags.oterr)
          else if (dstLL && effOform.isEmpty) {
            val latF = dstLatFirst ^ flags.reverseout
            if (latF) {
              io.out(flags.rtodms.format(y, 'N', 'S')); io.out("\t")
              io.out(flags.rtodms.format(x, 'E', 'W'))
            } else {
              io.out(flags.rtodms.format(x, 'E', 'W')); io.out("\t")
              io.out(flags.rtodms.format(y, 'N', 'S'))
            }
          } else {
            var ox = x
            var oy = y
            if (dst.isLongLat) {
              ox *= graft.core.GeoMath.RAD2DEG
              oy *= graft.core.GeoMath.RAD2DEG
            }
            if (dstLatFirst ^ flags.reverseout) { val tmp = ox; ox = oy; oy = tmp }
            val f = effOform.getOrElse("%.2f")
            io.out(CFormat.format(f, ox)); io.out("\t"); io.out(CFormat.format(f, oy))
          }

          io.out(" ")
          io.out(effOform match {
            case Some(f) => CFormat.format(f, z)
            case None => CFormat.format("%.3f", z)
          })
          io.out(line.substring(math.min(pos, line.length)))
          io.out("\n")
        }
      }
    }

    scoped match {
      case Some((key, s)) => GridShiftOps.withGridSource(key, s)(body())
      case None => body()
    }
  }

  /** PROJ_DATA semantics: '$tmpdir' / '$PWD' components resolve against the
    * test-provided in-memory files; '$PROJ_DATA'-style components keep the
    * default search roots. Returns (cache scope key, source) when the
    * environment overrides grid resolution. */
  private def gridScope(files: Map[String, String], env: Map[String, String])
      : Option[(String, graft.proj.ops.GridShiftOps.GridSource)] = {
    import graft.proj.ops.GridShiftOps
    val projData = env.get("PROJ_DATA")
    val memRoots = projData.exists(_.split(':').exists(p =>
      p.contains("$tmpdir") || p.contains("$PWD")))
    val defRoots = projData.forall(_.split(':').exists(p =>
      p.contains("$PROJ_DATA") || p.contains("${PROJ_DATA}")))
    projData.map { pd =>
      (pd + "#" + files.keySet.hashCode,
        new GridShiftOps.GridSource {
          def fetch(name: String): Option[Array[Byte]] =
            (if (memRoots) files.get(name).map(_.getBytes("ISO-8859-1")) else None)
              .orElse(if (defRoots) GridShiftOps.gridSource.fetch(name) else None)
        })
    }
  }
}
