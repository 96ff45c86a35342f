package graft.proj

import graft.core.Coord
import EpsgDb.{Bbox, CompCrs, Db, GeodCrs, Geog2D, Geog3D, Geocentric, Op, VertCrs}

/** Coordinate-operation factory over the generated EPSG sidecar — the
  * engine's equivalent of the reference's createOperations +
  * proj_create_crs_to_crs (reference src/iso19111/operation/
  * coordinateoperationfactory.cpp, src/crs_to_crs.cpp, src/trans.cpp),
  * re-derived for the subset of operation methods the EPSG dataset actually
  * uses: Helmert families (geocentric / geog2D / geog3D domains, time-
  * dependent and Molodensky-Badekas variants), grid transformations
  * (NTv2/NTv1/NADCON/NADCON5/CTable2/GeoTIFF, geoid height models, vertical
  * offset grids, geocentric interpolation), similarity / affine / offset
  * methods, and concatenated operations.
  *
  * Candidates carry the operation extent; per-point selection mirrors the
  * reference's pj_get_suggested_operation (best accuracy among extent
  * matches, smaller pseudo-area breaking ties, retry on failure, gridless
  * fallback), including the ONLY_BEST error/warn protocol and its exact
  * missing-grid message text (reference src/trans.cpp:47-211).
  */
object OpFactory {

  private def db: Db = EpsgDb.db

  // ------------------------------------------------------------ resolution

  /** A CRS resolved from a user spec (code, name, compound): the geodetic
    * core plus optional projection body and vertical component. */
  final case class Resolved(
      geod: GeodCrs,
      kind: Int,                       // of the full horizontal CRS
      projBody: Option[String],        // proj-string body (projected CRS)
      projCode: Option[String],        // projected CRS code
      vert: Option[VertCrs],
      name: String,
      /** code of the horizontal CRS as given (geodetic or projected) */
      code: String) {
    def is3D: Boolean = kind == Geog3D || kind == Geocentric || vert.isDefined
    def isGeocentric: Boolean = kind == Geocentric && projBody.isEmpty
    def isLongLat: Boolean = projBody.isEmpty && kind != Geocentric
    /** area of use: the horizontal CRS's own extent (projected CRS extent
      * when the code names one, else the geodetic CRS's) */
    def bbox: Option[Bbox] =
      projCode.flatMap(EpsgDb.db.projected.get).flatMap(_.bbox)
        .orElse(geod.bbox)
  }

  /** resolve an auth:code ("EPSG:4326", "4326+5773" handled by caller);
    * deprecated ESRI codes resolve to their EPSG replacements. */
  def resolveCode(code0: String): Option[Resolved] = {
    val code1 = normCode(code0)
    val code = db.codeAlias.getOrElse(code1, code1)
    db.geodetic.get(code).map { g =>
      Resolved(g, g.kind, None, None, None, g.name, code)
    }.orElse(db.projected.get(code).flatMap { p =>
      for {
        g <- db.geodetic.get(p.baseGeog)
        body <- projBodyOf(code)
      } yield Resolved(g, g.kind, Some(body), Some(code), None, p.name, code)
    }).orElse(db.compound.get(code).flatMap { x =>
      for {
        h <- resolveCode(x.horiz)
        v <- db.vertical.get(x.vert)
      } yield h.copy(vert = Some(v), name = x.name)
    }).orElse(db.vertical.get(code).flatMap { v =>
      // a bare vertical CRS used as a side: the reference promotes it with
      // an unspecified horizontal; cs2cs pairs it against the other side's
      // geographic CRS. Caller handles; not resolvable standalone here.
      None
    })
  }

  /** "EPSG:4326", "epsg:4326", "4326" (EPSG implied by callers that know) */
  private def normCode(c: String): String = {
    val t = c.trim
    val i = t.indexOf(':')
    if (i < 0) "EPSG:" + t
    else t.substring(0, i).toUpperCase match {
      case "EPSG" => "EPSG:" + t.substring(i + 1)
      case a => a + ":" + t.substring(i + 1)
    }
  }

  /** proj-string body for a projected/geodetic CRS code, from the generated
    * init table (strips +towgs84/+no_defs, keeps projection + ellipsoid). */
  def projBodyOf(code: String): Option[String] = {
    val num = code.substring(code.indexOf(':') + 1)
    if (!code.startsWith("EPSG:"))
      return db.projected.get(code).flatMap(_.body)
    Proj.epsgInitLookup(num).map { raw =>
      raw.split("\\s+").iterator.filter(_.nonEmpty).map(_.stripPrefix("+"))
        .filterNot(t => t.startsWith("towgs84=") || t == "no_defs")
        .map { t =>
          // a bare ellipsoid instead of datum=: factory pipelines express
          // datum changes as explicit hops, and a datum= token would drag
          // the legacy cs2cs emulation (towgs84/nadgrids sub-ops) into the
          // step, perturbing z through an unguarded cart round-trip
          if (t.startsWith("datum="))
            Datums.toEllps.get(t.substring(6)).map("ellps=" + _).getOrElse(t)
          else t
        }
        .mkString(" ")
    }
  }

  /** resolve a user CRS spec: auth:code, code+code compound, a CRS name,
    * or "name + name" compound (reference io.cpp createFromUserInput name
    * path: prefer geographic 2D, then 3D, when several objects share the
    * name). */
  def resolve(spec: String): Option[Resolved] = {
    val t = spec.trim
    // EPSG:a+b compound code form (also "EPSG:a+EPSG:b")
    val codeLike = t.nonEmpty &&
      (t.indexOf(':') > 0 && t.substring(0, t.indexOf(':')).forall(c =>
        c.isLetterOrDigit || c == '_')) && !t.contains(' ')
    if (codeLike) {
      val plus = t.indexOf('+')
      if (plus > 0) {
        val horiz = t.substring(0, plus)
        val vertPart0 = t.substring(plus + 1)
        val vertPart = if (vertPart0.contains(':')) normCode(vertPart0)
          else "EPSG:" + vertPart0
        for {
          h <- resolveCode(horiz)
          v <- db.vertical.get(vertPart)
        } yield h.copy(vert = Some(v),
          name = h.name + " + " + v.name)
      } else resolveCode(t)
    } else if (t.contains(" + ")) {
      val i = t.indexOf(" + ")
      for {
        h <- resolve(t.substring(0, i))
        vname <- Some(t.substring(i + 3))
        vcode <- db.byName(vname, "V").headOption
        v <- db.vertical.get(vcode._2)
      } yield h.copy(vert = Some(v), name = h.name + " + " + v.name)
    } else {
      // name lookup over CRS kinds; prefer geographic 2D then 3D, then
      // any single match
      val cands = db.byName(t, "CPX")
      val geo = cands.collect { case ('C', c) => db.geodetic(c) }
      geo.find(_.kind == Geog2D).orElse(geo.find(_.kind == Geog3D)) match {
        case Some(g) => resolveCode(g.code)
        case None => cands.headOption.flatMap { case (_, c) => resolveCode(c) }
      }
    }
  }

  // --------------------------------------------------------- candidates

  final case class Options(
      authority: Option[String] = None,
      accuracy: Double = -1.0,
      allowBallpark: Boolean = true,
      onlyBestError: Boolean = false,
      onlyBestWarn: Boolean = false,
      /** epoch forced onto input coordinates (--s_epoch / --t_epoch) */
      epoch: Option[Double] = None,
      /** explicit area of interest (--area / --bbox): candidates must
        * intersect it, and no ballpark fallback is synthesized */
      area: Option[Bbox] = None,
      /** authorities allowed in addition to EPSG/PROJ — set from the CRS
        * pair's own authorities (the reference's
        * authority_to_authority_preference) */
      implicitAuths: Set[String] = Set.empty,
      /** when both CRSs belong to one non-EPSG authority, its own ops (and
        * PROJ derivations) take precedence and EPSG ops are consulted only
        * when none exist (reference findOpsInRegistryDirect: authorities are
        * tried in preference order, stopping at the first non-empty) */
      preferAuth: Option[String] = None,
      /** grid availability probe (name -> available); tmpdir scenarios
        * replace it */
      gridAvailable: String => Boolean = OpFactory.defaultGridAvailable,
      /** description surface (projinfo): candidates are built for *display*
        * — operations the runtime hop chain cannot execute (tinshift /
        * defmodel / velocity grids, raw PROJ-string methods, ops between
        * projected CRSs) still materialize with their reference pipeline
        * text so they can be printed, sorted and summarized */
      displayOnly: Boolean = false)

  /** grid-availability handling modes (reference
    * CoordinateOperationContext::GridAvailabilityUse). */
  object GridMode {
    /** drop candidates with missing grids (cs2cs fallback pass) */
    final val Discard = 0
    /** keep candidates whose grids are CDN-registered (only-best protocol) */
    final val Known = 1
    /** keep everything, availability only affects sorting (projinfo default) */
    final val Sort = 2
    /** availability ignored entirely (projinfo --grid-check none) */
    final val Ignore = 3
  }

  /** grid availability through the engine's pluggable grid source; a grid
    * counts as available under its PROJ-delivered name or the original EPSG
    * name. */
  def defaultGridAvailable(name: String): Boolean =
    graft.proj.ops.GridShiftOps.activeSource.fetch(name).isDefined

  /** resolve an EPSG grid name to (name our readers can open, available?):
    * the PROJ-delivered name, the legacy (old) PROJ name, the original EPSG
    * name, or the bare stem NADCON .las/.los pairs ship under locally. */
  /** PROJ-delivered grid names (grid_alternatives proj_grid_name), for
    * gridsKnown checks on names that appear already-translated inside raw
    * PROJ-string methods. */
  private lazy val deliveredGridNames: Set[String] =
    db.gridAlias.valuesIterator.map(_.proj).toSet

  private def gridFile(orig: String, opts: Options): (String, Boolean) = {
    val alias = db.gridAlias.get(orig)
    val projName = alias.map(_.proj).getOrElse(orig)
    val tries = Seq(projName) ++ alias.map(_.old).filter(_.nonEmpty) ++
      Seq(orig, orig.toLowerCase) ++ {
        val stem = orig.stripSuffix(".las").stripSuffix(".los")
        if (stem != orig) Seq(stem) else Seq.empty
      }
    tries.distinct.find(opts.gridAvailable) match {
      case Some(n) => (n, true)
      case None => (projName, false)
    }
  }

  /** one geodetic-hop step (between geodetic CRS forms) */
  private final case class Hop(op: Op, inv: Boolean) {
    def name: String = if (inv) "Inverse of " + op.name else op.name
    def srcEnd: String = if (inv) op.dstCrs else op.srcCrs
    def dstEnd: String = if (inv) op.srcCrs else op.dstCrs
  }

  /** a candidate coordinate operation between the two full CRSs */
  final case class Candidate(
      name: String,
      accuracy: Double,
      /** extent boxes in geographic degrees (antimeridian split) */
      boxes: Seq[Bbox],
      pseudoArea: Double,
      areaName: String,
      /** grids used: (resolved file, available) */
      grids: Seq[(String, Boolean)],
      ballpark: Boolean,
      ballparkVertical: Boolean,
      stepCount: Int,
      pipeline: String,
      /** pipeline step count after peephole pruning (identity helmerts
        * dropped) — the reference's projStepCount sort key */
      projSteps: Int = 0,
      /** every grid is registered in the grid-alias table (CDN-published);
        * in the only-best/warn protocol such grids sort as if available
        * (reference "considerKnownGridsAsAvailable") */
      gridsKnown: Boolean = true,
      /** the geodetic/vertical hops (op + inverted?) in applied order —
        * the description surface (projinfo) renders ids, WKT and remarks
        * from these; empty for ballpark/conversion-only candidates */
      dispHops: Seq[(Op, Boolean)] = Nil,
      /** operates directly in the projected CRS pair's own space (whole-CRS
        * similarity/affine/TIN): no geographic I/O normalization applies */
      wholeCrs: Boolean = false,
      /** the registered operation this candidate IS (a concatenated
        * operation expanded into step hops keeps its registry identity —
        * id, name, accuracy and extent come from this op, reference
        * ConcatenatedOperation display) */
      identOp: Option[(Op, Boolean)] = None) {
    def gridsAvailable: Boolean = grids.forall(_._2)
    def hasGrids: Boolean = grids.nonEmpty
    /** the reference's hardcoded null-transformation priority ops
      * (coord_operation.cpp:58-75): once selected, a same-accuracy
      * smaller-area candidate may not displace them */
    val isPriorityOp: Boolean =
      name.contains("GDA94 to WGS 84 (1)") ||
        name.contains("GDA2020 to WGS 84 (2)") ||
        name.contains("NAD83 to NAD83(HARN) (47)") ||
        name.contains("NAD83 to NAD83(HARN) (48)") ||
        name.contains("NAD83 to NAD83(HARN) (49)") ||
        name.contains("NAD83 to NAD83(HARN) (50)")
    lazy val pj: Either[String, PJ] =
      try Right(Proj.create(pipeline))
      catch { case e: graft.core.ProjError => Left(e.getMessage) }
    def instantiable: Boolean = gridsAvailable && pj.isRight
  }

  private def boxesOf(b: Option[Bbox]): Seq[Bbox] = b match {
    case None => Seq(Bbox(-180, -90, 180, 90))
    case Some(bb) if bb.west > bb.east =>
      Seq(Bbox(bb.west, bb.south, 180, bb.north),
        Bbox(-180, bb.south, bb.east, bb.north))
    case Some(bb) => Seq(bb)
  }

  /** the reference's getPseudoArea: equatorial-radian width times the
    * sine-latitude band height. */
  def pseudoAreaOf(b: Bbox): Double = pseudoArea(Some(b))

  private def pseudoArea(b: Option[Bbox]): Double = {
    val bb = b.getOrElse(Bbox(-180, -90, 180, 90))
    val w = math.toRadians(bb.west)
    var e = math.toRadians(bb.east)
    val s = math.toRadians(bb.south)
    val n = math.toRadians(bb.north)
    if (w > e) e += 2 * math.Pi
    (e - w) * (math.sin(n) - math.sin(s))
  }

  private def intersect(a: Option[Bbox], b: Option[Bbox]): Option[Bbox] =
    (a, b) match {
      case (None, x) => x
      case (x, None) => x
      case (Some(p), Some(q)) =>
        // antimeridian-crossing intersection only matters when one side
        // wraps; conservatively take the wrapping box if the other is world
        def wraps(x: Bbox) = x.west > x.east
        if (wraps(p) || wraps(q)) Some(if (wraps(p)) p else q)
        else {
          val w = math.max(p.west, q.west); val e = math.min(p.east, q.east)
          val s = math.max(p.south, q.south); val n = math.min(p.north, q.north)
          if (w <= e && s <= n) Some(Bbox(w, s, e, n)) else Some(p)
        }
    }

  // ------------------------------------------------- pipeline assembly

  private val RAD = 0
  private val XYZ = 1

  /** builds the proj pipeline string for a hop sequence between the two
    * resolved CRSs; returns (pipeline, grids, stepCount, gridsKnown). */
  private def assemble(src: Resolved, dst: Resolved, hops: Seq[Hop],
                       opts: Options): (String, Seq[(String, Boolean)], Int, Boolean) = {
    val sb = new StringBuilder("proj=pipeline")
    val grids = Seq.newBuilder[(String, Boolean)]
    var gridsKnown = true
    var steps = 0

    var form = RAD
    var curEll = src.geod.ellTokens

    // Geographic ends are lon/lat RADIANS relative to GREENWICH inside the
    // hop chain (the caller's I/O layer deals in the CRS's own prime
    // meridian and units); projected ends are the CRS's projected units.
    src.projBody match {
      case Some(body) => sb ++= s" step $body inv"; form = RAD
      case None =>
        if (src.kind == Geocentric) form = XYZ
        else if (src.geod.pmDeg != 0.0) {
          sb ++= s" step proj=geogoffset dlon=${src.geod.pmDeg * 3600.0}"
          steps += 1
        }
    }

    def toForm(f: Int): Unit = {
      if (form == f) return
      if (f == XYZ) sb ++= s" step proj=cart $curEll"
      else sb ++= s" step proj=cart inv $curEll"
      form = f
    }

    def helmertParams(op: Op, inv: Boolean, pv: Boolean): String = {
      val x = op.extras
      val b = new StringBuilder(
        if (x.contains("px")) "proj=molobadekas" else "proj=helmert")
      def p(k: String, pk: String): Unit =
        x.get(k).foreach(v => b ++= s" $pk=$v")
      p("x", "x"); p("y", "y"); p("z", "z")
      p("rx", "rx"); p("ry", "ry"); p("rz", "rz"); p("s", "s")
      p("dx", "dx"); p("dy", "dy"); p("dz", "dz")
      p("drx", "drx"); p("dry", "dry"); p("drz", "drz"); p("ds", "ds")
      p("epoch", "t_epoch")
      p("px", "px"); p("py", "py"); p("pz", "pz")
      b ++= (if (pv) " convention=position_vector" else " convention=coordinate_frame")
      if (inv) b ++= " inv"
      b.toString
    }

    for (hop <- hops) {
      val op = hop.op
      val srcEndCrs = db.geodetic.get(hop.srcEnd)
      val dstEndCrs = db.geodetic.get(hop.dstEnd)
      srcEndCrs.foreach(g => curEll = g.ellTokens)
      op.kind match {
        case 'H' =>
          val m = op.method
          val geog2dDomain = m == "9603" || m == "9606" || m == "9607" ||
            m == "9636" || m == "1063" || m == "1133"
          val pv = m == "9606" || m == "1033" || m == "1037" || m == "1053" ||
            m == "1054" || m == "1055" || m == "1063" || m == "1061" ||
            m == "1065"
          // identity helmert steps are dropped, as in the reference's
          // PROJStringFormatter peephole (io.cpp:8891-8901) — this also
          // drives the projStepCount sort criterion that ranks the null
          // "GDA94 to WGS 84 (1)" above its non-null sibling (2)
          val identity = !op.extras.exists { case (k, v) =>
            Set("x", "y", "z", "rx", "ry", "rz", "s", "dx", "dy", "dz",
              "drx", "dry", "drz", "ds", "px", "py", "pz").contains(k) &&
              v.toDouble != 0.0
          }
          if (geog2dDomain) {
            toForm(RAD)
            sb ++= " step proj=push v_3"
            sb ++= s" step proj=cart $curEll"
            if (!identity) { sb ++= " step " + helmertParams(op, hop.inv, pv); steps += 1 }
            curEll = dstEndCrs.map(_.ellTokens).getOrElse(curEll)
            sb ++= s" step proj=cart inv $curEll"
            sb ++= " step proj=pop v_3"
            steps += 4
          } else if (identity && form == RAD) {
            // identity geocentric-domain op between geographic ends: same
            // null sandwich as the geog2D-domain case — push/pop keeps z
            // exact through the differing-ellipsoid cart round-trip
            sb ++= " step proj=push v_3"
            sb ++= s" step proj=cart $curEll"
            curEll = dstEndCrs.map(_.ellTokens).getOrElse(curEll)
            sb ++= s" step proj=cart inv $curEll"
            sb ++= " step proj=pop v_3"
            steps += 4
          } else {
            toForm(XYZ)
            if (!identity) { sb ++= " step " + helmertParams(op, hop.inv, pv); steps += 1 }
            curEll = dstEndCrs.map(_.ellTokens).getOrElse(curEll)
          }
        case 'G' =>
          val method = op.method
          val (file, avail) = gridFile(op.extras("grid"), opts)
          grids += ((file, avail))
          if (!avail && !db.gridAlias.contains(op.extras("grid")))
            gridsKnown = false
          op.extras.get("grid2").foreach { g2 =>
            // a lat/lon grid pair (NADCON, NADCON5) collapses into the single
            // PROJ-delivered artifact of the first file; only track grid2 as
            // its own artifact when the alias table knows it as one
            val (f2, a2) = gridFile(g2, opts)
            if (f2 != file && db.gridAlias.contains(g2)) grids += ((f2, a2))
          }
          val alias = db.gridAlias.get(op.extras("grid"))
          val inv = hop.inv ^ alias.exists(_.inverse)
          val pm0 = alias.map(_.method).getOrElse("hgridshift")
          // Geocentric translations using NEU velocity grid (gtg), EPSG
          // method 1144: the registered op is the inverse sense of
          // +proj=deformation at the target epoch (reference
          // singleoperation.cpp ~5158 wraps the deformation step in an
          // inversion), applied between geocentric CRSs
          val pm = if (pm0 == "velocity_grid" && method == "1144")
            "deformation_epoch" else pm0
          if (pm == "deformation_epoch") toForm(XYZ) else toForm(RAD)
          pm match {
            case "deformation_epoch" =>
              val t = op.extras.getOrElse("p1069", "0")
              sb ++= s" step proj=deformation t_epoch=$t grids=$file $curEll" +
                (if (!inv) " inv" else "")
              steps += 1
            case "geoid_like" =>
              // Geographic3D <-> GravityRelatedHeight: fwd (h -> H) removes
              // the geoid undulation, i.e. vgridshift inv
              val vinv = !inv
              sb ++= s" step proj=vgridshift grids=$file multiplier=1" +
                (if (vinv) " inv" else "")
              steps += 1
            case "vgridshift" =>
              sb ++= s" step proj=vgridshift grids=$file multiplier=1" +
                (if (inv) " inv" else "")
              steps += 1
            case "geocentricoffset" =>
              // France geocentric interpolation (gr3df97a)
              toForm(XYZ)
              sb ++= s" step proj=xyzgridshift grids=$file grid_ref=output_crs" +
                (if (inv) " inv" else "")
              curEll = dstEndCrs.map(_.ellTokens).getOrElse(curEll)
              steps += 1
            case "gridshift" =>
              // GeoTIFF grids with lat/lon (and possibly height) components
              // (NADCON5 et al.) — the generic gridshift op, applied in
              // geographic space like the reference's
              sb ++= s" step proj=gridshift grids=$file" +
                (if (inv) " inv" else "")
              steps += 1
            case "hgridshift" =>
              sb ++= s" step proj=hgridshift grids=$file" +
                (if (inv) " inv" else "")
              steps += 1
            case "defmodel" if opts.displayOnly =>
              // deformation-model ops print as a single defmodel step;
              // "Operations are registered in EPSG with inverse order as
              // the +proj=defmodel implementation"
              // (reference singleoperation.cpp:4842), so the step's sense
              // is the opposite of the EPSG operation's
              sb ++= s" step proj=defmodel model=$file" +
                (if (!inv) " inv" else "")
              steps += 1
            case "tinshift" if opts.displayOnly =>
              // TIN-based ops run in projected space: either between two
              // projected CRSs (YKJ -> TM35FIN) or between vertical CRSs in
              // an interpolation CRS (Finland N43/N60 heights); the geodetic
              // chain wraps them in the corresponding conversions
              val interpWrap = op.extras.get("interp").flatMap(projBodyOf)
              val endsIn = db.projected.get(if (hop.inv) op.dstCrs else op.srcCrs)
                .flatMap(p => projBodyOf(p.code))
              val endsOut = db.projected.get(if (hop.inv) op.srcCrs else op.dstCrs)
                .flatMap(p => projBodyOf(p.code))
              val tin = s" step proj=tinshift file=$file" +
                (if (inv) " inv" else "")
              (interpWrap, endsIn, endsOut) match {
                case (Some(body), _, _) =>
                  sb ++= s" step $body"; sb ++= tin; sb ++= s" step $body inv"
                  steps += 3
                case (None, Some(bIn), Some(bOut)) =>
                  // adjacent inverse/forward conversion pairs cancel in the
                  // display renderer's peephole, as in the reference's
                  // PROJStringFormatter
                  sb ++= s" step $bIn"; sb ++= tin; sb ++= s" step $bOut inv"
                  steps += 3
                case _ =>
                  sb ++= tin
                  steps += 1
              }
            case other =>
              // tinshift / velocity_grid / defmodel operate in CRS contexts
              // (projected space, epoch pairs) the geodetic hop chain does
              // not model — reject the candidate rather than mis-apply it
              // as an hgridshift if its grid happens to resolve locally
              throw graft.core.ProjError(
                graft.core.ProjErr.INVALID_OP_WRONG_SYNTAX,
                s"grid method $other not supported in geodetic hop chain")
          }
          if (pm != "geocentricoffset")
            curEll = dstEndCrs.map(_.ellTokens).getOrElse(curEll)
        case 'O' =>
          val x = op.extras
          op.method match {
            case "9621" => // similarity (between projected CRSs; caller
              // guarantees the hop list is exactly this op)
              val xt0 = x.getOrElse("p8621", "0").toDouble
              val yt0 = x.getOrElse("p8622", "0").toDouble
              val m = x.getOrElse("p8611", x.getOrElse("p1061", "1")).toDouble
              val thDeg = x.getOrElse("p8614", "0").toDouble
              val th = math.toRadians(thDeg)
              val c = m * math.cos(th); val s = m * math.sin(th)
              val aff = f"proj=affine xoff=$xt0%.17g yoff=$yt0%.17g " +
                f"s11=$c%.17g s12=$s%.17g s21=${-s}%.17g s22=$c%.17g"
              sb ++= " step " + aff + (if (hop.inv) " inv" else "")
              steps += 1
            case "9619" | "9618" => // geographic offsets (+ height offset)
              toForm(RAD)
              // sidecar angles are degrees; geogoffset takes arcsec
              val dlat = x.getOrElse("p8601", "0").toDouble * 3600.0
              val dlon = x.getOrElse("p8602", "0").toDouble * 3600.0
              val dh = x.getOrElse("p8604", x.getOrElse("p8603", "0")).toDouble
              sb ++= s" step proj=geogoffset dlat=$dlat dlon=$dlon dh=$dh" +
                (if (hop.inv) " inv" else "")
              steps += 1
            case "9616" => // vertical offset (m)
              toForm(RAD)
              val dh = x.getOrElse("p8603", "0").toDouble
              sb ++= s" step proj=geogoffset dh=$dh" + (if (hop.inv) " inv" else "")
              steps += 1
            case "1136" | "1131" =>
              // Geographic3D to GravityRelatedHeight / to Geog2D+GravityRelatedHeight
              // with a CONSTANT geoid height (EPSG 8604): H = h - N
              // (reference: the grid-free BES islands ops, e.g. EPSG:10657)
              toForm(RAD)
              val n = x.getOrElse("p8604", "0").toDouble
              sb ++= s" step proj=geogoffset dh=${-n}" + (if (hop.inv) " inv" else "")
              steps += 1
            case "9601" =>
              // longitude rotation: the rotation value IS the prime-meridian
              // difference between the op's end CRSs; the hop chain is
              // already Greenwich-normalized at the ends, so only the part
              // not explained by the end pms remains (usually zero)
              toForm(RAD)
              val pmSrc = db.geodetic.get(hop.srcEnd).map(_.pmDeg).getOrElse(0.0)
              val pmDst = db.geodetic.get(hop.dstEnd).map(_.pmDeg).getOrElse(0.0)
              val raw = x.getOrElse("p8602", "0").toDouble *
                (if (hop.inv) -1 else 1)
              val eff = raw - (pmSrc - pmDst)
              if (math.abs(eff) > 1e-12) {
                sb ++= s" step proj=geogoffset dlon=${eff * 3600.0}"
                steps += 1
              }
            case "9843" => // axis order reversal: identity in GIS order
              ()
            case "9624" => // affine parametric
              val aff = "proj=affine " +
                s"xoff=${x.getOrElse("p8623", "0")} s11=${x.getOrElse("p8624", "1")} s12=${x.getOrElse("p8625", "0")} " +
                s"yoff=${x.getOrElse("p8639", "0")} s21=${x.getOrElse("p8640", "0")} s22=${x.getOrElse("p8641", "1")}"
              sb ++= " step " + aff + (if (hop.inv) " inv" else "")
              steps += 1
            case "1143" =>
              // Position Vector tfm (geocen) & geocentric translations from
              // NEU velocities (gtg): helmert convention=position_vector
              // followed by +proj=deformation dt=target-source over the
              // velocity grid, between geocentric CRSs (reference
              // singleoperation.cpp ~5003-5100; sidecar rotations are
              // degrees -> arcsec here, scale already ppm)
              toForm(XYZ)
              val (file, avail) = gridFile(x("grid"), opts)
              grids += ((file, avail))
              if (!avail && !db.gridAlias.contains(x("grid")))
                gridsKnown = false
              def asec(k: String): String = x.get(k).map(v =>
                (BigDecimal(v) * 3600).bigDecimal.stripTrailingZeros
                  .toPlainString).getOrElse("0")
              val helm = s"proj=helmert x=${x.getOrElse("p8605", "0")} " +
                s"y=${x.getOrElse("p8606", "0")} z=${x.getOrElse("p8607", "0")} " +
                s"rx=${asec("p8608")} ry=${asec("p8609")} rz=${asec("p8610")} " +
                s"s=${x.getOrElse("p8611", "0")} convention=position_vector"
              val defo = (x.get("p1069"), x.get("p1068")) match {
                case (Some(t), Some(s0)) =>
                  val dt = (BigDecimal(t) - BigDecimal(s0)).bigDecimal
                    .stripTrailingZeros.toPlainString
                  s"proj=deformation dt=$dt grids=$file $curEll"
                case (Some(t), None) =>
                  s"proj=deformation t_epoch=$t grids=$file $curEll"
                case _ => throw graft.core.ProjError(
                  graft.core.ProjErr.INVALID_OP,
                  "method 1143 missing target epoch")
              }
              if (hop.inv)
                sb ++= " step " + defo + " inv step " + helm + " inv"
              else
                sb ++= " step " + helm + " step " + defo
              steps += 2
            case other =>
              throw graft.core.ProjError(graft.core.ProjErr.INVALID_OP, s"unsupported method $other")
          }
        case 'S' =>
          val str = new String(java.util.Base64.getDecoder.decode(
            op.extras("str")), "UTF-8")
          // raw PROJ-string ops consume grids named inline (+grids= /
          // +file=); register them so availability and gridsKnown rank the
          // candidate like the reference's PROJBasedOperation::gridsNeeded
          for (tok <- str.split("\\s+"); v = tok.stripPrefix("+")
               if v.startsWith("grids=") || v.startsWith("file=");
               g0 <- v.substring(v.indexOf('=') + 1).split(',')
               if g0.nonEmpty) {
            val g = g0.stripPrefix("@")
            val (file, avail) = gridFile(g, opts)
            grids += ((file, avail))
            if (!avail && !db.gridAlias.contains(g) &&
                !deliveredGridNames.contains(g))
              gridsKnown = false
          }
          if (!opts.displayOnly)
            throw graft.core.ProjError(graft.core.ProjErr.INVALID_OP, s"PROJ-string method not supported: $str")
          // display surface: keep the raw PROJ-string operation's own steps
          // (reference PROJBasedOperation export); normalize to hop-chain
          // step syntax
          val raw = str.split("\\s+").iterator.filter(_.nonEmpty)
            .map(_.stripPrefix("+")).mkString(" ")
          val body =
            if (raw.startsWith("proj=pipeline")) raw.stripPrefix("proj=pipeline").trim
            else s"step $raw"
          if (body.nonEmpty && body != "step proj=noop") {
            sb ++= " " + (if (hop.inv) {
              // single-step bodies invert by appending inv; multi-step raw
              // pipelines cannot be inverted textually — reject
              if (body.indexOf("step", 4) > 0)
                throw graft.core.ProjError(graft.core.ProjErr.INVALID_OP,
                  "cannot invert raw multi-step PROJ-string method")
              body + " inv"
            } else body)
            steps += 1
          }
        case other =>
          throw graft.core.ProjError(graft.core.ProjErr.INVALID_OP, s"unexpected op kind $other")
      }
    }

    // destination end: conversions use the destination CRS's ellipsoid
    // (a ballpark hop reinterprets the coordinates on the target datum)
    if (form == RAD) curEll = dst.geod.ellTokens
    dst.projBody match {
      case Some(body) =>
        toForm(RAD)
        sb ++= s" step $body"
      case None =>
        if (dst.kind == Geocentric) toForm(XYZ)
        else {
          toForm(RAD)
          if (dst.geod.pmDeg != 0.0) {
            sb ++= s" step proj=geogoffset dlon=${dst.geod.pmDeg * 3600.0} inv"
            steps += 1
          }
        }
    }
    val pipe = sb.toString
    // a hop-free chain between identical forms has no steps at all
    (if (pipe == "proj=pipeline") "proj=noop" else pipe, grids.result(), steps,
      gridsKnown)
  }

  // --------------------------------------------- candidate generation

  private lazy val opsByCode: Map[String, Op] =
    db.ops.iterator.map(o => o.code -> o).toMap

  private def expandConcat(op: Op, inv: Boolean,
                           displayOnly: Boolean = false): Option[Seq[Hop]] = {
    val steps = op.extras.getOrElse("steps", "")
    if (steps.isEmpty) return None
    val hops = Seq.newBuilder[Hop]
    for (s <- steps.split(',')) {
      val stepInv = s.startsWith("-")
      val code = s.substring(1)
      opsByCode.get(code) match {
        case Some(o) if o.kind != 'C' && o.kind != 'S' => hops += Hop(o, stepInv)
        case Some(o) if o.kind == 'S' && displayOnly =>
          // raw PROJ-string steps (NKG deformation legs) materialize on the
          // display surface — the structural candidate answer the reference
          // gives even when the step's network grids are unavailable
          hops += Hop(o, stepInv)
        case None if displayOnly && EpsgMeta.meta.convs.contains(code) =>
          // conversion legs (projection to/from the projected-space op's own
          // CRSs) are implied by the neighbouring op's wrap in assemble
          ()
        case _ => return None // nested concats / raw PROJ strings unsupported
      }
    }
    val seq = hops.result()
    Some(if (inv) seq.reverse.map(h => Hop(h.op, !h.inv)) else seq)
  }

  private def allowedAuth(op: Op, opts: Options): Boolean = opts.authority match {
    case Some("any") => true
    case Some(a) => op.auth == a
    // NKG appends itself to the EPSG<->EPSG authority preference
    // (reference data/sql/nkg_post_customizations.sql: allowed_authorities
    // 'PROJ,EPSG' -> 'PROJ,EPSG,NKG'), so NKG operations are candidates
    // for plain EPSG pairs even though their grids are network-only
    case None => op.auth == "EPSG" || op.auth == "PROJ" || op.auth == "NKG" ||
      opts.implicitAuths.contains(op.auth)
  }

  /** a supersession replacement that needs a grid the alias table has never
    * heard of does not suppress the superseded op (reference
    * factory.cpp:7424 "Ignore supersession if the replacement uses a
    * unknown grid"). */
  private def unknownGridReplacement(code: String): Boolean =
    opsByCode.get(code).exists(o => o.kind == 'G' &&
      !db.gridAlias.contains(o.extras.getOrElse("grid", "")))

  private def usableOps(a: String, b: String, opts: Options): Vector[Hop] = {
    // A datum-ensemble end also matches operations registered against its
    // member realizations (e.g. ITRF2014 to ETRS89-DNK qualifies for a
    // plain ETRS89 target), but ONLY under the reference's
    // createOperationsEnsembleCRSToOtherGeodCRS gates
    // (coordinateoperationfactory.cpp:4520-4547): exactly one side is an
    // ensemble, the other side's datum is not one of its members, and
    // never for the GDA94/GDA2020 <-> WGS 84 pairs, whose hand-tuned
    // direct operations must keep winning.
    val aM = db.ensembleMembers.getOrElse(a, Nil)
    val bM = db.ensembleMembers.getOrElse(b, Nil)
    val gdaDatums = Set("EPSG:6283", "EPSG:1168") // GDA94, GDA2020
    val isGdaWgs = (gdaDatums.contains(a) && b == "EPSG:6326") ||
      (a == "EPSG:6326" && gdaDatums.contains(b))
    val expand = (aM.nonEmpty != bM.nonEmpty) &&
      !aM.contains(b) && !bM.contains(a) && !isGdaWgs
    val keysA = if (expand) a +: aM else Seq(a)
    val keysB = if (expand) b +: bM else Seq(b)
    val all0 = (for (x <- keysA; y <- keysB; p <- db.opsBetween(x, y))
      yield p).distinct.toVector.collect {
      case (op, inv) if !op.deprecated &&
        allowedAuth(op, opts) && op.kind != 'S' => Hop(op, inv)
    }
    // discardSuperseded: drop an op only when a same-pair replacement is
    // itself in this result set and does not depend on an unknown grid
    val codes = all0.iterator.map(_.op.code).toSet
    val all = all0.filterNot(h =>
      db.supersededBy.getOrElse(h.op.code, Nil).exists(r =>
        codes.contains(r) && !unknownGridReplacement(r)))
    opts.preferAuth match {
      case Some(pa) =>
        val own = all.filter(h => h.op.auth == pa || h.op.auth == "PROJ")
        if (own.nonEmpty) own else all
      case None => all
    }
  }

  /** similarity (9621), affine parametric (9624) and cartesian grid
    * offsets (9656) between projected CRSs, as a direct projected-space
    * affine. */
  private def wholeCrsPipeline(op: Op, inv: Boolean): Option[String] = {
    val x = op.extras
    val aff = op.method match {
      case "9621" =>
        val xt0 = x.getOrElse("p8621", "0").toDouble
        val yt0 = x.getOrElse("p8622", "0").toDouble
        val m = x.getOrElse("p8611", x.getOrElse("p1061", "1")).toDouble
        val th = math.toRadians(x.getOrElse("p8614", "0").toDouble)
        val c = m * math.cos(th); val s = m * math.sin(th)
        Some(f"proj=affine xoff=$xt0%.17g yoff=$yt0%.17g " +
          f"s11=$c%.17g s12=$s%.17g s21=${-s}%.17g s22=$c%.17g")
      case "9624" =>
        Some("proj=affine " +
          s"xoff=${x.getOrElse("p8623", "0")} s11=${x.getOrElse("p8624", "1")} s12=${x.getOrElse("p8625", "0")} " +
          s"yoff=${x.getOrElse("p8639", "0")} s21=${x.getOrElse("p8640", "0")} s22=${x.getOrElse("p8641", "1")}")
      case "9656" => // Cartesian Grid Offsets (EPSG 8728/8729 E/N offsets)
        Some(s"proj=affine xoff=${x.getOrElse("p8728", x.getOrElse("p8645", "0"))} " +
          s"yoff=${x.getOrElse("p8729", x.getOrElse("p8646", "0"))}")
      case _ => None
    }
    // a bare op string has no way to carry the inversion (the `inv` flag is
    // a pipeline-step notion, reference src/pipeline.cpp); wrap in a
    // single-step pipeline when inverted
    aff.map(a => if (inv) s"proj=pipeline step $a inv" else a)
  }

  private def hopsToCandidate(src: Resolved, dst: Resolved, hops: Seq[Hop],
                              hopName: String, opts: Options,
                              ballparkVertical: Boolean = false,
                              hopCount: Option[Int] = None,
                              /** hops driving the extent (a compound
                                * operation's area of use follows its
                                * horizontal transformation) */
                              extentHops: Option[Seq[Hop]] = None,
                              identOp: Option[Hop] = None): Option[Candidate] =
    try {
      val (pipe, grids, n, known) = assemble(src, dst, hops, opts)
      // an empty intersection of hop extents invalidates the combination
      // (reference: "the extents of the two intermediate operations must
      // intersect each other")
      var disjoint = false
      hops.foldLeft(Option.empty[Bbox]) { (acc, h) =>
        (acc, h.op.bbox) match {
          case (Some(p), Some(q)) if p.west <= p.east && q.west <= q.east &&
            (math.max(p.west, q.west) > math.min(p.east, q.east) ||
              math.max(p.south, q.south) > math.min(p.north, q.north)) =>
            disjoint = true
          case _ => ()
        }
        intersect(acc, h.op.bbox)
      }
      if (disjoint) return None
      val bbox = identOp.map(_.op.bbox).getOrElse(
        extentHops.getOrElse(hops).foldLeft(Option.empty[Bbox])(
          (acc, h) => intersect(acc, h.op.bbox)))
      val acc = identOp.map(_.op.accuracy).getOrElse(
        hops.map(_.op.accuracy).foldLeft(0.0) { (s, x) =>
          if (s < 0 || x < 0) -1.0 else s + x
        })
      val name = if (hopName.nonEmpty) hopName
        else if (hops.isEmpty) nullOpName(src, dst) else hopName
      Some(Candidate(name, if (hops.isEmpty && identOp.isEmpty) 0.0 else acc,
        boxesOf(bbox), pseudoArea(bbox),
        identOp.map(_.op.areaName).getOrElse(
          hops.headOption.map(_.op.areaName).getOrElse("")), grids,
        ballpark = false, ballparkVertical = ballparkVertical,
        hopCount.getOrElse(hops.length max 1), pipe,
        projSteps = n, gridsKnown = known,
        dispHops = hops.map(h => (h.op, h.inv)),
        identOp = identOp.map(h => (h.op, h.inv))))
    } catch { case _: graft.core.ProjError => None }

  // --------------------------------------------------- vertical legs

  /** a vertical-transformation plan: hops applied before (`pre`) and after
    * (`post`) the horizontal hop chain, with the name parts that make up the
    * reference's "A + B using C" operation names. */
  private final case class VPlan(
      pre: Seq[Hop], post: Seq[Hop],
      preNames: Seq[String], postNames: Seq[String],
      usingNames: Seq[String],
      ballparkVertical: Boolean) {
    def isReal: Boolean = !ballparkVertical && (pre.nonEmpty || post.nonEmpty)
  }
  private val VNull = VPlan(Nil, Nil, Nil, Nil, Nil, ballparkVertical = false)
  private val VBallpark = VPlan(Nil, Nil, Nil, Nil, Nil, ballparkVertical = true)

  private def usableVertOp(op: Op, opts: Options): Boolean =
    !op.deprecated && !db.superseded.contains(op.code) &&
      allowedAuth(op, opts) && (op.kind == 'G' || op.kind == 'O')

  /** ops touching the vertical CRS `vcode`, oriented vcode -> other end;
    * paired with the other end's key (a geodetic datum or a vertical code). */
  private def vertEndHops(vcode: String, opts: Options): Vector[(Hop, String)] =
    db.ops.iterator.flatMap { op =>
      if (!usableVertOp(op, opts)) Iterator.empty
      else if (db.endKey(op.srcCrs) == vcode)
        Iterator((Hop(op, inv = false), db.endKey(op.dstCrs)))
      else if (db.endKey(op.dstCrs) == vcode)
        Iterator((Hop(op, inv = true), db.endKey(op.srcCrs)))
      else Iterator.empty
    }.toVector

  /** single-op helmert glue between two geodetic datums */
  private def glueOps(a: String, b: String, opts: Options): Vector[Hop] =
    usableOps(a, b, opts).filter(_.op.kind == 'H')

  /** vertical plans between the two CRSs' height frames. Returns (real
    * plans, ballpark plan list). The ballpark plan exists for
    * vertical<->ellipsoidal sides; for vertical-to-vertical the reference
    * only materializes it when the real per-leg candidates are discarded
    * (grid-availability DISCARD mode) — the caller enforces that rule. */
  private def verticalPlans(src: Resolved, dst: Resolved,
                            opts: Options): (Vector[VPlan], Vector[VPlan]) = {
    val sv = src.vert
    val dv = dst.vert
    if (sv.isEmpty && dv.isEmpty) return (Vector(VNull), Vector.empty)
    if (sv.isDefined && dv.isDefined && sv.get.code == dv.get.code)
      return (Vector(VNull), Vector.empty)

    val srcDatum = src.geod.datum
    val dstDatum = dst.geod.datum
    val real = Vector.newBuilder[VPlan]

    /** a one-sided leg: hops (with any datum glue) + name + using parts.
      * `up` = orthometric->ellipsoidal (source side), else ellipsoidal->
      * orthometric (destination side). Returns (hops, atSrcSide, name,
      * using) tuples. */
    /** legKind: 0 = homed on the vertical's own side, 1 = homed on the
      * opposite side, 2 = glued through a third datum. */
    def leg(vcode: String, up: Boolean): Vector[(Seq[Hop], Boolean, String, Seq[String], Int)] = {
      val out = Vector.newBuilder[(Seq[Hop], Boolean, String, Seq[String], Int)]
      val ownSide = if (up) srcDatum else dstDatum
      val otherSide = if (up) dstDatum else srcDatum
      for ((h0, other) <- vertEndHops(vcode, opts)
           if db.datums.contains(other) || db.geodetic.values.exists(_.datum == other)) {
        val h = if (up) h0 else Hop(h0.op, !h0.inv)
        if (other == ownSide) out += ((Seq(h), up, h.name, Nil, 0))
        else if (other == otherSide) out += ((Seq(h), !up, h.name, Nil, 1))
        else {
          // glue the leg's home datum to the side it applies on; legs homed
          // on a member realization of the side's datum ensemble are
          // redundant duplicates of the ensemble-level op (the PROJ-authority
          // "(from ...)" derivations) and are skipped
          if (!db.sameDatum(ownSide, other) && !db.sameEnsembleMembers(ownSide, other))
            for (g <- glueOps(ownSide, other, opts))
              out += ((Seq(g, h, Hop(g.op, !g.inv)),
                up, h.name, Seq(g.op.name), 2))
        }
      }
      out.result()
    }

    // the vertical leg executes on its own compound's side of the chain
    // (reference createOperationsCompoundToGeog applies the vertical
    // transformation before the horizontal one, and the inverse shape
    // after it), regardless of which geographic CRS the op is homed on —
    // a geoid shift is a pure height offset in pipeline form
    (sv, dv) match {
      case (Some(v), None) =>
        for ((hops, _, nm, using, _) <- leg(v.code, up = true))
          real += VPlan(hops, Nil, Seq(nm), Nil, using, false)
        (real.result(), Vector(VBallpark))
      case (None, Some(v)) =>
        for ((hops, _, nm, using, _) <- leg(v.code, up = false))
          real += VPlan(Nil, hops, Nil, Seq(nm), using, false)
        (real.result(), Vector(VBallpark))
      case (Some(v1), Some(v2)) =>
        // vertical hops whose interpolation frame lives on the destination
        // side apply after the horizontal chain (display surface: keeps
        // the printed order the reference produces)
        def postSide(hops: Seq[Hop]): Boolean =
          opts.displayOnly && hops.exists(h =>
            h.op.extras.get("interp").flatMap(db.projected.get)
              .flatMap(p => db.geodetic.get(p.baseGeog)).exists(g =>
                g.datum == dstDatum && g.datum != srcDatum))
        def addPlan(hops: Seq[Hop], names: Seq[String]): Unit =
          real += (if (postSide(hops)) VPlan(Nil, hops, Nil, names, Nil, false)
          else VPlan(hops, Nil, names, Nil, Nil, false))
        // direct vertical-to-vertical operations
        for ((h, other) <- vertEndHops(v1.code, opts) if other == v2.code)
          addPlan(Seq(h), Seq(h.name))
        // two-hop chains through an intermediate vertical frame (Finland
        // N43 -> N60 -> N2000); display surface only
        if (opts.displayOnly)
          for ((h1, mid) <- vertEndHops(v1.code, opts)
               if db.vertical.contains(mid) && mid != v2.code;
               (h2, end2) <- vertEndHops(mid, opts) if end2 == v2.code)
            addPlan(Seq(h1, h2), Seq(h1.name, h2.name))
        // geoid-pivot: v1 -> ellipsoidal(home1), glue home1/home2,
        // ellipsoidal(home2) -> v2
        val ups = vertEndHops(v1.code, opts).filter(p => db.datums.contains(p._2))
        val downs = vertEndHops(v2.code, opts).filter(p => db.datums.contains(p._2))
        for ((h1, o1) <- ups if o1 == srcDatum;
             (h2raw, o2) <- downs) {
          val h2 = Hop(h2raw.op, !h2raw.inv)
          if (o2 == o1)
            real += VPlan(Seq(h1), Seq(h2), Seq(h1.name), Seq(h2.name), Nil, false)
          else for (g <- glueOps(o1, o2, opts))
            real += VPlan(Seq(h1), Seq(g, h2, Hop(g.op, !g.inv)),
              Seq(h1.name), Seq(h2.name), Seq(g.op.name), false)
        }
        (real.result().distinct, Vector(VBallpark))
      case _ => (Vector.empty, Vector(VBallpark))
    }
  }

  /** name of a combined horizontal+vertical candidate */
  private def combinedName(src: Resolved, dst: Resolved, horizName: String,
                           vp: VPlan): String = {
    if (vp.ballparkVertical) {
      val base = if (horizName.nonEmpty) horizName + " + " else ""
      // the reference names the vertical side as the source; when only our
      // destination is vertical the op is the inverse of the canonical one,
      // and a vertical<->ellipsoidal ballpark carries the "without
      // ellipsoid height" qualifier (operation.cpp BALLPARK_VERTICAL_*)
      val suffix =
        if (src.vert.isDefined != dst.vert.isDefined)
          " (ballpark vertical transformation, without ellipsoid height to vertical height correction)"
        else " (ballpark vertical transformation)"
      if (src.vert.isEmpty && dst.vert.isDefined)
        base + s"Inverse of Transformation from ${dst.vert.get.name} to ${src.geod.name}$suffix"
      else {
        val from = src.vert.map(_.name).getOrElse(src.name)
        val to = dst.vert.map(_.name).getOrElse(dst.geod.name)
        base + s"Transformation from $from to $to$suffix"
      }
    } else {
      val parts = vp.preNames ++
        (if (horizName.nonEmpty) Seq(horizName) else Nil) ++ vp.postNames
      val head = if (parts.nonEmpty) parts.mkString(" + ") else nullOpName(src, dst)
      if (vp.usingNames.nonEmpty) head + " using " + vp.usingNames.mkString(" and ")
      else head
    }
  }

  /** one factory pass: direct ops (datum-level plus whole-CRS similarity),
    * datum pivots only when no direct op survives the grid filter, ballpark
    * last — the shape of the reference's createOperations under a given
    * grid-availability mode. */
  private def generate(src: Resolved, dst: Resolved, opts: Options,
                       mode: Int): Vector[Candidate] = {
    // DISCARD mode drops every op with a missing grid; KNOWN_AVAILABLE mode
    // keeps ops whose grids are registered (CDN-published) but still drops
    // ops needing grids PROJ has never heard of (reference factory.cpp
    // createFromCoordinateReferenceSystemCodes: discardIfMissingGrid +
    // considerKnownGridsAsAvailable); SORT/IGNORE (projinfo) keep all
    def keep(c: Candidate): Boolean = mode match {
      case GridMode.Discard => c.gridsAvailable
      case GridMode.Known => c.gridsAvailable || c.gridsKnown
      case _ => true
    }

    val hasVert = src.vert.isDefined || dst.vert.isDefined
    val vertVert = src.vert.isDefined && dst.vert.isDefined &&
      src.vert.get.code != dst.vert.get.code
    // a 2D projected side paired with a compound carries no ellipsoidal
    // height, so geoid operations cannot engage (the reference only applies
    // them after --3d promotion); the vertical degrades to a null height
    // passthrough between the shared geographic CRSs
    val vertBlocked2D =
      (dst.vert.isDefined && src.vert.isEmpty && src.projCode.isDefined &&
        src.kind == Geog2D) ||
        (src.vert.isDefined && dst.vert.isEmpty && dst.projCode.isDefined &&
          dst.kind == Geog2D)
    val (vReal, _) =
      if (vertBlocked2D) (Vector.empty[VPlan], Vector.empty[VPlan])
      else verticalPlans(src, dst, opts)
    /** vertical plans crossed with every geographic hop sequence; VNull
      * when no vertical component is in play */
    val plans: Vector[VPlan] = if (!hasVert) Vector(VNull) else vReal

    def nameOf(hn: String, vp: VPlan): String =
      if (!hasVert) hn else combinedName(src, dst, hn, vp)

    // whole-CRS operations (similarity / affine / cartesian grid offsets
    // between projected CRSs) apply directly in projected coordinates — no
    // inverse-projection wrapping; z passes through, so a vertical component
    // can only ride along as a ballpark vertical transformation
    val wholeAll: Vector[Candidate] =
      (src.projCode, dst.projCode) match {
        case (Some(sc), Some(dc)) =>
          db.opsBetween(sc, dc).collect {
            case (op, inv) if !op.deprecated && !db.superseded.contains(op.code) &&
              allowedAuth(op, opts) && op.kind == 'O' =>
              wholeCrsPipeline(op, inv).map { pipe =>
                val nm = if (inv) "Inverse of " + op.name else op.name
                Candidate(nameOf(nm, VBallpark),
                  op.accuracy, boxesOf(op.bbox),
                  pseudoArea(op.bbox), op.areaName, Seq.empty,
                  ballpark = false, ballparkVertical = hasVert, 1, pipe,
                  dispHops = Seq((op, inv)), wholeCrs = true)
              }
            case (op, inv) if opts.displayOnly && !op.deprecated &&
              !db.superseded.contains(op.code) && allowedAuth(op, opts) &&
              op.kind == 'G' &&
              db.gridAlias.get(op.extras("grid")).exists(_.method == "tinshift") =>
              // projected-space TIN operation between the projected pair
              // itself (Finland YKJ -> TM35FIN)
              val (file, avail) = gridFile(op.extras("grid"), opts)
              val nm = if (inv) "Inverse of " + op.name else op.name
              Some(Candidate(nameOf(nm, VBallpark), op.accuracy,
                boxesOf(op.bbox), pseudoArea(op.bbox), op.areaName,
                Seq((file, avail)), ballpark = false,
                ballparkVertical = hasVert, 1,
                s"proj=pipeline step proj=tinshift file=$file" +
                  (if (inv) " inv" else ""),
                dispHops = Seq((op, inv)), wholeCrs = true))
          }.flatten.filter(keep)
        case _ => Vector.empty
      }

    val a = src.geod.datum
    val b = dst.geod.datum
    // two distinct member realizations of one ensemble are distinct datums
    // (reference isSameGeodeticDatum): direct registry ops when any exist,
    // else the pivot search below — never a synthesized null offset
    val horizSeqs: Vector[(Seq[Hop], String, Option[Hop])] =
      if (db.sameDatum(a, b)) Vector((Nil, "", None))
      else usableOps(a, b, opts).flatMap { h =>
        if (h.op.kind == 'C')
          expandConcat(h.op, h.inv, opts.displayOnly).map((_, h.name, Some(h)))
        else Some((Seq(h), h.name, None))
      }

    // a registered concatenated operation keeps its registry identity only
    // when it applies between the query CRSs' own forms: the reference's
    // registry lookups are CRS-coded, so a geog2D query served through
    // geocentric conversion legs yields a synthesized in-memory operation
    // ("unknown id" + step names — e.g. WGS 84 (G1150) -> (G2296) geog2D
    // never surfaces PROJ:WGS_84_G1150_TO_WGS_84_G2296), while a
    // same-form query keeps the id even across ensemble-member datums
    // (EPSG:7789 -> EPSG:4936 lists EPSG:10894 under its own identity)
    def keepsIdentity(h: Hop): Boolean = {
      val (sCode, dCode) =
        if (h.inv) (h.op.dstCrs, h.op.srcCrs) else (h.op.srcCrs, h.op.dstCrs)
      def formOk(end: Resolved, c: String): Boolean =
        end.projBody.isEmpty && db.geodetic.get(c).exists(_.kind == end.kind)
      formOk(src, sCode) && formOk(dst, dCode)
    }

    def combine(seqs: Vector[(Seq[Hop], String, Option[Hop])]): Vector[Candidate] =
      (for ((hs, hn, ident) <- seqs; vp <- plans;
            c <- hopsToCandidate(src, dst, vp.pre ++ hs ++ vp.post,
              nameOf(hn, vp), opts, ballparkVertical = vp.ballparkVertical,
              hopCount = Some(hs.length + vp.pre.length + vp.post.length max 1),
              extentHops = if (hs.nonEmpty) Some(hs) else None,
              // a vertical leg makes the composition synthetic again
              identOp = if (vp.pre.isEmpty && vp.post.isEmpty)
                ident.filter(keepsIdentity) else None))
        yield c).filter(keep)

    val direct: Vector[Candidate] = combine(horizSeqs)

    // the degraded-vertical candidate for the 2D-projected-vs-compound
    // shape: the shared geographic CRSs joined by a null offset ("Inverse
    // of Null geographic offset from WGS 84 to WGS 84" after the inverse
    // projection leg), accuracy 0, World domain
    val blocked2DNull: Vector[Candidate] =
      if (!vertBlocked2D || !db.sameDatum(a, b)) Vector.empty
      else {
        val projSide = if (src.vert.isDefined) dst else src
        val inv = projSide.code == src.code
        val nm0 = s"Null geographic offset from ${projSide.geod.name} " +
          s"to ${projSide.geod.name}"
        val nm = if (inv) s"Inverse of $nm0" else nm0
        hopsToCandidate(src, dst, Nil, nm, opts, ballparkVertical = false,
          hopCount = Some(1))
          .map(c => c.copy(accuracy = 0.0, areaName = "World",
            boxes = Seq(Bbox(-180, -90, 180, 90)))).toVector
      }

    // the reference searches intermediates only when nothing direct exists
    // at all (coordinateoperationfactory.cpp:4448 — the
    // "!resFindDirectNonEmptyBeforeFiltering" guard); a desired-accuracy
    // filter applies afterwards and can leave the list empty without
    // triggering a pivot search
    val viaPivot: Vector[Candidate] =
      if ((wholeAll ++ direct).nonEmpty || db.sameDatum(a, b))
        Vector.empty
      else combine(pivotHops(a, b, opts, src.name, dst.name,
        bothGeographic = src.isLongLat && dst.isLongLat)
        .map { case (hops, nm) => (hops, nm, None) })

    // ballpark vertical transformation: always an alternative against an
    // ellipsoidal side; between two vertical datums the reference only
    // materializes it when the real per-leg candidates were discarded
    val sameVertCode = src.vert.isDefined && dst.vert.isDefined && !vertVert
    val vertBallpark: Vector[Candidate] =
      if (!hasVert || !opts.allowBallpark || sameVertCode || vertBlocked2D ||
          (vertVert && (direct.exists(!_.ballparkVertical) ||
            viaPivot.exists(!_.ballparkVertical)))) Vector.empty
      else (for ((hs, hn, _) <- horizSeqs;
                 c <- hopsToCandidate(src, dst, hs, "", opts,
                   ballparkVertical = true, hopCount = Some(hs.length max 1)))
        yield c.copy(name = nameOf(hn, VBallpark), accuracy = -1.0))
        .filter(keep)

    // an explicit area of interest clips every candidate's extent: points
    // outside the area match no candidate even when an op's own extent
    // covers them
    def clipArea(c: Candidate): Option[Candidate] = opts.area match {
      case None => Some(c)
      case Some(ar) =>
        val clipped = c.boxes.flatMap { b =>
          val w = math.max(b.west, ar.west); val e = math.min(b.east, ar.east)
          val s = math.max(b.south, ar.south); val n = math.min(b.north, ar.north)
          if (w <= e && s <= n) Some(Bbox(w, s, e, n)) else None
        }
        if (clipped.isEmpty) None else Some(c.copy(boxes = clipped))
    }

    val nonBallpark0 =
      (wholeAll ++ direct ++ blocked2DNull ++ viaPivot ++ vertBallpark)
        .flatMap(clipArea)
    val nonBallpark =
      if (opts.accuracy < 0) nonBallpark0
      else nonBallpark0.filter(c => c.accuracy >= 0 && c.accuracy <= opts.accuracy)

    val ballpark: Vector[Candidate] =
      if (!opts.allowBallpark || opts.accuracy >= 0 || opts.area.isDefined ||
          (db.sameDatum(a, b) || db.sameEnsembleMembers(a, b)) &&
          nonBallpark.nonEmpty) Vector.empty
      else {
        try {
          val (pipe, grids, n, known) = assemble(src, dst, Nil, opts)
          // a ballpark's area of use is the CRS pair's own (reference:
          // the synthesized transformation inherits the CRS extents) — a
          // point outside it reaches the gridless fallback, which applies
          // the best real operation instead of the null offset
          val bb = intersect(src.bbox, dst.bbox) match {
            case Some(b) if src.bbox.isDefined || dst.bbox.isDefined => Some(b)
            case _ => None
          }
          val ballparkKind =
            if (src.isGeocentric && dst.isGeocentric) "geocentric translation"
            else "geographic offset"
          Vector(Candidate(
            s"Ballpark $ballparkKind from ${src.name} to ${dst.name}",
            -1.0, boxesOf(bb), pseudoArea(bb), "", grids,
            ballpark = true, ballparkVertical = hasVert, n, pipe,
            projSteps = n, gridsKnown = known))
        } catch { case _: graft.core.ProjError => Vector.empty }
      }

    sort(nonBallpark, knownAsAvailable = mode == GridMode.Known) ++ ballpark
  }

  /** display name of an expanded hop chain: step names joined with " + ",
    * inserting the geographic<->geocentric conversion the reference
    * synthesizes when consecutive steps are registered on different
    * realizations of one datum ("GDA94 to GDA2020 (2) + Conversion from
    * GDA2020 (geog2D) to GDA2020 (geocentric) + GDA2020 to WGS 84 (G1762)
    * (1)"). */
  private def hopChainName(hs: Seq[Hop]): String = {
    def kindTag(g: GeodCrs): String =
      if (g.kind == Geocentric) "geocentric"
      else if (g.kind == Geog3D) "geog3D" else "geog2D"
    val parts = Vector.newBuilder[String]
    var prevEnd = Option.empty[String]
    for (h <- hs) {
      prevEnd.foreach { pe =>
        (db.geodetic.get(pe), db.geodetic.get(h.srcEnd)) match {
          case (Some(g1), Some(g2)) if g1.code != g2.code &&
            g1.datum == g2.datum &&
            (g1.kind == Geocentric) != (g2.kind == Geocentric) =>
            parts += s"Conversion from ${g1.name} (${kindTag(g1)}) " +
              s"to ${g2.name} (${kindTag(g2)})"
          case _ => ()
        }
      }
      parts += h.name
      prevEnd = Some(h.dstEnd)
    }
    parts.result().mkString(" + ")
  }

  /** datum-pivot hop pairs A -> I -> B (reference
    * createOperationsWithDatumPivot), including ensemble-aware joins. */
  private def pivotHops(a: String, b: String, opts: Options,
                        srcName: String = "",
                        dstName: String = "",
                        bothGeographic: Boolean = false): Vector[(Seq[Hop], String)] = {
    // a pivot leg is a single op, or a concatenated op expanded into its
    // steps (the gridless NTF(Paris)->WGS 84 composite is the fallback the
    // reference reaches for out-of-extent points)
    final case class Leg(hops: Seq[Hop], name: String, bbox: Option[Bbox],
                         pivotCrs: String,
                         /** a generator-synthesized ensemble-member null op
                           * (glue, not a registry transformation) */
                         nullGlue: Boolean,
                         /** the op's own end CRSs are both geographic (the
                           * first intermediate search only admits these) */
                         geogReg: Boolean)
    val fromA = scala.collection.mutable.Map.empty[String, Vector[Leg]]
    val toB = scala.collection.mutable.Map.empty[String, Vector[Leg]]

    // the reference's pivot vetoes: NAD83(CSRS)[x] -> NAD83(CSRS)[y] never
    // bridges through the generic NAD83 or WGS 84
    // (factory.cpp:8403-8408 gcrs.name NOT IN, coordinateoperationfactory
    // checkPivot), and ETRFxx -> ETRFyy only accepts an ITRFzz pivot with
    // min(xx,yy) <= zz <= max(xx,yy) (factory.cpp checkPivot in
    // createFromCRSCodesWithIntermediates)
    val nadCsrsPair = srcName.startsWith("NAD83(CSRS)") &&
      dstName.startsWith("NAD83(CSRS)")
    val etrfPair = srcName.startsWith("ETRF") && dstName.startsWith("ETRF")
    def frameDate(s: String, prefix: String): Int = {
      val d = s.drop(prefix.length).takeWhile(_.isDigit)
      if (!s.startsWith(prefix) || d.isEmpty) -1
      else { val v = d.toInt; if (v >= 80 && v <= 99) v + 1900 else v }
    }
    def pivotOk(pivotCrs: String): Boolean = {
      val nm = db.geodetic.get(pivotCrs).map(_.name).getOrElse("")
      if (nadCsrsPair && (nm == "NAD83" || nm == "WGS 84")) return false
      if (etrfPair && nm.startsWith("ITRF")) {
        val sd = frameDate(srcName, "ETRF"); val td = frameDate(dstName, "ETRF")
        val id = frameDate(nm, "ITRF")
        if (sd > 0 && td > 0 && id > 0 &&
          (id < math.min(sd, td) || id > math.max(sd, td))) return false
      }
      true
    }

    for (op <- db.ops
         if !op.deprecated && !db.superseded.contains(op.code) &&
           allowedAuth(op, opts) && op.kind != 'S') {
      val s = db.endKey(op.srcCrs); val d = db.endKey(op.dstCrs)
      // an op whose two ends share a datum family (ensemble <-> member) is
      // our synthesized null glue — the reference creates these at runtime,
      // so its registry pivot search never sees them (the middle op of a
      // datum-pivot chain must carry identifiers:
      // coordinateoperationfactory.cpp:3282 "not a transformation
      // synthesized by ourselves")
      val nullGlue = op.kind != 'C' && db.sameDatum(s, d)
      def isGeogCrs(c: String): Boolean =
        db.geodetic.get(c).exists(_.kind != Geocentric)
      val geogReg = isGeogCrs(op.srcCrs) && isGeogCrs(op.dstCrs)
      def legOf(inv: Boolean, pivotCrs: String): Option[Leg] =
        (if (op.kind == 'C') expandConcat(op, inv, opts.displayOnly)
         else Some(Seq(Hop(op, inv))))
          .map(hs => Leg(hs,
            if (hs.length > 1) hopChainName(hs)
            else if (inv) "Inverse of " + op.name else op.name,
            op.bbox, pivotCrs, nullGlue, geogReg))
      if (s == a && d != b) legOf(false, op.dstCrs).foreach(l =>
        fromA(d) = fromA.getOrElse(d, Vector.empty) :+ l)
      if (d == a && s != b) legOf(true, op.srcCrs).foreach(l =>
        fromA(s) = fromA.getOrElse(s, Vector.empty) :+ l)
      if (s == b && d != a) legOf(true, op.srcCrs).foreach(l =>
        toB(d) = toB.getOrElse(d, Vector.empty) :+ l)
      if (d == b && s != a) legOf(false, op.dstCrs).foreach(l =>
        toB(s) = toB.getOrElse(s, Vector.empty) :+ l)
    }
    // the two legs' extents must intersect (reference
    // createFromCRSCodesWithIntermediates: "the extents of the two
    // intermediate operations must intersect each other") — this is what
    // keeps NAD27->ETRS89 from being bridged through WGS 84 by gluing a
    // North-America op to a Europe op
    def legsIntersect(l1: Leg, l2: Leg): Boolean = (l1.bbox, l2.bbox) match {
      case (Some(p), Some(q)) =>
        def boxes(b: Bbox) = boxesOf(Some(b))
        boxes(p).exists(x => boxes(q).exists(y =>
          math.max(x.west, y.west) <= math.min(x.east, y.east) &&
            math.max(x.south, y.south) <= math.min(x.north, y.north)))
      case _ => true
    }
    // only geodetic datums pivot (the reference's intermediate-CRS search
    // never bridges through vertical or projected CRSs)
    def chainOk(l1: Leg, l2: Leg): Boolean =
      legsIntersect(l1, l2) && pivotOk(l1.pivotCrs) && pivotOk(l2.pivotCrs) &&
        !(l1.nullGlue && l2.nullGlue)
    // The reference searches intermediates in two passes: first the
    // geographic-CRS-code join (createFromCRSCodesWithIntermediates with
    // intermediateObjectType GEOGRAPHIC_CRS — both legs must be registered
    // between geographic CRSs when the endpoints are geographic), then,
    // only when that finds nothing, the datum-based join that also admits
    // geocentric-registered legs. This is what keeps AGD66 -> WGS 84
    // (G1762) on the concatenated GDA94 -> GDA2020 -> G1762 path instead
    // of the geocentric-domain direct helmerts.
    def collect(requireGeogReg: Boolean): Vector[(Seq[Hop], String)] = {
      val o2 = Vector.newBuilder[(Seq[Hop], String)]
      def ok(l1: Leg, l2: Leg): Boolean = chainOk(l1, l2) &&
        (!requireGeogReg || (l1.geogReg && l2.geogReg))
      for (p <- fromA.keySet.intersect(toB.keySet).toVector.sorted
           if db.datums.contains(p);
           l1 <- fromA(p); l2 <- toB(p) if ok(l1, l2))
        o2 += ((l1.hops ++ l2.hops, l1.name + " + " + l2.name))
      if (o2.result().isEmpty) {
        for ((p1, ls1) <- fromA; (p2, ls2) <- toB
             if p1 != p2 && (db.sameDatum(p1, p2) ||
               db.sameEnsembleMembers(p1, p2)); l1 <- ls1; l2 <- ls2
             if ok(l1, l2))
          o2 += ((l1.hops ++ l2.hops, l1.name + " + " + l2.name))
      }
      o2.result()
    }
    if (bothGeographic) {
      val geogPass = collect(requireGeogReg = true)
      if (geogPass.nonEmpty) geogPass else collect(requireGeogReg = false)
    } else collect(requireGeogReg = false)
  }

  /** The operation list the reference's proj_create_crs_to_crs ends up
    * with (crs_to_crs.cpp:481-795): a KNOWN_AVAILABLE pass when the
    * only-best warn/error protocol is active, re-run with grid-discarding
    * (which enables the datum-pivot fallback) when nothing instantiable and
    * non-ballpark survived, the two lists concatenated. */
  def createList(src: Resolved, dst: Resolved, opts: Options): Vector[Candidate] =
    prepare(src, dst, opts).cands

  /** The candidate list the description surface (projinfo) shows: one
    * generate pass under the requested grid-availability mode, including
    * display-only candidates (tinshift/defmodel/raw PROJ-string methods),
    * with the CRS pair's own authorities admitted as in prepare(). */
  def createListForDisplay(src: Resolved, dst: Resolved, opts0: Options,
                           gridMode: Int): Vector[Candidate] = {
    def authOf(code: String): String =
      code.substring(0, math.max(code.indexOf(':'), 0))
    val pairAuths = Set(authOf(src.code), authOf(dst.code)).filter(_.nonEmpty)
    val opts1 = opts0.copy(displayOnly = true,
      implicitAuths = opts0.implicitAuths ++ pairAuths,
      preferAuth = opts0.preferAuth.orElse(
        pairAuths.toList match {
          case a :: Nil if a != "EPSG" && a != "PROJ4" => Some(a)
          case _ => None
        }))
    val opts = if (gridMode == GridMode.Ignore)
      opts1.copy(gridAvailable = _ => true) else opts1
    generate(src, dst, opts, gridMode)
  }

  /** result of the full creation protocol (reference crs_to_crs.cpp
    * proj_create_crs_to_crs_from_pj:596-760): the candidate list plus the
    * single-operation missing-grid outcomes the CLI layer must speak —
    * `initFail` (error mode: print the missing-grid message and abort) and
    * `initWarn` (warn mode: the message was conceptually emitted at creation
    * time; the runtime starts with non-instantiable candidates skipped). */
  final case class Prepared(cands: Vector[Candidate],
                            initFail: Option[Candidate],
                            initWarn: Option[Candidate])

  def prepare(src: Resolved, dst: Resolved, opts0: Options): Prepared = {
    // the CRS pair's own authorities join EPSG/PROJ as allowed op sources
    def authOf(code: String): String =
      code.substring(0, math.max(code.indexOf(':'), 0))
    val pairAuths = Set(authOf(src.code), authOf(dst.code)).filter(_.nonEmpty)
    val opts = opts0.copy(implicitAuths = opts0.implicitAuths ++ pairAuths,
      preferAuth = opts0.preferAuth.orElse(
        pairAuths.toList match {
          case a :: Nil if a != "EPSG" && a != "PROJ4" => Some(a)
          case _ => None
        }))
    val knownMode = opts.onlyBestError || opts.onlyBestWarn
    val listA = generate(src, dst, opts,
      if (knownMode) GridMode.Known else GridMode.Discard)
    if (!knownMode) return Prepared(listA, None, None)
    def merged: Vector[Candidate] = {
      val listB = generate(src, dst, opts, GridMode.Discard)
      if (listB.isEmpty) listA
      else listA.filterNot(c => c.ballpark || c.ballparkVertical) ++ listB
    }
    if (listA.length == 1 && !listA.head.instantiable) {
      // reference: op_count == 1 short-circuits before the re-run in error
      // mode; warn mode warns at creation time, then falls through to it
      if (opts.onlyBestError) return Prepared(listA, Some(listA.head), None)
      return Prepared(merged, None, Some(listA.head))
    }
    val ok = listA.exists(c => !c.ballpark && !c.ballparkVertical && c.instantiable)
    if (ok) return Prepared(listA, None, None)
    Prepared(merged, None, None)
  }

  /** resolve an area-of-use name ("USA - CONUS including EEZ") to its
    * bounding box through the operations that cite it. */
  def areaBboxByName(name: String): Option[Bbox] = {
    val key = EpsgDb.canonName(name)
    db.ops.collectFirst {
      case o if o.bbox.isDefined && EpsgDb.canonName(o.areaName) == key =>
        o.bbox.get
    }
  }

  /** look up a single coordinate operation by its exact name (cct's
    * "object name initialization") and build it between the operation's own
    * CRS ends. */
  def operationByName(name: String): Option[Candidate] = {
    val key = EpsgDb.canonName(name)
    db.ops.find(o => !o.deprecated && EpsgDb.canonName(o.name) == key)
      .flatMap { op =>
        for {
          s <- resolveCode(op.srcCrs)
          d <- resolveCode(op.dstCrs)
          c <- hopsToCandidate(s, d, Seq(Hop(op, inv = false)), op.name,
            Options())
        } yield c
      }
  }

  /** build the candidate for a single operation code between its own CRS
    * ends, regardless of deprecation/supersession (projinfo -k operation). */
  def operationByCode(code: String): Option[(Resolved, Resolved, Candidate)] =
    db.ops.find(_.code == code).flatMap { op =>
      for {
        s <- resolveCode(op.srcCrs)
        d <- resolveCode(op.dstCrs)
        hops <- if (op.kind == 'C') expandConcat(op, inv = false,
            displayOnly = true)
          else Some(Seq(Hop(op, inv = false)))
        c <- hopsToCandidate(s, d, hops, op.name,
          Options(displayOnly = true, gridAvailable = _ => true))
      } yield (s, d, c)
    }

  private def nullOpName(src: Resolved, dst: Resolved): String =
    s"Null geographic offset from ${src.name} to ${dst.name}"

  // ----------------------------------------------------------- sorting

  /** the reference's SortFunction (coordinateoperationfactory.cpp:913-1160),
    * reduced to the characteristics this factory produces. */
  def sort(cands: Vector[Candidate],
           knownAsAvailable: Boolean = false,
           /** area key override: projinfo sorts by the extent clipped to
             * the area of interest (reference sort() precomputation) */
           areaOf: Candidate => Double = null,
           /** PROJ-exportability: methods the pipeline engine cannot express
             * sort last (reference isPROJExportable, the first criterion) */
           exportableOf: Candidate => Boolean = null): Vector[Candidate] = {
    val areaKey: Candidate => Double =
      if (areaOf == null) _.pseudoArea else areaOf
    // in the only-best/warn protocol, grids registered in the alias table
    // rank as available even when missing on disk (the reference's
    // considerKnownGridsAsAvailable), so a local fallback cannot outrank
    // the canonical operation
    def avail(c: Candidate): Boolean =
      c.gridsAvailable || (knownAsAvailable && c.gridsKnown)
    def less(x: Candidate, y: Candidate): Boolean = {
      if (exportableOf != null) {
        val ex = exportableOf(x); val ey = exportableOf(y)
        if (ex && !ey) return true
        if (!ex && ey) return false
      }
      if (!x.ballpark && y.ballpark) return true
      if (x.ballpark && !y.ballpark) return false
      if (!x.ballparkVertical && y.ballparkVertical) return true
      if (x.ballparkVertical && !y.ballparkVertical) return false
      if (avail(x) && !avail(y)) return true
      if (avail(y) && !avail(x)) return false
      // grids registered in the alias DB go before unregistered ones
      // (reference SortFunction gridsKnown_ — e.g. the 1'x1' EGM2008 grid
      // with no grid_alternatives row sorts after the 2.5' one)
      if (x.gridsKnown && !y.gridsKnown) return true
      if (y.gridsKnown && !x.gridsKnown) return false
      val accA = x.accuracy; val accB = y.accuracy
      if (accA >= 0 && accB < 0) return true
      if (accB >= 0 && accA < 0) return false
      if (accA < 0 && accB < 0) {
        if (x.hasGrids && !y.hasGrids) return true
        if (!x.hasGrids && y.hasGrids) return false
      }
      val areaA = areaKey(x); val areaB = areaKey(y)
      if (areaA > 0) {
        if (areaA > areaB) return true
        if (areaA < areaB) return false
      } else if (areaB > 0) return false
      if (accA >= 0 && accA < accB) return true
      if (accB >= 0 && accB < accA) return false
      if (accA >= 0 && accA == accB) {
        if (!x.hasGrids && y.hasGrids) return true
        if (x.hasGrids && !y.hasGrids) return false
      }
      if (x.stepCount < y.stepCount) return true
      if (y.stepCount < x.stepCount) return false
      // fewer PROJ pipeline steps preferred (reference projStepCount)
      if (x.projSteps != 0 && y.projSteps != 0) {
        if (x.projSteps < y.projSteps) return true
        if (y.projSteps < x.projSteps) return false
      }
      if (x.name.length < y.name.length) return true
      if (y.name.length < x.name.length) return false
      x.name > y.name
    }
    cands.sortWith(less)
  }
}
