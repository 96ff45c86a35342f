package graft.cli

import graft.proj.{EpsgDb, EpsgMeta, Ellipsoids}
import graft.proj.OpFactory.{Candidate, Resolved}

/** PROJ-string *display* export for coordinate operations (the text
  * projinfo prints), rendered from the factory's internal pipeline plus the
  * CRS pair's coordinate systems.
  *
  * Behavioral provenance (no code copied): reference io.cpp
  * PROJStringFormatter::toString — multi-line mode indents steps by 2,
  * wraps at 80 columns with an 8-space continuation, prints +inv before
  * +proj, a single step drops the pipeline wrapper, an empty chain is
  * +proj=noop; named ellipsoids replace a=/rf= pairs (ellipsoid.cpp
  * lookForProjWellKnownEllps, first match in the pj_ellps table order).
  */
object ProjOut {

  final case class Step(inv: Boolean, name: String,
                        params: Vector[(String, String)])

  // ---------------------------------------------------------- parsing

  /** parse the factory's internal pipeline text into steps. */
  def parse(pipeline: String): Vector[Step] = {
    val toks = pipeline.split("\\s+").iterator.filter(_.nonEmpty).toVector
    val body = if (toks.headOption.contains("proj=pipeline")) toks.tail else toks
    if (body.isEmpty) return Vector.empty
    val steps = Vector.newBuilder[Step]
    var cur = Vector.empty[String]
    def flush(): Unit = if (cur.nonEmpty) {
      var inv = false
      var name = ""
      val params = Vector.newBuilder[(String, String)]
      for (t <- cur) {
        if (t == "inv") inv = true
        else if (t.startsWith("proj=")) name = t.substring(5)
        else if (t.startsWith("init=")) { name = t; }
        else {
          val eq = t.indexOf('=')
          if (eq < 0) params += ((t, ""))
          else params += ((t.substring(0, eq), t.substring(eq + 1)))
        }
      }
      steps += Step(inv, name, params.result())
      cur = Vector.empty
    }
    for (t <- body) {
      if (t == "step") { flush() } else cur :+= t
    }
    flush()
    // a bare single-op string ("proj=noop", "proj=affine ...") parses as one
    // step with no leading "step" token
    steps.result()
  }

  // ------------------------------------------------- display rewrites

  private def numEq(a: String, b: String): Boolean = {
    if (a.isEmpty || b.isEmpty) false
    else if (a == b) true
    else (a.toDoubleOption, b.toDoubleOption) match {
      case (Some(x), Some(y)) => x == y
      case _ => false
    }
  }

  /** pj_ellps order (reference src/ellps.cpp) for first-match naming */
  private val ellpsOrder = Vector(
    "MERIT", "SGS85", "GRS80", "IAU76", "airy", "APL4.9", "NWL9D",
    "mod_airy", "andrae", "danish", "aust_SA", "GRS67", "GSK2011", "bessel",
    "bess_nam", "clrk66", "clrk80", "clrk80ign", "CPM", "delmbr", "engelis",
    "evrst30", "evrst48", "evrst56", "evrst69", "evrstSS", "fschr60",
    "fschr60m", "fschr68", "helmert", "hough", "intl", "krass", "kaula",
    "lerch", "mprts", "new_intl", "plessis", "PZ90", "SEasia", "walbeck",
    "WGS60", "WGS66", "WGS72", "WGS84", "sphere")

  /** (a, rf) or (a, b) -> named ellipsoid, first match in table order */
  private def ellpsName(a: String, rf: Option[String], b: Option[String]): Option[String] =
    ellpsOrder.find { n =>
      val (aDef, shapeDef) = Ellipsoids.table(n)
      val aVal = aDef.stripPrefix("a=")
      numEq(aVal, a) && ((rf, b) match {
        case (Some(r), _) if shapeDef.startsWith("rf=") =>
          numEq(shapeDef.stripPrefix("rf="), r)
        case (_, Some(bb)) if shapeDef.startsWith("b=") =>
          numEq(shapeDef.stripPrefix("b="), bb)
        case _ => false
      })
    }

  /** %.15g text of a numeric parameter value (the reference re-derives
    * every PROJ-string number from the double). Non-numeric values pass
    * through (grid names, axis orders). */
  private def numNorm(v: String): String = v.toDoubleOption match {
    case Some(d) if !v.exists(c => c == ',' || c.isLetter && c != 'e' && c != 'E') =>
      if (d == 0.0) "0" else graft.cli.CFormat.format("%.15g", d)
    case _ => v
  }

  private def rewriteStep(s0: Step): Step = {
    var s = s0.copy(params = s0.params.map { case (k, v) => (k, numNorm(v)) })
    // UTM conversions print as +proj=utm +zone=N [+south] (reference
    // conversion.cpp isUTM detection on export)
    if (s.name == "tmerc") {
      def p(k: String): Option[Double] =
        s.params.find(_._1 == k).map(_._2).flatMap(_.toDoubleOption)
      val lon = p("lon_0").getOrElse(Double.NaN)
      val zone = math.round((lon + 183.0) / 6.0)
      val south = p("y_0").contains(10000000.0)
      if (p("lat_0").contains(0.0) && p("k").contains(0.9996) &&
        p("x_0").contains(500000.0) &&
        (p("y_0").contains(0.0) || south) &&
        zone >= 1 && zone <= 60 && zone * 6.0 - 183.0 == lon) {
        val rest = s.params.filterNot(q => Set("lat_0", "lon_0", "k", "x_0",
          "y_0", "approx").contains(q._1))
        val zoneParams = Vector(("zone", zone.toString)) ++
          (if (south) Vector(("south", "")) else Vector.empty)
        s = s.copy(name = "utm", params = zoneParams ++ rest)
      }
    }
    var params = s.params
    // a=/rf= (or a=/b=) pairs fold into +ellps=NAME when a table entry
    // matches exactly (the reference's lookForProjWellKnownEllps)
    val a = params.find(_._1 == "a").map(_._2)
    val rf = params.find(_._1 == "rf").map(_._2)
    val b = params.find(_._1 == "b").map(_._2)
    if (a.isDefined && (rf.isDefined || b.isDefined) &&
      !params.exists(_._1 == "ellps")) {
      ellpsName(a.get, rf, b) match {
        case Some(n) =>
          val idx = params.indexWhere(_._1 == "a")
          params = params.filterNot(p => p._1 == "a" || p._1 == "rf" || p._1 == "b")
          params = (params.take(idx) :+ ("ellps", n)) ++ params.drop(idx)
        case None => ()
      }
    }
    // default units and legacy tokens are not part of the reference export
    params = params.filterNot { case (k, v) =>
      (k == "units" && v == "m") || k == "no_defs" || k == "wktext" ||
        k == "type"
    }
    // helmert: the reference only prints +convention when rotational terms
    // participate (translation-only helmerts have an unambiguous sense)
    if (s.name == "helmert") {
      val rotational = Set("rx", "ry", "rz", "s", "drx", "dry", "drz", "ds",
        "px", "py", "pz", "theta")
      if (!params.exists(p => rotational.contains(p._1)))
        params = params.filterNot(_._1 == "convention")
    }
    s.copy(params = params)
  }

  /** rewrite for the legacy PROJ.4 *CRS* string: numbers re-derived, named
    * ellipsoid folded, UTM recognized, +towgs84 widened to seven terms (the
    * reference exports a full 7-parameter bound transformation), +datum=
    * replacing ellps+towgs84 when the CRS's datum is a legacy named datum;
    * +units/+pm kept. */
  def rewriteCrsStep(s0: Step, datumName: Option[String]): Step = {
    val s = rewriteStepForCrs(s0)
    var params = s.params
    datumName match {
      case Some(d) =>
        params = params.filterNot(_._1 == "towgs84").map {
          case ("ellps", _) => ("datum", d)
          case p => p
        }
      case None =>
        params = params.map {
          case ("towgs84", v) if v.count(_ == ',') == 2 =>
            ("towgs84", v + ",0,0,0,0")
          case p => p
        }
    }
    s.copy(params = params)
  }

  /** like rewriteStep but keeping +units=m (CRS strings print it). */
  private def rewriteStepForCrs(s0: Step): Step = {
    val keepUnits = s0.params.filter(_._1 == "units")
    val s = rewriteStep(s0)
    if (keepUnits.nonEmpty && !s.params.exists(_._1 == "units"))
      s.copy(params = s.params ++ keepUnits)
    else s
  }

  // --------------------------------------------------- CS normalization

  /** I/O normalization steps for one end of the chain: authority axis
    * order / units -> the GIS-normalized form the internal pipeline speaks
    * (lon,lat radians; projected in metres easting,northing).
    * `out` renders the destination side (reverse order, inverse sense). */
  def ioSteps(r: Resolved, out: Boolean, wholeCrs: Boolean): Vector[Step] = {
    val meta = EpsgMeta.meta
    val csKey = r.projCode.orElse(Some(r.geod.code))
      .flatMap(meta.crs.get).map(_.csKey).getOrElse("")
    val cs = meta.css.get(csKey)
    val axes = cs.map(_.axes).getOrElse(Nil)
    val steps = Vector.newBuilder[Step]
    val northFirst = axes.headOption.exists(a =>
      a.orientation == "north" || a.orientation == "south")
    if (northFirst)
      steps += Step(inv = false, "axisswap", Vector(("order", "2,1")))
    if (r.projCode.isEmpty && r.kind != EpsgDb.Geocentric && !wholeCrs) {
      // geographic end: degrees (or grads) to radians
      val unitName = axes.headOption.flatMap(a => meta.uoms.get(a.uomKey))
        .map(_.name).getOrElse("degree")
      val u = if (unitName.startsWith("grad")) "grad" else "deg"
      steps += (if (out) Step(inv = false, "unitconvert",
        Vector(("xy_in", "rad"), ("xy_out", u)))
      else Step(inv = false, "unitconvert",
        Vector(("xy_in", u), ("xy_out", "rad"))))
    }
    val v = steps.result()
    if (out) v.reverse else v
  }

  // ----------------------------------------------------------- render

  /** the reference formatter's peephole: adjacent identical steps with
    * opposite senses cancel (a conversion wrapped around a projected-space
    * op against the chain's own projected end). */
  private def cancelAdjacentInverses(steps: Vector[Step]): Vector[Step] = {
    var v = steps
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (!changed && i + 1 < v.length) {
        val a = v(i); val b = v(i + 1)
        def pm(st: Step, k: String) = st.params.find(_._1 == k).map(_._2)
        val inverses =
          (a.name == b.name && a.name != "pop" && a.name != "push" &&
            a.inv != b.inv && a.params == b.params) ||
          // pop/push (either order) of the same slots restores state
          (Set(a.name, b.name) == Set("push", "pop") && !a.inv && !b.inv &&
            a.params == b.params) ||
          // reciprocal unit conversions
          (a.name == "unitconvert" && b.name == "unitconvert" &&
            pm(a, "xy_in") == pm(b, "xy_out") &&
            pm(a, "xy_out") == pm(b, "xy_in")) ||
          // a 2,1 axis swap is its own inverse
          (a.name == "axisswap" && b.name == "axisswap" &&
            a.params == b.params && pm(a, "order").contains("2,1"))
        if (inverses) {
          v = v.patch(i, Nil, 2)
          changed = true
        }
        i += 1
      }
    }
    v
  }

  /** render steps as the reference PROJStringFormatter does. */
  def render(steps0: Vector[Step], multiline: Boolean): String = {
    val steps = cancelAdjacentInverses(steps0.map(rewriteStep).filterNot(s =>
      (s.name == "noop" && steps0.length > 1) ||
        // zero offsets are identity (the reference's exporter never emits
        // them)
        (s.name == "geogoffset" && s.params.forall(_._2 == "0"))))
    if (steps.isEmpty) return "+proj=noop"
    if (steps.length == 1) {
      val s = steps.head
      val sb = new StringBuilder
      if (s.inv) sb ++= "+inv "
      sb ++= "+proj=" + s.name
      for ((k, v) <- s.params) {
        sb += ' '; sb += '+'; sb ++= k
        if (v.nonEmpty) { sb += '='; sb ++= v }
      }
      return sb.toString
    }
    val sb = new StringBuilder("+proj=pipeline")
    for (s <- steps) {
      var curLine = if (multiline) "  +step" else " +step"
      if (s.inv) curLine += " +inv"
      curLine += " +proj=" + s.name
      for ((k, v) <- s.params) {
        val kv = "+" + k + (if (v.nonEmpty) "=" + v else "")
        if (multiline && curLine.length + kv.length > 80) {
          sb += '\n'; sb ++= curLine
          curLine = " " * 8
          curLine += kv
        } else {
          curLine += ' '
          curLine += kv
        }
      }
      if (multiline) { sb += '\n'; sb ++= curLine }
      else sb ++= curLine
    }
    sb.toString
  }

  /** full display pipeline for a candidate between the resolved pair. */
  def candidateProj(src: Resolved, dst: Resolved, c: Candidate,
                    multiline: Boolean, normalizeAxisOrder: Boolean = false): String = {
    val core = parse(c.pipeline)
    if (c.pipeline == "proj=noop" && c.dispHops.isEmpty &&
      src.projBody.isEmpty && dst.projBody.isEmpty &&
      !crossAxisOrUnits(src, dst))
      return "+proj=noop"
    val pre = ioSteps(src, out = false, c.wholeCrs)
      .filterNot(s => normalizeAxisOrder && s.name == "axisswap")
    val post = ioSteps(dst, out = true, c.wholeCrs)
      .filterNot(s => normalizeAxisOrder && s.name == "axisswap")
    val all = pre ++ core.filterNot(_.name == "noop") ++ post
    if (all.isEmpty) "+proj=noop" else render(all, multiline)
  }

  /** identical authority axis conventions on both ends let a noop stay a
    * noop (no normalization steps needed for display). */
  private def crossAxisOrUnits(src: Resolved, dst: Resolved): Boolean = false
}
