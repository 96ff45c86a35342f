package graft.cli

import graft.core.Geodesic
import graft.proj.ParamList

/** The geod/invgeod app: Karney geodesic filter over ascii lines
  * ("lat1 lon1 azi1 s12" forward, "lat1 lon1 lat2 lon2" inverse with
  * -I/invgeod), plus the +lat_1/+lon_1 line and arc generation modes.
  *
  * Behavioral provenance (no code copied): reference src/apps/geod.cpp,
  * geod_set.cpp, geod_interface.cpp — option grammar, the back-azimuth
  * conventions, DMS/format output, tag-line echo, intermediate-point
  * generation.
  */
object CliGeod {

  /** PROJ's built-in linear units (reference src/units.c pj_units). */
  private val units: Map[String, Double] = Map(
    "km" -> 1000.0, "m" -> 1.0, "dm" -> 0.1, "cm" -> 0.01, "mm" -> 0.001,
    "kmi" -> 1852.0, "in" -> 0.0254, "ft" -> 0.3048, "yd" -> 0.9144,
    "mi" -> 1609.344, "fath" -> 1.8288, "ch" -> 20.1168, "link" -> 0.201168,
    "us-in" -> (1.0 / 39.37), "us-ft" -> (0.304800609601219),
    "us-yd" -> (0.914401828803658), "us-ch" -> 20.11684023368047,
    "us-mi" -> 1609.347218694437, "ind-yd" -> 0.91439523,
    "ind-ft" -> 0.30479841, "ind-ch" -> 20.11669506)

  private final class State {
    var inverse = false
    var fullout = false
    var posAzi = false
    var tag = '#'
    var oform: Option[String] = None
    var osform = "%.3f"
    val rtodms = new Rtodms()
    var toMeter = 1.0
    var frMeter = 1.0
    var geod: Geodesic = null
    // current problem values, radians (the reference's globals)
    var phi1, lam1, al12, phi2, lam2, al21, s = 0.0
    // line/arc generation
    var nS = 0
    var nAlpha = 0
    var delAlpha = 0.0
  }

  def run(args: Seq[String], stdin: String, prog: String,
          files: Map[String, String],
          env: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    val code =
      try execute(args, stdin, prog, files, io)
      catch { case e: CliExit => io.err(e.message + "\n"); e.code }
    CliResult(io.stdout, io.stderr, io.combined, code)
  }

  private def fail(msg: String): Nothing = throw new CliExit(1, "geod: " + msg)

  private def execute(args: Seq[String], stdin: String, prog: String,
                      files: Map[String, String], io: CliOut): Int = {
    val st = new State
    st.inverse = prog.startsWith("inv")
    val plus = Vector.newBuilder[String]
    val operands = Vector.newBuilder[String]
    var i = 0
    def nextArg(c: Char): String = {
      i += 1
      if (i >= args.length) fail(s"missing argument for -$c")
      args(i)
    }
    while (i < args.length) {
      val a = args(i)
      if (a == "-") operands += "-"
      else if (a.startsWith("-") && a.length > 1) {
        var j = 1
        var done = false
        while (j < a.length && !done) {
          a.charAt(j) match {
            case 'a' => st.fullout = true
            case 'I' => st.inverse = true
            case 'p' => st.posAzi = true
            case 't' =>
              if (j + 1 < a.length) { st.tag = a.charAt(j + 1); j += 1 }
              else fail("missing -t col. 1 tag")
            case c @ ('w' | 'W') =>
              if (j + 1 < a.length && a.charAt(j + 1).isDigit) {
                st.rtodms.set(a.charAt(j + 1) - '0', c == 'W'); j += 1
              } else fail("-W argument missing or non-digit")
            case 'f' => st.oform = Some(nextArg('f')); done = true
            case 'F' => st.osform = nextArg('F'); done = true
            case other => fail(s"invalid option: -$other")
          }
          j += 1
        }
      } else if (a.startsWith("+")) plus += a.stripPrefix("+")
      else operands += a
      i += 1
    }

    // ellipsoid + units from the + parameter list (reference geod_set)
    val params = new ParamList(plus.result().map { t =>
      val eq = t.indexOf('=')
      if (eq < 0) (t, "") else (t.substring(0, eq), t.substring(eq + 1))
    })
    params.get("units").foreach { u =>
      st.toMeter = units.getOrElse(u, fail(s"$u unknown unit conversion id"))
      st.frMeter = 1.0 / st.toMeter
    }
    val (aAx, es) = ellOf(params)
    val f = es / (1 + math.sqrt(1 - es))
    st.geod = new Geodesic(aAx, f)

    // line/arc generation mode from + parameters
    if (params.get("lat_1").isDefined) {
      st.phi1 = params.r("lat_1"); st.lam1 = params.r("lon_1")
      if (params.get("lat_2").isDefined) {
        st.phi2 = params.r("lat_2"); st.lam2 = params.r("lon_2")
        geodInv(st)
      } else {
        st.s = params.get("S").map(_.toDouble).getOrElse(0.0)
        if (st.s == 0.0) fail("incomplete geodesic/arc info")
        st.al12 = params.r("A")
        geodFor(st)
      }
      st.nAlpha = params.get("n_A").map(_.toInt).getOrElse(0)
      if (st.nAlpha > 0) {
        st.delAlpha = params.r("del_A")
        if (st.delAlpha == 0.0) fail("del azimuth == 0")
      } else params.get("del_S").map(_.toDouble.abs) match {
        case Some(delS) if delS != 0.0 => st.nS = (st.s / delS + 0.5).toInt
        case _ =>
          st.nS = params.get("n_S").map(_.toInt).getOrElse(0)
          if (st.nS <= 0) fail("no interval divisor selected")
      }
      if (operands.result().nonEmpty)
        fail("files specified for arc/geodesic mode")
      if (st.nAlpha > 0) doArc(st, io) else doGeod(st, io)
      return 0
    }

    val inputs = operands.result() match {
      case Vector() => Vector(stdin)
      case ops => ops.map {
        case "-" => stdin
        case name => files.getOrElse(name, {
          io.err(s"geod: input file: $name\n"); ""
        })
      }
    }
    for (text <- inputs; line <- text.split("\n", -1).dropRight(1))
      processLine(st, line, io)
    0
  }

  private def ellOf(params: ParamList): (Double, Double) = {
    // delegate the ellipsoid grammar (+ellps/+a/+b/+rf/+f/+es/+R) to a
    // throwaway latlong PJ (the reference calls pj_ell_set the same way)
    val keep = Set("ellps", "a", "b", "rf", "f", "es", "e", "R")
    val toks = params.entries.filter(e => keep.contains(e._1))
      .map { case (k, v) => if (v.isEmpty) k else s"$k=$v" }
    val pj = graft.proj.Proj.create(("proj=latlong" +: toks).mkString(" "))
    (pj.a, pj.es)
  }

  private def geodFor(st: State): Unit = {
    val (lat2, lon2, azi2r) = st.geod.direct(math.toDegrees(st.phi1),
      math.toDegrees(st.lam1), math.toDegrees(st.al12), st.s)
    val azi2 = azi2r + (if (azi2r >= 0) -180.0 else 180.0)
    st.phi2 = math.toRadians(lat2); st.lam2 = math.toRadians(lon2)
    st.al21 = math.toRadians(azi2)
  }

  private def geodInv(st: State): Unit = {
    val (s12, azi1, azi2r) = st.geod.inverse(math.toDegrees(st.phi1),
      math.toDegrees(st.lam1), math.toDegrees(st.phi2),
      math.toDegrees(st.lam2))
    val azi2 = java.lang.Math.copySign(
      azi2r + java.lang.Math.copySign(180.0, -azi2r), -azi2r)
    st.al12 = math.toRadians(azi1); st.al21 = math.toRadians(azi2)
    st.s = s12
  }

  private def printLL(st: State, io: CliOut, p: Double, l: Double): Unit =
    st.oform match {
      case Some(fmt) =>
        io.out(CFormat.format(fmt, math.toDegrees(p))); io.out("\t")
        io.out(CFormat.format(fmt, math.toDegrees(l)))
      case None =>
        io.out(st.rtodms.format(p, 'N', 'S')); io.out("\t")
        io.out(st.rtodms.format(l, 'E', 'W'))
    }

  private def printAzi(st: State, io: CliOut, a: Double): Unit =
    st.oform match {
      case Some(fmt) => io.out(CFormat.format(fmt, math.toDegrees(a)))
      case None => io.out(st.rtodms.format(a, 0.toChar, 0.toChar))
    }

  private def doArc(st: State, io: CliOut): Unit = {
    printLL(st, io, st.phi2, st.lam2); io.out("\n")
    var az = st.al12
    var n = st.nAlpha
    while (n > 0) {
      n -= 1
      az = adjlon(az + st.delAlpha)
      st.al12 = az
      geodFor(st)
      printLL(st, io, st.phi2, st.lam2); io.out("\n")
    }
  }

  private def doGeod(st: State, io: CliOut): Unit = {
    val phil = st.phi2; val laml = st.lam2
    printLL(st, io, st.phi1, st.lam1); io.out("\n")
    val delS = st.s / st.nS
    var k = st.nS - 1
    st.s = delS
    while (k > 0) {
      k -= 1
      geodFor(st)
      printLL(st, io, st.phi2, st.lam2); io.out("\n")
      st.s += delS
    }
    printLL(st, io, phil, laml); io.out("\n")
  }

  private def adjlon(a0: Double): Double = {
    var a = a0
    if (math.abs(a) > math.Pi) {
      a += math.Pi
      a -= 2 * math.Pi * math.floor(a / (2 * math.Pi))
      a -= math.Pi
    }
    a
  }

  private def processLine(st: State, line: String, io: CliOut): Unit = {
    if (line.isEmpty) { io.out("\n"); return }
    if (line.charAt(0) == st.tag) { io.out(line + "\n"); return }
    var pos = 0
    def dms(): Double = {
      val (v, p) = CliIo.dmstorTok(line, pos); pos = p; v
    }
    st.phi1 = dms(); st.lam1 = dms()
    if (st.inverse) {
      st.phi2 = dms(); st.lam2 = dms()
      geodInv(st)
    } else {
      st.al12 = dms()
      val numStart = {
        var p = pos
        while (p < line.length && line.charAt(p).isWhitespace) p += 1
        p
      }
      var p2 = numStart
      while (p2 < line.length && !line.charAt(p2).isWhitespace) p2 += 1
      st.s = (if (numStart < line.length)
        line.substring(numStart, p2).toDoubleOption.getOrElse(0.0)
      else 0.0) * st.toMeter
      pos = p2
      geodFor(st)
    }
    if (st.posAzi) {
      if (st.al12 < 0) st.al12 += 2 * math.Pi
      if (st.al21 < 0) st.al21 += 2 * math.Pi
    }
    val rest = if (pos < line.length) line.substring(pos) else ""
    if (st.fullout) {
      printLL(st, io, st.phi1, st.lam1); io.out("\t")
      printLL(st, io, st.phi2, st.lam2); io.out("\t")
      printAzi(st, io, st.al12); io.out("\t")
      printAzi(st, io, st.al21); io.out("\t")
      io.out(CFormat.format(st.osform, st.s * st.frMeter))
    } else if (st.inverse) {
      printAzi(st, io, st.al12); io.out("\t")
      printAzi(st, io, st.al21); io.out("\t")
      io.out(CFormat.format(st.osform, st.s * st.frMeter))
    } else {
      printLL(st, io, st.phi2, st.lam2); io.out("\t")
      printAzi(st, io, st.al21)
    }
    io.out(rest + "\n")
  }
}
