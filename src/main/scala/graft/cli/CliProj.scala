package graft.cli

import graft.core.{Coord, ProjError}
import graft.proj.{Dispatch, Dms, Factors, IOUnits, NumParse, ParamList, PJ, Proj}

/** Captured process output: separate streams plus the 2>&1 interleaving the
  * reference yaml runner's `out` key compares against. */
final class CliOut {
  private val o = new StringBuilder
  private val e = new StringBuilder
  private val both = new StringBuilder
  def out(s: String): Unit = { o.append(s); both.append(s) }
  def err(s: String): Unit = { e.append(s); both.append(s) }
  def stdout: String = o.toString
  def stderr: String = e.toString
  def combined: String = both.toString
}

final case class CliResult(stdout: String, stderr: String, combined: String, exit: Int)

/** emess-style fatal error (reference src/apps/emess.cpp): message on
  * stderr, non-zero exit. */
final class CliExit(val code: Int, val message: String) extends RuntimeException(message)

object CliIo {
  final val HUGE = Double.PositiveInfinity

  /** C dmstor over a line at `pos`: (radians, newPos); HUGE_VAL on a
    * malformed DMS token, (0, pos-after-ws) when no number starts. */
  def dmstorTok(line: String, pos: Int): (Double, Int) = {
    val (v, consumed) = Dms.dmstor(line, pos)
    if (consumed == 0) {
      var p = pos
      while (p < line.length && Character.isWhitespace(line.charAt(p))) p += 1
      (0.0, p)
    } else if (v.isNaN) (HUGE, pos + consumed)
    else (v, pos + consumed)
  }

  /** C strtod over a line at `pos` (skips leading whitespace; failure →
    * value 0 with pos unmoved past the whitespace). */
  def strtodTok(line: String, pos: Int): (Double, Int) = {
    var p = pos
    while (p < line.length && Character.isWhitespace(line.charAt(p))) p += 1
    val (v, end) = NumParse.strtod(line, p)
    if (v.isNaN) (0.0, p) else (v, end)
  }

  /** Concatenate input sources like the C apps' sequential fgets over a
    * file list: a file's last line ends at EOF even without a newline. */
  def concatInputs(eargs: Seq[String], stdin: String,
                   files: Map[String, String]): String =
    eargs.map { f =>
      val c = if (f == "-") stdin else files.getOrElse(f, "")
      if (c.nonEmpty && !c.endsWith("\n")) c + "\n" else c
    }.mkString

  /** stdin → lines without terminators (the runner always newline-
    * terminates input, mirroring run_cli_test.py's `input += "\n"`); a
    * UTF-8 BOM on the first line is skipped like cs2cs.cpp:118-125 does. */
  def lines(stdin: String): Seq[String] = {
    val noBom = if (stdin.startsWith("﻿")) stdin.substring(1) else stdin
    val t = if (noBom.endsWith("\n")) noBom.dropRight(1) else noBom
    if (t.isEmpty) Seq.empty else t.split("\n", -1).toSeq
  }
}

/** The `proj` / `invproj` applications (reference src/apps/proj.cpp),
  * re-expressed over the engine's PJ/Dispatch layer. Supported: the ascii
  * processing loop with -E/-I/-S/-r/-s/-e/-f/-d/-m/-t/-w/-W flags, proj
  * parameters, and a bare EPSG:code CRS argument (resolved through the
  * generated EPSG table rather than the iso19111 database). Binary I/O
  * (-i/-o/-b) and the list/verbose modes are not implemented.
  */
object CliProj {
  import CliIo._

  def run(args: Seq[String], stdin: String, progName: String = "proj",
          files: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    try {
      runInner(args, stdin, progName, io, files)
      CliResult(io.stdout, io.stderr, io.combined, 0)
    } catch {
      case ex: CliExit =>
        // emess fatal shape (reference src/apps/emess.cpp)
        io.err(s"\n${ex.message}\nprogram abnormally terminated\n")
        CliResult(io.stdout, io.stderr, io.combined, ex.code)
    }
  }

  private def runInner(args: Seq[String], stdin: String, progName: String,
                       io: CliOut, files: Map[String, String]): Unit = {
    var echoin = false
    var inverse = progName.startsWith("inv")
    var dofactors = false
    var reversein = false
    var reverseout = false
    var prescale = false
    var postscale = false
    var fscale = 0.0
    var oform: Option[String] = None
    var oterr = "*\t*"
    var tag = '#'
    val rtodms = new Rtodms()
    val plusArgs = Vector.newBuilder[(String, String)]
    var havePlus = false
    val eargs = scala.collection.mutable.ArrayBuffer.empty[String]

    var i = 0
    def nextArg(flag: Char): String = {
      i += 1
      if (i >= args.length) throw new CliExit(1, s"missing argument for -$flag")
      args(i)
    }
    while (i < args.length) {
      val arg = args(i)
      if (arg.length > 1 && arg.charAt(0) == '-') {
        var j = 1
        var done = false
        while (j < arg.length && !done) {
          arg.charAt(j) match {
            case 'I' => inverse = true
            case 'E' => echoin = true
            case 'S' => dofactors = true
            case 'r' => reversein = true
            case 's' => reverseout = true
            case 'e' => oterr = nextArg('e'); done = true
            case 'm' =>
              val sc = nextArg('m'); done = true
              postscale = true
              val body = if (sc.startsWith("1/") || sc.startsWith("1:")) sc.substring(2) else sc
              fscale = NumParse.atof(body) match { case v if v.isNaN => 0.0; case v => v }
              if (sc.startsWith("1/") || sc.startsWith("1:")) fscale = if (fscale == 0) 0 else 1 / fscale
              if (fscale == 0.0) throw new CliExit(1, "invalid scale argument")
            case 'f' => oform = Some(nextArg('f')); done = true
            case 'd' =>
              val d = nextArg('d'); done = true
              oform = Some(s"%.${d.toIntOption.getOrElse(0)}f")
            case 't' =>
              if (j + 1 < arg.length) { tag = arg.charAt(j + 1); j += 1 }
              else throw new CliExit(1, "missing -t col. 1 tag")
            case c @ ('w' | 'W') =>
              if (j + 1 < arg.length && arg.charAt(j + 1).isDigit) {
                rtodms.set(arg.charAt(j + 1) - '0', c == 'W'); j += 1
              } else throw new CliExit(1, "-W argument missing or non-digit")
            case other => throw new CliExit(1, s"invalid option: -$other")
          }
          j += 1
        }
      } else if (arg.startsWith("+")) {
        havePlus = true
        val t = arg.substring(1)
        val eq = t.indexOf('=')
        plusArgs += (if (eq < 0) (t, "") else (t.substring(0, eq), t.substring(eq + 1)))
      } else eargs += arg
      i += 1
    }

    oform.foreach { f =>
      if (CFormat.parse(f).isEmpty) throw new CliExit(1, "invalid format string")
    }

    if (inverse && postscale) { prescale = true; postscale = false; fscale = 1 / fscale }

    // CRS-argument mode (proj.cpp:535-640): first non-flag arg is a CRS
    var P: PJ = null
    if (!havePlus && eargs.nonEmpty) {
      val crsStr = eargs.remove(0)
      // like proj.cpp's CRS path, the reference geographic CRS shares the
      // target's datum — no hub shift, so the cs2cs emulation must not fire
      P =
        try {
          // a compound code projects through its horizontal member; any
          // projected EPSG code falls back to the generated init table
          val horiz = {
            val t = crsStr.trim
            val norm = if (t.indexOf(':') < 0) "EPSG:" + t else
              t.substring(0, t.indexOf(':')).toUpperCase + t.substring(t.indexOf(':'))
            graft.proj.EpsgDb.db.compound.get(norm).map(_.horiz).getOrElse(crsStr)
          }
          val expanded = graft.proj.EpsgAliases.resolve(horiz)
            .orElse(graft.proj.OpFactory.projBodyOf(
              if (horiz.indexOf(':') < 0) "EPSG:" + horiz else horiz))
            .getOrElse(horiz)
          Proj.create(new ParamList(
            ParamList.parse(expanded).entries :+ ("break_cs2cs_recursion" -> "")))
        } catch { case _: ProjError => throw new CliExit(1, "CRS is not parseable") }
      if (P.angularOutput(forward = true))
        throw new CliExit(1, "CRS must be projected")
    }

    if (P == null) {
      // proj historically ignores datum shift specifiers (proj.cpp:664)
      val entries = plusArgs.result() :+ ("break_cs2cs_recursion" -> "")
      P =
        try Proj.create(new ParamList(entries))
        catch {
          case e: ProjError =>
            throw new CliExit(1, s"projection initialization failure\ncause: ${e.getMessage}")
        }
    }

    // reference proj.cpp:700-707 "Ugly hack" for the General Oblique
    // Transformation: output side treated as projected
    if (P.right == IOUnits.WHATEVER && P.shortName == "ob_tran")
      P.right = IOUnits.PROJECTED

    if (!P.angularInput(forward = true))
      throw new CliExit(1,
        "can't initialize operations that take non-angular input coordinates. Try cct.")
    if (P.angularOutput(forward = true))
      throw new CliExit(1, "can't initialize operations that produce angular output coordinates")
    if (inverse && !P.hasInverse)
      throw new CliExit(1, "inverse projection not available")

    val effOform: Option[String] =
      if (oform.isDefined) oform
      else if (!inverse) Some("%.2f")
      else None // ascii DMS output

    def fmtNum(v: Double): String = CFormat.format(effOform.getOrElse("%.2f"), v)

    // ---- processing loop (proj.cpp process():63-199) ----
    val inputText =
      if (eargs.isEmpty) stdin
      else CliIo.concatInputs(eargs.toSeq, stdin, files)
    for (line <- lines(inputText)) {
      if (line.nonEmpty && line.charAt(0) == tag) io.out(line + "\n")
      else {
        val informat: (String, Int) => (Double, Int) =
          if (inverse) strtodTok else dmstorTok
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
        if (v == HUGE) u = HUGE

        if (echoin) { io.out(line.substring(0, math.min(pos, line.length))); io.out("\t") }

        var facs: Factors.ProjFactors = null
        var facsBad = false
        var x = u
        var y = v
        if (u != HUGE) {
          if (prescale) { x *= fscale; y *= fscale }
          if (dofactors && !inverse) {
            try facs = Factors(P, x - P.fromGreenwich, y)
            catch { case _: ProjError => facsBad = true }
          }
          val c = new Coord
          c.set(x, y, 0.0, 0.0)
          if (inverse) Dispatch.inv4d(P, c) else Dispatch.fwd4d(P, c)
          if (c.isError || c.x == HUGE) { x = HUGE; y = HUGE }
          else { x = c.x; y = c.y }
          if (dofactors && inverse && x != HUGE) {
            try facs = Factors(P, x - P.fromGreenwich, y)
            catch { case _: ProjError => facsBad = true }
          }
          if (postscale && x != HUGE) { x *= fscale; y *= fscale }
        } else { x = HUGE }

        if (x == HUGE) io.out(oterr)
        else if (inverse && oform.isEmpty) {
          // ascii DMS output
          val (a, b) = if (reverseout) (y, x) else (x, y)
          val (pa, na, pb, nb) =
            if (reverseout) ('N', 'S', 'E', 'W') else ('E', 'W', 'N', 'S')
          io.out(rtodms.format(a, pa, na)); io.out("\t"); io.out(rtodms.format(b, pb, nb))
        } else {
          var ox = x
          var oy = y
          val angular =
            if (inverse) P.angularInput(forward = true)
            else P.angularOutput(forward = true)
          if (angular) { ox *= graft.core.GeoMath.RAD2DEG; oy *= graft.core.GeoMath.RAD2DEG }
          if (reverseout) { val t = ox; ox = oy; oy = t }
          io.out(fmtNum(ox)); io.out("\t"); io.out(fmtNum(oy))
        }

        if (dofactors) {
          if (facs != null && !facsBad) {
            def g(v: Double) = CFormat.format("%g", v)
            io.out("\t<" + g(facs.meridionalScale) + " " + g(facs.parallelScale) +
              " " + g(facs.arealScale) +
              " " + g(facs.angularDistortion * graft.core.GeoMath.RAD2DEG) +
              " " + g(facs.tissotSemimajor) + " " + g(facs.tissotSemiminor) + ">")
          } else io.out("\t<* * * * * *>")
        }
        io.out(line.substring(math.min(pos, line.length)))
        io.out("\n")
      }
    }
  }
}
