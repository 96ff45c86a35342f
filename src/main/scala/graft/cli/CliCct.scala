package graft.cli

import graft.core.{Coord, GeoMath, ProjError}
import graft.proj.{Dispatch, ParamList, Proj}

/** The `cct` application (reference src/apps/cct.cpp): a 4D coordinate
  * conversion filter over one operator spec. Supported: +operator args,
  * -d/-z/-t/-I, --version/-h, file inputs with BOM skip, and the exact
  * record print formats (angles %14.*f at 10 decimals, distances %13.*f at
  * 4, time always %12.4f). WKT/object-code initialization needs iso19111
  * and is out of scope.
  */
object CliCct {
  import CliIo._

  private val usage =
    "Usage: cct [-options]... [+operator_specs]... infile...\n"

  /** Coordinate-operation codes the corpus uses, with their published
    * parameters (EPSG:8366 "ITRF2014 to ETRF2014 (1)": time-dependent
    * position-vector rotation rates 0.085/0.531/-0.770 mas/yr at reference
    * epoch 1989 — the same values the corpus itself embeds as WKT in
    * test_cct.yaml). iso19111's general operation factory is out of scope. */
  private val opAliases = Map(
    "EPSG:8366" -> ("proj=helmert convention=position_vector " +
      "drx=8.5e-05 dry=0.000531 drz=-0.00077 t_epoch=1989"))

  def run(args: Seq[String], stdin: String, progName: String = "cct",
          files: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    try {
      val code = runInner(args, stdin, io, files)
      CliResult(io.stdout, io.stderr, io.combined, code)
    } catch {
      case ex: CliExit =>
        io.err(s"${ex.message}\n")
        CliResult(io.stdout, io.stderr, io.combined, ex.code)
    }
  }

  private def runInner(args: Seq[String], stdin: String, io: CliOut,
                       files: Map[String, String]): Int = {
    var decimalsAngles = 10
    var decimalsDistances = 4
    var fixedZ = Double.NaN
    var fixedT = Double.NaN
    var inverse = false
    val plusArgs = Vector.newBuilder[(String, String)]
    var havePlus = false
    val eargs = scala.collection.mutable.ArrayBuffer.empty[String]

    var i = 0
    def nextArg(flag: String): String = {
      i += 1
      if (i >= args.length) throw new CliExit(1, s"missing argument for $flag")
      args(i)
    }
    while (i < args.length) {
      val arg = args(i)
      if (arg == "--version") { io.out("cct: Rel. graft (reference-parity build)\n"); return 0 }
      else if (arg == "-h" || arg == "--help") { io.out(usage); return 0 }
      else if (arg.startsWith("--")) throw new CliExit(1, s"invalid option $arg")
      else if (arg.length > 1 && arg.charAt(0) == '-') {
        arg.charAt(1) match {
          case 'd' =>
            val d = nextArg("-d").toIntOption.getOrElse(0)
            decimalsAngles = d; decimalsDistances = d
          case 'z' => fixedZ = graft.proj.NumParse.atof(nextArg("-z"))
          case 't' => fixedT = graft.proj.NumParse.atof(nextArg("-t"))
          case 'I' => inverse = true
          case 'v' | 'V' => ()
          case 'o' => nextArg("-o")
          case 's' => nextArg("-s")
          case 'c' => nextArg("-c")
          case _ => throw new CliExit(1, s"invalid option ${arg}")
        }
      } else if (arg.startsWith("+")) {
        havePlus = true
        val t = arg.substring(1)
        val eq = t.indexOf('=')
        plusArgs += (if (eq < 0) (t, "") else (t.substring(0, eq), t.substring(eq + 1)))
      } else eargs += arg
      i += 1
    }

    val P =
      if (havePlus) {
        try Proj.create(new ParamList(plusArgs.result()))
        catch {
          case e: ProjError =>
            throw new CliExit(1,
              s"cct: Bad transformation arguments - (${e.getMessage})\n    'cct -h' for help")
        }
      } else if (eargs.nonEmpty) {
        // operation-code / WKT initialization ('@file' reads the
        // definition from a file, like proj_create); object NAMES need
        // iso19111 and stay out of scope
        val spec0 = eargs.remove(0)
        val spec =
          if (spec0.startsWith("@"))
            files.getOrElse(spec0.substring(1),
              throw new CliExit(1, s"Cannot open file ${spec0.substring(1)}"))
          else opAliases.getOrElse(spec0, spec0)
        try {
          if (graft.proj.wkt.Wkt.looksLikeWkt(spec)) {
            graft.proj.wkt.WktMap.toObject(graft.proj.wkt.Wkt.parse(spec)) match {
              case _: graft.proj.wkt.WktCrsDef =>
                throw new CliExit(1,
                  "cct: Input object is not a coordinate operation, but a CRS.")
              case op: graft.proj.wkt.WktOpDef => Proj.create(op.projString)
            }
          } else if (!spec.contains('=') && spec.contains(' '))
            // coordinate-operation lookup by name ("ITRF2014 to ETRF2014 (1)")
            graft.proj.OpFactory.operationByName(spec0)
              .flatMap(_.pj.toOption)
              .getOrElse(throw graft.core.ProjError(
                graft.core.ProjErr.INVALID_OP, s"unknown operation $spec0"))
          else Proj.create(spec)
        } catch {
          case _: ProjError =>
            throw new CliExit(1,
              s"cct: Bad transformation arguments - ('$spec0')\n    'cct -h' for help")
        }
      } else throw new CliExit(1, usage.trim)

    if (inverse) {
      if (!P.hasInverse) throw new CliExit(1, "Inverse operation not available")
      P.inverted = !P.inverted
    }

    val inputText =
      if (eargs.isEmpty) stdin
      else {
        for (f <- eargs if f != "-" && !files.contains(f))
          throw new CliExit(1, s"Cannot open file $f")
        CliIo.concatInputs(eargs.toSeq, stdin, files)
      }

    val angularIn = P.angularInput(forward = true)
    val angularOut = P.angularOutput(forward = true)
    val degreeOut = P.degreeOutput(forward = true)

    def f(width: Int, prec: Int, v: Double): String =
      CFormat.format(CFormat.Spec(plus = false, zeroPad = false,
        width = width, prec = prec, conv = 'f'), v)

    for (line <- lines(inputText)) {
      val trimmed = line.dropWhile(_.isWhitespace)
      if (trimmed.isEmpty || trimmed.charAt(0) == '#') io.out(line + "\n")
      else {
        // column parse with explicit failure (missing column → HUGE_VAL,
        // like cct.cpp parse_input_line)
        var pos = 0
        def tok(): Double = {
          var p = pos
          while (p < line.length && Character.isWhitespace(line.charAt(p))) p += 1
          val (v, end) = graft.proj.NumParse.strtod(line, p)
          if (v.isNaN) HUGE else { pos = end; v }
        }
        var x = tok()
        var y = tok()
        var z = { val v = tok(); if (!fixedZ.isNaN) fixedZ else v }
        var t = { val v = tok(); if (!fixedT.isNaN) fixedT else v }
        if (y == HUGE) x = HUGE

        if (x == HUGE) {
          io.out(s"# Record UNREADABLE: $line\n")
        } else {
          if (angularIn) { x = GeoMath.DEG2RAD * x; y = GeoMath.DEG2RAD * y }
          val c = new Coord
          c.set(x, y, if (z == HUGE) Double.PositiveInfinity else z,
            if (t == HUGE) Double.PositiveInfinity else t)
          Dispatch.trans(P, forward = true, c)
          if (c.isError || c.x == HUGE) {
            io.out(s"# Record TRANSFORMATION ERROR: $line\n")
          } else {
            var ox = c.x
            val oy = c.y
            if (angularOut) { ox = GeoMath.RAD2DEG * ox }
            val oyd = if (angularOut) GeoMath.RAD2DEG * oy else oy
            if (angularOut || degreeOut)
              io.out(f(14, decimalsAngles, ox) + "  " + f(14, decimalsAngles, oyd) +
                "  " + f(12, decimalsDistances, c.z) + "  " + f(12, 4, c.t) + "\n")
            else
              io.out(f(13, decimalsDistances, ox) + "  " + f(13, decimalsDistances, oyd) +
                "  " + f(12, decimalsDistances, c.z) + "  " + f(12, 4, c.t) + "\n")
          }
        }
      }
    }
    0
  }
}
