package graft.cli

/** Command-line entry point for the four reference-compatible tools:
  *
  * {{{
  *   sbt "runMain graft.cli.Main proj -E +proj=utm +zone=32 <<< '12 55'"
  *   sbt "runMain graft.cli.Main cs2cs +proj=latlong +datum=NAD27 +to +proj=latlong +datum=NAD83"
  *   sbt "runMain graft.cli.Main cct -d 8 +proj=merc +R=1"
  * }}}
  *
  * The first argument picks the tool (proj / invproj / cs2cs / inv cs2cs /
  * cct); the rest are that tool's arguments, with stdin/stdout/stderr wired
  * to the process streams and the exit code propagated. The same app
  * objects are driven in-process by CliCorpusSpec against the reference's
  * expectation corpus.
  */
object Main {
  def main(argv: Array[String]): Unit = {
    if (argv.isEmpty) {
      System.err.println("usage: graft.cli.Main {proj|invproj|cs2cs|cct|gie|projinfo|projsync|geod|invgeod} [args...]")
      sys.exit(1)
    }
    val prog = argv.head
    val args = argv.toSeq.tail
    // file operands replace stdin; otherwise read it to EOF (pipe use)
    val fileOperands = args.exists(a =>
      !a.startsWith("+") && !a.startsWith("-") && !a.contains(':') &&
        java.nio.file.Files.isReadable(java.nio.file.Paths.get(a)))
    val stdin =
      if (fileOperands) ""
      else scala.io.Source.fromInputStream(System.in, "UTF-8").mkString
    val res = prog match {
      case "proj" | "invproj" => CliProj.run(args, stdin, prog, diskFiles(args))
      case "cs2cs" | "invcs2cs" => CliCs2cs.run(args, stdin, prog, diskFiles(args))
      case "cct" => CliCct.run(args, stdin, prog, diskFiles(args))
      case "gie" => CliGie.run(args, stdin, prog, diskFiles(args))
      case "projinfo" => CliProjinfo.run(args, stdin, prog, diskFiles(args),
        sys.env)
      case "projsync" => CliProjsync.run(args, stdin, prog, diskFiles(args))
      case "geod" | "invgeod" => CliGeod.run(args, stdin, prog, diskFiles(args))
      case other =>
        System.err.println(s"unknown tool: $other")
        sys.exit(1)
        return
    }
    print(res.stdout)
    System.err.print(res.stderr)
    sys.exit(res.exit)
  }

  /** Resolve file-looking operands from the working directory so the
    * in-process apps (which take a name→content map) can read them. */
  private def diskFiles(args: Seq[String]): Map[String, String] =
    args.filter(a => !a.startsWith("+") && !a.startsWith("-"))
      .flatMap { name =>
        val p = java.nio.file.Paths.get(name)
        if (java.nio.file.Files.isReadable(p))
          Some(name -> new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        else None
      }.toMap
}
