package graft.cli

/** The `gie` command-line front-end (reference src/apps/gie.cpp argument
  * surface over the engine's GieRunner). The corpus exercises the argument
  * handling (--version/-h/unknown options/missing files, exact optargpm.h
  * messages); real files run through graft.gie.GieRunner, the same runner
  * GieCorpusSpec drives over the full gie+GIGS corpus.
  */
object CliGie {
  private val delim = "-" * 79 + "\n"
  private val knownLong = Set("version", "help", "verbose", "quiet", "list")
  private val knownShort = Set('h', 'v', 'q', 'l')

  def run(args: Seq[String], stdin: String, progName: String = "gie",
          files: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    var verbose = false
    val fargs = scala.collection.mutable.ArrayBuffer.empty[String]
    for (arg <- args) {
      if (arg.startsWith("--")) {
        val name = arg.substring(2).takeWhile(_ != '=')
        if (name == "version") {
          io.out("gie: Rel. graft (reference-parity build)\n")
          return CliResult(io.stdout, io.stderr, io.combined, 0)
        } else if (name == "help") {
          io.out("Usage: gie [-options]... infile...\n")
          return CliResult(io.stdout, io.stderr, io.combined, 0)
        } else if (!knownLong(name)) {
          io.err(s"""Invalid option "$name"\n""")
          return CliResult(io.stdout, io.stderr, io.combined, 1)
        } else if (name == "verbose") verbose = true
      } else if (arg.length > 1 && arg.charAt(0) == '-') {
        for (c <- arg.substring(1)) {
          if (c == 'h') {
            io.out("Usage: gie [-options]... infile...\n")
            return CliResult(io.stdout, io.stderr, io.combined, 0)
          } else if (!knownShort(c)) {
            io.err(s"""Invalid option "$c"\n""")
            return CliResult(io.stdout, io.stderr, io.combined, 1)
          } else if (c == 'v') verbose = true
        }
      } else fargs += arg
    }

    var ok = 0L
    var ko = 0L
    for (f <- fargs) {
      val path: Option[String] =
        if (files.contains(f)) {
          val tmp = java.nio.file.Files.createTempFile("gie", ".gie")
          java.nio.file.Files.writeString(tmp, files(f))
          Some(tmp.toString)
        } else if (java.nio.file.Files.isReadable(java.nio.file.Paths.get(f)))
          Some(f)
        else None
      path match {
        case None =>
          io.err(s"${delim}Cannot open specified input file '$f' - bye!\n")
          return CliResult(io.stdout, io.stderr, io.combined, 1)
        case Some(p) =>
          val stats = graft.gie.GieRunner.runFile(p)
          ok += stats.ok
          ko += stats.ko
          if (verbose)
            stats.failures.foreach(fl => io.out(s"${fl.file}:${fl.lineno} ${fl.msg}\n"))
      }
    }
    if (fargs.nonEmpty)
      io.out(s"${delim}total: $ok tests succeeded, $ko tests skipped or failed\n")
    CliResult(io.stdout, io.stderr, io.combined, if (ko > 0) 1 else 0)
  }
}
