package graft.cli

import CliHarness._

/** Iteration harness: replays test_projinfo fixtures through CliProjinfo
  * and prints per-test diffs. Usage (sbt): Test/runMain
  * graft.cli.ProjinfoReplay [indices...|all]. */
object ProjinfoReplay {
  def main(argv: Array[String]): Unit = {
    val fx = load("test_projinfo")
    val want: Int => Boolean =
      if (argv.isEmpty || argv(0) == "all") _ => true
      else { val s = argv.map(_.toInt).toSet; s.contains }
    var pass = 0; var fail = 0
    val log = new java.io.PrintWriter("/tmp/projinfo_replay.txt")
    val passed = Vector.newBuilder[Int]
    for (t <- fx.tests if want(t.index)) {
      val app = (args: Seq[String], stdin: String, files: Map[String, String],
                 env: Map[String, String]) =>
        CliProjinfo.run(args, stdin, "projinfo", files, fx.env ++ env)
      if (argv.length == 1 && argv(0) != "all") {
        // single-index mode: dump raw actual output for inspection
        val r = CliProjinfo.run(t.args, "", "projinfo", Map.empty, fx.env ++ t.env)
        val w = new java.io.PrintWriter("/tmp/projinfo_actual.txt")
        w.print(r.combined); w.close()
        val w2 = new java.io.PrintWriter("/tmp/projinfo_expected.txt")
        w2.print(t.out.orElse(t.stdout).getOrElse("")); w2.close()
      }
      evaluate(t, app) match {
        case Pass => pass += 1; passed += t.index
          log.println(s"#${t.index} PASS")
        case Fail(d) =>
          fail += 1
          log.println(s"#${t.index} FAIL args=${t.args.mkString(" ")}")
          log.println(d)
        case Skip(r) => log.println(s"#${t.index} SKIP $r")
      }
    }
    log.println(s"pass=$pass fail=$fail")
    log.println("passed: " + passed.result().mkString(","))
    log.close()
    println(s"pass=$pass fail=$fail (details: /tmp/projinfo_replay.txt)")
  }
}
