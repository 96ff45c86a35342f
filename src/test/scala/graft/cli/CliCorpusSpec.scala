package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import CliHarness._

/** Replays the reference's CLI expectation corpus (test/cli yaml files) against
  * the graft CLI apps — every expected stdout byte is the reference's own,
  * so each green test is a hard cross-implementation check (DMS parsing,
  * projection math, C-printf formatting, rtodms trimming).
  *
  * Tests that need reference components deliberately out of scope (the
  * iso19111 database for compound CRSs / CRS names, binary I/O) are skipped
  * with pinned reasons; pass counts are pinned per fixture so a regression
  * or a silently-shrinking corpus fails loudly.
  */
class CliCorpusSpec extends AnyFunSuite {

  private def projApp(prog: String)(args: Seq[String], stdin: String): CliResult =
    CliProj.run(args, stdin, prog)

  /** run a fixture; returns (passes, fails-with-messages, skips). */
  private def replay(name: String, app: (Seq[String], String) => CliResult,
                     skips: Map[Int, String]): (Int, List[String], Int) = {
    val fx = load(name)
    var pass = 0
    var skip = 0
    val fails = List.newBuilder[String]
    for (t <- fx.tests) {
      skips.get(t.index) match {
        case Some(_) => skip += 1
        case None =>
          evaluate(t, app) match {
            case Pass => pass += 1
            case Fail(d) =>
              fails += s"#${t.index} ${t.comment} args=${t.args.mkString(" ")}\n$d"
            case Skip(_) => skip += 1
          }
      }
    }
    (pass, fails.result(), skip)
  }

  private def check(name: String, app: (Seq[String], String) => CliResult,
                    expectedPass: Int, skips: Map[Int, String]): Unit = {
    val (pass, fails, skip) = replay(name, app, skips)
    assert(fails.isEmpty, s"\n$name failures (${fails.size}):\n" +
      fails.take(8).mkString("\n---\n"))
    assert(pass == expectedPass, s"$name: pass=$pass expected=$expectedPass skip=$skip")
    assert(skip == skips.size)
  }

  test("test_proj: basic proj command expectations") {
    check("test_proj", projApp("proj"), expectedPass = 3, skips = Map(
      3 -> "EPSG:5972 is a compound CRS — iso19111 database out of scope"))
  }

  test("test_invproj: basic invproj expectations") {
    check("test_invproj", projApp("invproj"), expectedPass = 1, skips = Map.empty)
  }

  test("test_proj_nad27: SPCS zones on NAD27 (test27 corpus)") {
    check("test_proj_nad27", projApp("proj"), expectedPass = 265, skips = Map.empty)
  }

  test("test_proj_nad83: SPCS zones on NAD83 (test83 corpus)") {
    check("test_proj_nad83", projApp("proj"), expectedPass = 225, skips = Map.empty)
  }
}
