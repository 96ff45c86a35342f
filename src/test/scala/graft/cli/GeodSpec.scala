package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** The geod/invgeod filter, pinned against the reference's own documented
  * examples (docs/source/apps/geod.rst — Boston to Portland on clrk66 in
  * US statute miles, both directions, byte-for-byte) plus decimal output
  * and the +lat_1 intermediate-point mode. */
class GeodSpec extends AnyFunSuite {

  private def run(prog: String, args: String*)(stdin: String): CliResult =
    CliGeod.run(args.toSeq, stdin, prog, Map.empty)

  test("inverse: Boston to Portland azimuths + distance (doc example)") {
    val r = run("geod", "+ellps=clrk66", "-I", "+units=us-mi")(
      "42d15'N 71d07'W 45d31'N 123d41'W\n")
    assert(r.exit == 0, r.stderr)
    assert(r.stdout == "-66d31'50.141\"\t75d39'13.083\"\t2587.504\n")
  }

  test("forward: Portland from Boston by azimuth + distance (doc example)") {
    val r = run("geod", "+ellps=clrk66", "+units=us-mi")(
      "42d15'N 71d07'W -66d31'50.141\" 2587.504\n")
    assert(r.exit == 0, r.stderr)
    assert(r.stdout == "45d31'0.003\"N\t123d40'59.985\"W\t75d39'13.094\"\n")
  }

  test("invgeod program name implies -I; -f prints decimal degrees") {
    val r = run("invgeod", "+ellps=WGS84", "-f", "%.8f", "-F", "%.3f")(
      "40.6 -73.8 49.01 2.55\n")
    assert(r.exit == 0, r.stderr)
    val cols = r.stdout.trim.split('\t')
    assert(cols.length == 3)
    // the CLI must agree with the corpus-proven Karney kernel exactly
    val g = new graft.core.Geodesic(6378137.0, 1 / 298.257223563)
    val (s12, azi1, _) = g.inverse(40.6, -73.8, 49.01, 2.55)
    assert(math.abs(cols(0).toDouble - azi1) < 5e-9, r.stdout)
    assert(math.abs(cols(2).toDouble - s12) < 1e-3, r.stdout)
  }

  test("-p maps negative azimuths into [0, 360)") {
    val r = run("geod", "+ellps=clrk66", "-I", "-p", "-f", "%.3f")(
      "42d15'N 71d07'W 45d31'N 123d41'W\n")
    val cols = r.stdout.trim.split('\t')
    assert(cols(0).toDouble > 0 && cols(0).toDouble < 360)
    assert(math.abs(cols(0).toDouble - (360.0 - 66.53059472)) < 1e-2)
  }

  test("+lat_1 line mode emits equator intermediate points") {
    val r = run("geod", "+ellps=WGS84", "+lat_1=0", "+lon_1=0",
      "+lat_2=0", "+lon_2=10", "+n_S=2", "-f", "%.6f")("")
    assert(r.exit == 0, r.stderr)
    val lines = r.stdout.trim.split('\n')
    assert(lines.length == 3)
    assert(lines.head == "0.000000\t0.000000")
    assert(lines(1) == "0.000000\t5.000000")
    assert(lines.last == "0.000000\t10.000000")
  }

  test("tag lines are echoed verbatim") {
    val r = run("geod", "+ellps=clrk66", "-I")(
      "# a comment line\n42d15'N 71d07'W 45d31'N 123d41'W\n")
    assert(r.stdout.startsWith("# a comment line\n"))
  }
}
