package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.gie.GieRunner

/** Runs every reference gie file the engine supports and requires a clean
  * sweep — the library-level correctness gate (the per-file totals are the
  * same ones GieRunner's main reports). */
class GieCorpusSpec extends AnyFunSuite {

  private val files = Seq(
    "builtins" -> 2544, "more_builtins" -> 183, "gridshift" -> 59,
    "geotiff_grids" -> 51, "tinshift" -> 15, "tinshift_gpkg" -> 14,
    "epsg_no_grid" -> 6,
    "defmodel" -> 34,
    "deformation" -> 43, "DHDN_ETRS89" -> 64, "GDA" -> 3,
    "4D-API_cs2cs-style" -> 78, "ellipsoid" -> 37, "axisswap" -> 27,
    "unitconvert" -> 16, "adams_hemi" -> 703, "adams_ws1" -> 703,
    "adams_ws2" -> 722, "guyou" -> 705, "peirce_q" -> 592, "spilhaus" -> 133)

  for ((name, expectedOk) <- files) {
    test(s"$name.gie passes completely ($expectedOk asserts)") {
      val stats = GieRunner.runFile(s"/root/reference/test/gie/$name.gie")
      val detail = stats.failures.take(3)
        .map(f => s"${f.file}:${f.lineno} ${f.msg.take(80)}").mkString("; ")
      assert(stats.ko == 0, s"failures: $detail")
      assert(stats.ok == expectedOk,
        s"assert count drifted: got ${stats.ok}, expected $expectedOk")
    }
  }
}
