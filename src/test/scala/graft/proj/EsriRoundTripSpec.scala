package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord

/** Round-trip sweep over every ESRI projected CRS the sidecar carries with
  * an inline projection body: forward-project the extent center, invert,
  * and require micro-degree closure. This validates the generator's
  * parameter normalization (units, sexagesimal encodings, method mapping)
  * across the whole authority, not just the EsriSpec anchors. */
class EsriRoundTripSpec extends AnyFunSuite {

  private final class NoInverse extends RuntimeException

  test("ESRI projected bodies round-trip at their extent centers") {
    val db = EpsgDb.db
    var tried = 0
    var noBody = 0
    val failures = Vector.newBuilder[String]
    for ((code, p) <- db.projected if code.startsWith("ESRI:")) {
      OpFactory.projBodyOf(code) match {
        case None => noBody += 1
        case Some(body) =>
          p.bbox.foreach { b =>
            tried += 1
            val lon0 =
              if (b.west <= b.east) (b.west + b.east) / 2
              else ((b.west + b.east + 360) / 2 + 180) % 360 - 180
            val lat0 = (b.south + b.north) / 2
            try {
              // wag7 is forward-only in PROJ (no inverse exists)
              if (body.contains("proj=wag7")) throw new NoInverse
              val pj = Proj.create(body)
              val c = new Coord
              c.set(math.toRadians(lon0), math.toRadians(lat0), 0, 0)
              Dispatch.fwd4d(pj, c)
              if (c.isError) failures += s"$code fwd error"
              else {
                Dispatch.inv4d(pj, c)
                if (c.isError) failures += s"$code inv error"
                else {
                  val dLon0 = math.abs(math.toDegrees(c.x) - lon0)
                  // longitudes compare modulo 360 (a lon_0=180 far-side
                  // CRS legitimately returns +180 for -180)
                  val dLon = math.min(dLon0, 360 - dLon0)
                  val dLat = math.abs(math.toDegrees(c.y) - lat0)
                  if (dLon > 1e-6 || dLat > 1e-6)
                    failures += f"$code closure $dLon%.2e $dLat%.2e"
                }
              }
            } catch {
              case _: NoInverse => tried -= 1
              case e: Exception => failures += s"$code ${e.getMessage}"
            }
          }
      }
    }
    val fails = failures.result()
    info(s"swept $tried ESRI projected bodies ($noBody without inline body)")
    assert(tried > 1500, s"sweep unexpectedly small: $tried")
    assert(fails.isEmpty,
      s"${fails.length} failures, first 10:\n${fails.take(10).mkString("\n")}")
  }
}
