package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord

/** Registry-wide round-trip sweep: every projected CRS that resolves to a
  * projection body (EPSG via the init sidecar; ESRI / IAU_2015 / IGNF via
  * inline bodies) forward-projects its extent center and inverts back to
  * micro-degree closure. This validates the generators' parameter
  * normalization (units, sexagesimal encodings, method mapping, the ESRI
  * negative-scale TMSO remap) across the whole registry, not just the
  * corpus anchors. */
class EsriRoundTripSpec extends AnyFunSuite {

  /** forward-only projections (no inverse exists in the reference either) */
  private val noInverse = Set("wag7", "airocean", "adams_hemi", "adams_ws1",
    "adams_ws2", "guyou", "peirce_q", "nicol", "vandg4", "ortel", "larr",
    "lagrng")

  private def sweep(prefix: String, minCount: Int): Unit = {
    val db = EpsgDb.db
    var tried = 0
    var noBody = 0
    var skippedNoInv = 0
    val failures = Vector.newBuilder[String]
    for ((code, p) <- db.projected if code.startsWith(prefix)) {
      OpFactory.projBodyOf(code) match {
        case None => noBody += 1
        case Some(body) =>
          val projName = body.split("\\s+").head.stripPrefix("proj=")
          if (noInverse.contains(projName)) skippedNoInv += 1
          else p.bbox.foreach { b =>
            tried += 1
            // for world-wide CRSs probe near the projection's own central
            // meridian: the geographic extent center of a lon_0=180 map is
            // the map EDGE, where pseudocylindrical inverses legitimately
            // reject (the reference's do too)
            val bodyLon0 = body.split("\\s+")
              .find(_.startsWith("lon_0=")).map(_.drop(6).toDouble)
            val lon0 =
              if (b.east - b.west > 359)
                ((bodyLon0.getOrElse(0.0) + 30 + 540) % 360) - 180
              else if (b.west <= b.east) (b.west + b.east) / 2
              else ((b.west + b.east + 360) / 2 + 180) % 360 - 180
            val lat0 = (b.south + b.north) / 2
            // transverse-mercator series (order 6 in the third flattening
            // n) lose precision on extremely flattened minor planets and
            // diverge outright past n ~ 0.5 — exactly as the reference's
            // Poder/Engsager coefficients do. Relax, then skip, with f.
            val rf = body.split("\\s+").find(_.startsWith("rf="))
              .map(_.drop(3).toDouble).getOrElse(298.0)
            val isTmerc = body.startsWith("proj=tmerc")
            val tol = if (isTmerc && rf < 50) 1e-3 else 1e-6
            if (isTmerc && rf < 3) tried -= 1
            else try {
              val pj = Proj.create(body)
              val c = new Coord
              c.set(math.toRadians(lon0), math.toRadians(lat0), 0, 0)
              Dispatch.fwd4d(pj, c)
              if (c.isError) failures += s"$code fwd error ($body)"
              else {
                Dispatch.inv4d(pj, c)
                if (c.isError) failures += s"$code inv error ($body)"
                else {
                  val dLon0 = math.abs(math.toDegrees(c.x) - lon0)
                  // longitudes compare modulo 360 (a lon_0=180 far-side
                  // CRS legitimately returns +180 for -180)
                  val dLon = math.min(dLon0, 360 - dLon0)
                  val dLat = math.abs(math.toDegrees(c.y) - lat0)
                  if (dLon > tol || dLat > tol)
                    failures += f"$code closure $dLon%.2e $dLat%.2e ($body)"
                }
              }
            } catch {
              case e: Exception => failures += s"$code ${e.getMessage}"
            }
          }
      }
    }
    val fails = failures.result()
    info(s"$prefix: swept $tried bodies " +
      s"($noBody without body, $skippedNoInv forward-only)")
    assert(tried >= minCount, s"sweep unexpectedly small: $tried")
    assert(fails.isEmpty,
      s"${fails.length} failures, first 10:\n${fails.take(10).mkString("\n")}")
  }

  test("ESRI projected bodies round-trip at their extent centers") {
    sweep("ESRI:", 1500)
  }

  test("IAU_2015 planetary projected bodies round-trip") {
    sweep("IAU_2015:", 1500)
  }

  test("IGNF projected bodies round-trip") {
    sweep("IGNF:", 150)
  }

  test("EPSG projected bodies round-trip") {
    sweep("EPSG:", 5500)
  }
}
