package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord

/** Systematic sweep of the generated coordinate-operation sidecar: a
  * deterministic sample of gridless operations (Helmert families, offsets,
  * similarity/affine/rotation methods) across every emitted authority is
  * instantiated through the factory and driven forward+inverse through its
  * own kernel pair at the center of its area of use. Catches parameter
  * normalization, domain wiring, and direction bugs database-wide — e.g.
  * a concatenated operation whose inferred step direction is flipped would
  * fail its round-trip by the full shift.
  */
class OpDbRoundTripSpec extends AnyFunSuite {

  test("sampled gridless operations round-trip through their own kernels") {
    val db = EpsgDb.db
    val eligible = db.ops.filter { o =>
      (o.kind == 'H' || o.kind == 'O') && !o.deprecated &&
        o.bbox.isDefined &&
        db.geodetic.contains(o.srcCrs) && db.geodetic.contains(o.dstCrs)
    }
    // deterministic spread across the table (every 15th by code order)
    val sample = eligible.sortBy(_.code).zipWithIndex
      .collect { case (o, i) if i % 15 == 0 => o }

    var checked = 0
    val failures = Seq.newBuilder[String]
    for (op <- sample) {
      OpFactory.operationByName(op.name) match {
        case Some(c) if c.instantiable && c.pj.isRight =>
          val pj = c.pj.toOption.get
          val bb = op.bbox.get
          val lon = math.toRadians((bb.west + bb.east) / 2)
          val lat = math.toRadians((bb.south + bb.north) / 2)
          val src = db.geodetic(op.srcCrs)
          val geocentric = src.kind == EpsgDb.Geocentric
          val co = new Coord
          if (geocentric) {
            // a plausible surface point on the source ellipsoid
            val a = src.a
            co.set(a * math.cos(lat) * math.cos(lon),
              a * math.cos(lat) * math.sin(lon), a * math.sin(lat), 2015.0)
          } else co.set(lon, lat, 50.0, 2015.0)
          val x0 = co.x; val y0 = co.y; val z0 = co.z
          Dispatch.fwd4d(pj, co)
          if (!co.isError) {
            Dispatch.inv4d(pj, co)
            val (dx, dy) = (co.x - x0, co.y - y0)
            // the geog2D-domain Helmert methods (EPSG 9603/9606/9607) are
            // not exactly self-inverse by definition (the height is pushed
            // and popped around the geocentric leg): the asymmetry is
            // second-order in the op's total distortion delta (rotations +
            // scale + shift/R). 0.05 m + 4*delta^2*R covers even the huge
            // legacy island fits (REUN47: 77" rotation, -32 ppm) while
            // staying far below the full-shift error of a direction flip
            val x = op.extras
            def p(k: String) = math.abs(x.getOrElse(k, "0").toDouble)
            val delta = (p("rx") + p("ry") + p("rz")) * math.Pi / 648000 +
              p("s") * 1e-6 + (p("x") + p("y") + p("z")) / 6.4e6
            val tol = 0.05 + 4 * delta * delta * 6.4e6
            val scale = if (geocentric) 1.0 else 6.4e6
            if (co.isError || math.abs(dx) * scale > tol ||
                math.abs(dy) * scale > tol || math.abs(co.z - z0) > tol)
              failures += s"${op.code} ${op.name}: err=${co.isError} " +
                f"dx=${dx * scale}%.2e dy=${dy * scale}%.2e dz=${co.z - z0}%.2e"
            else checked += 1
          }
        case _ => () // grid-backed alias, unsupported method, or vertical end
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty, s"${bad.size} round-trip failures:\n" + bad.take(12).mkString("\n"))
    assert(checked > 100, s"only $checked operations exercised — sample too thin")
  }
}
