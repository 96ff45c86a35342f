package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** (r)HEALPix equal-area projections (Calabretta & Roukema 2007; rHEALPix
  * per Gibb et al.). Math per reference src/projections/healpix.cpp. */
object HealpixOps {
  private final val EPS = 1e-15

  // rotation matrices: IDENT, R1 (ccw 90), R2 (180), R3 (270), R3, R2, R1
  private val rotM: Array[Array[Double]] = Array(
    Array(1, 0, 0, 1), Array(0, -1, 1, 0), Array(-1, 0, 0, -1), Array(0, 1, -1, 0),
    Array(0, 1, -1, 0), Array(-1, 0, 0, -1), Array(0, -1, 1, 0))

  private def rotIndex(i: Int): Int = i match {
    case 0 => 0; case 1 => 1; case 2 => 2; case 3 => 3
    case -1 => 4; case -2 => 5; case -3 => 6; case _ => 0
  }

  @inline private def sign(v: Double): Double = if (v > 0) 1 else if (v < 0) -1 else 0

  private def healpixSphere(lam: Double, phi: Double): (Double, Double) = {
    val phi0 = math.asin(2.0 / 3.0)
    if (math.abs(phi) <= phi0)
      (lam, 3 * math.Pi / 8 * math.sin(phi))
    else {
      val sigma = math.sqrt(3 * (1 - math.abs(math.sin(phi))))
      var cn = math.floor(2 * lam / math.Pi + 2)
      if (cn >= 4) cn = 3
      val lamc = -3 * QUARTERPI + HALFPI * cn
      (lamc + (lam - lamc) * sigma, sign(phi) * QUARTERPI * (2 - sigma))
    }
  }

  private def healpixSphereInv(x: Double, y: Double): (Double, Double) = {
    val y0 = QUARTERPI
    if (math.abs(y) <= y0)
      (x, math.asin(8 * y / (3 * math.Pi)))
    else if (math.abs(y) < HALFPI) {
      var cn = math.floor(2 * x / math.Pi + 2)
      if (cn >= 4) cn = 3
      val xc = -3 * QUARTERPI + HALFPI * cn
      val tau = 2.0 - 4 * math.abs(y) / math.Pi
      (xc + (x - xc) / tau, sign(y) * math.asin(1.0 - tau * tau / 3.0))
    } else (-math.Pi, sign(y) * HALFPI)
  }

  /** even-odd test with the reference's pnpoly boundary handling. */
  private def pnpoly(vert: Array[(Double, Double)], tx: Double, ty: Double): Boolean = {
    if (vert.exists(v => tx == v._1 && ty == v._2)) return true
    var counter = 0
    var p1 = vert(0)
    var i = 1
    while (i < vert.length) {
      val p2 = vert(i % vert.length)
      if (ty > math.min(p1._2, p2._2) && ty <= math.max(p1._2, p2._2) &&
          tx <= math.max(p1._1, p2._1) && p1._2 != p2._2) {
        val xinters = (ty - p1._2) * (p2._1 - p1._1) / (p2._2 - p1._2) + p1._1
        if (p1._1 == p2._1 || tx <= xinters) counter += 1
      }
      p1 = p2
      i += 1
    }
    counter % 2 == 1
  }

  private def inImageHealpix(x: Double, y: Double): Boolean = {
    val F = QUARTERPI; val H = HALFPI
    val v = Array(
      (-math.Pi - EPS, F), (-3 * F, H + EPS), (-H, F + EPS), (-F, H + EPS),
      (0.0, F + EPS), (F, H + EPS), (H, F + EPS), (3 * F, H + EPS),
      (math.Pi + EPS, F), (math.Pi + EPS, -F), (3 * F, -H - EPS),
      (H, -F - EPS), (F, -H - EPS), (0.0, -F - EPS), (-F, -H - EPS),
      (-H, -F - EPS), (-3 * F, -H - EPS), (-math.Pi - EPS, -F),
      (-math.Pi - EPS, F))
    pnpoly(v, x, y)
  }

  private def inImageRhealpix(x: Double, y: Double, ns: Int, ss: Int): Boolean = {
    val F = QUARTERPI; val H = HALFPI
    val v = Array(
      (-math.Pi - EPS, F + EPS),
      (-math.Pi + ns * H - EPS, F + EPS),
      (-math.Pi + ns * H - EPS, 3 * F + EPS),
      (-math.Pi + (ns + 1.0) * H + EPS, 3 * F + EPS),
      (-math.Pi + (ns + 1.0) * H + EPS, F + EPS),
      (math.Pi + EPS, F + EPS),
      (math.Pi + EPS, -F - EPS),
      (-math.Pi + (ss + 1.0) * H + EPS, -F - EPS),
      (-math.Pi + (ss + 1.0) * H + EPS, -3 * F - EPS),
      (-math.Pi + ss * H - EPS, -3 * F - EPS),
      (-math.Pi + ss * H - EPS, -F - EPS),
      (-math.Pi - EPS, -F - EPS))
    pnpoly(v, x, y)
  }

  /** cap decomposition (reference get_cap): returns (cn, cx, cy, region)
    * with region 0=north 1=south 2=equatorial. */
  private def getCap(x0: Double, y: Double, ns: Int, ss: Int,
                     inverse: Boolean): (Int, Double, Double, Int) = {
    val F = QUARTERPI; val H = HALFPI
    var x = x0
    if (!inverse) {
      if (y > F) {
        val c = H
        val (cn, cx) =
          if (x < -H) (0, -3 * F)
          else if (x < 0) (1, -F)
          else if (x < H) (2, F)
          else (3, 3 * F)
        (cn, cx, c, 0)
      } else if (y < -F) {
        val c = -H
        val (cn, cx) =
          if (x < -H) (0, -3 * F)
          else if (x < 0) (1, -F)
          else if (x < H) (2, F)
          else (3, 3 * F)
        (cn, cx, c, 1)
      } else (0, x, y, 2)
    } else {
      if (y > F) {
        val cx = -3 * F + ns * H
        x = x - ns * H
        val cn =
          if (y >= -x - F - EPS && y < x + 5 * F - EPS) (ns + 1) % 4
          else if (y > -x - F + EPS && y >= x + 5 * F - EPS) (ns + 2) % 4
          else if (y <= -x - F + EPS && y > x + 5 * F + EPS) (ns + 3) % 4
          else ns
        (cn, cx, H, 0)
      } else if (y < -F) {
        val cx = -3 * F + ss * H
        x = x - ss * H
        val cn =
          if (y <= x + F + EPS && y > -x - 5 * F + EPS) (ss + 1) % 4
          else if (y < x + F - EPS && y <= -x - 5 * F + EPS) (ss + 2) % 4
          else if (y >= x + F - EPS && y < -x - 5 * F - EPS) (ss + 3) % 4
          else ss
        (cn, cx, -H, 1)
      } else (0, x0, y, 2)
    }
  }

  /** combine/uncombine polar caps (reference combine_caps). */
  private def combineCaps(x: Double, y: Double, ns: Int, ss: Int,
                          inverse: Boolean): (Double, Double) = {
    val F = QUARTERPI; val H = HALFPI
    val (cn, cx, cy, region) = getCap(x, y, ns, ss, inverse)
    if (region == 2) return (cx, cy)
    val pole = if (region == 0) ns else ss
    val m =
      if (!inverse) {
        if (region == 0) rotM(rotIndex(cn - pole))
        else rotM(rotIndex(-(cn - pole)))
      } else {
        if (region == 0) rotM(rotIndex(-(cn - pole)))
        else rotM(rotIndex(cn - pole))
      }
    val vx = x - cx; val vy = y - cy
    val rx = m(0) * vx + m(1) * vy
    val ry = m(2) * vx + m(3) * vy
    val ax = -3 * F + (if (!inverse) pole else cn) * H
    val ay = (if (region == 0) 1 else -1) * H
    (rx + ax, ry + ay)
  }

  // -------------------------------------------------- setups

  def healpix(P: PJ): Unit = {
    val rotXy = P.params.d("rot_xy") * DEG2RAD
    val es = P.es
    val auth = if (es != 0) new Authalic(P.e, P.es, P.oneEs, P.n) else null
    if (es != 0) {
      P.a = P.a * math.sqrt(0.5 * auth.qp)
      P.calcEllipsoidParams(P.a, P.es)
    }
    def rot(x: Double, y: Double, angle: Double): (Double, Double) =
      (x * math.cos(angle) - y * math.sin(angle),
        y * math.cos(angle) + x * math.sin(angle))
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val phi = if (es != 0) auth.lat(c.y, math.sin(c.y), math.cos(c.y)) else c.y
        val (hx, hy) = healpixSphere(c.x, phi)
        val (x, y) = rot(hx, hy, -rotXy)
        c.x = x; c.y = y
      }
      override def inv2(c: Coord): Unit = {
        val (x, y) = rot(c.x, c.y, rotXy)
        if (!inImageHealpix(x, y)) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val (lam, phi) = healpixSphereInv(x, y)
        c.x = lam
        c.y = if (es != 0) auth.latInverse(phi) else phi
      }
    }
  }

  def rhealpix(P: PJ): Unit = {
    val ns = P.params.i("north_square")
    val ss = P.params.i("south_square")
    if (ns < 0 || ns > 3)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "rhealpix: north_square should be in [0,3]")
    if (ss < 0 || ss > 3)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "rhealpix: south_square should be in [0,3]")
    val es = P.es
    val auth = if (es != 0) new Authalic(P.e, P.es, P.oneEs, P.n) else null
    if (es != 0) {
      P.a = P.a * math.sqrt(0.5 * auth.qp)
      P.ra = 1.0 / P.a
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val phi = if (es != 0) auth.lat(c.y, math.sin(c.y), math.cos(c.y)) else c.y
        val (hx, hy) = healpixSphere(c.x, phi)
        val (x, y) = combineCaps(hx, hy, ns, ss, inverse = false)
        c.x = x; c.y = y
      }
      override def inv2(c: Coord): Unit = {
        if (!inImageRhealpix(c.x, c.y, ns, ss)) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val (hx, hy) = combineCaps(c.x, c.y, ns, ss, inverse = true)
        val (lam, phi) = healpixSphereInv(hx, hy)
        c.x = lam
        c.y = if (es != 0) auth.latInverse(phi) else phi
      }
    }
  }
}
