package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Pseudocylindrical world projections, part 1: Mollweide family, sinusoidal
  * family, Eckert IV/VI, Equal Earth. Math per reference
  * src/projections/{moll,gn_sinu,eck4,eqearth}.cpp (Snyder 1987; Šavrič
  * et al. 2019 for Equal Earth). All spherical forms ignore es like the
  * reference (P->es = 0 in their setups).
  */
object PseudoCylOps {
  private final val EPS10 = 1e-10

  // ---------------- moll family ----------------

  private def mollKernel(P: PJ, cx: Double, cy: Double, cp: Double): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        var phi = c.y
        val k = cp * math.sin(phi)
        var i = 30
        var conv = false
        while (i > 0 && !conv) {
          val v = (phi + math.sin(phi) - k) / (1 + math.cos(phi))
          phi -= v
          if (math.abs(v) < 1e-7) conv = true
          i -= 1
        }
        phi = if (!conv) { if (phi < 0) -HALFPI else HALFPI } else phi * 0.5
        c.x = cx * c.x * math.cos(phi)
        c.y = cy * math.sin(phi)
      }
      override def inv2(c: Coord): Unit = {
        var phi = aasin(c, c.y / cy)
        val lam = c.x / (cx * math.cos(phi))
        if (math.abs(lam) < math.Pi) {
          phi += phi
          c.y = aasin(c, (phi + math.sin(phi)) / cp)
          c.x = lam
        } else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
      }
    }
  }

  private def mollSetup(P: PJ, p: Double): Unit = {
    val sp = math.sin(p)
    val p2 = p + p
    val r = math.sqrt(TWOPI * sp / (p2 + math.sin(p2)))
    mollKernel(P, 2 * r / math.Pi, r / sp, p2 + math.sin(p2))
  }

  def moll(P: PJ): Unit = mollSetup(P, HALFPI)
  def wag4(P: PJ): Unit = mollSetup(P, math.Pi / 3)
  def wag5(P: PJ): Unit = mollKernel(P, 0.90977, 1.65014, 3.00896)

  // ---------------- sinusoidal family ----------------

  private def gnSinuKernel(P: PJ, m: Double, n: Double): Unit = {
    val cy = math.sqrt((m + 1) / n)
    val cx = cy / (m + 1)
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        var phi = c.y
        if (m == 0.0) phi = if (n != 1) aasin(c, n * math.sin(phi)) else phi
        else {
          val k = n * math.sin(phi)
          var i = 8
          var conv = false
          while (i > 0 && !conv) {
            val v = (m * phi + math.sin(phi) - k) / (m + math.cos(phi))
            phi -= v
            if (math.abs(v) < 1e-7) conv = true
            i -= 1
          }
          if (!conv) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        }
        c.x = cx * c.x * (m + math.cos(phi))
        c.y = cy * phi
      }
      override def inv2(c: Coord): Unit = {
        val y = c.y / cy
        val phi =
          if (m != 0.0) aasin(c, (m * y + math.sin(y)) / n)
          else if (n != 1) aasin(c, math.sin(y) / n)
          else y
        c.x = c.x / (cx * (m + math.cos(y)))
        c.y = phi
      }
    }
  }

  def sinu(P: PJ): Unit = {
    if (P.es != 0) {
      val en = enfn(P.n)
      val es = P.es
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val s = math.sin(c.y); val cc = math.cos(c.y)
          val y = mlfn(c.y, s, cc, en)
          c.x = c.x * cc / math.sqrt(1 - es * s * s)
          c.y = y
        }
        override def inv2(c: Coord): Unit = {
          val phi = invMlfn(c.y, en)
          val s0 = math.abs(phi)
          if (s0 < HALFPI) {
            val s = math.sin(phi)
            c.x = c.x * math.sqrt(1 - es * s * s) / math.cos(phi)
            c.y = phi
          } else if (s0 - EPS10 < HALFPI) { c.x = 0; c.y = phi }
          else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }
    } else gnSinuKernel(P, 0.0, 1.0)
  }

  def eck6(P: PJ): Unit = gnSinuKernel(P, 1.0, 2.570796326794896619231321691)
  def mbtfps(P: PJ): Unit = gnSinuKernel(P, 0.5, 1.785398163397448309615660845)

  def gnSinu(P: PJ): Unit = {
    if (!P.params.has("n"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "gn_sinu: missing parameter n")
    if (!P.params.has("m"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "gn_sinu: missing parameter m")
    val n = P.params.d("n")
    val m = P.params.d("m")
    if (n <= 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "gn_sinu: n should be > 0")
    if (m < 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "gn_sinu: m should be >= 0")
    gnSinuKernel(P, m, n)
  }

  // ---------------- eck4 ----------------

  def eck4(P: PJ): Unit = {
    val CX = 0.42223820031577120149
    val CY = 1.32650042817700232218
    val RCY = 0.75386330736002178205
    val CP = 3.57079632679489661922
    val RCP = 0.28004957675577868795
    val over = P.over
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val p = CP * math.sin(c.y)
        var v = c.y * c.y
        var theta = c.y * (0.895168 + v * (0.0218849 + v * 0.00826809))
        var i = 6
        var conv = false
        while (i > 0 && !conv) {
          val cc = math.cos(theta); val s = math.sin(theta)
          v = (theta + s * (cc + 2) - p) / (1 + cc * (cc + 2) - s * s)
          theta -= v
          if (math.abs(v) < 1e-7) conv = true
          i -= 1
        }
        if (!conv) {
          c.x = CX * c.x
          c.y = if (theta < 0) -CY else CY
        } else {
          c.x = CX * c.x * (1 + math.cos(theta))
          c.y = CY * math.sin(theta)
        }
      }
      override def inv2(c: Coord): Unit = {
        val sinTheta = c.y * RCY
        val oneMinusAbs = 1.0 - math.abs(sinTheta)
        var lam = 0.0; var phi = 0.0
        if (oneMinusAbs >= 0.0 && oneMinusAbs <= 1e-12) {
          lam = c.x / CX
          phi = if (sinTheta > 0) HALFPI else -HALFPI
        } else {
          val theta = aasin(c, sinTheta)
          val cosTheta = math.cos(theta)
          lam = c.x / (CX * (1 + cosTheta))
          phi = aasin(c, (theta + sinTheta * (cosTheta + 2)) * RCP)
        }
        if (!over) {
          val d = math.abs(lam) - math.Pi
          if (d > 0) {
            if (d > 1e-10) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            lam = if (lam > 0) math.Pi else -math.Pi
          }
        }
        c.x = lam; c.y = phi
      }
    }
  }

  // ---------------- eqearth ----------------

  def eqearth(P: PJ): Unit = {
    val A1 = 1.340264; val A2 = -0.081106; val A3 = 0.000893; val A4 = 0.003796
    val M = math.sqrt(3.0) / 2.0
    val MAX_Y = 1.3173627591574
    val es = P.es
    val auth = if (es != 0) new Authalic(P.e, P.es, P.oneEs, P.n) else null
    val qp = if (auth != null) auth.qp else 0.0
    val rqda = if (es != 0) math.sqrt(0.5 * qp) else 1.0
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        var sbeta = math.sin(c.y)
        if (es != 0) {
          sbeta = auth.q(sbeta) / qp
          if (math.abs(sbeta) > 1) sbeta = if (sbeta > 0) 1 else -1
        }
        val psi = math.asin(M * sbeta)
        val psi2 = psi * psi
        val psi6 = psi2 * psi2 * psi2
        c.x = c.x * math.cos(psi) /
          (M * (A1 + 3 * A2 * psi2 + psi6 * (7 * A3 + 9 * A4 * psi2))) * rqda
        c.y = psi * (A1 + A2 * psi2 + psi6 * (A3 + A4 * psi2)) * rqda
      }
      override def inv2(c: Coord): Unit = {
        val x = c.x / rqda
        var y = c.y / rqda
        if (y > MAX_Y) y = MAX_Y else if (y < -MAX_Y) y = -MAX_Y
        var yc = y
        var i = 12
        var conv = false
        while (i > 0 && !conv) {
          val y2 = yc * yc
          val y6 = y2 * y2 * y2
          val f = yc * (A1 + A2 * y2 + y6 * (A3 + A4 * y2)) - y
          val fder = A1 + 3 * A2 * y2 + y6 * (7 * A3 + 9 * A4 * y2)
          val tol = f / fder
          yc -= tol
          if (math.abs(tol) < 1e-11) conv = true
          i -= 1
        }
        if (!conv) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val y2 = yc * yc
        val y6 = y2 * y2 * y2
        c.x = M * x * (A1 + 3 * A2 * y2 + y6 * (7 * A3 + 9 * A4 * y2)) / math.cos(yc)
        // the pole is catastrophically sensitive to the last ulp of y:
        // treat ratios within 1e-12 of 1 as the pole (sub-cm effect)
        val ratio = math.sin(yc) / M
        var phi =
          if (ratio >= 1 - 1e-12) HALFPI
          else if (ratio <= -(1 - 1e-12)) -HALFPI
          else math.asin(ratio)
        if (es != 0) phi = auth.latInverse(phi)
        c.y = phi
      }
    }
  }
}
