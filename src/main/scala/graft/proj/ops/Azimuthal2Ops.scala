package graft.proj.ops

import graft.core.{Coord, GeoMath, Geodesic, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Stereographic family + azimuthal equidistant.
  * Math per reference src/projections/stere.cpp (Snyder 1987 ch. 21),
  * src/projections/sterea.cpp + src/gauss.cpp (oblique stereographic on the
  * Gaussian sphere), and src/projections/aeqd.cpp (Snyder ch. 25 + Karney
  * geodesics for the ellipsoidal oblique case).
  */
object Azimuthal2Ops {
  private final val EPS10 = 1e-10
  import AzimuthalOps.{N_POLE, S_POLE, EQUIT, OBLIQ}

  private def ssfn(phit: Double, sinphi0: Double, e: Double): Double = {
    val sinphi = sinphi0 * e
    math.tan(0.5 * (HALFPI + phit)) *
      math.pow((1 - sinphi) / (1 + sinphi), 0.5 * e)
  }

  // -------------------------------------------------- stere / ups

  private def stereSetup(P: PJ, phits0: Double): Unit = {
    val TOL = 1e-8; val NITER = 8; val CONV = 1e-10
    val phi0 = P.phi0
    val t0 = math.abs(phi0)
    val mode =
      if (math.abs(t0 - HALFPI) < EPS10) { if (phi0 < 0) S_POLE else N_POLE }
      else if (t0 > EPS10) OBLIQ else EQUIT
    val phits = math.abs(phits0)
    val es = P.es; val e = P.e; val k0v = P.k0

    if (es != 0) {
      var akm1 = 0.0; var sinX1 = 0.0; var cosX1 = 0.0
      mode match {
        case N_POLE | S_POLE =>
          if (math.abs(phits - HALFPI) < EPS10)
            akm1 = 2 * k0v / math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
          else {
            val t = math.sin(phits)
            akm1 = math.cos(phits) / tsfn(phits, t, e)
            val te = t * e
            akm1 /= math.sqrt(1 - te * te)
          }
        case _ =>
          val t = math.sin(phi0)
          val x = 2 * math.atan(ssfn(phi0, t, e)) - HALFPI
          val te = t * e
          akm1 = 2 * k0v * math.cos(phi0) / math.sqrt(1 - te * te)
          sinX1 = math.sin(x); cosX1 = math.cos(x)
      }
      val (ak, sX, cX) = (akm1, sinX1, cosX1)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          var phi = c.y
          val lam = c.x
          var coslam = math.cos(lam)
          val sinlam = math.sin(lam)
          var sinphi = math.sin(phi)
          var x = 0.0; var y = 0.0
          if (mode == OBLIQ || mode == EQUIT) {
            val xAng = 2 * math.atan(ssfn(phi, sinphi, e)) - HALFPI
            val sinX = math.sin(xAng); val cosX = math.cos(xAng)
            if (mode == OBLIQ) {
              val denom = cX * (1 + sX * sinX + cX * cosX * coslam)
              if (denom == 0) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              val aa = ak / denom
              y = aa * (cX * sinX - sX * cosX * coslam)
              x = aa * cosX
            } else {
              if (1 + cosX * coslam == 0.0) { y = Double.PositiveInfinity }
              else {
                val aa = ak / (1 + cosX * coslam)
                y = aa * sinX
                x = aa * cosX
              }
            }
          } else {
            if (mode == S_POLE) { phi = -phi; coslam = -coslam; sinphi = -sinphi }
            x = if (math.abs(phi - HALFPI) < 1e-15) 0.0 else ak * tsfn(phi, sinphi, e)
            y = -x * coslam
          }
          c.x = x * sinlam
          c.y = y
        }
        override def inv2(c: Coord): Unit = {
          var x = c.x; var y = c.y
          val rho = math.hypot(x, y)
          var tp = 0.0; var phiL = 0.0; var halfe = 0.0; var halfpi = 0.0
          if (mode == OBLIQ || mode == EQUIT) {
            tp = 2 * math.atan2(rho * cX, ak)
            val cosphi = math.cos(tp); val sinphi = math.sin(tp)
            phiL = if (rho == 0.0) math.asin(cosphi * sX)
                   else math.asin(cosphi * sX + (y * sinphi * cX / rho))
            tp = math.tan(0.5 * (HALFPI + phiL))
            x *= sinphi
            y = rho * cX * cosphi - y * sX * sinphi
            halfpi = HALFPI; halfe = 0.5 * e
          } else {
            if (mode == N_POLE) y = -y
            tp = -rho / ak
            phiL = HALFPI - 2 * math.atan(tp)
            halfpi = -HALFPI; halfe = -0.5 * e
          }
          var i = NITER
          while (i > 0) {
            val sinphi = e * math.sin(phiL)
            val phi = 2 * math.atan(tp * math.pow((1 + sinphi) / (1 - sinphi), halfe)) - halfpi
            if (math.abs(phiL - phi) < CONV) {
              c.y = if (mode == S_POLE) -phi else phi
              c.x = if (x == 0 && y == 0) 0.0 else math.atan2(x, y)
              return
            }
            phiL = phi
            i -= 1
          }
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }
    } else {
      val sinph0 = math.sin(phi0); val cosph0 = math.cos(phi0)
      val akm1 = mode match {
        case OBLIQ | EQUIT => 2 * k0v
        case _ =>
          if (math.abs(phits - HALFPI) >= EPS10)
            math.cos(phits) / math.tan(QUARTERPI - 0.5 * phits)
          else 2 * k0v
      }
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          var phi = c.y
          val sinphi = math.sin(phi); val cosphi = math.cos(phi)
          var coslam = math.cos(c.x); val sinlam = math.sin(c.x)
          mode match {
            case EQUIT | OBLIQ =>
              var y = if (mode == EQUIT) 1 + cosphi * coslam
                      else 1 + sinph0 * sinphi + cosph0 * cosphi * coslam
              if (y <= EPS10) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              y = akm1 / y
              c.x = y * cosphi * sinlam
              c.y = y * (if (mode == EQUIT) sinphi
                         else cosph0 * sinphi - sinph0 * cosphi * coslam)
            case m =>
              if (m == N_POLE) { coslam = -coslam; phi = -phi }
              if (math.abs(phi - HALFPI) < 1e-8) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              val y = akm1 * math.tan(QUARTERPI + 0.5 * phi)
              c.x = sinlam * y
              c.y = y * coslam
          }
        }
        override def inv2(c: Coord): Unit = {
          var x = c.x; var y = c.y
          val rh = math.hypot(x, y)
          val cc = 2 * math.atan(rh / akm1)
          val sinc = math.sin(cc); val cosc = math.cos(cc)
          var lam = 0.0; var phi = 0.0
          mode match {
            case EQUIT =>
              phi = if (math.abs(rh) <= EPS10) 0.0 else math.asin(y * sinc / rh)
              if (cosc != 0 || x != 0) lam = math.atan2(x * sinc, cosc * rh)
            case OBLIQ =>
              phi = if (math.abs(rh) <= EPS10) phi0
                    else math.asin(cosc * sinph0 + y * sinc * cosph0 / rh)
              val ccc = cosc - sinph0 * math.sin(phi)
              if (ccc != 0 || x != 0) lam = math.atan2(x * sinc * cosph0, ccc * rh)
            case m =>
              if (m == N_POLE) y = -y
              phi = if (math.abs(rh) <= EPS10) phi0
                    else math.asin(if (m == S_POLE) -cosc else cosc)
              lam = if (x == 0 && y == 0) 0.0 else math.atan2(x, y)
          }
          c.x = lam; c.y = phi
        }
      }
    }
  }

  def stere(P: PJ): Unit = {
    val phits = if (P.params.has("lat_ts")) P.params.r("lat_ts") else HALFPI
    stereSetup(P, phits)
  }

  /** ups (reference stere.cpp:316-336). */
  def ups(P: PJ): Unit = {
    P.phi0 = if (P.params.b("south")) -HALFPI else HALFPI
    if (P.es == 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "ups: only ellipsoidal formulation supported")
    P.k0 = 0.994
    P.x0 = 2000000.0
    P.y0 = 2000000.0
    P.lam0 = 0.0
    stereSetup(P, HALFPI)
  }

  // -------------------------------------------------- sterea (Gaussian sphere)

  /** Gaussian-sphere mapping constants (reference src/gauss.cpp). */
  final class Gauss(e: Double, phi0: Double) extends Serializable {
    private val es = e * e
    private val sphi = math.sin(phi0)
    private val cphi2 = { val c = math.cos(phi0); c * c }
    val rc: Double = math.sqrt(1 - es) / (1 - es * sphi * sphi)
    val bigC: Double = math.sqrt(1 + es * cphi2 * cphi2 / (1 - es))
    val chi: Double = math.asin(sphi / bigC)
    private val ratexp = 0.5 * bigC * e
    private val k: Double = {
      // degenerate (near-unity eccentricity) ellipsoids underflow srat;
      // the reference fails creation there (pj_gauss_ini returning null)
      val sr = srat(e * sphi, ratexp)
      if (sr == 0.0 || bigC == 0.0 || bigC.isNaN)
        throw graft.core.ProjError(graft.core.ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
          "gauss: degenerate ellipsoid")
      if (0.5 * phi0 + QUARTERPI < 1e-10) 1.0 / sr
      else math.tan(0.5 * chi + QUARTERPI) /
        (math.pow(math.tan(0.5 * phi0 + QUARTERPI), bigC) * sr)
    }

    @inline private def srat(esinp: Double, exp: Double): Double =
      math.pow((1 - esinp) / (1 + esinp), exp)

    def fwd(c: Coord): Unit = {
      val phi = 2 * math.atan(k * math.pow(math.tan(0.5 * c.y + QUARTERPI), bigC) *
        srat(e * math.sin(c.y), ratexp)) - HALFPI
      c.x = bigC * c.x
      c.y = phi
    }

    /** returns false on convergence failure. */
    def inv(c: Coord): Boolean = {
      c.x = c.x / bigC
      val num = math.pow(math.tan(0.5 * c.y + QUARTERPI) / k, 1.0 / bigC)
      var slpPhi = c.y
      var i = 20
      while (i > 0) {
        val phi = 2 * math.atan(num * srat(e * math.sin(slpPhi), -0.5 * e)) - HALFPI
        if (math.abs(phi - slpPhi) < 1e-14) { c.y = phi; return true }
        slpPhi = phi
        i -= 1
      }
      c.y = slpPhi
      false
    }
  }

  def sterea(P: PJ): Unit = {
    val gauss = new Gauss(P.e, P.phi0)
    val phic0 = gauss.chi
    val sinc0 = math.sin(phic0); val cosc0 = math.cos(phic0)
    val r2 = 2 * gauss.rc
    val k0v = P.k0
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        gauss.fwd(c)
        val sinc = math.sin(c.y); val cosc = math.cos(c.y)
        val cosl = math.cos(c.x)
        val denom = 1 + sinc0 * sinc + cosc0 * cosc * cosl
        if (denom == 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val k = k0v * r2 / denom
        val x = k * cosc * math.sin(c.x)
        val y = k * (cosc0 * sinc - sinc0 * cosc * cosl)
        c.x = x; c.y = y
      }
      override def inv2(c: Coord): Unit = {
        val x = c.x / k0v; val y = c.y / k0v
        val rho = math.hypot(x, y)
        if (rho != 0.0) {
          val cc = 2 * math.atan2(rho, r2)
          val sinc = math.sin(cc); val cosc = math.cos(cc)
          c.y = math.asin(cosc * sinc0 + y * sinc * cosc0 / rho)
          c.x = math.atan2(x * sinc, rho * cosc0 * cosc - y * sinc0 * sinc)
        } else { c.y = phic0; c.x = 0.0 }
        if (!gauss.inv(c))
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
      }
    }
  }

  // -------------------------------------------------- aeqd

  def aeqd(P: PJ): Unit = {
    val TOL = 1e-14
    val phi0 = P.phi0
    val es = P.es; val e = P.e
    val g = new Geodesic(1.0, P.f)
    var mode = 0; var sinph0 = 0.0; var cosph0 = 0.0
    if (math.abs(math.abs(phi0) - HALFPI) < EPS10) {
      mode = if (phi0 < 0) S_POLE else N_POLE
      sinph0 = if (phi0 < 0) -1 else 1
      cosph0 = 0
    } else if (math.abs(phi0) < EPS10) {
      mode = EQUIT; sinph0 = 0; cosph0 = 1
    } else {
      mode = OBLIQ; sinph0 = math.sin(phi0); cosph0 = math.cos(phi0)
    }

    // ellipsoidal oblique fwd used as fallback by the spherical antipode path
    def eFwd(en: MlfnEn, mp: Double, c: Coord): Unit = {
      val lam = c.x; val phi = c.y
      var coslam = math.cos(lam)
      mode match {
        case N_POLE | S_POLE =>
          if (mode == N_POLE) coslam = -coslam
          val cosphi = math.cos(phi); val sinphi = math.sin(phi)
          val rho = math.abs(mp - mlfn(phi, sinphi, cosphi, en))
          c.x = rho * math.sin(lam)
          c.y = rho * coslam
        case _ =>
          if (math.abs(lam) < EPS10 && math.abs(phi - phi0) < EPS10) {
            c.x = 0; c.y = 0; return
          }
          val r = g.inverse(phi0 * RAD2DEG, 0, phi * RAD2DEG, lam * RAD2DEG)
          val azi1 = r._2 * DEG2RAD
          c.x = r._1 * math.sin(azi1)
          c.y = r._1 * math.cos(azi1)
      }
    }

    if (es == 0) {
      // dummy en for the geodesic fallback (f=0 → mlfn unused on that path)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val lam = c.x; var phi = c.y
          if (mode == EQUIT || mode == OBLIQ) {
            val cosphi = math.cos(phi); val sinphi = math.sin(phi)
            val coslam = math.cos(lam); val sinlam = math.sin(lam)
            var y = if (mode == EQUIT) cosphi * coslam
                    else sinph0 * sinphi + cosph0 * cosphi * coslam
            if (math.abs(math.abs(y) - 1) < TOL) {
              if (y < 0) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              // antipode-adjacent: exact geodesic fallback
              val r = g.inverse(phi0 * RAD2DEG, 0, phi * RAD2DEG, lam * RAD2DEG)
              val azi1 = r._2 * DEG2RAD
              c.x = r._1 * math.sin(azi1)
              c.y = r._1 * math.cos(azi1)
              return
            }
            y = math.acos(y)
            y /= math.sin(y)
            c.x = y * cosphi * sinlam
            c.y = y * (if (mode == EQUIT) sinphi
                       else cosph0 * sinphi - sinph0 * cosphi * coslam)
          } else {
            var coslam = math.cos(lam); val sinlam = math.sin(lam)
            if (mode == N_POLE) { phi = -phi; coslam = -coslam }
            if (math.abs(phi - HALFPI) < EPS10) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            val y = HALFPI + phi
            c.x = y * sinlam
            c.y = y * coslam
          }
        }
        override def inv2(c: Coord): Unit = {
          var x = c.x; var y = c.y
          var cRh = math.hypot(x, y)
          if (cRh > math.Pi) {
            if (cRh - EPS10 > math.Pi) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            cRh = math.Pi
          } else if (cRh < EPS10) { c.y = phi0; c.x = 0; return }
          if (mode == OBLIQ || mode == EQUIT) {
            val sinc = math.sin(cRh); val cosc = math.cos(cRh)
            var phi = 0.0
            if (mode == EQUIT) {
              phi = aasin(c, y * sinc / cRh)
              x *= sinc
              y = cosc * cRh
            } else {
              phi = aasin(c, cosc * sinph0 + y * sinc * cosph0 / cRh)
              y = (cosc - sinph0 * math.sin(phi)) * cRh
              x *= sinc * cosph0
            }
            c.y = phi
            c.x = if (y == 0) 0.0 else math.atan2(x, y)
          } else if (mode == N_POLE) {
            c.y = HALFPI - cRh
            c.x = math.atan2(x, -y)
          } else {
            c.y = cRh - HALFPI
            c.x = math.atan2(x, y)
          }
        }
      }
    } else {
      val en = enfn(P.n)
      if (P.params.b("guam")) {
        val m1 = mlfn(phi0, sinph0, cosph0, en)
        P.kernel = new OpKernel {
          val caps = FWD2 | INV2
          override def fwd2(c: Coord): Unit = {
            val lam = c.x; val phi = c.y
            val cosphi = math.cos(phi); val sinphi = math.sin(phi)
            val t = 1.0 / math.sqrt(1 - es * sinphi * sinphi)
            c.x = lam * cosphi * t
            c.y = mlfn(phi, sinphi, cosphi, en) - m1 +
              0.5 * lam * lam * cosphi * sinphi * t
          }
          override def inv2(c: Coord): Unit = {
            val x = c.x; val y = c.y
            val x2 = 0.5 * x * x
            var phi = phi0
            var t = 0.0
            var i = 0
            while (i < 3) {
              t = e * math.sin(phi)
              t = math.sqrt(1 - t * t)
              phi = invMlfn(m1 + y - x2 * math.tan(phi) * t, en)
              i += 1
            }
            c.y = phi
            c.x = x * t / math.cos(phi)
          }
        }
      } else {
        val mp = mode match {
          case N_POLE => mlfn(HALFPI, 1.0, 0.0, en)
          case S_POLE => mlfn(-HALFPI, -1.0, 0.0, en)
          case _ => 0.0
        }
        P.kernel = new OpKernel {
          val caps = FWD2 | INV2
          override def fwd2(c: Coord): Unit = eFwd(en, mp, c)
          override def inv2(c: Coord): Unit = {
            val x = c.x; val y = c.y
            val s12 = math.hypot(x, y)
            if (s12 < EPS10) { c.y = phi0; c.x = 0; return }
            if (mode == OBLIQ || mode == EQUIT) {
              val azi1 = math.atan2(x, y) * RAD2DEG
              val r = g.direct(phi0 * RAD2DEG, 0, azi1, s12)
              c.y = r._1 * DEG2RAD
              c.x = r._2 * DEG2RAD
            } else {
              c.y = invMlfn(if (mode == N_POLE) mp - s12 else mp + s12, en)
              c.x = math.atan2(x, if (mode == N_POLE) -y else y)
            }
          }
        }
      }
    }
  }
}
