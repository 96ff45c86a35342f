package graft.proj.ops

import graft.core.{Coord, GeoMath, Geodesic, Line, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Azimuthal projections: orthographic, gnomonic, Lambert azimuthal
  * equal-area. Math per reference src/projections/{ortho,gnom,laea}.cpp
  * (Snyder 1987 ch. 20-24; EPSG GN7-2 §3.3.5 for ellipsoidal ortho;
  * Karney geodesic construction for ellipsoidal gnomonic).
  */
object AzimuthalOps {
  private final val EPS10 = 1e-10
  final val N_POLE = 0; final val S_POLE = 1; final val EQUIT = 2; final val OBLIQ = 3

  def modeFor(phi0: Double): Int =
    if (math.abs(math.abs(phi0) - HALFPI) <= EPS10) { if (phi0 < 0) S_POLE else N_POLE }
    else if (math.abs(phi0) > EPS10) OBLIQ
    else EQUIT

  // -------------------------------------------------- ortho

  def ortho(P: PJ): Unit = {
    val sinph0 = math.sin(P.phi0); val cosph0 = math.cos(P.phi0)
    val mode = modeFor(P.phi0)
    val alpha = P.params.r("alpha")
    val sinalpha = math.sin(alpha); val cosalpha = math.cos(alpha)
    val es = P.es; val k0v = P.k0; val phi0 = P.phi0
    val oneEs = P.oneEs
    val aDivB = 1.0 / math.sqrt(oneEs)

    if (es == 0) {
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val lam = c.x; val phi = c.y
          val cosphi = math.cos(phi)
          var coslam = math.cos(lam)
          var y = 0.0
          mode match {
            case EQUIT =>
              if (cosphi * coslam < -EPS10) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              y = math.sin(phi)
            case OBLIQ =>
              val sinphi = math.sin(phi)
              if (sinph0 * sinphi + cosph0 * cosphi * coslam < -EPS10) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              y = cosph0 * sinphi - sinph0 * cosphi * coslam
            case m =>
              if (m == N_POLE) coslam = -coslam
              if (math.abs(phi - phi0) - EPS10 > HALFPI) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              y = cosphi * coslam
          }
          val x = cosphi * math.sin(lam)
          c.x = (x * cosalpha - y * sinalpha) * k0v
          c.y = (x * sinalpha + y * cosalpha) * k0v
        }
        override def inv2(c: Coord): Unit = sInverse(c)
      }
    } else {
      val nu0 = 1.0 / math.sqrt(1.0 - es * sinph0 * sinph0)
      val yShift = es * nu0 * sinph0 * cosph0
      val yScale = 1.0 / math.sqrt(1.0 - es * cosph0 * cosph0)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val lam = c.x; val phi = c.y
          val cosphi = math.cos(phi); val sinphi = math.sin(phi)
          val coslam = math.cos(lam); val sinlam = math.sin(lam)
          if (sinph0 * sinphi + cosph0 * cosphi * coslam < -EPS10) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          val nu = 1.0 / math.sqrt(1.0 - es * sinphi * sinphi)
          val xp = nu * cosphi * sinlam
          val yp = nu * (sinphi * cosph0 - cosphi * sinph0 * coslam) +
            es * (nu0 * sinph0 - nu * sinphi) * cosph0
          c.x = (cosalpha * xp - sinalpha * yp) * k0v
          c.y = (sinalpha * xp + cosalpha * yp) * k0v
        }
        override def inv2(c: Coord): Unit = {
          val xf = c.x; val yf = c.y
          var x = (cosalpha * xf + sinalpha * yf) / k0v
          var y = (-sinalpha * xf + cosalpha * yf) / k0v
          if (mode == N_POLE || mode == S_POLE) {
            val rh2 = x * x + y * y
            if (rh2 >= 1.0 - 1e-15) {
              if (rh2 - 1.0 > EPS10) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              c.y = 0
            } else
              c.y = math.acos(math.sqrt(rh2 * oneEs / (1 - es * rh2))) *
                (if (mode == N_POLE) 1 else -1)
            c.x = math.atan2(x, y * (if (mode == N_POLE) -1 else 1))
            return
          }
          if (mode == EQUIT) {
            if (x * x + (y * aDivB) * (y * aDivB) > 1 + 1e-11) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            val sinphi2 = if (y == 0) 0.0 else 1.0 / (((1 - es) / y) * ((1 - es) / y) + es)
            if (sinphi2 > 1 - 1e-11) {
              c.y = HALFPI * (if (y > 0) 1 else -1); c.x = 0; return
            }
            c.y = math.asin(math.sqrt(sinphi2)) * (if (y > 0) 1 else -1)
            val sinlam = x * math.sqrt((1 - es * sinphi2) / (1 - sinphi2))
            c.x = if (math.abs(sinlam) - 1 > -1e-15) HALFPI * (if (x > 0) 1 else -1)
                  else math.asin(sinlam)
            return
          }
          // oblique: spherical start + 2D Newton (EPSG GN7-2 §3.3.5)
          val xr = x; val yr = (y - yShift) / yScale
          if (x * x + yr * yr > 1 + 1e-11) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          val tmp = new Coord
          tmp.x = xr; tmp.y = yr
          sInverseRaw(tmp)
          if (tmp.isError) { c.copyFrom(tmp); return }
          var lam = tmp.x; var phi = tmp.y
          var i = 0
          while (i < 20) {
            val cosphi = math.cos(phi); val sinphi = math.sin(phi)
            val coslam = math.cos(lam); val sinlam = math.sin(lam)
            val om = 1.0 - es * sinphi * sinphi
            val nu = 1.0 / math.sqrt(om)
            val xn = nu * cosphi * sinlam
            val yn = nu * (sinphi * cosph0 - cosphi * sinph0 * coslam) +
              es * (nu0 * sinph0 - nu * sinphi) * cosph0
            val rho = (1.0 - es) * nu / om
            val j11 = -rho * sinphi * sinlam
            val j12 = nu * cosphi * coslam
            val j21 = rho * (cosphi * cosph0 + sinphi * sinph0 * coslam)
            val j22 = nu * sinph0 * cosphi * sinlam
            val dd = j11 * j22 - j12 * j21
            val dx = x - xn; val dy = y - yn
            val dphi = (j22 * dx - j12 * dy) / dd
            val dlam = (-j21 * dx + j11 * dy) / dd
            phi += dphi
            if (phi > HALFPI) { phi = HALFPI - (phi - HALFPI); lam = adjlon(lam + math.Pi) }
            else if (phi < -HALFPI) { phi = -HALFPI + (-HALFPI - phi); lam = adjlon(lam + math.Pi) }
            lam += dlam
            if (math.abs(dphi) < 1e-12 && math.abs(dlam) < 1e-12) {
              c.x = lam; c.y = phi; return
            }
            i += 1
          }
          c.x = lam; c.y = phi
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }
    }

    // spherical inverse shared by both paths (with/without alpha rotation)
    def sInverse(c: Coord): Unit = {
      val xf = c.x; val yf = c.y
      c.x = (cosalpha * xf + sinalpha * yf) / k0v
      c.y = (-sinalpha * xf + cosalpha * yf) / k0v
      sInverseRaw(c)
    }
    def sInverseRaw(c: Coord): Unit = {
      var x = c.x; var y = c.y
      val rh = math.hypot(x, y)
      var sinc = rh
      if (sinc > 1) {
        if (sinc - 1 > EPS10) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        sinc = 1
      }
      val cosc = math.sqrt(1 - sinc * sinc)
      if (math.abs(rh) <= EPS10) { c.y = phi0; c.x = 0.0; return }
      var phi = 0.0
      mode match {
        case N_POLE => y = -y; phi = math.acos(sinc)
        case S_POLE => phi = -math.acos(sinc)
        case EQUIT =>
          phi = y * sinc / rh
          x *= sinc
          y = cosc * rh
          phi = if (math.abs(phi) >= 1) { if (phi < 0) -HALFPI else HALFPI } else math.asin(phi)
        case OBLIQ =>
          phi = cosc * sinph0 + y * sinc * cosph0 / rh
          y = (cosc - sinph0 * phi) * rh
          x *= sinc * cosph0
          phi = if (math.abs(phi) >= 1) { if (phi < 0) -HALFPI else HALFPI } else math.asin(phi)
      }
      c.y = phi
      c.x = if (y == 0.0 && (mode == OBLIQ || mode == EQUIT)) {
        if (x == 0.0) 0.0 else if (x < 0) -HALFPI else HALFPI
      } else math.atan2(x, y)
    }
  }

  // -------------------------------------------------- gnom

  def gnom(P: PJ): Unit = {
    val phi0 = P.phi0
    val es = P.es
    if (es == 0) {
      val mode = modeFor(phi0)
      val sinph0 = math.sin(phi0); val cosph0 = math.cos(phi0)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val lam = c.x; val phi = c.y
          val sinphi = math.sin(phi); val cosphi = math.cos(phi)
          var coslam = math.cos(lam)
          var y = mode match {
            case EQUIT => cosphi * coslam
            case OBLIQ => sinph0 * sinphi + cosph0 * cosphi * coslam
            case S_POLE => -sinphi
            case _ => sinphi
          }
          if (y <= EPS10) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          y = 1.0 / y
          c.x = y * cosphi * math.sin(lam)
          mode match {
            case EQUIT => y *= sinphi
            case OBLIQ => y *= cosph0 * sinphi - sinph0 * cosphi * coslam
            case m =>
              if (m == N_POLE) coslam = -coslam
              y *= cosphi * coslam
          }
          c.y = y
        }
        override def inv2(c: Coord): Unit = {
          var x = c.x; var y = c.y
          val rh = math.hypot(x, y)
          var phi = math.atan(rh)
          val sinz = math.sin(phi)
          val cosz = math.sqrt(1 - sinz * sinz)
          if (math.abs(rh) <= EPS10) { c.y = phi0; c.x = 0.0; return }
          mode match {
            case OBLIQ =>
              phi = cosz * sinph0 + y * sinz * cosph0 / rh
              phi = if (math.abs(phi) >= 1) { if (phi > 0) HALFPI else -HALFPI } else math.asin(phi)
              y = (cosz - sinph0 * math.sin(phi)) * rh
              x *= sinz * cosph0
            case EQUIT =>
              phi = y * sinz / rh
              phi = if (math.abs(phi) >= 1) { if (phi > 0) HALFPI else -HALFPI } else math.asin(phi)
              y = cosz * rh
              x *= sinz
            case S_POLE => phi -= HALFPI
            case N_POLE => phi = HALFPI - phi; y = -y
          }
          c.y = phi
          c.x = math.atan2(x, y)
        }
      }
    } else {
      // ellipsoidal gnomonic via geodesics (Karney 2008): rho = m12 / M12
      val g = new Geodesic(1.0, P.f)
      val lat0 = phi0 * RAD2DEG
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val r = g.inverseAll(lat0, 0, c.y * RAD2DEG, c.x * RAD2DEG)
          val m = r(3); val bigM = r(4)
          if (bigM <= 0) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
          } else {
            val rho = m / bigM
            val azi0 = r(1) * DEG2RAD
            c.x = rho * math.sin(azi0)
            c.y = rho * math.cos(azi0)
          }
        }
        override def inv2(c: Coord): Unit = {
          val eps = 0.01 * math.sqrt(2.220446049250313e-16)
          val azi0 = math.atan2(c.x, c.y) * RAD2DEG
          var rho = math.hypot(c.x, c.y)
          var s = math.atan(rho)
          val little = rho <= 1
          if (!little) rho = 1 / rho
          val l = new Line(g, lat0, 0, azi0)
          val out = new Array[Double](6)
          var count = 10; var trip = 0
          var lat1 = 0.0; var lon1 = 0.0
          var break = false
          while (count > 0 && !break) {
            l.position(arcMode = false, s, out)
            lat1 = out(0); lon1 = out(1)
            if (trip > 0) break = true
            else {
              val m = out(4); val bigM = out(5)
              val ds = if (little) (m - rho * bigM) * bigM else (rho * m - bigM) * m
              s -= ds
              if (!(math.abs(ds) >= eps)) trip += 1
            }
            count -= 1
          }
          if (trip > 0) { c.y = lat1 * DEG2RAD; c.x = lon1 * DEG2RAD }
          else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }
    }
    // the reference resets es to 0 after setup so fwd_prepare treats output
    // as sphere-scaled; harmless for us since finalize only uses a
  }

  // -------------------------------------------------- laea

  def laea(P: PJ): Unit = {
    val t = math.abs(P.phi0)
    if (t > HALFPI + EPS10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "laea: |lat_0| should be <= 90")
    val mode =
      if (math.abs(t - HALFPI) < EPS10) { if (P.phi0 < 0) S_POLE else N_POLE }
      else if (math.abs(t) < EPS10) EQUIT
      else OBLIQ
    val es = P.es; val phi0 = P.phi0
    if (es != 0) {
      val auth = new Authalic(P.e, P.es, P.oneEs, P.n)
      val qp = auth.qp
      var sinb1 = 0.0; var cosb1 = 0.0
      var xmf = 0.0; var ymf = 0.0; var dd = 0.0; var rq = 0.0
      mode match {
        case N_POLE | S_POLE => dd = 1.0
        case EQUIT =>
          rq = math.sqrt(0.5 * qp)
          dd = 1.0 / rq
          xmf = 1.0
          ymf = 0.5 * qp
        case OBLIQ =>
          rq = math.sqrt(0.5 * qp)
          val sinphi = math.sin(phi0); val cosphi = math.cos(phi0)
          val b1 = auth.lat(phi0, sinphi, cosphi)
          sinb1 = math.sin(b1); cosb1 = math.cos(b1)
          dd = cosphi / (math.sqrt(1 - es * sinphi * sinphi) * rq * cosb1)
          xmf = rq * dd
          ymf = rq / dd
      }
      val (sb1, cb1, xm, ym, d0, r0) = (sinb1, cosb1, xmf, ymf, dd, rq)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val lam = c.x; val phi = c.y
          val coslam = math.cos(lam); val sinlam = math.sin(lam)
          val sinphi = math.sin(phi); val cosphi = math.cos(phi)
          val xi = auth.lat(phi, sinphi, cosphi)
          var q = math.sin(xi) * qp
          var sinb = 0.0; var cosb = 0.0; var bb = 0.0
          if (mode == OBLIQ || mode == EQUIT) { sinb = math.sin(xi); cosb = math.cos(xi) }
          mode match {
            case OBLIQ => bb = 1 + sb1 * sinb + cb1 * cosb * coslam
            case EQUIT => bb = 1 + cosb * coslam
            case N_POLE => bb = HALFPI + phi; q = qp - q
            case S_POLE => bb = phi - HALFPI; q = qp + q
          }
          if (math.abs(bb) < EPS10) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          mode match {
            case OBLIQ =>
              bb = math.sqrt(2 / bb)
              c.y = ym * bb * (cb1 * sinb - sb1 * cosb * coslam)
              c.x = xm * bb * cosb * sinlam
            case EQUIT =>
              bb = math.sqrt(2 / (1 + cosb * coslam))
              c.y = bb * sinb * ym
              c.x = xm * bb * cosb * sinlam
            case _ =>
              if (q >= 1e-15) {
                bb = math.sqrt(q)
                c.x = bb * sinlam
                c.y = coslam * (if (mode == S_POLE) bb else -bb)
              } else { c.x = 0; c.y = 0 }
          }
        }
        override def inv2(c: Coord): Unit = {
          var x = c.x; var y = c.y
          var ab = 0.0
          if (mode == EQUIT || mode == OBLIQ) {
            x /= d0
            y *= d0
            val rho = math.hypot(x, y)
            if (rho < EPS10) { c.x = 0; c.y = phi0; return }
            val asinArg = 0.5 * rho / r0
            if (asinArg > 1) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            val ce = 2 * math.asin(asinArg)
            val cCe = math.cos(ce); val sCe = math.sin(ce)
            x *= sCe
            if (mode == OBLIQ) {
              ab = cCe * sb1 + y * sCe * cb1 / rho
              y = rho * cb1 * cCe - y * sb1 * sCe
            } else {
              ab = y * sCe / rho
              y = rho * cCe
            }
          } else {
            if (mode == N_POLE) y = -y
            val q = x * x + y * y
            if (q == 0) { c.x = 0; c.y = phi0; return }
            ab = 1 - q / qp
            if (mode == S_POLE) ab = -ab
          }
          c.x = math.atan2(x, y)
          c.y = auth.latInverse(math.asin(ab))
        }
      }
    } else {
      val sinb1 = math.sin(phi0); val cosb1 = math.cos(phi0)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val lam = c.x; val phi = c.y
          val sinphi = math.sin(phi); val cosphi = math.cos(phi)
          var coslam = math.cos(lam)
          mode match {
            case EQUIT | OBLIQ =>
              var y = if (mode == EQUIT) 1 + cosphi * coslam
                      else 1 + sinb1 * sinphi + cosb1 * cosphi * coslam
              if (y <= EPS10) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              y = math.sqrt(2 / y)
              c.x = y * cosphi * math.sin(lam)
              c.y = y * (if (mode == EQUIT) sinphi
                         else cosb1 * sinphi - sinb1 * cosphi * coslam)
            case m =>
              if (m == N_POLE) coslam = -coslam
              if (math.abs(phi + phi0) < EPS10) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              var y = QUARTERPI - phi * 0.5
              y = 2 * (if (m == S_POLE) math.cos(y) else math.sin(y))
              c.x = y * math.sin(lam)
              c.y = y * coslam
          }
        }
        override def inv2(c: Coord): Unit = {
          var x = c.x; var y = c.y
          val rh = math.hypot(x, y)
          var phi = rh * 0.5
          if (phi > 1) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          phi = 2 * math.asin(phi)
          var sinz = 0.0; var cosz = 0.0
          if (mode == OBLIQ || mode == EQUIT) { sinz = math.sin(phi); cosz = math.cos(phi) }
          mode match {
            case EQUIT =>
              phi = if (math.abs(rh) <= EPS10) 0.0 else math.asin(y * sinz / rh)
              x *= sinz
              y = cosz * rh
            case OBLIQ =>
              phi = if (math.abs(rh) <= EPS10) phi0
                    else math.asin(cosz * sinb1 + y * sinz * cosb1 / rh)
              x *= sinz * cosb1
              y = (cosz - math.sin(phi) * sinb1) * rh
            case N_POLE =>
              y = -y
              phi = HALFPI - phi
            case S_POLE =>
              phi -= HALFPI
          }
          c.y = phi
          c.x = if (y == 0.0 && (mode == EQUIT || mode == OBLIQ)) 0.0
                else math.atan2(x, y)
        }
      }
    }
  }
}
