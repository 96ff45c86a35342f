package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Miscellaneous azimuthal/conic ops: near-sided/tilted perspective,
  * geostationary view, Airy, American polyconic, two-point equidistant.
  * Math per reference src/projections/{nsper,geos,airy,poly,tpeqd}.cpp. */
object MiscOps {
  private final val EPS10 = 1e-10
  import AzimuthalOps.{N_POLE, S_POLE, EQUIT, OBLIQ}

  private def kernel2(P: PJ, fwdF: Coord => Unit, invF: Coord => Unit = null): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | (if (invF != null) INV2 else 0)
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = if (invF != null) invF(c)
    }
  }

  // ---------------- nsper / tpers ----------------

  private def nsperSetup(P: PJ, tilt: Boolean, cg: Double, sg: Double,
                         cw: Double, sw: Double): Unit = {
    val height = P.params.d("h")
    val phi0 = P.phi0
    val mode = AzimuthalOps.modeFor(phi0)
    val sinph0 = math.sin(phi0); val cosph0 = math.cos(phi0)
    val pn1 = height / P.a
    if (pn1 <= 0 || pn1 > 1e10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "nsper: invalid value for h")
    val p = 1 + pn1
    val rp = 1 / p
    val h = 1 / pn1
    val pfact = (p + 1) * h
    def fwdF(c: Coord): Unit = {
      val sinphi = math.sin(c.y); val cosphi = math.cos(c.y)
      var coslam = math.cos(c.x)
      var y = mode match {
        case OBLIQ => sinph0 * sinphi + cosph0 * cosphi * coslam
        case EQUIT => cosphi * coslam
        case S_POLE => -sinphi
        case _ => sinphi
      }
      if (y < rp) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      y = pn1 / (p - y)
      var x = y * cosphi * math.sin(c.x)
      mode match {
        case OBLIQ => y *= cosph0 * sinphi - sinph0 * cosphi * coslam
        case EQUIT => y *= sinphi
        case m =>
          if (m == N_POLE) coslam = -coslam
          y *= cosphi * coslam
      }
      if (tilt) {
        val yt = y * cg + x * sg
        val ba = 1.0 / (yt * sw * h + cw)
        x = (x * cg - y * sg) * cw * ba
        y = yt * ba
      }
      c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
      var x = c.x; var y = c.y
      if (tilt) {
        val yt = 1.0 / (pn1 - y * sw)
        val bm = pn1 * x * yt
        val bq = pn1 * y * cw * yt
        x = bm * cg + bq * sg
        y = bq * cg - bm * sg
      }
      val rh = math.hypot(x, y)
      if (math.abs(rh) <= EPS10) { c.x = 0; c.y = phi0; return }
      var sinz = 1 - rh * rh * pfact
      if (sinz < 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      sinz = (p - math.sqrt(sinz)) / (pn1 / rh + rh / pn1)
      val cosz = math.sqrt(1 - sinz * sinz)
      var phi = 0.0
      mode match {
        case OBLIQ =>
          phi = math.asin(cosz * sinph0 + y * sinz * cosph0 / rh)
          y = (cosz - sinph0 * math.sin(phi)) * rh
          x *= sinz * cosph0
        case EQUIT =>
          phi = math.asin(y * sinz / rh)
          y = cosz * rh
          x *= sinz
        case N_POLE =>
          phi = math.asin(cosz)
          y = -y
        case S_POLE =>
          phi = -math.asin(cosz)
      }
      c.y = phi
      c.x = math.atan2(x, y)
    }
    kernel2(P, fwdF, invF)
  }

  def nsper(P: PJ): Unit = nsperSetup(P, tilt = false, 1, 0, 1, 0)

  def tpers(P: PJ): Unit = {
    val omega = P.params.r("tilt")
    val gamma = P.params.r("azi")
    nsperSetup(P, tilt = true, math.cos(gamma), math.sin(gamma),
      math.cos(omega), math.sin(omega))
  }

  // ---------------- geos ----------------

  def geos(P: PJ): Unit = {
    val h = P.params.d("h")
    val flipAxis = P.params.s("sweep") match {
      case None => false
      case Some("x") => true
      case Some("y") => false
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "geos: sweep should be x or y")
    }
    val radiusG1 = h / P.a
    if (radiusG1 <= 0 || radiusG1 > 1e10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "geos: invalid h")
    val radiusG = 1 + radiusG1
    val bigC = radiusG * radiusG - 1
    val es = P.es
    if (es != 0) {
      val radiusP = math.sqrt(P.oneEs)
      val radiusP2 = P.oneEs
      val radiusPInv2 = P.rOneEs
      def fwdF(c: Coord): Unit = {
        val phi = math.atan(radiusP2 * math.tan(c.y))
        val r = radiusP / math.hypot(radiusP * math.cos(phi), math.sin(phi))
        val vx = r * math.cos(c.x) * math.cos(phi)
        val vy = r * math.sin(c.x) * math.cos(phi)
        val vz = r * math.sin(phi)
        if ((radiusG - vx) * vx - vy * vy - vz * vz * radiusPInv2 < 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val tmp = radiusG - vx
        if (flipAxis) {
          c.x = radiusG1 * math.atan(vy / math.hypot(vz, tmp))
          c.y = radiusG1 * math.atan(vz / tmp)
        } else {
          c.x = radiusG1 * math.atan(vy / tmp)
          c.y = radiusG1 * math.atan(vz / math.hypot(vy, tmp))
        }
      }
      def invF(c: Coord): Unit = {
        var vx = -1.0; var vy = 0.0; var vz = 0.0
        if (flipAxis) {
          vz = math.tan(c.y / radiusG1)
          vy = math.tan(c.x / radiusG1) * math.hypot(1.0, vz)
        } else {
          vy = math.tan(c.x / radiusG1)
          vz = math.tan(c.y / radiusG1) * math.hypot(1.0, vy)
        }
        val aa0 = vz / radiusP
        val aa = vy * vy + aa0 * aa0 + vx * vx
        val bb = 2 * radiusG * vx
        val det = bb * bb - 4 * aa * bigC
        if (det < 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val k = (-bb - math.sqrt(det)) / (2 * aa)
        vx = radiusG + k * vx
        vy *= k; vz *= k
        c.x = math.atan2(vy, vx)
        c.y = math.atan(radiusPInv2 * vz / math.hypot(vx, vy))
      }
      kernel2(P, fwdF, invF)
    } else {
      def fwdF(c: Coord): Unit = {
        val tmp0 = math.cos(c.y)
        val vx = math.cos(c.x) * tmp0
        val vy = math.sin(c.x) * tmp0
        val vz = math.sin(c.y)
        val tmp = radiusG - vx
        if (flipAxis) {
          c.x = radiusG1 * math.atan(vy / math.hypot(vz, tmp))
          c.y = radiusG1 * math.atan(vz / tmp)
        } else {
          c.x = radiusG1 * math.atan(vy / tmp)
          c.y = radiusG1 * math.atan(vz / math.hypot(vy, tmp))
        }
      }
      def invF(c: Coord): Unit = {
        var vx = -1.0; var vy = 0.0; var vz = 0.0
        if (flipAxis) {
          vz = math.tan(c.y / radiusG1)
          vy = math.tan(c.x / radiusG1) * math.sqrt(1 + vz * vz)
        } else {
          vy = math.tan(c.x / radiusG1)
          vz = math.tan(c.y / radiusG1) * math.sqrt(1 + vy * vy)
        }
        val aa = vy * vy + vz * vz + vx * vx
        val bb = 2 * radiusG * vx
        val det = bb * bb - 4 * aa * bigC
        if (det < 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val k = (-bb - math.sqrt(det)) / (2 * aa)
        vx = radiusG + k * vx
        vy *= k; vz *= k
        c.x = math.atan2(vy, vx)
        c.y = math.atan(vz / math.hypot(vx, vy))
      }
      kernel2(P, fwdF, invF)
    }
  }

  // ---------------- airy ----------------

  def airy(P: PJ): Unit = {
    val EPS = 1e-10
    val noCut = P.params.b("no_cut")
    val beta = 0.5 * (HALFPI - P.params.r("lat_b"))
    val cb =
      if (math.abs(beta) < EPS) -0.5
      else { val t = 1 / math.tan(beta); t * t * math.log(math.cos(beta)) }
    val phi0 = P.phi0
    var mode = 0; var pHalfpi = 0.0
    var sinph0 = 0.0; var cosph0 = 0.0
    if (math.abs(math.abs(phi0) - HALFPI) < EPS) {
      if (phi0 < 0) { pHalfpi = -HALFPI; mode = S_POLE }
      else { pHalfpi = HALFPI; mode = N_POLE }
    } else if (math.abs(phi0) < EPS) mode = EQUIT
    else { mode = OBLIQ; sinph0 = math.sin(phi0); cosph0 = math.cos(phi0) }
    def fwdF(c: Coord): Unit = {
      val sinlam = math.sin(c.x); val coslam = math.cos(c.x)
      mode match {
        case EQUIT | OBLIQ =>
          val sinphi = math.sin(c.y); val cosphi = math.cos(c.y)
          var cosz = cosphi * coslam
          if (mode == OBLIQ) cosz = sinph0 * sinphi + cosph0 * cosz
          if (!noCut && cosz < -EPS) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          val s = 1 - cosz
          var krho = 0.0
          if (math.abs(s) > EPS) {
            val t = 0.5 * (1 + cosz)
            if (t == 0) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            krho = -math.log(t) / s - cb / t
          } else krho = 0.5 - cb
          c.x = krho * cosphi * sinlam
          c.y = if (mode == OBLIQ) krho * (cosph0 * sinphi - sinph0 * cosphi * coslam)
                else krho * sinphi
        case _ =>
          var phi = math.abs(pHalfpi - c.y)
          if (!noCut && phi - EPS > HALFPI) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          phi *= 0.5
          if (phi > EPS) {
            val t = math.tan(phi)
            val krho = -2 * (math.log(math.cos(phi)) / t + t * cb)
            c.x = krho * sinlam
            c.y = krho * coslam
            if (mode == N_POLE) c.y = -c.y
          } else { c.x = 0; c.y = 0 }
      }
    }
    kernel2(P, fwdF)
  }

  // ---------------- poly ----------------

  def poly(P: PJ): Unit = {
    val TOL = 1e-10; val CONV = 1e-10; val ITOL = 1e-12
    val es = P.es
    if (es != 0) {
      val en = enfn(P.n)
      val ml0 = mlfn(P.phi0, math.sin(P.phi0), math.cos(P.phi0), en)
      val oneEs = P.oneEs
      def fwdF(c: Coord): Unit = {
        if (math.abs(c.y) <= TOL) { c.x = c.x; c.y = -ml0 }
        else {
          val sp = math.sin(c.y); val cp = math.cos(c.y)
          val ms = if (math.abs(cp) > TOL) msfn(sp, cp, es) / sp else 0.0
          val lam = c.x * sp
          c.x = ms * math.sin(lam)
          c.y = (mlfn(c.y, sp, cp, en) - ml0) + ms * (1 - math.cos(lam))
        }
      }
      def invF(c: Coord): Unit = {
        val x = c.x
        val y = c.y + ml0
        if (math.abs(y) <= TOL) { c.x = x; c.y = 0 }
        else {
          val r = y * y + x * x
          var phi = y
          var i = 20
          var conv = false
          while (i > 0 && !conv) {
            val sp = math.sin(phi); val cp = math.cos(phi)
            val s2ph = sp * cp
            if (math.abs(cp) < ITOL) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            var mlp = math.sqrt(1 - es * sp * sp)
            val cc = sp * mlp / cp
            val ml = mlfn(phi, sp, cp, en)
            val mlb = ml * ml + r
            mlp = oneEs / (mlp * mlp * mlp)
            val dPhi = (ml + ml + cc * mlb - 2 * y * (cc * ml + 1)) /
              (es * s2ph * (mlb - 2 * y * ml) / cc +
                2 * (y - ml) * (cc * mlp - 1 / s2ph) - mlp - mlp)
            phi += dPhi
            if (math.abs(dPhi) <= ITOL) conv = true
            i -= 1
          }
          if (!conv) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          val cc = math.sin(phi)
          c.y = phi
          c.x = math.asin(x * math.tan(phi) * math.sqrt(1 - es * cc * cc)) / math.sin(phi)
        }
      }
      kernel2(P, fwdF, invF)
    } else {
      val ml0 = -P.phi0
      val phi0 = P.phi0
      def fwdF(c: Coord): Unit = {
        if (math.abs(c.y) <= TOL) { c.y = ml0 }
        else {
          val cot = 1 / math.tan(c.y)
          val e = c.x * math.sin(c.y)
          c.x = math.sin(e) * cot
          c.y = c.y - phi0 + cot * (1 - math.cos(e))
        }
      }
      def invF(c: Coord): Unit = {
        val x = c.x
        val y = phi0 + c.y
        if (math.abs(y) <= TOL) { c.x = x; c.y = 0 }
        else {
          var phi = y
          val b = x * x + y * y
          var i = 10
          var done = false
          while (!done) {
            val tp = math.tan(phi)
            val dphi = (y * (phi * tp + 1) - phi - 0.5 * (phi * phi + b) * tp) /
              ((phi - y) / tp - 1)
            phi -= dphi
            if (!(math.abs(dphi) > CONV)) done = true
            else {
              i -= 1
              if (i == 0) {
                c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            }
          }
          c.y = phi
          c.x = math.asin(x * math.tan(phi)) / math.sin(phi)
        }
      }
      kernel2(P, fwdF, invF)
    }
  }

  // ---------------- tpeqd ----------------

  def tpeqd(P: PJ): Unit = {
    val phi1 = P.params.r("lat_1")
    val lam1 = P.params.r("lon_1")
    val phi2 = P.params.r("lat_2")
    val lam2 = P.params.r("lon_2")
    if (phi1 == phi2 && lam1 == lam2)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "tpeqd: points should be distinct")
    P.lam0 = adjlon(0.5 * (lam1 + lam2))
    var dlam2 = adjlon(lam2 - lam1)
    val cp1 = math.cos(phi1); val cp2 = math.cos(phi2)
    val sp1 = math.sin(phi1); val sp2 = math.sin(phi2)
    val cs = cp1 * sp2
    val sc = sp1 * cp2
    val ccs = cp1 * cp2 * math.sin(dlam2)
    val csMinus = cs - sc * math.cos(dlam2)
    var z02 = math.atan2(math.hypot(cp2 * math.sin(dlam2), csMinus),
      sp1 * sp2 + cp1 * cp2 * math.cos(dlam2))
    if (z02 == 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "tpeqd: |lat| should be < 90")
    val hz0 = 0.5 * z02
    val a12 = math.atan2(cp2 * math.sin(dlam2), csMinus)
    val dummy = new Coord
    val pp = aasin(dummy, cp1 * math.sin(a12))
    val ca = math.cos(pp); val sa = math.sin(pp)
    val lp = adjlon(math.atan2(cp1 * math.cos(a12), sp1) - hz0)
    dlam2 *= 0.5
    val lamc = HALFPI - math.atan2(math.sin(a12) * sp1, math.cos(a12)) - dlam2
    val thz0 = math.tan(hz0)
    val rhshz0 = 0.5 / math.sin(hz0)
    val r2z0 = 0.5 / z02
    z02 *= z02
    val z02f = z02
    kernel2(P,
      c => {
        val sp = math.sin(c.y); val cp = math.cos(c.y)
        val dl1 = c.x + dlam2
        val dl2 = c.x - dlam2
        var z1 = aacos(c, sp1 * sp + cp1 * cp * math.cos(dl1))
        var z2 = aacos(c, sp2 * sp + cp2 * cp * math.cos(dl2))
        z1 *= z1; z2 *= z2
        val t = z1 - z2
        val x = r2z0 * t
        val t2 = z02f - t
        var y = r2z0 * asqrt(4 * z02f * z2 - t2 * t2)
        if (ccs * sp - cp * (cs * math.sin(dl1) - sc * math.sin(dl2)) < 0) y = -y
        c.x = x; c.y = y
      },
      c => {
        val cz1 = math.cos(math.hypot(c.y, c.x + hz0))
        val cz2 = math.cos(math.hypot(c.y, c.x - hz0))
        val s = cz1 + cz2
        val dd = cz1 - cz2
        var lam = -math.atan2(dd, s * thz0)
        var phi = aacos(c, math.hypot(thz0 * s, dd) * rhshz0)
        if (c.y < 0) phi = -phi
        val sp = math.sin(phi); val cp = math.cos(phi)
        lam -= lp
        val s2 = math.cos(lam)
        c.y = aasin(c, sa * sp + ca * cp * s2)
        c.x = math.atan2(cp * math.sin(lam), sa * cp * s2 - ca * sp) + lamc
      })
  }
}
