package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Hotine oblique Mercator, Krovak (+modified), and the generic oblique
  * transformation (sphere rotation composed with another projection).
  * Math per reference src/projections/{omerc,krovak,ob_tran}.cpp. */
object ObliqueOps {
  private final val TOL = 1e-7
  private final val EPS = 1e-10

  def omerc(P: PJ): Unit = {
    val p = P.params
    val noRot = p.b("no_rot")
    val alp = p.has("alpha")
    val gam = p.has("gamma")
    var alphaC = if (alp) p.r("alpha") else 0.0
    var gamma = if (gam) p.r("gamma") else 0.0
    var lamc = 0.0
    var lam1 = 0.0; var lam2 = 0.0; var phi1 = 0.0; var phi2 = 0.0
    var noOff = false
    if (alp || gam) {
      lamc = p.r("lonc")
      noOff = p.has("no_off") || p.has("no_uoff")
    } else {
      lam1 = p.r("lon_1"); phi1 = p.r("lat_1")
      lam2 = p.r("lon_2"); phi2 = p.r("lat_2")
      if (math.abs(phi1) > HALFPI - TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: |lat_1| should be < 90")
      if (math.abs(phi2) > HALFPI - TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: |lat_2| should be < 90")
      if (math.abs(phi1 - phi2) <= TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: lat_1 != lat_2 required")
      if (math.abs(phi1) <= TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: lat_1 should not be 0")
      if (math.abs(math.abs(P.phi0) - HALFPI) <= TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: |lat_0| should be < 90")
    }
    val e = P.e; val es = P.es
    val com = math.sqrt(P.oneEs)
    var bigB = 0.0; var bigA = 0.0; var bigE = 0.0; var bigD = 0.0; var bigF = 0.0
    if (math.abs(P.phi0) > EPS) {
      val sinph0 = math.sin(P.phi0); val cosph0 = math.cos(P.phi0)
      val con = 1 - es * sinph0 * sinph0
      bigB = cosph0 * cosph0
      bigB = math.sqrt(1 + es * bigB * bigB / P.oneEs)
      bigA = bigB * P.k0 * com / con
      bigD = bigB * com / (cosph0 * math.sqrt(con))
      bigF = bigD * bigD - 1
      if (bigF <= 0) bigF = 0
      else {
        bigF = math.sqrt(bigF)
        if (P.phi0 < 0) bigF = -bigF
      }
      bigF += bigD
      bigE = bigF * math.pow(tsfn(P.phi0, sinph0, e), bigB)
    } else {
      bigB = 1 / com
      bigA = P.k0
      bigE = 1; bigD = 1; bigF = 1
    }
    val dummy = new Coord
    var gamma0 = 0.0
    if (alp || gam) {
      if (alp) {
        gamma0 = aasin(dummy, math.sin(alphaC) / bigD)
        if (!gam) gamma = alphaC
      } else {
        gamma0 = gamma
        if (math.abs(bigD * math.sin(gamma0)) > 1.00000000000001)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: invalid gamma")
        alphaC = aasin(dummy, bigD * math.sin(gamma0))
      }
      if (math.abs(math.abs(P.phi0) - HALFPI) <= TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: |lat_0| should be < 90")
      P.lam0 = lamc - aasin(dummy, 0.5 * (bigF - 1 / bigF) * math.tan(gamma0)) / bigB
    } else {
      val h = math.pow(tsfn(phi1, math.sin(phi1), e), bigB)
      val l = math.pow(tsfn(phi2, math.sin(phi2), e), bigB)
      bigF = bigE / h
      val pp = (l - h) / (l + h)
      if (pp == 0)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: invalid eccentricity")
      var j = bigE * bigE
      j = (j - l * h) / (j + l * h)
      val con = lam1 - lam2
      if (con < -math.Pi) lam2 -= TWOPI
      else if (con > math.Pi) lam2 += TWOPI
      P.lam0 = adjlon(0.5 * (lam1 + lam2) -
        math.atan(j * math.tan(0.5 * bigB * (lam1 - lam2)) / pp) / bigB)
      val denom = bigF - 1 / bigF
      if (denom == 0)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "omerc: invalid eccentricity")
      gamma0 = math.atan(2 * math.sin(bigB * adjlon(lam1 - P.lam0)) / denom)
      alphaC = aasin(dummy, bigD * math.sin(gamma0))
      gamma = alphaC
    }
    val singam = math.sin(gamma0); val cosgam = math.cos(gamma0)
    val sinrot = math.sin(gamma); val cosrot = math.cos(gamma)
    val rB = 1 / bigB
    val arB = bigA * rB
    val brA = 1 / arB
    val u0 =
      if (noOff) 0.0
      else {
        val u = math.abs(arB * math.atan(math.sqrt(bigD * bigD - 1) / math.cos(alphaC)))
        if (P.phi0 < 0) -u else u
      }
    val f0 = 0.5 * gamma0
    val vPoleN = arB * math.log(math.tan(QUARTERPI - f0))
    val vPoleS = arB * math.log(math.tan(QUARTERPI + f0))

    val (sB, sE, sArB, sBrA, sRB) = (bigB, bigE, arB, brA, rB)
    def fwdF(c: Coord): Unit = {
      var u = 0.0; var v = 0.0
      if (math.abs(math.abs(c.y) - HALFPI) > EPS) {
        val w = sE / math.pow(tsfn(c.y, math.sin(c.y), e), sB)
        val oneDivW = 1 / w
        val s = 0.5 * (w - oneDivW)
        val t = 0.5 * (w + oneDivW)
        val vv = math.sin(sB * c.x)
        val uu = (s * singam - vv * cosgam) / t
        if (math.abs(math.abs(uu) - 1.0) < EPS) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        v = 0.5 * sArB * math.log((1 - uu) / (1 + uu))
        val temp = math.cos(sB * c.x)
        u = if (math.abs(temp) < TOL) bigA * c.x
            else sArB * math.atan2(s * cosgam + vv * singam, temp)
      } else {
        v = if (c.y > 0) vPoleN else vPoleS
        u = sArB * c.y
      }
      if (noRot) { c.x = u; c.y = v }
      else {
        u -= u0
        c.x = v * cosrot + u * sinrot
        c.y = u * cosrot - v * sinrot
      }
    }
    def invF(c: Coord): Unit = {
      var u = 0.0; var v = 0.0
      if (noRot) { v = c.y; u = c.x }
      else {
        v = c.x * cosrot - c.y * sinrot
        u = c.y * cosrot + c.x * sinrot + u0
      }
      val qp = math.exp(-sBrA * v)
      if (qp == 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      val sp = 0.5 * (qp - 1 / qp)
      val tp = 0.5 * (qp + 1 / qp)
      val vp = math.sin(sBrA * u)
      val up = (vp * cosgam + sp * singam) / tp
      if (math.abs(math.abs(up) - 1) < EPS) {
        c.x = 0
        c.y = if (up < 0) -HALFPI else HALFPI
      } else {
        val ts0 = math.pow(sE / math.sqrt((1 + up) / (1 - up)), 1 / sB)
        val phi = GeoMath.phi2(ts0, e)
        if (phi == Double.PositiveInfinity) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        c.y = phi
        c.x = -sRB * math.atan2(sp * cosgam - vp * singam, math.cos(sBrA * u))
      }
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }

  // -------------------------------------------------- krovak

  private def krovakSetup(P: PJ, modified: Boolean): Unit = {
    val UQ = 1.04216856380474
    val S0 = 1.37008346281555
    // fixed Bessel ellipsoid (reference krovak.cpp:286-289). The reference
    // deliberately does NOT refresh P->ra here, so with e.g. +ellps=GRS80 the
    // inverse prepare keeps dividing by the declared ellipsoid's a while the
    // forward finalize multiplies by Bessel's a — an asymmetry its own test
    // expectations encode (visible only near the cone apex). Keep ra stale
    // to match.
    P.a = 6377397.155
    P.es = 0.006674372230614
    P.e = math.sqrt(P.es)
    if (!P.params.has("lat_0")) P.phi0 = 0.863937979737193
    if (!P.params.has("lon_0")) P.lam0 = 0.7417649320975901 - 0.308341501185665
    if (!P.params.has("k") && !P.params.has("k_0")) P.k0 = 0.9999
    val eastingNorthing = !P.params.has("czech")

    val e = P.e; val es = P.es; val a = P.a
    val alpha = math.sqrt(1 + (es * math.pow(math.cos(P.phi0), 4)) / (1 - es))
    val u0 = math.asin(math.sin(P.phi0) / alpha)
    val g = math.pow((1 + e * math.sin(P.phi0)) / (1 - e * math.sin(P.phi0)),
      alpha * e / 2)
    val tanHalf = math.tan(P.phi0 / 2 + QUARTERPI)
    if (tanHalf == 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "krovak: invalid lat_0")
    val k = math.tan(u0 / 2 + QUARTERPI) / math.pow(tanHalf, alpha) * g
    val n0 = math.sqrt(1 - es) / (1 - es * math.pow(math.sin(P.phi0), 2))
    val n = math.sin(S0)
    val rho0 = P.k0 * n0 / math.tan(S0)
    val ad = HALFPI - UQ
    val x0 = P.x0; val y0 = P.y0
    val lam0 = P.lam0

    // modified-Krovak correction (reference krovak.cpp:31-57)
    val X0 = 1089000.0; val Y0 = 654000.0
    val C = Array(2.946529277e-02, 2.515965696e-02, 1.193845912e-07,
      -4.668270147e-07, 9.233980362e-12, 1.523735715e-12, 1.696780024e-18,
      4.408314235e-18, -8.331083518e-24, -3.689471323e-24)
    def dxdy(xr: Double, yr: Double): (Double, Double) = {
      val xr2 = xr * xr; val yr2 = yr * yr
      val xr4 = xr2 * xr2; val yr4 = yr2 * yr2
      val dX = C(0) + C(2) * xr - C(3) * yr - 2 * C(5) * xr * yr + C(4) * (xr2 - yr2) +
        C(6) * xr * (xr2 - 3 * yr2) - C(7) * yr * (3 * xr2 - yr2) +
        4 * C(8) * xr * yr * (xr2 - yr2) + C(9) * (xr4 + yr4 - 6 * xr2 * yr2)
      val dY = C(1) + C(2) * yr + C(3) * xr + 2 * C(4) * xr * yr + C(5) * (xr2 - yr2) +
        C(7) * xr * (xr2 - 3 * yr2) + C(6) * yr * (3 * xr2 - yr2) -
        4 * C(9) * xr * yr * (xr2 - yr2) + C(8) * (xr4 + yr4 - 6 * xr2 * yr2)
      (dX, dY)
    }

    def fwdF(c: Coord): Unit = {
      val gfi = math.pow((1 + e * math.sin(c.y)) / (1 - e * math.sin(c.y)),
        alpha * e / 2)
      val u = 2 * (math.atan(k * math.pow(math.tan(c.y / 2 + QUARTERPI), alpha) / gfi) - QUARTERPI)
      val deltav = -c.x * alpha
      val s = math.asin(math.cos(ad) * math.sin(u) + math.sin(ad) * math.cos(u) * math.cos(deltav))
      val cosS = math.cos(s)
      if (cosS < 1e-12) { c.x = 0; c.y = 0; return }
      val d = math.asin(math.cos(u) * math.sin(deltav) / cosS)
      val eps = n * d
      val rho = rho0 * math.pow(math.tan(S0 / 2 + QUARTERPI), n) /
        math.pow(math.tan(s / 2 + QUARTERPI), n)
      var x = rho * math.cos(eps)
      var y = rho * math.sin(eps)
      if (modified) {
        val xr = x * a - X0
        val yr = y * a - Y0
        val (dX, dY) = dxdy(xr, yr)
        x -= dX / a
        y -= dY / a
      }
      // swap to (easting, northing) / (westing, southing)
      val t = x; x = y; y = t
      if (eastingNorthing) {
        x = -x - 2 * x0 / a
        y = -y - 2 * y0 / a
      }
      c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
      var x = c.x; var y = c.y
      if (eastingNorthing) {
        val ny = -y - 2 * x0 / a
        val nx = -x - 2 * y0 / a
        x = nx; y = ny
      }
      val t0 = x; x = y; y = t0
      if (modified) {
        val xr = x * a - X0
        val yr = y * a - Y0
        val (dX, dY) = dxdy(xr, yr)
        x += dX / a
        y += dY / a
      }
      val rho = math.sqrt(x * x + y * y)
      val eps = math.atan2(y, x)
      val d = eps / math.sin(S0)
      val s = if (rho == 0) HALFPI
              else 2 * (math.atan(math.pow(rho0 / rho, 1 / n) * math.tan(S0 / 2 + QUARTERPI)) - QUARTERPI)
      val u = math.asin(math.cos(ad) * math.sin(s) - math.sin(ad) * math.cos(s) * math.cos(d))
      val deltav = math.asin(math.cos(s) * math.sin(d) / math.cos(u))
      val lam = lam0 - deltav / alpha
      var fi1 = u
      var phi = 0.0
      var i = 100
      var conv = false
      while (i > 0 && !conv) {
        phi = 2 * (math.atan(math.pow(k, -1 / alpha) *
          math.pow(math.tan(u / 2 + QUARTERPI), 1 / alpha) *
          math.pow((1 + e * math.sin(fi1)) / (1 - e * math.sin(fi1)), e / 2)) - QUARTERPI)
        if (math.abs(fi1 - phi) < 1e-15) conv = true
        fi1 = phi
        i -= 1
      }
      if (!conv) c.err = ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN
      c.y = phi
      c.x = lam - lam0
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }

  def krovak(P: PJ): Unit = krovakSetup(P, modified = false)
  def modKrovak(P: PJ): Unit = krovakSetup(P, modified = true)

  // -------------------------------------------------- ob_tran

  def obTran(P: PJ): Unit = {
    val TOL = 1e-10
    val p = P.params
    val oProj = p.s("o_proj").getOrElse(
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "ob_tran: missing o_proj"))
    if (oProj == "ob_tran")
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "ob_tran: cannot rotate ob_tran")
    // build the target projection: all params except proj=ob_tran/inv, with
    // o_proj= renamed to proj= (reference ob_tran.cpp:120-162)
    val linkEntries = p.entries.flatMap {
      case ("proj", "ob_tran") => None
      case ("inv", _) => None
      case ("o_proj", v) => Some(("proj", v))
      case kv => Some(kv)
    }
    val link = Proj.create(new ParamList(linkEntries))
    link.skipFwdPrepare = true; link.skipFwdFinalize = true
    link.skipInvPrepare = true; link.skipInvFinalize = true

    val dummy = new Coord
    var lamp = 0.0; var phip = 0.0
    if (p.has("o_alpha")) {
      val lamc = p.r("o_lon_c")
      val phic = p.r("o_lat_c")
      val alpha = p.r("o_alpha")
      if (math.abs(math.abs(phic) - HALFPI) <= TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "ob_tran: |lat_c| should be < 90")
      lamp = lamc + aatan2(-math.cos(alpha), -math.sin(alpha) * math.sin(phic))
      phip = aasin(dummy, math.cos(phic) * math.sin(alpha))
    } else if (p.has("o_lat_p")) {
      lamp = p.r("o_lon_p")
      phip = p.r("o_lat_p")
    } else {
      val lam1 = p.r("o_lon_1"); val phi1 = p.r("o_lat_1")
      val lam2 = p.r("o_lon_2"); val phi2 = p.r("o_lat_2")
      if (math.abs(phi1) > HALFPI - TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "ob_tran: |lat_1| should be < 90")
      if (math.abs(phi2) > HALFPI - TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "ob_tran: |lat_2| should be < 90")
      if (math.abs(phi1 - phi2) < TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "ob_tran: lat_1 != lat_2 required")
      if (math.abs(phi1) < TOL)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "ob_tran: lat_1 should not be 0")
      lamp = math.atan2(
        math.cos(phi1) * math.sin(phi2) * math.cos(lam1) -
          math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
        math.sin(phi1) * math.cos(phi2) * math.sin(lam2) -
          math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
      phip = math.atan(-math.cos(lamp - lam1) / math.tan(phi1))
    }

    val oblique = math.abs(phip) > TOL
    val sphip = math.sin(phip); val cphip = math.cos(phip)
    val lampF = lamp
    val lk = link.kernel
    val hasFwd = link.hasCap(FWD2)
    val hasInv = link.hasCap(INV2)
    def linkFwd(c: graft.core.Coord): Unit =
      if (link.hasCap(FWD2)) lk.fwd2(c)
      else if (link.hasCap(FWD3)) lk.fwd3(c)
      else lk.fwd4(c)
    def linkInv(c: graft.core.Coord): Unit =
      if (link.hasCap(INV2)) lk.inv2(c)
      else if (link.hasCap(INV3)) lk.inv3(c)
      else lk.inv4(c)

    // speculative latlong-rotation case: no CLASSIC scaling (reference tail)
    if (link.right == IOUnits.RADIANS) P.right = IOUnits.WHATEVER

    P.kernel = new OpKernel {
      val caps = (if (hasFwd) FWD2 else 0) | (if (hasInv) INV2 else 0)

      override def fwd2(c: Coord): Unit = {
        val coslam = math.cos(c.x)
        val sinphi = math.sin(c.y)
        val cosphi = math.cos(c.y)
        if (oblique) {
          c.x = adjlon(aatan2(cosphi * math.sin(c.x),
            sphip * cosphi * coslam + cphip * sinphi) + lampF)
          c.y = aasin(c, sphip * sinphi - cphip * cosphi * coslam)
        } else {
          c.x = adjlon(aatan2(cosphi * math.sin(c.x), sinphi) + lampF)
          c.y = aasin(c, -cosphi * coslam)
        }
        linkFwd(c)
      }
      override def inv2(c: Coord): Unit = {
        linkInv(c)
        if (c.x != Double.PositiveInfinity) {
          if (oblique) {
            val lam = c.x - lampF
            val coslam = math.cos(lam)
            val sinphi = math.sin(c.y)
            val cosphi = math.cos(c.y)
            c.y = aasin(c, sphip * sinphi + cphip * cosphi * coslam)
            c.x = aatan2(cosphi * math.sin(lam), sphip * cosphi * coslam - cphip * sinphi)
          } else {
            val t = c.x - lampF
            val cosphi = math.cos(c.y)
            val sinphi = math.sin(c.y)
            c.x = aatan2(cosphi * math.sin(t), -sinphi)
            c.y = aasin(c, cosphi * math.cos(t))
          }
        }
      }
    }
  }
}
