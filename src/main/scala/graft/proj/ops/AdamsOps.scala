package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Adams/Guyou/Peirce square-world projections and the Spilhaus ocean map.
  *
  * Math per reference src/projections/adams.cpp (elliptic integral
  * ell_int_5 :81-106, forward :108-295, Newton inverses :297-386, setup
  * :388-457) and src/projections/spilhaus.cpp (oblique conformal-sphere
  * rotation feeding adams_ws2, :43-165). The elliptic-integral Chebyshev
  * coefficients are the published Snyder values.
  */
object AdamsOps {
  private final val TOL = 1e-9
  private final val RSQRT2 = 0.7071067811865475244008443620
  /** complete elliptic integral K(m=0.5) (doubled shift distance basis) */
  private final val SHD = 1.8540746773013719 * 2

  /** elliptic integral of the first kind at k^2 = 0.5 (Chebyshev series). */
  private def ellInt5(phi: Double): Double = {
    val C0 = 2.19174570831038
    val C = Array(-8.58691003636495e-07, 2.02692115653689e-07,
      3.12960480765314e-05, 5.30394739921063e-05, -0.0012804644680613,
      -0.00575574836830288, 0.0914203033408211)
    var y = phi * (2 / math.Pi)
    y = 2 * y * y - 1
    val y2 = 2 * y
    var d1 = 0.0; var d2 = 0.0
    var i = 0
    while (i < C.length) {
      val tmp = d1
      d1 = y2 * d1 - d2 + C(i)
      d2 = tmp
      i += 1
    }
    phi * (y * d1 - d2 + 0.5 * C0)
  }

  private final val GUYOU = 0
  private final val PEIRCE_Q = 1
  private final val ADAMS_HEMI = 2
  private final val ADAMS_WS1 = 3
  private final val ADAMS_WS2 = 4

  // peirce_q shapes
  private final val SQUARE = 0; private final val DIAMOND = 1
  private final val NHEMI = 2; private final val SHEMI = 3
  private final val HORIZONTAL = 4; private final val VERTICAL = 5

  /** forward kernel shared by the five modes; returns false on domain error. */
  private def adamsFwd(mode: Int, pqshape: Int, scrollx: Double, scrolly: Double,
                       c: Coord): Boolean = {
    val lam = c.x; val phi = c.y
    var a = 0.0; var b = 0.0
    var sm = false; var sn = false
    mode match {
      case GUYOU =>
        if (math.abs(lam) - TOL > HALFPI) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return false }
        if (math.abs(math.abs(phi) - HALFPI) < TOL) {
          c.x = 0; c.y = if (phi < 0) -1.85407 else 1.85407; return true
        }
        val sl = math.sin(lam); val sp = math.sin(phi); val cp = math.cos(phi)
        a = aacos(c, (cp * sl - sp) * RSQRT2)
        b = aacos(c, (cp * sl + sp) * RSQRT2)
        sm = lam < 0; sn = phi < 0
      case PEIRCE_Q =>
        if (pqshape == NHEMI && phi < -TOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return false }
        if (pqshape == SHEMI && phi > -TOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return false }
        val sl = math.sin(lam); val cl = math.cos(lam); val cp = math.cos(phi)
        a = aacos(c, cp * (sl + cl) * RSQRT2)
        b = aacos(c, cp * (sl - cl) * RSQRT2)
        sm = sl < 0; sn = cl > 0
      case ADAMS_HEMI =>
        val sp = math.sin(phi)
        if (math.abs(lam) - TOL > HALFPI) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return false }
        var a0 = math.cos(phi) * math.sin(lam)
        sm = sp + a0 < 0; sn = sp - a0 < 0
        a = aacos(c, a0)
        b = HALFPI - phi
      case ADAMS_WS1 =>
        val sp = math.tan(0.5 * phi)
        val b0 = math.cos(aasin(c, sp)) * math.sin(0.5 * lam)
        a = aacos(c, (b0 - sp) * RSQRT2)
        b = aacos(c, (b0 + sp) * RSQRT2)
        sm = lam < 0; sn = phi < 0
      case _ => // ADAMS_WS2
        val spp = math.tan(0.5 * phi)
        val a0 = math.cos(aasin(c, spp)) * math.sin(0.5 * lam)
        sm = spp + a0 < 0; sn = spp - a0 < 0
        b = aacos(c, spp)
        a = aacos(c, a0)
    }
    var m = aasin(c, math.sqrt(1 + math.min(0.0, math.cos(a + b))))
    if (sm) m = -m
    var n = aasin(c, math.sqrt(math.abs(1 - math.max(0.0, math.cos(a - b)))))
    if (sn) n = -n
    var x = ellInt5(m)
    var y = ellInt5(n)

    if (mode == PEIRCE_Q) {
      if (pqshape == SQUARE || pqshape == DIAMOND) {
        if (phi < 0) { // fold the southern hemisphere out to quincunx corners
          if (lam < -0.75 * math.Pi) y = SHD - y
          if (lam < -0.25 * math.Pi && lam >= -0.75 * math.Pi) x = -SHD - x
          if (lam < 0.25 * math.Pi && lam >= -0.25 * math.Pi) y = -SHD - y
          if (lam < 0.75 * math.Pi && lam >= 0.25 * math.Pi) x = SHD - x
          if (lam >= 0.75 * math.Pi) y = SHD - y
        }
      }
      if (pqshape == SQUARE) {
        val t = x; x = RSQRT2 * (x - y); y = RSQRT2 * (t + y)
      }
      if (pqshape == HORIZONTAL) {
        if (phi < 0) x = SHD - x
        x -= SHD / 2
      }
      if (pqshape == VERTICAL) {
        if (phi < 0) y = SHD - y
        y -= SHD / 2
      }
      if (scrollx != 0.0 && pqshape == HORIZONTAL) {
        val xscale = 2.0; val xthresh = SHD / 2
        x += scrollx * (xthresh * 2 * xscale)
        if (x >= xthresh * xscale) x -= SHD * xscale
        else if (x < -(xthresh * xscale)) x += SHD * xscale
      }
      if (scrolly != 0.0 && pqshape == VERTICAL) {
        val yscale = 2.0; val ythresh = SHD / 2
        y += scrolly * (ythresh * 2 * yscale)
        if (y >= ythresh * yscale) y -= SHD * yscale
        else if (y < -(ythresh * yscale)) y += SHD * yscale
      }
    }
    if (mode == ADAMS_HEMI || mode == ADAMS_WS2) { // rotate 45 deg
      val t = x; x = RSQRT2 * (x - y); y = RSQRT2 * (t + y)
    }
    c.x = x; c.y = y
    true
  }

  private def setup(P: PJ, mode: Int): Unit = {
    P.es = 0; P.e = 0
    var pqshape = DIAMOND
    var scrollx = 0.0; var scrolly = 0.0
    if (mode == PEIRCE_Q) {
      P.params.s("shape").getOrElse("diamond") match {
        case "square" => pqshape = SQUARE
        case "diamond" => pqshape = DIAMOND
        case "nhemisphere" => pqshape = NHEMI
        case "shemisphere" => pqshape = SHEMI
        case "horizontal" =>
          pqshape = HORIZONTAL
          if (P.params.has("scrollx")) {
            scrollx = P.params.d("scrollx")
            if (scrollx > 1 || scrollx < -1)
              throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
                "peirce_q: |scrollx| must be within [-1,1]")
          }
        case "vertical" =>
          pqshape = VERTICAL
          if (P.params.has("scrolly")) {
            scrolly = P.params.d("scrolly")
            if (scrolly > 1 || scrolly < -1)
              throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
                "peirce_q: |scrolly| must be within [-1,1]")
          }
        case _ => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
          "peirce_q: invalid shape")
      }
    }
    val shape = pqshape; val sx = scrollx; val sy = scrolly
    val hasInv = mode == ADAMS_WS2 ||
      (mode == PEIRCE_Q && (shape == SQUARE || shape == DIAMOND))
    P.kernel = new OpKernel {
      val caps = if (hasInv) FWD2 | INV2 else FWD2
      override def fwd2(c: Coord): Unit = { adamsFwd(mode, shape, sx, sy, c); () }
      override def inv2(c: Coord): Unit = {
        val x = c.x; val y = c.y
        var lam0 = 0.0; var phi0 = 0.0
        if (mode == ADAMS_WS2) {
          // rough seed from the map corners (reference :305-317)
          phi0 = math.max(math.min(y / 2.62181347, 1.0), -1.0) * HALFPI
          lam0 = if (math.abs(phi0) >= HALFPI) 0
            else math.max(math.min(x / 2.62205760 / math.cos(phi0), 1.0), -1.0) * math.Pi
        } else if (shape == SQUARE) {
          if (x == 0 && y < 0) {
            lam0 = -math.Pi / 4
            if (math.abs(y) < 2.622057580396) phi0 = math.Pi / 4
          } else if (x > 0 && math.abs(y) < 1e-7) lam0 = math.Pi / 4
          else if (x < 0 && math.abs(y) < 1e-7) {
            lam0 = -3 * math.Pi / 4
            phi0 = HALFPI / 2.622057574224 * x + HALFPI
          } else if (math.abs(x) < 1e-7 && y > 0) lam0 = 3 * math.Pi / 4
          else if (x >= 0 && y <= 0) {
            lam0 = 0
            if (x == 0 && y == 0) { c.x = 0; c.y = HALFPI; return }
          } else if (x >= 0 && y >= 0) lam0 = HALFPI
          else if (x <= 0 && y >= 0) lam0 = if (math.abs(x) < math.abs(y)) math.Pi * 0.9 else -math.Pi * 0.9
          else lam0 = -HALFPI
        } else { // peirce diamond
          if (x >= 0 && y <= 0) {
            lam0 = math.Pi / 4
            if (x > 0 && y == 0) { lam0 = HALFPI; phi0 = 0 }
            else if (x == 0 && y == 0) { c.x = 0; c.y = HALFPI; return }
            else if (x == 0 && y < 0) { lam0 = 0; phi0 = math.Pi / 4 }
          } else if (x >= 0 && y >= 0) lam0 = 3 * math.Pi / 4
          else if (x <= 0 && y >= 0) lam0 = -3 * math.Pi / 4
          else lam0 = -math.Pi / 4
          if (math.abs(x) > 1.8540746773013719 + 1e-3 ||
              math.abs(y) > 1.8540746773013719 + 1e-3) phi0 = -math.Pi / 4
        }
        if (!OpsUtil.genericInverse2d(w => { adamsFwd(mode, shape, sx, sy, w); () },
            c, lam0, phi0, 1e-10))
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
      }
    }
  }

  def guyou(P: PJ): Unit = setup(P, GUYOU)
  def peirceQ(P: PJ): Unit = setup(P, PEIRCE_Q)
  def adamsHemi(P: PJ): Unit = setup(P, ADAMS_HEMI)
  def adamsWs1(P: PJ): Unit = setup(P, ADAMS_WS1)
  def adamsWs2(P: PJ): Unit = setup(P, ADAMS_WS2)

  // -------------------------------------------------- spilhaus

  /** conformal latitude chi(phi) (reference src/latitudes.cpp:18-33). */
  private def conformalLat(phi: Double, e: Double): Double = {
    if (e == 0) return phi
    val sphi = math.sin(phi); val cphi = math.cos(phi)
    math.atan(math.sinh(asinh(sphi / cphi) - e * atanh(e * sphi)))
  }
  private def conformalLatInverse(chi: Double, e: Double): Double =
    if (e == 0) chi else math.atan(sinhpsi2tanphi(math.tan(chi), e))

  /** Spilhaus world-ocean map: oblique rotation on the conformal sphere
    * into an Adams WS2 square (reference src/projections/spilhaus.cpp). */
  def spilhaus(P: PJ): Unit = {
    val e = P.e; val es = P.es
    if (!P.params.has("lon_0")) P.lam0 = 66.94970198 * DEG2RAD
    if (!P.params.has("lat_0")) P.phi0 = -49.56371678 * DEG2RAD
    val azimuth = if (P.params.has("azi")) P.params.r("azi") else 40.17823482 * DEG2RAD
    val rotation = if (P.params.has("rot")) P.params.r("rot") else 45 * DEG2RAD
    val cosrot = math.cos(rotation); val sinrot = math.sin(rotation)
    val chi0 = conformalLat(P.phi0, e)
    val sinalpha = -math.cos(chi0) * math.cos(azimuth)
    val cosalpha = math.sqrt(1 - sinalpha * sinalpha)
    val lambda0 = math.atan2(math.tan(azimuth), -math.sin(chi0))
    val beta = math.Pi + math.atan2(-math.sin(azimuth), -math.tan(chi0))
    val distortion = math.cos(P.phi0) /
      math.sqrt(1 - es * math.sin(P.phi0) * math.sin(P.phi0)) / math.cos(chi0)
    val k0 = P.k0

    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val chi = conformalLat(c.y, e)
        val cosChi = math.cos(chi); val sinChi = math.sin(chi)
        val coslam = math.cos(c.x - lambda0); val sinlam = math.sin(c.x - lambda0)
        val w = new Coord
        w.y = aasin(c, sinalpha * sinChi - cosalpha * cosChi * coslam)
        var lamA = beta + math.atan2(cosChi * sinlam,
          sinalpha * cosChi * coslam + cosalpha * sinChi)
        while (lamA > math.Pi) lamA -= 2 * math.Pi
        while (lamA < -math.Pi) lamA += 2 * math.Pi
        w.x = lamA
        adamsFwd(ADAMS_WS2, DIAMOND, 0, 0, w)
        val factor = distortion * k0
        c.x = -(w.x * cosrot + w.y * sinrot) * factor
        c.y = -(w.x * -sinrot + w.y * cosrot) * factor
      }
      override def inv2(c: Coord): Unit = {
        val factor = 1.0 / (distortion * k0)
        val xa = -(c.x * cosrot + c.y * -sinrot) * factor
        val ya = -(c.x * sinrot + c.y * cosrot) * factor
        val w = new Coord
        w.set(xa, ya, 0, 0)
        // adams_ws2 inverse: Newton from the corner seed
        val phiSeed = math.max(math.min(ya / 2.62181347, 1.0), -1.0) * HALFPI
        val lamSeed = if (math.abs(phiSeed) >= HALFPI) 0.0
          else math.max(math.min(xa / 2.62205760 / math.cos(phiSeed), 1.0), -1.0) * math.Pi
        if (!OpsUtil.genericInverse2d(v => { adamsFwd(ADAMS_WS2, DIAMOND, 0, 0, v); () },
            w, lamSeed, phiSeed, 1e-10)) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val cosPhiS = math.cos(w.y); val sinPhiS = math.sin(w.y)
        val coslamS = math.cos(w.x - beta); val sinlamS = math.sin(w.x - beta)
        var phi = aasin(c, sinalpha * sinPhiS + cosalpha * cosPhiS * coslamS)
        val lam = lambda0 + aatan2(cosPhiS * sinlamS,
          sinalpha * cosPhiS * coslamS - cosalpha * sinPhiS)
        phi = conformalLatInverse(phi, e)
        c.x = lam; c.y = phi
      }
    }
  }
}
