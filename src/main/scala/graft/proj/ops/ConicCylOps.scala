package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Conic and cylindrical projections: Albers equal-area (+leac),
  * equidistant cylindrical/conic, Cassini, cylindrical equal-area, Bonne,
  * Tobler-Mercator. Math per the cited reference files (Snyder 1987). */
object ConicCylOps {
  private final val EPS10 = 1e-10
  private final val TOL7 = 1e-7

  /** aea / leac (reference src/projections/aea.cpp). */
  private def aeaSetup(P: PJ, phi1In: Double, phi2In: Double): Unit = {
    val phi1 = phi1In; val phi2 = phi2In
    if (math.abs(phi1) > HALFPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "aea: |lat_1| should be <= 90")
    if (math.abs(phi2) > HALFPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "aea: |lat_2| should be <= 90")
    if (math.abs(phi1 + phi2) < EPS10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "aea: |lat_1 + lat_2| should be > 0")
    var sinphi = math.sin(phi1)
    var n = sinphi
    var cosphi = math.cos(phi1)
    val secant = math.abs(phi1 - phi2) >= EPS10
    val ellips = P.es > 0
    val es = P.es; val e = P.e
    var ec = 0.0; var c = 0.0; var dd = 0.0; var n2 = 0.0; var rho0 = 0.0
    var auth: Authalic = null
    if (ellips) {
      auth = new Authalic(P.e, P.es, P.oneEs, P.n)
      val m1 = msfn(sinphi, cosphi, es)
      val ml1 = auth.q(sinphi)
      if (secant) {
        sinphi = math.sin(phi2); cosphi = math.cos(phi2)
        val m2 = msfn(sinphi, cosphi, es)
        val ml2 = auth.q(sinphi)
        if (ml2 == ml1)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "aea: invalid lats")
        n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
        if (n == 0)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "aea: invalid eccentricity")
      }
      ec = 1.0 - 0.5 * P.oneEs * math.log((1 - e) / (1 + e)) / e
      c = m1 * m1 + n * ml1
      dd = 1.0 / n
      rho0 = dd * math.sqrt(c - n * auth.q(math.sin(P.phi0)))
    } else {
      if (secant) n = 0.5 * (n + math.sin(phi2))
      n2 = n + n
      c = cosphi * cosphi + n2 * sinphi
      dd = 1.0 / n
      rho0 = dd * math.sqrt(c - n2 * math.sin(P.phi0))
    }
    val (nf, cf, ddf, n2f, rho0f, ecf, qpf) =
      (n, c, dd, n2, rho0, ec, if (auth != null) auth.qp else 0.0)
    val authF = auth
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(cd: Coord): Unit = {
        var rho = cf - (if (ellips) nf * authF.q(math.sin(cd.y)) else n2f * math.sin(cd.y))
        if (rho < 0) {
          cd.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        rho = ddf * math.sqrt(rho)
        val lam = cd.x * nf
        cd.x = rho * math.sin(lam)
        cd.y = rho0f - rho * math.cos(lam)
      }
      override def inv2(cd: Coord): Unit = {
        var x = cd.x
        var y = rho0f - cd.y
        var rho = math.hypot(x, y)
        if (rho != 0.0) {
          if (nf < 0) { rho = -rho; x = -x; y = -y }
          var phi = rho / ddf
          if (ellips) {
            val qs = (cf - phi * phi) / nf
            if (math.abs(ecf - math.abs(qs)) > TOL7) {
              if (math.abs(qs) > 2) {
                cd.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
              phi = authF.latInverse(math.asin(qs / qpf))
              if (phi == Double.PositiveInfinity) {
                cd.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
            } else phi = if (qs < 0) -HALFPI else HALFPI
          } else {
            val qsDiv2 = (cf - phi * phi) / n2f
            phi = if (math.abs(qsDiv2) <= 1) math.asin(qsDiv2)
                  else if (qsDiv2 < 0) -HALFPI else HALFPI
          }
          cd.y = phi
          cd.x = math.atan2(x, y) / nf
        } else {
          cd.x = 0
          cd.y = if (nf > 0) HALFPI else -HALFPI
        }
      }
    }
  }

  def aea(P: PJ): Unit =
    aeaSetup(P, P.params.r("lat_1"), P.params.r("lat_2"))

  def leac(P: PJ): Unit =
    aeaSetup(P, if (P.params.b("south")) -HALFPI else HALFPI, P.params.r("lat_1"))

  /** eqc (reference src/projections/eqc.cpp, EPSG 1028/1029). */
  def eqc(P: PJ): Unit = {
    val phi1 = P.params.r("lat_ts")
    val cosPhi1 = math.cos(phi1)
    if (cosPhi1 <= 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqc: |lat_ts| should be <= 90")
    val phi0 = P.phi0
    if (P.es != 0) {
      val sinPhi1 = math.sin(phi1)
      val nu1 = 1.0 / math.sqrt(1.0 - P.es * sinPhi1 * sinPhi1)
      val rc = nu1 * cosPhi1
      val en = enfn(P.n)
      val m0 = mlfn(phi0, math.sin(phi0), math.cos(phi0), en)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val sinphi = math.sin(c.y); val cosphi = math.cos(c.y)
          c.x = rc * c.x
          c.y = mlfn(c.y, sinphi, cosphi, en) - m0
        }
        override def inv2(c: Coord): Unit = {
          c.x = c.x / rc
          c.y = invMlfn(c.y + m0, en)
        }
      }
    } else {
      val rc = cosPhi1
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = { c.x = rc * c.x; c.y = c.y - phi0 }
        override def inv2(c: Coord): Unit = { c.x = c.x / rc; c.y = c.y + phi0 }
      }
    }
  }

  /** eqdc (reference src/projections/eqdc.cpp). */
  def eqdc(P: PJ): Unit = {
    val phi1 = P.params.r("lat_1")
    val phi2 = P.params.r("lat_2")
    if (math.abs(phi1) > HALFPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqdc: |lat_1| should be <= 90")
    if (math.abs(phi2) > HALFPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqdc: |lat_2| should be <= 90")
    if (math.abs(phi1 + phi2) < EPS10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqdc: |lat_1 + lat_2| should be > 0")
    val en = enfn(P.n)
    var sinphi = math.sin(phi1)
    var n = sinphi
    var cosphi = math.cos(phi1)
    val secant = math.abs(phi1 - phi2) >= EPS10
    val ellips = P.es > 0
    var c = 0.0; var rho0 = 0.0
    if (ellips) {
      val m1 = msfn(sinphi, cosphi, P.es)
      val ml1 = mlfn(phi1, sinphi, cosphi, en)
      if (secant) {
        sinphi = math.sin(phi2); cosphi = math.cos(phi2)
        val ml2 = mlfn(phi2, sinphi, cosphi, en)
        if (ml1 == ml2)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqdc: eccentricity too close to 1")
        n = (m1 - msfn(sinphi, cosphi, P.es)) / (ml2 - ml1)
        if (n == 0)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqdc: invalid eccentricity")
      }
      c = ml1 + m1 / n
      rho0 = c - mlfn(P.phi0, math.sin(P.phi0), math.cos(P.phi0), en)
    } else {
      if (secant) n = (cosphi - math.cos(phi2)) / (phi2 - phi1)
      if (n == 0)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "eqdc: invalid lat_1/lat_2")
      c = phi1 + math.cos(phi1) / n
      rho0 = c - P.phi0
    }
    val (nf, cf, rho0f) = (n, c, rho0)
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(cd: Coord): Unit = {
        val rho = cf - (if (ellips) mlfn(cd.y, math.sin(cd.y), math.cos(cd.y), en) else cd.y)
        val lamN = cd.x * nf
        cd.x = rho * math.sin(lamN)
        cd.y = rho0f - rho * math.cos(lamN)
      }
      override def inv2(cd: Coord): Unit = {
        var x = cd.x
        var y = rho0f - cd.y
        var rho = math.hypot(x, y)
        if (rho != 0.0) {
          if (nf < 0) { rho = -rho; x = -x; y = -y }
          var phi = cf - rho
          if (ellips) phi = invMlfn(phi, en)
          cd.y = phi
          cd.x = math.atan2(x, y) / nf
        } else {
          cd.x = 0
          cd.y = if (nf > 0) HALFPI else -HALFPI
        }
      }
    }
  }

  /** cass (reference src/projections/cass.cpp). */
  def cass(P: PJ): Unit = {
    val C1 = 1.0 / 6; val C2 = 1.0 / 120; val C3 = 1.0 / 24
    val C4 = 1.0 / 3; val C5 = 1.0 / 15
    if (P.es == 0) {
      val phi0 = P.phi0
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val x = math.asin(math.cos(c.y) * math.sin(c.x))
          val y = math.atan2(math.tan(c.y), math.cos(c.x)) - phi0
          c.x = x; c.y = y
        }
        override def inv2(c: Coord): Unit = {
          val dd = c.y + phi0
          val phi = math.asin(math.sin(dd) * math.cos(c.x))
          val lam = math.atan2(math.tan(c.x), math.cos(dd))
          c.x = lam; c.y = phi
        }
      }
    } else {
      val es = P.es
      val en = enfn(P.n)
      val m0 = mlfn(P.phi0, math.sin(P.phi0), math.cos(P.phi0), en)
      val hyperbolic = P.params.has("hyperbolic")
      def fwdFn(c: Coord): Unit = {
        val sinphi = math.sin(c.y); val cosphi = math.cos(c.y)
        val m = mlfn(c.y, sinphi, cosphi, en)
        val nuSq = 1.0 / (1.0 - es * sinphi * sinphi)
        val nu = math.sqrt(nuSq)
        val tanphi = math.tan(c.y)
        val t = tanphi * tanphi
        val a1 = c.x * cosphi
        val cc = es * (cosphi * cosphi) / (1 - es)
        val a2 = a1 * a1
        c.x = nu * a1 * (1 - a2 * t * (C1 + (8 - t + 8 * cc) * a2 * C2))
        c.y = m - m0 + nu * tanphi * a2 * (0.5 + (5 - t + 6 * cc) * a2 * C3)
        if (hyperbolic) {
          val rho = nuSq * (1 - es) * nu
          c.y -= c.y * c.y * c.y / (6 * rho * nu)
        }
      }
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = fwdFn(c)
        override def inv2(c: Coord): Unit = {
          val x = c.x; val y = c.y
          val phi1 = invMlfn(m0 + y, en)
          val tanphi1 = math.tan(phi1)
          val t1 = tanphi1 * tanphi1
          val sinphi1 = math.sin(phi1)
          val nu1Sq = 1.0 / (1.0 - es * sinphi1 * sinphi1)
          val nu1 = math.sqrt(nu1Sq)
          val rho1 = nu1Sq * (1 - es) * nu1
          val d = x / nu1
          val d2 = d * d
          val phi = phi1 - (nu1 * tanphi1 / rho1) * d2 * (0.5 - (1 + 3 * t1) * d2 * C3)
          val lam = d * (1 + t1 * d2 * (-C4 + (1 + 3 * t1) * d2 * C5)) / math.cos(phi1)
          // refine with the generic Newton inverse (reference cass.cpp)
          OpsUtil.genericInverse2d(fwdFn, c, lam, phi, 1e-12)
        }
      }
    }
  }

  /** cea (reference src/projections/cea.cpp). */
  def cea(P: PJ): Unit = {
    var t = 0.0
    if (P.params.has("lat_ts")) {
      t = P.params.r("lat_ts")
      P.k0 = math.cos(t)
      if (P.k0 < 0)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "cea: |lat_ts| should be <= 90")
    }
    if (P.es != 0) {
      val st = math.sin(t)
      P.k0 /= math.sqrt(1 - P.es * st * st)
      val auth = new Authalic(P.e, P.es, P.oneEs, P.n)
      val k0v = P.k0; val qp = auth.qp
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          c.x = k0v * c.x
          c.y = 0.5 * auth.q(math.sin(c.y)) / k0v
        }
        override def inv2(c: Coord): Unit = {
          c.y = auth.latInverse(math.asin(2 * c.y * k0v / qp))
          c.x = c.x / k0v
        }
      }
    } else {
      val k0v = P.k0
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          c.x = k0v * c.x
          c.y = math.sin(c.y) / k0v
        }
        override def inv2(c: Coord): Unit = {
          val y = c.y * k0v
          val t = math.abs(y)
          if (t - 1e-10 <= 1) {
            c.y = if (t >= 1) { if (y < 0) -HALFPI else HALFPI } else math.asin(y)
            c.x = c.x / k0v
          } else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }
    }
  }

  /** bonne (reference src/projections/bonne.cpp). */
  def bonne(P: PJ): Unit = {
    val phi1 = P.params.r("lat_1")
    if (math.abs(phi1) < EPS10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "bonne: |lat_1| should be > 0")
    if (P.es != 0) {
      val en = enfn(P.n)
      val sphi1 = math.sin(phi1)
      val cphi = math.cos(phi1)
      val m1 = mlfn(phi1, sphi1, cphi, en)
      val am1 = cphi / (math.sqrt(1 - P.es * sphi1 * sphi1) * sphi1)
      val es = P.es
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val e0 = math.sin(c.y)
          val cc = math.cos(c.y)
          val rh = am1 + m1 - mlfn(c.y, e0, cc, en)
          if (math.abs(rh) > EPS10) {
            val ee = cc * c.x / (rh * math.sqrt(1 - es * e0 * e0))
            c.x = rh * math.sin(ee)
            c.y = am1 - rh * math.cos(ee)
          } else { c.x = 0; c.y = 0 }
        }
        override def inv2(c: Coord): Unit = {
          val x = c.x
          val y = am1 - c.y
          val rh = java.lang.Math.copySign(math.hypot(x, y), phi1)
          val phi = invMlfn(am1 + m1 - rh, en)
          val absPhi = math.abs(phi)
          if (absPhi < HALFPI) {
            val sinphi = math.sin(phi)
            val lm = rh * math.sqrt(1 - es * sinphi * sinphi) / math.cos(phi)
            c.x = if (phi1 > 0) lm * math.atan2(x, y) else lm * math.atan2(-x, -y)
            c.y = phi
          } else if (absPhi - HALFPI <= EPS10) { c.x = 0; c.y = phi }
          else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }
    } else {
      val cphi1 = if (math.abs(phi1) + EPS10 >= HALFPI) 0.0 else 1.0 / math.tan(phi1)
      P.kernel = new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val rh = cphi1 + phi1 - c.y
          if (math.abs(rh) > EPS10) {
            val ee = c.x * math.cos(c.y) / rh
            c.x = rh * math.sin(ee)
            c.y = cphi1 - rh * math.cos(ee)
          } else { c.x = 0; c.y = 0 }
        }
        override def inv2(c: Coord): Unit = {
          val x = c.x
          val y = cphi1 - c.y
          val rh = java.lang.Math.copySign(math.hypot(x, y), phi1)
          val phi = cphi1 + phi1 - rh
          val absPhi = math.abs(phi)
          if (absPhi > HALFPI) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          c.y = phi
          c.x = if (HALFPI - absPhi <= EPS10) 0.0
                else {
                  val lm = rh / math.cos(phi)
                  if (phi1 > 0) lm * math.atan2(x, y) else lm * math.atan2(-x, -y)
                }
        }
      }
    }
  }

  /** tobmerc (reference src/projections/tobmerc.cpp). */
  def tobmerc(P: PJ): Unit = {
    val k0v = P.k0
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        if (math.abs(c.y) >= HALFPI) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val cosphi = math.cos(c.y)
        c.x = k0v * c.x * cosphi * cosphi
        c.y = k0v * asinh(math.tan(c.y))
      }
      override def inv2(c: Coord): Unit = {
        val phi = math.atan(math.sinh(c.y / k0v))
        val cosphi = math.cos(phi)
        c.x = c.x / k0v / (cosphi * cosphi)
        c.y = phi
      }
    }
  }
}
