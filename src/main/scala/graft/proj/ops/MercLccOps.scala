package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Mercator / Web Mercator / Lambert Conformal Conic kernels.
  * Math per reference src/projections/merc.cpp:10-84 and
  * src/projections/lcc.cpp:7-171 (Snyder 1987 eqs. 7-x / 15-x).
  */
object MercLccOps {
  private final val EPS10 = 1e-10

  def merc(P: PJ): Unit = {
    var k0 = P.k0
    if (P.params.has("lat_ts")) {
      val phits = math.abs(P.params.r("lat_ts"))
      if (phits >= HALFPI)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
          "merc: |lat_ts| should be <= 90")
      k0 = if (P.es != 0) msfn(math.sin(phits), math.cos(phits), P.es)
           else math.cos(phits)
    }
    P.k0 = k0
    installMerc(P, spherical = P.es == 0)
  }

  /** webmerc: spherical kernel with k0 = 1 on the given ellipsoid's a
    * (reference merc.cpp:76-84). */
  def webmerc(P: PJ): Unit = {
    P.k0 = 1.0
    installMerc(P, spherical = true)
  }

  private def installMerc(P: PJ, spherical: Boolean): Unit = {
    val k0 = P.k0; val e = P.e
    P.kernel =
      if (spherical) new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          c.x = k0 * c.x
          c.y = k0 * asinh(math.tan(c.y))
        }
        override def inv2(c: Coord): Unit = {
          c.y = math.atan(math.sinh(c.y / k0))
          c.x = c.x / k0
        }
      } else new OpKernel {
        val caps = FWD2 | INV2
        override def fwd2(c: Coord): Unit = {
          val sphi = math.sin(c.y); val cphi = math.cos(c.y)
          c.x = k0 * c.x
          c.y = k0 * (asinh(sphi / cphi) - e * atanh(e * sphi))
        }
        override def inv2(c: Coord): Unit = {
          c.y = math.atan(sinhpsi2tanphi(math.sinh(c.y / k0), e))
          c.x = c.x / k0
        }
      }
  }

  def lcc(P: PJ): Unit = {
    val params = P.params
    val phi1 = params.r("lat_1")
    var phi2 = phi1
    if (params.has("lat_2")) phi2 = params.r("lat_2")
    else if (!params.has("lat_0")) P.phi0 = phi1

    if (math.abs(phi1 + phi2) < EPS10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "lcc: |lat_1 + lat_2| should be > 0")
    var n = math.sin(phi1)
    val cosphi1 = math.cos(phi1)
    if (math.abs(cosphi1) < EPS10 || math.abs(phi1) >= HALFPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lcc: |lat_1| should be < 90")
    if (math.abs(math.cos(phi2)) < EPS10 || math.abs(phi2) >= HALFPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lcc: |lat_2| should be < 90")

    val secant = math.abs(phi1 - phi2) >= EPS10
    val es = P.es; val e = P.e
    var c0 = 0.0; var rho0 = 0.0
    if (es != 0) {
      val m1 = msfn(math.sin(phi1), cosphi1, es)
      val ml1 = tsfn(phi1, math.sin(phi1), e)
      if (secant) {
        val sinphi2 = math.sin(phi2)
        var nn = math.log(m1 / msfn(sinphi2, math.cos(phi2), es))
        if (nn == 0)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lcc: invalid eccentricity")
        val ml2 = tsfn(phi2, sinphi2, e)
        val denom = math.log(ml1 / ml2)
        if (denom == 0)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lcc: invalid eccentricity")
        n = nn / denom
      }
      rho0 = m1 * math.pow(ml1, -n) / n
      c0 = rho0
      rho0 *= (if (math.abs(math.abs(P.phi0) - HALFPI) < EPS10) 0.0
               else math.pow(tsfn(P.phi0, math.sin(P.phi0), e), n))
    } else {
      if (secant)
        n = math.log(cosphi1 / math.cos(phi2)) /
          math.log(math.tan(QUARTERPI + 0.5 * phi2) / math.tan(QUARTERPI + 0.5 * phi1))
      if (n == 0)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
          "lcc: |lat_1 + lat_2| should be > 0")
      c0 = cosphi1 * math.pow(math.tan(QUARTERPI + 0.5 * phi1), n) / n
      rho0 = if (math.abs(math.abs(P.phi0) - HALFPI) < EPS10) 0.0
             else c0 * math.pow(math.tan(QUARTERPI + 0.5 * P.phi0), -n)
    }

    val nF = n; val cF = c0; val rho0F = rho0; val k0 = P.k0
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val phi = c.y
        var rho = 0.0
        if (math.abs(math.abs(phi) - HALFPI) < EPS10) {
          if (phi * nF <= 0) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return
          }
          rho = 0.0
        } else {
          rho = cF * (if (es != 0) math.pow(tsfn(phi, math.sin(phi), e), nF)
                      else math.pow(math.tan(QUARTERPI + 0.5 * phi), -nF))
        }
        val lam = c.x * nF
        c.x = k0 * (rho * math.sin(lam))
        c.y = k0 * (rho0F - rho * math.cos(lam))
      }
      override def inv2(c: Coord): Unit = {
        var x = c.x / k0
        var y = c.y / k0
        y = rho0F - y
        var rho = math.hypot(x, y)
        if (rho != 0) {
          if (nF < 0) { rho = -rho; x = -x; y = -y }
          if (es != 0) {
            val phi = phi2Fn(math.pow(rho / cF, 1.0 / nF), e)
            if (phi == Double.PositiveInfinity) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return
            }
            c.y = phi
          } else
            c.y = 2.0 * math.atan(math.pow(cF / rho, 1.0 / nF)) - HALFPI
          c.x = math.atan2(x, y) / nF
        } else {
          c.x = 0.0
          c.y = if (nF > 0) HALFPI else -HALFPI
        }
      }
    }
  }

  @inline private def phi2Fn(ts0: Double, e: Double): Double = phi2(ts0, e)
}
