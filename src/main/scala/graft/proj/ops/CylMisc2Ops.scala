package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Central/transverse/oblique cylindrics, Swiss oblique Mercator,
  * Gauss-Schreiber TM, LCC Alternative, CalCOFI lines/stations, oblated
  * equal area. Math per reference src/projections/{cc,tcc,tcea,ocea,oea,
  * somerc,gstmerc,lcca,calcofi}.cpp. */
object CylMisc2Ops {
  private final val EPS10 = 1e-10

  private def kernel2(P: PJ, fwdF: Coord => Unit, invF: Coord => Unit = null): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | (if (invF != null) INV2 else 0)
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = if (invF != null) invF(c)
    }
  }

  def cc(P: PJ): Unit = {
    def fwdF(c: Coord): Unit = {
      if (math.abs(math.abs(c.y) - HALFPI) <= EPS10) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      c.y = math.tan(c.y)
    }
    kernel2(P, fwdF, c => { c.y = math.atan(c.y) })
  }

  def tcc(P: PJ): Unit = {
    def fwdF(c: Coord): Unit = {
      val b = math.cos(c.y) * math.sin(c.x)
      val bt = 1 - b * b
      if (bt < EPS10) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      val y = math.atan2(math.tan(c.y), math.cos(c.x))
      c.x = b / math.sqrt(bt)
      c.y = y
    }
    kernel2(P, fwdF)
  }

  def tcea(P: PJ): Unit = {
    val k0 = P.k0; val phi0 = P.phi0
    kernel2(P,
      c => {
        val x = math.cos(c.y) * math.sin(c.x) / k0
        c.y = k0 * (math.atan2(math.tan(c.y), math.cos(c.x)) - phi0)
        c.x = x
      },
      c => {
        val y = c.y / k0 + phi0
        val x = c.x * k0
        val t = math.sqrt(1 - x * x)
        c.y = math.asin(t * math.sin(y))
        c.x = math.atan2(x, t * math.cos(y))
      })
  }

  def ocea(P: PJ): Unit = {
    val rok = 1.0 / P.k0
    val rtk = P.k0
    var lamP = 0.0; var phiP = 0.0
    if (P.params.has("alpha")) {
      val alpha = math.Pi + P.params.r("alpha")
      val lonz = P.params.r("lonc")
      lamP = math.atan2(-math.cos(alpha), -math.sin(P.phi0) * math.sin(alpha)) + lonz
      phiP = math.asin(math.cos(P.phi0) * math.sin(alpha))
    } else {
      val phi1 = P.params.r("lat_1"); val phi2 = P.params.r("lat_2")
      val lam1 = P.params.r("lon_1"); val lam2 = P.params.r("lon_2")
      lamP = math.atan2(
        math.cos(phi1) * math.sin(phi2) * math.cos(lam1) -
          math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
        math.sin(phi1) * math.cos(phi2) * math.sin(lam2) -
          math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
      if (lam1 == -HALFPI) lamP = -lamP
      val cosLpM1 = math.cos(lamP - lam1)
      val tanPhi1 = math.tan(phi1)
      phiP = if (tanPhi1 == 0.0) { if (cosLpM1 >= 0) -HALFPI else HALFPI }
             else math.atan(-cosLpM1 / tanPhi1)
    }
    P.lam0 = lamP + HALFPI
    val cosphi = math.cos(phiP); val sinphi = math.sin(phiP)
    kernel2(P,
      c => {
        val sl = math.sin(c.x)
        val t = math.cos(c.x)
        var x = math.atan((math.tan(c.y) * cosphi + sinphi * sl) / t)
        if (t < 0) x += math.Pi
        x *= rtk
        c.y = rok * (sinphi * math.sin(c.y) - cosphi * math.cos(c.y) * sl)
        c.x = x
      },
      c => {
        val y = c.y / rok
        val x = c.x / rtk
        val t = math.sqrt(1 - y * y)
        val s = math.sin(x)
        c.y = math.asin(y * sinphi + t * cosphi * s)
        c.x = math.atan2(t * sinphi * s - y * cosphi, t * math.cos(x))
      })
  }

  def oea(P: PJ): Unit = {
    val n = P.params.d("n")
    if (n <= 0) throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "oea: n should be > 0")
    val m = P.params.d("m")
    if (m <= 0) throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "oea: m should be > 0")
    val theta = P.params.r("theta")
    val sp0 = math.sin(P.phi0); val cp0 = math.cos(P.phi0)
    val rn = 1 / n; val rm = 1 / m
    val twoRn = 2 * rn; val twoRm = 2 * rm
    val hm = 0.5 * m; val hn = 0.5 * n
    kernel2(P,
      c => {
        val cp = math.cos(c.y); val sp = math.sin(c.y)
        val cl = math.cos(c.x)
        val az = aatan2(cp * math.sin(c.x), cp0 * sp - sp0 * cp * cl) + theta
        val shz = math.sin(0.5 * aacos(c, sp0 * sp + cp0 * cp * cl))
        val bigM = aasin(c, shz * math.sin(az))
        val bigN = aasin(c, shz * math.cos(az) * math.cos(bigM) / math.cos(bigM * twoRm))
        c.y = n * math.sin(bigN * twoRn)
        c.x = m * math.sin(bigM * twoRm) * math.cos(bigN) / math.cos(bigN * twoRn)
      },
      c => {
        val bigN = hn * aasin(c, c.y * rn)
        val bigM = hm * aasin(c, c.x * rm * math.cos(bigN * twoRn) / math.cos(bigN))
        val xp = 2 * math.sin(bigM)
        val yp = 2 * math.sin(bigN) * math.cos(bigM * twoRm) / math.cos(bigM)
        val az = aatan2(xp, yp) - theta
        val cAz = math.cos(az)
        val z = 2 * aasin(c, 0.5 * math.hypot(xp, yp))
        val sz = math.sin(z); val cz = math.cos(z)
        c.y = aasin(c, sp0 * cz + cp0 * sz * cAz)
        c.x = aatan2(sz * math.sin(az), cp0 * cz - sp0 * sz * cAz)
      })
  }

  def somerc(P: PJ): Unit = {
    val e = P.e; val es = P.es; val rOneEs = P.rOneEs
    val hlfE = 0.5 * e
    var cp = math.cos(P.phi0)
    cp *= cp
    val cConst = math.sqrt(1 + es * cp * cp * rOneEs)
    var sp = math.sin(P.phi0)
    val sinp0 = sp / cConst
    val dummy = new Coord
    val phip0 = aasin(dummy, sinp0)
    val cosp0 = math.cos(phip0)
    sp *= e
    val bigK = math.log(math.tan(QUARTERPI + 0.5 * phip0)) -
      cConst * (math.log(math.tan(QUARTERPI + 0.5 * P.phi0)) -
        hlfE * math.log((1 + sp) / (1 - sp)))
    val kR = P.k0 * math.sqrt(P.oneEs) / (1 - sp * sp)
    def fwdF(c: Coord): Unit = {
      val spv = e * math.sin(c.y)
      val phip = 2 * math.atan(math.exp(cConst * (
        math.log(math.tan(QUARTERPI + 0.5 * c.y)) -
          hlfE * math.log((1 + spv) / (1 - spv))) + bigK)) - HALFPI
      val lamp = cConst * c.x
      val cpv = math.cos(phip)
      val phipp = aasin(c, cosp0 * math.sin(phip) - sinp0 * cpv * math.cos(lamp))
      val lampp = aasin(c, cpv * math.sin(lamp) / math.cos(phipp))
      c.x = kR * lampp
      c.y = kR * math.log(math.tan(QUARTERPI + 0.5 * phipp))
    }
    def invF(c: Coord): Unit = {
      val phipp = 2 * (math.atan(math.exp(c.y / kR)) - QUARTERPI)
      val lampp = c.x / kR
      val cpv = math.cos(phipp)
      var phip = aasin(c, cosp0 * math.sin(phipp) + sinp0 * cpv * math.cos(lampp))
      val lamp = aasin(c, cpv * math.sin(lampp) / math.cos(phip))
      val con = (bigK - math.log(math.tan(QUARTERPI + 0.5 * phip))) / cConst
      var i = 6
      var conv = false
      while (i > 0 && !conv) {
        val esp = e * math.sin(phip)
        val delp = (con + math.log(math.tan(QUARTERPI + 0.5 * phip)) -
          hlfE * math.log((1 + esp) / (1 - esp))) *
          (1 - esp * esp) * math.cos(phip) * rOneEs
        phip -= delp
        if (math.abs(delp) < 1e-10) conv = true
        i -= 1
      }
      if (conv) { c.y = phip; c.x = lamp / cConst }
      else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
    }
    kernel2(P, fwdF, invF)
  }

  def gstmerc(P: PJ): Unit = {
    val e = P.e; val es = P.es
    val n1 = math.sqrt(1 + es * math.pow(math.cos(P.phi0), 4.0) / (1 - es))
    val phic = math.asin(math.sin(P.phi0) / n1)
    val cConst = math.log(tsfn(-phic, -math.sin(P.phi0) / n1, 0.0)) -
      n1 * math.log(tsfn(-P.phi0, -math.sin(P.phi0), e))
    val n2 = P.k0 * P.a * math.sqrt(1 - es) /
      (1 - es * math.sin(P.phi0) * math.sin(P.phi0))
    val xs = 0.0
    val ys = -n2 * phic
    val a = P.a; val ra = P.ra
    kernel2(P,
      c => {
        val l = n1 * c.x
        val ls = cConst + n1 * math.log(tsfn(-c.y, -math.sin(c.y), e))
        val sinLs1 = math.sin(l) / math.cosh(ls)
        val ls1 = math.log(tsfn(-math.asin(sinLs1), -sinLs1, 0.0))
        c.x = (xs + n2 * ls1) * ra
        c.y = (ys + n2 * math.atan(math.sinh(ls) / math.cos(l))) * ra
      },
      c => {
        val l = math.atan(math.sinh((c.x * a - xs) / n2) /
          math.cos((c.y * a - ys) / n2))
        val sinC = math.sin((c.y * a - ys) / n2) / math.cosh((c.x * a - xs) / n2)
        val lc = math.log(tsfn(-math.asin(sinC), -sinC, 0.0))
        c.x = l / n1
        c.y = -phi2(math.exp((lc - cConst) / n1), e)
      })
  }

  def lcca(P: PJ): Unit = {
    val en = enfn(P.n)
    if (P.phi0 == 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lcca: lat_0 should not be 0")
    val l = math.sin(P.phi0)
    val m0 = mlfn(P.phi0, l, math.cos(P.phi0), en)
    val s2p0 = l * l
    var r0 = 1.0 / (1 - P.es * s2p0)
    val n0 = math.sqrt(r0)
    r0 *= P.oneEs * n0
    val tan0 = math.tan(P.phi0)
    val rr0 = n0 / tan0
    val cc = 1.0 / (6 * r0 * n0)
    val k0 = P.k0
    @inline def fS(s: Double): Double = s * (1 + s * s * cc)
    @inline def fSp(s: Double): Double = 1 + 3 * s * s * cc
    def invF(c: Coord): Unit = {
      val x = c.x / k0
      val y = c.y / k0
      val theta = math.atan2(x, rr0 - y)
      val dr = y - x * math.tan(0.5 * theta)
      c.x = theta / l
      var s = dr
      var i = 10
      var conv = false
      while (i > 0 && !conv) {
        val dif = (fS(s) - dr) / fSp(s)
        s -= dif
        if (math.abs(dif) < 1e-12) conv = true
        i -= 1
      }
      if (!conv) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      c.y = invMlfn(s + m0, en)
    }
    kernel2(P,
      c => {
        val s = mlfn(c.y, math.sin(c.y), math.cos(c.y), en) - m0
        val dr = fS(s)
        val r = rr0 - dr
        val laml = c.x * l
        c.x = k0 * (r * math.sin(laml))
        c.y = k0 * (rr0 - r * math.cos(laml))
      }, invF)
  }

  def calcofi(P: PJ): Unit = {
    val DEG_TO_LINE = 5; val DEG_TO_STATION = 15
    val LINE_TO_RAD = 0.0034906585039886592
    val STATION_TO_RAD = 0.0011635528346628863
    val PT_O_LINE = 80.0; val PT_O_STATION = 60.0
    val PT_O_LAMBDA = -2.1144663887911301
    val PT_O_PHI = 0.59602993955606354
    val ROT = 0.52359877559829882
    // kernel outputs line/station numbers directly: neutralize scaling
    P.lam0 = 0; P.ra = 1; P.a = 1; P.x0 = 0; P.y0 = 0; P.over = true
    val es = P.es; val e = P.e
    if (es != 0) {
      def fwdF(c: Coord): Unit = {
        if (math.abs(math.abs(c.y) - HALFPI) <= EPS10) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val x0 = c.x
        val y0 = -math.log(tsfn(c.y, math.sin(c.y), e))
        val oy = -math.log(tsfn(PT_O_PHI, math.sin(PT_O_PHI), e))
        val l1 = (y0 - oy) * math.tan(ROT)
        val l2 = -x0 - l1 + PT_O_LAMBDA
        var ry = l2 * math.cos(ROT) * math.sin(ROT) + y0
        ry = phi2(math.exp(-ry), e)
        c.x = PT_O_LINE - RAD2DEG * (ry - PT_O_PHI) * DEG_TO_LINE / math.cos(ROT)
        c.y = PT_O_STATION + RAD2DEG * (ry - c.y) * DEG_TO_STATION / math.sin(ROT)
      }
      def invF(c: Coord): Unit = {
        val ry = PT_O_PHI - LINE_TO_RAD * (c.x - PT_O_LINE) * math.cos(ROT)
        val phi = ry - STATION_TO_RAD * (c.y - PT_O_STATION) * math.sin(ROT)
        val oy = -math.log(tsfn(PT_O_PHI, math.sin(PT_O_PHI), e))
        val rym = -math.log(tsfn(ry, math.sin(ry), e))
        val xym = -math.log(tsfn(phi, math.sin(phi), e))
        val l1 = (xym - oy) * math.tan(ROT)
        val l2 = (rym - xym) / (math.cos(ROT) * math.sin(ROT))
        c.x = PT_O_LAMBDA - (l1 + l2)
        c.y = phi
      }
      kernel2(P, fwdF, invF)
    } else {
      def fwdF(c: Coord): Unit = {
        if (math.abs(math.abs(c.y) - HALFPI) <= EPS10) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val x0 = c.x
        val y0 = math.log(math.tan(QUARTERPI + 0.5 * c.y))
        val oy = math.log(math.tan(QUARTERPI + 0.5 * PT_O_PHI))
        val l1 = (y0 - oy) * math.tan(ROT)
        val l2 = -x0 - l1 + PT_O_LAMBDA
        var ry = l2 * math.cos(ROT) * math.sin(ROT) + y0
        ry = HALFPI - 2 * math.atan(math.exp(-ry))
        c.x = PT_O_LINE - RAD2DEG * (ry - PT_O_PHI) * DEG_TO_LINE / math.cos(ROT)
        c.y = PT_O_STATION + RAD2DEG * (ry - c.y) * DEG_TO_STATION / math.sin(ROT)
      }
      def invF(c: Coord): Unit = {
        val ry = PT_O_PHI - LINE_TO_RAD * (c.x - PT_O_LINE) * math.cos(ROT)
        val phi = ry - STATION_TO_RAD * (c.y - PT_O_STATION) * math.sin(ROT)
        val oy = math.log(math.tan(QUARTERPI + 0.5 * PT_O_PHI))
        val rym = math.log(math.tan(QUARTERPI + 0.5 * ry))
        val xym = math.log(math.tan(QUARTERPI + 0.5 * phi))
        val l1 = (xym - oy) * math.tan(ROT)
        val l2 = (rym - xym) / (math.cos(ROT) * math.sin(ROT))
        c.x = PT_O_LAMBDA - (l1 + l2)
        c.y = phi
      }
      kernel2(P, fwdF, invF)
    }
  }
}
