package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Complex-polynomial projections: modified stereographics (Miller/Lee
  * oblated, GS48, Alaska, GS50), New Zealand Map Grid, and the bipolar
  * conic. Math per reference src/zpoly1.cpp, src/projections/mod_ster.cpp,
  * nzmg.cpp, bipc.cpp (Snyder 1987 "Map Projections — A Working Manual"). */
object ZPolyOps {

  /** complex Horner with C_0 = 0 (reference pj_zpoly1); coefficients as
    * flat [re0, im0, re1, im1, ...] for C_1..C_n at indices 0..n-1.
    * Returns (re, im). */
  def zpoly1(zr: Double, zi: Double, c: Array[Double]): (Double, Double) = {
    var n = c.length / 2 - 1
    var ar = c(2 * n); var ai = c(2 * n + 1)
    while (n > 0) {
      n -= 1
      val t = ar
      ar = c(2 * n) + zr * t - zi * ai
      ai = c(2 * n + 1) + zr * ai + zi * t
    }
    val t = ar
    (zr * t - zi * ai, zr * ai + zi * t)
  }

  /** complex Horner + derivative (reference pj_zpolyd1). Returns
    * (re, im, dre, dim). */
  def zpolyd1(zr: Double, zi: Double, c: Array[Double]): (Double, Double, Double, Double) = {
    var n = c.length / 2 - 1
    var ar = c(2 * n); var ai = c(2 * n + 1)
    var br = ar; var bi = ai
    var first = true
    while (n > 0) {
      n -= 1
      if (first) first = false
      else {
        val t = br
        br = ar + zr * t - zi * bi
        bi = ai + zr * bi + zi * t
      }
      val t = ar
      ar = c(2 * n) + zr * t - zi * ai
      ai = c(2 * n + 1) + zr * ai + zi * t
    }
    val tb = br
    br = ar + zr * tb - zi * bi
    bi = ai + zr * bi + zi * tb
    val t = ar
    (zr * t - zi * ai, zr * ai + zi * t, br, bi)
  }

  // -------------------------------------------------- mod_ster family

  private def modSterSetup(P: PJ, coeff: Array[Double]): Unit = {
    val EPSLN = 1e-12
    val e = P.e
    val chio =
      if (P.es != 0) {
        val esphi = e * math.sin(P.phi0)
        2 * math.atan(math.tan((HALFPI + P.phi0) * 0.5) *
          math.pow((1 - esphi) / (1 + esphi), e * 0.5)) - HALFPI
      } else P.phi0
    val schio = math.sin(chio); val cchio = math.cos(chio)
    val phi0 = P.phi0

    def fwdF(c: Coord): Unit = {
      val sinlon = math.sin(c.x); val coslon = math.cos(c.x)
      val esphi = e * math.sin(c.y)
      val chi = 2 * math.atan(math.tan((HALFPI + c.y) * 0.5) *
        math.pow((1 - esphi) / (1 + esphi), e * 0.5)) - HALFPI
      val schi = math.sin(chi); val cchi = math.cos(chi)
      val denom = 1 + schio * schi + cchio * cchi * coslon
      if (denom == 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      val s = 2 / denom
      val pr = s * cchi * sinlon
      val pi = s * (cchio * schi - schio * cchi * coslon)
      val (x, y) = zpoly1(pr, pi, coeff)
      c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
      var pr = c.x; var pi = c.y
      var nn = 20
      var conv = false
      while (nn > 0 && !conv) {
        val (fr0, fi0, fpr, fpi) = zpolyd1(pr, pi, coeff)
        val fr = fr0 - c.x
        val fi = fi0 - c.y
        val den = fpr * fpr + fpi * fpi
        val dpr = -(fr * fpr + fi * fpi) / den
        val dpi = -(fi * fpr - fr * fpi) / den
        pr += dpr; pi += dpi
        if (math.abs(dpr) + math.abs(dpi) <= EPSLN) conv = true
        nn -= 1
      }
      if (!conv && nn == 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      val rh = math.hypot(pr, pi)
      val z = 2 * math.atan(0.5 * rh)
      val sinz = math.sin(z); val cosz = math.cos(z)
      if (math.abs(rh) <= EPSLN) { c.x = 0; c.y = phi0; return }
      val chi = aasin(c, cosz * schio + pi * sinz * cchio / rh)
      var phi = chi
      var i = 20
      var conv2 = false
      while (i > 0 && !conv2) {
        val esphi = e * math.sin(phi)
        val dphi = 2 * math.atan(math.tan((HALFPI + chi) * 0.5) *
          math.pow((1 + esphi) / (1 - esphi), e * 0.5)) - HALFPI - phi
        phi += dphi
        if (math.abs(dphi) <= EPSLN) conv2 = true
        i -= 1
      }
      if (!conv2 && i == 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      c.y = phi
      c.x = math.atan2(pr * sinz, rh * cchio * cosz - pi * schio * sinz)
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }

  def milOs(P: PJ): Unit = {
    P.lam0 = 20 * DEG2RAD; P.phi0 = 18 * DEG2RAD; P.es = 0
    modSterSetup(P, Array(0.924500, 0, 0, 0, 0.019430, 0))
  }

  def leeOs(P: PJ): Unit = {
    P.lam0 = -165 * DEG2RAD; P.phi0 = -10 * DEG2RAD; P.es = 0
    modSterSetup(P, Array(0.721316, 0, 0, 0, -0.0088162, -0.00617325))
  }

  def gs48(P: PJ): Unit = {
    P.lam0 = -96 * DEG2RAD; P.phi0 = 39 * DEG2RAD; P.es = 0; P.a = 6370997.0
    P.ra = 1 / P.a
    modSterSetup(P, Array(0.98879, 0, 0, 0, -0.050909, 0, 0, 0, 0.075528, 0))
  }

  def alsk(P: PJ): Unit = {
    P.lam0 = -152 * DEG2RAD; P.phi0 = 64 * DEG2RAD
    val coeff =
      if (P.es != 0) {
        P.a = 6378206.4; P.es = 0.00676866; P.e = math.sqrt(P.es)
        Array(.9945303, 0, .0052083, -.0027404, .0072721, .0048181,
          -.0151089, -.1932526, .0642675, -.1381226, .3582802, -.2884586)
      } else {
        P.a = 6370997.0
        Array(.9972523, 0, .0052513, -.0041175, .0074606, .0048125,
          -.0153783, -.1968253, .0636871, -.1408027, .3660976, -.2937382)
      }
    P.ra = 1 / P.a
    modSterSetup(P, coeff)
  }

  def gs50(P: PJ): Unit = {
    P.lam0 = -120 * DEG2RAD; P.phi0 = 45 * DEG2RAD
    val coeff =
      if (P.es != 0) {
        P.a = 6378206.4; P.es = 0.00676866; P.e = math.sqrt(P.es)
        Array(.9827497, 0, .0210669, .0053804, -.1031415, -.0571664,
          -.0323337, -.0322847, .0502303, .1211983, .0251805, .0895678,
          -.0012315, -.1416121, .0072202, -.1317091, -.0194029, .0759677,
          -.0210072, .0834037)
      } else {
        P.a = 6370997.0
        Array(.9842990, 0, .0211642, .0037608, -.1036018, -.0575102,
          -.0329095, -.0320119, .0499471, .1223335, .0260460, .0899805,
          .0007388, -.1435792, .0075848, -.1334108, -.0216473, .0776645,
          -.0225161, .0853673)
      }
    P.ra = 1 / P.a
    modSterSetup(P, coeff)
  }

  // -------------------------------------------------- nzmg

  def nzmg(P: PJ): Unit = {
    val EPSLN = 1e-10
    val SEC5_TO_RAD = 0.4848136811095359935899141023
    val RAD_TO_SEC5 = 2.062648062470963551564733573
    P.a = 6378388.0; P.ra = 1 / P.a
    P.lam0 = 173 * DEG2RAD
    P.phi0 = -41 * DEG2RAD
    P.x0 = 2510000.0
    P.y0 = 6023150.0
    val bf = Array(
      .7557853228, 0.0, .249204646, 0.003371507, -.001541739, 0.041058560,
      -.10162907, 0.01727609, -.26623489, -0.36249218, -.6870983, -1.1651967)
    val tpsi = Array(.6399175073, -.1358797613, .063294409, -.02526853,
      .0117879, -.0055161, .0026906, -.001333, .00067, -.00034)
    val tphi = Array(1.5627014243, .5185406398, -.03333098, -.1052906,
      -.0368594, .007317, .01220, .00394, -.0013)
    val phi0 = P.phi0
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val phi = (c.y - phi0) * RAD_TO_SEC5
        var pr = tpsi(tpsi.length - 1)
        var i = tpsi.length - 2
        while (i >= 0) { pr = tpsi(i) + phi * pr; i -= 1 }
        pr *= phi
        val (r, im) = zpoly1(pr, c.x, bf)
        c.x = im
        c.y = r
      }
      override def inv2(c: Coord): Unit = {
        var pr = c.y; var pi = c.x
        var nn = 20
        var conv = false
        while (nn > 0 && !conv) {
          val (fr0, fi0, fpr, fpi) = zpolyd1(pr, pi, bf)
          val fr = fr0 - c.y
          val fi = fi0 - c.x
          val den = fpr * fpr + fpi * fpi
          val dpr = -(fr * fpr + fi * fpi) / den
          val dpi = -(fi * fpr - fr * fpi) / den
          pr += dpr; pi += dpi
          if (math.abs(dpr) + math.abs(dpi) <= EPSLN) conv = true
          nn -= 1
        }
        if (!conv && nn == 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        c.x = pi
        var phi = tphi(tphi.length - 1)
        var i = tphi.length - 2
        while (i >= 0) { phi = tphi(i) + pr * phi; i -= 1 }
        c.y = phi0 + pr * phi * SEC5_TO_RAD
      }
    }
  }

  // -------------------------------------------------- bipc

  def bipc(P: PJ): Unit = {
    val EPS = 1e-10; val EPS10 = 1e-10; val ONEEPS = 1.000000001
    val lamB = -.34894976726250681539
    val n = .63055844881274687180
    val F = 1.89724742567461030582
    val Azab = .81650043674686363166
    val Azba = 1.82261843856185925133
    val T = 1.27246578267089012270
    val rhoc = 1.20709121521568721927
    val cAzc = .69691523038678375519
    val sAzc = .71715351331143607555
    val C45 = .70710678118654752469
    val S45 = .70710678118654752410
    val C20 = .93969262078590838411
    val S20 = -.34202014332566873287
    val R110 = 1.91986217719376253360
    val R104 = 1.81514242207410275904
    val noskew = P.params.b("ns")

    def fwdF(c: Coord): Unit = {
      val cphi = math.cos(c.y)
      val sphi = math.sin(c.y)
      var sdlam = lamB - c.x
      var cdlam = math.cos(sdlam)
      sdlam = math.sin(sdlam)
      var az = 0.0
      var tphi = Double.PositiveInfinity
      if (math.abs(math.abs(c.y) - HALFPI) < EPS10) {
        az = if (c.y < 0) math.Pi else 0.0
      } else {
        tphi = sphi / cphi
        az = math.atan2(sdlam, C45 * (tphi - cdlam))
      }
      val tag = az > Azba
      var z = 0.0; var av = 0.0; var y = 0.0
      if (tag) {
        sdlam = c.x + R110
        cdlam = math.cos(sdlam)
        sdlam = math.sin(sdlam)
        z = S20 * sphi + C20 * cphi * cdlam
        if (math.abs(z) > 1) {
          if (math.abs(z) > ONEEPS) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          z = if (z < 0) -1 else 1
        }
        z = math.acos(z)
        if (tphi != Double.PositiveInfinity)
          az = math.atan2(sdlam, C20 * tphi - S20 * cdlam)
        av = Azab
        y = rhoc
      } else {
        z = S45 * (sphi + cphi * cdlam)
        if (math.abs(z) > 1) {
          if (math.abs(z) > ONEEPS) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          z = if (z < 0) -1 else 1
        }
        z = math.acos(z)
        av = Azba
        y = -rhoc
      }
      if (z < 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      var t = math.pow(math.tan(0.5 * z), n)
      var r = F * t
      var al = 0.5 * (R104 - z)
      if (al < 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      al = (t + math.pow(al, n)) / T
      if (math.abs(al) > 1) {
        if (math.abs(al) > ONEEPS) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        al = if (al < 0) -1 else 1
      }
      al = math.acos(al)
      t = n * (av - az)
      if (math.abs(t) < al) r /= math.cos(al + (if (tag) t else -t))
      var x = r * math.sin(t)
      y += (if (tag) -r else r) * math.cos(t)
      if (noskew) {
        val t2 = x
        x = -x * cAzc - y * sAzc
        y = -y * cAzc + t2 * sAzc
      }
      c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
      var x = c.x; var y = c.y
      if (noskew) {
        val t = x
        x = -x * cAzc + y * sAzc
        y = -y * cAzc - t * sAzc
      }
      val neg = x < 0
      var s = 0.0; var cc = 0.0; var av = 0.0
      if (neg) { y = rhoc - y; s = S20; cc = C20; av = Azab }
      else { y += rhoc; s = S45; cc = C45; av = Azba }
      var r = math.hypot(x, y)
      var rl = r; val rp = r
      var az = math.atan2(x, y)
      val fAz = math.abs(az)
      var z = 0.0
      var i = 10
      var conv = false
      while (i > 0 && !conv) {
        z = 2 * math.atan(math.pow(r / F, 1 / n))
        val al = math.acos((math.pow(math.tan(0.5 * z), n) +
          math.pow(math.tan(0.5 * (R104 - z)), n)) / T)
        if (fAz < al) r = rp * math.cos(al + (if (neg) az else -az))
        if (math.abs(rl - r) < EPS) conv = true
        rl = r
        i -= 1
      }
      if (!conv && i == 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      az = av - az / n
      c.y = math.asin(s * math.cos(z) + cc * math.sin(z) * math.cos(az))
      c.x = math.atan2(math.sin(az), cc / math.tan(z) - s * math.cos(az))
      if (neg) c.x -= R110 else c.x = lamB - c.x
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }
}
