package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Space Oblique Mercator family (som/lsat/misrsom), IMW polyconic, and
  * Roussilhe stereographic + the exact meridional-distance engine.
  * Math per reference src/projections/{som,imw_p,rouss}.cpp and
  * src/proj_mdist.cpp (Snyder 1987 ch. 27; IMW per UN specs). */
object SatOps {
  private final val TOL = 1e-7
  private final val PI_HALFPI = math.Pi + HALFPI
  private final val TWOPI_HALFPI = TWOPI + HALFPI

  // ---------------- exact meridional distance (proj_mdist) ----------------

  final class MDist(val es: Double) extends Serializable {
    // E(e^2) series terms, cut when the partial sum stops changing
    // (reference proj_mdist_ini, src/proj_mdist.cpp:28-85)
    private val terms: Array[Double] = {
      val e = new Array[Double](20)
      e(0) = 1.0
      var ens = es
      var numf = 1.0; var twon1 = 1.0; var denf = 1.0; var denfi = 1.0
      var twon = 4.0
      var esSum = 1.0; var el = 1.0
      var i = 1
      var stop = 20
      while (i < 20 && stop == 20) {
        numf *= twon1 * twon1
        val den = twon * denf * denf * twon1
        e(i) = (numf / den) * ens
        esSum -= e(i)
        ens *= es
        twon *= 4
        denfi += 1; denf *= denfi
        twon1 += 2
        if (esSum == el) stop = i + 1 else el = esSum
        i += 1
      }
      e.take(if (stop == 20) i else stop)
    }
    val E: Double = {
      var s = 1.0
      var j = 1
      while (j < terms.length) { s -= terms(j); j += 1 }
      s
    }
    private val b: Array[Double] = {
      val out = new Array[Double](terms.length)
      var esAcc = 1.0 - E
      out(0) = esAcc
      var numf = 1.0; var denf = 1.0
      var numfi = 2.0; var denfi = 3.0
      var j = 1
      while (j < terms.length) {
        esAcc -= terms(j)
        numf *= numfi
        denf *= denfi
        out(j) = esAcc * numf / denf
        numfi += 2; denfi += 2
        j += 1
      }
      out
    }

    def dist(phi: Double, sphi: Double, cphi: Double): Double = {
      val sc = sphi * cphi
      val sphi2 = sphi * sphi
      val d = phi * E - es * sc / math.sqrt(1 - es * sphi2)
      var i = b.length - 1
      var sum = b(i)
      while (i > 0) { i -= 1; sum = b(i) + sphi2 * sum }
      d + sc * sum
    }

    /** inverse by Newton (reference proj_inv_mdist); flags err on c. */
    def inv(distV: Double, c: Coord): Double = {
      val k = 1.0 / (1 - es)
      var phi = distV
      var i = 20
      while (i > 0) {
        val s = math.sin(phi)
        val t0 = 1 - es * s * s
        val t = (dist(phi, s, math.cos(phi)) - distV) * (t0 * math.sqrt(t0)) * k
        phi -= t
        if (math.abs(t) < 1e-14) return phi
        i -= 1
      }
      c.err = ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN
      phi
    }
  }

  // ---------------- som / lsat / misrsom ----------------

  private final class SomConsts(P: PJ, val alf: Double, val p22: Double, val rlm: Double)
      extends Serializable {
    val sa0 = math.sin(alf)
    val ca0 = { val c = math.cos(alf); if (math.abs(c) < 1e-9) 1e-9 else c }
    val esc = P.es * ca0 * ca0
    val ess = P.es * sa0 * sa0
    val w = { val w0 = (1 - esc) * P.rOneEs; w0 * w0 - 1 }
    val q = ess * P.rOneEs
    val t = ess * (2 - P.es) * P.rOneEs * P.rOneEs
    val u = esc * P.rOneEs
    val xj = P.oneEs * P.oneEs * P.oneEs
    val rlm2 = rlm + TWOPI
    var a2 = 0.0; var a4 = 0.0; var b = 0.0; var c1 = 0.0; var c3 = 0.0
    private def seraz0(lamDeg: Double, mult: Double): Unit = {
      val lam = lamDeg * DEG2RAD
      val sd = math.sin(lam)
      val sdsq = sd * sd
      val s = p22 * sa0 * math.cos(lam) *
        math.sqrt((1 + t * sdsq) / ((1 + w * sdsq) * (1 + q * sdsq)))
      val d1 = 1 + q * sdsq
      val h = math.sqrt((1 + q * sdsq) / (1 + w * sdsq)) *
        ((1 + w * sdsq) / (d1 * d1) - p22 * ca0)
      val sq = math.sqrt(xj * xj + s * s)
      var fc = mult * (h * xj - s * s) / sq
      b += fc
      a2 += fc * math.cos(lam + lam)
      a4 += fc * math.cos(lam * 4)
      fc = mult * s * (h + xj) / sq
      c1 += fc * math.cos(lam)
      c3 += fc * math.cos(lam * 3)
    }
    locally {
      seraz0(0, 1)
      var lam = 9
      while (lam <= 81) { seraz0(lam, 4); lam += 18 }
      lam = 18
      while (lam <= 72) { seraz0(lam, 2); lam += 18 }
      seraz0(90, 1)
      a2 /= 30; a4 /= 60; b /= 30; c1 /= 15; c3 /= 45
    }
  }

  private def somInstall(P: PJ, alf: Double, p22: Double, rlm: Double): Unit = {
    val Q = new SomConsts(P, alf, p22, rlm)
    val oneEs = P.oneEs; val es = P.es; val rOneEs = P.rOneEs
    def fwdF(c: Coord): Unit = {
      var phi = c.y
      if (phi > HALFPI) phi = HALFPI else if (phi < -HALFPI) phi = -HALFPI
      var lampp = if (phi >= 0) HALFPI else PI_HALFPI
      val tanphi = math.tan(phi)
      var lamt = 0.0; var lamdp = 0.0
      var l = 0
      var nn = 0
      var break1 = false
      while (!break1) {
        val sav0 = lampp
        val lamtp = c.x + Q.p22 * lampp
        val cl = math.cos(lamtp)
        val fac = if (cl < 0) lampp + math.sin(lampp) * HALFPI
                  else lampp - math.sin(lampp) * HALFPI
        l = 50
        var sav = sav0
        var innerDone = false
        while (l >= 0 && !innerDone) {
          lamt = c.x + Q.p22 * sav
          var cc = math.cos(lamt)
          if (math.abs(cc) < TOL) lamt -= TOL
          cc = math.cos(lamt)
          val xlam = (oneEs * tanphi * Q.sa0 + math.sin(lamt) * Q.ca0) / cc
          lamdp = math.atan(xlam) + fac
          if (math.abs(math.abs(sav) - math.abs(lamdp)) < TOL) innerDone = true
          else { sav = lamdp; l -= 1 }
        }
        nn += 1
        if (l < 0 || nn >= 3 || (lamdp > Q.rlm && lamdp < Q.rlm2)) break1 = true
        else {
          if (lamdp <= Q.rlm) lampp = TWOPI_HALFPI
          else if (lamdp >= Q.rlm2) lampp = HALFPI
        }
      }
      if (l >= 0) {
        val sp = math.sin(phi)
        val phidp = aasin(c, (oneEs * Q.ca0 * sp - Q.sa0 * math.cos(phi) * math.sin(lamt)) /
          math.sqrt(1 - es * sp * sp))
        val tanph = math.log(math.tan(QUARTERPI + 0.5 * phidp))
        val sd = math.sin(lamdp)
        val sdsq = sd * sd
        val s = Q.p22 * Q.sa0 * math.cos(lamdp) *
          math.sqrt((1 + Q.t * sdsq) / ((1 + Q.w * sdsq) * (1 + Q.q * sdsq)))
        val d = math.sqrt(Q.xj * Q.xj + s * s)
        c.x = Q.b * lamdp + Q.a2 * math.sin(2 * lamdp) + Q.a4 * math.sin(lamdp * 4) -
          tanph * s / d
        c.y = Q.c1 * sd + Q.c3 * math.sin(lamdp * 3) + tanph * Q.xj / d
      } else { c.x = Double.PositiveInfinity; c.y = Double.PositiveInfinity }
    }
    def invF(c: Coord): Unit = {
      var lamdp = c.x / Q.b
      var s = 0.0
      var nn = 50
      var done = false
      while (!done) {
        val sav = lamdp
        val sd = math.sin(lamdp)
        val sdsq = sd * sd
        s = Q.p22 * Q.sa0 * math.cos(lamdp) *
          math.sqrt((1 + Q.t * sdsq) / ((1 + Q.w * sdsq) * (1 + Q.q * sdsq)))
        lamdp = c.x + c.y * s / Q.xj - Q.a2 * math.sin(2 * lamdp) -
          Q.a4 * math.sin(lamdp * 4) -
          s / Q.xj * (Q.c1 * math.sin(lamdp) + Q.c3 * math.sin(lamdp * 3))
        lamdp /= Q.b
        nn -= 1
        if (!(math.abs(lamdp - sav) >= TOL && nn > 0)) done = true
      }
      var sl = math.sin(lamdp)
      val fac = math.exp(math.sqrt(1 + s * s / Q.xj / Q.xj) *
        (c.y - Q.c1 * sl - Q.c3 * math.sin(lamdp * 3)))
      val phidp = 2 * (math.atan(fac) - QUARTERPI)
      val dd = sl * sl
      if (math.abs(math.cos(lamdp)) < TOL) lamdp -= TOL
      val spp = math.sin(phidp)
      val sppsq = spp * spp
      val denom = 1 - sppsq * (1 + Q.u)
      if (denom == 0) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      var lamt = math.atan(
        ((1 - sppsq * rOneEs) * math.tan(lamdp) * Q.ca0 -
          spp * Q.sa0 * math.sqrt((1 + Q.q * dd) * (1 - sppsq) - sppsq * Q.u) /
            math.cos(lamdp)) / denom)
      sl = if (lamt >= 0) 1 else -1
      val scl = if (math.cos(lamdp) >= 0) 1 else -1
      lamt -= HALFPI * (1 - scl) * sl
      c.x = lamt - Q.p22 * lamdp
      c.y =
        if (math.abs(Q.sa0) < TOL)
          aasin(c, spp / math.sqrt(oneEs * oneEs + es * sppsq))
        else
          math.atan((math.tan(lamdp) * math.cos(lamt) - Q.ca0 * math.sin(lamt)) /
            (oneEs * Q.sa0))
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }

  def som(P: PJ): Unit = {
    P.lam0 = P.params.r("asc_lon")
    if (P.lam0 < -TWOPI || P.lam0 > TWOPI)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "som: ascending longitude should be in [-2pi, 2pi]")
    val alf = P.params.r("inc_angle")
    if (alf < 0 || alf > math.Pi)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "som: inclination angle should be in [0, pi]")
    val p22 = P.params.d("ps_rev")
    if (p22 < 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "som: days per rotation should be positive")
    somInstall(P, alf, p22, 0.0)
  }

  def misrsom(P: PJ): Unit = {
    val path = P.params.i("path")
    if (path <= 0 || path > 233)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "misrsom: path should be in [1, 233]")
    P.lam0 = DEG2RAD * 129.3056 - TWOPI / 233.0 * path
    somInstall(P, 98.30382 * DEG2RAD, 98.88 / 1440.0, 0.0)
  }

  def lsat(P: PJ): Unit = {
    val land = P.params.i("lsat")
    if (land <= 0 || land > 5)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lsat: lsat should be in [1, 5]")
    val path = P.params.i("path")
    val maxPath = if (land <= 3) 251 else 233
    if (path <= 0 || path > maxPath)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"lsat: path should be in [1, $maxPath]")
    var alf = 0.0; var p22 = 0.0
    if (land <= 3) {
      P.lam0 = DEG2RAD * 128.87 - TWOPI / 251.0 * path
      p22 = 103.2669323
      alf = DEG2RAD * 99.092
    } else {
      P.lam0 = DEG2RAD * 129.3 - TWOPI / 233.0 * path
      p22 = 98.8841202
      alf = DEG2RAD * 98.2
    }
    somInstall(P, alf, p22 / 1440.0, math.Pi * (1.0 / 248.0 + 0.5161290322580645))
  }

  // ---------------- imw_p ----------------

  def imwP(P: PJ): Unit = {
    val EPS = 1e-10; val ITOL = 1e-10
    val en = enfn(P.n)
    if (!P.params.has("lat_1") || !P.params.has("lat_2"))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "imw_p: lat_1/lat_2 required")
    var phi1 = P.params.r("lat_1")
    var phi2 = P.params.r("lat_2")
    val del = 0.5 * (phi2 - phi1)
    val sig = 0.5 * (phi2 + phi1)
    if (math.abs(del) < EPS || math.abs(sig) < EPS)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "imw_p: |lat_1 - lat_2| and |lat_1 + lat_2| should be > 0")
    if (phi2 < phi1) { val t = phi1; phi1 = phi2; phi2 = t }
    val lam1 =
      if (P.params.has("lon_1")) P.params.r("lon_1")
      else {
        val s = math.abs(sig * RAD2DEG)
        (if (s <= 60) 2.0 else if (s <= 76) 4.0 else 8.0) * DEG2RAD
      }
    val es = P.es
    // mode: 0 = none zero, 1 = phi1 == 0, -1 = phi2 == 0
    var mode = 0
    var x1 = 0.0; var y1 = 0.0; var x2 = 0.0; var t2v = 0.0
    var sphi1 = math.sin(phi1); var r1v = 0.0
    var sphi2 = math.sin(phi2); var r2v = 0.0
    def xyOf(phi: Double): (Double, Double, Double, Double) = {
      val sp = math.sin(phi)
      val r = 1.0 / (math.tan(phi) * math.sqrt(1 - es * sp * sp))
      val f = lam1 * sp
      (r * math.sin(f), r * (1 - math.cos(f)), sp, r)
    }
    if (phi1 != 0.0) { val v = xyOf(phi1); x1 = v._1; y1 = v._2; sphi1 = v._3; r1v = v._4 }
    else { mode = 1; y1 = 0; x1 = lam1 }
    if (phi2 != 0.0) { val v = xyOf(phi2); x2 = v._1; t2v = v._2; sphi2 = v._3; r2v = v._4 }
    else { mode = -1; t2v = 0; x2 = lam1 }
    val m1 = mlfn(phi1, sphi1, math.cos(phi1), en)
    val m2 = mlfn(phi2, sphi2, math.cos(phi2), en)
    val tt = m2 - m1
    val ss = x2 - x1
    val y2 = math.sqrt(tt * tt - ss * ss) + y1
    val c2 = y2 - t2v
    val rt = 1 / tt
    val pP = (m2 * y1 - m1 * y2) * rt
    val qQ = (y2 - y1) * rt
    val pPp = (m2 * x1 - m1 * x2) * rt
    val qQp = (x2 - x1) * rt

    // loc_for: returns (x, y, yc)
    def locFor(lam: Double, phi: Double): (Double, Double, Double) = {
      if (phi == 0.0) (lam, 0.0, 0.0)
      else {
        val sp = math.sin(phi)
        val m = mlfn(phi, sp, math.cos(phi), en)
        val xa = pPp + qQp * m
        val ya = pP + qQ * m
        val r = 1.0 / (math.tan(phi) * math.sqrt(1 - es * sp * sp))
        var cC = math.sqrt(r * r - xa * xa)
        if (phi < 0) cC = -cC
        cC += ya - r
        var xb = 0.0; var yb = 0.0
        if (mode == -1) { xb = lam; yb = c2 }
        else {
          val t = lam * sphi2
          xb = r2v * math.sin(t)
          yb = c2 + r2v * (1 - math.cos(t))
        }
        var xc = 0.0; var yc = 0.0
        if (mode == 1) { xc = lam; yc = 0 }
        else {
          val t = lam * sphi1
          xc = r1v * math.sin(t)
          yc = r1v * (1 - math.cos(t))
        }
        val d = (xb - xc) / (yb - yc)
        var b = xc + d * (cC + r - yc)
        var x = d * math.sqrt(r * r * (1 + d * d) - b * b)
        if (phi > 0) x = -x
        x = (b + x) / (1 + d * d)
        var y = math.sqrt(r * r - x * x)
        if (phi > 0) y = -y
        y += cC + r
        (x, y, yc)
      }
    }
    def fwdF(c: Coord): Unit = {
      val (x, y, _) = locFor(c.x, c.y)
      c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
      var phi = phi2
      var lam = c.x / math.cos(phi)
      var i = 0
      var tx = 0.0; var ty = 0.0
      var done = false
      while (!done) {
        val (lx, ly, yc) = locFor(lam, phi)
        tx = lx; ty = ly
        val denom = ly - yc
        if (denom != 0 || math.abs(ly - c.y) > ITOL) {
          if (denom == 0) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          phi = ((phi - phi1) * (c.y - yc) / denom) + phi1
        }
        if (lx != 0 && math.abs(lx - c.x) > ITOL) lam = lam * c.x / lx
        i += 1
        if (!(i < 1000 && (math.abs(tx - c.x) > ITOL || math.abs(ty - c.y) > ITOL)))
          done = true
      }
      if (i >= 1000) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
      c.x = lam; c.y = phi
    }
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }

  // ---------------- rouss ----------------

  def rouss(P: PJ): Unit = {
    val md = new MDist(P.es)
    val es = P.es; val k0 = P.k0
    val sp0 = math.sin(P.phi0)
    val s0 = md.dist(P.phi0, sp0, math.cos(P.phi0))
    var es2 = es * sp0 * sp0
    val tcon = 1 - es2
    val n0 = 1 / math.sqrt(tcon)
    val rr02 = tcon * tcon / P.oneEs
    val rr04 = rr02 * rr02
    val t = math.tan(P.phi0)
    val t2 = t * t
    val A1 = rr02 / 4; val C1v = A1
    val A2 = rr02 * (2 * t2 - 1 - 2 * es2) / 12; val C2v = A2
    val A3 = rr02 * t * (1 + 4 * t2) / (12 * n0)
    val A4 = rr04 / 24
    val A5 = rr04 * (-1 + t2 * (11 + 12 * t2)) / 24
    val A6 = rr04 * (-2 + t2 * (11 - 2 * t2)) / 240
    val B1 = t / (2 * n0)
    val B2 = rr02 / 12
    val B3 = rr02 * (1 + 2 * t2 - 2 * es2) / 4
    val B4 = rr02 * t * (2 - t2) / (24 * n0)
    val B5 = rr02 * t * (5 + 4 * t2) / (8 * n0)
    val B6 = rr04 * (-2 + t2 * (-5 + 6 * t2)) / 48
    val B7 = rr04 * (5 + t2 * (19 + 12 * t2)) / 24
    val B8 = rr04 / 120
    val C3v = rr02 * t * (1 + t2) / (3 * n0)
    val C4v = rr04 * (-3 + t2 * (34 + 22 * t2)) / 240
    val C5v = rr04 * (4 + t2 * (13 + 12 * t2)) / 24
    val C6v = rr04 / 16
    val C7v = rr04 * t * (11 + t2 * (33 + t2 * 16)) / (48 * n0)
    val C8v = rr04 * t * (1 + t2 * 4) / (36 * n0)
    val D1 = t / (2 * n0)
    val D2 = rr02 / 12
    val D3 = rr02 * (2 * t2 + 1 - 2 * es2) / 4
    val D4 = rr02 * t * (1 + t2) / (8 * n0)
    val D5 = rr02 * t * (1 + t2 * 2) / (4 * n0)
    val D6 = rr04 * (1 + t2 * (6 + t2 * 6)) / 16
    val D7 = rr04 * t2 * (3 + t2 * 4) / 8
    val D8 = rr04 / 80
    val D9 = rr04 * t * (-21 + t2 * (178 - t2 * 26)) / 720
    val D10 = rr04 * t * (29 + t2 * (86 + t2 * 48)) / (96 * n0)
    val D11 = rr04 * t * (37 + t2 * 44) / (96 * n0)

    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val cp = math.cos(c.y); val sp = math.sin(c.y)
        val s = md.dist(c.y, sp, cp) - s0
        val s2 = s * s
        val al = c.x * cp / math.sqrt(1 - es * sp * sp)
        val al2 = al * al
        c.x = k0 * al * (1 + s2 * (A1 + s2 * A4) -
          al2 * (A2 + s * A3 + s2 * A5 + al2 * A6))
        c.y = k0 * (al2 * (B1 + al2 * B4) +
          s * (1 + al2 * (B3 - al2 * B6) + s2 * (B2 + s2 * B8) +
            s * al2 * (B5 + s * B7)))
      }
      override def inv2(c: Coord): Unit = {
        val x = c.x / k0; val y = c.y / k0
        val x2 = x * x; val y2 = y * y
        val al = x * (1 - C1v * y2 +
          x2 * (C2v + C3v * y - C4v * x2 + C5v * y2 - C7v * x2 * y) +
          y2 * (C6v * y2 - C8v * x2 * y))
        val s = s0 + y * (1 + y2 * (-D2 + D8 * y2)) +
          x2 * (-D1 + y * (-D3 + y * (-D5 + y * (-D7 + y * D11))) +
            x2 * (D4 + y * (D6 + y * D10) - x2 * D9))
        val phi = md.inv(s, c)
        c.y = phi
        val sp = math.sin(phi)
        c.x = al * math.sqrt(1 - es * sp * sp) / math.cos(phi)
      }
    }
  }
}
