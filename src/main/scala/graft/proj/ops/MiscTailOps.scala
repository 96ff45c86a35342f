package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Remaining misc projections: van der Grinten II-IV, Chamberlin trimetric,
  * rectangular polyconic, central conic, Colombia Urban (EPSG GN7-2),
  * Bertin 1953, Laborde (Madagascar). Math per the cited reference files. */
object MiscTailOps {
  private final val TWO_D_PI = 2.0 / math.Pi

  private def kernel2(P: PJ, fwdF: Coord => Unit, invF: Coord => Unit = null): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | (if (invF != null) INV2 else 0)
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = if (invF != null) invF(c)
    }
  }

  private def vandg2Setup(P: PJ, vdg3: Boolean): Unit = {
    val TOL = 1e-10
    kernel2(P, c => {
      val lam = c.x; val phi = c.y
      val bt = math.abs(TWO_D_PI * phi)
      var ct = 1 - bt * bt
      ct = if (ct < 0) 0.0 else math.sqrt(ct)
      if (math.abs(lam) < TOL) {
        c.x = 0
        c.y = math.Pi * (if (phi < 0) -bt else bt) / (1 + ct)
      } else {
        val at = 0.5 * math.abs(math.Pi / lam - lam / math.Pi)
        var x = 0.0; var y = 0.0
        if (vdg3) {
          val x1 = bt / (1 + ct)
          x = math.Pi * (math.sqrt(at * at + 1 - x1 * x1) - at)
          y = math.Pi * x1
        } else {
          val x1 = (ct * math.sqrt(1 + at * at) - at * ct * ct) /
            (1 + at * at * bt * bt)
          x = math.Pi * x1
          y = math.Pi * math.sqrt(1 - x1 * (x1 + 2 * at) + TOL)
        }
        if (lam < 0) x = -x
        if (phi < 0) y = -y
        c.x = x; c.y = y
      }
    })
  }
  def vandg2(P: PJ): Unit = vandg2Setup(P, vdg3 = false)
  def vandg3(P: PJ): Unit = vandg2Setup(P, vdg3 = true)

  def vandg4(P: PJ): Unit = {
    val TOL = 1e-10
    kernel2(P, c => {
      val lam = c.x; val phi = c.y
      if (math.abs(phi) < TOL) { c.y = 0 }
      else if (math.abs(lam) < TOL || math.abs(math.abs(phi) - HALFPI) < TOL) {
        c.x = 0; c.y = phi
      } else {
        val bt = math.abs(TWO_D_PI * phi)
        val bt2 = bt * bt
        val ct = 0.5 * (bt * (8 - bt * (2 + bt2)) - 5) / (bt2 * (bt - 1))
        val ct2 = ct * ct
        var dt = TWO_D_PI * lam
        dt = dt + 1 / dt
        dt = math.sqrt(dt * dt - 4)
        if (math.abs(lam) - HALFPI < 0) dt = -dt
        val dt2 = dt * dt
        var x1 = bt + ct
        x1 *= x1
        val t = bt + 3 * ct
        val ft = x1 * (bt2 + ct2 * dt2 - 1) +
          (1 - bt2) * (bt2 * (t * t + 4 * ct2) + ct2 * (12 * bt * ct + 4 * ct2))
        x1 = (dt * (x1 + ct2 - 1) + 2 * math.sqrt(ft)) / (4 * x1 + dt2)
        var x = HALFPI * x1
        var y = HALFPI * math.sqrt(1 + dt * math.abs(x1) - x1 * x1)
        if (lam < 0) x = -x
        if (phi < 0) y = -y
        c.x = x; c.y = y
      }
    })
  }

  // ---------------- chamb ----------------

  def chamb(P: PJ): Unit = {
    val THIRD = 1.0 / 3; val TOL = 1e-9
    // (r, Az) from point 1 to 2 (reference vect())
    def vect(dphi: Double, c1: Double, s1: Double, c2: Double, s2: Double,
             dlam: Double, w: Coord): (Double, Double) = {
      val cdl = math.cos(dlam)
      val r =
        if (math.abs(dphi) > 1 || math.abs(dlam) > 1)
          aacos(w, s1 * s2 + c1 * c2 * cdl)
        else {
          val dp = math.sin(0.5 * dphi)
          val dl = math.sin(0.5 * dlam)
          2 * aasin(w, math.sqrt(dp * dp + c1 * c2 * dl * dl))
        }
      if (math.abs(r) > TOL)
        (r, math.atan2(c2 * math.sin(dlam), c1 * s2 - s1 * c2 * cdl))
      else (0.0, 0.0)
    }
    def lc(b: Double, cc: Double, a: Double, w: Coord): Double =
      aacos(w, 0.5 * (b * b + cc * cc - a * a) / (b * cc))

    val w0 = new Coord
    val cPhi = new Array[Double](3); val cLam = new Array[Double](3)
    val cCos = new Array[Double](3); val cSin = new Array[Double](3)
    var i = 0
    while (i < 3) {
      cPhi(i) = P.params.r(s"lat_${i + 1}")
      cLam(i) = adjlon(P.params.r(s"lon_${i + 1}") - P.lam0)
      cCos(i) = math.cos(cPhi(i))
      cSin(i) = math.sin(cPhi(i))
      i += 1
    }
    val cvR = new Array[Double](3); val cvAz = new Array[Double](3)
    i = 0
    while (i < 3) {
      val j = if (i == 2) 0 else i + 1
      val (r, az) = vect(cPhi(j) - cPhi(i), cCos(i), cSin(i), cCos(j), cSin(j),
        cLam(j) - cLam(i), w0)
      if (r == 0.0)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
          "chamb: control points should be distinct")
      cvR(i) = r; cvAz(i) = az
      i += 1
    }
    val beta0 = lc(cvR(0), cvR(2), cvR(1), w0)
    val beta1 = lc(cvR(0), cvR(1), cvR(2), w0)
    val beta2 = math.Pi - beta0
    val pY = new Array[Double](3); val pX = new Array[Double](3)
    pY(0) = cvR(2) * math.sin(beta0)
    pY(1) = pY(0)
    val bigPy = 2 * pY(0)
    pY(2) = 0
    pX(1) = 0.5 * cvR(0)
    pX(0) = -pX(1)
    pX(2) = pX(0) + cvR(2) * math.cos(beta0)
    val bigPx = pX(2)

    kernel2(P, c => {
      val sinphi = math.sin(c.y); val cosphi = math.cos(c.y)
      val vR = new Array[Double](3); val vAz = new Array[Double](3)
      var hit = -1
      var i2 = 0
      while (i2 < 3 && hit < 0) {
        val (r, az) = vect(c.y - cPhi(i2), cCos(i2), cSin(i2), cosphi, sinphi,
          c.x - cLam(i2), c)
        if (r == 0.0) hit = i2
        else { vR(i2) = r; vAz(i2) = adjlon(az - cvAz(i2)) }
        i2 += 1
      }
      if (hit >= 0) { c.x = pX(hit); c.y = pY(hit) }
      else {
        var x = bigPx; var y = bigPy
        var k = 0
        while (k < 3) {
          val j = if (k == 2) 0 else k + 1
          var a = lc(cvR(k), vR(k), vR(j), c)
          if (vAz(k) < 0) a = -a
          if (k == 0) {
            x += vR(k) * math.cos(a)
            y -= vR(k) * math.sin(a)
          } else if (k == 1) {
            a = beta1 - a
            x -= vR(k) * math.cos(a)
            y -= vR(k) * math.sin(a)
          } else {
            a = beta2 - a
            x += vR(k) * math.cos(a)
            y += vR(k) * math.sin(a)
          }
          k += 1
        }
        c.x = x * THIRD; c.y = y * THIRD
      }
    })
  }

  def rpoly(P: PJ): Unit = {
    val EPS = 1e-9
    val phi1 = math.abs(P.params.r("lat_ts"))
    val mode = phi1 > EPS
    val fxb = if (mode) 0.5 * math.sin(phi1) else 0.0
    val fxa = if (mode) 0.5 / fxb else 0.0
    val phi0 = P.phi0
    kernel2(P, c => {
      var fa = if (mode) math.tan(c.x * fxb) * fxa else 0.5 * c.x
      if (math.abs(c.y) < EPS) {
        c.x = fa + fa
        c.y = -phi0
      } else {
        var y = 1.0 / math.tan(c.y)
        fa = 2 * math.atan(fa * math.sin(c.y))
        c.x = math.sin(fa) * y
        c.y = c.y - phi0 + (1 - math.cos(fa)) * y
      }
    })
  }

  def ccon(P: PJ): Unit = {
    val phi1 = P.params.r("lat_1")
    if (math.abs(phi1) < 1e-10)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "ccon: |lat_1| should be > 0")
    val sinphi1 = math.sin(phi1)
    val ctgphi1 = math.cos(phi1) / sinphi1
    kernel2(P,
      c => {
        val r = ctgphi1 - math.tan(c.y - phi1)
        c.y = ctgphi1 - r * math.cos(c.x * sinphi1)
        c.x = r * math.sin(c.x * sinphi1)
      },
      c => {
        val y = ctgphi1 - c.y
        c.y = phi1 - math.atan(math.hypot(c.x, y) - ctgphi1)
        c.x = math.atan2(c.x, y) / sinphi1
      })
  }

  def colUrban(P: PJ): Unit = {
    val h0 = P.params.d("h_0") / P.a
    val es = P.es; val phi0 = P.phi0
    val sinphi0 = math.sin(phi0)
    val nu0 = 1 / math.sqrt(1 - es * sinphi0 * sinphi0)
    val aA = 1 + h0 / nu0
    val rho0 = (1 - es) / math.pow(1 - es * sinphi0 * sinphi0, 1.5)
    val bB = math.tan(phi0) / (2 * rho0 * nu0)
    val cC = 1 + h0
    val dD = rho0 * (1 + h0 / (1 - es))
    kernel2(P,
      c => {
        val cosphi = math.cos(c.y); val sinphi = math.sin(c.y)
        val nu = 1 / math.sqrt(1 - es * sinphi * sinphi)
        val lnc = c.x * nu * cosphi
        val sinphiM = math.sin(0.5 * (c.y + phi0))
        val rhoM = (1 - es) / math.pow(1 - es * sinphiM * sinphiM, 1.5)
        val g = 1 + h0 / rhoM
        c.x = aA * lnc
        c.y = g * rho0 * ((c.y - phi0) + bB * lnc * lnc)
      },
      c => {
        val phi = phi0 + c.y / dD - bB * (c.x / cC) * (c.x / cC)
        val sinphi = math.sin(phi)
        val nu = 1 / math.sqrt(1 - es * sinphi * sinphi)
        c.x = c.x / (cC * nu * math.cos(phi))
        c.y = phi
      })
  }

  def bertin1953(P: PJ): Unit = {
    P.lam0 = 0
    P.phi0 = -42.0 * DEG2RAD
    val cosDp = math.cos(P.phi0); val sinDp = math.sin(P.phi0)
    kernel2(P, c => {
      val fu = 1.4; val k = 12.0; val w = 1.68
      var lam = c.x + (-16.5 * DEG2RAD)
      var phi = c.y
      var cosphi = math.cos(phi)
      val x = math.cos(lam) * cosphi
      val y = math.sin(lam) * cosphi
      val z = math.sin(phi)
      var z0 = z * cosDp + x * sinDp
      lam = math.atan2(y, x * cosDp - z * sinDp)
      phi = math.asin(z0)
      lam = adjlon(lam)
      if (lam + phi < -fu) {
        val d = (lam - phi + 1.6) * (lam + phi + fu) / 8.0
        lam += d
        phi -= 0.8 * d * math.sin(phi + math.Pi / 2)
      }
      cosphi = math.cos(phi)
      var d = math.sqrt(2.0 / (1 + cosphi * math.cos(lam / 2)))
      var xo = w * d * cosphi * math.sin(lam / 2)
      var yo = d * math.sin(phi)
      d = (1 - math.cos(lam * phi)) / k
      if (yo < 0) xo *= 1 + d
      if (yo > 0) yo *= 1 + d / 1.5 * xo * xo
      c.x = xo; c.y = yo
    })
  }

  def labrd(P: PJ): Unit = {
    val EPS = 1e-10
    if (P.phi0 == 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "labrd: lat_0 should not be 0")
    val az = P.params.r("azi")
    val e = P.e; val es = P.es; val oneEs = P.oneEs; val k0 = P.k0
    val sinp = math.sin(P.phi0)
    var t = 1 - es * sinp * sinp
    val nN = 1 / math.sqrt(t)
    val rR = oneEs * nN / t
    val kRg = k0 * math.sqrt(nN * rR)
    val p0s = math.atan(math.sqrt(rR / nN) * math.tan(P.phi0))
    val aA = sinp / math.sin(p0s)
    t = e * sinp
    val cConst = 0.5 * e * aA * math.log((1 + t) / (1 - t)) +
      -aA * math.log(math.tan(QUARTERPI + 0.5 * P.phi0)) +
      math.log(math.tan(QUARTERPI + 0.5 * p0s))
    val t2az = az + az
    val cb0 = 1.0 / (12 * kRg * kRg)
    val ca = (1 - math.cos(t2az)) * cb0
    val cb = cb0 * math.sin(t2az)
    val cc = 3 * (ca * ca - cb * cb)
    val cd = 6 * ca * cb
    val phi0 = P.phi0
    kernel2(P,
      c => {
        val v1 = aA * math.log(math.tan(QUARTERPI + 0.5 * c.y))
        val tt = e * math.sin(c.y)
        val v2 = 0.5 * e * aA * math.log((1 + tt) / (1 - tt))
        val ps = 2 * (math.atan(math.exp(v1 - v2 + cConst)) - QUARTERPI)
        val i1 = ps - p0s
        val cosps = math.cos(ps); val cosps2 = cosps * cosps
        val sinps = math.sin(ps); val sinps2 = sinps * sinps
        val i4 = aA * cosps
        val i2 = 0.5 * aA * i4 * sinps
        val i3 = i2 * aA * aA * (5 * cosps2 - sinps2) / 12
        var i6 = i4 * aA * aA
        val i5 = i6 * (cosps2 - sinps2) / 6
        i6 *= aA * aA * (5 * cosps2 * cosps2 + sinps2 * (sinps2 - 18 * cosps2)) / 120
        val t0 = c.x * c.x
        var x = kRg * c.x * (i4 + t0 * (i5 + t0 * i6))
        var y = kRg * (i1 + t0 * (i2 + t0 * i3))
        val x2 = x * x; val y2 = y * y
        val v1b = 3 * x * y2 - x * x2
        val v2b = y * y2 - 3 * x2 * y
        x += ca * v1b + cb * v2b
        y += ca * v2b - cb * v1b
        c.x = x; c.y = y
      },
      c => {
        var x = c.x; var y = c.y
        val x2 = x * x; val y2 = y * y
        val v1 = 3 * x * y2 - x * x2
        val v2 = y * y2 - 3 * x2 * y
        val v3 = x * (5 * y2 * y2 + x2 * (-10 * y2 + x2))
        val v4 = y * (5 * x2 * x2 + y2 * (-10 * x2 + y2))
        x += -ca * v1 - cb * v2 + cc * v3 + cd * v4
        y += cb * v1 - ca * v2 - cd * v3 + cc * v4
        val ps = p0s + y / kRg
        var pe = ps + phi0 - p0s
        var i = 20
        var conv = false
        while (i > 0 && !conv) {
          val v1b = aA * math.log(math.tan(QUARTERPI + 0.5 * pe))
          val tpe = e * math.sin(pe)
          val v2b = 0.5 * e * aA * math.log((1 + tpe) / (1 - tpe))
          val t0 = ps - 2 * (math.atan(math.exp(v1b - v2b + cConst)) - QUARTERPI)
          pe += t0
          if (math.abs(t0) < EPS) conv = true
          i -= 1
        }
        var tt = e * math.sin(pe)
        tt = 1 - tt * tt
        val re = oneEs / (tt * math.sqrt(tt))
        val tps = math.tan(ps)
        val tps2 = tps * tps
        val s = kRg * kRg
        var d = re * k0 * kRg
        val i7 = tps / (2 * d)
        val i8 = tps * (5 + 3 * tps2) / (24 * d * s)
        d = math.cos(ps) * kRg * aA
        val i9 = 1 / d
        d *= s
        val i10 = (1 + 2 * tps2) / (6 * d)
        val i11 = (5 + tps2 * (28 + 24 * tps2)) / (120 * d * s)
        val xx2 = x * x
        c.y = pe + xx2 * (-i7 + i8 * xx2)
        c.x = x * (i9 + xx2 * (-i10 + xx2 * i11))
      })
  }
}
