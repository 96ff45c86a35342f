package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Pseudocylindrical / world projections, part 2: Eckert I-III/V + family,
  * Goode homolosine, Boggs, Collignon, Craster, Denoyer, Fahey, Hammer,
  * Aitoff / Winkel Tripel, Robinson, van der Grinten I. Math per the cited
  * reference files (Snyder 1987; Ipbüker 2002 for the Aitoff inverse). */
object PseudoCyl2Ops {
  private final val EPS10 = 1e-10

  private def simple(P: PJ, fwdF: Coord => Unit, invF: Coord => Unit = null): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | (if (invF != null) INV2 else 0)
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = if (invF != null) invF(c)
    }
  }

  def eck1(P: PJ): Unit = {
    val FC = 0.92131773192356127802; val RP = 0.31830988618379067154
    simple(P,
      c => { val x = FC * c.x * (1 - RP * math.abs(c.y)); c.y = FC * c.y; c.x = x },
      c => { c.y = c.y / FC; c.x = c.x / (FC * (1 - RP * math.abs(c.y))) })
  }

  def eck2(P: PJ): Unit = {
    val FXC = 0.46065886596178063902; val FYC = 1.44720250911653531871
    val C13 = 1.0 / 3; val ONEEPS = 1.0000001
    def fwdF(c: Coord): Unit = {
        val y0 = math.sqrt(4 - 3 * math.sin(math.abs(c.y)))
        val x = FXC * c.x * y0
        var y = FYC * (2 - y0)
        if (c.y < 0) y = -y
        c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
        val yIn = c.y
        var phi = 2 - math.abs(yIn) / FYC
        val lam = c.x / (FXC * phi)
        phi = (4 - phi * phi) * C13
        if (math.abs(phi) >= 1) {
          if (math.abs(phi) > ONEEPS) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          phi = if (phi < 0) -HALFPI else HALFPI
        } else phi = math.asin(phi)
        if (yIn < 0) phi = -phi
        c.x = lam; c.y = phi
    }
    simple(P, fwdF, invF)
  }

  private def eck3Family(P: PJ, cx: Double, cy: Double, a: Double, b: Double): Unit =
    simple(P,
      c => {
        val y = cy * c.y
        c.x = cx * c.x * (a + asqrt(1 - b * c.y * c.y))
        c.y = y
      },
      c => {
        val phi = c.y / cy
        val denom = cx * (a + asqrt(1 - b * phi * phi))
        c.x = if (denom == 0) Double.PositiveInfinity else c.x / denom
        c.y = phi
      })

  def eck3(P: PJ): Unit = eck3Family(P, 0.42223820031577120149, 0.84447640063154240298, 1.0, 0.4052847345693510857755)
  def kav7(P: PJ): Unit = eck3Family(P, 0.8660254037844, 1.0, 0.0, 0.30396355092701331433)
  def wag6(P: PJ): Unit = eck3Family(P, 1.0, 1.0, 0.0, 0.30396355092701331433)
  def putp1(P: PJ): Unit = eck3Family(P, 1.89490, 0.94745, -0.5, 0.30396355092701331433)

  def eck5(P: PJ): Unit = {
    val XF = 0.44101277172455148219; val RXF = 2.26750802723822639137
    val YF = 0.88202554344910296438; val RYF = 1.13375401361911319568
    simple(P,
      c => { val x = XF * (1 + math.cos(c.y)) * c.x; c.y = YF * c.y; c.x = x },
      c => { val phi = RYF * c.y; c.x = RXF * c.x / (1 + math.cos(phi)); c.y = phi })
  }

  /** goode — composite sinu/moll with latitude switch
    * (reference src/projections/goode.cpp). */
  def goode(P: PJ): Unit = {
    val Y_COR = 0.05280
    val PHI_LIM = 0.71093078197902358062
    // inner spherical sinu and moll kernels on the same (unit) sphere
    val sinuP = new PJ(ParamList.empty, "sinu")
    sinuP.a = P.a; sinuP.es = 0
    PseudoCylOps.sinu(sinuP)
    val mollP = new PJ(ParamList.empty, "moll")
    mollP.a = P.a; mollP.es = 0
    PseudoCylOps.moll(mollP)
    val sk = sinuP.kernel; val mk = mollP.kernel
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val phi = c.y
        if (math.abs(phi) <= PHI_LIM) sk.fwd2(c)
        else {
          mk.fwd2(c)
          c.y -= (if (phi >= 0) Y_COR else -Y_COR)
        }
      }
      override def inv2(c: Coord): Unit = {
        if (math.abs(c.y) <= PHI_LIM) sk.inv2(c)
        else {
          c.y += (if (c.y >= 0) Y_COR else -Y_COR)
          mk.inv2(c)
        }
      }
    }
  }

  def boggs(P: PJ): Unit = {
    val FXC = 2.00276; val FXC2 = 1.11072; val FYC = 0.49931
    simple(P, c => {
      val phi = c.y
      var theta = phi
      var x = 0.0
      if (math.abs(math.abs(phi) - HALFPI) < 1e-7) x = 0.0
      else {
        val cc = math.sin(theta) * math.Pi
        var i = 20
        var conv = false
        while (i > 0 && !conv) {
          val th1 = (theta + math.sin(theta) - cc) / (1 + math.cos(theta))
          theta -= th1
          if (math.abs(th1) < 1e-7) conv = true
          i -= 1
        }
        theta *= 0.5
        x = FXC * c.x / (1 / math.cos(phi) + FXC2 / math.cos(theta))
      }
      c.x = x
      c.y = FYC * (phi + math.sqrt(2.0) * math.sin(theta))
    })
  }

  def collg(P: PJ): Unit = {
    val FXC = 1.12837916709551257390; val FYC = 1.77245385090551602729
    val ONEEPS = 1.0000001
    def fwdF(c: Coord): Unit = {
        var y = 1 - math.sin(c.y)
        y = if (y <= 0) 0.0 else math.sqrt(y)
        c.x = FXC * c.x * y
        c.y = FYC * (1 - y)
    }
    def invF(c: Coord): Unit = {
        var phi = c.y / FYC - 1
        phi = 1 - phi * phi
        if (math.abs(phi) < 1) phi = math.asin(phi)
        else if (math.abs(phi) > ONEEPS) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        else phi = if (phi < 0) -HALFPI else HALFPI
        var lam = 1 - math.sin(phi)
        lam = if (lam <= 0) 0.0 else c.x / (FXC * math.sqrt(lam))
        c.x = lam; c.y = phi
    }
    simple(P, fwdF, invF)
  }

  def crast(P: PJ): Unit = {
    val XM = 0.97720502380583984317; val RXM = 1.02332670794648848847
    val YM = 3.06998012383946546542; val RYM = 0.32573500793527994772
    val THIRD = 1.0 / 3
    simple(P,
      c => {
        val phi3 = c.y * THIRD
        c.x = XM * c.x * (2 * math.cos(phi3 + phi3) - 1)
        c.y = YM * math.sin(phi3)
      },
      c => {
        val phi = 3 * math.asin(c.y * RYM)
        c.x = c.x * RXM / (2 * math.cos((phi + phi) * THIRD) - 1)
        c.y = phi
      })
  }

  def denoy(P: PJ): Unit = {
    val C0 = 0.95; val C1 = -1.0 / 12; val C3 = 1.0 / 600
    val D1 = 0.9; val D5 = 0.03
    simple(P, c => {
      val lam = c.x; val phi = c.y
      val al = math.abs(lam)
      c.x = lam * math.cos((C0 + al * (C1 + al * al * C3)) *
        (phi * (D1 + D5 * phi * phi * phi * phi)))
      c.y = phi
    })
  }

  def fahey(P: PJ): Unit = {
    simple(P,
      c => {
        val t = math.tan(0.5 * c.y)
        c.y = 1.819152 * t
        c.x = 0.819152 * c.x * asqrt(1 - t * t)
      },
      c => {
        val y = c.y / 1.819152
        val phi = 2 * math.atan(y)
        val w = 1 - y * y
        c.x = if (math.abs(w) < 1e-6) 0.0 else c.x / (0.819152 * math.sqrt(w))
        c.y = phi
      })
  }

  def hammer(P: PJ): Unit = {
    var w = 0.5
    if (P.params.has("W")) {
      w = math.abs(P.params.d("W"))
      if (w <= 0) throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "hammer: W should be > 0")
    }
    var m = 1.0
    if (P.params.has("M")) {
      m = math.abs(P.params.d("M"))
      if (m <= 0) throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "hammer: M should be > 0")
    }
    val rm = 1.0 / m
    m /= w
    val (wf, mf, rmf) = (w, m, rm)
    def fwdF(c: Coord): Unit = {
        val cosphi = math.cos(c.y)
        val lam = c.x * wf
        val denom = 1 + cosphi * math.cos(lam)
        if (denom == 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val d = math.sqrt(2 / denom)
        c.x = mf * d * cosphi * math.sin(lam)
        c.y = rmf * d * math.sin(c.y)
    }
    def invF(c: Coord): Unit = {
        val z = math.sqrt(1 - 0.25 * wf * wf * c.x * c.x - 0.25 * c.y * c.y)
        if (math.abs(2 * z * z - 1) < 1e-10)
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        else {
          val lam = aatan2(wf * c.x * z, 2 * z * z - 1) / wf
          c.y = aasin(c, z * c.y)
          c.x = lam
        }
    }
    simple(P, fwdF, invF)
  }

  private def aitoffSetup(P: PJ, winkel: Boolean, cosphi1: Double): Unit = {
    def fwdF(c: Coord): Unit = {
        val cc = 0.5 * c.x
        val d = math.acos(math.cos(c.y) * math.cos(cc))
        var x = 0.0; var y = 0.0
        if (d != 0.0) {
          y = 1.0 / math.sin(d)
          x = 2 * d * math.cos(c.y) * math.sin(cc) * y
          y *= d * math.sin(c.y)
        }
        if (winkel) {
          x = (x + c.x * cosphi1) * 0.5
          y = (y + c.y) * 0.5
        }
        c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
        // Newton-Raphson with Jacobian (Ipbüker 2002); reference
        // aitoff.cpp:120-215
        val EPS = 1e-12
        val tx = c.x; val ty = c.y
        if (math.abs(tx) < EPS && math.abs(ty) < EPS) { c.x = 0; c.y = 0; return }
        var phi = ty; var lam = tx
        var round = 0
        var iterLast = 0
        var done = false
        while (!done && round < 21) {
          var iter = 0
          var innerDone = false
          while (!innerDone) {
            val sl = math.sin(lam * 0.5); val cl = math.cos(lam * 0.5)
            val sp = math.sin(phi); val cp = math.cos(phi)
            var dD = cp * cl
            val cC = 1 - dD * dD
            val denom = math.pow(cC, 1.5)
            if (denom == 0) {
              c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
              c.x = lam; c.y = phi
              return
            }
            dD = math.acos(dD) / denom
            var f1 = 2 * dD * cC * cp * sl
            var f2 = dD * cC * sp
            var f1p = 2 * (sl * cl * sp * cp / cC - dD * sp * sl)
            var f1l = cp * cp * sl * sl / cC + dD * cp * cl * sp * sp
            var f2p = sp * sp * cl / cC + dD * sl * sl * cp
            var f2l = 0.5 * (sp * cp * sl / cC - dD * sp * cp * cp * sl * cl)
            if (winkel) {
              f1 = 0.5 * (f1 + lam * cosphi1)
              f2 = 0.5 * (f2 + phi)
              f1p *= 0.5
              f1l = 0.5 * (f1l + cosphi1)
              f2p = 0.5 * (f2p + 1)
              f2l *= 0.5
            }
            f1 -= tx; f2 -= ty
            var dp = f1p * f2l - f2p * f1l
            var dl = (f2 * f1p - f1 * f2p) / dp
            dp = (f1 * f2l - f2 * f1l) / dp
            dl = dl % math.Pi
            phi -= dp
            lam -= dl
            iter += 1
            if (!((math.abs(dp) > EPS || math.abs(dl) > EPS) && iter < 11)) innerDone = true
            iterLast = iter
          }
          if (phi > HALFPI) phi -= 2 * (phi - HALFPI)
          if (phi < -HALFPI) phi -= 2 * (phi + HALFPI)
          if (math.abs(math.abs(phi) - HALFPI) < EPS && !winkel) lam = 0
          // verify
          val cc = 0.5 * lam
          val d = math.acos(math.cos(phi) * math.cos(cc))
          var x = 0.0; var y = 0.0
          if (d != 0.0) {
            y = 1.0 / math.sin(d)
            x = 2 * d * math.cos(phi) * math.sin(cc) * y
            y *= d * math.sin(phi)
          }
          if (winkel) {
            x = (x + lam * cosphi1) * 0.5
            y = (y + phi) * 0.5
          }
          round += 1
          if (!((math.abs(tx - x) > EPS || math.abs(ty - y) > EPS) && round < 21)) done = true
        }
        c.x = lam; c.y = phi
    }
    simple(P, fwdF, invF)
  }

  def aitoff(P: PJ): Unit = aitoffSetup(P, winkel = false, 0.0)

  def wintri(P: PJ): Unit = {
    val cosphi1 =
      if (P.params.has("lat_1")) {
        val cp = math.cos(P.params.r("lat_1"))
        if (cp == 0)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "wintri: |lat_1| should be < 90")
        cp
      } else 0.636619772367581343
    aitoffSetup(P, winkel = true, cosphi1)
  }

  /** robin — spline coefficient table (float-precision constants like the
    * reference, robin.cpp:43-115). */
  def robin(P: PJ): Unit = {
    val X: Array[Array[Float]] = Array(
      Array(1.0f, 2.2199e-17f, -7.15515e-05f, 3.1103e-06f),
      Array(0.9986f, -0.000482243f, -2.4897e-05f, -1.3309e-06f),
      Array(0.9954f, -0.00083103f, -4.48605e-05f, -9.86701e-07f),
      Array(0.99f, -0.00135364f, -5.9661e-05f, 3.6777e-06f),
      Array(0.9822f, -0.00167442f, -4.49547e-06f, -5.72411e-06f),
      Array(0.973f, -0.00214868f, -9.03571e-05f, 1.8736e-08f),
      Array(0.96f, -0.00305085f, -9.00761e-05f, 1.64917e-06f),
      Array(0.9427f, -0.00382792f, -6.53386e-05f, -2.6154e-06f),
      Array(0.9216f, -0.00467746f, -0.00010457f, 4.81243e-06f),
      Array(0.8962f, -0.00536223f, -3.23831e-05f, -5.43432e-06f),
      Array(0.8679f, -0.00609363f, -0.000113898f, 3.32484e-06f),
      Array(0.835f, -0.00698325f, -6.40253e-05f, 9.34959e-07f),
      Array(0.7986f, -0.00755338f, -5.00009e-05f, 9.35324e-07f),
      Array(0.7597f, -0.00798324f, -3.5971e-05f, -2.27626e-06f),
      Array(0.7186f, -0.00851367f, -7.01149e-05f, -8.6303e-06f),
      Array(0.6732f, -0.00986209f, -0.000199569f, 1.91974e-05f),
      Array(0.6213f, -0.010418f, 8.83923e-05f, 6.24051e-06f),
      Array(0.5722f, -0.00906601f, 0.000182f, 6.24051e-06f),
      Array(0.5322f, -0.00677797f, 0.000275608f, 6.24051e-06f))
    val Y: Array[Array[Float]] = Array(
      Array(-5.20417e-18f, 0.0124f, 1.21431e-18f, -8.45284e-11f),
      Array(0.062f, 0.0124f, -1.26793e-09f, 4.22642e-10f),
      Array(0.124f, 0.0124f, 5.07171e-09f, -1.60604e-09f),
      Array(0.186f, 0.0123999f, -1.90189e-08f, 6.00152e-09f),
      Array(0.248f, 0.0124002f, 7.10039e-08f, -2.24e-08f),
      Array(0.31f, 0.0123992f, -2.64997e-07f, 8.35986e-08f),
      Array(0.372f, 0.0124029f, 9.88983e-07f, -3.11994e-07f),
      Array(0.434f, 0.0123893f, -3.69093e-06f, -4.35621e-07f),
      Array(0.4958f, 0.0123198f, -1.02252e-05f, -3.45523e-07f),
      Array(0.5571f, 0.0121916f, -1.54081e-05f, -5.82288e-07f),
      Array(0.6176f, 0.0119938f, -2.41424e-05f, -5.25327e-07f),
      Array(0.6769f, 0.011713f, -3.20223e-05f, -5.16405e-07f),
      Array(0.7346f, 0.0113541f, -3.97684e-05f, -6.09052e-07f),
      Array(0.7903f, 0.0109107f, -4.89042e-05f, -1.04739e-06f),
      Array(0.8435f, 0.0103431f, -6.4615e-05f, -1.40374e-09f),
      Array(0.8936f, 0.00969686f, -6.4636e-05f, -8.547e-06f),
      Array(0.9394f, 0.00840947f, -0.000192841f, -4.2106e-06f),
      Array(0.9761f, 0.00616527f, -0.000256f, -4.2106e-06f),
      Array(1.0f, 0.00328947f, -0.000319159f, -4.2106e-06f))
    val FXC = 0.8487; val FYC = 1.3523
    val C1 = 11.45915590261646417544; val RC1 = 0.08726646259971647884
    val NODES = 18; val ONEEPS = 1.000001

    @inline def v(cf: Array[Float], z: Double): Double =
      cf(0) + z * (cf(1) + z * (cf(2) + z * cf(3).toDouble))
    @inline def dv(cf: Array[Float], z: Double): Double =
      cf(1) + 2 * z * cf(2) + z * z * 3.0 * cf(3)

    def fwdF(c: Coord): Unit = {
        var dphi = math.abs(c.y)
        var i = if (c.y.isNaN) -1L else math.round(math.floor(dphi * C1 + 1e-15))
        if (i < 0) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        if (i >= NODES) i = NODES
        dphi = RAD2DEG * (dphi - RC1 * i)
        val x = v(X(i.toInt), dphi) * FXC * c.x
        var y = v(Y(i.toInt), dphi) * FYC
        if (c.y < 0) y = -y
        c.x = x; c.y = y
    }
    def invF(c: Coord): Unit = {
        var lam = c.x / FXC
        var phi = math.abs(c.y / FYC)
        if (phi >= 1) {
          if (phi > ONEEPS) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          phi = if (c.y < 0) -HALFPI else HALFPI
          lam /= X(NODES)(0)
          c.x = lam; c.y = phi
        } else {
          var i = (if (phi.isNaN) -1L else math.round(math.floor(phi * NODES))).toInt
          if (i < 0 || i >= NODES) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          var found = false
          while (!found) {
            if (Y(i)(0) > phi) i -= 1
            else if (Y(i + 1)(0) <= phi) i += 1
            else found = true
          }
          val t0 = Y(i)
          var t = 5.0 * (phi - t0(0)) / (Y(i + 1)(0) - t0(0))
          var iters = 100
          var conv = false
          while (iters > 0 && !conv) {
            val t1 = (v(t0, t) - phi) / dv(t0, t)
            t -= t1
            if (math.abs(t1) < 1e-10) conv = true
            iters -= 1
          }
          if (!conv) c.err = ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN
          phi = (5 * i + t) * DEG2RAD
          if (c.y < 0) phi = -phi
          lam /= v(X(i), t)
          if (math.abs(lam) > math.Pi)
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
          else { c.x = lam; c.y = phi }
        }
    }
    simple(P, fwdF, invF)
  }

  def vandg(P: PJ): Unit = {
    val TOL = 1e-10; val THIRD = 1.0 / 3
    val C2_27 = 2.0 / 27; val PI4_3 = 4.18879020478639098458
    val PISQ = 9.86960440108935861869; val TPISQ = 19.73920880217871723738
    val HPISQ = 4.93480220054467930934
    val over = P.over
    def fwdF(c: Coord): Unit = {
        val lam = c.x; val phi = c.y
        var p2 = math.abs(phi / HALFPI)
        if (p2 - TOL > 1) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val sign = if (over && math.abs(lam) > math.Pi) -1 else 1
        if (p2 > 1) p2 = 1
        if (math.abs(phi) <= TOL) { c.x = lam; c.y = 0 }
        else if (math.abs(lam) <= TOL || math.abs(p2 - 1) < TOL) {
          c.x = 0
          c.y = math.Pi * math.tan(0.5 * math.asin(p2)) * (if (phi < 0) -1 else 1)
        } else {
          val al = 0.5 * sign * math.abs(math.Pi / lam - lam / math.Pi)
          val al2 = al * al
          var g = math.sqrt(1 - p2 * p2)
          g = g / (p2 + g - 1)
          val g2 = g * g
          var pp = g * (2 / p2 - 1)
          pp = pp * pp
          var x = g - pp
          val gg = pp + al2
          x = math.Pi * math.abs(al * x + math.sqrt(al2 * x * x - gg * (g2 - pp))) / gg
          if (lam < 0) x = -x
          var y = math.abs(x / math.Pi)
          y = 1 - y * (y + 2 * al)
          if (y < -TOL) {
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
          y = if (y < 0) 0.0 else math.sqrt(y) * (if (phi < 0) -math.Pi else math.Pi)
          c.x = x; c.y = y
        }
    }
    def invF(c: Coord): Unit = {
        val x2 = c.x * c.x
        val ay = math.abs(c.y)
        if (ay < TOL) {
          c.y = 0
          val t = x2 * x2 + TPISQ * (x2 + HPISQ)
          c.x = if (math.abs(c.x) <= TOL) 0.0
                else 0.5 * (x2 - PISQ + math.sqrt(t)) / c.x
          return
        }
        val y2 = c.y * c.y
        val r = x2 + y2
        val r2 = r * r
        var c1 = -math.Pi * ay * (r + PISQ)
        val c3 = r2 + TWOPI * (ay * r + math.Pi * (y2 + math.Pi * (ay + HALFPI)))
        var c2 = c1 + PISQ * (r - 3 * y2)
        val c0 = math.Pi * ay
        c2 /= c3
        val al = c1 / c3 - THIRD * c2 * c2
        val m = 2 * math.sqrt(-THIRD * al)
        var d = C2_27 * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
        val alM = al * m
        if (math.abs(alM) < 1e-16) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        d = 3 * d / alM
        val t = math.abs(d)
        if (t - TOL <= 1) {
          d = if (t > 1) { if (d > 0) 0.0 else math.Pi } else math.acos(d)
          var dd = d
          if (r > PISQ) dd = TWOPI - d
          var phi = math.Pi * (m * math.cos(dd * THIRD + PI4_3) - THIRD * c2)
          if (c.y < 0) phi = -phi
          val tt = r2 + TPISQ * (x2 - y2 + HPISQ)
          val lam = if (math.abs(c.x) <= TOL) 0.0
            else 0.5 * (r - PISQ + (if (tt <= 0) 0.0 else math.sqrt(tt))) / c.x
          c.x = lam; c.y = phi
        } else c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
    }
    simple(P, fwdF, invF)
  }
}
