package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Pseudocylindrical / misc part 4: Gall, Miller (+compact), Times, Natural
  * Earth I/II, Patterson, Nell(+Hammer), McBryde-Thomas variants, loximuthal,
  * Foucaut sinusoidal, Hatano, Lagrange, globular no-inverse family, August,
  * Nicolosi, Ginsburg VIII, Laskowski, Larrivée. Math per the cited
  * reference files. */
object PseudoCyl4Ops {
  private def kernel2(P: PJ, fwdF: Coord => Unit, invF: Coord => Unit = null): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | (if (invF != null) INV2 else 0)
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = if (invF != null) invF(c)
    }
  }

  def gall(P: PJ): Unit = {
    val YF = 1.70710678118654752440; val XF = 0.70710678118654752440
    val RYF = 0.58578643762690495119; val RXF = 1.41421356237309504880
    kernel2(P,
      c => { c.x = XF * c.x; c.y = YF * math.tan(0.5 * c.y) },
      c => { c.x = RXF * c.x; c.y = 2 * math.atan(c.y * RYF) })
  }

  def mill(P: PJ): Unit = {
    kernel2(P,
      c => { c.y = math.log(math.tan(QUARTERPI + c.y * 0.4)) * 1.25 },
      c => { c.y = 2.5 * (math.atan(math.exp(0.8 * c.y)) - QUARTERPI) })
  }

  /** Newton inverse over an odd polynomial y(phi); shared by comill,
    * natearth(2), patterson. */
  private def polyNewtonInv(c: Coord, y0: Double, maxY: Double,
                            f: Double => Double, fder: Double => Double): Double = {
    var y = y0
    if (y > maxY) y = maxY else if (y < -maxY) y = -maxY
    var yc = y
    var i = 100
    var conv = false
    while (i > 0 && !conv) {
      val t = (f(yc) - y) / fder(yc)
      yc -= t
      if (math.abs(t) < 1e-11) conv = true
      i -= 1
    }
    if (!conv) c.err = ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN
    yc
  }

  def comill(P: PJ): Unit = {
    val K1 = 0.9902; val K2 = 0.1604; val K3 = -0.03054
    val MAX_Y = 0.6000207669862655 * math.Pi
    kernel2(P,
      c => { val p2 = c.y * c.y; c.y = c.y * (K1 + p2 * (K2 + K3 * p2)) },
      c => {
        c.y = polyNewtonInv(c, c.y, MAX_Y,
          yc => { val y2 = yc * yc; yc * (K1 + y2 * (K2 + K3 * y2)) },
          yc => { val y2 = yc * yc; K1 + y2 * (3 * K2 + 5 * K3 * y2) })
      })
  }

  def times(P: PJ): Unit = {
    kernel2(P,
      c => {
        val t = math.tan(c.y / 2)
        val s = math.sin(QUARTERPI * t)
        c.x = c.x * (0.74482 - 0.34588 * s * s)
        c.y = 1.70711 * t
      },
      c => {
        val t = c.y / 1.70711
        val s = math.sin(QUARTERPI * t)
        c.x = c.x / (0.74482 - 0.34588 * s * s)
        c.y = 2 * math.atan(t)
      })
  }

  def natearth(P: PJ): Unit = {
    val A0 = 0.8707; val A1 = -0.131979; val A2 = -0.013791
    val A3 = 0.003971; val A4 = -0.001529
    val B0 = 1.007226; val B1 = 0.015085; val B2 = -0.044475
    val B3 = 0.028874; val B4 = -0.005916
    val MAX_Y = 0.8707 * 0.52 * math.Pi
    kernel2(P,
      c => {
        val p2 = c.y * c.y; val p4 = p2 * p2
        c.x = c.x * (A0 + p2 * (A1 + p2 * (A2 + p4 * p2 * (A3 + p2 * A4))))
        c.y = c.y * (B0 + p2 * (B1 + p4 * (B2 + B3 * p2 + B4 * p4)))
      },
      c => {
        val yc = polyNewtonInv(c, c.y, MAX_Y,
          y => { val y2 = y * y; val y4 = y2 * y2
            y * (B0 + y2 * (B1 + y4 * (B2 + B3 * y2 + B4 * y4))) },
          y => { val y2 = y * y; val y4 = y2 * y2
            B0 + y2 * (3 * B1 + y4 * (7 * B2 + 9 * B3 * y2 + 11 * B4 * y4)) })
        val y2 = yc * yc
        c.x = c.x / (A0 + y2 * (A1 + y2 * (A2 + y2 * y2 * y2 * (A3 + y2 * A4))))
        c.y = yc
      })
  }

  def natearth2(P: PJ): Unit = {
    val A0 = 0.84719; val A1 = -0.13063; val A2 = -0.04515
    val A3 = 0.05494; val A4 = -0.02326; val A5 = 0.00331
    val B0 = 1.01183; val B1 = -0.02625; val B2 = 0.01926; val B3 = -0.00396
    val MAX_Y = 0.84719 * 0.535117535153096 * math.Pi
    kernel2(P,
      c => {
        val p2 = c.y * c.y; val p4 = p2 * p2; val p6 = p2 * p4
        c.x = c.x * (A0 + A1 * p2 + p6 * p6 * (A2 + A3 * p2 + A4 * p4 + A5 * p6))
        c.y = c.y * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4))
      },
      c => {
        val yc = polyNewtonInv(c, c.y, MAX_Y,
          y => { val y2 = y * y; val y4 = y2 * y2
            y * (B0 + y4 * y4 * (B1 + B2 * y2 + B3 * y4)) },
          y => { val y2 = y * y; val y4 = y2 * y2
            B0 + y4 * y4 * (9 * B1 + 11 * B2 * y2 + 13 * B3 * y4) })
        val y2 = yc * yc; val y4 = y2 * y2; val y6 = y2 * y4
        c.x = c.x / (A0 + A1 * y2 + y6 * y6 * (A2 + A3 * y2 + A4 * y4 + A5 * y6))
        c.y = yc
      })
  }

  def patterson(P: PJ): Unit = {
    val K1 = 1.0148; val K2 = 0.23185; val K3 = -0.14499; val K4 = 0.02406
    val MAX_Y = 1.790857183
    kernel2(P,
      c => { val p2 = c.y * c.y
        c.y = c.y * (K1 + p2 * p2 * (K2 + p2 * (K3 + K4 * p2))) },
      c => {
        c.y = polyNewtonInv(c, c.y, MAX_Y,
          y => { val y2 = y * y; y * (K1 + y2 * y2 * (K2 + y2 * (K3 + K4 * y2))) },
          y => { val y2 = y * y; K1 + y2 * y2 * (5 * K2 + y2 * (7 * K3 + 9 * K4 * y2)) })
      })
  }

  def nell(P: PJ): Unit = {
    kernel2(P,
      c => {
        val k = 2 * math.sin(c.y)
        val p2 = c.y * c.y
        var phi = c.y * (1.00371 + p2 * (-0.0935382 + p2 * -0.011412))
        var i = 10
        var conv = false
        while (i > 0 && !conv) {
          val v = (phi + math.sin(phi) - k) / (1 + math.cos(phi))
          phi -= v
          if (math.abs(v) < 1e-7) conv = true
          i -= 1
        }
        c.x = 0.5 * c.x * (1 + math.cos(phi))
        c.y = phi
      },
      c => {
        val lam = 2 * c.x / (1 + math.cos(c.y))
        c.y = aasin(c, 0.5 * (c.y + math.sin(c.y)))
        c.x = lam
      })
  }

  def nellH(P: PJ): Unit = {
    kernel2(P,
      c => {
        c.x = 0.5 * c.x * (1 + math.cos(c.y))
        c.y = 2.0 * (c.y - math.tan(0.5 * c.y))
      },
      c => {
        val p = 0.5 * c.y
        var phi = 0.0
        var i = 9
        var conv = false
        while (i > 0 && !conv) {
          val cc = math.cos(0.5 * phi)
          val v = (phi - math.tan(phi / 2) - p) / (1 - 0.5 / (cc * cc))
          phi -= v
          if (math.abs(v) < 1e-7) conv = true
          i -= 1
        }
        if (!conv) {
          phi = if (p < 0) -HALFPI else HALFPI
          c.x = 2 * c.x
        } else c.x = 2 * c.x / (1 + math.cos(phi))
        c.y = phi
      })
  }

  def mbtFps(P: PJ): Unit = {
    val C1 = 0.45503; val C2 = 1.36509; val C3 = 1.41546
    val CX = 0.22248; val CY = 1.44492; val C1_2 = 1.0 / 3
    kernel2(P,
      c => {
        val k = C3 * math.sin(c.y)
        var phi = c.y
        var i = 10
        var conv = false
        while (i > 0 && !conv) {
          val t = phi / C2
          val v = (C1 * math.sin(t) + math.sin(phi) - k) / (C1_2 * math.cos(t) + math.cos(phi))
          phi -= v
          if (math.abs(v) < 1e-7) conv = true
          i -= 1
        }
        val t = phi / C2
        c.x = CX * c.x * (1 + 3 * math.cos(phi) / math.cos(t))
        c.y = CY * math.sin(t)
      },
      c => {
        val t = aasin(c, c.y / CY)
        val phi = C2 * t
        c.x = c.x / (CX * (1 + 3 * math.cos(phi) / math.cos(t)))
        c.y = aasin(c, (C1 * math.sin(t) + math.sin(phi)) / C3)
      })
  }

  def mbtfpp(P: PJ): Unit = {
    val CSy = 0.95257934441568037152; val FXC = 0.92582009977255146156
    val FYC = 3.40168025708304504493; val C23 = 2.0 / 3
    val C13 = 1.0 / 3; val ONEEPS = 1.0000001
    def invF(c: Coord): Unit = {
      var phi = c.y / FYC
      if (math.abs(phi) >= 1) {
        if (math.abs(phi) > ONEEPS) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        phi = if (phi < 0) -HALFPI else HALFPI
      } else phi = math.asin(phi)
      phi *= 3
      c.x = c.x / (FXC * (2 * math.cos(C23 * phi) - 1))
      phi = math.sin(phi) / CSy
      if (math.abs(phi) >= 1) {
        if (math.abs(phi) > ONEEPS) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        phi = if (phi < 0) -HALFPI else HALFPI
      } else phi = math.asin(phi)
      c.y = phi
    }
    kernel2(P,
      c => {
        val phi = math.asin(CSy * math.sin(c.y))
        c.x = FXC * c.x * (2 * math.cos(C23 * phi) - 1)
        c.y = FYC * math.sin(C13 * phi)
      }, invF)
  }

  def mbtfpq(P: PJ): Unit = {
    val C = 1.70710678118654752440; val RC = 0.58578643762690495119
    val FYC = 1.87475828462269495505; val RYC = 0.53340209679417701685
    val FXC = 0.31245971410378249250; val RXC = 3.20041258076506210122
    val ONETOL = 1.000001
    def invF(c: Coord): Unit = {
      var phi = RYC * c.y
      var t = 0.0
      if (math.abs(phi) > 1) {
        if (math.abs(phi) > ONETOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        if (phi < 0) { t = -1; phi = -math.Pi } else { t = 1; phi = math.Pi }
      } else { t = phi; phi = 2 * math.asin(phi) }
      c.x = RXC * c.x / (1 + 2 * math.cos(phi) / math.cos(0.5 * phi))
      phi = RC * (t + math.sin(phi))
      if (math.abs(phi) > 1) {
        if (math.abs(phi) > ONETOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        phi = if (phi < 0) -HALFPI else HALFPI
      } else phi = math.asin(phi)
      c.y = phi
    }
    kernel2(P,
      c => {
        val k = C * math.sin(c.y)
        var phi = c.y
        var i = 20
        var conv = false
        while (i > 0 && !conv) {
          val th1 = (math.sin(0.5 * phi) + math.sin(phi) - k) /
            (0.5 * math.cos(0.5 * phi) + math.cos(phi))
          phi -= th1
          if (math.abs(th1) < 1e-7) conv = true
          i -= 1
        }
        c.x = FXC * c.x * (1 + 2 * math.cos(phi) / math.cos(0.5 * phi))
        c.y = FYC * math.sin(0.5 * phi)
      }, invF)
  }

  def loxim(P: PJ): Unit = {
    val EPS = 1e-8
    val phi1 = P.params.r("lat_1")
    val cosphi1 = math.cos(phi1)
    if (cosphi1 < EPS)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "loxim: |lat_1| should be < 90")
    val tanphi1 = math.tan(QUARTERPI + 0.5 * phi1)
    kernel2(P,
      c => {
        val y = c.y - phi1
        if (math.abs(y) < EPS) c.x = c.x * cosphi1
        else {
          var x = QUARTERPI + 0.5 * c.y
          x = if (math.abs(x) < EPS || math.abs(math.abs(x) - HALFPI) < EPS) 0.0
              else c.x * y / math.log(math.tan(x) / tanphi1)
          c.x = x
        }
        c.y = y
      },
      c => {
        val phi = c.y + phi1
        if (math.abs(c.y) < EPS) c.x = c.x / cosphi1
        else {
          var lam = QUARTERPI + 0.5 * phi
          lam = if (math.abs(lam) < EPS || math.abs(math.abs(lam) - HALFPI) < EPS) 0.0
                else c.x * math.log(math.tan(lam) / tanphi1) / c.y
          c.x = lam
        }
        c.y = phi
      })
  }

  def foucS(P: PJ): Unit = {
    val n = P.params.d("n")
    if (n < 0 || n > 1)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "fouc_s: n should be in [0,1]")
    val n1 = 1 - n
    kernel2(P,
      c => {
        val t = math.cos(c.y)
        c.x = c.x * t / (n + n1 * t)
        c.y = n * c.y + n1 * math.sin(c.y)
      },
      c => {
        var phi = 0.0
        if (n != 0.0) {
          phi = c.y
          var i = 10
          var conv = false
          while (i > 0 && !conv) {
            val v = (n * phi + n1 * math.sin(phi) - c.y) / (n + n1 * math.cos(phi))
            phi -= v
            if (math.abs(v) < 1e-7) conv = true
            i -= 1
          }
          if (!conv) phi = if (c.y < 0) -HALFPI else HALFPI
        } else phi = aasin(c, c.y)
        val v = math.cos(phi)
        c.x = c.x * (n + n1 * v) / v
        c.y = phi
      })
  }

  def hatano(P: PJ): Unit = {
    val CN = 2.67595; val CS = 2.43763
    val RCN = 0.37369906014686373063; val RCS = 0.41023453108141924738
    val FYCN = 1.75859; val FYCS = 1.93052
    val RYCN = 0.56863737426006061674; val RYCS = 0.51799515156538134803
    val FXC = 0.85; val RXC = 1.17647058823529411764
    val ONETOL = 1.000001
    def invF(c: Coord): Unit = {
      var th = c.y * (if (c.y < 0) RYCS else RYCN)
      if (math.abs(th) > 1) {
        if (math.abs(th) > ONETOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        th = if (th > 0) HALFPI else -HALFPI
      } else th = math.asin(th)
      c.x = RXC * c.x / math.cos(th)
      th += th
      var phi = (th + math.sin(th)) * (if (c.y < 0) RCS else RCN)
      if (math.abs(phi) > 1) {
        if (math.abs(phi) > ONETOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        phi = if (phi > 0) HALFPI else -HALFPI
      } else phi = math.asin(phi)
      c.y = phi
    }
    kernel2(P,
      c => {
        val k = math.sin(c.y) * (if (c.y < 0) CS else CN)
        var phi = c.y
        var i = 20
        var conv = false
        while (i > 0 && !conv) {
          val th1 = (phi + math.sin(phi) - k) / (1 + math.cos(phi))
          phi -= th1
          if (math.abs(th1) < 1e-7) conv = true
          i -= 1
        }
        phi *= 0.5
        c.x = FXC * c.x * math.cos(phi)
        c.y = math.sin(phi) * (if (phi < 0) FYCS else FYCN)
      }, invF)
  }

  def lagrng(P: PJ): Unit = {
    val TOL = 1e-10
    val w = if (P.params.has("W")) P.params.d("W") else 2.0
    if (w <= 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lagrng: W should be > 0")
    val hw = 0.5 * w; val rw = 1 / w; val hrw = 0.5 * rw
    val sinPhi1 = math.sin(P.params.r("lat_1"))
    if (math.abs(math.abs(sinPhi1) - 1) < TOL)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "lagrng: |lat_1| should be < 90")
    val a1 = math.pow((1 - sinPhi1) / (1 + sinPhi1), hrw)
    val a2 = a1 * a1
    def fwdF(c: Coord): Unit = {
      val sinPhi = math.sin(c.y)
      if (math.abs(math.abs(sinPhi) - 1) < TOL) {
        c.x = 0
        c.y = if (c.y < 0) -2.0 else 2.0
      } else {
        val v = a1 * math.pow((1 + sinPhi) / (1 - sinPhi), hrw)
        val lam = c.x * rw
        val cc = 0.5 * (v + 1 / v) + math.cos(lam)
        if (cc < TOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        c.x = 2 * math.sin(lam) / cc
        c.y = (v - 1 / v) / cc
      }
    }
    def invF(c: Coord): Unit = {
      if (math.abs(math.abs(c.y) - 2) < TOL) {
        c.y = if (c.y < 0) -HALFPI else HALFPI
        c.x = 0
      } else {
        val x2 = c.x * c.x
        val y2p = 2 + c.y
        val y2m = 2 - c.y
        val cc = y2p * y2m - x2
        if (math.abs(cc) < TOL) {
          c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        c.y = 2 * math.atan(math.pow((y2p * y2p + x2) / (a2 * (y2m * y2m + x2)), hw)) - HALFPI
        c.x = w * math.atan2(4 * c.x, cc)
      }
    }
    kernel2(P, fwdF, invF)
  }

  private def baconSetup(P: PJ, bacn: Boolean, ortl: Boolean): Unit = {
    val HLFPI2 = 2.46740110027233965467; val EPS = 1e-10
    kernel2(P, c => {
      val y = if (bacn) HALFPI * math.sin(c.y) else c.y
      val ax = math.abs(c.x)
      var x = 0.0
      if (ax >= EPS) {
        if (ortl && ax >= HALFPI)
          x = math.sqrt(HLFPI2 - c.y * c.y + EPS) + ax - HALFPI
        else {
          val f = 0.5 * (HLFPI2 / ax + ax)
          x = ax - f + math.sqrt(f * f - y * y)
        }
        if (c.x < 0) x = -x
      }
      c.x = x; c.y = y
    })
  }
  def bacon(P: PJ): Unit = baconSetup(P, bacn = true, ortl = false)
  def apian(P: PJ): Unit = baconSetup(P, bacn = false, ortl = false)
  def ortel(P: PJ): Unit = baconSetup(P, bacn = false, ortl = true)

  def august(P: PJ): Unit = {
    val M = 1.333333333333333
    kernel2(P, c => {
      val t = math.tan(0.5 * c.y)
      val c1 = math.sqrt(1 - t * t)
      val lam = c.x * 0.5
      val cc = 1 + c1 * math.cos(lam)
      val x1 = math.sin(lam) * c1 / cc
      val y1 = t / cc
      val x12 = x1 * x1; val y12 = y1 * y1
      c.x = M * x1 * (3 + x12 - 3 * y12)
      c.y = M * y1 * (3 + 3 * x12 - y12)
    })
  }

  def nicol(P: PJ): Unit = {
    val EPS = 1e-10
    kernel2(P, c => {
      val lam = c.x; val phi = c.y
      if (math.abs(lam) < EPS) { c.x = 0; c.y = phi }
      else if (math.abs(phi) < EPS) { c.x = lam; c.y = 0 }
      else if (math.abs(math.abs(lam) - HALFPI) < EPS) {
        c.x = lam * math.cos(phi)
        c.y = HALFPI * math.sin(phi)
      } else if (math.abs(math.abs(phi) - HALFPI) < EPS) { c.x = 0; c.y = phi }
      else {
        val tb = HALFPI / lam - lam / HALFPI
        val cc = phi / HALFPI
        val sp = math.sin(phi)
        val dd = (1 - cc * cc) / (sp - cc)
        var r2 = tb / dd
        r2 *= r2
        val m = (tb * sp / dd - 0.5 * tb) / (1 + r2)
        val n = (sp / r2 + 0.5 * dd) / (1 + 1 / r2)
        var x = math.cos(phi)
        x = math.sqrt(m * m + x * x / (1 + r2))
        c.x = HALFPI * (m + (if (lam < 0) -x else x))
        val y = math.sqrt(n * n - (sp * sp / r2 + dd * sp - 1) / (1 + 1 / r2))
        c.y = HALFPI * (n + (if (phi < 0) y else -y))
      }
    })
  }

  def gins8(P: PJ): Unit = {
    val Cl = 0.000952426; val Cp = 0.162388; val C12 = 1.0 / 12
    kernel2(P, c => {
      var t = c.y * c.y
      val y = c.y * (1 + t * C12)
      var x = c.x * (1 - Cp * t)
      t = c.x * c.x
      x *= 0.87 - Cl * t * t
      c.x = x; c.y = y
    })
  }

  def lask(P: PJ): Unit = {
    val a10 = 0.975534; val a12 = -0.119161; val a32 = -0.0143059; val a14 = -0.0547009
    val b01 = 1.00384; val b21 = 0.0802894; val b03 = 0.0998909
    val b41 = 0.000199025; val b23 = -0.0285500; val b05 = -0.0491032
    kernel2(P, c => {
      val l2 = c.x * c.x
      val p2 = c.y * c.y
      val x = c.x * (a10 + p2 * (a12 + l2 * a32 + p2 * a14))
      val y = c.y * (b01 + l2 * (b21 + p2 * b23 + l2 * b41) + p2 * (b03 + p2 * b05))
      c.x = x; c.y = y
    })
  }

  def larr(P: PJ): Unit = {
    val SIXTH = 1.0 / 6
    kernel2(P, c => {
      val x = 0.5 * c.x * (1 + math.sqrt(math.cos(c.y)))
      val y = c.y / (math.cos(0.5 * c.y) * math.cos(SIXTH * c.x))
      c.x = x; c.y = y
    })
  }
}
