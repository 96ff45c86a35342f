package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Pseudocylindrical / conic part 3: simple conics (Euler, Murdoch I-III,
  * perspective conic, Tissot, Vitkovsky), sine-tangent series (Kavrayskiy V,
  * quartic authalic, Foucaut, McBryde-Thomas flat-polar sine), Putnins
  * family, Urmaev, Wagner I-III/VII, Winkel I/II. Math per reference
  * src/projections/{sconics,sts,putp*,urm5,urmfps,wag2,wag3,wag7,wink1,
  * wink2}.cpp. */
object PseudoCyl3Ops {
  private final val EPS10 = 1e-10

  private def kernel2(P: PJ, fwdF: Coord => Unit, invF: Coord => Unit = null): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | (if (invF != null) INV2 else 0)
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = if (invF != null) invF(c)
    }
  }

  // ---------------- simple conics (reference sconics.cpp) ----------------

  final val EULER = 0; final val MURD1 = 1; final val MURD2 = 2; final val MURD3 = 3
  final val PCONIC = 4; final val TISSOT = 5; final val VITK1 = 6

  private def sconicsSetup(P: PJ, typ: Int): Unit = {
    val EPS = 1e-10
    if (!P.params.has("lat_1"))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "missing lat_1")
    if (!P.params.has("lat_2"))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "missing lat_2")
    val p1 = P.params.r("lat_1")
    val p2 = P.params.r("lat_2")
    var del = 0.5 * (p2 - p1)
    val sig = 0.5 * (p2 + p1)
    if (math.abs(del) < EPS || math.abs(sig) < EPS)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "|lat_1 - lat_2| and |lat_1 + lat_2| should be > 0")

    var n = 0.0; var rhoC = 0.0; var rho0 = 0.0; var c1 = 0.0; var c2 = 0.0
    typ match {
      case TISSOT =>
        n = math.sin(sig)
        val cs = math.cos(del)
        rhoC = n / cs + cs / n
        rho0 = math.sqrt((rhoC - 2 * math.sin(P.phi0)) / n)
      case MURD1 =>
        rhoC = math.sin(del) / (del * math.tan(sig)) + sig
        rho0 = rhoC - P.phi0
        n = math.sin(sig)
      case MURD2 =>
        val cs = math.sqrt(math.cos(del))
        rhoC = cs / math.tan(sig)
        rho0 = rhoC + math.tan(sig - P.phi0)
        n = math.sin(sig) * cs
      case MURD3 =>
        rhoC = del / (math.tan(sig) * math.tan(del)) + sig
        rho0 = rhoC - P.phi0
        n = math.sin(sig) * math.sin(del) * math.tan(del) / (del * del)
      case EULER =>
        n = math.sin(sig) * math.sin(del) / del
        del *= 0.5
        rhoC = del / (math.tan(del) * math.tan(sig)) + sig
        rho0 = rhoC - P.phi0
      case PCONIC =>
        n = math.sin(sig)
        c2 = math.cos(del)
        c1 = 1.0 / math.tan(sig)
        val d = P.phi0 - sig
        if (math.abs(d) - EPS10 >= HALFPI)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
            "|lat_0 - 0.5*(lat_1+lat_2)| should be < 90")
        rho0 = c2 * (c1 - math.tan(d))
      case VITK1 =>
        val cs = math.tan(del)
        n = cs * math.sin(sig) / del
        rhoC = del / (cs * math.tan(sig)) + sig
        rho0 = rhoC - P.phi0
    }
    val (nf, rcf, r0f, c1f, c2f) = (n, rhoC, rho0, c1, c2)
    kernel2(P,
      c => {
        val rho = typ match {
          case MURD2 => rcf + math.tan(sig - c.y)
          case PCONIC => c2f * (c1f - math.tan(c.y - sig))
          case _ => rcf - c.y
        }
        val lam = c.x * nf
        c.x = rho * math.sin(lam)
        c.y = r0f - rho * math.cos(lam)
      },
      c => {
        var x = c.x
        var y = r0f - c.y
        var rho = math.hypot(x, y)
        if (nf < 0) { rho = -rho; x = -x; y = -y }
        c.x = math.atan2(x, y) / nf
        c.y = typ match {
          case PCONIC => math.atan(c1f - rho / c2f) + sig
          case MURD2 => sig - math.atan(rho - rcf)
          case _ => rcf - rho
        }
      })
  }

  def euler(P: PJ): Unit = sconicsSetup(P, EULER)
  def murd1(P: PJ): Unit = sconicsSetup(P, MURD1)
  def murd2(P: PJ): Unit = sconicsSetup(P, MURD2)
  def murd3(P: PJ): Unit = sconicsSetup(P, MURD3)
  def pconic(P: PJ): Unit = sconicsSetup(P, PCONIC)
  def tissot(P: PJ): Unit = sconicsSetup(P, TISSOT)
  def vitk1(P: PJ): Unit = sconicsSetup(P, VITK1)

  // ---------------- sts family (reference sts.cpp) ----------------

  private def stsSetup(P: PJ, p: Double, q: Double, tanMode: Boolean): Unit = {
    val cx = q / p; val cy = p; val cp = 1 / q
    kernel2(P,
      c => {
        var x = cx * c.x * math.cos(c.y)
        var y = cy
        val phi = c.y * cp
        val cc = math.cos(phi)
        if (tanMode) { x *= cc * cc; y *= math.tan(phi) }
        else { x /= cc; y *= math.sin(phi) }
        c.x = x; c.y = y
      },
      c => {
        val y = c.y / cy
        var phi = if (tanMode) math.atan(y) else aasin(c, y)
        val cc = math.cos(phi)
        phi = phi / cp
        c.y = phi
        c.x = c.x / (cx * math.cos(phi))
        if (tanMode) c.x /= cc * cc else c.x *= cc
      })
  }

  def fouc(P: PJ): Unit = stsSetup(P, 2.0, 2.0, tanMode = true)
  def kav5(P: PJ): Unit = stsSetup(P, 1.50488, 1.35439, tanMode = false)
  def quaAut(P: PJ): Unit = stsSetup(P, 2.0, 2.0, tanMode = false)
  def mbtS(P: PJ): Unit = stsSetup(P, 1.48875, 1.36509, tanMode = false)

  // ---------------- Putnins family ----------------

  def putp2(P: PJ): Unit = {
    val CX = 1.89490; val CY = 1.71848; val CP = 0.6141848493043784
    val PI3 = 1.0471975511965977
    kernel2(P,
      c => {
        val p = CP * math.sin(c.y)
        val phi2 = c.y * c.y
        var phi = c.y * (0.615709 + phi2 * (0.00909953 + phi2 * 0.0046292))
        var i = 10
        var conv = false
        while (i > 0 && !conv) {
          val cc = math.cos(phi); val s = math.sin(phi)
          val v = (phi + s * (cc - 1) - p) / (1 + cc * (cc - 1) - s * s)
          phi -= v
          if (math.abs(v) < 1e-10) conv = true
          i -= 1
        }
        if (!conv) phi = if (phi < 0) -PI3 else PI3
        c.x = CX * c.x * (math.cos(phi) - 0.5)
        c.y = CY * math.sin(phi)
      },
      c => {
        var phi = aasin(c, c.y / CY)
        val cc = math.cos(phi)
        c.x = c.x / (CX * (cc - 0.5))
        c.y = aasin(c, (phi + math.sin(phi) * (cc - 1)) / CP)
      })
  }

  private def putp3Setup(P: PJ, a: Double): Unit = {
    val C = 0.79788456
    kernel2(P,
      c => { val x = C * c.x * (1 - a * c.y * c.y); c.y = C * c.y; c.x = x },
      c => { val phi = c.y / C; c.x = c.x / (C * (1 - a * phi * phi)); c.y = phi })
  }
  def putp3(P: PJ): Unit = putp3Setup(P, 4 * 0.1013211836)
  def putp3p(P: PJ): Unit = putp3Setup(P, 2 * 0.1013211836)

  private def putp4pSetup(P: PJ, cx: Double, cy: Double): Unit = {
    kernel2(P,
      c => {
        var phi = aasin(c, 0.883883476 * math.sin(c.y))
        var x = cx * c.x * math.cos(phi)
        phi *= 0.333333333333333
        x /= math.cos(phi)
        c.x = x
        c.y = cy * math.sin(phi)
      },
      c => {
        var phi = aasin(c, c.y / cy)
        var lam = c.x * math.cos(phi) / cx
        phi *= 3
        lam /= math.cos(phi)
        c.x = lam
        c.y = aasin(c, 1.13137085 * math.sin(phi))
      })
  }
  def putp4p(P: PJ): Unit = putp4pSetup(P, 0.874038744, 3.883251825)
  def weren(P: PJ): Unit = putp4pSetup(P, 1.0, 4.442882938)

  private def putp5Setup(P: PJ, a: Double, b: Double): Unit = {
    val C = 1.01346; val D = 1.2158542
    kernel2(P,
      c => {
        val x = C * c.x * (a - b * math.sqrt(1 + D * c.y * c.y))
        c.y = C * c.y; c.x = x
      },
      c => {
        val phi = c.y / C
        c.x = c.x / (C * (a - b * math.sqrt(1 + D * phi * phi)))
        c.y = phi
      })
  }
  def putp5(P: PJ): Unit = putp5Setup(P, 2.0, 1.0)
  def putp5p(P: PJ): Unit = putp5Setup(P, 1.5, 0.5)

  private def putp6Setup(P: PJ, cx: Double, cy: Double, a: Double, b: Double, dd: Double): Unit = {
    val CON_POLE = 1.732050807568877
    kernel2(P,
      c => {
        val p = b * math.sin(c.y)
        var phi = c.y * 1.10265779
        var i = 10
        var conv = false
        while (i > 0 && !conv) {
          val r = math.sqrt(1 + phi * phi)
          val v = ((a - r) * phi - math.log(phi + r) - p) / (a - 2 * r)
          phi -= v
          if (math.abs(v) < 1e-10) conv = true
          i -= 1
        }
        val root = if (!conv) { phi = if (p < 0) -CON_POLE else CON_POLE; 2.0 }
                   else math.sqrt(1 + phi * phi)
        c.x = cx * c.x * (dd - root)
        c.y = cy * phi
      },
      c => {
        val phi = c.y / cy
        val r = math.sqrt(1 + phi * phi)
        c.x = c.x / (cx * (dd - r))
        c.y = aasin(c, ((a - r) * phi - math.log(phi + r)) / b)
      })
  }
  def putp6(P: PJ): Unit = putp6Setup(P, 1.01346, 0.91910, 4.0, 2.1471437182129378784, 2.0)
  def putp6p(P: PJ): Unit = putp6Setup(P, 0.44329, 0.80404, 6.0, 5.61125, 3.0)

  // ---------------- Urmaev / Wagner / Winkel ----------------

  def urm5(P: PJ): Unit = {
    if (!P.params.has("n"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "urm5: missing parameter n")
    val n = P.params.d("n")
    if (n <= 0 || n > 1)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "urm5: n should be in ]0,1]")
    val q3 = P.params.d("q") / 3.0
    val alpha = P.params.r("alpha")
    val t0 = n * math.sin(alpha)
    val denom = math.sqrt(1 - t0 * t0)
    if (denom == 0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "urm5: n*sin(|alpha|) should be < 1")
    val m = math.cos(alpha) / denom
    val rmn = 1.0 / (m * n)
    kernel2(P, c => {
      val phi = aasin(c, n * math.sin(c.y))
      c.x = m * c.x * math.cos(phi)
      val t = phi * phi
      c.y = phi * (1 + t * q3) * rmn
    })
  }

  private def urmfpsSetup(P: PJ, n: Double): Unit = {
    val CX = 0.8773826753; val CY = 1.139753528477 / n
    kernel2(P,
      c => {
        val phi = aasin(c, n * math.sin(c.y))
        c.x = CX * c.x * math.cos(phi)
        c.y = CY * phi
      },
      c => {
        val y = c.y / CY
        c.y = aasin(c, math.sin(y) / n)
        c.x = c.x / (CX * math.cos(y))
      })
  }
  def urmfps(P: PJ): Unit = {
    if (!P.params.has("n"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "urmfps: missing parameter n")
    val n = P.params.d("n")
    if (n <= 0 || n > 1)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "urmfps: n should be in ]0,1]")
    urmfpsSetup(P, n)
  }
  def wag1(P: PJ): Unit = urmfpsSetup(P, 0.8660254037844386467637231707)

  def wag2(P: PJ): Unit = {
    val CX = 0.92483; val CY = 1.38725; val CP1 = 0.88022; val CP2 = 0.88550
    kernel2(P,
      c => {
        val phi = aasin(c, CP1 * math.sin(CP2 * c.y))
        c.x = CX * c.x * math.cos(phi)
        c.y = CY * phi
      },
      c => {
        val phi = c.y / CY
        c.x = c.x / (CX * math.cos(phi))
        c.y = aasin(c, math.sin(phi) / CP1) / CP2
      })
  }

  def wag3(P: PJ): Unit = {
    val TWOTHIRD = 2.0 / 3
    val ts = P.params.r("lat_ts")
    val cx = math.cos(ts) / math.cos(2 * ts / 3)
    kernel2(P,
      c => { c.x = cx * c.x * math.cos(TWOTHIRD * c.y) },
      c => { c.x = c.x / (cx * math.cos(TWOTHIRD * c.y)) })
  }

  def wag7(P: PJ): Unit = {
    kernel2(P, c => {
      var y = 0.90630778703664996 * math.sin(c.y)
      val theta = math.asin(y)
      val ct = math.cos(theta)
      val lam = c.x / 3
      var x = 2.66723 * ct * math.sin(lam)
      val d = 1 / math.sqrt(0.5 * (1 + ct * math.cos(lam)))
      y *= 1.24104 * d
      x *= d
      c.x = x; c.y = y
    })
  }

  def wink1(P: PJ): Unit = {
    val cosphi1 = math.cos(P.params.r("lat_ts"))
    kernel2(P,
      c => { c.x = 0.5 * c.x * (cosphi1 + math.cos(c.y)) },
      c => { c.x = 2 * c.x / (cosphi1 + math.cos(c.y)) })
  }

  def wink2(P: PJ): Unit = {
    val cosphi1 = math.cos(P.params.r("lat_1"))
    val TWO_D_PI = 2.0 / math.Pi
    def fwdF(c: Coord): Unit = {
      var y0 = c.y * TWO_D_PI
      val k = math.Pi * math.sin(c.y)
      var phi = c.y * 1.8
      var i = 10
      var conv = false
      while (i > 0 && !conv) {
        val v = (phi + math.sin(phi) - k) / (1 + math.cos(phi))
        phi -= v
        if (math.abs(v) < 1e-7) conv = true
        i -= 1
      }
      phi = if (!conv) { if (phi < 0) -HALFPI else HALFPI } else phi * 0.5
      c.x = 0.5 * c.x * (math.cos(phi) + cosphi1)
      c.y = QUARTERPI * (math.sin(phi) + y0)
    }
    kernel2(P, fwdF,
      c => { OpsUtil.genericInverse2d(fwdF, c, c.x, c.y, 1e-10); () })
  }
}
