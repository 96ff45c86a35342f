package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** sch (JPL spherical cross-track height) and horner (Danish KMS
  * Engsager/Poder polynomial transformations).
  *
  * Math per reference src/projections/sch.cpp:59-228 (peg-point rotation
  * between the ellipsoidal geocentric frame and a local sphere of
  * curvature-radius) and src/transformations/horner.cpp (double-real and
  * complex Horner evaluation :185-250, iterative inverses :321-475, setup
  * :552-657).
  */
object SchHornerOps {

  // -------------------------------------------------- sch

  def sch(P: PJ): Unit = {
    if (!P.params.has("plat_0"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "sch: missing plat_0")
    if (!P.params.has("plon_0"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "sch: missing plon_0")
    if (!P.params.has("phdg_0"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "sch: missing phdg_0")
    val plat = P.params.r("plat_0")
    val plon = P.params.r("plon_0")
    val phdg = P.params.r("phdg_0")
    val h0 = if (P.params.has("h_0")) P.params.d("h_0") else 0.0

    val a = P.a; val es = P.es
    val clt = math.cos(plat); val slt = math.sin(plat)
    val clo = math.cos(plon); val slo = math.sin(plon)
    val temp = math.sqrt(1.0 - es * slt * slt)
    val reast = a / temp
    val rnorth = a * (1.0 - es) / (temp * temp * temp)
    val chdg = math.cos(phdg); val shdg = math.sin(phdg)
    val rcurv = h0 + (reast * rnorth) / (reast * chdg * chdg + rnorth * shdg * shdg)

    def mkCart(aa: Double, ee: Double): PJ = {
      val sub = Proj.create(new ParamList(Vector(
        "proj" -> "cart", "a" -> aa.toString, "es" -> ee.toString)))
      sub.skipFwdPrepare = true; sub.skipFwdFinalize = true
      sub.skipInvPrepare = true; sub.skipInvFinalize = true
      sub
    }
    val cartEll = mkCart(a, es)      // geodetic <-> geocentric on the ellipsoid
    val cartSph = mkCart(rcurv, 0.0) // local sphere at the peg point

    // rotation between geocentric and peg-local frames
    val m = Array(
      clt * clo, -shdg * slo - slt * clo * chdg, slo * chdg - slt * clo * shdg,
      clt * slo, clo * shdg - slt * slo * chdg, -clo * chdg - slt * slo * shdg,
      slt, clt * chdg, clt * shdg)

    // offset of the local-sphere center from the geocenter
    val peg = new Coord
    peg.set(plon, plat, h0, 0)
    cartEll.kernel.fwd3(peg)
    val offX = peg.x - rcurv * clt * clo
    val offY = peg.y - rcurv * clt * slo
    val offZ = peg.z - rcurv * slt

    P.left = IOUnits.RADIANS; P.right = IOUnits.CLASSIC
    P.kernel = new OpKernel {
      val caps = FWD3 | INV3
      override def fwd3(c: Coord): Unit = {
        cartEll.kernel.fwd3(c)
        val x = c.x - offX; val y = c.y - offY; val z = c.z - offZ
        // transpose rotation: geocentric -> local
        c.x = m(0) * x + m(3) * y + m(6) * z
        c.y = m(1) * x + m(4) * y + m(7) * z
        c.z = m(2) * x + m(5) * y + m(8) * z
        cartSph.kernel.inv3(c)
        c.x = c.x * (rcurv / a)
        c.y = c.y * (rcurv / a)
      }
      override def inv3(c: Coord): Unit = {
        c.x = c.x * (a / rcurv)
        c.y = c.y * (a / rcurv)
        cartSph.kernel.fwd3(c)
        val x = c.x; val y = c.y; val z = c.z
        c.x = m(0) * x + m(1) * y + m(2) * z + offX
        c.y = m(3) * x + m(4) * y + m(5) * z + offY
        c.z = m(6) * x + m(7) * y + m(8) * z + offZ
        cartEll.kernel.inv3(c)
      }
    }
  }

  // -------------------------------------------------- horner

  private def nReal(order: Int): Int = (order + 1) * (order + 2) / 2
  private def nComplex(order: Int): Int = 2 * order + 2

  /** parse "c0,c1,..." requiring exactly n values; None if param absent or
    * malformed (caller reports missing-arg, like the reference). */
  private def parseCoefs(P: PJ, key: String, n: Int): Option[Array[Double]] =
    P.params.s(key).flatMap { s =>
      val parts = s.split(",", -1)
      if (parts.length < n) None
      else {
        val out = new Array[Double](n)
        var ok = true
        var i = 0
        while (i < n && ok) {
          val v = NumParse.atof(parts(i).trim)
          if (v.isNaN && parts(i).trim.toLowerCase != "nan") ok = false else out(i) = v
          i += 1
        }
        if (ok) Some(out) else None
      }
    }

  /** Engsager/Poder double-real 2D Horner (backwards summation). */
  private def realHorner(order: Int, cx: Array[Double], cy: Array[Double],
                         e: Double, n: Double, offset: Int): (Double, Double) = {
    var ix = nReal(order); var iy = ix
    iy -= 1; var bigN = cy(iy)
    ix -= 1; var bigE = cx(ix)
    var r = order
    while (r > offset) {
      iy -= 1; var u = cy(iy)
      ix -= 1; var v = cx(ix)
      var cc = order
      while (cc >= r) {
        iy -= 1; u = n * u + cy(iy)
        ix -= 1; v = e * v + cx(ix)
        cc -= 1
      }
      bigN = e * bigN + u
      bigE = n * bigE + v
      r -= 1
    }
    (bigE, bigN)
  }

  private def singleHorner(order: Int, cx: Array[Double], x: Double, offset: Int): Double = {
    var i = order + 1
    i -= 1; var u = cx(i)
    var r = order
    while (r > offset) { i -= 1; u = x * u + cx(i); r -= 1 }
    u
  }

  /** complex Horner: coefficients (Cn0+iCe0, Cn1+iCe1, ...). */
  private def complexHorner(order: Int, c: Array[Double], e: Double, n: Double,
                            offset: Int): (Double, Double) = {
    val beg = offset * 2
    var i = nComplex(order)
    i -= 1; var bigE = c(i)
    i -= 1; var bigN = c(i)
    while (i > beg) {
      i -= 1; val w = n * bigE + e * bigN + c(i)
      i -= 1; bigN = n * bigN - e * bigE + c(i)
      bigE = w
    }
    (bigE, bigN)
  }

  def horner(P: PJ): Unit = {
    if (!P.params.has("deg"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "horner: must specify +deg=n")
    val degree = P.params.i("deg")
    if (degree < 0 || degree > 10000)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"horner: unreasonable degree $degree")
    val isComplex = P.params.has("fwd_c") || P.params.has("inv_c")
    val hasInv =
      if (isComplex) P.params.has("inv_c") || P.params.has("inv_origin")
      else P.params.has("inv_u") || P.params.has("inv_v") || P.params.has("inv_origin")

    def need(key: String, n: Int): Array[Double] =
      parseCoefs(P, key, n).getOrElse(
        throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, s"horner: missing $key"))

    val (fwdC, invC, fwdU, fwdV, invU, invV) =
      if (isComplex) {
        val n = nComplex(degree)
        (need("fwd_c", n), if (hasInv) need("inv_c", n) else null, null, null, null, null)
      } else {
        val n = nReal(degree)
        (null, null, need("fwd_u", n), need("fwd_v", n),
          if (hasInv) need("inv_u", n) else null,
          if (hasInv) need("inv_v", n) else null)
      }
    val uneg = if (P.params.has("uneg")) 1 else 0
    val vneg = if (P.params.has("vneg")) 1 else 0
    val fwdOrigin = need("fwd_origin", 2)
    val invOrigin = if (hasInv) need("inv_origin", 2) else Array(0.0, 0.0)
    val range = parseCoefs(P, "range", 1).map(_(0)).getOrElse(500000.0)
    val tol = parseCoefs(P, "inv_tolerance", 1).map(_(0)).getOrElse(0.001)

    P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER

    def outOfRange(c: Coord, e: Double, n: Double): Boolean =
      if (math.abs(n) > range || math.abs(e) > range) {
        c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); true
      } else false

    P.kernel = new OpKernel {
      val caps = FWD4 | INV4

      override def fwd4(c: Coord): Unit = {
        val e0 = c.x - fwdOrigin(0); val n0 = c.y - fwdOrigin(1)
        if (isComplex) {
          val e = if (uneg != 0) -e0 else e0
          val n = if (vneg != 0) -n0 else n0
          if (outOfRange(c, e, n)) return
          val (oe, on) = complexHorner(degree, fwdC, e, n, 0)
          c.x = oe; c.y = on
        } else {
          if (outOfRange(c, e0, n0)) return
          val (oe, on) = realHorner(degree, fwdU, fwdV, e0, n0, 0)
          c.x = oe; c.y = on
        }
      }

      override def inv4(c: Coord): Unit = {
        if (hasInv) {
          val e0 = c.x - invOrigin(0); val n0 = c.y - invOrigin(1)
          if (isComplex) {
            val e = if (uneg != 0) -e0 else e0
            val n = if (vneg != 0) -n0 else n0
            if (outOfRange(c, e, n)) return
            val (oe, on) = complexHorner(degree, invC, e, n, 0)
            c.x = oe; c.y = on
          } else {
            if (outOfRange(c, e0, n0)) return
            val (oe, on) = realHorner(degree, invU, invV, e0, n0, 0)
            c.x = oe; c.y = on
          }
        } else if (isComplex) {
          // Newton on the complex forward (reference :441-490)
          val e = c.x; val n = c.y
          if (outOfRange(c, e, n)) return
          val dzRe = n - fwdC(0); val dzIm = e - fwdC(1)
          var w0Re = 0.0; var w0Im = 0.0
          var loops = 32; var converged = false
          while (loops > 0 && !converged) {
            val (detIm, detRe) = complexHorner(degree, fwdC, w0Im, w0Re, 1)
            val d2 = detRe * detRe + detIm * detIm
            val w1Re = (dzRe * detRe + dzIm * detIm) / d2
            val w1Im = (dzIm * detRe - dzRe * detIm) / d2
            converged = math.abs(w1Re - w0Re) < tol && math.abs(w1Im - w0Im) < tol
            w0Re = w1Re; w0Im = w1Im
            loops -= 1
          }
          if (!converged) { c.setError(ProjErr.COORD_TRANSFM); return }
          var oe = w0Im; var on = w0Re
          if (uneg != 0) oe = -oe
          if (vneg != 0) on = -on
          c.x = oe + fwdOrigin(0); c.y = on + fwdOrigin(1)
        } else {
          // iterative 2x2-Jacobian inverse (reference :321-388)
          val e = c.x; val n = c.y
          if (outOfRange(c, e, n)) return
          val de = e - fwdU(0); val dn = n - fwdV(0)
          var x0 = 0.0; var y0 = 0.0
          var loops = 32; var converged = false
          while (loops > 0 && !converged) {
            val (mb, mc) = realHorner(degree, fwdU, fwdV, x0, y0, 1)
            val ma = singleHorner(degree, fwdU, x0, 1)
            val md = singleHorner(degree, fwdV, y0, 1)
            val idet = 1.0 / (ma * md - mb * mc)
            val x = idet * (md * de - mb * dn)
            val y = idet * (ma * dn - mc * de)
            converged = math.abs(x - x0) < tol && math.abs(y - y0) < tol
            x0 = x; y0 = y
            loops -= 1
          }
          if (!converged) { c.setError(ProjErr.COORD_TRANSFM); return }
          c.x = x0 + fwdOrigin(0); c.y = y0 + fwdOrigin(1)
        }
      }
    }
  }
}
