package graft.core

/** Karney geodesics on an ellipsoid of revolution — solutions of the direct
  * and inverse problems, 6th-order series.
  *
  * Algorithms from C.F.F. Karney, "Algorithms for geodesics", J. Geodesy
  * 87, 43-55 (2013), and the public GeographicLib formulation (the same
  * algorithm the reference embeds at src/geodesic.c:302-1085; series order
  * src/geodesic.c:38). Outputs: distance, azimuths, reduced length,
  * geodesic scale, and the area term S12 (Danielsen integral + spherical
  * excess) consumed by PolygonArea.
  *
  * Instances are immutable after construction and safe to share across
  * executor threads.
  */
final class Geodesic(val a: Double, val f: Double) extends Serializable {
  import Geodesic._

  val f1: Double = 1 - f
  val e2: Double = f * (2 - f)
  val ep2: Double = e2 / (f1 * f1)
  val n: Double = f / (2 - f)
  val b: Double = a * f1
  /** authalic radius squared — the area unit (reference geodesic.c geod_init). */
  val c2: Double = (a * a + b * b *
    (if (e2 == 0) 1.0
     else (if (e2 > 0) atanh(math.sqrt(e2)) else math.atan(math.sqrt(-e2))) /
       math.sqrt(math.abs(e2)))) / 2
  /** total area of the ellipsoid. */
  val area0: Double = 4 * math.Pi * c2
  private val etol2: Double =
    0.1 * tol2 / math.sqrt(math.max(0.001, math.abs(f)) * math.min(1.0, 1 - f / 2) / 2)

  // A3 and C3 coefficient arrays, polynomial in n evaluated once
  private val a3x = new Array[Double](6)
  private val c3x = new Array[Double](15)
  locally {
    // A3 coefficients (Karney 2013 eq. 24)
    val coA = Array[Double](-3, 128, -2, -3, 64, -1, -3, -1, 16, 3, -1, -2, 8, 1, -1, 2, 1, 1)
    var o = 0; var k = 0
    var j = 5
    while (j >= 0) {
      val m = math.min(5 - j, j)
      a3x(k) = polyval(m, coA, o, n) / coA(o + m + 1)
      k += 1; o += m + 2
      j -= 1
    }
    // C3 coefficients (Karney 2013 eq. 25)
    val coC = Array[Double](
      3, 128, 2, 5, 128, -1, 3, 3, 64, -1, 0, 1, 8, -1, 1, 4,
      5, 256, 1, 3, 128, -3, -2, 3, 64, 1, -3, 2, 32,
      7, 512, -10, 9, 384, 5, -9, 5, 192,
      7, 512, -14, 7, 512,
      21, 2560)
    o = 0; k = 0
    var l = 1
    while (l < 6) {
      var j2 = 5
      while (j2 >= l) {
        val m = math.min(5 - j2, j2)
        c3x(k) = polyval(m, coC, o, n) / coC(o + m + 1)
        k += 1; o += m + 2
        j2 -= 1
      }
      l += 1
    }
  }

  // C4 coefficients for the area integral I4 (Karney 2013 eq. 65, order 6) —
  // polynomial in n, evaluated once per ellipsoid
  private val c4x = new Array[Double](21)
  locally {
    val coC4 = Array[Double](
      97, 15015, 1088, 156, 45045, -224, -4784, 1573, 45045,
      -10656, 14144, -4576, -858, 45045, 64, 624, -4576, 6864, -3003, 15015,
      100, 208, 572, 3432, -12012, 30030, 45045,
      1, 9009, -2944, 468, 135135, 5792, 1040, -1287, 135135,
      5952, -11648, 9152, -2574, 135135, -64, -624, 4576, -6864, 3003, 135135,
      8, 10725, 1856, -936, 225225, -8448, 4992, -1144, 225225,
      -1440, 4160, -4576, 1716, 225225,
      -136, 63063, 1024, -208, 105105, 3584, -3328, 1144, 315315,
      -128, 135135, -2560, 832, 405405,
      128, 99099)
    var o = 0; var k = 0
    var l = 0
    while (l < 6) {
      var j = 5
      while (j >= l) {
        val m = 6 - j - 1
        c4x(k) = polyval(m, coC4, o, n) / coC4(o + m + 1)
        k += 1; o += m + 2
        j -= 1
      }
      l += 1
    }
  }

  /** C4 Fourier coefficients at the given eps (reference C4f). */
  private def c4f(eps: Double, c: Array[Double]): Unit = {
    var mult = 1.0
    var o = 0
    var l = 0
    while (l < 6) {
      val m = 6 - l - 1
      c(l) = mult * polyval(m, c4x, o, eps)
      o += m + 1
      mult *= eps
      l += 1
    }
  }

  private[core] def a3fPub(eps: Double): Double = polyval(5, a3x, 0, eps)
  @inline private def a3f(eps: Double): Double = a3fPub(eps)

  private[core] def c3fPub(eps: Double, c: Array[Double]): Unit = c3f(eps, c)
  private def c3f(eps: Double, c: Array[Double]): Unit = {
    var mult = 1.0
    var o = 0
    var l = 1
    while (l < 6) {
      val m = 6 - l - 1
      mult *= eps
      c(l) = mult * polyval(m, c3x, o, eps)
      o += m + 1
      l += 1
    }
  }

  /** Lengths: s12b and m12b/m0 (and geodesic scales M12/M21 when cbet's are
    * supplied) for the given spherical arc (reference geodesic.c:1115-1175).
    * out = (s12b, m12b, m0, M12, M21). */
  private def lengths(eps: Double, sig12: Double,
                      ssig1: Double, csig1: Double, dn1: Double,
                      ssig2: Double, csig2: Double, dn2: Double,
                      wantS12b: Boolean, wantM12b: Boolean,
                      out: Array[Double],
                      wantM: Boolean = false,
                      cbet1: Double = 0, cbet2: Double = 0): Unit = {
    val ca = new Array[Double](7)
    val cb = new Array[Double](7)
    var m0 = 0.0; var j12 = 0.0
    var a1 = 0.0; var a2 = 0.0
    val redlp = wantM12b || wantM
    if (wantS12b || redlp) {
      a1 = a1m1f(eps); c1f(eps, ca)
      if (redlp) {
        a2 = a2m1f(eps); c2f(eps, cb)
        m0 = a1 - a2
        a2 = 1 + a2
      }
      a1 = 1 + a1
    }
    if (wantS12b) {
      val b1 = sinCosSeries(sinp = true, ssig2, csig2, ca, 6) -
        sinCosSeries(sinp = true, ssig1, csig1, ca, 6)
      out(0) = a1 * (sig12 + b1)
      if (redlp) {
        val b2 = sinCosSeries(sinp = true, ssig2, csig2, cb, 6) -
          sinCosSeries(sinp = true, ssig1, csig1, cb, 6)
        j12 = m0 * sig12 + (a1 * b1 - a2 * b2)
      }
    } else if (redlp) {
      var l = 1
      while (l <= 6) { cb(l) = a1 * ca(l) - a2 * cb(l); l += 1 }
      j12 = m0 * sig12 + (sinCosSeries(sinp = true, ssig2, csig2, cb, 6) -
        sinCosSeries(sinp = true, ssig1, csig1, cb, 6))
    }
    out(2) = m0
    if (redlp)
      out(1) = dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2) - csig1 * csig2 * j12
    if (wantM) {
      val csig12 = csig1 * csig2 + ssig1 * ssig2
      val t = ep2 * (cbet1 - cbet2) * (cbet1 + cbet2) / (dn1 + dn2)
      out(3) = csig12 + (t * ssig2 - csig2 * j12) * ssig1 / dn1
      out(4) = csig12 - (t * ssig1 - csig1 * j12) * ssig2 / dn2
    }
  }

  /** Inverse problem: returns (s12, azi1, azi2) with azimuths in degrees. */
  def inverse(lat1In: Double, lon1: Double, lat2In: Double, lon2: Double): (Double, Double, Double) = {
    val r = inverseAll(lat1In, lon1, lat2In, lon2)
    (r(0), r(1), r(2))
  }

  /** Inverse problem with extras: [s12, azi1, azi2, m12, M12, M21]
    * (reference geodesic.c:700-1053). */
  def inverseAll(lat1In: Double, lon1: Double, lat2In: Double, lon2: Double): Array[Double] = {
    var lon12 = 0.0; var lon12s = 0.0
    val d = angDiff(lon1, lon2)
    lon12 = d._1; lon12s = d._2
    var lonsign = if (java.lang.Math.copySign(1.0, lon12) < 0) -1.0 else 1.0
    lon12 *= lonsign; lon12s *= lonsign
    val lam12 = lon12 * DEG
    val sc = sincosde(lon12, lon12s)
    var slam12 = sc._1; val clam12 = sc._2
    lon12s = (180 - lon12) - lon12s

    var lat1 = angRound(latFix(lat1In))
    var lat2 = angRound(latFix(lat2In))
    val swapp = if (math.abs(lat1) < math.abs(lat2) || lat2 != lat2) -1 else 1
    if (swapp < 0) {
      lonsign *= -1
      val t = lat1; lat1 = lat2; lat2 = t
    }
    val latsign = if (java.lang.Math.copySign(1.0, lat1) < 0) 1.0 else -1.0
    lat1 *= latsign; lat2 *= latsign

    var sbet1 = 0.0; var cbet1 = 0.0
    var sbet2 = 0.0; var cbet2 = 0.0
    locally {
      val s1 = sincosdx(lat1); sbet1 = s1._1 * f1; cbet1 = s1._2
      val r1 = math.hypot(sbet1, cbet1); sbet1 /= r1; cbet1 = math.max(TINY, cbet1 / r1)
      val s2 = sincosdx(lat2); sbet2 = s2._1 * f1; cbet2 = s2._2
      val r2 = math.hypot(sbet2, cbet2); sbet2 /= r2; cbet2 = math.max(TINY, cbet2 / r2)
    }
    if (cbet1 < -sbet1) { if (cbet2 == cbet1) sbet2 = java.lang.Math.copySign(sbet1, sbet2) }
    else { if (math.abs(sbet2) == -sbet1) cbet2 = cbet1 }

    val dn1 = math.sqrt(1 + ep2 * sbet1 * sbet1)
    val dn2 = math.sqrt(1 + ep2 * sbet2 * sbet2)

    var s12x = 0.0; var m12x = 0.0
    var bigM12 = 0.0; var bigM21 = 0.0
    var sig12 = 0.0
    var salp1 = 0.0; var calp1 = 0.0; var salp2 = 0.0; var calp2 = 0.0
    // longitude difference on the auxiliary sphere (for the area term);
    // somg12 = 2 is the "compute from omg12 later" sentinel
    var omg12 = 0.0; var somg12 = 2.0; var comg12 = 0.0
    val lenOut = new Array[Double](5)
    var meridian = lat1 == -90 || slam12 == 0

    if (meridian) {
      calp1 = clam12; salp1 = slam12
      calp2 = 1; salp2 = 0
      val ssig1 = sbet1; val csig1 = calp1 * cbet1
      val ssig2 = sbet2; val csig2 = calp2 * cbet2
      sig12 = math.atan2(math.max(0.0, csig1 * ssig2 - ssig1 * csig2),
        csig1 * csig2 + ssig1 * ssig2)
      lengths(n, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
        wantS12b = true, wantM12b = true, lenOut, wantM = true, cbet1, cbet2)
      s12x = lenOut(0); m12x = lenOut(1)
      bigM12 = lenOut(3); bigM21 = lenOut(4)
      if (sig12 < tol2 || m12x >= 0) {
        if (sig12 < 3 * TINY || (sig12 < tol0 && (s12x < 0 || m12x < 0))) {
          sig12 = 0; m12x = 0; s12x = 0
        }
        m12x *= b; s12x *= b
      } else meridian = false
    }

    if (!meridian && sbet1 == 0 && (f <= 0 || lon12s >= f * 180)) {
      // equatorial geodesic
      calp1 = 0; calp2 = 0; salp1 = 1; salp2 = 1
      s12x = a * lam12
      sig12 = lam12 / f1
      omg12 = sig12
      m12x = b * math.sin(sig12)
      bigM12 = math.cos(sig12); bigM21 = bigM12
    } else if (!meridian) {
      // general case: Newton's method on alp1
      var dnm = 0.0
      val st = inverseStart(sbet1, cbet1, dn1, sbet2, cbet2, dn2,
        lam12, slam12, clam12, lenOut)
      sig12 = st._1; salp1 = st._2; calp1 = st._3
      salp2 = st._4; calp2 = st._5; dnm = st._6
      if (sig12 >= 0) {
        s12x = sig12 * b * dnm
        m12x = dnm * dnm * b * math.sin(sig12 / dnm)
        bigM12 = math.cos(sig12 / dnm); bigM21 = bigM12
        omg12 = lam12 / (f1 * dnm)
      } else {
        var ssig1 = 0.0; var csig1 = 0.0; var ssig2 = 0.0; var csig2 = 0.0
        var eps = 0.0
        var numit = 0
        var salp1a = TINY; var calp1a = 1.0
        var salp1b = TINY; var calp1b = -1.0
        var tripn = false; var tripb = false
        var done = false
        val lmOut = new Array[Double](10)
        while (!done) {
          val v = lambda12(sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1,
            slam12, clam12, numit < MAXIT1, lmOut)
          salp2 = lmOut(0); calp2 = lmOut(1); sig12 = lmOut(2)
          ssig1 = lmOut(3); csig1 = lmOut(4); ssig2 = lmOut(5); csig2 = lmOut(6)
          eps = lmOut(7)
          val dv = lmOut(9)
          if (tripb || !(math.abs(v) >= (if (tripn) 8 else 1) * tol0) || numit == MAXIT2) {
            done = true
          } else {
            if (v > 0 && (numit > MAXIT1 || calp1 / salp1 > calp1b / salp1b)) {
              salp1b = salp1; calp1b = calp1
            } else if (v < 0 && (numit > MAXIT1 || calp1 / salp1 < calp1a / salp1a)) {
              salp1a = salp1; calp1a = calp1
            }
            var stepped = false
            if (numit < MAXIT1 && dv > 0) {
              val dalp1 = -v / dv
              if (math.abs(dalp1) < math.Pi) {
                val sdalp1 = math.sin(dalp1); val cdalp1 = math.cos(dalp1)
                val nsalp1 = salp1 * cdalp1 + calp1 * sdalp1
                if (nsalp1 > 0) {
                  calp1 = calp1 * cdalp1 - salp1 * sdalp1
                  salp1 = nsalp1
                  val r = math.hypot(salp1, calp1); salp1 /= r; calp1 /= r
                  tripn = math.abs(v) <= 16 * tol0
                  stepped = true
                }
              }
            }
            if (!stepped) {
              salp1 = (salp1a + salp1b) / 2
              calp1 = (calp1a + calp1b) / 2
              val r = math.hypot(salp1, calp1); salp1 /= r; calp1 /= r
              tripn = false
              tripb = math.abs(salp1a - salp1) + (calp1a - calp1) < tolb ||
                math.abs(salp1 - salp1b) + (calp1 - calp1b) < tolb
            }
            numit += 1
          }
        }
        lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
          wantS12b = true, wantM12b = true, lenOut, wantM = true, cbet1, cbet2)
        s12x = lenOut(0)
        m12x = lenOut(1) * b
        bigM12 = lenOut(3); bigM21 = lenOut(4)
        s12x *= b
        // omg12 = lam12 - domg12 (for the area spherical-excess term)
        val domg12 = lmOut(8)
        val sd = math.sin(domg12); val cd = math.cos(domg12)
        somg12 = slam12 * cd - clam12 * sd
        comg12 = clam12 * cd + slam12 * sd
      }
    }

    // area S12: Danielsen integral between the points + spherical excess
    // (reference geodesic.c geninverse GEOD_AREA block :961-1022)
    var s12area = 0.0
    locally {
      val salp0 = salp1 * cbet1
      val calp0 = math.hypot(calp1, salp1 * sbet1)
      if (calp0 != 0 && salp0 != 0) {
        var ssig1 = sbet1; var csig1 = calp1 * cbet1
        var ssig2 = sbet2; var csig2 = calp2 * cbet2
        val k2 = calp0 * calp0 * ep2
        val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
        val a4 = a * a * calp0 * salp0 * e2
        locally { val r = math.hypot(ssig1, csig1); ssig1 /= r; csig1 /= r }
        locally { val r = math.hypot(ssig2, csig2); ssig2 /= r; csig2 /= r }
        val c4a = new Array[Double](6)
        c4f(eps, c4a)
        val b41 = sinCosSeries(sinp = false, ssig1, csig1, c4a, 6)
        val b42 = sinCosSeries(sinp = false, ssig2, csig2, c4a, 6)
        s12area = a4 * (b42 - b41)
      }
      if (!meridian && somg12 == 2) { somg12 = math.sin(omg12); comg12 = math.cos(omg12) }
      val alp12 =
        if (!meridian && comg12 > -0.7071 && sbet2 - sbet1 < 1.75) {
          // tan(Gamma/2) form: accurate for small spherical excess
          val domg = 1 + comg12; val dbet1 = 1 + cbet1; val dbet2 = 1 + cbet2
          2 * math.atan2(somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
            domg * (sbet1 * sbet2 + dbet1 * dbet2))
        } else {
          var salp12 = salp2 * calp1 - calp2 * salp1
          var calp12 = calp2 * calp1 + salp2 * salp1
          if (salp12 == 0 && calp12 < 0) { salp12 = TINY * calp1; calp12 = -1 }
          math.atan2(salp12, calp12)
        }
      s12area += c2 * alp12
      s12area *= swapp * lonsign * latsign
      s12area += 0
    }

    if (swapp < 0) {
      var t = salp1; salp1 = salp2; salp2 = t
      t = calp1; calp1 = calp2; calp2 = t
      t = bigM12; bigM12 = bigM21; bigM21 = t
    }
    salp1 *= swapp * lonsign; calp1 *= swapp * latsign
    salp2 *= swapp * lonsign; calp2 *= swapp * latsign

    val s12 = 0 + s12x
    val azi1 = atan2dx(salp1, calp1)
    val azi2 = atan2dx(salp2, calp2)
    Array(s12, azi1, azi2, 0 + m12x, bigM12, bigM21, s12area)
  }

  /** Just the distance in metres. */
  def distance(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    inverse(lat1, lon1, lat2, lon2)._1

  /** InverseStart (reference geodesic.c:1232-1342): returns
    * (sig12, salp1, calp1, salp2, calp2, dnm); sig12 >= 0 only for short
    * lines where salp2/calp2/dnm are set. */
  private def inverseStart(sbet1: Double, cbet1: Double, dn1: Double,
                           sbet2: Double, cbet2: Double, dn2: Double,
                           lam12: Double, slam12: Double, clam12: Double,
                           scratch: Array[Double]): (Double, Double, Double, Double, Double, Double) = {
    var sig12 = -1.0
    var salp1 = 0.0; var calp1 = 0.0; var salp2 = 0.0; var calp2 = 0.0; var dnm = 0.0
    val sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    val cbet12 = cbet2 * cbet1 + sbet2 * sbet1
    val sbet12a = sbet2 * cbet1 + cbet2 * sbet1
    val shortline = cbet12 >= 0 && sbet12 < 0.5 && cbet2 * lam12 < 0.5
    var somg12 = 0.0; var comg12 = 0.0
    if (shortline) {
      var sbetm2 = (sbet1 + sbet2) * (sbet1 + sbet2)
      sbetm2 /= sbetm2 + (cbet1 + cbet2) * (cbet1 + cbet2)
      dnm = math.sqrt(1 + ep2 * sbetm2)
      val omg12 = lam12 / (f1 * dnm)
      somg12 = math.sin(omg12); comg12 = math.cos(omg12)
    } else { somg12 = slam12; comg12 = clam12 }

    salp1 = cbet2 * somg12
    calp1 = if (comg12 >= 0) sbet12 + cbet2 * sbet1 * somg12 * somg12 / (1 + comg12)
            else sbet12a - cbet2 * sbet1 * somg12 * somg12 / (1 - comg12)
    val ssig12 = math.hypot(salp1, calp1)
    val csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

    if (shortline && ssig12 < etol2) {
      salp2 = cbet1 * somg12
      calp2 = sbet12 - cbet1 * sbet2 *
        (if (comg12 >= 0) somg12 * somg12 / (1 + comg12) else 1 - comg12)
      val r = math.hypot(salp2, calp2); salp2 /= r; calp2 /= r
      sig12 = math.atan2(ssig12, csig12)
    } else if (math.abs(n) > 0.1 || csig12 >= 0 ||
               ssig12 >= 6 * math.abs(n) * math.Pi * cbet1 * cbet1) {
      // spherical estimate is OK
    } else {
      // near-antipodal: astroid scaling
      val lam12x = math.atan2(-slam12, -clam12)
      var x = 0.0; var y = 0.0; var lamscale = 0.0; var betscale = 0.0
      if (f >= 0) {
        val k2 = sbet1 * sbet1 * ep2
        val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
        lamscale = f * cbet1 * a3f(eps) * math.Pi
        betscale = lamscale * cbet1
        x = lam12x / lamscale
        y = sbet12a / betscale
      } else {
        val cbet12a = cbet2 * cbet1 - sbet2 * sbet1
        val bet12a = math.atan2(sbet12a, cbet12a)
        lengths(n, math.Pi + bet12a, sbet1, -cbet1, dn1, sbet2, cbet2, dn2,
          wantS12b = false, wantM12b = true, scratch)
        val m12b = scratch(1); val m0 = scratch(2)
        x = -1 + m12b / (cbet1 * cbet2 * m0 * math.Pi)
        betscale = if (x < -0.01) sbet12a / x else -f * cbet1 * cbet1 * math.Pi
        lamscale = betscale / cbet1
        y = lam12x / lamscale
      }
      if (y > -tol1 && x > -1 - xthresh) {
        if (f >= 0) {
          salp1 = math.min(1.0, -x)
          calp1 = -math.sqrt(1 - salp1 * salp1)
        } else {
          calp1 = math.max(if (x > -tol1) 0.0 else -1.0, x)
          salp1 = math.sqrt(1 - calp1 * calp1)
        }
      } else {
        val k = astroid(x, y)
        val omg12a = lamscale * (if (f >= 0) -x * k / (1 + k) else -y * (1 + k) / k)
        somg12 = math.sin(omg12a); comg12 = -math.cos(omg12a)
        salp1 = cbet2 * somg12
        calp1 = sbet12a - cbet2 * sbet1 * somg12 * somg12 / (1 - comg12)
      }
    }
    if (!(salp1 <= 0)) {
      val r = math.hypot(salp1, calp1); salp1 /= r; calp1 /= r
    } else { salp1 = 1; calp1 = 0 }
    (sig12, salp1, calp1, salp2, calp2, dnm)
  }

  /** Lambda12 (reference geodesic.c:1395-1490). out:
    * 0=salp2 1=calp2 2=sig12 3=ssig1 4=csig1 5=ssig2 6=csig2 7=eps 8=domg12
    * 9=dlam12; returns v = lam12 - target. */
  private def lambda12(sbet1: Double, cbet1: Double, dn1: Double,
                       sbet2: Double, cbet2: Double, dn2: Double,
                       salp1In: Double, calp1In: Double,
                       slam120: Double, clam120: Double,
                       diffp: Boolean, out: Array[Double]): Double = {
    var salp1 = salp1In; var calp1 = calp1In
    if (sbet1 == 0 && calp1 == 0) calp1 = -TINY
    val salp0 = salp1 * cbet1
    val calp0 = math.hypot(calp1, salp1 * sbet1)
    var ssig1 = sbet1; val somg1 = salp0 * sbet1
    var csig1 = calp1 * cbet1; val comg1 = csig1
    locally { val r = math.hypot(ssig1, csig1); ssig1 /= r; csig1 /= r }
    val salp2 = if (cbet2 != cbet1) salp0 / cbet2 else salp1
    val calp2 =
      if (cbet2 != cbet1 || math.abs(sbet2) != -sbet1)
        math.sqrt((calp1 * cbet1) * (calp1 * cbet1) +
          (if (cbet1 < -sbet1) (cbet2 - cbet1) * (cbet1 + cbet2)
           else (sbet1 - sbet2) * (sbet1 + sbet2))) / cbet2
      else math.abs(calp1)
    var ssig2 = sbet2; val somg2 = salp0 * sbet2
    var csig2 = calp2 * cbet2; val comg2 = csig2
    locally { val r = math.hypot(ssig2, csig2); ssig2 /= r; csig2 /= r }
    val sig12 = math.atan2(math.max(0.0, csig1 * ssig2 - ssig1 * csig2),
      csig1 * csig2 + ssig1 * ssig2)
    val somg12 = math.max(0.0, comg1 * somg2 - somg1 * comg2)
    val comg12 = comg1 * comg2 + somg1 * somg2
    val eta = math.atan2(somg12 * clam120 - comg12 * slam120,
      comg12 * clam120 + somg12 * slam120)
    val k2 = calp0 * calp0 * ep2
    val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)
    val ca = new Array[Double](7)
    c3f(eps, ca)
    val b312 = sinCosSeries(sinp = true, ssig2, csig2, ca, 5) -
      sinCosSeries(sinp = true, ssig1, csig1, ca, 5)
    val domg12 = -f * a3f(eps) * salp0 * (sig12 + b312)
    val lam12 = eta + domg12
    var dlam12 = 0.0
    if (diffp) {
      if (calp2 == 0) dlam12 = -2 * f1 * dn1 / sbet1
      else {
        val lenOut = new Array[Double](3)
        lengths(eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
          wantS12b = false, wantM12b = true, lenOut)
        dlam12 = lenOut(1) * f1 / (calp2 * cbet2)
      }
    }
    out(0) = salp2; out(1) = calp2; out(2) = sig12
    out(3) = ssig1; out(4) = csig1; out(5) = ssig2; out(6) = csig2
    out(7) = eps; out(8) = domg12; out(9) = dlam12
    lam12
  }

  /** Direct problem: from (lat1, lon1) with azimuth azi1 (degrees), travel
    * s12 metres; returns (lat2, lon2, azi2) in degrees. */
  def direct(lat1: Double, lon1: Double, azi1: Double, s12: Double): (Double, Double, Double) = {
    val out = new Array[Double](6)
    new Line(this, lat1, lon1, azi1).position(arcMode = false, s12, out)
    (out(0), out(1), out(2))
  }
}

/** A geodesic line from (lat1, lon1) with azimuth azi1, supporting repeated
  * position evaluation in distance or arc mode with reduced length and
  * geodesic scale outputs (reference geod_lineinit_int + geod_genposition,
  * src/geodesic.c:332-641). */
final class Line(g: Geodesic, lat1In: Double, val lon1: Double, azi1In: Double)
    extends Serializable {
  import Geodesic._

  val azi1: Double = angNormalize(azi1In)
  private val scA = sincosdx(angRound(azi1))
  private val salp1 = scA._1; private val calp1 = scA._2
  val lat1: Double = latFix(lat1In)

  private var sbet1 = 0.0; private var cbet1 = 0.0
  locally {
    val s1 = sincosdx(angRound(lat1)); sbet1 = s1._1 * g.f1; cbet1 = s1._2
    val r1 = math.hypot(sbet1, cbet1); sbet1 /= r1; cbet1 = math.max(TINY, cbet1 / r1)
  }
  private val dn1 = math.sqrt(1 + g.ep2 * sbet1 * sbet1)
  private val salp0 = salp1 * cbet1
  private val calp0 = math.hypot(calp1, salp1 * sbet1)
  private var ssig1 = sbet1
  private val somg1 = salp0 * sbet1
  private var csig1 = if (sbet1 != 0 || calp1 != 0) cbet1 * calp1 else 1.0
  private val comg1 = csig1
  locally { val r = math.hypot(ssig1, csig1); ssig1 /= r; csig1 /= r }
  private val k2 = calp0 * calp0 * g.ep2
  private val eps = k2 / (2 * (1 + math.sqrt(1 + k2)) + k2)

  private val c1a = new Array[Double](7)
  private val a1m1 = a1m1f(eps)
  c1f(eps, c1a)
  private val b11 = sinCosSeries(sinp = true, ssig1, csig1, c1a, 6)
  private val stau1 = { val s = math.sin(b11); val c = math.cos(b11); ssig1 * c + csig1 * s }
  private val ctau1 = { val s = math.sin(b11); val c = math.cos(b11); csig1 * c - ssig1 * s }
  private val c1pa = new Array[Double](7)
  c1pf(eps, c1pa)
  private val c3a = new Array[Double](7)
  g.c3fPub(eps, c3a)
  private val a3c = -g.f * salp0 * g.a3fPub(eps)
  private val b31 = sinCosSeries(sinp = true, ssig1, csig1, c3a, 5)
  private val a2m1 = a2m1f(eps)
  private val c2a = new Array[Double](7)
  c2f(eps, c2a)
  private val b21 = sinCosSeries(sinp = true, ssig1, csig1, c2a, 6)

  /** out = [lat2, lon2, azi2, s12, m12, M12]; returns a12 (arc, degrees). */
  def position(arcMode: Boolean, s12a12: Double, out: Array[Double]): Double = {
    var sig12 = 0.0; var ssig12 = 0.0; var csig12 = 0.0; var b12 = 0.0
    if (arcMode) {
      sig12 = s12a12 * DEGv
      val sc = sincosdx(s12a12); ssig12 = sc._1; csig12 = sc._2
    } else {
      val tau12 = s12a12 / (g.b * (1 + a1m1))
      val s = math.sin(tau12); val c = math.cos(tau12)
      b12 = -sinCosSeries(sinp = true,
        stau1 * c + ctau1 * s, ctau1 * c - stau1 * s, c1pa, 6)
      sig12 = tau12 - (b12 - b11)
      ssig12 = math.sin(sig12); csig12 = math.cos(sig12)
      if (math.abs(g.f) > 0.01) {
        val ssig2a = ssig1 * csig12 + csig1 * ssig12
        val csig2a = csig1 * csig12 - ssig1 * ssig12
        b12 = sinCosSeries(sinp = true, ssig2a, csig2a, c1a, 6)
        val serr = (1 + a1m1) * (sig12 + (b12 - b11)) - s12a12 / g.b
        sig12 = sig12 - serr / math.sqrt(1 + k2 * ssig2a * ssig2a)
        ssig12 = math.sin(sig12); csig12 = math.cos(sig12)
      }
    }
    val ssig2 = ssig1 * csig12 + csig1 * ssig12
    var csig2 = csig1 * csig12 - ssig1 * ssig12
    val dn2 = math.sqrt(1 + k2 * ssig2 * ssig2)
    if (arcMode || math.abs(g.f) > 0.01)
      b12 = sinCosSeries(sinp = true, ssig2, csig2, c1a, 6)
    val ab1 = (1 + a1m1) * (b12 - b11)
    val sbet2 = calp0 * ssig2
    var cbet2 = math.hypot(salp0, calp0 * csig2)
    if (cbet2 == 0) { cbet2 = TINY; csig2 = TINY }
    val salp2 = salp0; val calp2 = calp0 * csig2

    val s12 = if (arcMode) g.b * ((1 + a1m1) * sig12 + ab1) else s12a12

    // longitude (unrolled)
    val e = java.lang.Math.copySign(1.0, salp0)
    val somg2 = salp0 * ssig2; val comg2 = csig2
    val omg12 = e * (sig12 -
      (math.atan2(ssig2, csig2) - math.atan2(ssig1, csig1)) +
      (math.atan2(e * somg2, comg2) - math.atan2(e * somg1, comg1)))
    val lam12 = omg12 + a3c *
      (sig12 + (sinCosSeries(sinp = true, ssig2, csig2, c3a, 5) - b31))
    val lon12 = lam12 / DEGv
    out(1) = angNormalize(angNormalize(lon1) + angNormalize(lon12))
    out(0) = atan2dx(sbet2, g.f1 * cbet2)
    out(2) = atan2dx(salp2, calp2)
    out(3) = s12

    // reduced length m12 and geodesic scale M12
    val b22 = sinCosSeries(sinp = true, ssig2, csig2, c2a, 6)
    val ab2 = (1 + a2m1) * (b22 - b21)
    val j12 = (a1m1 - a2m1) * sig12 + (ab1 - ab2)
    out(4) = g.b * ((dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)) -
      csig1 * csig2 * j12)
    out(5) = csig12 + (k2 * (ssig2 - ssig1) * (ssig2 + ssig1) / (dn1 + dn2) *
      ssig2 - csig2 * j12) * ssig1 / dn1
    if (arcMode) s12a12 else sig12 / DEGv
  }
}

object Geodesic {
  private[core] final val DEG = math.Pi / 180.0
  private[core] final val DEGv = DEG
  private[core] final val TINY = math.sqrt(java.lang.Double.MIN_NORMAL)
  private final val tol0 = 2.220446049250313e-16
  private final val tol1 = 200 * tol0
  private final val tol2 = math.sqrt(tol0)
  private final val tolb = tol0
  private final val xthresh = 1000 * tol2
  private final val MAXIT1 = 20
  private final val MAXIT2 = MAXIT1 + 53 + 10

  /** WGS84 instance (most common use). */
  lazy val WGS84 = new Geodesic(6378137.0, 1.0 / 298.257223563)

  // ---------------- angle utilities (reference geodesic.c:140-245) --------

  def latFix(x: Double): Double = if (math.abs(x) > 90) Double.NaN else x

  def angNormalize(x: Double): Double = {
    val y = java.lang.Math.IEEEremainder(x, 360.0)
    if (math.abs(y) == 180) java.lang.Math.copySign(180.0, x) else y
  }

  def angRound(x: Double): Double = {
    val z = 1.0 / 16.0
    var y = math.abs(x)
    val w = z - y
    y = if (w > 0) z - w else y
    java.lang.Math.copySign(y, x)
  }

  /** error-free sum: returns (s, t) with u+v = s+t exactly. */
  @inline private def sumx(u: Double, v: Double): (Double, Double) = {
    val s = u + v
    var up = s - v
    var vpp = s - up
    up -= u
    vpp -= v
    val t = if (s != 0) 0 - (up + vpp) else s
    (s, t)
  }

  /** AngDiff: (y - x) carefully, returns (d, e). */
  def angDiff(x: Double, y: Double): (Double, Double) = {
    val (d0, t0) = sumx(java.lang.Math.IEEEremainder(-x, 360.0),
      java.lang.Math.IEEEremainder(y, 360.0))
    val (d1, t1) = sumx(java.lang.Math.IEEEremainder(d0, 360.0), t0)
    var d = d1; val t = t1
    if (d == 0 || math.abs(d) == 180)
      d = java.lang.Math.copySign(d, if (t == 0) y - x else -t)
    (d, t)
  }

  /** sincos of x degrees with exact quadrant reduction. */
  def sincosdx(x: Double): (Double, Double) = {
    val r0 = java.lang.Math.IEEEremainder(x, 90.0)
    val q = java.lang.Math.rint((x - r0) / 90.0).toLong
    val r = r0 * DEG
    val s = math.sin(r); val c = math.cos(r)
    var sinx = 0.0; var cosx = 0.0
    (q & 3L) match {
      case 0L => sinx = s; cosx = c
      case 1L => sinx = c; cosx = -s
      case 2L => sinx = -s; cosx = -c
      case _ => sinx = -c; cosx = s
    }
    cosx += 0.0
    if (sinx == 0) sinx = java.lang.Math.copySign(sinx, x)
    (sinx, cosx)
  }

  /** sincos of (x + t) degrees, x reduced first (reference sincosde). */
  def sincosde(x: Double, t: Double): (Double, Double) = {
    val r0 = java.lang.Math.IEEEremainder(x, 90.0)
    val q = java.lang.Math.rint((x - r0) / 90.0).toLong
    val r = angRound(r0 + t) * DEG
    val s = math.sin(r); val c = math.cos(r)
    var sinx = 0.0; var cosx = 0.0
    (q & 3L) match {
      case 0L => sinx = s; cosx = c
      case 1L => sinx = c; cosx = -s
      case 2L => sinx = -s; cosx = -c
      case _ => sinx = -c; cosx = s
    }
    cosx += 0.0
    if (sinx == 0) sinx = java.lang.Math.copySign(sinx, x)
    (sinx, cosx)
  }

  /** atan2 in degrees with quadrant-stable reduction. */
  def atan2dx(y0: Double, x0: Double): Double = {
    var x = x0; var y = y0; var q = 0
    if (math.abs(y) > math.abs(x)) { val t = x; x = y; y = t; q = 2 }
    if (java.lang.Math.copySign(1.0, x) < 0) { x = -x; q += 1 }
    var ang = math.atan2(y, x) / DEG
    q match {
      case 1 => ang = java.lang.Math.copySign(180.0, y) - ang
      case 2 => ang = 90 - ang
      case 3 => ang = -90 + ang
      case _ => ()
    }
    ang
  }

  @inline def atanh(x: Double): Double = {
    val y = math.abs(x)
    java.lang.Math.copySign(math.log1p(2 * y / (1 - y)) / 2, x)
  }

  @inline def polyval(n: Int, p: Array[Double], off: Int, x: Double): Double = {
    var y = if (n < 0) 0.0 else p(off)
    var i = 1
    while (i <= n) { y = y * x + p(off + i); i += 1 }
    y
  }

  /** Clenshaw: sinp ? sum(c[i] sin(2 i x), 1..n) : sum(c[i] cos((2i+1)x), 0..n-1). */
  def sinCosSeries(sinp: Boolean, sinx: Double, cosx: Double, c: Array[Double], n0: Int): Double = {
    var idx = n0 + (if (sinp) 1 else 0)
    val ar = 2 * (cosx - sinx) * (cosx + sinx)
    var n = n0
    var y0 = if ((n & 1) != 0) { idx -= 1; c(idx) } else 0.0
    var y1 = 0.0
    n /= 2
    while (n > 0) {
      idx -= 1; y1 = ar * y0 - y1 + c(idx)
      idx -= 1; y0 = ar * y1 - y0 + c(idx)
      n -= 1
    }
    if (sinp) 2 * sinx * cosx * y0 else cosx * (y0 - y1)
  }

  /** A1-1 (Karney 2013 eq. 17). */
  def a1m1f(eps: Double): Double = {
    val coeff = Array[Double](1, 4, 64, 0, 256)
    val t = polyval(3, coeff, 0, eps * eps) / coeff(4)
    (t + eps) / (1 - eps)
  }

  def c1f(eps: Double, c: Array[Double]): Unit = {
    val coeff = Array[Double](
      -1, 6, -16, 32, -9, 64, -128, 2048, 9, -16, 768, 3, -5, 512,
      -7, 1280, -7, 2048)
    val eps2 = eps * eps
    var d = eps
    var o = 0
    var l = 1
    while (l <= 6) {
      val m = (6 - l) / 2
      c(l) = d * polyval(m, coeff, o, eps2) / coeff(o + m + 1)
      o += m + 2
      d *= eps
      l += 1
    }
  }

  def c1pf(eps: Double, c: Array[Double]): Unit = {
    val coeff = Array[Double](
      205, -432, 768, 1536, 4005, -4736, 3840, 12288, -225, 116, 384,
      -7173, 2695, 7680, 3467, 7680, 38081, 61440)
    val eps2 = eps * eps
    var d = eps
    var o = 0
    var l = 1
    while (l <= 6) {
      val m = (6 - l) / 2
      c(l) = d * polyval(m, coeff, o, eps2) / coeff(o + m + 1)
      o += m + 2
      d *= eps
      l += 1
    }
  }

  /** A2-1 (Karney 2013 eq. 42). */
  def a2m1f(eps: Double): Double = {
    val coeff = Array[Double](-11, -28, -192, 0, 256)
    val t = polyval(3, coeff, 0, eps * eps) / coeff(4)
    (t - eps) / (1 + eps)
  }

  def c2f(eps: Double, c: Array[Double]): Unit = {
    val coeff = Array[Double](
      1, 2, 16, 32, 35, 64, 384, 2048, 15, 80, 768, 7, 35, 512,
      63, 1280, 77, 2048)
    val eps2 = eps * eps
    var d = eps
    var o = 0
    var l = 1
    while (l <= 6) {
      val m = (6 - l) / 2
      c(l) = d * polyval(m, coeff, o, eps2) / coeff(o + m + 1)
      o += m + 2
      d *= eps
      l += 1
    }
  }

  /** Positive root of the astroid equation (reference geodesic.c:1177-1230). */
  def astroid(x: Double, y: Double): Double = {
    val p = x * x
    val q = y * y
    val r = (p + q - 1) / 6
    if (!(q == 0 && r <= 0)) {
      val s0 = p * q / 4
      val r2 = r * r
      val r3 = r * r2
      val disc = s0 * (s0 + 2 * r3)
      var u = r
      if (disc >= 0) {
        var t3 = s0 + r3
        t3 += (if (t3 < 0) -math.sqrt(disc) else math.sqrt(disc))
        val t = math.cbrt(t3)
        u += t + (if (t != 0) r2 / t else 0.0)
      } else {
        val ang = math.atan2(math.sqrt(-disc), -(s0 + r3))
        u += 2 * r * math.cos(ang / 3)
      }
      val v = math.sqrt(u * u + q)
      val uv = if (u < 0) q / (v - u) else u + v
      val w = (uv - q) / (2 * v)
      uv / (math.sqrt(uv + w * w) + w)
    } else 0.0
  }
}

/** Planimeter: geodesic polygon perimeter + area over an ellipsoid
  * (reference geodesic.c geod_polygon_init/addpoint/compute :1509+).
  * Vertices are added in traversal order; compute() closes the ring.
  * Counter-clockwise traversal gives positive area (the reverse=false,
  * sign=true convention); the result lies in (-area0/2, area0/2], so
  * pole-encircling polygons reduce correctly. Neumaier-compensated sums
  * keep many-vertex accumulations exact. */
final class PolygonArea(g: Geodesic) {
  private var num = 0
  private var lat0 = 0.0; private var lon0 = 0.0
  private var latLast = 0.0; private var lonLast = 0.0
  private val perim = new Array[Double](2)
  private val area = new Array[Double](2)
  private var crossings = 0

  @inline private def add(s: Array[Double], y: Double): Unit = {
    val t = s(0) + y
    s(1) += (if (math.abs(s(0)) >= math.abs(y)) (s(0) - t) + y else (y - t) + s(0))
    s(0) = t
  }

  /** +-1 when the edge crosses the prime meridian east/west, else 0
    * (reference transit). */
  private def transit(lon1: Double, lon2: Double): Int = {
    val lon12 = Geodesic.angDiff(lon1, lon2)._1
    val l1 = Geodesic.angNormalize(lon1)
    val l2 = Geodesic.angNormalize(lon2)
    if (lon12 > 0 && ((l1 < 0 && l2 >= 0) || (l1 > 0 && l2 == 0))) 1
    else if (lon12 < 0 && l1 >= 0 && l2 < 0) -1
    else 0
  }

  def addPoint(lat: Double, lon: Double): Unit = {
    if (num == 0) { lat0 = lat; lon0 = lon }
    else {
      val r = g.inverseAll(latLast, lonLast, lat, lon)
      add(perim, r(0))
      add(area, r(6))
      crossings += transit(lonLast, lon)
    }
    latLast = lat; lonLast = lon
    num += 1
  }

  /** (perimeter metres, area m^2); closes the ring back to the first
    * vertex. */
  def compute(): (Double, Double) = {
    if (num < 2) return (0.0, 0.0)
    val r = g.inverseAll(latLast, lonLast, lat0, lon0)
    val p = perim(0) + perim(1) + r(0)
    var aSum = area(0) + area(1) + r(6)
    val cr = crossings + transit(lonLast, lon0)
    val a0 = g.area0
    aSum = java.lang.Math.IEEEremainder(aSum, a0)
    if ((cr & 1) != 0) aSum += (if (aSum < 0) 1 else -1) * a0 / 2
    // internal sum carries the clockwise sense; flip to counter-clockwise
    aSum = -aSum
    if (aSum > a0 / 2) aSum -= a0
    else if (aSum <= -a0 / 2) aSum += a0
    (p, 0 + aSum)
  }
}

object PolygonArea {
  /** one-shot: ring as (lat, lon) vertices in traversal order. */
  def compute(g: Geodesic, ring: Seq[(Double, Double)]): (Double, Double) = {
    val p = new PolygonArea(g)
    ring.foreach { case (lat, lon) => p.addPoint(lat, lon) }
    p.compute()
  }
}
