package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Icosahedral Snyder Equal Area (ISEA).
  *
  * Semantics per reference src/projections/isea.cpp: Snyder (1992) forward
  * equations 5-14 on the 20 icosahedron faces (:364-500), coordinate-frame
  * rotation to the ISEA or polar orientation (:527-583), the unfolded plane
  * layout (:656-666), the DGGS addressing modes (plane/dd/di/hex,
  * :668-923), and the Newton-iteration inverse for the default planar
  * configurations (:1100-1310, after brsr.github.io/2021/08/31
  * "snyder-equal-area"). Constants are Snyder's published values.
  */
object IseaOps {
  // --- Snyder 1992 constants (dimensionless, unit sphere) ---
  private final val DEG120 = 2.09439510239319549229
  private final val DEG180 = math.Pi
  private final val ISEA_SCALE = 0.8301572857837594396028083
  private final val E_RAD = 0.91843818701052843323 // north dodecahedron-center band lat
  private final val F_RAD = 0.18871053078356206978 // second band lat
  private final val G_DIST = 0.6523581397843681859886783 // center-to-vertex arc g
  private final val TANG = 0.76393202250021030358019673567 // tan(g)
  private final val TAN30 = 0.57735026918962576450914878
  private final val COT_THETA = 1.0 / TAN30
  private final val COS_G = 0.80901699437494742410229341718281905886 // cos 36
  private final val SIN_G = 0.587785252292473129168705954639072768597652 // sin 36
  private final val COS_SDC = 0.7946544722917661229596057297879189448539 // cos g
  private final val SIN_G_COS_SDC = SIN_G * COS_SDC
  private final val SQRT3 = 1.73205080756887729352744634150587236694280525381038
  private final val SIN60 = SQRT3 / 2.0
  private final val COS30 = SQRT3 / 2.0
  private final val TABLE_G = TANG * SIN60
  private final val TABLE_H = 0.25 * TANG
  private final val RP_OVER_R = 0.9103832815095032 // R'/R
  private final val STD_LAT = 1.01722196792335072101 // 58.2825...deg
  private final val STD_LON = 0.19634954084936207740 // 11.25deg
  private final val DEG2RAD = GeoMath.DEG2RAD

  /** lat of the 20 face centers (= dodecahedron vertices); lon in deg. */
  private val CENTER_LAT = Array(
    E_RAD, E_RAD, E_RAD, E_RAD, E_RAD,
    F_RAD, F_RAD, F_RAD, F_RAD, F_RAD,
    -F_RAD, -F_RAD, -F_RAD, -F_RAD, -F_RAD,
    -E_RAD, -E_RAD, -E_RAD, -E_RAD, -E_RAD)
  private val CENTER_LON = Array(
    -144.0, -72.0, 0.0, 72.0, 144.0,
    -144.0, -72.0, 0.0, 72.0, 144.0,
    -108.0, -36.0, 36.0, 108.0, 180.0,
    -108.0, -36.0, 36.0, 108.0, 180.0).map(_ * DEG2RAD)
  private val CENTER_SINLAT = CENTER_LAT.map(math.sin)
  private val CENTER_COSLAT = CENTER_LAT.map(math.cos)

  private final val SAFE_EPS = 1e-15
  @inline private def safeAsin(t: Double): Double =
    if (math.abs(t) < SAFE_EPS) 0
    else if (math.abs(t - 1) < SAFE_EPS) math.Pi / 2
    else if (math.abs(t + 1) < SAFE_EPS) -math.Pi / 2
    else math.asin(t)
  @inline private def safeAcos(t: Double): Double =
    if (math.abs(t) < SAFE_EPS) math.Pi / 2
    else if (math.abs(t + 1) < SAFE_EPS) math.Pi
    else if (math.abs(t - 1) < SAFE_EPS) 0
    else math.acos(t)

  private def azAdjustment(tri: Int): Double =
    if ((tri >= 5 && tri <= 9) || tri == 15 || tri == 16) math.Pi
    else if (tri >= 17) -math.Pi
    else 0

  /** Center of triangle `tri` in the unfolded plane (R units). */
  private def triangleXY(tri0: Int): (Double, Double) = {
    val tri = tri0 % 20
    var cx = TABLE_G * ((tri % 5) - 2) * 2.0
    if (tri > 9) cx += TABLE_G
    val cy = (tri / 5) match {
      case 0 => 5.0 * TABLE_H
      case 1 => TABLE_H
      case 2 => -TABLE_H
      case _ => -5.0 * TABLE_H
    }
    (cx * RP_OVER_R, cy * RP_OVER_R)
  }

  /** marker for the reference's internal throw paths (overflow etc.) */
  private final class IseaDomain extends RuntimeException

  /** Snyder forward on the oriented sphere; returns (tri, x, y) in R units. */
  private def snyderForward(lat: Double, lon: Double): (Int, Double, Double) = {
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    var i = 0
    while (i < 20) {
      val dLon = lon - CENTER_LON(i)
      val cosLatCosLon = cosLat * math.cos(dLon)
      val cosZ = CENTER_SINLAT(i) * sinLat + CENTER_COSLAT(i) * cosLatCosLon
      val z = safeAcos(cosZ)
      if (z <= G_DIST + 0.000005) {
        var az = math.atan2(cosLat * math.sin(dLon),
          CENTER_COSLAT(i) * sinLat - CENTER_SINLAT(i) * cosLatCosLon)
        az -= azAdjustment(i)
        if (az < 0.0) az += 2.0 * math.Pi
        var azMult = 0
        while (az < 0.0) { az += DEG120; azMult -= 1 }
        while (az > DEG120 + 2.220446049250313e-16) { az -= DEG120; azMult += 1 }
        val cosAz = math.cos(az); val sinAz = math.sin(az)
        val q = math.atan2(TANG, cosAz + sinAz * COT_THETA)
        if (z <= q + 0.000005) {
          val h = math.acos(sinAz * SIN_G_COS_SDC - cosAz * COS_G)
          val ag = az + DEG2RAD * 36 + h - DEG180
          var azPrime = math.atan2(2.0 * ag,
            RP_OVER_R * RP_OVER_R * TANG * TANG - 2.0 * ag * COT_THETA)
          val dPrime = RP_OVER_R * TANG / (math.cos(azPrime) + math.sin(azPrime) * COT_THETA)
          val f = dPrime / (2.0 * RP_OVER_R * math.sin(q / 2.0))
          val rho = 2.0 * RP_OVER_R * f * math.sin(z / 2.0)
          azPrime += DEG120 * azMult
          return (i, rho * math.sin(azPrime), rho * math.cos(azPrime))
        }
      }
      i += 1
    }
    throw new IseaDomain // point on no face: cannot happen for valid input
  }

  /** Rotate pt to the coordinate frame with npLat/npLon as new north pole
    * (Snyder, Map Projections: A Working Manual p.31, eq 5-7/5-8b). */
  private def ctran(npLat: Double, npLon: Double, lat: Double, lon: Double,
                    lon0: Double): (Double, Double) = {
    val beta = npLon + math.Pi
    val dlambda = lon - beta
    val cosP = math.cos(lat); val sinP = math.sin(lat)
    val cosA = math.cos(npLat); val sinA = math.sin(npLat)
    val cosD = math.cos(dlambda); val sinD = math.sin(dlambda)
    val sinPhip = sinA * sinP - cosA * cosP * cosD
    var lambdap = math.atan2(cosP * sinD, sinA * cosP * cosD + cosA * sinP) + beta
    lambdap = lambdap % (2 * math.Pi)
    while (lambdap > math.Pi) lambdap -= 2 * math.Pi
    while (lambdap < -math.Pi) lambdap += 2 * math.Pi
    lambdap -= (-lon0 + npLon)
    lambdap = lambdap % (2 * math.Pi)
    while (lambdap > math.Pi) lambdap -= 2 * math.Pi
    while (lambdap < -math.Pi) lambdap += 2 * math.Pi
    (safeAsin(sinPhip), lambdap)
  }

  private def rotate(pt: Array[Double], degrees: Double): Unit = {
    var rad = -degrees * math.Pi / 180.0
    while (rad >= 2.0 * math.Pi) rad -= 2.0 * math.Pi
    while (rad <= -2.0 * math.Pi) rad += 2.0 * math.Pi
    val x = pt(0) * math.cos(rad) + pt(1) * math.sin(rad)
    val y = -pt(0) * math.sin(rad) + pt(1) * math.cos(rad)
    pt(0) = x; pt(1) = y
  }

  // --- hex binning (reference :150-230) ---

  /** snap (x, y) to the hex grid of the given width; returns (i, j). */
  private def hexbin2(width: Double, x0: Double, y0: Double): (Long, Long) = {
    if (width == 0) throw new IseaDomain
    var x = x0 / COS30
    var y = y0 - x / 2.0
    x /= width; y /= width
    val z = -x - y
    val rx = math.floor(x + 0.5); val ix0 = math.round(rx)
    val ry = math.floor(y + 0.5); val iy0 = math.round(ry)
    val rz = math.floor(z + 0.5); val iz0 = math.round(rz)
    if (math.abs((ix0 + iy0).toDouble) > Int.MaxValue ||
        math.abs((ix0 + iy0 + iz0).toDouble) > Int.MaxValue) throw new IseaDomain
    var ix = ix0; var iy = iy0; var iz = iz0
    val s = ix + iy + iz
    if (s != 0) {
      val adx = math.abs(rx - x); val ady = math.abs(ry - y); val adz = math.abs(rz - z)
      if (adx >= ady && adx >= adz) ix -= s
      else if (ady >= adx && ady >= adz) iy -= s
      else iz -= s
    }
    // iso -> xy (hex_xy with iso=1)
    val hy = if (ix >= 0) -iy - (ix + 1) / 2 else -iy - ix / 2
    (ix, hy)
  }

  /** xy -> iso cube coords (hex_iso). */
  @inline private def hexIso(hx: Long, hy: Long): (Long, Long, Long) = {
    val y2 = if (hx >= 0) -hy - (hx + 1) / 2 else -hy - hx / 2
    (hx, y2, -hx - y2)
  }

  private final class Setup(P: PJ) {
    var oLat = STD_LAT; var oLon = STD_LON; var oAz = 0.0
    val output: Int = P.params.s("mode") match { // 0=plane 1=di 2=dd 3=hex
      case Some("plane") | None => 0
      case Some("di") => 1
      case Some("dd") => 2
      case Some("hex") => 3
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "isea: mode must be plane, di, dd or hex")
    }
    P.params.s("orient") match {
      case Some("isea") | None => ()
      case Some("pole") => oLat = math.Pi / 2.0; oLon = 0.0
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "isea: orient must be isea or pole")
    }
    if (P.params.has("azi")) oAz = P.params.r("azi")
    if (P.params.has("lon_0")) oLon = P.params.r("lon_0")
    if (P.params.has("lat_0")) oLat = P.params.r("lat_0")
    val resolution: Int = if (P.params.has("resolution")) P.params.i("resolution") else 4
    val aperture: Int = if (P.params.has("aperture")) P.params.i("aperture") else 3

    // inverse support: default planar configs only
    val invKind: Int = // 0=none 1=standard isea 2=polar
      if (output == 0 && oAz == 0.0 && aperture == 3 && resolution == 4) {
        if (oLat == STD_LAT && oLon == STD_LON) 1
        else if (oLat == math.Pi / 2.0 && oLon == 0) 2
        else 0
      } else 0

    // metric quantities for the inverse (in metres, like the reference)
    val r2: Double =
      if (P.e > 0) {
        val a2 = P.a * P.a; val c2 = P.b * P.b
        val s = math.Pi * (2 * a2 + c2 / P.e * math.log((1 + P.e) / (1 - P.e)))
        s / (4 * math.Pi)
      } else P.a * P.a
    val rPrime: Double = RP_OVER_R * (if (P.e > 0) math.sqrt(r2) else P.a)
    val rPrime2X = 2 * rPrime
    val rPrimeTang = rPrime * TANG
    val rPrime2Tan2g = rPrimeTang * rPrimeTang
    val centerToBase = rPrimeTang / 2
    val triWidth = rPrimeTang * SQRT3
    val yOffsets = Array(-2 * centerToBase, -4 * centerToBase, -5 * centerToBase, -7 * centerToBase)
    val xo = 2.5 * triWidth
    val yo = -1.5 * centerToBase
    val sx = 1.0 / triWidth
    val sy = 1.0 / (3 * centerToBase)
    // inverse orientation frame (standard: ((E+F)/2, -11.25deg); polar: (0,0))
    val orLat: Double = if (invKind == 1) (E_RAD + F_RAD) / 2 else 0.0
    val orLon: Double = if (invKind == 1) DEG2RAD * -11.25 else 0.0
    val cosOrLat = math.cos(orLat); val sinOrLat = math.sin(orLat)
  }

  // --- DGGS addressing (only reached for non-plane modes) ---

  /** triangle coords -> quad dd coords; returns quad. */
  private def ptdd(tri: Int, pt: Array[Double]): Int = {
    val downtri = (tri / 5) % 2 == 1
    val quad = (tri % 5) + (tri / 10) * 5 + 1
    rotate(pt, if (downtri) 240.0 else 60.0)
    if (downtri) { pt(0) += 0.5; pt(1) += COS30 }
    quad
  }

  private def dddiAp3odd(st: Setup, quad0: Int, pt: Array[Double]): (Int, Double, Double) = {
    val sidelength = (math.pow(2.0, st.resolution) + 1.0) / 2.0
    val hexwidth = math.cos(math.Pi / 6.0) / sidelength
    val maxcoord = math.round(sidelength * 2.0)
    val (hx, hy) = hexbin2(hexwidth, pt(0), pt(1))
    val (x, y, z) = hexIso(hx, hy)
    var d = x - z
    var i = x + y + y
    var quad = quad0
    if (quad <= 5) {
      if (d == 0 && i == maxcoord) { quad = 0; d = 0; i = 0 }
      else if (i == maxcoord) { quad += 1; if (quad == 6) quad = 1; i = maxcoord - d; d = 0 }
      else if (d == maxcoord) { quad += 5; d = 0 }
    } else {
      if (i == 0 && d == maxcoord) { quad = 11; d = 0; i = 0 }
      else if (d == maxcoord) { quad += 1; if (quad == 11) quad = 6; d = maxcoord - i; i = 0 }
      else if (i == maxcoord) { quad = (quad - 4) % 5; i = 0 }
    }
    (quad, d.toDouble, i.toDouble)
  }

  private def dddi(st: Setup, quad0: Int, pt: Array[Double]): (Int, Double, Double) = {
    if (st.aperture == 3 && st.resolution % 2 != 0) return dddiAp3odd(st, quad0, pt)
    val sidelength: Long =
      if (st.aperture > 0) {
        val sd = math.pow(st.aperture, st.resolution / 2.0)
        if (math.abs(sd) > Int.MaxValue) throw new IseaDomain
        math.round(sd)
      } else st.resolution.toLong
    if (sidelength == 0) throw new IseaDomain
    val hexwidth = 1.0 / sidelength
    val v = Array(pt(0), pt(1))
    rotate(v, -30.0)
    val (hx0, hy0) = hexbin2(hexwidth, v(0), v(1))
    var (x, y, z) = hexIso(hx0, hy0)
    var quad = quad0
    if (quad <= 5) {
      if (x == 0 && z == -sidelength) { quad = 0; z = 0; y = 0; x = 0 }
      else if (z == -sidelength) {
        quad += 1; if (quad == 6) quad = 1
        y = sidelength - x; z = x - sidelength; x = 0
      } else if (x == sidelength) { quad += 5; y = -z; x = 0 }
    } else {
      if (z == 0 && x == sidelength) { quad = 11; x = 0; y = 0; z = 0 }
      else if (x == sidelength) {
        quad += 1; if (quad == 11) quad = 6
        x = y + sidelength; y = 0; z = -x
      } else if (y == -sidelength) { quad -= 4; y = 0; z = -x }
    }
    (quad, x.toDouble, -z.toDouble)
  }

  def isea(P: PJ): Unit = {
    val st = new Setup(P)
    val aEll = P.a

    P.kernel = new OpKernel {
      val caps = FWD2 | INV2

      override def fwd2(c: Coord): Unit = {
        try {
          val (lat, lon) = ctran(st.oLat, st.oLon, c.y, c.x, st.oAz)
          val (tri, sx0, sy0) = snyderForward(lat, lon)
          val pt = Array(sx0, sy0)
          if (st.output == 0) {
            if ((tri / 5) % 2 == 1) { pt(0) = -pt(0); pt(1) = -pt(1) }
            val (tcx, tcy) = triangleXY(tri)
            c.x = pt(0) + tcx; c.y = pt(1) + tcy
          } else {
            pt(0) = pt(0) * ISEA_SCALE + 0.5
            pt(1) = pt(1) * ISEA_SCALE + 2.0 * 0.14433756729740644112
            st.output match {
              case 2 => ptdd(tri, pt); c.x = pt(0); c.y = pt(1) // dd
              case 1 => // di
                val q1 = ptdd(tri, pt)
                val (_, d, i) = dddi(st, q1, pt)
                c.x = d; c.y = i
              case _ => // hex
                val q1 = ptdd(tri, pt)
                val (quad, d, i) = dddi(st, q1, pt)
                if (d < (Int.MinValue >> 4) || d > (Int.MaxValue >> 4)) throw new IseaDomain
                c.x = d.toInt * 16 + quad; c.y = i
            }
          }
        } catch {
          case _: IseaDomain =>
            c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
        }
      }

      override def inv2(c: Coord): Unit = {
        if (st.invKind == 0) { c.x = Double.PositiveInfinity; c.y = Double.PositiveInfinity; return }
        val eps = 1e-11
        var px = c.x * aEll + st.xo
        val py = c.y * aEll + st.yo
        val sr = -SIN60; val cr = 0.5
        if (px < 0 || (px < st.triWidth / 2 && py < 0 && py * cr < px * sr))
          px += 5 * st.triWidth // wrap around the left seam
        val shearX = 1.0 / SQRT3
        val yp = -(px * sr + py * cr)
        var x = (px * cr - py * sr + yp * shearX) * st.sx
        var y = yp * st.sy
        if (x < 0 || (y > x && x < 5 - eps)) x += eps
        else if (x > 5 || (y < x && x > 0 + eps)) x -= eps
        if (y < 0 || (x > y && y < 6 - eps)) y += eps
        else if (y > 6 || (x < y && y > 0 + eps)) y -= eps
        var face = 0 // 1-based; 0 = not found
        if (x >= 0 && x <= 5 && y >= 0 && y <= 6) {
          val ix = math.max(0, math.min(4, x.toInt))
          val iy = math.max(0, math.min(5, y.toInt))
          if (iy == ix || iy == ix + 1) {
            val rhombus = ix + iy
            val top = x - ix > y - iy
            val f = rhombus match {
              case 0 => if (top) 0 else 5
              case 2 => if (top) 1 else 6
              case 4 => if (top) 2 else 7
              case 6 => if (top) 3 else 8
              case 8 => if (top) 4 else 9
              case 1 => if (top) 10 else 15
              case 3 => if (top) 11 else 16
              case 5 => if (top) 12 else 17
              case 7 => if (top) 13 else 18
              case 9 => if (top) 14 else 19
              case _ => -1
            }
            face = f + 1
          }
        }
        if (face == 0) {
          c.x = Double.PositiveInfinity; c.y = Double.PositiveInfinity; return }
        val fy = (face - 1) / 5; val fx = (face - 1) - 5 * fy
        val rx = px - (2 * fx + fy / 2 + 1) * st.triWidth / 2
        val ry = py - (st.yOffsets(fy) + 3 * st.centerToBase)
        icoToSphere(face - 1, rx, ry, c, eps)
      }

      /** inverse Snyder on face `f` with in-face offsets (x, y) in metres. */
      private def icoToSphere(f: Int, x: Double, y: Double, c: Coord, eps: Double): Unit = {
        val precision = DEG2RAD * 1e-11
        val azMax = DEG2RAD * 120
        var az = math.atan2(x, y)
        val rho = math.sqrt(x * x + y * y)
        var azAdj = if (f <= 4 || (10 <= f && f <= 14)) 0.0 else DEG2RAD * 180
        az += azAdj
        while (az < 0) { azAdj += azMax; az += azMax }
        while (az > azMax) { azAdj -= azMax; az -= azMax }
        val sinAz = math.sin(az); val cosAz = math.cos(az)
        val cotAz = cosAz / sinAz
        val area = st.rPrime2Tan2g / (2 * (cotAz + COT_THETA))
        var deltaAz = 10 * precision
        val westVertexLon = DEG2RAD * -144
        val target = area / st.r2 - westVertexLon
        var azEarth = az
        while (math.abs(deltaAz) > precision) {
          val sinAe = math.sin(azEarth); val cosAe = math.cos(azEarth)
          val h = math.acos(sinAe * SIN_G_COS_SDC - cosAe * COS_G)
          val fAz = target - h - azEarth
          val f2Az = (cosAe * SIN_G_COS_SDC + sinAe * COS_G) / math.sin(h) - 1
          deltaAz = -fAz / f2Az
          azEarth += deltaAz
        }
        val sinAe = math.sin(azEarth); val cosAe = math.cos(azEarth)
        val q = math.atan2(TANG, cosAe + sinAe * COT_THETA)
        val d = st.rPrimeTang / (cosAz + sinAz * COT_THETA)
        val ff = d / (st.rPrime2X * math.sin(q / 2))
        val z = 2 * math.asin(rho / (st.rPrime2X * ff))
        azEarth -= azAdj
        val sinLat0 = CENTER_SINLAT(f); val cosLat0 = CENTER_COSLAT(f)
        val sinZ = math.sin(z); val cosZ = math.cos(z)
        val cosLat0SinZ = cosLat0 * sinZ
        val lat = safeAsin(sinLat0 * cosZ + cosLat0SinZ * math.cos(azEarth))
        var lon = CENTER_LON(f) +
          math.atan2(math.sin(azEarth) * cosLat0SinZ, cosZ - sinLat0 * math.sin(lat))
        // revert the orientation rotation
        val precDef = DEG2RAD * 1e-5
        val lonIn = if (lat < -HALFPI + precDef || lat > HALFPI - precDef) 0 else lon
        var outLat = lat; var outLon = lonIn
        if (st.orLat != 0.0 || st.orLon != 0.0) {
          val sinLat = math.sin(lat); val cosLat = math.cos(lat)
          val sinLon = math.sin(lonIn); val cosLon = math.cos(lonIn)
          val cosLonCosLat = cosLon * cosLat
          outLat = math.asin(sinLat * st.cosOrLat - cosLonCosLat * st.sinOrLat)
          outLon = math.atan2(sinLon * cosLat,
            cosLonCosLat * st.cosOrLat + sinLat * st.sinOrLat) - st.orLon
        }
        if (outLon < -math.Pi - eps) outLon += 2 * math.Pi
        else if (outLon > math.Pi + eps) outLon -= 2 * math.Pi
        c.x = outLon; c.y = outLat
      }
    }
  }
}
