package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Datum transformations beyond Helmert: Molodensky (standard + abridged),
  * 3D affine, geographic offset, vertical offset and slope (EPSG 1046),
  * geocentric↔topocentric (EPSG GN7-2). Math per reference
  * src/transformations/{molodensky,affine,vertoffset}.cpp and
  * src/conversions/topocentric.cpp. */
object TransformOps {
  private final val ARCSEC_TO_RAD = GeoMath.DEG2RAD / 3600.0

  // ---------------- molodensky ----------------

  def molodensky(P: PJ): Unit = {
    val p = P.params
    for (k <- Seq("dx", "dy", "dz", "da", "df"))
      if (!p.has(k)) throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, s"molodensky: missing $k")
    val dx = p.d("dx"); val dy = p.d("dy"); val dz = p.d("dz")
    val da = p.d("da"); val df = p.d("df")
    val abridged = p.has("abridged")
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    val a = P.a; val es = P.es; val f = P.f

    def rn(phi: Double): Double = {
      val s = math.sin(phi)
      if (es == 0) a else a / math.sqrt(1 - es * s * s)
    }
    def rm(phi: Double): Double = {
      val s = math.sin(phi)
      if (es == 0) a
      else if (phi == 0) a * (1 - es)
      else if (math.abs(phi) == HALFPI) a / math.sqrt(1 - es)
      else a * (1 - es) / math.pow(1 - es * s * s, 1.5)
    }

    /** returns (dlam, dphi, dh); NaN lam marks the degenerate denominator. */
    def deltas(lam: Double, phi: Double, z: Double): (Double, Double, Double) = {
      val slam = math.sin(lam); val clam = math.cos(lam)
      val sphi = math.sin(phi); val cphi = math.cos(phi)
      if (abridged) {
        val adffda = a * df + f * da
        var dphi = -dx * sphi * clam - dy * sphi * slam + dz * cphi +
          adffda * math.sin(2 * phi)
        dphi /= rm(phi)
        val dlamDenom = rn(phi) * cphi
        if (dlamDenom == 0) return (Double.NaN, 0, 0)
        val dlam = (-dx * slam + dy * clam) / dlamDenom
        val dh = dx * cphi * clam + dy * cphi * slam + dz * sphi - da +
          adffda * sphi * sphi
        (dlam, dphi, dh)
      } else {
        val rho = rm(phi); val nu = rn(phi)
        var dphi = (-dx * sphi * clam) - (dy * sphi * slam) + (dz * cphi) +
          ((nu * es * sphi * cphi * da) / a) +
          (sphi * cphi * (rho / (1 - f) + nu * (1 - f)) * df)
        val dphiDenom = rho + z
        if (dphiDenom == 0) return (Double.NaN, 0, 0)
        dphi /= dphiDenom
        val dlamDenom = (nu + z) * cphi
        if (dlamDenom == 0) return (Double.NaN, 0, 0)
        val dlam = (-dx * slam + dy * clam) / dlamDenom
        val dh = dx * cphi * clam + dy * cphi * slam + dz * sphi - (a / nu) * da +
          nu * (1 - f) * sphi * sphi * df
        (dlam, dphi, dh)
      }
    }

    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      override def fwd4(c: Coord): Unit = {
        val (dlam, dphi, dh) = deltas(c.x, c.y, c.z)
        if (dlam.isNaN) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        c.x += dlam; c.y += dphi; c.z += dh
      }
      override def inv4(c: Coord): Unit = {
        val (dlam, dphi, dh) = deltas(c.x, c.y, c.z)
        if (dlam.isNaN) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        c.x -= dlam; c.y -= dphi; c.z -= dh
      }
    }
  }

  // ---------------- affine / geogoffset ----------------

  private final class AffineKernel(
      xoff: Double, yoff: Double, zoff: Double, toff: Double,
      m: Array[Double], tscale: Double) extends OpKernel {
    // inverse of the 3x3 + tscale; null rev marks non-invertible
    private val rev: Array[Double] = {
      val Array(a, b, c0, d, e, f, g, h, i) = m
      val bigA = e * i - f * h
      val bigB = -(d * i - f * g)
      val bigC = d * h - e * g
      val det = a * bigA + b * bigB + c0 * bigC
      if (det == 0.0 || tscale == 0.0) null
      else Array(
        bigA / det, -(b * i - c0 * h) / det, (b * f - c0 * e) / det,
        bigB / det, (a * i - c0 * g) / det, -(a * f - c0 * d) / det,
        bigC / det, -(a * h - b * g) / det, (a * e - b * d) / det)
    }
    val caps = FWD4 | (if (rev != null) INV4 else 0)
    override def fwd4(c: Coord): Unit = {
      val x = c.x; val y = c.y; val z = c.z
      c.x = xoff + m(0) * x + m(1) * y + m(2) * z
      c.y = yoff + m(3) * x + m(4) * y + m(5) * z
      c.z = zoff + m(6) * x + m(7) * y + m(8) * z
      c.t = toff + tscale * c.t
    }
    override def inv4(c: Coord): Unit = {
      val x = c.x - xoff; val y = c.y - yoff; val z = c.z - zoff
      c.x = rev(0) * x + rev(1) * y + rev(2) * z
      c.y = rev(3) * x + rev(4) * y + rev(5) * z
      c.z = rev(6) * x + rev(7) * y + rev(8) * z
      c.t = (c.t - toff) / tscale
    }
  }

  def affine(P: PJ): Unit = {
    val p = P.params
    P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER
    def d(k: String, dflt: Double = 0.0): Double = if (p.has(k)) p.d(k) else dflt
    val m = Array(
      d("s11", 1.0), d("s12"), d("s13"),
      d("s21"), d("s22", 1.0), d("s23"),
      d("s31"), d("s32"), d("s33", 1.0))
    P.kernel = new AffineKernel(d("xoff"), d("yoff"), d("zoff"), d("toff"),
      m, d("tscale", 1.0))
  }

  def geogoffset(P: PJ): Unit = {
    val p = P.params
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    P.kernel = new AffineKernel(
      p.d("dlon") * ARCSEC_TO_RAD, p.d("dlat") * ARCSEC_TO_RAD, p.d("dh"), 0.0,
      Array(1, 0, 0, 0, 1, 0, 0, 0, 1), 1.0)
  }

  // ---------------- vertoffset ----------------

  def vertoffset(P: PJ): Unit = {
    val p = P.params
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    val slopeLon = p.d("slope_lon") * ARCSEC_TO_RAD
    val slopeLat = p.d("slope_lat") * ARCSEC_TO_RAD
    val zoff = p.d("dh")
    val sinlat0 = math.sin(P.phi0)
    val om = 1 - P.es * sinlat0 * sinlat0
    val rho0 = P.a * (1 - P.es) / (om * math.sqrt(om))
    val nu0 = P.a / math.sqrt(om)
    val phi0 = P.phi0; val lam0 = P.lam0
    P.kernel = new OpKernel {
      val caps = FWD3 | INV3
      @inline private def off(phi: Double, lam: Double): Double =
        zoff + slopeLat * rho0 * (phi - phi0) + slopeLon * nu0 * lam * math.cos(phi)
      override def fwd3(c: Coord): Unit = {
        // undo the lam0 shift of fwd_prepare: only z changes in this method
        val lam = c.x
        c.x = lam + lam0
        c.z = c.z + off(c.y, lam)
      }
      override def inv3(c: Coord): Unit = {
        val lam = c.x - lam0
        c.x = lam
        c.z = c.z - off(c.y, lam)
      }
    }
  }

  // ---------------- topocentric ----------------

  def topocentric(P: PJ): Unit = {
    val p = P.params
    val hasX0 = p.has("X_0"); val hasY0 = p.has("Y_0"); val hasZ0 = p.has("Z_0")
    val hasLon0 = p.has("lon_0"); val hasLat0 = p.has("lat_0"); val hasH0 = p.has("h_0")
    if (!hasX0 && !hasLon0)
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "topocentric: missing X_0 or lon_0")
    if ((hasX0 || hasY0 || hasZ0) && (hasLon0 || hasLat0 || hasH0))
      throw ProjError(ProjErr.INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS,
        "topocentric: (X_0,Y_0,Z_0) and (lon_0,lat_0,h_0) are mutually exclusive")
    if (hasX0 && (!hasY0 || !hasZ0))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "topocentric: missing Y_0 and/or Z_0")
    if (hasLon0 && !hasLat0)
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "topocentric: missing lat_0")

    // cart sub-op on this op's ellipsoid
    val cart = Proj.create(new ParamList(Vector(
      "proj" -> "cart", "a" -> P.a.toString, "es" -> P.es.toString)))
    cart.skipFwdPrepare = true; cart.skipFwdFinalize = true
    cart.skipInvPrepare = true; cart.skipInvFinalize = true

    var x0 = 0.0; var y0 = 0.0; var z0 = 0.0
    var sinphi0 = 0.0; var cosphi0 = 0.0; var sinlam0 = 0.0; var coslam0 = 0.0
    val w = new Coord
    if (hasX0) {
      x0 = p.d("X_0"); y0 = p.d("Y_0"); z0 = p.d("Z_0")
      w.set(x0, y0, z0, 0)
      cart.kernel.inv3(w)
      sinphi0 = math.sin(w.y); cosphi0 = math.cos(w.y)
      sinlam0 = math.sin(w.x); coslam0 = math.cos(w.x)
    } else {
      w.set(P.lam0, P.phi0, p.d("h_0"), 0)
      cart.kernel.fwd3(w)
      x0 = w.x; y0 = w.y; z0 = w.z
      sinphi0 = math.sin(P.phi0); cosphi0 = math.cos(P.phi0)
      sinlam0 = math.sin(P.lam0); coslam0 = math.cos(P.lam0)
    }
    P.left = IOUnits.CARTESIAN; P.right = IOUnits.CARTESIAN
    val (sX0, sY0, sZ0) = (x0, y0, z0)
    val (sp0, cp0, sl0, cl0) = (sinphi0, cosphi0, sinlam0, coslam0)
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      override def fwd4(c: Coord): Unit = {
        val dX = c.x - sX0; val dY = c.y - sY0; val dZ = c.z - sZ0
        c.x = -dX * sl0 + dY * cl0
        c.y = -dX * sp0 * cl0 - dY * sp0 * sl0 + dZ * cp0
        c.z = dX * cp0 * cl0 + dY * cp0 * sl0 + dZ * sp0
      }
      override def inv4(c: Coord): Unit = {
        val x = c.x; val y = c.y; val z = c.z
        c.x = sX0 - x * sl0 - y * sp0 * cl0 + z * cp0 * cl0
        c.y = sY0 + x * cl0 - y * sp0 * sl0 + z * cp0 * sl0
        c.z = sZ0 + y * cp0 + z * sp0
      }
    }
  }
}
