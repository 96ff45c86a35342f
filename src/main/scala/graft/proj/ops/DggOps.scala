package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Discrete-global-grid face projections: Google S2 cube faces (the basis
  * of our cell-index layer) and the quadrilateralized spherical cube.
  * Math per reference src/projections/s2.cpp (public S2 geometry) and
  * src/projections/qsc.cpp (O'Neill & Laubscher 1976). */
object DggOps {
  // face ids (reference s2.cpp:66-73 — same layout in qsc)
  final val FACE_FRONT = 0; final val FACE_RIGHT = 1; final val FACE_TOP = 2
  final val FACE_BACK = 3; final val FACE_LEFT = 4; final val FACE_BOTTOM = 5

  final val LINEAR = 0; final val QUADRATIC = 1; final val TANGENT = 2; final val NONE = 3

  def stToUv(s: Double, typ: Int): Double = typ match {
    case LINEAR => 2 * s - 1
    case QUADRATIC =>
      if (s >= 0.5) (1.0 / 3) * (4 * s * s - 1)
      else (1.0 / 3) * (1 - 4 * (1 - s) * (1 - s))
    case TANGENT =>
      val t = math.tan(HALFPI * s - QUARTERPI)
      t + (1.0 / (1L << 53).toDouble) * t
    case _ => s
  }

  def uvToSt(u: Double, typ: Int): Double = typ match {
    case LINEAR => 0.5 * (u + 1)
    case QUADRATIC =>
      if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
      else 1 - 0.5 * math.sqrt(1 - 3 * u)
    case TANGENT => (2 / math.Pi) * (math.atan(u) + QUARTERPI)
    case _ => u
  }

  /** xyz → (u, v) on a known face (reference ValidFaceXYZtoUV). */
  def validFaceXyzToUv(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }

  /** (face, u, v) → unit-sphere xyz (reference UVtoSphereXYZ). */
  def uvToSphereXyz(face: Int, u: Double, v: Double): (Double, Double, Double) = {
    val major = 1 / math.sqrt(1 + u * u + v * v)
    val m1 = u * major; val m2 = v * major
    face match {
      case 0 => (major, m1, m2)
      case 1 => (-m1, major, m2)
      case 2 => (-m1, -m2, major)
      case 3 => (-major, -m2, -m1)
      case 4 => (m2, -major, -m1)
      case _ => (m2, m1, -major)
    }
  }

  /** Face from the largest-|component| of xyz (reference GetFace). */
  def faceOf(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    var face = if (ax > ay) { if (ax > az) 0 else 2 } else if (ay > az) 1 else 2
    val p = face match { case 0 => x; case 1 => y; case _ => z }
    if (p < 0) face += 3
    face
  }

  private def faceFromCenter(P: PJ): Int = {
    if (P.phi0 >= HALFPI - QUARTERPI / 2) FACE_TOP
    else if (P.phi0 <= -(HALFPI - QUARTERPI / 2)) FACE_BOTTOM
    else if (math.abs(P.lam0) <= QUARTERPI) FACE_FRONT
    else if (math.abs(P.lam0) <= HALFPI + QUARTERPI) {
      if (P.lam0 > 0) FACE_RIGHT else FACE_LEFT
    } else FACE_BACK
  }

  // -------------------------------------------------- s2

  def s2(P: PJ): Unit = {
    val typ = P.params.s("UVtoST") match {
      case Some("linear") => LINEAR
      case Some("quadratic") => QUADRATIC
      case Some("tangent") => TANGENT
      case Some("none") => NONE
      case None => QUADRATIC
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "s2: UVtoST should be linear, quadratic, tangent, or none")
    }
    P.left = IOUnits.RADIANS; P.right = IOUnits.PROJECTED
    // keep absolute longitudes in the kernel (reference: from_greenwich = -lam0)
    P.fromGreenwich = -P.lam0
    val face = faceFromCenter(P)
    val es = P.es; val a = P.a; val b = P.b
    val oneMinusF = 1.0 - (a - b) / a
    val oneMinusF2 = oneMinusF * oneMinusF
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val lat = if (es != 0) math.atan(oneMinusF2 * math.tan(c.y)) else c.y
        val sinlat = math.sin(lat); val coslat = math.cos(lat)
        val x = coslat * math.cos(c.x)
        val y = coslat * math.sin(c.x)
        val z = sinlat
        val (u, v) = validFaceXyzToUv(face, x, y, z)
        c.x = uvToSt(u, typ)
        c.y = uvToSt(v, typ)
      }
      override def inv2(c: Coord): Unit = {
        val u = stToUv(c.x, typ)
        val v = stToUv(c.y, typ)
        val (q, r, s) = uvToSphereXyz(face, u, v)
        var phi = math.acos(-s) - HALFPI
        val lam = math.atan2(r, q)
        if (es != 0) {
          val invert = phi < 0
          val tanphi = math.tan(phi)
          val xa = b / math.sqrt(tanphi * tanphi + oneMinusF2)
          phi = math.atan(math.sqrt(a * a - xa * xa) / (oneMinusF * xa))
          if (invert) phi = -phi
        }
        c.x = lam; c.y = phi
      }
    }
  }

  // -------------------------------------------------- qsc

  def qsc(P: PJ): Unit = {
    val EPS10 = 1e-10
    val PI_HALFPI = math.Pi + HALFPI
    val face = faceFromCenter(P)
    val es = P.es; val a = P.a; val b = P.b
    val oneMinusF = 1.0 - (a - b) / a
    val oneMinusF2 = oneMinusF * oneMinusF

    def shiftLon(lon: Double, offset: Double): Double = {
      var s = lon + offset
      if (s < -math.Pi) s += TWOPI else if (s > math.Pi) s -= TWOPI
      s
    }
    // returns (theta, area)
    def equatFaceTheta(phi: Double, y: Double, x: Double): (Double, Int) = {
      if (phi < EPS10) (0.0, 0)
      else {
        var theta = math.atan2(y, x)
        if (math.abs(theta) <= QUARTERPI) (theta, 0)
        else if (theta > QUARTERPI && theta <= HALFPI + QUARTERPI) (theta - HALFPI, 1)
        else if (theta > HALFPI + QUARTERPI || theta <= -(HALFPI + QUARTERPI))
          (if (theta >= 0) theta - math.Pi else theta + math.Pi, 2)
        else (theta + HALFPI, 3)
      }
    }

    def fwdF(c: Coord): Unit = {
      val lat = if (es != 0) math.atan(oneMinusF2 * math.tan(c.y)) else c.y
      var longitude = c.x
      var phi = 0.0; var theta = 0.0; var area = 0
      if (face == FACE_TOP) {
        phi = HALFPI - lat
        if (longitude >= QUARTERPI && longitude <= HALFPI + QUARTERPI) {
          area = 0; theta = longitude - HALFPI
        } else if (longitude > HALFPI + QUARTERPI || longitude <= -(HALFPI + QUARTERPI)) {
          area = 1; theta = if (longitude > 0) longitude - math.Pi else longitude + math.Pi
        } else if (longitude > -(HALFPI + QUARTERPI) && longitude <= -QUARTERPI) {
          area = 2; theta = longitude + HALFPI
        } else { area = 3; theta = longitude }
      } else if (face == FACE_BOTTOM) {
        phi = HALFPI + lat
        if (longitude >= QUARTERPI && longitude <= HALFPI + QUARTERPI) {
          area = 0; theta = -longitude + HALFPI
        } else if (longitude < QUARTERPI && longitude >= -QUARTERPI) {
          area = 1; theta = -longitude
        } else if (longitude < -QUARTERPI && longitude >= -(HALFPI + QUARTERPI)) {
          area = 2; theta = -longitude - HALFPI
        } else { area = 3; theta = if (longitude > 0) -longitude + math.Pi else -longitude - math.Pi }
      } else {
        if (face == FACE_RIGHT) longitude = shiftLon(longitude, HALFPI)
        else if (face == FACE_BACK) longitude = shiftLon(longitude, math.Pi)
        else if (face == FACE_LEFT) longitude = shiftLon(longitude, -HALFPI)
        val sinlat = math.sin(lat); val coslat = math.cos(lat)
        val sinlon = math.sin(longitude); val coslon = math.cos(longitude)
        val q = coslat * coslon
        val r = coslat * sinlon
        val s = sinlat
        val (ph, th, ar) = face match {
          case FACE_FRONT =>
            val p = math.acos(q); val (t, a0) = equatFaceTheta(p, s, r); (p, t, a0)
          case FACE_RIGHT =>
            val p = math.acos(r); val (t, a0) = equatFaceTheta(p, s, -q); (p, t, a0)
          case FACE_BACK =>
            val p = math.acos(-q); val (t, a0) = equatFaceTheta(p, s, -r); (p, t, a0)
          case FACE_LEFT =>
            val p = math.acos(-r); val (t, a0) = equatFaceTheta(p, s, q); (p, t, a0)
          case _ => (0.0, 0.0, 0)
        }
        phi = ph; theta = th; area = ar
      }
      var mu = math.atan((12.0 / math.Pi) *
        (theta + math.acos(math.sin(theta) * math.cos(QUARTERPI)) - HALFPI))
      val t = math.sqrt((1 - math.cos(phi)) / (math.cos(mu) * math.cos(mu)) /
        (1 - math.cos(math.atan(1.0 / math.cos(theta)))))
      if (area == 1) mu += HALFPI
      else if (area == 2) mu += math.Pi
      else if (area == 3) mu += PI_HALFPI
      c.x = t * math.cos(mu)
      c.y = t * math.sin(mu)
    }

    def invF(c: Coord): Unit = {
      val nu = math.atan(math.sqrt(c.x * c.x + c.y * c.y))
      var mu = math.atan2(c.y, c.x)
      var area = 0
      if (c.x >= 0 && c.x >= math.abs(c.y)) area = 0
      else if (c.y >= 0 && c.y >= math.abs(c.x)) { area = 1; mu -= HALFPI }
      else if (c.x < 0 && -c.x >= math.abs(c.y)) {
        area = 2; mu = if (mu < 0) mu + math.Pi else mu - math.Pi
      } else { area = 3; mu += HALFPI }
      val tt = (math.Pi / 12.0) * math.tan(mu)
      val tantheta = math.sin(tt) / (math.cos(tt) - 1 / math.sqrt(2.0))
      val theta = math.atan(tantheta)
      val cosmu = math.cos(mu)
      val tannu = math.tan(nu)
      var cosphi = 1.0 - cosmu * cosmu * tannu * tannu *
        (1 - math.cos(math.atan(1.0 / math.cos(theta))))
      if (cosphi < -1) cosphi = -1 else if (cosphi > 1) cosphi = 1

      var lam = 0.0; var phiOut = 0.0
      if (face == FACE_TOP) {
        val phi = math.acos(cosphi)
        phiOut = HALFPI - phi
        lam = area match {
          case 0 => theta + HALFPI
          case 1 => if (theta < 0) theta + math.Pi else theta - math.Pi
          case 2 => theta - HALFPI
          case _ => theta
        }
      } else if (face == FACE_BOTTOM) {
        val phi = math.acos(cosphi)
        phiOut = phi - HALFPI
        lam = area match {
          case 0 => -theta + HALFPI
          case 1 => -theta
          case 2 => -theta - HALFPI
          case _ => if (theta < 0) -theta - math.Pi else -theta + math.Pi
        }
      } else {
        var q = cosphi
        var t = q * q
        var s = if (t >= 1) 0.0 else math.sqrt(1 - t) * math.sin(theta)
        t += s * s
        var r = if (t >= 1) 0.0 else math.sqrt(1 - t)
        if (area == 1) { val t2 = r; r = -s; s = t2 }
        else if (area == 2) { r = -r; s = -s }
        else if (area == 3) { val t2 = r; r = s; s = -t2 }
        if (face == FACE_RIGHT) { val t2 = q; q = -r; r = t2 }
        else if (face == FACE_BACK) { q = -q; r = -r }
        else if (face == FACE_LEFT) { val t2 = q; q = r; r = -t2 }
        phiOut = math.acos(-s) - HALFPI
        lam = math.atan2(r, q)
        if (face == FACE_RIGHT) lam = shiftLon(lam, -HALFPI)
        else if (face == FACE_BACK) lam = shiftLon(lam, -math.Pi)
        else if (face == FACE_LEFT) lam = shiftLon(lam, HALFPI)
      }
      if (es != 0) {
        val invert = phiOut < 0
        val tanphi = math.tan(phiOut)
        val xa = b / math.sqrt(tanphi * tanphi + oneMinusF2)
        phiOut = math.atan(math.sqrt(a * a - xa * xa) / (oneMinusF * xa))
        if (invert) phiOut = -phiOut
      }
      c.x = lam; c.y = phiOut
    }

    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = fwdF(c)
      override def inv2(c: Coord): Unit = invF(c)
    }
  }
}
