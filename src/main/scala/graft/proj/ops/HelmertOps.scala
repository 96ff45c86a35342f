package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import OpKernel._

/** Helmert 3/4/7-parameter + 14-param kinematic shifts and the
  * Molodensky-Badekas variant.
  *
  * Semantics per reference src/transformations/helmert.cpp:55-770. The
  * rotation matrix is the z-y-x intrinsic Euler form (coordinate_frame
  * convention), transposed for position_vector; small-angle approximation is
  * the default, +exact switches to full trig. 14-parameter kinematic form
  * projects parameters linearly in (t - t_epoch) — since t is a per-row
  * column in our engine, the matrix is rebuilt per distinct epoch with no
  * shared mutable cache (thread-safety over the micro-optimization of the
  * reference's single-threaded t_obs cache).
  */
object HelmertOps {
  private final val ARCSEC_TO_RAD = GeoMath.DEG2RAD / 3600.0

  final class Params(
      val x0: Double, val y0: Double, val z0: Double,
      val rx0: Double, val ry0: Double, val rz0: Double,
      val s0: Double, val theta0: Double,
      val dx: Double, val dy: Double, val dz: Double,
      val drx: Double, val dry: Double, val drz: Double,
      val ds: Double, val dtheta: Double,
      val tEpoch: Double,
      val exact: Boolean, val isPositionVector: Boolean,
      val fourparam: Boolean,
      val refpX: Double, val refpY: Double, val refpZ: Double
  ) extends Serializable {
    val noRotation: Boolean =
      rx0 == 0 && ry0 == 0 && rz0 == 0 && drx == 0 && dry == 0 && drz == 0
    val isKinematic: Boolean =
      dx != 0 || dy != 0 || dz != 0 || drx != 0 || dry != 0 || drz != 0 ||
        ds != 0 || dtheta != 0

    /** Build the 3x3 rotation matrix for epoch-interpolated angles
      * (reference helmert.cpp:161-313). Returns a flat 9-array row-major. */
    def rotMatrix(rx: Double, ry: Double, rz: Double): Array[Double] = {
      val m = new Array[Double](9)
      if (exact) {
        val cf = math.cos(rx); val sf = math.sin(rx)
        val ct = math.cos(ry); val st = math.sin(ry)
        val cp = math.cos(rz); val sp = math.sin(rz)
        m(0) = ct * cp; m(1) = cf * sp + sf * st * cp; m(2) = sf * sp - cf * st * cp
        m(3) = -ct * sp; m(4) = cf * cp - sf * st * sp; m(5) = sf * cp + cf * st * sp
        m(6) = st; m(7) = -sf * ct; m(8) = cf * ct
      } else {
        m(0) = 1; m(1) = rz; m(2) = -ry
        m(3) = -rz; m(4) = 1; m(5) = rx
        m(6) = ry; m(7) = -rx; m(8) = 1
      }
      if (isPositionVector) {
        var t = m(1); m(1) = m(3); m(3) = t
        t = m(2); m(2) = m(6); m(6) = t
        t = m(5); m(5) = m(7); m(7) = t
      }
      m
    }
  }

  private def readConvention(p: ParamList, noRot: Boolean,
                             requireAlways: Boolean): Boolean = {
    if (noRot && !requireAlways) return false
    p.s("convention") match {
      case Some("position_vector") => true
      case Some("coordinate_frame") =>
        if (p.has("towgs84"))
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
            "helmert: towgs84 should only be used with convention=position_vector")
        false
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "helmert: invalid value for 'convention'")
      case None => throw ProjError(ProjErr.INVALID_OP_MISSING_ARG,
        "helmert: missing 'convention' argument")
    }
  }

  private def readCommon(P: PJ, conventionAlways: Boolean = false): Params = {
    val p = P.params
    val exact = p.b("exact")
    val fourparam = p.has("theta")
    // classic +towgs84=x,y,z[,rx,ry,rz,s] (reference helmert.cpp:588-603
    // + pj_datum_set semantics: rotations in arcsec, scale in ppm)
    val tw: Array[Double] = p.s("towgs84") match {
      case Some(v) =>
        val parts = v.split(",").map(s => { val x = NumParse.atof(s); if (x.isNaN) 0.0 else x })
        if (parts.length != 3 && parts.length != 7)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "helmert: malformed towgs84")
        parts.padTo(7, 0.0)
      case None => null
    }
    def d(key: String, twIdx: Int, scale: Double = 1.0): Double =
      if (p.has(key)) p.d(key) * scale
      else if (tw != null && twIdx >= 0) tw(twIdx) * scale
      else 0.0
    val rx0 = d("rx", 3, ARCSEC_TO_RAD)
    val ry0 = d("ry", 4, ARCSEC_TO_RAD)
    val rz0 = d("rz", 5, ARCSEC_TO_RAD)
    val noRot = rx0 == 0 && ry0 == 0 && rz0 == 0 &&
      p.d("drx") == 0 && p.d("dry") == 0 && p.d("drz") == 0
    val isPositionVector = readConvention(p, noRot, conventionAlways)
    var s0 = if (fourparam) 1.0 else d("s", 6)
    if (p.has("s")) {
      s0 = p.d("s")
      if (s0 <= -1.0e6 || (fourparam && s0 == 0.0))
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "helmert: invalid value for s")
    }
    new Params(
      d("x", 0), d("y", 1), d("z", 2),
      rx0, ry0, rz0,
      s0, p.d("theta") * ARCSEC_TO_RAD,
      p.d("dx"), p.d("dy"), p.d("dz"),
      p.d("drx") * ARCSEC_TO_RAD, p.d("dry") * ARCSEC_TO_RAD, p.d("drz") * ARCSEC_TO_RAD,
      p.d("ds"), p.d("dtheta") * ARCSEC_TO_RAD,
      p.d("t_epoch"),
      exact, isPositionVector, fourparam,
      p.d("px"), p.d("py"), p.d("pz"))
  }

  /** Shared 3D kernel (reference helmert_forward_3d / helmert_reverse_3d,
    * helmert.cpp:362-436) for one epoch's interpolated parameter set. */
  private final class HelmertKernel(hp: Params, useRefp: Boolean) extends OpKernel {
    val caps = FWD4 | INV4
    private val staticR: Array[Double] =
      if (hp.isKinematic) null else hp.rotMatrix(hp.rx0, hp.ry0, hp.rz0)

    // interpolate params to the observation epoch; dt = 0 for the static case
    @inline private def run(c: Coord, forward: Boolean): Unit = {
      val tObs = if (c.t == Double.PositiveInfinity) hp.tEpoch else c.t
      val dt = if (hp.isKinematic) tObs - hp.tEpoch else 0.0
      val tx = hp.x0 + hp.dx * dt
      val ty = hp.y0 + hp.dy * dt
      val tz = hp.z0 + hp.dz * dt
      val sRaw = hp.s0 + hp.ds * dt
      val theta = hp.theta0 + hp.dtheta * dt

      if (hp.fourparam) {
        // 2D Helmert with rotation angle theta (helmert.cpp:324-359)
        if (forward) {
          val cr = math.cos(theta) * sRaw
          val sr = math.sin(theta) * sRaw
          val x = c.x; val y = c.y
          c.x = cr * x + sr * y + tx
          c.y = -sr * x + cr * y + ty
        } else {
          val cr = math.cos(theta) / sRaw
          val sr = math.sin(theta) / sRaw
          val x = c.x - tx; val y = c.y - ty
          c.x = x * cr - y * sr
          c.y = x * sr + y * cr
        }
        return
      }

      if (hp.noRotation && sRaw == 0) {
        if (forward) { c.x += tx; c.y += ty; c.z += tz }
        else { c.x -= tx; c.y -= ty; c.z -= tz }
        return
      }

      val m = if (staticR != null) staticR
        else hp.rotMatrix(hp.rx0 + hp.drx * dt, hp.ry0 + hp.dry * dt, hp.rz0 + hp.drz * dt)
      val scale = 1 + sRaw * 1e-6
      if (forward) {
        val x = c.x - hp.refpX
        val y = c.y - hp.refpY
        val z = c.z - hp.refpZ
        c.x = scale * (m(0) * x + m(1) * y + m(2) * z) + tx
        c.y = scale * (m(3) * x + m(4) * y + m(5) * z) + ty
        c.z = scale * (m(6) * x + m(7) * y + m(8) * z) + tz
      } else {
        val x = (c.x - tx) / scale
        val y = (c.y - ty) / scale
        val z = (c.z - tz) / scale
        c.x = (m(0) * x + m(3) * y + m(6) * z) + hp.refpX
        c.y = (m(1) * x + m(4) * y + m(7) * z) + hp.refpY
        c.z = (m(2) * x + m(5) * y + m(8) * z) + hp.refpZ
      }
    }
    override def fwd4(c: Coord): Unit = run(c, forward = true)
    override def inv4(c: Coord): Unit = run(c, forward = false)
  }

  /** helmert (reference helmert.cpp:556-697). */
  def helmert(P: PJ): Unit = {
    if (P.params.b("transpose"))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "helmert: 'transpose' argument is no longer valid")
    val hp = readCommon(P)
    if (hp.fourparam) { P.left = IOUnits.PROJECTED; P.right = IOUnits.PROJECTED }
    else { P.left = IOUnits.CARTESIAN; P.right = IOUnits.CARTESIAN }
    P.kernel = new HelmertKernel(hp, useRefp = false)
  }

  /** molobadekas — Helmert about a reference point px/py/pz
    * (reference helmert.cpp:699-770); refp folded into the translation for
    * the forward direction exactly as the reference does. */
  def molobadekas(P: PJ): Unit = {
    val p = P.params
    // molobadekas requires an explicit convention even with zero rotation
    // (reference helmert.cpp:712-718: no_rotation is never set on this path)
    val raw = readCommon(P, conventionAlways = true)
    // reference folds refp into xyz_0 (translation) after reading params
    val hp = new Params(
      raw.x0 + raw.refpX, raw.y0 + raw.refpY, raw.z0 + raw.refpZ,
      raw.rx0, raw.ry0, raw.rz0, raw.s0, 0.0,
      0, 0, 0, 0, 0, 0, 0, 0, 0.0,
      raw.exact, raw.isPositionVector, fourparam = false,
      raw.refpX, raw.refpY, raw.refpZ)
    P.left = IOUnits.CARTESIAN; P.right = IOUnits.CARTESIAN
    P.kernel = new HelmertKernel(hp, useRefp = true)
  }
}
