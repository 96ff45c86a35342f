package graft.proj

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import GeoMath._

/** IO-unit tags — the two-sided "type system" of the dataflow
  * (reference src/proj_internal.h:193-199). */
object IOUnits {
  final val WHATEVER = 0
  final val CLASSIC = 1   // scaled metres (x a), classic proj.4 projected
  final val PROJECTED = 2 // metres, projected
  final val CARTESIAN = 3 // metres, 3D geocentric cartesian
  final val RADIANS = 4
  final val DEGREES = 5
}

/** A kernel in up to three arities. An op implements whichever arities it
  * has and reports them through the caps bitmask; dispatch prefers the
  * highest arity on the 4D path (reference src/fwd.cpp:282-295). All methods
  * mutate the Coord in place, using the reference conventions: 2D kernels
  * read/write (x,y) only, 3D (x,y,z), 4D all. */
abstract class OpKernel extends Serializable {
  def caps: Int
  def fwd2(c: Coord): Unit = ()
  def inv2(c: Coord): Unit = ()
  def fwd3(c: Coord): Unit = ()
  def inv3(c: Coord): Unit = ()
  def fwd4(c: Coord): Unit = ()
  def inv4(c: Coord): Unit = ()
}

object OpKernel {
  final val FWD2 = 1
  final val INV2 = 2
  final val FWD3 = 4
  final val INV3 = 8
  final val FWD4 = 16
  final val INV4 = 32
}

/** One instantiated, parameter-bound coordinate operation — the analogue of
  * the reference's `PJ` / `PJconsts` (src/proj_internal.h:469-698). Fully
  * resolved at plan time on the driver; immutable and Serializable
  * thereafter, so it can ride inside a Catalyst expression to executors. */
final class PJ(val params: ParamList, val shortName: String) extends Serializable {
  // --- ellipsoid constants (reference src/proj_internal.h:550-579) ---
  var a = 0.0; var b = 0.0; var ra = 0.0; var rb = 0.0
  var e = 0.0; var es = 0.0; var e2 = 0.0; var e2s = 0.0
  var e3 = 0.0; var e3s = 0.0
  var oneEs = 0.0; var rOneEs = 0.0
  var f = 0.0; var f2 = 0.0; var n = 0.0
  var rf = Double.PositiveInfinity; var rf2 = Double.PositiveInfinity
  var rn = Double.PositiveInfinity
  var alpha = 0.0
  var aOrig = 0.0; var esOrig = 0.0

  // --- cartographic offsets / scaling (src/proj_internal.h:616-633) ---
  var lam0 = 0.0; var phi0 = 0.0
  var x0 = 0.0; var y0 = 0.0; var z0 = 0.0; var t0 = 0.0
  var k0 = 1.0
  var toMeter = 1.0; var frMeter = 1.0
  var vtoMeter = 1.0; var vfrMeter = 1.0
  var fromGreenwich = 0.0

  // --- flags ---
  var over = false
  var geoc = false
  var isLatlong = false
  var isGeocent = false
  var isLongWrapSet = false; var longWrapCenter = 0.0
  var axis: String = "enu"
  var left: Int = IOUnits.WHATEVER
  var right: Int = IOUnits.WHATEVER
  var needEllps = false
  var skipFwdPrepare = false; var skipFwdFinalize = false
  var skipInvPrepare = false; var skipInvFinalize = false
  /** pipeline-step +inv flag */
  var inverted = false

  /** Sub-operator used by fwd/inv prepare-finalize when is_geocent, and the
    * axisswap sub-op for +axis. */
  var cartSub: PJ = null
  var axisswapSub: PJ = null
  // cs2cs-emulation sub-operations (reference create.cpp:49-200): applied in
  // fwd prepare / inv finalize to make a lone CRS-style op behave as the
  // transformation from the WGS84 hub, like proj_trans does
  var emuHgrid: PJ = null
  var emuVgrid: PJ = null
  var emuHelmert: PJ = null
  var emuCart: PJ = null
  var emuCartWgs84: PJ = null

  var kernel: OpKernel = null

  /** Effective IO units honoring pipeline-step inversion, CLASSIC presented
    * as PROJECTED (reference pj_left/pj_right, src/list.cpp). */
  private def effU(u: Int): Int = if (u == IOUnits.CLASSIC) IOUnits.PROJECTED else u
  def effLeft: Int = effU(if (inverted) right else left)
  def effRight: Int = effU(if (inverted) left else right)

  /** proj_angular_input/output (reference src/4D_api.cpp). */
  def angularInput(forward: Boolean): Boolean =
    (if (forward) effLeft else effRight) == IOUnits.RADIANS
  def angularOutput(forward: Boolean): Boolean = angularInput(!forward)
  def degreeInput(forward: Boolean): Boolean =
    (if (forward) effLeft else effRight) == IOUnits.DEGREES
  def degreeOutput(forward: Boolean): Boolean = degreeInput(!forward)

  /** Geodesic solver on this operation's ellipsoid (reference P->geod). */
  @transient lazy val geod: graft.core.Geodesic = new graft.core.Geodesic(a, f)

  @inline def hasCap(c: Int): Boolean = kernel != null && (kernel.caps & c) != 0
  def hasInverse: Boolean =
    hasCap(OpKernel.INV2) || hasCap(OpKernel.INV3) || hasCap(OpKernel.INV4)
  def hasForward: Boolean =
    hasCap(OpKernel.FWD2) || hasCap(OpKernel.FWD3) || hasCap(OpKernel.FWD4)

  /** pj_calc_ellipsoid_params (reference src/ell_set.cpp:550-632). */
  def calcEllipsoidParams(aIn: Double, esIn: Double): Unit = {
    a = aIn; es = esIn
    if (e == 0) e = math.sqrt(es)
    alpha = math.asin(e)
    e2 = math.tan(alpha); e2s = e2 * e2
    e3 = if (alpha != 0) math.sin(alpha) / math.sqrt(2 - math.sin(alpha) * math.sin(alpha)) else 0.0
    e3s = e3 * e3
    if (f == 0) f = 1 - math.cos(alpha)
    if (!(f >= 0.0 && f < 1.0))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "invalid eccentricity")
    rf = if (f != 0.0) 1.0 / f else Double.PositiveInfinity
    f2 = if (math.cos(alpha) != 0) 1 / math.cos(alpha) - 1 else 0.0
    rf2 = if (f2 != 0.0) 1 / f2 else Double.PositiveInfinity
    n = math.pow(math.tan(alpha / 2), 2)
    rn = if (n != 0.0) 1 / n else Double.PositiveInfinity
    if (b == 0) b = (1 - f) * a
    rb = 1.0 / b
    ra = 1.0 / a
    oneEs = 1.0 - es
    if (oneEs == 0.0)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "invalid eccentricity")
    rOneEs = 1.0 / oneEs
  }
}

/** Geodetic ⇄ geocentric latitude kernel, needed by the generic prepare /
  * finalize wrappers when +geoc is set (reference src/conversions/geoc.cpp:37).
  */
object GeocentricLatitude {
  /** dir = +1 (fwd: geodetic → geocentric), -1 (inv). */
  def convert(P: PJ, forward: Boolean, c: Coord): Unit = {
    // pj_geocentric_latitude, reference src/conversions/geoc.cpp
    val coefficient = if (forward) P.oneEs else P.rOneEs
    val phi = c.y
    if (math.abs(phi) > GeoMath.HALFPI - 1e-10) return // leave poles untouched
    c.y = math.atan(coefficient * math.tan(phi))
  }
}

/** The generic fwd/inv entry points with prepare/finalize semantics,
  * mirroring reference src/fwd.cpp and src/inv.cpp. Only the 4D path is
  * exposed (proj_trans routes everything through pj_fwd4d / pj_inv4d). */
object Dispatch {
  import OpKernel._
  import IOUnits._

  /** proj_trans(P, dir, coord): honours P.inverted. */
  def trans(P: PJ, forward: Boolean, c: Coord): Unit = {
    val fwdEff = if (P.inverted) !forward else forward
    if (fwdEff) fwd4d(P, c) else inv4d(P, c)
  }

  def fwd4d(P: PJ, c: Coord): Unit = {
    val saved = c.err
    c.err = 0
    if (!P.skipFwdPrepare) fwdPrepare(P, c)
    if (c.isError) { c.setError(c.err); return }
    // call the highest-arity transformer available
    if (P.hasCap(FWD4)) P.kernel.fwd4(c)
    else if (P.hasCap(FWD3)) P.kernel.fwd3(c)
    else if (P.hasCap(FWD2)) P.kernel.fwd2(c)
    else { c.setError(ProjErr.OTHER_NO_INVERSE_OP); return }
    if (c.x == Double.PositiveInfinity) { c.setError(c.err); return }
    if (!P.skipFwdFinalize) fwdFinalize(P, c)
    if (c.err != 0) c.setError(c.err) else c.err = saved
  }

  def inv4d(P: PJ, c: Coord): Unit = {
    val saved = c.err
    c.err = 0
    if (!P.skipInvPrepare) invPrepare(P, c)
    if (c.isError) { c.setError(c.err); return }
    if (P.hasCap(INV4)) P.kernel.inv4(c)
    else if (P.hasCap(INV3)) P.kernel.inv3(c)
    else if (P.hasCap(INV2)) P.kernel.inv2(c)
    else { c.setError(ProjErr.OTHER_NO_INVERSE_OP); return }
    if (c.x == Double.PositiveInfinity) {
      // inv_finalize flags bare HUGE_VAL results as domain errors
      // (reference src/inv.cpp:103-110)
      c.setError(if (c.err != 0) c.err else ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
      return
    }
    if (!P.skipInvFinalize) invFinalize(P, c)
    if (c.err != 0) c.setError(c.err) else c.err = saved
  }

  /** reference src/fwd.cpp:40-136 */
  private def fwdPrepare(P: PJ, c: Coord): Unit = {
    if (P.left == RADIANS) {
      // angular range checks
      if (math.abs(c.y) > HALFPI) {
        if (c.x == Double.PositiveInfinity || c.y == Double.PositiveInfinity) {
          c.setError(ProjErr.COORD_TRANSFM_INVALID_COORD); return
        }
        if (c.y > 0) {
          if (c.y - HALFPI > EPS_LAT) { c.setError(ProjErr.COORD_TRANSFM_INVALID_COORD); return }
          c.y = HALFPI
        } else {
          if (c.y + HALFPI < -EPS_LAT) { c.setError(ProjErr.COORD_TRANSFM_INVALID_COORD); return }
          c.y = -HALFPI
        }
      }
      if (math.abs(c.x) > math.Pi) {
        if (math.abs(c.x) > 10) { c.setError(ProjErr.COORD_TRANSFM_INVALID_COORD); return }
        if (!P.over) c.x = adjlon(c.x)
      }
      if (c.z == Double.PositiveInfinity) { c.setError(ProjErr.COORD_TRANSFM_INVALID_COORD); return }
      if (P.geoc) GeocentricLatitude.convert(P, forward = false, c)
      // legacy cs2cs emulation: step from the WGS84 hub into the local frame
      // (reference src/fwd.cpp:94-113)
      if (P.emuHgrid != null) {
        trans(P.emuHgrid, forward = false, c)
        if (c.x == Double.PositiveInfinity) return
      } else if (P.emuHelmert != null || (P.emuCartWgs84 != null && P.emuCart != null)) {
        if (c.z == Double.PositiveInfinity) c.z = 0
        if (c.t == Double.PositiveInfinity) c.t = 0
        trans(P.emuCartWgs84, forward = true, c)
        if (P.emuHelmert != null) trans(P.emuHelmert, forward = false, c)
        trans(P.emuCart, forward = false, c)
        if (c.x == Double.PositiveInfinity) return
      }
      if (P.emuVgrid != null) {
        trans(P.emuVgrid, forward = true, c)
        if (c.x == Double.PositiveInfinity) return
      }
      c.x = (c.x - P.fromGreenwich) - P.lam0
      if (!P.over) c.x = adjlon(c.x)
      return
    }
    if (c.x == Double.PositiveInfinity || c.y == Double.PositiveInfinity ||
        c.z == Double.PositiveInfinity) {
      c.setError(ProjErr.COORD_TRANSFM_INVALID_COORD); return
    }
  }

  /** reference src/fwd.cpp:138-189 */
  private def fwdFinalize(P: PJ, c: Coord): Unit = {
    P.right match {
      case CARTESIAN =>
        if (P.isGeocent && P.cartSub != null) trans(P.cartSub, forward = true, c)
        c.x *= P.frMeter; c.y *= P.frMeter; c.z *= P.frMeter
      case CLASSIC | PROJECTED =>
        if (P.right == CLASSIC) { c.x *= P.a; c.y *= P.a }
        c.x = P.frMeter * (c.x + P.x0)
        c.y = P.frMeter * (c.y + P.y0)
        c.z = P.vfrMeter * (c.z + P.z0)
      case RADIANS =>
        c.z = P.vfrMeter * (c.z + P.z0)
        if (P.isLongWrapSet && c.x != Double.PositiveInfinity)
          c.x = P.longWrapCenter + adjlon(c.x - P.longWrapCenter)
      case _ => ()
    }
    if (P.axisswapSub != null) trans(P.axisswapSub, forward = true, c)
  }

  /** reference src/inv.cpp:39-101 */
  private def invPrepare(P: PJ, c: Coord): Unit = {
    if (c.x == Double.PositiveInfinity || c.y == Double.PositiveInfinity ||
        c.z == Double.PositiveInfinity) {
      c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return
    }
    if (P.axisswapSub != null) trans(P.axisswapSub, forward = false, c)
    P.right match {
      case CARTESIAN =>
        c.x *= P.toMeter; c.y *= P.toMeter; c.z *= P.toMeter
        if (P.isGeocent && P.cartSub != null) trans(P.cartSub, forward = false, c)
      case PROJECTED | CLASSIC =>
        c.x = P.toMeter * c.x - P.x0
        c.y = P.toMeter * c.y - P.y0
        c.z = P.vtoMeter * c.z - P.z0
        if (P.right == CLASSIC) { c.x *= P.ra; c.y *= P.ra }
      case RADIANS =>
        c.z = P.vtoMeter * c.z - P.z0
      case _ => ()
    }
  }

  /** reference src/inv.cpp:103-143 */
  private def invFinalize(P: PJ, c: Coord): Unit = {
    if (c.x == Double.PositiveInfinity)
      { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
    if (P.left == RADIANS) {
      c.x = c.x + P.fromGreenwich + P.lam0
      if (!P.over) c.x = adjlon(c.x)
      // legacy cs2cs emulation: step from the local frame back to the WGS84
      // hub (reference src/inv.cpp:120-143)
      if (P.emuVgrid != null) {
        trans(P.emuVgrid, forward = false, c)
        if (c.x == Double.PositiveInfinity) return
      }
      if (P.emuHgrid != null) {
        trans(P.emuHgrid, forward = true, c)
        if (c.x == Double.PositiveInfinity) return
      } else if (P.emuHelmert != null || (P.emuCartWgs84 != null && P.emuCart != null)) {
        if (c.z == Double.PositiveInfinity) c.z = 0
        if (c.t == Double.PositiveInfinity) c.t = 0
        trans(P.emuCart, forward = true, c)
        if (P.emuHelmert != null) trans(P.emuHelmert, forward = true, c)
        trans(P.emuCartWgs84, forward = false, c)
        if (c.x == Double.PositiveInfinity) return
      }
      if (P.geoc) GeocentricLatitude.convert(P, forward = true, c)
    }
  }
}
