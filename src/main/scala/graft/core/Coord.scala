package graft.core

/** Mutable 4-component coordinate workspace — the single datum flowing
  * through every kernel, mirroring the reference's `PJ_COORD` union
  * ("just 4 numbers in a vector", reference src/proj.h:315-330).
  *
  * One instance is allocated per thread / per partition and reused row to
  * row; kernels mutate it in place. The meaning of (x, y) depends on the
  * operator's IO-unit tags: radians (lam, phi), metres (easting, northing),
  * or geocentric cartesian metres. `z` is ellipsoidal height / Z, `t` an
  * epoch in decimal years.
  *
  * Error sentinel: all four components become +Infinity (the reference's
  * HUGE_VAL convention, src/fwd.cpp:48-56) and `err` carries the errno.
  */
final class Coord extends Serializable {
  var x: Double = 0.0
  var y: Double = 0.0
  var z: Double = 0.0
  var t: Double = 0.0
  /** Last error (ProjErr.*); 0 = ok. Mirrors the per-thread context errno. */
  var err: Int = 0

  /** Per-pipeline push/pop stacks (reference src/pipeline.cpp:135-140).
    * Lazily allocated by the pipeline op only when push/pop steps exist. */
  var stacks: Array[Array[Double]] = null
  var stackTop: Array[Int] = null

  @inline def set(x0: Double, y0: Double, z0: Double, t0: Double): this.type = {
    x = x0; y = y0; z = z0; t = t0; err = 0; this
  }

  @inline def isError: Boolean = x == Double.PositiveInfinity

  /** proj_coord_error(): poison all components. */
  @inline def setError(errno: Int): Unit = {
    x = Double.PositiveInfinity
    y = Double.PositiveInfinity
    z = Double.PositiveInfinity
    t = Double.PositiveInfinity
    if (err == 0) err = errno
  }

  def copyFrom(o: Coord): Unit = { x = o.x; y = o.y; z = o.z; t = o.t; err = o.err }

  // --- pipeline push/pop stacks, one per component -------------------------
  @inline private def ensureStacks(): Unit =
    if (stacks == null) {
      stacks = Array.fill(4)(new Array[Double](4))
      stackTop = new Array[Int](4)
    }

  def resetStacks(): Unit = if (stackTop != null) java.util.Arrays.fill(stackTop, 0)

  @inline private def component(i: Int): Double =
    i match { case 0 => x; case 1 => y; case 2 => z; case _ => t }
  @inline private def setComponent(i: Int, v: Double): Unit =
    i match { case 0 => x = v; case 1 => y = v; case 2 => z = v; case _ => t = v }

  /** push selected components (reference src/pipeline.cpp:641-664). */
  def pushComponents(flags: Array[Boolean]): Unit = {
    ensureStacks()
    var i = 0
    while (i < 4) {
      if (flags(i)) {
        var s = stacks(i)
        if (stackTop(i) == s.length) {
          s = java.util.Arrays.copyOf(s, s.length * 2); stacks(i) = s
        }
        s(stackTop(i)) = component(i)
        stackTop(i) += 1
      }
      i += 1
    }
  }

  /** pop selected components if non-empty (reference src/pipeline.cpp:666-693). */
  def popComponents(flags: Array[Boolean]): Unit = {
    if (stackTop == null) return
    var i = 0
    while (i < 4) {
      if (flags(i) && stackTop(i) > 0) {
        stackTop(i) -= 1
        setComponent(i, stacks(i)(stackTop(i)))
      }
      i += 1
    }
  }

  override def toString: String = s"Coord($x, $y, $z, $t, err=$err)"
}

/** Error taxonomy, value-identical to the reference's PROJ_ERR_* constants
  * (reference src/proj.h:715-766) so gie `expect failure errno <name>`
  * asserts map 1:1. */
object ProjErr {
  final val INVALID_OP = 1024
  final val INVALID_OP_WRONG_SYNTAX = INVALID_OP + 1
  final val INVALID_OP_MISSING_ARG = INVALID_OP + 2
  final val INVALID_OP_ILLEGAL_ARG_VALUE = INVALID_OP + 3
  final val INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS = INVALID_OP + 4
  final val INVALID_OP_FILE_NOT_FOUND_OR_INVALID = INVALID_OP + 5
  final val COORD_TRANSFM = 2048
  final val COORD_TRANSFM_INVALID_COORD = COORD_TRANSFM + 1
  final val COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN = COORD_TRANSFM + 2
  final val COORD_TRANSFM_NO_OPERATION = COORD_TRANSFM + 3
  final val COORD_TRANSFM_OUTSIDE_GRID = COORD_TRANSFM + 4
  final val COORD_TRANSFM_GRID_AT_NODATA = COORD_TRANSFM + 5
  final val COORD_TRANSFM_NO_CONVERGENCE = COORD_TRANSFM + 6
  final val COORD_TRANSFM_MISSING_TIME = COORD_TRANSFM + 7
  final val OTHER = 4096
  final val OTHER_API_MISUSE = OTHER + 1
  final val OTHER_NO_INVERSE_OP = OTHER + 2
  final val OTHER_NETWORK_ERROR = OTHER + 3

  /** gie errno-name → code (lower_snake names as used in gie files). */
  val byName: Map[String, Int] = Map(
    "invalid_op" -> INVALID_OP,
    "invalid_op_wrong_syntax" -> INVALID_OP_WRONG_SYNTAX,
    "invalid_op_missing_arg" -> INVALID_OP_MISSING_ARG,
    "invalid_op_illegal_arg_value" -> INVALID_OP_ILLEGAL_ARG_VALUE,
    "invalid_op_mutually_exclusive_args" -> INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS,
    "invalid_op_file_not_found_or_invalid" -> INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
    "coord_transfm" -> COORD_TRANSFM,
    "coord_transfm_invalid_coord" -> COORD_TRANSFM_INVALID_COORD,
    "coord_transfm_outside_projection_domain" -> COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN,
    "coord_transfm_no_operation" -> COORD_TRANSFM_NO_OPERATION,
    "coord_transfm_outside_grid" -> COORD_TRANSFM_OUTSIDE_GRID,
    "coord_transfm_grid_at_nodata" -> COORD_TRANSFM_GRID_AT_NODATA,
    "coord_transfm_no_convergence" -> COORD_TRANSFM_NO_CONVERGENCE,
    "coord_transfm_missing_time" -> COORD_TRANSFM_MISSING_TIME,
    "other" -> OTHER,
    "other_api_misuse" -> OTHER_API_MISUSE,
    "other_no_inverse_op" -> OTHER_NO_INVERSE_OP,
    "other_network_error" -> OTHER_NETWORK_ERROR
  )
}

/** Thrown by operator setup (plan time, on the driver) — the analogue of a
  * failed proj_create. Never thrown per row. */
final case class ProjError(errno: Int, msg: String)
    extends RuntimeException(s"[$errno] $msg")
