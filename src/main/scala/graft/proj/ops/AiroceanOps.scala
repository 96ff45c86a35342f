package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Fuller Airocean (Dymaxion) projection.
  *
  * Semantics per reference src/projections/airocean.cpp:718-780 (forward
  * :718-763, inverse :766-817, setup :819-847): gnomonic projection onto the
  * face planes of a 23-face altered icosahedron (Australia split in 2, Japan
  * in 3), then a per-face rigid map into the unfolded net.
  *
  * Unlike the reference, which embeds pre-generated constant tables
  * (produced by its scripts/build_airocean_parameters.py), we derive all
  * tables at setup from the minimal public data: Gray (1995) "Exact
  * Transformation Equations for Fuller's World Map" icosahedron vertices,
  * the face vertex index lists, and the net layout on its triangular grid.
  * Face centers are vertex centroids, normals are the (outward) face-plane
  * cross products, and the per-face affine maps are solved from the
  * four point correspondences {p1,p2,p3,p1+n} -> {q1,q2,q3,q1+e_z}; this
  * reproduces the reference tables to ~4e-15 (verified offline), i.e.
  * sub-micrometre at Earth scale.
  */
object AiroceanOps {

  /** Gray's 12 icosahedron vertices (unit sphere) + 2 split points:
    * v12 = midpoint(v7, v11) (Australia split), v13 = centroid(v8, v7, v3)
    * (Japan split) — both unnormalized (they live on the face planes). */
  private val V: Array[Array[Double]] = {
    val base = Array(
      Array(0.42015242670871, 0.07814524940278296, 0.9040825506150193),
      Array(0.5188367303273644, 0.8354203803782358, 0.18133183755726245),
      Array(0.9950094394362416, -0.09134779527642793, 0.040147175877166645),
      Array(-0.4146822253203352, 0.6559624054348008, 0.6306758078914754),
      Array(-0.5154559599440418, -0.381716898287133, 0.7672009925177475),
      Array(0.3557814025329447, -0.8435800024661781, 0.40223422660292557),
      Array(0.5154559599440418, 0.381716898287133, -0.7672009925177475),
      Array(-0.3557814025329447, 0.8435800024661781, -0.40223422660292557),
      Array(-0.9950094394362416, 0.09134779527642793, -0.040147175877166645),
      Array(-0.5188367303273644, -0.8354203803782358, -0.18133183755726245),
      Array(0.4146822253203352, -0.6559624054348008, -0.6306758078914754),
      Array(-0.42015242670871, -0.07814524940278296, -0.9040825506150193))
    val v12 = Array.tabulate(3)(i => (base(7)(i) + base(11)(i)) / 2)
    val v13 = Array.tabulate(3)(i => (base(8)(i) + base(7)(i) + base(3)(i)) / 3)
    base :+ v12 :+ v13
  }

  /** The 23 faces as vertex index triples, in the reference's search order. */
  private val F: Array[Array[Int]] = Array(
    Array(0, 1, 2), Array(0, 3, 1), Array(0, 4, 3), Array(0, 5, 4),
    Array(0, 2, 5), Array(2, 1, 6), Array(6, 1, 7), Array(7, 1, 3),
    Array(4, 8, 3), Array(4, 9, 8), Array(4, 5, 9), Array(9, 5, 10),
    Array(10, 5, 2), Array(6, 10, 2), Array(11, 7, 8), Array(11, 8, 9),
    Array(11, 9, 10), Array(11, 10, 6), Array(7, 12, 6), Array(11, 6, 12),
    Array(8, 7, 13), Array(7, 3, 13), Array(8, 13, 3))

  /** Net positions of each face's 3 vertices on the triangular grid:
    * x in units of h/6 (h = triangle height), y in units of s/4
    * (s = icosahedron edge = 2/sqrt(1+phi^2) for the unit sphere). */
  private val NET: Array[Array[Int]] = Array(
    Array(12, 12, 12, 16, 18, 14), Array(12, 12, 6, 14, 12, 16),
    Array(12, 12, 6, 10, 6, 14), Array(12, 12, 12, 8, 6, 10),
    Array(12, 12, 18, 14, 18, 10), Array(18, 14, 12, 16, 18, 18),
    Array(12, 20, 12, 16, 6, 18), Array(6, 18, 12, 16, 6, 14),
    Array(6, 10, 0, 12, 6, 14), Array(6, 10, 6, 6, 0, 8),
    Array(6, 10, 12, 8, 6, 6), Array(6, 6, 12, 8, 12, 4),
    Array(12, 4, 12, 8, 18, 6), Array(12, 0, 12, 4, 18, 2),
    Array(0, 20, 6, 18, 0, 16), Array(0, 4, 0, 8, 6, 6),
    Array(6, 2, 6, 6, 12, 4), Array(6, 2, 12, 4, 12, 0),
    Array(6, 18, 3, 19, 6, 22), Array(6, 2, 12, 0, 6, 0),
    Array(0, 16, 6, 18, 4, 16), Array(6, 18, 6, 14, 4, 16),
    Array(0, 12, 2, 14, 6, 14))

  private val EDGE = 2 * 0.5257311121191336 // icosahedron edge, unit sphere
  private val HX = EDGE * math.sqrt(3.0) / 2 / 6 // net grid unit in x
  private val HY = EDGE / 4 // net grid unit in y
  private val NET_HEIGHT = 22 * HY // net extent for orient=horizontal

  // ---------------- small dense linear algebra ----------------

  private def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val r = Array.ofDim[Double](4, 4)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        r(i)(j) = a(i)(0) * b(0)(j) + a(i)(1) * b(1)(j) + a(i)(2) * b(2)(j) + a(i)(3) * b(3)(j)
        j += 1
      }
      i += 1
    }
    r
  }

  /** Gauss-Jordan inverse with partial pivoting (4x4). */
  private def matInv(m: Array[Array[Double]]): Array[Array[Double]] = {
    val a = Array.tabulate(4, 8)((i, j) => if (j < 4) m(i)(j) else if (j - 4 == i) 1.0 else 0.0)
    var col = 0
    while (col < 4) {
      var piv = col
      var r = col + 1
      while (r < 4) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      val t = a(col); a(col) = a(piv); a(piv) = t
      val d = a(col)(col)
      var j = 0
      while (j < 8) { a(col)(j) /= d; j += 1 }
      r = 0
      while (r < 4) {
        if (r != col) {
          val f = a(r)(col)
          if (f != 0) { var j = 0; while (j < 8) { a(r)(j) -= f * a(col)(j); j += 1 } }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(4, 4)((i, j) => a(i)(j + 4))
  }

  private final class Tables(orientH: Boolean) {
    val faces = Array.tabulate(23, 3)((f, k) => V(F(f)(k))) // 3D face vertices
    val centers = Array.tabulate(23)(f =>
      Array.tabulate(3)(i => (faces(f)(0)(i) + faces(f)(1)(i) + faces(f)(2)(i)) / 3))
    val normals = Array.tabulate(23) { f =>
      val p1 = faces(f)(0); val p2 = faces(f)(1); val p3 = faces(f)(2)
      val ux = p2(0) - p1(0); val uy = p2(1) - p1(1); val uz = p2(2) - p1(2)
      val vx = p3(0) - p1(0); val vy = p3(1) - p1(1); val vz = p3(2) - p1(2)
      var nx = uy * vz - uz * vy; var ny = uz * vx - ux * vz; var nz = ux * vy - uy * vx
      val nrm = math.sqrt(nx * nx + ny * ny + nz * nz)
      nx /= nrm; ny /= nrm; nz /= nrm
      val c = centers(f)
      if (nx * c(0) + ny * c(1) + nz * c(2) < 0) { nx = -nx; ny = -ny; nz = -nz }
      Array(nx, ny, nz)
    }
    // 2D net face vertices, homogeneous (x, y, 1)
    val netFaces = Array.tabulate(23, 3) { (f, k) =>
      Array(NET(f)(2 * k) * HX, NET(f)(2 * k + 1) * HY, 1.0)
    }
    // per-face affine: solve M * [p1 p2 p3 p1+n] = [q1 q2 q3 q1+ez] (homog)
    val fwdM = Array.ofDim[Array[Array[Double]]](23)
    val invM = Array.ofDim[Array[Array[Double]]](23)
    locally {
      var f = 0
      while (f < 23) {
        val p = Array.ofDim[Double](4, 4); val q = Array.ofDim[Double](4, 4)
        var k = 0
        while (k < 3) {
          var i = 0
          while (i < 3) { p(i)(k) = faces(f)(k)(i); i += 1 }
          p(3)(k) = 1
          q(0)(k) = netFaces(f)(k)(0); q(1)(k) = netFaces(f)(k)(1); q(2)(k) = 0; q(3)(k) = 1
          k += 1
        }
        var i = 0
        while (i < 3) { p(i)(3) = faces(f)(0)(i) + normals(f)(i); i += 1 }
        p(3)(3) = 1
        q(0)(3) = netFaces(f)(0)(0); q(1)(3) = netFaces(f)(0)(1); q(2)(3) = 1; q(3)(3) = 1
        fwdM(f) = matMul(q, matInv(p))
        invM(f) = matMul(p, matInv(q))
        f += 1
      }
      if (orientH) {
        // rotate the net 90deg: (x,y) -> (H-y, x), H = net height
        val m = Array(
          Array(0.0, -1.0, 0.0, NET_HEIGHT), Array(1.0, 0.0, 0.0, 0.0),
          Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
        val mInv = Array(
          Array(0.0, 1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0, NET_HEIGHT),
          Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
        var f = 0
        while (f < 23) {
          fwdM(f) = matMul(m, fwdM(f))
          invM(f) = matMul(invM(f), mInv)
          var k = 0
          while (k < 3) {
            val v = netFaces(f)(k)
            val x = m(0)(0) * v(0) + m(0)(1) * v(1) + m(0)(2) * v(2) + m(0)(3)
            val y = m(1)(0) * v(0) + m(1)(1) * v(1) + m(1)(2) * v(2) + m(1)(3)
            netFaces(f)(k) = Array(x, y, 1.0)
            k += 1
          }
          f += 1
        }
      }
    }
  }

  @inline private def det3(ux: Double, uy: Double, uz: Double,
                           vx: Double, vy: Double, vz: Double,
                           wx: Double, wy: Double, wz: Double): Double =
    ux * (vy * wz - vz * wy) - vx * (uy * wz - uz * wy) + wx * (uy * vz - uz * vy)

  @inline private def inFace(px: Double, py: Double, pz: Double,
                             p1: Array[Double], p2: Array[Double], p3: Array[Double]): Boolean =
    det3(px, py, pz, p2(0), p2(1), p2(2), p3(0), p3(1), p3(2)) <= 0 &&
      det3(p1(0), p1(1), p1(2), px, py, pz, p3(0), p3(1), p3(2)) <= 0 &&
      det3(p1(0), p1(1), p1(2), p2(0), p2(1), p2(2), px, py, pz) <= 0

  def airocean(P: PJ): Unit = {
    val orientH = P.params.s("orient") match {
      case Some("horizontal") => true
      case Some("vertical") | None => false
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "airocean: orient must be vertical or horizontal")
    }
    val T = new Tables(orientH)
    val es = P.es
    val oneMinusF = 1.0 - (P.a - P.b) / P.a
    val omf2 = oneMinusF * oneMinusF
    val a2 = P.a * P.a
    val bEll = P.b; val aEll = P.a

    P.kernel = new OpKernel {
      val caps = FWD2 | INV2

      override def fwd2(c: Coord): Unit = {
        val lat = if (es != 0) math.atan(omf2 * math.tan(c.y)) else c.y
        val coslat = math.cos(lat)
        val px = coslat * math.cos(c.x)
        val py = coslat * math.sin(c.x)
        val pz = math.sin(lat)
        var face = -1
        var i = 0
        while (i < 23 && face < 0) {
          if (inFace(px, py, pz, T.faces(i)(0), T.faces(i)(1), T.faces(i)(2))) face = i
          i += 1
        }
        if (face < 0) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        // gnomonic onto the face plane: p * (c.n)/(p.n)
        val n = T.normals(face); val ctr = T.centers(face)
        val scale = (ctr(0) * n(0) + ctr(1) * n(1) + ctr(2) * n(2)) /
          (px * n(0) + py * n(1) + pz * n(2))
        val ix = px * scale; val iy = py * scale; val iz = pz * scale
        val m = T.fwdM(face)
        c.x = m(0)(0) * ix + m(0)(1) * iy + m(0)(2) * iz + m(0)(3)
        c.y = m(1)(0) * ix + m(1)(1) * iy + m(1)(2) * iz + m(1)(3)
      }

      override def inv2(c: Coord): Unit = {
        val x = c.x; val y = c.y
        var face = -1
        var i = 0
        while (i < 23 && face < 0) {
          if (inFace(x, y, 1.0, T.netFaces(i)(0), T.netFaces(i)(1), T.netFaces(i)(2))) face = i
          i += 1
        }
        if (face < 0) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN); return }
        val m = T.invM(face)
        // net z is implicitly 0 on the face plane: skip the z column
        val sx = m(0)(0) * x + m(0)(1) * y + m(0)(3)
        val sy = m(1)(0) * x + m(1)(1) * y + m(1)(3)
        val sz = m(2)(0) * x + m(2)(1) * y + m(2)(3)
        val nrm = math.sqrt(sx * sx + sy * sy + sz * sz)
        var phi = math.acos(-sz / nrm) - HALFPI
        val lam = math.atan2(sy / nrm, sx / nrm)
        if (es != 0) {
          val neg = phi < 0
          val tanphi = math.tan(phi)
          val xa = bEll / math.sqrt(tanphi * tanphi + omf2)
          phi = math.atan(math.sqrt(a2 - xa * xa) / (oneMinusF * xa))
          if (neg) phi = -phi
        }
        c.x = lam; c.y = phi
      }
    }
  }
}
