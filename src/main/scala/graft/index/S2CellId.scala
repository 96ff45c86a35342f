package graft.index

import graft.proj.ops.DggOps

/** 64-bit S2 cell ids — the public S2 geometry cell decomposition
  * (face · Hilbert-curve position · level), built on the same cube-face
  * math as the reference's s2 projection (src/projections/s2.cpp:126-409)
  * plus the published Hilbert bit-interleaving scheme.
  *
  * Layout: 3 face bits, then 2·level position bits, then a trailing 1 bit
  * ("lsb") marking the level; level 30 = leaf (1-cm scale cells).
  *
  * Pure functions — safe inside Catalyst codegen and executor threads.
  */
object S2CellId {
  final val MAX_LEVEL = 30
  private final val FACE_BITS = 3
  private final val POS_BITS = 2 * MAX_LEVEL + 1
  private final val MAX_SIZE = 1 << MAX_LEVEL

  private final val SWAP_MASK = 0x01
  private final val INVERT_MASK = 0x02
  private final val LOOKUP_BITS = 4

  // Canonical Hilbert traversal tables (public S2 constants)
  private val posToOrientation = Array(SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical order
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)) // swapped & inverted

  private val lookupPos = new Array[Int](1 << (2 * LOOKUP_BITS + 2))
  private val lookupIJ = new Array[Int](1 << (2 * LOOKUP_BITS + 2))
  locally {
    def init(level: Int, i: Int, j: Int, origOrientation: Int, pos: Int, orientation: Int): Unit = {
      if (level == LOOKUP_BITS) {
        val ij = (i << LOOKUP_BITS) + j
        lookupPos((ij << 2) + origOrientation) = (pos << 2) + orientation
        lookupIJ((pos << 2) + origOrientation) = (ij << 2) + orientation
      } else {
        val l = level + 1
        val i2 = i << 1; val j2 = j << 1; val pos2 = pos << 2
        val r = posToIJ(orientation)
        var idx = 0
        while (idx < 4) {
          val ij = r(idx)
          init(l, i2 + (ij >> 1), j2 + (ij & 1), origOrientation,
            pos2 + idx, orientation ^ posToOrientation(idx))
          idx += 1
        }
      }
    }
    init(0, 0, 0, 0, 0, 0)
    init(0, 0, 0, SWAP_MASK, 0, SWAP_MASK)
    init(0, 0, 0, INVERT_MASK, 0, INVERT_MASK)
    init(0, 0, 0, SWAP_MASK | INVERT_MASK, 0, SWAP_MASK | INVERT_MASK)
  }

  @inline def lsbForLevel(level: Int): Long = 1L << (2 * (MAX_LEVEL - level))
  @inline def lsb(id: Long): Long = id & -id

  def level(id: Long): Int = MAX_LEVEL - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def face(id: Long): Int = (id >>> POS_BITS).toInt

  /** leaf cell id from face + 30-bit (i, j), via 4-bit lookup chunks
    * accumulated in two 32-bit halves (the published algorithm). */
  def fromFaceIJ(faceIn: Int, iIn: Int, jIn: Int): Long = {
    var nLo = 0L
    var nHi = faceIn.toLong << (60 - 32)
    var bits = faceIn & SWAP_MASK
    val mask = (1 << LOOKUP_BITS) - 1
    var k = 7
    while (k >= 0) {
      bits += ((iIn >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
      bits += ((jIn >> (k * LOOKUP_BITS)) & mask) << 2
      bits = lookupPos(bits)
      val posBits = (bits >> 2).toLong
      if (k >= 4) nHi |= posBits << ((k - 4) * 2 * LOOKUP_BITS)
      else nLo |= posBits << (k * 2 * LOOKUP_BITS)
      bits &= SWAP_MASK | INVERT_MASK
      k -= 1
    }
    (((nHi << 32) | nLo) << 1) | 1L
  }

  /** decode id → (face, i, j, orientation). */
  def toFaceIJ(id: Long): (Int, Int, Int, Int) = {
    var i = 0; var j = 0
    val f = face(id)
    var bits = f & SWAP_MASK
    val n = id >>> 1 // strip the trailing marker? no — handle via shifts below
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MAX_LEVEL - 7 * LOOKUP_BITS else LOOKUP_BITS
      val shift = k * 2 * LOOKUP_BITS + 1
      val posChunk = ((id >>> shift) & ((1L << (2 * nbits)) - 1)).toInt
      bits += posChunk << 2
      bits = lookupIJ(bits)
      i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
      j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
      bits &= SWAP_MASK | INVERT_MASK
      k -= 1
    }
    (f, i, j, bits)
  }

  def parent(id: Long, lvl: Int): Long = {
    val newLsb = lsbForLevel(lvl)
    (id & -newLsb) | newLsb
  }

  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)

  def isLeaf(id: Long): Boolean = (id & 1L) != 0

  /** children of a cell at level+1 (4 ids). */
  def children(id: Long): Array[Long] = {
    val l = lsb(id)
    val childLsb = l >>> 2
    Array(
      id - l + childLsb, id - l + 3 * childLsb,
      id - l + 5 * childLsb, id - l + 7 * childLsb)
  }

  // -------------------------------------------------- lon/lat encoding

  private final val QUAD = DggOps.QUADRATIC

  @inline private def stToIJ(s: Double): Int = {
    val v = math.round(MAX_SIZE * s - 0.5).toInt
    if (v < 0) 0 else if (v > MAX_SIZE - 1) MAX_SIZE - 1 else v
  }

  /** leaf cell id from lon/lat degrees. */
  def fromLonLatDeg(lonDeg: Double, latDeg: Double): Long = {
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    val cosLat = math.cos(lat)
    val x = cosLat * math.cos(lon)
    val y = cosLat * math.sin(lon)
    val z = math.sin(lat)
    val f = DggOps.faceOf(x, y, z)
    val (u, v) = DggOps.validFaceXyzToUv(f, x, y, z)
    val i = stToIJ(DggOps.uvToSt(u, QUAD))
    val j = stToIJ(DggOps.uvToSt(v, QUAD))
    fromFaceIJ(f, i, j)
  }

  /** cell id at the given level from lon/lat degrees. */
  def cellId(lonDeg: Double, latDeg: Double, lvl: Int): Long =
    parent(fromLonLatDeg(lonDeg, latDeg), lvl)

  /** cell center as (lonDeg, latDeg). */
  def toLonLatDeg(id: Long): (Double, Double) = {
    val (f, i, j, _) = toFaceIJ(id)
    // center correction: for non-leaf cells the (i,j) from decode is the
    // lowest leaf; offset by half the cell size
    val lvl = level(id)
    val sizeIJ = 1 << (MAX_LEVEL - lvl)
    val si = i - (i % sizeIJ) + sizeIJ / 2
    val sj = j - (j % sizeIJ) + sizeIJ / 2
    val s = (if (lvl == MAX_LEVEL) i + 0.5 else si.toDouble) / MAX_SIZE
    val t = (if (lvl == MAX_LEVEL) j + 0.5 else sj.toDouble) / MAX_SIZE
    val u = DggOps.stToUv(s, QUAD)
    val v = DggOps.stToUv(t, QUAD)
    val (x, y, z) = DggOps.uvToSphereXyz(f, u, v)
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(math.atan2(z, math.hypot(x, y))))
  }

  // -------------------------------------------------- neighbors

  /** leaf id from face/i/j with wrap across face boundaries (public
    * FromFaceIJWrap algorithm). */
  private def fromFaceIJWrap(f: Int, iIn: Int, jIn: Int): Long = {
    var i = math.max(-1, math.min(MAX_SIZE, iIn))
    var j = math.max(-1, math.min(MAX_SIZE, jIn))
    val kScale = 1.0 / MAX_SIZE
    val kLimit = 1.0 + 2.220446049250313e-16
    val u = math.max(-kLimit, math.min(kLimit, kScale * (2 * (i - MAX_SIZE / 2) + 1)))
    val v = math.max(-kLimit, math.min(kLimit, kScale * (2 * (j - MAX_SIZE / 2) + 1)))
    val (x, y, z) = DggOps.uvToSphereXyz(f, u, v)
    val fNew = DggOps.faceOf(x, y, z)
    val (uN, vN) = DggOps.validFaceXyzToUv(fNew, x, y, z)
    fromFaceIJ(fNew, stToIJlinear(uN), stToIJlinear(vN))
  }

  @inline private def stToIJlinear(u: Double): Int = {
    val s = 0.5 * (u + 1)
    val v = math.round(MAX_SIZE * s - 0.5).toInt
    if (v < 0) 0 else if (v > MAX_SIZE - 1) MAX_SIZE - 1 else v
  }

  private def fromFaceIJSame(f: Int, i: Int, j: Int, samePlane: Boolean): Long =
    if (samePlane) fromFaceIJ(f, i, j) else fromFaceIJWrap(f, i, j)

  /** All neighbors of `id` at the same level (edge + vertex, up to 8). */
  def allNeighbors(id: Long): Array[Long] = {
    val lvl = level(id)
    val (f, i0, j0, _) = toFaceIJ(id)
    val size = 1 << (MAX_LEVEL - lvl)
    val i = i0 - (i0 % size)
    val j = j0 - (j0 % size)
    val out = collection.mutable.LinkedHashSet[Long]()
    var dj = -1
    while (dj <= 1) {
      var di = -1
      while (di <= 1) {
        if (!(di == 0 && dj == 0)) {
          val ni = i + di * size
          val nj = j + dj * size
          val inside = ni >= 0 && ni < MAX_SIZE && nj >= 0 && nj < MAX_SIZE
          val n = parent(fromFaceIJSame(f, ni, nj, inside), lvl)
          if (n != parent(id, lvl)) out += n
        }
        di += 1
      }
      dj += 1
    }
    out.toArray
  }

  /** Cells within `rings` king-moves of id (id included) — the kNN
    * candidate expansion primitive. */
  def ringCells(id: Long, rings: Int): Array[Long] = {
    var frontier = Set(parent(id, level(id)))
    var all = frontier
    var r = 0
    while (r < rings) {
      frontier = frontier.flatMap(allNeighbors(_).toSet) -- all
      all = all ++ frontier
      r += 1
    }
    all.toArray
  }

  /** token (hex, trailing zeros stripped) — handy for debugging/tests. */
  def token(id: Long): String = {
    val s = f"$id%016x"
    val t = s.reverse.dropWhile(_ == '0').reverse
    if (t.isEmpty) "X" else t
  }
}
