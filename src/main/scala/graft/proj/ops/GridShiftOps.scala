package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Grid-based datum shifts: +proj=vgridshift (.gtx geoid heights) and
  * +proj=hgridshift (NTv2 .gsb lon/lat shifts).
  *
  * File-format and application semantics per reference src/grids.cpp
  * (GTX reader :246-365, NTv2 reader :2097-2330, bilinear interpolation
  * with nodata handling :3593-3750 and :3326-3396, iterative inverse
  * :3402-3508) and src/transformations/{vgridshift,hgridshift}.cpp.
  * Both formats are public specifications (NOAA VDatum GTX; Natural
  * Resources Canada NTv2).
  *
  * Grids load once per JVM and are cached; in a Spark job the cache warms
  * once per executor, so the per-row cost is a bilinear lookup.
  */
object GridShiftOps {
  private final val RELTOL = 1e-5 // REL_TOLERANCE_HGRIDSHIFT

  /** Search roots mirroring the reference test layout: the data dir, its
    * tests/ subdir, and the CI aliases (for_tests/ copies). */
  private val DATA_DIRS = Seq("/root/reference/data", "/root/reference/data/tests")
  private val ALIASES = Map(
    "egm96_15.gtx" -> "egm96_15_downsampled.gtx",
    "ntv2_0.gsb" -> "ntv2_0_downsampled.gsb")

  private def resolve(name: String): Option[Array[Byte]] = {
    val candidates =
      DATA_DIRS.map(d => s"$d/$name") ++
        ALIASES.get(name.split('/').last).toSeq.flatMap(a => DATA_DIRS.map(d => s"$d/$a"))
    candidates.iterator
      .map(Paths.get(_))
      .find(Files.isReadable)
      .map(Files.readAllBytes)
  }

  // ---------------- vertical grids (.gtx) ----------------

  final class GtxGrid(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val south: Double = bb.getDouble(0) * DEG2RAD
    private val xorigin0 = bb.getDouble(8)
    val resY: Double = bb.getDouble(16) * DEG2RAD
    val resX: Double = bb.getDouble(24) * DEG2RAD
    val height: Int = bb.getInt(32)
    val width: Int = bb.getInt(36)
    if (width <= 0 || height <= 0 || xorigin0 < -360 || xorigin0 > 360 ||
        bb.getDouble(0) < -90 || bb.getDouble(0) > 90)
      throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID, "gtx: invalid header")
    // shift 0-360 grids into -180..180 when possible (reference :290-293)
    val west: Double = (if (xorigin0 >= 180.0) xorigin0 - 360.0 else xorigin0) * DEG2RAD
    val east: Double = west + resX * (width - 1)
    val north: Double = south + resY * (height - 1)
    def fullWorldLon: Boolean = east - west + resX >= 2 * math.Pi - 1e-10
    def valueAt(x: Int, y: Int): Float = bb.getFloat(40 + 4 * (y * width + x))
    def isNodata(v: Float, mult: Double): Boolean =
      v * mult > 1000 || v * mult < -1000 || v == -88.88880f

    def contains(lam: Double, phi: Double): Boolean = {
      if (!(phi >= south && phi <= north)) return false
      if (fullWorldLon) return true
      var x = lam
      if (x < west) x += 2 * math.Pi else if (x > east) x -= 2 * math.Pi
      x >= west && x <= east
    }

    /** bilinear geoid height at (lam, phi) radians, or NaN outside/nodata. */
    def interp(lam: Double, phi: Double, mult: Double, c: Coord): Double = {
      var gx = (lam - west) / resX
      if (lam < west || lam > east) {
        if (fullWorldLon) {
          gx = ((gx % width) + width) % width
          gx = ((gx % width) + width) % width
        } else gx = (lam + (if (lam < west) 2 * math.Pi else -2 * math.Pi) - west) / resX
      }
      var gy = (phi - south) / resY
      val ix = math.floor(gx).toInt
      if (ix < 0 || ix >= width) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return Double.NaN }
      val iy = math.floor(gy).toInt
      gx -= ix; gy -= iy
      var ix2 = ix + 1
      if (ix2 >= width) ix2 = if (fullWorldLon) 0 else width - 1
      var iy2 = iy + 1
      if (iy2 >= height) iy2 = height - 1
      val va = valueAt(ix, iy); val vb = valueAt(ix2, iy)
      val vc = valueAt(ix, iy2); val vd = valueAt(ix2, iy2)
      val gxy = gx * gy
      val av = !isNodata(va, mult); val bv = !isNodata(vb, mult)
      val cv = !isNodata(vc, mult); val dv = !isNodata(vd, mult)
      val nValid = (if (av) 1 else 0) + (if (bv) 1 else 0) + (if (cv) 1 else 0) + (if (dv) 1 else 0)
      var value = 0.0
      if (nValid == 4) {
        value = va * (1.0 - gx - gy + gxy) + vb * (gx - gxy) + vc * (gy - gxy) + vd * gxy
      } else if (nValid == 0) {
        c.setError(ProjErr.COORD_TRANSFM_GRID_AT_NODATA); return Double.NaN
      } else {
        var tw = 0.0
        if (av) { val w = 1.0 - gx - gy + gxy; value += va * w; tw += w }
        if (bv) { val w = gx - gxy; value += vb * w; tw += w }
        if (cv) { val w = gy - gxy; value += vc * w; tw += w }
        if (dv) { val w = gxy; value += vd * w; tw += w }
        value /= tw
      }
      value * mult
    }
  }

  // ---------------- horizontal grids (NTv2 .gsb) ----------------

  /** One NTv2 subgrid: row 0 at south, file columns east-to-west. */
  final class Ntv2Grid(bb: ByteBuffer, val offset: Int,
                       val west: Double, val south: Double,
                       val east: Double, val north: Double,
                       val resX: Double, val resY: Double,
                       val width: Int, val height: Int) {
    val children = mutable.ListBuffer[Ntv2Grid]()
    /** (lonShiftEastRad, latShiftRad) at grid node, NT convention compensated. */
    def valueAt(x: Int, y: Int): (Float, Float) = {
      val fileCol = width - 1 - x // NTv2 stores east to west
      val rec = offset + 16 * (y * width + fileCol)
      val latS = bb.getFloat(rec)
      val lonS = bb.getFloat(rec + 4)
      val toRad = (math.Pi / 180.0) / 3600.0
      ((-(lonS * toRad)).toFloat, (latS * toRad).toFloat) // west-positive -> east-positive
    }
  }

  final class Ntv2GridSet(bytes: Array[Byte]) {
    private val beProbe = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (!(bytes.length > 176 && new String(bytes, 56, 7, "ASCII") == "SECONDS"))
      throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID, "ntv2: GS_TYPE must be SECONDS")
    private val bb = {
      val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (beProbe.getInt(8) == 11) beProbe
      else if (le.getInt(8) == 11) le
      else throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID, "ntv2: bad NUM_OREC")
    }
    val grids: List[Ntv2Grid] = {
      val numSubfiles = bb.getInt(40) // NUM_FILE value at 8 + 32
      val byName = mutable.Map[String, Ntv2Grid]()
      val roots = mutable.ListBuffer[Ntv2Grid]()
      var off = 11 * 16
      val toRad = DEG2RAD / 3600.0
      var i = 0
      while (i < numSubfiles) {
        if (new String(bytes, off, 8, "ASCII") != "SUB_NAME")
          throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID, "ntv2: bad subgrid")
        val name = new String(bytes, off + 8, 8, "ASCII")
        val parent = new String(bytes, off + 24, 8, "ASCII")
        val south = bb.getDouble(off + 8 + 16 * 4) * toRad
        val north = bb.getDouble(off + 8 + 16 * 5) * toRad
        val east = -bb.getDouble(off + 8 + 16 * 6) * toRad // positive west in file
        val west = -bb.getDouble(off + 8 + 16 * 7) * toRad
        val resY = bb.getDouble(off + 8 + 16 * 8) * toRad
        val resX = bb.getDouble(off + 8 + 16 * 9) * toRad
        val gsCount = bb.getInt(off + 8 + 16 * 10)
        if (!(math.abs(west) <= 4 * math.Pi && math.abs(east) <= 4 * math.Pi &&
              math.abs(north) <= math.Pi + 1e-5 && math.abs(south) <= math.Pi + 1e-5 &&
              west < east && south < north && resX > 1e-10 && resY > 1e-10))
          throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID, "ntv2: bad georeferencing")
        val cols = (math.abs((east - west) / resX + 0.5) + 1).toInt
        val rows = (math.abs((north - south) / resY + 0.5) + 1).toInt
        if (gsCount / cols != rows)
          throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID, "ntv2: GS_COUNT mismatch")
        val g = new Ntv2Grid(bb, off + 11 * 16, west, south, east, north, resX, resY, cols, rows)
        byName.get(parent) match {
          case Some(p) => p.children += g
          case None => roots += g
        }
        byName(name) = g
        off += 11 * 16 + gsCount * 16
        i += 1
      }
      roots.toList
    }
  }

  private def inExtent(lam0: Double, phi: Double, g: Ntv2Grid, eps: Double): Boolean = {
    if (!(phi + eps >= g.south && phi - eps <= g.north)) return false
    var lam = lam0
    if (lam + eps < g.west) lam += 2 * math.Pi
    else if (lam - eps > g.east) lam -= 2 * math.Pi
    lam + eps >= g.west && lam - eps <= g.east
  }

  private def gridAt(roots: List[Ntv2Grid], lam: Double, phi: Double): Ntv2Grid = {
    var cur: Ntv2Grid = null
    roots.find { g => inExtent(lam, phi, g, (g.resX + g.resY) * RELTOL) } match {
      case Some(g0) =>
        cur = g0
        var descended = true
        while (descended) {
          descended = false
          val it = cur.children.iterator
          while (it.hasNext && !descended) {
            val ch = it.next()
            if (inExtent(lam, phi, ch, (ch.resX + ch.resY) * RELTOL)) { cur = ch; descended = true }
          }
        }
        cur
      case None => null
    }
  }

  /** Bilinear shift lookup in grid-origin coords; NaN pair if outside
    * (reference pj_hgrid_interpolate :3326). Returns (dLam, dPhi) radians. */
  private def hInterp(g: Ntv2Grid, tLam0: Double, tPhi0: Double): (Double, Double) = {
    val bad = (Double.NaN, Double.NaN)
    val tLam = tLam0 / g.resX
    var ixLam = if (tLam.isNaN) 0 else math.floor(tLam).toInt
    val tPhi = tPhi0 / g.resY
    var ixPhi = if (tPhi.isNaN) 0 else math.floor(tPhi).toInt
    var fLam = tLam - ixLam
    var fPhi = tPhi - ixPhi
    if (ixLam < 0) {
      if (ixLam == -1 && fLam > 1 - 10 * RELTOL) { ixLam += 1; fLam = 0 } else return bad
    } else if (ixLam + 1 >= g.width) {
      if (ixLam + 1 == g.width && fLam < 10 * RELTOL) { ixLam -= 1; fLam = 1 } else return bad
    }
    if (ixPhi < 0) {
      if (ixPhi == -1 && fPhi > 1 - 10 * RELTOL) { ixPhi += 1; fPhi = 0 } else return bad
    } else if (ixPhi + 1 >= g.height) {
      if (ixPhi + 1 == g.height && fPhi < 10 * RELTOL) { ixPhi -= 1; fPhi = 1 } else return bad
    }
    val (f00x, f00y) = g.valueAt(ixLam, ixPhi)
    val (f10x, f10y) = g.valueAt(ixLam + 1, ixPhi)
    val (f01x, f01y) = g.valueAt(ixLam, ixPhi + 1)
    val (f11x, f11y) = g.valueAt(ixLam + 1, ixPhi + 1)
    var m10 = fLam; var m11 = m10; var m01 = 1.0 - fLam; var m00 = m01
    m11 *= fPhi; m01 *= fPhi
    val fPhi1 = 1.0 - fPhi
    m00 *= fPhi1; m10 *= fPhi1
    (m00 * f00x + m10 * f10x + m01 * f01x + m11 * f11x,
      m00 * f00y + m10 * f10y + m01 * f01y + m11 * f11y)
  }

  /** Apply an hgrid shift, forward or iterative-inverse
    * (reference pj_hgrid_apply_internal :3402). Writes into c or errors. */
  private def hApply(roots: List[Ntv2Grid], c: Coord, forward: Boolean): Unit = {
    val grid = gridAt(roots, c.x, c.y)
    if (grid == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
    val eps = (grid.resX + grid.resY) * RELTOL
    var tbLam = c.x - grid.west
    if (tbLam + eps < 0) tbLam += 2 * math.Pi
    else if (tbLam - eps > grid.east - grid.west) tbLam -= 2 * math.Pi
    val tbPhi = c.y - grid.south
    val (sLam, sPhi) = hInterp(grid, tbLam, tbPhi)
    if (sLam.isNaN) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
    if (forward) { c.x += sLam; c.y += sPhi; return }
    var tLam = tbLam - sLam
    var tPhi = tbPhi - sPhi
    var i = 10 // MAX_ITERATIONS
    val toltol = 1e-12 * 1e-12
    var done = false
    var edgeBreak = false
    while (i > 0 && !done) {
      val (dLam, dPhi) = hInterp(grid, tLam, tPhi)
      if (dLam.isNaN) { edgeBreak = true; done = true } // grid edge: first approximation
      else {
        val difLam = tLam + dLam - tbLam
        val difPhi = tPhi + dPhi - tbPhi
        tLam -= difLam; tPhi -= difPhi
        i -= 1
        if (difLam * difLam + difPhi * difPhi <= toltol) done = true
      }
    }
    if (i == 0 && !edgeBreak) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
    c.x = GeoMath.adjlon(tLam + grid.west)
    c.y = tPhi + grid.south
  }

  // ---------------- grid cache + name list parsing ----------------

  private val vCache = new java.util.concurrent.ConcurrentHashMap[String, GtxGrid]()
  private val hCache = new java.util.concurrent.ConcurrentHashMap[String, Ntv2GridSet]()

  /** parse "a.gtx,@maybe.gtx" -> loaded grids; throws on non-optional miss.
    * `null` names denote the identity null grid. */
  private def loadList[G](names: String, cache: java.util.concurrent.ConcurrentHashMap[String, G],
                          mk: Array[Byte] => G): List[Option[G]] = {
    names.split(",").toList.map { raw =>
      val canFail = raw.startsWith("@")
      val name = if (canFail) raw.substring(1) else raw
      if (name == "null") None // null grid: pass-through
      else {
        val cached = cache.get(name)
        if (cached != null) Some(cached)
        else resolve(name) match {
          case Some(bytes) =>
            val g = mk(bytes); cache.putIfAbsent(name, g); Some(cache.get(name))
          case None =>
            if (canFail) None
            else throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
              s"gridshift: cannot open $name")
        }
      }
    }
  }

  // ---------------- the operations ----------------

  /** +proj=vgridshift (reference src/transformations/vgridshift.cpp). */
  def vgridshift(P: PJ): Unit = {
    if (!P.params.has("grids"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "vgridshift: +grids parameter missing")
    // historical: the forward direction subtracts the grid offset
    val multiplier = if (P.params.has("multiplier")) P.params.d("multiplier") else -1.0
    val entries = loadList(P.params.s("grids").get, vCache, new GtxGrid(_))
    val grids = entries.flatten
    val hasNull = entries.exists(_.isEmpty)
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      private def value(c: Coord): Double = {
        if (c.x.isNaN || c.y.isNaN) return Double.NaN
        grids.find(_.contains(c.x, c.y)) match {
          case Some(g) => g.interp(c.x, c.y, multiplier, c)
          case None =>
            if (hasNull) 0.0
            else { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); Double.NaN }
        }
      }
      override def fwd4(c: Coord): Unit = {
        if (grids.isEmpty && !hasNull) return
        val v = value(c)
        if (!v.isNaN) c.z += v
      }
      override def inv4(c: Coord): Unit = {
        if (grids.isEmpty && !hasNull) return
        val v = value(c)
        if (!v.isNaN) c.z -= v
      }
    }
  }

  /** +proj=hgridshift (reference src/transformations/hgridshift.cpp). */
  def hgridshift(P: PJ): Unit = {
    if (!P.params.has("grids"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "hgridshift: +grids parameter missing")
    val entries = loadList(P.params.s("grids").get, hCache, new Ntv2GridSet(_))
    val roots = entries.flatten.flatMap(_.grids)
    val hasNull = entries.exists(_.isEmpty)
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      override def fwd4(c: Coord): Unit = {
        if (roots.isEmpty) { if (!hasNull) () else (); return }
        hApply(roots, c, forward = true)
      }
      override def inv4(c: Coord): Unit = {
        if (roots.isEmpty) return
        hApply(roots, c, forward = false)
      }
    }
  }
}
