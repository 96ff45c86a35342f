package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import graft.proj.grids.{GenericGrids, GeoTiff}
import graft.proj.grids.GenericGrids.GenGrid
import OpKernel._

/** +proj=gridshift — the unified GeoTIFF-based grid shift.
  *
  * Semantics per reference src/transformations/gridshift.cpp: grid-type
  * classification (:128-222), per-grid sample mapping by DESCRIPTION with
  * unit checks (:245-338), bilinear and NOAA-qterp biquadratic kernels
  * (:424-566), non-iterated inverse for biquadratic per NCAT behavior and
  * iterated inverse with cross-grid hopping for bilinear (:640-724),
  * main + auxiliary vertical second pass (:752-824), +interpolation /
  * +no_z_transform parameters and constant_offset handling (:902-1010).
  */
object GridShift2Ops {
  private final val RELTOL = 1e-5

  /** per-grid resolved sampling info (reference GridInfo) */
  private final class Info(val idxX: Int, val idxY: Int, val idxZ: Int,
                           val eastingNorthing: Boolean, val bilinear: Boolean)

  private final class State(grids: List[List[GenGrid]], interpolation: String,
                            skipZ: Boolean) {
    var mainType = ""
    var auxType = ""
    var mainIsGeog3D = false
    var hasHorizontal = false
    var offsetX = 0.0
    var offsetY = 0.0
    val isProjected: Boolean = grids.flatten.lastOption.exists(!_.isGeographic)

    locally {
      var hasGeog3D = false; var hasEllH = false; var hasV2V = false; var hasG2V = false
      var offX = ""; var offY = ""
      var gridCount = 0
      def visit(g: GenGrid): Unit = {
        gridCount += 1
        g.gridType match {
          case "HORIZONTAL_OFFSET" =>
            hasHorizontal = true
            if (offX.isEmpty) offX = g.metadataItem("constant_offset", 0)
            if (offY.isEmpty) offY = g.metadataItem("constant_offset", 1)
          case "GEOGRAPHIC_3D_OFFSET" => hasGeog3D = true
          case "ELLIPSOIDAL_HEIGHT_OFFSET" => hasEllH = true
          case "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL" => hasV2V = true
          case "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL" => hasG2V = true
          case "" => throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
            "gridshift: missing TYPE metadata item in grid(s)")
          case other => throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
            s"gridshift: unhandled TYPE $other")
        }
        g.children.foreach(visit)
      }
      grids.flatten.foreach(visit)
      if (offX.nonEmpty || offY.nonEmpty) {
        if (gridCount > 1)
          throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
            "gridshift: only one grid with shift offset supported")
        offsetX = if (offX.nonEmpty) offX.toDouble else 0.0
        offsetY = if (offY.nonEmpty) offY.toDouble else 0.0
      }
      if ((if (hasEllH) 1 else 0) + (if (hasV2V) 1 else 0) + (if (hasG2V) 1 else 0) > 1)
        throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
          "gridshift: unsupported mix of grid types")
      if (hasGeog3D) { mainIsGeog3D = true; mainType = "GEOGRAPHIC_3D_OFFSET" }
      else if (!hasHorizontal) {
        mainType =
          if (hasEllH) "ELLIPSOIDAL_HEIGHT_OFFSET"
          else if (hasG2V) "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL"
          else "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL"
      } else mainType = "HORIZONTAL_OFFSET"
      if (hasHorizontal) {
        auxType =
          if (hasEllH) "ELLIPSOIDAL_HEIGHT_OFFSET"
          else if (hasG2V) "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL"
          else if (hasV2V) "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL"
          else ""
      }
    }

    private val infoCache = new java.util.concurrent.ConcurrentHashMap[GenGrid, Info]()

    def findGrid(typ: String, x: Double, y: Double): GenGrid = {
      for (set <- grids; g <- set) {
        if (g.gridType == typ && GenericGrids.isPointInExtent(x, y, g))
          return GenericGrids.gridAt(g, x, y)
      }
      null
    }

    private def resolveInfo(typ: String, g: GenGrid): Info = {
      val cached = infoCache.get(g)
      if (cached != null) return cached
      val projCoord = !g.isGeographic
      var idxX = -1; var idxY = -1; var idxZ = -1
      var eastNorth = false
      var i = 0
      while (i < g.samplesPerPixel) {
        val desc = g.description(i)
        val unit = g.unit(i)
        if (!projCoord && desc == "latitude_offset") {
          idxY = i
          if (unit.nonEmpty && unit != "arc-second") return fail()
        } else if (!projCoord && desc == "longitude_offset") {
          idxX = i
          if (unit.nonEmpty && unit != "arc-second") return fail()
        } else if (projCoord && desc == "easting_offset") {
          eastNorth = true; idxX = i
          if (unit.nonEmpty && unit != "metre") return fail()
        } else if (projCoord && desc == "northing_offset") {
          eastNorth = true; idxY = i
          if (unit.nonEmpty && unit != "metre") return fail()
        } else if (desc == "ellipsoidal_height_offset" || desc == "geoid_undulation" ||
            desc == "hydroid_height" || desc == "vertical_offset") {
          idxZ = i
          if (unit.nonEmpty && unit != "metre") return fail()
        }
        i += 1
      }
      if (g.samplesPerPixel >= 2 && idxY < 0 && idxX < 0 && typ == "HORIZONTAL_OFFSET") {
        if (projCoord) { eastNorth = true; idxX = 0; idxY = 1 }
        else { idxX = 1; idxY = 0 } // lat, lon order when metadata lacking
      }
      if ((typ == "HORIZONTAL_OFFSET" || typ == "GEOGRAPHIC_3D_OFFSET") &&
          (idxY < 0 || idxX < 0)) return fail()
      if ((typ == "ELLIPSOIDAL_HEIGHT_OFFSET" || typ == "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL" ||
          typ == "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL" || typ == "GEOGRAPHIC_3D_OFFSET") &&
          idxZ < 0) return fail()
      var interp = interpolation
      if (interp.isEmpty) interp = g.metadataItem("interpolation_method")
      if (interp.isEmpty) interp = "bilinear"
      if (interp != "bilinear" && interp != "biquadratic") return fail()
      val info = new Info(idxX, idxY, if (skipZ) -1 else idxZ, eastNorth,
        interp == "bilinear" || g.width < 3 || g.height < 3)
      infoCache.putIfAbsent(g, info)
      info
    }
    private def fail(): Info = null

    /** interpolated (dx, dy, dz) shift or null; biquadratic flag via array[3]. */
    def interpolate(typ: String, x: Double, y: Double, g: GenGrid): Array[Double] = {
      val info = resolveInfo(typ, g)
      if (info == null) return null
      var ix = {
        val t = (x - g.west) / g.resX
        if (t.isNaN) 0 else math.floor(t).toInt
      }
      var iy = {
        val t = (y - g.south) / g.resY
        if (t.isNaN) 0 else math.floor(t).toInt
      }
      var fx = (x - g.west) / g.resX - ix
      var fy = (y - g.south) / g.resY - iy
      if (ix < 0) {
        if (ix == -1 && fx > 1 - 10 * RELTOL) { ix += 1; fx = 0 } else return null
      } else if (ix + 1 >= g.width) {
        if (ix + 1 == g.width && fx < 10 * RELTOL) { ix -= 1; fx = 1 } else return null
      }
      if (iy < 0) {
        if (iy == -1 && fy > 1 - 10 * RELTOL) { iy += 1; fy = 0 } else return null
      } else if (iy + 1 >= g.height) {
        if (iy + 1 == g.height && fy < 10 * RELTOL) { iy -= 1; fy = 1 } else return null
      }

      val hasXY = info.idxX >= 0 && info.idxY >= 0
      val hasZ = info.idxZ >= 0
      var dx = 0.0; var dy = 0.0; var dz = 0.0
      if (info.bilinear) {
        var m10 = fx; var m11 = m10; var m01 = 1 - fx; var m00 = m01
        m11 *= fy; m01 *= fy
        val fy1 = 1 - fy
        m00 *= fy1; m10 *= fy1
        if (hasXY) {
          val idx = if (hasZ) Array(info.idxX, info.idxY, info.idxZ) else Array(info.idxX, info.idxY)
          val ns = idx.length
          val vals = new Array[Double](2 * 2 * ns)
          if (!g.valuesAt(ix, iy, 2, 2, idx, ns, vals)) return null
          dx = m00 * vals(0) + m10 * vals(ns) + m01 * vals(2 * ns) + m11 * vals(3 * ns)
          dy = m00 * vals(1) + m10 * vals(ns + 1) + m01 * vals(2 * ns + 1) + m11 * vals(3 * ns + 1)
          if (hasZ)
            dz = m00 * vals(2) + m10 * vals(ns + 2) + m01 * vals(2 * ns + 2) + m11 * vals(3 * ns + 2)
        } else if (hasZ) {
          val vals = new Array[Double](4)
          if (!g.valuesAt(ix, iy, 2, 2, Array(info.idxZ), 1, vals)) return null
          dz = m00 * vals(0) + m10 * vals(1) + m01 * vals(2) + m11 * vals(3)
        }
      } else {
        // biquadratic: shift the 3x3 window across the half-pixel boundary
        if ((fx <= 0.5 && ix > 0) || (ix + 2 == g.width)) { ix -= 1; fx += 1 }
        if ((fy <= 0.5 && iy > 0) || (iy + 2 == g.height)) { iy -= 1; fy += 1 }
        @inline def qterp(t: Double, f0: Double, f1: Double, f2: Double): Double = {
          val df0 = f1 - f0; val df1 = f2 - f1; val d2f0 = df1 - df0
          f0 + t * df0 + 0.5 * t * (t - 1.0) * d2f0
        }
        if (hasXY) {
          val idx = if (hasZ) Array(info.idxX, info.idxY, info.idxZ) else Array(info.idxX, info.idxY)
          val ns = idx.length
          val vals = new Array[Double](3 * 3 * ns)
          if (!g.valuesAt(ix, iy, 3, 3, idx, ns, vals)) return null
          val rowX = new Array[Double](3); val rowY = new Array[Double](3); val rowZ = new Array[Double](3)
          var j = 0
          while (j < 3) {
            val base = 3 * ns * j
            rowX(j) = qterp(fx, vals(base), vals(base + ns), vals(base + 2 * ns))
            rowY(j) = qterp(fx, vals(base + 1), vals(base + ns + 1), vals(base + 2 * ns + 1))
            if (hasZ) rowZ(j) = qterp(fx, vals(base + 2), vals(base + ns + 2), vals(base + 2 * ns + 2))
            j += 1
          }
          dx = qterp(fy, rowX(0), rowX(1), rowX(2))
          dy = qterp(fy, rowY(0), rowY(1), rowY(2))
          if (hasZ) dz = qterp(fy, rowZ(0), rowZ(1), rowZ(2))
        } else if (hasZ) {
          val vals = new Array[Double](9)
          if (!g.valuesAt(ix, iy, 3, 3, Array(info.idxZ), 1, vals)) return null
          val rowZ = new Array[Double](3)
          var j = 0
          while (j < 3) { rowZ(j) = qterp(fx, vals(3 * j), vals(3 * j + 1), vals(3 * j + 2)); j += 1 }
          dz = qterp(fy, rowZ(0), rowZ(1), rowZ(2))
        }
      }
      if (hasXY && !info.eastingNorthing) {
        val conv = 1.0 / 3600 / 180 * math.Pi // arc-seconds to radians
        dx *= conv; dy *= conv
      }
      Array(dx, dy, dz, if (info.bilinear) 0.0 else 1.0)
    }

    private def normalizeX(g: GenGrid, x: Double): Double = {
      if (!g.isGeographic) return x
      val eps = (g.resX + g.resY) * RELTOL
      if (x < g.west - eps) x + 2 * math.Pi
      else if (x > g.east + eps) x - 2 * math.Pi
      else x
    }

    /** one grid application (fwd, or inverse with iteration). Returns output
      * xyz or null (caller sets errno). errKind: 0 outside, 1 no-convergence */
    def applyInternal(typ: String, verticalOnly: Boolean, inX: Double, inY: Double,
                      inZ: Double, forward: Boolean, grid0: GenGrid,
                      err: Array[Int]): Array[Double] = {
      var grid = grid0
      var nx = normalizeX(grid, inX)
      val ny = inY
      var shift = interpolate(typ, nx, ny, grid)
      if (shift == null) return null
      if (forward)
        return Array(inX + shift(0), inY + shift(1), inZ + shift(2))
      if (verticalOnly)
        return Array(inX, inY, inZ - shift(2))
      var gx = nx - shift(0)
      var gy = ny - shift(1)
      // NOAA NCAT does not iterate the biquadratic reverse path
      if (shift(3) == 0.0) {
        var i = 10
        val toltol = 1e-12 * 1e-12
        var done = false
        var edge = false
        while (i > 0 && !done) {
          val del = interpolate(typ, gx, gy, grid)
          if (del == null) {
            // maybe we walked off this grid: hop to another one
            val ng = findGrid(typ, gx, gy)
            if (ng == null || (ng eq grid)) { edge = true; done = true }
            else {
              grid = ng
              nx = normalizeX(grid, inX)
              // restart iteration against the new grid
            }
          } else {
            val difX = gx + del(0) - nx
            val difY = gy + del(1) - ny
            gx -= difX; gy -= difY
            shift = del
            i -= 1
            if (difX * difX + difY * difY <= toltol) done = true
          }
        }
        if (i == 0 && !done) { err(0) = 1; return null }
      }
      Array(if (grid.isGeographic) GeoMath.adjlon(gx) else gx, gy, inZ - shift(2))
    }

    /** full application incl. aux vertical pass (reference apply :752-824). */
    def apply(c: Coord, forward: Boolean): Unit = {
      var typ = mainType
      var x = c.x; var y = c.y; var z = c.z
      if (!forward) { x -= offsetX; y -= offsetY }
      var foundGeog3D = false
      var grid = findGrid(typ, x, y)
      if (grid == null && mainIsGeog3D && hasHorizontal) {
        typ = "HORIZONTAL_OFFSET"
        grid = findGrid(typ, x, y)
      } else if (grid != null && mainIsGeog3D) foundGeog3D = true
      if (grid == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
      val err = Array(0)
      var out = applyInternal(typ, !(mainIsGeog3D || hasHorizontal), x, y, z,
        forward, grid, err)
      if (out == null) {
        c.setError(if (err(0) == 1) ProjErr.COORD_TRANSFM_NO_CONVERGENCE
          else ProjErr.COORD_TRANSFM_OUTSIDE_GRID)
        return
      }
      if (!foundGeog3D && auxType.nonEmpty) {
        val g2 = findGrid(auxType, out(0), out(1))
        if (g2 == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
        val out2 = applyInternal(auxType, verticalOnly = true, out(0), out(1), out(2),
          forward, g2, err)
        if (out2 == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
        out = out2
      }
      c.x = out(0); c.y = out(1); c.z = out(2)
      if (forward) { c.x += offsetX; c.y += offsetY }
    }
  }

  def gridshift(P: PJ): Unit = {
    if (!P.params.has("grids"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "gridshift: +grids parameter missing")
    val interpolation = P.params.s("interpolation") match {
      case Some(s @ ("bilinear" | "biquadratic")) => s
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "gridshift: unsupported value for +interpolation")
      case None => ""
    }
    val skipZ = P.params.has("no_z_transform")
    val grids: List[List[GenGrid]] =
      P.params.s("grids").get.split(",").toList.map { raw =>
        val canFail = raw.startsWith("@")
        val name = if (canFail) raw.substring(1) else raw
        try GenericGrids.load(name) match {
          case Some(g) => g
          case None =>
            if (canFail) Nil
            else throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
              s"gridshift: could not find required grid $name")
        } catch {
          case _: GeoTiff.TiffError =>
            if (canFail) Nil
            else throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
              s"gridshift: invalid grid $name")
        }
      }.filter(_.nonEmpty)
    val st = new State(grids, interpolation, skipZ)
    if (st.isProjected) { P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER }
    else { P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS }
    P.kernel = new OpKernel {
      val caps = FWD3 | INV3
      override def fwd3(c: Coord): Unit = st.apply(c, forward = true)
      override def inv3(c: Coord): Unit = st.apply(c, forward = false)
    }
  }
}

/** +proj=xyzgridshift — geocentric-domain grid shift
  * (reference src/transformations/xyzgridshift.cpp:30-285 with
  * pj_bilinear_interpolation_three_samples, src/grids.cpp:3750-3830).
  */
object XyzGridShiftOps {
  import graft.proj.grids.GenericGrids
  import graft.proj.grids.GenericGrids.GenGrid

  private[ops] def bilinear3Pub(g: GenGrid, lam: Double, phi: Double,
                                i1: Int, i2: Int, i3: Int): Array[Double] = {
    if (!g.isGeographic) return null
    var gx = (lam - g.west) / g.resX
    if (lam < g.west) gx = (lam + 2 * math.Pi - g.west) / g.resX
    else if (lam > g.east) gx = (lam - 2 * math.Pi - g.west) / g.resX
    val gy = (phi - g.south) / g.resY
    val ix = gx.toInt; val iy = gy.toInt
    val ix2 = math.min(ix + 1, g.width - 1); val iy2 = math.min(iy + 1, g.height - 1)
    if (ix < 0 || iy < 0 || ix >= g.width || iy >= g.height) return null
    val fl = gx - ix; val fp = gy - iy
    var m10 = fl; var m11 = m10; var m01 = 1 - fl; var m00 = m01
    m11 *= fp; m01 *= fp
    val fp1 = 1 - fp
    m00 *= fp1; m10 *= fp1
    def v(x: Int, y: Int, s: Int): Double = g.valueAt(x, y, s).toDouble
    Array(
      m00 * v(ix, iy, i1) + m10 * v(ix2, iy, i1) + m01 * v(ix, iy2, i1) + m11 * v(ix2, iy2, i1),
      m00 * v(ix, iy, i2) + m10 * v(ix2, iy, i2) + m01 * v(ix, iy2, i2) + m11 * v(ix2, iy2, i2),
      m00 * v(ix, iy, i3) + m10 * v(ix2, iy, i3) + m01 * v(ix, iy2, i3) + m11 * v(ix2, iy2, i3))
  }

  def xyzgridshift(P: PJ): Unit = {
    val gridRefIsInput = P.params.s("grid_ref") match {
      case None | Some("input_crs") => true
      case Some("output_crs") => false
      case Some(_) => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "xyzgridshift: unsupported value for grid_ref")
    }
    if (!P.params.has("grids"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG, "xyzgridshift: +grids parameter missing")
    val multiplier = if (P.params.has("multiplier")) P.params.d("multiplier") else 1.0
    val grids: List[GenGrid] = P.params.s("grids").get.split(",").toList.flatMap { raw =>
      val canFail = raw.startsWith("@")
      val name = if (canFail) raw.substring(1) else raw
      try GenericGrids.load(name) match {
        case Some(g) => g
        case None =>
          if (canFail) Nil
          else throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
            s"xyzgridshift: could not find required grid $name")
      } catch {
        case _: GeoTiff.TiffError =>
          throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
            s"xyzgridshift: invalid grid $name")
      }
    }

    // geodetic <-> geocentric helper on this op's ellipsoid
    val cart = {
      val sub = Proj.create(new ParamList(Vector(
        "proj" -> "cart", "a" -> P.a.toString, "es" -> P.es.toString)))
      sub.skipFwdPrepare = true; sub.skipFwdFinalize = true
      sub.skipInvPrepare = true; sub.skipInvFinalize = true
      sub
    }

    P.left = IOUnits.CARTESIAN; P.right = IOUnits.CARTESIAN

    def gridValues(lam: Double, phi: Double): Array[Double] = {
      for (root <- grids) {
        if (GenericGrids.isPointInExtent(lam, phi, root)) {
          val g = GenericGrids.gridAt(root, lam, phi)
          if (g.samplesPerPixel < 3) return null
          var sx = 0; var sy = 1; var sz = 2
          var i = 0
          while (i < g.samplesPerPixel) {
            g.description(i) match {
              case "x_translation" => sx = i
              case "y_translation" => sy = i
              case "z_translation" => sz = i
              case _ => ()
            }
            i += 1
          }
          val unit = g.unit(sx)
          if (unit.nonEmpty && unit != "metre") return null
          val r = bilinear3Pub(g, lam, phi, sx, sy, sz)
          if (r == null) return null
          r(0) *= multiplier; r(1) *= multiplier; r(2) *= multiplier
          return r
        }
      }
      null
    }

    def direct(c: Coord, factor: Double): Unit = {
      val w = new Coord
      w.set(c.x, c.y, c.z, 0)
      cart.kernel.inv3(w)
      val d = gridValues(w.x, w.y)
      if (d == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
      c.x += factor * d(0); c.y += factor * d(1); c.z += factor * d(2)
    }

    def iterative(c: Coord, factor: Double): Unit = {
      val x0 = c.x; val y0 = c.y; val z0 = c.z
      var px = x0; var py = y0; var pz = z0
      var i = 0
      var done = false
      while (i < 10 && !done) {
        val w = new Coord
        w.set(px, py, pz, 0)
        cart.kernel.inv3(w)
        val d = gridValues(w.x, w.y)
        if (d == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
        val dx = d(0) * factor; val dy = d(1) * factor; val dz = d(2) * factor
        val err = (px - x0 - dx) * (px - x0 - dx) + (py - y0 - dy) * (py - y0 - dy) +
          (pz - z0 - dz) * (pz - z0 - dz)
        px = x0 + dx; py = y0 + dy; pz = z0 + dz
        if (err < 1e-10) done = true
        i += 1
      }
      c.x = px; c.y = py; c.z = pz
    }

    P.kernel = new OpKernel {
      val caps = FWD3 | INV3
      override def fwd3(c: Coord): Unit =
        if (gridRefIsInput) direct(c, 1.0) else iterative(c, 1.0)
      override def inv3(c: Coord): Unit =
        if (gridRefIsInput) iterative(c, -1.0) else direct(c, -1.0)
    }
  }
}

/** +proj=deformation — kinematic grid shift: ENU velocity grids × Δt applied
  * in the geocentric frame (reference src/transformations/deformation.cpp;
  * ENU->XYZ after Nørbech et al. 2003).
  */
object DeformationOps {
  import graft.proj.grids.GenericGrids
  import graft.proj.grids.GenericGrids.GenGrid

  def deformation(P: PJ): Unit = {
    val hasXY = P.params.has("xy_grids")
    val hasZ = P.params.has("z_grids")
    val hasG = P.params.has("grids")
    if (!hasG && (!hasXY || !hasZ))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG,
        "deformation: either +grids or (+xy_grids and +z_grids) should be specified")

    var generic: List[GenGrid] = Nil
    var hgrids: List[GridShiftOps.HGrid] = Nil
    var vgrids: List[GridShiftOps.VGrid] = Nil
    if (hasG) {
      generic = P.params.s("grids").get.split(",").toList.flatMap { raw =>
        val canFail = raw.startsWith("@")
        val name = if (canFail) raw.substring(1) else raw
        try GenericGrids.load(name).getOrElse {
          if (canFail) Nil
          else throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
            s"deformation: could not find required grid $name")
        } catch {
          case _: GeoTiff.TiffError =>
            throw ProjError(ProjErr.INVALID_OP_FILE_NOT_FOUND_OR_INVALID,
              s"deformation: invalid grid $name")
        }
      }
    } else {
      hgrids = GridShiftOps.loadHGrids(P.params.s("xy_grids").get)._1
      vgrids = GridShiftOps.loadVGrids(P.params.s("z_grids").get)._1
    }

    if (P.params.has("t_obs"))
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG,
        "deformation: +t_obs is deprecated, use +dt")
    val dt = if (P.params.has("dt")) P.params.d("dt") else Double.PositiveInfinity
    val tEpoch = if (P.params.has("t_epoch")) P.params.d("t_epoch") else Double.PositiveInfinity
    if (dt.isInfinity && tEpoch.isInfinity)
      throw ProjError(ProjErr.INVALID_OP_MISSING_ARG,
        "deformation: either +dt or +t_epoch needs to be set")
    if (!dt.isInfinity && !tEpoch.isInfinity)
      throw ProjError(ProjErr.INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS,
        "deformation: +dt and +t_epoch are mutually exclusive")

    val cart = {
      val sub = Proj.create(new ParamList(Vector(
        "proj" -> "cart", "a" -> P.a.toString, "es" -> P.es.toString)))
      sub.skipFwdPrepare = true; sub.skipFwdFinalize = true
      sub.skipInvPrepare = true; sub.skipInvFinalize = true
      sub
    }

    P.left = IOUnits.CARTESIAN; P.right = IOUnits.CARTESIAN

    /** ENU velocity (m/yr) rotated to geocentric XYZ at the given point;
      * null if the point falls outside the grids. */
    def gridShift(x: Double, y: Double, z: Double): Array[Double] = {
      val w = new Coord
      w.set(x, y, z, 0)
      cart.kernel.inv3(w)
      val lam = w.x; val phi = w.y
      var e = 0.0; var n = 0.0; var u = 0.0
      if (generic.nonEmpty) {
        var found: GenGrid = null
        for (root <- generic if found == null)
          if (GenericGrids.isPointInExtent(lam, phi, root))
            found = GenericGrids.gridAt(root, lam, phi)
        if (found == null) return null
        if (found.samplesPerPixel < 3) return null
        var sE = 0; var sN = 1; var sU = 2
        var i = 0
        while (i < found.samplesPerPixel) {
          found.description(i) match {
            case "east_velocity" => sE = i
            case "north_velocity" => sN = i
            case "up_velocity" => sU = i
            case _ => ()
          }
          i += 1
        }
        val unit = found.unit(sE)
        if (unit.nonEmpty && unit != "millimetres per year") return null
        val r = XyzGridShiftOps.bilinear3Pub(found, lam, phi, sE, sN, sU)
        if (r == null) return null
        e = r(0) / 1000; n = r(1) / 1000; u = r(2) / 1000
      } else {
        val (de, dn) = GridShiftOps.hgridValue(hgrids, lam, phi)
        if (de.isNaN) return null
        val dummy = new Coord
        val du = GridShiftOps.vgridValue(vgrids, lam, phi, 1.0, dummy)
        if (du.isNaN) return null
        // grid values are stored as mm/yr
        e = de / 1000; n = dn / 1000; u = du / 1000
      }
      val sp = math.sin(phi); val cp = math.cos(phi)
      val sl = math.sin(lam); val cl = math.cos(lam)
      Array(
        -sp * cl * n - sl * e + cp * cl * u,
        -sp * sl * n + cl * e + cp * sl * u,
        cp * n + sp * u)
    }

    def reverseShift(c: Coord, dtv: Double): Unit = {
      val inX = c.x; val inY = c.y; val inZ = c.z
      var delta = gridShift(inX, inY, inZ)
      if (delta == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
      val z0 = delta(2)
      var ox = inX - dtv * delta(0)
      var oy = inY - dtv * delta(1)
      var oz = inZ + dtv * delta(2)
      var i = 10
      var done = false
      while (i > 0 && !done) {
        delta = gridShift(ox, oy, oz)
        if (delta == null) done = true
        else {
          val difX = ox + dtv * delta(0) - inX
          val difY = oy + dtv * delta(1) - inY
          val difZ = oz - dtv * delta(2) - inZ
          ox += difX; oy += difY; oz += difZ
          i -= 1
          if (math.hypot(difX, difY) <= 1e-8) done = true
        }
      }
      c.x = ox; c.y = oy; c.z = inZ - dtv * z0
    }

    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      private def dtFor(c: Coord): Double =
        if (!dt.isInfinity) dt
        else if (c.t.isInfinite) { c.setError(ProjErr.COORD_TRANSFM_MISSING_TIME); Double.NaN }
        else c.t - tEpoch
      override def fwd4(c: Coord): Unit = {
        val dtv = dtFor(c)
        if (dtv.isNaN) return
        val shift = gridShift(c.x, c.y, c.z)
        if (shift == null) { c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_GRID); return }
        c.x += dtv * shift(0); c.y += dtv * shift(1); c.z += dtv * shift(2)
      }
      override def inv4(c: Coord): Unit = {
        val dtv = dtFor(c)
        if (dtv.isNaN) return
        reverseShift(c, dtv)
      }
    }
  }
}
