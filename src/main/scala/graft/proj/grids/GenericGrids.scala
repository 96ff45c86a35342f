package graft.proj.grids

import scala.collection.mutable

/** GeoTIFF-backed generic shift grids with subgrid hierarchy — the model
  * behind +proj=gridshift (and the GeoTIFF paths of hgridshift/vgridshift
  * and deformation).
  *
  * Mirrors reference src/grids.cpp GTiffGenericGrid/GenericShiftGridSet
  * (:2844-3095) and insertIntoHierarchy (:1396-1441).
  */
object GenericGrids {

  final class GenGrid(val ifd: GeoTiff.Ifd, val name: String) {
    val children = mutable.ListBuffer[GenGrid]()
    /** metadata fallback grid (first grid of the set), reference :2878-2884 */
    var firstGrid: GenGrid = null

    def width: Int = ifd.width
    def height: Int = ifd.height
    def samplesPerPixel: Int = ifd.samplesPerPixel
    def isGeographic: Boolean = ifd.isGeographic
    def west: Double = ifd.west
    def east: Double = ifd.east
    def south: Double = ifd.south
    def north: Double = ifd.north
    def resX: Double = ifd.resX
    def resY: Double = ifd.resY

    def metadataItem(key: String, sample: Int = -1): String = {
      val v = ifd.meta(key, sample)
      if (v.isEmpty && firstGrid != null) firstGrid.metadataItem(key, sample) else v
    }
    def gridType: String = metadataItem("TYPE")
    def unit(sample: Int): String = metadataItem("UNITTYPE", sample)
    def description(sample: Int): String = metadataItem("DESCRIPTION", sample)

    def valueAt(x: Int, y: Int, sample: Int): Float = ifd.valueAt(sample, x, y)

    /** window read; false + flag like the reference valuesAt (:673-689). */
    def valuesAt(xStart: Int, yStart: Int, xCount: Int, yCount: Int,
                 sampleIdx: Array[Int], nSamples: Int,
                 out: Array[Double]): Boolean = {
      var k = 0
      var y = yStart
      while (y < yStart + yCount) {
        var x = xStart
        while (x < xStart + xCount) {
          var s = 0
          while (s < nSamples) {
            val v = ifd.valueAt(sampleIdx(s), x, y)
            if (ifd.isNodata(v)) return false
            out(k) = v
            k += 1
            s += 1
          }
          x += 1
        }
        y += 1
      }
      true
    }

    def contains(e: GenGrid): Boolean =
      west <= e.west && east >= e.east && south <= e.south && north >= e.north
  }

  /** point-in-extent with geographic 2-pi wrap (reference :1691-1705). */
  def isPointInExtent(x0: Double, y: Double, g: GenGrid, eps: Double = 0): Boolean = {
    if (!(y + eps >= g.south && y - eps <= g.north)) return false
    var x = x0
    if (g.isGeographic) {
      if (x + eps < g.west) x += 2 * math.Pi
      else if (x - eps > g.east) x -= 2 * math.Pi
    }
    x + eps >= g.west && x - eps <= g.east
  }

  /** open a GeoTIFF grid file into its top-level grid hierarchy. */
  def open(bytes: Array[Byte], name: String): List[GenGrid] = {
    val ifds = GeoTiff.parse(bytes)
    val tops = mutable.ListBuffer[GenGrid]()
    val byName = mutable.Map[String, GenGrid]()
    var first: GenGrid = null
    var idx = 0
    for (ifd <- ifds) {
      idx += 1
      // skip overviews/masks: only plain images and FILETYPE_PAGE
      val usable = ifd.subfileType == 0 || ifd.subfileType == 2
      if (!usable) {
        if (idx == 1) throw new GeoTiff.TiffError("invalid subfileType")
      } else {
        val g = new GenGrid(ifd, s"$name (index $idx)")
        if (first == null) first = g
        else if (g.ifd.meta("TYPE").isEmpty && first.ifd.meta("TYPE").nonEmpty)
          g.firstGrid = first
        val gridName = g.ifd.meta("grid_name")
        val parentName = g.ifd.meta("parent_grid_name")
        insertIntoHierarchy(g, gridName, parentName, tops, byName)
      }
    }
    if (tops.isEmpty) throw new GeoTiff.TiffError("no usable grid")
    tops.toList
  }

  /** reference insertIntoHierarchy :1396-1441 */
  private def insertIntoHierarchy(g: GenGrid, gridName: String, parentName: String,
                                  tops: mutable.ListBuffer[GenGrid],
                                  byName: mutable.Map[String, GenGrid]): Unit = {
    if (gridName.nonEmpty) byName(gridName) = g
    if (parentName.nonEmpty) {
      byName.get(parentName) match {
        case Some(p) if p.contains(g) => p.children += g; return
        case _ => () // fall through to bounding-box method
      }
    } else if (gridName.nonEmpty) {
      tops += g; return
    }
    val typ = g.metadataItem("TYPE")
    for (cand <- tops) {
      if ((typ.isEmpty || cand.metadataItem("TYPE") == typ) && cand.contains(g)) {
        insertByBBox(cand, g); return
      }
    }
    tops += g
  }

  private def insertByBBox(parent: GenGrid, g: GenGrid): Unit = {
    for (child <- parent.children)
      if (child.contains(g)) { insertByBBox(child, g); return }
    parent.children += g
  }

  /** descend to the most specific (sub)grid containing the point. */
  def gridAt(g: GenGrid, x: Double, y: Double): GenGrid = {
    var cur = g
    var descended = true
    while (descended) {
      descended = false
      val it = cur.children.iterator
      while (it.hasNext && !descended) {
        val ch = it.next()
        if (isPointInExtent(x, y, ch)) { cur = ch; descended = true }
      }
    }
    cur
  }


  /** resolve + cache one grid name, via the pluggable grid source (local
    * search roots by default; cloud fetchers swap in without touching the
    * kernels). */
  def load(filename: String): Option[List[GenGrid]] = {
    val key = "gen|" + graft.proj.ops.GridShiftOps.cacheScope + filename
    GridCache.get[List[GenGrid]](key).orElse(
      graft.proj.ops.GridShiftOps.activeSource.fetch(filename).map { bytes =>
        GridCache.put(key, open(bytes, filename), bytes.length.toLong)
      })
  }
}
