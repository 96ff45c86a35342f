package graft.proj.grids

/** GeoPackage triangulation loader for +proj=tinshift (reference
  * src/transformations/tinshift_gpkg.cpp): reads gpkg_metadata (the
  * proj.org JSON entry), the vertices table (fid, POINT geom, target/offset
  * columns) and triangles_def (vertex fid references) through the minimal
  * Sqlite reader, then reassembles the triangulation-JSON model so the
  * battle-tested JSON TinModel evaluates GeoPackage files identically
  * (numbers via Double.toString — round-trip exact). The GPKG geometry blob
  * and SQLite formats are public specifications.
  */
object TinshiftGpkg {

  final class GpkgError(msg: String) extends RuntimeException(msg)

  /** GeoPackage geometry blob -> (x, y) of a 2D/3D POINT. */
  private def pointOf(blob: Array[Byte]): (Double, Double) = {
    if (blob == null || blob.length < 21 || blob(0) != 'G' || blob(1) != 'P')
      throw new GpkgError("not a GPKG geometry blob")
    val flags = blob(3) & 0xff
    val envLen = ((flags >> 1) & 7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case _ => throw new GpkgError("invalid envelope indicator")
    }
    val wkbOff = 8 + envLen
    if (blob.length < wkbOff + 21) throw new GpkgError("truncated geometry blob")
    val bb = java.nio.ByteBuffer.wrap(blob)
    bb.order(if (blob(wkbOff) == 1) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    if ((bb.getInt(wkbOff + 1) & 0xffff) % 1000 != 1)
      throw new GpkgError("geometry is not a POINT")
    (bb.getDouble(wkbOff + 5), bb.getDouble(wkbOff + 13))
  }

  /** reassemble the triangulation JSON from the GeoPackage tables. */
  def toTriangulationJson(bytes: Array[Byte]): String = {
    val db = new Sqlite.Db(bytes)

    val metaT = db.table("gpkg_metadata")
      .getOrElse(throw new GpkgError("no gpkg_metadata table"))
    val uriIdx = metaT.columns.indexOf("md_standard_uri")
    val mdIdx = metaT.columns.indexOf("metadata")
    if (uriIdx < 0 || mdIdx < 0) throw new GpkgError("gpkg_metadata misses columns")
    val metadata = metaT.rows.collectFirst {
      case (_, row) if row(uriIdx) == "https://proj.org" &&
        row(mdIdx).isInstanceOf[String] => row(mdIdx).asInstanceOf[String]
    }.getOrElse(throw new GpkgError("no proj.org metadata entry"))
    val metaTrim = metadata.trim
    if (!metaTrim.startsWith("{") || !metaTrim.endsWith("}"))
      throw new GpkgError("metadata is not a JSON object")

    val vt = db.table("vertices").getOrElse(throw new GpkgError("no vertices table"))
    val geomIdx = vt.columns.indexOf("geom")
    val fidIdx = vt.columns.indexOf("fid")
    if (geomIdx < 0) throw new GpkgError("vertices misses geom column")
    val extraCols = vt.columns.zipWithIndex
      .filter { case (c, _) => c != "fid" && c != "geom" }

    def num(v: Any): Double = v match {
      case d: java.lang.Double => d.doubleValue
      case l: java.lang.Long => l.toDouble
      case _ => throw new GpkgError("non-numeric vertex value")
    }
    val fidToPos = scala.collection.mutable.LongMap.empty[Int]
    val vRows = vt.rows.zipWithIndex.map { case ((rowid, row), pos) =>
      val fid = if (fidIdx >= 0) num(row(fidIdx)).toLong else rowid
      fidToPos(fid) = pos
      val (x, y) = pointOf(row(geomIdx) match {
        case b: Array[Byte] => b
        case _ => throw new GpkgError("geom is not a blob")
      })
      (x, y, extraCols.map { case (_, i) => num(row(i)) })
    }

    val tt = db.table("triangles_def").getOrElse(throw new GpkgError("no triangles_def table"))
    val iv = Seq("idx_vertex1", "idx_vertex2", "idx_vertex3").map(tt.columns.indexOf)
    if (iv.exists(_ < 0)) throw new GpkgError("triangles_def misses idx_vertex columns")
    val tRows = tt.rows.map { case (_, row) =>
      iv.map { i =>
        val fid = num(row(i)).toLong
        fidToPos.getOrElse(fid, throw new GpkgError(s"triangle references unknown vertex $fid"))
      }
    }

    val sb = new StringBuilder(metaTrim.dropRight(1))
    sb.append(",\"vertices_columns\":[\"source_x\",\"source_y\"")
    extraCols.foreach { case (c, _) => sb.append(",\"").append(c).append("\"") }
    sb.append("],\"triangles_columns\":[\"idx_vertex1\",\"idx_vertex2\",\"idx_vertex3\"]")
    sb.append(",\"vertices\":[")
    var first = true
    for ((x, y, extras) <- vRows) {
      if (!first) sb.append(',')
      first = false
      sb.append('[').append(x).append(',').append(y)
      extras.foreach(v => sb.append(',').append(v))
      sb.append(']')
    }
    sb.append("],\"triangles\":[")
    first = true
    for (t <- tRows) {
      if (!first) sb.append(',')
      first = false
      sb.append('[').append(t(0)).append(',').append(t(1)).append(',').append(t(2)).append(']')
    }
    sb.append("]}")
    sb.toString
  }
}
