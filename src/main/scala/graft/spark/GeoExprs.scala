package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.core.Geodesic
import graft.index.{S2CellId, SlippyTile}
import graft.proj.ops.TmercOps

/** Static per-row kernels reached from generated code. */
object GeoKernels {
  def s2Cell(lon: Double, lat: Double, level: Int): Long =
    S2CellId.cellId(lon, lat, level)

  def tileKey(lon: Double, lat: Double, z: Int): Long =
    SlippyTile.tileKey(lon, lat, z)

  def utmZone(lon: Double): Int = TmercOps.zoneFromLonLat(lon)

  def geodesicDist(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    Geodesic.WGS84.distance(lat1, lon1, lat2, lon2)

  /** S2 face + (u,v) face coordinates for a lon/lat degree pair — the
    * closed-form part of the cell mapping (reference s2 projection math),
    * exposed for the SQL-expressible driver oracle; the Hilbert-curve id
    * itself is locked by ScalaCheck bijectivity tests. */
  def s2FaceUv(lon: Double, lat: Double): InternalRow = {
    val lam = math.toRadians(lon)
    val phi = math.toRadians(lat)
    val cosLat = math.cos(phi)
    val x = cosLat * math.cos(lam)
    val y = cosLat * math.sin(lam)
    val z = math.sin(phi)
    val f = graft.proj.ops.DggOps.faceOf(x, y, z)
    val (u, v) = graft.proj.ops.DggOps.validFaceXyzToUv(f, x, y, z)
    new GenericInternalRow(Array[Any](f, u, v))
  }

  /** cell + `rings` rings of neighbors at `level` around a lon/lat point —
    * the kNN candidate expansion, as a codegen-able kernel (was a ScalaUDF,
    * which broke whole-stage codegen on the query side of knnJoin). */
  def ringCells(lon: Double, lat: Double, level: Int, rings: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      S2CellId.ringCells(S2CellId.cellId(lon, lat, level), rings))

  /** S2 cell cover of a polygon ring at `level` (executor-side; the
    * distributed pipJoin path — no driver collect). Small rings take the
    * bbox sampling fast path; large ones go through the quadtree interior
    * cover (SpatialJoins.coverRing), which prunes bbox rectangles outside
    * the polygon — a concave or elongated ring no longer drags its whole
    * bounding box of candidate cells into the join. Adaptive sampling +
    * one neighbor ring guarantees completeness either way; pick `level`
    * near the polygon scale (cells ~ polygon size). */
  def coverCells(ring: ArrayData, level: Int): ArrayData = {
    val n = ring.numElements() / 2
    val lons = new Array[Double](n); val lats = new Array[Double](n)
    var i = 0
    while (i < n) {
      lons(i) = ring.getDouble(2 * i); lats(i) = ring.getDouble(2 * i + 1)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SpatialJoins.coverRing(lons, lats, level).toArray)
  }

  /** `n+1` waypoints (including both endpoints) along the WGS84 geodesic
    * from point 1 to point 2, equally spaced in distance — the line-walking
    * primitive (geodesic densification for edge sampling / antimeridian-
    * safe interpolation). Returns a flat [lon0, lat0, lon1, lat1, ...]. */
  def geodesicWaypoints(lon1: Double, lat1: Double,
                        lon2: Double, lat2: Double, n: Int): ArrayData = {
    require(n >= 1, s"geodesicWaypoints: n must be >= 1 (got $n)")
    val g = Geodesic.WGS84
    val inv = g.inverse(lat1, lon1, lat2, lon2)
    val line = new graft.core.Line(g, lat1, lon1, inv._2)
    val out = new Array[Double](2 * (n + 1))
    val pos = new Array[Double](10)
    var k = 0
    while (k <= n) {
      if (k == 0) { out(0) = lon1; out(1) = lat1 }
      else if (k == n) { out(2 * n) = lon2; out(2 * n + 1) = lat2 }
      else {
        line.position(arcMode = false, inv._1 * k / n, pos)
        out(2 * k) = pos(1); out(2 * k + 1) = pos(0)
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Geodesic perimeter + area of a flat [lon, lat, ...] ring on WGS84
    * (Karney planimeter; counter-clockwise positive). */
  def polygonMetrics(ring: ArrayData): InternalRow = {
    val p = new graft.core.PolygonArea(Geodesic.WGS84)
    val n = ring.numElements() / 2
    var i = 0
    while (i < n) {
      p.addPoint(ring.getDouble(2 * i + 1), ring.getDouble(2 * i))
      i += 1
    }
    val (per, area) = p.compute()
    new GenericInternalRow(Array[Any](per, area))
  }

  /** Exact even-odd ray cast in lon/lat space; rings as flat
    * [lon0, lat0, lon1, lat1, ...]. Matches the classic point-in-polygon
    * semantics used for the PIP verification pass. */
  def pointInRing(lon: Double, lat: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements() / 2
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring.getDouble(2 * i); val yi = ring.getDouble(2 * i + 1)
      val xj = ring.getDouble(2 * j); val yj = ring.getDouble(2 * j + 1)
      if (((yi > lat) != (yj > lat)) &&
          (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Flat-top hexagonal binning over plane coordinates (e.g. web-mercator
    * metres) → axial (q, r). The H3-style hierarchical hex index family is
    * represented honestly: an axial hex grid with cube rounding (the
    * published hex-grid algebra), NOT a bit-compatible H3 clone — H3's 122
    * base-cell tables are library data, not derivable math. Rounding uses
    * floor(v + 0.5) explicitly so an independent SQL engine reproduces the
    * assignment bit-for-bit. */
  def hexBin(x: Double, y: Double, size: Double): InternalRow = {
    val fq = (2.0 / 3.0 * x) / size
    val fr = (-1.0 / 3.0 * x + math.sqrt(3.0) / 3.0 * y) / size
    val fs = -fq - fr
    var rq = math.floor(fq + 0.5)
    var rr = math.floor(fr + 0.5)
    var rs = math.floor(fs + 0.5)
    val dq = math.abs(rq - fq); val dr = math.abs(rr - fr); val ds = math.abs(rs - fs)
    if (dq > dr && dq > ds) rq = -rr - rs
    else if (dr > ds) rr = -rq - rs
    else rs = -rq - rr
    new GenericInternalRow(Array[Any](rq.toInt, rr.toInt))
  }

  /** Center (x, y) of axial hex (q, r) at `size` (circumradius) — the
    * inverse anchor of hexBin: hexBin(hexCenter(q, r)) == (q, r). */
  def hexCenter(q: Int, r: Int, size: Double): InternalRow = {
    val x = size * 1.5 * q
    val y = size * math.sqrt(3.0) * (r + q / 2.0)
    new GenericInternalRow(Array[Any](x, y))
  }

  /** All axial hexes within `rings` grid steps of (q, r) — 3n(n+1)+1 cells,
    * the hex analogue of S2 ringCells for kNN candidate expansion. Returns
    * array<struct<q, r>>. */
  def hexRing(q: Int, r: Int, rings: Int): ArrayData = {
    require(rings >= 0, s"hexRing: rings must be >= 0 (got $rings)")
    val out = new Array[Any]((3 * rings * (rings + 1)) + 1)
    var i = 0
    var dq = -rings
    while (dq <= rings) {
      var dr = math.max(-rings, -dq - rings)
      val hi = math.min(rings, -dq + rings)
      while (dr <= hi) {
        out(i) = new GenericInternalRow(Array[Any](q + dq, r + dr))
        i += 1
        dr += 1
      }
      dq += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Shared base for codegen-able scalar geo expressions: children evaluated,
  * then one static call into GeoKernels. Declares input types so the
  * analyzer coerces SQL arguments (e.g. a BIGINT level literal) instead of
  * crashing codegen / interpreted eval with a ClassCastException. */
abstract class GeoStaticCall extends Expression
    with org.apache.spark.sql.graftbridge.PublicInputTypes {
  def staticCall: String // e.g. "s2Cell"
  override def nullable: Boolean = children.exists(_.nullable)

  protected def evalArgs(input: InternalRow): Array[Any] = {
    val out = new Array[Any](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      out(i) = v
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codes = children.map(_.genCode(ctx))
    val kern = GeoKernels.getClass.getName + ".MODULE$"
    val anyNull = codes.map(_.isNull).mkString(" || ")
    val args = codes.map(_.value).mkString(", ")
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    val childCode = codes.map(_.code).reduce(_ + _)
    val code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        $javaType ${ev.value} = ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) {
          ${ev.value} = $kern.$staticCall($args);
        }
      """
    ev.copy(code = code)
  }
}

case class S2CellExpr(lon: Expression, lat: Expression, level: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon, lat, level)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def staticCall: String = "s2Cell"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.s2Cell(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2))
}

case class TileKeyExpr(lon: Expression, lat: Expression, z: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon, lat, z)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def staticCall: String = "tileKey"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.tileKey(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2))
}

case class UtmZoneExpr(lon: Expression) extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon)
  override def inputSpec: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def staticCall: String = "utmZone"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null else GeoKernels.utmZone(a(0).asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0))
}

case class GeodesicDistExpr(lon1: Expression, lat1: Expression,
                            lon2: Expression, lat2: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon1, lat1, lon2, lat2)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def staticCall: String = "geodesicDist"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.geodesicDist(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[Double], a(3).asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2), c(3))
}

case class S2FaceUvExpr(lon: Expression, lat: Expression) extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon, lat)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("face", IntegerType, nullable = false),
    StructField("u", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false)))
  override def staticCall: String = "s2FaceUv"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.s2FaceUv(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1))
}

case class RingCellsExpr(lon: Expression, lat: Expression,
                         level: Expression, rings: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon, lat, level, rings)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def staticCall: String = "ringCells"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.ringCells(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[Int], a(3).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2), c(3))
}

case class GeodesicWaypointsExpr(lon1: Expression, lat1: Expression,
                                 lon2: Expression, lat2: Expression,
                                 n: Expression) extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon1, lat1, lon2, lat2, n)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def staticCall: String = "geodesicWaypoints"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.geodesicWaypoints(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[Double], a(3).asInstanceOf[Double], a(4).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2), c(3), c(4))
}

case class PolygonMetricsExpr(ring: Expression) extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(ring)
  override def inputSpec: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("perimeter_m", DoubleType, nullable = false),
    StructField("area_m2", DoubleType, nullable = false)))
  override def staticCall: String = "polygonMetrics"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.polygonMetrics(a(0).asInstanceOf[ArrayData])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0))
}

case class CoverCellsExpr(ring: Expression, level: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(ring, level)
  override def inputSpec: Seq[DataType] = Seq(ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def staticCall: String = "coverCells"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.coverCells(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1))
}

case class PointInRingExpr(lon: Expression, lat: Expression, ring: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(lon, lat, ring)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, ArrayType(DoubleType))
  override def dataType: DataType = BooleanType
  override def staticCall: String = "pointInRing"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.pointInRing(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[ArrayData])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2))
}

case class HexBinExpr(x: Expression, y: Expression, size: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(x, y, size)
  override def inputSpec: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("q", IntegerType, nullable = false),
    StructField("r", IntegerType, nullable = false)))
  override def staticCall: String = "hexBin"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.hexBin(a(0).asInstanceOf[Double], a(1).asInstanceOf[Double],
      a(2).asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2))
}

case class HexCenterExpr(q: Expression, r: Expression, size: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(q, r, size)
  override def inputSpec: Seq[DataType] = Seq(IntegerType, IntegerType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  override def staticCall: String = "hexCenter"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.hexCenter(a(0).asInstanceOf[Int], a(1).asInstanceOf[Int],
      a(2).asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2))
}

case class HexRingExpr(q: Expression, r: Expression, rings: Expression)
    extends GeoStaticCall {
  override def children: Seq[Expression] = Seq(q, r, rings)
  override def inputSpec: Seq[DataType] = Seq(IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", IntegerType, nullable = false),
    StructField("r", IntegerType, nullable = false))), containsNull = false)
  override def staticCall: String = "hexRing"
  override def eval(input: InternalRow): Any = {
    val a = evalArgs(input)
    if (a == null) null
    else GeoKernels.hexRing(a(0).asInstanceOf[Int], a(1).asInstanceOf[Int],
      a(2).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(c(0), c(1), c(2))
}

/** Column API for the geo expressions. */
object GeoFunctions {
  import org.apache.spark.sql.graftbridge.Bridge
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  /** S2 cell id at `level` from lon/lat degree columns. */
  def s2Cell(lon: Column, lat: Column, level: Column): Column =
    col(S2CellExpr(ex(lon), ex(lat), ex(level)))

  /** packed web-mercator tile key (z | x | y). */
  def tileKey(lon: Column, lat: Column, z: Column): Column =
    col(TileKeyExpr(ex(lon), ex(lat), ex(z)))

  /** UTM zone 1..60 inferred from longitude (reference tmerc.cpp:656-662). */
  def utmZone(lon: Column): Column = col(UtmZoneExpr(ex(lon)))

  /** Karney geodesic distance in metres on WGS84 between two lon/lat pairs. */
  def geodesicDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    col(GeodesicDistExpr(ex(lon1), ex(lat1), ex(lon2), ex(lat2)))

  /** exact even-odd point-in-polygon over a flat [lon,lat,...] ring array. */
  def pointInRing(lon: Column, lat: Column, ring: Column): Column =
    col(PointInRingExpr(ex(lon), ex(lat), ex(ring)))

  /** S2 face + (u,v) face coordinates: struct(face, u, v). */
  def s2FaceUv(lon: Column, lat: Column): Column =
    col(S2FaceUvExpr(ex(lon), ex(lat)))

  /** array of the point's cell and its `rings` neighbor rings at `level`. */
  def ringCells(lon: Column, lat: Column, level: Column, rings: Column): Column =
    col(RingCellsExpr(ex(lon), ex(lat), ex(level), ex(rings)))

  /** S2 cover of a flat-ring polygon's bbox at `level` (executor-side). */
  def coverCells(ring: Column, level: Column): Column =
    col(CoverCellsExpr(ex(ring), ex(level)))

  /** geodesic perimeter + area of a flat [lon,lat,...] ring on WGS84:
    * struct(perimeter_m, area_m2); counter-clockwise area is positive. */
  def polygonMetrics(ring: Column): Column = col(PolygonMetricsExpr(ex(ring)))

  /** n+1 equally-spaced waypoints along the WGS84 geodesic between two
    * lon/lat points, as a flat [lon,lat,...] array. */
  def geodesicWaypoints(lon1: Column, lat1: Column,
                        lon2: Column, lat2: Column, n: Column): Column =
    col(GeodesicWaypointsExpr(ex(lon1), ex(lat1), ex(lon2), ex(lat2), ex(n)))

  /** flat-top axial hex bin of plane (x, y) at `size`: struct(q, r). */
  def hexBin(x: Column, y: Column, size: Column): Column =
    col(HexBinExpr(ex(x), ex(y), ex(size)))

  /** center (x, y) of axial hex (q, r) at `size`: struct(x, y). */
  def hexCenter(q: Column, r: Column, size: Column): Column =
    col(HexCenterExpr(ex(q), ex(r), ex(size)))

  /** all hexes within `rings` grid steps of (q, r): array<struct<q, r>>. */
  def hexRing(q: Column, r: Column, rings: Column): Column =
    col(HexRingExpr(ex(q), ex(r), ex(rings)))

  /** Global equal-area hex cell: lon/lat → ISEA (icosahedral Snyder
    * equal-area, the published substrate of H3-style grids; gie-verified
    * op) → flat-top axial hex bin in the ISEA plane. Equal-area hexagonal
    * cells over the whole globe — the honest H3 alternative (reference
    * src/projections/isea.cpp:962). `sizeM` is the hex circumradius in
    * ISEA plane metres. */
  def globalHexCell(lon: Column, lat: Column, sizeM: Column): Column = {
    val p = ProjFunctions.projTrans2(lon, lat, "proj=isea ellps=WGS84")
    hexBin(p.getField("x"), p.getField("y"), sizeM)
  }

  /** full proj pipeline transform — re-export for one-stop import. */
  def projTrans2(lon: Column, lat: Column, pipeline: String): Column =
    ProjFunctions.projTrans2(lon, lat, pipeline)
}
