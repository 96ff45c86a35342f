package graft.index

/** Web-Mercator slippy tiles z/x/y, derived from the webmerc kernel math
  * (reference src/projections/merc.cpp:24-28). Pure functions. */
object SlippyTile {
  /** tile x at zoom z for longitude in degrees. */
  def tileX(lonDeg: Double, z: Int): Long = {
    val n = 1L << z
    val v = math.floor((lonDeg + 180.0) / 360.0 * n).toLong
    if (v < 0) 0 else if (v >= n) n - 1 else v
  }

  /** tile y at zoom z for latitude in degrees (Web-Mercator clip at
    * ±85.0511°). */
  def tileY(latDeg: Double, z: Int): Long = {
    val n = 1L << z
    val latRad = math.toRadians(math.max(-85.05112878, math.min(85.05112878, latDeg)))
    val v = math.floor((1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n).toLong
    if (v < 0) 0 else if (v >= n) n - 1 else v
  }

  /** packed tile key: z in the top 6 bits, then x and y (29 bits each). */
  def tileKey(lonDeg: Double, latDeg: Double, z: Int): Long =
    (z.toLong << 58) | (tileX(lonDeg, z) << 29) | tileY(latDeg, z)

  def keyZ(key: Long): Int = (key >>> 58).toInt
  def keyX(key: Long): Long = (key >>> 29) & ((1L << 29) - 1)
  def keyY(key: Long): Long = key & ((1L << 29) - 1)

  /** tile bounds in degrees: (minLon, minLat, maxLon, maxLat). */
  def tileBounds(z: Int, x: Long, y: Long): (Double, Double, Double, Double) = {
    val n = (1L << z).toDouble
    def lon(xx: Double) = xx / n * 360.0 - 180.0
    def lat(yy: Double) = math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yy / n))))
    (lon(x.toDouble), lat(y + 1.0), lon(x + 1.0), lat(y.toDouble))
  }
}
