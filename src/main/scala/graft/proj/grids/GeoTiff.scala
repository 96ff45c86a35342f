package graft.proj.grids

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal GeoTIFF reader for PROJ-style shift grids.
  *
  * Supports the subset the reference's grid loader handles
  * (src/grids.cpp GTiffGrid/GTiffDataset :442-1340): classic TIFF, both
  * endiannesses, strips and tiles, contiguous or separate planes, none/
  * deflate compression with predictors 1/2/3, int16/uint16/int32/uint32/
  * float32/float64 samples, per-sample GDAL scale/offset, GDAL_METADATA
  * XML items, GeoPixelScale+GeoTiePoints or GeoTransformationMatrix
  * georeferencing, GTModelTypeGeoKey and GTRasterTypeGeoKey handling.
  * The TIFF and GeoTIFF formats are public specifications.
  */
object GeoTiff {

  final class TiffError(msg: String) extends RuntimeException(msg)

  /** one image directory = one (sub)grid */
  final class Ifd(
      val width: Int, val height: Int,
      val samplesPerPixel: Int, val bitsPerSample: Int, val sampleFormat: Int,
      val planarSeparate: Boolean, val compression: Int, val predictor: Int,
      val tiled: Boolean, val blockWidth: Int, val blockHeight: Int,
      val blockOffsets: Array[Long], val blockCounts: Array[Long],
      val subfileType: Long,
      /** (sample, name) -> value; sample = -1 for dataset-level items */
      val metadata: Map[(Int, String), String],
      val noData: Option[Float],
      val scales: Array[Double], val offsets: Array[Double],
      val isGeographic: Boolean, val bottomUp: Boolean,
      // extent in radians (geographic) or CRS units; row 0 = south
      val west: Double, val south: Double, val east: Double, val north: Double,
      val resX: Double, val resY: Double,
      bytes: Array[Byte], littleEndian: Boolean) {

    private val order = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    private val blocksPerRow = (width + blockWidth - 1) / blockWidth
    private val bytesPerSample = bitsPerSample / 8
    private val blockCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

    def meta(key: String, sample: Int = -1): String =
      metadata.getOrElse((sample, key), "")

    private def decodeBlock(blockId: Int): Array[Byte] = {
      val cached = blockCache.get(blockId)
      if (cached != null) return cached
      val off = blockOffsets(blockId)
      val cnt = blockCounts(blockId).toInt
      val sppInBlock = if (planarSeparate) 1 else samplesPerPixel
      val expected = blockWidth * blockHeight * sppInBlock * bytesPerSample
      val raw: Array[Byte] = compression match {
        case 1 =>
          java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + cnt)
        case 8 | 32946 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(bytes, off.toInt, cnt)
          val out = new Array[Byte](expected)
          var total = 0
          while (total < expected && !inf.finished()) {
            val n = inf.inflate(out, total, expected - total)
            if (n == 0 && inf.needsInput()) throw new TiffError("truncated deflate block")
            total += n
          }
          inf.end()
          out
        case c => throw new TiffError(s"unsupported compression $c")
      }
      val full = if (raw.length >= expected) raw else java.util.Arrays.copyOf(raw, expected)
      applyPredictor(full, sppInBlock)
      blockCache.putIfAbsent(blockId, full)
      full
    }

    private def applyPredictor(buf: Array[Byte], sppInBlock: Int): Unit = {
      if (predictor == 2) {
        // horizontal differencing on integer samples
        val rowBytes = blockWidth * sppInBlock * bytesPerSample
        // NB: absolute get/put indices on a wrapped ByteBuffer address the
        // backing array from 0, so every index must be base-relative.
        val bb = ByteBuffer.wrap(buf).order(order)
        var row = 0
        while (row < blockHeight) {
          val base = row * rowBytes
          bytesPerSample match {
            case 2 =>
              var i = sppInBlock
              while (i < blockWidth * sppInBlock) {
                bb.putShort(base + 2 * i,
                  (bb.getShort(base + 2 * i) + bb.getShort(base + 2 * (i - sppInBlock))).toShort)
                i += 1
              }
            case 4 =>
              var i = sppInBlock
              while (i < blockWidth * sppInBlock) {
                bb.putInt(base + 4 * i, bb.getInt(base + 4 * i) + bb.getInt(base + 4 * (i - sppInBlock)))
                i += 1
              }
            case _ => throw new TiffError("predictor 2 with unsupported sample size")
          }
          row += 1
        }
      } else if (predictor == 3) {
        // floating-point predictor: per row, byte-plane split + differencing
        val rowBytes = blockWidth * sppInBlock * bytesPerSample
        val tmp = new Array[Byte](rowBytes)
        var row = 0
        while (row < blockHeight) {
          val base = row * rowBytes
          var i = 1
          while (i < rowBytes) { buf(base + i) = (buf(base + i) + buf(base + i - 1)).toByte; i += 1 }
          // bytes are split by plane (big-endian order); reinterleave
          val n = blockWidth * sppInBlock
          var b = 0
          while (b < bytesPerSample) {
            var k = 0
            while (k < n) {
              val src = base + b * n + k
              val dstOff = k * bytesPerSample +
                (if (order == ByteOrder.LITTLE_ENDIAN) bytesPerSample - 1 - b else b)
              tmp(dstOff) = buf(src)
              k += 1
            }
            b += 1
          }
          System.arraycopy(tmp, 0, buf, base, rowBytes)
          row += 1
        }
      } else if (predictor != 1 && predictor != 0) {
        throw new TiffError(s"unsupported predictor $predictor")
      }
    }

    def isNodata(v: Float): Boolean = noData.exists(_ == v)

    /** sample value at (x, yFromBottom); honors bottomUp + scale/offset. */
    def valueAt(sample: Int, x: Int, yFromBottom: Int): Float = {
      val yTiff = if (bottomUp) yFromBottom else height - 1 - yFromBottom
      val blockX = x / blockWidth; val xOff = x % blockWidth
      val blockY = yTiff / blockHeight; val yOff = yTiff % blockHeight
      var blockId = blockY * blocksPerRow + blockX
      if (planarSeparate) blockId += sample * (blocksPerRow * ((height + blockHeight - 1) / blockHeight))
      val buf = decodeBlock(blockId)
      var offInBlock = xOff + yOff * blockWidth
      if (!planarSeparate) offInBlock = offInBlock * samplesPerPixel + sample
      val bb = ByteBuffer.wrap(buf).order(order)
      val raw: Double = (sampleFormat, bitsPerSample) match {
        case (2, 16) => bb.getShort(2 * offInBlock).toDouble
        case (1, 16) => (bb.getShort(2 * offInBlock) & 0xffff).toDouble
        case (2, 32) => bb.getInt(4 * offInBlock).toDouble
        case (1, 32) => (bb.getInt(4 * offInBlock) & 0xffffffffL).toDouble
        case (3, 32) => bb.getFloat(4 * offInBlock).toDouble
        case (3, 64) => bb.getDouble(8 * offInBlock)
        case _ => throw new TiffError("unsupported sample type")
      }
      val asF = raw.toFloat
      if ((noData.isEmpty || asF != noData.get) && sample < scales.length)
        (raw * scales(sample) + offsets(sample)).toFloat
      else asF
    }
  }

  private final val DEG2RAD = math.Pi / 180.0

  /** Parse all usable IFDs of a (Geo)TIFF byte array. */
  def parse(bytes: Array[Byte]): List[Ifd] =
    try parseImpl(bytes)
    catch {
      case e: TiffError => throw e
      case e: IndexOutOfBoundsException => throw new TiffError(s"truncated TIFF: $e")
      case e: java.nio.BufferUnderflowException => throw new TiffError(s"truncated TIFF: $e")
      case e: NegativeArraySizeException => throw new TiffError(s"corrupt TIFF: $e")
    }

  private def parseImpl(bytes: Array[Byte]): List[Ifd] = {
    if (bytes.length < 8) throw new TiffError("not a TIFF")
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) throw new TiffError("not a TIFF")
    val bb = ByteBuffer.wrap(bytes).order(
      if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val version = bb.getShort(2)
    val big = version == 43 // BigTIFF: 8-byte offsets, 20-byte IFD entries
    if (version != 42 && !big) throw new TiffError("not a TIFF")
    if (big && (bb.getShort(4) != 8 || bb.getShort(6) != 0))
      throw new TiffError("invalid BigTIFF header")
    var ifdOff: Long = if (big) bb.getLong(8) else bb.getInt(4).toLong & 0xffffffffL
    val out = mutable.ListBuffer[Ifd]()
    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 6 -> 1, 7 -> 1,
      8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8, 16 -> 8, 17 -> 8)
    var guard = 0
    var stop = false
    while (ifdOff != 0 && guard < 1000 && !stop) {
      try {
      guard += 1
      val n = if (big) bb.getLong(ifdOff.toInt).toInt else bb.getShort(ifdOff.toInt) & 0xffff
      val entrySize = if (big) 20 else 12
      val headSize = if (big) 8 else 2
      final case class Entry(typ: Int, count: Int, valueOffset: Int)
      val tags = mutable.Map[Int, Entry]()
      var i = 0
      while (i < n) {
        val e = ifdOff.toInt + headSize + entrySize * i
        val tag = bb.getShort(e) & 0xffff
        val typ = bb.getShort(e + 2) & 0xffff
        val count = (if (big) bb.getLong(e + 4) else bb.getInt(e + 4).toLong).toInt
        val sz = typeSize.getOrElse(typ, 1) * count
        val inlineCap = if (big) 8 else 4
        val valOff =
          if (sz <= inlineCap) e + (if (big) 12 else 8)
          else if (big) bb.getLong(e + 12).toInt
          else bb.getInt(e + 8)
        tags(tag) = Entry(typ, count, valOff)
        i += 1
      }
      val nextOff: Long =
        if (big) bb.getLong(ifdOff.toInt + headSize + entrySize * n)
        else bb.getInt(ifdOff.toInt + headSize + entrySize * n).toLong & 0xffffffffL

      def shorts(tag: Int): Array[Int] = tags.get(tag) match {
        case Some(Entry(3, c, vo)) => Array.tabulate(c)(k => bb.getShort(vo + 2 * k) & 0xffff)
        case Some(Entry(4, c, vo)) => Array.tabulate(c)(k => bb.getInt(vo + 4 * k))
        case Some(Entry(16, c, vo)) => Array.tabulate(c)(k => bb.getLong(vo + 8 * k).toInt)
        case _ => Array.emptyIntArray
      }
      def longs(tag: Int): Array[Long] = tags.get(tag) match {
        case Some(Entry(3, c, vo)) => Array.tabulate(c)(k => (bb.getShort(vo + 2 * k) & 0xffff).toLong)
        case Some(Entry(4, c, vo)) => Array.tabulate(c)(k => bb.getInt(vo + 4 * k).toLong & 0xffffffffL)
        case Some(Entry(16, c, vo)) => Array.tabulate(c)(k => bb.getLong(vo + 8 * k))
        case _ => Array.emptyLongArray
      }
      def doubles(tag: Int): Array[Double] = tags.get(tag) match {
        case Some(Entry(12, c, vo)) => Array.tabulate(c)(k => bb.getDouble(vo + 8 * k))
        case _ => Array.emptyDoubleArray
      }
      def ascii(tag: Int): String = tags.get(tag) match {
        case Some(Entry(2, c, vo)) =>
          new String(bytes, vo, c, "ASCII").takeWhile(c0 => c0 != 0.toChar)
        case _ => ""
      }
      def short1(tag: Int, default: Int): Int = {
        val a = shorts(tag); if (a.nonEmpty) a(0) else default
      }

      val width = short1(256, 0); val height = short1(257, 0)
      if (width <= 0 || height <= 0) throw new TiffError("invalid image size")
      val spp = short1(277, -1)
      if (spp <= 0) throw new TiffError("missing/invalid SamplesPerPixel")
      val bpsArr = shorts(258)
      if (bpsArr.isEmpty) throw new TiffError("missing BitsPerSample")
      val bps = bpsArr(0)
      val planar = short1(284, -1)
      if (planar != 1 && planar != 2) throw new TiffError("missing PlanarConfig")
      val fmtArr = shorts(339)
      if (fmtArr.isEmpty) throw new TiffError("missing SampleFormat")
      val fmt = fmtArr(0)
      val okType = (fmt, bps) match {
        case (2, 16) | (1, 16) | (2, 32) | (1, 32) | (3, 32) | (3, 64) => true
        case _ => false
      }
      if (!okType) throw new TiffError("unsupported SampleFormat/BitsPerSample")
      val photometric = short1(262, 1)
      if (photometric != 1 && photometric != 0) throw new TiffError("unsupported Photometric")
      val compression = short1(259, 1)
      val predictor = short1(317, 1)
      val tiled = tags.contains(322)
      val (blockW, blockH, blockOffs, blockCnts) =
        if (tiled)
          (short1(322, 0), short1(323, 0), longs(324), longs(325))
        else {
          val rps = math.min(short1(278, height), height)
          (width, rps, longs(273), longs(279))
        }
      if (blockW <= 0 || blockH <= 0 || blockOffs.isEmpty)
        throw new TiffError("invalid block structure")
      val subfileType = short1(254, 0).toLong

      // GDAL metadata XML (poor-man parse like the reference :541-618)
      val metadata = mutable.Map[(Int, String), String]()
      val scales = mutable.ArrayBuffer.fill(spp)(1.0)
      val offsets = mutable.ArrayBuffer.fill(spp)(0.0)
      val gdalXml = ascii(42112)
      if (gdalXml.nonEmpty) {
        var pos = 0
        var break = false
        while (!break) {
          val itemStart = gdalXml.indexOf("<Item ", pos)
          if (itemStart < 0) break = true
          else {
            val endTag = gdalXml.indexOf('>', itemStart)
            val endValue = if (endTag < 0) -1 else gdalXml.indexOf('<', endTag)
            if (endTag < 0 || endValue < 0) break = true
            else {
              val tag = gdalXml.substring(itemStart, endTag)
              val value = gdalXml.substring(endTag + 1, endValue)
              val namePos = tag.indexOf("name=\"")
              if (namePos < 0) break = true
              else {
                val nameEnd = tag.indexOf('"', namePos + 6)
                val name = tag.substring(namePos + 6, nameEnd)
                val samplePos = tag.indexOf("sample=\"")
                val sample =
                  if (samplePos < 0) -1
                  else tag.substring(samplePos + 8).takeWhile(_.isDigit).toInt
                metadata((sample, name)) = value
                val rolePos = tag.indexOf("role=\"")
                if (rolePos >= 0) {
                  val roleEnd = tag.indexOf('"', rolePos + 6)
                  val role = tag.substring(rolePos + 6, roleEnd)
                  if (role == "offset" && sample >= 0 && sample < spp)
                    try offsets(sample) = value.toDouble catch { case _: NumberFormatException => }
                  else if (role == "scale" && sample >= 0 && sample < spp)
                    try scales(sample) = value.toDouble catch { case _: NumberFormatException => }
                }
                pos = endValue + 1
              }
            }
          }
        }
      }
      val noData = {
        val s = ascii(42113).trim
        if (s.isEmpty) None
        else try Some(s.toDouble.toFloat) catch { case _: NumberFormatException => None }
      }

      // georeferencing
      var isGeographic = true
      var pixelIsArea = false
      val geokeys = shorts(34735)
      if (geokeys.length >= 4) {
        if (geokeys(0) != 1) throw new TiffError("unsupported GeoTIFF version")
        var k = 4
        while (k + 3 < geokeys.length) {
          if (geokeys(k) == 1024) { // GTModelTypeGeoKey
            if (geokeys(k + 3) == 1) isGeographic = false
            else if (geokeys(k + 3) != 2) throw new TiffError("unsupported model type")
          } else if (geokeys(k) == 1025) { // GTRasterTypeGeoKey
            if (geokeys(k + 3) == 1) pixelIsArea = true
          }
          k += 4
        }
      }
      var hRes = 0.0; var vRes = 0.0; var west = 0.0; var north = 0.0
      val matrix = doubles(34264)
      if (matrix.length == 16) {
        if (matrix(1) != 0 || matrix(4) != 0) throw new TiffError("rotation not supported")
        west = matrix(3); hRes = matrix(0); north = matrix(7); vRes = -matrix(5)
      } else {
        val scale = doubles(33550)
        if (scale.length != 3) throw new TiffError("no GeoPixelScale tag")
        hRes = scale(0); vRes = scale(1)
        val tie = doubles(33922)
        if (tie.length != 6) throw new TiffError("no GeoTiePoints tag")
        west = tie(3) - tie(0) * hRes
        north = tie(4) + tie(1) * vRes
      }
      if (pixelIsArea) { west += 0.5 * hRes; north -= 0.5 * vRes }
      val mul = if (isGeographic) DEG2RAD else 1.0
      var w = west * mul
      var nn = north * mul
      val rX = hRes * mul
      val rY = math.abs(vRes) * mul
      var e = (west + hRes * (width - 1)) * mul
      var s = (north - vRes * (height - 1)) * mul
      if (vRes < 0) { val t = nn; nn = s; s = t }
      if (!((!isGeographic ||
          (math.abs(w) <= 4 * math.Pi && math.abs(e) <= 4 * math.Pi &&
            math.abs(nn) <= math.Pi + 1e-5 && math.abs(s) <= math.Pi + 1e-5)) &&
          w < e && s < nn && rX > 1e-10 && rY > 1e-10))
        throw new TiffError("inconsistent georeferencing")

      out += new Ifd(width, height, spp, bps, fmt, planar == 2, compression,
        predictor, tiled, blockW, blockH, blockOffs, blockCnts, subfileType,
        metadata.toMap, noData, scales.toArray, offsets.toArray,
        isGeographic, vRes < 0, w, s, e, nn, rX, rY, bytes, le)
      ifdOff = nextOff
      } catch {
        // a malformed later IFD stops directory reading, like the reference's
        // nextGrid-returns-null break; the first IFD must be valid
        case e: TiffError => if (out.isEmpty) throw e else stop = true
      }
    }
    out.toList
  }
}
