package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

import graft.proj.grids.GeoTiff

/** Regression for the predictor-2 multi-row strip bug: horizontal
  * differencing must be undone per row with base-relative indices; the old
  * code re-applied row 0 blockHeight times and never touched rows >= 1.
  * No bundled reference grid exercises deflate+predictor-2 with
  * blockHeight > 1, so this builds a minimal TIFF in memory.
  */
class GeoTiffPredictorSpec extends AnyFunSuite {

  test("predictor-2 multi-row strip decodes every row") {
    val width = 4; val height = 3
    val values = Array.tabulate[Short](width * height)(i => (100 * (i / width) + 10 * (i % width) + 7).toShort)
    // build with 14 tags (incl. tiepoint): do it directly here
    val bytes = {
      val raw = new Array[Byte](width * height * 2)
      val rb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until height; c <- 0 until width) {
        val v = values(r * width + c)
        val enc = if (c == 0) v else (v - values(r * width + c - 1)).toShort
        rb.putShort(2 * (r * width + c), enc)
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val comp = new Array[Byte](raw.length + 64)
      val compLen = defl.deflate(comp)
      defl.end()
      val nTags = 14
      val stripOff = 8
      val scaleOff = stripOff + compLen
      val tieOff = scaleOff + 24
      val ifdOff = tieOff + 48
      val out = new Array[Byte](ifdOff + 2 + nTags * 12 + 4)
      val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0, 'I'.toByte); bb.put(1, 'I'.toByte)
      bb.putShort(2, 42); bb.putInt(4, ifdOff)
      System.arraycopy(comp, 0, out, stripOff, compLen)
      bb.putDouble(scaleOff, 0.1); bb.putDouble(scaleOff + 8, 0.1)
      bb.putDouble(scaleOff + 16, 0.0)
      bb.putDouble(tieOff, 0.0); bb.putDouble(tieOff + 8, 0.0)
      bb.putDouble(tieOff + 16, 0.0); bb.putDouble(tieOff + 24, 10.0)
      bb.putDouble(tieOff + 32, 50.0); bb.putDouble(tieOff + 40, 0.0)
      bb.putShort(ifdOff, nTags.toShort)
      var e = ifdOff + 2
      def tag(id: Int, typ: Int, count: Int, value: Int): Unit = {
        bb.putShort(e, id.toShort); bb.putShort(e + 2, typ.toShort)
        bb.putInt(e + 4, count); bb.putInt(e + 8, value)
        e += 12
      }
      tag(256, 3, 1, width); tag(257, 3, 1, height)
      tag(258, 3, 1, 16); tag(259, 3, 1, 8); tag(262, 3, 1, 1)
      tag(273, 4, 1, stripOff); tag(277, 3, 1, 1); tag(278, 3, 1, height)
      tag(279, 4, 1, compLen); tag(284, 3, 1, 1); tag(317, 3, 1, 2)
      tag(339, 3, 1, 2)
      tag(33550, 12, 3, scaleOff); tag(33922, 12, 6, tieOff)
      bb.putInt(e, 0)
      out
    }
    val ifds = GeoTiff.parse(bytes)
    assert(ifds.size == 1)
    val g = ifds.head
    assert(g.width == width && g.height == height && g.predictor == 2)
    // valueAt addresses rows from the BOTTOM (yFromBottom); TIFF row 0 is top
    for (r <- 0 until height; c <- 0 until width) {
      val expect = values(r * width + c).toFloat
      val got = g.valueAt(0, c, height - 1 - r)
      assert(got == expect, s"row $r col $c: got $got expect $expect")
    }
  }
}
