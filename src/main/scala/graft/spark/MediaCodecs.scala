package graft.spark

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater}

/** Real (library-free) media header codecs for the multimodal column path.
  *
  * The container formats are public specifications: PNG (RFC 2083 / W3C),
  * WAV (RIFF, Microsoft/IBM spec), JPEG JFIF (ITU T.81 marker structure).
  * Encoders produce structurally valid byte streams (PNG with correct CRCs
  * and a deflate IDAT; WAV with RIFF/fmt/data chunks; JPEG with SOI/APP0/
  * SOF0/EOI markers); decoders parse the real byte layout — byte order,
  * chunk walking, marker scanning — so a wrong parser fails loudly against
  * the driver oracle's closed-form expectations.
  */
object MediaCodecs {

  final case class MediaInfo(kind: String, width: Int, height: Int,
                             sampleRate: Int, channels: Int)

  // ------------------------------------------------------------------ PNG

  private val PNG_SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length).array()
    out.write(len)
    val typBytes = typ.getBytes("ASCII")
    out.write(typBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(typBytes); crc.update(data)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      .putInt(crc.getValue.toInt).array())
  }

  /** channel count for an 8-bit PNG color type (gray / RGB / gray+alpha /
    * RGBA); 0 for unsupported (palette etc.). */
  def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 0
  }

  /** Paeth predictor (PNG spec §6.6): closest of left/up/up-left to
    * left + up − up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** 8-bit PNG with deterministic pixel data: color type 0 (gray), 2
    * (RGB) or 6 (RGBA), w*h*channels pixel bytes drawn in scanline order
    * from a 64-bit LCG (top byte of each state). Each scanline is encoded
    * with filter (seed + row) % 5, cycling through all five PNG filter
    * types — the decoder must implement real Sub/Up/Average/Paeth
    * reconstruction to recover the stream. */
  def encodePng(width: Int, height: Int, seed: Long, colorType: Int = 0): Array[Byte] = {
    val ch = pngChannels(colorType)
    require(ch > 0, s"encodePng: unsupported color type $colorType")
    val out = new java.io.ByteArrayOutputStream()
    out.write(PNG_SIG)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put(colorType.toByte)
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    pngChunk(out, "IHDR", ihdr.array())
    // pixel bytes: pure LCG stream, scanline order (this is what the
    // DuckDB oracle re-generates byte-for-byte)
    val stride = width * ch
    val px = new Array[Byte](height * stride)
    var i = 0; var s = seed
    while (i < px.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      px(i) = (s >>> 56).toByte
      i += 1
    }
    // filter each scanline: raw = [filter byte | filtered bytes]
    val raw = new Array[Byte](height * (1 + stride))
    var r = 0
    while (r < height) {
      val f = (((seed + r) % 5 + 5) % 5).toInt
      raw(r * (1 + stride)) = f.toByte
      var k = 0
      while (k < stride) {
        val cur = px(r * stride + k) & 0xff
        val left = if (k >= ch) px(r * stride + k - ch) & 0xff else 0
        val up = if (r > 0) px((r - 1) * stride + k) & 0xff else 0
        val ul = if (r > 0 && k >= ch) px((r - 1) * stride + k - ch) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case _ => cur - paeth(left, up, ul)
        }
        raw(r * (1 + stride) + 1 + k) = enc.toByte
        k += 1
      }
      r += 1
    }
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    // drain fully: incompressible data can exceed the input size
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** FULL PNG pixel decode for 8-bit color types 0/2/4/6: walks the chunk
    * chain, concatenates IDAT data, inflates the real zlib stream, and
    * reconstructs every scanline through the five PNG filter types
    * (None/Sub/Up/Average/Paeth, spec §6). Returns the w*h*channels pixel
    * bytes in scanline order. None for anything structurally off — wrong
    * dims, truncated stream, palette/16-bit profiles, unknown filter. */
  def decodePngPixels(bytes: Array[Byte]): Option[Array[Byte]] = {
    val info = decodePng(bytes).getOrElse(return None)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    var depth = -1; var colorType = -1
    var idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= bytes.length) {
      val len = bb.getInt(pos)
      if (len < 0) return None
      val typ = new String(bytes, pos + 4, 4, "ASCII")
      if (typ == "IHDR") {
        // bounds-guard: a truncated trailing chunk typed IHDR must yield
        // None, not an out-of-bounds read
        if (len < 13 || pos + 8 + 13 > bytes.length) return None
        depth = bytes(pos + 16) & 0xff
        colorType = bytes(pos + 17) & 0xff
      }
      if (typ == "IDAT") {
        if (pos + 8 + len > bytes.length) return None
        idat.write(bytes, pos + 8, len)
      }
      pos += 8 + len + 4
    }
    if (depth != 8) return None
    val ch = pngChannels(colorType)
    if (ch == 0) return None
    val w = info.width; val h = info.height
    if (w <= 0 || h <= 0 || w.toLong * h * ch > 64L * 1024 * 1024) return None
    val stride = w * ch
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (off != raw.length) return None
    val px = new Array[Byte](stride * h)
    var r = 0
    while (r < h) {
      val f = raw(r * (1 + stride)) & 0xff
      if (f > 4) return None // unknown filter type
      var k = 0
      while (k < stride) {
        val enc = raw(r * (1 + stride) + 1 + k) & 0xff
        val left = if (k >= ch) px(r * stride + k - ch) & 0xff else 0
        val up = if (r > 0) px((r - 1) * stride + k) & 0xff else 0
        val ul = if (r > 0 && k >= ch) px((r - 1) * stride + k - ch) & 0xff else 0
        val rec = f match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + ((left + up) >> 1)
          case _ => enc + paeth(left, up, ul)
        }
        px(r * stride + k) = rec.toByte
        k += 1
      }
      r += 1
    }
    Some(px)
  }

  /** parse a PNG's IHDR: walks the chunk chain for real. */
  def decodePng(bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 33) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PNG_SIG(i)) return None; i += 1 }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    while (pos + 8 <= bytes.length) {
      val len = bb.getInt(pos)
      if (len < 0) return None // hostile chunk length: never loop in place
      val typ = new String(bytes, pos + 4, 4, "ASCII")
      if (typ == "IHDR") {
        if (len < 13 || pos + 8 + 13 > bytes.length) return None
        return Some(MediaInfo("image", bb.getInt(pos + 8), bb.getInt(pos + 12), 0,
          pngChannels(bytes(pos + 17) & 0xff)))
      }
      pos += 8 + len + 4
    }
    None
  }

  // ------------------------------------------------------------------ WAV

  /** 16-bit PCM WAV with deterministic samples. Odd seeds insert an
    * odd-length LIST chunk between fmt and data, so decoders must walk
    * the chunk chain with real RIFF word-alignment padding (len + len&1)
    * rather than assume the fixed 44-byte layout. */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataLen = nSamples * channels * 2
    val listBody = if (seed % 2 != 0) "INFOx".getBytes("ASCII") else null // 5 bytes: odd
    val listLen = if (listBody == null) 0 else 8 + listBody.length + (listBody.length & 1)
    val total = 44 + listLen + dataLen
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")); bb.putInt(total - 8)
    bb.put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort) // block align
    bb.putShort(16) // bits per sample
    if (listBody != null) {
      bb.put("LIST".getBytes("ASCII")); bb.putInt(listBody.length)
      bb.put(listBody); bb.put(0.toByte) // word-alignment pad
    }
    bb.put("data".getBytes("ASCII")); bb.putInt(dataLen)
    var s = seed; var i = 0
    while (i < nSamples * channels) {
      s = s * 6364136223846793005L + 1442695040888963407L
      bb.putShort((s >>> 48).toShort)
      i += 1
    }
    bb.array()
  }

  /** parse RIFF/WAVE: walks chunks to fmt . */
  def decodeWav(bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (new String(bytes, 0, 4, "ASCII") != "RIFF") return None
    if (new String(bytes, 8, 4, "ASCII") != "WAVE") return None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "ASCII")
      val len = bb.getInt(pos + 4)
      if (len < 0) return None // hostile chunk length: never loop in place
      if (id == "fmt ") {
        if (len < 16 || pos + 8 + 16 > bytes.length) return None
        val channels = bb.getShort(pos + 10).toInt
        val rate = bb.getInt(pos + 12)
        return Some(MediaInfo("audio", 0, 0, rate, channels))
      }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** FULL PCM sample decode: walks the RIFF chunk chain to `data` and
    * reads the little-endian 16-bit samples — the audio counterpart of
    * decodePngPixels. None for truncated or structurally-off streams. */
  def decodeWavSamples(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 44) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (new String(bytes, 0, 4, "ASCII") != "RIFF") return None
    if (new String(bytes, 8, 4, "ASCII") != "WAVE") return None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "ASCII")
      val len = bb.getInt(pos + 4)
      if (len < 0) return None
      if (id == "data") {
        if (pos + 8 + len > bytes.length) return None
        val out = new Array[Short](len / 2)
        var i = 0
        while (i < out.length) { out(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
        return Some(out)
      }
      pos += 8 + len + (len & 1)
    }
    None
  }

  // ----------------------------------------------------------------- JPEG

  /** minimal JFIF byte stream: SOI + APP0 + SOF0 (with dims) + EOI —
    * structurally valid marker chain (no entropy-coded data). */
  def encodeJpegHeader(width: Int, height: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(2 + 18 + 19 + 2).order(ByteOrder.BIG_ENDIAN)
    out.putShort(0xFFD8.toShort) // SOI
    out.putShort(0xFFE0.toShort); out.putShort(16) // APP0 len
    out.put("JFIF".getBytes("ASCII")); out.put(0.toByte)
    out.putShort(0x0101.toShort) // version
    out.put(0.toByte) // aspect units
    out.putShort(1.toShort); out.putShort(1.toShort) // aspect
    out.put(0.toByte); out.put(0.toByte) // no thumbnail
    out.putShort(0xFFC0.toShort); out.putShort(17) // SOF0, len (8 + 3*3)
    out.put(8.toByte) // precision
    out.putShort(height.toShort); out.putShort(width.toShort)
    out.put(3.toByte) // components
    for (c <- 1 to 3) { out.put(c.toByte); out.put(0x11.toByte); out.put(0.toByte) }
    out.putShort(0xFFD9.toShort) // EOI
    out.array()
  }

  /** scan JPEG markers for a SOFn frame header (excluding DHT/JPG/DAC). */
  def decodeJpeg(bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 4) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if ((bb.getShort(0) & 0xffff) != 0xFFD8) return None
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xD9) return None // EOI before any SOF
      val isSof = marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC
      val len = bb.getShort(pos + 2) & 0xffff
      if (len < 2) return None // marker length includes itself: never loop
      if (isSof) {
        if (pos + 10 > bytes.length) return None
        val height = bb.getShort(pos + 5) & 0xffff
        val width = bb.getShort(pos + 7) & 0xffff
        val ncomp = bytes(pos + 9) & 0xff
        return Some(MediaInfo("image", width, height, 0, ncomp))
      }
      pos += 2 + len
    }
    None
  }

  // ------------------------------------------------------------- dispatch

  /** decode by magic number; None for unknown formats. */
  def decode(bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 4) None
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') decodePng(bytes)
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') decodeWav(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) decodeJpeg(bytes)
    else None
  }
}
