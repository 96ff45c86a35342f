package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec multimodal path: PNG/WAV/JPEG encode -> parse round trips,
  * malformed-input behavior, and the Spark fetch -> decode -> frame-sample
  * pipeline over the interleaved docs table. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("PNG encode/decode round trip over a parameter grid") {
    for (w <- Seq(1, 16, 77, 640); h <- Seq(1, 33, 480)) {
      val bytes = MediaCodecs.encodePng(w, h, seed = w * 1000L + h)
      val info = MediaCodecs.decodePng(bytes)
      assert(info.exists(m => m.width == w && m.height == h && m.kind == "image"),
        s"png $w x $h -> $info")
      // dispatcher picks the right parser by magic
      assert(MediaCodecs.decode(bytes) == info)
    }
  }

  test("PNG stream is structurally valid (java ImageIO-free CRC check)") {
    val bytes = MediaCodecs.encodePng(20, 10, 7L)
    // verify every chunk CRC like a strict reader would
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    var pos = 8
    var sawIend = false
    while (pos + 8 <= bytes.length && !sawIend) {
      val len = bb.getInt(pos)
      val typ = new String(bytes, pos + 4, 4, "ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      assert(crc.getValue.toInt == bb.getInt(pos + 8 + len), s"bad CRC on $typ")
      if (typ == "IEND") sawIend = true
      pos += 12 + len
    }
    assert(sawIend)
  }

  test("PNG pixel decode (inflate + unfilter) returns the exact LCG stream") {
    // every (seed, colorType) pair: the encoder cycles scanline filters
    // (seed + row) % 5, so any h >= 5 exercises all five filter types —
    // Sub/Up/Average/Paeth reconstruction must recover the raw stream
    for (seed <- Seq(0L, 3L, 42L, 9999L); colorType <- Seq(0, 2, 4, 6)) {
      val ch = MediaCodecs.pngChannels(colorType)
      val w = 16 + (seed % 16).toInt * 4
      val h = 16 + ((seed * 7) % 16).toInt * 4
      val px = MediaCodecs.decodePngPixels(
        MediaCodecs.encodePng(w, h, seed, colorType)).get
      assert(px.length == w * h * ch)
      // pixel bytes are the raw LCG stream in scanline order
      var s = seed; var p = 0
      while (p < px.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        assert((px(p) & 0xff) == (s >>> 56).toInt,
          s"pixel $p differs (colorType $colorType)")
        p += 1
      }
    }
  }

  test("PNG decode reports channel counts and rejects non-8-bit profiles") {
    assert(MediaCodecs.decodePng(MediaCodecs.encodePng(8, 8, 1L, 2))
      .exists(_.channels == 3))
    assert(MediaCodecs.decodePng(MediaCodecs.encodePng(8, 8, 1L, 6))
      .exists(_.channels == 4))
    // palette color type (3): header parses but pixel decode refuses
    val pal = MediaCodecs.encodePng(8, 8, 1L)
    pal(8 + 8 + 9) = 3 // IHDR color-type byte
    assert(MediaCodecs.decodePngPixels(pal).isEmpty)
  }

  test("PNG pixel decode rejects corrupted streams instead of mis-decoding") {
    val good = MediaCodecs.encodePng(32, 24, 7L)
    assert(MediaCodecs.decodePngPixels(good).isDefined)
    val truncated = java.util.Arrays.copyOf(good, good.length - 20)
    assert(MediaCodecs.decodePngPixels(truncated).isEmpty)
    val corrupt = good.clone()
    corrupt(good.length - 30) = (corrupt(good.length - 30) ^ 0x55).toByte
    // bit-flipped deflate data either fails inflate or row-filter checks
    assert(MediaCodecs.decodePngPixels(corrupt).isEmpty ||
      MediaCodecs.decodePngPixels(corrupt).get.length == 32 * 24)
  }

  test("WAV sample decode returns the exact signed LCG stream") {
    val smp = MediaCodecs.decodeWavSamples(
      MediaCodecs.encodeWav(16000, 2, 100, 5L)).get
    assert(smp.length == 200)
    var s = 5L
    smp.foreach { v =>
      s = s * 6364136223846793005L + 1442695040888963407L
      assert(v == (s >>> 48).toShort)
    }
    assert(MediaCodecs.decodeWavSamples(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("WAV encode/decode round trip") {
    for (rate <- Seq(8000, 16000, 44100, 48000); ch <- Seq(1, 2)) {
      val bytes = MediaCodecs.encodeWav(rate, ch, nSamples = 100, seed = rate + ch)
      val info = MediaCodecs.decodeWav(bytes)
      assert(info.exists(m => m.sampleRate == rate && m.channels == ch && m.kind == "audio"),
        s"wav $rate/$ch -> $info")
      assert(MediaCodecs.decode(bytes) == info)
    }
  }

  test("JPEG SOF0 marker scan finds dimensions") {
    for (w <- Seq(32, 100, 131); h <- Seq(45, 99)) {
      val bytes = MediaCodecs.encodeJpegHeader(w, h)
      val info = MediaCodecs.decodeJpeg(bytes)
      assert(info.exists(m => m.width == w && m.height == h), s"jpeg $w x $h -> $info")
      assert(MediaCodecs.decode(bytes) == info)
    }
  }

  test("malformed payloads decode to None, not exceptions") {
    assert(MediaCodecs.decode(Array[Byte]()) == None)
    assert(MediaCodecs.decode(Array[Byte](1, 2, 3)) == None)
    assert(MediaCodecs.decode("RIFFxxxxJUNK".getBytes("ASCII")) == None)
    val truncatedPng = MediaCodecs.encodePng(8, 8, 1L).take(12)
    assert(MediaCodecs.decode(truncatedPng) == None)
  }

  test("fetch -> decode -> frame-sample pipeline over interleaved docs") {
    val docs = DocsTable.docs(spark, 400)
    val media = MultimodalOps.fetchMedia(docs)
    val decoded = MultimodalOps.decodeAndFeaturize(media)
    val rows = decoded.collect()
    assert(rows.nonEmpty, "no media spans in fixture")
    // every synthesized payload must parse (they are real byte streams)
    assert(rows.forall(_.getAs[String]("media_kind") != null))
    // feature vectors are L2-normalized byte histograms
    val f = rows.head.getAs[scala.collection.Seq[Float]]("feature")
    assert(math.abs(f.map(x => x * x).sum - 1.0) < 1e-3)
    // images carry dims, audio carries a rate
    assert(rows.filter(_.getAs[String]("media_kind") == "image")
      .forall(r => r.getAs[Int]("width") > 0 && r.getAs[Int]("height") > 0))
    assert(rows.filter(_.getAs[String]("media_kind") == "audio")
      .forall(r => r.getAs[Int]("sample_rate") >= 8000))
    val frames = MultimodalOps.sampleFrames(decoded)
    assert(frames.where(col("frame_idx") > 0).count() > 0)
    // lineage preserved
    assert(frames.select("doc_id").distinct().count() <=
      media.select("doc_id").distinct().count())
  }
}
