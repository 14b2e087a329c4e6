package graft

import java.util.zip.{CRC32, Deflater}

import graft.operators.{MultimodalOps, RawImage, RawPng}
import org.scalatest.funsuite.AnyFunSuite

/** The JDK-only PNG codec: zlib inflate + the five scanline filters.
  * Round-trips are pixel-exact; the encoder cycles filters by row so a
  * 5+-row image exercises every reconstruction path.
  */
class RawPngSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int, seed: Int): RawImage.Image = {
    val rnd = new java.util.Random(seed)
    val rgb = new Array[Byte](w * h * 3)
    rnd.nextBytes(rgb)
    RawImage.Image(w, h, rgb)
  }

  test("encode/decode roundtrip is pixel-exact across all five filters") {
    for (seed <- 1 to 5; (w, h) <- Seq((8, 8), (1, 7), (13, 5), (3, 1))) {
      val img = raster(w, h, seed * 100 + w * 10 + h)
      val png = RawPng.encode(img)
      assert(RawPng.sniff(png))
      val back = RawPng.decode(png)
      assert(back.width == w && back.height == h)
      assert(back.rgb.toSeq == img.rgb.toSeq, s"seed=$seed ${w}x$h")
    }
  }

  /** Hand-build a PNG with a given color type and raw (unfiltered)
    * scanlines — independent of the encoder under test.
    */
  private def buildPng(w: Int, h: Int, colorType: Int,
      pixels: Array[Byte], chunkIdat: Int = 1): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h)
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
    val d = new Deflater(); d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new CRC32(); crc.update(t); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte // small dims fit one byte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    val zb = z.toByteArray
    val cut = math.max(1, zb.length / chunkIdat)
    var off = 0
    while (off < zb.length) {
      val n = math.min(cut, zb.length - off)
      chunk("IDAT", java.util.Arrays.copyOfRange(zb, off, off + n))
      off += n
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("grayscale (color type 0) expands to R=G=B") {
    val px = Array[Byte](10, 20, 30, 40)
    val img = RawPng.decode(buildPng(2, 2, 0, px))
    assert(img.rgb.toSeq ==
      Seq[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40))
  }

  test("RGBA (color type 6) drops alpha") {
    val px = Array[Byte](1, 2, 3, -1, 4, 5, 6, 0)
    val img = RawPng.decode(buildPng(2, 1, 6, px))
    assert(img.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("zlib stream split across multiple IDAT chunks") {
    val img = raster(16, 16, 7)
    val png = buildPng(16, 16, 2, img.rgb, chunkIdat = 5)
    assert(RawPng.decode(png).rgb.toSeq == img.rgb.toSeq)
  }

  test("corrupted chunk CRC is rejected") {
    val png = RawPng.encode(raster(4, 4, 3))
    png(png.length - 5) = (png(png.length - 5) ^ 0x55).toByte // IEND CRC
    val e = intercept[IllegalArgumentException](RawPng.decode(png))
    assert(e.getMessage.contains("CRC"))
  }

  test("decodeAny sniffs PNG and routes through the real decoder") {
    val payload = MultimodalOps.pngPayload(42L, 8, 8)
    val (fmt, w, h, feat) = MultimodalOps.decodeAny(payload)
    assert(fmt == "image/png" && w == 8 && h == 8)
    // features equal the PPM path's on the same pixel formula
    val ppm = MultimodalOps.decodeAny(MultimodalOps.ppmPayload(42L, 8, 8))
    assert(feat.toSeq == ppm._4.toSeq)
  }

  test("png payload means match the ppm payload means (shared formula)") {
    val a = RawImage.meanRgb(RawPng.decode(MultimodalOps.pngPayload(7L, 8, 8)))
    val b = RawImage.meanRgb(RawImage.decodePpm(MultimodalOps.ppmPayload(7L, 8, 8)))
    assert(a == b)
  }

  test("pipeline resize transcodes PNG -> PNG through the real scaler") {
    val payload = MultimodalOps.pngPayload(11L, 8, 8)
    val out = MultimodalOps.resizeReal(payload, 4, 4)
    assert(RawPng.sniff(out))
    val img = RawPng.decode(out)
    assert(img.width == 4 && img.height == 4)
    val expect = RawImage.resizeNearest(RawPng.decode(payload), 4, 4)
    assert(img.rgb.toSeq == expect.rgb.toSeq)
  }

  test("pipeline resize falls back to the stub on malformed image magic") {
    val fake = "P6 garbage that is not a ppm at all".getBytes("US-ASCII")
    val out = MultimodalOps.resizeReal(fake, 8, 8)
    assert(out.toSeq == MultimodalOps.resizeStub(fake, 8, 8).toSeq)
  }
}
