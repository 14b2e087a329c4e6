package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MultimodalOps, RawImage, RawJpeg}

/** JPEG boundary invariants (r8 verdict #8: the lossy codec is
  * spec-checked, not oracle-checked — inverse-DCT output is
  * implementation-defined, so assertions are exact on structure
  * (dimensions, format dispatch, degradation policy) and tolerant on
  * pixel values (channel means on smooth fixtures).
  */
class JpegSpec extends AnyFunSuite {

  /** Smooth horizontal gradient: JPEG's best case, so channel means
    * survive the DCT round-trip within a tight band.
    */
  private def gradient(w: Int, h: Int): RawImage.Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (x * 255 / (w - 1)).toByte
      rgb(i + 1) = (y * 255 / (h - 1)).toByte
      rgb(i + 2) = 128.toByte
    }
    RawImage.Image(w, h, rgb)
  }

  private def channelMeans(img: RawImage.Image): Seq[Double] =
    (0 until 3).map { c =>
      val n = img.width * img.height
      (0 until n).map(i => (img.rgb(i * 3 + c) & 0xff).toDouble).sum / n
    }

  test("encode -> decode round-trip: exact dimensions, channel means within lossy band") {
    val src = gradient(48, 32)
    val jpeg = RawJpeg.encode(src)
    assert(RawJpeg.sniff(jpeg), "encoded payload must carry the JPEG SOI magic")
    val back = RawJpeg.decode(jpeg)
    assert(back.width === 48 && back.height === 32)
    val (m0, m1) = (channelMeans(src), channelMeans(back))
    for (c <- 0 until 3)
      assert(math.abs(m0(c) - m1(c)) < 8.0,
        s"channel $c mean drifted ${m0(c)} -> ${m1(c)}")
  }

  test("decodeAny dispatches JPEG and emits a normalized luma histogram") {
    val jpeg = RawJpeg.encode(gradient(32, 32))
    val (fmt, w, h, feat) = MultimodalOps.decodeAny(jpeg)
    assert(fmt === "image/jpeg")
    assert(w === 32 && h === 32)
    assert(feat.length === 8)
    assert(math.abs(feat.map(_.toDouble).sum - 1.0) < 1e-5)
  }

  test("resizeReal resizes JPEG to exact target dims, re-encoded as JPEG") {
    val jpeg = RawJpeg.encode(gradient(64, 48))
    val out = MultimodalOps.resizeReal(jpeg, 16, 12)
    assert(RawJpeg.sniff(out), "resized payload must still be a JPEG")
    val img = RawJpeg.decode(out)
    assert(img.width === 16 && img.height === 12)
  }

  test("corrupt JPEG degrades to the stub instead of failing the query") {
    val corrupt = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.fill[Byte](64)(0x41)
    val (fmt, _, _, feat) = MultimodalOps.decodeAny(corrupt)
    assert(fmt !== "image/jpeg") // stub format, not a decode claim
    assert(feat.length === 8)
    val resized = MultimodalOps.resizeReal(corrupt, 8, 8)
    assert(resized.nonEmpty) // stub byte-downsample, no throw
  }
}
