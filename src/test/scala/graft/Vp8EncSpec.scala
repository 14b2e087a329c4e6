package graft

import graft.operators.{MultimodalOps, RawVp8, RawVp8Enc, RawWebp}
import org.scalatest.funsuite.AnyFunSuite

/** Encode half of the lossy-VP8 codec.
  *
  * [[RawVp8Enc]] codes DC-only B_PRED keyframes at quantizer index 0;
  * rasters whose 4x4 blocks are constant roundtrip LOSSLESSLY (the
  * basis of the multimodal_decode_webp_lossy oracle). These pins run
  * the engine's own decoder over the engine's streams; the
  * independent-implementation direction (reference libwebp decodes
  * the same streams byte-exactly) is tools/check_vp8_encode.py.
  */
class Vp8EncSpec extends AnyFunSuite {

  /** Per-4x4-block-constant planes from a deterministic formula. */
  private def flatPlanes(seed: Long, w: Int, h: Int): (Array[Int], Array[Int], Array[Int]) = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = new Array[Int](w * h)
    val u = new Array[Int](cw * ch)
    val v = new Array[Int](cw * ch)
    for (yy <- 0 until h; xx <- 0 until w)
      y(yy * w + xx) = ((seed * 31 + (xx / 4) * 17 + (yy / 4) * 29) % 251).toInt
    for (yy <- 0 until ch; xx <- 0 until cw) {
      u(yy * cw + xx) = ((seed * 13 + (xx / 4) * 7 + (yy / 4) * 23) % 251).toInt
      v(yy * cw + xx) = ((seed * 11 + (xx / 4) * 3 + (yy / 4) * 19) % 251).toInt
    }
    (y, u, v)
  }

  private def assertExact(seed: Long, w: Int, h: Int): Unit = {
    val (y, u, v) = flatPlanes(seed, w, h)
    val webp = RawVp8Enc.encodeWebp(w, h, y, u, v)
    val out = RawVp8.decodeWebpYuv(webp)
    assert(out.width == w && out.height == h)
    assert(out.y.map(_ & 0xff).sameElements(y), s"Y roundtrip $w x $h seed $seed")
    assert(out.u.map(_ & 0xff).sameElements(u), s"U roundtrip $w x $h seed $seed")
    assert(out.v.map(_ & 0xff).sameElements(v), s"V roundtrip $w x $h seed $seed")
  }

  test("block-flat rasters roundtrip losslessly (MB-aligned)") {
    for (seed <- 0L until 8L) assertExact(seed, 16, 16)
    assertExact(3, 32, 16)
    assertExact(4, 48, 48)
    assertExact(5, 64, 32)
  }

  test("block-flat rasters roundtrip losslessly (4-aligned, non-MB)") {
    assertExact(6, 24, 8)
    assertExact(7, 40, 24)
    assertExact(8, 8, 8)
  }

  test("extreme block values (carry/cat6 tokens) roundtrip") {
    // max-magnitude residuals: alternating 0 / 250 blocks forces DC
    // levels up to +-500 (category-6 tokens) and bool-encoder carries
    val w = 32; val h = 32
    val cw = w / 2; val ch = h / 2
    val y = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 4; val by = (i / w) / 4
      if ((bx + by) % 2 == 0) 0 else 250
    }
    val u = Array.tabulate(cw * ch) { i => if (((i % cw) / 4) % 2 == 0) 5 else 245 }
    val v = Array.tabulate(cw * ch) { i => if (((i / cw) / 4) % 2 == 0) 250 else 2 }
    val webp = RawVp8Enc.encodeWebp(w, h, y, u, v)
    val out = RawVp8.decodeWebpYuv(webp)
    assert(out.y.map(_ & 0xff).sameElements(y))
    assert(out.u.map(_ & 0xff).sameElements(u))
    assert(out.v.map(_ & 0xff).sameElements(v))
  }

  test("non-4-aligned sizes decode deterministically (DC-only degradation)") {
    val (y, u, v) = flatPlanes(9, 15, 13)
    val webp = RawVp8Enc.encodeWebp(15, 13, y, u, v)
    val a = RawVp8.decodeWebpYuv(webp)
    val b = RawVp8.decodeWebpYuv(webp)
    assert(a.width == 15 && a.height == 13)
    assert(a.y.sameElements(b.y) && a.u.sameElements(b.u) && a.v.sameElements(b.v))
  }

  test("engine lossy streams route through decodeAny as image/webp") {
    val (y, u, v) = flatPlanes(1, 16, 16)
    val webp = RawVp8Enc.encodeWebp(16, 16, y, u, v)
    assert(RawWebp.sniffLossy(webp))
    val (fmt, w, h, _) = MultimodalOps.decodeAny(webp)
    assert(fmt == "image/webp" && w == 16 && h == 16)
  }
}
