package graft

import java.nio.file.{Files, Paths}

import graft.operators.RawVp8
import org.scalatest.funsuite.AnyFunSuite

/** Lossy-VP8 conformance against the reference libwebp.
  *
  * Every fixture under src/test/resources/vp8/ was produced by
  * tools/gen_vp8_golden.py: the .webp stream was encoded by the SYSTEM
  * libwebp and the .yuv golden is libwebp's own WebPDecodeYUV output
  * for that stream. VP8 reconstruction is fully integer-specified
  * (RFC 6386), so a conforming decoder must reproduce the Y/U/V
  * planes BYTE-EXACTLY — an independent-implementation conformance
  * check (the goldens come from libwebp, not from the code under
  * test). The fixture set exercises: DC/V/H/TM 16x16 prediction, all
  * ten 4x4 B_PRED modes, every token category (cat1-cat6), multi-
  * segment quantization (libwebp's default 4-segment config), the
  * normal loop filter at several strengths, non-MB-aligned crop
  * widths/heights (above-right edge conventions), and quantizer
  * extremes (q5 / q95).
  */
class Vp8Spec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/vp8")

  private def fixture(name: String): (Array[Byte], Array[Byte]) = {
    val webp = Files.readAllBytes(dir.resolve(s"$name.webp"))
    val yuv = Files.readAllBytes(dir.resolve(s"$name.yuv"))
    (webp, yuv)
  }

  private def comparePlane(plane: String, got: Array[Byte], want: Array[Byte],
      off: Int, w: Int, h: Int): Unit = {
    assert(got.length == w * h, s"$plane: size ${got.length} != ${w * h}")
    var i = 0
    while (i < got.length) {
      if (got(i) != want(off + i)) {
        fail(s"$plane mismatch at (${i % w}, ${i / w}): " +
          s"got ${got(i) & 0xff}, want ${want(off + i) & 0xff}")
      }
      i += 1
    }
  }

  /** Default-config encodes plus full-config ones: multi-partition
    * token streams (parts4 = 4, parts8 = 8), the simple loop filter,
    * sharpness 7, filter disabled, method 0/6 extremes, and a forced
    * single segment.
    */
  private val names = Seq("flat16", "flat_multi", "gradient", "noise", "crop",
    "bigsmooth", "noise_q5", "noise_q95", "mixed", "tiny",
    "parts4", "parts8", "simplefilter", "sharp7", "nofilt",
    "method0", "method6_q100", "oneseg")

  private def check(out: RawVp8.Yuv, golden: Array[Byte]): Unit = {
    val w = out.width; val h = out.height
    val cw = (w + 1) / 2; val chh = (h + 1) / 2
    assert(golden.length == w * h + 2 * cw * chh,
      s"golden size ${golden.length} != ${w * h + 2 * cw * chh}")
    comparePlane("Y", out.y, golden, 0, w, h)
    comparePlane("U", out.u, golden, w * h, cw, chh)
    comparePlane("V", out.v, golden, w * h + cw * chh, cw, chh)
  }

  for (name <- names) {
    test(s"vp8 conformance: $name decodes byte-exactly to libwebp's YUV") {
      val (webp, golden) = fixture(name)
      check(RawVp8.decodeWebpYuv(webp), golden)
    }
  }

  // Reconstruction-only conformance (mirrors libwebp's bypass_filtering):
  // isolates prediction/token/transform correctness from the loop filter.
  for (name <- names) {
    test(s"vp8 conformance: $name reconstruction matches bypass_filtering") {
      val webp = Files.readAllBytes(dir.resolve(s"$name.webp"))
      val golden = Files.readAllBytes(dir.resolve(s"$name.nofilter.yuv"))
      val frame = {
        // minimal RIFF walk to the 'VP8 ' chunk (test-local copy)
        var i = 12
        var res: Array[Byte] = null
        while (res == null) {
          val sz = (webp(i + 4) & 0xff) | ((webp(i + 5) & 0xff) << 8) |
            ((webp(i + 6) & 0xff) << 16) | ((webp(i + 7) & 0xff) << 24)
          if (webp(i) == 'V' && webp(i + 1) == 'P' && webp(i + 2) == '8' && webp(i + 3) == ' ')
            res = java.util.Arrays.copyOfRange(webp, i + 8, i + 8 + sz)
          else i += 8 + sz + (sz & 1)
        }
        res
      }
      check(RawVp8.decode(frame, applyFilter = false), golden)
    }
  }

  test("decodeAny routes lossy WebP to the real codec (not the stub)") {
    val (webp, _) = fixture("mixed")
    val (fmt, w, h, feat) = graft.operators.MultimodalOps.decodeAny(webp)
    assert(fmt == "image/webp")
    assert(w == 160 && h == 96)
    assert(math.abs(feat.sum - 1.0f) < 1e-4, "luminance histogram sums to 1")
    assert(feat.count(_ > 0f) > 1, "non-degenerate histogram")
  }

  test("RGB presentation is deterministic and spec-plausible on a flat frame") {
    val (webp, golden) = fixture("flat16")
    val img = graft.operators.RawWebp.decode(webp)
    assert(img.width == 16 && img.height == 16)
    // flat (200,60,60) source: decoded RGB must sit near it (lossy band)
    val n = img.width * img.height
    def mean(ch: Int): Double =
      (0 until n).map(i => img.rgb(i * 3 + ch) & 0xff).sum.toDouble / n
    assert(math.abs(mean(0) - 200) < 8, s"R mean ${mean(0)}")
    assert(math.abs(mean(1) - 60) < 8, s"G mean ${mean(1)}")
    assert(math.abs(mean(2) - 60) < 8, s"B mean ${mean(2)}")
  }
}
