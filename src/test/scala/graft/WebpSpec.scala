package graft

import java.nio.file.{Files, Paths}

import graft.operators.{MultimodalOps, RawImage, RawWebp}
import org.scalatest.funsuite.AnyFunSuite

/** WebP-lossless (VP8L) codec conformance.
  *
  * The primary gate is INDEPENDENT-IMPLEMENTATION equality: the
  * `webp/` resource fixtures were produced by the reference libwebp
  * encoder (tools/gen_webp_golden.py, system libwebp.so via ctypes)
  * with content picked to force every VP8L feature — palette bundling
  * at all three widths, predictor + cross-color transforms, color
  * cache, LZ77 back-references (incl. the 2D distance mapping) and
  * meta prefix-code images — and each `.rgba` file is libwebp's own
  * decode of the `.webp` bytes. RawWebp.decodeArgb must match byte
  * for byte. The reverse direction (our encoder's streams decoded by
  * libwebp) runs in tools/check_webp_encode.py.
  */
class WebpSpec extends AnyFunSuite {

  private val dir = Paths.get(
    getClass.getClassLoader.getResource("webp").toURI)

  private def bytes(name: String): Array[Byte] =
    Files.readAllBytes(dir.resolve(name))

  private val goldenNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("g") && n.endsWith(".webp"))
      .toSeq.sorted
  }

  test("golden corpus exists and covers the feature matrix") {
    assert(goldenNames.size >= 16)
  }

  for (name <- Seq("g01_1x1.webp", "g02_flat.webp", "g03_checker2.webp",
      "g04_hgrad.webp", "g05_noise.webp", "g06_odd_alpha.webp",
      "g07_pal8.webp", "g08_pal3.webp", "g09_pal2.webp",
      "g10_smooth.webp", "g11_row.webp", "g12_col.webp",
      "g13_photoish.webp", "g14_alphagrad.webp", "g15_big.webp",
      "g16_runs.webp")) {
    test(s"decodes libwebp-encoded $name byte-identically to libwebp") {
      val webp = bytes(name)
      assert(RawWebp.sniff(webp) && RawWebp.sniffLossless(webp))
      val (w, h, argb) = RawWebp.decodeArgb(webp)
      val expected = bytes(name.stripSuffix(".webp") + ".rgba")
      assert(expected.length == w * h * 4, s"dims $w x $h")
      var i = 0
      while (i < w * h) {
        val r = expected(i * 4) & 0xff
        val g = expected(i * 4 + 1) & 0xff
        val b = expected(i * 4 + 2) & 0xff
        val a = expected(i * 4 + 3) & 0xff
        val exp = (a << 24) | (r << 16) | (g << 8) | b
        assert(argb(i) == exp,
          f"$name pixel $i: got 0x${argb(i)}%08x want 0x$exp%08x")
        i += 1
      }
    }
  }

  test("own encoder round-trips pixel-exact (incl. LZ77 runs)") {
    for (seed <- 1 to 3; (w, h) <- Seq((8, 8), (1, 7), (13, 5), (3, 1),
        (64, 2), (31, 17))) {
      val rnd = new java.util.Random(seed * 100 + w)
      val rgb = new Array[Byte](w * h * 3)
      rnd.nextBytes(rgb)
      // inject flat spans so the run tokenizer actually emits LZ77
      var i = 0
      while (i + 6 < w * h && i < 30) {
        rgb((i + 1) * 3) = rgb(i * 3)
        rgb((i + 1) * 3 + 1) = rgb(i * 3 + 1)
        rgb((i + 1) * 3 + 2) = rgb(i * 3 + 2)
        i += 2
      }
      val img = RawImage.Image(w, h, rgb)
      val webp = RawWebp.encode(img)
      assert(RawWebp.sniffLossless(webp))
      val back = RawWebp.decode(webp)
      assert(back.width == w && back.height == h)
      assert(back.rgb.toSeq == img.rgb.toSeq, s"seed=$seed ${w}x$h")
    }
  }

  test("flat image compresses through the run path and round-trips") {
    val img = RawImage.Image(100, 50,
      Array.fill(100 * 50 * 3)(42.toByte))
    val webp = RawWebp.encode(img)
    assert(webp.length < 200, s"runs not used: ${webp.length} bytes")
    assert(RawWebp.decode(webp).rgb.toSeq == img.rgb.toSeq)
  }

  test("decodeAny dispatches lossless WebP for real") {
    val img = RawImage.Image(9, 4, Array.tabulate(9 * 4 * 3)(i =>
      ((i * 37) % 251).toByte))
    val (fmt, w, h, feat) = MultimodalOps.decodeAny(RawWebp.encode(img))
    assert(fmt == "image/webp" && w == 9 && h == 4)
    assert(math.abs(feat.sum - 1.0f) < 1e-4)
  }

  test("lossy VP8 decodes for real since r11 (CPython fixture, conformance)") {
    // CPython's test fixture is VP8X + ALPH + lossy VP8 — no VP8L
    // chunk. Through r10 this pinned the stub boundary; RawVp8 now
    // decodes it for real, byte-exact against libwebp's YUV output
    // (golden at vp8/python_lossy.yuv) — a real-world stream from a
    // different encoder generation than the gen_vp8_golden.py set.
    val p = bytes("python_cpython_testdata.webp")
    assert(RawWebp.sniff(p) && !RawWebp.sniffLossless(p) && RawWebp.sniffLossy(p))
    val out = graft.operators.RawVp8.decodeWebpYuv(p)
    assert(out.width == 16 && out.height == 16)
    val golden = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/vp8/python_lossy.yuv"))
    assert((out.y ++ out.u ++ out.v).sameElements(golden),
      "YUV planes must match libwebp byte-exactly")
    val (fmt, w, h, _) = MultimodalOps.decodeAny(p)
    assert(fmt == "image/webp" && w == 16 && h == 16)
  }

  test("decodes the ALPH lossless alpha plane of CPython's python.webp") {
    // Real-world headerless VP8L stream (alpha in the green channel),
    // from the CPython test suite (Lib/test/.../python.webp, PSF
    // fixture). 16x16 logo with actual transparency structure.
    val p = bytes("python_cpython_testdata.webp")
    val (w, h, alpha) = RawWebp.decodeAlphOf(p)
    assert(w == 16 && h == 16 && alpha.length == 256)
    assert(alpha.forall(a => a >= 0 && a <= 255))
    val distinct = alpha.distinct.length
    assert(distinct > 8, s"expected a real alpha ramp, got $distinct values")
    // corners of the logo are transparent, center is opaque
    assert(alpha(0) < 128 && alpha(8 * 16 + 8) > 128,
      s"corner=${alpha(0)} center=${alpha(8 * 16 + 8)}")
  }

  test("corrupt payloads degrade to the stub, not a query failure") {
    val img = RawImage.Image(6, 6, Array.fill(108)(7.toByte))
    val webp = RawWebp.encode(img)
    val truncated = webp.take(webp.length / 2)
    val (fmt, _, _, _) = MultimodalOps.decodeAny(truncated)
    assert(fmt.startsWith("fake/"))
    val garbage = webp.clone()
    // corrupt the VP8L payload (past the 20-byte container+sig region)
    garbage(25) = (garbage(25) ^ 0x5a).toByte
    // must either still decode (bit flip may hit padding) or stub out —
    // never throw from decodeAny
    MultimodalOps.decodeAny(garbage)
  }

  test("resizeReal transcodes WebP losslessly") {
    val img = RawImage.Image(8, 8, Array.tabulate(192)(i =>
      ((i * 29 + 3) % 256).toByte))
    val out = MultimodalOps.resizeReal(RawWebp.encode(img), 4, 4)
    assert(RawWebp.sniffLossless(out))
    val small = RawWebp.decode(out)
    assert(small.width == 4 && small.height == 4)
    val exp = RawImage.resizeNearest(img, 4, 4)
    assert(small.rgb.toSeq == exp.rgb.toSeq)
  }
}
